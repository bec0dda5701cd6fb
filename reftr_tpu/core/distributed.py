"""Multi-host bootstrap and cross-process helpers.

Replaces /root/reference/util/misc.py:336-431 (env://+NCCL init, rank
helpers, object all_gather) with the JAX runtime:

  * `initialize()` — jax.distributed.initialize, reading the coordinator
    from the environment (or Slurm variables, mirroring the reference's
    Slurm path util/misc.py:398-415). On TPU pods the runtime discovers
    topology itself; the call is a no-op for single-process runs.
  * in-step reductions live INSIDE the jitted program (psum via pjit);
    host-side metric aggregation uses multihost_utils.process_allgather.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _first_slurm_node(nodelist: str) -> str:
    """'node[001-008],other' -> 'node001'; 'gpu-a-3' -> 'gpu-a-3'."""
    head = nodelist.split(",")[0]
    if "[" in head:
        prefix, rng = head.split("[", 1)
        first = rng.rstrip("]").split(",")[0].split("-")[0]
        return prefix + first
    return head


def initialize() -> None:
    """Best-effort multi-process init; silently single-process otherwise.

    MUST run before any JAX computation or backend query — so this reads
    only environment variables to decide (never jax.process_count()).
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    n_proc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if coord is None and "SLURM_PROCID" in os.environ:
        # Slurm: derive the coordinator from the first node, like the
        # reference's scontrol-based bootstrap (util/misc.py:398-415).
        nodelist = os.environ.get(
            "SLURM_STEP_NODELIST", os.environ.get("SLURM_JOB_NODELIST", ""))
        first = _first_slurm_node(nodelist)
        if first:
            coord = f"{first}:29500"
        n_proc = os.environ.get("SLURM_NTASKS")
        pid = os.environ.get("SLURM_PROCID")
    if coord and n_proc and pid and int(n_proc) > 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(n_proc),
                process_id=int(pid),
            )
        except RuntimeError:
            pass  # already initialized (e.g. by the launcher)


def is_main_process() -> bool:
    return jax.process_index() == 0


def world_size() -> int:
    return jax.process_count()


def allreduce_sum_host(values: dict[str, float]) -> dict[str, float]:
    """Sum scalar metric dicts across processes (single-process: identity).

    Matches the eval accumulator all_reduce (engine_vg.py:207-219).
    """
    if jax.process_count() == 1:
        return dict(values)
    from jax.experimental import multihost_utils

    keys = sorted(values)
    arr = np.asarray([values[k] for k in keys], np.float64)
    gathered = multihost_utils.process_allgather(arr)
    summed = np.asarray(gathered).sum(axis=0)
    return {k: float(v) for k, v in zip(keys, summed)}
