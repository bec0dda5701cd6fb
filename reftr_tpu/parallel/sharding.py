"""Device mesh and SPMD sharding rules.

The reference's only strategy is DDP data parallelism over NCCL
(/root/reference/main_vg.py:290-296, util/misc.py:392-431). Here the whole
train step is one pjit'd global program over a (data, model) Mesh:

  * batch arrays are sharded over the 'data' axis — the gradient all-reduce
    the reference gets from DDP hooks is inserted by XLA as an ICI
    all-reduce of the psum'd loss gradients,
  * with mesh.model > 1, attention head projections and FFN hidden layers
    are sharded over 'model' (Megatron-style tensor parallelism: column-
    parallel first matmul, row-parallel second; XLA inserts the matching
    reduce-scatter/all-reduce),
  * everything else is replicated.

Multi-host bootstrap is `jax.distributed.initialize()`
(reftr_tpu.core.distributed), replacing env://+NCCL init.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reftr_tpu.core.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"

# Rules applied to '/'-joined parameter paths, first match wins.
# (pattern, partition spec for the kernel).
_TP_RULES = [
    # FFN: column-parallel in, row-parallel out
    (re.compile(r"(linear1|intermediate)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"(linear2|output)/kernel$"), P(MODEL_AXIS, None)),
    # attention: head-sharded qkv, row-parallel out projection
    (re.compile(r"(q_proj|k_proj|v_proj)/kernel$"), P(None, MODEL_AXIS)),
    (re.compile(r"out_proj/kernel$"), P(MODEL_AXIS, None)),
    (re.compile(r"(linear1|intermediate|q_proj|k_proj|v_proj)/bias$"),
     P(MODEL_AXIS)),
]


def create_mesh(cfg: MeshConfig | None = None,
                devices: Optional[list] = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else n // model
    assert data * model == n, (
        f"mesh {data}x{model} does not match {n} devices")
    if cfg.model_spans_processes:
        # Cross-host tensor parallelism: lay the mesh out model-major so
        # the MODEL axis crosses process boundaries (devices are enumerated
        # process-contiguously, so reshape(model, data).T puts consecutive
        # processes' devices in the same data row). TP collectives then
        # ride the inter-host links; input loading must be replicated per
        # data shard — loader_shards() below computes the layout and
        # train/loop.build_loaders + train/steps.shard_batch honor it.
        dev_array = np.asarray(devices).reshape(model, data).T
    else:
        dev_array = mesh_utils.create_device_mesh((data, model),
                                                  devices=devices)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def loader_shards(mesh: Mesh) -> tuple:
    """(num_shards, shard_rank): how many distinct data-loading shards the
    mesh needs and which one THIS process loads.

    The reference's DDP world has exactly one layout — one loader shard per
    process (util/misc.py:392-431). Under a (data, model) mesh the input
    pipeline must follow the mesh instead: processes whose devices live in
    the same data row(s) are REPLICAS of each other's input (the model axis
    spans them) and must load identical data, so they share one loader
    shard. Groups processes by the set of data rows their devices touch:

      * classic layout (model within a process): every process has its own
        rows -> (process_count, process_index) — the DDP semantics,
      * model axis spanning processes (create_mesh model_spans_processes):
        every process touches every row -> (1, 0) — all processes load the
        full global batch,
      * mixed (e.g. model=4 over 2-device hosts): each pair of processes
        shares rows -> one shard per pair.

    Raises if processes' row sets partially overlap (no consistent loader
    assignment exists for such a mesh).
    """
    devs = mesh.devices  # [data, model] ndarray of Device
    process_of = np.vectorize(lambda d: d.process_index)(devs)
    return _loader_shards_from(process_of, jax.process_index())


def _loader_shards_from(process_of: np.ndarray, me: int) -> tuple:
    """Pure core of loader_shards: process_of[data, model] = process index
    of each mesh slot; me = this process."""
    rows_of: dict = {}
    for di in range(process_of.shape[0]):
        for pid in process_of[di]:
            rows_of.setdefault(int(pid), set()).add(di)
    groups: dict = {}
    for pid, rows in rows_of.items():
        groups.setdefault(frozenset(rows), []).append(pid)
    ordered = sorted(groups, key=min)
    seen: set = set()
    for rows in ordered:
        if rows & seen:
            raise ValueError(
                "unsupported mesh layout: processes' data rows partially "
                f"overlap ({ {min(g): sorted(g) for g in groups.values()} })")
        # shard_batch relies on make_array_from_process_local_data mapping
        # each process's local rows onto the global batch IN ORDER, which
        # is only the samplers' contiguous-block semantics if every group's
        # rows form a contiguous range; an interleaved layout would scramble
        # samples across shards.
        if max(rows) - min(rows) + 1 != len(rows):
            raise ValueError(
                "unsupported mesh layout: a process group's data rows are "
                f"not contiguous ({sorted(rows)}); loader shards require "
                "contiguous row blocks per process group")
        seen |= rows
    for rank, rows in enumerate(ordered):
        if me in groups[rows]:
            return len(ordered), rank
    # this process owns no device in the mesh (sub-mesh use); load nothing
    # distinct — treat as rank 0 of a 1-shard layout
    return 1, 0


def param_spec(path: str, value: Any = None,
               tensor_parallel: bool = True) -> P:
    """Partition spec for a parameter at '/'-joined `path`."""
    if tensor_parallel:
        for pat, spec in _TP_RULES:
            if pat.search(path):
                return spec
    return P()


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:
            parts.append(str(k))
    return "/".join(parts)


def param_shardings(params, mesh: Mesh):
    """NamedSharding tree for a param tree; TP rules active iff the mesh's
    model axis is larger than 1."""
    tp = mesh.shape[MODEL_AXIS] > 1

    def one(key_path, v):
        return NamedSharding(mesh, param_spec(_path_str(key_path), v, tp))

    return jax.tree_util.tree_map_with_path(one, params)


def batch_sharding(mesh: Mesh):
    """Sharding for batch arrays: leading axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
