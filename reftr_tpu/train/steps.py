"""Jitted train / eval steps over a device mesh.

The whole hot loop of the reference (engine_vg.py:39-74 — forward, loss,
backward, DDP all-reduce, clip, optimizer, LR step) is ONE pjit'd program:
batch sharded over 'data', params replicated (or TP-sharded over 'model'),
gradient cross-replica reduction inserted by XLA.

The loss dict returned per step is globally reduced (means over the global
batch) — equivalent to the reference's reduce_dict logging all-reduce
(util/misc.py:136-160) at zero extra cost.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from reftr_tpu.core.config import LossConfig
from reftr_tpu.models.criterion import criterion, total_loss
from reftr_tpu.models.postprocess import rec_metrics
from reftr_tpu.parallel.context import use_mesh
from reftr_tpu.parallel.sharding import batch_sharding, param_shardings
from reftr_tpu.train.state import TrainState


# Donating the train state into the step halves peak state memory and is
# the default on real backends.  The 'axon' remote-TPU tunnel is the
# exception: with donation on, from-scratch smoke training deterministically
# produced a NaN loss at the same step across 3 runs while the state saved
# one epoch earlier was 100% finite, and the identical run was clean with
# donation off, with jax_debug_nans (which disables donation), and on CPU
# with donation ON.  The tunnel's buffer reclamation races its host fetches
# (its block_until_ready is advisory), so donated-buffer reuse can corrupt
# an in-flight read.  See PERFORMANCE.md "Donation on the axon tunnel".
UNSAFE_DONATION_PLATFORMS = ("axon",)


def donation_is_safe(platforms: str | None = None) -> bool:
    # The axon plugin's devices self-report platform "tpu", so
    # default_backend() can't identify the tunnel; the platform *selection*
    # (jax_platforms, e.g. "axon,cpu") is where the plugin name appears.
    if platforms is None:
        platforms = jax.config.jax_platforms or ""
    selected = platforms.split(",")
    return not any(p in UNSAFE_DONATION_PLATFORMS for p in selected)


def make_train_step(
    model,
    weight_dict: Dict[str, float],
    loss_cfg: LossConfig,
    world_size: int = 1,
    with_masks: bool = False,
    donate: bool = True,
    lr_fn: Callable | None = None,
    mesh: Mesh | None = None,
) -> Callable[[TrainState, Dict, Dict], Tuple[TrainState, Dict]]:
    """Builds the fused train step. Call under a Mesh context (or single
    device); shard the inputs with `shard_batch` first on multi-device.
    lr_fn(step) -> learning rate, reported in the metrics dict.

    Passing `mesh` lets MultiHeadAttention keep the Pallas kernel on
    multi-device runs by wrapping it in shard_map (parallel.context);
    without it the modules fall back to XLA attention when device_count>1.
    """

    def step_fn(state: TrainState, batch: Dict, targets: Dict):
        step_rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            with use_mesh(mesh):
                out = model.apply({"params": params}, batch,
                                  deterministic=False,
                                  rngs={"dropout": step_rng})
            losses = criterion(out, targets, loss_cfg, world_size,
                               with_masks=with_masks)
            return total_loss(losses, weight_dict), losses

        (tl, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grad_norm = optax.global_norm(grads)
        new_state = state.apply_gradients(grads)
        metrics = dict(losses)
        metrics["loss"] = tl
        metrics["grad_norm"] = grad_norm
        if lr_fn is not None:
            metrics["lr"] = lr_fn(state.step.astype(jnp.float32))
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(
    model,
    weight_dict: Dict[str, float],
    loss_cfg: LossConfig,
    world_size: int = 1,
    with_masks: bool = False,
    mesh: Mesh | None = None,
):
    """Forward + losses (for logging) + raw metric sums, one jitted program.

    Host accumulates the sums across batches and processes
    (engine_vg.py:207-219 semantics).
    """

    def step_fn(params, batch: Dict, targets: Dict):
        with use_mesh(mesh):
            out = model.apply({"params": params}, batch, deterministic=True)
        losses = criterion(out, targets, loss_cfg, world_size,
                           with_masks=with_masks)
        sums = rec_metrics(out["pred_boxes"], targets["boxes"],
                           targets["box_valid"])
        if with_masks and "pred_masks" in out:
            from reftr_tpu.models.postprocess import segm_metrics

            sums.update(segm_metrics(
                out["pred_masks"], targets["masks"], batch["image_valid"],
                mask_valid=targets.get("mask_valid")))
        return out, losses, sums

    return jax.jit(step_fn)


@functools.lru_cache(maxsize=8)
def _loader_shard_count(mesh: Mesh) -> int:
    from reftr_tpu.parallel.sharding import loader_shards

    return loader_shards(mesh)[0]


def shard_batch(tree, mesh: Mesh):
    """Place a host batch with the leading axis sharded over 'data'.

    Multi-host: each process holds its loader-shard of the global batch
    (parallel.sharding.loader_shards — one shard per process in the classic
    DDP layout of the reference, util/misc.py:392-431; one shard per
    replica GROUP when the model axis spans processes, where every process
    in a group loaded identical data). The global batch is
    n_shards * local_batch; make_array_from_process_local_data maps each
    process's addressable slices onto its local rows in order, which
    matches the samplers' contiguous rank blocks."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        n_shards = _loader_shard_count(mesh)

        def make(x):
            gshape = (x.shape[0] * n_shards,) + x.shape[1:]
            return jax.make_array_from_process_local_data(sh, x, gshape)

        return jax.tree_util.tree_map(make, tree)
    return jax.device_put(tree, sh)


def state_shardings(state, mesh: Mesh):
    """Sharding tree for a TrainState (or its eval_shape).

    Optimizer moments (adam mu/nu, sgd momentum) carry the parameter path as
    a suffix of their own tree path, so the TP param rules apply to them
    identically; scalars and rng fall through to replicated.
    """
    from reftr_tpu.parallel.sharding import _path_str, param_spec

    tp = mesh.shape["model"] > 1

    def one(key_path, _v):
        return NamedSharding(mesh, param_spec(_path_str(key_path), None, tp))

    return jax.tree_util.tree_map_with_path(one, state)


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place the whole state according to the mesh (moments follow params)."""
    return jax.device_put(state, state_shardings(state, mesh))
