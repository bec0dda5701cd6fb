"""Trace-time mesh context for modules that need the device Mesh.

pallas_call is opaque to XLA's SPMD partitioner: under pjit with sharded
operands it would be wrapped in all-gathers, which is why the attention
kernel auto-rule used to require a single device. MultiHeadAttention needs
the Mesh to instead wrap the fused kernel in shard_map (batch over 'data',
heads over 'model' — zero collectives, attention is independent per batch
element and per head). Threading a Mesh through every flax module
constructor would pollute the whole module tree with a non-pytree static
field, so the train/eval step builders install it here (a plain trace-time
context variable, read by the module while jit traces the step) instead.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional

from jax.sharding import Mesh

_MESH_STACK: list = []


@contextmanager
def use_mesh(mesh: Optional[Mesh]):
    """Install `mesh` as the current mesh for the duration of the block.

    `None` is a no-op so callers can pass an optional mesh through
    unconditionally.
    """
    if mesh is None:
        yield
        return
    _MESH_STACK.append(mesh)
    try:
        yield
    finally:
        _MESH_STACK.pop()


def current_mesh() -> Optional[Mesh]:
    return _MESH_STACK[-1] if _MESH_STACK else None
