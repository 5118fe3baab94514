"""FSDP/ZeRO-style parameter + optimizer-state sharding over the mesh.

The reference has no distributed training at all (SURVEY.md §2 checklist:
device enum is {CPU, CUDA}, Types/YoloTypes.cs:49-53); data parallelism with
replicated parameters is the parity configuration. This module is the
beyond-parity scale-out axis: parameter, gradient-moment, and master-weight
memory divided across chips, expressed the TPU-native way — GSPMD sharding
annotations on the state pytree, with XLA inserting the per-layer
all-gathers (params) and reduce-scatters (grads) over ICI. No wire protocol,
no hand-written collectives.

Usage:
    state = fsdp_shard_state(state, mesh)        # device_put with shardings
    step  = make_train_step(..., mesh=mesh, fsdp=True)
    batch = shard_batch(batch, mesh)
    state, loss, items = step(state, batch, {})

Each array leaf is sharded along its largest axis divisible by the mesh's
data-axis size (ties prefer the trailing/output-features axis, which for
HWIO conv kernels gives the classic weight-stationary layout); leaves too
small to matter (< min_size elements) and indivisible leaves stay
replicated. Scalars (step counters, loss scale, optimizer counts) are
replicated.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

# leaves below this element count stay replicated: the all-gather latency
# for tiny BN scales/biases costs more than the bytes saved
DEFAULT_MIN_SIZE = 4096


def fsdp_spec(shape, axis_size: int, *, axis: str = DATA_AXIS,
              min_size: int = DEFAULT_MIN_SIZE) -> P:
    """PartitionSpec sharding the largest divisible dim of `shape`."""
    if not shape or int(np.prod(shape)) < min_size:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % axis_size == 0 and (best is None or d >= shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_shardings(tree, mesh: Mesh, *, axis: str = DATA_AXIS,
                   min_size: int = DEFAULT_MIN_SIZE):
    """Pytree of NamedShardings mirroring `tree` (per-leaf shape rule).

    Applies uniformly, so optimizer moments (same shapes as params) shard
    identically to their params and scalar leaves replicate.
    """
    axis_size = mesh.shape[axis]

    def rule(leaf):
        shape = np.shape(leaf)
        return NamedSharding(mesh, fsdp_spec(shape, axis_size, axis=axis,
                                             min_size=min_size))

    return jax.tree_util.tree_map(rule, tree)


def fsdp_shard_state(state, mesh: Mesh, *, axis: str = DATA_AXIS,
                     min_size: int = DEFAULT_MIN_SIZE):
    """device_put a TrainState (or any pytree) with FSDP shardings."""
    return jax.device_put(
        state, fsdp_shardings(state, mesh, axis=axis, min_size=min_size))


def sharded_param_bytes(state, mesh: Mesh) -> int:
    """Per-device bytes of the state under fsdp_shardings (diagnostics)."""
    axis_size = mesh.shape[DATA_AXIS]
    total = 0
    for leaf in jax.tree_util.tree_leaves(state):
        shape = np.shape(leaf)
        nbytes = int(np.prod(shape)) * np.dtype(leaf.dtype).itemsize
        spec = fsdp_spec(shape, axis_size)
        total += nbytes // (axis_size if any(spec) else 1)
    return total
