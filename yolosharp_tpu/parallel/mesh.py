"""Device mesh + sharding helpers (the distributed layer the reference lacks,
SURVEY.md §2 checklist).

Data parallelism is expressed with jax.sharding: the batch is sharded over
the "data" axis, parameters are replicated, and XLA inserts the gradient
all-reduce over ICI. A second ("model") axis is reserved so tensor-parallel
sharding can be layered on without restructuring (v12x ~110M params fits a
single chip, so DP is the production configuration).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(shape: Optional[Tuple[int, ...]] = None,
                devices=None) -> Mesh:
    """1-D data mesh by default; pass shape=(dp, tp) for a 2-D mesh."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    axis_names = (DATA_AXIS,) if len(shape) == 1 else (DATA_AXIS, MODEL_AXIS)
    mesh_devices = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(mesh_devices, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict onto the mesh, sharded on axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x), sh), batch)


def replicate_tree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)
