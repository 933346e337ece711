# ------------------------------------------------------------------
"""Mesh + sharding helpers.

Design (scaling-book recipe): pick a mesh, annotate shardings on the jit
boundary, let XLA insert collectives. For this model family data parallelism
over the batch axis is the primary strategy (grids are moderate, the model is
tiny); spatial sharding of H x W with windowed-attention halo exchange is the
optional extension for the large CORDEX grids (see kernels/halo.py when
present).
"""
# ------------------------------------------------------------------

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Create a device mesh. Default: all devices on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) across the mesh's data axis."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_spec(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Per-leaf NamedSharding tree: shard every array's leading dim."""
    s = batch_sharding(mesh, axis)
    return jax.tree.map(lambda _: s, batch)
