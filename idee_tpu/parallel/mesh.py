# ------------------------------------------------------------------
"""Mesh + sharding helpers.

Design (scaling-book recipe): pick a mesh, annotate shardings on the jit
boundary, let XLA insert collectives. For this model family data parallelism
over the batch axis is the primary strategy (grids are moderate, the model is
tiny); spatial sharding of H across a second mesh axis (spatial_sharding
below; XLA's spatial partitioner inserts the conv/window halo exchanges) is
the optional extension for the large CORDEX grids.
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


def spatial_sharding(mesh: Mesh, data_axis: str = "data",
                     space_axis: str = "space") -> dict:
    """GSPMD spatial sharding for the large CORDEX grids (SURVEY.md 2.9:
    the reference has NO tensor/spatial parallelism; this is the optional
    TPU extension). The batch input [N, V, C, T, H, W] is sharded with N on
    the data axis and H on the space axis; XLA's spatial partitioner
    inserts the halo exchanges that convolutions and the Swin window shifts
    need over ICI automatically -- the GSPMD analogue of ring/context
    parallelism for spatial (not token) sequence length.

    Returns per-rank shardings keyed by array rank so every batch leaf
    ([N,H,W] masks, [N,V,T,H,W] labels, 6-D inputs) gets a consistent
    layout.
    """
    def spec(rank: int) -> NamedSharding:
        if rank >= 3:
            # [..., H, W]: leading dim = batch, H = rank-2
            parts = [data_axis] + [None] * (rank - 3) + [space_axis, None]
            return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P(data_axis))

    return {"spec_fn": spec,
            "batch": lambda batch: jax.tree.map(
                lambda a: spec(np.ndim(a)), batch)}


def shard_batch_spatial(batch: dict, mesh: Mesh, data_axis: str = "data",
                        space_axis: str = "space") -> dict:
    """device_put a host batch with batch+height sharding."""
    sh = spatial_sharding(mesh, data_axis, space_axis)
    return jax.device_put(batch, sh["batch"](batch))
