"""Device mesh and sharding helpers.

The reference is serial (SURVEY.md §5.8); this layer is the new distributed
runtime: a 1-D (or 3-D) `jax.sharding.Mesh` over the grid, NamedSharding
annotations on the field state, and XLA-inserted collectives for the sweep's
halo exchanges.  The sweep's shifted-slice accesses along a sharded axis
lower to collective-permutes on ICI under GSPMD; the slab scan along a
sharded axis becomes the per-direction pipeline of SURVEY.md §7.3.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_grid_mesh(n_devices: int | None = None,
                   axis_names: tuple[str, ...] = ("gx",)) -> Mesh:
    """1-D mesh over all (or the first n) devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def field_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard a (nx, ny, nz[, ...]) field along its LAST spatial axis.

    The last axis is chosen because the sweep's scan walks axis 0 of the
    rotated field: for 16 of the 24 zones the scan axis is unsharded and the
    per-slab halos are 1-plane collective-permutes; only the 8 zones whose
    scan axis maps to the sharded grid axis pipeline across devices.
    """
    spec = [None] * ndim
    spec[2] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))


def band_field_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (3, nx, ny, nz) band-stacked fields."""
    return NamedSharding(mesh, P(None, None, None, mesh.axis_names[0]))


def shard_state(state, mesh: Mesh):
    """Apply the grid sharding to every field of a FieldState."""
    f3 = field_sharding(mesh)
    f4 = band_field_sharding(mesh)

    def place(x):
        if x.ndim == 3:
            return jax.device_put(x, f3)
        if x.ndim == 4:
            return jax.device_put(x, f4)
        return x

    return jax.tree_util.tree_map(place, state)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
