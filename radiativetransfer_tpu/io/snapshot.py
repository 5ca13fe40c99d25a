"""Snapshot write / restart.

The reference writes per-iteration HDF4 files `cellArrayNNNN.h4` holding the
depth-first (space-filling-curve) flattening of octree leaves: base-grid
dims + 1-D arrays level, HI, HeI, HeII, temperature, density [, vel, abun2]
(writeIonization, /root/reference/equiSources.f90:4797-4912; restart
readLatestIonization :4738-4795).

The TPU build keeps the same logical schema in NumPy `.npz` containers (the
environment ships no HDF4/HDF5 bindings): dense single-level grids store the
fields directly in C order — which IS the depth-first leaf order for an
unrefined grid — and AMR exports flatten through the SFC codec (io.sfc).
Restart re-inflates onto a freshly built grid with the same species clamping
as the reference.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re

import jax.numpy as jnp
import numpy as np

from ..constants import MH, MHE, PSI
from ..core.state import FieldState, make_state


def snapshot_name(itime: int, directory: str = ".") -> str:
    """cellArrayNNNN equivalent (equiSources.f90:4838-4843)."""
    return os.path.join(directory, f"cellArray{itime:04d}.npz")


def write_snapshot(path: str, state: FieldState, itime: int,
                   physical_box_size: float, extra: dict | None = None) -> None:
    """Write a snapshot with the reference's cellArray field set."""
    shape = state.shape
    data = {
        "base_grid_size": np.array(shape, np.int32),
        "itime": np.int32(itime),
        "physical_box_size": np.float64(physical_box_size),
        "level": np.zeros(int(np.prod(shape)), np.int32),
        "HI": np.asarray(state.HI, np.float32).reshape(-1),
        "HeI": np.asarray(state.HeI, np.float32).reshape(-1),
        "HeII": np.asarray(state.HeII, np.float32).reshape(-1),
        "temperature": np.asarray(state.tgas, np.float32).reshape(-1),
        "density": np.asarray(state.rho, np.float32).reshape(-1),
        "abun2": np.asarray(state.abun2, np.float32).reshape(-1),
    }
    if extra:
        data.update(extra)
    np.savez_compressed(path, **data)


def read_snapshot(path: str, state: FieldState) -> tuple[FieldState, int]:
    """Re-inflate a snapshot onto an existing state (restart path,
    readLatestIonization, equiSources.f90:4738-4795).

    Applies the reference's clamps: species non-negative, HI <= nH, and
    HeI+HeII rescaled into <= nHe (:4765-4773).
    """
    with np.load(path) as f:
        shape = tuple(f["base_grid_size"])
        if shape != state.shape:
            raise ValueError(f"snapshot grid {shape} != state grid {state.shape}")
        itime = int(f["itime"])
        HI = jnp.asarray(f["HI"].reshape(shape), state.HI.dtype)
        HeI = jnp.asarray(f["HeI"].reshape(shape), state.HI.dtype)
        HeII = jnp.asarray(f["HeII"].reshape(shape), state.HI.dtype)
        tgas = jnp.asarray(f["temperature"].reshape(shape), state.HI.dtype)

    nh = state.nh
    nhe = state.nhe
    HI = jnp.clip(HI, 0.0, nh)
    HeI = jnp.maximum(HeI, 0.0)
    HeII = jnp.maximum(HeII, 0.0)
    tot = HeI + HeII
    scale = jnp.where(tot > nhe, nhe / jnp.where(tot > 0, tot, 1.0), 1.0)
    HeI = HeI * scale
    HeII = HeII * scale
    return dataclasses.replace(state, HI=HI, HeI=HeI, HeII=HeII,
                               tgas=tgas), itime


def latest_snapshot(directory: str = ".") -> str | None:
    """Most recent cellArrayNNNN snapshot in a directory."""
    best, best_i = None, -1
    for name in os.listdir(directory):
        m = re.fullmatch(r"cellArray(\d{4})\.npz", name)
        if m and int(m.group(1)) > best_i:
            best, best_i = os.path.join(directory, name), int(m.group(1))
    return best


def itime_from_name(path: str) -> int:
    """Iteration counter parsed from the filename digits
    (equiSources.f90:1079-1080)."""
    m = re.search(r"(\d{4})\.(npz|h4)$", path)
    if not m:
        raise ValueError(f"no iteration digits in {path!r}")
    return int(m.group(1))


class TimeLog:
    """Append-only neutral-fraction log, the reference's `time` file
    (equiSources.f90:1833-1836)."""

    def __init__(self, path: str = "time"):
        self.path = path

    def append(self, itime: int, neutral_fraction: float) -> None:
        with open(self.path, "a") as fh:
            fh.write(f"itime ={itime:5d}{neutral_fraction:18.10f}\n")

    def restart_marker(self, itime: int) -> None:
        with open(self.path, "a") as fh:
            fh.write(f"itime ={itime:5d}\n")
