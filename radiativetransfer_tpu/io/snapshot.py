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
    if state.vel is not None:
        # the reference writes velx/vely/velz for kinematics runs
        # (writeIonization, equiSources.f90:4869-4890)
        v = np.asarray(state.vel, np.float32)
        data["velx"] = v[0].reshape(-1)
        data["vely"] = v[1].reshape(-1)
        data["velz"] = v[2].reshape(-1)
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
        vel = state.vel
        if "velx" in f:
            vel = jnp.asarray(np.stack([f["velx"].reshape(shape),
                                        f["vely"].reshape(shape),
                                        f["velz"].reshape(shape)]),
                              state.HI.dtype)

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
                               tgas=tgas, vel=vel), itime


def write_snapshot_amr(path: str, state, itime: int,
                       physical_box_size: float) -> None:
    """Write a two-level AMRState in depth-first cellArray leaf order
    (writeIonization on an AMR octree, equiSources.f90:4797-4912)."""
    from . import sfc
    n = state.n
    refined_np = np.asarray(state.refined, np.uint8)
    enum = sfc.enumerate_leaves(n, n, n, [refined_np])

    def leaves(base_f, fine_f):
        return sfc.gather_leaves(enum, [np.asarray(base_f, np.float64),
                                        np.asarray(fine_f, np.float64)])

    data = {
        "base_grid_size": np.array(state.base.shape, np.int32),
        "itime": np.int32(itime),
        "physical_box_size": np.float64(physical_box_size),
        "refined": refined_np,
        "level": enum["level"].astype(np.int32),
        "HI": leaves(state.base.HI, state.fine.HI).astype(np.float32),
        "HeI": leaves(state.base.HeI, state.fine.HeI).astype(np.float32),
        "HeII": leaves(state.base.HeII, state.fine.HeII).astype(np.float32),
        "temperature": leaves(state.base.tgas, state.fine.tgas).astype(np.float32),
        "density": leaves(state.base.rho, state.fine.rho).astype(np.float32),
        "abun2": leaves(state.base.abun2, state.fine.abun2).astype(np.float32),
    }
    np.savez_compressed(path, **data)


def read_snapshot_amr(path: str, state) -> tuple["object", int]:
    """Re-inflate an AMR snapshot onto an existing AMRState (restart),
    with the reference's species clamps."""
    import jax.numpy as jnp

    from ..core import amr as amr_mod
    from . import sfc
    n = state.n
    with np.load(path) as f:
        itime = int(f["itime"])
        refined_np = f["refined"]
        if not np.array_equal(refined_np.astype(bool),
                              np.asarray(state.refined)):
            raise ValueError("snapshot refinement map differs from the state "
                             "(the reference rebuilds structure from the "
                             "input grid and asserts the cell count, "
                             "equiSources.f90:1124-1127)")
        enum = sfc.enumerate_leaves(n, n, n, [refined_np])
        shapes = [state.base.shape, state.fine.shape]

        def fields(key):
            vals = f[key].astype(np.float64)
            return sfc.scatter_leaves(enum, vals, shapes)

        hi_b, hi_f = fields("HI")
        hei_b, hei_f = fields("HeI")
        heii_b, heii_f = fields("HeII")
        t_b, t_f = fields("temperature")

    def clamp(st, hi, hei, heii, tg):
        dt = st.HI.dtype
        nh, nhe = st.nh, st.nhe
        hi = jnp.clip(jnp.asarray(hi, dt), 0.0, nh)
        hei = jnp.maximum(jnp.asarray(hei, dt), 0.0)
        heii = jnp.maximum(jnp.asarray(heii, dt), 0.0)
        tot = hei + heii
        scale = jnp.where(tot > nhe, nhe / jnp.where(tot > 0, tot, 1.0), 1.0)
        return dataclasses.replace(st, HI=hi, HeI=hei * scale,
                                   HeII=heii * scale,
                                   tgas=jnp.asarray(tg, dt))

    new_base = clamp(state.base, hi_b, hei_b, heii_b, t_b)
    new_fine = clamp(state.fine, hi_f, hei_f, heii_f, t_f)
    # fine positions without leaves got zeros from the scatter: fill by
    # prolongation so the dense fine fields stay everywhere defined
    rf = amr_mod.prolong_mask(state.refined)
    new_fine = dataclasses.replace(
        new_fine,
        HI=jnp.where(rf, new_fine.HI, amr_mod.prolong(new_base.HI)),
        HeI=jnp.where(rf, new_fine.HeI, amr_mod.prolong(new_base.HeI)),
        HeII=jnp.where(rf, new_fine.HeII, amr_mod.prolong(new_base.HeII)),
        tgas=jnp.where(rf, new_fine.tgas, amr_mod.prolong(new_base.tgas)))
    state = dataclasses.replace(state, base=new_base, fine=new_fine)
    return amr_mod.sync_restriction(state), itime


def write_snapshot_ml(path: str, state, itime: int,
                      physical_box_size: float) -> None:
    """Write an L-level MultiLevelState in depth-first cellArray leaf order
    (the SFC codec handles arbitrary nesting)."""
    from . import sfc
    n = state.n
    refined_np = [np.asarray(r, np.uint8) for r in state.refined]
    enum = sfc.enumerate_leaves(n, n, n, refined_np)

    def leaves(attr):
        return sfc.gather_leaves(
            enum, [np.asarray(getattr(lv, attr), np.float64)
                   for lv in state.levels]).astype(np.float32)

    data = {
        "base_grid_size": np.array(state.levels[0].shape, np.int32),
        "itime": np.int32(itime),
        "physical_box_size": np.float64(physical_box_size),
        "n_levels": np.int32(state.n_levels),
        "level": enum["level"].astype(np.int32),
        "HI": leaves("HI"), "HeI": leaves("HeI"), "HeII": leaves("HeII"),
        "temperature": leaves("tgas"), "density": leaves("rho"),
        "abun2": leaves("abun2"),
    }
    for ell, r in enumerate(refined_np):
        data[f"refined_{ell}"] = r
    np.savez_compressed(path, **data)


def read_snapshot_ml(path: str, state) -> tuple["object", int]:
    """Re-inflate an L-level snapshot onto an existing MultiLevelState
    (restart), with the reference's species clamps."""
    import jax.numpy as jnp

    from ..core import amr as amr_mod
    from . import sfc
    n = state.n
    L = state.n_levels
    with np.load(path) as f:
        itime = int(f["itime"])
        if int(f["n_levels"]) != L:
            raise ValueError("snapshot depth differs from the state")
        refined_np = [f[f"refined_{ell}"] for ell in range(L - 1)]
        for r_snap, r_st in zip(refined_np, state.refined):
            if not np.array_equal(r_snap.astype(bool), np.asarray(r_st)):
                raise ValueError(
                    "snapshot refinement maps differ from the state "
                    "(structure is rebuilt from the input grid, "
                    "equiSources.f90:1124-1127)")
        enum = sfc.enumerate_leaves(n, n, n, refined_np)
        shapes = [lv.shape for lv in state.levels]

        def fields(key):
            return sfc.scatter_leaves(enum, f[key].astype(np.float64),
                                      shapes)

        his, heis, heiis, ts = (fields("HI"), fields("HeI"),
                                fields("HeII"), fields("temperature"))

    def clamp(st, hi, hei, heii, tg):
        dt = st.HI.dtype
        nh, nhe = st.nh, st.nhe
        hi = jnp.clip(jnp.asarray(hi, dt), 0.0, nh)
        hei = jnp.maximum(jnp.asarray(hei, dt), 0.0)
        heii = jnp.maximum(jnp.asarray(heii, dt), 0.0)
        tot = hei + heii
        scale = jnp.where(tot > nhe, nhe / jnp.where(tot > 0, tot, 1.0), 1.0)
        return dataclasses.replace(st, HI=hi, HeI=hei * scale,
                                   HeII=heii * scale,
                                   tgas=jnp.asarray(tg, dt))

    new_levels = [clamp(lv, his[ell], heis[ell], heiis[ell], ts[ell])
                  for ell, lv in enumerate(state.levels)]
    # non-leaf positions got zeros from the scatter: fill by prolongation
    # so the dense fields stay everywhere defined
    for ell in range(1, L):
        cov = amr_mod.prolong(jnp.asarray(state.refined[ell - 1], bool))
        prev = new_levels[ell - 1]
        cur = new_levels[ell]
        new_levels[ell] = dataclasses.replace(
            cur,
            HI=jnp.where(cov, cur.HI, amr_mod.prolong(prev.HI)),
            HeI=jnp.where(cov, cur.HeI, amr_mod.prolong(prev.HeI)),
            HeII=jnp.where(cov, cur.HeII, amr_mod.prolong(prev.HeII)),
            tgas=jnp.where(cov, cur.tgas, amr_mod.prolong(prev.tgas)))
    state = amr_mod.MultiLevelState(levels=tuple(new_levels),
                                    refined=state.refined)
    return amr_mod.sync_restriction_multi(state), itime


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
