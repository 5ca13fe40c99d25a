"""Two-level nested (AMR) grid support.

The reference's fully-threaded octree supports arbitrary nesting; the
TPU-native design replaces pointer-walking with LEVEL-DENSE fields
(SURVEY.md §7.1): the base level is a dense (n,n,n) grid, the refinement
level a dense (2n,2n,2n) grid valid only where the parent bitmap is set.
Fully-threaded semantics (cross-level neighbor access) become restrict /
prolong operators and masked shifts.

Memory note: the fine level is allocated densely over the whole domain
(8x the base) for TPU-friendly static shapes; block-sparse fine storage is
a planned optimization for deeper hierarchies.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MH, MHE, PSI
from .state import FieldState, GridGeometry, make_state


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AMRState:
    """Two-level nested state.

    base: FieldState on (n,n,n); fine: FieldState on (2n,2n,2n);
    refined: (n,n,n) bool — where the fine level is valid.
    Base cells under refined regions hold the restriction (average) of
    their children, mirroring the reference's parent-copy semantics
    (placeCellProjectWithVelocity, equiSources.f90:1884-1909).
    """
    base: FieldState
    fine: FieldState
    refined: jax.Array

    @property
    def n(self) -> int:
        return self.base.rho.shape[0]

    def leaf_mask_base(self) -> jax.Array:
        return ~self.refined

    def leaf_mask_fine(self) -> jax.Array:
        return prolong_mask(self.refined)

    def n_leaves(self) -> int:
        nb = int(jnp.sum(~self.refined))
        nf = 8 * int(jnp.sum(self.refined))
        return nb + nf


def restrict(fine_field: jax.Array) -> jax.Array:
    """Average 2x2x2 children onto the parent grid."""
    n2 = fine_field.shape[0]
    n = n2 // 2
    return fine_field.reshape(n, 2, n, 2, n, 2).mean(axis=(1, 3, 5))


def prolong(base_field: jax.Array) -> jax.Array:
    """Copy parents into their 2x2x2 children (the reference's refine-time
    copy, equiSources.f90:1892-1896)."""
    return jnp.repeat(jnp.repeat(jnp.repeat(base_field, 2, 0), 2, 1), 2, 2)


def prolong_mask(refined: jax.Array) -> jax.Array:
    return prolong(refined)


def make_amr_state(base: FieldState, refined, fine: FieldState | None = None
                   ) -> AMRState:
    """Build an AMRState; absent fine data is prolonged from the base."""
    refined = jnp.asarray(refined, bool)
    if fine is None:
        fine = jax.tree_util.tree_map(
            lambda x: (prolong(x) if x.ndim == 3 else
                       jnp.stack([prolong(x[i]) for i in range(x.shape[0])])),
            base)
    return AMRState(base=base, fine=fine, refined=refined)


def sync_restriction(state: AMRState) -> AMRState:
    """Write the restriction of fine leaves into their base parents so
    base-level fields are consistent for diagnostics and coarse transport."""
    def rs(b, f):
        if b.ndim == 3:
            return jnp.where(state.refined, restrict(f), b)
        return jnp.stack([jnp.where(state.refined, restrict(f[i]), b[i])
                          for i in range(b.shape[0])])
    base = jax.tree_util.tree_map(rs, state.base, state.fine)
    return dataclasses.replace(state, base=base)


def amr_from_levels(levels, read_metals: bool, dtype=None,
                    smooth_metals: bool = True):
    """Two-level AMRState from ingested level lists (grid construction,
    equiSources.f90:580-618).

    Level-1 cells define the base grid; level-2 cells mark their parents
    refined and fill the fine grid (deeper levels are conservatively
    averaged onto level 2 until deeper dense levels land).
    """
    import jax.numpy as jnp
    from ..io import grid_io
    dtype = dtype or jnp.float32
    levels, box = grid_io.normalize_coordinates(levels)
    n = round(levels[0].ncell ** (1.0 / 3.0))
    geom = GridGeometry(n, n, n, box)

    base_dense = grid_io.levels_to_dense(levels[:1], n, read_metals)
    abun2 = base_dense["abun2"]
    if read_metals and smooth_metals:
        abun2 = grid_io.smooth_metallicity(abun2)
    base = make_state(base_dense["nh"] * MH / PSI, base_dense["tgas"],
                      base_dense["nh"] * base_dense["xneu"],
                      abun2=abun2, dtype=dtype)

    refined = np.zeros((n, n, n), bool)
    if len(levels) > 1 and levels[1].ncell > 0:
        fine_dense = grid_io.levels_to_dense(
            [grid_io.LevelData(pos=lv.pos, lT=lv.lT, lnH=lv.lnH, lx=lv.lx,
                               vel=lv.vel, abun=lv.abun)
             for lv in levels[1:]], 2 * n, read_metals)
        idx = np.clip((levels[1].pos * n).astype(int), 0, n - 1)
        refined[idx[:, 0], idx[:, 1], idx[:, 2]] = True
        # fill unrefined fine regions by prolongation so the dense fine
        # fields are everywhere defined
        filled = {}
        ref_f = np.repeat(np.repeat(np.repeat(refined, 2, 0), 2, 1), 2, 2)
        for k in ("nh", "tgas", "xneu", "abun2"):
            pb = np.repeat(np.repeat(np.repeat(base_dense[k], 2, 0), 2, 1), 2, 2)
            filled[k] = np.where(ref_f & (fine_dense[k] > 0), fine_dense[k], pb)
        fine = make_state(filled["nh"] * MH / PSI, filled["tgas"],
                          filled["nh"] * filled["xneu"],
                          abun2=filled["abun2"], dtype=dtype)
    else:
        fine = None

    state = make_amr_state(base, jnp.asarray(refined), fine)
    return sync_restriction(state), geom
