"""Point-source long-ray tracer, TPU-native.

The reference traces rays recursively, one source at a time, splitting each
ray 1->4 when the HEALPix inter-ray spacing exceeds a cell size
(startNewLongRay/drawSegment, /root/reference/equiSources.f90:2412-2595,
3120-3385).  The split radii rmax(l) depend only on the pixel level
(equiSources.f90:304-309), so on a uniform grid the recursion flattens into
LEVEL-SYNCHRONOUS PHASES:

  phase l = 1..maxPixelLevel: all rays of all sources at pixel level l march
  in lockstep from radius rmax(l-1) to rmax(l) (phase 1 starts at 0; the
  final phase marches until absorption tau>100 or the box boundary).  At a
  phase boundary every surviving ray spawns its 4 NESTED child pixels with
  ndot/4 and a lateral position adjustment (equiSources.f90:3303-3378).

Each march step is fully vectorized over the ray batch: distance-to-face
(min over 3 axes), optical-depth accumulation for the 4 channels
(HI/HeI/HeII/dust), 4-D table lookups for the photoionization/heating
deposits, and scatter-add of the per-cell rates.  Escape fractions at the 7
output radii and the emergent spectrum are accumulated on the fly
(equiSources.f90:3198-3233).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (
    COMPLETE_SUBLIMATION,
    KPC,
    MAX_PIXEL_LEVEL,
    MH,
    NENERGY,
    NO_DUST,
    NO_SUBLIMATION,
    N_RADIUS,
    OUTPUT_RADII_KPC,
    PSI,
    SIGMA24_AT_NU1,
    SIGMA25_AT_NU3,
    SIGMA26_AT_NU2,
    SIGMA_DUST_AT_NU1,
    rmax_table,
)
from ..geometry import healpix

_TAU_KILL = 100.0  # early ray termination (equiSources.f90:3241)


@dataclasses.dataclass(frozen=True)
class SourceBatch:
    """Sources prepared for tracing (host NumPy; static per iteration)."""
    position: np.ndarray    # (S, 3) box units [0,1)
    weight: np.ndarray      # (S,) merged particle multiplicity
    table_idx: np.ndarray   # (S,) index into the stacked SED tables

    @property
    def n_sources(self) -> int:
        return self.position.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RayDiagnostics:
    """Per-source escape-fraction and emergent-spectrum accumulators
    (localDefinitions, equiSources.f90:6-15; the reference resets these per
    source in its serial loop, :1266-1270)."""
    ndot_remaining: jax.Array   # (S, nradius)
    ndot_boundary: jax.Array    # (S, nradius)
    ndot_spectrum: jax.Array    # (S, nenergy)

    @classmethod
    def zeros(cls, n_sources: int, dtype=jnp.float32) -> "RayDiagnostics":
        return cls(ndot_remaining=jnp.zeros((n_sources, N_RADIUS), dtype),
                   ndot_boundary=jnp.zeros((n_sources, N_RADIUS), dtype),
                   ndot_spectrum=jnp.zeros((n_sources, NENERGY), dtype))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class _RayState:
    pos: jax.Array        # (R, 3) box units
    direction: jax.Array  # (R, 3)
    cell: jax.Array       # (R, 3) int32
    radius: jax.Array     # (R,) base-cell units
    ndot: jax.Array       # (R,)
    depth: jax.Array      # (R, 4) tau at the 4 thresholds
    alive: jax.Array      # (R,) bool: still marching this phase
    split: jax.Array      # (R,) bool: survived to the split radius
    table_idx: jax.Array  # (R,) int32
    # outer-radius crossing record for the emergent spectrum
    crossed: jax.Array    # (R,) bool
    cross_depth: jax.Array  # (R, 4)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RateFields:
    """Per-cell photo deposit accumulators, flattened (n^3,)."""
    krate24: jax.Array
    krate25: jax.Array
    krate26: jax.Array
    crate24: jax.Array
    crate25: jax.Array
    crate26: jax.Array


def _base_directions(n_rays_per_source: int, level: int) -> np.ndarray:
    nside = 2 ** (level - 1)
    phi, theta = healpix.pix2ang_nest(nside, np.arange(n_rays_per_source))
    return healpix.direction_vectors(phi, theta)


def _march_phase(state: _RayState, fields, geom, tables, diag: RayDiagnostics,
                 rate_fields: RateFields, r_stop: float, last_phase: bool,
                 dust_approximation: int, max_steps: int, src_of_ray):
    """March all rays of one phase until they die or reach r_stop.

    fields: dict with flattened HI, HeI, HeII, nH, abun2 (n^3,) arrays.
    tables: dict with reaction_log/energy_log (B,3,11,11,11,11) and the
            output_sigma arrays.
    """
    n = geom.nx
    cell_size = geom.cell_size
    dtype = state.ndot.dtype
    out_radii = jnp.asarray(np.array(OUTPUT_RADII_KPC) * KPC, dtype)

    reaction_log = tables["reaction_log"]
    energy_log = tables["energy_log"]

    def flat_idx(cell):
        return (cell[:, 0] * n + cell[:, 1]) * n + cell[:, 2]

    def step(carry):
        state, diag, rf, it = carry
        d = state.direction
        d_safe = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)
        # distance to the exit face along each axis (drawSegment,
        # equiSources.f90:2444-2475), in box units
        bound = (state.cell + (d_safe > 0.0)) / n
        t_ax = (bound - state.pos) / d_safe
        t_min = jnp.min(t_ax, axis=1)
        exit_axis = jnp.argmin(t_ax, axis=1)
        seg_cells = t_min * n            # length in base-cell units

        # split-radius cut (equiSources.f90:2491-2592)
        radius_new = state.radius + seg_cells
        if last_phase:
            will_split = jnp.zeros_like(state.alive)
            cut = jnp.zeros_like(state.alive)
        else:
            will_split = radius_new >= r_stop
            cut = will_split
            seg_cells = jnp.where(cut, jnp.maximum(r_stop - state.radius, 0.0),
                                  seg_cells)
            radius_new = state.radius + seg_cells
            t_min = seg_cells / n

        active = state.alive
        plen = seg_cells * cell_size      # physical segment length [cm]

        idx = flat_idx(state.cell)
        hi = fields["HI"][idx]
        hei = fields["HeI"][idx]
        heii = fields["HeII"][idx]
        # threshold optical depths (equiSources.f90:3180-3196)
        tau1 = plen * hi * SIGMA24_AT_NU1
        tau2 = plen * hei * SIGMA26_AT_NU2
        tau3 = plen * heii * SIGMA25_AT_NU3
        if dust_approximation == NO_DUST:
            taud = jnp.zeros_like(tau1)
        elif dust_approximation == COMPLETE_SUBLIMATION:
            taud = plen * hi * SIGMA_DUST_AT_NU1 * fields["abun2"][idx] / 0.2
        else:  # NO_SUBLIMATION
            taud = plen * fields["nH"][idx] * SIGMA_DUST_AT_NU1 * fields["abun2"][idx] / 0.2
        tau = jnp.stack([tau1, tau2, tau3, taud], axis=1)
        tau = jnp.where(active[:, None], tau, 0.0)

        # ---- escape-fraction bookkeeping (equiSources.f90:3198-3226) ----
        r1 = state.radius * cell_size
        r2 = radius_new * cell_size
        in_seg = (out_radii[None, :] >= r1[:, None]) & (out_radii[None, :] <= r2[:, None])
        in_seg = in_seg & active[:, None]
        ratio = jnp.where(in_seg,
                          (out_radii[None, :] - r1[:, None])
                          / jnp.maximum((r2 - r1)[:, None], 1e-30), 0.0)
        esc = state.ndot[:, None] * jnp.exp(
            -(ratio * (tau1 + taud)[:, None] + (state.depth[:, 0] + state.depth[:, 3])[:, None]))
        diag = dataclasses.replace(
            diag, ndot_remaining=diag.ndot_remaining
            .at[src_of_ray].add(jnp.where(in_seg, esc, 0.0)))
        # outermost-radius crossing record for the emergent spectrum
        crossing = in_seg[:, -1] & ~state.crossed
        cross_depth = jnp.where(
            crossing[:, None],
            state.depth + ratio[:, -1:] * tau, state.cross_depth)
        crossed = state.crossed | crossing

        # ---- rate deposits (equiSources.f90:3243-3260) ----
        # entry rates and each advanced-channel rate; the krate/crate
        # increments are entry-minus-exit differences per channel
        tidx = state.table_idx
        d0 = state.depth

        def rates(depths):
            return _interp_bucketed(reaction_log, energy_log, tidx, depths,
                                    dust_approximation != NO_DUST)

        n_in, h_in = rates(d0)
        adv1 = d0.at[:, 0].add(tau1)
        adv2 = d0.at[:, 1].add(tau2)
        adv3 = d0.at[:, 2].add(tau3)
        n_a1, h_a1 = rates(adv1)
        n_a2, h_a2 = rates(adv2)
        n_a3, h_a3 = rates(adv3)

        w = jnp.where(active, state.ndot, 0.0)
        rf = RateFields(
            krate24=rf.krate24.at[idx].add(w * (n_in[:, 0] - n_a1[:, 0])),
            crate24=rf.crate24.at[idx].add(w * (h_in[:, 0] - h_a1[:, 0])),
            krate26=rf.krate26.at[idx].add(w * (n_in[:, 1] - n_a2[:, 1])),
            crate26=rf.crate26.at[idx].add(w * (h_in[:, 1] - h_a2[:, 1])),
            krate25=rf.krate25.at[idx].add(w * (n_in[:, 2] - n_a3[:, 2])),
            crate25=rf.crate25.at[idx].add(w * (h_in[:, 2] - h_a3[:, 2])),
        )

        # ---- advance ----
        depth_new = state.depth + tau
        pos_new = state.pos + t_min[:, None] * d
        step_dir = jnp.where(d_safe > 0, 1, -1).astype(state.cell.dtype)
        hop = jax.nn.one_hot(exit_axis, 3, dtype=state.cell.dtype) * step_dir
        cell_new = jnp.where(cut[:, None], state.cell, state.cell + hop)
        # snap the crossing coordinate onto the face to avoid drift
        face = jnp.take_along_axis(bound, exit_axis[:, None], axis=1)[:, 0]
        pos_new = jnp.where((jnp.arange(3)[None, :] == exit_axis[:, None]) & ~cut[:, None],
                            face[:, None], pos_new)

        out_of_box = jnp.any((cell_new < 0) | (cell_new >= n), axis=1) & ~cut
        killed_tau = jnp.min(depth_new, axis=1) > _TAU_KILL

        # boundary accounting (equiSources.f90:3228-3233)
        hit_boundary = active & out_of_box
        beyond = out_radii[None, :] > r2[:, None]
        diag = dataclasses.replace(
            diag, ndot_boundary=diag.ndot_boundary
            .at[src_of_ray].add(jnp.where(beyond & hit_boundary[:, None],
                                          state.ndot[:, None], 0.0)))

        alive_new = active & ~out_of_box & ~killed_tau & ~will_split
        split_new = state.split | (active & will_split & ~killed_tau)

        state = dataclasses.replace(
            state, pos=jnp.where(active[:, None], pos_new, state.pos),
            cell=jnp.where(active[:, None], cell_new, state.cell),
            radius=jnp.where(active, radius_new, state.radius),
            depth=jnp.where(active[:, None], depth_new, state.depth),
            alive=alive_new, split=split_new,
            crossed=crossed, cross_depth=cross_depth)
        return state, diag, rf, it + 1

    def cond(carry):
        state, _, _, it = carry
        return jnp.any(state.alive) & (it < max_steps)

    state, diag, rate_fields, _ = jax.lax.while_loop(
        cond, step, (state, diag, rate_fields, jnp.int32(0)))
    return state, diag, rate_fields


def _interp_bucketed(reaction_log, energy_log, table_idx, depths, dust_on):
    """interp_rates_4d over stacked per-bucket tables.

    reaction_log/energy_log: (B, 3, 11,11,11,11); table_idx: (R,);
    depths: (R, 4).  Returns (number, heat) each (R, 3).
    """
    from ..constants import (MAX_OPTICAL_DEPTH1, MAX_OPTICAL_DEPTH2,
                             MAX_OPTICAL_DEPTH3, MAX_OPTICAL_DEPTH_DUST,
                             NDEPTH1, NDEPTH2, NDEPTH3, NDEPTH_DUST)
    t1, t2, t3, td = depths[:, 0], depths[:, 1], depths[:, 2], depths[:, 3]
    oor = ((t1 > MAX_OPTICAL_DEPTH1) | (t2 > MAX_OPTICAL_DEPTH2)
           | (t3 > MAX_OPTICAL_DEPTH3) | (td > MAX_OPTICAL_DEPTH_DUST))

    def idx_coef(tau, ndepth, maxdepth):
        pos = jnp.clip(tau, 0.0, maxdepth) / maxdepth * ndepth
        i = jnp.clip(pos.astype(jnp.int32), 0, ndepth - 1)
        return i, pos - i

    i1, c1 = idx_coef(t1, NDEPTH1, MAX_OPTICAL_DEPTH1)
    i2, c2 = idx_coef(t2, NDEPTH2, MAX_OPTICAL_DEPTH2)
    i3, c3 = idx_coef(t3, NDEPTH3, MAX_OPTICAL_DEPTH3)
    if dust_on:
        i4, c4 = idx_coef(td, NDEPTH_DUST, MAX_OPTICAL_DEPTH_DUST)
    else:
        i4, c4 = jnp.zeros_like(i1), jnp.zeros_like(c1)

    # flatten the 4-D corner indices to ONE gather index per corner: a
    # single-axis gather lowers to a fast path on TPU, while the 5-axis
    # advanced-indexing form produced a pathologically slow scatter-gather
    n1, n2_, n3, n4 = NDEPTH1 + 1, NDEPTH2 + 1, NDEPTH3 + 1, NDEPTH_DUST + 1
    B = reaction_log.shape[0]
    base_flat = table_idx * (n1 * n2_ * n3 * n4)

    def quad(table):
        t = table.reshape(B * n1 * n2_ * n3 * n4, 3)
        acc = 0.0
        for d1 in (0, 1):
            w1 = c1 if d1 else (1.0 - c1)
            for d2 in (0, 1):
                w2 = c2 if d2 else (1.0 - c2)
                for d3 in (0, 1):
                    w3 = c3 if d3 else (1.0 - c3)
                    for d4 in (0, 1):
                        w4 = c4 if d4 else (1.0 - c4)
                        f = (((i1 + d1) * n2_ + (i2 + d2)) * n3
                             + (i3 + d3)) * n4 + (i4 + d4) + base_flat
                        acc = acc + (w1 * w2 * w3 * w4)[:, None] * t[f]
        return jnp.exp(acc)

    live = jnp.where(oor, 0.0, 1.0)[:, None]
    # tables are stored (B, 3, n1, n2, n3, n4); move the band axis last so
    # the flattened gather picks 3 contiguous values per corner
    r_t = jnp.moveaxis(reaction_log, 1, -1)
    e_t = jnp.moveaxis(energy_log, 1, -1)
    return quad(r_t) * live, quad(e_t) * live


def _spawn_phase(sources: SourceBatch, level: int, dtype) -> _RayState:
    """Initial rays of phase 1: 12 base HEALPix rays per source
    (equiSources.f90:1308-1329)."""
    S = sources.n_sources
    dirs = _base_directions(12, 1)
    pos = np.repeat(sources.position, 12, axis=0)
    direction = np.tile(dirs, (S, 1))
    ndot = np.repeat(sources.weight, 12) / 12.0
    tidx = np.repeat(sources.table_idx, 12)
    R = S * 12
    return _RayState(
        pos=jnp.asarray(pos, dtype),
        direction=jnp.asarray(direction, dtype),
        cell=jnp.zeros((R, 3), jnp.int32),  # set by caller from pos
        radius=jnp.zeros(R, dtype),
        ndot=jnp.asarray(ndot, dtype),
        depth=jnp.zeros((R, 4), dtype),
        alive=jnp.ones(R, bool),
        split=jnp.zeros(R, bool),
        table_idx=jnp.asarray(tidx, jnp.int32),
        crossed=jnp.zeros(R, bool),
        cross_depth=jnp.zeros((R, 4), dtype))


def _split_rays(state: _RayState, level: int, n: int, dtype,
                cell_grid: int | None = None) -> _RayState:
    """Spawn the 4 NESTED children of every ray marked for splitting
    (equiSources.f90:3294-3378).  Shapes are static: every parent slot
    produces 4 child slots; dead parents produce dead children.

    n is the BASE grid size (the radius unit, :3325); cell_grid is the
    resolution at which state.cell indices live (2n for the AMR tracer).
    """
    cell_grid = cell_grid or n
    R = state.pos.shape[0]
    nside_child = 2 ** level          # children live at pixel level level+1
    # parent pixel p (0-based) at level `level` is implicit in ray order:
    # rays are laid out [source-major, pixel-minor] and children preserve it.
    parent_pix = np.tile(np.arange(12 * 4 ** (level - 1)),
                         R // (12 * 4 ** (level - 1)))
    child_pix = (4 * parent_pix[:, None] + np.arange(4)[None, :]).reshape(-1)
    phi, theta = healpix.pix2ang_nest(nside_child, child_pix)
    child_dirs = jnp.asarray(healpix.direction_vectors(phi, theta), dtype)

    rep = lambda a: jnp.repeat(a, 4, axis=0)
    parent_dir = rep(state.direction)
    radius = rep(state.radius)
    # lateral repositioning: keep the child ray through the correct point of
    # the splitting sphere (equiSources.f90:3325-3332)
    pos = rep(state.pos) + (radius / n)[:, None] * (child_dirs - parent_dir)
    in_box = jnp.all((pos >= 0.0) & (pos <= 1.0), axis=1)
    cell = jnp.clip((pos * cell_grid).astype(jnp.int32), 0, cell_grid - 1)

    return _RayState(
        pos=pos, direction=child_dirs, cell=cell, radius=radius,
        ndot=rep(state.ndot) / 4.0,
        depth=rep(state.depth),
        alive=rep(state.split) & in_box,
        split=jnp.zeros(pos.shape[0], bool),
        table_idx=rep(state.table_idx),
        crossed=rep(state.crossed),
        cross_depth=rep(state.cross_depth)), in_box, rep(state.split)


def _trace_all_phases(fields, init_state: _RayState, tables, geom,
                      n_sources: int, dust_approximation: int,
                      max_pixel_level: int, dtype):
    """All phases of the trace; pure function of arrays, jitted via
    _get_tracer (the phase loop unrolls at trace time)."""
    n = geom.nx
    rmax = rmax_table()
    diag = RayDiagnostics.zeros(n_sources, dtype)
    rf = RateFields(*[jnp.zeros(n * n * n, dtype) for _ in range(6)])
    state = init_state

    sig_ratio = jnp.stack([
        jnp.asarray(tables["output_sigma24"], dtype) / SIGMA24_AT_NU1,
        jnp.asarray(tables["output_sigma26"], dtype) / SIGMA26_AT_NU2,
        jnp.asarray(tables["output_sigma25"], dtype) / SIGMA25_AT_NU3,
        jnp.asarray(tables["output_sigma_dust"], dtype) / SIGMA_DUST_AT_NU1,
    ])  # (4, nenergy)

    for level in range(1, max_pixel_level + 1):
        last = level == max_pixel_level
        r_stop = rmax[level - 1]
        max_steps = int(6 * n + 64) if last else int(3 * (r_stop + 2) + 16)
        rays_per_source = 12 * 4 ** (level - 1)
        src_of_ray = jnp.repeat(jnp.arange(n_sources, dtype=jnp.int32),
                                rays_per_source)
        state, diag, rf = _march_phase(
            state, fields, geom, tables, diag, rf, r_stop, last,
            dust_approximation, max_steps, src_of_ray)

        # emergent spectrum from this phase's outer-radius crossings
        # (equiSources.f90:3206-3223)
        spec_tau = state.cross_depth @ sig_ratio      # (R, nenergy)
        contrib = jnp.where(state.crossed[:, None],
                            state.ndot[:, None] * jnp.exp(-spec_tau), 0.0)
        diag = dataclasses.replace(
            diag, ndot_spectrum=diag.ndot_spectrum.at[src_of_ray].add(contrib))
        # only count each crossing once
        state = dataclasses.replace(state, crossed=jnp.zeros_like(state.crossed))

        if not last:
            state, in_box, was_split = _split_rays(state, level, n, dtype)
            # children spawned outside the box are boundary losses
            lost = was_split & ~in_box
            out_radii = jnp.asarray(np.array(OUTPUT_RADII_KPC) * KPC, dtype)
            r2 = state.radius * geom.cell_size
            beyond = out_radii[None, :] > r2[:, None]
            src4 = jnp.repeat(src_of_ray, 4)
            diag = dataclasses.replace(
                diag, ndot_boundary=diag.ndot_boundary
                .at[src4].add(jnp.where(beyond & lost[:, None],
                                        state.ndot[:, None], 0.0)))

    return rf, diag


_TRACER_CACHE: dict = {}


def _get_tracer(geom, n_sources: int, dust_approximation: int,
                max_pixel_level: int, dtype):
    """Compiled tracer, cached on the static configuration so repeated
    iterations reuse the executable."""
    key = (geom, n_sources, dust_approximation, max_pixel_level,
           jnp.dtype(dtype).name)
    if key not in _TRACER_CACHE:
        _TRACER_CACHE[key] = jax.jit(
            partial(_trace_all_phases, geom=geom, n_sources=n_sources,
                    dust_approximation=dust_approximation,
                    max_pixel_level=max_pixel_level, dtype=dtype))
    return _TRACER_CACHE[key]


def trace_point_sources(state_fields, geom, sources: SourceBatch, tables,
                        dust_approximation: int = NO_DUST,
                        max_pixel_level: int = MAX_PIXEL_LEVEL,
                        dtype=jnp.float64):
    """Trace all sources; returns (RateFields on the grid, RayDiagnostics).

    state_fields: FieldState (dense (n,n,n) fields).
    tables: dict with 'reaction_log'/'energy_log' (B,3,11^4 shapes) and
            'output_sigma24/25/26/dust' + 'output_freq' (nenergy,).
    """
    n = geom.nx
    fields = {
        "HI": state_fields.HI.reshape(-1).astype(dtype),
        "HeI": state_fields.HeI.reshape(-1).astype(dtype),
        "HeII": state_fields.HeII.reshape(-1).astype(dtype),
        "nH": state_fields.nh.reshape(-1).astype(dtype),
        "abun2": state_fields.abun2.reshape(-1).astype(dtype),
    }
    state = _spawn_phase(sources, 1, dtype)
    state = dataclasses.replace(
        state, cell=jnp.clip((state.pos * n).astype(jnp.int32), 0, n - 1))
    tables_dev = {k: jnp.asarray(v) for k, v in tables.items()}
    tracer = _get_tracer(geom, sources.n_sources, dust_approximation,
                         max_pixel_level, dtype)
    return tracer(fields, state, tables_dev)


def escape_fractions(diag: RayDiagnostics, weights: np.ndarray) -> np.ndarray:
    """Per-source fraction(iradius) = remaining/(ndot1 - boundary)
    (equiSources.f90:1342-1348).  weights: (S,) merged multiplicities
    (= ndot1 per source).  Returns (S, nradius)."""
    nb = np.asarray(diag.ndot_boundary)
    nr = np.asarray(diag.ndot_remaining)
    w = np.asarray(weights, np.float64)[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        frac = np.where(nb < w, nr / np.where(nb < w, w - nb, 1.0), 0.0)
    return frac


def cosmic_spectrum(diag: RayDiagnostics, weights: np.ndarray,
                    n_stars_specific_age: int) -> np.ndarray:
    """Emergent spectrum averaged over sources
    (equiSources.f90:1350-1366): sum_s w_s * spectrum_s/(w_s - boundary_s)
    divided by nStarsSpecificAge."""
    w = np.asarray(weights, np.float64)[:, None]
    nb = np.asarray(diag.ndot_boundary)[:, -1:]
    spec = np.asarray(diag.ndot_spectrum)
    denom = np.where(nb < w, w - nb, np.inf)
    return (w * spec / denom).sum(axis=0) / max(n_stars_specific_age, 1)
