"""Two-level AMR point-source ray tracer.

Extends the lockstep phased tracer (core.rays) to nested grids: every ray
tracks its containing FINE cell index; the cell's refinement state selects
the local resolution for face crossings, optical depths, and deposits.

Reference semantics preserved (equiSources.f90:2412-2595, 3120-3385):

* segment geometry at the local cell size (drawSegment operates in
  current-cell units);
* the split criterion radius*2^level + len < rmax(pixelLevel) — rays inside
  refined regions split at HALF the base-unit radius, keeping the ray
  density matched to the local cell size (:2491);
* rate deposits into the leaf cell actually traversed (fine under refined
  parents, base elsewhere);
* face hand-off across refinement boundaries by exact face-index
  arithmetic (the dense analog of findXY/YZ/XZNeighbour + zoom*,
  :2647-2960).
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
    NO_DUST,
    N_RADIUS,
    OUTPUT_RADII_KPC,
    SIGMA24_AT_NU1,
    SIGMA25_AT_NU3,
    SIGMA26_AT_NU2,
    SIGMA_DUST_AT_NU1,
    rmax_table,
)
from .rays import (
    RateFields,
    RayDiagnostics,
    SourceBatch,
    _RayState,
    _interp_bucketed,
    _spawn_phase,
    _split_rays,
)

_TAU_KILL = 100.0


def _march_phase_amr(state: _RayState, fields, geom, tables,
                     diag: RayDiagnostics, rf_base: RateFields,
                     rf_fine: RateFields, r_stop: float, last_phase: bool,
                     dust_approximation: int, max_steps: int, src_of_ray):
    """March one phase on a two-level grid.

    state.cell holds FINE (2n-grid) indices; fields holds flattened base
    ('HI', ...) and fine ('HI_f', ...) arrays plus 'refined' (n^3,).
    """
    n = geom.nx
    n2 = 2 * n
    cell_size = geom.cell_size          # base cell [cm]
    dtype = state.ndot.dtype
    out_radii = jnp.asarray(np.array(OUTPUT_RADII_KPC) * KPC, dtype)
    reaction_log = tables["reaction_log"]
    energy_log = tables["energy_log"]

    def flat_base(cb):
        return (cb[:, 0] * n + cb[:, 1]) * n + cb[:, 2]

    def flat_fine(cf):
        return (cf[:, 0] * n2 + cf[:, 1]) * n2 + cf[:, 2]

    def step(carry):
        state, diag, rfb, rff, it = carry
        d = state.direction
        d_safe = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12), d)

        cf = state.cell                          # fine index (R,3)
        cb = cf >> 1                             # base index
        lvl1 = fields["refined"][flat_base(cb)]  # bool: in a refined parent

        dpos = (d_safe > 0.0).astype(cf.dtype)
        # exit faces in fine-grid units: fine faces where refined, the
        # parent's faces (even fine indices) elsewhere
        f_bound = jnp.where(lvl1[:, None], cf + dpos, 2 * (cb + dpos))
        t_ax = (f_bound / n2 - state.pos) / d_safe
        t_min = jnp.min(t_ax, axis=1)
        exit_axis = jnp.argmin(t_ax, axis=1)
        seg_cells = t_min * n                    # base-cell units

        # split criterion at the LOCAL level (:2491): effective stop radius
        # halves inside refined cells
        r_stop_local = jnp.where(lvl1, r_stop / 2.0, r_stop).astype(dtype)
        radius_new = state.radius + seg_cells
        if last_phase:
            will_split = jnp.zeros_like(state.alive)
            cut = jnp.zeros_like(state.alive)
        else:
            will_split = radius_new >= r_stop_local
            cut = will_split
            seg_cells = jnp.where(cut,
                                  jnp.maximum(r_stop_local - state.radius, 0.0),
                                  seg_cells)
            radius_new = state.radius + seg_cells
            t_min = seg_cells / n

        active = state.alive
        plen = seg_cells * cell_size

        ib = flat_base(cb)
        if_ = flat_fine(cf)
        hi = jnp.where(lvl1, fields["HI_f"][if_], fields["HI"][ib])
        hei = jnp.where(lvl1, fields["HeI_f"][if_], fields["HeI"][ib])
        heii = jnp.where(lvl1, fields["HeII_f"][if_], fields["HeII"][ib])
        ab2 = jnp.where(lvl1, fields["abun2_f"][if_], fields["abun2"][ib])
        nh = jnp.where(lvl1, fields["nH_f"][if_], fields["nH"][ib])

        tau1 = plen * hi * SIGMA24_AT_NU1
        tau2 = plen * hei * SIGMA26_AT_NU2
        tau3 = plen * heii * SIGMA25_AT_NU3
        if dust_approximation == NO_DUST:
            taud = jnp.zeros_like(tau1)
        elif dust_approximation == COMPLETE_SUBLIMATION:
            taud = plen * hi * SIGMA_DUST_AT_NU1 * ab2 / 0.2
        else:
            taud = plen * nh * SIGMA_DUST_AT_NU1 * ab2 / 0.2
        tau = jnp.stack([tau1, tau2, tau3, taud], axis=1)
        tau = jnp.where(active[:, None], tau, 0.0)

        # escape-fraction bookkeeping (equiSources.f90:3198-3226)
        r1 = state.radius * cell_size
        r2 = radius_new * cell_size
        in_seg = ((out_radii[None, :] >= r1[:, None])
                  & (out_radii[None, :] <= r2[:, None]) & active[:, None])
        ratio = jnp.where(in_seg,
                          (out_radii[None, :] - r1[:, None])
                          / jnp.maximum((r2 - r1)[:, None], 1e-30), 0.0)
        esc = state.ndot[:, None] * jnp.exp(
            -(ratio * (tau1 + taud)[:, None]
              + (state.depth[:, 0] + state.depth[:, 3])[:, None]))
        diag = dataclasses.replace(
            diag, ndot_remaining=diag.ndot_remaining
            .at[src_of_ray].add(jnp.where(in_seg, esc, 0.0)))
        crossing = in_seg[:, -1] & ~state.crossed
        cross_depth = jnp.where(crossing[:, None],
                                state.depth + ratio[:, -1:] * tau,
                                state.cross_depth)
        crossed = state.crossed | crossing

        # rate deposits into the traversed leaf (:3243-3260)
        tidx = state.table_idx
        d0 = state.depth

        def rates(depths):
            return _interp_bucketed(reaction_log, energy_log, tidx, depths,
                                    dust_approximation != NO_DUST)

        n_in, h_in = rates(d0)
        n_a1, h_a1 = rates(d0.at[:, 0].add(tau1))
        n_a2, h_a2 = rates(d0.at[:, 1].add(tau2))
        n_a3, h_a3 = rates(d0.at[:, 2].add(tau3))

        w = jnp.where(active, state.ndot, 0.0)
        wb = jnp.where(lvl1, 0.0, w)
        wf = jnp.where(lvl1, w, 0.0)

        def deposit(rf, wsel, idx):
            return RateFields(
                krate24=rf.krate24.at[idx].add(wsel * (n_in[:, 0] - n_a1[:, 0])),
                crate24=rf.crate24.at[idx].add(wsel * (h_in[:, 0] - h_a1[:, 0])),
                krate26=rf.krate26.at[idx].add(wsel * (n_in[:, 1] - n_a2[:, 1])),
                crate26=rf.crate26.at[idx].add(wsel * (h_in[:, 1] - h_a2[:, 1])),
                krate25=rf.krate25.at[idx].add(wsel * (n_in[:, 2] - n_a3[:, 2])),
                crate25=rf.crate25.at[idx].add(wsel * (h_in[:, 2] - h_a3[:, 2])),
            )

        rfb = deposit(rfb, wb, ib)
        rff = deposit(rff, wf, if_)

        # advance: snap the crossing coordinate onto the (fine-unit) face,
        # step the fine index by exact face arithmetic
        depth_new = state.depth + tau
        pos_new = state.pos + t_min[:, None] * d
        face_f = jnp.take_along_axis(f_bound, exit_axis[:, None], axis=1)[:, 0]
        on_axis = jnp.arange(3)[None, :] == exit_axis[:, None]
        pos_new = jnp.where(on_axis & ~cut[:, None],
                            (face_f / n2)[:, None], pos_new)
        pos_dir = d_safe > 0
        new_axis_idx = jnp.where(
            jnp.take_along_axis(pos_dir, exit_axis[:, None], axis=1)[:, 0],
            face_f, face_f - 1).astype(cf.dtype)
        # non-crossing axes: relocalize from position (handles coarse->fine
        # entry where the fine sub-cell must be picked).  Nudge downwind by
        # ~1e-6 of a fine cell so a position sitting exactly on a face
        # resolves to the cell the ray is entering — otherwise a ray born on
        # a face flip-flops between neighbors on zero-length segments.
        nudge = jnp.sign(d_safe) * (1.0e-6 / n2)
        cf_from_pos = jnp.clip(((pos_new + nudge) * n2).astype(cf.dtype),
                               0, n2 - 1)
        cell_new = jnp.where(on_axis, new_axis_idx[:, None], cf_from_pos)
        cell_new = jnp.where(cut[:, None], state.cell, cell_new)

        out_of_box = jnp.any((cell_new < 0) | (cell_new >= n2), axis=1) & ~cut
        killed_tau = jnp.min(depth_new, axis=1) > _TAU_KILL

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
        return state, diag, rfb, rff, it + 1

    def cond(carry):
        state, _, _, _, it = carry
        return jnp.any(state.alive) & (it < max_steps)

    state, diag, rf_base, rf_fine, _ = jax.lax.while_loop(
        cond, step, (state, diag, rf_base, rf_fine, jnp.int32(0)))
    return state, diag, rf_base, rf_fine


def _trace_all_phases_amr(fields, init_state, tables, geom, n_sources,
                          dust_approximation, max_pixel_level, dtype):
    n = geom.nx
    n2 = 2 * n
    rmax = rmax_table()
    diag = RayDiagnostics.zeros(n_sources, dtype)
    rfb = RateFields(*[jnp.zeros(n ** 3, dtype) for _ in range(6)])
    rff = RateFields(*[jnp.zeros(n2 ** 3, dtype) for _ in range(6)])
    state = init_state

    sig_ratio = jnp.stack([
        jnp.asarray(tables["output_sigma24"], dtype) / SIGMA24_AT_NU1,
        jnp.asarray(tables["output_sigma26"], dtype) / SIGMA26_AT_NU2,
        jnp.asarray(tables["output_sigma25"], dtype) / SIGMA25_AT_NU3,
        jnp.asarray(tables["output_sigma_dust"], dtype) / SIGMA_DUST_AT_NU1,
    ])

    for level in range(1, max_pixel_level + 1):
        last = level == max_pixel_level
        r_stop = rmax[level - 1]
        max_steps = int(12 * n + 64) if last else int(6 * (r_stop + 2) + 32)
        rays_per_source = 12 * 4 ** (level - 1)
        src_of_ray = jnp.repeat(jnp.arange(n_sources, dtype=jnp.int32),
                                rays_per_source)
        state, diag, rfb, rff = _march_phase_amr(
            state, fields, geom, tables, diag, rfb, rff, r_stop, last,
            dust_approximation, max_steps, src_of_ray)

        spec_tau = state.cross_depth @ sig_ratio
        contrib = jnp.where(state.crossed[:, None],
                            state.ndot[:, None] * jnp.exp(-spec_tau), 0.0)
        diag = dataclasses.replace(
            diag, ndot_spectrum=diag.ndot_spectrum.at[src_of_ray].add(contrib))
        state = dataclasses.replace(state, crossed=jnp.zeros_like(state.crossed))

        if not last:
            state, in_box, was_split = _split_rays(state, level, n, dtype, cell_grid=n2)
            lost = was_split & ~in_box
            out_radii = jnp.asarray(np.array(OUTPUT_RADII_KPC) * KPC, dtype)
            r2 = state.radius * geom.cell_size
            beyond = out_radii[None, :] > r2[:, None]
            src4 = jnp.repeat(src_of_ray, 4)
            diag = dataclasses.replace(
                diag, ndot_boundary=diag.ndot_boundary
                .at[src4].add(jnp.where(beyond & lost[:, None],
                                        state.ndot[:, None], 0.0)))

    return rfb, rff, diag


_TRACER_CACHE: dict = {}


def trace_point_sources_amr(amr_state, geom, sources: SourceBatch, tables,
                            dust_approximation: int = NO_DUST,
                            max_pixel_level: int = MAX_PIXEL_LEVEL,
                            dtype=jnp.float64):
    """Trace sources through a two-level AMRState.

    Returns (RateFields base, RateFields fine, RayDiagnostics).
    """
    n = geom.nx
    n2 = 2 * n
    b, f = amr_state.base, amr_state.fine
    fields = {
        "HI": b.HI.reshape(-1).astype(dtype),
        "HeI": b.HeI.reshape(-1).astype(dtype),
        "HeII": b.HeII.reshape(-1).astype(dtype),
        "nH": b.nh.reshape(-1).astype(dtype),
        "abun2": b.abun2.reshape(-1).astype(dtype),
        "HI_f": f.HI.reshape(-1).astype(dtype),
        "HeI_f": f.HeI.reshape(-1).astype(dtype),
        "HeII_f": f.HeII.reshape(-1).astype(dtype),
        "nH_f": f.nh.reshape(-1).astype(dtype),
        "abun2_f": f.abun2.reshape(-1).astype(dtype),
        "refined": amr_state.refined.reshape(-1),
    }
    state = _spawn_phase(sources, 1, dtype)
    state = dataclasses.replace(
        state, cell=jnp.clip((state.pos * n2).astype(jnp.int32), 0, n2 - 1))
    tables_dev = {k: jnp.asarray(v) for k, v in tables.items()}
    key = (geom, sources.n_sources, dust_approximation, max_pixel_level,
           jnp.dtype(dtype).name)
    if key not in _TRACER_CACHE:
        _TRACER_CACHE[key] = jax.jit(
            partial(_trace_all_phases_amr, geom=geom,
                    n_sources=sources.n_sources,
                    dust_approximation=dust_approximation,
                    max_pixel_level=max_pixel_level, dtype=dtype))
    return _TRACER_CACHE[key](fields, state, tables_dev)
