"""Host replay of the tracer's final phase: alive-lane fraction per step.

Sizes the dead-lane compaction win (VERDICT r2 weak-2): lockstep marching
pays full-R gather/deposit/scatter cost every step even as rays die.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from radiativetransfer_tpu.constants import KPC, rmax_table
from radiativetransfer_tpu.core import rays
from radiativetransfer_tpu.core.state import GridGeometry, uniform_state
from radiativetransfer_tpu.tables import stellar

N = int(os.environ.get("ROOF_N", "128"))
NSRC = int(os.environ.get("ROOF_SOURCES", "8"))


def main():
    import dataclasses
    n = N
    pop = stellar.blackbody_population(q_ionizing=1.0e51)
    t = stellar.build_source_tables(pop, 0, 0.0, 0, 0.0)
    geom = GridGeometry(n, n, n, 2000.0 * KPC)
    quad_a, quad_w = stellar.quadrature_arrays(pop, 0, 0.0, 0, 0.0)
    log_vol = float(np.log(geom.cell_size) * 3)
    tables = {"quad_A": jnp.asarray(quad_a, jnp.float32),
              "quad_W": jnp.asarray(quad_w / np.exp(log_vol),
                                    jnp.float32)[None]}
    rng = np.random.default_rng(0)
    pos = (np.floor(rng.uniform(0.3, 0.7, (NSRC, 3)) * n) + 0.5) / n
    src = rays.SourceBatch(position=pos, weight=np.ones(NSRC),
                           table_idx=np.zeros(NSRC, np.int32))
    state = uniform_state(n, nh=2e-4, tgas=1.5e4, dtype=jnp.float32)

    dtype = jnp.float32
    rmax = rmax_table()
    fields_pk = rays._pack_fields(
        state.HI.astype(dtype).reshape(-1),
        state.HeI.astype(dtype).reshape(-1),
        state.HeII.astype(dtype).reshape(-1),
        state.nh.astype(dtype).reshape(-1),
        state.abun2.astype(dtype).reshape(-1))
    fp = np.asarray(fields_pk, np.float64)
    cs = geom.cell_size
    from radiativetransfer_tpu.constants import (SIGMA24_AT_NU1,
                                                 SIGMA25_AT_NU3,
                                                 SIGMA26_AT_NU2)
    rf = rays.RateFields(*[jnp.zeros(n ** 3, dtype) for _ in range(6)])
    rate_ctx = ("quadrature", (tables["quad_A"], tables["quad_W"]))
    diag = rays.RayDiagnostics.zeros(src.n_sources, dtype)
    st = rays._spawn_phase(src, 1, dtype)
    st = dataclasses.replace(
        st, cell=jnp.clip((st.pos * n).astype(jnp.int32), 0, n - 1))

    for level in range(1, 7):
        last = level == 6
        r_stop = rmax[level - 1]
        max_steps = int(12 * n + 64) if last else int(6 * (r_stop + 2) + 32)
        src_of_ray = jnp.repeat(
            jnp.arange(src.n_sources, dtype=jnp.int32),
            12 * 4 ** (level - 1))

        pos_h = np.asarray(st.pos, np.float64)
        cell = np.asarray(st.cell, np.int64)
        d = np.asarray(st.direction, np.float64)
        alive = np.asarray(st.alive)
        radius = np.asarray(st.radius, np.float64)
        depth = np.asarray(st.depth, np.float64)[:, :3].copy()
        R = alive.shape[0]
        alive_hist = []
        it = 0
        while alive.any() and it < max_steps:
            alive_hist.append(int(alive.sum()))
            d_safe = np.where(np.abs(d) < 1e-12,
                              np.where(d < 0, -1e-12, 1e-12), d)
            bound = (cell + (d_safe > 0)) / n
            t_ax = (bound - pos_h) / d_safe
            t_min = np.maximum(t_ax.min(1), 0.0)
            exit_axis = t_ax.argmin(1)
            seg = t_min * n
            radius_new = radius + seg
            if last:
                cut = np.zeros_like(alive)
                will_split = cut
            else:
                will_split = radius_new >= r_stop
                cut = will_split
                seg = np.where(cut, np.maximum(r_stop - radius, 0.0), seg)
                radius_new = radius + seg
                t_min = seg / n
            idx = np.clip((cell[:, 0] * n + cell[:, 1]) * n + cell[:, 2],
                          0, n ** 3 - 1)
            plen = seg * cs
            tau = np.stack([plen * fp[idx, 0] * SIGMA24_AT_NU1,
                            plen * fp[idx, 1] * SIGMA26_AT_NU2,
                            plen * fp[idx, 2] * SIGMA25_AT_NU3], 1)
            tau = np.where(alive[:, None], np.maximum(tau, 0), 0)
            depth = depth + tau
            pos_new = pos_h + t_min[:, None] * d
            hop = np.eye(3, dtype=np.int64)[exit_axis] * np.where(
                d_safe > 0, 1, -1)
            cell_new = np.where(cut[:, None], cell, cell + hop)
            face = np.take_along_axis(bound, exit_axis[:, None], 1)[:, 0]
            on = np.arange(3)[None, :] == exit_axis[:, None]
            pos_new = np.where(on & ~cut[:, None], face[:, None], pos_new)
            oob = ((cell_new < 0) | (cell_new >= n)).any(1) & ~cut
            killed = depth.min(1) > 100.0
            pos_h = np.where(alive[:, None], pos_new, pos_h)
            cell = np.where(alive[:, None], cell_new, cell)
            radius = np.where(alive, radius_new, radius)
            alive = alive & ~oob & ~killed & ~will_split
            it += 1
        ah = np.array(alive_hist)
        mean_frac = ah.sum() / (R * max(it, 1))
        print(f"phase {level}: R={R:7d} steps={it:4d} "
              f"alive-lane-steps={ah.sum():9d} mean_alive={mean_frac:6.1%}")
        if last:
            # decile summary of the alive trajectory
            qs = [ah[min(int(len(ah) * q), len(ah) - 1)]
                  for q in (0, .1, .2, .3, .5, .7, .9)]
            print(f"  final-phase alive counts at 0/10/20/30/50/70/90% of "
                  f"steps: {qs}")
            # cost model: compaction every C steps to next bucket (pow2)
            for C in (16, 32, 64):
                cost = 0
                cur = R
                for s0 in range(0, it, C):
                    a_max = ah[s0:s0 + C].max()
                    b = 1 << int(np.ceil(np.log2(max(a_max, 256))))
                    cur = min(cur, b)
                    cost += cur * min(C, it - s0)
                print(f"  compaction every {C:3d} steps (pow2 buckets): "
                      f"lane-steps {cost} = {cost / (R * it):5.1%} of lockstep")

        st, diag, rf = rays._march_phase(st, fields_pk, geom, rate_ctx,
                                         diag, rf, r_stop, last, 0,
                                         max_steps, src_of_ray, n_bands=3)
        if not last:
            st, _, _ = rays._split_rays(st, level, n, dtype)


if __name__ == "__main__":
    main()
