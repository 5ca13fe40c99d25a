"""Headline benchmark: diffuse-sweep throughput in grid-cells x angles / s.

Runs the full 192-direction (nAngularLevel=3) three-band sweep on a 256^3
uniform grid in float32 on the available accelerator, matching the
BASELINE.json north-star metric.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured throughput relative to the 1e9 cells x angles / s
per-chip target recorded in BASELINE.md (the reference publishes no numbers;
the target is this project's own speed-of-light estimate).

Environment knobs:
  BENCH_N       grid size per side (default 256)
  BENCH_LEVEL   angular level (default 3 -> 192 directions)
  BENCH_REPS    timed repetitions (default 3)
  BENCH_IMPL    pallas | xla (default: pallas on TPU)
  BENCH_KIND    sweep (default, the headline metric) | rays
                (point-source tracer throughput in ray-segments/s) | step
                (full mode-8 transport+chemistry iteration, cells/s)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TARGET_CELLS_ANGLES_PER_S = 1.0e9


def bench_rays() -> None:
    """Point-source tracer throughput: S sources at maxPixelLevel 6 on a
    BENCH_N^3 grid (12288 rays/source at the final phase)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from radiativetransfer_tpu.constants import KPC
    from radiativetransfer_tpu.core import rays
    from radiativetransfer_tpu.core.state import GridGeometry, uniform_state
    from radiativetransfer_tpu.tables import stellar

    platform = jax.devices()[0].platform
    n = int(os.environ.get("BENCH_N", "128"))
    n_src = int(os.environ.get("BENCH_SOURCES", "8"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    if platform == "cpu" and "BENCH_N" not in os.environ:
        n, n_src = 32, 2

    pop = stellar.blackbody_population(q_ionizing=1.0e51)
    t = stellar.build_source_tables(pop, 0, 0.0, 0, 0.0)
    # volume-normalize like core.step.StellarContext so f32 rates are finite
    geom_cell = (2000.0 / n) * KPC
    log_vol = float(np.log(geom_cell) * 3)
    quad_a, quad_w = stellar.quadrature_arrays(pop, 0, 0.0, 0, 0.0)
    tables = {"reaction_log": jnp.asarray(t.reaction_log - log_vol,
                                          jnp.float32)[None],
              "energy_log": jnp.asarray(t.energy_log - log_vol,
                                        jnp.float32)[None],
              "quad_A": jnp.asarray(quad_a, jnp.float32),
              "quad_W": jnp.asarray(quad_w / np.exp(log_vol),
                                    jnp.float32)[None],
              "output_freq": t.output_freq,
              "output_sigma24": t.output_sigma24,
              "output_sigma25": t.output_sigma25,
              "output_sigma26": t.output_sigma26,
              "output_sigma_dust": t.output_sigma_dust}
    rates_mode = os.environ.get("BENCH_RAYS_MODE", "quadrature")
    n_bands = int(os.environ.get("BENCH_BANDS", "3"))
    rng = np.random.default_rng(0)
    pos = rng.uniform(0.3, 0.7, (n_src, 3))
    pos = (np.floor(pos * n) + 0.5) / n
    src = rays.SourceBatch(position=pos, weight=np.ones(n_src),
                           table_idx=np.zeros(n_src, np.int32))
    geom = GridGeometry(n, n, n, 2000.0 * KPC)
    state = uniform_state(n, nh=2e-4, tgas=1.5e4, dtype=jnp.float32)

    def run():
        rf, diag = rays.trace_point_sources(state, geom, src, tables,
                                            max_pixel_level=6,
                                            dtype=jnp.float32,
                                            rates_mode=rates_mode,
                                            n_bands=n_bands)
        return float(jnp.sum(rf.krate24))

    run()  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    # rays at the final level dominate; count total ray-phase slots
    total_rays = n_src * sum(12 * 4 ** (l - 1) for l in range(1, 7))
    value = total_rays / dt
    print(json.dumps({
        "metric": f"point-source rays/s ({n}^3 grid, {n_src} sources, "
                  f"maxPixelLevel 6, {rates_mode} rates, {platform})",
        "value": value,
        "unit": "rays/s",
        "vs_baseline": value / 1.0e6,
    }))


def bench_step() -> None:
    """Full production iteration: mode-8 (point-source trace + 192-dir
    sweep + equilibrium chemistry) on a BENCH_N^3 grid, f32 — the
    end-to-end cells/s a CLI run sees per iteration."""
    import jax
    import jax.numpy as jnp

    from radiativetransfer_tpu.config import RunConfig
    from radiativetransfer_tpu.constants import KPC, MYR
    from radiativetransfer_tpu.core import rays
    from radiativetransfer_tpu.core import step as step_mod
    from radiativetransfer_tpu.core.state import GridGeometry, uniform_state
    from radiativetransfer_tpu.tables import stellar

    platform = jax.devices()[0].platform
    n = int(os.environ.get("BENCH_N", "128"))
    level = int(os.environ.get("BENCH_LEVEL", "3"))
    n_src = int(os.environ.get("BENCH_SOURCES", "8"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    if platform == "cpu" and "BENCH_N" not in os.environ:
        n, level = 32, 1

    cfg = RunConfig(mode=8, current_redshift=6.55, n_angular_level=level,
                    reionization_model=10, grid="bench")
    geom = GridGeometry(n, n, n, 2000.0 * KPC)
    model = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    pos = (np.floor(rng.uniform(0.3, 0.7, (n_src, 3)) * n) + 0.5) / n
    batch = rays.SourceBatch(position=pos, weight=np.ones(n_src),
                             table_idx=np.zeros(n_src, np.int32))
    pop = stellar.blackbody_population(q_ionizing=1.0e51)
    ctx = step_mod.StellarContext.build(pop, batch, geom, 10.0 * MYR,
                                        metal_coefs=[(0, 0.0)])
    step = model.make_step(stellar=ctx)
    state = uniform_state(n, nh=2e-4, tgas=1.5e4, dtype=jnp.float32)

    def sync(st):
        return float(jnp.sum(st.HI))

    out, _ = step(state)
    sync(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, _ = step(state)
        sync(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    ndir = 12 * 4 ** (level - 1)
    value = n ** 3 / dt
    print(json.dumps({
        "metric": f"full mode-8 step cells/s ({n}^3, {ndir} directions, "
                  f"{n_src} sources, f32, {platform})",
        "value": value,
        "unit": "cells/s",
        "vs_baseline": dt,   # seconds per full iteration
    }))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from radiativetransfer_tpu.constants import KPC
    from radiativetransfer_tpu.core import sweep

    kind = os.environ.get("BENCH_KIND", "sweep")
    if kind == "rays":
        bench_rays()
        return
    if kind == "step":
        bench_step()
        return

    n = int(os.environ.get("BENCH_N", "256"))
    level = int(os.environ.get("BENCH_LEVEL", "3"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    platform = jax.devices()[0].platform
    if platform == "cpu" and "BENCH_N" not in os.environ:
        n = 64  # keep the CPU fallback tractable

    ndir = 12 * 4 ** (level - 1)
    rng = np.random.default_rng(0)
    cell = (2000.0 / n) * KPC
    kappa = jnp.asarray(
        rng.lognormal(mean=0.0, sigma=1.0, size=(3, n, n, n)) * (0.5 / cell),
        jnp.float32)
    uvb = jnp.asarray([1e-21, 5e-22, 1e-22], jnp.float32)

    plan = sweep.build_sweep_plan(level, n)
    impl = os.environ.get("BENCH_IMPL", "pallas" if platform != "cpu" else "xla")
    if impl == "pallas" and platform == "cpu":
        print("note: Pallas kernels need a TPU backend; falling back to the "
              "XLA sweep on cpu", file=sys.stderr)
        impl = "xla"
    # clamped is the shipped f32 default since round 5 (production A/B:
    # neutral-fraction deltas <= 8e-7; BASELINE.md) — the bench measures
    # what production runs
    logmean = os.environ.get("BENCH_LOGMEAN", "clamped")
    if impl == "pallas":
        from radiativetransfer_tpu.core import sweep_pallas
        run = sweep_pallas.make_jitted_sweep_pallas(plan, logmean=logmean)
    else:
        run = sweep.make_jitted_sweep(plan)

    def sync(x):
        # fetch a data-dependent scalar: block_until_ready alone returns
        # early through the axon relay
        return float(jnp.sum(x))

    # compile + warm up; on a flaky remote worker fall back to the XLA sweep
    try:
        sync(run(kappa, uvb, cell))
    except Exception as e:  # pragma: no cover - remote-worker resilience
        if impl == "pallas":
            print(f"note: pallas sweep failed ({type(e).__name__}); "
                  f"falling back to xla", file=sys.stderr)
            impl = "xla"
            run = sweep.make_jitted_sweep(plan)
            sync(run(kappa, uvb, cell))
        else:
            raise

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = sync(run(kappa, uvb, cell))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    cells_angles = n ** 3 * ndir
    value = cells_angles / dt
    record = {
        "metric": f"sweep cells*angles/s ({n}^3 grid, {ndir} directions, "
                  f"3 bands, {impl}"
                  + (", clamped logmean" if logmean != "exact" else "")
                  + f", {platform})",
        "value": value,
        "unit": "cells*angles/s",
        "vs_baseline": value / TARGET_CELLS_ANGLES_PER_S,
    }

    # ---- roofline accounting (VERDICT round-1 item 3) -------------------
    # bytes moved per sweep (merged flip-folded launches, sweep_pallas):
    # 6 (permutation, slab-order) groups each stream kappa in + Jmean out;
    # the 2 non-identity axis permutations transpose kappa in and the
    # result back (one read + one write each); one final accumulation pass.
    if os.environ.get("BENCH_ROOFLINE", "1") == "1" and impl == "pallas":
        field_gb = 3 * n ** 3 * 4 / 1e9
        n_groups, n_perms = 6, 3
        bytes_gb = (n_groups * 2 * field_gb          # launch kappa in / J out
                    + (n_perms - 1) * 2 * 2 * field_gb  # transposes there+back
                    + n_perms * 2 * field_gb)        # J accumulation adds
        hbm_peak = float(os.environ.get("BENCH_HBM_PEAK_GBPS", "819"))
        record["hbm_gb_per_sweep"] = round(bytes_gb, 3)
        record["pct_hbm_roofline"] = round(100 * bytes_gb / dt / hbm_peak, 2)
        # compute floor: the masked kernel evaluates 3 bands x 3 segments
        # = 9 exp per cell-direction; measure this chip's exp throughput
        try:
            from jax.experimental import pallas as pl

            def _exp_kernel(x_ref, o_ref):
                acc = x_ref[...]
                for _ in range(8):
                    acc = jnp.exp(-acc)
                o_ref[...] = acc

            def _exp_bench(x):
                return pl.pallas_call(
                    _exp_kernel,
                    grid=(n,),
                    in_specs=[pl.BlockSpec((3, 1, n, n),
                                           lambda i: (0, i, 0, 0))],
                    out_specs=pl.BlockSpec((3, 1, n, n),
                                           lambda i: (0, i, 0, 0)),
                    out_shape=jax.ShapeDtypeStruct((3, n, n, n), jnp.float32),
                )(x)

            def _chain(k):
                def f(x):
                    for _ in range(k):
                        x = _exp_bench(x)
                    return x
                return jax.jit(f)

            # slope between k=2 and k=6 cancels dispatch/tunnel latency;
            # min over reps rejects contention/noise (a single-shot slope
            # can go negative and blow the rate up to nonsense)
            e2, e6 = _chain(2), _chain(6)
            sync(e2(kappa * cell)), sync(e6(kappa * cell))
            t2s, t6s = [], []
            for _ in range(3):
                t0 = time.perf_counter()
                sync(e2(kappa * cell))
                t2s.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                sync(e6(kappa * cell))
                t6s.append(time.perf_counter() - t0)
            slope = min(t6s) - min(t2s)
            exp_rate = 4 * 8 * 3 * n ** 3 / max(slope, 1e-9)
            if exp_rate < 1e14:   # > ~100x any real VPU: measurement junk
                exp_floor_s = cells_angles * 9 / exp_rate
                record["exp_per_s"] = f"{exp_rate:.3e}"
                record["pct_compute_roofline"] = round(
                    100 * exp_floor_s / dt, 1)
        except Exception:  # pragma: no cover - roofline is best-effort
            pass

    print(json.dumps(record))


if __name__ == "__main__":
    main()
