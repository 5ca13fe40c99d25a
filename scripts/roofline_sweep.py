"""Roofline measurement for the diffuse sweep (VERDICT round-1 item 3).

Methodology notes (hard-won on the axon-tunneled TPU):

* the tunnel adds ~25 ms round-trip to every host fetch, so each measured
  op is looped K times INSIDE one jitted call with a data dependency
  between iterations; the per-iteration time comes from the slope between
  K1 and K2 runs (latency and dispatch cancel);
* XLA's algebraic simplifier folds `x*c` chains and transpose pairs to
  nothing — the HBM stream probe must be a Pallas copy kernel (opaque to
  the simplifier), and elementwise micro-kernels must chain through a
  non-foldable op (exp/div of the previous result);
* an 8-op-per-element micro-kernel is HBM-BOUND (arithmetic intensity
  ~1 op/byte), so it measures bandwidth, not the VPU — the VPU probes
  chain 64 ops per element.

Measures on the real TPU:
  1. HBM stream (Pallas copy of a 3-band field)     -> GB/s
  2. the full Pallas sweep and the XLA scan sweep   -> cells*angles/s
  3. exp / div / fma VPU rates (64-deep chains)     -> op/s + sweep floors
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import sweep, sweep_pallas

N = int(os.environ.get("ROOF_N", "256"))
LEVEL = int(os.environ.get("ROOF_LEVEL", "3"))


def timed_loop(make_loop, x, k1=2, k2=6, reps=2):
    """Time op looped k inside jit; return per-iteration seconds via slope."""
    f1 = jax.jit(make_loop(k1))
    f2 = jax.jit(make_loop(k2))

    def run(f):
        out = f(x)
        s = float(jnp.sum(out))  # data-dependent fetch forces full sync
        return s

    run(f1), run(f2)  # compile
    t1 = min(_t(run, f1) for _ in range(reps))
    t2 = min(_t(run, f2) for _ in range(reps))
    return (t2 - t1) / (k2 - k1)


def _t(run, f):
    t0 = time.perf_counter()
    run(f)
    return time.perf_counter() - t0


def _plane_call(body):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    def call(x):
        return pl.pallas_call(
            kernel,
            grid=(N,),
            in_specs=[pl.BlockSpec((3, 1, N, N), lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((3, 1, N, N), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((3, N, N, N), jnp.float32),
        )(x)
    return call


def main():
    rng = np.random.default_rng(0)
    cell = (2000.0 / N) * KPC
    kappa = jnp.asarray(
        rng.lognormal(0.0, 1.0, (3, N, N, N)) * (0.5 / cell), jnp.float32)
    uvb = jnp.asarray([1e-21, 5e-22, 1e-22], jnp.float32)
    plan = sweep.build_sweep_plan(LEVEL, N)
    ndir = plan.n_directions
    field_gb = kappa.size * 4 / 1e9

    # 1. HBM stream: Pallas copy (read + write one field per pass)
    copy = _plane_call(lambda v: v + 1.0)

    def mk_stream(k):
        def f(x):
            for _ in range(k):
                x = copy(x)
            return x
        return f

    # per-pass ~0.5 ms, so long chains are needed to rise above timing noise
    dt = timed_loop(mk_stream, kappa, k1=16, k2=112)
    hbm_gbps = 2 * field_gb / dt
    print(f"1. HBM stream: {dt*1e3:8.2f} ms/pass -> {hbm_gbps:.0f} GB/s "
          f"(field = {field_gb:.3f} GB)")

    # 2. full pallas sweep, chained via kappa' = kappa*(1+eps*J)
    def mk_sweep(k):
        def f(x):
            for _ in range(k):
                j = sweep_pallas.diffuse_sweep_pallas(x, plan, uvb, cell)
                x = x + j * 1e-12
            return x
        return f

    dt_full = timed_loop(mk_sweep, kappa)
    print(f"2. full Pallas sweep: {dt_full*1e3:8.2f} ms "
          f"-> {N**3*ndir/dt_full:.3e} cells*angles/s")

    def mk_sweep_xla(k):
        def f(x):
            for _ in range(k):
                j = sweep.diffuse_sweep(x, plan, uvb, cell)
                x = x + j * 1e-12
            return x
        return f

    dt_xla = timed_loop(mk_sweep_xla, kappa, k1=1, k2=2, reps=1)
    print(f"2b. XLA scan sweep: {dt_xla*1e3:8.2f} ms "
          f"-> {N**3*ndir/dt_xla:.3e} cells*angles/s")

    # 3. VPU micro-kernels: 64-deep per-element chains (compute-bound)
    DEPTH = 64

    def vpu_bench(body):
        call = _plane_call(body)

        def mk(k):
            def f(x):
                for _ in range(k):
                    x = call(x)
                return x
            return f

        dtp = timed_loop(mk, kappa * cell)
        return DEPTH * 3 * N ** 3 / dtp

    def expn(x):
        acc = x
        for _ in range(DEPTH):
            acc = jnp.exp(-acc)
        return acc

    rate_e = vpu_bench(expn)
    # masked merged kernel: 3 bands x 3 segments = 9 exp per cell-direction
    sweep_exps = N ** 3 * ndir * 9
    print(f"3a. exp: {rate_e:.3e} exp/s "
          f"=> sweep's {sweep_exps:.2e} exps floor ~ "
          f"{sweep_exps/rate_e*1e3:.1f} ms")

    def divn(x):
        acc = x
        for _ in range(DEPTH):
            acc = 1.0 / (acc + 1.5)
        return acc

    rate_d = vpu_bench(divn)
    # hoisted-reciprocal kernel: 1 divide per (band, slab) tile element
    sweep_divs = N ** 3 * 3 * 6  # 6 (perm, order) launch groups
    print(f"3b. div: {rate_d:.3e} div/s "
          f"=> sweep's {sweep_divs:.2e} divs ~ "
          f"{sweep_divs/rate_d*1e3:.2f} ms")

    def muln(x):
        acc = x
        for _ in range(DEPTH):
            acc = acc * 1.0000001 + 0.1
        return acc

    rate_m = vpu_bench(muln)
    # ~14 mul/add/select per segment (tau, a-1, emi muls, branch, i*a, i*emi,
    # shift selects, accumulations)
    sweep_fma = N ** 3 * ndir * 9 * 14
    print(f"3c. fma: {rate_m:.3e} fma/s "
          f"=> sweep's ~{sweep_fma:.2e} fma ~ "
          f"{sweep_fma/rate_m*1e3:.1f} ms")

    print()
    hbm_floor = (6 * 2 + 2 * 2 * 2 + 3 * 2) * field_gb / hbm_gbps
    print(f"summary @ {N}^3 x {ndir} dirs: full {dt_full*1e3:.1f} ms; "
          f"exp floor {sweep_exps/rate_e*1e3:.1f} ms; "
          f"fma floor {sweep_fma/rate_m*1e3:.1f} ms; "
          f"HBM floor (merged launches) {hbm_floor*1e3:.1f} ms; "
          f"pct of combined compute floor "
          f"{100*(sweep_exps/rate_e + sweep_fma/rate_m)/dt_full:.0f}%")


if __name__ == "__main__":
    main()
