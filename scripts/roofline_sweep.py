"""Roofline measurement for the diffuse sweep (VERDICT round-1 item 3).

Times, on the real TPU:
  1. pure HBM stream (copy-scale of a 3-band field)  -> measured HBM GB/s
  2. the 24 zone transposes alone (rotate_to/from_sweep round trip)
  3. the full current Pallas sweep
  4. the per-zone kernels alone on pre-rotated inputs
  5. a pure-exp kernel with the sweep's transcendental count

Prints a breakdown so we know whether the sweep is HBM-, transpose-, or
VPU-transcendental-bound before touching the kernel.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import sweep, sweep_pallas
from radiativetransfer_tpu.geometry import octants

N = 256
LEVEL = 3
REPS = 3


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    # data-dependent sync (axon relay can return early on block_until_ready)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    rng = np.random.default_rng(0)
    cell = (2000.0 / N) * KPC
    kappa = jnp.asarray(
        rng.lognormal(0.0, 1.0, (3, N, N, N)) * (0.5 / cell), jnp.float32)
    uvb = jnp.asarray([1e-21, 5e-22, 1e-22], jnp.float32)
    plan = sweep.build_sweep_plan(LEVEL, N)
    ndir = plan.n_directions
    field_gb = kappa.size * 4 / 1e9

    # 1. HBM stream: read + write one field
    stream = jax.jit(lambda x: x * 1.0000001)
    dt = timeit(stream, kappa)
    hbm_gbps = 2 * field_gb / dt
    print(f"1. HBM stream: {dt*1e3:8.2f} ms  -> {hbm_gbps:.0f} GB/s "
          f"(field = {field_gb:.3f} GB)")

    # 2. transposes alone: all 24 rotate round-trips + accumulate
    def transposes(k):
        kl = jnp.moveaxis(k, 0, -1)
        acc = jnp.zeros_like(kl)
        for zone in plan.zones:
            krot = octants.rotate_to_sweep(kl, zone.izone)
            acc = acc + octants.rotate_from_sweep(krot * 1.0000001, zone.izone)
        return jnp.moveaxis(acc, -1, 0)

    dt_t = timeit(jax.jit(transposes), kappa)
    print(f"2. 24 zone transposes (round trip + acc): {dt_t*1e3:8.2f} ms "
          f"({24*4*field_gb/dt_t:.0f} GB/s effective)")

    # 3. full pallas sweep
    run = sweep_pallas.make_jitted_sweep_pallas(plan)
    dt_full = timeit(run, kappa, uvb, cell)
    print(f"3. full Pallas sweep: {dt_full*1e3:8.2f} ms "
          f"-> {N**3*ndir/dt_full:.3e} cells*angles/s")

    # 4. kernels alone on pre-rotated inputs
    pre = []
    for zone in plan.zones:
        krot = octants.rotate_to_sweep(jnp.moveaxis(kappa, 0, -1), zone.izone)
        krot = jnp.moveaxis(krot, -1, 1)
        lens, chains = sweep_pallas.zone_arrays(zone, cell, jnp.float32)
        pre.append((zone, jax.device_put(krot), lens, chains))

    def kernels_only():
        outs = []
        for zone, krot, lens, chains in pre:
            nslab, _, ny, nz = krot.shape
            outs.append(sweep_pallas._sweep_zone_pallas(
                krot, lens, chains, uvb, plan.weight,
                ndir=zone.ndir, nslab=nslab, ny=ny, nz=nz))
        return outs

    dt_k = timeit(kernels_only)
    print(f"4. zone kernels only (pre-rotated): {dt_k*1e3:8.2f} ms "
          f"({24*2*field_gb/dt_k:.0f} GB/s if HBM-bound)")

    # 5. pure exp kernel, same transcendental count as the sweep:
    #    ndir directions x 3 segments x 3 bands exps per cell
    n_exp_passes = ndir * 3  # passes over a (3,N,N,N) field

    def exp_kernel(x_ref, o_ref):
        acc = jnp.zeros_like(x_ref)
        for _ in range(8):  # 8 exps per grid step over the same tile
            acc = acc + jnp.exp(-x_ref[...])
        o_ref[...] = acc

    xpass = kappa * cell  # tau-like magnitudes

    @jax.jit
    def exp_bench(x):
        return pl.pallas_call(
            exp_kernel,
            grid=(N,),
            in_specs=[pl.BlockSpec((3, 1, N, N), lambda i: (0, i, 0, 0))],
            out_specs=pl.BlockSpec((3, 1, N, N), lambda i: (0, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((3, N, N, N), jnp.float32),
        )(x)

    dt_e = timeit(exp_bench, xpass)
    exps = 8 * 3 * N**3
    rate = exps / dt_e
    total_exps = n_exp_passes * N**3 * 3  # dirs*segs * cells * bands... see below
    # sweep exp count: per cell, ndir*3segs*3bands
    sweep_exps = N**3 * ndir * 3 * 3
    print(f"5. exp micro: {dt_e*1e3:8.2f} ms for {exps:.2e} exps "
          f"-> {rate:.3e} exp/s; sweep needs {sweep_exps:.2e} exps "
          f"=> exp floor ~ {sweep_exps/rate*1e3:.1f} ms")

    print()
    print(f"summary: full {dt_full*1e3:.1f} ms = transposes ~{dt_t*1e3:.1f} "
          f"+ kernels ~{dt_k*1e3:.1f}; exp floor {sweep_exps/rate*1e3:.1f} ms; "
          f"HBM floor (kernel 2 passes/zone) "
          f"{24*2*field_gb/hbm_gbps*1e3:.1f} ms")


if __name__ == "__main__":
    main()
