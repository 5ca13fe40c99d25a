"""Prototype: Pallas serialized VMEM scatter-accumulate for tracer deposits.

XLA's scatter-add costs ~42 ns/row for the 6 deposit channels (HBM
latency-bound).  A Pallas kernel that keeps the whole accumulator in VMEM
and walks the rows with a scalar loop may beat it: VMEM random access has
no HBM latency.  Accumulator (n^3, 8) f32 = 67 MB at n=128 fits v5e VMEM.

Measures ns per row-deposit (6 channels) for XLA vs Pallas at several M.
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 128
NC = N ** 3
REPS = 3
CHUNK = 2048


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args):
    sync(fn(*args))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _scatter_kernel(idx_ref, vals_ref, acc_in_ref, acc_ref):
    # idx_ref: (CHUNK,) SMEM scalar-prefetch; vals_ref: (CHUNK, 8) VMEM
    # acc_ref: (NC, 8) VMEM, aliased input/output
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_ref[...] = acc_in_ref[...]

    def body(r, _):
        i = idx_ref[r]
        acc_ref[i, :] = acc_ref[i, :] + vals_ref[r, :]
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


@functools.partial(jax.jit, static_argnames=("m",))
def pallas_scatter_once(idx, vals, acc, *, m):
    nsteps = m // CHUNK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((CHUNK, 8), lambda i, *_: (i, 0)),
            pl.BlockSpec((NC, 8), lambda i, *_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NC, 8), lambda i, *_: (0, 0)),
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NC, 8), jnp.float32),
        input_output_aliases={2: 0},
    )(idx, vals, acc)


@functools.partial(jax.jit, static_argnames=("m",))
def pallas_scatter(idx, vals, acc, *, m):
    def body(i, acc):
        return pallas_scatter_once((idx + i) % NC, vals, acc, m=m)
    return jax.lax.fori_loop(0, 5, body, acc)


@jax.jit
def xla_scatter6(idx, v6, rf):
    def body(i, rf):
        r = rf
        for c in range(6):
            r = r.at[(idx + i) % NC].add(v6[:, c])
        return r
    return jax.lax.fori_loop(0, 5, body, rf)


@jax.jit
def xla_scatter_row8(idx, v8, rf8):
    return rf8.at[idx].add(v8)


def main():
    print(f"platform={jax.devices()[0].platform} grid={N}^3 "
          f"acc={NC * 8 * 4 / 1e6:.0f} MB")
    rng = np.random.default_rng(0)
    for M in (98304, 393216, 786432):
        idx = jnp.asarray(rng.integers(0, NC, M), jnp.int32)
        vals = jnp.asarray(rng.normal(0, 1, (M, 8)), jnp.float32)
        acc = jnp.zeros((NC, 8), jnp.float32)
        rf = jnp.zeros(NC, jnp.float32)

        t_x = timeit(xla_scatter6, idx, vals[:, :6], rf) / 5
        t_r = timeit(xla_scatter_row8, idx, vals, acc)
        try:
            out = pallas_scatter_once(idx, vals, acc, m=M)
            # correctness
            ref = np.zeros((NC, 8), np.float32)
            np.add.at(ref, np.asarray(idx), np.asarray(vals))
            err = float(np.abs(np.asarray(out) - ref).max())
            t_p = timeit(pallas_scatter, idx, vals, acc, m=M) / 5
            print(f"M={M:7d}: xla6 {t_x*1e3:8.2f} ms ({t_x/M*1e9:5.1f} ns/row)"
                  f"  xla-row8 {t_r*1e3:8.2f} ms"
                  f"  pallas {t_p*1e3:8.2f} ms ({t_p/M*1e9:5.1f} ns/row)"
                  f"  maxerr={err:.2e}")
        except Exception as e:
            print(f"M={M}: pallas failed: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]}")
            print(f"  xla6 {t_x*1e3:8.2f} ms  xla-row8 {t_r*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
