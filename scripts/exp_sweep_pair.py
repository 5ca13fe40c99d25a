"""Sweep dataflow experiment (VERDICT r3 item 6): 2 slabs per grid step.

The shipped merged kernel walks grid (band, slab); per step and direction
it loads the carry plane from VMEM scratch, runs the <=3-segment chain,
and stores the carry back.  Processing TWO slabs per grid step keeps the
carry in registers across the pair — halving the per-direction scratch
load/store traffic and the per-step grid overhead — with identical
arithmetic (bit-exact parity expected vs the shipped kernel).

Run on the axon TPU:  python scripts/exp_sweep_pair.py
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

from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import sweep_pallas
from radiativetransfer_tpu.core.sweep import _tau_eps, build_sweep_plan
from radiativetransfer_tpu.geometry.patterns import SEG_NONE, SEG_XZ

N = int(os.environ.get("EXP_N", "256"))
LEVEL = int(os.environ.get("EXP_LEVEL", "3"))
REPS = 3
CHAIN = 4


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


def _pair_kernel(lens_ref, chain_ref, uvb_ref, scale_ref, kappa_ref,
                 j_ref, itop_ref, *, dirs_meta, eps, reverse):
    """Two (band, slab) steps fused: the carry crosses the pair in
    registers.  Same math as sweep_pallas._merged_kernel (exact logmean,
    hoisted reciprocals)."""
    b = pl.program_id(0)
    i = pl.program_id(1)          # pair index (sweep order)
    ndir = itop_ref.shape[0]
    ny, nz = itop_ref.shape[1], itop_ref.shape[2]
    dtype = itop_ref.dtype
    uvb_b = uvb_ref[b]

    @pl.when(i == 0)
    def _():
        for d in range(ndir):
            itop_ref[d] = jnp.full((ny, nz), uvb_b, dtype)

    # local sub-slab order within the fetched block: forward = (0, 1);
    # reversed launches fetch physical block nblk-1-i whose local 1 is the
    # EARLIER sweep slab
    order = (1, 0) if reverse else (0, 1)
    inv_k = [None, None]
    for s_loc in order:
        inv_k[s_loc] = 1.0 / kappa_ref[0, s_loc]

    j_accs = {0: jnp.zeros((ny, nz), dtype), 1: jnp.zeros((ny, nz), dtype)}

    for d, (flip_j, flip_k) in enumerate(dirs_meta):
        def shift_j(x, flip_j=flip_j):
            pad = jnp.full((1, nz), uvb_b, dtype)
            if flip_j:
                return jnp.concatenate([x[1:, :], pad], axis=0)
            return jnp.concatenate([pad, x[:-1, :]], axis=0)

        def shift_k(x, flip_k=flip_k):
            pad = jnp.full((ny, 1), uvb_b, dtype)
            if flip_k:
                return jnp.concatenate([x[:, 1:], pad], axis=1)
            return jnp.concatenate([pad, x[:, :-1]], axis=1)

        it = itop_ref[d]
        for sub, s_loc in enumerate(order):
            slab = 2 * i + sub                    # sweep-order slab index
            kappa_b = kappa_ref[0, s_loc]
            inv_kappa_b = inv_k[s_loc]
            base = slab * ndir + d
            len1 = lens_ref[base * 8 + 0]
            len2 = lens_ref[base * 8 + 1]
            len3 = lens_ref[base * 8 + 2]
            inv_n = lens_ref[base * 8 + 3]
            il1 = lens_ref[base * 8 + 4]
            il2 = lens_ref[base * 8 + 5]
            il3 = lens_ref[base * 8 + 6]
            ch2 = chain_ref[base * 2 + 0]
            ch3 = chain_ref[base * 2 + 1]

            def seg(i_in, len_n, inv_len_n, kappa_b=kappa_b,
                    inv_kappa_b=inv_kappa_b):
                tau_n = kappa_b * len_n
                a = jnp.exp(tau_n)
                emi = jnp.where(tau_n < -eps,
                                (a - 1.0) * inv_kappa_b * inv_len_n,
                                1.0 + 0.5 * tau_n)
                return i_in * a, i_in * emi

            i1_out, lm1 = seg(it, len1, il1)
            is2_xz = (ch2 == SEG_XZ).astype(dtype)
            i2_in = (is2_xz * shift_j(i1_out)
                     + (1.0 - is2_xz) * shift_k(i1_out))
            i2_out, lm2 = seg(i2_in, len2, il2)
            is3_xz = (ch3 == SEG_XZ).astype(dtype)
            i3_in = (is3_xz * shift_j(i2_out)
                     + (1.0 - is3_xz) * shift_k(i2_out))
            i3_out, lm3 = seg(i3_in, len3, il3)

            act2 = (ch2 != SEG_NONE).astype(dtype)
            act3 = (ch3 != SEG_NONE).astype(dtype)
            n_act_i = 1.0 + act2 + act3
            it = jnp.where(n_act_i == 3.0, i3_out,
                           jnp.where(n_act_i == 2.0, i2_out, i1_out))
            j_accs[s_loc] = j_accs[s_loc] + inv_n * (lm1 + act2 * lm2
                                                     + act3 * lm3)
        itop_ref[d] = it

    for s_loc in (0, 1):
        j_ref[0, s_loc] = scale_ref[0] * j_accs[s_loc]


@functools.partial(jax.jit, static_argnames=(
    "dirs_meta", "reverse", "nslab", "ny", "nz"))
def _pair_call(kappa_perm, lens, chains, uvb, weight, *, dirs_meta,
               reverse, nslab, ny, nz):
    dtype = kappa_perm.dtype
    eps = float(_tau_eps(dtype))
    nblk = nslab // 2

    if reverse:
        def index_map(b, i, *_):
            return (b, nblk - 1 - i, 0, 0)
    else:
        def index_map(b, i, *_):
            return (b, i, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(3, nblk),
        in_specs=[pl.BlockSpec((1, 2, ny, nz), index_map)],
        out_specs=pl.BlockSpec((1, 2, ny, nz), index_map),
        scratch_shapes=[pltpu.VMEM((len(dirs_meta), ny, nz), dtype)],
    )
    kernel = functools.partial(_pair_kernel, dirs_meta=dirs_meta, eps=eps,
                               reverse=reverse)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, nslab, ny, nz), dtype),
    )(lens, chains, uvb.astype(dtype), jnp.full((1,), weight, dtype),
      kappa_perm)


def pair_sweep(kappa, plan, uvb, cell_size):
    """diffuse_sweep_pallas with 2-slabs-per-step launches."""
    dtype = kappa.dtype
    np_dtype = np.dtype(dtype.name if hasattr(dtype, "name") else dtype)
    uvb = jnp.asarray(uvb, dtype)
    launches = sweep_pallas._build_merged_launches(plan, np_dtype)
    inv_cell = 1.0 / cell_size
    lens_scale = (
        np.asarray([-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 0.0], np_dtype)
        * cell_size
        + np.asarray([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0], np_dtype)
        + np.asarray([0.0, 0.0, 0.0, 0.0, -1.0, -1.0, -1.0, 0.0], np_dtype)
        * inv_cell)

    by_perm = {}
    for launch in launches:
        by_perm.setdefault(launch.perm, []).append(launch)
    jmean = jnp.zeros_like(kappa)
    plane_bytes = kappa.shape[2] * kappa.shape[3] * np_dtype.itemsize
    d_max = max(1, sweep_pallas._ITOP_VMEM_BUDGET // plane_bytes)
    for q, perm_launches in by_perm.items():
        inv = [0, 0, 0]
        for a in range(3):
            inv[q[a]] = a
        kperm = jnp.transpose(kappa, (0,) + tuple(1 + x for x in inv))
        nslab, ny, nz = kperm.shape[1], kperm.shape[2], kperm.shape[3]
        assert nslab % 2 == 0
        j_perm = None
        for launch in perm_launches:
            # SWEEP-ORDER lens: for reversed launches the SMEM tables are
            # already in sweep order (the index_map handles physical
            # reversal), same as the shipped kernel
            packed = (launch.lens * lens_scale).astype(np_dtype)
            ndir = len(launch.dirs_meta)
            for lo in range(0, ndir, d_max):
                hi = min(lo + d_max, ndir)
                jp = _pair_call(
                    kperm, jnp.asarray(packed[:, lo:hi].reshape(-1)),
                    jnp.asarray(launch.chains[:, lo:hi].reshape(-1)),
                    uvb, plan.weight, dirs_meta=launch.dirs_meta[lo:hi],
                    reverse=launch.reverse, nslab=nslab, ny=ny, nz=nz)
                j_perm = jp if j_perm is None else j_perm + jp
        jmean = jmean + jnp.transpose(j_perm, (0,) + tuple(1 + x for x in q))
    return jmean


def main():
    n = N
    print(f"platform={jax.devices()[0].platform} n={n} level={LEVEL}")
    plan = build_sweep_plan(LEVEL, n)
    ndir = plan.n_directions
    cell = 2000.0 * KPC / n
    rng = np.random.default_rng(0)
    kappa = jnp.asarray(
        10.0 ** rng.uniform(-26, -20, (3, n, n, n)), jnp.float32)
    uvb = jnp.asarray([1e-21, 3e-22, 1e-22], jnp.float32)
    ca = n ** 3 * ndir

    def chain(fn):
        @jax.jit
        def g(kappa):
            def body(_, k):
                return fn(k) * 0.5 + kappa * 0.5
            return jax.lax.fori_loop(0, CHAIN, body, kappa)
        return g

    j_ref = sweep_pallas.diffuse_sweep_pallas(kappa, plan, uvb, cell)
    j_pair = pair_sweep(kappa, plan, uvb, cell)
    err = float(jnp.max(jnp.abs(j_pair - j_ref)) / jnp.max(jnp.abs(j_ref)))
    print(f"pair-vs-ship maxrelerr = {err:.2e}")

    ship = chain(lambda k: sweep_pallas.diffuse_sweep_pallas(
        k, plan, uvb, cell))
    pair = chain(lambda k: pair_sweep(k, plan, uvb, cell))
    dt = timeit(ship, kappa) / CHAIN
    print(f"ship: {dt*1e3:7.1f} ms/sweep  {ca/dt:.3e} cells*angles/s")
    dt = timeit(pair, kappa) / CHAIN
    print(f"pair: {dt*1e3:7.1f} ms/sweep  {ca/dt:.3e} cells*angles/s")


if __name__ == "__main__":
    main()
