"""Sweep-kernel op-count experiments (VERDICT r2 item 7).

The merged flip-folded kernel runs at 105.5 ms/sweep = 4.8x the pure-exp
floor; its cost is non-exp VPU elementwise ops (~44 per band-dir-slab
element plus 4 shift-concats).  Variants measured here at the production
shape (256^3, 192 directions, f32):

  ship      the shipped _merged_kernel (masked, branch-free)
  lean      restructured segment math: lm from (i_out - i_in), the
            small-tau branch coefficients (s', h) preloaded per segment
            so inactive segments auto-contribute 0 (active masks and the
            final n_act itop select disappear); j_acc = lm1+lm2+lm3
  lean2     lean with exp2 (lengths prescaled by log2 e) — probes
            whether jnp.exp lowers to scale+exp2 on the VPU
  seg1      chain segments 2/3 deleted entirely (cost attribution:
            what do segments 2+3 + junction selects cost?)
  noemi     lm computation deleted (i_out chain only): what does the
            logmean emissivity machinery cost?
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
from radiativetransfer_tpu.core.sweep import SweepPlan, _tau_eps, build_sweep_plan
from radiativetransfer_tpu.geometry.patterns import SEG_NONE, SEG_XZ

N = int(os.environ.get("EXP_N", "256"))
LEVEL = int(os.environ.get("EXP_LEVEL", "3"))
REPS = 3
CHAIN = 4          # chained sweeps per timed call (amortize tunnel)
LOG2E = float(np.log2(np.e))


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


# --------------------------------------------------------------------------
# lean kernel: 16-slot SMEM per (slab, dir):
#   0..2  len_n   = -len*cell [*log2e]     (tau_n = kappa*len_n)
#   3..5  C_n     = -inv_n/(len*cell)      (lm_big = (iout-iin)*invk*C)
#   6..8  h_n     = 0.5*inv_n*len_n_nat    (natural units, no log2e)
#   9..11 s_n     = inv_n * active_n
#   12..14 pad, 15 pad
# --------------------------------------------------------------------------


def _lean_kernel(lens_ref, chain_ref, uvb_ref, scale_ref, kappa_ref,
                 j_ref, itop_ref, *, dirs_meta, eps, use_exp2, seg1_only,
                 no_emi, clamped=False, no_shift=False):
    b = pl.program_id(0)
    i = pl.program_id(1)
    ndir = itop_ref.shape[0]
    ny, nz = itop_ref.shape[1], itop_ref.shape[2]
    dtype = itop_ref.dtype
    uvb_b = uvb_ref[b]

    @pl.when(i == 0)
    def _():
        for d in range(ndir):
            itop_ref[d] = jnp.full((ny, nz), uvb_b, dtype)

    kappa_b = kappa_ref[0, 0]
    inv_kappa_b = 1.0 / kappa_b
    j_acc = jnp.zeros((ny, nz), dtype)
    exp_fn = jnp.exp2 if use_exp2 else jnp.exp
    # eps in the tau_n domain used by the comparison
    eps_c = eps * LOG2E if use_exp2 else eps

    # clamped-logmean constants: emi = (1 - min(a, A_EPS)) * min(1/tau,
    # 1/EPS_C); exact big-branch above EPS_C, constant-emi (err <= EPS_C/2)
    # below, no compare/select and exact-0 for len=0 inactive segments
    EPS_CL = 3.5e-4
    A_EPS = float(np.exp(-EPS_CL))

    def seg(i_in, ln, C, h, sp):
        tau_n = kappa_b * ln
        a = exp_fn(tau_n)
        i_out = i_in * a
        if no_emi:
            return i_out, i_out
        if clamped:
            # C slot holds act*inv_n/(len*cell) >= 0; sp holds inv_n
            d = i_in - i_in * jnp.minimum(a, A_EPS)
            lm = d * jnp.minimum(inv_kappa_b * C, sp * (1.0 / EPS_CL))
            return i_out, lm
        lm = jnp.where(tau_n < -eps_c,
                       (i_out - i_in) * (inv_kappa_b * C),
                       i_in * (sp + h * kappa_b))
        return i_out, lm

    for d, (flip_j, flip_k) in enumerate(dirs_meta):
        base = (i * ndir + d) * 16
        ln1, ln2, ln3 = (lens_ref[base + 0], lens_ref[base + 1],
                         lens_ref[base + 2])
        C1, C2, C3 = (lens_ref[base + 3], lens_ref[base + 4],
                      lens_ref[base + 5])
        h1, h2, h3 = (lens_ref[base + 6], lens_ref[base + 7],
                      lens_ref[base + 8])
        s1, s2, s3 = (lens_ref[base + 9], lens_ref[base + 10],
                      lens_ref[base + 11])
        ch2 = chain_ref[(i * ndir + d) * 2 + 0]
        ch3 = chain_ref[(i * ndir + d) * 2 + 1]

        def shift_j(x, flip_j=flip_j):
            if no_shift:
                return x
            pad = jnp.full((1, nz), uvb_b, dtype)
            if flip_j:
                return jnp.concatenate([x[1:, :], pad], axis=0)
            return jnp.concatenate([pad, x[:-1, :]], axis=0)

        def shift_k(x, flip_k=flip_k):
            if no_shift:
                return x
            pad = jnp.full((ny, 1), uvb_b, dtype)
            if flip_k:
                return jnp.concatenate([x[:, 1:], pad], axis=1)
            return jnp.concatenate([pad, x[:, :-1]], axis=1)

        i1_out, lm1 = seg(itop_ref[d], ln1, C1, h1, s1)
        if seg1_only:
            itop_ref[d] = i1_out
            j_acc = j_acc + lm1
            continue

        is2 = (ch2 == SEG_XZ).astype(dtype)
        i2_in = is2 * shift_j(i1_out) + (1.0 - is2) * shift_k(i1_out)
        i2_out, lm2 = seg(i2_in, ln2, C2, h2, s2)
        is3 = (ch3 == SEG_XZ).astype(dtype)
        i3_in = is3 * shift_j(i2_out) + (1.0 - is3) * shift_k(i2_out)
        i3_out, lm3 = seg(i3_in, ln3, C3, h3, s3)

        # n_act select on the carry (inactive lm are already exact zeros)
        itop_ref[d] = jnp.where(
            ch3 != SEG_NONE, i3_out,
            jnp.where(ch2 != SEG_NONE, i2_out, i1_out))
        j_acc = j_acc + (lm1 + lm2 + lm3)

    j_ref[0, 0] = scale_ref[0] * j_acc


@functools.partial(jax.jit, static_argnames=(
    "dirs_meta", "reverse", "nslab", "ny", "nz", "use_exp2", "seg1_only",
    "no_emi", "clamped", "no_shift"))
def _lean_call(kappa_perm, lens, chains, uvb, weight, *, dirs_meta, reverse,
               nslab, ny, nz, use_exp2, seg1_only, no_emi, clamped=False,
               no_shift=False):
    dtype = kappa_perm.dtype
    eps = float(_tau_eps(dtype))
    if reverse:
        def index_map(b, i, *_):
            return (b, nslab - 1 - i, 0, 0)
    else:
        def index_map(b, i, *_):
            return (b, i, 0, 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(3, nslab),
        in_specs=[pl.BlockSpec((1, 1, ny, nz), index_map)],
        out_specs=pl.BlockSpec((1, 1, ny, nz), index_map),
        scratch_shapes=[pltpu.VMEM((len(dirs_meta), ny, nz), dtype)],
    )
    kernel = functools.partial(_lean_kernel, dirs_meta=dirs_meta, eps=eps,
                               use_exp2=use_exp2, seg1_only=seg1_only,
                               no_emi=no_emi, clamped=clamped,
                               no_shift=no_shift)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, nslab, ny, nz), dtype),
    )(lens, chains, uvb.astype(dtype), jnp.full((1,), weight, dtype),
      kappa_perm)


def _lean_pack(launch, cell_size, use_exp2, np_dtype, clamped=False):
    """(nslab, D, 16) from a _MergedLaunch's raw lens (unit) + chains.

    All per-segment scalars are act-masked so inactive chain slots (whose
    builder lengths carry nonzero chain-selected values) contribute
    exactly 0 to both tau and lm."""
    lens = launch.lens.astype(np.float64)   # (nslab, D, 8) raw: see builder
    raw = lens[..., 0:3]                    # unit lengths, chain-ordered
    inv_n = lens[..., 3:4]
    act = np.concatenate([np.ones_like(raw[..., :1]),
                          (launch.chains[..., 0:1] != SEG_NONE),
                          (launch.chains[..., 1:2] != SEG_NONE)],
                         axis=-1).astype(np.float64)
    len_nat = -raw * cell_size * act
    with np.errstate(divide="ignore"):
        if clamped:
            # C slot: act*inv_n/(len*cell) (positive); s slot: inv_n
            C = np.where(raw > 0, act * inv_n / (raw * cell_size), 0.0)
        else:
            C = np.where(raw > 0, -act * inv_n / (raw * cell_size), 0.0)
    h = 0.5 * inv_n * len_nat
    s = inv_n * (np.ones_like(act) if clamped else act)
    ln = len_nat * (LOG2E if use_exp2 else 1.0)
    out = np.concatenate(
        [ln, C, h, s, np.zeros_like(raw), np.zeros_like(raw[..., :1])],
        axis=-1)
    return out.astype(np_dtype)


def lean_sweep(kappa, plan: SweepPlan, uvb, cell_size, use_exp2=False,
               seg1_only=False, no_emi=False, clamped=False,
               no_shift=False):
    dtype = kappa.dtype
    np_dtype = np.dtype(dtype.name if hasattr(dtype, "name") else dtype)
    uvb = jnp.asarray(uvb, dtype)
    launches = sweep_pallas._build_merged_launches(plan, np.float64)
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
        j_perm = None
        for launch in perm_launches:
            packed = _lean_pack(launch, cell_size, use_exp2, np_dtype,
                                clamped=clamped)
            ndir = len(launch.dirs_meta)
            for lo in range(0, ndir, d_max):
                hi = min(lo + d_max, ndir)
                jp = _lean_call(
                    kperm, jnp.asarray(packed[:, lo:hi].reshape(-1)),
                    jnp.asarray(launch.chains[:, lo:hi].reshape(-1)),
                    uvb, plan.weight, dirs_meta=launch.dirs_meta[lo:hi],
                    reverse=launch.reverse, nslab=nslab, ny=ny, nz=nz,
                    use_exp2=use_exp2, seg1_only=seg1_only, no_emi=no_emi,
                    clamped=clamped, no_shift=no_shift)
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

    ship = chain(lambda k: sweep_pallas.diffuse_sweep_pallas(
        k, plan, uvb, cell))
    j_ref = sweep_pallas.diffuse_sweep_pallas(kappa, plan, uvb, cell)

    names = os.environ.get(
        "EXP_VARIANTS", "lean,clamp,clamp2,seg1,noemi,noshift").split(",")
    all_variants = {
        "lean": dict(),
        "clamp": dict(clamped=True),
        "clamp2": dict(clamped=True, use_exp2=True),
        "seg1": dict(seg1_only=True),
        "noemi": dict(no_emi=True),
        "noshift": dict(no_shift=True),
    }
    variants = {k: all_variants[k] for k in names}
    defaults = dict(use_exp2=False, seg1_only=False, no_emi=False,
                    clamped=False, no_shift=False)
    variants = {k: {**defaults, **v} for k, v in variants.items()}

    dt = timeit(ship, kappa) / CHAIN
    print(f"ship : {dt*1e3:7.1f} ms/sweep  {ca/dt:.3e} cells*angles/s")
    for name, kw in variants.items():
        f = chain(lambda k, kw=kw: lean_sweep(k, plan, uvb, cell, **kw))
        if not (kw["seg1_only"] or kw["no_emi"] or kw["no_shift"]):
            jv = lean_sweep(kappa, plan, uvb, cell, **kw)
            err = float(jnp.max(jnp.abs(jv - j_ref))
                        / jnp.max(jnp.abs(j_ref)))
        else:
            err = float("nan")
        dt = timeit(f, kappa) / CHAIN
        print(f"{name:5s}: {dt*1e3:7.1f} ms/sweep  {ca/dt:.3e} "
              f"cells*angles/s  maxrelerr={err:.2e}")


if __name__ == "__main__":
    main()
