"""Pallas TPU wavefront kernel for the diffuse sweep.

Same mathematics as core.sweep.sweep_zone (the <=3-segment chained slab
pipeline), fused into a single Pallas kernel per octant zone:

* the kernel grid walks the slabs (TPU grid steps run sequentially, so the
  top-exit intensity plane persists across steps in a VMEM scratch buffer —
  no HBM round-trip for the carry, unlike the lax.scan formulation);
* the per-(direction, slab) ray-template scalars ride in scalar-prefetch
  SMEM arrays;
* each step streams one kappa slab in and one Jmean slab out, so the kernel
  runs at HBM-streaming speed with all chain arithmetic in VMEM.

The slab-sequential pattern reuse mirrors the reference's per-slab template
trick (equiSources.f90:1493-1553) — the template becomes the scalar
prefetch, the (j,k) plane the vectorized tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import octants
from ..geometry.patterns import SEG_XZ
from .sweep import SweepPlan, _tau_eps


def _sweep_zone_kernel(lens_ref, chain_ref, uvb_ref, scale_ref,
                       kappa_ref, j_ref, itop_ref):
    """One slab step, unrolled over bands x directions.

    Mosaic rejects small-vector relayouts like (3,) -> (1,3,1,1), so the
    band/direction structure is unrolled at trace time: every tensor op is a
    clean (ny, nz) tile scaled by SMEM scalars.  The unroll count is
    3 bands * D directions * <=3 segments (D <= ~16 per octant zone).

    lens_ref:  (nslab*D*3,) SMEM — segment lengths (xy, xz, yz) * cell_size,
               flattened 1-D (SMEM pads the last axis to 128 lanes, so a
               trailing extent of 3 would waste 40x SMEM)
    chain_ref: (nslab*D*3,) SMEM int32 — (chain2, chain3, n_active)
    uvb_ref:   (3,) SMEM — boundary band intensities (scalar loads only)
    scale_ref: (1,) SMEM — angular weight
    kappa_ref: (3, ny, nz) VMEM — this slab's band opacities [1/cm]
    j_ref:     (3, ny, nz) VMEM out — weighted Jmean contribution
    itop_ref:  (D, 3, ny, nz) VMEM scratch — carry: top-exit intensities
    """
    i = pl.program_id(0)
    ndir = itop_ref.shape[0]
    ny, nz = kappa_ref.shape[1], kappa_ref.shape[2]
    dtype = kappa_ref.dtype

    # NOTE: a band-vectorized variant operating on (3, ny, nz) tensors hit
    # pathological Mosaic compile times (>9 min vs 60 s) from the size-3
    # leading dim; the per-band unroll below compiles fast and runs at the
    # same speed.
    for b in range(3):
        uvb_b = uvb_ref[b]

        @pl.when(i == 0)
        def _(b=b, uvb_b=uvb_b):
            for d in range(ndir):
                itop_ref[d, b] = jnp.full((ny, nz), uvb_b, dtype)

        kappa_b = kappa_ref[b]                         # (ny, nz)
        j_acc = jnp.zeros((ny, nz), dtype)

        for d in range(ndir):
            base = (i * ndir + d) * 3
            len_xy = lens_ref[base + 0]
            len_xz = lens_ref[base + 1]
            len_yz = lens_ref[base + 2]
            chain2 = chain_ref[base + 0]
            chain3 = chain_ref[base + 1]
            n_act = chain_ref[base + 2]

            eps = _tau_eps(dtype)

            def seg(i_in, length):
                tau = kappa_b * length
                a = jnp.exp(-tau)
                emi = jnp.where(tau > eps,
                                (1.0 - a) / jnp.where(tau > eps, tau, 1.0),
                                1.0 - 0.5 * tau)
                return i_in * a, i_in * emi

            def shift_j(x):
                pad = jnp.full((1, nz), uvb_b, dtype)
                return jnp.concatenate([pad, x[:-1, :]], axis=0)

            def shift_k(x):
                pad = jnp.full((ny, 1), uvb_b, dtype)
                return jnp.concatenate([pad, x[:, :-1]], axis=1)

            i_in1 = itop_ref[d, b]
            i_out1, lm1 = seg(i_in1, len_xy)

            is2_xz = chain2 == SEG_XZ
            i_in2 = jnp.where(is2_xz, shift_j(i_out1), shift_k(i_out1))
            len2 = jnp.where(is2_xz, len_xz, len_yz)
            i_out2, lm2 = seg(i_in2, len2)

            is3_xz = chain3 == SEG_XZ
            i_in3 = jnp.where(is3_xz, shift_j(i_out2), shift_k(i_out2))
            len3 = jnp.where(is3_xz, len_xz, len_yz)
            i_out3, lm3 = seg(i_in3, len3)

            act2 = (chain2 != 0).astype(dtype)
            act3 = (chain3 != 0).astype(dtype)
            j_acc = j_acc + (lm1 + act2 * lm2 + act3 * lm3) / n_act.astype(dtype)

            itop_ref[d, b] = jnp.where(
                n_act == 3, i_out3, jnp.where(n_act == 2, i_out2, i_out1))

        j_ref[b] = scale_ref[0] * j_acc


@functools.partial(jax.jit,
                   static_argnames=("ndir", "nslab", "ny", "nz", "interpret"))
def _sweep_zone_pallas(kappa_rot, lens, chains, uvb, weight, *,
                       ndir, nslab, ny, nz, interpret=False):
    dtype = kappa_rot.dtype
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nslab,),
        in_specs=[
            pl.BlockSpec((1, 3, ny, nz), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, ny, nz), lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((ndir, 3, ny, nz), dtype)],
    )

    def kernel(lens_ref, chain_ref, uvb_ref, scale_ref, kappa_ref, j_ref,
               itop_ref):
        _sweep_zone_kernel(lens_ref, chain_ref, uvb_ref, scale_ref,
                           kappa_ref.at[0], j_ref.at[0], itop_ref)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nslab, 3, ny, nz), dtype),
        interpret=interpret,
    )(lens, chains, uvb.astype(dtype), jnp.full((1,), weight, dtype),
      kappa_rot)


def zone_arrays(zone, cell_size, dtype=jnp.float32):
    """Pack a ZoneBatch's per-slab templates for the kernel."""
    lens = np.stack([zone.len_xy, zone.len_xz, zone.len_yz], axis=-1)
    lens = np.swapaxes(lens, 0, 1) * cell_size          # (nslab, D, 3)
    chains = np.stack([zone.chain2, zone.chain3, zone.n_active], axis=-1)
    chains = np.swapaxes(chains, 0, 1).astype(np.int32)  # (nslab, D, 3)
    return (jnp.asarray(lens.reshape(-1), dtype),
            jnp.asarray(chains.reshape(-1)))


def diffuse_sweep_pallas(kappa, plan: SweepPlan, uvb, cell_size,
                         interpret: bool = False) -> jax.Array:
    """Full multi-direction sweep with the Pallas zone kernel.

    Drop-in replacement for core.sweep.diffuse_sweep (same result to float
    roundoff).  interpret=True runs the kernel in interpreter mode for
    CPU-based testing.
    """
    dtype = kappa.dtype
    uvb = jnp.asarray(uvb, dtype)
    kappa_l = jnp.moveaxis(kappa, 0, -1)                # (nx,ny,nz,3)
    jmean = jnp.zeros_like(kappa_l)
    for zone in plan.zones:
        krot = octants.rotate_to_sweep(kappa_l, zone.izone)
        krot = jnp.moveaxis(krot, -1, 1)                # (nslab,3,ny,nz)
        nslab, _, ny, nz = krot.shape
        lens, chains = zone_arrays(zone, cell_size, dtype)
        j_rot = _sweep_zone_pallas(
            krot, lens, chains, uvb, plan.weight,
            ndir=zone.ndir, nslab=nslab, ny=ny, nz=nz, interpret=interpret)
        j_rot = jnp.moveaxis(j_rot, 1, -1)
        jmean = jmean + octants.rotate_from_sweep(j_rot, zone.izone)
    return jnp.moveaxis(jmean, -1, 0)


def make_jitted_sweep_pallas(plan: SweepPlan, interpret: bool = False):
    return jax.jit(lambda kappa, uvb, cell_size: diffuse_sweep_pallas(
        kappa, plan, uvb, cell_size, interpret=interpret))
