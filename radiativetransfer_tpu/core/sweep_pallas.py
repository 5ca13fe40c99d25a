"""Pallas TPU wavefront kernel for the diffuse sweep.

Same mathematics as core.sweep.sweep_zone (the <=3-segment chained slab
pipeline), fused into Pallas wavefront kernels:

* the kernel grid walks (band, slab); TPU grid steps run sequentially, so
  the top-exit intensity plane persists across steps in a VMEM scratch
  buffer — no HBM round-trip for the carry, unlike the lax.scan formulation;
* the per-(direction, slab) ray-template scalars ride in scalar-prefetch
  SMEM arrays;
* each step streams one kappa slab in and one Jmean slab out, so the kernel
  runs at HBM-streaming speed with all chain arithmetic in VMEM.

The slab-sequential pattern reuse mirrors the reference's per-slab template
trick (equiSources.f90:1493-1553) — the template becomes the scalar
prefetch, the (j,k) plane the vectorized tile.

Roofline notes (round 2): at 256^3 x 192 directions the sweep is
VPU-compute-bound (HBM floor ~4 ms vs ~200 ms compute), so the merged
launch path below optimizes op count, not bytes:

* the 24 octant zones share 3 axis PERMUTATIONS x 8 flip combinations; the
  flips are folded into the kernel (reversed grid index_map for the slab
  axis, reversed shift direction + boundary side for the in-plane axes), so
  only 2 real HBM transposes remain per sweep (the identity permutation is
  free) instead of 24 rotate_to/from round-trips;
* inactive chain segments are SKIPPED with scalar lax.cond (the mean
  chain depth is ~2.2 of 3, so masked evaluation wastes ~25% of the VPU);
* the upwind shift is selected with a scalar cond instead of computing
  both shifts and jnp.where-ing them.

The older per-zone kernel (`_sweep_zone_pallas`, one launch per zone on a
rotate_to_sweep-ed field) is kept for parallel.sweep_rdma, which splices
RDMA halo exchange around it.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import octants
from ..geometry.patterns import SEG_NONE, SEG_XZ, SEG_YZ
from .sweep import SweepPlan, _tau_eps

# VMEM budget for the per-direction carry planes of one merged launch;
# directions beyond this are chunked into additional launches.
_ITOP_VMEM_BUDGET = 8 * 1024 * 1024

# branch-free "clamped" logmean (opt-in, see diffuse_sweep_pallas):
#   emi = (1 - min(a, _A_EPS)) * min(1/tau, 1/_EPS_CL)
# exact above _EPS_CL, constant-emi below (abs err <= _EPS_CL/2 = 1.75e-4,
# vs the exact branch's up-to-6e-4 f32 cancellation just above 1e-4);
# drops the compare/select pair and the 0.5*tau fma per segment
_EPS_CL = 3.5e-4
_A_EPS = float(np.exp(-_EPS_CL))


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


# ---------------------------------------------------------------------------
# Merged flip-folded launches (the fast path)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _MergedLaunch:
    """All directions sharing one axis permutation and one slab order."""
    perm: tuple[int, int, int]       # q: grid axis a reads transfer axis q[a]
    reverse: bool                    # transfer axis 0 flipped -> sweep runs
    #                                  physically last-slab-first
    dirs_meta: tuple[tuple[bool, bool], ...]   # per-dir (flip_j, flip_k)
    lens: np.ndarray                 # (nslab, D, 8) f: -len*cell x3, inv_n,
    #                                  1/(-len*cell) x3, pad
    chains: np.ndarray               # (nslab, D, 2) int32: chain2, chain3


def _validate_zone_tables(zone) -> None:
    """Host-side precondition check of a zone's chain tables before they are
    baked into SMEM (SURVEY.md §5.2): the kernel addresses SMEM by raw
    index arithmetic and trusts these invariants completely — a malformed
    table would read out of contract silently on device.  One-time cost at
    plan build; raises ValueError with the offending entries."""
    c2 = np.asarray(zone.chain2)
    c3 = np.asarray(zone.chain3)
    na = np.asarray(zone.n_active)
    lens = np.stack([np.asarray(zone.len_xy), np.asarray(zone.len_xz),
                     np.asarray(zone.len_yz)])
    ok_codes = np.isin(c2, (SEG_NONE, SEG_XZ, SEG_YZ)) \
        & np.isin(c3, (SEG_NONE, SEG_XZ, SEG_YZ))
    chain_consistent = (1 + (c2 != SEG_NONE) + (c3 != SEG_NONE)) == na
    dangling = (c3 != SEG_NONE) & (c2 == SEG_NONE)
    finite = np.isfinite(lens).all(axis=0) & (lens >= 0.0).all(axis=0)
    bad = ~(ok_codes & chain_consistent & ~dangling & finite)
    if bad.any():
        i = tuple(np.argwhere(bad)[0])
        raise ValueError(
            f"zone {zone.izone}: malformed chain table at (dir, slab)={i}: "
            f"chain2={c2[i]} chain3={c3[i]} n_active={na[i]} "
            f"lens={[float(l[i]) for l in lens]}")


def _build_merged_launches(plan: SweepPlan, np_dtype) -> list[_MergedLaunch]:
    """Group the plan's 24 zones into (permutation, slab-order) launches.

    Grid axis a of zone izone reads transfer axis q[a]; the zone's flipped
    grid axes map to flipped TRANSFER axes {q[a] : a in flips}.  A flipped
    transfer axis 0 reverses the slab order (handled by the launch's grid
    index_map); flipped transfer axes 1/2 reverse the in-plane upwind shift
    direction (handled per direction inside the kernel).
    """
    groups: dict[tuple[tuple[int, int, int], bool], list] = {}
    for zone in plan.zones:
        q, flips = octants._ZONE_TABLE[zone.izone]
        reverse = q.index(0) in flips
        flip_j = q.index(1) in flips
        flip_k = q.index(2) in flips
        groups.setdefault((q, reverse), []).append((zone, flip_j, flip_k))

    launches = []
    for (q, reverse), zones in sorted(groups.items()):
        lens_parts, chain_parts, meta = [], [], []
        for zone, flip_j, flip_k in zones:
            _validate_zone_tables(zone)
            # pre-select the chain-ordered segment lengths (the kernel
            # addresses lengths by chain position, not by face)
            seg2_len = np.where(zone.chain2 == SEG_XZ, zone.len_xz,
                                zone.len_yz)
            seg3_len = np.where(zone.chain3 == SEG_XZ, zone.len_xz,
                                zone.len_yz)
            # (ndir, nslab) -> (nslab, ndir, ...); unit lengths — the
            # (traced) cell size is applied on device in diffuse_sweep_pallas
            lens = np.swapaxes(np.stack([zone.len_xy, seg2_len, seg3_len],
                                        -1), 0, 1)
            inv_n = np.swapaxes(
                1.0 / zone.n_active.astype(np.float64), 0, 1)[..., None]
            # reciprocal lengths (0 for inactive segments): with these in
            # SMEM the kernel's logmean divide (a-1)/tau becomes a multiply
            # by 1/kappa (hoisted per band-slab tile) * 1/len
            with np.errstate(divide="ignore"):
                inv_lens = np.where(lens > 0.0, 1.0 / lens, 0.0)
            lens_parts.append(np.concatenate(
                [lens, inv_n, inv_lens,
                 np.zeros_like(inv_n)], -1))          # (nslab, D, 8)
            chains = np.stack([zone.chain2, zone.chain3], -1)
            chain_parts.append(np.swapaxes(chains, 0, 1).astype(np.int32))
            meta.extend([(flip_j, flip_k)] * zone.ndir)
        launches.append(_MergedLaunch(
            perm=q, reverse=reverse, dirs_meta=tuple(meta),
            lens=np.concatenate(lens_parts, axis=1).astype(np_dtype),
            chains=np.concatenate(chain_parts, axis=1)))
    return launches


def _merged_kernel(lens_ref, chain_ref, uvb_ref, scale_ref, kappa_ref,
                   j_ref, itop_ref, *, dirs_meta, eps, skip_inactive,
                   logmean="exact"):
    """One (band, slab) step for all directions of a merged launch.

    lens_ref:  (nslab*D*8,) SMEM — (-len_xy*cell, -len_xz_or_yz2, -len3,
               1/n_active, 1/len_n x3, pad) per (slab, dir); segment
               lengths pre-negated so tau_n = kappa*len is the exp()
               argument directly, and their reciprocals pre-divided so the
               logmean (a-1)/tau_n costs one hoisted 1/kappa per tile
               instead of a divide per segment
    chain_ref: (nslab*D*2,) SMEM int32 — (chain2, chain3)
    uvb_ref:   (3,) SMEM — boundary band intensities
    scale_ref: (1,) SMEM — angular weight
    kappa_ref: (1, 1, ny, nz) VMEM — this (band, slab)'s opacity [1/cm]
    j_ref:     (1, 1, ny, nz) VMEM out — weighted Jmean contribution
    itop_ref:  (D, ny, nz) VMEM scratch — per-direction top-exit carry
    """
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
    # hoisted reciprocal: ONE divide per (band, slab) tile; kappa == 0
    # tiles give inf, masked out by the small-tau where-branch (exact) or
    # the min-clamp (clamped)
    inv_kappa_b = 1.0 / kappa_b
    if logmean == "clamped":
        # floor kappa so inf*0 (kappa = 0 with a zero-length active
        # segment) cannot make a NaN; one extra op per tile, amortized
        # over all directions
        inv_kappa_b = 1.0 / jnp.maximum(kappa_b, 1e-37)
    j_acc = jnp.zeros((ny, nz), dtype)

    def seg(i_in, len_n, inv_len_n):
        """One segment: len_n = -length (pre-scaled by cell size)."""
        tau_n = kappa_b * len_n                       # = -tau
        a = jnp.exp(tau_n)
        # (an exp2-with-prescaled-lengths variant measured ~4% SLOWER on
        # the canonical bench — Mosaic's exp lowering is already optimal)
        if logmean == "clamped":
            # branch-free: d = Iin*(1 - min(a, A)); emi*Iin = d*min(1/tau,
            # 1/EPS); inv_len_n < 0 and 1/tau = -invk*inv_len > 0
            d = i_in - i_in * jnp.minimum(a, _A_EPS)
            r = jnp.minimum(inv_kappa_b * (-inv_len_n), 1.0 / _EPS_CL)
            return i_in * a, d * r
        # logmean emissivity (1-a)/tau = (a-1)/tau_n, small-tau 1+tau_n/2;
        # 1/tau_n = inv_kappa * inv_len (both precomputed) — no divide
        emi = jnp.where(tau_n < -eps,
                        (a - 1.0) * inv_kappa_b * inv_len_n,
                        1.0 + 0.5 * tau_n)
        return i_in * a, i_in * emi

    for d, (flip_j, flip_k) in enumerate(dirs_meta):
        base = i * ndir + d
        len1 = lens_ref[base * 8 + 0]
        len2 = lens_ref[base * 8 + 1]
        len3 = lens_ref[base * 8 + 2]
        inv_n = lens_ref[base * 8 + 3]
        il1 = lens_ref[base * 8 + 4]
        il2 = lens_ref[base * 8 + 5]
        il3 = lens_ref[base * 8 + 6]
        ch2 = chain_ref[base * 2 + 0]
        ch3 = chain_ref[base * 2 + 1]

        # upwind shifts; a flipped transfer axis reverses direction and
        # boundary side (the fold of the zone's grid-axis flip)
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

        i1_out, lm1 = seg(itop_ref[d], len1, il1)

        if skip_inactive:
            # chain segments 2/3 are skipped (scalar lax.cond) when inactive
            def with_23(i1_out=i1_out, len2=len2, len3=len3, ch2=ch2,
                        ch3=ch3, shift_j=shift_j, shift_k=shift_k):
                i2_in = jax.lax.cond(ch2 == SEG_XZ, shift_j, shift_k, i1_out)
                i2_out, lm2 = seg(i2_in, len2, il2)

                def with_3(_):
                    i3_in = jax.lax.cond(ch3 == SEG_XZ, shift_j, shift_k,
                                         i2_out)
                    return seg(i3_in, len3, il3)

                i3_out, lm3 = jax.lax.cond(
                    ch3 != SEG_NONE, with_3,
                    lambda _: (i2_out, jnp.zeros_like(i2_out)), 0)
                return i3_out, lm2 + lm3

            i_fin, lm23 = jax.lax.cond(
                ch2 != SEG_NONE, lambda _: with_23(),
                lambda _: (i1_out, jnp.zeros_like(i1_out)), 0)

            itop_ref[d] = i_fin
            j_acc = j_acc + inv_n * (lm1 + lm23)
        else:
            # branch-free: evaluate all 3 segments, mask the inactive ones
            # (scalar masks; ~36% wasted exp at mean chain depth 2.2, but no
            # cond merge copies — measured faster on v5e than the skip path)
            is2_xz = (ch2 == SEG_XZ).astype(dtype)
            i2_in = is2_xz * shift_j(i1_out) + (1.0 - is2_xz) * shift_k(i1_out)
            i2_out, lm2 = seg(i2_in, len2, il2)
            is3_xz = (ch3 == SEG_XZ).astype(dtype)
            i3_in = is3_xz * shift_j(i2_out) + (1.0 - is3_xz) * shift_k(i2_out)
            i3_out, lm3 = seg(i3_in, len3, il3)

            act2 = (ch2 != SEG_NONE).astype(dtype)
            act3 = (ch3 != SEG_NONE).astype(dtype)
            n_act_i = 1.0 + act2 + act3  # float scalar: 1, 2 or 3
            itop_ref[d] = jnp.where(
                n_act_i == 3.0, i3_out,
                jnp.where(n_act_i == 2.0, i2_out, i1_out))
            j_acc = j_acc + inv_n * (lm1 + act2 * lm2 + act3 * lm3)

    j_ref[0, 0] = scale_ref[0] * j_acc


@functools.partial(jax.jit, static_argnames=(
    "dirs_meta", "reverse", "nslab", "ny", "nz", "interpret",
    "skip_inactive", "logmean"))
def _merged_launch_call(kappa_perm, lens, chains, uvb, weight, *,
                        dirs_meta, reverse, nslab, ny, nz, interpret=False,
                        skip_inactive=False, logmean="exact"):
    """One pallas_call over grid (3 bands, nslab) for a merged launch.

    kappa_perm: (3, nslab, ny, nz) opacity in permuted (unflipped) order.
    Returns the same-shaped weighted Jmean contribution.
    """
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
    kernel = functools.partial(_merged_kernel, dirs_meta=dirs_meta, eps=eps,
                               skip_inactive=skip_inactive, logmean=logmean)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, nslab, ny, nz), dtype),
        interpret=interpret,
    )(lens, chains, uvb.astype(dtype), jnp.full((1,), weight, dtype),
      kappa_perm)


def diffuse_sweep_pallas(kappa, plan: SweepPlan, uvb, cell_size,
                         interpret: bool = False,
                         skip_inactive: bool = False,
                         logmean: str = "exact") -> jax.Array:
    """Full multi-direction sweep with merged flip-folded Pallas launches.

    Drop-in replacement for core.sweep.diffuse_sweep (same result to float
    roundoff).  interpret=True runs the kernels in interpreter mode for
    CPU-based testing.

    logmean: "exact" (default) keeps the reference's two-branch logmean
    (exact emi = 1 in transparent cells); "clamped" uses the branch-free
    min-clamp form — +6.6% on the canonical bench (BASELINE.md r3), with a bounded bias <= 1.75e-4 on the
    emissivity of cells with tau < 3.5e-4 (the exact branch's own f32
    cancellation reaches 6e-4 just above its 1e-4 threshold, so the
    clamp's MAX error is smaller; its error in the fully-transparent
    limit is larger).  Parity tests pin "exact".
    """
    dtype = kappa.dtype
    np_dtype = np.dtype(dtype.name if hasattr(dtype, "name") else dtype)
    uvb = jnp.asarray(uvb, dtype)
    launches = _build_merged_launches(plan, np_dtype)
    # channel scale: negate+scale the 3 segment lengths, keep inv_n, and
    # scale the 3 reciprocal lengths to 1/len_n = -1/(len*cell)
    inv_cell = 1.0 / cell_size
    lens_scale = (
        jnp.asarray([-1.0, -1.0, -1.0, 0.0, 0.0, 0.0, 0.0, 0.0], dtype)
        * cell_size
        + jnp.asarray([0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0], dtype)
        + jnp.asarray([0.0, 0.0, 0.0, 0.0, -1.0, -1.0, -1.0, 0.0], dtype)
        * inv_cell)

    by_perm: dict[tuple[int, int, int], list[_MergedLaunch]] = {}
    for launch in launches:
        by_perm.setdefault(launch.perm, []).append(launch)

    jmean = jnp.zeros_like(kappa)
    plane_bytes = kappa.shape[2] * kappa.shape[3] * np_dtype.itemsize
    d_max = max(1, _ITOP_VMEM_BUDGET // plane_bytes)
    for q, perm_launches in by_perm.items():
        inv = [0, 0, 0]
        for a in range(3):
            inv[q[a]] = a
        kperm = jnp.transpose(kappa, (0,) + tuple(1 + x for x in inv))
        nslab, ny, nz = kperm.shape[1], kperm.shape[2], kperm.shape[3]
        j_perm = None
        for launch in perm_launches:
            ndir = len(launch.dirs_meta)
            for lo in range(0, ndir, d_max):
                hi = min(lo + d_max, ndir)
                jp = _merged_launch_call(
                    kperm,
                    (jnp.asarray(launch.lens[:, lo:hi]) *
                     lens_scale).reshape(-1),
                    jnp.asarray(launch.chains[:, lo:hi].reshape(-1)),
                    uvb, plan.weight,
                    dirs_meta=launch.dirs_meta[lo:hi],
                    reverse=launch.reverse, nslab=nslab, ny=ny, nz=nz,
                    interpret=interpret, skip_inactive=skip_inactive,
                    logmean=logmean)
                j_perm = jp if j_perm is None else j_perm + jp
        jmean = jmean + jnp.transpose(j_perm, (0,) + tuple(1 + x for x in q))
    return jmean


def make_jitted_sweep_pallas(plan: SweepPlan, interpret: bool = False,
                             logmean: str = "exact"):
    return jax.jit(lambda kappa, uvb, cell_size: diffuse_sweep_pallas(
        kappa, plan, uvb, cell_size, interpret=interpret, logmean=logmean))
