"""L-level nested (AMR) diffuse sweep.

Generalizes the two-level sweep (core.sweep_amr) to arbitrary nesting depth
with dense per-level fields (SURVEY.md §7.1).  The reference's recursive
refined transport (transportRoutinesModule.f90:560-963) nests to any depth;
here every level sweeps its own slab-template chain and adjacent levels
couple per base slab:

* cross-level reads follow the reference's neighbor resolution: a cell whose
  upwind face neighbor is a COARSER leaf copies that leaf's face-exit output
  (:637-648); one whose neighbor is REFINED reads the face-adjacent child
  leaf selected by its ray footpoint (getXY/XZ/YZNeighbour descent,
  :455-558);
* refinement maps must be properly nested and 2:1 FACE-BALANCED
  (core.amr.enforce_balance) so every face read spans at most one level —
  the reference descends arbitrarily, but its production grids are built
  balanced, and balance is what makes the dense formulation's adjacent-level
  coupling exact;
* per base slab, a fixed number of Gauss-Seidel passes over the level stack
  (coarsest to finest; finer-level estimates lag one pass) resolves in-slab
  coupling chains across refinement boundaries, exactly as in the two-level
  sweep.

Jmean is accumulated on leaf cells only; propagate with
amr.sync_restriction_multi.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import healpix, octants
from .sweep import _shift_j, _shift_k
from .sweep_amr import (
    _build_chain,
    _chain_arrays,
    _child_start,
    _prolong_plane,
    _segment_outputs,
)


@dataclasses.dataclass(frozen=True)
class MLZoneBatch:
    """Per-zone template chains for every level (one direction batch)."""
    izone: int
    ndir: int
    params: tuple      # per level: dict of (ndir, n * 2**level) arrays


@dataclasses.dataclass(frozen=True)
class MLSweepPlan:
    zones: tuple
    n_directions: int
    nslab: int
    n_levels: int

    @property
    def weight(self) -> float:
        return 1.0 / self.n_directions


def build_ml_sweep_plan(n_angular_level: int, nx: int,
                        n_levels: int) -> MLSweepPlan:
    """Per-level slab-template chains: the same ray family sampled at each
    resolution (setRaysRefined, transportRoutinesModule.f90:121-218)."""
    phi, theta = healpix.sweep_directions(n_angular_level)
    folded = octants.fold_all(phi, theta)
    groups = octants.group_by_zone(folded)
    zones = []
    for izone in sorted(groups):
        ds = groups[izone]
        per_level = []
        for ell in range(n_levels):
            chains = []
            for d in ds:
                start = (0.5, 0.5)
                for _ in range(ell):
                    start = _child_start(*start)
                chains.append(_chain_arrays(
                    _build_chain(d.phi, d.theta, nx * 2 ** ell, *start)))
            per_level.append({k: np.stack([c[k] for c in chains])
                              for k in chains[0]})
        zones.append(MLZoneBatch(izone=izone, ndir=len(ds),
                                 params=tuple(per_level)))
    return MLSweepPlan(zones=tuple(zones), n_directions=len(folded),
                       nslab=nx, n_levels=n_levels)


def _shift_plane_j(x, pad):
    return jnp.concatenate([pad, x[..., :-1, :]], axis=-2)


def _shift_plane_k(x, pad):
    return jnp.concatenate([pad, x[..., :, :-1]], axis=-1)


def _shift_mask_j(m, pad_val: bool):
    pad = jnp.full(m.shape[:-2] + (1, m.shape[-1]), pad_val)
    return jnp.concatenate([pad, m[..., :-1, :]], axis=-2)


def _shift_mask_k(m, pad_val: bool):
    pad = jnp.full(m.shape[:-1] + (1,), pad_val)
    return jnp.concatenate([pad, m[..., :, :-1]], axis=-1)


def sweep_zone_ml(k_rots, cover_rots, refined_rots, params, uvb,
                  cell_size, weight, n_coupling_iters: int = 4):
    """Sweep one zone over an L-level grid.

    k_rots[l]: (n*2^l, 3, ny*2^l, nz*2^l) rotated opacities;
    cover_rots[l]: matching bool (cell exists at level l);
    refined_rots[l]: bool, False on the finest level;
    params[l]: dict of (D, n*2^l) per-direction template-chain arrays
    (traced or host — shapes are all that matters for the trace cache).
    Returns per-level j_rot lists, each (n*2^l, 3, ny*2^l, nz*2^l).

    Compile-time structure (VERDICT r2 weak-1): the Gauss-Seidel coupling
    passes run as ONE specialized first pass (no prior fine/coarse
    estimates) plus a lax.fori_loop over the remaining passes with the
    per-(level, sub-slab) estimate planes as the carry, so the traced body
    count is 2*sum(2^l) regardless of n_coupling_iters, and the per-child
    plane selection is a vectorized advanced-index gather instead of a
    D-unrolled stack.
    """
    L = len(k_rots)
    n, _, ny, nz = k_rots[0].shape
    dtype = k_rots[0].dtype
    D = params[0]["len_xy"].shape[0]
    uvb = jnp.asarray(uvb, dtype)

    def bcast(shape):
        return jnp.broadcast_to(uvb[None, :, None, None], shape).astype(dtype)

    uvb_cell = [bcast((D, 3, ny * 2 ** l, nz * 2 ** l)) for l in range(L)]
    uvb_j = [bcast((D, 3, 1, nz * 2 ** l)) for l in range(L)]
    uvb_k = [bcast((D, 3, ny * 2 ** l, 1)) for l in range(L)]

    xs = []
    for l in range(L):
        m = 2 ** l
        entry = {
            "kappa": k_rots[l].reshape(n, m, 3, ny * m, nz * m),
            "cover": cover_rots[l].reshape(n, m, ny * m, nz * m),
            "refined": (refined_rots[l].reshape(n, m, ny * m, nz * m)
                        if l < L - 1
                        else jnp.zeros((n, m, ny * m, nz * m), bool)),
        }
        for key, v in params[l].items():
            arr = jnp.asarray(v).reshape(D, n, m).swapaxes(0, 1)  # (n,D,m)
            entry[key] = arr
        xs.append(entry)
    xs = tuple(xs)

    def body(carry, x):
        est, cov, ref = _slab_gauss_seidel(
            carry, x, L, ny, nz, D, uvb_j, uvb_k, cell_size,
            n_coupling_iters, dtype)

        js, carry_next = [], []
        for l in range(L):
            leaf = [cov[l][s] & ~ref[l][s] for s in range(2 ** l)]
            j_l = jnp.stack([
                weight * jnp.sum(jnp.where(leaf[s][None, None],
                                           est[l][s]["j_slab"], 0.0), axis=0)
                for s in range(2 ** l)])
            js.append(j_l)
            last = 2 ** l - 1
            carry_next.append((est[l][last]["top"], cov[l][last],
                               ref[l][last]))
        return tuple(carry_next), tuple(js)

    carry0 = tuple(
        (uvb_cell[l],
         jnp.ones((ny * 2 ** l, nz * 2 ** l), bool),
         jnp.zeros((ny * 2 ** l, nz * 2 ** l), bool))
        for l in range(L))
    _, js = jax.lax.scan(body, carry0, xs)
    # js[l]: (n, 2^l, 3, ny_l, nz_l) -> (n*2^l, 3, ny_l, nz_l)
    return [j.reshape(n * 2 ** l, 3, ny * 2 ** l, nz * 2 ** l)
            for l, j in enumerate(js)]


def _slab_gauss_seidel(carry, x, L, ny, nz, D, uvb_j, uvb_k, cell_size,
                       n_coupling_iters, dtype, level0_segs: bool = False):
    """Gauss-Seidel coupling passes for ONE base slab of an L-level stack.

    carry[l] = (top plane, cover-below, refined-below) at level l;
    x[l]: dict with "kappa" (2^l, 3, ny_l, nz_l), "cover"/"refined"
    (2^l, ny_l, nz_l), and the (D, 2^l) template params.  Returns
    (est, cov, ref) where est[l][s] holds the converged segment-output
    planes.  Shared by the dense (sweep_zone_ml) and block-sparse
    (core.sweep_sparse) sweeps — the transport math lives only here.

    uvb_j[0] / uvb_k[0] may be a (pad_seg2, pad_seg3) tuple of boundary
    lines instead of one plane: the windowed sparse sweep injects the
    plain full-plane pass's per-segment intermediates at the window edge
    (core.sweep_sparse).  level0_segs=True keeps the level-0 chained
    intermediates ('seg1'/'seg2') in est[0][0] for the window merge.
    """
    def sel_child(plane_f, cj, ck, nyl, nzl):
        """(D,3,2ny,2nz) finer plane -> (D,3,ny,nz): per-direction child
        (advanced-index dims broadcast to the front: (D,3,nyl,nzl))."""
        f = plane_f.reshape(D, 3, nyl, 2, nzl, 2)
        return f[jnp.arange(D), :, :, cj, :, ck]

    cov = [[x[l]["cover"][s] for s in range(2 ** l)] for l in range(L)]
    ref = [[x[l]["refined"][s] for s in range(2 ** l)] for l in range(L)]

    def sp_of(l, s):
        out = {}
        for key in ("len_xy", "len_xz", "len_yz", "x0", "y0",
                    "xz_x0", "xz_z0", "yz_y0", "yz_z0"):
            out[key] = x[l][key][:, s].astype(dtype)
        for key in ("chain2", "chain3", "n_active",
                    "top_xy", "top_xz", "top_yz"):
            out[key] = x[l][key][:, s]
        return out

    def one_pass(est):
        """One Gauss-Seidel pass over the level stack; est is the
        previous pass's (l, s) -> plane dict table (None on pass 1)."""
        new_est = [[None] * (2 ** l) for l in range(L)]
        for l in range(L):
            nyl, nzl = ny * 2 ** l, nz * 2 ** l
            for s in range(2 ** l):
                sp = sp_of(l, s)

                # ---- xy (bottom-face) input ----
                if s == 0:
                    t_same, cb, rb = carry[l]
                    t_coarse = carry[l - 1][0] if l > 0 else None
                    t_fine = carry[l + 1][0] if l < L - 1 else None
                else:
                    t_same = new_est[l][s - 1]["top"]
                    cb, rb = cov[l][s - 1], ref[l][s - 1]
                    t_coarse = (new_est[l - 1][(s - 1) // 2]["top"]
                                if l > 0 else None)
                    prev = (est[l + 1][2 * s - 1]
                            if est is not None and l < L - 1 else None)
                    t_fine = prev["top"] if prev is not None else None
                xy_in = t_same
                if t_coarse is not None:
                    xy_in = jnp.where(cb[None, None], xy_in,
                                      _prolong_plane(t_coarse))
                if t_fine is not None:
                    cj = (sp["y0"] >= 0.5).astype(jnp.int32)
                    ck = (sp["x0"] >= 0.5).astype(jnp.int32)
                    xy_in = jnp.where(
                        rb[None, None],
                        sel_child(t_fine, cj, ck, nyl, nzl), xy_in)

                nb_cov_j = _shift_mask_j(cov[l][s], True)
                nb_cov_k = _shift_mask_k(cov[l][s], True)
                nb_ref_j = _shift_mask_j(ref[l][s], False)
                nb_ref_k = _shift_mask_k(ref[l][s], False)
                c_est = new_est[l - 1][s // 2] if l > 0 else None
                f0 = (est[l + 1][2 * s]
                      if est is not None and l < L - 1 else None)
                f1 = (est[l + 1][2 * s + 1]
                      if est is not None and l < L - 1 else None)

                def mk_side(shift_x, shift_pl, nb_cov, nb_ref,
                            face, uvb_l, uvb_c, sub_key, in_key,
                            fixed_j: bool, sp=sp, c_est=c_est,
                            f0=f0, f1=f1, nyl=nyl, nzl=nzl):
                    def side(xp, seg):
                        pad = (uvb_l[seg] if isinstance(uvb_l, tuple)
                               else uvb_l)
                        v = shift_x(xp, pad)
                        if c_est is not None:
                            # tuple pads only occur at level 0 (window
                            # edges); the coarse pad line here feeds only
                            # first-row cells, which windows keep
                            # uncovered — any type-correct plane works
                            pad_c = (uvb_c[0] if isinstance(uvb_c, tuple)
                                     else uvb_c)
                            coarse = _prolong_plane(
                                shift_pl(c_est[face], pad_c))
                            v = jnp.where(nb_cov[None, None], v, coarse)
                        if f0 is not None:
                            sub1 = (sp[sub_key] >= 0.5)[:, None, None,
                                                        None]
                            cbit = (sp[in_key] >= 0.5).astype(jnp.int32)
                            ones = jnp.ones(D, jnp.int32)
                            cjx = ones if fixed_j else cbit
                            ckx = cbit if fixed_j else ones
                            leaf = jnp.where(
                                sub1,
                                sel_child(f1[face], cjx, ckx, nyl, nzl),
                                sel_child(f0[face], cjx, ckx, nyl, nzl))
                            v = jnp.where(nb_ref[None, None],
                                          shift_pl(leaf, pad), v)
                        return v
                    return side

                side_j = mk_side(
                    _shift_j, _shift_plane_j,
                    nb_cov_j, nb_ref_j, "exit_jface",
                    uvb_j[l], uvb_j[l - 1] if l > 0 else None,
                    "xz_z0", "xz_x0", fixed_j=True)
                side_k = mk_side(
                    _shift_k, _shift_plane_k,
                    nb_cov_k, nb_ref_k, "exit_kface",
                    uvb_k[l], uvb_k[l - 1] if l > 0 else None,
                    "yz_z0", "yz_y0", fixed_j=False)

                new_est[l][s] = _segment_outputs(
                    xy_in, x[l]["kappa"][s][None], sp,
                    cell_size / 2 ** l, side_j, side_k,
                    want_segs=(level0_segs and l == 0))
        return new_est

    est = one_pass(None)
    if n_coupling_iters > 1:
        as_tuple = lambda e: tuple(tuple(row) for row in e)
        est = jax.lax.fori_loop(
            1, n_coupling_iters,
            lambda _, e: as_tuple(one_pass(e)), as_tuple(est))
    return est, cov, ref


def diffuse_sweep_multilevel(kappas, refined, plan: MLSweepPlan, uvb,
                             cell_size, n_coupling_iters: int = 4):
    """Full L-level sweep.

    kappas[l]: (3, n*2^l, ...); refined[l]: (n*2^l)^3 bool (L-1 entries,
    properly nested and face-balanced).  Returns per-level Jmean list
    (leaf cells only; sync with amr.sync_restriction_multi).

    Zones with equal direction counts are batched into one lax.scan whose
    body rotates the fields with a lax.switch over the 24 static octant
    transforms, sweeps, and rotates the J contribution back — so the heavy
    sweep body is traced/compiled once per direction-count group instead of
    once per zone (24x at nAngularLevel=1; VERDICT r2 weak-1).  Non-cubic
    grids fall back to the per-zone Python loop (octant transposes change
    array shapes, which lax.switch cannot express).
    """
    L = plan.n_levels
    assert len(kappas) == L and len(refined) == L - 1
    from .amr import prolong
    cover = [jnp.ones(kappas[0].shape[1:], bool)]
    for r in refined:
        cover.append(prolong(jnp.asarray(r, bool) & cover[-1]))
    refined = [jnp.asarray(r, bool) for r in refined]

    k_l = [jnp.moveaxis(k, 0, -1) for k in kappas]
    j_acc = [jnp.zeros_like(k) for k in k_l]
    shape0 = kappas[0].shape[1:]
    if len(set(shape0)) != 1:
        for zone in plan.zones:
            k_rots = [jnp.moveaxis(octants.rotate_to_sweep(k, zone.izone),
                                   -1, 1) for k in k_l]
            cov_rots = [octants.rotate_to_sweep(c, zone.izone) for c in cover]
            ref_rots = [octants.rotate_to_sweep(r, zone.izone)
                        for r in refined]
            js = sweep_zone_ml(k_rots, cov_rots, ref_rots, zone.params, uvb,
                               cell_size, plan.weight, n_coupling_iters)
            for l in range(L):
                j_acc[l] = j_acc[l] + octants.rotate_from_sweep(
                    jnp.moveaxis(js[l], 1, -1), zone.izone)
        return [jnp.moveaxis(j, -1, 0) for j in j_acc]

    # group zones by direction count (fold_all yields unequal zone sizes)
    groups: dict[int, list[MLZoneBatch]] = {}
    for zone in plan.zones:
        groups.setdefault(zone.ndir, []).append(zone)

    def rot_in(iz):
        def f(_):
            return (
                tuple(jnp.moveaxis(octants.rotate_to_sweep(k, iz), -1, 1)
                      for k in k_l),
                tuple(octants.rotate_to_sweep(c, iz) for c in cover),
                tuple(octants.rotate_to_sweep(r, iz) for r in refined),
            )
        return f

    def rot_out(iz):
        def f(js):
            return tuple(octants.rotate_from_sweep(jnp.moveaxis(j, 1, -1), iz)
                         for j in js)
        return f

    in_branches = [rot_in(iz) for iz in range(1, 25)]
    out_branches = [rot_out(iz) for iz in range(1, 25)]

    for zones in groups.values():
        izones = jnp.asarray([z.izone - 1 for z in zones], jnp.int32)
        stacked = tuple(
            {key: jnp.asarray(np.stack([z.params[l][key] for z in zones]))
             for key in zones[0].params[l]}
            for l in range(L))

        def body(carry, x, _iz=None):
            iz, pars = x
            k_rots, cov_rots, ref_rots = jax.lax.switch(iz, in_branches, None)
            js = sweep_zone_ml(list(k_rots), list(cov_rots), list(ref_rots),
                               pars, uvb, cell_size, plan.weight,
                               n_coupling_iters)
            jb = jax.lax.switch(iz, out_branches, tuple(js))
            return [c + j for c, j in zip(carry, jb)], None

        j_acc, _ = jax.lax.scan(body, j_acc, (izones, stacked))
    return [jnp.moveaxis(j, -1, 0) for j in j_acc]


def coupling_residual(kappas, refined, plan: MLSweepPlan, uvb, cell_size,
                      n_coupling_iters: int = 4):
    """Convergence diagnostic for the fixed Gauss-Seidel coupling depth
    (VERDICT r2 weak-5): the max leaf-cell relative Jmean change from one
    extra coupling pass.  In-slab coupling chains have finite depth, so
    this residual hits zero once n_coupling_iters covers the longest chain;
    a large value means the depth under-resolves the refinement pattern."""
    from .amr import prolong
    js_a = diffuse_sweep_multilevel(kappas, refined, plan, uvb, cell_size,
                                    n_coupling_iters)
    js_b = diffuse_sweep_multilevel(kappas, refined, plan, uvb, cell_size,
                                    n_coupling_iters + 1)
    L = plan.n_levels
    cover = [jnp.ones(kappas[0].shape[1:], bool)]
    for r in refined:
        cover.append(prolong(jnp.asarray(r, bool) & cover[-1]))
    res = 0.0
    for ell in range(L):
        leaf = cover[ell]
        if ell < L - 1:
            leaf = leaf & ~jnp.asarray(refined[ell], bool)
        a, b = js_a[ell], js_b[ell]
        scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-300)
        d = jnp.max(jnp.where(leaf[None], jnp.abs(a - b), 0.0)) / scale
        res = jnp.maximum(res, d)
    return float(res)


def pick_coupling_iters(kappas, refined, plan: MLSweepPlan, uvb, cell_size,
                        tol: float = 1e-8, max_iters: int = 12) -> int:
    """Smallest coupling depth whose one-more-pass residual is below tol
    (auto-selection companion to coupling_residual)."""
    for iters in range(1, max_iters + 1):
        if coupling_residual(kappas, refined, plan, uvb, cell_size,
                             iters) < tol:
            return iters
    return max_iters


def make_jitted_sweep_ml(plan: MLSweepPlan, n_coupling_iters: int = 4):
    return jax.jit(lambda ks, refined, uvb, cell_size:
                   diffuse_sweep_multilevel(ks, refined, plan, uvb, cell_size,
                                            n_coupling_iters))
