"""Block-sparse deep-AMR storage: memory proportional to leaves.

The reference's fully-threaded octree costs memory proportional to the leaf
count (zoneType, /root/reference/definitionsModule.f90:163-180); the dense
per-level representation (core.amr.MultiLevelState) costs (n*2^l)^3 per
level and cannot hold a production 128^3 + depth-4 grid in one chip's HBM
(~68 GB dense vs ~16 GB).  This module stores every refined level as a list
of BLOCKS:

* level 0 stays dense (n^3) — it is always fully covered;
* level l >= 1 is a set of blocks of `be`^3 level-l cells (be/2 parent
  cells per side).  A block exists wherever any parent cell in its tile is
  refined, so memory is proportional to the refined volume (up to tile
  granularity, which favors the clustered refinement of real cosmological
  grids — cf. the insertion recursion equiSources.f90:1870-1974);
* a dense tile->slot volume per level, (n*2^l/be)^3 int32 (tiny: int32 at
  1/be^3 of the level's resolution), gives O(1) random access for the ray
  tracer and the sweep's slab gathers;
* the LAST slot of every level is an all-zero padding block (cover False,
  origin out of range) so gathers through absent tiles are safe and
  restriction scatters from it drop out of bounds.

Fully-threaded semantics (restrict/prolong, leaf masks) operate on block
lists; the sweep (core.sweep_sparse) gathers dense cross-section planes per
slab from block storage, so the transport math is IDENTICAL to the dense
multilevel path and parity is exact.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .amr import MultiLevelState, enforce_balance, prolong, restrict_any
from .state import FieldState, GridGeometry, make_state

# FieldState entries carried per level (everything; Jmean is (3, ...))
_FIELD_NAMES = [f.name for f in dataclasses.fields(FieldState)]


def _present_names(fs: FieldState):
    """Field names with data (optional fields like vel may be None)."""
    return [n for n in _FIELD_NAMES if getattr(fs, n) is not None]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseLevel:
    """One refined level stored as blocks.

    fields: FieldState whose arrays are (nb, be, be, be) (Jmean is
    (3, nb, be, be, be)); slot nb-1 is the zero padding block.
    slot: (T, T, T) int32, T = n*2^l / be; -1 where no block exists.
    origin: (nb, 3) int32 block origins in level-l cell units (padding
    block's origin is out of range so its scatters drop).
    cover: (nb, be, be, be) bool — the cell exists (its parent is refined).
    refined: same shape — the cell is refined into level l+1 (all False on
    the finest level).
    """
    fields: FieldState
    slot: jax.Array
    origin: jax.Array
    cover: jax.Array
    refined: jax.Array

    @property
    def n_blocks(self) -> int:
        return self.cover.shape[0]

    @property
    def be(self) -> int:
        return self.cover.shape[-1]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SparseMLState:
    """L-level nested state with block-sparse refined levels.

    base/refined0 are dense on (n, n, n); levels[l-1] holds level l.
    Refinement maps are properly nested and 2:1 face-balanced
    (core.amr.enforce_balance), as the sweep's adjacent-level coupling
    requires.
    """
    base: FieldState
    refined0: jax.Array
    levels: tuple

    @property
    def n_levels(self) -> int:
        return 1 + len(self.levels)

    @property
    def n(self) -> int:
        return self.base.rho.shape[0]

    @property
    def be(self) -> int:
        return self.levels[0].be if self.levels else 8

    def n_leaves(self) -> int:
        total = int(jnp.sum(~self.refined0))
        for lv in self.levels:
            total += int(jnp.sum(lv.cover & ~lv.refined))
        return total

    def memory_bytes(self) -> int:
        leaves = jax.tree_util.tree_leaves((self.base, self.refined0,
                                            self.levels))
        return sum(x.size * x.dtype.itemsize for x in leaves)


def flat_lookup(slot_map, c, be: int):
    """Block-storage flat index for level cells c (..., 3) int32.

    Returns (idx into the (nb*be^3,) flattened block data, exists bool).
    Absent tiles route to slot -1, i.e. a negative index that callers must
    guard (gathers clamp to the padding block via jnp.where on `exists`;
    scatter callers redirect masked-out indices out of bounds so they drop).
    Out-of-range cells read a clamped tile, so callers must also bound-check
    c when it can leave the domain."""
    t = slot_map[c[..., 0] // be, c[..., 1] // be, c[..., 2] // be]
    exists = t >= 0
    off = ((c[..., 0] % be) * be + c[..., 1] % be) * be + c[..., 2] % be
    return t * be ** 3 + off, exists


def _zeros_like_field(shape, dtype):
    z = jnp.zeros(shape, dtype)
    return FieldState(
        rho=z, tgas=z, HI=z, HeI=z, HeII=z, abun2=z,
        krate24=z, krate25=z, krate26=z, crate24=z, crate25=z, crate26=z,
        Jmean=jnp.zeros((3,) + shape, dtype), hydroHeating=z)


def sparse_from_dense(ml: MultiLevelState, be: int = 8) -> SparseMLState:
    """Convert a dense MultiLevelState to block-sparse storage (host-side).

    Block tiles are chosen over the dense cover mask; uncovered cells inside
    a block keep the dense level's (prolonged) values so sweep parity against
    the dense path is exact even for reads that masks later discard."""
    L = ml.n_levels
    n = ml.n
    refined = [np.asarray(r) for r in ml.refined]
    cover = [np.ones((n, n, n), bool)]
    for r in refined:
        cover.append(np.repeat(np.repeat(np.repeat(
            r & cover[-1], 2, 0), 2, 1), 2, 2))

    levels = []
    for ell in range(1, L):
        n_l = n * 2 ** ell
        assert n_l % be == 0, f"block edge {be} must divide level size {n_l}"
        T = n_l // be
        cov = cover[ell]
        ref = (np.asarray(refined[ell]) & cov if ell < L - 1
               else np.zeros_like(cov))
        tile_any = cov.reshape(T, be, T, be, T, be).any(axis=(1, 3, 5))
        tiles = np.argwhere(tile_any)                       # (nb_real, 3)
        nb = len(tiles) + 1                                 # + padding
        slot = np.full((T, T, T), -1, np.int32)
        slot[tiles[:, 0], tiles[:, 1], tiles[:, 2]] = np.arange(
            len(tiles), dtype=np.int32)
        origin = np.concatenate([tiles * be, [[n_l, n_l, n_l]]]).astype(
            np.int32)

        def block3(x3):
            """Dense (n_l,n_l,n_l) -> (nb, be, be, be) blocks (+ padding)."""
            t = x3.reshape(T, be, T, be, T, be).transpose(0, 2, 4, 1, 3, 5)
            picked = t[tiles[:, 0], tiles[:, 1], tiles[:, 2]]
            pad = np.zeros((1, be, be, be), x3.dtype)
            return np.concatenate([picked, pad], axis=0)

        def blockify(x):
            x = np.asarray(x)
            if x.ndim == 3:
                return block3(x)
            return np.stack([block3(x[i]) for i in range(x.shape[0])])

        st = ml.levels[ell]
        fields = FieldState(**{
            name: jnp.asarray(blockify(np.asarray(getattr(st, name))))
            for name in _present_names(st)})
        levels.append(SparseLevel(
            fields=fields, slot=jnp.asarray(slot),
            origin=jnp.asarray(origin),
            cover=jnp.asarray(blockify(cov)),
            refined=jnp.asarray(blockify(ref))))
    return SparseMLState(base=ml.levels[0],
                         refined0=jnp.asarray(refined[0], bool)
                         if refined else jnp.zeros((n, n, n), bool),
                         levels=tuple(levels))


def dense_from_sparse(sp: SparseMLState) -> MultiLevelState:
    """Inverse of sparse_from_dense (host-side; for parity tests and
    snapshot interop).  Uncovered cells prolong from the parent level,
    matching make_multilevel_state's dense fill convention."""
    n = sp.n
    L = sp.n_levels
    levels = [sp.base]
    refined = [jnp.asarray(sp.refined0, bool)] if L > 1 else []
    prev = sp.base
    for ell in range(1, L):
        lv = sp.levels[ell - 1]
        be = lv.be
        n_l = n * 2 ** ell
        T = n_l // be
        slot = np.asarray(lv.slot)
        tiles = np.argwhere(slot >= 0)
        slots = slot[tiles[:, 0], tiles[:, 1], tiles[:, 2]]

        def unblock3(blocks3, fill3):
            """(nb,be,be,be) blocks onto a filled dense (n_l,n_l,n_l)."""
            t = np.asarray(fill3).reshape(T, be, T, be, T, be)
            t = np.ascontiguousarray(t.transpose(0, 2, 4, 1, 3, 5))
            t[tiles[:, 0], tiles[:, 1], tiles[:, 2]] = \
                np.asarray(blocks3)[slots]
            return t.transpose(0, 3, 1, 4, 2, 5).reshape(n_l, n_l, n_l)

        def unblockify(blocks, fill):
            blocks = np.asarray(blocks)
            if blocks.ndim == 4:
                return unblock3(blocks, fill)
            return np.stack([unblock3(blocks[i], fill[i])
                             for i in range(blocks.shape[0])])

        def pl(x):
            x = np.asarray(x)
            if x.ndim == 3:
                return np.repeat(np.repeat(np.repeat(x, 2, 0), 2, 1), 2, 2)
            return np.stack([np.repeat(np.repeat(np.repeat(
                x[i], 2, 0), 2, 1), 2, 2) for i in range(x.shape[0])])

        fields = {}
        for name in _present_names(lv.fields):
            fill = pl(getattr(prev, name))
            fields[name] = jnp.asarray(
                unblockify(getattr(lv.fields, name), fill))
        st = FieldState(**fields)
        levels.append(st)
        if ell < L - 1:
            refined.append(jnp.asarray(unblockify(
                lv.refined, np.zeros((n_l, n_l, n_l), bool))))
        prev = st
    return MultiLevelState(levels=tuple(levels), refined=tuple(refined))


def make_sparse_state(base: FieldState, refined, be: int = 8,
                      level_hook=None) -> SparseMLState:
    """Build a block-sparse L-level state WITHOUT densifying field data.

    base: dense (n,n,n) FieldState; refined: list of L-1 dense bool maps
    (properly nested + face-balanced; bool volumes stay affordable up to
    depth 4-5 where dense float fields would not).  Refined-level fields
    prolong-fill from the parent level block by block, mirroring the
    reference's refine-time parent copy (equiSources.f90:1892-1896), so a
    production 128^3 + 3-level grid builds directly at O(leaves) memory.

    level_hook(ell, lv) -> SparseLevel | None: applied to each level as it
    is built, BEFORE the next level prolong-fills from it — the ingestion
    path (sparse_from_level_lists) uses it to scatter real field data so
    deeper levels inherit data-filled (not base-prolonged) values.
    """
    n = base.rho.shape[0]
    L = 1 + len(refined)
    refined = [np.asarray(r, bool) for r in refined]
    levels = []
    parent_cover = np.ones((n, n, n), bool)
    parent_level = None                     # None -> dense base
    for ell in range(1, L):
        n_l = n * 2 ** ell
        assert n_l % be == 0
        T = n_l // be
        hp = be // 2                        # parent cells per tile side
        pr = refined[ell - 1] & parent_cover
        tile_any = pr.reshape(T, hp, T, hp, T, hp).any(axis=(1, 3, 5))
        tiles = np.argwhere(tile_any)
        nb = len(tiles) + 1
        slot = np.full((T, T, T), -1, np.int32)
        slot[tiles[:, 0], tiles[:, 1], tiles[:, 2]] = np.arange(
            len(tiles), dtype=np.int32)
        origin = np.concatenate([tiles * be, [[n_l, n_l, n_l]]]).astype(
            np.int32)

        # per-block parent coordinates (nb_real, be, be, be, 3)
        off = np.arange(be)
        pc = ((tiles[:, None, None, None, :] * be
               + np.stack(np.meshgrid(off, off, off, indexing="ij"),
                          axis=-1)[None]) // 2)
        px, py, pz = pc[..., 0], pc[..., 1], pc[..., 2]

        cover_blocks = np.concatenate(
            [pr[px, py, pz], np.zeros((1, be, be, be), bool)], axis=0)
        if ell < L - 1:
            cc = tiles[:, None, None, None, :] * be + np.stack(
                np.meshgrid(off, off, off, indexing="ij"), axis=-1)[None]
            ref_blocks = np.concatenate(
                [refined[ell][cc[..., 0], cc[..., 1], cc[..., 2]]
                 & cover_blocks[:-1],
                 np.zeros((1, be, be, be), bool)], axis=0)
        else:
            ref_blocks = np.zeros((nb, be, be, be), bool)

        if parent_level is None:
            def parent_gather(x):
                x = np.asarray(x)
                if x.ndim == 3:
                    return x[px, py, pz]
                return np.stack([x[i][px, py, pz]
                                 for i in range(x.shape[0])])
        else:
            pbe = parent_level.be
            pslot = np.asarray(parent_level.slot)
            pt = pslot[px // pbe, py // pbe, pz // pbe]
            pt = np.where(pt < 0, parent_level.n_blocks - 1, pt)
            pidx = (pt * pbe ** 3 + ((px % pbe) * pbe + py % pbe) * pbe
                    + pz % pbe)

            def parent_gather(x, pidx=pidx):
                x = np.asarray(x)
                if x.ndim == 4:
                    return x.reshape(-1)[pidx]
                return np.stack([x[i].reshape(-1)[pidx]
                                 for i in range(x.shape[0])])

        src = base if parent_level is None else parent_level.fields
        fields = {}
        for name in _present_names(src):
            g = parent_gather(getattr(src, name))
            pad_shape = ((1, be, be, be) if g.ndim == 4
                         else (g.shape[0], 1, be, be, be))
            pad = np.zeros(pad_shape, g.dtype)
            fields[name] = jnp.asarray(
                np.concatenate([g, pad], axis=g.ndim - 4))
        lv = SparseLevel(fields=FieldState(**fields),
                         slot=jnp.asarray(slot),
                         origin=jnp.asarray(origin),
                         cover=jnp.asarray(cover_blocks),
                         refined=jnp.asarray(ref_blocks))
        if level_hook is not None:
            lv = level_hook(ell, lv) or lv
        levels.append(lv)
        parent_level = lv
        if ell < L - 1:     # the finest cover volume is never needed
            parent_cover = np.repeat(np.repeat(np.repeat(pr, 2, 0), 2, 1),
                                     2, 2)
    return SparseMLState(base=base,
                         refined0=jnp.asarray(refined[0], bool)
                         if refined else jnp.zeros((n, n, n), bool),
                         levels=tuple(levels))


def sparse_from_level_lists(level_lists, read_metals: bool, be: int = 8,
                            max_depth: int | None = None, dtype=None,
                            smooth_metals: bool = True):
    """SparseMLState from ingested per-level cell lists at O(leaves) memory.

    The production ingestion path: the reference inserts every input cell
    directly into the octree (placeCellProjectWithVelocity,
    /root/reference/equiSources.f90:1870-1974) so its memory is O(leaves);
    the dense path (amr.multilevel_from_levels) allocates (n*2^l)^3 float
    volumes per level and cannot hold a production 128^3 + depth-4 grid.
    Here only the refinement BITMAPS are dense host-side (bool/int8,
    affordable to depth ~5); field data goes straight into blocks:

    1. block structure + parent prolong fill via make_sparse_state
       (the reference's refine-time parent copy, equiSources.f90:1892-1896);
    2. the REAL level-l cell values scatter into their block slots
       (volume-weighted averaging when several deeper-than-kept cells land
       in one kept cell, mirroring io.grid_io.levels_to_dense);
    3. fine-leaf restriction propagates down (sync_restriction_sparse),
       so parents of refined cells hold child averages exactly as the
       dense ingestion does.

    Returns (SparseMLState, GridGeometry).
    """
    import jax.numpy as jnp

    from ..constants import MH, MHE, PSI
    from ..io import grid_io
    dtype = dtype or jnp.float32
    level_lists, box = grid_io.normalize_coordinates(level_lists)
    n = round(level_lists[0].ncell ** (1.0 / 3.0))
    geom = GridGeometry(n, n, n, box)
    depth = min(len(level_lists), max_depth or len(level_lists))

    # base level: dense (the base is always fully covered)
    base_dense = grid_io.levels_to_dense(level_lists[:1], n, read_metals)
    abun2 = base_dense["abun2"]
    if read_metals and smooth_metals:
        abun2 = grid_io.smooth_metallicity(abun2)
    vel0 = (np.stack([base_dense["velx"], base_dense["vely"],
                      base_dense["velz"]])
            if "velx" in base_dense else None)
    base = make_state(base_dense["nh"] * MH / PSI, base_dense["tgas"],
                      base_dense["nh"] * base_dense["xneu"], abun2=abun2,
                      dtype=dtype, vel=vel0)

    # refinement bitmaps (dense bool per PARENT level; deepest is
    # (n*2^(depth-2))^3 — e.g. 512^3 = 134 MB for 128^3 + 3 levels)
    refined = []
    for ell in range(1, depth):
        n_par = n * 2 ** (ell - 1)
        r = np.zeros((n_par, n_par, n_par), bool)
        idx = np.clip((level_lists[ell].pos * n_par).astype(int),
                      0, n_par - 1)
        r[idx[:, 0], idx[:, 1], idx[:, 2]] = True
        refined.append(r)
    refined = enforce_balance(refined)

    # scatter the real per-level field data into each level's blocks as it
    # is built, so deeper levels prolong-fill from DATA-filled parents
    has_vel = vel0 is not None

    def scatter_hook(ell: int, lv: SparseLevel) -> SparseLevel:
        n_l = n * 2 ** ell
        slot = np.asarray(lv.slot)
        nslots = lv.n_blocks * be ** 3
        lists = (level_lists[ell:] if ell == depth - 1
                 else level_lists[ell:ell + 1])
        cols = ["tgas", "nh", "xneu", "abun2"]
        if has_vel:
            cols += ["velx", "vely", "velz"]
        sums = {k: np.zeros(nslots) for k in cols}
        wsum = np.zeros(nslots)
        for li, ld in enumerate(lists):
            if ld.ncell == 0:
                continue
            c = np.clip((ld.pos * n_l).astype(np.int64), 0, n_l - 1)
            t = slot[c[:, 0] // be, c[:, 1] // be, c[:, 2] // be]
            off = ((c[:, 0] % be) * be + c[:, 1] % be) * be + c[:, 2] % be
            flat = t * be ** 3 + off
            ok = t >= 0     # cells outside any block (shouldn't happen
            #                 for the lists that DEFINED the refinement;
            #                 possible for deeper absorbed lists)
            w = 8.0 ** (-li)
            vals = {
                "tgas": 10.0 ** ld.lT.astype(np.float64),
                "nh": 10.0 ** ld.lnH.astype(np.float64),
                "xneu": 10.0 ** ld.lx.astype(np.float64),
                "abun2": (ld.abun[:, 1].astype(np.float64)
                          if ld.abun is not None
                          else np.full(ld.ncell, 0.02)),
            }
            if has_vel:
                v = (ld.vel.astype(np.float64) if ld.vel is not None
                     else np.zeros((ld.ncell, 3)))
                vals.update(velx=v[:, 0], vely=v[:, 1], velz=v[:, 2])
            fl = flat[ok]
            for k in cols:
                np.add.at(sums[k], fl, w * vals[k][ok])
            np.add.at(wsum, fl, w)
        got = wsum > 0
        norm = np.where(got, wsum, 1.0)
        avg = {k: sums[k] / norm for k in cols}
        bshape = (lv.n_blocks, be, be, be)

        def put(cur, new_flat):
            cur = np.asarray(cur, np.float64).reshape(-1)
            return jnp.asarray(np.where(got, new_flat, cur).reshape(bshape),
                               dtype)

        f = lv.fields
        upd = dict(
            rho=put(f.rho, avg["nh"] * MH / PSI),
            tgas=put(f.tgas, avg["tgas"]),
            HI=put(f.HI, avg["nh"] * avg["xneu"]),
            # ingested helium starts fully neutral where data landed
            # (placeCellProjectWithVelocity, equiSources.f90:1941-1943)
            HeI=put(f.HeI, (1.0 - PSI) * (avg["nh"] * MH / PSI) / MHE),
            HeII=put(f.HeII, np.zeros(nslots)),
            abun2=put(f.abun2, avg["abun2"]))
        if has_vel:
            vcur = np.asarray(f.vel, np.float64).reshape(3, -1)
            vnew = np.stack([avg["velx"], avg["vely"], avg["velz"]])
            upd["vel"] = jnp.asarray(
                np.where(got[None], vnew, vcur).reshape((3,) + bshape),
                dtype)
        return dataclasses.replace(lv, fields=dataclasses.replace(f, **upd))

    state = make_sparse_state(base, refined, be=be,
                              level_hook=scatter_hook)
    state = sync_restriction_sparse(state)
    return state, geom


def pad_blocks_to_multiple(state: SparseMLState, multiple: int
                           ) -> SparseMLState:
    """Append zero padding blocks so every level's block count divides
    `multiple` (device_put block-axis sharding needs divisibility).

    Extra pad blocks carry the same contract as the standard final padding
    block — zero fields, cover False, origin out of range — so gathers
    through them read zeros and scatters to them drop; the slot map never
    references them (absent tiles route to nb-1, which is itself a zero
    pad block)."""
    if multiple <= 1:
        return state
    new_levels = []
    for lv in state.levels:
        nb, be = lv.n_blocks, lv.be
        extra = (-nb) % multiple
        if extra == 0:
            new_levels.append(lv)
            continue
        n_l = lv.slot.shape[0] * be

        def pad(x, extra=extra):
            if not hasattr(x, "ndim") or x.ndim < 4:
                return x
            ax = x.ndim - 4
            widths = [(0, 0)] * x.ndim
            widths[ax] = (0, extra)
            return jnp.pad(x, widths)

        fields = jax.tree_util.tree_map(pad, lv.fields)
        origin = jnp.concatenate(
            [lv.origin, jnp.full((extra, 3), n_l, jnp.int32)])
        new_levels.append(SparseLevel(
            fields=fields, slot=lv.slot, origin=origin,
            cover=pad(lv.cover), refined=pad(lv.refined)))
    return dataclasses.replace(state, levels=tuple(new_levels))


def blockify_like(lv: SparseLevel, x):
    """Host-side: dense level array (..., n_l, n_l, n_l) -> blocks
    (..., nb, be, be, be) matching lv's slot layout (padding block zero)."""
    be = lv.be
    x = np.asarray(x)
    n_l = x.shape[-1]
    T = n_l // be
    slot = np.asarray(lv.slot)
    tiles = np.argwhere(slot >= 0)

    def block3(x3):
        t = x3.reshape(T, be, T, be, T, be).transpose(0, 2, 4, 1, 3, 5)
        picked = t[tiles[:, 0], tiles[:, 1], tiles[:, 2]]
        return np.concatenate([picked, np.zeros((1, be, be, be),
                                                x3.dtype)], 0)

    if x.ndim == 3:
        return jnp.asarray(block3(x))
    return jnp.asarray(np.stack([block3(x[i]) for i in range(x.shape[0])]))


def unblockify_like(lv: SparseLevel, blocks, fill=0.0):
    """Host-side inverse of blockify_like; absent tiles take `fill`."""
    be = lv.be
    blocks = np.asarray(blocks)
    slot = np.asarray(lv.slot)
    T = slot.shape[0]
    n_l = T * be
    tiles = np.argwhere(slot >= 0)
    slots = slot[tiles[:, 0], tiles[:, 1], tiles[:, 2]]

    def un3(b3):
        t = np.full((T, T, T, be, be, be), fill, b3.dtype)
        t[tiles[:, 0], tiles[:, 1], tiles[:, 2]] = b3[slots]
        return t.transpose(0, 3, 1, 4, 2, 5).reshape(n_l, n_l, n_l)

    if blocks.ndim == 4:
        return un3(blocks)
    return np.stack([un3(blocks[i]) for i in range(blocks.shape[0])])


def _restrict_blocks(x):
    """(..., nb, be, be, be) -> (..., nb, be/2, be/2, be/2) child average."""
    lead = x.shape[:-3]
    h = x.shape[-1] // 2
    return x.reshape(lead + (h, 2, h, 2, h, 2)).mean(axis=(-5, -3, -1))


def sync_restriction_tree(state: SparseMLState, base_tree, level_trees):
    """Propagate fine-leaf restrictions down through every level of an
    ARBITRARY pytree family sharing the state's block geometry: base_tree
    arrays are (n, n, n) (or leading-stacked (c, n, n, n)); level_trees[l-1]
    arrays are (nb, be, be, be) (or (c, nb, be, be, be)).  Refined parents
    end up holding their children's average — the engine behind
    sync_restriction_sparse, exposed so auxiliary per-cell state (e.g. the
    9-species noneq network) restricts with the same geometry."""
    L = state.n_levels
    n = state.n
    trees = list(level_trees)
    for ell in range(L - 1, 0, -1):
        lv = state.levels[ell - 1]
        be = lv.be
        h = be // 2
        rest = jax.tree_util.tree_map(_restrict_blocks, trees[ell - 1])
        p0 = lv.origin // 2                                  # (nb, 3)
        oy = jnp.arange(h)
        ix = p0[:, 0, None, None, None] + oy[None, :, None, None]
        iy = p0[:, 1, None, None, None] + oy[None, None, :, None]
        iz = p0[:, 2, None, None, None] + oy[None, None, None, :]
        ix, iy, iz = jnp.broadcast_arrays(ix, iy, iz)
        if ell - 1 == 0:
            mask = state.refined0[
                jnp.clip(ix, 0, n - 1), jnp.clip(iy, 0, n - 1),
                jnp.clip(iz, 0, n - 1)] & (ix < n)

            ixc = jnp.clip(ix, 0, n - 1)
            iyc = jnp.clip(iy, 0, n - 1)
            izc = jnp.clip(iz, 0, n - 1)

            def write_dense(b, r):
                if b.ndim == 3:
                    # order-independent masked write: scatter-ADD the
                    # masked values and a hit count at CLIPPED (in-bounds)
                    # indices, then select.  Masked-out entries add zeros,
                    # so index collisions from clipping are harmless —
                    # same drop semantics as an OOB scatter, but
                    # checkify-clean and GSPMD-shardable (an appended dump
                    # slot would force a full-array all-gather)
                    vals = jnp.zeros_like(b).at[ixc, iyc, izc].add(
                        jnp.where(mask, r.astype(b.dtype), 0))
                    cnt = jnp.zeros(b.shape, jnp.int32).at[
                        ixc, iyc, izc].add(mask.astype(jnp.int32))
                    return jnp.where(cnt > 0, vals, b)
                return jnp.stack([write_dense(b[i], r[i])
                                  for i in range(b.shape[0])])
            base_tree = jax.tree_util.tree_map(write_dense, base_tree,
                                               rest)
        else:
            par = state.levels[ell - 2]
            pbe = par.be
            n_par = n * 2 ** (ell - 1)
            in_range = ix < n_par      # padding origins are fully OOB
            cells = jnp.stack([jnp.clip(ix, 0, n_par - 1),
                               jnp.clip(iy, 0, n_par - 1),
                               jnp.clip(iz, 0, n_par - 1)], axis=-1)
            idx, exists = flat_lookup(par.slot, cells, pbe)
            nbp = par.n_blocks
            # refined mask at the parent cells
            pref = par.refined.reshape(-1)[jnp.clip(idx, 0,
                                                    nbp * pbe ** 3 - 1)]
            mask = exists & pref & in_range
            idx_c = jnp.clip(idx, 0, nbp * pbe ** 3 - 1)

            def write_sparse(b, r):
                if b.ndim == 4:
                    # same order-independent masked write as write_dense
                    # (see above): in-bounds scatter-ADD + count select
                    flat = b.reshape(-1)
                    vals = jnp.zeros_like(flat).at[idx_c].add(
                        jnp.where(mask, r.astype(b.dtype), 0))
                    cnt = jnp.zeros(flat.shape, jnp.int32).at[idx_c].add(
                        mask.astype(jnp.int32))
                    return jnp.where(cnt > 0, vals,
                                     flat).reshape(b.shape)
                return jnp.stack([write_sparse(b[i], r[i])
                                  for i in range(b.shape[0])])
            trees[ell - 2] = jax.tree_util.tree_map(write_sparse,
                                                    trees[ell - 2], rest)
    return base_tree, tuple(trees)


def sync_restriction_sparse(state: SparseMLState) -> SparseMLState:
    """Propagate fine-leaf restrictions down through every level
    (the sparse analog of amr.sync_restriction_multi)."""
    names = _present_names(state.base)
    base_tree = {name: getattr(state.base, name) for name in names}
    level_trees = [{name: getattr(lv.fields, name) for name in names}
                   for lv in state.levels]
    base_tree, level_trees = sync_restriction_tree(state, base_tree,
                                                   level_trees)
    base = dataclasses.replace(state.base, **base_tree)
    levels = tuple(
        dataclasses.replace(lv, fields=dataclasses.replace(lv.fields, **t))
        for lv, t in zip(state.levels, level_trees))
    return SparseMLState(base=base, refined0=state.refined0, levels=levels)
