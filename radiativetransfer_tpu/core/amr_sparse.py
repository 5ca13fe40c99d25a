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


def make_sparse_state(base: FieldState, refined, be: int = 8
                      ) -> SparseMLState:
    """Build a block-sparse L-level state WITHOUT densifying field data.

    base: dense (n,n,n) FieldState; refined: list of L-1 dense bool maps
    (properly nested + face-balanced; bool volumes stay affordable up to
    depth 4-5 where dense float fields would not).  Refined-level fields
    prolong-fill from the parent level block by block, mirroring the
    reference's refine-time parent copy (equiSources.f90:1892-1896), so a
    production 128^3 + 3-level grid builds directly at O(leaves) memory.
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
        levels.append(lv)
        parent_level = lv
        if ell < L - 1:     # the finest cover volume is never needed
            parent_cover = np.repeat(np.repeat(np.repeat(pr, 2, 0), 2, 1),
                                     2, 2)
    return SparseMLState(base=base,
                         refined0=jnp.asarray(refined[0], bool)
                         if refined else jnp.zeros((n, n, n), bool),
                         levels=tuple(levels))


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


def sync_restriction_sparse(state: SparseMLState) -> SparseMLState:
    """Propagate fine-leaf restrictions down through every level
    (the sparse analog of amr.sync_restriction_multi)."""
    L = state.n_levels
    n = state.n
    levels = list(state.levels)
    base = state.base
    for ell in range(L - 1, 0, -1):
        lv = levels[ell - 1]
        be = lv.be
        h = be // 2
        rest = {name: _restrict_blocks(getattr(lv.fields, name))
                for name in _present_names(lv.fields)}
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
            def write_dense(b, r):
                if b.ndim == 3:
                    cur = b[jnp.clip(ix, 0, n - 1), jnp.clip(iy, 0, n - 1),
                            jnp.clip(iz, 0, n - 1)]
                    val = jnp.where(mask, r.astype(b.dtype), cur)
                    return b.at[ix, iy, iz].set(val)   # OOB scatters drop
                return jnp.stack([write_dense(b[i], r[i])
                                  for i in range(b.shape[0])])
            base = dataclasses.replace(base, **{
                name: write_dense(getattr(base, name), rest[name])
                for name in rest})
        else:
            par = levels[ell - 2]
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
            idx_safe = jnp.where(mask, idx, nbp * pbe ** 3)  # dropped

            def write_sparse(b, r):
                if b.ndim == 4:
                    flat = b.reshape(-1)
                    return flat.at[idx_safe].set(
                        r.astype(b.dtype)).reshape(b.shape)
                return jnp.stack([write_sparse(b[i], r[i])
                                  for i in range(b.shape[0])])
            par_fields = dataclasses.replace(par.fields, **{
                name: write_sparse(getattr(par.fields, name), rest[name])
                for name in rest})
            levels[ell - 2] = dataclasses.replace(par, fields=par_fields)
    return SparseMLState(base=base, refined0=state.refined0,
                         levels=tuple(levels))
