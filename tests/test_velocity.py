"""Velocity fields end-to-end (VERDICT r2 missing-4): the reference
ingests, carries, and snapshots velx/y/z for kinematics grids
(placeCellProjectWithVelocity, /root/reference/equiSources.f90:1870-1974;
writeIonization :4869-4890).  bin -> npz -> state -> step -> snapshot ->
restart must preserve vel."""

import numpy as np
import jax
import jax.numpy as jnp

from radiativetransfer_tpu.config import MODE_UVB_TRANSFER_ONLY, RunConfig
from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import step as step_mod
from radiativetransfer_tpu.core.state import GridGeometry
from radiativetransfer_tpu.io import grid_io, snapshot


def _vel_levels(n=6, seed=0):
    rng = np.random.default_rng(seed)
    ii, jj, kk = np.meshgrid(*([np.arange(n)] * 3), indexing="ij")
    pos = (np.stack([ii, jj, kk], axis=-1).reshape(-1, 3) + 0.5) / n * 200.0
    ncell = n ** 3
    return [grid_io.LevelData(
        pos=pos.astype(np.float32),
        lT=np.full(ncell, 4.0, np.float32),
        lnH=rng.normal(-3.0, 0.3, ncell).astype(np.float32),
        lx=np.zeros(ncell, np.float32),
        vel=rng.normal(0, 100.0, (ncell, 3)).astype(np.float32))]


def test_vel_round_trip_through_step_and_snapshot(tmp_path):
    n = 6
    levels = _vel_levels(n)
    vel_in = levels[0].vel.copy()

    # level npz round trip
    p = str(tmp_path / "grid.npz")
    grid_io.write_level_npz(p, levels)
    levels2 = grid_io.read_level_npz(p)
    np.testing.assert_array_equal(levels2[0].vel, vel_in)

    # ingestion -> FieldState carries (3,n,n,n) vel
    state, geom = grid_io.build_uniform_state(levels2, read_metals=False,
                                              dtype=jnp.float64)
    assert state.vel is not None and state.vel.shape == (3, n, n, n)
    vel_grid = np.transpose(vel_in.reshape(n, n, n, 3), (3, 0, 1, 2))
    np.testing.assert_allclose(np.asarray(state.vel), vel_grid, rtol=1e-6)

    # a full transport+chemistry step leaves vel intact (inert field)
    cfg = RunConfig(mode=MODE_UVB_TRANSFER_ONLY, current_redshift=6.55,
                    n_angular_level=1, reionization_model=10,
                    grid="velgrid")
    rt = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float64)
    out = jax.jit(rt.transport_chemistry_step)(state)
    np.testing.assert_array_equal(np.asarray(out.vel),
                                  np.asarray(state.vel))

    # snapshot writes velx/y/z and restart restores them
    sp = str(tmp_path / "cellArray0001.npz")
    snapshot.write_snapshot(sp, out, 1, geom.physical_box_size)
    with np.load(sp) as f:
        assert "velx" in f and "vely" in f and "velz" in f
    blank = grid_io.build_uniform_state(levels2, read_metals=False,
                                        dtype=jnp.float64)[0]
    import dataclasses
    blank = dataclasses.replace(blank, vel=None)
    restored, itime = snapshot.read_snapshot(sp, blank)
    assert itime == 1
    np.testing.assert_allclose(np.asarray(restored.vel),
                               np.asarray(out.vel), rtol=1e-6)

    # converter: snapshot -> level list keeps the vel columns
    from radiativetransfer_tpu.io import convert
    lp = str(tmp_path / "leaves.npz")
    convert.snapshot2levels(sp, lp)
    with np.load(lp) as f:
        assert "velx" in f
        np.testing.assert_allclose(
            f["velx"], np.asarray(out.vel)[0].reshape(-1), rtol=1e-6)


def _vel_nested_levels(n=8, seed=3):
    """Two-level kinematics grid: base + refined central block."""
    rng = np.random.default_rng(seed)
    levels = _vel_levels(n, seed=seed)
    q = n // 4
    sel = np.arange(q, n - q)
    chil = []
    for i in sel:
        for j in sel:
            for k in sel:
                for d in np.ndindex(2, 2, 2):
                    chil.append(2 * np.array([i, j, k]) + np.array(d))
    idx = np.array(chil)
    pos = (idx + 0.5) / (2 * n) * 200.0
    m = len(idx)
    levels.append(grid_io.LevelData(
        pos=pos.astype(np.float32),
        lT=np.full(m, 4.0, np.float32),
        lnH=rng.normal(-3.0, 0.3, m).astype(np.float32),
        lx=np.zeros(m, np.float32),
        vel=rng.normal(0, 100.0, (m, 3)).astype(np.float32)))
    return levels


def test_vel_round_trip_two_level(tmp_path):
    """VERDICT r3 missing-6: velocity must survive AMR ingestion, the
    nested snapshot writers, and restart (the reference writes kinematics
    for every leaf, equiSources.f90:4869-4890)."""
    from radiativetransfer_tpu.core import amr
    n = 8
    levels = _vel_nested_levels(n)
    state, geom = amr.amr_from_levels(levels, read_metals=False,
                                      dtype=jnp.float64)
    assert state.base.vel is not None
    assert state.fine.vel is not None
    # fine-level data landed: the refined-region fine vel equals the input
    idx = np.clip((levels[1].pos / 200.0 * 2 * n).astype(int), 0, 2 * n - 1)
    got = np.asarray(state.fine.vel)[0][idx[:, 0], idx[:, 1], idx[:, 2]]
    np.testing.assert_allclose(got, levels[1].vel[:, 0], rtol=1e-5)

    sp = str(tmp_path / "cellArray0001.npz")
    snapshot.write_snapshot_amr(sp, state, 1, geom.physical_box_size)
    with np.load(sp) as f:
        assert "velx" in f

    blank, _ = amr.amr_from_levels(levels, read_metals=False,
                                   dtype=jnp.float64)
    import dataclasses
    blank = dataclasses.replace(
        blank,
        base=dataclasses.replace(blank.base,
                                 vel=jnp.zeros_like(blank.base.vel)),
        fine=dataclasses.replace(blank.fine,
                                 vel=jnp.zeros_like(blank.fine.vel)))
    restored, itime = snapshot.read_snapshot_amr(sp, blank)
    assert itime == 1
    leaf_b = ~np.asarray(state.refined)
    np.testing.assert_allclose(
        np.asarray(restored.base.vel)[:, leaf_b],
        np.asarray(state.base.vel)[:, leaf_b], rtol=1e-6)
    leaf_f = np.asarray(amr.prolong_mask(state.refined))
    np.testing.assert_allclose(
        np.asarray(restored.fine.vel)[:, leaf_f],
        np.asarray(state.fine.vel)[:, leaf_f], rtol=1e-6)


def test_vel_round_trip_multilevel(tmp_path):
    """Velocity through the L-level dense path and its snapshots."""
    from radiativetransfer_tpu.core import amr
    n = 8
    levels = _vel_nested_levels(n)
    state, geom = amr.multilevel_from_levels(levels, read_metals=False,
                                             dtype=jnp.float64)
    assert all(lv.vel is not None for lv in state.levels)

    sp = str(tmp_path / "cellArray0001.npz")
    snapshot.write_snapshot_ml(sp, state, 1, geom.physical_box_size)
    blank, _ = amr.multilevel_from_levels(levels, read_metals=False,
                                          dtype=jnp.float64)
    import dataclasses
    blank = amr.MultiLevelState(
        levels=tuple(dataclasses.replace(lv, vel=jnp.zeros_like(lv.vel))
                     for lv in blank.levels),
        refined=blank.refined)
    restored, itime = snapshot.read_snapshot_ml(sp, blank)
    leafs = state.leaf_masks()
    for ell, (lv, m) in enumerate(zip(state.levels, leafs)):
        np.testing.assert_allclose(
            np.asarray(restored.levels[ell].vel)[:, np.asarray(m)],
            np.asarray(lv.vel)[:, np.asarray(m)], rtol=1e-6,
            err_msg=f"level {ell}")


def test_vel_round_trip_sparse(tmp_path):
    """Velocity through O(leaves) sparse ingestion and sparse snapshots."""
    from radiativetransfer_tpu.core import amr_sparse
    n = 8
    levels = _vel_nested_levels(n)
    state, geom = amr_sparse.sparse_from_level_lists(
        levels, read_metals=False, dtype=jnp.float64)
    assert state.base.vel is not None
    assert all(lv.fields.vel is not None for lv in state.levels)

    sp = str(tmp_path / "cellArray0001.npz")
    snapshot.write_snapshot_sparse(sp, state, 1, geom.physical_box_size)
    with np.load(sp) as f:
        assert "velx" in f
    blank, _ = amr_sparse.sparse_from_level_lists(
        levels, read_metals=False, dtype=jnp.float64)
    restored, itime = snapshot.read_snapshot_sparse(sp, blank)
    for ell in range(1, state.n_levels):
        lv = restored.levels[ell - 1]
        leaf = np.asarray(lv.cover & ~lv.refined)
        np.testing.assert_allclose(
            np.asarray(lv.fields.vel)[:, leaf],
            np.asarray(state.levels[ell - 1].fields.vel)[:, leaf],
            rtol=1e-6, err_msg=f"level {ell}")
