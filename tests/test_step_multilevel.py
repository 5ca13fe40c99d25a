"""End-to-end L-level iteration tests: the MultiLevelModel step and the
L-level ingestion path (VERDICT r1 item 7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.config import MODE_UVB_TRANSFER_ONLY, RunConfig
from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import amr, step as step_mod, step_amr
from radiativetransfer_tpu.core.state import GridGeometry, uniform_state


def _models(n=6, box_kpc=300.0, n_levels=3):
    cfg = RunConfig(mode=MODE_UVB_TRANSFER_ONLY, current_redshift=6.55,
                    n_angular_level=1, reionization_model=10, grid="ml")
    geom = GridGeometry(n, n, n, box_kpc * KPC)
    rt = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float64)
    return rt, step_amr.MultiLevelModel.setup(rt, n_levels)


class TestMultiLevelStep:
    def test_two_level_matches_amr_model(self):
        """The L=2 MultiLevelModel step reproduces the optimized two-level
        AMRModel step."""
        n = 4
        cfg = RunConfig(mode=MODE_UVB_TRANSFER_ONLY, current_redshift=6.55,
                        n_angular_level=1, reionization_model=10, grid="ml2")
        geom = GridGeometry(n, n, n, 300.0 * KPC)
        rt = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float64)
        am2 = step_amr.AMRModel.setup(rt)
        aml = step_amr.MultiLevelModel.setup(rt, 2)
        base = uniform_state(n, nh=2e-3, tgas=1e4, dtype=jnp.float64)
        refined = np.zeros((n, n, n), bool)
        refined[1:3, 1:3, 1:3] = True
        st2 = amr.make_amr_state(base, jnp.asarray(refined))
        stm = amr.make_multilevel_state(base, [refined])
        out2 = am2.make_step()(st2)
        outm = aml.make_step()(stm)
        np.testing.assert_allclose(np.asarray(outm.levels[0].HI),
                                   np.asarray(out2.base.HI), rtol=1e-8)
        rf = np.repeat(np.repeat(np.repeat(refined, 2, 0), 2, 1), 2, 2)
        np.testing.assert_allclose(np.asarray(outm.levels[1].HI)[rf],
                                   np.asarray(out2.fine.HI)[rf], rtol=1e-8)
        assert aml.neutral_fraction(outm) == pytest.approx(
            am2.neutral_fraction(out2), rel=1e-8)

    def test_three_level_step_evolves(self):
        n = 4
        rt, ml = _models(n, box_kpc=500.0)
        base = uniform_state(n, nh=2e-3, tgas=1e4, dtype=jnp.float64)
        refined = [np.zeros((n, n, n), bool), np.zeros((2 * n,) * 3, bool)]
        refined[0][1:3, 1:3, 1:3] = True
        refined[1][3:5, 3:5, 3:5] = True
        refined = amr.enforce_balance(refined)
        st = amr.make_multilevel_state(base, refined)
        nf0 = ml.neutral_fraction(st)
        step = ml.make_step()
        for _ in range(3):
            st = step(st)
        nf = ml.neutral_fraction(st)
        assert 0.0 < nf < nf0   # UVB ionizes
        # restriction consistency across BOTH level pairs
        for ell in range(2):
            r = np.asarray(st.refined[ell])
            hi_r = np.asarray(amr.restrict(st.levels[ell + 1].HI))
            np.testing.assert_allclose(
                np.asarray(st.levels[ell].HI)[r], hi_r[r], rtol=1e-12)
        for lv in st.levels:
            x = np.asarray(lv.HI / lv.nh)
            assert np.all((x >= -1e-12) & (x <= 1 + 1e-9))


class TestMultiLevelSnapshot:
    def test_three_level_round_trip(self, tmp_path):
        from radiativetransfer_tpu.io import snapshot
        n = 4
        rt, ml = _models(n)
        base = uniform_state(n, nh=1e-3, tgas=1.2e4, dtype=jnp.float64)
        refined = [np.zeros((n, n, n), bool), np.zeros((2 * n,) * 3, bool)]
        refined[0][1:3, 1:3, 1:3] = True
        refined[1][3:5, 3:5, 3:5] = True
        refined = amr.enforce_balance(refined)
        st = amr.make_multilevel_state(base, refined)
        st = ml.make_step()(st)
        p = str(tmp_path / "cellArray0001.npz")
        snapshot.write_snapshot_ml(p, st, 1, rt.geom.physical_box_size)

        fresh = amr.make_multilevel_state(
            uniform_state(n, nh=1e-3, tgas=1e4, dtype=jnp.float64), refined)
        restored, itime = snapshot.read_snapshot_ml(p, fresh)
        assert itime == 1
        np.testing.assert_allclose(np.asarray(restored.levels[0].HI),
                                   np.asarray(st.levels[0].HI), rtol=1e-6)
        leafs = st.leaf_masks()
        for ell in range(1, 3):
            m = np.asarray(leafs[ell])
            np.testing.assert_allclose(
                np.asarray(restored.levels[ell].HI)[m],
                np.asarray(st.levels[ell].HI)[m], rtol=1e-6)


class TestMultiLevelIngestion:
    def _synthetic_levels(self, n=4, depth=3, seed=0):
        """Synthetic 3-level cell lists in the reference's level-list
        schema (grid construction, equiSources.f90:316-423)."""
        from radiativetransfer_tpu.io.grid_io import LevelData
        rng = np.random.default_rng(seed)
        levels = []
        m = n
        for ell in range(depth):
            if ell == 0:
                idx = np.indices((m, m, m)).reshape(3, -1).T
            else:
                # refine a block of parents; list their children
                half = m // 2
                pidx = np.indices((m // 4, m // 4, m // 4)
                                  ).reshape(3, -1).T + m // 4
                chil = []
                for p in pidx:
                    for d in np.ndindex(2, 2, 2):
                        chil.append(2 * p + np.array(d))
                idx = np.array(chil)
                m *= 2
            if ell > 0:
                m_here = m
            else:
                m_here = n
            pos = (idx + 0.5) / m_here
            ncell = len(idx)
            levels.append(LevelData(
                pos=pos.astype(np.float32),
                lT=np.full(ncell, 4.0, np.float32),
                lnH=rng.normal(-3.0, 0.1, ncell).astype(np.float32),
                lx=np.zeros(ncell, np.float32)))
        return levels

    def test_three_level_ingest_keeps_levels(self):
        levels = self._synthetic_levels(n=8, depth=3)
        # positions are already normalized cell centers spanning the box;
        # feed physical coordinates so grid_bounds works
        for lv in levels:
            lv.pos[:] = lv.pos * 100.0   # kpc
        state, geom = amr.multilevel_from_levels(levels, read_metals=False)
        assert state.n_levels == 3
        assert geom.nx == 8
        assert int(jnp.sum(state.refined[0])) > 0
        assert int(jnp.sum(state.refined[1])) > 0
        assert amr.check_balance([np.asarray(r) for r in state.refined])
        # level-2 data landed (not averaged away): refined-2 cells carry
        # their own nh, distinct from the prolonged parent in general
        assert state.n_leaves() > 0
        # restriction consistency after ingestion sync
        r0 = np.asarray(state.refined[0])
        np.testing.assert_allclose(
            np.asarray(state.levels[0].rho)[r0],
            np.asarray(amr.restrict(state.levels[1].rho))[r0], rtol=1e-6)
