"""Block-sparse deep-AMR storage (core.amr_sparse / sweep_sparse /
rays_multilevel.trace_point_sources_sparse / step_amr.SparseMLModel):
exact parity with the dense multilevel path on toy grids, plus the
memory-scaling property that motivates it (VERDICT r2 missing-1)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.config import (
    MODE_BOTH_STELLAR_UVB_TRANSFER, MODE_UVB_TRANSFER_ONLY, RunConfig)
from radiativetransfer_tpu.constants import KPC, MH, MYR, PSI
from radiativetransfer_tpu.core import (amr, amr_sparse, rays,
                                        rays_multilevel, step as step_mod,
                                        step_amr, sweep_multilevel,
                                        sweep_sparse)
from radiativetransfer_tpu.core.state import GridGeometry, make_state

UVB = jnp.asarray([2e-21, 5e-22, 1e-23])
CELL = 3.0e21


def _rand_state(rng, m, scale=1e-3):
    nh = rng.lognormal(0, 0.5, (m,) * 3) * scale
    return make_state(nh * MH / PSI, np.full((m,) * 3, 1e4), nh,
                      dtype=jnp.float64)


def _clustered_ml(n=8, L=3, seed=1, scale=1e-3):
    """Dense ML state with clustered refinement (the realistic shape block
    storage is designed for)."""
    rng = np.random.default_rng(seed)
    refined = []
    m = n
    for _ in range(L - 1):
        r = np.zeros((m,) * 3, bool)
        c = m // 2
        r[c - 2:c + 2, c - 2:c + 2, c - 2:c + 2] = rng.random((4, 4, 4)) < 0.6
        refined.append(r)
        m *= 2
    refined = amr.enforce_balance(refined)
    cov = np.ones((n,) * 3, bool)
    for l in range(L - 1):
        refined[l] &= cov
        cov = np.repeat(np.repeat(np.repeat(refined[l], 2, 0), 2, 1), 2, 2)
    ml = amr.make_multilevel_state(
        _rand_state(rng, n, scale), refined,
        [_rand_state(rng, n * 2 ** (l + 1), scale) for l in range(L - 1)])
    return amr.sync_restriction_multi(ml), refined


def _cover_masks(refined, n, L):
    covm = [np.ones((n,) * 3, bool)]
    for r in refined:
        covm.append(np.repeat(np.repeat(np.repeat(
            np.asarray(r) & covm[-1], 2, 0), 2, 1), 2, 2))
    return covm


class TestStateRoundTrip:
    def test_round_trip_exact_on_covered(self):
        n, L = 8, 3
        ml, refined = _clustered_ml(n, L)
        sp = amr_sparse.sparse_from_dense(ml, be=8)
        ml2 = amr_sparse.dense_from_sparse(sp)
        covm = _cover_masks(refined, n, L)
        for ell in range(L):
            for name in ("rho", "HI", "tgas", "Jmean"):
                a = np.asarray(getattr(ml.levels[ell], name))
                b = np.asarray(getattr(ml2.levels[ell], name))
                m = np.broadcast_to(covm[ell], a.shape)
                assert np.array_equal(a[m], b[m]), (ell, name)
        assert sp.n_leaves() == ml.n_leaves()

    def test_memory_proportional_to_leaves(self):
        """The motivating property: block storage is a small fraction of
        the dense footprint when refinement is clustered."""
        n, L = 16, 3
        rng = np.random.default_rng(3)
        refined = [np.zeros((n,) * 3, bool), np.zeros((2 * n,) * 3, bool)]
        refined[0][6:10, 6:10, 6:10] = True
        refined[1][14:18, 14:18, 14:18] = True
        refined = amr.enforce_balance(refined)
        ml = amr.make_multilevel_state(_rand_state(rng, n), refined)
        sp = amr_sparse.sparse_from_dense(ml, be=8)
        dense_bytes = sum(x.size * x.dtype.itemsize
                          for x in jax.tree_util.tree_leaves(ml))
        assert sp.memory_bytes() < 0.35 * dense_bytes

    def test_sync_restriction_matches_dense(self):
        n, L = 8, 3
        ml, refined = _clustered_ml(n, L)
        ml = amr.MultiLevelState(
            levels=tuple(dataclasses.replace(lv, HI=lv.HI * 1.7,
                                             Jmean=lv.Jmean + 0.3)
                         for lv in ml.levels),
            refined=ml.refined)
        sp = amr_sparse.sparse_from_dense(ml, be=8)
        d = amr.sync_restriction_multi(ml)
        s = amr_sparse.dense_from_sparse(
            amr_sparse.sync_restriction_sparse(sp))
        covm = _cover_masks(refined, n, L)
        for ell in range(L):
            for name in ("HI", "Jmean", "rho"):
                a = np.asarray(getattr(d.levels[ell], name))
                b = np.asarray(getattr(s.levels[ell], name))
                m = np.broadcast_to(covm[ell], a.shape)
                np.testing.assert_allclose(a[m], b[m], rtol=1e-13)


class TestSparseSweepParity:
    def test_matches_dense_ml_sweep(self):
        n, L = 8, 3
        ml, refined = _clustered_ml(n, L)
        sp = amr_sparse.sparse_from_dense(ml, be=8)
        rng = np.random.default_rng(11)
        kappas = [jnp.asarray(
            rng.lognormal(0, 0.7, (3,) + (n * 2 ** l,) * 3) / 3e21)
            for l in range(L)]
        plan = sweep_multilevel.build_ml_sweep_plan(1, n, L)
        js_d = sweep_multilevel.diffuse_sweep_multilevel(
            kappas, [jnp.asarray(r) for r in refined], plan, UVB, CELL,
            n_coupling_iters=4)
        lv_k = [amr_sparse.blockify_like(sp.levels[ell - 1],
                                         np.asarray(kappas[ell]))
                for ell in range(1, L)]
        j0, jbs = sweep_sparse.diffuse_sweep_sparse(
            kappas[0], lv_k, sp, plan, UVB, CELL, n_coupling_iters=4)
        covm = _cover_masks(refined, n, L)
        leaf0 = np.broadcast_to(~refined[0], js_d[0].shape)
        np.testing.assert_allclose(np.asarray(j0)[leaf0],
                                   np.asarray(js_d[0])[leaf0], rtol=1e-12)
        for ell in range(1, L):
            lv = sp.levels[ell - 1]
            got = amr_sparse.unblockify_like(lv, np.asarray(jbs[ell - 1]))
            want = np.asarray(js_d[ell])
            leaf = (covm[ell] if ell == L - 1
                    else covm[ell] & ~np.asarray(refined[ell]))
            m = np.broadcast_to(leaf, want.shape)
            np.testing.assert_allclose(got[m], want[m], rtol=1e-12,
                                       atol=1e-300)


class TestSparseTracerParity:
    def test_matches_dense_ml_tracer(self):
        from radiativetransfer_tpu.tables import stellar
        pop = stellar.blackbody_population(temperature=1.0e5,
                                           q_ionizing=5.0e48)
        t = stellar.build_source_tables(pop, 0, 0.0, 0, 0.0)
        tab = {"reaction_log": jnp.asarray(t.reaction_log)[None],
               "energy_log": jnp.asarray(t.energy_log)[None],
               "output_freq": t.output_freq,
               "output_sigma24": t.output_sigma24,
               "output_sigma25": t.output_sigma25,
               "output_sigma26": t.output_sigma26,
               "output_sigma_dust": t.output_sigma_dust}
        n, L = 8, 3
        geom = GridGeometry(n, n, n, 100 * KPC)
        ml, refined = _clustered_ml(n, L, seed=7, scale=3e-6)
        sp = amr_sparse.sparse_from_dense(ml, be=8)
        src = rays.SourceBatch(position=np.array([[0.47, 0.52, 0.5]]),
                               weight=np.array([1.0]),
                               table_idx=np.array([0], np.int32))
        rfs_d, diag_d = rays_multilevel.trace_point_sources_ml(
            ml, geom, src, tab, max_pixel_level=3)
        rfs_s, diag_s = rays_multilevel.trace_point_sources_sparse(
            sp, geom, src, tab, max_pixel_level=3)
        np.testing.assert_array_equal(np.asarray(rfs_d[0].krate24),
                                      np.asarray(rfs_s[0].krate24))
        assert float(jnp.max(jnp.abs(rfs_d[0].krate24))) > 0.0
        covm = _cover_masks(refined, n, L)
        for ell in range(1, L):
            lv = sp.levels[ell - 1]
            got = amr_sparse.unblockify_like(
                lv, np.asarray(rfs_s[ell].krate24).reshape(
                    lv.n_blocks, lv.be, lv.be, lv.be))
            want = np.asarray(rfs_d[ell].krate24).reshape((n * 2 ** ell,) * 3)
            np.testing.assert_array_equal(got[covm[ell]], want[covm[ell]])
            assert want[covm[ell]].max() > 0.0
        np.testing.assert_array_equal(np.asarray(diag_d.ndot_remaining),
                                      np.asarray(diag_s.ndot_remaining))
        np.testing.assert_array_equal(np.asarray(diag_d.ndot_spectrum),
                                      np.asarray(diag_s.ndot_spectrum))


class TestSparseStepParity:
    def _models(self, n, mode, n_levels=3):
        cfg = RunConfig(mode=mode, current_redshift=6.55, n_angular_level=1,
                        reionization_model=10, grid="sparse")
        geom = GridGeometry(n, n, n, 300.0 * KPC)
        rt = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float64)
        dense = step_amr.MultiLevelModel.setup(rt, n_levels)
        sparse = step_amr.SparseMLModel.setup(rt, n_levels)
        return rt, dense, sparse

    def test_uvb_step_matches_dense(self):
        n, L = 8, 3
        rt, dense, sparse = self._models(n, MODE_UVB_TRANSFER_ONLY)
        ml, refined = _clustered_ml(n, L, seed=21, scale=2e-3)
        sp = amr_sparse.sparse_from_dense(ml, be=8)
        out_d = dense.make_step()(ml)
        out_s = sparse.make_step()(sp)
        covm = _cover_masks(refined, n, L)
        np.testing.assert_allclose(
            np.asarray(out_s.base.HI)[~refined[0]],
            np.asarray(out_d.levels[0].HI)[~refined[0]], rtol=1e-10)
        for ell in range(1, L):
            lv = out_s.levels[ell - 1]
            got = amr_sparse.unblockify_like(lv, np.asarray(lv.fields.HI))
            want = np.asarray(out_d.levels[ell].HI)
            np.testing.assert_allclose(got[covm[ell]], want[covm[ell]],
                                       rtol=1e-10)
        assert sparse.neutral_fraction(out_s) == pytest.approx(
            dense.neutral_fraction(out_d), rel=1e-10)

    def test_stellar_step_matches_dense(self):
        from radiativetransfer_tpu.tables import stellar as stellar_tables
        n, L = 8, 3
        rt, dense, sparse = self._models(n, MODE_BOTH_STELLAR_UVB_TRANSFER)
        geom = rt.geom
        ml, refined = _clustered_ml(n, L, seed=23, scale=5e-4)
        sp = amr_sparse.sparse_from_dense(ml, be=8)
        rng = np.random.default_rng(2)
        batch = rays.SourceBatch(position=rng.uniform(0.3, 0.7, (4, 3)),
                                 weight=np.ones(4),
                                 table_idx=np.zeros(4, np.int32))
        ctx = step_mod.StellarContext.build(
            stellar_tables.blackbody_population(), batch, geom, 10.0 * MYR,
            metal_coefs=[(0, 0.0)], max_pixel_level=3)
        out_d, diag_d = dense.make_step(ctx)(ml)
        out_s, diag_s = sparse.make_step(ctx)(sp)
        covm = _cover_masks(refined, n, L)
        np.testing.assert_allclose(
            np.asarray(out_s.base.HI)[~refined[0]],
            np.asarray(out_d.levels[0].HI)[~refined[0]], rtol=1e-9)
        for ell in range(1, L):
            lv = out_s.levels[ell - 1]
            got = amr_sparse.unblockify_like(lv, np.asarray(lv.fields.HI))
            want = np.asarray(out_d.levels[ell].HI)
            np.testing.assert_allclose(got[covm[ell]], want[covm[ell]],
                                       rtol=1e-9)
        np.testing.assert_allclose(np.asarray(diag_s.ndot_remaining),
                                   np.asarray(diag_d.ndot_remaining),
                                   rtol=1e-12)
