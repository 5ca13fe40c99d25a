"""Runtime sanitizers (core.debug, SURVEY.md §5.2): checkify-instrumented
compute paths — the runtime analog of the reference's ~40 stop-asserts
(checkPoint, /root/reference/equiSources.f90:2962-2976)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.config import RunConfig
from radiativetransfer_tpu.constants import KPC, MYR
from radiativetransfer_tpu.core import debug, rays, step as step_mod
from radiativetransfer_tpu.core.state import GridGeometry, uniform_state
from radiativetransfer_tpu.tables import stellar as stellar_tables


@pytest.fixture(scope="module")
def model_state_ctx():
    n = 12
    cfg = RunConfig(mode=8, current_redshift=6.55, n_angular_level=1,
                    reionization_model=10, grid="t")
    geom = GridGeometry(n, n, n, 100.0 * KPC)
    rt = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float64)
    state = rt.initialize_equilibrium(
        uniform_state(n, nh=1e-4, tgas=2e4, dtype=jnp.float64))
    batch = rays.SourceBatch(position=np.array([[0.5, 0.5, 0.5]]),
                             weight=np.ones(1),
                             table_idx=np.zeros(1, np.int32))
    ctx = step_mod.StellarContext.build(
        stellar_tables.blackbody_population(), batch, geom, 10.0 * MYR,
        metal_coefs=[(0, 0.0)], max_pixel_level=2)
    return rt, state, ctx


def test_preflight_clean_on_valid_data(model_state_ctx):
    """The instrumented sweep+chemistry and tracer pass on valid input:
    every gather/scatter is genuinely in-bounds (dead-ray indices are
    clipped, not silently clamped by XLA) and no NaN/Inf is produced."""
    rt, state, ctx = model_state_ctx
    debug.preflight(rt, state, ctx)


def test_poisoned_density_is_caught(model_state_ctx):
    rt, state, ctx = model_state_ctx
    bad = dataclasses.replace(state,
                              rho=state.rho.at[0, 0, 0].set(jnp.nan))
    with pytest.raises(Exception, match="nan|NaN|division"):
        debug.checked_sweep_chemistry(rt, bad)


def test_checked_trace_matches_production(model_state_ctx):
    """Instrumentation must not change results."""
    rt, state, ctx = model_state_ctx
    rf_c, diag_c = debug.checked_trace(
        state, rt.geom, ctx.sources, ctx.tables, max_pixel_level=2,
        dtype=jnp.float64)
    rf_p, diag_p = rays.trace_point_sources(
        state, rt.geom, ctx.sources, ctx.tables, max_pixel_level=2,
        dtype=jnp.float64)
    np.testing.assert_array_equal(np.asarray(rf_c.krate24),
                                  np.asarray(rf_p.krate24))
    np.testing.assert_array_equal(np.asarray(diag_c.ndot_remaining),
                                  np.asarray(diag_p.ndot_remaining))


class TestNestedPreflight:
    """Checkify pre-flight on nested / block-sparse storage (VERDICT r4
    item 5): the slot-map + padding-block indexing is exactly where bounds
    bugs live (cf. the round-4 padding-zeroing fix 341dba6)."""

    def _sparse_setup(self):
        from radiativetransfer_tpu.core import (amr, amr_sparse,
                                                step_amr)
        n, L = 8, 3
        cfg = RunConfig(mode=8, current_redshift=6.55, n_angular_level=1,
                        reionization_model=10, grid="t")
        geom = GridGeometry(n, n, n, 100.0 * KPC)
        rt = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float64)
        rng = np.random.default_rng(3)
        refined = []
        m = n
        for _ in range(L - 1):
            r = np.zeros((m,) * 3, bool)
            c = m // 2
            r[c - 2:c + 2, c - 2:c + 2, c - 2:c + 2] = (
                rng.random((4, 4, 4)) < 0.6)
            refined.append(r)
            m *= 2
        refined = amr.enforce_balance(refined)
        cov = np.ones((n,) * 3, bool)
        for l in range(L - 1):
            refined[l] &= cov
            cov = np.repeat(np.repeat(np.repeat(refined[l], 2, 0), 2, 1),
                            2, 2)
        levels = [rt.initialize_equilibrium(
            uniform_state(n * 2 ** l, nh=1e-4, tgas=2e4,
                          dtype=jnp.float64)) for l in range(L)]
        from radiativetransfer_tpu.core.amr import (make_multilevel_state,
                                                    sync_restriction_multi)
        ml = sync_restriction_multi(
            make_multilevel_state(levels[0], refined, levels[1:]))
        sp = amr_sparse.sparse_from_dense(ml, be=8)
        sparse = step_amr.SparseMLModel.setup(rt, L)
        dense = step_amr.MultiLevelModel.setup(rt, L)
        batch = rays.SourceBatch(position=np.array([[0.5, 0.5, 0.5]]),
                                 weight=np.ones(1),
                                 table_idx=np.zeros(1, np.int32))
        ctx = step_mod.StellarContext.build(
            stellar_tables.blackbody_population(), batch, geom, 10.0 * MYR,
            metal_coefs=[(0, 0.0)], max_pixel_level=2)
        return rt, ml, sp, dense, sparse, ctx

    def test_sparse_preflight_clean(self):
        rt, ml, sp, dense, sparse, ctx = self._sparse_setup()
        debug.preflight_sparse(sparse, sp, ctx)

    def test_ml_preflight_clean(self):
        rt, ml, sp, dense, sparse, ctx = self._sparse_setup()
        debug.preflight_ml(dense, ml, ctx)

    def test_sparse_poisoned_block_is_caught(self):
        import dataclasses as dc
        rt, ml, sp, dense, sparse, ctx = self._sparse_setup()
        lv = sp.levels[0]
        bad_hi = lv.fields.HI.at[0, 0, 0, 0].set(jnp.nan)
        bad = dc.replace(sp, levels=(
            dc.replace(lv, fields=dc.replace(lv.fields, HI=bad_hi)),)
            + sp.levels[1:])
        with pytest.raises(Exception, match="nan|NaN|division"):
            debug.checked_sweep_chemistry_sparse(sparse, bad)
