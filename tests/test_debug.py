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
