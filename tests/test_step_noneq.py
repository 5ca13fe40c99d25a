"""End-to-end tests of the non-equilibrium transport+chemistry mode
(RTModel.make_noneq_step): the capability the reference's rate tables were
built for (coll_rates.f, colh2diss.f) but never wired into its driver."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.config import (MODE_BOTH_STELLAR_UVB_TRANSFER,
                                          MODE_UVB_TRANSFER_ONLY, RunConfig)
from radiativetransfer_tpu.constants import KPC, MYR
from radiativetransfer_tpu.core import chemistry_noneq as cn, rays, step as step_mod
from radiativetransfer_tpu.core.state import GridGeometry, uniform_state
from radiativetransfer_tpu.tables import stellar as stellar_tables


@pytest.fixture(scope="module")
def uvb_model():
    n = 8
    cfg = RunConfig(mode=MODE_UVB_TRANSFER_ONLY, current_redshift=6.55,
                    n_angular_level=1, reionization_model=10, grid="t")
    geom = GridGeometry(n, n, n, 200.0 * KPC)
    return step_mod.RTModel.setup(cfg, geom, dtype=jnp.float64), geom, n


def test_uvb_noneq_converges_to_equilibrium(uvb_model):
    """Iterating the noneq mode with a long dt must land on the same
    neutral fraction as the production equilibrium solver (the noneq
    network's long-time limit)."""
    model, geom, n = uvb_model
    # both paths start from the same pre-ionized state: a fully-neutral
    # 200 kpc box at nh = 1e-4 is optically thick (tau ~ 50/cell) and would
    # stay neutral — a distinct, also-valid self-shielded solution
    state = model.initialize_equilibrium(
        uniform_state(n, nh=1e-4, tgas=2e4, dtype=jnp.float64))

    eq_state = state
    eq_step = model.make_step()
    for _ in range(3):
        eq_state = eq_step(eq_state)
    nf_eq = model.neutral_fraction(eq_state)

    species = cn.species_from_field_state(state)
    step = model.make_noneq_step(50.0 * MYR, n_substeps=300)
    st = state
    for _ in range(4):
        st, species = step(st, species)
    nf = model.neutral_fraction(st)
    assert np.isfinite(nf)
    assert abs(nf - nf_eq) < 0.05 * max(nf_eq, 1e-10), (nf, nf_eq)
    # species stayed conserved and positive
    np.testing.assert_allclose(np.asarray(species.nh),
                               np.asarray(state.nh), rtol=1e-8)
    assert float(jnp.min(species.H2I)) >= 0.0


def _stellar_ctx(geom, n, noneq):
    pop = stellar_tables.blackbody_population()
    batch = rays.SourceBatch(
        position=np.array([[0.52, 0.52, 0.52]]),
        weight=np.array([1.0]), table_idx=np.array([0], np.int32))
    return step_mod.StellarContext.build(
        pop, batch, geom, 10.0 * MYR, metal_coefs=[(0, 0.0)],
        max_pixel_level=3, noneq=noneq)


def test_stellar_noneq_deposits_secondary_channels():
    """The quadrature_noneq tracer must deposit nonzero k27..k31
    per-particle rates (H2 photo channels incl. Lyman-Werner) that fall
    off with distance from the source."""
    n = 16
    cfg = RunConfig(mode=MODE_BOTH_STELLAR_UVB_TRANSFER, current_redshift=6.55,
                    n_angular_level=1, reionization_model=10, grid="t")
    geom = GridGeometry(n, n, n, 50.0 * KPC)
    state = uniform_state(n, nh=1e-3, tgas=1e4, dtype=jnp.float64)
    ctx = _stellar_ctx(geom, n, noneq=True)

    rf, _diag = rays.trace_point_sources(
        state, geom, ctx.sources, ctx.tables, max_pixel_level=3,
        dtype=jnp.float64, rates_mode="quadrature_noneq")
    assert isinstance(rf, rays.NoneqRateFields)
    k31 = np.asarray(rf.krate31).reshape(n, n, n)
    k27 = np.asarray(rf.krate27).reshape(n, n, n)
    assert k31.max() > 0.0 and k27.max() > 0.0
    assert np.all(k31 >= 0.0)
    # LW rate decays with distance (~1/r^2 geometry): source cell is (8,8,8)
    assert k31[8, 8, 8] > k31[8, 8, 12] > 0.0
    ratio = k31[8, 8, 8] / k31[8, 8, 12]
    assert 4.0 < ratio < 200.0, ratio  # ~(distance ratio)^2 with quadrature

    # entry-exit band deposits still agree with the plain quadrature mode
    rf_q, _ = rays.trace_point_sources(
        state, geom, ctx.sources, ctx.tables, max_pixel_level=3,
        dtype=jnp.float64, rates_mode="quadrature")
    np.testing.assert_allclose(np.asarray(rf.krate24),
                               np.asarray(rf_q.krate24), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(rf.crate26),
                               np.asarray(rf_q.crate26), rtol=1e-12)


def test_stellar_noneq_step_destroys_h2():
    """Full mode-8-style noneq step: an initial H2 reservoir must be
    photodissociated fastest near the source."""
    n = 16
    # default UVB amplitude: at nh = 1 the box is ~1e4 optical depths per
    # cell, so only the skin sees the UVB and the interior H2 evolution is
    # driven by the source alone
    cfg = RunConfig(mode=MODE_BOTH_STELLAR_UVB_TRANSFER, current_redshift=6.55,
                    n_angular_level=1, reionization_model=10, grid="t")
    geom = GridGeometry(n, n, n, 20.0 * KPC)
    model = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float64)
    state = uniform_state(n, nh=1.0, tgas=3e3, dtype=jnp.float64)
    ctx = _stellar_ctx(geom, n, noneq=True)

    species = cn.species_from_field_state(state, f_h2=1e-4)
    h2_0 = np.asarray(species.H2I).copy()
    step = model.make_noneq_step(1.0 * MYR, ctx, n_substeps=200)
    state2, species, diag = step(state, species)
    h2 = np.asarray(species.H2I)
    assert np.all(np.isfinite(h2)) and np.all(h2 >= 0.0)
    # destroyed near the source, essentially untouched in the far corner
    assert h2[8, 8, 8] < 0.9 * h2_0[8, 8, 8]
    assert h2[8, 8, 8] < h2[0, 0, 0]
    # diagnostics still produced
    assert np.asarray(diag.ndot_remaining).shape[0] == 1
