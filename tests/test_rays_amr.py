"""Two-level AMR ray-tracer tests: degenerate-limit equivalences against the
uniform tracer (SURVEY.md §4, config 5)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import amr, rays, rays_amr
from radiativetransfer_tpu.core.state import GridGeometry, uniform_state
from radiativetransfer_tpu.tables import stellar


@pytest.fixture(scope="module")
def tables():
    pop = stellar.blackbody_population(temperature=1.0e5, q_ionizing=5.0e48)
    t = stellar.build_source_tables(pop, 0, 0.0, 0, 0.0)
    return {
        "reaction_log": jnp.asarray(t.reaction_log)[None],
        "energy_log": jnp.asarray(t.energy_log)[None],
        "output_freq": t.output_freq,
        "output_sigma24": t.output_sigma24,
        "output_sigma25": t.output_sigma25,
        "output_sigma26": t.output_sigma26,
        "output_sigma_dust": t.output_sigma_dust,
    }, t.total_integral


def _source_at(p):
    return rays.SourceBatch(position=np.array([p]), weight=np.array([1.0]),
                            table_idx=np.array([0], np.int32))


def _rand_state(n, seed=0, scale=1e-2):
    rng = np.random.default_rng(seed)
    from radiativetransfer_tpu.constants import MH, PSI
    nh = rng.lognormal(0, 0.5, (n, n, n)) * scale
    from radiativetransfer_tpu.core.state import make_state
    return make_state(nh * MH / PSI, np.full((n, n, n), 1e4), nh,
                      dtype=jnp.float64)


class TestDegenerateLimits:
    def test_unrefined_matches_uniform_tracer(self, tables):
        tab, _ = tables
        n = 12
        geom = GridGeometry(n, n, n, 100 * KPC)
        base = _rand_state(n)
        state = amr.make_amr_state(base, jnp.zeros((n, n, n), bool))
        src = _source_at([0.47, 0.52, 0.5])

        rfb, rff, diag_a = rays_amr.trace_point_sources_amr(
            state, geom, src, tab, max_pixel_level=3)
        rf_u, diag_u = rays.trace_point_sources(base, geom, src, tab,
                                                max_pixel_level=3)
        np.testing.assert_allclose(np.asarray(rfb.krate24),
                                   np.asarray(rf_u.krate24), rtol=1e-8,
                                   atol=1e30)
        assert float(jnp.sum(jnp.abs(rff.krate24))) == 0.0
        np.testing.assert_allclose(np.asarray(diag_a.ndot_remaining),
                                   np.asarray(diag_u.ndot_remaining),
                                   rtol=1e-8)

    def test_fully_refined_matches_fine_uniform_tracer(self, tables):
        tab, _ = tables
        n = 6
        geom = GridGeometry(n, n, n, 100 * KPC)
        base = _rand_state(n)
        state = amr.make_amr_state(base, jnp.ones((n, n, n), bool))
        src = _source_at([0.47, 0.52, 0.5])

        rfb, rff, diag_a = rays_amr.trace_point_sources_amr(
            state, geom, src, tab, max_pixel_level=4)

        # the equivalent uniform run at fine resolution
        geom_f = GridGeometry(2 * n, 2 * n, 2 * n, 100 * KPC)
        fine = state.fine
        rf_u, diag_u = rays.trace_point_sources(fine, geom_f, src, tab,
                                                max_pixel_level=4)
        total_a = float(jnp.sum(rff.krate24))
        total_u = float(jnp.sum(rf_u.krate24))
        assert total_a == pytest.approx(total_u, rel=1e-6)
        np.testing.assert_allclose(np.asarray(rff.krate24),
                                   np.asarray(rf_u.krate24), rtol=1e-6,
                                   atol=1e-12 * max(total_u, 1.0))
        assert float(jnp.sum(jnp.abs(rfb.krate24))) == 0.0
        np.testing.assert_allclose(np.asarray(diag_a.ndot_remaining),
                                   np.asarray(diag_u.ndot_remaining),
                                   rtol=1e-6)

    def test_mixed_grid_conserves_photons(self, tables):
        tab, total = tables
        n = 12
        geom = GridGeometry(n, n, n, 100 * KPC)
        # dense neutral box: everything ionizing is absorbed somewhere
        base = _rand_state(n, scale=1.0)
        refined = np.zeros((n, n, n), bool)
        refined[4:8, 4:8, 4:8] = True   # refine the center
        state = amr.make_amr_state(base, jnp.asarray(refined))
        src = _source_at([0.5, 0.5, 0.5])

        rfb, rff, diag = rays_amr.trace_point_sources_amr(
            state, geom, src, tab, max_pixel_level=3)
        absorbed = float(jnp.sum(rfb.krate24) + jnp.sum(rff.krate24))
        assert absorbed == pytest.approx(total, rel=0.05)
        # the source sits in the refined region: deposits near the source go
        # to the FINE level
        assert float(jnp.sum(rff.krate24)) > 0.9 * absorbed

    def test_refinement_boundary_handoff(self, tables):
        # a ray crossing coarse->fine->coarse must accumulate the same
        # optical depth as in an equivalent uniform medium
        tab, _ = tables
        n = 8
        geom = GridGeometry(n, n, n, 50 * KPC)
        nh = 0.01
        from radiativetransfer_tpu.core.state import uniform_state as us
        base = us(n, nh=nh, tgas=1e4, dtype=jnp.float64)
        refined = np.zeros((n, n, n), bool)
        refined[3:5, :, :] = True       # a refined slab in the middle
        state = amr.make_amr_state(base, jnp.asarray(refined))
        src = _source_at([0.06, 0.5, 0.52])

        rfb, rff, diag_a = rays_amr.trace_point_sources_amr(
            state, geom, src, tab, max_pixel_level=3)
        # uniform comparison (same density everywhere): total absorption
        # must agree because the medium is physically identical
        rf_u, diag_u = rays.trace_point_sources(base, geom, src, tab,
                                                max_pixel_level=3)
        tot_a = float(jnp.sum(rfb.krate24) + jnp.sum(rff.krate24))
        tot_u = float(jnp.sum(rf_u.krate24))
        assert tot_a == pytest.approx(tot_u, rel=2e-2)
        np.testing.assert_allclose(np.asarray(diag_a.ndot_remaining),
                                   np.asarray(diag_u.ndot_remaining),
                                   rtol=2e-2)
