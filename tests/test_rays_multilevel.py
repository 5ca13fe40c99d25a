"""L-level AMR ray-tracer tests: degenerate-limit equivalences and exact
agreement with the two-level tracer (VERDICT r1 item 7)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import amr, rays, rays_amr, rays_multilevel
from radiativetransfer_tpu.core.state import GridGeometry, make_state
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
    return make_state(nh * MH / PSI, np.full((n, n, n), 1e4), nh,
                      dtype=jnp.float64)


class TestDegenerateLimits:
    def test_unrefined_three_level_matches_uniform(self, tables):
        tab, _ = tables
        n = 8
        geom = GridGeometry(n, n, n, 100 * KPC)
        base = _rand_state(n)
        state = amr.make_multilevel_state(
            base, [np.zeros((n, n, n), bool),
                   np.zeros((2 * n,) * 3, bool)])
        src = _source_at([0.47, 0.52, 0.5])

        rfs, diag_m = rays_multilevel.trace_point_sources_ml(
            state, geom, src, tab, max_pixel_level=3)
        rf_u, diag_u = rays.trace_point_sources(base, geom, src, tab,
                                                max_pixel_level=3)
        np.testing.assert_allclose(np.asarray(rfs[0].krate24),
                                   np.asarray(rf_u.krate24), rtol=1e-8,
                                   atol=1e30)
        assert float(jnp.sum(jnp.abs(rfs[1].krate24))) == 0.0
        assert float(jnp.sum(jnp.abs(rfs[2].krate24))) == 0.0
        np.testing.assert_allclose(np.asarray(diag_m.ndot_remaining),
                                   np.asarray(diag_u.ndot_remaining),
                                   rtol=1e-8)

    def test_two_level_exact_match_with_rays_amr(self, tables):
        """L=2 multilevel tracer must reproduce the two-level tracer
        exactly (same algorithm, independent implementations)."""
        tab, _ = tables
        n = 8
        geom = GridGeometry(n, n, n, 100 * KPC)
        base = _rand_state(n, seed=3, scale=0.1)
        rng = np.random.default_rng(5)
        refined = rng.random((n, n, n)) < 0.3
        two = amr.make_amr_state(base, jnp.asarray(refined))
        ml = amr.make_multilevel_state(base, [refined])
        src = _source_at([0.43, 0.55, 0.5])

        rfb, rff, diag_2 = rays_amr.trace_point_sources_amr(
            two, geom, src, tab, max_pixel_level=3)
        rfs, diag_m = rays_multilevel.trace_point_sources_ml(
            ml, geom, src, tab, max_pixel_level=3)
        np.testing.assert_allclose(np.asarray(rfs[0].krate24),
                                   np.asarray(rfb.krate24), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(rfs[1].krate24),
                                   np.asarray(rff.krate24), rtol=1e-10)
        np.testing.assert_allclose(np.asarray(diag_m.ndot_remaining),
                                   np.asarray(diag_2.ndot_remaining),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(diag_m.ndot_boundary),
                                   np.asarray(diag_2.ndot_boundary),
                                   rtol=1e-10)

    def test_three_level_conserves_photons(self, tables):
        tab, total = tables
        n = 8
        geom = GridGeometry(n, n, n, 100 * KPC)
        base = _rand_state(n, seed=7, scale=1.0)    # dense: all absorbed
        refined = [np.zeros((n, n, n), bool), np.zeros((2 * n,) * 3, bool)]
        refined[0][2:6, 2:6, 2:6] = True
        refined[1][6:10, 6:10, 6:10] = True
        refined = amr.enforce_balance(refined)
        state = amr.make_multilevel_state(base, refined)
        src = _source_at([0.5, 0.5, 0.5])

        rfs, diag = rays_multilevel.trace_point_sources_ml(
            state, geom, src, tab, max_pixel_level=3)
        absorbed = sum(float(jnp.sum(rf.krate24)) for rf in rfs)
        assert absorbed == pytest.approx(total, rel=0.05)
        # the source sits inside the doubly-refined region: the innermost
        # deposits land on level 2
        assert float(jnp.sum(rfs[2].krate24)) > 0.5 * absorbed

    def test_three_level_boundary_handoff(self, tables):
        """A ray crossing level 0 -> 1 -> 2 -> 1 -> 0 accumulates the same
        total absorption as in the physically identical uniform medium."""
        tab, _ = tables
        n = 8
        geom = GridGeometry(n, n, n, 50 * KPC)
        from radiativetransfer_tpu.core.state import uniform_state as us
        base = us(n, nh=0.01, tgas=1e4, dtype=jnp.float64)
        refined = [np.zeros((n, n, n), bool), np.zeros((2 * n,) * 3, bool)]
        refined[0][3:5, :, :] = True
        refined[1][7:9, :, :] = True
        refined = amr.enforce_balance(refined)
        state = amr.make_multilevel_state(base, refined)
        src = _source_at([0.06, 0.5, 0.52])

        rfs, diag_m = rays_multilevel.trace_point_sources_ml(
            state, geom, src, tab, max_pixel_level=3)
        rf_u, diag_u = rays.trace_point_sources(base, geom, src, tab,
                                                max_pixel_level=3)
        tot_m = sum(float(jnp.sum(rf.krate24)) for rf in rfs)
        tot_u = float(jnp.sum(rf_u.krate24))
        assert tot_m == pytest.approx(tot_u, rel=2e-2)
        np.testing.assert_allclose(np.asarray(diag_m.ndot_remaining),
                                   np.asarray(diag_u.ndot_remaining),
                                   rtol=2e-2)


class TestCornerHitTermination:
    """Regression for the round-5 zombie-ray limit cycle: an f32 ray
    whose position sits EXACTLY on a cell corner (two coordinates on
    faces, the state every crossing's snap produces) with negative
    direction components must keep marching and terminate — the sub-ulp
    legacy relocalization nudge froze such rays in a zero-step period-2
    cycle (pos/cell desync), running production final phases to their
    step caps."""

    def test_face_exact_f32_ray_terminates(self):
        import dataclasses as dc

        from radiativetransfer_tpu.core import amr, rays, rays_multilevel
        from radiativetransfer_tpu.core.rays import RateFields
        from radiativetransfer_tpu.core.state import GridGeometry
        n, L = 16, 2
        nF = n * 2 ** (L - 1)
        geom = GridGeometry(n, n, n, 100.0 * KPC)
        refined = [np.zeros((n, n, n), bool)]
        refined[0][6:10, 6:10, 6:10] = True
        ml, _ = _toy_ml(n, refined)
        dtype = jnp.float32
        fields = {"leaf_level": rays_multilevel.leaf_level_volume(
            [jnp.asarray(r) for r in refined], n, L)}
        fields["lv_all"] = jnp.concatenate([
            rays._pack_fields(
                lv.HI.reshape(-1).astype(dtype),
                lv.HeI.reshape(-1).astype(dtype),
                lv.HeII.reshape(-1).astype(dtype),
                lv.nh.reshape(-1).astype(dtype),
                lv.abun2.reshape(-1).astype(dtype))
            for lv in ml.levels], axis=0)

        # rays parked exactly on cell corners, negative components on
        # the two face-exact axes — the zombie configuration
        R = 8
        pos = np.full((R, 3), 0.37109, np.float32)
        pos[:, 1] = 8.0 / nF * 2            # exactly on a face
        pos[:, 2] = 14.0 / nF               # exactly on a face
        d = np.tile(np.array([[0.65, -0.645, -0.4]], np.float32), (R, 1))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        cell = np.clip((pos * nF).astype(np.int32), 0, nF - 1)
        z = jnp.zeros(R, dtype)
        state = rays._RayState(
            pos=jnp.asarray(pos), direction=jnp.asarray(d),
            cell=jnp.asarray(cell), radius=z,
            ndot=jnp.ones(R, dtype), depth=jnp.zeros((R, 4), dtype),
            alive=jnp.ones(R, bool), split=jnp.zeros(R, bool),
            table_idx=jnp.zeros(R, jnp.int32),
            crossed=jnp.zeros(R, bool),
            cross_depth=jnp.zeros((R, 4), dtype))
        tables = _toy_quad_tables(dtype)
        diag = rays.RayDiagnostics.zeros(1, dtype)
        rfs = RateFields(*[jnp.zeros(fields["lv_all"].shape[0], dtype)
                           for _ in range(6)])
        out_state, _, _ = rays_multilevel._march_phase_ml(
            state, fields, geom, L, ("quadrature", tables), diag, rfs,
            1e9, True, 0, 6 * nF, jnp.zeros(R, jnp.int32),
            rel_kill=1e-10)
        # every ray must have left the box (or died) well before the cap
        assert int(jnp.sum(out_state.alive)) == 0


def _toy_ml(n, refined):
    from radiativetransfer_tpu.core import amr
    rng = np.random.default_rng(0)
    nh = rng.lognormal(0, 0.3, (n, n, n)) * 1e-4
    from radiativetransfer_tpu.core.state import make_state
    from radiativetransfer_tpu.constants import MH, PSI
    base = make_state(nh * MH / PSI, np.full((n, n, n), 1e4), nh,
                      dtype=jnp.float64)
    ml = amr.make_multilevel_state(base, refined)
    return amr.sync_restriction_multi(ml), refined


def _toy_quad_tables(dtype):
    F = 16
    rng = np.random.default_rng(1)
    quad_A = jnp.asarray(rng.uniform(0.1, 1.0, (4, F)), dtype)
    quad_W = jnp.asarray(rng.uniform(0, 1e-30, (6, F, 1)), dtype)
    return (quad_A, quad_W)
