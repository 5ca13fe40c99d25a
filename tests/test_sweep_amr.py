"""Two-level AMR sweep tests: degenerate limits and physics invariants."""

import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import sweep, sweep_amr


def _kappas(n, tau=0.5, seed=0):
    rng = np.random.default_rng(seed)
    cell = KPC
    kc = rng.lognormal(0, 0.7, (3, n, n, n)) * tau / cell
    # fine kappa = prolonged coarse (physically identical medium)
    kf = np.repeat(np.repeat(np.repeat(kc, 2, 1), 2, 2), 2, 3)
    return jnp.asarray(kc), jnp.asarray(kf), cell


@pytest.fixture(scope="module")
def plans():
    n = 6
    plan_u = sweep.build_sweep_plan(1, n)
    plan_a = sweep_amr.build_amr_sweep_plan(1, n)
    # one compiled callable shared by every test in this module
    run_a = sweep_amr.make_jitted_sweep_amr(plan_a)
    run_u = sweep.make_jitted_sweep(plan_u)
    return plan_u, plan_a, n, run_u, run_a


class TestDegenerateLimits:
    def test_unrefined_matches_uniform(self, plans):
        plan_u, plan_a, n, run_u, run_a = plans
        kc, kf, cell = _kappas(n)
        uvb = jnp.array([1.0, 0.5, 0.25])
        refined = jnp.zeros((n, n, n), bool)
        j_u = np.asarray(run_u(kc, uvb, cell))
        jc, jf = run_a(kc, kf, refined, uvb, cell)
        np.testing.assert_allclose(np.asarray(jc), j_u, rtol=1e-12)

    def test_transparent_box_both_levels(self, plans):
        plan_u, plan_a, n, run_u, run_a = plans
        cell = KPC
        kc = jnp.full((3, n, n, n), 1e-30)
        kf = jnp.full((3, 2 * n, 2 * n, 2 * n), 1e-30)
        uvb = jnp.array([1.0, 0.5, 0.25])
        refined = np.zeros((n, n, n), bool)
        refined[2:4, 2:4, 2:4] = True
        jc, jf = run_a(kc, kf, jnp.asarray(refined), uvb, cell)
        jc = np.asarray(jc)
        jf = np.asarray(jf)
        ref_f = np.repeat(np.repeat(np.repeat(refined, 2, 0), 2, 1), 2, 2)
        for b, val in enumerate([1.0, 0.5, 0.25]):
            np.testing.assert_allclose(jc[b][~refined], val, rtol=1e-6)
            np.testing.assert_allclose(jf[b][ref_f], val, rtol=1e-6)
            # unrefined fine positions carry no J
            assert np.all(jf[b][~ref_f] == 0.0)
            assert np.all(jc[b][refined] == 0.0)

    def test_fully_refined_close_to_fine_uniform(self, plans):
        plan_u, plan_a, n, run_u, run_a = plans
        kc, kf, cell = _kappas(n, tau=0.3)
        uvb = jnp.array([1.0, 0.5, 0.25])
        refined = jnp.ones((n, n, n), bool)
        jc, jf = run_a(kc, kf, refined, uvb, cell)
        plan_f = sweep.build_sweep_plan(1, 2 * n)
        j_fu = np.asarray(sweep.diffuse_sweep(kf, plan_f, uvb, cell / 2))
        # different ray-family sampling (the AMR fine chain inherits the
        # base footpoint) -> cell-level differences; volume means agree
        for b in range(3):
            assert np.mean(np.asarray(jf)[b]) == pytest.approx(
                np.mean(j_fu[b]), rel=0.05)

    def test_refined_slab_perturbs_locally(self, plans):
        plan_u, plan_a, n, run_u, run_a = plans
        kc, kf, cell = _kappas(n, tau=0.4)
        uvb = jnp.array([1.0, 0.5, 0.25])
        refined = np.zeros((n, n, n), bool)
        refined[n // 2, :, :] = True
        jc, jf = run_a(kc, kf, jnp.asarray(refined), uvb, cell)
        j_u = np.asarray(run_u(kc, uvb, cell))
        jc = np.asarray(jc)
        # same physical medium: coarse J away from the refined slab close to
        # the uniform result (refinement only changes ray sampling)
        mask = ~refined
        rel = np.abs(jc[:, mask] - j_u[:, mask]) / j_u[:, mask]
        assert np.median(rel) < 0.05
        assert np.max(rel) < 0.5

    def test_jmean_bounded_by_uvb(self, plans):
        plan_u, plan_a, n, run_u, run_a = plans
        kc, kf, cell = _kappas(n, tau=1.0, seed=3)
        uvb = jnp.array([1.0, 0.5, 0.25])
        refined = np.zeros((n, n, n), bool)
        refined[1:4, 2:5, 0:3] = True
        jc, jf = run_a(kc, kf, jnp.asarray(refined), uvb, cell)
        for b, val in enumerate([1.0, 0.5, 0.25]):
            assert float(jnp.max(jc[b])) <= val * (1 + 1e-9)
            assert float(jnp.max(jf[b])) <= val * (1 + 1e-9)
            assert float(jnp.min(jc[b])) >= 0.0


class TestSerialOracle:
    def test_matches_serial_two_level_oracle(self, plans):
        """Vectorized AMR sweep vs the direct serial port of the reference's
        recursive transport order, random refinement map."""
        import sys
        sys.path.insert(0, "tests")
        from reference_impl import serial_sweep_two_level

        plan_u, plan_a, n, run_u, run_a = plans
        kc, kf, cell = _kappas(n, tau=0.6, seed=11)
        uvb = np.array([1.0, 0.5, 0.25])
        rng = np.random.default_rng(7)
        refined = rng.random((n, n, n)) < 0.3

        jc_s, jf_s = serial_sweep_two_level(np.asarray(kc), np.asarray(kf),
                                            refined, 1, uvb, cell)
        jc_v, jf_v = run_a(kc, kf, jnp.asarray(refined), uvb, cell)
        jc_v, jf_v = np.asarray(jc_v), np.asarray(jf_v)

        mask_c = ~refined
        np.testing.assert_allclose(jc_v[:, mask_c], jc_s[:, mask_c],
                                   rtol=1e-9, atol=1e-13)
        ref_f = np.repeat(np.repeat(np.repeat(refined, 2, 0), 2, 1), 2, 2)
        np.testing.assert_allclose(jf_v[:, ref_f], jf_s[:, ref_f],
                                   rtol=1e-9, atol=1e-13)
