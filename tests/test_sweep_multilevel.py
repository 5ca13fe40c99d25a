"""L-level AMR sweep: degenerate-limit equivalences and the serial
three-level oracle (VERDICT r1 item 7)."""

import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.core import amr, sweep, sweep_amr, sweep_multilevel
from tests import reference_impl

UVB = np.array([2e-21, 5e-22, 1e-23])
CELL = 3.0e21


def _kappa(n, seed, scale=1.0 / 3.0e21):
    rng = np.random.default_rng(seed)
    return (rng.lognormal(0.0, 0.7, (3, n, n, n)) * scale).astype(np.float64)


def _balanced_refined(n, levels, seed, frac=0.25):
    """Random properly-nested, face-balanced refinement maps."""
    rng = np.random.default_rng(seed)
    refined = []
    m = n
    for ell in range(levels - 1):
        r = rng.random((m, m, m)) < frac
        refined.append(r)
        m *= 2
    refined = amr.enforce_balance(refined)
    # proper nesting downward: refined[l] only where covered
    cover = np.ones((n, n, n), bool)
    for ell in range(levels - 1):
        refined[ell] &= cover
        cover = np.repeat(np.repeat(np.repeat(
            refined[ell], 2, 0), 2, 1), 2, 2)
    assert amr.check_balance(refined)
    return refined


class TestChainConsistency:
    def test_child_chain_matches_parent_transform(self):
        """The continuous level-(l+1) chain equals the per-parent child
        transform of the level-l chain (setRaysRefined,
        transportRoutinesModule.f90:151-187) — the induction step that
        justifies building deep-level chains from child_start^l."""
        from radiativetransfer_tpu.core.sweep_amr import (_build_chain,
                                                          _child_start)
        phi, theta = 0.374, 0.9115
        for start in [(0.5, 0.5), _child_start(0.5, 0.5)]:
            parent = _build_chain(phi, theta, 8, *start)
            child = _build_chain(phi, theta, 16, *_child_start(*start))
            for i, t in enumerate(parent):
                cx, cy = _child_start(t.x0, t.y0)
                assert child[2 * i].x0 == pytest.approx(cx, abs=1e-12)
                assert child[2 * i].y0 == pytest.approx(cy, abs=1e-12)


class TestDegenerateLimits:
    def test_single_level_matches_uniform_sweep(self):
        n = 6
        kap = _kappa(n, 0)
        plan_u = sweep.build_sweep_plan(1, n)
        plan_m = sweep_multilevel.build_ml_sweep_plan(1, n, 1)
        j_u = sweep.diffuse_sweep(jnp.asarray(kap), plan_u,
                                  jnp.asarray(UVB), CELL)
        (j_m,) = sweep_multilevel.diffuse_sweep_multilevel(
            [jnp.asarray(kap)], [], plan_m, jnp.asarray(UVB), CELL)
        np.testing.assert_allclose(np.asarray(j_m), np.asarray(j_u),
                                   rtol=1e-6)

    def test_two_level_matches_sweep_amr(self):
        n = 4
        kc = _kappa(n, 1)
        kf = _kappa(2 * n, 2)
        refined = _balanced_refined(n, 2, 3)
        plan2 = sweep_amr.build_amr_sweep_plan(1, n)
        planm = sweep_multilevel.build_ml_sweep_plan(1, n, 2)
        jc2, jf2 = sweep_amr.diffuse_sweep_amr(
            jnp.asarray(kc), jnp.asarray(kf), jnp.asarray(refined[0]),
            plan2, jnp.asarray(UVB), CELL, n_coupling_iters=4)
        jm = sweep_multilevel.diffuse_sweep_multilevel(
            [jnp.asarray(kc), jnp.asarray(kf)], [jnp.asarray(refined[0])],
            planm, jnp.asarray(UVB), CELL, n_coupling_iters=4)
        # sweep_amr reports base J on unrefined cells only, like the ML path
        np.testing.assert_allclose(np.asarray(jm[0]), np.asarray(jc2),
                                   rtol=1e-6, atol=1e-30)
        # fine J: sweep_amr zeroes non-refined fine cells; ML masks leaves
        mask = np.repeat(np.repeat(np.repeat(refined[0], 2, 0), 2, 1), 2, 2)
        np.testing.assert_allclose(np.asarray(jm[1]) * mask[None],
                                   np.asarray(jf2), rtol=1e-6, atol=1e-30)


class TestSerialOracle:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_three_level_matches_serial(self, seed):
        n = 4
        kappas = [_kappa(n, 10 + seed), _kappa(2 * n, 20 + seed),
                  _kappa(4 * n, 30 + seed)]
        refined = _balanced_refined(n, 3, 40 + seed, frac=0.3)
        plan = sweep_multilevel.build_ml_sweep_plan(1, n, 3)
        jm = sweep_multilevel.diffuse_sweep_multilevel(
            [jnp.asarray(k) for k in kappas],
            [jnp.asarray(r) for r in refined],
            plan, jnp.asarray(UVB), CELL, n_coupling_iters=6)
        js = reference_impl.serial_sweep_multilevel(
            kappas, refined, 1, UVB, CELL)
        leaf = [np.ones((n, n, n), bool), None, None]
        cover = np.ones((n, n, n), bool)
        for ell in range(2):
            leaf[ell] = cover & ~refined[ell]
            cover = np.repeat(np.repeat(np.repeat(
                refined[ell] & cover, 2, 0), 2, 1), 2, 2)
        leaf[2] = cover
        for ell in range(3):
            np.testing.assert_allclose(
                np.asarray(jm[ell]) * leaf[ell][None],
                js[ell] * leaf[ell][None], rtol=1e-9, atol=1e-30)

    def test_two_level_serial_cross_check(self):
        """The L-level serial oracle agrees with the round-1 two-level
        serial oracle (independent implementations)."""
        n = 4
        kc, kf = _kappa(n, 7), _kappa(2 * n, 8)
        refined = _balanced_refined(n, 2, 9)
        jc, jf = reference_impl.serial_sweep_two_level(
            kc, kf, refined[0], 1, UVB, CELL, directions=range(4))
        js = reference_impl.serial_sweep_multilevel(
            [kc, kf], refined, 1, UVB, CELL, directions=range(4))
        mask_b = ~refined[0]
        mask_f = np.repeat(np.repeat(np.repeat(refined[0], 2, 0), 2, 1), 2, 2)
        np.testing.assert_allclose(js[0] * mask_b[None], jc * mask_b[None],
                                   rtol=1e-12)
        np.testing.assert_allclose(js[1] * mask_f[None], jf * mask_f[None],
                                   rtol=1e-12)


class TestCouplingDepth:
    def test_residual_converges_with_depth(self):
        """The production coupling depth must be validated, not assumed
        (VERDICT r2 weak-5): the one-more-pass residual drops to roundoff
        once the depth covers the refinement pattern's chain length, and
        pick_coupling_iters finds that depth."""
        n = 6
        kappas = [jnp.asarray(_kappa(n, 50)),
                  jnp.asarray(_kappa(2 * n, 51)),
                  jnp.asarray(_kappa(4 * n, 52))]
        refined = [jnp.asarray(r)
                   for r in _balanced_refined(n, 3, 53, frac=0.35)]
        plan = sweep_multilevel.build_ml_sweep_plan(1, n, 3)
        r1 = sweep_multilevel.coupling_residual(
            kappas, refined, plan, jnp.asarray(UVB), CELL, 1)
        r4 = sweep_multilevel.coupling_residual(
            kappas, refined, plan, jnp.asarray(UVB), CELL, 4)
        assert r4 < r1
        assert r4 < 1e-7, r4       # default depth converges at this size
        it = sweep_multilevel.pick_coupling_iters(
            kappas, refined, plan, jnp.asarray(UVB), CELL, tol=1e-7)
        assert 1 <= it <= 6
