"""Chemistry solver tests: closed-form oracles + parity with the serial
bisection port (SURVEY.md §4d)."""

import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.constants import CASE_B, KPC, MH, MHE, PSI
from radiativetransfer_tpu.core import chemistry
from radiativetransfer_tpu.core.state import GridGeometry, uniform_state
from radiativetransfer_tpu.tables import chemistry_rates as cr

from reference_impl import solve_rate_equations_serial


@pytest.fixture(scope="module")
def tables():
    return cr.calc_rates(recombination_type=CASE_B)


@pytest.fixture(scope="module")
def dev_tables(tables):
    return chemistry.RateTablesDevice.from_tables(tables)


def _k_of_T(tables):
    def f(T):
        return [float(cr.interp_log_t(tables.k[f"k{i}"], np.log(T)))
                for i in range(1, 7)]
    return f


class TestEquilibrium:
    def test_collisional_only_hot_gas_ionized(self, dev_tables):
        # at 1e6 K with no radiation hydrogen is almost fully ionized
        nh = jnp.array([1.0e-3])
        nhe = jnp.array([1.0e-4])
        T = jnp.array([1.0e6])
        zero = jnp.zeros(1)
        HI, HeI, HeII, de = chemistry.solve_equilibrium(nh, nhe, T, zero, zero,
                                                        zero, dev_tables)
        assert float(HI[0] / nh[0]) < 1e-3
        assert float(HeI[0] / nhe[0]) < 1e-3

    def test_collisional_only_cold_gas_neutral(self, dev_tables):
        nh = jnp.array([1.0e-3])
        nhe = jnp.array([1.0e-4])
        T = jnp.array([5.0e3])
        zero = jnp.zeros(1)
        HI, HeI, HeII, de = chemistry.solve_equilibrium(nh, nhe, T, zero, zero,
                                                        zero, dev_tables)
        assert float(HI[0] / nh[0]) > 0.99
        assert float(HeI[0] / nhe[0]) > 0.99

    def test_matches_serial_bisection(self, tables, dev_tables):
        rng = np.random.default_rng(3)
        n = 16
        nh = 10.0 ** rng.uniform(-5, 0, n)
        nhe = nh * (1 - PSI) / PSI * MH / MHE
        T = 10.0 ** rng.uniform(3.5, 5.5, n)
        g24 = 10.0 ** rng.uniform(-14, -11, n)
        g25 = 10.0 ** rng.uniform(-16, -13, n)
        g26 = 10.0 ** rng.uniform(-15, -12, n)

        HI, HeI, HeII, de = chemistry.solve_equilibrium(
            jnp.asarray(nh), jnp.asarray(nhe), jnp.asarray(T),
            jnp.asarray(g24), jnp.asarray(g25), jnp.asarray(g26), dev_tables)

        kf = _k_of_T(tables)
        for i in range(n):
            hi_s, hei_s, heii_s, _ = solve_rate_equations_serial(
                nh[i], nhe[i], T[i], g24[i], g25[i], g26[i], kf)
            assert float(HI[i]) == pytest.approx(hi_s, rel=1e-6)
            assert float(HeI[i]) == pytest.approx(hei_s, rel=1e-6)
            assert float(HeII[i]) == pytest.approx(heii_s, rel=1e-6)

    def test_species_conservation(self, dev_tables):
        rng = np.random.default_rng(5)
        n = 64
        nh = jnp.asarray(10.0 ** rng.uniform(-6, 1, n))
        nhe = nh * 0.08
        T = jnp.asarray(10.0 ** rng.uniform(3, 6, n))
        g24 = jnp.asarray(10.0 ** rng.uniform(-16, -10, n))
        HI, HeI, HeII, de = chemistry.solve_equilibrium(
            nh, nhe, T, g24, g24 * 0.1, g24 * 0.3, dev_tables)
        assert np.all(np.asarray(HI) >= -1e-20)
        assert np.all(np.asarray(HI) <= np.asarray(nh) * (1 + 1e-9))
        assert np.all(np.asarray(HeI + HeII) <= np.asarray(nhe) * (1 + 1e-9))
        # electron density consistent with species
        HII = np.asarray(nh - HI)
        HeIII = np.asarray(nhe - HeI - HeII)
        np.testing.assert_allclose(np.asarray(de),
                                   HII + np.asarray(HeII) + 2 * HeIII, rtol=1e-6)

    def test_photoionization_dominates(self, dev_tables):
        # strong radiation field ionizes even cold gas
        nh = jnp.array([1.0e-4])
        nhe = jnp.array([1.0e-5])
        T = jnp.array([1.0e4])
        g = jnp.array([1.0e-8])
        z = jnp.zeros(1)
        HI, _, _, _ = chemistry.solve_equilibrium(nh, nhe, T, g, z, z, dev_tables)
        assert float(HI[0] / nh[0]) < 1e-4

    def test_h_only_closed_form_matches_full(self, dev_tables):
        # with trace helium, the full solver approaches the H-only solution
        nh = jnp.array([1.0e-3, 1.0e-2])
        nhe = nh * 1e-10
        T = jnp.array([2.0e4, 1.5e4])
        g24 = jnp.array([1.0e-12, 3.0e-13])
        z = jnp.zeros(2)
        HI_full, _, _, _ = chemistry.solve_equilibrium(nh, nhe, T, g24, z, z,
                                                       dev_tables)
        HI_ho, HII_ho = chemistry.solve_h_only_equilibrium(nh, T, g24, dev_tables)
        np.testing.assert_allclose(np.asarray(HI_full), np.asarray(HI_ho),
                                   rtol=1e-4)

    def test_h_only_neutral_limit(self, dev_tables):
        # no radiation, cold: all neutral
        nh = jnp.array([1.0e-3])
        T = jnp.array([3.0e3])
        HI, HII = chemistry.solve_h_only_equilibrium(nh, T, jnp.zeros(1),
                                                     dev_tables)
        assert float(HI[0] / nh[0]) > 0.999


class TestSolveRateEquationsState:
    def test_uniform_uvb_ionizes_thin_gas(self, dev_tables):
        state = uniform_state(4, nh=1e-5, tgas=2e4, dtype=jnp.float64)
        geom = GridGeometry(4, 4, 4, 100 * KPC)
        out = chemistry.solve_rate_equations(
            state, geom, dev_tables, gamma_thin=(1e-12, 1e-14, 1e-13),
            self_shielding_threshold=0.1 * KPC, run_uvb_transfer=False)
        assert float(jnp.max(out.HI / out.nh)) < 0.1

    def test_self_shielding_blocks_uvb(self, dev_tables):
        # dense neutral gas: mfp below threshold, no UVB applied, stays neutral
        state = uniform_state(4, nh=10.0, tgas=8e3, dtype=jnp.float64)
        geom = GridGeometry(4, 4, 4, 100 * KPC)
        out = chemistry.solve_rate_equations(
            state, geom, dev_tables, gamma_thin=(1e-12, 1e-14, 1e-13),
            self_shielding_threshold=1000 * KPC, run_uvb_transfer=False)
        assert float(jnp.min(out.HI / out.nh)) > 0.99


class TestThermal:
    def test_hot_gas_cooling_dominates(self, dev_tables):
        state = uniform_state(2, nh=1e-2, tgas=3e4, dtype=jnp.float64)
        import dataclasses as dc
        # half-ionized so there are electrons to cool with
        state = dc.replace(state, HI=state.nh * 0.5,
                           HeI=state.nhe * 0.5, HeII=state.nhe * 0.3)
        out = chemistry.thermal_equilibrium(
            state, heat_thin=(0.0, 0.0, 0.0),
            self_shielding_threshold=0.1 * KPC, current_redshift=6.0,
            tables=dev_tables, compa=5.65e-36)
        # pure cooling -> positive hydroHeating required to balance
        assert float(jnp.min(out.hydroHeating)) > 0.0

    def test_strong_heating_clamps_to_zero(self, dev_tables):
        state = uniform_state(2, nh=1e-4, tgas=1e4, dtype=jnp.float64)
        out = chemistry.thermal_equilibrium(
            state, heat_thin=(1e-10, 1e-12, 1e-11),
            self_shielding_threshold=0.1 * KPC, current_redshift=6.0,
            tables=dev_tables, compa=5.65e-36)
        # UVB heating dominates cooling -> hydroHeating clamped at 0
        assert float(jnp.max(out.hydroHeating)) == 0.0
