"""Golden-value tests for the physics table builders (SURVEY.md §4a).

Oracle values are hand-computed from the same published fits the reference
implements (Abel et al. 1997; Hui & Gnedin 1997; Osterbrock cross-sections),
independent of both codebases.
"""

import math

import numpy as np
import pytest

from radiativetransfer_tpu.constants import (
    CASE_A,
    CASE_B,
    HYDROGEN_IONIZATION,
    NFBINS,
    FREQUENCY_BIN_WIDTH,
    NU1,
    NU2,
    NU3,
    rmax_table,
)
from radiativetransfer_tpu.tables import chemistry_rates as cr
from radiativetransfer_tpu.tables import cross_sections as xs
from radiativetransfer_tpu.tables import spectral, uvb_models


class TestCrossSections:
    def test_sigma24_threshold(self):
        # just above threshold the Kramers fit approaches 6.3e-18
        val = xs.sigma24(np.array([HYDROGEN_IONIZATION * 1.0001]))[0]
        assert val == pytest.approx(6.3e-18, rel=2e-3)

    def test_sigma24_highfreq_scaling(self):
        # far above threshold sigma ~ nu^-3 (Kramers): ratio at 10x freq
        v1 = xs.sigma24(np.array([10.0 * NU1]))[0]
        v2 = xs.sigma24(np.array([20.0 * NU1]))[0]
        assert v1 / v2 == pytest.approx(8.0, rel=0.15)

    def test_sigma26_value(self):
        # HeI fit at 2x threshold: 7.42e-18*(1.66*2^-2.05 - 0.66*2^-3.05)
        expected = 7.42e-18 * (1.66 * 2 ** -2.05 - 0.66 * 2 ** -3.05)
        assert xs.sigma26(np.array([2 * NU2]))[0] == pytest.approx(expected, rel=1e-12)

    def test_below_threshold_zero(self):
        nu = np.array([1.0, 5.0, 13.0])
        assert np.all(xs.sigma24(nu) == 0.0)
        assert np.all(xs.sigma25(nu) == 0.0)
        assert np.all(xs.sigma26(nu) == 0.0)

    def test_sigma31_lyman_werner_band(self):
        assert xs.sigma31(np.array([12.0]))[0] == 3.71e-18
        assert xs.sigma31(np.array([14.0]))[0] == 0.0

    def test_frequency_grid(self):
        nu = xs.frequency_grid(NFBINS, FREQUENCY_BIN_WIDTH)
        assert nu[0] == 1.0
        assert nu[-1] == pytest.approx(10 ** (399 * 0.02), rel=1e-12)


class TestCollRates:
    def test_k1_at_1e4K(self):
        # Abel et al. 97 HI collisional ionization at T=1e4 K — evaluate the
        # polynomial directly as an independent check
        T = 1.0e4
        log_t_ev = math.log(T / 11605.0)
        coeffs = [-32.71396786375, 13.53655609057, -5.739328757388,
                  1.563154982022, -0.2877056004391, 0.03482559773736999,
                  -0.00263197617559, 0.0001119543953861, -2.039149852002e-6]
        expected = math.exp(sum(c * log_t_ev ** i for i, c in enumerate(coeffs)))
        got = cr.coll_rates(np.array([T]), CASE_A)["k1"][0]
        assert got == pytest.approx(expected, rel=1e-12)

    def test_k2_case_b_hui_gnedin(self):
        # alpha_B(H) at 1e4 K should be ~2.59e-13 cm^3/s (standard value)
        got = cr.coll_rates(np.array([1.0e4]), CASE_B)["k2"][0]
        assert got == pytest.approx(2.59e-13, rel=0.02)

    def test_k4_case_b(self):
        T = 1.0e4
        tmp = 2.0 * 24.587 * 1.60217646e-12 / (1.3806503e-16 * T)
        assert cr.coll_rates(np.array([T]), CASE_B)["k4"][0] == pytest.approx(
            1.26e-14 * tmp ** 0.75, rel=1e-12)

    def test_k6_twice_k2_scaling(self):
        T = np.array([1.0e4, 1.0e5])
        k = cr.coll_rates(T, CASE_B)
        lam2 = 2.0 * 13.598 * 1.60217646e-12 / (1.3806503e-16 * T)
        lam6 = 2.0 * 54.418 * 1.60217646e-12 / (1.3806503e-16 * T)
        expected = 2.0 * 2.753e-14 * lam6 ** 1.5 / (1 + (lam6 / 2.740) ** 0.407) ** 2.242
        np.testing.assert_allclose(k["k6"], expected, rtol=1e-12)

    def test_cold_gas_floors(self):
        k = cr.coll_rates(np.array([100.0]), CASE_A)
        assert k["k1"][0] == 1.0e-20
        assert k["k3"][0] == 1.0e-20
        assert k["k5"][0] == 1.0e-20


class TestCalcRates:
    @pytest.fixture(scope="class")
    def tables(self):
        return cr.calc_rates(recombination_type=CASE_A)

    def test_shapes(self, tables):
        assert tables.T.shape == (5000,)
        assert tables.k["k1"].shape == (5000,)
        assert tables.k13dd.shape == (5000, 7)
        assert tables.k16().shape == (5000, 6)

    def test_temperature_grid_endpoints(self, tables):
        assert tables.T[0] == pytest.approx(1.0)
        assert tables.T[-1] == pytest.approx(1.0e8)

    def test_brem_value(self, tables):
        T = tables.T
        expected = 1.43e-27 * np.sqrt(T) * (1.1 + 0.34 * np.exp(-(5.5 - np.log10(T)) ** 2 / 3.0))
        np.testing.assert_allclose(tables.brem, expected, rtol=1e-12)

    def test_ciHI_proportional_k1(self, tables):
        np.testing.assert_allclose(tables.ciHI, 2.18e-11 * tables.k["k1"], rtol=1e-12)

    def test_interp_log_t_exact_on_nodes(self, tables):
        k1 = tables.k["k1"]
        # at a node temperature the interpolation must return the node value
        i = 3000
        got = cr.interp_log_t(k1, np.log(tables.T[i]))
        assert got == pytest.approx(k1[i], rel=1e-10)

    def test_interp_log_t_midpoint(self, tables):
        k1 = tables.k["k1"]
        i = 3000
        mid = 0.5 * (np.log(tables.T[i]) + np.log(tables.T[i + 1]))
        got = cr.interp_log_t(k1, mid)
        assert got == pytest.approx(0.5 * (k1[i] + k1[i + 1]), rel=1e-10)

    def test_colh2diss_out_of_range(self):
        out = cr.colh2diss(np.array([300.0, 2.0e6]))
        np.testing.assert_allclose(out[:, 0], 1e-20)
        np.testing.assert_allclose(out[:, 4], 1.0)

    def test_case_b_cooling_fallback_positive(self):
        t = cr.calc_rates(recombination_type=CASE_B)
        assert np.all(t.reHII[1000:] > 0)
        assert np.all(t.reHeII1[1000:] > 0)
        assert np.all(t.reHeIII[1000:] > 0)


class TestSpectralIntegrals:
    @pytest.fixture(scope="class")
    def uq(self):
        return spectral.uniform_table(NFBINS, FREQUENCY_BIN_WIDTH, 1.8, 5.0)

    def test_ksi24_analytic(self, uq):
        # independent Riemann evaluation of ksi24 for the quasar spectrum
        quasar, _ = uq
        nu = xs.frequency_grid(NFBINS, FREQUENCY_BIN_WIDTH)
        s24 = xs.sigma24(nu)
        acc = 0.0
        for i in range(1, NFBINS):
            f = nu[i]
            if f < NU1:
                continue
            dn = nu[i] - nu[i - 1]
            w = (f / NU1) ** -1.8 * dn
            acc += w * 1.60217646e-12 / 6.6260693e-27 / (f * 1.60217646e-12) * s24[i]
        assert quasar.ksi[24] == pytest.approx(acc, rel=1e-10)

    def test_stellar_steeper_than_quasar(self, uq):
        quasar, stellar = uq
        # steeper stellar spectrum -> relatively less HeII-ionizing flux
        assert stellar.ksi[25] / stellar.ksi[24] < quasar.ksi[25] / quasar.ksi[24]

    def test_heating_positive(self, uq):
        quasar, stellar = uq
        for t in (quasar, stellar):
            assert t.gammaHI > 0 and t.gammaHeI > 0 and t.gammaHeII > 0

    def test_uvb_beta_groups(self):
        g1, g2, g3 = spectral.uvb_beta_table(NFBINS, FREQUENCY_BIN_WIDTH,
                                             (2.0, 2.5, 3.0))
        # group 1 is below the HeII edge: no HeII absorption
        assert g1.beta[25] == 0.0
        assert g1.gammaHeII == 0.0
        # group-averaged HI cross-section must lie within the band's range
        assert xs.sigma24(np.array([NU2]))[0] < g1.beta[24] < 6.3e-18
        # group 3 sees all three species
        assert g3.beta[24] > 0 and g3.beta[25] > 0 and g3.beta[26] > 0

    def test_power_spectrum_index_recovers_single_component(self):
        # with one component zero, the effective slope is the other's slope
        total, alpha = spectral.power_spectrum_index(1.0, 2.0, 0.0, 5.0,
                                                     NU1, NU2, True)
        assert total == 1.0
        assert alpha == pytest.approx(2.0, abs=1e-6)

    def test_power_spectrum_index_between(self):
        total, alpha = spectral.power_spectrum_index(1.0, 5.0, 1.0, 1.8,
                                                     NU1, NU2, True)
        assert total == 2.0
        assert 1.8 < alpha < 5.0


class TestUvbModels:
    def test_ah99_values(self):
        # z=0: stellar = 1/(1+7^4) * 1
        assert uvb_models.abel_haehnelt99_stellar(0.0) == pytest.approx(
            1.0 / (1.0 + 7.0 ** 4), rel=1e-12)

    def test_razoumov02_high_z_cutoff(self):
        amps = uvb_models.razoumov02(20.0)
        assert amps.stellar < 1e-3

    def test_reionization_coefficient(self):
        q, s = spectral.uniform_table(NFBINS, FREQUENCY_BIN_WIDTH, 1.8, 5.0)
        amps = uvb_models.uniform_uvb_intensities(6.55)
        coef = uvb_models.reionization_rate_coefficient(
            6.55, 10, amps.quasar, amps.stellar, q.ksi[24], s.ksi[24])
        assert coef > 0
        # renormalized photoionization rate matches the table
        rate = 4 * np.pi * (amps.quasar * coef * q.ksi[24]
                            + amps.stellar * coef * s.ksi[24])
        assert 1e-14 < rate < 1e-12  # between table points around z=6.55


def test_rmax_table_values():
    r = rmax_table()
    # first entries match the hard-coded values at equiSources.f90:293-302
    # (note the code then divides by 2 at :309)
    assert 2 * r[0] == pytest.approx(1.984, abs=2e-3)
    assert 2 * r[3] == pytest.approx(10.65, abs=2e-2)
    assert 2 * r[9] == pytest.approx(627.9, abs=1e0)
