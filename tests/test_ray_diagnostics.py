"""Escape-fraction / emergent-spectrum oracle tests (VERDICT round-1 item 6).

The production tracer's RayDiagnostics are checked against a per-ray
depth-first NumPy port of the reference's bookkeeping
(equiSources.f90:3198-3233, boundary & split-loss accounting :3336-3344,
spectrum :3206-3223), including boundary losses and split-spawned
out-of-box children.
"""

import numpy as np
import pytest

from radiativetransfer_tpu.constants import (
    KPC,
    OUTPUT_RADII_KPC,
    SIGMA24_AT_NU1,
    SIGMA25_AT_NU3,
    SIGMA26_AT_NU2,
    SIGMA_DUST_AT_NU1,
)
from radiativetransfer_tpu.core import rays
from radiativetransfer_tpu.core.state import GridGeometry, make_state
from radiativetransfer_tpu.tables import stellar

from reference_impl import serial_trace


@pytest.fixture(scope="module")
def setup():
    n = 24
    box = 300.0 * KPC
    geom = GridGeometry(nx=n, ny=n, nz=n, physical_box_size=box)
    rng = np.random.default_rng(7)
    nh = rng.lognormal(np.log(1.0e-3), 0.5, (n, n, n))
    # a dense neutral blob so the tau kill fires for some rays
    nh[14:18, 14:18, 14:18] = 0.2
    x_hi = np.clip(rng.uniform(0.2, 1.0, (n, n, n)), 0.0, 1.0)
    from radiativetransfer_tpu.constants import MH, PSI
    state = make_state(rho=nh * MH / PSI, tgas=np.full((n, n, n), 1.0e4),
                       HI=nh * x_hi, dtype=np.float64)

    # off-center source -> split children leave the box; center source too
    pos = np.array([[0.52, 0.48, 0.5],
                    [2.5 / n, 2.5 / n, 2.5 / n]])
    batch = rays.SourceBatch(position=pos, weight=np.array([1.0, 2.0]),
                             table_idx=np.array([0, 0], np.int32))

    pop = stellar.blackbody_population(temperature=1.0e5, q_ionizing=5.0e48)
    quad_A, quad_W = stellar.quadrature_arrays(pop, 0, 0.0, 0, 0.0)
    quad_W = quad_W / geom.cell_volume
    t = stellar.build_source_tables(pop, 0, 0.0, 0, 0.0)
    tables = {
        "quad_A": quad_A, "quad_W": quad_W[None],
        "output_freq": t.output_freq,
        "output_sigma24": t.output_sigma24,
        "output_sigma25": t.output_sigma25,
        "output_sigma26": t.output_sigma26,
        "output_sigma_dust": t.output_sigma_dust,
    }
    sig_ratio = np.stack([
        t.output_sigma24 / SIGMA24_AT_NU1,
        t.output_sigma26 / SIGMA26_AT_NU2,
        t.output_sigma25 / SIGMA25_AT_NU3,
        t.output_sigma_dust / SIGMA_DUST_AT_NU1,
    ])

    rf, diag = rays.trace_point_sources(state, geom, batch, tables,
                                        max_pixel_level=3, dtype=np.float64)
    s_rates, s_rem, s_bnd, s_spec = serial_trace(
        {"HI": np.asarray(state.HI), "HeI": np.asarray(state.HeI),
         "HeII": np.asarray(state.HeII)},
        n, geom.cell_size, pos, np.asarray(batch.weight),
        quad_A, quad_W[None], sig_ratio,
        np.array(OUTPUT_RADII_KPC) * KPC, max_pixel_level=3)
    return n, batch, rf, diag, s_rates, s_rem, s_bnd, s_spec


class TestDiagnosticsParity:
    def test_scenario_exercises_all_paths(self, setup):
        _, _, _, diag, _, s_rem, s_bnd, s_spec = setup
        # the fixture must actually hit: escapes recorded, boundary losses,
        # and outer-radius crossings (emergent spectrum)
        assert np.any(s_rem > 0)
        assert np.any(s_bnd > 0)
        assert np.any(s_spec > 0)

    # Tolerances: the dense blob has tau ~ 5e4 per cell, and exp()
    # amplifies path roundoff by tau — significant elements agree to ~1e-6
    # relative, tails below ~1e-9 of the peak are physically zero.  A
    # semantic bug (sign, ratio, off-by-one in the bookkeeping) would be
    # O(1), far outside these bounds.

    def test_ndot_remaining(self, setup):
        _, _, _, diag, _, s_rem, _, _ = setup
        np.testing.assert_allclose(np.asarray(diag.ndot_remaining), s_rem,
                                   rtol=2e-5, atol=1e-9 * s_rem.max())

    def test_ndot_boundary(self, setup):
        _, _, _, diag, _, _, s_bnd, _ = setup
        np.testing.assert_allclose(np.asarray(diag.ndot_boundary), s_bnd,
                                   rtol=1e-8, atol=0)

    def test_ndot_spectrum(self, setup):
        _, _, _, diag, _, _, _, s_spec = setup
        np.testing.assert_allclose(np.asarray(diag.ndot_spectrum), s_spec,
                                   rtol=2e-5, atol=1e-9 * s_spec.max())

    def test_rate_deposits(self, setup):
        n, _, rf, _, s_rates, _, _, _ = setup
        np.testing.assert_allclose(
            np.asarray(rf.krate24).reshape(n, n, n), s_rates["krate24"],
            rtol=2e-5, atol=1e-9 * s_rates["krate24"].max())
        np.testing.assert_allclose(
            np.asarray(rf.crate24).reshape(n, n, n), s_rates["crate24"],
            rtol=2e-5, atol=1e-9 * s_rates["crate24"].max())

    def test_escape_fractions_formula(self, setup):
        """fraction = remaining/(ndot1 - boundary) (equiSources.f90:1342-48)."""
        _, batch, _, diag, _, s_rem, s_bnd, _ = setup
        frac = rays.escape_fractions(diag, batch.weight)
        w = np.asarray(batch.weight)[:, None]
        want = np.where(s_bnd < w, s_rem / np.where(s_bnd < w, w - s_bnd, 1.0),
                        0.0)
        np.testing.assert_allclose(frac, want, rtol=2e-5,
                                   atol=1e-9 * want.max())
        assert frac.shape == (2, len(OUTPUT_RADII_KPC))
        # escape fractions are physical
        assert np.all(frac >= 0) and np.all(frac <= 1 + 1e-9)

    def test_cosmic_spectrum_formula(self, setup):
        """spectrum = sum_s w_s spec_s/(w_s - boundary_s)/nSpecificAge
        (equiSources.f90:1350-1366)."""
        _, batch, _, diag, _, _, s_bnd, s_spec = setup
        got = rays.cosmic_spectrum(diag, batch.weight, 5)
        w = np.asarray(batch.weight)[:, None]
        nb = s_bnd[:, -1:]
        want = (w * s_spec / np.where(nb < w, w - nb, np.inf)).sum(0) / 5
        np.testing.assert_allclose(got, want, rtol=2e-5,
                                   atol=1e-9 * np.abs(want).max())
