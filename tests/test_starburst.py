"""Starburst99 SED ingestion end-to-end (VERDICT round-1 item 5).

A synthetic `spectrum.out` fixture in the Starburst99 layout the reference
parses (equiSources.f90:847-884) exercises parse_starburst99,
load_population, the metallicity bucket plan, and the multi-bucket
StellarContext path through the tracer (table_idx > 0).
"""

import os

import numpy as np
import pytest

from radiativetransfer_tpu.constants import ANGSTROM, CLIGHT, EV_TO_HZ, MYR
from radiativetransfer_tpu.core import rays, step as step_mod
from radiativetransfer_tpu.core.state import GridGeometry, uniform_state
from radiativetransfer_tpu.io import sources_io
from radiativetransfer_tpu.tables import stellar

# per-track log-luminosity offset so buckets are distinguishable in deposits
TRACK_OFFSET = {0: 0.0, 1: -0.2, 2: -0.4, 3: -0.6, 4: -0.8}


def _spectrum_out_text(track: int) -> str:
    """Synthetic spectrum.out: 3 time slices x 40 wavelengths, one
    'TIME [YR]' header block per slice (the layout the reference's parser
    walks, equiSources.f90:852-877); log L_lambda = 40 - lam/1e3 + offset."""
    times_yr = [1.0e6, 5.0e6, 2.0e7]
    wav_a = np.geomspace(100.0, 2000.0, 40)
    lines = []
    lines.append(" MODEL DESIGNATION: SYNTH")
    for t in times_yr:
        lines.append(" TIME [YR]  WAVELENGTH [A]  LOG TOTAL  LOG STELLAR")
        lines.append(" " + "-" * 60)
        lines.append("")
        for w in wav_a:
            logl = 40.0 - w / 1.0e3 + TRACK_OFFSET[track]
            lines.append(f"  {t:12.4e} {w:14.4e} {logl:12.4f} {logl:12.4f}")
    return "\n".join(lines) + "\n"


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthesis")
    for i, fname in enumerate(stellar.STARBURST99_FILES):
        path = root / fname
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(_spectrum_out_text(i))
    return str(root)


class TestParse:
    def test_shapes_and_units(self, synth_dir):
        paths = [os.path.join(synth_dir, f) for f in stellar.STARBURST99_FILES]
        pop = stellar.parse_starburst99(
            paths, list(stellar.STARBURST99_METALLICITIES))
        assert pop.specific_luminosity.shape == (5, 3, 40)
        np.testing.assert_allclose(
            pop.spectrum_time, np.array([1e6, 5e6, 2e7]) * 31557600.0)
        assert pop.wavelength[0] == pytest.approx(100.0 * ANGSTROM)
        assert pop.wavelength[-1] == pytest.approx(2000.0 * ANGSTROM)
        np.testing.assert_allclose(
            pop.metallicity_log10,
            np.log10(stellar.STARBURST99_METALLICITIES))

    def test_luminosity_matches_analytic(self, synth_dir):
        paths = [os.path.join(synth_dir, f) for f in stellar.STARBURST99_FILES]
        pop = stellar.parse_starburst99(
            paths, list(stellar.STARBURST99_METALLICITIES))
        # on-node lookup: track 2, first age slice, lambda = 500 A
        lam = 500.0 * ANGSTROM
        ev = CLIGHT / lam / EV_TO_HZ
        got = pop.luminosity(0, 0.0, 2, 0.0, ev)[0]
        logl = 40.0 - 0.5 + TRACK_OFFSET[2]          # log10(erg/s/A)
        want = 10.0 ** logl / ANGSTROM * lam ** 2 / CLIGHT  # erg/s/Hz
        assert got == pytest.approx(want, rel=1e-3)

    def test_luminosity_shift(self, synth_dir):
        paths = [os.path.join(synth_dir, f) for f in stellar.STARBURST99_FILES]
        base = stellar.parse_starburst99(
            paths, list(stellar.STARBURST99_METALLICITIES))
        shifted = stellar.parse_starburst99(
            paths, list(stellar.STARBURST99_METALLICITIES),
            luminosity_shift_log10=1.0)
        np.testing.assert_allclose(
            shifted.specific_luminosity, base.specific_luminosity + 1.0)

    def test_mass_particle_shift(self):
        # hiRes particles are 1/8 mass -> 1/8 luminosity
        # (equiSources.f90:892-895)
        s_norm = stellar.luminosity_shift_log10(347, 34, 1)
        s_hires = stellar.luminosity_shift_log10(347, 34, 2)
        assert s_hires - s_norm == pytest.approx(-np.log10(8.0))
        assert s_norm == pytest.approx(0.0)


class TestLoadPopulation:
    def test_loads_when_present(self, synth_dir):
        pop, used = stellar.load_population(synth_dir, 347, 34, 1)
        assert used
        assert pop.specific_luminosity.shape[0] == 5

    def test_fallback_when_missing(self, tmp_path):
        pop, used = stellar.load_population(str(tmp_path), 347, 34, 1)
        assert not used
        # blackbody fallback still gives a usable multi-age population
        assert pop.specific_luminosity.shape[1] >= 2

    def test_fallback_empty_dir_string(self):
        _, used = stellar.load_population("", 347, 34, 1)
        assert not used


class TestMetalBuckets:
    def test_edges_bracket_tracks(self, synth_dir):
        pop, _ = stellar.load_population(synth_dir, 347, 34, 1)
        edges, coefs = stellar.metal_bucket_plan(pop)
        z = 10.0 ** pop.metallicity_log10
        assert len(edges) == len(z) + 1
        assert len(coefs) == len(z)
        # each track falls in its own bucket
        idx = np.searchsorted(edges, z) - 1
        np.testing.assert_array_equal(idx, np.arange(len(z)))
        # coefs reproduce each track exactly at its node
        for i, (im, cm) in enumerate(coefs):
            lz = ((1 - cm) * pop.metallicity_log10[im]
                  + cm * pop.metallicity_log10[im + 1])
            assert lz == pytest.approx(pop.metallicity_log10[i])

    def test_sources_bucket_by_host_metallicity(self, synth_dir):
        pop, _ = stellar.load_population(synth_dir, 347, 34, 1)
        edges, _ = stellar.metal_bucket_plan(pop)
        n = 8
        stars = sources_io.StarList(
            position=np.array([[0.1, 0.1, 0.1], [0.9, 0.9, 0.9]]),
            age=np.array([1.0 * MYR, 1.0 * MYR]),
            level=np.array([1, 1]))
        abun2 = np.full((n, n, n), 0.0004)
        abun2[7, 7, 7] = 0.05
        batch, host, _ = sources_io.prepare_sources(
            stars, n, 10.0 * MYR, abun2=abun2, metal_bucket_edges=edges)
        assert sorted(batch.table_idx.tolist()) == [0, 4]


class TestMultiBucketTrace:
    def test_table_idx_selects_sed(self, synth_dir):
        """Two identical sources whose hosts differ only in metallicity must
        deposit different rates (bucket 4's SED is 0.8 dex fainter)."""
        pop, _ = stellar.load_population(synth_dir, 347, 34, 1)
        edges, coefs = stellar.metal_bucket_plan(pop)
        n = 16
        geom = GridGeometry(nx=n, ny=n, nz=n,
                            physical_box_size=100.0 * 3.0857e21)
        state = uniform_state(n, nh=1e-4, tgas=1e4)
        batch = rays.SourceBatch(
            position=np.array([[0.25, 0.25, 0.25], [0.75, 0.75, 0.75]]),
            weight=np.array([1.0, 1.0]),
            table_idx=np.array([0, 4], np.int32))
        ctx = step_mod.StellarContext.build(
            pop, batch, geom, 2.0 * MYR, metal_coefs=coefs,
            max_pixel_level=2)
        assert ctx.tables["quad_W"].shape[0] == 5
        rf, _ = rays.trace_point_sources(state, geom, batch, ctx.tables,
                                         max_pixel_level=2)
        k = np.asarray(rf.krate24).reshape(n, n, n)
        lo = k[: n // 2, : n // 2, : n // 2].sum()   # around source 0
        hi = k[n // 2:, n // 2:, n // 2:].sum()      # around source 4
        assert lo > 0 and hi > 0
        # 0.8 dex fainter SED -> ~6.3x smaller deposits near source 2
        assert lo / hi == pytest.approx(10.0 ** 0.8, rel=0.15)
