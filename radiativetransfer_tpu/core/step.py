"""The main iteration: transport + chemistry cycle, and the model setup.

Mirrors the reference's driver flow (/root/reference/equiSources.f90:1230-1843):
  zero rates -> [point-source ray trace] -> [opacities + diffuse sweep] ->
  save previous fields -> equilibrium chemistry -> neutral-fraction log ->
  snapshot.

`RTModel.setup()` performs the table initialization the reference does before
the loop (calc_rates, uniformTable, UVB amplitudes, powerSpectrumIndex,
uvbBetaTable; equiSources.f90:172-289) and compiles the fused device step.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RunConfig
from ..constants import (
    ALPHA_QUASAR,
    ALPHA_STELLAR,
    COMPA,
    FOUR_PI,
    FREQUENCY_BIN_WIDTH,
    MH,
    NFBINS,
    NU1,
    NU2,
    NU3,
    PSI,
)
from ..tables import chemistry_rates, spectral, stellar as stellar_tables, uvb_models
from . import chemistry, opacity, rays, sweep
from .state import FieldState, GridGeometry


@dataclasses.dataclass
class StellarContext:
    """Point-source transfer inputs for one iteration.

    The reference rebuilds the 11^4 attenuation tables per source
    (equiSources.f90:1298); here sources sharing an (age, metallicity)
    bucket share a table (SURVEY.md §3.3) and the tables are stacked on a
    leading bucket axis for per-ray gathering.
    """
    population: "stellar_tables.StellarPopulation"
    sources: rays.SourceBatch
    tables: dict                 # reaction_log/energy_log (B,3,11^4) + output_*
    n_stars_specific_age: int
    dust_approximation: int = 0
    max_pixel_level: int = 6

    @classmethod
    def build(cls, population, sources: rays.SourceBatch, geom: GridGeometry,
              age_s: float, metal_coefs: list[tuple[int, float]],
              n_stars_specific_age: int | None = None,
              dust_approximation: int = 0, max_pixel_level: int = 6,
              dust=None) -> "StellarContext":
        """Build stacked tables for the metallicity buckets at a fixed age
        slice (the reference uses timeReadTable = 10 Myr,
        equiSources.f90:1236).

        The tables are divided by the cell volume (in float64, on host) so
        the ray deposits are volumetric rates [1/s/cm^3]: CGS cell volumes
        overflow float32 on device (see chemistry.photo_rates_from_sources).
        """
        i_spec, coef_spec = population.age_bracket(age_s)
        log_vol = float(np.log(geom.cell_volume))
        reaction, energy, quad_w = [], [], []
        out = quad_a = None
        for i_metal, coef_metal in metal_coefs:
            t = stellar_tables.build_source_tables(
                population, i_spec, coef_spec, i_metal, coef_metal, dust=dust)
            reaction.append(t.reaction_log - log_vol)
            energy.append(t.energy_log - log_vol)
            out = t
            quad_a, w = stellar_tables.quadrature_arrays(
                population, i_spec, coef_spec, i_metal, coef_metal, dust=dust)
            quad_w.append(w / geom.cell_volume)
        tables = {
            "reaction_log": jnp.asarray(np.stack(reaction)),
            "energy_log": jnp.asarray(np.stack(energy)),
            # direct-quadrature factors: the tracer's default fast path
            # (core.rays._deposit_quadrature)
            "quad_A": jnp.asarray(quad_a),
            "quad_W": jnp.asarray(np.stack(quad_w)),
            "output_freq": jnp.asarray(out.output_freq),
            "output_sigma24": jnp.asarray(out.output_sigma24),
            "output_sigma25": jnp.asarray(out.output_sigma25),
            "output_sigma26": jnp.asarray(out.output_sigma26),
            "output_sigma_dust": jnp.asarray(out.output_sigma_dust),
        }
        return cls(population=population, sources=sources, tables=tables,
                   n_stars_specific_age=(n_stars_specific_age
                                         or int(sources.weight.sum())),
                   dust_approximation=dust_approximation,
                   max_pixel_level=max_pixel_level)


@dataclasses.dataclass
class RTModel:
    """All static data for a run: tables, geometry, compiled step."""
    config: RunConfig
    geom: GridGeometry
    tables: chemistry_rates.ChemistryTables
    dev_tables: chemistry.RateTablesDevice
    quasar: spectral.NormCrossSections
    stellar: spectral.NormCrossSections
    groups: tuple | None            # (g1, g2, g3) when UVB transfer is on
    opacity_coef: opacity.GroupOpacityCoefficients | None
    ksi_matrix: jax.Array | None    # (3 bands, 3 species) for diffuse rates
    uvb: np.ndarray                 # (3,) band boundary intensities
    uniform_quasar: float
    uniform_stellar: float
    sweep_plan: sweep.SweepPlan | None
    alpha_bands: tuple[float, float, float] | None

    # ----- setup ---------------------------------------------------------

    @classmethod
    def setup(cls, config: RunConfig, geom: GridGeometry,
              recombination_type: int | None = None,
              dtype=jnp.float32) -> "RTModel":
        from ..constants import CASE_B
        rt = CASE_B if recombination_type is None else recombination_type
        tables = chemistry_rates.calc_rates(recombination_type=rt)
        dev_tables = chemistry.RateTablesDevice.from_tables(tables, dtype)
        quasar, stellar = spectral.uniform_table(
            NFBINS, FREQUENCY_BIN_WIDTH, ALPHA_QUASAR, ALPHA_STELLAR)

        z = config.current_redshift
        amps = uvb_models.uniform_uvb_intensities(z, config.uvb_coefficient)
        uniform_quasar, uniform_stellar = amps.quasar, amps.stellar

        groups = None
        opacity_coef = None
        ksi_matrix = None
        alpha_bands = None
        uvb = np.zeros(3)
        if config.run_uvb_transfer:
            s_bands, q_bands = uvb_models.band_intensities(
                amps, ALPHA_STELLAR, ALPHA_QUASAR)
            uvb1, a1 = spectral.power_spectrum_index(
                s_bands[0], ALPHA_STELLAR, q_bands[0], ALPHA_QUASAR, NU1, NU2, True)
            uvb2, a2 = spectral.power_spectrum_index(
                s_bands[1], ALPHA_STELLAR, q_bands[1], ALPHA_QUASAR, NU2, NU3, True)
            uvb3, a3 = spectral.power_spectrum_index(
                s_bands[2], ALPHA_STELLAR, q_bands[2], ALPHA_QUASAR, NU3, NU3, False)
            uvb = np.array([uvb1, uvb2, uvb3])
            alpha_bands = (a1, a2, a3)
            g1, g2, g3 = spectral.uvb_beta_table(NFBINS, FREQUENCY_BIN_WIDTH,
                                                 alpha_bands)
            groups = (g1, g2, g3)
            opacity_coef = opacity.GroupOpacityCoefficients.from_groups(g1, g2, g3)
            # rows: bands; cols: (HI ksi24, HeII ksi25, HeI ksi26)
            ksi_matrix = jnp.asarray(np.array([
                [g1.ksi[24], g1.ksi[25], g1.ksi[26]],
                [g2.ksi[24], g2.ksi[25], g2.ksi[26]],
                [g3.ksi[24], g3.ksi[25], g3.ksi[26]],
            ]), dtype)

        # reionization-history renormalization (equiSources.f90:259-289)
        if config.reionization_model:
            coef = uvb_models.reionization_rate_coefficient(
                z, config.reionization_model, uniform_quasar, uniform_stellar,
                quasar.ksi[24], stellar.ksi[24])
            uniform_quasar *= coef
            uniform_stellar *= coef
            uvb = uvb * coef

        sweep_plan = None
        if config.run_uvb_transfer:
            sweep_plan = sweep.build_sweep_plan(config.n_angular_level, geom.nx)

        return cls(config=config, geom=geom, tables=tables,
                   dev_tables=dev_tables, quasar=quasar, stellar=stellar,
                   groups=groups, opacity_coef=opacity_coef,
                   ksi_matrix=ksi_matrix, uvb=uvb,
                   uniform_quasar=uniform_quasar,
                   uniform_stellar=uniform_stellar, sweep_plan=sweep_plan,
                   alpha_bands=alpha_bands)

    # ----- derived coefficients -----------------------------------------

    @property
    def gamma_thin(self) -> tuple[float, float, float]:
        """Optically-thin uniform-UVB photoionization rates [1/s]
        (equiSources.f90:3558-3560): (HI, HeII, HeI)."""
        q, s = self.quasar, self.stellar
        return (
            FOUR_PI * (self.uniform_quasar * q.ksi[24] + self.uniform_stellar * s.ksi[24]),
            FOUR_PI * (self.uniform_quasar * q.ksi[25] + self.uniform_stellar * s.ksi[25]),
            FOUR_PI * (self.uniform_quasar * q.ksi[26] + self.uniform_stellar * s.ksi[26]),
        )

    @property
    def heat_thin(self) -> tuple[float, float, float]:
        """Optically-thin photo-heating coefficients [erg cm^2/s?]
        (thermalEquilibrium, equiSources.f90:3931-3933): (HI, HeII, HeI)."""
        q, s = self.quasar, self.stellar
        return (
            FOUR_PI * (self.uniform_quasar * q.gammaHI + self.uniform_stellar * s.gammaHI),
            FOUR_PI * (self.uniform_quasar * q.gammaHeII + self.uniform_stellar * s.gammaHeII),
            FOUR_PI * (self.uniform_quasar * q.gammaHeI + self.uniform_stellar * s.gammaHeI),
        )

    # ----- setup-time equilibrium ----------------------------------------

    def initialize_equilibrium(self, state: FieldState) -> FieldState:
        """Initial ionization equilibrium under the uniform UVB, run twice
        because the self-shielding surface moves after the first pass
        (equiSources.f90:1012-1021), followed by the thermal-balance
        diagnostic (:1026-1033)."""
        init = jax.jit(lambda s: chemistry.solve_rate_equations(
            s.zero_rates(), self.geom, self.dev_tables,
            gamma_thin=self.gamma_thin,
            self_shielding_threshold=self.config.self_shielding_threshold,
            run_uvb_transfer=False,
            n_iter=110 if s.rho.dtype == jnp.float64 else 60))
        state = init(state)
        state = init(state)
        return chemistry.thermal_equilibrium(
            state, heat_thin=self.heat_thin,
            self_shielding_threshold=self.config.self_shielding_threshold,
            current_redshift=self.config.current_redshift,
            tables=self.dev_tables, compa=COMPA)

    # ----- the iteration -------------------------------------------------

    def transport_chemistry_step(self, state: FieldState,
                                 stellar: StellarContext | None = None
                                 ) -> FieldState | tuple[FieldState, "rays.RayDiagnostics"]:
        """One full transport + chemistry iteration (pure function of state;
        jit this or use make_step()).  With a StellarContext the point-source
        phase runs first and RayDiagnostics are returned alongside the
        state."""
        cfg = self.config
        state = state.zero_rates()
        diag = None

        if cfg.run_stellar_transfer and stellar is not None:
            n = self.geom.nx
            rf, diag = rays.trace_point_sources(
                state, self.geom, stellar.sources, stellar.tables,
                dust_approximation=stellar.dust_approximation,
                max_pixel_level=stellar.max_pixel_level,
                dtype=state.rho.dtype)
            shape = state.shape
            state = dataclasses.replace(
                state,
                krate24=rf.krate24.reshape(shape),
                krate25=rf.krate25.reshape(shape),
                krate26=rf.krate26.reshape(shape),
                crate24=rf.crate24.reshape(shape),
                crate25=rf.crate25.reshape(shape),
                crate26=rf.crate26.reshape(shape))

        state = self._sweep_and_chemistry(state)
        if diag is not None:
            return state, diag
        return state

    def _sweep_and_chemistry(self, state: FieldState) -> FieldState:
        cfg = self.config
        if cfg.run_uvb_transfer:
            kappa = opacity.compute_opacities(state.HI, state.HeI, state.HeII,
                                              self.opacity_coef)
            use_pallas = (cfg.use_pallas_sweep
                          and jax.devices()[0].platform not in ("cpu",))
            if use_pallas:
                from . import sweep_pallas
                jmean = sweep_pallas.diffuse_sweep_pallas(
                    kappa, self.sweep_plan, jnp.asarray(self.uvb, kappa.dtype),
                    self.geom.cell_size)
            else:
                jmean = sweep.diffuse_sweep(kappa, self.sweep_plan,
                                            jnp.asarray(self.uvb, kappa.dtype),
                                            self.geom.cell_size)
            state = dataclasses.replace(state, Jmean=jmean)

        return chemistry.solve_rate_equations(
            state, self.geom, self.dev_tables,
            ksi_matrix=self.ksi_matrix,
            gamma_thin=self.gamma_thin,
            self_shielding_threshold=self.config.self_shielding_threshold,
            run_uvb_transfer=cfg.run_uvb_transfer,
            n_iter=110 if state.rho.dtype == jnp.float64 else 60)

    def make_step(self, stellar: StellarContext | None = None):
        """jit-compiled iteration step.  The point-source tracer keeps its
        own compilation cache; the sweep+chemistry body is jitted here."""
        if stellar is None:
            return jax.jit(self.transport_chemistry_step)
        rest = jax.jit(self._sweep_and_chemistry)

        def step(state: FieldState):
            state = state.zero_rates()
            rf, diag = rays.trace_point_sources(
                state, self.geom, stellar.sources, stellar.tables,
                dust_approximation=stellar.dust_approximation,
                max_pixel_level=stellar.max_pixel_level,
                dtype=state.rho.dtype)
            shape = state.shape
            state = dataclasses.replace(
                state,
                krate24=rf.krate24.reshape(shape),
                krate25=rf.krate25.reshape(shape),
                krate26=rf.krate26.reshape(shape),
                crate24=rf.crate24.reshape(shape),
                crate25=rf.crate25.reshape(shape),
                crate26=rf.crate26.reshape(shape))
            return rest(state), diag

        return step

    def neutral_fraction(self, state: FieldState) -> float:
        """Global neutral-hydrogen mass fraction (computeMass,
        equiSources.f90:4369-4393 / :1833-1836)."""
        return float(jnp.sum(state.HI) / jnp.sum(state.nh))


def iterate_to_equilibrium(model: RTModel, state: FieldState,
                           max_iter: int = 50, tol: float = 1e-6,
                           log=None) -> tuple[FieldState, list[float]]:
    """Run transport+chemistry iterations until the global neutral fraction
    stabilizes (the reference loops forever and is killed by hand; we add the
    convergence check the reference's author applied by eye on the `time`
    log)."""
    step = model.make_step()
    history = []
    prev = np.inf
    for it in range(max_iter):
        state = step(state)
        nf = model.neutral_fraction(state)
        history.append(nf)
        if log is not None:
            log(it, nf)
        if abs(nf - prev) <= tol * max(nf, 1e-30):
            break
        prev = nf
    return state, history
