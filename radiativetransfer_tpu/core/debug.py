"""Runtime sanitizers (SURVEY.md §5.2).

The reference guards its hot paths with ~40 stop-asserts (intensity
sanity, geometry bound checks, species-range checks — e.g. checkPoint,
/root/reference/equiSources.f90:2962-2976; transportRoutinesModule.f90:
680-688).  The TPU analogs:

* `jax.config.jax_debug_nans` (CLI --debug-nans) — cheap, always
  available;
* host-side SMEM chain-table validation before Pallas launches
  (core.sweep_pallas._validate_zone_tables);
* THIS module: `checkify` instrumentation of the XLA compute paths —
  gather/scatter index bounds, NaN/Inf production, and division — run as
  a pre-flight on the actual ingested data (CLI --debug-checkify).  The
  Pallas sweep kernel cannot be checkify-instrumented (Mosaic), so the
  checked sweep uses the mathematically identical lax.scan formulation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import checkify

from . import chemistry, opacity, rays, sweep

ERRORS = checkify.index_checks | checkify.float_checks | checkify.div_checks


def checked_trace(state_fields, geom, sources, tables,
                  dust_approximation: int = 0, max_pixel_level: int = 3,
                  dtype=jnp.float64, rates_mode: str = "auto",
                  n_bands: int = 3):
    """Point-source trace under checkify: every gather/scatter index is
    bounds-checked and every float op NaN/Inf-checked.  Raises
    checkify.JaxRuntimeError on the first violated invariant; returns
    (RateFields, RayDiagnostics) otherwise.  ~2-4x the uninstrumented
    cost — a debug tool, not the production path."""
    if rates_mode == "auto":
        rates_mode = "quadrature" if "quad_A" in tables else "table"
    n = geom.nx
    fields = {
        "HI": state_fields.HI.reshape(-1).astype(dtype),
        "HeI": state_fields.HeI.reshape(-1).astype(dtype),
        "HeII": state_fields.HeII.reshape(-1).astype(dtype),
        "nH": state_fields.nh.reshape(-1).astype(dtype),
        "abun2": state_fields.abun2.reshape(-1).astype(dtype),
    }
    st = rays._spawn_phase(sources, 1, dtype)
    st = dataclasses.replace(
        st, cell=jnp.clip((st.pos * n).astype(jnp.int32), 0, n - 1))
    tables_dev = {k: jnp.asarray(v) for k, v in tables.items()}
    f = partial(rays._trace_all_phases, geom=geom,
                n_sources=sources.n_sources,
                dust_approximation=dust_approximation,
                max_pixel_level=max_pixel_level, dtype=dtype,
                rates_mode=rates_mode, n_bands=n_bands)
    checked = jax.jit(checkify.checkify(f, errors=ERRORS))
    err, out = checked(fields, st, tables_dev)
    checkify.check_error(err)
    return out


def checked_sweep_chemistry(model, state):
    """One diffuse sweep (lax.scan formulation — the Pallas kernel is not
    checkify-instrumentable) + equilibrium chemistry under checkify.
    Raises on the first NaN/Inf, out-of-bounds index, or bad division."""
    cfg = model.config

    def run(state):
        if cfg.run_uvb_transfer:
            kappa = opacity.compute_opacities(
                state.HI, state.HeI, state.HeII, model.opacity_coef)
            j = sweep.diffuse_sweep(
                kappa, model.sweep_plan,
                jnp.asarray(model.uvb, kappa.dtype), model.geom.cell_size)
            state = dataclasses.replace(state, Jmean=j)
        return chemistry.solve_rate_equations(
            state, model.geom, model.dev_tables,
            ksi_matrix=model.ksi_matrix, gamma_thin=model.gamma_thin,
            self_shielding_threshold=cfg.self_shielding_threshold,
            run_uvb_transfer=cfg.run_uvb_transfer,
            n_iter=110 if state.rho.dtype == jnp.float64 else 60)

    checked = jax.jit(checkify.checkify(run, errors=ERRORS))
    err, out = checked(state)
    checkify.check_error(err)
    return out


def preflight(model, state, stellar_ctx=None, max_pixel_level: int = 3):
    """Run the checked sweep+chemistry (and trace, when sources are
    present) once on the ACTUAL ingested data — the sanitizer analog of
    the reference's startup-time asserts.  Returns normally or raises
    with the first violated invariant."""
    checked_sweep_chemistry(model, state)
    if stellar_ctx is not None:
        checked_trace(state, model.geom, stellar_ctx.sources,
                      stellar_ctx.tables,
                      dust_approximation=stellar_ctx.dust_approximation,
                      max_pixel_level=min(max_pixel_level,
                                          stellar_ctx.max_pixel_level),
                      dtype=state.rho.dtype)
