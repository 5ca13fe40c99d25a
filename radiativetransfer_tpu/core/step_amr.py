"""Full transport + chemistry iteration on a two-level AMR grid.

The AMR analog of core.step: zero rates -> point-source trace (rays_amr) ->
opacities + two-level sweep (sweep_amr) -> per-level equilibrium chemistry
-> restriction sync (the reference's recursive per-leaf updates walk the
octree; here each level is one dense elementwise pass).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import amr, chemistry, opacity, rays_amr, sweep_amr
from .state import GridGeometry


@dataclasses.dataclass
class AMRModel:
    """Two-level model wrapper around an RTModel's tables/config."""
    rt: "object"                      # core.step.RTModel
    plan: sweep_amr.AMRSweepPlan | None

    @classmethod
    def setup(cls, rt_model) -> "AMRModel":
        plan = None
        if rt_model.config.run_uvb_transfer:
            plan = sweep_amr.build_amr_sweep_plan(
                rt_model.config.n_angular_level, rt_model.geom.nx)
        return cls(rt=rt_model, plan=plan)

    @property
    def fine_geom(self) -> GridGeometry:
        g = self.rt.geom
        return GridGeometry(2 * g.nx, 2 * g.ny, 2 * g.nz, g.physical_box_size)

    def step(self, state: amr.AMRState, stellar=None, mesh=None):
        """One iteration; returns (state, diag_or_None).

        With `mesh` the point-source phase runs source-parallel
        (parallel.rays_dist.trace_point_sources_amr_dist) and the sweep +
        chemistry partition under GSPMD from the sharded state."""
        rt = self.rt
        cfg = rt.config
        base = state.base.zero_rates()
        fine = state.fine.zero_rates()
        state = dataclasses.replace(state, base=base, fine=fine)
        diag = None

        if cfg.run_stellar_transfer and stellar is not None:
            # fine deposits were built with base-volume-scaled tables; fine
            # cells have 1/8 the volume (scaling applied in _traced)
            state, diag = self._traced(state, stellar, mesh)

        return self._sweep_and_chemistry(state), diag

    def _sweep_and_chemistry(self, state: amr.AMRState) -> amr.AMRState:
        rt = self.rt
        cfg = rt.config
        if cfg.run_uvb_transfer:
            kc = opacity.compute_opacities(state.base.HI, state.base.HeI,
                                           state.base.HeII, rt.opacity_coef)
            kf = opacity.compute_opacities(state.fine.HI, state.fine.HeI,
                                           state.fine.HeII, rt.opacity_coef)
            jc, jf = sweep_amr.diffuse_sweep_amr(
                kc, kf, state.refined, self.plan,
                jnp.asarray(rt.uvb, kc.dtype), rt.geom.cell_size)
            state = dataclasses.replace(
                state,
                base=dataclasses.replace(state.base, Jmean=jc),
                fine=dataclasses.replace(state.fine, Jmean=jf))

        kwargs = dict(
            ksi_matrix=rt.ksi_matrix, gamma_thin=rt.gamma_thin,
            self_shielding_threshold=cfg.self_shielding_threshold,
            run_uvb_transfer=cfg.run_uvb_transfer,
            n_iter=110 if state.base.rho.dtype == jnp.float64 else 60)
        new_base = chemistry.solve_rate_equations(state.base, rt.geom,
                                                  rt.dev_tables, **kwargs)
        new_fine = chemistry.solve_rate_equations(state.fine, self.fine_geom,
                                                  rt.dev_tables, **kwargs)
        state = dataclasses.replace(state, base=new_base, fine=new_fine)
        return amr.sync_restriction(state)

    def make_step(self, stellar=None, mesh=None):
        """jit-compiled AMR iteration.  The tracer keeps its own compiled
        cache; the sweep + chemistry + restriction tail is jitted here
        (GSPMD-partitioned when the state is sharded via
        parallel.mesh.shard_amr_state)."""
        if stellar is None:
            return jax.jit(lambda s: self.step(s)[0])
        rest = jax.jit(self._sweep_and_chemistry)

        def step(state: amr.AMRState):
            state = dataclasses.replace(
                state, base=state.base.zero_rates(),
                fine=state.fine.zero_rates())
            # tracer (outside jit: its phase loop has its own cache)
            s2, diag = self._traced(state, stellar, mesh)
            return rest(s2), diag

        return step

    def _traced(self, state: amr.AMRState, stellar, mesh):
        """The point-source phase of step(), without sweep/chemistry."""
        rt = self.rt
        if mesh is not None and rt.config.tracer_strategy == "domain":
            if "quad_A" not in stellar.tables:
                raise ValueError(
                    "tracer_strategy='domain' requires quadrature tables "
                    "(quad_A/quad_W); table-mode SED tables only support "
                    "the source-parallel tracer")
            from ..parallel import rays_domain
            rfb, rff, diag = rays_domain.trace_point_sources_domain_amr(
                state, rt.geom, stellar.sources, stellar.tables, mesh,
                dust_approximation=stellar.dust_approximation,
                max_pixel_level=stellar.max_pixel_level,
                dtype=state.base.rho.dtype)
        elif mesh is not None:
            from ..parallel import rays_dist
            rfb, rff, diag = rays_dist.trace_point_sources_amr_dist(
                state, rt.geom, stellar.sources, stellar.tables, mesh,
                dust_approximation=stellar.dust_approximation,
                max_pixel_level=stellar.max_pixel_level,
                dtype=state.base.rho.dtype)
        else:
            rfb, rff, diag = rays_amr.trace_point_sources_amr(
                state, rt.geom, stellar.sources, stellar.tables,
                dust_approximation=stellar.dust_approximation,
                max_pixel_level=stellar.max_pixel_level,
                dtype=state.base.rho.dtype)
        bs, fs = state.base.shape, state.fine.shape
        state = dataclasses.replace(
            state,
            base=dataclasses.replace(
                state.base,
                krate24=rfb.krate24.reshape(bs),
                krate25=rfb.krate25.reshape(bs),
                krate26=rfb.krate26.reshape(bs),
                crate24=rfb.crate24.reshape(bs),
                crate25=rfb.crate25.reshape(bs),
                crate26=rfb.crate26.reshape(bs)),
            fine=dataclasses.replace(
                state.fine,
                krate24=rff.krate24.reshape(fs) * 8.0,
                krate25=rff.krate25.reshape(fs) * 8.0,
                krate26=rff.krate26.reshape(fs) * 8.0,
                crate24=rff.crate24.reshape(fs) * 8.0,
                crate25=rff.crate25.reshape(fs) * 8.0,
                crate26=rff.crate26.reshape(fs) * 8.0))
        return state, diag

    def neutral_fraction(self, state: amr.AMRState) -> float:
        """Leaf-volume-weighted neutral hydrogen fraction."""
        r = state.refined
        rf = amr.prolong_mask(r)
        hi = (jnp.sum(jnp.where(r, 0.0, state.base.HI))
              + jnp.sum(jnp.where(rf, state.fine.HI, 0.0)) / 8.0)
        nh = (jnp.sum(jnp.where(r, 0.0, state.base.nh))
              + jnp.sum(jnp.where(rf, state.fine.nh, 0.0)) / 8.0)
        return float(hi / nh)


@dataclasses.dataclass
class MultiLevelModel:
    """L-level model wrapper around an RTModel's tables/config.

    Generalizes AMRModel to arbitrary nesting depth using the multilevel
    sweep/tracer (core.sweep_multilevel, core.rays_multilevel).  With a
    device mesh the point-source phase runs source-parallel
    (parallel.rays_dist.trace_point_sources_ml_dist) and the sweep +
    chemistry tail partitions under GSPMD from the sharded state
    (parallel.mesh.shard_multilevel_state).
    """
    rt: "object"                      # core.step.RTModel
    n_levels: int
    plan: "object"                    # sweep_multilevel.MLSweepPlan | None
    # Gauss-Seidel cross-level coupling passes per slab; 4 covers the
    # chain depth of typical clustered refinement, validate_coupling_depth
    # checks/selects it for the actual ingested grid (VERDICT r3 weak-5)
    n_coupling_iters: int = 4

    @classmethod
    def setup(cls, rt_model, n_levels: int) -> "MultiLevelModel":
        from . import sweep_multilevel
        plan = None
        if rt_model.config.run_uvb_transfer:
            plan = sweep_multilevel.build_ml_sweep_plan(
                rt_model.config.n_angular_level, rt_model.geom.nx, n_levels)
        return cls(rt=rt_model, n_levels=n_levels, plan=plan)

    def validate_coupling_depth(self, state, tol: float = 1e-8,
                                max_iters: int = 6) -> int:
        """Select the smallest converged coupling depth for the INGESTED
        grid and adopt it (sweep_multilevel.pick_coupling_iters; the
        reference's recursive transport resolves coupling exactly by
        construction, /root/reference/transportRoutinesModule.f90:560-963
        — the fixed-depth Gauss-Seidel must be validated per refinement
        pattern).  Runs on a 12-direction level-1 plan: the in-slab
        coupling chain depth is set by the refinement geometry, not the
        direction count."""
        from . import sweep_multilevel
        plan1 = sweep_multilevel.build_ml_sweep_plan(
            1, self.rt.geom.nx, self.n_levels)
        kappas = [opacity.compute_opacities(lv.HI, lv.HeI, lv.HeII,
                                            self.rt.opacity_coef)
                  for lv in state.levels]
        it = sweep_multilevel.pick_coupling_iters(
            kappas, list(state.refined), plan1,
            jnp.asarray(self.rt.uvb, kappas[0].dtype),
            self.rt.geom.cell_size, tol=tol, max_iters=max_iters)
        self.n_coupling_iters = it
        return it

    def level_geom(self, ell: int) -> GridGeometry:
        g = self.rt.geom
        m = 2 ** ell
        return GridGeometry(m * g.nx, m * g.ny, m * g.nz,
                            g.physical_box_size)

    def step(self, state: amr.MultiLevelState, stellar=None, mesh=None):
        """One full iteration; returns (state, diag_or_None)."""
        cfg = self.rt.config
        state = amr.MultiLevelState(
            levels=tuple(lv.zero_rates() for lv in state.levels),
            refined=state.refined)
        diag = None
        if cfg.run_stellar_transfer and stellar is not None:
            state, diag = self._traced(state, stellar, mesh)
        return self._sweep_and_chemistry(state), diag

    def _traced(self, state: amr.MultiLevelState, stellar, mesh=None):
        rt = self.rt
        if mesh is not None and rt.config.tracer_strategy == "domain":
            # deep-grid member of the fields-stay-sharded family
            # (VERDICT r4 weak-7): level fields sharded, rays migrate
            if "quad_A" not in stellar.tables:
                raise ValueError(
                    "tracer_strategy='domain' requires quadrature tables "
                    "(quad_A/quad_W)")
            from ..parallel import rays_domain
            rfs, diag = rays_domain.trace_point_sources_domain_ml(
                state, rt.geom, stellar.sources, stellar.tables, mesh,
                dust_approximation=stellar.dust_approximation,
                max_pixel_level=stellar.max_pixel_level,
                dtype=state.levels[0].rho.dtype)
        elif mesh is not None:
            from ..parallel import rays_dist
            rfs, diag = rays_dist.trace_point_sources_ml_dist(
                state, rt.geom, stellar.sources, stellar.tables, mesh,
                dust_approximation=stellar.dust_approximation,
                max_pixel_level=stellar.max_pixel_level,
                dtype=state.levels[0].rho.dtype)
        else:
            from . import rays_multilevel
            rfs, diag = rays_multilevel.trace_point_sources_ml(
                state, rt.geom, stellar.sources, stellar.tables,
                dust_approximation=stellar.dust_approximation,
                max_pixel_level=stellar.max_pixel_level,
                dtype=state.levels[0].rho.dtype)
        new_levels = []
        for ell, (lv, rf) in enumerate(zip(state.levels, rfs)):
            # quad_W carries 1/base-cell-volume: level-l cells have 8^-l
            # the volume, so volumetric rates scale by 8^l (cf. AMRModel)
            s = 8.0 ** ell
            shp = lv.shape
            new_levels.append(dataclasses.replace(
                lv,
                krate24=rf.krate24.reshape(shp) * s,
                krate25=rf.krate25.reshape(shp) * s,
                krate26=rf.krate26.reshape(shp) * s,
                crate24=rf.crate24.reshape(shp) * s,
                crate25=rf.crate25.reshape(shp) * s,
                crate26=rf.crate26.reshape(shp) * s))
        return amr.MultiLevelState(levels=tuple(new_levels),
                                   refined=state.refined), diag

    def _sweep_and_chemistry(self, state: amr.MultiLevelState):
        from . import sweep_multilevel
        rt = self.rt
        cfg = rt.config
        if cfg.run_uvb_transfer:
            kappas = [opacity.compute_opacities(lv.HI, lv.HeI, lv.HeII,
                                                rt.opacity_coef)
                      for lv in state.levels]
            js = sweep_multilevel.diffuse_sweep_multilevel(
                kappas, list(state.refined), self.plan,
                jnp.asarray(rt.uvb, kappas[0].dtype), rt.geom.cell_size,
                n_coupling_iters=self.n_coupling_iters)
            state = amr.MultiLevelState(
                levels=tuple(dataclasses.replace(lv, Jmean=j)
                             for lv, j in zip(state.levels, js)),
                refined=state.refined)

        kwargs = dict(
            ksi_matrix=rt.ksi_matrix, gamma_thin=rt.gamma_thin,
            self_shielding_threshold=cfg.self_shielding_threshold,
            run_uvb_transfer=cfg.run_uvb_transfer,
            n_iter=110 if state.levels[0].rho.dtype == jnp.float64 else 60)
        new_levels = tuple(
            chemistry.solve_rate_equations(lv, self.level_geom(ell),
                                           rt.dev_tables, **kwargs)
            for ell, lv in enumerate(state.levels))
        state = amr.MultiLevelState(levels=new_levels, refined=state.refined)
        return amr.sync_restriction_multi(state)

    def make_step(self, stellar=None, mesh=None):
        """Compiled L-level iteration (tracer keeps its own cache).  With
        a mesh the tracer is source-parallel and the tail partitions under
        GSPMD from the sharded state."""
        if stellar is None:
            return jax.jit(lambda s: self.step(s, mesh=mesh)[0])
        rest = jax.jit(self._sweep_and_chemistry)

        def step(state):
            state = amr.MultiLevelState(
                levels=tuple(lv.zero_rates() for lv in state.levels),
                refined=state.refined)
            s2, diag = self._traced(state, stellar, mesh)
            return rest(s2), diag

        return step

    def neutral_fraction(self, state: amr.MultiLevelState) -> float:
        leafs = state.leaf_masks()
        hi = sum(float(jnp.sum(jnp.where(m, lv.HI, 0.0))) * 8.0 ** -ell
                 for ell, (lv, m) in enumerate(zip(state.levels, leafs)))
        nh = sum(float(jnp.sum(jnp.where(m, lv.nh, 0.0))) * 8.0 ** -ell
                 for ell, (lv, m) in enumerate(zip(state.levels, leafs)))
        return hi / nh

    def make_noneq_step(self, dt: float, stellar=None, noneq_tables=None,
                        n_substeps: int = 200, evolve_energy: bool = False,
                        mesh=None):
        """Transport + non-equilibrium 9-species chemistry on an L-level
        nested grid (lifts the round-2 uniform-only restriction,
        cli.py:303-304; the reference's network tables are global,
        /root/reference/coll_rates.f:3-234, so nothing in the physics is
        level-specific — each level evolves elementwise with its own photo
        rates, then species restrict onto refined parents).

        Returns step(state, species_list) ->
        (state, species_list[, diag]); species_list holds one
        chemistry_noneq.SpeciesState per level
        (chemistry_noneq.species_from_field_state on each level).

        With `mesh` the point-source phase runs source-parallel
        (parallel.rays_dist.trace_point_sources_ml_dist with
        quadrature_noneq deposits) and the sweep + per-level network
        integration partition under GSPMD from the sharded state/species
        (parallel.mesh.shard_multilevel_state / per-level shard_species) —
        VERDICT r3 item 4c."""
        from . import chemistry_noneq as cn
        from . import rays_multilevel, sweep_multilevel
        rt = self.rt
        cfg = rt.config
        dtype = (jnp.float64 if jax.config.jax_enable_x64
                 else jnp.float32)
        if noneq_tables is None:
            noneq_tables = cn.NoneqTablesDevice.from_tables(rt.tables, dtype)
        L = self.n_levels

        def sweep_and_evolve(state, species_list, rfs):
            if cfg.run_uvb_transfer:
                kappas = [opacity.compute_opacities(
                    lv.HI, lv.HeI, lv.HeII, rt.opacity_coef)
                    for lv in state.levels]
                js = sweep_multilevel.diffuse_sweep_multilevel(
                    kappas, list(state.refined), self.plan,
                    jnp.asarray(rt.uvb, kappas[0].dtype), rt.geom.cell_size,
                    n_coupling_iters=self.n_coupling_iters)
                state = amr.MultiLevelState(
                    levels=tuple(dataclasses.replace(lv, Jmean=j)
                                 for lv, j in zip(state.levels, js)),
                    refined=state.refined)
            new_levels, new_species = [], []
            for ell, (lv, spc) in enumerate(zip(state.levels, species_list)):
                rf_l = None
                if rfs is not None:
                    # secondary channels are per-particle rates built with
                    # the base cell volume folded into quad_W27: level-l
                    # cells have 8^-l the volume (cf. _traced)
                    s = 8.0 ** ell
                    shp = lv.shape
                    rf_l = rays_multilevel.NoneqRateFields(*(
                        jnp.asarray(getattr(rfs[ell], f.name)).reshape(shp)
                        * s
                        for f in dataclasses.fields(rfs[ell])))
                photo = rt._assemble_photo_rates(lv, rf_l)
                spc = cn.evolve_noneq(
                    spc, dt, noneq_tables, photo=photo,
                    n_substeps=n_substeps, evolve_energy=evolve_energy,
                    tgas_fixed=None if evolve_energy else lv.tgas,
                    current_redshift=cfg.current_redshift)
                lv = dataclasses.replace(
                    lv, HI=spc.HI.astype(lv.HI.dtype),
                    HeI=spc.HeI.astype(lv.HI.dtype),
                    HeII=spc.HeII.astype(lv.HI.dtype),
                    tgas=(spc.tgas.astype(lv.tgas.dtype)
                          if evolve_energy else lv.tgas))
                new_levels.append(lv)
                new_species.append(spc)
            state = amr.sync_restriction_multi(amr.MultiLevelState(
                levels=tuple(new_levels), refined=state.refined))
            # species restriction: refined parents hold the child average
            for ell in range(L - 2, -1, -1):
                r = state.refined[ell]
                new_species[ell] = jax.tree_util.tree_map(
                    lambda b, f, r=r: jnp.where(r, amr.restrict(f), b),
                    new_species[ell], new_species[ell + 1])
            return state, tuple(new_species)

        if stellar is None:
            def zero(state):
                return amr.MultiLevelState(
                    levels=tuple(lv.zero_rates() for lv in state.levels),
                    refined=state.refined)
            return jax.jit(lambda state, species: sweep_and_evolve(
                zero(state), species, None))
        rest = jax.jit(sweep_and_evolve)

        def step(state, species_list):
            state = amr.MultiLevelState(
                levels=tuple(lv.zero_rates() for lv in state.levels),
                refined=state.refined)
            if mesh is not None:
                from ..parallel import rays_dist
                rfs, diag = rays_dist.trace_point_sources_ml_dist(
                    state, rt.geom, stellar.sources, stellar.tables, mesh,
                    dust_approximation=stellar.dust_approximation,
                    max_pixel_level=stellar.max_pixel_level,
                    dtype=state.levels[0].rho.dtype,
                    rates_mode="quadrature_noneq")
            else:
                rfs, diag = rays_multilevel.trace_point_sources_ml(
                    state, rt.geom, stellar.sources, stellar.tables,
                    dust_approximation=stellar.dust_approximation,
                    max_pixel_level=stellar.max_pixel_level,
                    dtype=state.levels[0].rho.dtype,
                    rates_mode="quadrature_noneq")
            new_levels = []
            names = ("krate24", "krate25", "krate26",
                     "crate24", "crate25", "crate26")
            for ell, (lv, rf) in enumerate(zip(state.levels, rfs)):
                s = 8.0 ** ell
                shp = lv.shape
                new_levels.append(dataclasses.replace(
                    lv, **{nm: getattr(rf, nm).reshape(shp) * s
                           for nm in names}))
            state = amr.MultiLevelState(levels=tuple(new_levels),
                                        refined=state.refined)
            state, species_list = rest(state, species_list, rfs)
            return state, species_list, diag

        return step


@dataclasses.dataclass
class SparseMLModel:
    """L-level model on block-sparse storage (core.amr_sparse).

    Same iteration as MultiLevelModel — zero rates -> sparse tracer ->
    opacities + block-sparse sweep -> per-level chemistry -> restriction
    sync — but refined-level memory is proportional to leaves, so deep
    production grids (128^3 base + 3 refined levels) fit one chip's HBM,
    matching the reference octree's per-leaf memory
    (/root/reference/definitionsModule.f90:163-180).  Parity with
    MultiLevelModel on toy grids is exact (tests/test_amr_sparse.py).
    """
    rt: "object"
    n_levels: int
    plan: "object"
    n_coupling_iters: int = 4
    # sweep direction-chunk width: bounds the Gauss-Seidel estimate
    # planes' footprint at the finest cross-section (the deep-grid memory
    # driver); smaller = less HBM per launch, more launches
    max_dirs_per_launch: int = 4
    # per-chunk eager dispatch (set by make_step(split_compile=True)):
    # bounds each device dispatch below the remote worker's RPC deadline
    _eager_zones: bool = False
    # device mesh (set by make_step(mesh=...)): the sweep runs
    # angle-decomposed (zones) over the devices and the tracer
    # source-parallel — the distribution the deep-AMR production regime
    # needs (BASELINE.md r4: ~11 s/direction x 192 directions single-chip;
    # VERDICT r4 item 1)
    mesh: "object" = None
    # cached static refinement window for the windowed sparse sweep
    # (sweep_sparse.compute_window) + the refined0 digest it was computed
    # from; resolved from the CONCRETE state before jit tracing
    _window: "object" = "unset"
    _window_key: "object" = None
    # disable the windowed sweep (A/B + fallback knob; CLI --sweep-window)
    window_enabled: bool = True

    def _ensure_window(self, state):
        """Compute/cache the sweep's static refinement window from a
        CONCRETE state (host-side; the window is a trace-time static, so
        it must be resolved before the jitted step traces).  Re-resolves
        if the refinement bitmap changed (a different state through the
        same model)."""
        import hashlib

        from . import sweep_sparse
        if not self.window_enabled:
            self._window = None
            self._window_key = "disabled"
            return None
        r0 = np.asarray(jax.device_get(state.refined0))
        key = hashlib.sha1(np.packbits(r0.astype(np.uint8))).digest()
        if self._window == "unset" or key != self._window_key:
            self._window = sweep_sparse.compute_window(state)
            self._window_key = key
        return self._window

    @classmethod
    def setup(cls, rt_model, n_levels: int) -> "SparseMLModel":
        from . import sweep_multilevel
        plan = None
        if rt_model.config.run_uvb_transfer:
            plan = sweep_multilevel.build_ml_sweep_plan(
                rt_model.config.n_angular_level, rt_model.geom.nx, n_levels)
        return cls(rt=rt_model, n_levels=n_levels, plan=plan)

    def level_geom(self, ell: int) -> GridGeometry:
        g = self.rt.geom
        m = 2 ** ell
        return GridGeometry(m * g.nx, m * g.ny, m * g.nz,
                            g.physical_box_size)

    def step(self, state, stellar=None):
        from . import amr_sparse
        cfg = self.rt.config
        state = dataclasses.replace(
            state, base=state.base.zero_rates(),
            levels=tuple(dataclasses.replace(lv, fields=lv.fields.zero_rates())
                         for lv in state.levels))
        diag = None
        if cfg.run_stellar_transfer and stellar is not None:
            state, diag = self._traced(state, stellar)
        return self._sweep_and_chemistry(state), diag

    def _traced(self, state, stellar):
        rt = self.rt
        if self.mesh is not None:
            from ..parallel import rays_dist
            rfs, diag = rays_dist.trace_point_sources_sparse_dist(
                state, rt.geom, stellar.sources, stellar.tables, self.mesh,
                dust_approximation=stellar.dust_approximation,
                max_pixel_level=stellar.max_pixel_level,
                dtype=state.base.rho.dtype,
                host_phases=self._eager_zones)
        else:
            from . import rays_multilevel
            rfs, diag = rays_multilevel.trace_point_sources_sparse(
                state, rt.geom, stellar.sources, stellar.tables,
                dust_approximation=stellar.dust_approximation,
                max_pixel_level=stellar.max_pixel_level,
                dtype=state.base.rho.dtype,
                host_phases=self._eager_zones)
        names = ("krate24", "krate25", "krate26",
                 "crate24", "crate25", "crate26")
        base = dataclasses.replace(state.base, **{
            nm: getattr(rfs[0], nm).reshape(state.base.shape)
            for nm in names})
        levels = []
        for ell in range(1, self.n_levels):
            lv = state.levels[ell - 1]
            s = 8.0 ** ell        # per-leaf volume scaling (cf. MultiLevelModel)
            shp = lv.cover.shape
            levels.append(dataclasses.replace(lv, fields=dataclasses.replace(
                lv.fields, **{nm: getattr(rfs[ell], nm).reshape(shp) * s
                              for nm in names})))
        return dataclasses.replace(state, base=base,
                                   levels=tuple(levels)), diag

    def _apply_sweep(self, state):
        from . import sweep_sparse
        rt = self.rt
        k0 = opacity.compute_opacities(state.base.HI, state.base.HeI,
                                       state.base.HeII, rt.opacity_coef)
        lv_k = [opacity.compute_opacities(
            lv.fields.HI, lv.fields.HeI, lv.fields.HeII, rt.opacity_coef)
            for lv in state.levels]
        win = self._window if self._window != "unset" else "auto"
        if self.mesh is not None:
            from ..parallel import sweep_dist
            j0, jbs = sweep_dist.diffuse_sweep_sparse_zones(
                k0, lv_k, state, self.plan, jnp.asarray(rt.uvb, k0.dtype),
                rt.geom.cell_size, self.mesh,
                n_coupling_iters=self.n_coupling_iters,
                max_dirs_per_launch=self.max_dirs_per_launch,
                eager_rounds=self._eager_zones, window=win)
        else:
            j0, jbs = sweep_sparse.diffuse_sweep_sparse(
                k0, lv_k, state, self.plan, jnp.asarray(rt.uvb, k0.dtype),
                rt.geom.cell_size, n_coupling_iters=self.n_coupling_iters,
                max_dirs_per_launch=self.max_dirs_per_launch,
                eager_zones=self._eager_zones, window=win)
        return dataclasses.replace(
            state,
            base=dataclasses.replace(state.base, Jmean=j0),
            levels=tuple(
                dataclasses.replace(lv, fields=dataclasses.replace(
                    lv.fields, Jmean=j))
                for lv, j in zip(state.levels, jbs)))

    def _sweep_and_chemistry(self, state):
        if self.rt.config.run_uvb_transfer:
            state = self._apply_sweep(state)
        return self._chemistry_and_sync(state)

    def _chemistry_and_sync(self, state):
        rt = self.rt
        cfg = rt.config
        kwargs = dict(
            ksi_matrix=rt.ksi_matrix, gamma_thin=rt.gamma_thin,
            self_shielding_threshold=cfg.self_shielding_threshold,
            run_uvb_transfer=cfg.run_uvb_transfer,
            n_iter=110 if state.base.rho.dtype == jnp.float64 else 60)
        base = chemistry.solve_rate_equations(state.base, self.rt.geom,
                                              rt.dev_tables, **kwargs)
        levels = []
        for ell in range(1, self.n_levels):
            lv = state.levels[ell - 1]
            f = chemistry.solve_rate_equations(lv.fields,
                                               self.level_geom(ell),
                                               rt.dev_tables, **kwargs)
            # re-zero ALL padding blocks (origin out of range): chemistry
            # on their zero fields is garbage; the standard final pad is
            # gathered for absent tiles, and mesh-divisibility padding
            # (amr_sparse.pad_blocks_to_multiple) adds more
            n_l = self.rt.geom.nx * 2 ** ell
            pad = lv.origin[:, 0] >= n_l              # (nb,)

            def zero_pads(x, pad=pad):
                if not hasattr(x, "ndim") or x.ndim < 4:
                    return x
                m = pad.reshape((1,) * (x.ndim - 4) + (-1, 1, 1, 1))
                return jnp.where(m, 0.0, x)
            f = jax.tree_util.tree_map(zero_pads, f)
            levels.append(dataclasses.replace(lv, fields=f))
        state = dataclasses.replace(state, base=base, levels=tuple(levels))
        from .amr_sparse import sync_restriction_sparse
        return sync_restriction_sparse(state)

    def make_step(self, stellar=None, split_compile=False, mesh=None):
        """Compiled block-sparse L-level iteration (tracer keeps its own
        cache).

        split_compile=True compiles the sweep's zone-group scans
        individually (eager dispatch between them) and the chemistry +
        restriction tail as one jit — the monolithic whole-step XLA
        program at the largest deep-AMR configs exceeds what the remote
        TPU worker tolerates, while the per-piece compiles are fine.

        mesh: distribute the iteration — the sweep runs angle-decomposed
        over the devices (parallel.sweep_dist.diffuse_sweep_sparse_zones,
        one accumulator psum per sweep) and the point-source phase runs
        source-parallel (parallel.rays_dist.trace_point_sources_sparse_
        dist); the state stays replicated (O(leaves) is small) and the
        chemistry tail computes replicated.  Composes with split_compile:
        each distributed dispatch is then one round / one tracer chunk."""
        self._eager_zones = split_compile
        self.mesh = mesh
        if split_compile:
            import time as _time
            zero = lambda s: dataclasses.replace(
                s, base=s.base.zero_rates(),
                levels=tuple(
                    dataclasses.replace(lv, fields=lv.fields.zero_rates())
                    for lv in s.levels))
            chem = jax.jit(self._chemistry_and_sync)

            def sync(x):
                # one phase in flight at a time: queueing several long
                # executions kills the remote TPU worker, and
                # block_until_ready does not block through the axon relay
                # — only a data-dependent scalar fetch does
                float(jnp.max(x.reshape(-1)[:8]))

            def step_split(state):
                # per-phase wall times land in self.last_phase_times (the
                # production breakdown BASELINE.md publishes; each phase
                # ends with a data-dependent sync so the times are real)
                self._ensure_window(state)
                times = {}
                t0 = _time.time()
                state = zero(state)
                diag = None
                if stellar is not None:
                    state, diag = self._traced(state, stellar)
                    sync(state.base.krate24)
                    from . import rays_multilevel
                    times["tracer"] = _time.time() - t0
                    times["tracer_phases"] = dict(
                        rays_multilevel.LAST_TRACE_PHASE_TIMES)
                    t0 = _time.time()
                if self.rt.config.run_uvb_transfer:
                    state = self._apply_sweep(state)   # eager: per-group
                    sync(state.base.Jmean)
                    times["sweep"] = _time.time() - t0
                    t0 = _time.time()
                state = chem(state)
                sync(state.base.HI)
                times["chemistry_sync"] = _time.time() - t0
                self.last_phase_times = times
                return (state, diag) if stellar is not None else state

            return step_split
        if stellar is None:
            jitted = jax.jit(lambda s: self.step(s)[0])

            def run(state):
                # resolve the static sweep window from the concrete state
                # before the jitted step traces
                self._ensure_window(state)
                return jitted(state)

            return run
        rest = jax.jit(self._sweep_and_chemistry)

        def step(state):
            self._ensure_window(state)
            state = dataclasses.replace(
                state, base=state.base.zero_rates(),
                levels=tuple(
                    dataclasses.replace(lv, fields=lv.fields.zero_rates())
                    for lv in state.levels))
            s2, diag = self._traced(state, stellar)
            return rest(s2), diag

        return step

    def validate_coupling_depth(self, state, tol: float = 1e-8,
                                max_iters: int = 6,
                                eager: bool = False) -> int:
        """Sparse analog of MultiLevelModel.validate_coupling_depth:
        smallest depth whose one-more-pass leaf Jmean residual is below
        tol, measured with the block-sparse sweep itself on a
        12-direction plan; adopts the result.

        eager=True dispatches per direction chunk (bounded dispatches for
        the remote worker — pass it at production scale, where a
        12-direction validation sweep is itself a minutes-long dispatch).
        At production this knob pays directly: every pass below the
        legacy depth 4 is ~25% of the deep sweep's cost back
        (BASELINE.md r4 attribution)."""
        from . import sweep_multilevel, sweep_sparse
        rt = self.rt
        plan1 = sweep_multilevel.build_ml_sweep_plan(
            1, rt.geom.nx, self.n_levels)
        k0 = opacity.compute_opacities(state.base.HI, state.base.HeI,
                                       state.base.HeII, rt.opacity_coef)
        lv_k = [opacity.compute_opacities(
            lv.fields.HI, lv.fields.HeI, lv.fields.HeII, rt.opacity_coef)
            for lv in state.levels]
        uvb = jnp.asarray(rt.uvb, k0.dtype)

        def leaf_max_diff(a, b):
            res = 0.0
            j0a, jba = a
            j0b, jbb = b
            scale = max(float(jnp.max(jnp.abs(j0a))), 1e-300)
            leaf0 = ~state.refined0
            res = float(jnp.max(jnp.where(leaf0[None],
                                          jnp.abs(j0a - j0b), 0.0))) / scale
            for ell in range(1, self.n_levels):
                lv = state.levels[ell - 1]
                leaf = lv.cover & ~lv.refined
                d = float(jnp.max(jnp.where(
                    leaf[None], jnp.abs(jba[ell - 1] - jbb[ell - 1]),
                    0.0)))
                s2 = max(float(jnp.max(jnp.abs(jba[ell - 1]))), scale)
                res = max(res, d / s2)
            return res

        win = self._ensure_window(state)
        prev = sweep_sparse.diffuse_sweep_sparse(
            k0, lv_k, state, plan1, uvb, rt.geom.cell_size,
            n_coupling_iters=1, eager_zones=eager,
            max_dirs_per_launch=self.max_dirs_per_launch, window=win)
        for iters in range(1, max_iters + 1):
            nxt = sweep_sparse.diffuse_sweep_sparse(
                k0, lv_k, state, plan1, uvb, rt.geom.cell_size,
                n_coupling_iters=iters + 1, eager_zones=eager,
                max_dirs_per_launch=self.max_dirs_per_launch, window=win)
            if leaf_max_diff(prev, nxt) < tol:
                self.n_coupling_iters = iters
                return iters
            prev = nxt
        self.n_coupling_iters = max_iters
        return max_iters

    def neutral_fraction(self, state) -> float:
        hi = float(jnp.sum(jnp.where(state.refined0, 0.0, state.base.HI)))
        nh = float(jnp.sum(jnp.where(state.refined0, 0.0, state.base.nh)))
        for ell in range(1, self.n_levels):
            lv = state.levels[ell - 1]
            leaf = lv.cover & ~lv.refined
            w = 8.0 ** -ell
            hi += float(jnp.sum(jnp.where(leaf, lv.fields.HI, 0.0))) * w
            nh += float(jnp.sum(jnp.where(leaf, lv.fields.nh, 0.0))) * w
        return hi / nh

    def _pad_mask(self, lv, ell: int):
        """(nb,) bool: padding blocks (origin out of range) of level ell."""
        return lv.origin[:, 0] >= self.rt.geom.nx * 2 ** ell

    @staticmethod
    def _zero_pads_tree(tree, pad):
        """Zero padding-block entries of every (.., nb, be, be, be) leaf."""
        def zero(x):
            if not hasattr(x, "ndim") or x.ndim < 4:
                return x
            m = pad.reshape((1,) * (x.ndim - 4) + (-1, 1, 1, 1))
            return jnp.where(m, 0.0, x)
        return jax.tree_util.tree_map(zero, tree)

    def make_noneq_step(self, dt: float, stellar=None, noneq_tables=None,
                        n_substeps: int = 200, evolve_energy: bool = False,
                        split_compile: bool = False, mesh=None):
        """Transport + non-equilibrium 9-species chemistry on BLOCK-SPARSE
        L-level storage (lifts the round-4 hard exit, cli.py:481; VERDICT
        r4 item 3).  The network tail is elementwise
        (/root/reference/coll_rates.f:3-234 — nothing in the physics is
        level-specific), so it maps onto block fields exactly like the
        equilibrium chemistry (_chemistry_and_sync): each level evolves
        with its own photo rates, padding blocks are re-zeroed, then
        fields AND species restrict onto refined parents through the same
        block geometry (amr_sparse.sync_restriction_tree).

        Returns step(state, species_list) ->
        (state, species_list[, diag]); species_list holds one
        chemistry_noneq.SpeciesState per level: index 0 dense (n,n,n),
        refined levels block-shaped (nb, be, be, be)
        (species_from_field_state on base / lv.fields).

        split_compile / mesh compose exactly as in make_step (bounded
        dispatches; zones sweep + source-parallel quadrature_noneq
        tracer)."""
        from . import amr_sparse, chemistry_noneq as cn, rays_multilevel
        rt = self.rt
        cfg = rt.config
        dtype = (jnp.float64 if jax.config.jax_enable_x64
                 else jnp.float32)
        if noneq_tables is None:
            noneq_tables = cn.NoneqTablesDevice.from_tables(rt.tables, dtype)
        L = self.n_levels
        self._eager_zones = split_compile
        self.mesh = mesh
        names6 = ("krate24", "krate25", "krate26",
                  "crate24", "crate25", "crate26")

        def zero(state):
            return dataclasses.replace(
                state, base=state.base.zero_rates(),
                levels=tuple(
                    dataclasses.replace(lv, fields=lv.fields.zero_rates())
                    for lv in state.levels))

        def traced(state):
            if self.mesh is not None:
                from ..parallel import rays_dist
                rfs, diag = rays_dist.trace_point_sources_sparse_dist(
                    state, rt.geom, stellar.sources, stellar.tables,
                    self.mesh,
                    dust_approximation=stellar.dust_approximation,
                    max_pixel_level=stellar.max_pixel_level,
                    dtype=state.base.rho.dtype,
                    rates_mode="quadrature_noneq",
                    host_phases=self._eager_zones)
            else:
                rfs, diag = rays_multilevel.trace_point_sources_sparse(
                    state, rt.geom, stellar.sources, stellar.tables,
                    dust_approximation=stellar.dust_approximation,
                    max_pixel_level=stellar.max_pixel_level,
                    dtype=state.base.rho.dtype,
                    rates_mode="quadrature_noneq",
                    host_phases=self._eager_zones)
            base = dataclasses.replace(state.base, **{
                nm: getattr(rfs[0], nm).reshape(state.base.shape)
                for nm in names6})
            levels = []
            for ell in range(1, L):
                lv = state.levels[ell - 1]
                s = 8.0 ** ell    # per-leaf volume scaling (cf. _traced)
                shp = lv.cover.shape
                levels.append(dataclasses.replace(
                    lv, fields=dataclasses.replace(lv.fields, **{
                        nm: getattr(rfs[ell], nm).reshape(shp) * s
                        for nm in names6})))
            return (dataclasses.replace(state, base=base,
                                        levels=tuple(levels)), rfs, diag)

        def evolve_one(fields, spc, rf_flat, scale, shape, tgas):
            rf_l = None
            if rf_flat is not None:
                rf_l = rays_multilevel.NoneqRateFields(*(
                    jnp.asarray(getattr(rf_flat, f.name)).reshape(shape)
                    * scale
                    for f in dataclasses.fields(rf_flat)))
            photo = rt._assemble_photo_rates(fields, rf_l)
            spc = cn.evolve_noneq(
                spc, dt, noneq_tables, photo=photo, n_substeps=n_substeps,
                evolve_energy=evolve_energy,
                tgas_fixed=None if evolve_energy else tgas,
                current_redshift=cfg.current_redshift)
            fields = dataclasses.replace(
                fields, HI=spc.HI.astype(fields.HI.dtype),
                HeI=spc.HeI.astype(fields.HI.dtype),
                HeII=spc.HeII.astype(fields.HI.dtype),
                tgas=(spc.tgas.astype(fields.tgas.dtype)
                      if evolve_energy else fields.tgas))
            return fields, spc

        def chem_body(state, species_list, rfs):
            base, spc0 = evolve_one(
                state.base, species_list[0],
                rfs[0] if rfs is not None else None, 1.0,
                state.base.shape, state.base.tgas)
            new_species = [spc0]
            levels = []
            for ell in range(1, L):
                lv = state.levels[ell - 1]
                f, spc = evolve_one(
                    lv.fields, species_list[ell],
                    rfs[ell] if rfs is not None else None, 8.0 ** ell,
                    lv.cover.shape, lv.fields.tgas)
                # re-zero ALL padding blocks: the network on their zero
                # fields is garbage (cf. _chemistry_and_sync)
                pad = self._pad_mask(lv, ell)
                f = self._zero_pads_tree(f, pad)
                spc = self._zero_pads_tree(spc, pad)
                levels.append(dataclasses.replace(lv, fields=f))
                new_species.append(spc)
            state = dataclasses.replace(state, base=base,
                                        levels=tuple(levels))
            state = amr_sparse.sync_restriction_sparse(state)
            # species restriction: refined parents hold the child average
            # through the same block geometry
            sp0, sp_lv = amr_sparse.sync_restriction_tree(
                state, new_species[0], tuple(new_species[1:]))
            return state, (sp0,) + tuple(sp_lv)

        if split_compile:
            chem_j = jax.jit(chem_body)

            def sync(x):
                float(jnp.max(x.reshape(-1)[:8]))

            def step_split(state, species_list):
                self._ensure_window(state)
                state = zero(state)
                rfs = diag = None
                if stellar is not None:
                    state, rfs, diag = traced(state)
                    sync(state.base.krate24)
                if cfg.run_uvb_transfer:
                    state = self._apply_sweep(state)   # eager: per-chunk
                state, species_list = chem_j(state, species_list, rfs)
                sync(state.base.HI)
                if stellar is not None:
                    return state, species_list, diag
                return state, species_list

            return step_split

        def sweep_chem(state, species_list, rfs):
            if cfg.run_uvb_transfer:
                state = self._apply_sweep(state)
            return chem_body(state, species_list, rfs)

        if stellar is None:
            jitted = jax.jit(lambda state, species:
                             sweep_chem(zero(state), species, None))

            def run(state, species):
                self._ensure_window(state)
                return jitted(state, species)

            return run
        rest = jax.jit(sweep_chem)

        def step(state, species_list):
            self._ensure_window(state)
            state = zero(state)
            state, rfs, diag = traced(state)
            state, species_list = rest(state, species_list, rfs)
            return state, species_list, diag

        return step
