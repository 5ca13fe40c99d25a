"""Command-line driver: the `program pointTransfer` analog.

Run modes follow the reference (equiSources.f90:65-67, SURVEY.md C19/C21):
  1  point-source transfer + optically-thin UVB
  2  stellar/gas density PDFs (print and exit)
  3  projected metallicity map (write and exit)
  4  cell census (print and exit)
  6  no sources, optically-thin UVB only
  7  clumping factor (print and exit)
  8  point-source + diffuse UVB transfer
  9  diffuse UVB transfer only

Usage:
  python -m radiativetransfer_tpu.cli [inputParameters|config.json] [--iters N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _restore_noneq(container, species, restart_snap, restart_ckpt,
                   snapshot):
    """Restore the noneq restart state: (container, species, itime|None).

    A noneq orbax checkpoint holds the (fields, 9-species) pytree — the
    prognostic state the reference's restart contract requires
    (equiSources.f90:1071-1167) — so both restore together here (the
    generic restart block defers orbax noneq restores to this point).
    npz snapshots restore fields in the generic block; only the species
    arrays are read here.  A restart source without species re-initializes
    them from the (restored) equilibrium fields, with a loud warning."""
    if restart_ckpt is not None:
        from .io import checkpoint as ckpt_mod
        try:
            (cont2, sp2), meta = ckpt_mod.restore_sharded(
                restart_ckpt, (container, species))
            print("restored fields + 9-species noneq state from "
                  f"{restart_ckpt}")
            return cont2, sp2, meta["itime"]
        except Exception:
            # the checkpoint may be a fields-only (equilibrium-run) tree;
            # fall back to restoring just the fields.  Any failure of THAT
            # restore is fatal — the reference treats inconsistent restart
            # data as a hard stop (equiSources.f90:1124-1127), and silently
            # continuing from fresh equilibrium state would mask it
            # (ADVICE r4).
            cont2, meta = ckpt_mod.restore_sharded(restart_ckpt, container)
            print("warning: checkpoint carries no species state; "
                  "H2/H2+/H-/energy re-initialized from equilibrium")
            return cont2, species, meta["itime"]
    if restart_snap is not None:
        sp2 = snapshot.read_species(restart_snap, species)
        if sp2 is not None:
            print("restored 9-species noneq state from snapshot")
            return container, sp2, None
        print("warning: snapshot carries no species state; "
              "H2/H2+/H-/energy re-initialized from equilibrium")
    return container, species, None


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", nargs="?", default="inputParameters")
    ap.add_argument("--iters", type=int, default=-1,
                    help="max iterations; 0 = unbounded (the reference's "
                         "run-until-judged contract, equiSources.f90:1230 — "
                         "the convergence break at |dnf| <= 1e-6 still "
                         "applies); default: config max_iterations, itself "
                         "0 = unbounded")
    ap.add_argument("--platform", default=None,
                    help="jax platform override (cpu / axon / tpu)")
    ap.add_argument("--x64", action="store_true",
                    help="run in float64 (parity mode)")
    ap.add_argument("--snapshot-dir", default=".")
    ap.add_argument("--angular-level", type=int, default=0,
                    help="override nAngularLevel (12*4^(L-1) directions)")
    ap.add_argument("--max-pixel-level", type=int, default=0,
                    help="override the point-source ray-splitting depth")
    ap.add_argument("--debug-nans", action="store_true",
                    help="enable jax debug_nans (SURVEY.md 5.2 rebuild)")
    ap.add_argument("--debug-checkify", action="store_true",
                    help="pre-flight the sweep+chemistry and tracer on the "
                         "ingested data under jax.experimental.checkify "
                         "(gather/scatter bounds + NaN/Inf + division "
                         "checks — the runtime analog of the reference's "
                         "stop-asserts, equiSources.f90:2962-2976); covers "
                         "uniform, two-level AMR, multilevel, and "
                         "block-sparse storage (sparse: slot-map + "
                         "padding-block indexing on a 12-direction plan)")
    ap.add_argument("--dump-rates", action="store_true",
                    help="write rates.out / cool_rates.out like the reference")
    ap.add_argument("--profile", default="",
                    help="write a jax.profiler trace of the iteration loop "
                         "to this directory (SURVEY.md 5.1 rebuild); view "
                         "with tensorboard or xprof")
    ap.add_argument("--sweep-strategy", default="",
                    choices=("", "auto", "pipelined", "zones", "rdma"),
                    help="override cfg.sweep_strategy: auto (GSPMD), or an "
                         "explicit collective schedule on the device mesh "
                         "(pipelined = per-slab ppermute halo lines, zones = "
                         "angle decomposition + psum, rdma = in-kernel "
                         "Pallas remote copies)")
    ap.add_argument("--sweep-logmean", default="",
                    choices=("", "auto", "exact", "clamped"),
                    help="Pallas logmean form: auto (default: clamped in "
                         "f32, exact in f64), exact (reference two-branch), "
                         "or clamped (branch-free, +6.6%% faster sweep; "
                         "production A/B deltas <= 8e-7 on the neutral "
                         "fraction, BASELINE.md r5)")
    ap.add_argument("--tracer-compact", action="store_true",
                    help="single-device tracer: host-driven final-phase "
                         "dead-lane compaction (exact up to deposit order; "
                         "a win on locally-attached TPU, a loss through a "
                         "high-latency tunnel)")
    ap.add_argument("--tracer-strategy", default="",
                    choices=("", "sources", "domain"),
                    help="distributed tracer: sources = shard sources + "
                         "all-gather fields; domain = shard fields + "
                         "migrate rays (grid can exceed one device's HBM; "
                         "uniform, two-level AMR, and L-level multilevel)")
    ap.add_argument("--mesh-shape", default="",
                    help="device mesh for distributed runs, e.g. '8' (1-D) "
                         "or '2,4' (2-D over the last two grid axes); "
                         "overrides cfg.mesh_shape")
    ap.add_argument("--coordinator", default="",
                    help="multi-host: coordinator address host:port for "
                         "jax.distributed.initialize (also honours "
                         "JAX_COORDINATOR_ADDRESS etc.)")
    ap.add_argument("--num-processes", type=int, default=0)
    ap.add_argument("--process-id", type=int, default=-1)
    ap.add_argument("--chemistry", choices=("equilibrium", "noneq"),
                    default="equilibrium",
                    help="chemistry solver: the reference's ionization "
                         "equilibrium (default) or the non-equilibrium "
                         "9-species H/He/H2 network (core.chemistry_noneq) "
                         "advanced by --dt-myr per iteration")
    ap.add_argument("--dt-myr", type=float, default=1.0,
                    help="noneq chemistry timestep per iteration [Myr]")
    ap.add_argument("--evolve-energy", action="store_true",
                    help="noneq mode: evolve the internal energy "
                         "(photoheating vs cooling) instead of fixed T")
    ap.add_argument("--ckpt-format", choices=("npz", "orbax"), default="npz",
                    help="snapshot format: portable cellArray .npz (default) "
                         "or orbax sharded checkpoint directories "
                         "(io.checkpoint, the multi-host path)")
    ap.add_argument("--amr-depth", type=int, default=4,
                    help="max AMR levels kept from the input grid "
                         "(deeper input levels average onto the deepest "
                         "kept one); 2 forces the sharded two-level path")
    ap.add_argument("--amr-storage", choices=("auto", "dense", "sparse"),
                    default="auto",
                    help="nested-grid storage: dense per-level volumes, "
                         "block-sparse O(leaves) storage (core.amr_sparse; "
                         "required for production deep grids that exceed "
                         "HBM densely), or auto (sparse when the dense "
                         "footprint would exceed ~4 GB)")
    ap.add_argument("--block-edge", type=int, default=8,
                    help="sparse storage block edge (level cells per side)")
    ap.add_argument("--coupling-depth", type=int, default=0,
                    help="nested-grid sweep Gauss-Seidel coupling passes "
                         "per slab (0 = validate on the ingested grid at "
                         "startup and adopt the smallest converged depth)")
    ap.add_argument("--sweep-window", choices=("auto", "off"),
                    default="auto",
                    help="block-sparse sweep: confine the coupled "
                         "fine-level stack to the static refinement "
                         "window (exact-parity clustered-refinement fast "
                         "path; auto falls back to full planes when "
                         "refinement spans the grid)")
    ap.add_argument("--split-compile", action="store_true",
                    help="sparse deep-AMR: compile the sweep's zone-group "
                         "scans individually instead of one monolithic XLA "
                         "program (needed at the largest configs)")
    args = ap.parse_args(argv)

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    import jax.numpy as jnp

    from .config import (MODE_CLUMPING_FACTOR, MODE_INITIAL_CONFIGURATION,
                         MODE_PLOT_PDFS, MODE_PRINT_NUMBER_OF_CELLS,
                         load_config)
    from .core import chemistry, step as step_mod
    from .core.state import GridGeometry
    from .io import diagnostics, grid_io, snapshot, sources_io
    from .tables import stellar as stellar_tables
    from .constants import KPC, MYR

    # multi-host runtime (SURVEY.md §5.8): must come before first jax use
    from .parallel import mesh as pmesh
    if pmesh.maybe_initialize_distributed(
            args.coordinator or None, args.num_processes or None,
            args.process_id if args.process_id >= 0 else None):
        print(f"jax.distributed: process {jax.process_index()} of "
              f"{jax.process_count()}, {len(jax.devices())} devices")

    cfg = load_config(args.config)
    if args.angular_level:
        cfg.n_angular_level = args.angular_level
    if args.sweep_strategy:
        cfg.sweep_strategy = args.sweep_strategy
    if args.sweep_logmean:
        cfg.sweep_logmean = args.sweep_logmean
    if args.tracer_compact:
        cfg.tracer_compact = True
    if args.mesh_shape:
        cfg.mesh_shape = tuple(int(x) for x in args.mesh_shape.split(","))
    if args.tracer_strategy:
        cfg.tracer_strategy = args.tracer_strategy
    mesh = None
    if cfg.mesh_shape or cfg.sweep_strategy != "auto":
        mesh = pmesh.make_grid_mesh(shape=cfg.mesh_shape or None)
        print(f"device mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}"
              f" strategy = {cfg.sweep_strategy}")
    dtype = jnp.float64 if args.x64 else jnp.float32
    print(f"mode = {cfg.mode}   grid = {cfg.grid}   z = {cfg.current_redshift}")

    # ---- grid ingestion -------------------------------------------------
    grid_path = os.path.join(cfg.sph_dir, cfg.grid)
    if os.path.exists(grid_path + ".npz"):
        levels = grid_io.read_level_npz(grid_path + ".npz")
    elif os.path.exists(grid_path + ".h4"):
        # the reference's own container (equiSources.f90:316-423), read
        # by the pure-Python HDF4-SD parser (io.hdf4 / io.convert)
        from .io.convert import h42levels
        levels = h42levels(grid_path + ".h4")
    elif os.path.exists(grid_path + ".dat"):
        levels = grid_io.read_fortran_level_binary(
            grid_path + ".dat", cfg.read_metals, cfg.read_kinematics)
    else:
        sys.exit(f"grid not found: {grid_path}(.npz|.h4|.dat)")

    if cfg.mode == MODE_PRINT_NUMBER_OF_CELLS:
        for i, lv in enumerate(levels):
            print(f"level = {i + 1}  cells = {lv.ncell}")
        return

    n_data_levels = sum(1 for lv in levels if lv.ncell > 0)
    use_amr = n_data_levels > 1
    use_ml = n_data_levels > 2 and args.amr_depth > 2
    use_sparse = False
    if use_ml:
        # storage selection: the dense per-level representation allocates
        # (n*2^l)^3 volumes; production deep grids need O(leaves) blocks
        # (VERDICT r3 missing-1; reference octree is O(leaves),
        # /root/reference/definitionsModule.f90:163-180)
        depth = min(n_data_levels, args.amr_depth)
        nbase = round(levels[0].ncell ** (1.0 / 3.0))
        dense_bytes = sum((nbase * 2 ** l) ** 3 * 17
                          * (8 if args.x64 else 4) for l in range(depth))
        use_sparse = (args.amr_storage == "sparse"
                      or (args.amr_storage == "auto"
                          and dense_bytes > 4.0e9))
    ml_state = amr_state = sparse_state = None
    if use_sparse:
        from .core import amr_sparse
        sparse_state, geom = amr_sparse.sparse_from_level_lists(
            levels, cfg.read_metals, be=args.block_edge,
            max_depth=args.amr_depth, dtype=dtype)
        state = sparse_state.base
        use_ml = use_amr = False
        print(f"grid: {geom.nx}^3 + {sparse_state.n_levels - 1} refined "
              f"levels, block-sparse (be={args.block_edge}): "
              f"{sparse_state.n_leaves()} leaves, "
              f"{sparse_state.memory_bytes() / 1e9:.2f} GB "
              f"(dense would be {dense_bytes / 1e9:.1f} GB)")
    elif use_ml:
        from .core import amr as amr_mod
        ml_state, geom = amr_mod.multilevel_from_levels(
            levels, cfg.read_metals, dtype=dtype, max_depth=args.amr_depth)
        state = ml_state.levels[0]
        use_amr = False
        counts = [int(np.asarray(r).sum()) for r in ml_state.refined]
        print(f"grid: {geom.nx}^3 + {ml_state.n_levels - 1} refined levels "
              f"(refined parents per level: {counts})")
    elif use_amr:
        from .core import amr as amr_mod
        amr_state, geom = amr_mod.amr_from_levels(levels, cfg.read_metals,
                                                  dtype=dtype)
        state = amr_state.base
        print(f"grid: {geom.nx}^3 + refined level "
              f"({int(np.asarray(amr_state.refined).sum())} parents)")
    else:
        state, geom = grid_io.build_uniform_state(levels, cfg.read_metals,
                                                  dtype=dtype)
    print(f"grid: {geom.nx}^3, box = {geom.physical_box_size / KPC:.1f} kpc")

    if cfg.mode == MODE_CLUMPING_FACTOR:
        print(f"clumping = {diagnostics.clumping_factor(np.asarray(state.rho))}")
        return

    if cfg.mode == MODE_INITIAL_CONFIGURATION:
        m = diagnostics.project_to_map(np.asarray(state.abun2),
                                       np.asarray(state.rho))
        np.savez(os.path.join(args.snapshot_dir, "map.npz"), map=m)
        print(f"wrote map.npz ({m.shape})")
        return

    # ---- sources --------------------------------------------------------
    stellar_ctx = None
    if cfg.run_stellar_transfer or cfg.mode == MODE_PLOT_PDFS:
        src_path = os.path.join(cfg.sph_dir, cfg.sources)
        lo, hi, _ = grid_io.grid_bounds(levels)
        stars = sources_io.read_star_file(src_path, lo, hi)
        n_young0 = int(np.sum(stars.age <= cfg.upper_age_limit))
        # Starburst99 SEDs from synthesisDir when present, else blackbody
        # (equiSources.f90:840-916); with metallicities on the grid the
        # sources bucket to the nearest SED track and share a table
        # (the TPU analog of the per-source rebuild, :1282-1298)
        population, used_sb99 = stellar_tables.load_population(
            cfg.synthesis_dir, len(stars.age), n_young0,
            cfg.mass_stellar_particle)
        if used_sb99:
            print(f"Starburst99 SEDs from {cfg.synthesis_dir} "
                  f"({len(population.metallicity_log10)} metallicity tracks)")
        metal_edges = metal_coefs = None
        if cfg.read_metals:
            metal_edges, metal_coefs = stellar_tables.metal_bucket_plan(
                population)
        if use_sparse:
            src_refined = np.asarray(sparse_state.refined0)
        elif use_ml:
            src_refined = np.asarray(ml_state.refined[0])
        elif use_amr:
            src_refined = np.asarray(amr_state.refined)
        else:
            src_refined = None
        batch, host, n_young = sources_io.prepare_sources(
            stars, geom.nx, cfg.upper_age_limit,
            abun2=np.asarray(state.abun2),
            metal_bucket_edges=metal_edges,
            refined=src_refined)
        print(f"nStars/specificAge/non-degenerate = {len(stars.age)} "
              f"{n_young} {batch.n_sources}")
        # the reference's `weight` file (equiSources.f90:1214-1224)
        ab2 = np.asarray(state.abun2)
        with open(os.path.join(args.snapshot_dir, "weight"), "w") as fh:
            for i in range(batch.n_sources):
                hz = ab2[host[i, 0], host[i, 1], host[i, 2]]
                fh.write(f"{i + 1:10d} ==>  {int(batch.weight[i]):10d}"
                         f"{hz:16.4e}\n")

        if cfg.mode == MODE_PLOT_PDFS:
            host_rho = np.asarray(state.rho)[host[:, 0], host[:, 1], host[:, 2]]
            pdfs = diagnostics.density_pdfs(np.asarray(state.rho), host_rho)
            for c, g, s in zip(pdfs.bin_centers, pdfs.pdf_gas, pdfs.pdf_star):
                print(f"{c:12.4f} {g:12.1f} {s:12.1f}")
            return

        stellar_ctx = step_mod.StellarContext.build(
            population, batch, geom, 10.0 * MYR,
            metal_coefs=metal_coefs or [(0, 0.0)],
            n_stars_specific_age=n_young,
            dust_approximation=cfg.dust_approximation,
            max_pixel_level=args.max_pixel_level or 6,
            noneq=args.chemistry == "noneq")

    # ---- model + iteration loop ----------------------------------------
    model = step_mod.RTModel.setup(cfg, geom, dtype=dtype)
    if args.debug_checkify and not (use_sparse or use_ml or use_amr):
        from .core import debug as debug_mod
        debug_mod.preflight(model, state, stellar_ctx)
        print("checkify pre-flight passed (bounds/NaN/division clean "
              "on the ingested data)")
    if args.dump_rates:
        from .tables.chemistry_rates import dump_rates
        dump_rates(model.tables,
                   os.path.join(args.snapshot_dir, "rates.out"),
                   os.path.join(args.snapshot_dir, "cool_rates.out"))
        print("wrote rates.out, cool_rates.out")
    if use_sparse:
        import dataclasses as dc

        from .core import amr_sparse, step_amr
        amodel = step_amr.SparseMLModel.setup(model,
                                              sparse_state.n_levels)
        amodel.window_enabled = args.sweep_window != "off"
        if cfg.run_uvb_transfer:
            if args.coupling_depth:
                amodel.n_coupling_iters = args.coupling_depth
                print(f"coupling depth: {args.coupling_depth} (fixed)")
            else:
                d = amodel.validate_coupling_depth(
                    sparse_state, eager=args.split_compile)
                print(f"coupling depth: {d} (validated on the ingested "
                      f"grid, residual < 1e-8)")
        # per-level equilibrium init runs elementwise on block storage;
        # the padding block's zero fields produce garbage there, re-zeroed
        # before the restriction sync (cf. SparseMLModel._chemistry_and_sync)
        new_levels = []
        for ell, lv in enumerate(sparse_state.levels, start=1):
            f = model.initialize_equilibrium(lv.fields)
            pad = lv.origin[:, 0] >= geom.nx * 2 ** ell

            def zero_pads(x, pad=pad):
                if not hasattr(x, "ndim") or x.ndim < 4:
                    return x
                m = pad.reshape((1,) * (x.ndim - 4) + (-1, 1, 1, 1))
                return jnp.where(m, 0.0, x)
            f = jax.tree_util.tree_map(zero_pads, f)
            new_levels.append(dc.replace(lv, fields=f))
        sparse_state = dc.replace(
            sparse_state, base=model.initialize_equilibrium(state),
            levels=tuple(new_levels))
        sparse_state = amr_sparse.sync_restriction_sparse(sparse_state)
        nf0 = amodel.neutral_fraction(sparse_state)
        if args.debug_checkify:
            from .core import debug as debug_mod
            debug_mod.preflight_sparse(amodel, sparse_state, stellar_ctx)
            print("checkify pre-flight passed on block-sparse storage "
                  "(slot-map/padding-block bounds, NaN/Inf, division "
                  "clean on the ingested data)")
    elif use_ml:
        from .core import amr as amr_mod, step_amr
        amodel = step_amr.MultiLevelModel.setup(model, ml_state.n_levels)
        if cfg.run_uvb_transfer:
            if args.coupling_depth:
                amodel.n_coupling_iters = args.coupling_depth
                print(f"coupling depth: {args.coupling_depth} (fixed)")
            else:
                d = amodel.validate_coupling_depth(ml_state)
                print(f"coupling depth: {d} (validated on the ingested "
                      f"grid, residual < 1e-8)")
        ml_state = amr_mod.MultiLevelState(
            levels=tuple(model.initialize_equilibrium(lv)
                         for lv in ml_state.levels),
            refined=ml_state.refined)
        ml_state = amr_mod.sync_restriction_multi(ml_state)
        nf0 = amodel.neutral_fraction(ml_state)
        if args.debug_checkify:
            from .core import debug as debug_mod
            debug_mod.preflight_ml(amodel, ml_state, stellar_ctx)
            print("checkify pre-flight passed on multilevel storage")
    elif use_amr:
        import dataclasses as dc

        from .core import amr as amr_mod, step_amr
        amodel = step_amr.AMRModel.setup(model)
        amr_state = dc.replace(
            amr_state, base=model.initialize_equilibrium(amr_state.base),
            fine=model.initialize_equilibrium(amr_state.fine))
        amr_state = amr_mod.sync_restriction(amr_state)
        nf0 = amodel.neutral_fraction(amr_state)
        if args.debug_checkify:
            # two-level AMR checks through its MultiLevelState view
            from .core import debug as debug_mod
            mlv = amr_mod.MultiLevelState(
                levels=(amr_state.base, amr_state.fine),
                refined=(amr_state.refined,))
            debug_mod.preflight_ml(step_amr.MultiLevelModel.setup(model, 2),
                                   mlv, stellar_ctx)
            print("checkify pre-flight passed on two-level AMR storage")
    else:
        state = model.initialize_equilibrium(state)
        nf0 = model.neutral_fraction(state)
    print(f"ionization equilibrium: {nf0:.8e}")
    itime = 0
    restart_snap = restart_ckpt = None
    if cfg.restart:
        if args.ckpt_format == "orbax":
            from .io import checkpoint as ckpt_mod
            path = ckpt_mod.latest_checkpoint(args.snapshot_dir)
            if path and args.chemistry == "noneq":
                # noneq checkpoints hold the (fields, species) pytree;
                # restored together once the species are built below
                restart_ckpt = path
            elif path:
                cur = (sparse_state if use_sparse
                       else ml_state if use_ml
                       else amr_state if use_amr else state)
                cur, meta = ckpt_mod.restore_sharded(path, cur)
                itime = meta["itime"]
                restart_ckpt = path
                if use_sparse:
                    sparse_state = cur
                elif use_ml:
                    ml_state = cur
                elif use_amr:
                    amr_state = cur
                else:
                    state = cur
                print(f"restarted from {path} at itime={itime}")
        else:
            snap = (os.path.join(args.snapshot_dir,
                                 cfg.restart_cell_array_name)
                    if cfg.restart_cell_array_name
                    else snapshot.latest_snapshot(args.snapshot_dir))
            if snap:
                if use_sparse:
                    sparse_state, itime = snapshot.read_snapshot_sparse(
                        snap, sparse_state)
                elif use_ml:
                    ml_state, itime = snapshot.read_snapshot_ml(snap,
                                                                ml_state)
                elif use_amr:
                    amr_state, itime = snapshot.read_snapshot_amr(snap,
                                                                  amr_state)
                else:
                    state, itime = snapshot.read_snapshot(snap, state)
                print(f"restarted from {snap} at itime={itime}")
                restart_snap = snap

    tlog = snapshot.TimeLog(os.path.join(args.snapshot_dir, "time"))
    species = None
    if args.chemistry == "noneq":
        from .core import chemistry_noneq as cn
        if use_sparse:
            # block-sparse noneq (VERDICT r4 item 3): species per level —
            # dense base + block-shaped refined levels, padding blocks
            # zeroed (their zero fields would seed garbage species)
            import dataclasses as dc
            species = [cn.species_from_field_state(sparse_state.base)]
            for ell, lv in enumerate(sparse_state.levels, start=1):
                spc = cn.species_from_field_state(lv.fields)
                pad = lv.origin[:, 0] >= geom.nx * 2 ** ell
                spc = amodel._zero_pads_tree(spc, pad)
                species.append(spc)
            species = tuple(species)
            sparse_state, species, it2 = _restore_noneq(
                sparse_state, species, restart_snap, restart_ckpt,
                snapshot)
            itime = it2 if it2 is not None else itime
            if mesh is not None:
                n_dev = int(np.prod(mesh.devices.shape))
                print(f"block-sparse noneq distributed over {n_dev} "
                      f"devices: zones sweep + source-parallel "
                      f"quadrature_noneq tracer")
            step = amodel.make_noneq_step(
                args.dt_myr * MYR, stellar_ctx,
                evolve_energy=args.evolve_energy,
                split_compile=args.split_compile, mesh=mesh)
            print(f"non-equilibrium chemistry (block-sparse, "
                  f"{sparse_state.n_levels} levels): dt = {args.dt_myr} "
                  f"Myr, evolve_energy = {args.evolve_energy}")
        elif use_amr or use_ml:
            # nested grids run through the L-level noneq step
            if use_amr:
                from .core import amr as amr_mod
                from .core import step_amr
                ml_state = amr_mod.MultiLevelState(
                    levels=(amr_state.base, amr_state.fine),
                    refined=(amr_state.refined,))
                amodel = step_amr.MultiLevelModel.setup(model, 2)
                use_ml, use_amr = True, False
            species = tuple(cn.species_from_field_state(lv)
                            for lv in ml_state.levels)
            ml_state, species, it2 = _restore_noneq(
                ml_state, species, restart_snap, restart_ckpt, snapshot)
            itime = it2 if it2 is not None else itime
            if mesh is not None:
                # sharded nested noneq (VERDICT r3 item 4c): sharded
                # levels + species, source-parallel quadrature_noneq
                # tracer, GSPMD network tail
                ml_state = pmesh.shard_multilevel_state(ml_state, mesh)
                species = tuple(pmesh.shard_species(spc, mesh)
                                for spc in species)
            step = amodel.make_noneq_step(
                args.dt_myr * MYR, stellar_ctx,
                evolve_energy=args.evolve_energy, mesh=mesh)
            print(f"non-equilibrium chemistry ({ml_state.n_levels} levels):"
                  f" dt = {args.dt_myr} Myr, "
                  f"evolve_energy = {args.evolve_energy}"
                  + (f", mesh = {mesh.devices.shape}" if mesh is not None
                     else ""))
        else:
            species = cn.species_from_field_state(state)
            state, species, it2 = _restore_noneq(
                state, species, restart_snap, restart_ckpt, snapshot)
            itime = it2 if it2 is not None else itime
            if mesh is not None:
                state = pmesh.shard_state(state, mesh)
                species = pmesh.shard_species(species, mesh)
            step = model.make_noneq_step(args.dt_myr * MYR, stellar_ctx,
                                         evolve_energy=args.evolve_energy,
                                         mesh=mesh)
            print(f"non-equilibrium chemistry: dt = {args.dt_myr} Myr, "
                  f"evolve_energy = {args.evolve_energy}"
                  + (f", mesh = {mesh.devices.shape}" if mesh is not None
                     else ""))
    elif use_sparse:
        if mesh is not None:
            n_dev = int(np.prod(mesh.devices.shape))
            if cfg.sweep_strategy not in ("", "auto", "zones"):
                print(f"warning: sparse deep AMR distributes via the "
                      f"angle-decomposed zones strategy (not "
                      f"{cfg.sweep_strategy}); using zones")
            print(f"block-sparse deep AMR distributed over {n_dev} "
                  f"devices: zones sweep (direction chunks + psum) + "
                  f"source-parallel tracer")
        step = amodel.make_step(stellar_ctx,
                                split_compile=args.split_compile,
                                mesh=mesh)
    elif use_ml:
        if mesh is not None:
            if cfg.sweep_strategy not in ("", "auto"):
                print("warning: explicit sweep strategies are uniform-grid "
                      "only; the multilevel sweep partitions under GSPMD")
            ml_state = pmesh.shard_multilevel_state(ml_state, mesh)
        step = amodel.make_step(stellar_ctx, mesh=mesh)
    elif use_amr:
        if mesh is not None:
            if cfg.sweep_strategy not in ("", "auto"):
                print("warning: explicit sweep strategies are uniform-grid "
                      "only; the AMR sweep partitions under GSPMD")
            amr_state = pmesh.shard_amr_state(amr_state, mesh)
        step = amodel.make_step(stellar_ctx, mesh=mesh)
    else:
        if mesh is not None:
            state = pmesh.shard_state(state, mesh)
        step = model.make_step(stellar_ctx, mesh=mesh)
    # 0 = unbounded: the reference iterates until externally judged/killed
    # (equiSources.f90:1230); the convergence break below still applies
    max_iter = args.iters if args.iters >= 0 else cfg.max_iterations
    import itertools
    iter_range = itertools.count() if max_iter == 0 else range(max_iter)
    prev_nf = np.inf
    if args.profile:
        jax.profiler.start_trace(args.profile)
    for _ in iter_range:
        itime += 1
        t0 = time.time()
        if use_sparse:
            if species is not None:
                out = step(sparse_state, species)
                sparse_state, species = out[0], out[1]
                diag = out[2] if len(out) > 2 else None
            elif stellar_ctx is not None:
                sparse_state, diag = step(sparse_state)
            else:
                sparse_state = step(sparse_state)
                diag = None
            nf = amodel.neutral_fraction(sparse_state)
            state = sparse_state
        elif use_ml:
            if species is not None:
                out = step(ml_state, species)
                ml_state, species = out[0], out[1]
                diag = out[2] if len(out) > 2 else None
            elif stellar_ctx is not None:
                ml_state, diag = step(ml_state)
            else:
                ml_state = step(ml_state)
                diag = None
            nf = amodel.neutral_fraction(ml_state)
            state = ml_state
        elif use_amr:
            if stellar_ctx is not None:
                amr_state, diag = step(amr_state)
            else:
                amr_state = step(amr_state)
                diag = None
            nf = amodel.neutral_fraction(amr_state)
            state = amr_state
        elif species is not None:
            out = step(state, species)
            state, species = out[0], out[1]
            diag = out[2] if len(out) > 2 else None
            nf = model.neutral_fraction(state)
        else:
            out = step(state)
            state, diag = out if isinstance(out, tuple) else (out, None)
            nf = model.neutral_fraction(state)
        tlog.append(itime, nf)
        dt_it = time.time() - t0
        throughput = geom.nx ** 3 * cfg.n_directions / max(dt_it, 1e-9)
        msg = (f"itime={itime} neutral={nf:.8f} dt={dt_it:.2f}s "
               f"({throughput:.2e} cells*angles/s)")
        pt = getattr(amodel, "last_phase_times", None) if use_sparse else None
        if pt:
            parts = [f"{k}={v:.1f}s" for k, v in pt.items()
                     if isinstance(v, (int, float))]
            sub = pt.get("tracer_phases") or {}
            parts += [f"{k}={v:.1f}s" for k, v in sub.items()
                      if isinstance(v, (int, float))
                      and not k.endswith("_steps")]
            print("  phases: " + " ".join(parts))
            prof = (sub.get(f"level{stellar_ctx.max_pixel_level}_alive")
                    if stellar_ctx is not None else None)
            if prof:
                print("  final-phase alive/chunk: "
                      + "/".join(str(c) for c in prof))
        if diag is not None:
            from .core.rays import cosmic_spectrum, escape_fractions
            frac = escape_fractions(diag, stellar_ctx.sources.weight)
            w = stellar_ctx.sources.weight
            mean_fesc = (frac * w[:, None]).sum(0) / w.sum()
            msg += "  fesc=" + "/".join(f"{f:.3f}" for f in mean_fesc)
            spec = cosmic_spectrum(diag, w, stellar_ctx.n_stars_specific_age)
            np.savez(os.path.join(args.snapshot_dir, "cosmicSpectrum.npz"),
                     freq=np.asarray(stellar_ctx.tables["output_freq"]),
                     spectrum=spec)
        print(msg)
        if args.ckpt_format == "orbax":
            from .io import checkpoint as ckpt_mod
            container = (sparse_state if use_sparse
                         else ml_state if use_ml
                         else amr_state if use_amr else state)
            if species is not None:
                # prognostic 9-species state checkpoints alongside the
                # fields (the reference restores ALL prognostic fields,
                # equiSources.f90:1071-1167)
                container = (container, species)
            ckpt_mod.save_sharded(
                ckpt_mod.checkpoint_name(itime, args.snapshot_dir),
                container, itime, geom.physical_box_size)
        elif use_sparse:
            extra = None
            if species is not None:
                extra = {}
                for ell, spc in enumerate(species):
                    extra.update(snapshot.species_extra(
                        spc, prefix=f"species{ell}"))
            snapshot.write_snapshot_sparse(
                snapshot.snapshot_name(itime, args.snapshot_dir),
                sparse_state, itime, geom.physical_box_size, extra=extra)
        elif use_ml:
            extra = None
            if species is not None:
                extra = {}
                for ell, spc in enumerate(species):
                    extra.update(snapshot.species_extra(
                        spc, prefix=f"species{ell}"))
            snapshot.write_snapshot_ml(
                snapshot.snapshot_name(itime, args.snapshot_dir), ml_state,
                itime, geom.physical_box_size, extra=extra)
        elif use_amr:
            snapshot.write_snapshot_amr(
                snapshot.snapshot_name(itime, args.snapshot_dir), amr_state,
                itime, geom.physical_box_size)
        else:
            snapshot.write_snapshot(
                snapshot.snapshot_name(itime, args.snapshot_dir), state,
                itime, geom.physical_box_size,
                extra=(snapshot.species_extra(species)
                       if species is not None else None))
        if abs(nf - prev_nf) <= 1e-6 * max(nf, 1e-30):
            print("converged")
            break
        prev_nf = nf
    if args.profile:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {args.profile}")


if __name__ == "__main__":
    main()
