"""Multi-device tests on the 8-virtual-device CPU mesh (SURVEY.md §4f):
sharded results must equal single-device results."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.config import MODE_UVB_TRANSFER_ONLY, RunConfig
from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import step as step_mod, sweep
from radiativetransfer_tpu.core.state import GridGeometry, uniform_state
from radiativetransfer_tpu.parallel import mesh as pmesh


needs_devices = pytest.mark.skipif(len(jax.devices()) < 8,
                                   reason="needs 8 virtual devices")


@needs_devices
class TestShardedSweep:
    def test_sweep_matches_single_device(self):
        n = 16
        rng = np.random.default_rng(0)
        cell = KPC
        kappa = jnp.asarray(rng.lognormal(0, 1, (3, n, n, n)) * 0.5 / cell,
                            jnp.float64)
        uvb = jnp.asarray([1.0, 0.5, 0.25], jnp.float64)
        plan = sweep.build_sweep_plan(1, n)
        j_single = np.asarray(sweep.diffuse_sweep(kappa, plan, uvb, cell))

        mesh = pmesh.make_grid_mesh(8)
        kappa_sh = jax.device_put(kappa, pmesh.band_field_sharding(mesh))
        run = jax.jit(lambda k: sweep.diffuse_sweep(k, plan, uvb, cell))
        j_sharded = np.asarray(run(kappa_sh))
        np.testing.assert_allclose(j_sharded, j_single, rtol=1e-12)

    def test_full_step_matches_single_device(self):
        n = 16
        cfg = RunConfig(mode=MODE_UVB_TRANSFER_ONLY, current_redshift=6.55,
                        n_angular_level=1, reionization_model=10, grid="t")
        geom = GridGeometry(n, n, n, 300.0 * KPC)
        model = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float64)
        state = uniform_state(n, nh=2e-3, tgas=1e4, dtype=jnp.float64)

        out_single = jax.jit(model.transport_chemistry_step)(state)

        mesh = pmesh.make_grid_mesh(8)
        state_sh = pmesh.shard_state(state, mesh)
        out_sharded = jax.jit(model.transport_chemistry_step)(state_sh)

        np.testing.assert_allclose(np.asarray(out_sharded.HI),
                                   np.asarray(out_single.HI), rtol=1e-11)
        np.testing.assert_allclose(np.asarray(out_sharded.Jmean),
                                   np.asarray(out_single.Jmean), rtol=1e-11)

    def test_explicit_pipelined_matches_single_device(self):
        """The shard_map + ppermute halo-line sweep (SURVEY.md §5.8/§7.3)
        must reproduce the serial sweep to roundoff."""
        from radiativetransfer_tpu.parallel import sweep_dist
        n = 16
        rng = np.random.default_rng(1)
        cell = KPC
        kappa = jnp.asarray(rng.lognormal(0, 1, (3, n, n, n)) * 0.5 / cell,
                            jnp.float64)
        uvb = jnp.asarray([1.0, 0.5, 0.25], jnp.float64)
        plan = sweep.build_sweep_plan(1, n)
        j_single = np.asarray(sweep.diffuse_sweep(kappa, plan, uvb, cell))

        mesh = pmesh.make_grid_mesh(8)
        kappa_sh = jax.device_put(kappa, pmesh.band_field_sharding(mesh))
        run = sweep_dist.make_jitted_sweep_dist(plan, mesh, "pipelined")
        j_dist = run(kappa_sh, uvb, cell)
        # output stays grid-decomposed (no gather)
        assert len(j_dist.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(j_dist), j_single, rtol=1e-13)

    def test_explicit_zone_parallel_matches_single_device(self):
        """The angle-decomposed psum sweep must reproduce the serial sweep:
        each device sweeps its round-robin share of the 24 octant zones."""
        from radiativetransfer_tpu.parallel import sweep_dist
        n = 12
        rng = np.random.default_rng(2)
        cell = KPC
        kappa = jnp.asarray(rng.lognormal(0, 1, (3, n, n, n)) * 0.5 / cell,
                            jnp.float64)
        uvb = jnp.asarray([1.0, 0.5, 0.25], jnp.float64)
        plan = sweep.build_sweep_plan(2, n)   # 48 dirs -> all 24 zones
        assert len(plan.zones) == 24
        j_single = np.asarray(sweep.diffuse_sweep(kappa, plan, uvb, cell))

        mesh = pmesh.make_grid_mesh(8)
        run = sweep_dist.make_jitted_sweep_dist(plan, mesh, "zones")
        j_dist = np.asarray(run(kappa, uvb, cell))
        np.testing.assert_allclose(j_dist, j_single, rtol=1e-13)

    def test_rdma_halo_sweep_matches_single_device(self):
        """The in-kernel Pallas RDMA halo-line sweep (parallel.sweep_rdma,
        SURVEY.md §5.8) must reproduce the serial sweep: the ring protocol
        (ping-pong slots, ACK flow control, per-stage remote copies) runs
        under the Pallas interpreter on the CPU mesh."""
        from radiativetransfer_tpu.parallel import sweep_rdma
        n = 16
        rng = np.random.default_rng(3)
        cell = KPC
        kappa = jnp.asarray(rng.lognormal(0, 1, (3, n, n, n)) * 0.5 / cell,
                            jnp.float64)
        uvb = jnp.asarray([1.0, 0.5, 0.25], jnp.float64)
        plan = sweep.build_sweep_plan(1, n)
        j_single = np.asarray(sweep.diffuse_sweep(kappa, plan, uvb, cell))

        mesh = pmesh.make_grid_mesh(8)
        kappa_sh = jax.device_put(kappa, pmesh.band_field_sharding(mesh))
        run = sweep_rdma.make_jitted_sweep_rdma(plan, mesh, interpret=True)
        j_dist = run(kappa_sh, uvb, cell)
        assert len(j_dist.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(j_dist), j_single, rtol=1e-13)

    def test_sharded_output_stays_sharded(self):
        # the chemistry update must not gather the grid to one device
        n = 16
        cfg = RunConfig(mode=MODE_UVB_TRANSFER_ONLY, current_redshift=6.55,
                        n_angular_level=1, reionization_model=10, grid="t")
        geom = GridGeometry(n, n, n, 300.0 * KPC)
        model = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float64)
        state = uniform_state(n, nh=2e-3, tgas=1e4, dtype=jnp.float64)
        mesh = pmesh.make_grid_mesh(8)
        state_sh = pmesh.shard_state(state, mesh)
        out = jax.jit(model.transport_chemistry_step)(state_sh)
        assert len(out.HI.sharding.device_set) == 8
