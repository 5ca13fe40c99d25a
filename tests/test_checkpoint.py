"""Sharded orbax checkpoint round-trips (SURVEY.md §2 'Checkpoint of
distributed state', §5.4 restart contract)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.core.state import uniform_state
from radiativetransfer_tpu.io import checkpoint as ckpt
from radiativetransfer_tpu.parallel import mesh as pmesh

pytestmark = pytest.mark.skipif(ckpt.ocp is None,
                                reason="orbax not installed")


def _rand_state(n, seed=0):
    rng = np.random.default_rng(seed)
    st = uniform_state(n, nh=1e-3, dtype=jnp.float64)
    return dataclasses.replace(
        st,
        HI=jnp.asarray(rng.uniform(0, 1e-3, (n, n, n))),
        tgas=jnp.asarray(rng.uniform(1e3, 1e5, (n, n, n))),
        Jmean=jnp.asarray(rng.uniform(size=(3, n, n, n))))


def test_roundtrip_single_device(tmp_path):
    st = _rand_state(8)
    path = ckpt.checkpoint_name(7, str(tmp_path))
    ckpt.save_sharded(path, st, itime=7, physical_box_size=1.0e24)
    restored, meta = ckpt.restore_sharded(path, uniform_state(8, dtype=jnp.float64))
    assert meta["itime"] == 7
    assert meta["physical_box_size"] == 1.0e24
    np.testing.assert_array_equal(np.asarray(restored.HI), np.asarray(st.HI))
    np.testing.assert_array_equal(np.asarray(restored.Jmean),
                                  np.asarray(st.Jmean))


def test_roundtrip_sharded_mesh(tmp_path):
    mesh = pmesh.make_grid_mesh(8)
    st = pmesh.shard_state(_rand_state(16, seed=1), mesh)
    path = ckpt.checkpoint_name(3, str(tmp_path))
    ckpt.save_sharded(path, st, itime=3, physical_box_size=2.0e24)

    like = pmesh.shard_state(uniform_state(16, dtype=jnp.float64), mesh)
    restored, meta = ckpt.restore_sharded(path, like, mesh=mesh)
    assert meta["itime"] == 3
    np.testing.assert_array_equal(np.asarray(restored.HI), np.asarray(st.HI))
    # restored arrays carry the mesh sharding (restart straight into the
    # distributed step, no resharding)
    assert restored.HI.sharding == pmesh.field_sharding(mesh)
    assert restored.Jmean.sharding == pmesh.band_field_sharding(mesh)


def test_latest_checkpoint(tmp_path):
    st = _rand_state(8)
    for it in (1, 12, 5):
        ckpt.save_sharded(ckpt.checkpoint_name(it, str(tmp_path)), st,
                          itime=it, physical_box_size=1.0)
    latest = ckpt.latest_checkpoint(str(tmp_path))
    assert latest is not None and latest.endswith("ckpt0012")


def test_roundtrip_sparse_deep_amr(tmp_path):
    """Orbax checkpoints the block-sparse SparseMLState pytree generically
    (the multi-host path for production deep grids)."""
    import numpy as np

    from radiativetransfer_tpu.core import amr, amr_sparse
    n = 8
    refined = [np.zeros((n, n, n), bool), np.zeros((2 * n,) * 3, bool)]
    refined[0][2:5, 2:5, 2:5] = True
    refined[1][6:9, 6:9, 6:9] = True
    refined = amr.enforce_balance(refined)
    cov = np.ones((n, n, n), bool)
    for ell in range(2):
        refined[ell] &= cov
        cov = np.repeat(np.repeat(np.repeat(refined[ell], 2, 0), 2, 1),
                        2, 2)
    sp = amr_sparse.make_sparse_state(_rand_state(n, seed=5), refined)
    path = ckpt.checkpoint_name(4, str(tmp_path))
    ckpt.save_sharded(path, sp, itime=4, physical_box_size=3.0e24)

    like = amr_sparse.make_sparse_state(
        uniform_state(n, dtype=jnp.float64), refined)
    restored, meta = ckpt.restore_sharded(path, like)
    assert meta["itime"] == 4
    np.testing.assert_array_equal(np.asarray(restored.base.HI),
                                  np.asarray(sp.base.HI))
    for ell in range(2):
        np.testing.assert_array_equal(
            np.asarray(restored.levels[ell].fields.HI),
            np.asarray(sp.levels[ell].fields.HI))
        np.testing.assert_array_equal(
            np.asarray(restored.levels[ell].cover),
            np.asarray(sp.levels[ell].cover))


def test_roundtrip_noneq_species(tmp_path):
    """The (state, species) container the CLI checkpoints for noneq runs
    restores the full prognostic 9-species state."""
    import numpy as np

    from radiativetransfer_tpu.core import chemistry_noneq as cn
    st = _rand_state(8, seed=9)
    species = cn.species_from_field_state(st, f_h2=1e-4, f_hm=1e-7)
    path = ckpt.checkpoint_name(6, str(tmp_path))
    ckpt.save_sharded(path, (st, species), itime=6,
                      physical_box_size=1.0e24)

    like = (uniform_state(8, dtype=jnp.float64),
            cn.species_from_field_state(uniform_state(8,
                                                      dtype=jnp.float64)))
    (rst, rsp), meta = ckpt.restore_sharded(path, like)
    assert meta["itime"] == 6
    np.testing.assert_array_equal(np.asarray(rsp.H2I),
                                  np.asarray(species.H2I))
    np.testing.assert_array_equal(np.asarray(rsp.eint),
                                  np.asarray(species.eint))
