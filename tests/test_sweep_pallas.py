"""Pallas sweep kernel parity (interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import sweep, sweep_pallas


@pytest.mark.parametrize("level,n", [(1, 8), (2, 6)])
def test_pallas_matches_xla(level, n):
    rng = np.random.default_rng(42)
    kappa = jnp.asarray(rng.lognormal(0, 1, (3, n, n, n)) * 0.7 / KPC,
                        jnp.float32)
    uvb = jnp.array([1.0, 0.5, 0.25], jnp.float32)
    plan = sweep.build_sweep_plan(level, n)
    j_xla = np.asarray(sweep.diffuse_sweep(kappa, plan, uvb, KPC))
    j_pal = np.asarray(sweep_pallas.diffuse_sweep_pallas(
        kappa, plan, uvb, KPC, interpret=True))
    np.testing.assert_allclose(j_pal, j_xla, rtol=2e-6)


def test_pallas_transparent_box():
    n = 6
    kappa = jnp.full((3, n, n, n), 1e-30, jnp.float32)
    uvb = jnp.array([1.0, 0.5, 0.25], jnp.float32)
    plan = sweep.build_sweep_plan(1, n)
    j = np.asarray(sweep_pallas.diffuse_sweep_pallas(kappa, plan, uvb, KPC,
                                                     interpret=True))
    np.testing.assert_allclose(
        j, np.asarray(uvb)[:, None, None, None] * np.ones((3, n, n, n)),
        rtol=1e-5)


def test_malformed_chain_table_rejected():
    """Host-side SMEM-table precondition guard (SURVEY.md §5.2 rebuild
    item): a corrupted chain code must be rejected before it reaches the
    kernel's raw SMEM index arithmetic."""
    import dataclasses

    import numpy as np
    import pytest

    from radiativetransfer_tpu.core import sweep, sweep_pallas

    plan = sweep.build_sweep_plan(1, 8)
    bad_zone = plan.zones[0]
    chain2 = np.asarray(bad_zone.chain2).copy()
    chain2[0, 0] = 7                       # not a segment code
    bad_zone = dataclasses.replace(bad_zone, chain2=chain2)
    with pytest.raises(ValueError, match="malformed chain table"):
        sweep_pallas._validate_zone_tables(bad_zone)
    for z in plan.zones:                   # real plans pass
        sweep_pallas._validate_zone_tables(z)


def test_clamped_logmean_accuracy():
    """The branch-free clamped logmean (--sweep-logmean clamped) must stay
    within its documented bounds: <= ~6e-4 deviation from the exact
    two-branch form across a tau range spanning both regimes, and
    <= 1.75e-4 emissivity bias in a fully transparent box."""
    n = 6
    rng = np.random.default_rng(3)
    # kappa*cell spanning 1e-8 .. 10 (deep into both logmean branches)
    kappa = jnp.asarray(10.0 ** rng.uniform(-8, 1, (3, n, n, n)) / KPC,
                        jnp.float32)
    uvb = jnp.array([1.0, 0.5, 0.25], jnp.float32)
    plan = sweep.build_sweep_plan(1, n)
    j_exact = np.asarray(sweep_pallas.diffuse_sweep_pallas(
        kappa, plan, uvb, KPC, interpret=True))
    j_clamp = np.asarray(sweep_pallas.diffuse_sweep_pallas(
        kappa, plan, uvb, KPC, interpret=True, logmean="clamped"))
    denom = np.maximum(np.abs(j_exact), np.abs(j_exact).max() * 1e-3)
    assert np.max(np.abs(j_clamp - j_exact) / denom) < 1e-3

    kappa0 = jnp.full((3, n, n, n), 1e-30, jnp.float32)
    j0 = np.asarray(sweep_pallas.diffuse_sweep_pallas(
        kappa0, plan, uvb, KPC, interpret=True, logmean="clamped"))
    ref = np.asarray(uvb)[:, None, None, None] * np.ones((3, n, n, n))
    assert np.max(np.abs(j0 - ref) / ref) < 2.0e-4
