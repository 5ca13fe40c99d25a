"""Production A/B of the Pallas sweep's clamped logmean (VERDICT r4
item 8): settle whether the branch-free min-clamp form (+6.6% sweep
throughput, emissivity bias <= 1.75e-4 confined to cells with
tau < 3.5e-4 — BASELINE.md round 3) changes any physics a production
run can see, and decide the TPU default.

Two measurements on the real TPU:

1. One-sweep Jmean A/B at 256^3 x 192 directions on a production-like
   lognormal opacity field: max/mean relative Jmean deltas, and the
   exact-transparency check (J == uvb where kappa ~ 0) both forms.
2. Iterated physics A/B: 128^3 uniform mode-9 (UVB transport +
   equilibrium chemistry), f32, N iterations with each logmean form;
   per-iteration global neutral fractions and the final HI field delta.

Run:  python scripts/exp_logmean_ab.py        (TPU via axon)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from radiativetransfer_tpu.config import (MODE_UVB_TRANSFER_ONLY,
                                          RunConfig)
from radiativetransfer_tpu.constants import KPC, MH, PSI
from radiativetransfer_tpu.core import (step as step_mod, sweep,
                                        sweep_pallas)
from radiativetransfer_tpu.core.state import GridGeometry, make_state

N_SWEEP = int(os.environ.get("EXP_N", "256"))
N_STEP = int(os.environ.get("EXP_STEP_N", "128"))
ITERS = int(os.environ.get("EXP_ITERS", "8"))


def fetch(x):
    # data-dependent scalar fetch: block_until_ready does not block
    # through the axon relay (BASELINE.md round 3)
    return float(jnp.sum(jnp.abs(x[..., :2, :2, :2])))


def one_sweep_ab():
    n = N_SWEEP
    cell = 2000.0 * KPC / n
    rng = np.random.default_rng(0)
    kappa = jnp.asarray(rng.lognormal(0, 1.2, (3, n, n, n)) * 0.5 / cell,
                        jnp.float32)
    # a transparent corner exercises the exact-transparency contract
    kappa = kappa.at[:, : n // 8, : n // 8, : n // 8].set(0.0)
    uvb = jnp.asarray([1e-21, 3e-22, 1e-22], jnp.float32)
    plan = sweep.build_sweep_plan(3, n)
    outs = {}
    for form in ("exact", "clamped"):
        run = jax.jit(lambda k, f=form: sweep_pallas.diffuse_sweep_pallas(
            k, plan, uvb, cell, logmean=f))
        j = run(kappa)
        fetch(j)
        outs[form] = j
    je, jc = outs["exact"], outs["clamped"]
    scale = jnp.maximum(jnp.abs(je), 1e-30)
    rel = jnp.abs(jc - je) / scale
    corner = (slice(None), slice(0, n // 8), slice(0, n // 8),
              slice(0, n // 8))
    print(f"one-sweep A/B ({n}^3 x {plan.n_directions} dirs, f32):")
    print(f"  max rel dJ  = {float(jnp.max(rel)):.3e}")
    print(f"  mean rel dJ = {float(jnp.mean(rel)):.3e}")
    for form, j in outs.items():
        terr = float(jnp.max(jnp.abs(
            j[corner] - uvb[:, None, None, None])
            / uvb[:, None, None, None]))
        print(f"  transparency (J vs uvb, kappa=0 corner), {form}: "
              f"max rel err {terr:.3e}")


def iterated_ab():
    n = N_STEP
    cfg = RunConfig(mode=MODE_UVB_TRANSFER_ONLY, current_redshift=6.55,
                    n_angular_level=3, reionization_model=10, grid="ab")
    geom = GridGeometry(n, n, n, 1200.0 * KPC)
    rng = np.random.default_rng(1)
    nh = (2e-4 * rng.lognormal(0.0, 0.8, (n, n, n))).astype(np.float32)
    results = {}
    for form in ("exact", "clamped"):
        import dataclasses
        cfg_f = dataclasses.replace(cfg, sweep_logmean=form)
        model = step_mod.RTModel.setup(cfg_f, geom, dtype=jnp.float32)
        state = model.initialize_equilibrium(
            make_state(nh * MH / PSI, np.full((n, n, n), 1e4), nh,
                       dtype=jnp.float32))
        step = model.make_step()
        nfs = []
        for _ in range(ITERS):
            state = step(state)
            nfs.append(model.neutral_fraction(state))
        results[form] = (np.array(nfs), np.asarray(state.HI))
    nf_e, hi_e = results["exact"]
    nf_c, hi_c = results["clamped"]
    print(f"iterated A/B ({n}^3 mode-9, {cfg.n_directions} dirs, f32, "
          f"{ITERS} iterations):")
    for i, (a, b) in enumerate(zip(nf_e, nf_c), 1):
        print(f"  iter {i}: nf exact {a:.8f}  clamped {b:.8f}  "
              f"rel d {abs(a - b) / max(a, 1e-30):.3e}")
    rel_hi = np.abs(hi_c - hi_e) / np.maximum(np.abs(hi_e), 1e-30)
    print(f"  final HI field: max rel d {rel_hi.max():.3e}, "
          f"mean {rel_hi.mean():.3e}")


if __name__ == "__main__":
    one_sweep_ab()
    iterated_ab()
