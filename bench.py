"""Headline benchmark: diffuse-sweep throughput in grid-cells x angles / s.

Runs the full 192-direction (nAngularLevel=3) three-band sweep on a 256^3
uniform grid in float32 on the available accelerator, matching the
BASELINE.json north-star metric.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured throughput relative to the 1e9 cells x angles / s
per-chip target recorded in BASELINE.md (the reference publishes no numbers;
the target is this project's own speed-of-light estimate).

Environment knobs:
  BENCH_N       grid size per side (default 256)
  BENCH_LEVEL   angular level (default 3 -> 192 directions)
  BENCH_REPS    timed repetitions (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

TARGET_CELLS_ANGLES_PER_S = 1.0e9


def main() -> None:
    import jax
    import jax.numpy as jnp

    from radiativetransfer_tpu.constants import KPC
    from radiativetransfer_tpu.core import sweep

    n = int(os.environ.get("BENCH_N", "256"))
    level = int(os.environ.get("BENCH_LEVEL", "3"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    platform = jax.devices()[0].platform
    if platform == "cpu" and "BENCH_N" not in os.environ:
        n = 64  # keep the CPU fallback tractable

    ndir = 12 * 4 ** (level - 1)
    rng = np.random.default_rng(0)
    cell = (2000.0 / n) * KPC
    kappa = jnp.asarray(
        rng.lognormal(mean=0.0, sigma=1.0, size=(3, n, n, n)) * (0.5 / cell),
        jnp.float32)
    uvb = jnp.asarray([1e-21, 5e-22, 1e-22], jnp.float32)

    plan = sweep.build_sweep_plan(level, n)
    impl = os.environ.get("BENCH_IMPL", "pallas" if platform != "cpu" else "xla")
    if impl == "pallas" and platform == "cpu":
        print("note: Pallas kernels need a TPU backend; falling back to the "
              "XLA sweep on cpu", file=sys.stderr)
        impl = "xla"
    if impl == "pallas":
        from radiativetransfer_tpu.core import sweep_pallas
        run = sweep_pallas.make_jitted_sweep_pallas(plan)
    else:
        run = sweep.make_jitted_sweep(plan)

    def sync(x):
        # fetch a data-dependent scalar: block_until_ready alone returns
        # early through the axon relay
        return float(jnp.sum(x))

    # compile + warm up
    sync(run(kappa, uvb, cell))

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = sync(run(kappa, uvb, cell))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    cells_angles = n ** 3 * ndir
    value = cells_angles / dt
    print(json.dumps({
        "metric": f"sweep cells*angles/s ({n}^3 grid, {ndir} directions, "
                  f"3 bands, {impl}, {platform})",
        "value": value,
        "unit": "cells*angles/s",
        "vs_baseline": value / TARGET_CELLS_ANGLES_PER_S,
    }))


if __name__ == "__main__":
    main()
