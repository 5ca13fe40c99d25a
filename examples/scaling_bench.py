"""Multi-device scaling measurement of the sharded transport+chemistry step.

Runs the full UVB-transfer step on an N-device mesh for N in {1,2,4,8} and
reports throughput + efficiency.  On real hardware the mesh rides ICI; in
this environment it runs on 8 virtual CPU devices (the driver validates the
multi-chip path the same way via __graft_entry__.dryrun_multichip).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python examples/scaling_bench.py [n]
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from radiativetransfer_tpu.config import MODE_UVB_TRANSFER_ONLY, RunConfig
from radiativetransfer_tpu.constants import KPC
from radiativetransfer_tpu.core import step as step_mod
from radiativetransfer_tpu.core.state import GridGeometry, uniform_state
from radiativetransfer_tpu.parallel import mesh as pmesh


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    cfg = RunConfig(mode=MODE_UVB_TRANSFER_ONLY, current_redshift=6.55,
                    n_angular_level=2, reionization_model=10, grid="scal")
    geom = GridGeometry(n, n, n, 500.0 * KPC)
    model = step_mod.RTModel.setup(cfg, geom, dtype=jnp.float32)
    state0 = uniform_state(n, nh=2e-3, tgas=1e4, dtype=jnp.float32)

    results = {}
    for nd in (1, 2, 4, 8):
        if nd > len(jax.devices()):
            break
        mesh = pmesh.make_grid_mesh(nd)
        state = pmesh.shard_state(state0, mesh)
        step = jax.jit(model.transport_chemistry_step)
        out = step(state)
        float(jnp.sum(out.HI))  # compile + run
        t0 = time.perf_counter()
        reps = 2
        for _ in range(reps):
            out = step(state)
            float(jnp.sum(out.HI))
        dt = (time.perf_counter() - t0) / reps
        thr = n ** 3 * cfg.n_directions / dt
        results[nd] = thr
        eff = thr / (results[1] * nd) if 1 in results else 1.0
        print(f"devices={nd}  dt={dt:.3f}s  {thr:.3e} cells*angles/s  "
              f"efficiency={eff:.2f}")
    print(json.dumps({str(k): v for k, v in results.items()}))


if __name__ == "__main__":
    main()
