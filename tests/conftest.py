"""Test configuration: run JAX on a virtual 8-device CPU mesh in float64.

The driver benches on real TPU; tests validate numerics (float64 parity with
the reference algorithms) and multi-device sharding on the CPU backend, per
SURVEY.md §4(f).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
