"""Test configuration: run JAX on a virtual 8-device CPU mesh in float64.

The driver benches on real TPU; tests validate numerics (float64 parity with
the reference algorithms) and multi-device sharding on the CPU backend, per
SURVEY.md §4(f).
"""

import os

# Force the CPU backend.  The session environment tunnels JAX to a remote
# TPU ("axon") and its sitecustomize force-sets jax_platforms="axon,cpu",
# overriding the JAX_PLATFORMS env var — so we must override via jax.config
# AFTER import as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
