"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding-correctness tests
run against 8 virtual CPU devices instead (the standard JAX recipe for
testing pjit/shard_map programs without a pod).

Note: this environment preloads/pins a TPU PJRT plugin via sitecustomize, so
the platform must be overridden through jax.config (env vars are captured at
jax import time, which happens before pytest starts).
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
