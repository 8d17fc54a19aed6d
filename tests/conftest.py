"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on one real TPU chip; tests exercise the same code paths
(including multi-chip sharding) on CPU via
``--xla_force_host_platform_device_count=8``.

NOTE: in this environment the TPU is attached through a high-latency tunnel
("axon") that ignores the JAX_PLATFORMS env var, so we must force the CPU
platform through ``jax.config`` before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
