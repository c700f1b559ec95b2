"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths (mesh, shard_map, collectives) are exercised without
TPU hardware. Must run before any backend initialization.

Note: this environment pins jax_platforms to "axon,cpu" (the TPU tunnel) at the
config-default level, so the JAX_PLATFORMS env var alone does not win —
jax.config.update does."""

import os

# The persistent XLA compilation cache segfaults this jax build's CPU backend
# on cache writes (zstandard path); disable it for the test suite.
os.environ["ZOLT_TPU_NO_CACHE"] = "1"

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
