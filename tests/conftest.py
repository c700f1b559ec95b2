"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths (mesh, shard_map, collectives) are exercised without
TPU hardware. Must set env vars before jax is imported anywhere."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402, F401  (import ensures platform config is locked in)
