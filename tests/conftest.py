"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths (mesh, shard_map, collectives) are exercised without
TPU hardware. Must run before any backend initialization.

Note: this environment pins jax_platforms to "axon,cpu" (the TPU tunnel) at the
config-default level, so the JAX_PLATFORMS env var alone does not win —
jax.config.update does."""

import os
import sys

# The persistent XLA compilation cache segfaults this jax build's CPU backend
# when writes go through zstandard.backend_c; blocking the zstandard import
# makes jax fall back to zlib compression, which is stable. Keeping the cache
# matters: the legacy device provers compile dozens of per-shape kernels and a
# cold CPU run takes tens of minutes without it.
sys.modules["zstandard"] = None

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Disable the narrow-tail host handoff (parallel/stage_engine.tail_n): test
# traces are tiny, and the point of the CPU suite is to exercise the
# device/mesh kernels, not the host tail (which has its own crossover test).
os.environ.setdefault("ZOLT_TPU_DEVICE_TAIL", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: NONE for CPU surfaces. XLA:CPU AOT entries
# are unloadable on this box twice over — tunneled (axon) sessions write
# entries compiled for the REMOTE machine type (loading one segfaults,
# observed exit 139 mid-suite), and even self-written entries embed LLVM
# tuning pseudo-features (+prefer-no-gather) that the loader's runtime
# feature check rejects. zolt_tpu._default_cache_dir implements this policy
# (CPU -> no cache; tunneled TPU -> its own dir); importing the package
# after the platform pin above applies it, and the assert keeps it honest.
import zolt_tpu  # noqa: E402, F401

assert jax.config.jax_compilation_cache_dir is None, (
    "CPU suite must not use a persistent XLA cache, got "
    f"{jax.config.jax_compilation_cache_dir!r}"
)
