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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# Cheap-codegen flags: the CPU suite is compile-bound (no persistent cache,
# see below, and one mont-heavy shard_map program costs 25-40+ s at full
# LLVM opt on this 4-core box; measured ~2x faster with these). Test shapes
# are tiny, so generated-code quality is irrelevant; every numeric path is
# asserted byte-exact, so a miscompile cannot pass silently.
if "xla_backend_optimization_level" not in flags:
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags

# Disable the narrow-tail host handoff (parallel/stage_engine.tail_n): test
# traces are tiny, and the point of the CPU suite is to exercise the
# device/mesh kernels, not the host tail (which has its own crossover test).
os.environ.setdefault("ZOLT_TPU_DEVICE_TAIL", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: NONE for CPU surfaces. XLA:CPU AOT entries
# are unloadable on this box: tunneled (axon) sessions write entries
# compiled for the REMOTE machine type (loading one segfaults, observed
# exit 139 mid-suite round 4); flag-less self-written entries fail the AOT
# loader's feature check; and even with a pinned ISA
# (--xla_cpu_max_isa=AVX2) an in-suite reload of a large 8-device
# shard_map executable segfaulted in deserialize_executable (round 5).
# zolt_tpu._default_cache_dir implements this policy (CPU -> no cache;
# tunneled TPU -> its own dir); importing the package after the platform
# pin above applies it, and the assert keeps it honest.
import zolt_tpu  # noqa: E402, F401

assert jax.config.jax_compilation_cache_dir is None, (
    "CPU suite must not use a persistent XLA cache, got "
    f"{jax.config.jax_compilation_cache_dir!r}"
)
