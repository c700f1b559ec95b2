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

# The CPU suite must NOT use the persistent compilation cache at all on this
# box: XLA:CPU AOT artifacts written under the axon terminal target ITS
# machine type, and loading one here segfaults inside
# compilation_cache.get_executable_and_time (cpu_aot_loader warns "could
# lead to execution errors such as SIGILL"; observed exit 139 mid-suite).
# An isolated dir is not enough — the mismatched entries come from the same
# processes that would share it. Cold compiles are slower but stable.
jax.config.update("jax_compilation_cache_dir", None)
