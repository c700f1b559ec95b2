"""zolt_tpu — TPU-native Jolt-style zkVM prover framework (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of the reference (MatteoMer/zolt,
a Zig Jolt zkVM): BN254 field arithmetic, Pippenger MSM, sumcheck engines,
HyperKZG/Dory polynomial commitments, Blake2b/Keccak Fiat-Shamir transcripts,
an RV64IMC tracer, and the Jolt 7-stage proof schedule — redesigned TPU-first:
batched limb arithmetic on the VPU/MXU, mesh-sharded MSM and sumcheck folds with
ICI collective reductions, host-side transcript and tracer.
"""

__version__ = "0.1.0"

import os as _os


def _default_cache_dir(platform: str | None = None) -> str | None:
    """Persistent-cache dir, or None for platforms where caching is unsafe.

    XLA:CPU persistent caching is BROKEN on this class of box, twice over:
    (a) tunneled-TPU (axon) sessions write XLA:CPU AOT entries compiled for
    the REMOTE machine type — loading one in a pure-CPU process here
    SIGILLs/segfaults (observed exit 139 mid-suite, round 4); and (b) even
    entries this host writes for itself embed LLVM *tuning* pseudo-features
    (+prefer-no-scatter/+prefer-no-gather) that the loader's runtime
    CPU-feature check rejects, so self-written entries never reload cleanly
    either (verified round 5 with a fresh machine-keyed dir: every load
    errors in cpu_aot_loader). Pinning `--xla_cpu_max_isa=AVX2` suppresses
    the pseudo-features and makes SMALL entries reload — but an in-suite
    reload of a large 8-device shard_map executable still segfaulted in
    backend.deserialize_executable (round 5, reproducible position), so
    the CPU policy stays NO CACHE; tunneled-TPU sessions keep one in
    their own dir, which pure-CPU processes never open."""
    plats = platform or ""
    if not plats:
        try:
            import jax

            plats = jax.config.jax_platforms or ""
        except Exception:
            pass
    if not plats:
        plats = _os.environ.get("JAX_PLATFORMS", "") or ""
    first = plats.split(",")[0].strip().lower()
    if first == "cpu":
        return None
    return _os.path.join(_os.path.expanduser("~"), ".cache", "zolt_tpu_xla_tpu")


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the prover's sumcheck rounds compile
    one kernel per (table-size, degree) shape; caching makes repeat proves and
    cross-process runs skip recompilation — but only on the tunneled-TPU
    platform (see _default_cache_dir for why CPU caching is unsafe here).
    Opt out with ZOLT_TPU_NO_CACHE=1; a dir already pinned via jax.config
    (conftest, drivers) is left alone."""
    if _os.environ.get("ZOLT_TPU_NO_CACHE"):
        return
    import jax

    try:
        if jax.config.jax_compilation_cache_dir is not None:
            return  # explicitly pinned by the embedding process — honor it
    except Exception:
        pass
    cache_dir = _os.environ.get("ZOLT_TPU_CACHE_DIR") or _default_cache_dir()
    if cache_dir is None:
        return
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these options


_enable_compilation_cache()
