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


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: the prover's sumcheck rounds compile
    one kernel per (table-size, degree) shape; caching makes repeat proves and
    cross-process runs skip recompilation. Opt out with ZOLT_TPU_NO_CACHE=1."""
    if _os.environ.get("ZOLT_TPU_NO_CACHE"):
        return
    import jax

    cache_dir = _os.environ.get(
        "ZOLT_TPU_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "zolt_tpu_xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without these options


_enable_compilation_cache()
