"""zolt_tpu — TPU-native Jolt-style zkVM prover framework (JAX/XLA/Pallas).

Brand-new implementation with the capabilities of the reference (MatteoMer/zolt,
a Zig Jolt zkVM): BN254 field arithmetic, Pippenger MSM, sumcheck engines,
HyperKZG/Dory polynomial commitments, Blake2b/Keccak Fiat-Shamir transcripts,
an RV64IMC tracer, and the Jolt 7-stage proof schedule — redesigned TPU-first:
batched limb arithmetic on the VPU/MXU, mesh-sharded MSM and sumcheck folds with
ICI collective reductions, host-side transcript and tracer.
"""

__version__ = "0.1.0"
