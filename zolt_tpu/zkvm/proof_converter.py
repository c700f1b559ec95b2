"""Jolt-compatible 7-stage proof converter (orchestration).

Mirrors the reference's ProofConverter.convertWithTranscript flow
(src/zkvm/proof_converter.zig:967-2700). Round-1 build status:

  stage 1: BIT-EXACT (streaming_outer.py, verified vs logs/zolt.log)
  stage 1→2 bridge: 36 R1CS input opening claims at r_cycle, absorbed in
    Jolt's ALL_R1CS_INPUTS order (proof_converter.zig:690-770) — BIT-EXACT
  stage 2: product-virtual UniSkip (deg-12, 13 coeffs) — BIT-EXACT
  stages 2 batch / 3..7: follow-on rounds.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

from ..field.params import FR
from ..poly import unipoly
from ..r1cs import inputs as ri
from ..r1cs import uniskip as us
from .jolt_types import JoltProof, OpeningClaims, OpeningId, SumcheckId, UniSkipFirstRoundProof, VirtualPolynomial
from .streaming_outer import Stage1Proof, prove_stage1_jolt

P = FR.p

# Jolt's ALL_R1CS_INPUTS order -> our witness indices (identical layout,
# OpFlags 0..12 are FlagAddOperands..FlagIsFirstInSequence)
R1CS_VIRTUAL_POLYS: list[VirtualPolynomial] = (
    [VirtualPolynomial.named(n) for n in (
        "LeftInstructionInput", "RightInstructionInput", "Product",
        "WriteLookupOutputToRD", "WritePCtoRD", "ShouldBranch", "PC",
        "UnexpandedPC", "Imm", "RamAddress", "Rs1Value", "Rs2Value",
        "RdWriteValue", "RamReadValue", "RamWriteValue", "LeftLookupOperand",
        "RightLookupOperand", "NextUnexpandedPC", "NextPC", "NextIsVirtual",
        "NextIsFirstInSequence", "LookupOutput", "ShouldJump")]
    + [VirtualPolynomial.named("OpFlags", i) for i in range(13)]
)


def eq_evals_be(r: list[int], size: int) -> list[int]:
    """Big-endian eq table (r[0] = MSB) of `size` entries."""
    out = [1]
    for t in r:
        nxt = []
        for v in out:
            nxt.append(v * (1 - t) % P)
            nxt.append(v * t % P)
        out = nxt
    return out[:size]


def compute_claimed_inputs(witness_rows: list[list[int]], r_cycle_be: list[int]) -> list[int]:
    """MLE evals of all 43 witness columns at r_cycle (big-endian)."""
    eq = eq_evals_be(r_cycle_be, len(witness_rows))
    out = [0] * ri.NUM_INPUTS
    for t, w in enumerate(witness_rows):
        e = eq[t]
        if e == 0:
            continue
        for i in range(ri.NUM_INPUTS):
            if w[i]:
                out[i] = (out[i] + e * w[i]) % P
    return out


def add_spartan_outer_claims(claims: OpeningClaims, witness_rows, r_cycle_be,
                             uni_skip_claim: int, transcript) -> list[int]:
    """Insert + absorb the 36 input claims (Jolt order) and the UniSkip claim."""
    input_evals = compute_claimed_inputs(witness_rows, r_cycle_be)
    for jolt_idx, poly in enumerate(R1CS_VIRTUAL_POLYS):
        claim = input_evals[jolt_idx]  # our layout matches Jolt's first 36
        claims.insert(OpeningId.virtual(poly, SumcheckId.SpartanOuter), claim)
        transcript.append_scalar(claim)
    claims.insert(
        OpeningId.virtual(VirtualPolynomial.named("UnivariateSkip"), SumcheckId.SpartanOuter),
        uni_skip_claim)
    return input_evals


# ---------------------------------------------------------------------------
# Stage 2: product-virtual UniSkip
# ---------------------------------------------------------------------------

PRODUCT_VIRTUAL_NAMES = ["Product", "WriteLookupOutputToRD", "WritePCtoRD",
                         "ShouldBranch", "ShouldJump"]


def extract_product_factors(witness_rows: list[list[int]]) -> list[list[int]]:
    """The 8 product factors per cycle (proof_converter.zig extractProductFactors)."""
    n = len(witness_rows)
    out = []
    for idx, w in enumerate(witness_rows):
        next_is_noop = witness_rows[idx + 1][ri.Inp.FlagIsNoop] if idx + 1 < n else 1
        out.append([
            w[ri.Inp.LeftInstructionInput],
            w[ri.Inp.RightInstructionInput],
            w[ri.Inp.FlagIsRdNotZero],
            w[ri.Inp.FlagWriteLookupOutputToRD],
            w[ri.Inp.FlagJump],
            w[ri.Inp.LookupOutput],
            w[ri.Inp.FlagBranch],
            next_is_noop,
        ])
    return out


def product_virtual_extended_evals(cycle_factors: list[list[int]],
                                   tau: list[int]) -> list[int]:
    """Extended evals at {-3, 3, -4, 4} of the fused product polynomial
    (univariate_skip.zig computeProductVirtualExtendedEvals). The eq table
    uses only the first log2(padded_len) entries of tau — tau_high is excluded."""
    padded = 1 << max(0, (len(cycle_factors) - 1).bit_length())
    log_n = padded.bit_length() - 1
    eq = eq_evals_be(tau[:log_n], padded)
    out = []
    for j in range(us.PV_DEGREE):
        coeffs = us.PV_COEFFS_PER_J[j]
        total = 0
        for x, f in enumerate(cycle_factors):
            e = eq[x]
            if e == 0:
                continue
            fused_left = (coeffs[0] * f[0] + coeffs[1] * f[2] + coeffs[2] * f[2]
                          + coeffs[3] * f[5] + coeffs[4] * f[4]) % P
            fused_right = (coeffs[0] * f[1] + coeffs[1] * f[3] + coeffs[2] * f[4]
                           + coeffs[3] * f[6] + coeffs[4] * (1 - f[7])) % P
            total = (total + e * (fused_left * fused_right % P)) % P
        out.append(total)
    return out


@dataclass
class Stage2UniSkip:
    tau_high: int = 0
    base_evals: list[int] = dfield(default_factory=list)
    extended_evals: list[int] = dfield(default_factory=list)
    coeffs: list[int] = dfield(default_factory=list)
    r0: int = 0
    uni_skip_claim: int = 0


def prove_stage2_uniskip(witness_rows, stage1: Stage1Proof, input_evals: list[int],
                         transcript) -> Stage2UniSkip:
    """Sample τ_high, build the deg-12 product-virtual UniSkip poly, absorb,
    derive r0 and the claim (proof_converter.zig:1080-1200)."""
    out = Stage2UniSkip()
    out.tau_high = transcript.challenge_scalar()

    # base evals: the 5 product claims from stage 1 (our input layout indices)
    idx = {"Product": ri.Inp.Product, "WriteLookupOutputToRD": ri.Inp.WriteLookupOutputToRD,
           "WritePCtoRD": ri.Inp.WritePCtoRD, "ShouldBranch": ri.Inp.ShouldBranch,
           "ShouldJump": ri.Inp.ShouldJump}
    out.base_evals = [input_evals[idx[n]] for n in PRODUCT_VIRTUAL_NAMES]

    # tau_stage2 = [r_cycle_be ..., tau_high]
    r_cycle_be = list(reversed(stage1.challenges[1:]))
    tau2 = r_cycle_be + [out.tau_high]

    factors = extract_product_factors(witness_rows)
    out.extended_evals = product_virtual_extended_evals(factors, tau2)

    out.coeffs = us.build_uniskip_first_round_poly(
        us.PV_DOMAIN, us.PV_DEGREE, out.extended_evals, out.tau_high,
        base_evals=out.base_evals)

    transcript.append_message(b"UncompressedUniPoly_begin")
    for c in out.coeffs:
        transcript.append_scalar(c)
    transcript.append_message(b"UncompressedUniPoly_end")
    out.r0 = transcript.challenge_scalar()
    out.uni_skip_claim = unipoly.horner_eval(out.coeffs, out.r0)
    transcript.append_scalar(out.uni_skip_claim)
    return out


@dataclass
class JoltConversion:
    proof: JoltProof = dfield(default_factory=JoltProof)
    stage1: Stage1Proof | None = None
    stage2_uniskip: Stage2UniSkip | None = None
    stage2_batch: object = None
    stage3: object = None
    stage4: object = None
    input_evals: list[int] = dfield(default_factory=list)


def convert_with_transcript(padded_steps, tau: list[int], transcript,
                            emulator=None, log_ram_k: int = 16,
                            stages: int = 7) -> JoltConversion:
    """Drive the Jolt proof stages implemented so far. Pass the finished
    emulator to enable the stage-2 batched sumcheck (needs RAM traces)."""
    conv = JoltConversion()
    witness_rows = ri.witness_matrix(padded_steps)

    conv.stage1 = prove_stage1_jolt(padded_steps, tau, transcript)
    conv.proof.stage1_uni_skip = UniSkipFirstRoundProof(conv.stage1.uni_skip_coeffs)
    from .jolt_types import SumcheckInstanceProof

    conv.proof.stage1_sumcheck = SumcheckInstanceProof(conv.stage1.compressed_polys)

    r_cycle_be = list(reversed(conv.stage1.challenges[1:]))
    conv.input_evals = add_spartan_outer_claims(
        conv.proof.opening_claims, witness_rows, r_cycle_be,
        conv.stage1.uni_skip_claim, transcript)

    conv.stage2_uniskip = prove_stage2_uniskip(
        witness_rows, conv.stage1, conv.input_evals, transcript)
    conv.proof.stage2_uni_skip = UniSkipFirstRoundProof(conv.stage2_uniskip.coeffs)
    conv.proof.opening_claims.insert(
        OpeningId.virtual(VirtualPolynomial.named("UnivariateSkip"),
                          SumcheckId.SpartanProductVirtualization),
        conv.stage2_uniskip.uni_skip_claim)

    if emulator is not None:
        from .jolt_types import SumcheckInstanceProof as SIP
        from .stage2_batch import prove_stage2_batch

        n_cycle_vars = len(tau) - 2
        s2u = conv.stage2_uniskip
        r_spartan = list(reversed(conv.stage1.challenges[1:]))
        tau2 = r_spartan + [s2u.tau_high]
        final_ram = dict(emulator.ram.memory)
        conv.stage2_batch = prove_stage2_batch(
            transcript,
            r0_stage2=s2u.r0,
            uni_skip_claim_stage2=s2u.uni_skip_claim,
            tau=tau2,
            r_spartan=r_spartan,
            witness_rows=witness_rows,
            factors=extract_product_factors(witness_rows),
            input_evals=conv.input_evals,
            n_cycle_vars=n_cycle_vars,
            log_ram_k=log_ram_k,
            accesses=emulator.ram.trace,
            initial_ram=getattr(emulator, "initial_memory", {}),
            final_ram=final_ram,
            layout=emulator.device.layout,
            program_inputs=bytes(emulator.device.inputs),
            program_outputs=bytes(emulator.device.outputs),
            is_panicking=emulator.device.panic,
        )
        conv.proof.stage2_sumcheck = SIP(conv.stage2_batch.compressed_polys)

        if stages < 3:
            return conv

        # Stage 3: Shift + InstructionInput + RegistersClaimReduction
        from .stage3 import prove_stage3

        b = conv.stage2_batch
        r_product = list(reversed(b.challenges[-n_cycle_vars:]))
        name_to_idx = {
            "NextUnexpandedPC": ri.Inp.NextUnexpandedPC,
            "NextPC": ri.Inp.NextPC,
            "NextIsVirtual": ri.Inp.NextIsVirtual,
            "NextIsFirstInSequence": ri.Inp.NextIsFirstInSequence,
            "RightInstructionInput": ri.Inp.RightInstructionInput,
            "LeftInstructionInput": ri.Inp.LeftInstructionInput,
            "RdWriteValue": ri.Inp.RdWriteValue,
            "Rs1Value": ri.Inp.Rs1Value,
            "Rs2Value": ri.Inp.Rs2Value,
        }

        def oc(name, sumcheck, index=0):
            if sumcheck == "SpartanOuter":
                return conv.input_evals[name_to_idx[name]]
            # SpartanProductVirtualization claims come from the stage-2 factors
            pv = {"NextIsNoop": 7, "LeftInstructionInput": 0,
                  "RightInstructionInput": 1}
            return b.factor_evals[pv[name]]

        conv.stage3 = prove_stage3(transcript, witness_rows, n_cycle_vars,
                                   r_spartan, r_product, oc)
        conv.proof.stage3_sumcheck = SIP(conv.stage3.compressed_polys)

        if stages < 4:
            return conv

        # Stage 4: registers RWC + RamValEvaluation + RamValFinal
        from .stage4 import prove_stage4

        conv.stage4 = prove_stage4(
            transcript, padded_steps, emulator.ram.trace,
            getattr(emulator, "initial_memory", {}),
            emulator.device.layout.lowest_address(),
            conv.stage2_batch, conv.stage3,
            n_cycle_vars, log_ram_k)
        conv.proof.stage4_sumcheck = SIP(conv.stage4.compressed_polys)
    return conv
