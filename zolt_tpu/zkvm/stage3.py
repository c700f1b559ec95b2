"""Stage 3 batched sumcheck: Shift + InstructionInput + RegistersClaimReduction.

Byte-exact re-implementation of the reference's Stage3Prover protocol content
(src/zkvm/spartan/stage3_prover.zig). The reference computes Shift/Registers
rounds via an eq+1 prefix-suffix decomposition; here the same instances are
evaluated densely — both produce the true round polynomials of the instance,
so the compressed coefficients are identical:

  Shift (deg 2):  Σ_j eq+1(r_outer, j)·(upc+γpc+γ²virt+γ³first)(j)
                   + γ⁴·eq+1(r_product, j)·(1−noop(j))
  InstrInput (deg 3): Σ_j (eq(r_outer,j)+γ²eq(r_product,j))·(right+γ·left)(j)
      with left = l_rs1·rs1 + l_pc·upc, right = r_rs2·rs2 + r_imm·imm bound
      component-wise (the products make it cubic per round).
  Registers (deg 2): Σ_j eq(r_outer, j)·(rd + γrs1 + γ²rs2)(j)

All tables are big-endian in their r vectors and bound low-to-high; the batch
pads degree-2 instances to cubic via quadratic extrapolation; compressed
[c0,c2,c3] rounds with the 125-bit challenge; 16 final witness claims absorbed
in the reference order.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

from ..field.params import FR
from ..poly import unipoly
from ..r1cs import inputs as ri
from .stage2_batch import _eq_table_be, _lagrange_eval_0123

P = FR.p


def _eq_plus_one_table(r: list[int], size: int) -> list[int]:
    from ..poly.special import eq_plus_one_evals

    return eq_plus_one_evals(r)[:size]


def _fold(arr: list[int], r: int) -> list[int]:
    half = len(arr) // 2
    return [(arr[2 * i] + r * (arr[2 * i + 1] - arr[2 * i])) % P for i in range(half)]


def _lerp3(lo: int, hi: int) -> tuple[int, int, int]:
    """values at t = 0, 2, 3."""
    v2 = (2 * hi - lo) % P
    v3 = (v2 + hi - lo) % P
    return lo, v2, v3


@dataclass
class Stage3Result:
    compressed_polys: list[list[int]] = dfield(default_factory=list)
    challenges: list[int] = dfield(default_factory=list)
    gamma_shift_powers: list[int] = dfield(default_factory=list)
    gamma_instr: int = 0
    gamma_reg: int = 0
    batching_coeffs: list[int] = dfield(default_factory=list)
    input_claims: list[int] = dfield(default_factory=list)
    shift_claims: dict = dfield(default_factory=dict)
    instr_claims: dict = dfield(default_factory=dict)
    reg_claims: dict = dfield(default_factory=dict)
    final_claim: int = 0


def prove_stage3(transcript, witness_rows, n_cycle_vars: int,
                 r_outer: list[int], r_product: list[int],
                 opening_claims) -> Stage3Result:
    """opening_claims: callable (poly_name, sumcheck_name, index) -> int."""
    res = Stage3Result()
    T = 1 << n_cycle_vars

    # gammas (challengeScalarFull flavor)
    g_shift = transcript.challenge_scalar_full()
    gp = [1]
    for _ in range(4):
        gp.append(gp[-1] * g_shift % P)
    res.gamma_shift_powers = gp
    g_instr = transcript.challenge_scalar_full()
    g_instr2 = g_instr * g_instr % P
    g_reg = transcript.challenge_scalar_full()
    g_reg2 = g_reg * g_reg % P
    res.gamma_instr, res.gamma_reg = g_instr, g_reg

    oc = opening_claims
    shift_input = (oc("NextUnexpandedPC", "SpartanOuter")
                   + gp[1] * oc("NextPC", "SpartanOuter")
                   + gp[2] * oc("NextIsVirtual", "SpartanOuter")
                   + gp[3] * oc("NextIsFirstInSequence", "SpartanOuter")
                   + gp[4] * (1 - oc("NextIsNoop", "SpartanProductVirtualization"))) % P
    instr_input = ((oc("RightInstructionInput", "SpartanOuter")
                    + g_instr * oc("LeftInstructionInput", "SpartanOuter"))
                   + g_instr2 * (oc("RightInstructionInput", "SpartanProductVirtualization")
                                 + g_instr * oc("LeftInstructionInput", "SpartanProductVirtualization"))) % P
    reg_input = (oc("RdWriteValue", "SpartanOuter")
                 + g_reg * oc("Rs1Value", "SpartanOuter")
                 + g_reg2 * oc("Rs2Value", "SpartanOuter")) % P
    res.input_claims = [shift_input, instr_input, reg_input]

    transcript.append_scalar(shift_input)
    transcript.append_scalar(instr_input)
    transcript.append_scalar(reg_input)
    alphas = [transcript.challenge_scalar_full() for _ in range(3)]
    res.batching_coeffs = alphas

    # dense tables
    eqp1_outer = _eq_plus_one_table(r_outer, T)
    eqp1_prod = _eq_plus_one_table(r_product, T)
    eq_outer = _eq_table_be(r_outer)[:T]
    eq_prod = _eq_table_be(r_product)[:T]

    def col(idx):
        return [w[idx] % P for w in witness_rows[:T]] + [0] * (T - len(witness_rows))

    upc = col(ri.Inp.UnexpandedPC)
    pc = col(ri.Inp.PC)
    virt = col(ri.Inp.FlagVirtualInstruction)
    first = col(ri.Inp.FlagIsFirstInSequence)
    noop = col(ri.Inp.FlagIsNoop)
    combo = [(upc[j] + gp[1] * pc[j] + gp[2] * virt[j] + gp[3] * first[j]) % P
             for j in range(T)]
    one_minus_noop = [(1 - noop[j]) % P for j in range(T)]

    l_rs1 = col(ri.Inp.FlagLeftOperandIsRs1)
    rs1 = col(ri.Inp.Rs1Value)
    l_pc = col(ri.Inp.FlagLeftOperandIsPC)
    i_upc = col(ri.Inp.UnexpandedPC)
    r_rs2 = col(ri.Inp.FlagRightOperandIsRs2)
    rs2 = col(ri.Inp.Rs2Value)
    r_imm = col(ri.Inp.FlagRightOperandIsImm)
    imm = col(ri.Inp.Imm)

    rd = col(ri.Inp.RdWriteValue)
    r_rs1v = col(ri.Inp.Rs1Value)
    r_rs2v = col(ri.Inp.Rs2Value)
    reg_combo = [(rd[j] + g_reg * r_rs1v[j] + g_reg2 * r_rs2v[j]) % P for j in range(T)]

    shift_claim, instr_claim, reg_claim = shift_input, instr_input, reg_input
    combined_claim = (shift_input * alphas[0] + instr_input * alphas[1]
                      + reg_input * alphas[2]) % P

    instr_arrays = [l_rs1, rs1, l_pc, i_upc, r_rs2, rs2, r_imm, imm]
    eq_arrays = [eq_outer, eq_prod]

    for rnd in range(n_cycle_vars):
        half = len(eqp1_outer) // 2
        # Shift (deg 2): evals at 0, 2 (p1 from claim)
        s0 = s2 = 0
        for j in range(half):
            a0, a2, _ = _lerp3(eqp1_outer[2 * j], eqp1_outer[2 * j + 1])
            b0, b2, _ = _lerp3(combo[2 * j], combo[2 * j + 1])
            c0_, c2_, _ = _lerp3(eqp1_prod[2 * j], eqp1_prod[2 * j + 1])
            d0, d2, _ = _lerp3(one_minus_noop[2 * j], one_minus_noop[2 * j + 1])
            s0 = (s0 + a0 * b0 + gp[4] * c0_ % P * d0) % P
            s2 = (s2 + a2 * b2 + gp[4] * c2_ % P * d2) % P
        shift_evals = [s0, (shift_claim - s0) % P, s2]

        # InstrInput (deg 3): evals at 0, 2, 3 (p1 from claim)
        i0 = i2 = i3 = 0
        for j in range(half):
            vals = {}
            for name, arr in (("lr", l_rs1), ("r1", rs1), ("lp", l_pc), ("up", i_upc),
                              ("rr", r_rs2), ("r2", rs2), ("ri", r_imm), ("im", imm),
                              ("eo", eq_outer), ("ep", eq_prod)):
                vals[name] = _lerp3(arr[2 * j], arr[2 * j + 1])
            for t_i, t in enumerate((0, 1, 2)):
                left = (vals["lr"][t] * vals["r1"][t] + vals["lp"][t] * vals["up"][t]) % P
                right = (vals["rr"][t] * vals["r2"][t] + vals["ri"][t] * vals["im"][t]) % P
                eqw = (vals["eo"][t] + g_instr2 * vals["ep"][t]) % P
                f = eqw * ((right + g_instr * left) % P) % P
                if t_i == 0:
                    i0 = (i0 + f) % P
                elif t_i == 1:
                    i2 = (i2 + f) % P
                else:
                    i3 = (i3 + f) % P
        instr_evals = [i0, (instr_claim - i0) % P, i2, i3]

        # Registers (deg 2)
        g0 = g2 = 0
        for j in range(half):
            a0, a2, _ = _lerp3(eq_outer[2 * j], eq_outer[2 * j + 1])
            b0, b2, _ = _lerp3(reg_combo[2 * j], reg_combo[2 * j + 1])
            g0 = (g0 + a0 * b0) % P
            g2 = (g2 + a2 * b2) % P
        reg_evals = [g0, (reg_claim - g0) % P, g2]

        # combine (pad deg-2 to cubic: p3 = 3p2 - 3p1 + p0)
        shift_p3 = (3 * shift_evals[2] - 3 * shift_evals[1] + shift_evals[0]) % P
        reg_p3 = (3 * reg_evals[2] - 3 * reg_evals[1] + reg_evals[0]) % P
        combined = []
        for t in range(4):
            sv = shift_evals[t] if t < 3 else shift_p3
            iv = instr_evals[t]
            gv = reg_evals[t] if t < 3 else reg_p3
            combined.append((sv * alphas[0] + iv * alphas[1] + gv * alphas[2]) % P)

        coeffs = unipoly.interpolate(combined)
        compressed = unipoly.compress(coeffs)
        res.compressed_polys.append(compressed)
        transcript.append_message(b"UniPoly_begin")
        for c in compressed:
            transcript.append_scalar(c)
        transcript.append_message(b"UniPoly_end")
        r = transcript.challenge_scalar()
        res.challenges.append(r)

        combined_claim = unipoly.horner_eval(coeffs, r)
        shift_claim = unipoly.horner_eval(
            unipoly.interpolate(shift_evals), r)
        instr_claim = _lagrange_eval_0123(instr_evals, r)
        reg_claim = unipoly.horner_eval(unipoly.interpolate(reg_evals), r)

        # bind everything low-to-high
        eqp1_outer = _fold(eqp1_outer, r)
        eqp1_prod = _fold(eqp1_prod, r)
        combo = _fold(combo, r)
        one_minus_noop = _fold(one_minus_noop, r)
        upc, pc, virt, first, noop = (_fold(a, r) for a in (upc, pc, virt, first, noop))
        for k in range(len(instr_arrays)):
            instr_arrays[k] = _fold(instr_arrays[k], r)
        (l_rs1, rs1, l_pc, i_upc, r_rs2, rs2, r_imm, imm) = instr_arrays
        eq_outer = _fold(eq_outer, r)
        eq_prod = _fold(eq_prod, r)
        reg_combo = _fold(reg_combo, r)
        rd, r_rs1v, r_rs2v = (_fold(a, r) for a in (rd, r_rs1v, r_rs2v))

    res.final_claim = combined_claim
    res.instance_final_claims = [shift_claim, instr_claim, reg_claim]
    res.shift_claims = {"unexpanded_pc": upc[0], "pc": pc[0], "is_virtual": virt[0],
                        "is_first_in_sequence": first[0], "is_noop": noop[0]}
    res.instr_claims = {"left_is_rs1": l_rs1[0], "rs1_value": rs1[0],
                        "left_is_pc": l_pc[0], "unexpanded_pc": i_upc[0],
                        "right_is_rs2": r_rs2[0], "rs2_value": rs2[0],
                        "right_is_imm": r_imm[0], "imm": imm[0]}
    res.reg_claims = {"rd_write_value": rd[0], "rs1_value": r_rs1v[0],
                      "rs2_value": r_rs2v[0]}

    # cache_openings absorption (stage3_prover.zig:703-726)
    for v in (res.shift_claims["unexpanded_pc"], res.shift_claims["pc"],
              res.shift_claims["is_virtual"], res.shift_claims["is_first_in_sequence"],
              res.shift_claims["is_noop"],
              res.instr_claims["left_is_rs1"], res.instr_claims["rs1_value"],
              res.instr_claims["left_is_pc"], res.instr_claims["unexpanded_pc"],
              res.instr_claims["right_is_rs2"], res.instr_claims["rs2_value"],
              res.instr_claims["right_is_imm"], res.instr_claims["imm"],
              res.reg_claims["rd_write_value"], res.reg_claims["rs1_value"],
              res.reg_claims["rs2_value"]):
        transcript.append_scalar(v)
    return res
