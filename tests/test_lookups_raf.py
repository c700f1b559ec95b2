"""Stage 8/9 (InstructionReadRaf + InstructionRaVirtualization) tests.

Differential strategy: the fast incremental phase-A machinery is replayed
round by round against the slow generic closed-form oracle
(lookups_raf.slow_phase_a_round_evals), and the terminal w/cs claims are
recomputed independently from first principles. A full verifier round-trip
plus tamper rejection close the loop.
"""

import random

from test_raf_gadgets import LAY, _golden_mixed

from zolt_tpu.field.params import FR
from zolt_tpu.r1cs.inputs import Inp, witness_matrix
from zolt_tpu.transcript.blake2b import Blake2bTranscript
from zolt_tpu.vm import elf as elf_mod, run_elf
from zolt_tpu.vm.emulator import pad_with_noop
from zolt_tpu.zkvm.bytecode_tables import BytecodeIndex
from zolt_tpu.zkvm.lookups_raf import (ADDR_VARS, Stage8Result, _eval2,
                                       collect_entries, ctable_values,
                                       prove_stage8, prove_stage9,
                                       slow_phase_a_round_evals,
                                       verify_stage8, verify_stage9)

P = FR.p
RNG = random.Random(42)


def _setup():
    a = _golden_mixed()
    a.halt(LAY, tmp=30, one=31, provable=True)
    blob = elf_mod.write_minimal_elf(a.bytes())
    # the sound pipeline expands div-family rows into virtual sequences;
    # the index and the trace must agree (vm/virtual.py)
    emu = run_elf(blob, expand_virtual=True)
    steps = pad_with_noop(emu.trace)
    bc = BytecodeIndex.from_elf(blob)
    n = (len(steps)).bit_length() - 1
    rows = witness_matrix(steps, sound=True, slots=bc.slots_per_cycle(steps))
    rc1_be = [RNG.randrange(P) for _ in range(n)]
    # claimed input evals at rc1 (big-endian eq weights)
    from zolt_tpu.native.frvec import FrVec

    eqv = FrVec.eq_table_be(rc1_be).to_ints()
    def col(cix):
        return sum(eqv[j] * rows[j][cix] for j in range(len(rows))) % P
    lo = col(Inp.LookupOutput)
    lf = col(Inp.LeftLookupOperand)
    rt = col(Inp.RightLookupOperand)
    return steps, bc, n, rc1_be, eqv, lo, lf, rt


STEPS, BC, N, RC1, EQV, LO, LF, RT = _setup()


def _prove():
    tr = Blake2bTranscript(b"test8")
    p8 = prove_stage8(tr, STEPS, BC, LO, LF, RT, RC1, N)
    return tr, p8


def test_stage8_round_trip_and_terminals():
    tr, p8 = _prove()
    vt = Blake2bTranscript(b"test8")
    ok, info = verify_stage8(vt, p8, LO, LF, RT, RC1, N)
    assert ok, "stage-8 verification failed"

    # independent terminal recomputation
    gammas = info["gammas"]
    r_addr = info["r_addr"]
    rc8 = info["r_cycle"]

    def eq_le(r, j):
        out = 1
        for i, ri in enumerate(r):
            out = out * (ri if (j >> i) & 1 else (1 - ri)) % P
        return out

    entries = collect_entries(STEPS)
    slots = BC.slots_per_cycle(STEPS)
    T = len(STEPS)
    # w_true(j) = chi product of the index bits at r_addr
    wv = [0] * T
    for (j, idx, _) in entries:
        w = 1
        for b in range(ADDR_VARS):
            w = w * (r_addr[b] if (idx >> b) & 1 else (1 - r_addr[b])) % P
        wv[j] = w
    w_expect = sum(eq_le(rc8, j) * wv[j] for j in range(T)) % P
    assert w_expect == p8.w_claim, "w_claim mismatch vs first principles"

    ctab = ctable_values(BC, gammas, r_addr, BC.size)
    cs_expect = sum(eq_le(rc8, j) * ctab[slots[j]] for j in range(T)) % P
    assert cs_expect == p8.cs_claim, "cs_claim mismatch vs the public C table"


def test_stage8_fast_matches_slow_oracle():
    """Replay every address round against the generic closed-form oracle."""
    tr, p8 = _prove()
    entries = collect_entries(STEPS)
    gammas = [1, p8.gamma, p8.gamma ** 2 % P, p8.gamma ** 3 % P]
    claim = p8.input_claim
    r_bound = {}
    for i, cp in enumerate(p8.compressed_addr):
        pos = ADDR_VARS - 1 - i
        e0s, e2s = slow_phase_a_round_evals(entries, gammas, EQV, r_bound,
                                            pos, claim)
        c0, c2 = cp[0] % P, cp[1] % P
        e1 = (claim - c0) % P
        e2 = (c0 + 2 * e1 + 2 * c2 - 2 * (claim - c0 - c2)) % P
        # p(2) = c0 + 2c1 + 4c2 with c1 = claim - 2c0 - c2
        p2 = (c0 + 2 * ((claim - 2 * c0 - c2) % P) + 4 * c2) % P
        assert c0 == e0s, f"round {i} (pos {pos}): e0 fast != slow"
        assert p2 == e2s, f"round {i} (pos {pos}): e2 fast != slow"
        r = p8.r_addr[pos]
        claim = _eval2(cp, claim, r)
        r_bound[pos] = r


def test_stage9_round_trip():
    tr, p8 = _prove()
    p9 = prove_stage9(tr, STEPS, p8.r_addr, p8.r_cycle, p8.w_claim, N)
    vt = Blake2bTranscript(b"test8")
    ok, info = verify_stage8(vt, p8, LO, LF, RT, RC1, N)
    assert ok
    ok9, ch9 = verify_stage9(vt, p9.compressed_polys, p9.oh_claims,
                             p8.r_cycle, p8.w_claim, N)
    assert ok9, "stage-9 verification failed"
    assert ch9 == p9.challenges


def test_stage8_tamper_rejected():
    tr, p8 = _prove()
    import copy

    bad = copy.deepcopy(p8)
    bad.w_claim = (bad.w_claim + 1) % P
    vt = Blake2bTranscript(b"test8")
    ok, _ = verify_stage8(vt, bad, LO, LF, RT, RC1, N)
    assert not ok

    bad2 = copy.deepcopy(p8)
    bad2.compressed_addr[17][0] = (bad2.compressed_addr[17][0] + 1) % P
    vt = Blake2bTranscript(b"test8")
    ok2, _ = verify_stage8(vt, bad2, LO, LF, RT, RC1, N)
    assert not ok2

    bad3 = copy.deepcopy(p8)
    bad3.const_claim = (bad3.const_claim + 1) % P
    vt = Blake2bTranscript(b"test8")
    ok3, _ = verify_stage8(vt, bad3, LO, LF, RT, RC1, N)
    assert not ok3
