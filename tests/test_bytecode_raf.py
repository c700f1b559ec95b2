"""Stage 10-12 (booleanity, BytecodeReadRaf, BytecodeRa virtualization)
round-trip + tamper tests over the mixed-class trace."""

import copy
import random

from test_lookups_raf import BC, N, STEPS

from zolt_tpu.field.params import FR
from zolt_tpu.transcript.blake2b import Blake2bTranscript
from zolt_tpu.zkvm.bytecode_raf import (bc_addr_vars, prove_stage10,
                                        prove_stage11, prove_stage12,
                                        verify_stage10, verify_stage11,
                                        verify_stage12)

P = FR.p
RNG = random.Random(99)
SLOTS = BC.slots_per_cycle(STEPS)
T = len(STEPS)


def _eq_le(r, j):
    out = 1
    for i, ri in enumerate(r):
        out = out * (ri if (j >> i) & 1 else (1 - ri)) % P
    return out


def test_stage10_round_trip():
    tr = Blake2bTranscript(b"t10")
    p10 = prove_stage10(tr, STEPS, BC, SLOTS, N)

    vt = Blake2bTranscript(b"t10")
    ok, info = verify_stage10(vt, p10.compressed_polys, p10.hw_io,
                              p10.io_oh_claims, p10.bc_oh_claims, N)
    assert ok, "stage-10 verification failed"
    assert info["challenges"] == p10.challenges

    # independent hw_io recomputation from the public tables
    has = BC.has_lookup_table()
    hw = sum(_eq_le(p10.r_hw, j) for j in range(T) if has[SLOTS[j]]) % P
    assert hw == p10.hw_io

    bad = copy.deepcopy(p10)
    bad.io_oh_claims[3] = (bad.io_oh_claims[3] + 1) % P
    vt = Blake2bTranscript(b"t10")
    ok2, _ = verify_stage10(vt, bad.compressed_polys, bad.hw_io,
                            bad.io_oh_claims, bad.bc_oh_claims, N)
    assert not ok2


def _instances():
    g = RNG.randrange(P)
    pt1 = [RNG.randrange(P) for _ in range(N)]
    pt2 = [RNG.randrange(P) for _ in range(N)]
    f1 = BC.gamma_rlc_table(g)
    f2 = BC.has_lookup_table()
    c1 = sum(_eq_le(pt1, j) * f1[SLOTS[j]] for j in range(T)) % P
    c2 = sum(_eq_le(pt2, j) * f2[SLOTS[j]] for j in range(T)) % P
    return [(pt1, f1, c1), (pt2, f2, c2)]


def test_stage11_12_round_trip():
    insts = _instances()
    tr = Blake2bTranscript(b"t11")
    p11 = prove_stage11(tr, SLOTS, BC.log_k, insts, N)
    p12 = prove_stage12(tr, SLOTS, BC.log_k, p11.r_addr, p11.r_cycle,
                        p11.wbc_claim, N)

    vt = Blake2bTranscript(b"t11")
    ok, info = verify_stage11(vt, p11.compressed_polys, p11.wbc_claim,
                              BC.log_k, insts, N)
    assert ok, "stage-11 verification failed"
    assert info["r_addr"] == p11.r_addr
    ok12, ch12 = verify_stage12(vt, p12.compressed_polys, p12.oh_claims,
                                BC.log_k, p11.r_cycle, p11.wbc_claim, N)
    assert ok12, "stage-12 verification failed"
    assert ch12 == p12.challenges

    # independent wbc terminal: chi product of slot bits at r_addr
    m = bc_addr_vars(BC.log_k)
    wv = []
    for j in range(T):
        w = 1
        for b in range(m):
            w = w * (p11.r_addr[b] if (SLOTS[j] >> b) & 1
                     else (1 - p11.r_addr[b])) % P
        wv.append(w)
    expect = sum(_eq_le(p11.r_cycle, j) * wv[j] for j in range(T)) % P
    assert expect == p11.wbc_claim


def test_stage11_tamper_rejected():
    insts = _instances()
    tr = Blake2bTranscript(b"t11")
    p11 = prove_stage11(tr, SLOTS, BC.log_k, insts, N)

    bad = copy.deepcopy(p11)
    bad.wbc_claim = (bad.wbc_claim + 1) % P
    vt = Blake2bTranscript(b"t11")
    ok, _ = verify_stage11(vt, bad.compressed_polys, bad.wbc_claim,
                           BC.log_k, insts, N)
    assert not ok

    # forged instance claim (the verifier recomputes F itself)
    insts_bad = [(insts[0][0], insts[0][1], (insts[0][2] + 1) % P), insts[1]]
    vt = Blake2bTranscript(b"t11")
    ok2, _ = verify_stage11(vt, p11.compressed_polys, p11.wbc_claim,
                            BC.log_k, insts_bad, N)
    assert not ok2
