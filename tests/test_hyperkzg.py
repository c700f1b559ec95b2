"""HyperKZG end-to-end: commit (device MSM) -> open -> sound pairing verify."""

import numpy as np
import pytest

from zolt_tpu.field import limb
from zolt_tpu.field.limb import FR_C
from zolt_tpu.field.params import FR
from zolt_tpu.pcs import hyperkzg, srs
from zolt_tpu.transcript import Blake2bTranscript

P = FR.p
RNG = np.random.default_rng(31)


def rand_ints(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def mle_eval(evals, point):
    acc = 0
    for i, e in enumerate(evals):
        t = e
        for j, pj in enumerate(point):
            t = t * (pj if (i >> j) & 1 else 1 - pj) % P
        acc = (acc + t) % P
    return acc


@pytest.fixture(scope="module")
def small_srs():
    return srs.insecure_setup(8)


def test_commit_matches_direct_msm(small_srs):
    evals = rand_ints(8)
    E = limb.encode(evals, FR_C)
    c = hyperkzg.commit(small_srs, E)
    assert c == hyperkzg.commit_ints(small_srs, evals)


def test_open_verify_roundtrip(small_srs):
    evals = rand_ints(8)
    x = rand_ints(3)
    value = mle_eval(evals, x)
    proof = hyperkzg.open_at(small_srs, evals, x, Blake2bTranscript(b"hkzg"))
    C = hyperkzg.commit_ints(small_srs, evals)
    ok = hyperkzg.verify(small_srs, C, x, value, proof, Blake2bTranscript(b"hkzg"))
    assert ok


def test_verify_rejects_wrong_value(small_srs):
    evals = rand_ints(8)
    x = rand_ints(3)
    value = mle_eval(evals, x)
    proof = hyperkzg.open_at(small_srs, evals, x, Blake2bTranscript(b"hkzg"))
    C = hyperkzg.commit_ints(small_srs, evals)
    assert not hyperkzg.verify(small_srs, C, x, (value + 1) % P, proof,
                               Blake2bTranscript(b"hkzg"))


def test_verify_rejects_wrong_commitment(small_srs):
    evals = rand_ints(8)
    evals2 = rand_ints(8)
    x = rand_ints(3)
    value = mle_eval(evals, x)
    proof = hyperkzg.open_at(small_srs, evals, x, Blake2bTranscript(b"hkzg"))
    C2 = hyperkzg.commit_ints(small_srs, evals2)
    assert not hyperkzg.verify(small_srs, C2, x, value, proof,
                               Blake2bTranscript(b"hkzg"))


def test_verify_rejects_tampered_witness(small_srs):
    evals = rand_ints(8)
    x = rand_ints(3)
    value = mle_eval(evals, x)
    proof = hyperkzg.open_at(small_srs, evals, x, Blake2bTranscript(b"hkzg"))
    from zolt_tpu.curve import host as G1

    proof.w[0] = G1.add(proof.w[0], G1.G1_GEN)
    C = hyperkzg.commit_ints(small_srs, evals)
    assert not hyperkzg.verify(small_srs, C, x, value, proof,
                               Blake2bTranscript(b"hkzg"))


def test_mock_commitment_roundtrip_and_binding():
    """MockCommitment parity (reference commitment/mod.zig:64-96)."""
    from zolt_tpu.pcs import mock

    evals = [3, 1, 4, 1, 5, 9, 2, 6]
    point = [11, 22, 33]
    c = mock.commit(evals)
    value, proof = mock.open_at(evals, point)
    assert mock.verify(c, point, value, proof)
    assert not mock.verify(c, point, value + 1, proof)
    bad = list(proof)
    bad[0] += 1
    assert not mock.verify(c, point, value, bad)


def test_batch_open_verify_roundtrip(small_srs):
    """γ-RLC batch APIs (ref mod.zig:558-792, with Fiat-Shamir γ):
    prover↔verifier round trip, tamper rejection, commitment homomorphism."""
    x = rand_ints(3)
    polys = [rand_ints(8) for _ in range(4)]
    cs = hyperkzg.batch_commit(small_srs, polys)
    bp = hyperkzg.batch_open(small_srs, polys, x, Blake2bTranscript(b"hb"))
    assert bp.evaluations == [mle_eval(p, x) for p in polys]
    assert hyperkzg.verify_batch_opening(
        small_srs, cs, x, bp, Blake2bTranscript(b"hb"))
    # tampered claim rejected
    bad = hyperkzg.HyperKZGBatchProof(
        evaluations=[(bp.evaluations[0] + 1) % P] + bp.evaluations[1:],
        proof=bp.proof)
    assert not hyperkzg.verify_batch_opening(
        small_srs, cs, x, bad, Blake2bTranscript(b"hb"))
    # wrong commitment rejected
    cs_bad = [cs[1]] + cs[1:]
    assert not hyperkzg.verify_batch_opening(
        small_srs, cs_bad, x, bp, Blake2bTranscript(b"hb"))
