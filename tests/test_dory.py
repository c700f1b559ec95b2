"""Dory PCS tests: SRS derivation, GT matrix commit, reduce-and-fold open."""

import numpy as np

from zolt_tpu.curve import g2 as G2, host as G1
from zolt_tpu.curve.pairing import multi_pairing, pairing
from zolt_tpu.field import tower as tw
from zolt_tpu.field.params import FR
from zolt_tpu.pcs import dory
from zolt_tpu.transcript import Blake2bTranscript

P = FR.p
RNG = np.random.default_rng(77)


def rand_ints(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def test_srs_deterministic():
    a = dory.setup(3)
    b = dory.setup(3)
    assert a.sigma == 2 and a.nu == 1
    assert a.g1_vec == b.g1_vec and a.g2_vec == b.g2_vec
    assert all(G1.is_on_curve(p) for p in a.g1_vec)
    assert all(G2.is_on_curve(p) for p in a.g2_vec)


def test_commit_matches_direct_pairing_product():
    srs = dory.setup(3)  # 2 rows x 4 cols
    evals = rand_ints(8)
    c = dory.commit(srs, evals)
    # oracle: Π_{r,c} e(m_rc·g1_c, g2_r) with one big multi-pairing
    pairs = []
    for r in range(2):
        for col in range(4):
            pairs.append((G1.scalar_mul(srs.g1_vec[col], evals[r * 4 + col]), srs.g2_vec[r]))
    assert c == multi_pairing(pairs)


def test_commit_gt_serialization_roundtrip():
    srs = dory.setup(2)
    c = dory.commit(srs, rand_ints(4))
    b = dory.commitment_bytes(c)
    assert len(b) == 384
    assert tw.fp12_from_bytes(b) == c


def test_g1_compression_roundtrip():
    for k in (1, 2, 5, 7, 123456789):
        pt = G1.scalar_mul(G1.G1_GEN, k)
        assert dory.decompress_g1(dory.compress_g1(pt)) == pt
    assert dory.decompress_g1(dory.compress_g1(None)) is None


def test_open_and_structural_verify():
    srs = dory.setup(3)
    evals = rand_ints(8)
    point = rand_ints(3)
    c = dory.commit(srs, evals)
    tp = Blake2bTranscript(b"dory")
    proof = dory.open_with_transcript(srs, evals, point, tp)
    assert len(proof.first) == max(srs.nu, srs.sigma) == 2
    tv = Blake2bTranscript(b"dory")
    assert dory.verify_structure(srs, c, proof, tv)
    # transcript determinism: prover and verifier end in identical states
    assert tp.state == tv.state


def _mle_eval_via_matrix(evals, point, srs):
    left, right = dory._split_point(point, srs.sigma, srs.nu)
    num_cols = 1 << srs.sigma
    y = 0
    for r in range(1 << srs.nu):
        for c in range(num_cols):
            idx = r * num_cols + c
            if idx < len(evals):
                y += left[r] * right[c] * evals[idx]
    return y % P


def test_dory_algebraic_verify_accepts():
    srs = dory.setup(4)  # square: sigma = nu = 2
    evals = rand_ints(16)
    point = rand_ints(4)
    c = dory.commit(srs, evals)
    y = _mle_eval_via_matrix(evals, point, srs)
    tp = Blake2bTranscript(b"dory")
    proof = dory.open_with_transcript(srs, evals, point, tp)
    tv = Blake2bTranscript(b"dory")
    assert dory.verify_with_transcript(srs, c, point, y, proof, tv)
    assert tp.state == tv.state


def test_dory_algebraic_verify_rejects_wrong_eval():
    srs = dory.setup(4)
    evals = rand_ints(16)
    point = rand_ints(4)
    c = dory.commit(srs, evals)
    y = _mle_eval_via_matrix(evals, point, srs)
    tp = Blake2bTranscript(b"dory")
    proof = dory.open_with_transcript(srs, evals, point, tp)
    tv = Blake2bTranscript(b"dory")
    assert not dory.verify_with_transcript(srs, c, point, (y + 1) % P, proof, tv)


def test_dory_algebraic_verify_rejects_wrong_commitment():
    srs = dory.setup(4)
    evals = rand_ints(16)
    point = rand_ints(4)
    y = _mle_eval_via_matrix(evals, point, srs)
    tp = Blake2bTranscript(b"dory")
    proof = dory.open_with_transcript(srs, evals, point, tp)
    bad_c = dory.commit(srs, rand_ints(16))
    tv = Blake2bTranscript(b"dory")
    assert not dory.verify_with_transcript(srs, bad_c, point, y, proof, tv)


def test_dory_algebraic_verify_rejects_tampered_message():
    srs = dory.setup(4)
    evals = rand_ints(16)
    point = rand_ints(4)
    c = dory.commit(srs, evals)
    y = _mle_eval_via_matrix(evals, point, srs)
    tp = Blake2bTranscript(b"dory")
    proof = dory.open_with_transcript(srs, evals, point, tp)
    proof.second[0].c_plus = tw.fp12_mul(proof.second[0].c_plus, proof.second[0].c_minus)
    tv = Blake2bTranscript(b"dory")
    assert not dory.verify_with_transcript(srs, c, point, y, proof, tv)


def test_rectangular_claim_via_square_embedding():
    """Odd num_vars (rectangular σ=ν+1 layout): zero row-padding preserves
    the GT commitment, and the embedded square claim verifies ALGEBRAICALLY
    (dory.square_embedding_point)."""
    n = 5
    evals = rand_ints(1 << n)
    point = rand_ints(n)
    srs_rect = dory.setup(n)
    srs_sq = dory.setup(n + 1)
    assert srs_rect.sigma == 3 and srs_rect.nu == 2
    c_rect = dory.commit(srs_rect, evals)
    padded = evals + [0] * ((1 << (n + 1)) - len(evals))
    c_sq = dory.commit(srs_sq, padded)
    assert c_rect == c_sq, "zero row-padding must preserve the commitment"

    point6 = dory.square_embedding_point(point)
    v = _mle_eval_via_matrix(padded, point6, srs_sq)
    # the embedded value equals the rectangular one (extra row MSBs = 0)
    assert v == _mle_eval_via_matrix(evals, point, srs_rect)

    tp = Blake2bTranscript(b"dory")
    proof = dory.open_with_transcript(srs_sq, padded, point6, tp)
    tv = Blake2bTranscript(b"dory")
    assert dory.verify_with_transcript(srs_sq, c_sq, point6, v, proof, tv)
    # tampering still rejected
    tv2 = Blake2bTranscript(b"dory")
    assert not dory.verify_with_transcript(srs_sq, c_sq, point6,
                                           (v + 1) % P, proof, tv2)
