"""Polynomial layer + generic sumcheck engine tests (the example-sumcheck
config from BASELINE.json, CPU-runnable)."""

import numpy as np

from zolt_tpu.field import FR, limb
from zolt_tpu.field.limb import FR_C
from zolt_tpu.poly import dense, unipoly
from zolt_tpu.sumcheck import ProductSumcheck, initial_claim_product, run_sumcheck, verify_sumcheck
from zolt_tpu.transcript import Blake2bTranscript

P = FR.p
RNG = np.random.default_rng(99)


def rand_ints(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def mle_eval_ref(evals, point):
    """Little-endian MLE evaluation oracle in Python ints."""
    acc = 0
    for i, e in enumerate(evals):
        term = e
        for j, pj in enumerate(point):
            term = term * (pj if (i >> j) & 1 else (1 - pj)) % P
        acc = (acc + term) % P
    return acc


def test_bind_low_semantics():
    evals = rand_ints(8)
    r = rand_ints(1)[0]
    E = limb.encode(evals, FR_C)
    bound = dense.bind_low(E, limb.encode([r], FR_C)[0])
    got = [int(v) for v in limb.decode(bound)]
    expect = [(evals[2 * i] + r * (evals[2 * i + 1] - evals[2 * i])) % P for i in range(4)]
    assert got == expect


def test_bind_first_semantics():
    evals = rand_ints(8)
    r = rand_ints(1)[0]
    E = limb.encode(evals, FR_C)
    bound = dense.bind_first(E, limb.encode([r], FR_C)[0])
    got = [int(v) for v in limb.decode(bound)]
    expect = [((1 - r) * evals[i] + r * evals[i + 4]) % P for i in range(4)]
    assert got == expect


def test_evaluate_matches_oracle():
    evals = rand_ints(16)
    point = rand_ints(4)
    E = limb.encode(evals, FR_C)
    assert dense.evaluate(E, point) == mle_eval_ref(evals, point)


def test_eq_evals_partition_of_unity_and_indexing():
    r = rand_ints(3)
    eq = dense.eq_evals(r)
    vals = [int(v) for v in limb.decode(eq)]
    assert sum(vals) % P == 1  # partition of unity
    # big-endian: index i bits (MSB..LSB) = (x0, x1, x2) vs r
    for i in range(8):
        x = [(i >> (2 - j)) & 1 for j in range(3)]
        assert vals[i] == dense.eq_mle(r, x, P), f"index {i}"


def test_eq_evals_scaling():
    r = rand_ints(2)
    s = rand_ints(1)[0]
    scaled = [int(v) for v in limb.decode(dense.eq_evals(r, scale=s))]
    base = [int(v) for v in limb.decode(dense.eq_evals(r))]
    assert scaled == [(s * b) % P for b in base]


def test_sum_mod():
    xs = rand_ints(64)
    X = limb.encode(xs, FR_C)
    assert int(limb.decode(dense.sum_mod(X))) == sum(xs) % P


def test_unipoly_interpolate_roundtrip():
    coeffs = rand_ints(4)
    evals = [unipoly.horner_eval(coeffs, t) for t in range(4)]
    assert unipoly.interpolate(evals) == coeffs
    assert unipoly.interpolate_degree3(evals) == coeffs
    comp = unipoly.compress(coeffs)
    hint = (unipoly.horner_eval(coeffs, 0) + unipoly.horner_eval(coeffs, 1)) % P
    assert unipoly.decompress(comp, hint) == coeffs


def test_product_sumcheck_end_to_end():
    # degree-2 sumcheck over A*B, 16 evals: full prover <-> verifier round trip
    a, b = rand_ints(16), rand_ints(16)
    A, B = limb.encode(a, FR_C), limb.encode(b, FR_C)
    claim = initial_claim_product([A, B])
    assert claim == sum(x * y for x, y in zip(a, b)) % P

    inst = ProductSumcheck([A, B])
    tp = Blake2bTranscript(b"test-sumcheck")
    proof = run_sumcheck(inst, tp, claim)

    tv = Blake2bTranscript(b"test-sumcheck")
    final_claim, challenges = verify_sumcheck(proof, tv, claim, num_rounds=4, degree=2)

    # final claim must equal A(r)*B(r) with low-to-high binding (little-endian)
    ar = mle_eval_ref(a, challenges)
    br = mle_eval_ref(b, challenges)
    assert final_claim == ar * br % P
    # prover's own final table entries agree
    fa, fb = inst.final_claims()
    assert (fa, fb) == (ar, br)


def test_sumcheck_soundness_tamper():
    a, b = rand_ints(8), rand_ints(8)
    A, B = limb.encode(a, FR_C), limb.encode(b, FR_C)
    claim = initial_claim_product([A, B])
    inst = ProductSumcheck([A, B])
    proof = run_sumcheck(inst, Blake2bTranscript(b"t"), claim)
    # tamper with a round poly -> challenge mismatch or claim break
    proof.compressed_polys[1][0] = (proof.compressed_polys[1][0] + 1) % P
    try:
        final_claim, ch = verify_sumcheck(proof, Blake2bTranscript(b"t"), claim, 3, 2)
        ar = mle_eval_ref(a, ch)
        br = mle_eval_ref(b, ch)
        assert final_claim != ar * br % P
    except AssertionError:
        pass  # challenge mismatch is also a valid rejection
