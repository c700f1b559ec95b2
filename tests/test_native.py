"""Differential tests: native BN254 runtime vs the pure-Python oracle."""

import numpy as np
import pytest

from zolt_tpu.curve import g2 as G2, host as G1
from zolt_tpu.field import tower as tw
from zolt_tpu.field.params import FR
from zolt_tpu.native import (
    fp12_pow_native,
    g1_msm_native,
    g2_msm_native,
    get_lib,
    multi_pairing_native,
)

P = FR.p
RNG = np.random.default_rng(99)

pytestmark = pytest.mark.skipif(get_lib() is None,
                                reason="native BN254 runtime unavailable")


def _python_multi_pairing(pairs):
    from zolt_tpu.curve.pairing import final_exponentiation, miller_loop_ark

    f = tw.FP12_ONE
    for p, q in pairs:
        if p is None or q is None:
            continue
        f = tw.fp12_mul(f, miller_loop_ark(p, q))
    return final_exponentiation(f)


def rand_scalar():
    return int.from_bytes(RNG.bytes(40), "little") % P


def test_multi_pairing_matches_python():
    pairs = [(G1.scalar_mul(G1.G1_GEN, k), G2.scalar_mul(G2.G2_GEN, 2 * k + 1))
             for k in (1, 5, 99991)]
    assert multi_pairing_native(pairs) == _python_multi_pairing(pairs)


def test_multi_pairing_empty_and_none():
    assert multi_pairing_native([]) == _python_multi_pairing([])
    assert multi_pairing_native([(None, G2.G2_GEN)]) == _python_multi_pairing([])


def test_g1_msm_random():
    pts = [G1.scalar_mul(G1.G1_GEN, int(RNG.integers(1, 1 << 40))) for _ in range(12)]
    sc = [rand_scalar() for _ in range(12)]
    ref = None
    for p, s in zip(pts, sc):
        X, Y, Z = 0, 1, 0
        for bit in bin(s)[2:]:
            X, Y, Z = G1._jac_dbl(X, Y, Z)
            if bit == "1":
                X, Y, Z = G1._jac_add_affine(X, Y, Z, p[0], p[1])
        ref = G1.add(ref, G1.jacobian_to_affine(X, Y, Z))
    assert g1_msm_native(pts, sc) == ref


def test_g1_msm_cancellation_returns_none():
    pt = G1.scalar_mul(G1.G1_GEN, 7)
    neg = (pt[0], (-pt[1]) % G1.P)
    assert g1_msm_native([pt, neg], [1, 1]) is None


def test_g2_msm_random():
    pts = [G2.scalar_mul(G2.G2_GEN, int(RNG.integers(1, 1 << 40))) for _ in range(6)]
    sc = [rand_scalar() for _ in range(6)]
    # oracle via repeated double-and-add on the (pre-native-routing) path
    import os

    os.environ["ZOLT_TPU_NO_NATIVE"] = "1"
    try:
        import zolt_tpu.native as nat

        saved_lib, saved_tried = nat._LIB, nat._TRIED
        nat._LIB, nat._TRIED = None, True
        ref = None
        for p, s in zip(pts, sc):
            ref = G2.add(ref, G2.scalar_mul(p, s))
        nat._LIB, nat._TRIED = saved_lib, saved_tried
    finally:
        del os.environ["ZOLT_TPU_NO_NATIVE"]
    assert g2_msm_native(pts, sc) == ref


def test_fp12_pow_matches_python():
    gt = _python_multi_pairing([(G1.G1_GEN, G2.G2_GEN)])
    for bits in (1, 17, 64, 125, 254):
        e = int.from_bytes(RNG.bytes((bits + 7) // 8), "little") % (1 << bits)
        assert fp12_pow_native(gt, e) == tw.fp12_pow(gt, e)


def test_pairing_bilinearity_native():
    a, b = 12345, 67890
    lhs = multi_pairing_native([(G1.scalar_mul(G1.G1_GEN, a),
                                 G2.scalar_mul(G2.G2_GEN, b))])
    rhs = multi_pairing_native([(G1.scalar_mul(G1.G1_GEN, a * b), G2.G2_GEN)])
    assert lhs == rhs
