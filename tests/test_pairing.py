"""Tower + pairing tests: field axioms, G2 sanity, bilinearity."""

from zolt_tpu.curve import g2, host as g1
from zolt_tpu.curve.pairing import FINAL_EXP, multi_pairing, pairing, pairing_check
from zolt_tpu.field import tower as tw
from zolt_tpu.field.params import FR


def test_fp2_axioms():
    a, b = (3, 5), (7, 11)
    assert tw.fp2_mul(a, tw.fp2_inv(a)) == tw.FP2_ONE
    assert tw.fp2_mul(a, b) == tw.fp2_mul(b, a)
    assert tw.fp2_sqr(a) == tw.fp2_mul(a, a)


def test_fp6_fp12_axioms():
    x = (((1, 2), (3, 4), (5, 6)), ((7, 8), (9, 10), (11, 12)))
    assert tw.fp12_mul(x, tw.fp12_inv(x)) == tw.FP12_ONE
    assert tw.fp12_mul(x, tw.FP12_ONE) == x
    # Frobenius is the p-power map
    assert tw.fp12_frob(x, 1) == tw.fp12_pow(x, tw.P)
    # 12 applications = identity
    assert tw.fp12_frob(x, 12) == x


def test_fp12_serialization_roundtrip():
    x = (((1, 2), (3, 4), (5, 6)), ((7, 8), (9, 10), (11, 12)))
    assert tw.fp12_from_bytes(tw.fp12_to_bytes(x)) == x


def test_g2_generator_on_curve():
    assert g2.is_on_curve(g2.G2_GEN)
    assert g2.is_on_curve(g2.double(g2.G2_GEN))
    assert g2.is_on_curve(g2.scalar_mul(g2.G2_GEN, 123456789))
    # prime order: r·G2 = identity
    assert g2.scalar_mul(g2.G2_GEN, FR.p) is None


def test_pairing_bilinearity():
    P1 = g1.G1_GEN
    Q1 = g2.G2_GEN
    e = pairing(P1, Q1)
    assert e != tw.FP12_ONE  # non-degenerate
    # e(2P, Q) == e(P, Q)^2 == e(P, 2Q)
    e2a = pairing(g1.scalar_mul(P1, 2), Q1)
    e2b = pairing(P1, g2.scalar_mul(Q1, 2))
    esq = tw.fp12_sqr(e)
    assert e2a == esq
    assert e2b == esq


def test_pairing_product_check():
    # e(aG1, bG2) · e(-abG1, G2) == 1
    a, b = 7, 13
    pairs = [
        (g1.scalar_mul(g1.G1_GEN, a), g2.scalar_mul(g2.G2_GEN, b)),
        (g1.neg(g1.scalar_mul(g1.G1_GEN, a * b)), g2.G2_GEN),
    ]
    assert pairing_check(pairs)
    bad = [
        (g1.scalar_mul(g1.G1_GEN, a), g2.scalar_mul(g2.G2_GEN, b)),
        (g1.neg(g1.scalar_mul(g1.G1_GEN, a * b + 1)), g2.G2_GEN),
    ]
    assert not pairing_check(bad)


def test_gt_has_order_r():
    e = pairing(g1.G1_GEN, g2.G2_GEN)
    assert tw.fp12_pow(e, FR.p) == tw.FP12_ONE
