"""BN254 optimal ate pairing (host-side).

Generic Miller loop over the curve embedded in Fp12 via the twist map
ψ(x,y) = (x·w², y·w³) — in the tower basis Fp2 embeds directly, so no basis
change is needed. Structure follows the standard optimal-ate recipe (loop over
6x+2, two Frobenius correction lines, easy+hard final exponentiation); the
reference's equivalent is src/field/pairing.zig:1258-1955.

multi_pairing shares one final exponentiation across all pairs — the Dory
commit path depends on this (one final exp per commitment row batch, not per
pairing).
"""

from __future__ import annotations

from ..field import tower as tw
from ..field.params import FP, FR

P = FP.p

BN_X = 4965661367192848881          # BN254 curve parameter x
ATE_LOOP_COUNT = 6 * BN_X + 2       # 29793968203157093288

# w^2 = v and w^3 = v·w as Fp12 elements (tower basis)
_W2 = ((tw.FP2_ZERO, tw.FP2_ONE, tw.FP2_ZERO), tw.FP6_ZERO)
_W3 = (tw.FP6_ZERO, (tw.FP2_ZERO, tw.FP2_ONE, tw.FP2_ZERO))

FINAL_EXP = (P**12 - 1) // FR.p


def _emb_fp(a: int):
    """Fp -> Fp12."""
    return (((a % P, 0), tw.FP2_ZERO, tw.FP2_ZERO), tw.FP6_ZERO)


def _emb_fp2(a):
    """Fp2 -> Fp12 (tower-basis inclusion)."""
    return ((a, tw.FP2_ZERO, tw.FP2_ZERO), tw.FP6_ZERO)


def twist_g2(q):
    """G2 affine (Fp2 coords) -> E(Fp12) affine."""
    if q is None:
        return None
    x, y = q
    return (tw.fp12_mul(_emb_fp2(x), _W2), tw.fp12_mul(_emb_fp2(y), _W3))


def embed_g1(p):
    """G1 affine (Fp coords) -> E(Fp12) affine."""
    if p is None:
        return None
    return (_emb_fp(p[0]), _emb_fp(p[1]))


def _line(p1, p2, t):
    """Evaluate the line through p1,p2 (or tangent at p1) at point t. All
    affine Fp12 points."""
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if x1 != x2:
        m = tw.fp12_mul(tw.fp12_sub(y2, y1), tw.fp12_inv(tw.fp12_sub(x2, x1)))
    elif y1 == y2:
        num = tw.fp12_mul(tw.fp12_sqr(x1), _emb_fp(3))
        m = tw.fp12_mul(num, tw.fp12_inv(tw.fp12_mul(y1, _emb_fp(2))))
    else:
        return tw.fp12_sub(xt, x1)
    return tw.fp12_sub(tw.fp12_mul(m, tw.fp12_sub(xt, x1)), tw.fp12_sub(yt, y1))


def _pt_add12(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if tw.fp12_add(y1, y2) == tw.FP12_ZERO:
            return None
        m = tw.fp12_mul(tw.fp12_mul(tw.fp12_sqr(x1), _emb_fp(3)),
                        tw.fp12_inv(tw.fp12_mul(y1, _emb_fp(2))))
    else:
        m = tw.fp12_mul(tw.fp12_sub(y2, y1), tw.fp12_inv(tw.fp12_sub(x2, x1)))
    x3 = tw.fp12_sub(tw.fp12_sub(tw.fp12_sqr(m), x1), x2)
    y3 = tw.fp12_sub(tw.fp12_mul(m, tw.fp12_sub(x1, x3)), y1)
    return (x3, y3)


def _frob_pt(pt, n: int = 1):
    return (tw.fp12_frob(pt[0], n), tw.fp12_frob(pt[1], n))


def miller_loop(q_emb, p_emb):
    """Miller loop f_{6x+2,Q}(P) with the two optimal-ate correction lines.
    Inputs are embedded E(Fp12) affine points; returns un-exponentiated f."""
    if q_emb is None or p_emb is None:
        return tw.FP12_ONE
    R = q_emb
    f = tw.FP12_ONE
    for bit in bin(ATE_LOOP_COUNT)[3:]:
        f = tw.fp12_mul(tw.fp12_sqr(f), _line(R, R, p_emb))
        R = _pt_add12(R, R)
        if bit == "1":
            f = tw.fp12_mul(f, _line(R, q_emb, p_emb))
            R = _pt_add12(R, q_emb)
    q1 = _frob_pt(q_emb, 1)
    nq2 = _frob_pt(q_emb, 2)
    nq2 = (nq2[0], tw.fp12_sub(tw.FP12_ZERO, nq2[1]))
    f = tw.fp12_mul(f, _line(R, q1, p_emb))
    R = _pt_add12(R, q1)
    f = tw.fp12_mul(f, _line(R, nq2, p_emb))
    return f


def final_exponentiation(f):
    """f^((p^12-1)/r): easy part via conj/inv/frobenius, hard part by direct
    integer exponentiation (host-acceptable; TODO(perf): x-chain hard part)."""
    # easy: f^((p^6-1)(p^2+1))
    f1 = tw.fp12_mul(tw.fp12_conj(f), tw.fp12_inv(f))
    f2 = tw.fp12_mul(tw.fp12_frob(f1, 2), f1)
    # hard: f2^((p^4 - p^2 + 1)/r)
    hard = (P**4 - P**2 + 1) // FR.p
    return tw.fp12_pow(f2, hard)


def pairing(p_g1, q_g2):
    """e(P, Q) for host G1 affine P and G2 affine Q. Returns GT (Fp12)."""
    if p_g1 is None or q_g2 is None:
        return tw.FP12_ONE
    f = miller_loop(twist_g2(q_g2), embed_g1(p_g1))
    return final_exponentiation(f)


def multi_pairing(pairs):
    """Π e(P_i, Q_i) with a single shared final exponentiation."""
    f = tw.FP12_ONE
    for p_g1, q_g2 in pairs:
        if p_g1 is None or q_g2 is None:
            continue
        f = tw.fp12_mul(f, miller_loop(twist_g2(q_g2), embed_g1(p_g1)))
    return final_exponentiation(f)


def pairing_check(pairs) -> bool:
    """Π e(P_i, Q_i) == 1."""
    return multi_pairing(pairs) == tw.FP12_ONE
