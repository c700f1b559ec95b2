"""BN254 G2 (over Fp2) host arithmetic.

Curve: y^2 = x^3 + 3/ξ with ξ = 9+u (the D-twist of G1). Points are
((x0,x1),(y0,y1)) Fp2 coordinate pairs; None is the identity.
Reference: src/field/pairing.zig:749-944.
"""

from __future__ import annotations

from ..field import tower as tw
from ..field.params import FR

# b2 = 3 / (9 + u)
B2 = tw.fp2_mul(tw.fp2_inv(tw.XI), (3, 0))

# Standard BN254 G2 generator
G2_GEN = (
    (
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    (
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)

Point = tuple | None


def is_on_curve(pt: Point) -> bool:
    if pt is None:
        return True
    x, y = pt
    return tw.fp2_sub(tw.fp2_sqr(y), tw.fp2_add(tw.fp2_mul(tw.fp2_sqr(x), x), B2)) == (0, 0)


def neg(pt: Point) -> Point:
    if pt is None:
        return None
    return (pt[0], tw.fp2_neg(pt[1]))


def add(a: Point, b: Point) -> Point:
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if tw.fp2_add(y1, y2) == (0, 0):
            return None
        lam = tw.fp2_mul(tw.fp2_scalar(tw.fp2_sqr(x1), 3), tw.fp2_inv(tw.fp2_scalar(y1, 2)))
    else:
        lam = tw.fp2_mul(tw.fp2_sub(y2, y1), tw.fp2_inv(tw.fp2_sub(x2, x1)))
    x3 = tw.fp2_sub(tw.fp2_sub(tw.fp2_sqr(lam), x1), x2)
    y3 = tw.fp2_sub(tw.fp2_mul(lam, tw.fp2_sub(x1, x3)), y1)
    return (x3, y3)


def double(a: Point) -> Point:
    return add(a, a)


def scalar_mul(pt: Point, k: int) -> Point:
    k %= FR.p
    acc: Point = None
    base = pt
    while k:
        if k & 1:
            acc = add(acc, base)
        base = add(base, base)
        k >>= 1
    return acc
