"""Field arithmetic kernel tests: device limb ops vs Python bigint oracle.

Vectors cross-check the constants the reference publishes (src/field/mod.zig:16-75)
and its unit-test semantics (src/field/mod.zig:1059-1160).
"""

import numpy as np
import pytest

from zolt_tpu.field import FP, FR, limb
from zolt_tpu.field.limb import FP_C, FR_C
from zolt_tpu.field.params import _check_reference_constants

RNG = np.random.default_rng(1234)


def rand_ints(n, p):
    return [int.from_bytes(RNG.bytes(40), "little") % p for _ in range(n)]


def test_reference_constants():
    assert _check_reference_constants()


@pytest.mark.parametrize("fc,fp", [(FR_C, FR), (FP_C, FP)])
def test_encode_decode_roundtrip(fc, fp):
    xs = rand_ints(8, fp.p) + [0, 1, fp.p - 1]
    enc = limb.encode(xs, fc)
    dec = limb.decode(enc, fc)
    assert [int(d) for d in dec] == xs


@pytest.mark.parametrize("fc,fp", [(FR_C, FR), (FP_C, FP)])
def test_add_sub_neg(fc, fp):
    a = rand_ints(16, fp.p) + [0, fp.p - 1]
    b = rand_ints(16, fp.p) + [fp.p - 1, fp.p - 1]
    A, B = limb.encode(a, fc), limb.encode(b, fc)
    assert [int(x) for x in limb.decode(limb.add(A, B, fc), fc)] == [(x + y) % fp.p for x, y in zip(a, b)]
    assert [int(x) for x in limb.decode(limb.sub(A, B, fc), fc)] == [(x - y) % fp.p for x, y in zip(a, b)]
    assert [int(x) for x in limb.decode(limb.neg(A, fc), fc)] == [(-x) % fp.p for x in a]


@pytest.mark.parametrize("fc,fp", [(FR_C, FR), (FP_C, FP)])
def test_mont_mul(fc, fp):
    a = rand_ints(32, fp.p) + [0, 1, fp.p - 1, 2]
    b = rand_ints(32, fp.p) + [fp.p - 1, fp.p - 1, fp.p - 1, (fp.p + 1) // 2]
    A, B = limb.encode(a, fc), limb.encode(b, fc)
    got = [int(x) for x in limb.decode(limb.mont_mul(A, B, fc), fc)]
    assert got == [(x * y) % fp.p for x, y in zip(a, b)]


def test_mont_sqr_and_chain():
    # (a*b + c)^2 - inverse chain, mirrors reference integration "field chain" tests
    a, b, c = rand_ints(3, FR.p)
    A, B, C = (limb.encode([x], FR_C) for x in (a, b, c))
    t = limb.add(limb.mont_mul(A, B), C)
    t2 = limb.mont_sqr(t)
    expect = pow((a * b + c) % FR.p, 2, FR.p)
    assert int(limb.decode(t2)[0]) == expect


def test_inverse():
    xs = rand_ints(4, FR.p) + [1, FR.p - 1]
    X = limb.encode(xs, FR_C)
    inv = limb.inverse(X, FR_C)
    got = [int(v) for v in limb.decode(inv, FR_C)]
    assert got == [pow(x, -1, FR.p) for x in xs]


def test_inverse_zero_is_zero():
    z = limb.zeros((1,))
    assert int(limb.decode(limb.inverse(z, FR_C))[0]) == 0


def test_batch_inverse():
    xs = rand_ints(33, FR.p)
    xs[7] = 0  # zero passthrough
    X = limb.encode(xs, FR_C)
    inv = limb.batch_inverse(X, FR_C)
    got = [int(v) for v in limb.decode(inv, FR_C)]
    expect = [pow(x, -1, FR.p) if x != 0 else 0 for x in xs]
    assert got == expect


def test_montgomery_form_matches_reference_layout():
    # Montgomery form of 1 must equal the reference's BN254_R limbs
    # (src/field/mod.zig:23-28) reinterpreted as 16-bit limbs.
    one = limb.one_mont((), FR_C)
    from zolt_tpu.field.params import from_limbs
    assert from_limbs(np.asarray(one)) == FR.r


def test_batched_shapes():
    xs = rand_ints(12, FR.p)
    X = limb.encode(xs, FR_C).reshape(3, 4, -1)
    Y = limb.mont_mul(X, X)
    assert Y.shape == (3, 4, 16)
    got = limb.decode(Y.reshape(12, 16))
    assert [int(v) for v in got] == [(x * x) % FR.p for x in xs]
