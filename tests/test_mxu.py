"""MXU field kernels (field/mxu.py): bf16-exact shared-scalar Montgomery
multiplication and folds must be bit-identical to the VPU tier and to the
Python bigint oracle."""

import numpy as np

from zolt_tpu.field import limb, mxu
from zolt_tpu.field.limb import FP_C, FR_C
from zolt_tpu.field.params import FP, FR

RNG = np.random.default_rng(11)


def rand_ints(n, p):
    return [int.from_bytes(RNG.bytes(40), "little") % p for _ in range(n)]


def test_mul_shared_matches_oracle_fr():
    p = FR.p
    xs = rand_ints(257, p) + [0, 1, p - 1]
    s = rand_ints(1, p)[0]
    X = limb.encode(xs, FR_C)
    T = mxu.scalar_toeplitz(FR.mont(s))
    Z = mxu.mul_shared(X, T, FR_C)
    got = [int(v) for v in limb.decode(np.asarray(Z), FR_C)]
    assert got == [x * s % p for x in xs]


def test_mul_shared_matches_oracle_fp():
    p = FP.p
    xs = rand_ints(64, p)
    s = rand_ints(1, p)[0]
    X = limb.encode(xs, FP_C, FP)
    T = mxu.scalar_toeplitz(FP.mont(s))
    Z = mxu.mul_shared(X, T, FP_C)
    got = [int(v) for v in limb.decode(np.asarray(Z), FP_C, FP)]
    assert got == [x * s % p for x in xs]


def test_mul_shared_extreme_scalars():
    """Worst-case carry patterns: s with all-0xFF bytes in Montgomery form
    is not constructible directly, so drive the byte extremes through
    residues whose Montgomery forms are dense."""
    p = FR.p
    xs = [p - 1, p - 2, 1, (1 << 255) % p] + rand_ints(28, p)
    X = limb.encode(xs, FR_C)
    for s in (p - 1, 1, 2, (p + 1) // 2, (1 << 250) % p):
        T = mxu.scalar_toeplitz(FR.mont(s))
        Z = mxu.mul_shared(X, T, FR_C)
        got = [int(v) for v in limb.decode(np.asarray(Z), FR_C)]
        assert got == [x * s % p for x in xs], s


def test_mul_shared_matches_vpu_tier():
    p = FR.p
    xs = rand_ints(128, p)
    s = rand_ints(1, p)[0]
    X = limb.encode(xs, FR_C)
    S = limb.encode([s] * 128, FR_C)
    vpu = np.asarray(limb.mont_mul(X, S, FR_C))
    mx = np.asarray(mxu.mul_shared(X, mxu.scalar_toeplitz(FR.mont(s)), FR_C))
    assert np.array_equal(vpu, mx)


def test_fold_shared_matches_host_fold():
    p = FR.p
    n = 512
    tab = rand_ints(n, p)
    r = rand_ints(1, p)[0]
    T = limb.encode(tab, FR_C)
    folded = mxu.fold_shared(T, mxu.scalar_toeplitz(FR.mont(r)), FR_C)
    got = [int(v) for v in limb.decode(np.asarray(folded), FR_C)]
    want = [(tab[2 * i] + r * (tab[2 * i + 1] - tab[2 * i])) % p
            for i in range(n // 2)]
    assert got == want


def test_bytes8_round_trip():
    xs = rand_ints(32, FR.p)
    X = limb.encode(xs, FR_C)
    import jax.numpy as jnp

    back = mxu.from_bytes8(mxu.to_bytes8(X).astype(jnp.uint32))
    assert np.array_equal(np.asarray(back), np.asarray(X))
