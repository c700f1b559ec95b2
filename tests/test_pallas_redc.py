"""Fused Pallas fold tier (field/pallas_redc).

The real-chip exactness and performance runs live in the verify drive
(kernels are asserted bit-identical to mxu.fold_shared on the TPU before
every production claim); here we cover what runs under the CPU test env:
the host-side constant construction, the availability gate, and — via the
Pallas interpreter — the kernel algebra end to end on tiny tables.
"""

import numpy as np
import pytest

from zolt_tpu.field import limb, mxu, pallas_redc as pr
from zolt_tpu.field.limb import FR_C
from zolt_tpu.field.params import FR

P = FR.p
RNG = np.random.default_rng(11)


def _rand_mont(n):
    return [((int.from_bytes(RNG.bytes(40), "little") % P) << 256) % P
            for _ in range(n)]


def test_available_false_on_cpu():
    assert pr.available() is False  # conftest pins JAX_PLATFORMS=cpu


def test_fold_toeplitz_shape_and_algebra():
    r = 123456789
    r_m = (r << 256) % P
    t = pr.fold_toeplitz(r_m)
    assert t.shape == (64, 64)
    # row blocks are the plane-permuted Toeplitz of (1-r) and r
    one_minus_m = (((1 - r) % P) << 256) % P
    ref_top = mxu.scalar_toeplitz(one_minus_m)[pr._PLANE_PERM][:, pr._COL_PERM]
    ref_bot = mxu.scalar_toeplitz(r_m)[pr._PLANE_PERM][:, pr._COL_PERM]
    assert np.array_equal(t[:32], ref_top)
    assert np.array_equal(t[32:], ref_bot)


def test_consts_plane_permutation_consistent():
    np_band, p_band, p_limbs = pr._get_consts(FR_C)
    raw_np, raw_p = mxu._consts(FR_C)
    assert np.array_equal(np_band,
                          raw_np[pr._PLANE_PERM][:, pr._PLANE_PERM])
    assert np.array_equal(p_band, raw_p[pr._PLANE_PERM][:, pr._COL_PERM])
    assert p_limbs.shape == (1, 16)


@pytest.mark.parametrize("n", [64, 256])
def test_fold_kernel_interpret_bit_exact(n, monkeypatch):
    """Run the actual kernel under the Pallas interpreter on CPU and check
    bit-exactness against the XLA tier across a live-prefix schedule."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    _orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return _orig(*a, **k)

    monkeypatch.setattr(pr.pl, "pallas_call", interp_call)

    xs = _rand_mont(n)
    tab = jnp.asarray(limb.ints_to_limbs(xs))
    r = int.from_bytes(RNG.bytes(16), "little") % P
    r_m = (r << 256) % P
    rt = jnp.asarray(mxu.scalar_toeplitz(r_m))
    tp = jnp.asarray(pr.fold_toeplitz(r_m).T.copy())  # fold_tail takes the transposed form

    live = n
    tab_x = tab
    tab_p = tab
    while live >= 8 * pr._SLOTS:
        h = mxu.fold_shared(tab_x, rt, FR_C)
        tab_x = jnp.concatenate([h, jnp.zeros_like(h)])
        tab_p = pr.fold_tail(tab_p, tp, live // 2, FR_C)
        live //= 2
        a, b = np.asarray(tab_x), np.asarray(tab_p)
        assert np.array_equal(a[:live], b[:live])
        assert not b[live:].any()


def test_fold_stack_interpret_bit_exact(monkeypatch):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    _orig = pl.pallas_call

    def interp_call(*a, **k):
        k.setdefault("interpret", True)
        return _orig(*a, **k)

    monkeypatch.setattr(pr.pl, "pallas_call", interp_call)

    k, n = 3, 64
    tabs = jnp.asarray(np.stack(
        [limb.ints_to_limbs(_rand_mont(n)) for _ in range(k)]))
    r_m = (424242 << 256) % P
    rt = jnp.asarray(mxu.scalar_toeplitz(r_m))
    tp = jnp.asarray(pr.fold_toeplitz(r_m).T.copy())
    out = pr.fold_tail_stack(tabs, tp, n // 2, FR_C)
    for j in range(k):
        h = mxu.fold_shared(tabs[j], rt, FR_C)
        ref = jnp.concatenate([h, jnp.zeros_like(h)])
        assert np.array_equal(np.asarray(ref), np.asarray(out[j]))


def test_evals_mxu_matches_mont_path():
    """The MXU inner-product round-eval (stage_engine._evals_mxu +
    _decode_mxu) must equal the native prod_evals_adj values exactly."""
    import jax.numpy as jnp

    from zolt_tpu.native.frvec import FrVec
    from zolt_tpu.parallel import stage_engine as se

    n = 1 << 8
    f = FrVec.from_ints([pr.from_mont(x) for x in _rand_mont(n)])
    e = FrVec.from_ints([pr.from_mont(x) for x in _rand_mont(n)])
    from zolt_tpu.parallel.stage_engine import frvec_to_limbs

    tabs = jnp.stack([jnp.asarray(frvec_to_limbs(f)),
                      jnp.asarray(frvec_to_limbs(e))])
    for deg in (2, 3):
        flat = np.asarray(se._evals_mxu(tabs, deg)).reshape(-1)
        got = se._decode_mxu(flat, deg)
        ref = FrVec.prod_evals_adj([f, e], deg)
        assert got == ref
