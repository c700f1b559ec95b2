"""Differential tests: every native Fr/group kernel vs the Python oracles.

The native tier (fr_vec.c + bn254.c batch entry points) must agree bit-for-
bit with the big-int implementations — these tests are the contract that
keeps the two from drifting (same method as tests/test_native.py for the
pairing tower)."""

import random

import pytest

from zolt_tpu.field.params import FR
from zolt_tpu.native.frvec import FrVec

P = FR.p
rng = random.Random(1234)


def rvals(n):
    return [rng.randrange(P) for _ in range(n)]


def test_roundtrip_and_first():
    v = rvals(33)
    fv = FrVec.from_ints(v)
    assert fv.to_ints() == v
    assert fv.first() == v[0]
    assert len(fv) == 33


def test_from_u64_and_indicator_and_filled():
    import numpy as np

    v64 = [rng.randrange(1 << 64) for _ in range(64)]
    assert FrVec.from_ints(v64).to_ints() == v64
    assert FrVec.from_u64_array(np.array(v64, dtype=np.uint64)).to_ints() == v64
    pos = [3, 17, 40]
    ind = FrVec.indicator(64, pos).to_ints()
    assert [i for i, x in enumerate(ind) if x] == pos
    assert FrVec.filled(5, 7).to_ints() == [7] * 5


def test_eq_table_be():
    pt = rvals(6)
    got = FrVec.eq_table_be(pt).to_ints()
    for j in range(64):
        exp = 1
        for b in range(6):
            bit = (j >> (5 - b)) & 1
            exp = exp * ((pt[b] if bit else (1 - pt[b])) % P) % P
        assert got[j] == exp


def test_folds():
    v = rvals(64)
    r = rng.randrange(P)
    assert FrVec.from_ints(v).fold_adj(r).to_ints() == \
        [(v[2 * i] + r * (v[2 * i + 1] - v[2 * i])) % P for i in range(32)]
    assert FrVec.from_ints(v).fold_half(r).to_ints() == \
        [(v[i] + r * (v[i + 32] - v[i])) % P for i in range(32)]


def test_quad_sums_half():
    f, e = rvals(64), rvals(64)
    a0, a2 = FrVec.quad_sums_half(FrVec.from_ints(f), FrVec.from_ints(e))
    h = 32
    assert a0 == sum(e[j] * f[j] for j in range(h)) % P
    assert a2 == sum((2 * f[j + h] - f[j]) * (2 * e[j + h] - e[j])
                     for j in range(h)) % P


@pytest.mark.parametrize("k,degree", [(2, 2), (3, 3), (4, 5)])
def test_prod_evals(k, degree):
    tabs = [rvals(16) for _ in range(k)]
    vecs = [FrVec.from_ints(t) for t in tabs]
    adj = FrVec.prod_evals_adj(vecs, degree)
    half_ = FrVec.prod_evals_half(vecs, degree)
    for t in range(degree + 1):
        s_adj = s_half = 0
        for i in range(8):
            pa = ph = 1
            for tab in tabs:
                pa = pa * ((tab[2 * i] + t * (tab[2 * i + 1] - tab[2 * i])) % P) % P
                ph = ph * ((tab[i] + t * (tab[i + 8] - tab[i])) % P) % P
            s_adj = (s_adj + pa) % P
            s_half = (s_half + ph) % P
        assert adj[t] == s_adj
        assert half_[t] == s_half


def test_elementwise_and_reductions():
    a, b = rvals(32), rvals(32)
    fa, fb = FrVec.from_ints(a), FrVec.from_ints(b)
    c = rng.randrange(P)
    assert fa.add(fb).to_ints() == [(x + y) % P for x, y in zip(a, b)]
    assert fa.sub(fb).to_ints() == [(x - y) % P for x, y in zip(a, b)]
    assert fa.mul(fb).to_ints() == [x * y % P for x, y in zip(a, b)]
    assert fa.copy().axpy_(fb, c).to_ints() == [(x + c * y) % P for x, y in zip(a, b)]
    assert fa.scale(c).to_ints() == [x * c % P for x in a]
    assert fa.inner(fb) == sum(x * y for x, y in zip(a, b)) % P
    assert fa.sum() == sum(a) % P
    assert FrVec.interleave(fa, fb).to_ints() == \
        [v for pair in zip(a, b) for v in pair]
    assert FrVec.triple_inner(fa, fb, fa) == \
        sum(x * y % P * x for x, y in zip(a, b)) % P


def test_mle_eval_be():
    from zolt_tpu.pcs.batch import mle_eval_be

    v = rvals(40)  # shorter than 2^6: zero-padded
    pt = rvals(6)
    assert FrVec.from_ints(v).mle_eval_be(pt) == mle_eval_be(v, pt)


def test_raf_sums():
    ra = rvals(64)
    s_lo, s_lo_i, s_2, s_2_i = FrVec.raf_sums(FrVec.from_ints(ra))
    e_lo = e_lo_i = e_2 = e_2_i = 0
    for i in range(32):
        lo, hi = ra[2 * i], ra[2 * i + 1]
        ra2 = 2 * hi - lo
        e_lo += lo
        e_lo_i += lo * i
        e_2 += ra2
        e_2_i += ra2 * i
    assert (s_lo, s_lo_i, s_2, s_2_i) == (e_lo % P, e_lo_i % P, e_2 % P, e_2_i % P)


def test_gruen_quad():
    E_out, E_in = rvals(4), rvals(4)
    head_in = 2
    left, right = rvals(32), rvals(32)
    num_groups = 13
    t0, tinf = FrVec.gruen_quad(FrVec.from_ints(E_out), FrVec.from_ints(E_in),
                                head_in, FrVec.from_ints(left),
                                FrVec.from_ints(right), num_groups)
    e0 = eI = 0
    for xo in range(4):
        i0 = iI = 0
        for xi in range(4):
            g = (xo << head_in) | xi
            if g >= num_groups:
                continue
            i0 = (i0 + left[2 * g] * right[2 * g] % P * E_in[xi]) % P
            iI = (iI + (left[2 * g + 1] - left[2 * g])
                  * (right[2 * g + 1] - right[2 * g]) % P * E_in[xi]) % P
        e0 = (e0 + i0 * E_out[xo]) % P
        eI = (eI + iI * E_out[xo]) % P
    assert (t0, tinf) == (e0, eI)


def test_bool_round():
    eb, eh, oh = rvals(32), rvals(32), rvals(32)
    A, B = FrVec.bool_round(FrVec.from_ints(eb), FrVec.from_ints(eh),
                            FrVec.from_ints(oh))
    for t in range(4):
        ea = eb_ = 0
        for i in range(16):
            ebv = (eb[2 * i] + t * (eb[2 * i + 1] - eb[2 * i])) % P
            ehv = (eh[2 * i] + t * (eh[2 * i + 1] - eh[2 * i])) % P
            xv = (oh[2 * i] + t * (oh[2 * i + 1] - oh[2 * i])) % P
            ea = (ea + ebv * xv % P * ((1 - xv) % P)) % P
            eb_ = (eb_ + ehv * xv) % P
        assert A[t] == ea and B[t] == eb_


def test_s4_kernels():
    T, K = 16, 3
    ra = [FrVec.from_ints(rvals(T)) for _ in range(K)]
    wa = [FrVec.from_ints(rvals(T)) for _ in range(K)]
    val = [FrVec.from_ints(rvals(T)) for _ in range(K)]
    inc = rvals(T)
    incv = FrVec.from_ints(inc)
    E_out, E_in = rvals(4), rvals(2)
    head_in = 1
    rai = [r.to_ints() for r in ra]
    wai = [w.to_ints() for w in wa]
    vali = [v.to_ints() for v in val]

    q0, qX2 = FrVec.s4_phase1(FrVec.from_ints(E_out), FrVec.from_ints(E_in),
                              head_in, ra, wa, val, incv, T)
    e0 = eX = 0
    for i in range(T // 2):
        E = E_out[i >> head_in] * E_in[i & 1] % P
        inc0 = inc[2 * i]
        incs = inc[2 * i + 1] - inc0
        c0 = cX = 0
        for k in range(K):
            ra_e, ra_o = rai[k][2 * i], rai[k][2 * i + 1]
            wa_e, wa_o = wai[k][2 * i], wai[k][2 * i + 1]
            v_e, v_o = vali[k][2 * i], vali[k][2 * i + 1]
            c0 += ra_e * v_e + wa_e * (v_e + inc0)
            cX += (ra_o - ra_e) * (v_o - v_e) + (wa_o - wa_e) * (v_o - v_e + incs)
        e0 = (e0 + E * c0) % P
        eX = (eX + E * cX) % P
    assert (q0, qX2) == (e0, eX)

    eq = rvals(T)
    eqv = FrVec.from_ints(eq)
    # phase 2: one register pair (rows 0, 1)
    e0g, e2g = FrVec.s4_phase2(eqv, incv, ra[:2], wa[:2], val[:2], 1, T)
    x0 = x2 = 0
    for j in range(T):
        c0 = rai[0][j] * vali[0][j] + wai[0][j] * (vali[0][j] + inc[j])
        x0 = (x0 + eq[j] * c0) % P
        ra2 = 2 * rai[1][j] - rai[0][j]
        wa2 = 2 * wai[1][j] - wai[0][j]
        v2 = 2 * vali[1][j] - vali[0][j]
        x2 = (x2 + eq[j] * (ra2 * v2 + wa2 * (v2 + inc[j]))) % P
    assert (e0g, e2g) == (x0, x2)

    e0p, e2p, e3p = FrVec.s4_phase3(eqv, incv, ra, wa, val, T)
    exp = [0, 0, 0]
    for j in range(T // 2):
        inc0 = inc[2 * j]
        incs = inc[2 * j + 1] - inc0
        eq0 = eq[2 * j]
        eqs = eq[2 * j + 1] - eq0
        for ti, t in enumerate((0, 2, 3)):
            s = 0
            for k in range(K):
                ra_t = rai[k][2 * j] + t * (rai[k][2 * j + 1] - rai[k][2 * j])
                wa_t = wai[k][2 * j] + t * (wai[k][2 * j + 1] - wai[k][2 * j])
                v_t = vali[k][2 * j] + t * (vali[k][2 * j + 1] - vali[k][2 * j])
                s += ra_t * v_t + wa_t * (v_t + inc0 + t * incs)
            exp[ti] = (exp[ti] + (eq0 + t * eqs) * s) % P
    assert (e0p, e2p, e3p) == tuple(exp)


# ---------------------------------------------------------------------------
# Group kernels (bn254.c batch entry points)
# ---------------------------------------------------------------------------

def test_pippenger_msm_g1_g2():
    from zolt_tpu.curve import host as G1, g2 as G2
    from zolt_tpu.native import g1_msm_native, g1_msm_rows_native, g2_msm_native

    pts = [G1.scalar_mul(G1.G1_GEN, rng.randrange(1, 1 << 40)) for _ in range(40)]
    sc = rvals(40)
    pts[7] = None
    sc[3] = 0
    assert g1_msm_native(pts, sc) == G1.msm(pts, sc)
    rows = [rvals(40) for _ in range(3)]
    got = g1_msm_rows_native(pts, rows)
    assert got == [G1.msm(pts, r) for r in rows]

    qs = [G2.scalar_mul(G2.G2_GEN, rng.randrange(1, 1 << 40)) for _ in range(33)]
    exp = None
    for q, s in zip(qs, sc[:33]):
        exp = G2.add(exp, G2.scalar_mul(q, s))
    assert g2_msm_native(qs, sc[:33]) == exp


def test_g2_batch_mul():
    from zolt_tpu.curve import g2 as G2
    from zolt_tpu.native import g2_batch_mul_native

    sc = rvals(10) + [0]
    got = g2_batch_mul_native(G2.G2_GEN, sc)
    for i, s in enumerate(sc[:10]):
        assert got[i] == G2.scalar_mul(G2.G2_GEN, s)
    assert got[10] is None


def test_group_folds():
    from zolt_tpu.curve import host as G1, g2 as G2
    from zolt_tpu.native import g1_fold_native, g2_fold_native

    xs = [G1.scalar_mul(G1.G1_GEN, rng.randrange(1, 1 << 40)) for _ in range(8)]
    ys = [G1.scalar_mul(G1.G1_GEN, rng.randrange(1, 1 << 40)) for _ in range(8)]
    xs[2] = None
    ys[5] = None
    s = rng.randrange(P)
    got = g1_fold_native(xs, ys, s)
    for i in range(8):
        assert got[i] == G1.add(G1.scalar_mul(xs[i], s) if xs[i] else None, ys[i])
    xs2 = [G2.scalar_mul(G2.G2_GEN, rng.randrange(1, 1 << 40)) for _ in range(8)]
    ys2 = [G2.scalar_mul(G2.G2_GEN, rng.randrange(1, 1 << 40)) for _ in range(8)]
    xs2[0] = None
    got2 = g2_fold_native(xs2, ys2, s)
    for i in range(8):
        t = G2.scalar_mul(xs2[i], s) if xs2[i] else None
        assert got2[i] == (G2.add(t, ys2[i]) if (t or ys2[i]) else None)


def test_multi_pairing_fixed():
    from zolt_tpu.curve import host as G1, g2 as G2
    from zolt_tpu.curve.pairing import multi_pairing
    from zolt_tpu.native import multi_pairing_fixed_native

    g2s = [G2.scalar_mul(G2.G2_GEN, rng.randrange(1, 1 << 40)) for _ in range(7)]
    g1s = [G1.scalar_mul(G1.G1_GEN, rng.randrange(1, 1 << 40)) for _ in range(7)]
    g1s[4] = None
    exp = multi_pairing([(p, q) for p, q in zip(g1s, g2s) if p is not None])
    got = multi_pairing_fixed_native(g1s, g2s, 7)
    if got is None:
        pytest.skip("native runtime unavailable")
    assert got == exp
    # prefix reuse through the line cache
    exp2 = multi_pairing([(p, q) for p, q in zip(g1s[:3], g2s[:3]) if p is not None])
    assert multi_pairing_fixed_native(g1s[:3], g2s, 3) == exp2


def test_no_native_fallbacks_match(tmp_path):
    """Every FrVec op must produce identical values with ZOLT_TPU_NO_NATIVE=1
    (the pure-Python tier is the correctness floor for toolchain-less
    environments)."""
    import json
    import os
    import subprocess
    import sys

    prog = r"""
import json, sys
from zolt_tpu.native.frvec import FrVec, P
from zolt_tpu.native import get_lib
mode = sys.argv[1]
assert (get_lib() is None) == (mode == "fallback"), mode
vals = [(i * 0x9E3779B97F4A7C15 + 12345) % P for i in range(32)]
vals2 = [(i * 0xDEADBEEF + 7) % P for i in range(32)]
a, b = FrVec.from_ints(vals), FrVec.from_ints(vals2)
eq = FrVec.eq_table_be([v % P for v in vals[:5]])
out = {
    "fold": a.copy().fold_adj(98765).to_ints(),
    "foldh": b.copy().fold_half(4321).to_ints(),
    "eq": eq.to_ints(),
    "prod": FrVec.prod_evals_adj([a, b], 3),
    "quad": list(FrVec.quad_sums_half(a, b)),
    "raf": list(FrVec.raf_sums(a)),
    "gruen": list(FrVec.gruen_quad(FrVec.from_ints(vals[:4]),
                                   FrVec.from_ints(vals2[:4]), 2, a, b, 13)),
    "bool": [x for pair in FrVec.bool_round(a, b, a) for x in pair],
    "lincomb": FrVec.lincomb([a, b], [3, 5]).to_ints(),
    "s4p1": list(FrVec.s4_phase1(FrVec.from_ints(vals[:4]),
                                 FrVec.from_ints(vals2[:4]), 2,
                                 [a, b], [b, a], [a, a], b, 32)),
    "s4p2": list(FrVec.s4_phase2(a, b, [a, b], [b, a], [a, a], 1, 32)),
    "s4p3": list(FrVec.s4_phase3(a, b, [a, b], [b, a], [a, a], 32)),
    "mle": a.mle_eval_be([v % P for v in vals2[:5]]),
}
print(json.dumps(out))
"""
    outs = {}
    for mode, env_extra in (("native", {}), ("fallback", {"ZOLT_TPU_NO_NATIVE": "1"})):
        env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
        r = subprocess.run([sys.executable, "-c", prog, mode], env=env,
                           capture_output=True, text=True, timeout=300)
        assert r.returncode == 0, r.stderr[-800:]
        outs[mode] = json.loads(r.stdout.strip().splitlines()[-1])
    assert outs["native"] == outs["fallback"]


@pytest.mark.skipif("ZOLT_TPU_PALLAS_TEST" not in __import__("os").environ,
                    reason="pallas interpret mode walks the ~10k-op unrolled "
                           "kernel jaxpr op-by-op (minutes); the kernel is "
                           "validated bit-exact on the real chip — set "
                           "ZOLT_TPU_PALLAS_TEST=1 to run here")
def test_pallas_product_round_matches_oracle():
    """The Pallas fused sumcheck round (interpret mode on CPU; the same
    kernel is bit-exact on the real chip — see field/pallas_kernels.py
    status note) matches the big-int oracle for t0/tinf and the fold."""
    import numpy as np
    import jax.numpy as jnp

    from zolt_tpu.field import limb
    from zolt_tpu.field.limb import FR_C
    from zolt_tpu.field import pallas_kernels as pk

    n = 128
    az_i = rvals(2 * n)
    bz_i = rvals(2 * n)
    eq_i = rvals(n)
    r_i = rng.randrange(P)
    az = jnp.asarray(np.asarray(limb.encode(az_i, FR_C)))
    bz = jnp.asarray(np.asarray(limb.encode(bz_i, FR_C)))
    eq = jnp.asarray(np.asarray(limb.encode(eq_i, FR_C)))
    r = jnp.asarray(np.asarray(limb.encode([r_i], FR_C)[0]))
    az_f, bz_f, t0, tinf = pk.product_round(az, bz, eq, r, interpret=True)
    t0_i = int(limb.decode(np.asarray(t0)[None], FR_C)[0])
    tinf_i = int(limb.decode(np.asarray(tinf)[None], FR_C)[0])
    assert t0_i == sum(eq_i[i] * az_i[2 * i] % P * bz_i[2 * i]
                       for i in range(n)) % P
    assert tinf_i == sum(eq_i[i] * ((az_i[2 * i + 1] - az_i[2 * i])
                                    * (bz_i[2 * i + 1] - bz_i[2 * i]) % P)
                         for i in range(n)) % P
    azf = [int(v) for v in limb.decode(np.asarray(az_f), FR_C)]
    assert azf == [(az_i[2 * i] + r_i * (az_i[2 * i + 1] - az_i[2 * i])) % P
                   for i in range(n)]
    bzf = [int(v) for v in limb.decode(np.asarray(bz_f), FR_C)]
    assert bzf == [(bz_i[2 * i] + r_i * (bz_i[2 * i + 1] - bz_i[2 * i])) % P
                   for i in range(n)]
