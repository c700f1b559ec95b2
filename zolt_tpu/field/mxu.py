"""MXU-native field kernels: shared-operand Montgomery arithmetic as
full-speed bf16 matmuls.

The VPU tier (field/limb.py) computes general elementwise products with
radix-2^16 limbs; its column reduction rides the MXU only through a skinny
f32 matmul at Precision.HIGHEST (a 6-pass bf16 decomposition, ~5x slower
than the MXU's native rate). This module exploits a structural fact: most
of the prover's hot multiplications have ONE SHARED OPERAND —

  sumcheck folds        new[i] = lo[i] + r·(hi[i]−lo[i])          (shared r)
  eq-table doubling     next = [v·(1−t), v·t]                      (shared t)
  RLC combines          acc[i] += γ^k·T_k[i]                       (shared γ^k)

Multiplication by a shared scalar is a matrix product: with radix-2^8 limbs
(values ≤ 255, exactly representable in bf16) the schoolbook product columns
are  cols = A8 @ toeplitz(s8)  — a DEFAULT-precision f32 matmul, which XLA
lowers to a single bf16 MXU pass with f32 accumulation. Exactness audit:
inputs ≤ 255 = 2^8 − 1 (bf16 integers are exact through 2^8), products
≤ 65025, column sums ≤ 32·65025 < 2^21 < 2^24 (f32 integer-exact window).

Montgomery reduction is two more shared-operand matmuls (Hensel lifting with
the full 256-bit inverse, instead of the VPU tier's 16 sequential 16-bit
REDC steps):

  m    = (cols mod R)·N' mod R     N' = −p^{−1} mod 2^256   (shared N')
  out  = (cols + m·p) / R          p shared
                                   (division = byte-carry chain, low bytes 0)

Measured on the v5e: default-precision matmul sustains ~157 TFLOP/s vs ~31
for Precision.HIGHEST — the 0/1-selection path's rate — and this path also
needs ~4x fewer VPU lane-ops (no 16-step carry-chain REDC).

Storage stays (…, 16) uint32 16-bit limbs (the package-wide Montgomery
layout, bit-identical to the reference's 4x64); kernels split to byte planes
on the fly.

Reference hot loops this accelerates: the bindLow folds
(src/poly/mod.zig:160-175) driving every sumcheck instance, and the eq-table
doubling build (src/poly/mod.zig:252-290).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .limb import FR_C, FieldConst, _cond_sub_p, _join, _split
from .params import N_LIMBS

_U32 = jnp.uint32
N8 = 2 * N_LIMBS          # 32 byte-limbs
W8 = 2 * N8               # 64 product columns (63 live + 1 spare)


def _nprime_bytes(f: FieldConst) -> np.ndarray:
    """N' = -p^{-1} mod 2^256 as 32 LE bytes."""
    r = 1 << 256
    npi = (-pow(f.p_int, -1, r)) % r
    return np.frombuffer(npi.to_bytes(32, "little"), dtype=np.uint8)


def _toeplitz8(bytes_le: np.ndarray, width: int) -> np.ndarray:
    """(N8, width) f32 banded matrix T[i, i+j] = b[j] — multiplying a byte-
    plane row vector by T yields the schoolbook product columns."""
    t = np.zeros((N8, width), dtype=np.float32)
    for i in range(N8):
        hi = min(width - i, len(bytes_le))
        t[i, i : i + hi] = bytes_le[:hi]
    return t


def scalar_toeplitz(s_mont: int) -> np.ndarray:
    """Host-side per-round constant: the (32, 64) Toeplitz of a Montgomery-
    form scalar's bytes. Tiny (8 KB); passed as a traced arg so one compiled
    kernel serves every round."""
    b = np.frombuffer((s_mont % (1 << 256)).to_bytes(32, "little"), np.uint8)
    return _toeplitz8(b, W8)


def _consts(f: FieldConst):
    p_bytes = np.frombuffer(f.p_int.to_bytes(32, "little"), dtype=np.uint8)
    return (_toeplitz8(_nprime_bytes(f), N8)[:, :N8],   # N' mod-R band
            _toeplitz8(p_bytes, W8))


_CONSTS = {"fr": None, "fp": None}


def _get_consts(f: FieldConst):
    if _CONSTS.get(f.name) is None:
        _CONSTS[f.name] = _consts(f)
    return _CONSTS[f.name]


def to_bytes8(a):
    """(…, 16) u32 16-bit limbs -> (…, 32) f32 byte planes."""
    lo = (a & jnp.uint32(0xFF)).astype(jnp.float32)
    hi = ((a >> 8) & jnp.uint32(0xFF)).astype(jnp.float32)
    return jnp.stack([lo, hi], axis=-1).reshape(a.shape[:-1] + (N8,))


def from_bytes8(b8):
    """(…, 32) u32 byte limbs -> (…, 16) u32 16-bit limbs."""
    pairs = b8.reshape(b8.shape[:-1] + (N_LIMBS, 2))
    return pairs[..., 0] | (pairs[..., 1] << 8)


def _norm_lazy(cols):
    """Lazily carry-normalize 32 redundant u32 columns (< 2^22) into byte
    limbs ≤ 256 via three WIDE shift-add passes, dropping carries out of
    byte 31 (reduce mod R = 2^256). A strict 32-step sequential chain here
    is HBM-bound (XLA materializes each tiny step); three vector passes
    bound every column by 255 + carry: 2^14 -> 63 -> 1, i.e. ≤ 256 — and
    256 = 2^8 is still exactly representable in bf16, so lazy bytes feed
    the REDC matmuls without losing exactness (column sums stay < 2^21·2).
    Mod-R correctness: only the value mod 2^256 matters for the Hensel m,
    and the ≤2^256·(256/255) slack on m keeps t/R < 1.23p (see redc_cols)."""
    for _ in range(3):
        lo = cols & jnp.uint32(0xFF)
        carry = cols >> 8
        cols = lo.at[..., 1:].add(carry[..., :-1])
    return cols


def redc_cols(cols, f: FieldConst = FR_C):
    """(…, 64) u32 redundant product columns (each < 2^22) -> (…, 16) u32
    canonical Montgomery limbs: matmul-Hensel REDC + byte-carry division.

    Result bound: m is taken lazily (bytes ≤ 256 ⇒ integer m' < 2^256·
    256/255) so t = cols + m'·p < p² + 1.004·2^256·p ⇒ t/R < 1.23p < 2p;
    one conditional subtract lands canonical."""
    np_band, p_band = _get_consts(f)
    np_band = jnp.asarray(np_band)
    p_band = jnp.asarray(p_band)

    low8 = _norm_lazy(cols[..., :N8]).astype(jnp.float32)
    m8 = _norm_lazy(jnp.dot(low8, np_band,
                            preferred_element_type=jnp.float32).astype(_U32))
    q = jnp.dot(m8.astype(jnp.float32), p_band,
                preferred_element_type=jnp.float32).astype(_U32)
    t = cols + q

    # divide by R: the low 32 bytes of the integer value are zero, so the
    # carry chain through them reduces to carry updates; the high 32 bytes
    # (+ final carry, provably zero: t/R < 2p < 2^256) are the result.
    c = jnp.zeros(t.shape[:-1], dtype=_U32)
    for i in range(N8):
        c = (t[..., i] + c) >> 8
    out = []
    for i in range(N8):
        v = t[..., N8 + i] + c
        out.append(v & jnp.uint32(0xFF))
        c = v >> 8
    b8 = jnp.stack(out, axis=-1)
    limbs16 = _split(from_bytes8(b8))
    return _join(_cond_sub_p(limbs16, jnp.zeros_like(limbs16[0]), f))


@partial(jax.jit, static_argnames="f")
def mul_shared(a, s_toeplitz, f: FieldConst = FR_C):
    """a·s·R^{-1} mod p for a batch `a` and ONE shared scalar, presented as
    its byte Toeplitz (scalar_toeplitz). Montgomery in/out; bit-identical to
    limb.mont_mul(a, broadcast(s))."""
    a8 = to_bytes8(a)
    cols = jnp.dot(a8, s_toeplitz,
                   preferred_element_type=jnp.float32).astype(_U32)
    return redc_cols(cols, f)


@partial(jax.jit, static_argnames="f")
def fold_shared(tab, r_toeplitz, f: FieldConst = FR_C):
    """Adjacent-pair sumcheck fold new[i] = t[2i] + r·(t[2i+1] − t[2i]) with
    the multiply on the MXU. Returns the half-length table."""
    from . import limb

    pairs = tab.reshape((tab.shape[0] // 2, 2) + tab.shape[1:])
    lo, hi = pairs[:, 0], pairs[:, 1]
    d = limb.sub(hi, lo, f)
    cols = jnp.dot(to_bytes8(d), r_toeplitz,
                   preferred_element_type=jnp.float32).astype(_U32)
    return limb.add(lo, redc_cols(cols, f), f)
