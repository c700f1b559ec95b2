"""TPU-native big-field arithmetic over limb-decomposed arrays.

Field elements live on device as `uint32[..., 16]` arrays: 16 little-endian
limbs of 16 bits each, in Montgomery form with R = 2^256 (so Montgomery values
are bit-identical to the reference's 4x64 representation, reference:
src/field/mod.zig:124-556).

Why radix 2^16 in uint32 lanes: the CIOS inner step computes
`t[j] + a_i*b_j + carry` with a_i, b_j, t[j], carry all < 2^16, whose maximum is
exactly 2^32 - 1 — every intermediate fits native 32-bit VPU arithmetic with no
emulated wide multiply. All operations vectorize over arbitrary leading batch
dimensions, which is where the TPU parallelism comes from: one Montgomery mul is
~512 fused u32 multiply-adds applied lane-wise across the whole batch.

The same functions trace under `jit`, `shard_map`, `vmap`, and inside Pallas
kernels (they are pure jnp).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .params import FP, FR, LIMB_BITS, LIMB_MASK, N_LIMBS, FieldParams, from_limbs, to_limbs

_U32 = jnp.uint32


class FieldConst(NamedTuple):
    """Device-resident constants for one prime field (hashable jit-static)."""

    name: str
    p_limbs: tuple[int, ...]   # modulus, 16x16-bit limbs, little-endian
    inv: int                   # -p^{-1} mod 2^16
    r_limbs: tuple[int, ...]   # R mod p  (= Montgomery form of 1)
    r2_limbs: tuple[int, ...]  # R^2 mod p (to_mont multiplier)
    p_int: int
    p_minus_2_bits: tuple[int, ...]  # bits of p-2, LSB first (for inversion pow)


def _mk_const(fp: FieldParams) -> FieldConst:
    e = fp.p - 2
    bits = tuple((e >> i) & 1 for i in range(e.bit_length()))
    return FieldConst(
        name=fp.name,
        p_limbs=tuple(fp.p_limbs),
        inv=fp.inv,
        r_limbs=tuple(fp.r_limbs),
        r2_limbs=tuple(fp.r2_limbs),
        p_int=fp.p,
        p_minus_2_bits=bits,
    )


FR_C = _mk_const(FR)
FP_C = _mk_const(FP)


def _make_sel() -> tuple[np.ndarray, np.ndarray]:
    """0/1 anti-diagonal selection matrices mapping the flattened 16x16 limb
    products onto the 33 columns of the 512-bit product."""
    w = 2 * N_LIMBS + 1
    sel_lo = np.zeros((N_LIMBS * N_LIMBS, w), dtype=np.float32)
    sel_hi = np.zeros((N_LIMBS * N_LIMBS, w), dtype=np.float32)
    for i in range(N_LIMBS):
        for j in range(N_LIMBS):
            sel_lo[i * N_LIMBS + j, i + j] = 1.0
            sel_hi[i * N_LIMBS + j, i + j + 1] = 1.0
    return sel_lo, sel_hi


_SEL_LO, _SEL_HI = _make_sel()


# ---------------------------------------------------------------------------
# Host <-> device conversion
# ---------------------------------------------------------------------------

def ints_to_limbs(xs, dtype=np.uint32) -> np.ndarray:
    """Python ints (any nest/array of objects) -> uint32[..., 16] limb array."""
    arr = np.asarray(xs, dtype=object)
    out = np.empty(arr.shape + (N_LIMBS,), dtype=dtype)
    flat = arr.reshape(-1)
    oflat = out.reshape(-1, N_LIMBS)
    for i, v in enumerate(flat):
        oflat[i] = to_limbs(int(v))
    return out


def limbs_to_ints(limbs) -> np.ndarray:
    """uint32[..., 16] limb array -> object ndarray of Python ints."""
    arr = np.asarray(limbs)
    flat = arr.reshape(-1, N_LIMBS)
    out = np.empty(flat.shape[0], dtype=object)
    for i in range(flat.shape[0]):
        out[i] = from_limbs(flat[i])
    return out.reshape(arr.shape[:-1])


def const_vec(limbs: tuple[int, ...]):
    return jnp.asarray(limbs, dtype=_U32)


def zeros(shape=()):
    return jnp.zeros(tuple(shape) + (N_LIMBS,), dtype=_U32)


# ---------------------------------------------------------------------------
# Core limb primitives (all shapes (..., 16), uint32)
# ---------------------------------------------------------------------------

def _split(x):
    """(..., 16) array -> list of 16 (...,) limb arrays."""
    return [x[..., i] for i in range(N_LIMBS)]


def _join(limbs):
    return jnp.stack(limbs, axis=-1)


def _sub_limbs(a, b):
    """Limbwise a - b with borrow chain. Returns (diff_limbs_list, borrow_out)."""
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(N_LIMBS):
        d = a[i] - b[i] - borrow
        borrow = (d >> 31) & 1  # negative in u32 wraps; bit 31 set iff borrowed
        out.append(d & LIMB_MASK)
    return out, borrow


def _add_limbs(a, b):
    """Limbwise a + b with carry chain. Returns (sum_limbs_list, carry_out)."""
    out = []
    carry = jnp.zeros_like(a[0])
    for i in range(N_LIMBS):
        s = a[i] + b[i] + carry
        carry = s >> LIMB_BITS
        out.append(s & LIMB_MASK)
    return out, carry


def _cond_sub_p(t, extra, f: FieldConst):
    """If (extra:t) >= p, subtract p. t is a list of 16 limbs; extra is the
    257th-bit carry (0 or 1)."""
    p = [jnp.asarray(np.uint32(l)) for l in f.p_limbs]
    p = [jnp.broadcast_to(l, t[0].shape) for l in p]
    diff, borrow = _sub_limbs(t, p)
    # take the subtracted value when no borrow OR there was overflow beyond 256 bits
    take = jnp.logical_or(borrow == 0, extra != 0)
    return [jnp.where(take, d, o) for d, o in zip(diff, t)]


@partial(jax.jit, static_argnames="f")
def add(a, b, f: FieldConst = FR_C):
    """Field addition (Montgomery-form in, Montgomery-form out)."""
    al, bl = _split(a), _split(b)
    s, carry = _add_limbs(al, bl)
    return _join(_cond_sub_p(s, carry, f))


@partial(jax.jit, static_argnames="f")
def sub(a, b, f: FieldConst = FR_C):
    al, bl = _split(a), _split(b)
    d, borrow = _sub_limbs(al, bl)
    # if borrowed, add p back
    p = [jnp.asarray(np.uint32(l)) for l in f.p_limbs]
    fixed, _ = _add_limbs(d, [jnp.broadcast_to(l, d[0].shape) for l in p])
    need = borrow != 0
    return _join([jnp.where(need, x, y) for x, y in zip(fixed, d)])


@partial(jax.jit, static_argnames="f")
def neg(a, f: FieldConst = FR_C):
    z = jnp.zeros_like(a)
    # p - a when a != 0 else 0; sub() already handles 0 - a = p - a, but 0-0=p... no:
    # _sub_limbs(0,0) = 0 with no borrow -> 0. Correct.
    return sub(z, a, f)


@partial(jax.jit, static_argnames="f")
def mont_mul(a, b, f: FieldConst = FR_C):
    """Montgomery multiplication a*b*R^{-1} mod p via column sums + lazy REDC.

    TPU-shaped formulation (vs the reference's word-serial CIOS,
    src/field/mod.zig:734-779): one broadcast outer product gives all 256 limb
    products at once; their 16-bit halves are accumulated into 32 product
    columns (each column holds < 2^22, safely inside uint32); Montgomery
    reduction then runs 16 short steps, each adding m_i*p as two half-columns —
    a per-step cost of ~6 wide vector ops instead of a 16-step carry chain.
    Final carry propagation normalizes back to 16-bit limbs.

    Overflow audit (all in uint32): outer products < 2^32 exact; column
    accumulations <= 64 terms * (2^16-1) < 2^22; REDC carry < 2^7 + columns.
    Result < 2p (standard REDC bound), fixed by one conditional subtract.
    """
    mask = np.uint32(LIMB_MASK)
    inv = np.uint32(f.inv)
    p_vec = const_vec(f.p_limbs)

    prod = a[..., :, None] * b[..., None, :]       # (..., 16, 16), exact in u32
    lo = (prod & mask).astype(jnp.float32)
    hi = (prod >> LIMB_BITS).astype(jnp.float32)

    # Column sums via 0/1 selection matmuls — exact in f32 (terms < 2^16,
    # column sums < 2^21 < 2^24 mantissa) and MXU-eligible on TPU. Column k of
    # the 512-bit product collects lo[i,j] with i+j==k and hi[i,j] with
    # i+j+1==k.
    W = 2 * N_LIMBS + 1  # 33 columns
    sel_lo = _SEL_LO
    sel_hi = _SEL_HI
    shape = prod.shape[:-2]
    lo_flat = lo.reshape(shape + (N_LIMBS * N_LIMBS,))
    hi_flat = hi.reshape(shape + (N_LIMBS * N_LIMBS,))
    # Precision.HIGHEST is required: TPU MXU default truncates f32 inputs to
    # bf16, destroying the exact integer sums. HIGHEST (bf16x3 decomposition)
    # is exact here because the selection matrix is 0/1 and sums stay < 2^24.
    T = (
        jnp.dot(lo_flat, sel_lo, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        + jnp.dot(hi_flat, sel_hi, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    ).astype(_U32)                                  # (..., 33), each < 2^22

    # REDC: 16 steps; each clears the current lowest column and shrinks T by
    # one. No dynamic-update-slices — addends are aligned with static pads.
    for i in range(N_LIMBS):
        width = W - i
        t0 = T[..., 0]
        m = (t0 * inv) & mask
        mp = m[..., None] * p_vec                   # (..., 16) < 2^32 exact
        pad_lo = [(0, 0)] * len(shape) + [(0, width - N_LIMBS)]
        pad_hi = [(0, 0)] * len(shape) + [(1, width - N_LIMBS - 1)]
        T = T + jnp.pad(mp & mask, pad_lo) + jnp.pad(mp >> LIMB_BITS, pad_hi)
        carry = T[..., 0] >> LIMB_BITS              # low 16 bits now ≡ 0
        T = T[..., 1:]
        T = T + jnp.pad(carry[..., None], [(0, 0)] * len(shape) + [(0, width - 2)])

    # normalize 17 remaining columns into canonical 16-bit limbs
    carry = jnp.zeros(shape, dtype=_U32)
    out = []
    for i in range(N_LIMBS):
        v = T[..., i] + carry
        out.append(v & mask)
        carry = v >> LIMB_BITS
    carry = carry + T[..., N_LIMBS]
    # result < 2p < 2^255 ⇒ carry can only be 0 here; keep it in the compare
    return _join(_cond_sub_p(out, carry, f))


@partial(jax.jit, static_argnames="f")
def mont_sqr(a, f: FieldConst = FR_C):
    return mont_mul(a, a, f)


@partial(jax.jit, static_argnames="f")
def to_mont(a, f: FieldConst = FR_C):
    """Canonical-residue limbs -> Montgomery form (multiply by R^2)."""
    r2 = jnp.broadcast_to(const_vec(f.r2_limbs), a.shape)
    return mont_mul(a, r2, f)


@partial(jax.jit, static_argnames="f")
def from_mont(a, f: FieldConst = FR_C):
    """Montgomery form -> canonical-residue limbs (multiply by 1)."""
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return mont_mul(a, one, f)


def one_mont(shape=(), f: FieldConst = FR_C):
    return jnp.broadcast_to(const_vec(f.r_limbs), tuple(shape) + (N_LIMBS,))


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """cond ? a : b, with cond shaped like the batch (no limb axis)."""
    return jnp.where(cond[..., None], a, b)


def mont_pow_fixed(a, e_bits: tuple[int, ...], f: FieldConst = FR_C):
    """a^e for a fixed public exponent, via lax.scan over the exponent bits.

    e_bits: LSB-first bit tuple (static). Montgomery in/out.
    """
    bits = jnp.asarray(e_bits, dtype=_U32)
    one = one_mont(a.shape[:-1], f)

    def body(carry, bit):
        acc, base = carry
        mul_acc = mont_mul(acc, base, f)
        acc = select(jnp.broadcast_to(bit != 0, acc.shape[:-1]), mul_acc, acc)
        base = mont_sqr(base, f)
        return (acc, base), None

    (acc, _), _ = jax.lax.scan(body, (one, a), bits)
    return acc


@partial(jax.jit, static_argnames="f")
def inverse(a, f: FieldConst = FR_C):
    """Fermat inverse a^(p-2). Montgomery in/out. inverse(0) = 0."""
    return mont_pow_fixed(a, f.p_minus_2_bits, f)


@partial(jax.jit, static_argnames="f")
def batch_inverse(a, f: FieldConst = FR_C):
    """Montgomery-trick batch inversion along axis 0, fully parallel.

    Uses prefix/suffix products via associative_scan (log-depth) + one Fermat
    inverse of the grand total:  inv(x_i) = prefix_{i-1} * suffix_{i+1} * inv(total).
    Zero entries map to zero (matching reference BatchOps.batchInverse
    semantics, src/field/mod.zig:1164-1280).
    """
    zero_mask = is_zero(a)
    ones = one_mont(a.shape[:-1], f)
    safe = select(zero_mask, ones, a)

    mul2 = lambda x, y: mont_mul(x, y, f)
    prefix = jax.lax.associative_scan(mul2, safe, axis=0)          # P_i = x_0..x_i
    suffix = jax.lax.associative_scan(mul2, safe, axis=0, reverse=True)
    total_inv = inverse(prefix[-1], f)

    n = a.shape[0]
    pre = jnp.concatenate([ones[:1], prefix[: n - 1]], axis=0)     # prefix_{i-1}
    suf = jnp.concatenate([suffix[1:], ones[:1]], axis=0)          # suffix_{i+1}
    inv = mont_mul(mont_mul(pre, suf, f), total_inv[None], f)
    return select(zero_mask, jnp.zeros_like(a), inv)


# ---------------------------------------------------------------------------
# Convenience: canonical-int round trips for tests / host boundary
# ---------------------------------------------------------------------------

def encode(xs, f: FieldConst = FR_C, params: FieldParams | None = None):
    """Python ints (canonical) -> device Montgomery limb array."""
    params = params or (FR if f.name == "fr" else FP)
    arr = np.asarray(xs, dtype=object)
    monty = np.empty(arr.shape, dtype=object)
    it = np.nditer(np.zeros(arr.shape), flags=["multi_index"]) if arr.shape else None
    if arr.shape == ():
        return jnp.asarray(ints_to_limbs(params.mont(int(arr))))
    flat = arr.reshape(-1)
    mflat = monty.reshape(-1)
    for i in range(flat.shape[0]):
        mflat[i] = params.mont(int(flat[i]))
    return jnp.asarray(ints_to_limbs(monty))


def decode(a, f: FieldConst = FR_C, params: FieldParams | None = None) -> np.ndarray:
    """Device Montgomery limb array -> object ndarray of canonical Python ints."""
    params = params or (FR if f.name == "fr" else FP)
    ints = limbs_to_ints(np.asarray(a))
    if ints.shape == ():
        return params.unmont(int(ints))
    flat = ints.reshape(-1)
    for i in range(flat.shape[0]):
        flat[i] = params.unmont(int(flat[i]))
    return ints
