"""Device-resident witness columns: raw upload, Montgomery-encode on chip.

The device sumcheck tier's dominant cost through the tunneled chip is
ACTIVATION UPLOAD: every engine table shipped as 32-byte-per-element
Montgomery residues at ~70 MB/s (BENCH.md round 4). But the underlying data
is tiny — witness value columns are canonical u64s (8 B/elem), flag columns
are single BITS, eq tables derive from a handful of challenge scalars, and
the stage combos (t = a + γ·b + γ²·c) are linear in already-resident
columns. So: upload the raw forms once per prove, Montgomery-encode and
combine ON DEVICE, and never ship a 32-byte residue to the chip at all.

Bit-exactness: device encode is mont_mul(x, R²) — the same REDC the host C
tier applies (fr_vec.c frv_from_u64/frv_to_mont), so every derived table is
bit-identical to its FrVec counterpart (asserted in
tests/test_device_cols.py and by the proof-bytes identity tests).

Reference hot-path parity: these tables feed the same per-round fold/eval
loops as the reference's stage provers (src/zkvm/spartan/*.zig); the upload
discipline is the TPU-first redesign, not a translation.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import limb
from ..field.limb import FR_C
from ..field.params import FR

P = FR.p
_U32 = jnp.uint32

_R2_DEV = None
_P_DEV = None
_ONE_DEV = None


def _consts():
    """Device-resident (R², p, 1R) Montgomery limb constants, uploaded once."""
    global _R2_DEV, _P_DEV, _ONE_DEV
    if _R2_DEV is None:
        r2 = (1 << 512) % P
        _R2_DEV = jax.device_put(jnp.asarray(
            np.asarray(limb.ints_to_limbs(r2), dtype=np.uint32)))
        _P_DEV = jax.device_put(jnp.asarray(
            np.asarray(limb.ints_to_limbs(P), dtype=np.uint32)))
        _ONE_DEV = jax.device_put(jnp.asarray(
            np.asarray(limb.ints_to_limbs(FR.mont(1)), dtype=np.uint32)))
    return _R2_DEV, _P_DEV, _ONE_DEV


@jax.jit
def _enc_u64(x16, r2):
    """(n, 4) u16-limb u64 values -> (n, 16) canonical-Montgomery limbs:
    widen, zero-pad to 16 limbs, REDC-multiply by R²."""
    n = x16.shape[0]
    wide = jnp.concatenate(
        [x16.astype(_U32), jnp.zeros((n, 12), _U32)], axis=1)
    return limb.mont_mul(wide, r2[None, :], FR_C)


@jax.jit
def _enc_i128(mag16, neg, r2):
    """Signed values hi·2^64 + lo (hi any small i64): the host passes the
    128-bit magnitude as (n, 8) u16 limbs plus a sign mask; encode |v|
    (REDC by R² — exact for |v| < 2^128 since |v|·R² < p·2^256·... the
    standard from_i128 bound) then conditionally negate in the field
    (0 − x; 0 negates to 0, no special case)."""
    n = mag16.shape[0]
    wide = jnp.concatenate(
        [mag16.astype(_U32), jnp.zeros((n, 8), _U32)], axis=1)
    enc = limb.mont_mul(wide, r2[None, :], FR_C)
    negd = limb.sub(jnp.zeros_like(enc), enc, FR_C)
    return limb.select(neg, negd, enc)


@jax.jit
def _enc_flags(bits, one):
    """(n,) u8 0/1 -> (n, 16) Montgomery limbs (select of the 1R pattern)."""
    return jnp.where((bits != 0)[:, None], one[None, :], _U32(0))


def _eq_levels(nv: int):
    """eq-table doubling, compiled once per level count: point limbs
    (nv, 16), returns the (2^nv, 16) eq table in frv_eq_table_be's order
    (variables consumed LAST to FIRST; level = [e·(1−pv) ‖ e·pv])."""

    @jax.jit
    def build(point_limbs):
        e = jnp.asarray(
            np.asarray(limb.ints_to_limbs(FR.mont(1)),
                       dtype=np.uint32)).reshape(1, 16)
        for v in range(nv - 1, -1, -1):
            pv = point_limbs[v][None, :]
            hi = limb.mont_mul(e, pv, FR_C)
            e = jnp.concatenate([limb.sub(e, hi, FR_C), hi], axis=0)
        return e

    return build


_EQ_CACHE: dict[int, object] = {}


def eq_table_dev(point_be: list[int]):
    """Device eq table from BE challenge scalars — uploads nv scalars
    instead of a 2^nv·32 B table; bit-identical to FrVec.eq_table_be."""
    nv = len(point_be)
    fn = _EQ_CACHE.get(nv)
    if fn is None:
        fn = _eq_levels(nv)
        _EQ_CACHE[nv] = fn
    pts = np.asarray(
        [limb.ints_to_limbs(FR.mont(c % P)) for c in point_be],
        dtype=np.uint32)
    return fn(jax.device_put(jnp.asarray(pts)))


@jax.jit
def _axpy(t, b, g):
    """t + γ·b elementwise (γ a resident (16,) Montgomery scalar)."""
    return limb.add(t, limb.mont_mul(b, g[None, :], FR_C), FR_C)


class DeviceColumnStore:
    """Per-prove cache of device-resident Montgomery columns.

    put_* register raw host data; get() encodes on first use and caches the
    (n, 16) u32 device array. combo() builds Σ γ^k·col_k on device from
    resident columns and uploaded challenge scalars (tiny)."""

    def __init__(self):
        self._raw: dict = {}
        self._dev: dict = {}

    def put_u64(self, key, arr: np.ndarray) -> None:
        self._raw[key] = ("u64", np.ascontiguousarray(arr, dtype=np.uint64))

    def put_i128(self, key, lo: np.ndarray, hi: np.ndarray) -> None:
        self._raw[key] = ("i128",
                          np.ascontiguousarray(lo, dtype=np.uint64),
                          np.ascontiguousarray(hi, dtype=np.int64))

    def put_flags(self, key, bits: np.ndarray) -> None:
        self._raw[key] = ("flag", np.ascontiguousarray(bits, dtype=np.uint8))

    def has(self, key) -> bool:
        return key in self._raw or key in self._dev

    def get(self, key):
        dev = self._dev.get(key)
        if dev is not None:
            return dev
        r2, p, one = _consts()
        raw = self._raw[key]
        if raw[0] == "u64":
            x16 = raw[1].view("<u2").reshape(-1, 4)
            dev = _enc_u64(jnp.asarray(x16), r2)
        elif raw[0] == "i128":
            lo, hi = raw[1], raw[2]
            neg = hi < 0
            # 128-bit magnitude via two's-complement negate where v < 0
            mag_lo = np.where(neg, np.uint64(0) - lo, lo)
            mag_hi = np.where(
                neg,
                (~hi.view(np.uint64)) + (lo == 0).astype(np.uint64),
                hi.view(np.uint64))
            m16 = np.concatenate([mag_lo.view("<u2").reshape(-1, 4),
                                  mag_hi.view("<u2").reshape(-1, 4)], axis=1)
            dev = _enc_i128(jnp.asarray(np.ascontiguousarray(m16)),
                            jnp.asarray(neg), r2)
        else:
            dev = _enc_flags(jnp.asarray(raw[1]), one)
        self._dev[key] = dev
        return dev

    def combo(self, keys: list, coeffs: list[int]):
        """Σ_k coeffs[k]·col(keys[k]) on device; coeffs[0] must be 1."""
        assert coeffs[0] % P == 1
        t = self.get(keys[0])
        for key, c in zip(keys[1:], coeffs[1:]):
            g = jax.device_put(jnp.asarray(np.asarray(
                limb.ints_to_limbs(FR.mont(c % P)), dtype=np.uint32)))
            t = _axpy(t, self.get(key), g)
        return t


@jax.jit
def _mul_cols(a, b):
    return limb.mont_mul(a, b, FR_C)


@jax.jit
def _select_cols(mask_bits, a, b):
    """where(mask, a, b) elementwise over (n, 16) limb arrays."""
    return jnp.where((mask_bits != 0)[:, None], a, b)


class WitnessStore(DeviceColumnStore):
    """DeviceColumnStore over r1cs.inputs.witness_columns' raw specs
    (witness_columns(raw_out=...)): u64/i128/flag columns plus the two
    derived specs — ("prod", a, b) = field product of two resident columns,
    ("splice", base, prod_key, mask) = where(mask, prod, base) (the MUL
    RightLookupOperand splice), and ("zeros",)."""

    def __init__(self, raw: dict, n: int):
        super().__init__()
        self._specs = raw
        self._n = n

    def get(self, key):
        dev = self._dev.get(key)
        if dev is not None:
            return dev
        if key not in self._raw and key in self._specs:
            spec = self._specs[key]
            kind = spec[0]
            if kind == "u64":
                self.put_u64(key, spec[1])
            elif kind == "i128":
                self.put_i128(key, spec[1], spec[2])
            elif kind == "flag":
                self.put_flags(key, spec[1])
            elif kind == "zeros":
                dev = jnp.zeros((self._n, 16), jnp.uint32)
                self._dev[key] = dev
                return dev
            elif kind == "prod":
                dev = _mul_cols(self.get(spec[1]), self.get(spec[2]))
                self._dev[key] = dev
                return dev
            elif kind == "splice":
                base_key = (key, "base")
                self._specs[base_key] = spec[1]
                mask_key = (key, "mask")
                self._specs[mask_key] = spec[3]
                base = self.get(base_key)
                mask = jnp.asarray(self._specs[mask_key][1])
                dev = _select_cols(mask, self.get(spec[2]), base)
                self._dev[key] = dev
                return dev
            else:
                raise KeyError(f"unknown raw spec {kind}")
        return super().get(key)

    def shifted_flag(self, key, fill: int = 1):
        """Montgomery column of flag(key) shifted one cycle left (value at
        cycle i becomes flag[i+1]; last entry = fill) — FrVec.shifted_left
        for flag raw specs (the NextIsNoop factor)."""
        ckey = (key, "shl", fill)
        dev = self._dev.get(ckey)
        if dev is None:
            spec = self._specs[key]
            assert spec[0] == "flag"
            bits = np.concatenate([spec[1][1:],
                                   np.asarray([fill], np.uint8)])
            _r2, _p, one = _consts()
            dev = _enc_flags(jnp.asarray(bits), one)
            self._dev[ckey] = dev
        return dev

    def shifted_flag_not(self, key, fill: int = 1):
        """Montgomery column of 1 − shifted_flag(key, fill) — the
        (1 − NextIsNoop) factor of the fused right column, encoded in one
        pass from the complement bits."""
        ckey = (key, "shl_not", fill)
        dev = self._dev.get(ckey)
        if dev is None:
            spec = self._specs[key]
            assert spec[0] == "flag"
            bits = np.concatenate([spec[1][1:],
                                   np.asarray([fill], np.uint8)])
            _r2, _p, one = _consts()
            dev = _enc_flags(jnp.asarray((bits == 0).astype(np.uint8)), one)
            self._dev[ckey] = dev
        return dev

    def flags_not(self, key):
        """Montgomery column of 1 − flag(key) (flag raw specs only)."""
        ckey = (key, "not")
        dev = self._dev.get(ckey)
        if dev is None:
            spec = self._specs[key]
            assert spec[0] == "flag"
            _r2, _p, one = _consts()
            dev = _enc_flags(jnp.asarray(
                (spec[1] == 0).astype(np.uint8)), one)
            self._dev[ckey] = dev
        return dev


def axpy_dev(a, b, coeff: int):
    """a + coeff·b over device (n, 16) limb arrays (coeff a host int)."""
    g = jax.device_put(jnp.asarray(np.asarray(
        limb.ints_to_limbs(FR.mont(coeff % P)), dtype=np.uint32)))
    return _axpy(a, b, g)


def eq_slice(point_be: list[int], n: int):
    """Device eq table truncated to the first n rows (stage provers clip
    eq tables to the padded trace length)."""
    e = eq_table_dev(point_be)
    return e if e.shape[0] == n else e[:n]


def lincomb_dev(arrs: list, coeffs: list[int]):
    """Σ_k coeffs[k]·arrs[k] over device limb arrays (host int coeffs)."""
    out = None
    for a, c in zip(arrs, coeffs):
        g = jax.device_put(jnp.asarray(np.asarray(
            limb.ints_to_limbs(FR.mont(c % P)), dtype=np.uint32)))
        term = _mul_scalar(a, g)
        out = term if out is None else _add_cols(out, term)
    return out


@jax.jit
def _mul_scalar(a, g):
    return limb.mont_mul(a, g[None, :], FR_C)


@jax.jit
def _add_cols(a, b):
    return limb.add(a, b, FR_C)
