"""Pallas TPU kernels for the sumcheck hot loop.

The structure every stage prover maps onto is one round of
    t0   = sum_i eq_i * az_lo_i * bz_lo_i
    tinf = sum_i eq_i * (az_hi_i - az_lo_i) * (bz_hi_i - bz_lo_i)
    fold: az' = az_lo + r*(az_hi - az_lo),  bz' likewise
over Montgomery limb arrays (uint32[..., 16]). The XLA path runs this as a
fused jit; this Pallas version pins the whole round into one VMEM-resident
grid pass: each block reads its az/bz/eq tile from HBM exactly once,
produces the folded tile and its partial (t0, tinf) contribution, and the
tiny per-block partials are tree-summed by the caller. One HBM round trip
per table per round is the optimum the memory-bound fold allows
(/opt/skills/guides/pallas_guide.md; grid/BlockSpec per its section 4).

Mosaic notes (all discovered against the real chip, kept for future work):
- the kernel body cannot capture array constants (jaxpr constvars are
  rejected) — the modulus row enters as an explicit input;
- strided gathers don't lower — pair tables are pre-reshaped to (n, 32)
  rows of [lo || hi] limbs;
- u32<->f32 casts and the flatten shape-cast that feeds `limb.mont_mul`'s
  MXU selection matmuls don't lower either, so the in-kernel Montgomery mul
  accumulates its product columns directly on the VPU;
- the fully-unrolled REDC keeps ~1k u32 temporaries live, so blocks stay
  small (BLOCK=64) to fit the 16 MB scoped-VMEM limit.

Status: bit-exact vs `field.limb` on the real TPU (and under interpret
mode), but the VPU-only column sums lose badly to the XLA tier's MXU
matmul formulation — the narrow (64,) vectors underutilize the 8x128 VPU
and nothing hits the MXU. The XLA `limb` kernels therefore remain the
production device tier; this kernel is the framework's Pallas on-ramp and
a record of exactly which Mosaic lowering gaps block the MXU formulation
(the flatten shape-cast above). Revisit when Mosaic supports reshapes
across tiled dims or u32 matmul operands.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from . import limb
from .limb import FR_C, LIMB_BITS, LIMB_MASK, N_LIMBS

BLOCK = 64  # pairs per grid block (the unrolled REDC keeps ~1k u32 temps live; small blocks keep the scoped VMEM footprint inside the 16 MB limit)


# ---- Mosaic-safe limb ops (constants arrive as kernel inputs) ------------

def _k_add(a, b, p_row):
    al = [a[..., i] for i in range(N_LIMBS)]
    bl = [b[..., i] for i in range(N_LIMBS)]
    out = []
    carry = jnp.zeros_like(al[0])
    for i in range(N_LIMBS):
        s = al[i] + bl[i] + carry
        carry = s >> LIMB_BITS
        out.append(s & LIMB_MASK)
    return _k_cond_sub(out, carry, p_row)


def _k_sub_limbs(al, bl):
    out = []
    borrow = jnp.zeros_like(al[0])
    for i in range(N_LIMBS):
        d = al[i] - bl[i] - borrow
        borrow = (d >> 31) & 1
        out.append(d & LIMB_MASK)
    return out, borrow


def _k_sub(a, b, p_row):
    al = [a[..., i] for i in range(N_LIMBS)]
    bl = [b[..., i] for i in range(N_LIMBS)]
    d, borrow = _k_sub_limbs(al, bl)
    pl_ = [jnp.broadcast_to(p_row[0, i], d[0].shape) for i in range(N_LIMBS)]
    fixed = []
    carry = jnp.zeros_like(d[0])
    for i in range(N_LIMBS):
        s = d[i] + pl_[i] + carry
        carry = s >> LIMB_BITS
        fixed.append(s & LIMB_MASK)
    need = borrow != 0
    return jnp.stack([jnp.where(need, x, y) for x, y in zip(fixed, d)], axis=-1)


def _k_cond_sub(t, extra, p_row):
    pl_ = [jnp.broadcast_to(p_row[0, i], t[0].shape) for i in range(N_LIMBS)]
    diff, borrow = _k_sub_limbs(t, pl_)
    take = jnp.logical_or(borrow == 0, extra != 0)
    return jnp.stack([jnp.where(take, d, o) for d, o in zip(diff, t)], axis=-1)


def _k_mont_mul(a, b, p_row, inv):
    """Column-REDC Montgomery mul. Unlike limb.mont_mul's MXU selection-
    matmul column sums, the columns accumulate directly on the VPU (Mosaic
    rejects the flatten shape-cast and u32<->f32 casts); everything stays
    exact in u32: column sums < 2^21, REDC terms < 2^32."""
    mask = np.uint32(LIMB_MASK)
    al = [a[..., i] for i in range(N_LIMBS)]
    bl = [b[..., j] for j in range(N_LIMBS)]
    W = 2 * N_LIMBS + 1
    zero = jnp.zeros_like(al[0])
    cols = [zero] * W
    for i in range(N_LIMBS):
        for j in range(N_LIMBS):
            pr = al[i] * bl[j]
            cols[i + j] = cols[i + j] + (pr & mask)
            cols[i + j + 1] = cols[i + j + 1] + (pr >> LIMB_BITS)

    p_b = [p_row[0, i] for i in range(N_LIMBS)]
    for _step in range(N_LIMBS):
        width = len(cols)
        m = (cols[0] * inv) & mask
        new = list(cols)
        for i in range(N_LIMBS):
            mp = m * p_b[i]
            new[i] = new[i] + (mp & mask)
            if i + 1 < width:
                new[i + 1] = new[i + 1] + (mp >> LIMB_BITS)
        carry = new[0] >> LIMB_BITS
        cols = new[1:]
        cols[0] = cols[0] + carry

    out = []
    carry = jnp.zeros_like(cols[0])
    for i in range(N_LIMBS):
        v = cols[i] + carry
        out.append(v & mask)
        carry = v >> LIMB_BITS
    carry = carry + cols[N_LIMBS]
    return _k_cond_sub(out, carry, p_row)


# ---- the fused round kernel ----------------------------------------------

def _round_kernel(az_ref, bz_ref, eq_ref, r_ref,
                  p_ref, az_out, bz_out, t0_out, tinf_out, inv=None):
    az = az_ref[:]
    bz = bz_ref[:]
    eq = eq_ref[:]
    r = r_ref[:]
    p_row = p_ref[:]

    az_lo = az[:, :16]
    az_hi = az[:, 16:]
    bz_lo = bz[:, :16]
    bz_hi = bz[:, 16:]
    daz = _k_sub(az_hi, az_lo, p_row)
    dbz = _k_sub(bz_hi, bz_lo, p_row)

    mm = lambda x, y: _k_mont_mul(x, y, p_row, inv)
    prod0 = mm(mm(az_lo, bz_lo), eq)
    prodI = mm(mm(daz, dbz), eq)

    n = prod0.shape[0]
    while n > 1:
        h = n // 2
        prod0 = _k_add(prod0[:h], prod0[h:n], p_row)
        prodI = _k_add(prodI[:h], prodI[h:n], p_row)
        n = h
    i = pl.program_id(0)
    t0_out[i, :] = prod0[0]
    tinf_out[i, :] = prodI[0]

    r_b = jnp.broadcast_to(r, az_lo.shape)
    az_out[:] = _k_add(az_lo, mm(r_b, daz), p_row)
    bz_out[:] = _k_add(bz_lo, mm(r_b, dbz), p_row)


def product_round(az, bz, eq, r, *, interpret: bool = False):
    """Fused sumcheck product round over (2n, 16) limb tables.

    az, bz: (2n, 16) uint32 Montgomery pairs (lo, hi adjacent);
    eq:     (n, 16) per-pair weights; r: (16,) fold challenge.
    Returns (az_folded (n,16), bz_folded (n,16), t0 (16,), tinf (16,)):
    t0/tinf are the eq-weighted Gruen cubic inputs."""
    n2 = az.shape[0]
    n = n2 // 2
    assert bz.shape == az.shape and eq.shape[0] == n
    blocks = max(1, n // BLOCK)
    bs = n // blocks
    r_row = jnp.broadcast_to(r[None, :], (1, 16))
    az = az.reshape(n, 32)
    bz = bz.reshape(n, 32)
    p_row = jnp.asarray(np.array(FR_C.p_limbs, dtype=np.uint32)[None, :])

    out = pl.pallas_call(
        partial(_round_kernel, inv=np.uint32(FR_C.inv)),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((bs, 32), lambda i: (i, 0)),
            pl.BlockSpec((bs, 32), lambda i: (i, 0)),
            pl.BlockSpec((bs, 16), lambda i: (i, 0)),
            pl.BlockSpec((1, 16), lambda i: (0, 0)),
            pl.BlockSpec((1, 16), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bs, 16), lambda i: (i, 0)),
            pl.BlockSpec((bs, 16), lambda i: (i, 0)),
            pl.BlockSpec((blocks, 16), lambda i: (0, 0)),
            pl.BlockSpec((blocks, 16), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 16), az.dtype),
            jax.ShapeDtypeStruct((n, 16), az.dtype),
            jax.ShapeDtypeStruct((blocks, 16), az.dtype),
            jax.ShapeDtypeStruct((blocks, 16), az.dtype),
        ],
        interpret=interpret,
    )(az, bz, eq, r_row, p_row)
    az_f, bz_f, t0_parts, tinf_parts = out

    def tree(parts):
        m = parts.shape[0]
        while m > 1:
            h = m // 2
            parts = limb.add(parts[:h], parts[h:m], FR_C)
            m = h
        return parts[0]

    return az_f, bz_f, tree(t0_parts), tree(tinf_parts)
