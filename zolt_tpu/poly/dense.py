"""Dense multilinear polynomials as device limb arrays.

A dense MLE over n variables is a `uint32[2^n, 16]` Montgomery limb array.
Conventions follow the reference exactly (src/poly/mod.zig:23-330):

- `evaluate(evals, point)`: little-endian — point[0] pairs with the LSB of the
  evaluation index (reference evaluate loop, poly/mod.zig:73-91).
- `bind_low(evals, r)`: Jolt's bound_poly_var_bot, new[i] = e[2i] + r·(e[2i+1]−e[2i])
  (poly/mod.zig:160-175). Binds the little-end variable.
- `bind_first(evals, r)`: new[i] = (1−r)·e[i] + r·e[i+half] (poly/mod.zig:128-148).
  Binds the big-end variable.
- `eq_evals(r)`: big-endian doubling algorithm — r[0] is the MSB of the index
  (poly/mod.zig:240-290, Jolt's evals_parallel).

These are the sumcheck hot loops: each is an embarrassingly parallel lerp over
the batch, which XLA fuses into a handful of VPU kernels; under a mesh they
shard on the evaluation axis with `psum` for the round-poly sums.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..field import limb
from ..field.limb import FR_C, FieldConst


@partial(jax.jit, static_argnames="f")
def bind_low(evals, r, f: FieldConst = FR_C):
    """Bind the lowest-index variable: out[i] = e[2i] + r*(e[2i+1] - e[2i])."""
    n = evals.shape[0]
    pairs = evals.reshape(n // 2, 2, -1)
    lo, hi = pairs[:, 0, :], pairs[:, 1, :]
    return limb.add(lo, limb.mont_mul(r[None], limb.sub(hi, lo, f), f), f)


@partial(jax.jit, static_argnames="f")
def bind_first(evals, r, f: FieldConst = FR_C):
    """Bind the highest-index variable: out[i] = (1-r)*e[i] + r*e[i+half]."""
    half = evals.shape[0] // 2
    lo, hi = evals[:half], evals[half:]
    return limb.add(lo, limb.mont_mul(r[None], limb.sub(hi, lo, f), f), f)


@partial(jax.jit, static_argnames="f")
def sum_mod(evals, f: FieldConst = FR_C):
    """Modular sum over axis 0 via a binary reduction tree of field adds.

    Shapes must be a power of two on axis 0. (A Pallas accumulate-then-
    renormalize variant lives conceptually in field/pallas_kernels.py — see
    its status note for why the XLA tree remains the production path.)
    """
    x = evals
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        x = limb.add(x[:half], x[half:], f)
    return x[0]


def evaluate(evals, point_ints, f: FieldConst = FR_C):
    """MLE evaluation at a host point (list of canonical ints), little-endian.

    Folds with bind_low over point[0], point[1], ... — equivalent to the
    reference's term-by-term formula but O(n) field muls.
    """
    x = evals
    for p in point_ints:
        r = limb.encode([p], f)[0]
        x = bind_low(x, r, f)
    return int(limb.decode(x[0], f))


@partial(jax.jit, static_argnames=("n", "f"))
def _eq_evals_from_rmat(r_mat, scale, n: int, f: FieldConst = FR_C):
    """Doubling eq-table build: r_mat is (n,16) with r[0] the MSB variable."""
    out = scale[None]  # (1, 16)
    for j in range(n - 1, -1, -1):
        y = limb.mont_mul(out, r_mat[j][None], f)
        out = jnp.concatenate([limb.sub(out, y, f), y], axis=0)
    return out


def eq_evals(r_ints, f: FieldConst = FR_C, scale: int = 1):
    """eq(r, x) for all x in {0,1}^n, big-endian (r[0] = MSB of index).

    Matches Jolt's EqPolynomial::evals / evals_parallel with optional scaling
    (reference poly/mod.zig:252-290)."""
    n = len(r_ints)
    if n == 0:
        return limb.encode([scale], f)
    r_mat = limb.encode(list(r_ints), f)
    s = limb.encode([scale], f)[0]
    return _eq_evals_from_rmat(r_mat, s, n, f)


def eq_mle(r_ints, x_ints, p: int) -> int:
    """Host-side eq(r, x) = prod(r_i x_i + (1-r_i)(1-x_i)) mod p."""
    acc = 1
    for r, x in zip(r_ints, x_ints):
        acc = acc * ((r * x + (1 - r) * (1 - x)) % p) % p
    return acc
