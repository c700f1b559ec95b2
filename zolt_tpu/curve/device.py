"""Batched BN254 G1 Jacobian arithmetic on device (Fp limb arrays).

A point batch is a (X, Y, Z) triple of uint32[..., 16] Fp Montgomery limb
arrays; Z == 0 encodes the identity. Formulas are the standard a=0 EFD ones
(dbl-2009-l, add-2007-bl), fully vectorized with `select`-based edge handling
so batches mixing identity/equal/negative pairs stay correct — the TPU has no
branches, so every case is computed and masked (contrast the reference's
branchy scalar code, src/msm/mod.zig:145-329).

Cost: double ≈ 7 Fp muls, add ≈ 16 Fp muls; each mul is the column-REDC
mont_mul vectorized over the whole batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..field import limb
from ..field.limb import FP_C
from ..field.params import FP

F = FP_C


def _mul(a, b):
    return limb.mont_mul(a, b, F)


def _sqr(a):
    return limb.mont_mul(a, a, F)


def _add(a, b):
    return limb.add(a, b, F)


def _sub(a, b):
    return limb.sub(a, b, F)


def _dbl(a):  # 2a
    return limb.add(a, a, F)


def pt_infinity(shape=()):
    z = limb.zeros(shape)
    return z, z, z


def pt_is_inf(pt):
    return limb.is_zero(pt[2])


@jax.jit
def pt_double(pt):
    """dbl-2009-l: 2P in Jacobian coordinates."""
    X1, Y1, Z1 = pt
    A = _sqr(X1)
    B = _sqr(Y1)
    C = _sqr(B)
    D = _dbl(_sub(_sub(_sqr(_add(X1, B)), A), C))
    E = _add(_dbl(A), A)  # 3A
    Fq = _sqr(E)
    X3 = _sub(Fq, _dbl(D))
    Y3 = _sub(_mul(E, _sub(D, X3)), _dbl(_dbl(_dbl(C))))  # E(D-X3) - 8C
    Z3 = _dbl(_mul(Y1, Z1))
    return X3, Y3, Z3


@jax.jit
def pt_add(pa, pb):
    """add-2007-bl with full edge handling (identity, doubling, inverse)."""
    X1, Y1, Z1 = pa
    X2, Y2, Z2 = pb
    Z1Z1 = _sqr(Z1)
    Z2Z2 = _sqr(Z2)
    U1 = _mul(X1, Z2Z2)
    U2 = _mul(X2, Z1Z1)
    S1 = _mul(Y1, _mul(Z2, Z2Z2))
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, U1)
    rr = _dbl(_sub(S2, S1))
    I = _sqr(_dbl(H))
    J = _mul(H, I)
    V = _mul(U1, I)
    X3 = _sub(_sub(_sqr(rr), J), _dbl(V))
    Y3 = _sub(_mul(rr, _sub(V, X3)), _dbl(_mul(S1, J)))
    Z3 = _mul(_sub(_sub(_sqr(_add(Z1, Z2)), Z1Z1), Z2Z2), H)

    a_inf = limb.is_zero(Z1)
    b_inf = limb.is_zero(Z2)
    h_zero = limb.is_zero(H)
    r_zero = limb.is_zero(rr)
    need_double = jnp.logical_and(jnp.logical_and(h_zero, r_zero),
                                  jnp.logical_not(jnp.logical_or(a_inf, b_inf)))
    # opposite points (H==0, rr!=0) -> infinity
    to_inf = jnp.logical_and(h_zero, jnp.logical_not(r_zero))

    dX, dY, dZ = pt_double(pa)
    zeros = jnp.zeros_like(X3)

    X3 = limb.select(need_double, dX, X3)
    Y3 = limb.select(need_double, dY, Y3)
    Z3 = limb.select(need_double, dZ, Z3)
    Z3 = limb.select(jnp.logical_and(to_inf, jnp.logical_not(jnp.logical_or(a_inf, b_inf))),
                     zeros, Z3)
    # identity cases
    X3 = limb.select(a_inf, X2, limb.select(b_inf, X1, X3))
    Y3 = limb.select(a_inf, Y2, limb.select(b_inf, Y1, Y3))
    Z3 = limb.select(a_inf, Z2, limb.select(b_inf, Z1, Z3))
    return X3, Y3, Z3


# ---------------------------------------------------------------------------
# host <-> device
# ---------------------------------------------------------------------------

def from_affine_host(points):
    """List of host affine points (or None) -> device Jacobian triple (Z=1)."""
    xs, ys, zs = [], [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
            zs.append(1)
    return (limb.encode(xs, F), limb.encode(ys, F), limb.encode(zs, F))


def to_affine_host(pt):
    """Device Jacobian triple -> list of host affine points (or None)."""
    import numpy as np

    from . import host

    X = limb.decode(np.asarray(pt[0]), F)
    Y = limb.decode(np.asarray(pt[1]), F)
    Z = limb.decode(np.asarray(pt[2]), F)
    X, Y, Z = (np.atleast_1d(a) for a in (X, Y, Z))
    return [host.jacobian_to_affine(int(x), int(y), int(z)) for x, y, z in zip(X, Y, Z)]
