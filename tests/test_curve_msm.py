"""Curve + MSM tests: device Jacobian kernels and Pippenger vs host oracle."""

import numpy as np

from zolt_tpu.curve import device as dev
from zolt_tpu.curve import host as chost
from zolt_tpu.field.params import FR
from zolt_tpu.msm import msm, msm_oracle

RNG = np.random.default_rng(17)


def rand_scalars(n):
    return [int.from_bytes(RNG.bytes(40), "little") % FR.p for _ in range(n)]


def test_host_curve_basics():
    g = chost.G1_GEN
    assert chost.is_on_curve(g)
    g2 = chost.add(g, g)
    assert chost.is_on_curve(g2)
    assert chost.scalar_mul(g, 2) == g2
    assert chost.add(g, chost.neg(g)) is None
    # group order kills the generator
    assert chost.scalar_mul(g, FR.p) is None or chost.scalar_mul(g, FR.p - 1) == chost.neg(g)


def test_device_add_double_vs_host():
    pts = chost.random_points(8, seed=5)
    qts = chost.random_points(8, seed=11)
    A = dev.from_affine_host(pts)
    B = dev.from_affine_host(qts)
    got_add = dev.to_affine_host(dev.pt_add(A, B))
    exp_add = [chost.add(p, q) for p, q in zip(pts, qts)]
    assert got_add == exp_add
    got_dbl = dev.to_affine_host(dev.pt_double(A))
    assert got_dbl == [chost.add(p, p) for p in pts]


def test_device_add_edge_cases():
    g = chost.G1_GEN
    pts = [g, None, g, chost.neg(g), None]
    qts = [g, g, None, g, None]
    A = dev.from_affine_host(pts)
    B = dev.from_affine_host(qts)
    got = dev.to_affine_host(dev.pt_add(A, B))
    exp = [chost.add(p, q) for p, q in zip(pts, qts)]
    assert got == exp  # double, left-identity, right-identity, inverse, both-identity


def test_msm_small_vs_oracle():
    n = 8
    pts = chost.random_points(n, seed=3)
    scalars = rand_scalars(n)
    assert msm(pts, scalars) == msm_oracle(pts, scalars)


def test_msm_edge_scalars():
    pts = chost.random_points(4, seed=9)
    scalars = [0, 1, FR.p - 1, 2**255 % FR.p]
    assert msm(pts, scalars) == msm_oracle(pts, scalars)


def test_msm_with_identity_points():
    pts = [chost.G1_GEN, None, chost.scalar_mul(chost.G1_GEN, 7)]
    scalars = [5, 9, 11]
    assert msm(pts, scalars) == msm_oracle(pts, scalars)
