"""GruenSplitEq + EqPlusOne semantics tests."""

import numpy as np

from zolt_tpu.field.params import FR
from zolt_tpu.poly.special import GruenSplitEq, eq_plus_one_evals, eq_plus_one_mle

P = FR.p
RNG = np.random.default_rng(55)


def rand_ints(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def eq_be(tau, j, n):
    acc = 1
    for b in range(n):
        bit = (j >> (n - 1 - b)) & 1
        acc = acc * ((tau[b] * bit + (1 - tau[b]) * (1 - bit)) % P) % P
    return acc


def test_full_eq_table_matches_direct():
    tau = rand_ints(4)
    g = GruenSplitEq(tau)
    table = g.full_eq_table()
    assert len(table) == 16
    for j in range(16):
        assert table[j] == eq_be(tau, j, 4)


def test_bind_low_to_high_scalar_accumulation():
    tau = rand_ints(4)
    rs = rand_ints(4)
    g = GruenSplitEq(tau)
    # bind from the last variable backwards (low-to-high over LSB-most var)
    expect = 1
    for i, r in enumerate(rs):
        g.bind(r)
        t = tau[len(tau) - 1 - i]
        expect = expect * ((t * r + (1 - t) * (1 - r)) % P) % P
        assert g.current_scalar == expect
    assert g.current_index == 0


def test_scaled_table():
    tau = rand_ints(3)
    s = rand_ints(1)[0]
    g = GruenSplitEq(tau, scaling_factor=s)
    t0 = GruenSplitEq(tau).full_eq_table()
    ts = g.full_eq_table()
    assert ts == [s * v % P for v in t0]


def test_partial_bind_table():
    tau = rand_ints(4)
    r = rand_ints(1)[0]
    g = GruenSplitEq(tau)
    g.bind(r)  # binds tau[3] (the LSB variable)
    table = g.full_eq_table()
    assert len(table) == 8
    # table[j] should equal scalar * eq(tau[0..3], j) over 3 vars
    eqf = (tau[3] * r + (1 - tau[3]) * (1 - r)) % P
    for j in range(8):
        assert table[j] == eqf * eq_be(tau[:3], j, 3) % P


def test_eq_plus_one_boolean_points():
    n = 4
    x_bits = 5  # 0101
    x = [(x_bits >> (n - 1 - b)) & 1 for b in range(n)]
    evals = eq_plus_one_evals(x)
    for j in range(1 << n):
        assert evals[j] == (1 if j == x_bits + 1 else 0), f"j={j}"


def test_eq_plus_one_all_ones_is_zero():
    x = [1, 1, 1]
    assert all(v == 0 for v in eq_plus_one_evals(x))


def test_eq_plus_one_random_point_sums():
    # Σ_j eq+1(x, j) over the cube = Σ_x' [x' = x+1 representable] — at a random
    # field point this equals 1 - prod(x_i) (probability x is not all-ones MLE)
    x = rand_ints(3)
    total = sum(eq_plus_one_evals(x)) % P
    prod_ones = 1
    for xi in x:
        prod_ones = prod_ones * xi % P
    assert total == (1 - prod_ones) % P
