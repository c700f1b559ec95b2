"""MultiquadraticPolynomial ({0,1,∞}^d grids) and EqPlusOnePrefixSuffix —
the two window/decomposition components of the long-trace machinery
(reference src/poly/multiquadratic.zig, src/poly/mod.zig:464-581)."""

import random

import pytest

from zolt_tpu.field.params import FR
from zolt_tpu.poly.multiquadratic import (MultiquadraticPolynomial, expand_grid,
                                          pow3, ternary_index)
from zolt_tpu.poly.special import (EqPlusOnePrefixSuffix, eq_plus_one_evals,
                                   eq_plus_one_mle)

P = FR.p
rng = random.Random(42)


def test_from_linear_preserves_boolean_points():
    for d in (1, 2, 3, 5):
        lin = [rng.randrange(P) for _ in range(1 << d)]
        mq = MultiquadraticPolynomial.from_linear(d, lin)
        for j in range(1 << d):
            pt = [(j >> i) & 1 for i in range(d)]
            assert mq.get(pt) == lin[j]


def test_infinity_lane_is_slope():
    d = 3
    lin = [rng.randrange(P) for _ in range(1 << d)]
    mq = MultiquadraticPolynomial.from_linear(d, lin)
    # (∞, 0, 0): slope along z_0 at rest = 0
    assert mq.get_infinity() == (lin[1] - lin[0]) % P
    # (0, ∞, 0): slope along z_1
    assert mq.get([0, 2, 0]) == (lin[2] - lin[0]) % P


def test_product_grid_bind_equals_fold_then_multiply():
    """The grid of az·bz binds like the product of the folded factors —
    the invariant the streaming outer prover relies on."""
    for d in (1, 2, 4):
        az = [rng.randrange(P) for _ in range(1 << d)]
        bz = [rng.randrange(P) for _ in range(1 << d)]
        ga = MultiquadraticPolynomial.from_linear(d, az)
        gb = MultiquadraticPolynomial.from_linear(d, bz)
        prod = MultiquadraticPolynomial(
            d, [x * y % P for x, y in zip(ga.evaluations, gb.evaluations)])
        r = rng.randrange(P)
        prod.bind(r)
        fa = [(az[2 * j] + r * (az[2 * j + 1] - az[2 * j])) % P
              for j in range(1 << (d - 1))]
        fb = [(bz[2 * j] + r * (bz[2 * j + 1] - bz[2 * j])) % P
              for j in range(1 << (d - 1))]
        for j in range(1 << (d - 1)):
            pt = [(j >> i) & 1 for i in range(d - 1)]
            assert prod.get(pt) == fa[j] * fb[j] % P


def test_fully_bound_final_claim():
    d = 3
    az = [rng.randrange(P) for _ in range(1 << d)]
    bz = [rng.randrange(P) for _ in range(1 << d)]
    ga = MultiquadraticPolynomial.from_linear(d, az)
    gb = MultiquadraticPolynomial.from_linear(d, bz)
    prod = MultiquadraticPolynomial(
        d, [x * y % P for x, y in zip(ga.evaluations, gb.evaluations)])
    rs = [rng.randrange(P) for _ in range(d)]
    fa, fb = list(az), list(bz)
    for r in rs:
        prod.bind(r)
        fa = [(fa[2 * j] + r * (fa[2 * j + 1] - fa[2 * j])) % P
              for j in range(len(fa) // 2)]
        fb = [(fb[2 * j] + r * (fb[2 * j + 1] - fb[2 * j])) % P
              for j in range(len(fb) // 2)]
    assert prod.is_bound
    assert prod.final_sumcheck_claim() == fa[0] * fb[0] % P


def test_project_to_first_variable_window_sums():
    """t'(0)/t'(∞) projection equals the stage-1 Gruen window sums for a
    product grid: Σ eq·az0·bz0 and Σ eq·(az1−az0)(bz1−bz0)."""
    d = 4
    az = [rng.randrange(P) for _ in range(1 << d)]
    bz = [rng.randrange(P) for _ in range(1 << d)]
    eqw = [rng.randrange(P) for _ in range(1 << (d - 1))]
    ga = MultiquadraticPolynomial.from_linear(d, az)
    gb = MultiquadraticPolynomial.from_linear(d, bz)
    prod = MultiquadraticPolynomial(
        d, [x * y % P for x, y in zip(ga.evaluations, gb.evaluations)])
    t0, tinf = prod.project_to_first_variable(eqw)
    exp0 = sum(eqw[j] * (az[2 * j] * bz[2 * j] % P)
               for j in range(1 << (d - 1))) % P
    expI = sum(eqw[j] * ((az[2 * j + 1] - az[2 * j])
                         * (bz[2 * j + 1] - bz[2 * j]) % P)
               for j in range(1 << (d - 1))) % P
    assert (t0, tinf) == (exp0, expI)


def test_expand_grid_inplace():
    d = 2
    lin = [rng.randrange(P) for _ in range(1 << d)]
    grid = [0] * pow3(d)
    grid[ternary_index([0, 0])] = lin[0]
    grid[ternary_index([1, 0])] = lin[1]
    grid[ternary_index([0, 1])] = lin[2]
    grid[ternary_index([1, 1])] = lin[3]
    expand_grid(d, grid)
    assert grid == MultiquadraticPolynomial.from_linear(d, lin).evaluations


# ---------------------------------------------------------------------------
# EqPlusOnePrefixSuffix
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("n", [2, 3, 5, 7])
def test_eqp1_prefix_suffix_matches_dense(n):
    r = [rng.randrange(P) for _ in range(n)]
    ps = EqPlusOnePrefixSuffix(r)
    dense = eq_plus_one_evals(r)
    assert [ps.evaluate(y) for y in range(1 << n)] == dense
    assert ps.dense_table() == dense
    assert ps.dense_table(3) == dense[:3]
    assert ps.prefix_size() == 1 << (n - n // 2)
    assert ps.suffix_size() == 1 << (n // 2)


def test_eqp1_prefix_suffix_matches_pointwise_mle():
    n = 4
    r = [rng.randrange(P) for _ in range(n)]
    ps = EqPlusOnePrefixSuffix(r)
    for y in range(1 << n):
        bits = [(y >> (n - 1 - b)) & 1 for b in range(n)]
        assert ps.evaluate(y) == eq_plus_one_mle(r, bits)


def test_fast_eq_plus_one_evals_matches_pointwise():
    for n in (1, 2, 4, 6):
        r = [rng.randrange(P) for _ in range(n)]
        fast = eq_plus_one_evals(r)
        for y in range(1 << n):
            bits = [(y >> (n - 1 - b)) & 1 for b in range(n)]
            assert fast[y] == eq_plus_one_mle(r, bits)


def test_stage1_round_window_form_matches_fused_kernel():
    """The multiquadratic window form reproduces the production stage-1
    round sums on real prover tables (collatz trace, round 1)."""
    from zolt_tpu.native.frvec import FrVec
    from zolt_tpu.r1cs import inputs as ri, uniskip as us
    from zolt_tpu.vm import pad_with_noop, run_elf
    from zolt_tpu.zkvm.streaming_outer import (StreamingOuterProver,
                                               window_round_evals_multiquadratic)

    emu = run_elf("/root/reference/examples/fibonacci.elf")
    padded = pad_with_noop(list(emu.trace))
    witnesses = ri.witness_matrix(padded)
    n_cycle = (len(padded)).bit_length() - 1
    tau = [rng.randrange(P) for _ in range(n_cycle + 2)]
    prover = StreamingOuterProver(witnesses, tau, lagrange_tau_r0=12345)
    prover.bind_first_round(98765, 1111)

    se = prover.split_eq
    head = se.current_index - 1
    head_out = min(head, se.m)
    head_in = head - head_out
    E_out = se.E_out_vec[min(head_out, len(se.E_out_vec) - 1)]
    E_in = se.E_in_vec[min(head_in, len(se.E_in_vec) - 1)]
    az, bz = prover.az.to_ints(), prover.bz.to_ints()
    n2 = len(az) // 2
    t0_w, tinf_w = window_round_evals_multiquadratic(az, bz, E_out, E_in, head_in)
    n_out = max(1, n2 >> head_in)
    n_in = min(1 << head_in, n2)
    t0_k, tinf_k = FrVec.gruen_quad(FrVec.from_ints(E_out[:n_out]),
                                    FrVec.from_ints(E_in[:n_in]), head_in,
                                    prover.az, prover.bz, n2)
    assert (t0_w, tinf_w) == (t0_k, tinf_k)
