"""Generic sumcheck engine: device round-poly evaluation, host transcript.

Architecture (SURVEY §5.7/§7): the per-round work — evaluating the round
polynomial at {0..d} and folding the evaluation tables by the challenge — runs
on device over the full batch; the Fiat-Shamir transcript lives on host, giving
one host↔device sync per round (a few hundred rounds total per proof).

An instance implements:
    num_rounds          — total rounds
    degree              — round-polynomial degree d
    round_evals()       — [p(0), p(1), ..., p(d)] as canonical ints
    bind(r: int)        — fold tables with the round challenge
    final_claims()      — whatever the protocol opens at the end

`run_sumcheck` drives prover+transcript in the Jolt style: append the
compressed round poly, squeeze the 125-bit challenge, bind
(reference: src/subprotocols/mod.zig:18-250, src/zkvm/batched_sumcheck.zig).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

from ..field import limb
from ..field.limb import FR_C
from ..field.params import FR
from ..poly import dense, unipoly

P = FR.p


@dataclass
class SumcheckProof:
    """One sumcheck instance's transcript artifacts (canonical ints)."""

    compressed_polys: list[list[int]] = dfield(default_factory=list)
    challenges: list[int] = dfield(default_factory=list)
    final_claim: int = 0


def run_sumcheck(instance, transcript, claim: int) -> SumcheckProof:
    """Prove one (non-batched) sumcheck instance, Jolt transcript discipline:
    per round append compressed coefficients as a scalar vector, then squeeze a
    125-bit optimized challenge."""
    proof = SumcheckProof()
    for _ in range(instance.num_rounds):
        evals = instance.round_evals()
        coeffs = unipoly.interpolate(evals)
        compressed = unipoly.compress(coeffs)
        transcript.append_scalars(compressed)
        r = transcript.challenge_scalar()
        proof.compressed_polys.append(compressed)
        proof.challenges.append(r)
        instance.bind(r)
        claim = unipoly.horner_eval(coeffs, r)
    proof.final_claim = claim
    return proof


def verify_sumcheck(proof: SumcheckProof, transcript, claim: int,
                    num_rounds: int, degree: int):
    """Mirror verifier: recover c1 from the hint, check claim evolution, and
    reproduce challenges from the transcript. Returns (final_claim, challenges)."""
    challenges = []
    for rnd in range(num_rounds):
        compressed = proof.compressed_polys[rnd]
        assert len(compressed) == degree, f"round {rnd}: wrong poly size"
        coeffs = unipoly.decompress(compressed, claim)
        transcript.append_scalars(compressed)
        r = transcript.challenge_scalar()
        assert r == proof.challenges[rnd], f"round {rnd}: challenge mismatch"
        challenges.append(r)
        claim = unipoly.horner_eval(coeffs, r)
    return claim, challenges


class ProductSumcheck:
    """Σ_x Π_k A_k(x) over the boolean cube — the basic multi-MLE instance.

    Tables are device limb arrays; binds low-to-high (Jolt bound_poly_var_bot).
    Degree = number of factors.
    """

    def __init__(self, polys, f=FR_C):
        self.polys = list(polys)
        self.f = f
        n = self.polys[0].shape[0]
        assert all(p.shape[0] == n for p in self.polys)
        self.num_rounds = n.bit_length() - 1
        self.degree = len(self.polys)

    def round_evals(self) -> list[int]:
        f = self.f
        # lo/hi split on the low variable; evaluate each factor at t = 0..degree
        los, diffs = [], []
        for poly in self.polys:
            pairs = poly.reshape(poly.shape[0] // 2, 2, -1)
            lo, hi = pairs[:, 0, :], pairs[:, 1, :]
            los.append(lo)
            diffs.append(limb.sub(hi, lo, f))
        out = []
        for t in range(self.degree + 1):
            prod = None
            for lo, diff in zip(los, diffs):
                val = lo
                for _ in range(t):  # lo + t*diff by repeated add (t is tiny)
                    val = limb.add(val, diff, f)
                prod = val if prod is None else limb.mont_mul(prod, val, f)
            out.append(int(limb.decode(dense.sum_mod(prod, f), f)))
        return out

    def bind(self, r: int) -> None:
        rl = limb.encode([r], self.f)[0]
        self.polys = [dense.bind_low(p, rl, self.f) for p in self.polys]

    def final_claims(self) -> list[int]:
        return [int(limb.decode(p[0], self.f)) for p in self.polys]


def initial_claim_product(polys, f=FR_C) -> int:
    """Σ_x Π_k A_k(x) computed directly on device (for the prover's opening claim)."""
    prod = None
    for pl in polys:
        prod = pl if prod is None else limb.mont_mul(prod, pl, f)
    return int(limb.decode(dense.sum_mod(prod, f), f))
