"""KZG structured reference strings.

Insecure deterministic setup for tests (known τ — matches the reference's test
path, src/poly/commitment/mod.zig:174-189, τ = 0x12345678); PTAU ceremony-file
loading mirrors reference srs.zig and lands in a later milestone.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curve import g2 as G2
from ..curve import host as G1
from ..field.params import FR

INSECURE_TAU = 0x12345678


@dataclass
class KZGSRS:
    powers_g1: list  # [G, τG, τ²G, ...] host affine points
    tau_g2: tuple    # [τ]₂
    g1: tuple
    g2: tuple

    @property
    def max_degree(self) -> int:
        return len(self.powers_g1)


def insecure_setup(n: int, tau: int = INSECURE_TAU) -> KZGSRS:
    """Powers-of-τ SRS with a known τ. INSECURE — test/dev only."""
    powers = []
    t = 1
    for _ in range(n):
        powers.append(G1.scalar_mul(G1.G1_GEN, t))
        t = t * tau % FR.p
    return KZGSRS(
        powers_g1=powers,
        tau_g2=G2.scalar_mul(G2.G2_GEN, tau),
        g1=G1.G1_GEN,
        g2=G2.G2_GEN,
    )
