"""Interactive sumcheck over a product of multilinear polynomials — mirror of
the reference's examples/sumcheck_protocol.zig with the device round kernel."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zolt_tpu.field.params import FR
from zolt_tpu.sumcheck.driver import ProductSumcheck, run_sumcheck, verify_sumcheck
from zolt_tpu.transcript import KeccakTranscript


def main() -> None:
    n = 16
    a = [(i * 7 + 3) % FR.p for i in range(n)]
    b = [(i * i + 1) % FR.p for i in range(n)]
    claim = sum(x * y for x, y in zip(a, b)) % FR.p
    print(f"claim: sum_i a_i * b_i = {claim:#x}")

    proof = run_sumcheck(ProductSumcheck([a, b]), KeccakTranscript(b"example"))
    ok = verify_sumcheck(proof, claim, KeccakTranscript(b"example"))
    print(f"rounds: {len(proof.round_polys)}, verified: {ok}")
    assert ok


if __name__ == "__main__":
    main()
