"""Interactive sumcheck over a product of multilinear polynomials — mirror of
the reference's examples/sumcheck_protocol.zig with the device round kernel."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zolt_tpu.field import limb
from zolt_tpu.field.limb import FR_C
from zolt_tpu.field.params import FR
from zolt_tpu.sumcheck.driver import ProductSumcheck, run_sumcheck, verify_sumcheck
from zolt_tpu.transcript import Blake2bTranscript


def main() -> None:
    n = 16
    a = [(i * 7 + 3) % FR.p for i in range(n)]
    b = [(i * i + 1) % FR.p for i in range(n)]
    claim = sum(x * y for x, y in zip(a, b)) % FR.p
    print(f"claim: sum_i a_i * b_i = {claim:#x}")

    polys = [limb.encode(a, FR_C), limb.encode(b, FR_C)]
    inst = ProductSumcheck(polys)
    proof = run_sumcheck(inst, Blake2bTranscript(b"example"), claim)

    final_claim, challenges = verify_sumcheck(
        proof, Blake2bTranscript(b"example"), claim,
        num_rounds=inst.num_rounds, degree=inst.degree)
    # final check: claim == A(r)·B(r)
    from zolt_tpu.poly import dense

    pt = list(challenges)
    av = dense.evaluate(limb.encode(a, FR_C), pt, FR_C)
    bv = dense.evaluate(limb.encode(b, FR_C), pt, FR_C)
    ok = final_claim == av * bv % FR.p
    print(f"rounds: {len(proof.compressed_polys)}, verified: {ok}")
    assert ok


if __name__ == "__main__":
    main()
