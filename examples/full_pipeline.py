"""End-to-end Jolt-format pipeline on fibonacci.elf — mirror of
examples/full_pipeline.zig: emulate, commit, derive tau, run all 7 stages,
serialize the arkworks proof."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import sys

from zolt_tpu.zkvm.pipeline import prove_jolt

ELF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/examples/fibonacci.elf"


def main() -> None:
    res = prove_jolt(ELF, with_joint_proof=True)
    proof = res.conv.proof
    blob = proof.serialize_with_dory()
    print(f"trace: {res.emulator.cycle} cycles (padded {len(res.padded_steps)})")
    print(f"commitments: {len(proof.commitments)} GT elements")
    print(f"opening claims: {len(proof.opening_claims)}")
    print(f"stage rounds: "
          f"{[len(getattr(proof, f'stage{i}_sumcheck').compressed_polys) for i in range(1, 8)]}")
    print(f"serialized proof: {len(blob)} bytes")


if __name__ == "__main__":
    main()
