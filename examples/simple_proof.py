"""Prove + verify a small program with the reference-parity internal prover —
mirror of examples/simple_proof.zig."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zolt_tpu.vm import Emulator, MemoryConfig, pad_with_noop
from zolt_tpu.zkvm.internal import prove_internal, verify_internal


def main() -> None:
    code = b"".join(w.to_bytes(4, "little")
                    for w in (0x00500093, 0x02A00113, 0x002081B3, 0x0000006F))
    emu = Emulator(MemoryConfig(program_size=256))
    emu.load_program(code)
    emu.run()
    padded = pad_with_noop(list(emu.trace))
    proof = prove_internal(emu, padded, code)
    blob = proof.serialize()
    print(f"proof: {len(blob)} bytes, stages: "
          f"{[len(sp.round_polys) for sp in proof.stage_proofs]}")
    assert verify_internal(proof)
    print("verified ✔")


if __name__ == "__main__":
    main()
