"""HyperKZG commit/open/verify — mirror of examples/hyperkzg_commitment.zig."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zolt_tpu.field.params import FR
from zolt_tpu.pcs import hyperkzg, srs
from zolt_tpu.poly import dense
from zolt_tpu.field import limb
from zolt_tpu.field.limb import FR_C
from zolt_tpu.transcript import Blake2bTranscript


def main() -> None:
    poly = [(i * 31 + 5) % FR.p for i in range(16)]  # 4-variable multilinear
    setup = srs.insecure_setup(64)
    commitment = hyperkzg.commit_ints(setup, poly)
    print(f"commitment: ({commitment[0]:#x}, {commitment[1]:#x})")

    point = [3, 5, 7, 11]
    value = dense.evaluate(limb.encode(poly, FR_C), point, FR_C)
    proof = hyperkzg.open_at(setup, poly, point, Blake2bTranscript(b"hkzg"))
    ok = hyperkzg.verify(setup, commitment, point, value, proof,
                         Blake2bTranscript(b"hkzg"))
    print(f"opening value: {value:#x}, verified: {ok}")
    assert ok


if __name__ == "__main__":
    main()
