"""BN254 field arithmetic on the device — mirror of the reference's
examples/field_arithmetic.zig, TPU-first: batches of Montgomery mults on
the accelerator, cross-checked against the host bigint oracle."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from zolt_tpu.field import FR, limb
from zolt_tpu.field.limb import FR_C


def main() -> None:
    rng = np.random.default_rng(42)
    xs = [int.from_bytes(rng.bytes(40), "little") % FR.p for _ in range(8)]
    ys = [int.from_bytes(rng.bytes(40), "little") % FR.p for _ in range(8)]

    X, Y = limb.encode(xs, FR_C), limb.encode(ys, FR_C)
    prod = limb.decode(limb.mont_mul(X, Y, FR_C), FR_C)
    sum_ = limb.decode(limb.add(X, Y, FR_C), FR_C)
    inv = limb.decode(limb.batch_inverse(X, FR_C), FR_C)

    print("BN254 scalar field (Fr)")
    print(f"  p = {FR.p:#x}")
    for i in range(3):
        print(f"  x[{i}]*y[{i}] mod p = {int(prod[i]):#x}")
        assert int(prod[i]) == xs[i] * ys[i] % FR.p
        assert int(sum_[i]) == (xs[i] + ys[i]) % FR.p
        assert int(inv[i]) * xs[i] % FR.p == 1
    print("device results match the host oracle ✔")


if __name__ == "__main__":
    main()
