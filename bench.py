"""Benchmark: end-to-end fibonacci.elf Jolt-format prove wall-clock.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference's only recorded end-to-end datapoint is a fibonacci.elf
Jolt-format prove at 517,637.88 ms (debug build with heavy logging,
/root/reference/logs/zolt.log; see BASELINE.md). This measures the same
flagship path — emulate, Fiat-Shamir preamble, 37 Dory GT commitments,
τ derivation, the 7 proof stages, the joint Dory opening proof, and
arkworks serialization — on this machine. vs_baseline is the speedup
factor over the reference number (>1 = faster).

A warmup run populates the in-process XLA compilation caches; the metric
is the BEST of three timed runs — on this shared box, wall clock swings up
to 2x with noisy neighbors, and min-of-N is the standard way to recover the
steady-state number (per-stage [ZTPU] TIMING lines are the stable
per-component signal).
"""

import json
import time

FIB_ELF = "/root/reference/examples/fibonacci.elf"
REFERENCE_MS = 517_637.88


def _prove_once() -> int:
    from zolt_tpu.zkvm.pipeline import prove_jolt

    res = prove_jolt(FIB_ELF, with_joint_proof=True)
    blob = res.conv.proof.serialize_with_dory()
    assert len(blob) > 40000, "unexpectedly small proof"
    return len(blob)


def main() -> None:
    _prove_once()  # warmup: compile all shapes
    dt_ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _prove_once()
        dt_ms = min(dt_ms, (time.perf_counter() - t0) * 1000)
    print(
        json.dumps(
            {
                "metric": "fibonacci_jolt_format_prove_wall_clock",
                "value": dt_ms,
                "unit": "ms",
                "vs_baseline": REFERENCE_MS / dt_ms,
            }
        )
    )


if __name__ == "__main__":
    main()
