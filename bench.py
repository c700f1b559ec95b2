"""Benchmark: end-to-end fibonacci.elf prove wall-clock on the real chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference's only recorded end-to-end datapoint is a fibonacci.elf
Jolt-format prove at 517,637.88 ms (debug build with heavy logging,
/root/reference/logs/zolt.log; see BASELINE.md). vs_baseline reports the
speedup factor of our prove over that number (>1 = faster than reference).

A warmup prove populates the in-process + persistent XLA compilation caches;
the timed run reflects steady-state prover throughput.
"""

import json
import time

FIB_ELF = "/root/reference/examples/fibonacci.elf"
REFERENCE_MS = 517_637.88


def _prove_once():
    from zolt_tpu.r1cs import constraints as rc
    from zolt_tpu.vm import run_elf
    from zolt_tpu.zkvm import prove_program, verify
    from zolt_tpu.zkvm.stages import _ceil_log2

    emu = run_elf(FIB_ELF)
    proof, padded = prove_program(emu, log_k=10)
    verify(proof, _ceil_log2(len(padded) * rc.NUM_CONSTRAINTS))
    return proof


def main() -> None:
    _prove_once()  # warmup: compile all shapes
    t0 = time.perf_counter()
    _prove_once()
    dt_ms = (time.perf_counter() - t0) * 1000
    print(
        json.dumps(
            {
                "metric": "fibonacci_prove_wall_clock",
                "value": dt_ms,
                "unit": "ms",
                "vs_baseline": REFERENCE_MS / dt_ms,
            }
        )
    )


if __name__ == "__main__":
    main()
