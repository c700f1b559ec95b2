"""Benchmark: end-to-end Jolt-format prove wall-clock (+ scaling metrics).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline":
N, "extra": {...}}. The headline metric stays the reference's only recorded
end-to-end datapoint — fibonacci.elf Jolt-format prove, 517,637.88 ms in the
reference's debug-build log (/root/reference/logs/zolt.log; BASELINE.md) —
measured over the same flagship path here (emulate, preamble, 37 Dory GT
commitments, 7 proof stages, joint Dory opening, arkworks serialization).
vs_baseline is the speedup factor (>1 = faster).

"extra" carries the scaling-regime evidence the rounds are actually about
(BENCH.md's sum-loop ladder), so the driver's BENCH_r{N}.json records it:
  sum_loop_2e18_host_prove_s   T=2^18 host-tier Jolt prove wall clock
  commit_2e18_host_s /         the Dory commitment phase at T=2^18 on the
  commit_2e18_device_s         host C tier vs the device subset-sum tier
                               (msm/rows_device; chip sessions only)
  fold_pallas_melem_s /        fused Pallas fold steady state and % of the
  fold_pallas_hbm_pct          self-measured HBM copy ceiling (chip only)

A warmup run populates the in-process XLA compilation caches; each timed
value is the BEST of the timed runs — on this shared box, wall clock swings
up to 2x with noisy neighbors, and min-of-N recovers the steady state.
Set ZOLT_TPU_BENCH_QUICK=1 to skip the extras (headline only).
"""

import json
import os
import time

FIB_ELF = "/root/reference/examples/fibonacci.elf"
REFERENCE_MS = 517_637.88
LOG_T = 18


def _prove_once() -> int:
    from zolt_tpu.zkvm.pipeline import prove_jolt

    res = prove_jolt(FIB_ELF, with_joint_proof=True)
    blob = res.conv.proof.serialize_with_dory()
    assert len(blob) > 40000, "unexpectedly small proof"
    return len(blob)


def _sum_loop_trace():
    from zolt_tpu.vm import elf as elf_mod, pad_with_noop
    from zolt_tpu.vm.emulator import run_elf
    from zolt_tpu.vm.guest import Asm
    from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout

    lay = MemoryLayout.create(MemoryConfig(program_size=1024))
    a = Asm()
    iters = (1 << LOG_T) // 4 - 64
    a.li_addr(5, 0x80002000)
    a.addi(1, 0, 0)
    a.li_addr(2, iters)
    a.label("w")
    a.sd(5, 1, 0)
    a.add(1, 1, 2)
    a.addi(2, 2, -1)
    a.bne(2, 0, "w")
    a.halt(lay, provable=True)
    blob = elf_mod.write_minimal_elf(a.bytes())
    emu = run_elf(blob)
    padded = pad_with_noop(list(emu.trace))
    return blob, emu, padded


def _extras() -> dict:
    extra: dict = {}
    try:
        import tempfile

        from zolt_tpu.zkvm.pipeline import prove_jolt

        blob, emu, padded = _sum_loop_trace()
        with tempfile.NamedTemporaryFile(suffix=".elf", delete=False) as fh:
            fh.write(blob)
            guest = fh.name
        try:
            t0 = time.perf_counter()
            prove_jolt(guest, with_joint_proof=False)
            extra["sum_loop_2e18_host_prove_s"] = round(
                time.perf_counter() - t0, 2)
        finally:
            os.unlink(guest)
    except Exception as e:  # extras must never sink the headline metric
        extra["sum_loop_error"] = repr(e)[:120]
        return extra

    # commit phase: host C tier vs device subset-sum tier (chip only)
    try:
        from zolt_tpu.field import pallas_redc
        from zolt_tpu.transcript import Blake2bTranscript
        from zolt_tpu.zkvm.commitments import commit_and_absorb

        def commit_time() -> float:
            best = float("inf")
            for _ in range(2):
                tp = Blake2bTranscript(b"Jolt")
                t0 = time.perf_counter()
                commit_and_absorb(tp, padded, 1024, len(emu.ram.trace))
                best = min(best, time.perf_counter() - t0)
            return best

        os.environ["ZOLT_TPU_DEVICE_COMMIT"] = "0"
        extra["commit_2e18_host_s"] = round(commit_time(), 2)
        if pallas_redc.available():
            os.environ["ZOLT_TPU_DEVICE_COMMIT"] = "1"
            commit_time()  # warmup: per-shape compiles + SRS table upload
            extra["commit_2e18_device_s"] = round(commit_time(), 2)
        os.environ.pop("ZOLT_TPU_DEVICE_COMMIT", None)
    except Exception as e:
        extra["commit_error"] = repr(e)[:120]

    # fused Pallas fold steady state vs the measured HBM ceiling
    try:
        from zolt_tpu.field import pallas_redc as predc

        if predc.available():
            import jax
            import jax.numpy as jnp
            import numpy as np

            from zolt_tpu.benchmarks import _chain_time
            from zolt_tpu.field import limb
            from zolt_tpu.field.limb import FR_C
            from zolt_tpu.field.params import FR

            n = 1 << 19
            rng = np.random.default_rng(5)
            vals = [int.from_bytes(rng.bytes(40), "little") % FR.p
                    for _ in range(4096)]
            tab = jax.device_put(jnp.tile(
                jnp.asarray(np.asarray(limb.encode(vals, FR_C))),
                (n // 4096, 1)))
            tp = jax.device_put(predc.fold_toeplitz(FR.mont(987654321)))

            def pfold_restore(x):
                h = predc.fold_shared(x, tp, FR_C)
                return jnp.concatenate([h, h])

            # same conventions as benchmarks.bench_roofline: n elem/s,
            # bandwidth = read n + write n (fold half + tail restore)
            sec = _chain_time(pfold_restore, tab, 16)
            big = jnp.ones((1 << 26,), jnp.uint32)
            copy = jax.jit(lambda v: v + 1)
            csec = _chain_time(copy, big, 8)
            hbm = 2.0 * big.size * 4 / csec
            bw = (64.0 + 64.0) * n / sec
            extra["fold_pallas_melem_s"] = round(n / sec / 1e6, 1)
            extra["fold_pallas_hbm_pct"] = round(bw / hbm * 100, 1)
    except Exception as e:
        extra["fold_error"] = repr(e)[:120]

    # Mosaic-tier chip exactness (benchmarks.bench_chipcheck): asserts the
    # Pallas fold / MXU evals / device-column encode bit-exact on the real
    # chip — recorded here so a lowering regression is driver-visible.
    try:
        from zolt_tpu.benchmarks import bench_chipcheck

        lines: list = []
        bench_chipcheck(lines.append, quick=True)
        extra["chipcheck"] = ("pass" if any("PASS" in l for l in lines)
                              else "skipped")
    except Exception as e:
        extra["chipcheck"] = "FAIL " + repr(e)[:100]
    return extra


def main() -> None:
    _prove_once()  # warmup: compile all shapes
    dt_ms = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _prove_once()
        dt_ms = min(dt_ms, (time.perf_counter() - t0) * 1000)
    extra = {} if os.environ.get("ZOLT_TPU_BENCH_QUICK") else _extras()
    print(
        json.dumps(
            {
                "metric": "fibonacci_jolt_format_prove_wall_clock",
                "value": dt_ms,
                "unit": "ms",
                "vs_baseline": REFERENCE_MS / dt_ms,
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
