"""Benchmark: sumcheck round throughput on the real chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no benchmark numbers (BASELINE.md); its only recorded
end-to-end datapoint is a debug-build fibonacci prove at 517,637 ms. Until our
end-to-end prove exists, the headline metric is the prover's dominant kernel:
sumcheck round evaluation+fold throughput (field evals/s) over dense BN254
MLE tables. vs_baseline is measured throughput divided by a documented
speed-of-light estimate for this chip (see _roofline_evals_per_s), i.e. the
">70% of roofline" target from BASELINE.json — 1.0 means at-roofline.
"""

import json
import time

import numpy as np


def _roofline_evals_per_s() -> float:
    """Speed-of-light estimate for one sumcheck round eval on TPU v5e.

    Per table pair the round needs >= 2 independent Montgomery muls (product
    eval + fold) at ~1.8e3 u32 vector ops each after CSE => ~4e3 u32 ops per
    eval-pair. v5e VPU ~ 2e13 u32 ops/s peak -> ~5e9 eval-pairs/s. Coarse,
    documented denominator for the >70%-of-roofline target; refine with a
    measured per-op microbenchmark as kernels improve.
    """
    return 5.0e9


def main() -> None:
    import jax

    from zolt_tpu.field import FR, limb
    from zolt_tpu.field.limb import FR_C
    from zolt_tpu.poly import dense

    rng = np.random.default_rng(42)
    log_n = 18
    n = 1 << log_n
    # random limbs reduced into range via encode of random ints (host-side, slowish but one-time)
    vals = rng.integers(0, 1 << 16, size=(2, n, 16), dtype=np.uint32)
    # mask top limb to keep values < p (top limb < 0x3064)
    vals[..., 15] %= 0x3000
    A = jax.device_put(vals[0])
    B = jax.device_put(vals[1])
    r = limb.encode([123456789], FR_C)[0]

    @jax.jit
    def round_step(a, b, r):
        pa = a.reshape(-1, 2, 16)
        pb = b.reshape(-1, 2, 16)
        lo_a, hi_a = pa[:, 0], pa[:, 1]
        lo_b, hi_b = pb[:, 0], pb[:, 1]
        da = limb.sub(hi_a, lo_a, FR_C)
        db = limb.sub(hi_b, lo_b, FR_C)
        evals = []
        for t in range(3):
            va, vb = lo_a, lo_b
            for _ in range(t):
                va = limb.add(va, da, FR_C)
                vb = limb.add(vb, db, FR_C)
            evals.append(dense.sum_mod(limb.mont_mul(va, vb, FR_C), FR_C))
        import jax.numpy as jnp

        new_a = limb.add(lo_a, limb.mont_mul(r[None], da, FR_C), FR_C)
        new_b = limb.add(lo_b, limb.mont_mul(r[None], db, FR_C), FR_C)
        return jnp.stack(evals), new_a, new_b

    # warmup/compile
    ev, na, nb = round_step(A, B, r)
    ev.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        ev, na, nb = round_step(A, B, r)
    ev.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    pairs_per_s = (n // 2) / dt
    print(
        json.dumps(
            {
                "metric": "sumcheck_round_pair_evals_per_s",
                "value": pairs_per_s,
                "unit": "pair-evals/s",
                "vs_baseline": pairs_per_s / _roofline_evals_per_s(),
            }
        )
    )


if __name__ == "__main__":
    main()
