"""Sharded sumcheck round on the 8-device virtual CPU mesh: results must be
bit-identical to the single-device path."""

import jax
import numpy as np

from zolt_tpu.field import FR, limb
from zolt_tpu.field.limb import FR_C
from zolt_tpu.parallel import make_mesh, make_sharded_product_round, shard_table
from zolt_tpu.poly import dense

P = FR.p
RNG = np.random.default_rng(3)


def rand_ints(n):
    return [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(n)]


def test_sharded_round_matches_single_device():
    assert len(jax.devices()) == 8, "conftest should provide 8 virtual devices"
    n = 256
    a, b = rand_ints(n), rand_ints(n)
    r = rand_ints(1)[0]
    A, B = limb.encode(a, FR_C), limb.encode(b, FR_C)

    mesh = make_mesh()
    tables = np.stack([np.asarray(A), np.asarray(B)])
    step = make_sharded_product_round(mesh, n_factors=2)
    rl = limb.encode([r], FR_C)[0]
    evals, bound = step(jax.device_put(tables), rl)

    got = [int(v) for v in limb.decode(np.asarray(evals))]
    # oracle: p(t) = sum_i (lo_a + t*d_a)(lo_b + t*d_b)
    exp = []
    for t in range(3):
        s = 0
        for i in range(n // 2):
            va = a[2 * i] + t * (a[2 * i + 1] - a[2 * i])
            vb = b[2 * i] + t * (b[2 * i + 1] - b[2 * i])
            s = (s + va * vb) % P
        exp.append(s)
    assert got == exp

    # bound tables match single-device bind_low
    bound_a = [int(v) for v in limb.decode(np.asarray(bound[0]))]
    ref_a = [int(v) for v in limb.decode(dense.bind_low(A, rl))]
    assert bound_a == ref_a


def test_sharded_full_sumcheck_prove_verifies():
    """Full mesh-sharded multi-round sumcheck with a real Blake2b transcript:
    every round must satisfy p(0)+p(1) == claim, the verifier's challenges
    must match (same transcript), and the final claim must equal the product
    of the fully-bound factor values."""
    from zolt_tpu.parallel import make_mesh, sharded_sumcheck_prove
    from zolt_tpu.transcript import Blake2bTranscript

    n = 128
    k = 3  # eq * az * bz shape (stage-1 structure)
    tables = [rand_ints(n) for _ in range(k)]
    claim = 0
    for i in range(n):
        prod = 1
        for t in tables:
            prod = prod * t[i] % P
        claim = (claim + prod) % P

    mesh = make_mesh()
    tp = Blake2bTranscript(b"sharded")
    round_evals, challenges, finals = sharded_sumcheck_prove(mesh, tables, tp)
    assert len(round_evals) == 7 and len(challenges) == 7

    # verifier replay: transcript resync + round checks
    tv = Blake2bTranscript(b"sharded")
    cur = claim
    for evals, r in zip(round_evals, challenges):
        assert (evals[0] + evals[1]) % P == cur, "p(0)+p(1) != claim"
        for e in evals:
            tv.append_scalar(e)
        rv = tv.challenge_scalar()
        assert rv == r, "verifier challenge mismatch"
        # claim <- p(r) via Lagrange interpolation over {0..k}
        cur = 0
        for j, e in enumerate(evals):
            lj = 1
            for m in range(len(evals)):
                if m != j:
                    lj = lj * (rv - m) % P * pow(j - m, -1, P) % P
            cur = (cur + e * lj) % P

    prod = 1
    for v in finals:
        prod = prod * v % P
    assert cur == prod, "final claim != product of bound factors"


def test_mesh_sharded_msm_matches_host():
    """SURVEY §1 L1: points sharded over the mesh, per-window bucket totals
    all-gathered + ladder-added over ICI — bit-identical to the host MSM."""
    import jax
    import numpy as np

    from zolt_tpu.curve import host as chost
    from zolt_tpu.field.params import FR
    from zolt_tpu.msm import pippenger
    from zolt_tpu.parallel import make_mesh

    rng = np.random.default_rng(55)
    mesh = make_mesh(jax.devices())
    pts = [chost.scalar_mul(chost.G1_GEN, int(rng.integers(1, 1 << 30)))
           for _ in range(64)]
    scalars = [int.from_bytes(rng.bytes(31), "little") % FR.p for _ in range(64)]
    pts[5] = None
    scalars[9] = 0
    got = pippenger.msm_mesh(mesh, pts, scalars, windows_per_pass=16)
    assert got == chost.msm(pts, scalars)


def test_mesh_full_sound_prove_byte_identical():
    """VERDICT r2 #3: the complete sound prove (commitments, stages 1-12,
    PCS batch opening) over the 8-device mesh with the wide sumcheck
    instances on mesh backends (stage 1, stage-2 Product/Instr, stage-4
    ValEval/ValFinal) — proof bytes identical to the all-host prover."""
    import os
    import tempfile

    import jax

    from zolt_tpu.parallel import make_mesh
    from zolt_tpu.vm import elf as elf_mod
    from zolt_tpu.vm.guest import Asm
    from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
    from zolt_tpu.zkvm.pipeline import prove_jolt

    lay = MemoryLayout.create(MemoryConfig(program_size=1024))
    a = Asm()
    a.li_addr(5, 0x80002000)
    a.addi(1, 0, 0)
    a.addi(2, 0, 12)
    a.label("w")
    a.sd(5, 1, 0)
    a.addi(5, 5, 8)
    a.add(1, 1, 2)
    a.addi(2, 2, -1)
    a.bne(2, 0, "w")
    a.halt(lay, provable=True)
    with tempfile.NamedTemporaryFile(suffix=".elf", delete=False) as f:
        f.write(elf_mod.write_minimal_elf(a.bytes()))
        path = f.name
    try:
        mesh = make_mesh(jax.devices())
        host = prove_jolt(path, sound=True).conv.proof.serialize_with_dory()
        meshp = prove_jolt(path, sound=True, backend="mesh",
                           mesh=mesh).conv.proof.serialize_with_dory()
    finally:
        os.unlink(path)
    assert meshp == host


def test_device_backend_prove_byte_identical():
    """Single-device backend for the same stages — byte-identical proof."""
    from zolt_tpu.zkvm.pipeline import prove_jolt

    FIB = "/root/reference/examples/fibonacci.elf"
    import os

    import pytest

    if not os.path.exists(FIB):
        pytest.skip("reference fibonacci.elf absent")
    host = prove_jolt(FIB).conv.proof.serialize_with_dory()
    dev = prove_jolt(FIB, backend="device").conv.proof.serialize_with_dory()
    assert dev == host


def test_device_tail_crossover_byte_identical(monkeypatch):
    """The narrow-tail handoff (device rounds while wide, host FrVec tail
    once live <= ZOLT_TPU_DEVICE_TAIL): forcing the crossover mid-prove must
    not change a byte of the proof."""
    from zolt_tpu.zkvm.pipeline import prove_jolt

    FIB = "/root/reference/examples/fibonacci.elf"
    import os

    import pytest

    if not os.path.exists(FIB):
        pytest.skip("reference fibonacci.elf absent")
    host = prove_jolt(FIB).conv.proof.serialize_with_dory()
    monkeypatch.setenv("ZOLT_TPU_DEVICE_TAIL", "64")
    dev = prove_jolt(FIB, backend="device").conv.proof.serialize_with_dory()
    assert dev == host


def test_u16_wire_format_round_trip():
    """frvec_to_u16 / widen_u16 / narrow_u16 / limbs_to_frvec preserve the
    Montgomery bytes exactly (the device upload/download wire path)."""
    import numpy as np

    from zolt_tpu.field import FR
    from zolt_tpu.native.frvec import FrVec
    from zolt_tpu.parallel.stage_engine import (frvec_to_u16, limbs_to_frvec,
                                                narrow_u16, widen_u16)

    rng = np.random.default_rng(17)
    xs = [int.from_bytes(rng.bytes(40), "little") % FR.p for _ in range(64)]
    v = FrVec.from_ints(xs)
    u16 = frvec_to_u16(v)
    wide = widen_u16(u16)
    back = limbs_to_frvec(np.asarray(narrow_u16(wide)))
    assert back.to_ints() == xs
    assert limbs_to_frvec(np.asarray(wide)).to_ints() == xs  # u32 input path
