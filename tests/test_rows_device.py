"""Device row-MSM tier (msm/rows_device.py): subset tables + bit-plane
subset-sum row commitments, differentially tested against the host oracle.

Reference parity target: the Dory commit hot loop
(/root/reference/src/poly/commitment/dory.zig:989-1042) — per-row G1 MSMs
against the fixed g1_vec basis."""

import numpy as np
import pytest

from zolt_tpu.curve import host as chost
from zolt_tpu.field.params import FP
from zolt_tpu.native import g1_subset_tables_mont


def test_subset_tables_exact():
    G = chost.G1_GEN
    pts = [chost.scalar_mul(G, k + 1) for k in range(16)]
    pts[3] = None  # identity basis entry
    built = g1_subset_tables_mont(pts)
    if built is None:
        pytest.skip("native tier unavailable")
    tabs, valid = built
    assert tabs.shape == (512, 64)
    Rinv = pow(1 << 256, -1, FP.p)
    rng = np.random.default_rng(1)
    for _ in range(12):
        g = int(rng.integers(0, 2))
        m = int(rng.integers(0, 256))
        s = sum(8 * g + k + 1 for k in range(8)
                if (m >> k) & 1 and (8 * g + k) != 3)
        e = tabs[g * 256 + m]
        if s == 0:
            assert valid[g * 256 + m] == 0
            continue
        exp = chost.scalar_mul(G, s)
        x = int.from_bytes(e[:32].tobytes(), "little") * Rinv % FP.p
        y = int.from_bytes(e[32:].tobytes(), "little") * Rinv % FP.p
        assert (x, y) == exp


def test_device_rows_match_host_msm():
    """commit_rows over mixed-size small-scalar polys == per-row host MSM."""
    from zolt_tpu.msm.rows_device import DeviceRowMSM

    cols = 64
    pts = chost.random_points(cols, seed=5)
    try:
        eng = DeviceRowMSM(pts, cols)
    except RuntimeError:
        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(0)
    polys = [rng.integers(0, 16, size=200, dtype=np.uint8),
             rng.integers(0, 2, size=64, dtype=np.uint8),
             np.zeros(64, dtype=np.uint8),
             rng.integers(0, 16, size=130, dtype=np.uint8)]
    res = eng.commit_rows(polys)
    for pi, v in enumerate(polys):
        used = -(-len(v) // cols)
        assert len(res[pi]) == used
        for r in range(used):
            seg = v[r * cols:(r + 1) * cols]
            exp = chost.msm(pts[:len(seg)], [int(x) for x in seg])
            assert res[pi][r] == exp, (pi, r)


def test_device_rows_multi_chunk_slot_cap(monkeypatch):
    """The slot-cap row chunking (regression: a 2^24-eval poly's gather
    OOM'd a 16 GB chip before rows were chunked) is bit-identical to the
    single-dispatch path: shrink SLOT_CAP so commit_rows spans many
    dispatch blocks including a padded final block."""
    from zolt_tpu.msm import rows_device
    from zolt_tpu.msm.rows_device import DeviceRowMSM

    cols = 64
    pts = chost.random_points(cols, seed=5)
    try:
        eng = DeviceRowMSM(pts, cols)
    except RuntimeError:
        pytest.skip("native tier unavailable")
    monkeypatch.setattr(rows_device, "SLOT_CAP", 1 << 8)  # 32 plane-rows/blk
    rng = np.random.default_rng(7)
    polys = [rng.integers(0, 16, size=79 * 64, dtype=np.uint8),
             rng.integers(0, 2, size=3000, dtype=np.uint8)]
    res = eng.commit_rows(polys)
    for pi, v in enumerate(polys):
        used = -(-len(v) // cols)
        assert len(res[pi]) == used
        for r in range(used):
            seg = np.zeros(cols, np.uint8)
            s = v[r * cols:(r + 1) * cols]
            seg[:len(s)] = s
            exp = chost.msm(pts, [int(x) for x in seg])
            assert res[pi][r] == exp, (pi, r)


def test_commit_phase_device_byte_identical(monkeypatch):
    """Full commit_and_absorb with the device tier forced on must produce
    the same commitment bytes (and transcript state) as the host tier."""
    from zolt_tpu.transcript import Blake2bTranscript
    from zolt_tpu.vm import elf as elf_mod, pad_with_noop
    from zolt_tpu.vm.emulator import run_elf
    from zolt_tpu.vm.guest import Asm
    from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
    from zolt_tpu.zkvm import commitments as cm

    lay = MemoryLayout.create(MemoryConfig(program_size=1024))
    a = Asm()
    a.li_addr(5, 0x80002000)
    a.addi(1, 0, 9)
    a.label("w")
    a.sd(5, 1, 0)
    a.ld(2, 5, 0)
    a.addi(1, 1, -1)
    a.bne(1, 0, "w")
    a.halt(lay, provable=True)
    emu = run_elf(elf_mod.write_minimal_elf(a.bytes()))
    padded = pad_with_noop(list(emu.trace))

    monkeypatch.setenv("ZOLT_TPU_DEVICE_COMMIT", "1")
    monkeypatch.setenv("ZOLT_TPU_DEVICE_COMMIT_MIN", "0")
    t1 = Blake2bTranscript(b"Jolt")
    r1 = cm.commit_and_absorb(t1, padded, 1024, len(emu.ram.trace))
    monkeypatch.setenv("ZOLT_TPU_DEVICE_COMMIT", "0")
    t2 = Blake2bTranscript(b"Jolt")
    r2 = cm.commit_and_absorb(t2, padded, 1024, len(emu.ram.trace))
    assert r1.commitments == r2.commitments
    assert t1.state == t2.state
