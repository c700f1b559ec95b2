"""Device column store (parallel/device_cols): raw upload + on-device
Montgomery encode must be bit-identical to the FrVec host tier for every
witness column, eq tables, and challenge combos."""

import numpy as np

from zolt_tpu.field.params import FR
from zolt_tpu.native.frvec import FrVec
from zolt_tpu.parallel.device_cols import (DeviceColumnStore, WitnessStore,
                                           eq_table_dev)
from zolt_tpu.parallel.stage_engine import frvec_to_u16
from zolt_tpu.r1cs import inputs as ri

P = FR.p
RNG = np.random.default_rng(7)


def _u16(v) -> np.ndarray:
    return frvec_to_u16(v).astype(np.uint32)


def test_encode_paths_bit_identical():
    st = DeviceColumnStore()
    vals = RNG.integers(0, 1 << 63, size=256, dtype=np.uint64)
    st.put_u64("v", vals)
    assert np.array_equal(np.asarray(st.get("v")),
                          _u16(FrVec.from_u64_array(vals)))
    lo = RNG.integers(1, 1 << 63, size=256, dtype=np.uint64)
    hi = np.where(RNG.integers(0, 2, 256) > 0, np.int64(-1), np.int64(0))
    st.put_i128("i", lo, hi)
    assert np.array_equal(np.asarray(st.get("i")),
                          _u16(FrVec.from_i128_arrays(lo, hi)))
    bits = RNG.integers(0, 2, size=256).astype(np.uint8)
    st.put_flags("f", bits)
    assert np.array_equal(np.asarray(st.get("f")),
                          _u16(FrVec.from_u64_array(bits.astype(np.uint64))))


def test_eq_table_dev_matches_frvec():
    point = [int.from_bytes(RNG.bytes(40), "little") % P for _ in range(6)]
    assert np.array_equal(np.asarray(eq_table_dev(point)),
                          _u16(FrVec.eq_table_be(point)))


def test_combo_matches_axpy():
    st = DeviceColumnStore()
    a = RNG.integers(0, 1 << 60, size=128, dtype=np.uint64)
    b = RNG.integers(0, 1 << 60, size=128, dtype=np.uint64)
    st.put_u64("a", a)
    st.put_u64("b", b)
    g = 123456789
    ref = FrVec.from_u64_array(a).axpy_(FrVec.from_u64_array(b), g)
    assert np.array_equal(np.asarray(st.combo(["a", "b"], [1, g])), _u16(ref))


def test_witness_store_all_columns():
    """Every raw spec witness_columns emits must device-encode to the same
    limbs as its FrVec column — including Product, the MUL splice, and the
    noop-tail flags."""
    from zolt_tpu.vm import elf as elf_mod, pad_with_noop
    from zolt_tpu.vm.emulator import run_elf
    from zolt_tpu.vm.guest import Asm
    from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout

    lay = MemoryLayout.create(MemoryConfig(program_size=1024))
    a = Asm()
    a.li_addr(5, 0x80002000)
    a.addi(1, 0, 6)
    a.addi(2, 0, 3)
    a.label("w")
    a.sd(5, 1, 0)
    a.ld(3, 5, 0)
    a.mul(4, 1, 2)
    a.add(4, 4, 3)
    a.sub(4, 4, 2)
    a.addi(1, 1, -1)
    a.bne(1, 0, "w")
    a.jal(6, "end")
    a.label("end")
    a.halt(lay, provable=True)
    emu = run_elf(elf_mod.write_minimal_elf(a.bytes()))
    padded = pad_with_noop(list(emu.trace))
    raw: dict = {}
    cols = ri.witness_columns(padded, raw_out=raw)
    assert len(raw) == ri.NUM_INPUTS
    store = WitnessStore(raw, len(padded))
    for idx in range(ri.NUM_INPUTS):
        dev = np.asarray(store.get(idx))
        ref = _u16(cols[idx])
        assert np.array_equal(dev, ref), f"column {idx} mismatch"
