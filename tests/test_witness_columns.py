"""Differential test: vectorized witness columns (r1cs.inputs.witness_columns)
vs the per-row oracle (witness_matrix) — every column, every cycle, both
modes, on guests that exercise all the exceptional lanes (negative
immediates, loads/stores, branches, jumps, M-extension, LUI/AUIPC)."""

import os
import tempfile

import pytest

from golden_programs import _golden_array, _golden_gcd, _golden_signed

from zolt_tpu.field.params import FR
from zolt_tpu.r1cs import inputs as ri
from zolt_tpu.vm import elf as elf_mod
from zolt_tpu.vm import pad_with_noop
from zolt_tpu.vm.emulator import run_elf
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout

P = FR.p
LAY = MemoryLayout.create(MemoryConfig(program_size=1024))
FIB = "/root/reference/examples/fibonacci.elf"


def _compare(padded, sound):
    rows = ri.witness_matrix(padded, sound=sound)
    cols = ri.witness_columns(padded, sound=sound)
    assert len(cols) == ri.NUM_INPUTS
    for i in range(ri.NUM_INPUTS):
        got = cols[i].to_ints()
        want = [w[i] % P for w in rows]
        assert got == want, f"column {ri.Inp(i).name} differs ({sound=})"


def _run(builder):
    a = builder() if callable(builder) else builder
    with tempfile.NamedTemporaryFile(suffix=".elf", delete=False) as f:
        f.write(elf_mod.write_minimal_elf(a.bytes()))
        path = f.name
    try:
        emu = run_elf(path)
    finally:
        os.unlink(path)
    return pad_with_noop(list(emu.trace))


def _mixed_guest():
    a = Asm()
    a.li_addr(5, 0x80002000)
    a.addi(6, 0, -2)
    a.sd(5, 6, 0)
    a.lui(7, 0x12345)
    a.auipc(8, 0x10)
    a.addi(1, 0, -100)          # negative immediate lane
    a.addi(2, 0, 7)
    a.mul(9, 1, 2)
    a.rem(10, 1, 2)
    a.sub(11, 1, 2)
    a.slli(12, 2, 40)
    a.words.append((0x20 << 25) | (2 << 20) | (12 << 15) | (5 << 12)
                   | (13 << 7) | 0x33)  # sra
    for f3 in (0, 4, 1, 5, 2, 6, 3):
        a.words.append((0 << 20) | (5 << 15) | (f3 << 12) | (14 << 7) | 0x03)
    a.label("loop")
    a.addi(2, 2, -1)
    a.bne(2, 0, "loop")
    a.jal(15, "after")
    a.label("after")
    a.halt(LAY, provable=True)
    return a


@pytest.mark.parametrize("sound", [False, True])
def test_mixed_guest_columns(sound):
    _compare(_run(_mixed_guest), sound)


@pytest.mark.parametrize("builder", [_golden_gcd, _golden_signed,
                                     lambda: _golden_array(LAY)])
def test_golden_columns(builder):
    a = builder()
    a.halt(LAY, tmp=30, one=31, provable=True)
    _compare(_run(a), False)


def test_fibonacci_columns_both_modes():
    if not os.path.exists(FIB):
        pytest.skip("reference fibonacci.elf absent")
    emu = run_elf(FIB)
    padded = pad_with_noop(list(emu.trace))
    _compare(padded, False)
    _compare(padded, True)


def test_jolt_lookup_lo_hi_matches_oracle():
    """Vectorized lookup-index lanes == the per-step oracle over a guest
    that exercises every vectorized opcode class plus M-ext fallbacks."""
    from zolt_tpu.vm import elf as elf_mod, pad_with_noop, run_elf
    from zolt_tpu.vm.guest import Asm
    from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
    from zolt_tpu.zkvm.commitments import jolt_lookup_indices, jolt_lookup_lo_hi

    lay = MemoryLayout.create(MemoryConfig(program_size=2048))
    a = Asm()
    a.li_addr(5, 0x80002000)
    a.addi(1, 0, -7)
    a.addi(2, 0, 13)
    a.lui(3, 0x80001)          # sign-extended U-imm
    a.auipc(4, 0x7F)
    a.add(6, 1, 2)
    a.sub(6, 1, 2)
    a.and_(7, 1, 2)
    a.or_(7, 1, 2)
    a.xor(7, 1, 2)
    a.sll(8, 1, 2)
    a.srl(8, 1, 2)
    a.sra(8, 1, 2)
    a.slt(9, 1, 2)
    a.sltu(9, 2, 1)
    a.andi(10, 1, 0x55)
    a.ori(10, 1, -3)
    a.xori(10, 1, 0x0F)
    a.slti(10, 1, -9)
    a.slli(11, 1, 17)
    a.srli(11, 1, 33)
    a.srai(11, 1, 5)
    a.addw(12, 1, 2)
    a.subw(12, 1, 2)
    a.sllw(13, 1, 2)
    a.mul(14, 1, 2)
    a.mulhu(14, 1, 2)
    a.div(15, 1, 2)
    a.rem(15, 1, 2)
    a.divu(15, 2, 1)
    a.bne(2, 0, "skip")
    a.label("skip")
    a.beq(1, 1, "skip2")
    a.label("skip2")
    a.jal(16, "next")
    a.label("next")
    a.halt(lay, provable=True)
    emu = run_elf(elf_mod.write_minimal_elf(a.bytes()))
    padded = pad_with_noop(list(emu.trace))
    want = jolt_lookup_indices(padded)
    lo, hi = jolt_lookup_lo_hi(padded)
    got = [(int(h) << 64) | int(l) for l, h in zip(lo, hi)]
    assert got == want and len(want) > 30


def test_native_trace_seeds_arrays():
    """The native emulator seeds r1cs.inputs._ARR_MEMO straight from its
    structured trace buffer (vm/native_emu.py); every column must equal the
    Python attribute-loop extraction over the same TraceStep objects."""
    import numpy as np

    def guest(a, lay):
        a.li_addr(5, 0x80002000)
        a.addi(1, 0, 7)
        a.sd(5, 1, 0)
        a.ld(2, 5, 0)
        a.add(3, 1, 2)
        a.sw(5, 3, 8)
        a.lw(4, 5, 8)
        a.bne(1, 0, "end")
        a.label("end")
        a.halt(lay, provable=True)

    lay = MemoryLayout.create(MemoryConfig(program_size=1024))
    a = Asm()
    guest(a, lay)
    emu = run_elf(elf_mod.write_minimal_elf(a.bytes()))
    steps = list(emu.trace)
    n = len(steps)
    seeded = [e for e in ri._ARR_MEMO if e[1] == n and e[0] is steps[0]]
    if not seeded:
        pytest.skip("native emulator tier unavailable (no seeded memo)")
    cols_s, comp_s, pre_s = seeded[0][2]
    ri._ARR_MEMO[:] = []  # force the Python extraction path
    cols_p, comp_p, pre_p = ri._steps_to_arrays(steps)
    assert set(cols_s) == set(cols_p)
    for k in cols_p:
        assert np.array_equal(cols_s[k], cols_p[k]), k
    assert np.array_equal(comp_s, comp_p)
    assert np.array_equal(pre_s, pre_p)
