"""Differential tests: native C emulator (native/rv64.c) vs the Python
oracle (vm/emulator.py), field-by-field over every observable surface —
trace steps, RAM access trace, final memory dict, registers, device I/O,
lookup entries. The Python stepper is the semantic reference; any mismatch
is a native-tier bug."""

import os

import pytest

from golden_programs import (_golden_array, _golden_bitwise, _golden_gcd,
                             _golden_signed, _golden_sum)

from zolt_tpu.vm import elf as elf_mod
from zolt_tpu.vm.emulator import Emulator, run_elf
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout

FIB = "/root/reference/examples/fibonacci.elf"
LAY = MemoryLayout.create(MemoryConfig(program_size=1024))


def _run_both(blob: bytes, inputs: bytes = b""):
    parsed = elf_mod.parse(blob)
    base, image = parsed.flat_image()
    cfg = lambda: MemoryConfig(program_size=max(1024, len(image)))

    def mk():
        e = Emulator(cfg())
        e.load_program_at(image, base)
        e.pc = parsed.entry
        if inputs:
            e.set_inputs(inputs)
        e.initial_memory = dict(e.ram.memory)
        return e

    nat = mk()
    assert nat.run.__func__ is Emulator.run
    from zolt_tpu.vm.native_emu import run_native

    assert run_native(nat, 1 << 24), "native tier unavailable"
    py = mk()
    py.run_python()
    return nat, py


def _assert_identical(nat, py):
    assert len(nat.trace) == len(py.trace)
    for a, b in zip(nat.trace, py.trace):
        assert a == b, (a, b)
    assert list(nat.ram.trace) == list(py.ram.trace)
    assert nat.ram.memory == py.ram.memory
    assert nat.registers.registers == py.registers.registers
    assert bytes(nat.device.outputs) == bytes(py.device.outputs)
    assert nat.device.panic == py.device.panic
    assert (nat.cycle, nat.pc) == (py.cycle, py.pc)
    ln, lp = list(nat.lookup_entries), list(py.lookup_entries)
    assert len(ln) == len(lp)
    for x, y in zip(ln, lp):
        assert (x.cycle, x.pc, x.instruction, x.rs1_value, x.rs2_value) == \
               (y.cycle, y.pc, y.instruction, y.rs1_value, y.rs2_value)
        assert x.decoded == y.decoded


GOLDENS = [
    ("sum", _golden_sum),
    ("gcd", _golden_gcd),
    ("bitwise", _golden_bitwise),
    ("array", lambda: _golden_array(LAY)),
    ("signed", _golden_signed),
]


@pytest.mark.parametrize("name,builder", GOLDENS)
def test_goldens_identical(name, builder):
    a = builder()
    a.halt(LAY, tmp=30, one=31, provable=True)
    _assert_identical(*_run_both(elf_mod.write_minimal_elf(a.bytes())))


def test_fibonacci_elf_identical():
    """The reference golden ELF — exercises RVC expansion and ecall halt."""
    if not os.path.exists(FIB):
        pytest.skip("reference fibonacci.elf not present")
    with open(FIB, "rb") as f:
        blob = f.read()
    _assert_identical(*_run_both(blob))


def test_mext_edge_cases_identical():
    """MUL/MULH/MULHU/MULHSU/DIV/REM + W variants on the tricky operand
    pairs (INT_MIN/-1, div-by-zero, mixed signs)."""
    a = Asm()
    # x5 = INT64_MIN, x6 = -1, x7 = 7, x8 = 0
    a.addi(5, 0, 1)
    a.slli(5, 5, 63)
    a.addi(6, 0, -1)
    a.addi(7, 0, 7)
    a.addi(8, 0, 0)
    pairs = [(5, 6), (5, 7), (6, 7), (7, 8), (5, 8), (6, 5), (7, 6)]
    for rs1, rs2 in pairs:
        for f3 in range(8):        # MUL..REMU
            a.words.append((1 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12)
                   | (10 << 7) | 0x33)
            a.add(11, 11, 10)
        for f3 in (0, 4, 5, 6, 7):  # MULW/DIVW/DIVUW/REMW/REMUW
            a.words.append((1 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12)
                   | (10 << 7) | 0x3B)
            a.add(11, 11, 10)
    a.halt(LAY, tmp=30, one=31, provable=True)
    _assert_identical(*_run_both(elf_mod.write_minimal_elf(a.bytes())))


def test_byte_halfword_memory_identical():
    """LB/LBU/LH/LHU/LW/LWU/SB/SH/SW with sub-word offsets (per-byte RAM
    trace records) + unaligned-in-word access patterns."""
    a = Asm()
    a.li_addr(5, 0x80002000)
    a.addi(6, 0, -2)            # 0xFFFF...FE pattern source
    a.sd(5, 6, 0)   # sd rs2=x6 -> 0(x5)
    for f3s, f3l in ((0, 0), (0, 4), (1, 1), (1, 5), (2, 2), (2, 6)):
        for off in (0, 1, 2, 3, 5, 7):
            if f3s == 1 and off == 7:
                continue       # would cross the word into unmapped space
            if f3s == 2 and off > 4:
                continue
            a.words.append((0 << 25) | (6 << 20) | (5 << 15) | (f3s << 12)
                   | (off << 7) | 0x23)   # store
            a.words.append((off << 20) | (5 << 15) | (f3l << 12) | (10 << 7) | 0x03)
            a.add(11, 11, 10)
    a.halt(LAY, tmp=30, one=31, provable=True)
    _assert_identical(*_run_both(elf_mod.write_minimal_elf(a.bytes())))


def test_randomized_alu_programs_identical():
    """Randomized straight-line ALU/shift/compare programs (no control flow,
    terminated by the self-loop): broad operand coverage for every OP/OP-IMM/
    OP-32 encoding the decoder accepts."""
    import random

    rng = random.Random(1234)
    for trial in range(4):
        a = Asm()
        for r in range(1, 16):
            a.addi(r, 0, rng.randrange(-2048, 2048))
        for r in range(1, 8):
            a.slli(r, r, rng.randrange(1, 50))
        for _ in range(400):
            rd = rng.randrange(10, 30)
            rs1 = rng.randrange(0, 16)
            rs2 = rng.randrange(0, 16)
            kind = rng.randrange(3)
            f3 = rng.randrange(8)
            if kind == 0:      # OP
                f7 = rng.choice([0, 0x20]) if f3 in (0, 5) else 0
                a.words.append((f7 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12)
                       | (rd << 7) | 0x33)
            elif kind == 1:    # OP-IMM
                imm = rng.randrange(0, 64) if f3 in (1, 5) else \
                    rng.randrange(-2048, 2048) & 0xFFF
                if f3 == 5 and rng.random() < 0.5:
                    imm |= 0x400
                a.words.append((imm << 20) | (rs1 << 15) | (f3 << 12) | (rd << 7) | 0x13)
            else:              # OP-32
                if f3 not in (0, 1, 5):
                    f3 = 0
                f7 = rng.choice([0, 0x20]) if f3 in (0, 5) else 0
                a.words.append((f7 << 25) | (rs2 << 20) | (rs1 << 15) | (f3 << 12)
                       | (rd << 7) | 0x3B)
        a.halt(LAY, tmp=30, one=31, provable=True)
        _assert_identical(*_run_both(elf_mod.write_minimal_elf(a.bytes())))


def test_provable_halt_guest_identical():
    """Guest-halt convention (termination store + self-loop) — the sound-mode
    path: io-region store dispatch must not record RAM accesses."""
    lay = LAY
    a = Asm()
    a.addi(1, 0, 0)
    a.addi(2, 0, 100)
    a.label("l")
    a.add(1, 1, 2)
    a.addi(2, 2, -1)
    a.bne(2, 0, "l")
    a.halt(lay, provable=True)
    _assert_identical(*_run_both(elf_mod.write_minimal_elf(a.bytes())))


def test_memory_fault_identical():
    """Out-of-window access raises MemoryFault from both tiers."""
    from zolt_tpu.vm.emulator import MemoryFault

    a = Asm()
    a.addi(5, 0, 1)
    a.slli(5, 5, 40)            # far outside the provable window
    a.words.append((0 << 20) | (5 << 15) | (3 << 12) | (10 << 7) | 0x03)  # ld x10, 0(x5)
    blob = elf_mod.write_minimal_elf(a.bytes())
    parsed = elf_mod.parse(blob)
    base, image = parsed.flat_image()
    for runner in ("native", "python"):
        e = Emulator(MemoryConfig(program_size=max(1024, len(image))))
        e.load_program_at(image, base)
        e.pc = parsed.entry
        with pytest.raises(MemoryFault):
            if runner == "native":
                from zolt_tpu.vm.native_emu import run_native

                assert run_native(e, 1 << 24) or e.run_python() is None
            else:
                e.run_python()


def test_run_elf_uses_native_tier():
    """run_elf picks the native stepper when available and the result feeds
    the pipeline unchanged (spot: trace length + outputs of fibonacci)."""
    if not os.path.exists(FIB):
        pytest.skip("reference fibonacci.elf not present")
    emu = run_elf(FIB)
    assert len(emu.trace) == 54
