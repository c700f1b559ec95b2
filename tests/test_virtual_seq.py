"""Virtual instruction sequences (vm/virtual.py) — div/rem expansion.

Beyond-reference feature: the reference reserves the 96 virtual registers
but never emits sequences (src/tracer/mod.zig:304, common/constants.zig:
7-19). These tests cover the three layers: RISC-V semantics of the
expanded execution, R1CS satisfaction of the expanded witness (slot-PC
indexing), and the full sound prove/verify round trip with the expanded
lookups bound by stages 8-12.
"""

import os
import random
import tempfile

import pytest

from zolt_tpu.field.params import FR
from zolt_tpu.r1cs import inputs as ri
from zolt_tpu.r1cs.constraints import NUM_CONSTRAINTS, constraint_eval
from zolt_tpu.vm import elf as elf_mod, pad_with_noop, run_elf
from zolt_tpu.vm import virtual as vi
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
from zolt_tpu.zkvm.bytecode_tables import BytecodeIndex

P = FR.p
M64 = (1 << 64) - 1
LAY = MemoryLayout.create(MemoryConfig(program_size=4096))


def _div_guest(x, y):
    a = Asm()
    for reg, v in ((5, x), (6, y)):
        a.addi(reg, 0, 0)
        for sh in range(56, -8, -8):
            a.slli(reg, reg, 8)
            b = (v >> sh) & 0xFF
            if b >> 7:
                a.addi(reg, reg, b - 256)
                a.addi(reg, reg, 128)
                a.addi(reg, reg, 128)
            else:
                a.addi(reg, reg, b)
    a.div(10, 5, 6)
    a.divu(11, 5, 6)
    a.rem(12, 5, 6)
    a.remu(13, 5, 6)
    a.divw(14, 5, 6)
    a.remw(15, 5, 6)
    a._r(0x3B, 16, 5, 5, 6, 1)   # divuw
    a._r(0x3B, 17, 7, 5, 6, 1)   # remuw
    a.halt(LAY, provable=True)
    return elf_mod.write_minimal_elf(a.bytes())


EDGE = [0, 1, 2, M64, 1 << 63, (1 << 63) - 1, 0x80000000, 0x7FFFFFFF,
        0xFFFFFFFF, 100, 7]


def test_expansion_matches_direct_semantics():
    """Expanded-virtual traces compute the same registers as the direct
    M-extension path (itself differentially tested against the reference
    semantics) across sign/overflow/zero-divisor edges."""
    rng = random.Random(11)
    cases = [(x, y) for x in EDGE for y in EDGE][::3]
    cases += [(rng.getrandbits(64), rng.getrandbits(64)) for _ in range(8)]
    cases += [(rng.getrandbits(64), 0) for _ in range(2)]
    for x, y in cases:
        direct = run_elf(_div_guest(x, y))
        expanded = run_elf(_div_guest(x, y), expand_virtual=True)
        for reg in range(10, 18):
            assert expanded.registers.read(reg) == direct.registers.read(reg), \
                f"x={x:#x} y={y:#x} reg={reg}"
        assert any(s.seq_pos for s in expanded.trace)
        assert not any(s.seq_pos for s in direct.trace)


def test_expanded_witness_satisfies_all_constraints():
    """Every row of an expanded trace satisfies the 19 uniform constraints
    under slot-PC indexing, and the witness static columns match the
    expanded bytecode's slot tables."""
    elf = _div_guest(12345678901, 97)
    emu = run_elf(elf, expand_virtual=True)
    padded = pad_with_noop(list(emu.trace))
    bc = BytecodeIndex.from_elf(elf)
    assert bc.expanded
    slots = bc.slots_per_cycle(padded)
    rows = ri.witness_matrix(padded, sound=True, slots=slots)
    for j, w in enumerate(rows):
        for c in range(NUM_CONSTRAINTS):
            assert constraint_eval(c, w) == 0, (j, c)

    from zolt_tpu.zkvm.bytecode_tables import STATIC_COLS

    sc = bc.static_cols()
    for j, w in enumerate(rows):
        for c in STATIC_COLS:
            assert (w[c] - sc[c][slots[j]]) % P == 0, (j, c)


def test_gadget_identity_every_virtual_kind():
    """out + g*left + g^2*right - const (+ g^3*hv) == Gm(idx) per entry —
    the per-entry identity stage 8 sums over, for every virtual kind."""
    from zolt_tpu.vm import tables as tb
    from zolt_tpu.zkvm.raf_gadgets import (entry_spec, gadget_eval_bits,
                                           sound_lookup_index)

    elf = _div_guest(0x8000000000000000, M64)   # signed-overflow path
    emu = run_elf(elf, expand_virtual=True)
    padded = pad_with_noop(list(emu.trace))
    bc = BytecodeIndex.from_elf(elf)
    rows = ri.witness_matrix(padded, sound=True,
                             slots=bc.slots_per_cycle(padded))
    g = 987654321
    g2, g3 = g * g % P, pow(g, 3, P)
    kinds_seen = set()
    for j, s in enumerate(padded):
        if s.is_noop:
            continue
        idx = sound_lookup_index(s)
        if idx is None:
            continue
        spec = entry_spec(s.instruction)
        w = rows[j]
        lhs = (w[ri.Inp.LookupOutput] + g * w[ri.Inp.LeftLookupOperand]
               + g2 * w[ri.Inp.RightLookupOperand]) % P
        const = (spec.out.const + g * spec.left.const
                 + g2 * spec.right.const) % P
        hv = 1 if spec.valid_table is not None else 0
        rhs = (gadget_eval_bits(spec.out, idx) - spec.out.const
               + g * (gadget_eval_bits(spec.left, idx) - spec.left.const)
               + g2 * (gadget_eval_bits(spec.right, idx) - spec.right.const)) % P
        if spec.valid_table is not None:
            rhs = (rhs + g3 * tb.materialize_entry(spec.valid_table,
                                                   idx, 64)) % P
        assert rhs == (lhs - const + g3 * hv) % P, (j, spec.name)
        if (s.instruction & 0x7F) == 0x0B:
            kinds_seen.add(vi.fields(s.instruction)[0])
    assert vi.VK.MULHU in kinds_seen and vi.VK.SEXT32 in kinds_seen


def test_sound_prove_verify_div_guest():
    """Full 12-stage sound prove + algebraic verify of a guest exercising
    all eight div-family ops including divide-by-zero."""
    from zolt_tpu.zkvm.jolt_verifier import verify_jolt
    from zolt_tpu.zkvm.pipeline import prove_jolt

    a = Asm()
    a.li_addr(5, 0x80002000)
    a.addi(1, 0, 100)
    a.addi(2, 0, 7)
    a.div(6, 1, 2)
    a.rem(7, 1, 2)
    a.add(3, 6, 7)
    a.divw(8, 1, 2)
    a.add(3, 3, 8)
    a._r(0x3B, 11, 5, 1, 2, 1)   # divuw
    a.add(3, 3, 11)
    a.addi(2, 0, 0)
    a.divu(9, 1, 2)              # unsigned divide by zero
    a.rem(10, 1, 2)              # signed rem by zero
    a.add(3, 3, 10)
    a.sd(5, 3, 0)
    a.halt(LAY, provable=True)
    with tempfile.NamedTemporaryFile(suffix=".elf", delete=False) as fh:
        fh.write(elf_mod.write_minimal_elf(a.bytes()))
        guest = fh.name
    try:
        res = prove_jolt(guest, sound=True)
        assert any((s.instruction & 0x7F) == 0x0B
                   for s in res.padded_steps if not s.is_noop)
        assert verify_jolt(res.conv.proof, guest)
    finally:
        os.unlink(guest)


def test_native_emulator_declines_div_programs_when_expanding():
    elf = _div_guest(99, 5)
    emu = run_elf(elf, expand_virtual=True)
    # Python tier ran (virtual rows present); without expansion the native
    # tier may run and must produce NO virtual rows
    assert any(s.seq_pos for s in emu.trace)
    emu2 = run_elf(elf)
    assert not any(s.seq_pos for s in emu2.trace)


def test_encode_fields_roundtrip():
    rng = random.Random(3)
    for _ in range(200):
        kind = vi.VK(rng.randrange(14))
        rd, rs1, rs2 = (rng.randrange(128) for _ in range(3))
        first, last = rng.random() < 0.5, rng.random() < 0.5
        w = vi.encode(kind, rd, rs1, rs2, first, last)
        assert vi.is_virtual_word(w)
        assert vi.fields(w) == (kind, rd, rs1, rs2, first, last)
