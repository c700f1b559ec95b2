"""Spec tests for the sound-mode RAF gadget catalog (zkvm/raf_gadgets.py).

The load-bearing invariant: for every traced step, the sound witness columns
satisfy  column(j) = gadget(idx_j) + const  (mod p) for all three lookup
slots, the validity-table value is 1, and the adjusted witness still
satisfies all 19 R1CS constraints. These identities are exactly what the
LookupsRAF stage proves; any class mis-specification fails here first.
"""

import random

import pytest

from golden_programs import (_golden_array, _golden_bitwise, _golden_gcd,
                             _golden_signed, _golden_sum)

from zolt_tpu.field.params import FR
from zolt_tpu.r1cs.constraints import check_witness
from zolt_tpu.r1cs.inputs import Inp, cycle_witness
from zolt_tpu.vm import elf as elf_mod, run_elf
from zolt_tpu.vm.emulator import pad_with_noop
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
from zolt_tpu.vm.tables import materialize_entry
from zolt_tpu.zkvm.raf_gadgets import (G, Slot, entry_spec, gadget_eval_bits,
                                       gadget_eval_point, sound_lookup_index)

P = FR.p
LAY = MemoryLayout.create(MemoryConfig(program_size=1024))


def _golden_mixed():
    """Exercise classes the arithmetic goldens miss: JALR/AUIPC/LUI/SUB/
    SLT(U)/XOR/SRA/SRL/SLL reg-reg, DIV/DIVU/REM/REMU, MUL/MULH."""
    a = Asm()
    a.lui(5, 0x12345)
    a.auipc(6, 0x1)
    a.addi(1, 0, -100)           # negative-imm ADDI
    a.addi(2, 0, 37)
    a.sub(3, 1, 2)
    a.slt(4, 1, 2)
    a.sltu(7, 1, 2)
    a.xor(8, 1, 2)
    a.and_(9, 1, 2)
    a.or_(10, 1, 2)
    a.sll(11, 2, 2)
    a.srl(12, 1, 2)
    a.sra(13, 1, 2)
    a.slti(14, 1, -5)
    a.sltiu(15, 1, 2047)
    a.andi(16, 1, -1)
    a.ori(17, 2, 0x55)
    a.xori(18, 2, -256)
    a.slli(19, 2, 7)
    a.srli(20, 1, 3)
    a.srai(21, 1, 3)
    a.mul(22, 1, 2)
    a.mulh(23, 1, 2)
    a.div(24, 1, 2)
    a.divu(25, 1, 2)
    a.rem(26, 1, 2)
    a.remu(27, 1, 2)
    a.div(28, 1, 0)              # div-by-zero validity path
    a.jal(29, "target")
    a.label("target")
    # jalr x30, 8(x29) -> returns past the halt-prep gap; keep it simple:
    # exercise JALR by jumping to the next instruction via a register
    a.auipc(5, 0)
    a.jalr(30, 5, 8)
    return a


def _traces():
    out = []
    for name, builder in [("sum", _golden_sum), ("gcd", _golden_gcd),
                          ("bitwise", _golden_bitwise),
                          ("array", lambda: _golden_array(LAY)),
                          ("signed", _golden_signed),
                          ("mixed", _golden_mixed)]:
        a = builder()
        a.halt(LAY, tmp=30, one=31, provable=True)
        emu = run_elf(elf_mod.write_minimal_elf(a.bytes()))
        out.append((name, pad_with_noop(emu.trace)))
    return out


TRACES = _traces()


@pytest.mark.parametrize("name,steps", TRACES, ids=[t[0] for t in TRACES])
def test_witness_gadget_identities(name, steps):
    n_lookups = 0
    for i, step in enumerate(steps):
        if step.is_noop:
            continue
        nxt = steps[i + 1] if i + 1 < len(steps) else None
        w = cycle_witness(step, nxt, sound=True)
        assert check_witness(w) == [], \
            f"{name} cycle {i}: R1CS violated after sound adjustment"
        spec = entry_spec(step.instruction)
        idx = sound_lookup_index(step)
        assert (spec is None) == (idx is None), f"{name} cycle {i}"
        if spec is None:
            assert w[Inp.LookupOutput] == 0
            continue
        n_lookups += 1
        assert 0 <= idx < (1 << 128), f"{name} cycle {i}: index overflow"
        for col, slot in ((Inp.LookupOutput, spec.out),
                          (Inp.LeftLookupOperand, spec.left),
                          (Inp.RightLookupOperand, spec.right)):
            got, want = w[col] % P, gadget_eval_bits(slot, idx)
            assert got == want, (
                f"{name} cycle {i} pc=0x{step.pc:x} instr=0x{step.instruction:08x}"
                f" {spec.name}.{col.name}: witness {got} != gadget {want}")
        if spec.valid_table is not None:
            assert materialize_entry(spec.valid_table, idx, 64) == 1, \
                f"{name} cycle {i}: validity table not 1"
    assert n_lookups > 0


def test_gadget_point_matches_bits():
    """Every gadget kind's closed form agrees with its integer semantics at
    binary points (multilinearity then gives the unique extension)."""
    rng = random.Random(7)
    slots = [Slot(G.ZERO), Slot(G.IDENT128), Slot(G.IDENT_LOW64),
             Slot(G.IDENT_LOW64_NO0), Slot(G.ODDS), Slot(G.EVENS),
             Slot(G.EVENS_PLUS_ODDS), Slot(G.SUB_COMBO, 123)]
    for slot in slots:
        for _ in range(10):
            idx = rng.getrandbits(128)
            bits = [(idx >> i) & 1 for i in range(128)]
            assert gadget_eval_point(slot, bits) == gadget_eval_bits(slot, idx)


def test_table_gadget_point_matches_bits():
    from zolt_tpu.vm.tables import Table

    rng = random.Random(11)
    for t in (Table.Sub, Table.And, Table.SignedLessThan, Table.LeftShift):
        slot = Slot(G.TABLE, 0, t)
        for _ in range(4):
            idx = rng.getrandbits(128)
            bits = [(idx >> i) & 1 for i in range(128)]
            assert gadget_eval_point(slot, bits) == gadget_eval_bits(slot, idx)
