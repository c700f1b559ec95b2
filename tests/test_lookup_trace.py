"""LookupTraceCollector + instruction lookup classes (vm/lookups.py).

Ties the three layers the Lasso argument rests on to each other on real
traced programs (reference: instruction/lookups.zig computeResult +
lookup_trace.zig collector):
  1. table_value == closed-form table MLE at the index's bit-point
     (what the Lasso read-check proves),
  2. computeResult == the emulator's architectural rd result
     (what the R1CS witness consumes),
  3. validity tables hold (div/rem traces are well-formed).
"""

import pytest

from golden_programs import (_golden_array, _golden_bitwise, _golden_gcd,
                             _golden_signed)
from zolt_tpu.field.params import FR
from zolt_tpu.vm import Emulator, MemoryConfig
from zolt_tpu.vm import tables as tb
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig as _MC, MemoryLayout
from zolt_tpu.vm.lookups import LookupTraceCollector, lookup_name

LAY = MemoryLayout.create(_MC(program_size=1024))

P = FR.p

_RD_OPCODES = {0x33, 0x13, 0x3B, 0x1B, 0x37, 0x17, 0x6F, 0x67}


def _collect(builder):
    a = builder()
    a.halt(LAY, tmp=30, one=31, provable=True)
    emu = Emulator(MemoryConfig(program_size=1024))
    emu.load_program(a.bytes())
    emu.run()
    return emu, LookupTraceCollector().collect(emu.trace)


def _mixed_ops():
    a = Asm()
    a.addi(1, 0, -37)
    a.addi(2, 0, 5)
    a.mul(3, 1, 2)      # MUL negative
    a.div(4, 1, 2)      # DIV -185/5
    a.rem(5, 1, 2)      # REM
    a.divu(6, 1, 2)     # DIVU huge unsigned
    a.remu(7, 1, 2)
    a.sub(8, 2, 1)
    a.xor(9, 1, 2)
    a.and_(10, 1, 2)
    a.or_(11, 1, 2)
    a.sll(12, 2, 2)
    a.srl(13, 1, 2)
    a.sra(14, 1, 2)
    a.sltu(15, 1, 2)
    a.slt(16, 1, 2)
    return a


@pytest.mark.parametrize("builder", [_mixed_ops, _golden_gcd, _golden_signed,
                                     _golden_bitwise,
                                     lambda: _golden_array(LAY)],
                         ids=["mixed", "gcd", "signed", "bitwise", "array"])
def test_lookup_entries_consistent(builder):
    emu, coll = _collect(builder)
    assert coll.entries, "no lookup entries recorded"
    by_cycle = {s.cycle: s for s in emu.trace}
    checked_mle = 0
    for e in coll.entries:
        # (1) table value == closed-form MLE at the index bit-point
        if checked_mle < 40:  # bound the O(xlen^2) shift evaluations
            r = [(e.index >> (127 - b)) & 1 for b in range(128)]
            assert tb.evaluate_mle(e.table, r, 64) == e.table_value % P, e.name
            checked_mle += 1
        # (2) computeResult == architectural rd result
        step = by_cycle[e.cycle]
        opcode = e.instruction & 0x7F
        rd = (e.instruction >> 7) & 0x1F
        if opcode in _RD_OPCODES and rd != 0:
            assert e.output == step.rd_value, (e.name, hex(e.instruction))
        # (3) validity tables hold on honest traces. (ValidSignedRemainder
        # follows the reference's sign(rem)==sign(DIVISOR) convention
        # (lookup_table/mod.zig ValidSignedRemainder doc comment), which
        # yields 0 for honest negative-dividend REMs — reference quirk, so
        # only the sign-matching cases are asserted 1.)
        if e.table in (tb.Table.ValidDiv0, tb.Table.ValidUnsignedRemainder):
            assert e.table_value == 1, e.name
        if e.table == tb.Table.ValidSignedRemainder:
            x, y = tb.uninterleave_bits(e.index, 64)
            rem, div = tb._sign(x, 64), tb._sign(y, 64)
            expect = 1 if (rem == 0 or div == 0
                           or (abs(rem) < abs(div) and (rem < 0) == (div < 0))) else 0
            assert e.table_value == expect, e.name


def test_branch_outputs_match_taken_direction():
    emu, coll = _collect(_golden_gcd)
    by_cycle = {s.cycle: s for s in emu.trace}
    n_branches = 0
    for e in coll.entries:
        if (e.instruction & 0x7F) != 0x63:
            continue
        step = by_cycle[e.cycle]
        seq = (step.pc + (2 if step.is_compressed else 4)) & ((1 << 64) - 1)
        taken = step.next_pc != seq
        assert e.output == (1 if taken else 0), e.name
        n_branches += 1
    assert n_branches > 0


def test_collector_stats_and_names():
    _, coll = _collect(_mixed_ops)
    stats = coll.get_stats()
    for want in ("MulLookup", "DivLookup", "RemLookup", "DivuLookup",
                 "RemuLookup", "SubLookup", "XorLookup", "AndLookup",
                 "OrLookup", "SllLookup", "SrlLookup", "SraLookup",
                 "SltuLookup", "SltLookup"):  # ADDI shares AddLookup (ref naming)
        assert stats.get(want, 0) > 0, (want, stats)


def test_lookup_name_universe():
    # spot-check the encoder-level naming across the class space
    assert lookup_name(0x00000033) == "AddLookup"
    assert lookup_name(0x40000033) == "SubLookup"
    assert lookup_name(0x02004033) == "DivLookup"
    assert lookup_name(0x0200503B) == "DivuwLookup"
    assert lookup_name(0x4000503B) == "SrawLookup"
    assert lookup_name(0x00000063) == "BeqLookup"
    assert lookup_name(0x0000006F) == "JalLookup"
    assert lookup_name(0x00000037) == "LuiLookup"
