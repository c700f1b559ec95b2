"""Parity + semantics for the complete 58-class lookup catalogue.

The reference defines 58 `pub fn *Lookup` types
(/root/reference/src/zkvm/instruction/lookups.zig) but wires only the
ALU/branch/jump classes into its collector — loads/stores are "handled
separately" (lookup_trace.zig:1016), i.e. not at all. This repo enumerates
all 58 (vm/lookups.ALL_LOOKUP_CLASSES), classifies memory steps through the
13 load/store classes, and exercises them in the internal Lasso read check.
"""

import os
import re

import pytest

from zolt_tpu.vm import elf as elf_mod
from zolt_tpu.vm.emulator import run_elf
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
from zolt_tpu.vm.lookups import (ALL_LOOKUP_CLASSES, LookupTraceCollector,
                                 classify_memory_step, lookup_name)
from zolt_tpu.vm.tables import Table, materialize_entry

REF_LOOKUPS = "/root/reference/src/zkvm/instruction/lookups.zig"
LAY = MemoryLayout.create(MemoryConfig(program_size=1024))
M64 = (1 << 64) - 1


def test_catalogue_matches_reference_class_list():
    """Enumerate every `pub fn <Name>Lookup(` in the reference file and
    require exact set equality with ALL_LOOKUP_CLASSES (58 names)."""
    if not os.path.exists(REF_LOOKUPS):
        pytest.skip("reference tree absent")
    with open(REF_LOOKUPS) as f:
        src = f.read()
    ref = set(re.findall(r"pub fn (\w+Lookup)\(", src))
    ref.discard("LookupTraceEntry")
    assert ref == set(ALL_LOOKUP_CLASSES)
    assert len(ALL_LOOKUP_CLASSES) == 58


def test_opimm_shares_register_classes():
    """Reference naming: ADDI -> AddLookup (shared), shifts get their own
    Slli/Srli/Srai classes, W immediates get Addiw/Slliw/Srliw/Sraiw."""
    assert lookup_name(0x00000013) == "AddLookup"      # addi
    assert lookup_name(0x00007013) == "AndLookup"      # andi
    assert lookup_name(0x00002013) == "SltLookup"      # slti
    assert lookup_name(0x00001013) == "SlliLookup"
    assert lookup_name(0x00005013) == "SrliLookup"
    assert lookup_name(0x40005013) == "SraiLookup"
    assert lookup_name(0x0000001B) == "AddiwLookup"
    assert lookup_name(0x0000101B) == "SlliwLookup"
    assert lookup_name(0x0000501B) == "SrliwLookup"
    assert lookup_name(0x4000501B) == "SraiwLookup"
    assert lookup_name(0x00003003) == "LdLookup"
    assert lookup_name(0x00003023) == "SdLookup"


def _memory_guest():
    """One of every load/store width, signed and unsigned, with a negative
    byte pattern so the sign-extension tables do real work."""
    a = Asm()
    a.li_addr(5, 0x80002000)
    a.addi(6, 0, -2)           # 0xFF..FE
    a.sd(5, 6, 0)              # SdLookup
    a.words.append((6 << 20) | (5 << 15) | (0 << 12) | (8 << 7) | 0x23)   # sb
    a.words.append((6 << 20) | (5 << 15) | (1 << 12) | (16 << 7) | 0x23)  # sh
    a.words.append((6 << 20) | (5 << 15) | (2 << 12) | (24 << 7) | 0x23)  # sw
    for f3 in (0, 4, 1, 5, 2, 6, 3):   # lb lbu lh lhu lw lwu ld
        a.words.append((0 << 20) | (5 << 15) | (f3 << 12) | (10 << 7) | 0x03)
        a.add(11, 11, 10)
    a.halt(LAY, tmp=30, one=31, provable=True)
    return a


def test_memory_classes_semantics():
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".elf", delete=False) as f:
        f.write(elf_mod.write_minimal_elf(_memory_guest().bytes()))
        path = f.name
    try:
        emu = run_elf(path)
    finally:
        os.unlink(path)

    seen = set()
    for s in emu.trace:
        for e in classify_memory_step(s):
            seen.add(e.name)
            # the Lasso invariant: output/table_value really is table[index]
            assert e.table_value == materialize_entry(e.table, e.index, 64)
            if e.name in ("LoadAddressLookup", "StoreAddressLookup"):
                assert e.output == s.memory_addr
            elif e.name in ("LbLookup", "LhLookup", "LwLookup", "LdLookup",
                            "LbuLookup", "LhuLookup", "LwuLookup"):
                # loads write the (sign-/zero-extended) value to rd
                assert e.output == s.rd_value, e.name
            else:  # store value classes
                bits = {"SbLookup": 8, "ShLookup": 16,
                        "SwLookup": 32, "SdLookup": 64}[e.name]
                assert e.output == (s.rs2_value & ((1 << bits) - 1))
    assert {"LoadAddressLookup", "StoreAddressLookup", "LbLookup",
            "LbuLookup", "LhLookup", "LhuLookup", "LwLookup", "LwuLookup",
            "LdLookup", "SbLookup", "ShLookup", "SwLookup",
            "SdLookup"} <= seen
    # sign-extension tables actually consulted
    tables = {e.table for s in emu.trace for e in classify_memory_step(s)}
    assert {Table.SignExtend8, Table.SignExtend16, Table.SignExtend32,
            Table.RangeCheck} <= tables

    # collector memory mode includes them
    coll = LookupTraceCollector().collect(emu.trace, memory=True)
    stats = coll.get_stats()
    assert stats.get("LbLookup", 0) > 0 and stats.get("SdLookup", 0) > 0


def test_memory_classes_through_lasso64():
    """The internal full-width Lasso read check proves the SignExtend8 and
    RangeCheck lookups of a load/store guest (the 'exercised in the internal
    Lasso path' requirement)."""
    import tempfile

    from zolt_tpu.transcript import Blake2bTranscript
    from zolt_tpu.zkvm.lasso64 import (collect_table_entries, prove_lasso64,
                                       verify_lasso64)

    with tempfile.NamedTemporaryFile(suffix=".elf", delete=False) as f:
        f.write(elf_mod.write_minimal_elf(_memory_guest().bytes()))
        path = f.name
    try:
        emu = run_elf(path)
    finally:
        os.unlink(path)

    n = max(4, (len(emu.trace) + 1).bit_length())
    r_cycle = [(i * 7 + 3) for i in range(n)]
    for table in (Table.SignExtend8, Table.SignExtend16, Table.SignExtend32):
        entries = collect_table_entries(emu.trace, table, memory=True)
        assert entries, f"no {table} entries"
        tp = Blake2bTranscript(b"lasso64")
        proof = prove_lasso64(tp, entries, table, r_cycle, n)
        tv = Blake2bTranscript(b"lasso64")
        assert verify_lasso64(tv, proof, r_cycle, n)
