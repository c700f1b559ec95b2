"""Full-width (2^128 index space) Lasso read-check round-trip on real
traced 64-bit lookup indices — the scaling piece the reference implements
via prefix–suffix decomposition (src/zkvm/lasso/prefix_suffix.zig); here
the closed-form table MLEs evaluate the mixed prefix/suffix points.
"""

import random

import pytest

from zolt_tpu.field.params import FR
from zolt_tpu.transcript import Blake2bTranscript
from zolt_tpu.vm import Emulator, MemoryConfig, pad_with_noop
from zolt_tpu.vm import tables as tb
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.lookups import LookupTraceCollector
from zolt_tpu.zkvm.lasso64 import (collect_table_entries, prove_lasso64,
                                   verify_lasso64)

P = FR.p


@pytest.fixture(scope="module")
def trace():
    a = Asm()
    a.addi(1, 0, -37)
    a.addi(2, 0, 5)
    a.mul(3, 1, 2)
    a.div(4, 1, 2)
    a.rem(5, 1, 2)
    a.sub(8, 2, 1)
    a.xor(9, 1, 2)
    a.and_(10, 1, 2)
    a.or_(11, 1, 2)
    a.sll(12, 2, 2)
    a.srl(13, 1, 2)
    a.sra(14, 1, 2)
    a.sltu(15, 1, 2)
    a.slt(16, 1, 2)
    a.jal(0, 0)
    emu = Emulator(MemoryConfig(program_size=1024))
    emu.load_program(a.bytes())
    emu.run()
    return pad_with_noop(list(emu.trace))


def _tables_in(trace):
    coll = LookupTraceCollector().collect(trace)
    return sorted(coll.by_table().keys())


def test_lasso64_roundtrip_all_traced_tables(trace):
    n = len(trace).bit_length() - 1
    rng = random.Random(42)
    r_cycle = [rng.randrange(P) for _ in range(n)]
    tables = _tables_in(trace)
    # real traces hit comparison, boolean, shift, arithmetic and validity
    # table families
    assert len(tables) >= 6
    for table in tables:
        entries = collect_table_entries(trace, table)
        assert entries
        tp = Blake2bTranscript(b"lasso64")
        proof = prove_lasso64(tp, entries, table, r_cycle, n)
        # out_claim equals the independently computed weighted table reads
        from zolt_tpu.zkvm.lasso64 import _eq_le_bits
        expect = 0
        for (j, idx) in entries:
            expect = (expect + _eq_le_bits(r_cycle, j)
                      * (tb.materialize_entry(table, idx, 64) % P)) % P
        assert proof.out_claim == expect, table.name
        tv = Blake2bTranscript(b"lasso64")
        assert verify_lasso64(tv, proof, r_cycle, n,
                              expected_out_claim=expect), table.name


def test_lasso64_rejects_tampered_round(trace):
    n = len(trace).bit_length() - 1
    rng = random.Random(7)
    r_cycle = [rng.randrange(P) for _ in range(n)]
    table = _tables_in(trace)[0]
    entries = collect_table_entries(trace, table)
    tp = Blake2bTranscript(b"lasso64")
    proof = prove_lasso64(tp, entries, table, r_cycle, n)
    proof.addr_polys[64][0] = (proof.addr_polys[64][0] + 1) % P
    tv = Blake2bTranscript(b"lasso64")
    assert not verify_lasso64(tv, proof, r_cycle, n)


def test_lasso64_rejects_forged_out_claim(trace):
    n = len(trace).bit_length() - 1
    rng = random.Random(9)
    r_cycle = [rng.randrange(P) for _ in range(n)]
    table = _tables_in(trace)[0]
    entries = collect_table_entries(trace, table)
    tp = Blake2bTranscript(b"lasso64")
    proof = prove_lasso64(tp, entries, table, r_cycle, n)
    tv = Blake2bTranscript(b"lasso64")
    assert not verify_lasso64(tv, proof, r_cycle, n,
                              expected_out_claim=(proof.out_claim + 1) % P)
