"""BytecodeIndex spec tests: the static slot tables must reproduce the
bytecode-determined witness columns of every traced cycle exactly — that
identity is what the BytecodeReadRaf stage proves."""

from test_raf_gadgets import TRACES, _golden_mixed, LAY

from zolt_tpu.field.params import FR
from zolt_tpu.r1cs.inputs import cycle_witness, noop_witness
from zolt_tpu.vm import elf as elf_mod
from zolt_tpu.zkvm.bytecode_tables import (STATIC_COLS, BytecodeIndex,
                                           mle_eval_table)

P = FR.p


def _index_for(builder):
    a = builder()
    a.halt(LAY, tmp=30, one=31, provable=True)
    return BytecodeIndex.from_elf(elf_mod.write_minimal_elf(a.bytes()))


def test_static_cols_match_witness():
    from golden_programs import _golden_array, _golden_sum

    from zolt_tpu.r1cs.inputs import witness_matrix
    from zolt_tpu.vm import pad_with_noop, run_elf

    for name, builder in (("sum", _golden_sum),
                          ("array", lambda: _golden_array(LAY)),
                          ("mixed", _golden_mixed)):
        a = builder()
        a.halt(LAY, tmp=30, one=31, provable=True)
        elf = elf_mod.write_minimal_elf(a.bytes())
        idx = BytecodeIndex.from_elf(elf)
        cols = idx.static_cols()
        # the trace the sound pipeline proves: expanded when the program
        # contains div-family instructions, slot-PC indexing to match
        steps = pad_with_noop(run_elf(elf, expand_virtual=True).trace)
        slots = idx.slots_per_cycle(steps)
        rows = witness_matrix(steps, sound=True,
                              slots=slots if idx.expanded else None)
        for i, step in enumerate(steps):
            slot = slots[i]
            if step.is_noop:
                assert slot == 0
                w = noop_witness()
            else:
                assert idx.entries[slot].instruction == step.instruction, \
                    f"{name} cycle {i}: bytecode desync"
                w = rows[i]
            for c in STATIC_COLS:
                assert cols[c][slot] == w[c] % P, \
                    f"{name} cycle {i} slot {slot} col {c.name}"


def test_lookup_indicator_tables():
    idx = _index_for(_golden_mixed)
    has = idx.has_lookup_table()
    val = idx.has_validity_table()
    assert has[0] == 0 and val[0] == 0           # noop sentinel
    assert sum(has) > 10
    # div-family slots expand into virtual sequences whose validity checks
    # are ASSERT rows with their own lookup tables, so no valid_table
    # side-instances remain in the expanded index — but the expansion
    # itself must be present
    assert idx.expanded
    assert sum(1 for e in idx.entries
               if (e.instruction & 0x7F) == 0x0B) >= 4 * 11


def test_mle_eval_table_binary_points():
    idx = _index_for(_golden_mixed)
    t = idx.gamma_rlc_table(12345)
    n = idx.log_k
    for k in (0, 1, idx.size - 1):
        bits = [(k >> i) & 1 for i in range(n)]
        assert mle_eval_table(t, bits) == t[k]
