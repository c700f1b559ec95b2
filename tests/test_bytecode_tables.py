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
    import pytest

    from golden_programs import _golden_array, _golden_sum

    for (name, steps), builder in zip(
            [t for t in TRACES if t[0] in ("sum", "array", "mixed")],
            [_golden_sum, lambda: _golden_array(LAY), _golden_mixed]):
        idx = _index_for(builder)
        cols = idx.static_cols()
        for i, step in enumerate(steps):
            slot = idx.slot_of_step(step)
            if step.is_noop:
                assert slot == 0
                w = noop_witness()
            else:
                assert idx.entries[slot].instruction == step.instruction, \
                    f"{name} cycle {i}: bytecode desync"
                nxt = steps[i + 1] if i + 1 < len(steps) else None
                w = cycle_witness(step, nxt, sound=True)
            for c in STATIC_COLS:
                assert cols[c][slot] == w[c] % P, \
                    f"{name} cycle {i} slot {slot} col {c.name}"


def test_lookup_indicator_tables():
    idx = _index_for(_golden_mixed)
    has = idx.has_lookup_table()
    val = idx.has_validity_table()
    assert has[0] == 0 and val[0] == 0           # noop sentinel
    assert sum(has) > 10
    assert sum(val) >= 3                         # div/divu/remu in mixed


def test_mle_eval_table_binary_points():
    idx = _index_for(_golden_mixed)
    t = idx.gamma_rlc_table(12345)
    n = idx.log_k
    for k in (0, 1, idx.size - 1):
        bits = [(k >> i) & 1 for i in range(n)]
        assert mle_eval_table(t, bits) == t[k]
