"""Instruction lookup classes + LookupTraceCollector for Lasso.

The reference implements 58 per-instruction lookup types, each bundling a
lookup table, a 128-bit index derivation, and a computed result
(src/zkvm/instruction/lookups.zig:27-4025), collected during emulation by
LookupTraceCollector (src/zkvm/instruction/lookup_trace.zig:31-471). The
TPU build replaces the comptime class-per-instruction pattern with one
declarative classifier: `classify_step` maps a trace step to its
(name, table, index, output) — data the Lasso argument and the committed
InstructionRa chunk polynomials both consume.

Invariant (the property Lasso proves): for every recorded entry,
`output == tables.materialize_entry(table, index)`; equivalently the
table's closed-form MLE at the index's bit-point equals the output —
tested in tests/test_lookup_trace.py.

Index derivation lives in zkvm/commitments.jolt_lookup_index (it is also
what builds the committed InstructionRa polys, byte-exact vs the reference
golden proof); this module adds the table assignment and result semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

from .decode import DecodedInstruction
from .tables import Table, instruction_table, materialize_entry

M64 = (1 << 64) - 1

# Reference lookup-class names by (opcode, funct3, funct7-discriminator) —
# parity with instruction/lookups.zig's 58 types for the classes the tracer
# records (the reference's LookupTraceCollector skips loads/stores/fences
# in the Jolt-format path; LoadAddress/StoreAddress classes serve its
# internal path only).
_OP_NAMES = {0: ("AddLookup", "SubLookup"), 1: ("SllLookup", None),
             2: ("SltLookup", None), 3: ("SltuLookup", None),
             4: ("XorLookup", None), 5: ("SrlLookup", "SraLookup"),
             6: ("OrLookup", None), 7: ("AndLookup", None)}
_M_NAMES = {0: "MulLookup", 1: "MulhLookup", 2: "MulhsuLookup",
            3: "MulhuLookup", 4: "DivLookup", 5: "DivuLookup",
            6: "RemLookup", 7: "RemuLookup"}
_BRANCH_NAMES = {0: "BeqLookup", 1: "BneLookup", 4: "BltLookup",
                 5: "BgeLookup", 6: "BltuLookup", 7: "BgeuLookup"}
_OP32_NAMES = {0: ("AddwLookup", "SubwLookup"), 1: ("SllwLookup", None),
               5: ("SrlwLookup", "SrawLookup")}
_M32_NAMES = {0: "MulwLookup", 4: "DivwLookup", 5: "DivuwLookup",
              6: "RemwLookup", 7: "RemuwLookup"}


@dataclass
class LookupEntry:
    """One recorded instruction lookup (reference LookupEntry,
    lookup_trace.zig:31).

    `table_value` = table[index] is what the Lasso read-check proves;
    `output` is the class's computeResult (the rd/branch semantics). They
    coincide for the direct classes; for div/rem the table proves VALIDITY
    (table_value == 1) while the result is carried in the index halves, and
    for the W classes the result is the sign-extended low word."""

    cycle: int
    pc: int
    instruction: int
    name: str
    table: Table
    index: int        # 128-bit (pair tables) or 64-bit (range-check class)
    table_value: int  # materialize_entry(table, index)
    output: int       # the class computeResult


def lookup_name(instr: int) -> str | None:
    """Reference lookup-class name for an instruction, or None if the
    collector records no entry for this opcode class."""
    opcode = instr & 0x7F
    f3 = (instr >> 12) & 0x7
    f7 = (instr >> 25) & 0x7F
    if opcode == 0x33:
        if f7 == 1:
            return _M_NAMES[f3]
        base, alt = _OP_NAMES[f3]
        return alt if (f7 & 0x20) and alt else base
    if opcode == 0x13:
        base, alt = _OP_NAMES[f3]
        name = alt if f3 == 5 and (f7 & 0x20) else base
        return name.replace("Lookup", "iLookup") if name else None
    if opcode == 0x63:
        return _BRANCH_NAMES.get(f3)
    if opcode == 0x3B:
        if f7 == 1:
            return _M32_NAMES.get(f3)
        pair = _OP32_NAMES.get(f3)
        if pair is None:
            return None
        base, alt = pair
        return alt if (f7 & 0x20) and alt else base
    if opcode == 0x1B:
        pair = _OP32_NAMES.get(f3)
        if pair is None:
            return None
        base, alt = pair
        name = alt if f3 == 5 and (f7 & 0x20) else base
        return name.replace("Lookup", "iLookup")
    return {0x37: "LuiLookup", 0x17: "AuipcLookup",
            0x6F: "JalLookup", 0x67: "JalrLookup"}.get(opcode)


def _sext32(v: int) -> int:
    v &= 0xFFFFFFFF
    return v | (~0xFFFFFFFF & M64) if v >> 31 else v


def _uninterleave(index: int) -> tuple[int, int]:
    from .tables import uninterleave_bits

    return uninterleave_bits(index, 64)


def _compute_result(name: str, table: Table, index: int,
                    table_value: int) -> int:
    """Class computeResult (reference per-class computeResult,
    instruction/lookups.zig): rd/branch semantics from the lookup."""
    if name in ("DivLookup", "DivuLookup"):
        return _uninterleave(index)[1]           # quotient in the y half
    if name in ("RemLookup", "RemuLookup"):
        return _uninterleave(index)[0]           # remainder in the x half
    if name in ("DivwLookup", "DivuwLookup"):
        return _sext32(_uninterleave(index)[1])
    if name in ("RemwLookup", "RemuwLookup"):
        return _sext32(_uninterleave(index)[0])
    if name == "SrawLookup":
        x, y = _uninterleave(index)
        sh = y & 0x3F
        sx = x - (1 << 32) if (x >> 31) & 1 else x
        return _sext32((sx >> sh) & 0xFFFFFFFF)
    if name in ("SubwLookup", "SllwLookup", "SrlwLookup"):
        return _sext32(table_value & 0xFFFFFFFF)
    return table_value


def classify_step(step) -> LookupEntry | None:
    """Build the lookup entry for a trace step (index catalog:
    zkvm/commitments.jolt_lookup_index; table assignment:
    vm/tables.instruction_table)."""
    from ..zkvm.commitments import jolt_lookup_index

    if getattr(step, "is_noop", False):
        return None
    index = jolt_lookup_index(step)
    if index is None:
        return None
    instr = step.instruction
    table = instruction_table(instr)
    if table is None:
        table = Table.RangeCheck
    name = lookup_name(instr) or "RangeCheckLookup"
    tv = materialize_entry(table, index, 64)
    return LookupEntry(
        cycle=step.cycle, pc=step.pc, instruction=instr, name=name,
        table=table, index=index, table_value=tv,
        output=_compute_result(name, table, index, tv))


class LookupTraceCollector:
    """Gathers lookup entries over a trace (reference
    lookup_trace.zig LookupTraceCollector; getStats/getEntries parity)."""

    def __init__(self) -> None:
        self.entries: list[LookupEntry] = []

    def collect(self, steps) -> "LookupTraceCollector":
        for s in steps:
            e = classify_step(s)
            if e is not None:
                self.entries.append(e)
        return self

    def get_entries(self) -> list[LookupEntry]:
        return self.entries

    def get_stats(self) -> dict[str, int]:
        out: dict[str, int] = {}
        for e in self.entries:
            out[e.name] = out.get(e.name, 0) + 1
        return out

    def by_table(self) -> dict[Table, list[LookupEntry]]:
        out: dict[Table, list[LookupEntry]] = {}
        for e in self.entries:
            out.setdefault(e.table, []).append(e)
        return out


# -- emulator hook (kept lightweight: full classification happens post-run
# on the finished trace, where operand values are final) -------------------

@dataclass
class RawLookupRecord:
    cycle: int
    pc: int
    instruction: int
    decoded: DecodedInstruction
    rs1_value: int
    rs2_value: int


def record_lookup_entry(cycle: int, pc: int, d: DecodedInstruction,
                        rs1: int, rs2: int) -> RawLookupRecord:
    return RawLookupRecord(cycle, pc, d.raw, d, rs1, rs2)
