"""Lookup-trace recording for Lasso instruction lookups.

Round-1 scaffold: records (cycle, pc, instruction, decoded, operands) per
instruction; the 58 per-instruction lookup-index/output functions and the 24
table MLEs (reference src/zkvm/instruction/lookups.zig, lookup_table/mod.zig)
land with the Lasso milestone and will consume these entries.
"""

from __future__ import annotations

from dataclasses import dataclass

from .decode import DecodedInstruction


@dataclass
class LookupEntry:
    cycle: int
    pc: int
    instruction: int
    decoded: DecodedInstruction
    rs1_value: int
    rs2_value: int


def record_lookup_entry(cycle: int, pc: int, d: DecodedInstruction, rs1: int, rs2: int):
    return LookupEntry(cycle, pc, d.raw, d, rs1, rs2)
