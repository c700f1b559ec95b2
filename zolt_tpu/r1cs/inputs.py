"""R1CS input indices and per-cycle witness construction.

The 43 per-cycle inputs (36 core + product-virtual + operand flags) and their
exact construction from a trace step, matching the reference byte-for-byte
(src/zkvm/r1cs/constraints.zig:40-96, 898-1430). Order is Jolt's
ALL_R1CS_INPUTS order — load-bearing for claim matching.

Witness values are canonical Fr ints; negative quantities wrap mod p.
"""

from __future__ import annotations

from enum import IntEnum

from ..field.params import FR

P = FR.p
TWO64 = 1 << 64


class Inp(IntEnum):
    LeftInstructionInput = 0
    RightInstructionInput = 1
    Product = 2
    WriteLookupOutputToRD = 3
    WritePCtoRD = 4
    ShouldBranch = 5
    PC = 6
    UnexpandedPC = 7
    Imm = 8
    RamAddress = 9
    Rs1Value = 10
    Rs2Value = 11
    RdWriteValue = 12
    RamReadValue = 13
    RamWriteValue = 14
    LeftLookupOperand = 15
    RightLookupOperand = 16
    NextUnexpandedPC = 17
    NextPC = 18
    NextIsVirtual = 19
    NextIsFirstInSequence = 20
    LookupOutput = 21
    ShouldJump = 22
    FlagAddOperands = 23
    FlagSubtractOperands = 24
    FlagMultiplyOperands = 25
    FlagLoad = 26
    FlagStore = 27
    FlagJump = 28
    FlagWriteLookupOutputToRD = 29
    FlagVirtualInstruction = 30
    FlagAssert = 31
    FlagDoNotUpdateUnexpandedPC = 32
    FlagAdvice = 33
    FlagIsCompressed = 34
    FlagIsFirstInSequence = 35
    FlagIsRdNotZero = 36
    FlagBranch = 37
    FlagIsNoop = 38
    FlagLeftOperandIsRs1 = 39
    FlagLeftOperandIsPC = 40
    FlagRightOperandIsRs2 = 41
    FlagRightOperandIsImm = 42


NUM_INPUTS = 43


def _s64(x: int) -> int:
    return x - TWO64 if x >> 63 else x


def _sext_field(v: int, bits: int) -> int:
    """Sign-extended immediate as a field element (negatives wrap mod p)."""
    if v & (1 << (bits - 1)):
        return (-((~v + 1) & ((1 << bits) - 1))) % P
    return v % P


def derive_immediate(instr: int) -> int:
    """Field-valued immediate, reference deriveImmediate semantics — note
    LUI/AUIPC are UNSIGNED here (constraints.zig:1267-1270)."""
    opcode = instr & 0x7F
    if opcode in (0x13, 0x03, 0x67):
        return _sext_field(instr >> 20, 12)
    if opcode == 0x23:
        imm = (((instr >> 25) & 0x7F) << 5) | ((instr >> 7) & 0x1F)
        return _sext_field(imm, 12)
    if opcode == 0x63:
        imm = ((((instr >> 31) & 1) << 12) | (((instr >> 7) & 1) << 11)
               | (((instr >> 25) & 0x3F) << 5) | (((instr >> 8) & 0xF) << 1))
        return _sext_field(imm, 13)
    if opcode == 0x6F:
        imm = ((((instr >> 31) & 1) << 20) | (((instr >> 12) & 0xFF) << 12)
               | (((instr >> 20) & 1) << 11) | (((instr >> 21) & 0x3FF) << 1))
        return _sext_field(imm, 21)
    if opcode in (0x37, 0x17):
        return instr & 0xFFFFF000  # unsigned
    return 0


def _jtype_imm(instr: int) -> int:
    imm = ((((instr >> 31) & 1) << 20) | (((instr >> 12) & 0xFF) << 12)
           | (((instr >> 20) & 1) << 11) | (((instr >> 21) & 0x3FF) << 1))
    if imm & (1 << 20):
        imm -= 1 << 21
    return imm


def _itype_imm(instr: int) -> int:
    imm = instr >> 20
    if imm & 0x800:
        imm -= 1 << 12
    return imm


def compute_lookup_output(step) -> int:
    """reference computeLookupOutput (constraints.zig:600-640)."""
    opcode = step.instruction & 0x7F
    if opcode == 0x6F:  # JAL: PC + imm
        return (step.pc + _jtype_imm(step.instruction)) % TWO64
    if opcode == 0x67:  # JALR: (rs1 + imm) & ~1
        return ((step.rs1_value + _itype_imm(step.instruction)) % TWO64) & ~1
    if opcode == 0x63:  # branch condition
        f3 = (step.instruction >> 12) & 0x7
        rs1, rs2 = step.rs1_value, step.rs2_value
        taken = {
            0x0: rs1 == rs2, 0x1: rs1 != rs2,
            0x4: _s64(rs1) < _s64(rs2), 0x5: _s64(rs1) >= _s64(rs2),
            0x6: rs1 < rs2, 0x7: rs1 >= rs2,
        }.get(f3, False)
        return 1 if taken else 0
    return step.rd_value


def noop_witness() -> list[int]:
    """NoOp padding cycle witness: all zero except DoNotUpdateUnexpandedPC and
    IsNoop (constraints.zig:1398-1424)."""
    w = [0] * NUM_INPUTS
    w[Inp.FlagDoNotUpdateUnexpandedPC] = 1
    w[Inp.FlagIsNoop] = 1
    return w


def cycle_witness(step, next_step, sound: bool = False) -> list[int]:
    """Build the 43 witness values for one real trace step (canonical ints)."""
    if step.is_noop:
        return noop_witness()

    w = [0] * NUM_INPUTS
    instr = step.instruction
    opcode = instr & 0x7F
    funct3 = (instr >> 12) & 0x7
    funct7 = (instr >> 25) & 0x7F
    rd = (instr >> 7) & 0x1F

    is_load = opcode == 0x03
    is_store = opcode == 0x23
    is_branch = opcode == 0x63

    if is_load:
        w[Inp.FlagLoad] = 1
    if is_store:
        w[Inp.FlagStore] = 1
    if step.is_compressed:
        w[Inp.FlagIsCompressed] = 1

    imm = derive_immediate(instr)
    w[Inp.Imm] = imm

    reads_rs1 = opcode in (0x13, 0x03, 0x67, 0x1B, 0x33, 0x3B, 0x23, 0x63)
    reads_rs2 = opcode in (0x33, 0x3B, 0x23, 0x63)
    if reads_rs1:
        w[Inp.Rs1Value] = step.rs1_value % P
    if reads_rs2:
        w[Inp.Rs2Value] = step.rs2_value % P

    if is_load or is_store:
        w[Inp.RamAddress] = (step.rs1_value + imm) % P
    mem_val = step.memory_value if step.memory_value is not None else 0

    writes_to_rd = (not is_store) and (not is_branch) and rd != 0
    if is_load:
        w[Inp.RamReadValue] = mem_val % P
        w[Inp.RamWriteValue] = mem_val % P
        w[Inp.RdWriteValue] = mem_val % P
    elif is_store:
        if sound and step.memory_pre_value is not None:
            # sound mode: the true Jolt semantic rv(store) = pre-value, so
            # the RWC input claim rv + gamma*wv equals the instance's true
            # sum (no R1CS constraint pins rv for stores, so this stays
            # satisfying; reference-compat mode reproduces the reference's
            # rv(store) = stored-value convention)
            w[Inp.RamReadValue] = step.memory_pre_value % P
        else:
            w[Inp.RamReadValue] = mem_val % P
        w[Inp.RamWriteValue] = step.rs2_value % P
    else:
        w[Inp.RdWriteValue] = step.rd_value % P if writes_to_rd else 0

    # operand-source flags
    left_is_rs1 = 1 if opcode in (0x33, 0x13, 0x03, 0x67, 0x23, 0x63, 0x1B, 0x3B) else 0
    left_is_pc = 1 if opcode in (0x17, 0x6F) else 0
    right_is_rs2 = 1 if opcode in (0x33, 0x63, 0x3B) else 0
    right_is_imm = 1 if opcode in (0x13, 0x03, 0x67, 0x23, 0x37, 0x17, 0x6F, 0x1B) else 0
    zero_output = False
    if sound:
        # Sound-mode RAF binding (zkvm/raf_gadgets.py): operands that are
        # not derivable from the committed lookup index (MULH*, the W
        # family, the div/rem dividend) have their source flags zeroed, so
        # the operand columns are provably zero and every remaining lookup
        # claim is index-bound. LookupOutput is zeroed where the class has
        # no output gadget (loads/stores/system/W) — unconstrained slots.
        from ..zkvm.raf_gadgets import needs_witness_adjust

        zl, zr, zero_output = needs_witness_adjust(instr)
        if zl:
            left_is_rs1 = left_is_pc = 0
        if zr:
            right_is_rs2 = right_is_imm = 0
    w[Inp.FlagLeftOperandIsRs1] = left_is_rs1
    w[Inp.FlagLeftOperandIsPC] = left_is_pc
    w[Inp.FlagRightOperandIsRs2] = right_is_rs2
    w[Inp.FlagRightOperandIsImm] = right_is_imm

    pc_val = step.unexpanded_pc % P
    left = (left_is_rs1 * w[Inp.Rs1Value] + left_is_pc * pc_val) % P
    right = (right_is_rs2 * w[Inp.Rs2Value] + right_is_imm * imm) % P
    w[Inp.LeftInstructionInput] = left
    w[Inp.RightInstructionInput] = right
    w[Inp.Product] = left * right % P

    w[Inp.LookupOutput] = 0 if zero_output else compute_lookup_output(step) % P
    w[Inp.PC] = step.pc % P
    w[Inp.UnexpandedPC] = step.unexpanded_pc % P

    if next_step is not None and not next_step.is_noop:
        w[Inp.NextPC] = next_step.pc % P
        w[Inp.NextUnexpandedPC] = next_step.unexpanded_pc % P
    # NextIsVirtual / NextIsFirstInSequence stay 0 (no virtual sequences)

    # flags + lookup operands per opcode (constraints.zig setFlagsFromInstruction)
    if opcode in (0x03, 0x23, 0x63):
        w[Inp.LeftLookupOperand] = left
        w[Inp.RightLookupOperand] = right
    elif opcode == 0x33:
        if funct7 == 0x01:
            if funct3 == 0x0:  # MUL
                w[Inp.FlagMultiplyOperands] = 1
                w[Inp.LeftLookupOperand] = 0
                w[Inp.RightLookupOperand] = w[Inp.Product]
            else:
                w[Inp.LeftLookupOperand] = left
                w[Inp.RightLookupOperand] = right
        elif funct7 == 0x20 and funct3 == 0x0:  # SUB
            w[Inp.FlagSubtractOperands] = 1
            w[Inp.LeftLookupOperand] = 0
            w[Inp.RightLookupOperand] = (left - right + TWO64) % P
        else:
            w[Inp.FlagAddOperands] = 1
            w[Inp.LeftLookupOperand] = 0
            w[Inp.RightLookupOperand] = (right + left) % P
        w[Inp.FlagWriteLookupOutputToRD] = 1
    elif opcode == 0x13:
        w[Inp.FlagAddOperands] = 1
        w[Inp.LeftLookupOperand] = 0
        w[Inp.RightLookupOperand] = (right + left) % P
        w[Inp.FlagWriteLookupOutputToRD] = 1
    elif opcode == 0x6F:
        w[Inp.FlagJump] = 1
        w[Inp.FlagAddOperands] = 1
        w[Inp.LeftLookupOperand] = 0
        w[Inp.RightLookupOperand] = (left + right) % P
    elif opcode == 0x67:
        w[Inp.FlagJump] = 1
        w[Inp.FlagAddOperands] = 1
        w[Inp.LeftLookupOperand] = 0
        w[Inp.RightLookupOperand] = (left + right) % P
    elif opcode == 0x37:
        w[Inp.FlagAddOperands] = 1
        w[Inp.FlagWriteLookupOutputToRD] = 1
        w[Inp.LeftLookupOperand] = 0
        w[Inp.RightLookupOperand] = (left + right) % P
    elif opcode == 0x17:
        w[Inp.FlagAddOperands] = 1
        w[Inp.FlagWriteLookupOutputToRD] = 1
        w[Inp.LeftLookupOperand] = 0
        w[Inp.RightLookupOperand] = (left + right) % P
    else:
        w[Inp.LeftLookupOperand] = left
        w[Inp.RightLookupOperand] = right

    # derived products (after flags)
    next_is_noop = 1 if (next_step is None or next_step.is_noop) else 0
    w[Inp.ShouldJump] = w[Inp.FlagJump] * (1 - next_is_noop)
    is_rd_not_zero = 1 if rd != 0 else 0
    w[Inp.WriteLookupOutputToRD] = is_rd_not_zero * w[Inp.FlagWriteLookupOutputToRD]
    w[Inp.WritePCtoRD] = is_rd_not_zero * w[Inp.FlagJump]
    w[Inp.ShouldBranch] = w[Inp.LookupOutput] * (1 if is_branch else 0) % P
    w[Inp.FlagIsRdNotZero] = is_rd_not_zero
    w[Inp.FlagBranch] = 1 if is_branch else 0
    w[Inp.FlagIsNoop] = 0
    return w


def witness_matrix(padded_steps, sound: bool = False) -> list[list[int]]:
    """Per-cycle witness rows for the whole (padded) trace."""
    out = []
    n = len(padded_steps)
    for i, step in enumerate(padded_steps):
        nxt = padded_steps[i + 1] if i + 1 < n else None
        out.append(cycle_witness(step, nxt, sound=sound))
    return out
