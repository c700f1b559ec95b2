"""R1CS witness generation: every cycle of real traced programs must satisfy
all 19 uniform constraints (the invariant the Stage-1 sumcheck proves)."""

import os

import pytest

from zolt_tpu.r1cs import check_witness, noop_witness, witness_matrix
from zolt_tpu.vm import MemoryConfig, Emulator, pad_with_noop, run_elf

FIB_ELF = "/root/reference/examples/fibonacci.elf"


def asm_words(*words) -> bytes:
    return b"".join(w.to_bytes(4, "little") for w in words)


def run_program(words) -> list:
    emu = Emulator(MemoryConfig(program_size=1024))
    emu.load_program(asm_words(*words))
    emu.run()
    return pad_with_noop(list(emu.trace))


def assert_all_satisfied(padded):
    rows = witness_matrix(padded)
    for i, w in enumerate(rows):
        bad = check_witness(w)
        assert not bad, f"cycle {i}: violated constraints {bad} (instr={padded[i].instruction:#x})"


def test_noop_witness_satisfies():
    assert check_witness(noop_witness()) == []


def test_arith_program_witness():
    assert_all_satisfied(run_program([
        0x00500093,  # addi x1, x0, 5
        0x00000113,  # addi x2, x0, 0
        0x00110133,  # add x2, x2, x1
        0xFFF08093,  # addi x1, x1, -1
        0xFE101CE3,  # bne x1, x0, -8
        0x0000006F,  # j .
    ]))


def test_memory_program_witness():
    lui_x2 = (0x80001 << 12) | (2 << 7) | 0x37
    slli_x2 = (32 << 20) | (2 << 15) | (1 << 12) | (2 << 7) | 0x13
    srli_x2 = (32 << 20) | (2 << 15) | (5 << 12) | (2 << 7) | 0x13
    assert_all_satisfied(run_program([
        0x12300093,  # addi x1, x0, 0x123
        lui_x2,      # x2 = 0x80001000 zero-extended (lui; slli 32; srli 32)
        slli_x2,
        srli_x2,
        0x00113023,  # sd x1, 0(x2)
        0x00013183,  # ld x3, 0(x2)
        0x40208233,  # sub x4, x1, x2
        0x022081B3,  # mul x3, x1, x2
        0x0000006F,
    ]))


def test_jump_program_witness():
    assert_all_satisfied(run_program([
        0x00C000EF,  # jal x1, +12
        0x00100113,  # addi x2, x0, 1   (skipped)
        0x00200113,  # addi x2, x0, 2   (skipped)
        0x00300193,  # addi x3, x0, 3   (jump lands here)
        0x0000006F,
    ]))


@pytest.mark.skipif(not os.path.exists(FIB_ELF), reason="reference ELF not present")
def test_fibonacci_witness_satisfies_all_constraints():
    emu = run_elf(FIB_ELF)
    padded = pad_with_noop(list(emu.trace))
    assert_all_satisfied(padded)
