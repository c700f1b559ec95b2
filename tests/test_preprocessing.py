"""Jolt verifier-preprocessing export vs the reference's golden file.

The golden file's DoryVerifierSetup section was generated with Jolt's external
URS (not in the repo), so only its structure is checked; the shared
preprocessing tail (bytecode JSON, RAM words, memory layout, trace length) is
checked byte-for-byte.
"""

import os
import struct

import pytest

GOLD = "/root/reference/logs/zolt_preprocessing.bin"
ELF = "/root/reference/examples/fibonacci.elf"

pytestmark = pytest.mark.skipif(not os.path.exists(GOLD), reason="golden absent")


def test_shared_preprocessing_byte_exact():
    from zolt_tpu.vm import elf as elf_mod
    from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
    from zolt_tpu.zkvm import preprocessing as prep

    gold = open(GOLD, "rb").read()
    base, image = elf_mod.load_file(ELF).flat_image()
    layout = MemoryLayout.create(MemoryConfig(program_size=len(image), memory_size=32768))
    shared = prep.serialize_shared_preprocessing(bytes(image), base, layout, 1024)
    assert gold[-len(shared):] == shared


def test_jolt_instruction_json():
    from zolt_tpu.zkvm.preprocessing import decode_jolt_instruction

    # addi x1, x0, 5
    ins = decode_jolt_instruction(0x00500093, 0x80000000, False)
    assert ins.variant == "ADDI"
    assert '"ADDI":{"address":2147483648,"operands":{"rd":1,"rs1":0,"imm":5}' in ins.to_json()
    # negative branch immediate serializes as signed
    ins = decode_jolt_instruction(0xFE101CE3, 0x8000000C, False)  # bne -8
    assert ins.variant == "BNE"
    assert '"imm":-8' in ins.to_json()


def test_verifier_setup_structure():
    from zolt_tpu.pcs import dory
    from zolt_tpu.zkvm import preprocessing as prep

    srs = dory.setup(4)  # tiny: sigma=2 -> 4 G1 points, 3-level ladder
    vs = prep.dory_verifier_setup(srs)
    blob = prep.serialize_dory_verifier_setup(vs)
    assert struct.unpack_from("<Q", blob, 0)[0] == 3
    assert len(blob) == 5 * (8 + 3 * 384) + 32 + 64 + 32 + 64 + 384 + 8
