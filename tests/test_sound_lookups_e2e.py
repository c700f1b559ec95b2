"""E2E tests for the sound-mode stages 8-12 lookups argument
(zkvm/sound_lookups.py): the proof carries real InstructionReadRaf /
InstructionRaVirtualization / Booleanity / BytecodeReadRaf / BytecodeRa
virtualization sumchecks (behind the reference's zero-proof placeholders,
src/zkvm/proof_converter.zig:2629-2677), the one-hot chunk claims are
PCS-bound through the batch opening, and tampering any component fails
verification.
"""

import pytest

from zolt_tpu.field.params import FR
from zolt_tpu.vm import elf as elf_mod
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
from zolt_tpu.zkvm.jolt_deserialize import deserialize_jolt_proof
from zolt_tpu.zkvm.jolt_verifier import VerifyError, verify_jolt
from zolt_tpu.zkvm.sound_lookups import (deserialize_sound_lookups,
                                         serialize_sound_lookups)

P = FR.p
LAY = MemoryLayout.create(MemoryConfig(program_size=1024))


@pytest.fixture(scope="module")
def proven(tmp_path_factory):
    from zolt_tpu.zkvm.pipeline import prove_jolt

    a = Asm()
    a.li_addr(20, LAY.stack_end)
    a.addi(1, 0, 7)
    a.sd(20, 1, 0)
    a.ld(2, 20, 0)
    a.xori(2, 2, 0x55)
    a.slli(3, 2, 3)
    a.sltu(4, 1, 2)
    a.mul(5, 2, 3)
    a.sd(20, 5, 8)
    a.addi(10, 5, 3)
    a.halt(LAY, tmp=30, one=31, provable=True)
    path = str(tmp_path_factory.mktemp("slk") / "prog.elf")
    with open(path, "wb") as f:
        f.write(elf_mod.write_minimal_elf(a.bytes()))
    res = prove_jolt(path, sound=True)
    return res, path


def test_lookups_ext_present_real_and_verifies(proven):
    res, path = proven
    proof = res.conv.proof
    assert proof.lookups_ext is not None
    slp = deserialize_sound_lookups(proof.lookups_ext)
    # real (non-zero) sumchecks in every stage
    assert any(any(c % P for c in cp) for cp in slp.s8.compressed_addr)
    assert any(any(c % P for c in cp) for cp in slp.s9.compressed_polys)
    assert any(any(c % P for c in cp) for cp in slp.s10.compressed_polys)
    assert any(any(c % P for c in cp) for cp in slp.s11.compressed_polys)
    assert any(any(c % P for c in cp) for cp in slp.s12.compressed_polys)
    # stage-9 rounds are degree 33 (32 instruction chunks + eq)
    assert len(slp.s9.compressed_polys[0]) == 33
    assert verify_jolt(proof, path)


def test_serialized_roundtrip_verifies(proven):
    res, path = proven
    data = res.conv.proof.serialize()
    proof2 = deserialize_jolt_proof(data)
    assert proof2.lookups_ext == res.conv.proof.lookups_ext
    assert verify_jolt(proof2, path)


def _retamper(proven, mutate):
    """Deserialize a fresh proof, mutate its lookups extension, reserialize."""
    res, path = proven
    proof = deserialize_jolt_proof(res.conv.proof.serialize())
    slp = deserialize_sound_lookups(proof.lookups_ext)
    mutate(slp)
    proof.lookups_ext = serialize_sound_lookups(slp)
    return proof, path


@pytest.mark.parametrize("field,stage", [
    ("w_claim", 8), ("cs_claim", 8), ("const_claim", 8), ("valid_rhs", 8),
])
def test_stage8_forged_claims_rejected(proven, field, stage):
    def mutate(slp):
        setattr(slp.s8, field, (getattr(slp.s8, field) + 1) % P)
    proof, path = _retamper(proven, mutate)
    with pytest.raises(VerifyError):
        verify_jolt(proof, path)


def test_stage9_forged_onehot_claim_rejected(proven):
    def mutate(slp):
        slp.s9.oh_claims[5] = (slp.s9.oh_claims[5] + 1) % P
    proof, path = _retamper(proven, mutate)
    with pytest.raises(VerifyError):
        verify_jolt(proof, path)


def test_stage10_forged_hamming_claim_rejected(proven):
    def mutate(slp):
        slp.s10.hw_io = (slp.s10.hw_io + 1) % P
    proof, path = _retamper(proven, mutate)
    with pytest.raises(VerifyError):
        verify_jolt(proof, path)


def test_stage10_forged_booleanity_claim_rejected(proven):
    def mutate(slp):
        slp.s10.io_oh_claims[3] = (slp.s10.io_oh_claims[3] + 1) % P
    proof, path = _retamper(proven, mutate)
    with pytest.raises(VerifyError):
        verify_jolt(proof, path)


def test_stage11_forged_wbc_claim_rejected(proven):
    def mutate(slp):
        slp.s11.wbc_claim = (slp.s11.wbc_claim + 1) % P
    proof, path = _retamper(proven, mutate)
    with pytest.raises(VerifyError):
        verify_jolt(proof, path)


def test_stage12_forged_onehot_claim_rejected(proven):
    def mutate(slp):
        slp.s12.oh_claims[0] = (slp.s12.oh_claims[0] + 1) % P
    proof, path = _retamper(proven, mutate)
    with pytest.raises(VerifyError):
        verify_jolt(proof, path)


def test_tampered_round_polys_rejected(proven):
    for attr, idx in (("s8", None), ("s11", None)):
        def mutate(slp, attr=attr):
            sc = getattr(slp, attr)
            polys = (sc.compressed_addr if attr == "s8"
                     else sc.compressed_polys)
            polys[2][0] = (polys[2][0] + 1) % P
        proof, path = _retamper(proven, mutate)
        with pytest.raises(VerifyError):
            verify_jolt(proof, path)


def test_missing_lookups_ext_rejected(proven):
    res, path = proven
    proof = deserialize_jolt_proof(res.conv.proof.serialize())
    proof.lookups_ext = None
    with pytest.raises(VerifyError, match="lookups"):
        verify_jolt(proof, path)
