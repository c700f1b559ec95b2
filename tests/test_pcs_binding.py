"""Sound-mode PCS binding: the batch opening (pcs/batch.py) must tie every
committed-polynomial opening claim to the absorbed Dory GT commitments.

Covers the round-1 advisor's high-severity finding: previously the claim
map was prover-trusted; now a forged committed-poly evaluation, a forged
commitment, or a stripped batch opening must each be rejected.
"""

import pytest

from zolt_tpu.vm import elf as elf_mod
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
from zolt_tpu.zkvm.jolt_deserialize import deserialize_jolt_proof
from zolt_tpu.zkvm.jolt_types import (CommittedPolynomial as CP, OpeningId,
                                      SumcheckId)
from zolt_tpu.zkvm.jolt_verifier import VerifyError, verify_jolt
from zolt_tpu.zkvm.pipeline import prove_jolt

LAY = MemoryLayout.create(MemoryConfig(program_size=1024))


@pytest.fixture(scope="module")
def proven(tmp_path_factory):
    a = Asm()
    a.li_addr(20, LAY.stack_end)
    a.addi(1, 0, 7)
    a.sd(20, 1, 0)
    a.ld(2, 20, 0)
    a.addi(10, 2, 3)
    a.halt(LAY, tmp=30, one=31, provable=True)
    path = str(tmp_path_factory.mktemp("pcs") / "prog.elf")
    with open(path, "wb") as f:
        f.write(elf_mod.write_minimal_elf(a.bytes()))
    res = prove_jolt(path, sound=True)
    return res, path


def test_sound_proof_verifies(proven):
    res, path = proven
    assert res.conv.proof.batch_opening is not None
    assert verify_jolt(res.conv.proof, path)


def test_file_roundtrip_preserves_binding(proven):
    res, path = proven
    blob = res.conv.proof.serialize()
    proof2 = deserialize_jolt_proof(blob)
    assert proof2.batch_opening == res.conv.proof.batch_opening
    assert verify_jolt(proof2, path)


def test_forged_committed_claim_rejected(proven):
    res, path = proven
    blob = res.conv.proof.serialize()
    proof2 = deserialize_jolt_proof(blob)
    oid = OpeningId.committed(CP(CP.RAM_INC), SumcheckId.RamReadWriteChecking)
    v = proof2.opening_claims.get(oid)
    assert v is not None
    proof2.opening_claims.insert(oid, (v + 1) % (2**251))
    with pytest.raises(VerifyError):
        verify_jolt(proof2, path)


def test_forged_commitment_rejected(proven):
    res, path = proven
    blob = res.conv.proof.serialize()
    proof2 = deserialize_jolt_proof(blob)
    # flip the RamInc GT commitment (index 1) to another valid GT element
    proof2.commitments[1] = proof2.commitments[0]
    with pytest.raises(VerifyError):
        verify_jolt(proof2, path)


def test_stripped_batch_opening_rejected(proven):
    res, path = proven
    blob = res.conv.proof.serialize()
    proof2 = deserialize_jolt_proof(blob)
    proof2.batch_opening = None
    with pytest.raises(VerifyError):
        verify_jolt(proof2, path)
