"""Jolt proof type model tests: enum encodings, BTreeMap ordering, container
serialization layout."""

from zolt_tpu.zkvm.jolt_types import (
    COMMITTED_BASE, VIRTUAL_BASE, CommittedPolynomial, JoltProof, OpeningClaims,
    OpeningId, SumcheckId, SumcheckInstanceProof, UniSkipFirstRoundProof,
    VirtualPolynomial, serialize_compressed_unipoly,
)


def test_sumcheck_id_values():
    assert int(SumcheckId.SpartanOuter) == 0
    assert int(SumcheckId.RamReadWriteChecking) == 7
    assert int(SumcheckId.HammingWeightClaimReduction) == 21


def test_committed_poly_serialize():
    assert CommittedPolynomial(CommittedPolynomial.RD_INC).serialize() == b"\x00"
    assert CommittedPolynomial(CommittedPolynomial.INSTRUCTION_RA, 5).serialize() == b"\x02\x05"
    assert CommittedPolynomial(CommittedPolynomial.RAM_RA, 0).serialize() == b"\x04\x00"


def test_virtual_poly_serialize():
    assert VirtualPolynomial.named("PC").serialize() == b"\x00"
    assert VirtualPolynomial.named("UnivariateSkip").serialize() == b"\x25"
    assert VirtualPolynomial.named("OpFlags", 3).serialize() == b"\x26\x03"
    assert VirtualPolynomial.named("LookupTableFlag", 7).serialize() == b"\x28\x07"


def test_opening_id_serialize_bases():
    oid = OpeningId.committed(CommittedPolynomial(CommittedPolynomial.RD_INC),
                              SumcheckId.SpartanOuter)
    assert oid.serialize()[0] == COMMITTED_BASE
    ov = OpeningId.virtual(VirtualPolynomial.named("PC"), SumcheckId.SpartanShift)
    assert ov.serialize()[0] == VIRTUAL_BASE + 2


def test_opening_claims_btreemap_order():
    claims = OpeningClaims()
    a = OpeningId.virtual(VirtualPolynomial.named("Imm"), SumcheckId.SpartanOuter)
    b = OpeningId.virtual(VirtualPolynomial.named("PC"), SumcheckId.SpartanShift)
    c = OpeningId.committed(CommittedPolynomial(CommittedPolynomial.RAM_INC),
                            SumcheckId.RamRafEvaluation)
    claims.insert(a, 111)
    claims.insert(b, 222)
    claims.insert(c, 333)
    order = [oid for oid, _ in claims.sorted_entries()]
    # Committed (variant 0) sorts before Virtual (variant 1); PC (tag 0) before Imm (17)
    assert order == [c, b, a]


def test_compressed_unipoly_layout():
    data = serialize_compressed_unipoly([1, 2, 3])
    assert len(data) == 8 + 3 * 32
    assert data[:8] == (3).to_bytes(8, "little")
    assert data[8:40] == (1).to_bytes(32, "little")


def test_jolt_proof_container_roundtrip_shape():
    proof = JoltProof()
    proof.stage1_uni_skip = UniSkipFirstRoundProof(uni_poly=[1] * 28)
    proof.stage1_sumcheck = SumcheckInstanceProof(compressed_polys=[[1, 2, 3]] * 4)
    proof.commitments = [b"\x00" * 384] * 2
    proof.trace_length = 256
    proof.ram_k = 65536
    proof.bytecode_k = 65536
    data = proof.serialize()
    # deterministic layout: claims(8) + commitments(8+2*384) + uniskip(8+28*32) + ...
    assert data[:8] == (0).to_bytes(8, "little")
    assert len(data) > 8 + 8 + 2 * 384 + 8 + 28 * 32
    # config tail: ..., one_hot (4, 16), dory_layout 0
    assert data[-3:] == bytes([4, 16, 0])
