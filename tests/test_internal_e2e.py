"""Differential test: reference-parity internal prover vs the reference's
golden internal proof (logs/zolt_proof_regular.bin).

The golden artifact reflects a run where the RAM trace was empty at
internal-prove time (the synthetic termination write postdates that artifact
or was not recorded on that path), so the test clears the trace to match.
Everything else — Keccak transcript, HyperKZG commitments (τ=0x12345678 SRS),
6 stages (Spartan/RAF/Lasso/ValEval/register-eq/booleanity), serialization —
is computed from scratch and must match byte-for-byte.
"""

import os

import pytest

from zolt_tpu.field.params import FR

GOLD = "/root/reference/logs/zolt_proof_regular.bin"
ELF = "/root/reference/examples/fibonacci.elf"

pytestmark = pytest.mark.skipif(not os.path.exists(GOLD), reason="golden absent")


def test_internal_proof_byte_exact():
    from zolt_tpu.vm import elf as elf_mod
    from zolt_tpu.vm import pad_with_noop, run_elf
    from zolt_tpu.zkvm.internal import prove_internal

    emu = run_elf(ELF)
    padded = pad_with_noop(list(emu.trace))
    _, image = elf_mod.load_file(ELF).flat_image()
    emu.ram.trace.clear()
    proof = prove_internal(emu, padded, bytes(image))
    gold = open(GOLD, "rb").read()
    mine = proof.serialize()
    assert len(mine) == len(gold)
    assert mine == gold


def test_internal_proof_stage_shapes():
    from zolt_tpu.vm import elf as elf_mod
    from zolt_tpu.vm import pad_with_noop, run_elf
    from zolt_tpu.zkvm.internal import prove_internal

    emu = run_elf(ELF)
    padded = pad_with_noop(list(emu.trace))
    _, image = elf_mod.load_file(ELF).flat_image()
    proof = prove_internal(emu, padded, bytes(image))  # with the real RAM trace
    rounds = [len(sp.round_polys) for sp in proof.stage_proofs]
    assert rounds == [13, 16, 24, 8, 8, 8]
    # stage 1 Spartan is identically zero for a satisfied witness
    assert all(all(c == 0 for c in p) for p in proof.stage_proofs[0].round_polys)
    # stage 3 Lasso has real content
    assert any(any(p) for p in proof.stage_proofs[2].round_polys)


def test_internal_with_kzg_batch_opening():
    """prove_internal(with_openings=True): the HyperKZG γ-RLC batch opening
    of bc/mem/reg (pcs/hyperkzg.batch_open; ref mod.zig:558-792) verifies,
    a tampered claim is rejected, and the serialized bytes are UNCHANGED
    (the extension rides outside the ZOLT v1 container)."""
    from zolt_tpu.pcs.hyperkzg import HyperKZGBatchProof
    from zolt_tpu.vm import elf as elf_mod
    from zolt_tpu.vm import pad_with_noop, run_elf
    from zolt_tpu.zkvm.internal import prove_internal, verify_internal

    emu = run_elf(ELF)
    padded = pad_with_noop(list(emu.trace))
    _, image = elf_mod.load_file(ELF).flat_image()
    emu.ram.trace.clear()
    base = prove_internal(emu, padded, bytes(image)).serialize()

    emu = run_elf(ELF)
    padded = pad_with_noop(list(emu.trace))
    emu.ram.trace.clear()
    proof = prove_internal(emu, padded, bytes(image), with_openings=True)
    assert proof.kzg_batch_opening is not None
    assert proof.serialize() == base
    assert verify_internal(proof)

    bad = HyperKZGBatchProof(
        evaluations=[(proof.kzg_batch_opening.evaluations[0] + 1) % FR.p]
        + proof.kzg_batch_opening.evaluations[1:],
        proof=proof.kzg_batch_opening.proof)
    proof.kzg_batch_opening = bad
    with pytest.raises(Exception):
        verify_internal(proof)
