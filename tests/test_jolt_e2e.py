"""End-to-end differential test: full Jolt-format pipeline vs the reference's
golden proof file (logs/zolt_proof_dory.bin) and run log.

The golden run loaded Jolt's URS from a local file that is not part of the
repo, so the 37 GT commitments cannot be recomputed; we inject them from the
golden proof (they are public values) and verify that EVERYTHING derived from
them — τ, all 7 stages, all 91 opening claims, the serialized container —
matches byte-for-byte.
"""

import os
import re

import pytest

from zolt_tpu.field.params import FR

GOLD = "/root/reference/logs/zolt_proof_dory.bin"
LOG = "/root/reference/logs/zolt.log"
ELF = "/root/reference/examples/fibonacci.elf"
P = FR.p
INV_2_128 = pow(1 << 128, -1, P)

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GOLD) and os.path.exists(LOG)), reason="golden artifacts absent")


def _load():
    from zolt_tpu.zkvm.jolt_deserialize import deserialize_jolt_proof

    data = open(GOLD, "rb").read()
    return data, deserialize_jolt_proof(data, variant="with_dory")


def test_golden_proof_roundtrip():
    data, golden = _load()
    assert len(golden.opening_claims) == 91
    assert len(golden.commitments) == 37
    assert golden.serialize_with_dory() == data


def test_pipeline_tau_matches_log():
    _, golden = _load()
    from zolt_tpu.zkvm.pipeline import prove_jolt

    res = prove_jolt(ELF, golden_commitments=golden.commitments, stages=1)
    text = open(LOG, errors="ignore").read()
    sec = text[text.index("Deriving tau"):]
    want = [int(m, 16) * INV_2_128 % P
            for m in re.findall(r"masked_value=0x([0-9a-f]+)", sec)[:10]]
    assert res.tau == want, "tau mismatch: preamble or GT absorption differs"


def test_full_proof_file_byte_exact():
    """Whole-file reproduction: the ONLY grafted bytes are the 37 GT
    commitments (computed by the reference with Jolt's URS file, which is not
    in the repo). Everything else — τ, stages 1-7, claims, the joint Dory
    opening proof (deterministic SRS + arkworks pairing), configs — is
    computed from scratch and must match byte-for-byte."""
    data, golden = _load()
    from zolt_tpu.zkvm.pipeline import prove_jolt

    res = prove_jolt(ELF, golden_commitments=golden.commitments,
                     with_joint_proof=True)
    mine = res.conv.proof
    assert mine.opening_claims.serialize() == golden.opening_claims.serialize()
    for name in ("stage1_sumcheck", "stage2_sumcheck", "stage3_sumcheck",
                 "stage4_sumcheck", "stage5_sumcheck", "stage6_sumcheck",
                 "stage7_sumcheck"):
        assert getattr(mine, name).compressed_polys == \
            getattr(golden, name).compressed_polys, f"{name} differs"
    assert mine.stage1_uni_skip.uni_poly == golden.stage1_uni_skip.uni_poly
    assert mine.stage2_uni_skip.uni_poly == golden.stage2_uni_skip.uni_poly
    assert mine.joint_opening_proof == golden.joint_opening_proof, \
        "joint Dory opening proof differs"
    assert mine.serialize_with_dory() == data


# ---------------------------------------------------------------------------
# Jolt-format verifier (beyond the reference: it has no in-repo verifier for
# this format and relies on the external Rust Jolt verifier)
# ---------------------------------------------------------------------------

def test_golden_proof_verifies():
    _, proof = _load()
    from zolt_tpu.zkvm.jolt_verifier import verify_jolt

    assert verify_jolt(proof, ELF, allow_reference_compat=True)


def test_verifier_rejects_tampered_round_poly():
    _, proof = _load()
    from zolt_tpu.zkvm.jolt_verifier import VerifyError, verify_jolt

    proof.stage1_sumcheck.compressed_polys[3][0] += 1
    with pytest.raises(VerifyError):
        verify_jolt(proof, ELF)


def test_verifier_rejects_tampered_opening_claim():
    _, proof = _load()
    from zolt_tpu.zkvm.jolt_types import OpeningId, SumcheckId, VirtualPolynomial
    from zolt_tpu.zkvm.jolt_verifier import VerifyError, verify_jolt

    oid = OpeningId.virtual(VirtualPolynomial.named("RamAddress"), SumcheckId.SpartanOuter)
    proof.opening_claims.insert(oid, proof.opening_claims.get(oid) + 1)
    with pytest.raises(VerifyError):
        verify_jolt(proof, ELF)


def test_verifier_rejects_unsatisfied_r1cs():
    _, proof = _load()
    from zolt_tpu.zkvm.jolt_verifier import VerifyError, verify_jolt

    proof.stage1_uni_skip.uni_poly[5] += 1
    with pytest.raises(VerifyError, match="vanish"):
        verify_jolt(proof, ELF)


def test_verifier_rejects_wrong_io_claim():
    """Claiming different public outputs desyncs the preamble -> challenges."""
    _, proof = _load()
    from zolt_tpu.zkvm.jolt_verifier import VerifyError, verify_jolt

    with pytest.raises(VerifyError):
        verify_jolt(proof, ELF, outputs=b"\x01")


# ---------------------------------------------------------------------------
# Generality: a non-fibonacci, Asm-authored program at a different trace
# size (T=1024) through the complete prove -> verify pipeline
# ---------------------------------------------------------------------------

def _collatz_elf_bytes():
    from zolt_tpu.vm import elf as elf_mod
    from zolt_tpu.vm.guest import Asm

    a = Asm()
    a.addi(1, 0, 27)
    a.addi(2, 0, 0)
    a.label("loop")
    a.addi(4, 0, 1)
    a.beq(1, 4, "end")
    a.andi(3, 1, 1)
    a.bne(3, 0, "odd")
    a.srli(1, 1, 1)
    a.jal(0, "cont")
    a.label("odd")
    a.add(5, 1, 1)
    a.add(1, 5, 1)
    a.addi(1, 1, 1)
    a.label("cont")
    a.addi(2, 2, 1)
    a.jal(0, "loop")
    a.label("end")
    a.halt(provable=True)
    return elf_mod.write_minimal_elf(a.bytes())


def test_minimal_elf_writer_roundtrip():
    from zolt_tpu.vm import elf as elf_mod, run_elf

    blob = _collatz_elf_bytes()
    parsed = elf_mod.parse(blob)
    base, img = parsed.flat_image()
    assert base == 0x80000000 and parsed.entry == base
    emu = run_elf(blob)
    assert emu.registers.registers[2] == 111


def test_prove_verify_asm_program_t1024(tmp_path):
    import time

    from zolt_tpu.zkvm.jolt_verifier import VerifyError, verify_jolt
    from zolt_tpu.zkvm.pipeline import prove_jolt

    path = str(tmp_path / "collatz.elf")
    with open(path, "wb") as f:
        f.write(_collatz_elf_bytes())
    res = prove_jolt(path)
    assert len(res.padded_steps) == 1024  # different size than fibonacci's 256
    proof = res.conv.proof
    assert verify_jolt(proof, path, allow_reference_compat=True)
    proof.stage1_sumcheck.compressed_polys[0][0] += 1
    with pytest.raises(VerifyError):
        verify_jolt(proof, path)


def _provable_collatz_elf():
    from zolt_tpu.vm import elf as elf_mod
    from zolt_tpu.vm.guest import Asm
    from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout

    lay = MemoryLayout.create(MemoryConfig(program_size=1024))
    a = Asm()
    a.addi(1, 0, 27)
    a.addi(2, 0, 0)
    a.label("loop")
    a.addi(4, 0, 1)
    a.beq(1, 4, "end")
    a.andi(3, 1, 1)
    a.bne(3, 0, "odd")
    a.srli(1, 1, 1)
    a.jal(0, "cont")
    a.label("odd")
    a.add(5, 1, 1)
    a.add(1, 5, 1)
    a.addi(1, 1, 1)
    a.label("cont")
    a.addi(2, 2, 1)
    a.jal(0, "loop")
    a.label("end")
    a.halt(lay, provable=True)  # guest writes the termination word itself
    return elf_mod.write_minimal_elf(a.bytes())


def test_sound_mode_raf_publicly_checkable(tmp_path):
    """Sound mode (witness-derived accesses, BE-by-cycle RAF, rv(store)=pre):
    the RAF instance's final claim equals ra_claim * unmap(r) from public
    data alone, and the RWC input claim equals its true sum — the two
    properties the reference's byte-compat construction lacks."""
    from zolt_tpu.field.params import FR
    from zolt_tpu.r1cs import inputs as ri
    from zolt_tpu.zkvm.jolt_verifier import verify_jolt
    from zolt_tpu.zkvm.pipeline import prove_jolt
    from zolt_tpu.zkvm.proof_converter import _witness_accesses
    from zolt_tpu.zkvm.stage2_batch import _eq_be

    P = FR.p
    path = str(tmp_path / "collatz_sound.elf")
    with open(path, "wb") as f:
        f.write(_provable_collatz_elf())
    res = prove_jolt(path, sound=True)
    b = res.conv.stage2_batch
    n_cycle = len(res.tau) - 2
    log_k = 16
    ch = b.challenges
    lowest = res.emulator.device.layout.lowest_address()

    # RAF final == ra_claim * unmap(r)
    addr_eval = lowest % P
    power = 8
    for r in ch[(log_k + n_cycle) - log_k:]:
        addr_eval = (addr_eval + r * power) % P
        power *= 2
    assert b.raf_final_claim * addr_eval % P == b.instance_final_claims[1]

    # RWC input claim == true sum over witness accesses
    r_spartan = list(reversed(res.conv.stage1.challenges[1:]))
    g = b.gamma_rwc
    cur = {}
    for addr, val in res.emulator.initial_memory.items():
        if addr >= lowest:
            cur[(addr - lowest) // 8] = val
    true_sum = 0
    for acc in _witness_accesses(res.padded_steps):
        k = (acc.address - lowest) // 8
        eq = _eq_be(r_spartan, acc.timestamp, n_cycle)
        prev = cur.get(k, 0)
        if acc.op == "write":
            rv, wv = prev, acc.post_value
            cur[k] = acc.post_value
        else:
            rv = wv = acc.post_value
        true_sum = (true_sum + eq * ((rv + g * wv) % P)) % P
    rv_c = res.conv.input_evals[ri.Inp.RamReadValue]
    wv_c = res.conv.input_evals[ri.Inp.RamWriteValue]
    assert (rv_c + g * wv_c) % P == true_sum

    # the sound proof still verifies through the standard verifier
    assert verify_jolt(res.conv.proof, path)


def test_sound_proof_verifies_strictly(tmp_path):
    """Sound proofs serialize the true RAF claim (no stage-5 clobber), so the
    verifier replays the transcript end-to-end and enforces the full stage-3
    batched output check — the reference-compat schedule cannot (its stage-5
    zero schedule overwrites the absorbed RAF claim with 0, which is why the
    golden proof only verifies with the documented compat downgrade)."""
    from zolt_tpu.zkvm.jolt_types import OpeningId, SumcheckId, VirtualPolynomial
    from zolt_tpu.zkvm.jolt_verifier import VerifyError, verify_jolt
    from zolt_tpu.zkvm.pipeline import prove_jolt

    path = str(tmp_path / "collatz_sound2.elf")
    with open(path, "wb") as f:
        f.write(_provable_collatz_elf())
    res = prove_jolt(path, sound=True)
    assert verify_jolt(res.conv.proof, path, allow_reference_compat=False)
    oid = OpeningId.virtual(VirtualPolynomial.named("Rs1Value"),
                            SumcheckId.RegistersClaimReduction)
    res.conv.proof.opening_claims.insert(
        oid, res.conv.proof.opening_claims.get(oid) + 1)
    with pytest.raises(VerifyError):
        verify_jolt(res.conv.proof, path, allow_reference_compat=False)


def test_golden_requires_compat_downgrade():
    """The reference's own serialization breaks full transcript replay
    (RamRa@RamRafEvaluation clobbered to 0 by the stage-5 zero schedule):
    strict verification fails on the golden proof, compat mode accepts it."""
    from zolt_tpu.zkvm.jolt_verifier import VerifyError, verify_jolt

    _, proof = _load()
    assert verify_jolt(proof, ELF, allow_reference_compat=True)  # explicit opt-in
    _, proof2 = _load()
    with pytest.raises(VerifyError):
        verify_jolt(proof2, ELF, allow_reference_compat=False)


def _array_sum_elf(n: int) -> bytes:
    """RAM-heavy guest: arr[i] = i writes then a read-back sum (exercises the
    RWC/RAF/ValEval paths the register-only golden loops barely touch)."""
    from zolt_tpu.vm import elf as elf_mod
    from zolt_tpu.vm.guest import Asm
    from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout

    lay = MemoryLayout.create(MemoryConfig(program_size=8192))
    a = Asm()
    a.li_addr(5, 0x80002000)
    a.addi(1, 0, 0)
    a.addi(2, 0, n)
    a.label("w")
    a.slli(3, 1, 3)
    a.add(3, 3, 5)
    a.sd(3, 1, 0)
    a.addi(1, 1, 1)
    a.blt(1, 2, "w")
    a.addi(1, 0, 0)
    a.addi(10, 0, 0)
    a.label("r")
    a.slli(3, 1, 3)
    a.add(3, 3, 5)
    a.ld(4, 3, 0)
    a.add(10, 10, 4)
    a.addi(1, 1, 1)
    a.blt(1, 2, "r")
    a.halt(lay, provable=True)
    return elf_mod.write_minimal_elf(a.bytes())


def test_ram_heavy_sound_roundtrip(tmp_path):
    """A guest with dense RAM writes+reads proves and verifies in sound mode
    (regression: the committed RamInc and the stage inc tables must agree on
    every write — they silently diverged for out-of-window addresses)."""
    from zolt_tpu.zkvm.jolt_verifier import verify_jolt
    from zolt_tpu.zkvm.pipeline import prove_jolt

    path = str(tmp_path / "arr.elf")
    with open(path, "wb") as f:
        f.write(_array_sum_elf(40))
    res = prove_jolt(path, sound=True)
    assert verify_jolt(res.conv.proof, path)


def test_out_of_window_access_faults():
    """Sign-extended lui-materialized RAM pointers land outside the provable
    window and must fault at trace time instead of producing a proof that is
    inconsistent with the committed polynomials."""
    from zolt_tpu.vm import elf as elf_mod, run_elf
    from zolt_tpu.vm.emulator import MemoryFault
    from zolt_tpu.vm.guest import Asm
    from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout

    lay = MemoryLayout.create(MemoryConfig(program_size=4096))
    a = Asm()
    a.lui(5, 0x80002)     # sign-extends: 0xFFFFFFFF80002000
    a.sd(5, 5, 0)
    a.halt(lay, provable=True)
    with pytest.raises(MemoryFault):
        run_elf(elf_mod.write_minimal_elf(a.bytes()))
