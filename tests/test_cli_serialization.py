"""CLI + serialization round-trip tests."""

import os

import pytest

from zolt_tpu import serialization
from zolt_tpu.vm import MemoryConfig, Emulator
from zolt_tpu.zkvm import prove_program

FIB_ELF = "/root/reference/examples/fibonacci.elf"


def small_proof():
    """Synthetic multi-stage proof: serialization round-trips don't need a
    real prove (the provers are covered by the e2e differential tests)."""
    from zolt_tpu.zkvm.prover import MultiStageProof
    from zolt_tpu.zkvm.stages import StageProof

    proof = MultiStageProof(log_t=4, log_k=10)
    for i in range(6):
        sp = StageProof()
        sp.round_polys = [[(i * 31 + j * 7 + k) % (2**200 + 3) for k in range(3)]
                          for j in range(4)]
        sp.challenges = [(i * 1009 + j) for j in range(4)]
        sp.final_claims = [i + 1, 12345678901234567890 + i]
        proof.stage_proofs.append(sp)
    return proof


def test_native_roundtrip():
    proof = small_proof()
    data = serialization.serialize(proof)
    assert serialization.detect_format(data) == "native"
    back = serialization.deserialize(data)
    assert back.log_t == proof.log_t
    assert [sp.challenges for sp in back.stage_proofs] == [sp.challenges for sp in proof.stage_proofs]
    assert [sp.round_polys for sp in back.stage_proofs] == [sp.round_polys for sp in proof.stage_proofs]


def test_json_roundtrip():
    proof = small_proof()
    s = serialization.to_json(proof)
    assert serialization.detect_format(s.encode()) == "json"
    back = serialization.from_json(s)
    assert [sp.final_claims for sp in back.stage_proofs] == [sp.final_claims for sp in proof.stage_proofs]


@pytest.mark.skipif(not os.path.exists(FIB_ELF), reason="reference ELF not present")
def test_cli_run_and_decode(capsys):
    from zolt_tpu.__main__ import main

    assert main(["run", FIB_ELF]) == 0
    out = capsys.readouterr().out
    assert "a0 (x10): 55" in out

    assert main(["decode", "0x02a00093"]) == 0
    out = capsys.readouterr().out
    assert "OP_IMM" in out and "rd=x1" in out


@pytest.mark.skipif(not os.path.exists(FIB_ELF), reason="reference ELF not present")
def test_cli_prove_verify_stats(tmp_path, capsys):
    from zolt_tpu.__main__ import main

    proof_path = str(tmp_path / "p.bin")
    assert main(["prove", FIB_ELF, "-o", proof_path, "--log-k", "10"]) == 0
    capsys.readouterr()
    assert main(["verify", proof_path]) == 0
    out = capsys.readouterr().out
    assert "PASSED" in out
    assert main(["stats", proof_path]) == 0
    out = capsys.readouterr().out
    assert "stage6 booleanity" in out


def test_gzip_roundtrip():
    proof = small_proof()
    data = serialization.serialize_gzip(proof)
    assert serialization.detect_format(data) == "gzip"
    back = serialization.load_auto(data)
    assert [sp.challenges for sp in back.stage_proofs] == \
        [sp.challenges for sp in proof.stage_proofs]
    # plain containers also load through the autodetect reader
    assert serialization.load_auto(serialization.serialize(proof)).log_t == proof.log_t
    assert serialization.load_auto(serialization.to_json(proof).encode()).log_t == proof.log_t


@pytest.mark.skipif(not os.path.exists(FIB_ELF), reason="reference ELF not present")
def test_cli_gzip_prove_verify(tmp_path, capsys):
    from zolt_tpu.__main__ import main

    proof_path = str(tmp_path / "p.bin.gz")
    assert main(["prove", FIB_ELF, "-o", proof_path, "--gzip"]) == 0
    capsys.readouterr()
    data = open(proof_path, "rb").read()
    assert data[:2] == b"\x1f\x8b"
    assert main(["verify", proof_path]) == 0
    assert "PASSED" in capsys.readouterr().out
    assert main(["stats", proof_path]) == 0


def test_jolt_device_file_roundtrip():
    from zolt_tpu.vm.layout import JoltDevice, MemoryConfig, MemoryLayout

    lay = MemoryLayout.create(MemoryConfig(program_size=4096))
    dev = JoltDevice(layout=lay, inputs=bytearray(b"hi"),
                     outputs=bytearray(b"\x07\x00\x09"), panic=True)
    back = JoltDevice.deserialize(dev.serialize())
    assert bytes(back.inputs) == b"hi"
    assert bytes(back.outputs) == b"\x07\x00\x09"
    assert back.panic is True
    assert back.layout == lay
