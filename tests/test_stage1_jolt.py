"""Differential test: Jolt-path Stage 1 vs the reference's checked-in run log.

The reference log (/root/reference/logs/zolt.log) records, for fibonacci.elf:
the full transcript state before the last τ squeeze, all τ masked values, r0,
and every stage-1 round challenge. Because the Blake2b transcript chains all
absorbed bytes, a matching r0 proves all 28 UniSkip coefficients byte-exact,
and each matching round challenge proves that round's compressed poly
byte-exact (SURVEY §4's differential method, applied without running Zig).
"""

import hashlib
import os
import re

import pytest

from zolt_tpu.field.params import FR
from zolt_tpu.transcript import Blake2bTranscript
from zolt_tpu.vm import run_elf, pad_with_noop

LOG = "/root/reference/logs/zolt.log"
P = FR.p
INV_2_128 = pow(1 << 128, -1, P)

pytestmark = pytest.mark.skipif(not os.path.exists(LOG), reason="reference log absent")


def parse_log():
    text = open(LOG, errors="ignore").read()

    # tau derivation section
    sec = text[text.index("Deriving tau"):]
    taus = []
    states = []
    rounds = []
    for m in re.finditer(
        r"challengeScalar128Bits: round=(\d+)\n\[ZOLT TRANSCRIPT\]   state_before=\{ ([0-9a-f ]+)\}.*?masked_value=0x([0-9a-f]+)",
        sec, re.S):
        rounds.append(int(m.group(1)))
        states.append(bytes(int(b, 16) for b in m.group(2).split()))
        taus.append(int(m.group(3), 16))
        if len(taus) == 10:
            break

    # r0 canonical bytes (BE)
    m = re.search(r"computeLagrangeEvalsAtR0: r0 = \{ ([0-9, ]+)\}", text)
    r0_be = bytes(int(b) for b in m.group(1).split(", "))

    # stage1 round coefficients + challenges (LE bytes)
    def grab(tag):
        out = []
        for m in re.finditer(rf"STAGE1_ROUND_(\d+): {tag} = \{{ ([0-9, ]+)\}}", text):
            out.append(bytes(int(b) for b in m.group(2).split(", ")))
        return out

    return {
        "tau_masked": taus,
        "tau_rounds": rounds,
        "tau_states": states,
        "r0_be": r0_be,
        "c0": grab("c0"),
        "c2": grab("c2"),
        "c3": grab("c3"),
        "challenge": grab("challenge"),
    }


def reconstruct_transcript(data) -> Blake2bTranscript:
    """State after the final τ squeeze = blake2b(state_before ‖ 28·0 ‖ round_be)."""
    t = Blake2bTranscript(b"Jolt")
    last_state = data["tau_states"][-1]
    last_round = data["tau_rounds"][-1]
    h = hashlib.blake2b(digest_size=32)
    h.update(last_state)
    h.update(b"\x00" * 28 + last_round.to_bytes(4, "big"))
    t.state = h.digest()
    t.n_rounds = last_round + 1
    return t


def test_stage1_bit_exact_vs_reference_log():
    data = parse_log()
    assert len(data["tau_masked"]) == 10
    assert len(data["challenge"]) == 9, f"expected 9 rounds, got {len(data['challenge'])}"

    tau = [m * INV_2_128 % P for m in data["tau_masked"]]
    transcript = reconstruct_transcript(data)

    emu = run_elf("/root/reference/examples/fibonacci.elf")
    padded = pad_with_noop(list(emu.trace))
    assert len(padded) == 256

    from zolt_tpu.zkvm.streaming_outer import prove_stage1_jolt

    proof = prove_stage1_jolt(padded, tau, transcript)

    # r0 must match -> proves all 28 UniSkip coefficients were byte-exact
    expect_r0 = int.from_bytes(data["r0_be"], "big")
    assert proof.r0 == expect_r0, (
        f"r0 mismatch: got {proof.r0:#x} want {expect_r0:#x} — UniSkip poly differs")

    # every round: compressed coeffs and the resulting challenge must match
    for i in range(9):
        got_c0, got_c2, got_c3 = proof.compressed_polys[i]
        assert got_c0 == int.from_bytes(data["c0"][i], "little"), f"round {i} c0"
        assert got_c2 == int.from_bytes(data["c2"][i], "little"), f"round {i} c2"
        assert got_c3 == int.from_bytes(data["c3"][i], "little"), f"round {i} c3"
        assert proof.challenges[i] == int.from_bytes(data["challenge"][i], "little"), (
            f"round {i} challenge")


def test_stage2_uniskip_bit_exact_vs_reference_log():
    data = parse_log()
    tau = [m * INV_2_128 % P for m in data["tau_masked"]]
    transcript = reconstruct_transcript(data)

    emu = run_elf("/root/reference/examples/fibonacci.elf")
    padded = pad_with_noop(list(emu.trace))

    from zolt_tpu.zkvm.proof_converter import convert_with_transcript

    conv = convert_with_transcript(padded, tau, transcript)
    text = open(LOG, errors="ignore").read()

    def be(tag, idx=None):
        pat = rf"STAGE2: {tag}" + (rf"\[{idx}\]" if idx is not None else "") + r" = \{ ([0-9, ]+)\}"
        m = re.search(pat, text)
        return int.from_bytes(bytes(int(b) for b in m.group(1).split(", ")), "big")

    s2 = conv.stage2_uniskip
    assert s2.tau_high == be("sampled tau_high"), "tau_high mismatch"
    for i in range(5):
        assert s2.base_evals[i] == be("base_evals", i), f"base_evals[{i}]"
    for i in range(4):
        m = re.search(rf"STAGE2_UNISKIP: extended_evals\[{i}\] = \{{ ([0-9, ]+)\}}", text)
        want = int.from_bytes(bytes(int(b) for b in m.group(1).split(", ")), "big")
        assert s2.extended_evals[i] == want, f"extended_evals[{i}]"
    for i in range(13):
        m = re.search(rf"STAGE2_UNISKIP: coeffs\[{i}\] = \{{ ([0-9, ]+)\}}", text)
        want = int.from_bytes(bytes(int(b) for b in m.group(1).split(", ")), "little")
        assert s2.coeffs[i] == want, f"coeffs[{i}]"
    assert s2.r0 == be("r0"), "stage2 r0 mismatch"
    assert s2.uni_skip_claim == be("uni_skip_claim"), "stage2 uni_skip_claim mismatch"


def test_stage2_batch_bit_exact_vs_reference_log():
    data = parse_log()
    tau = [m * INV_2_128 % P for m in data["tau_masked"]]
    transcript = reconstruct_transcript(data)

    emu = run_elf("/root/reference/examples/fibonacci.elf")
    padded = pad_with_noop(list(emu.trace))

    from zolt_tpu.zkvm.proof_converter import convert_with_transcript

    conv = convert_with_transcript(padded, tau, transcript, emulator=emu)
    text = open(LOG, errors="ignore").read()

    # gammas
    def be_line(pat):
        m = re.search(pat + r" = \{ ([0-9, ]+)\}", text)
        return int.from_bytes(bytes(int(b) for b in m.group(1).split(", ")), "big")

    b = conv.stage2_batch
    assert b is not None
    assert b.gamma_rwc == be_line(r"STAGE2_BATCHED: gamma_rwc"), "gamma_rwc"
    assert b.gamma_instr == be_line(r"STAGE2_BATCHED: gamma_instr"), "gamma_instr"
    assert b.batching_coeffs[0] == be_line(r"STAGE2_BATCHED: batching_coeff\[0\]"), "alpha0"

    # all 24 rounds: c0/c2/c3 + challenge (LE bytes, trailing comma in log)
    def grab2(tag):
        out = []
        for m in re.finditer(rf"STAGE2_ROUND_(\d+): {tag} = \{{ ([0-9, ]+),? \}}", text):
            out.append((int(m.group(1)),
                        bytes(int(x.rstrip(",")) for x in m.group(2).split() if x.rstrip(","))))
        return dict(out)

    c0s, c2s, c3s, chals = grab2("c0"), grab2("c2"), grab2("c3"), grab2("challenge")
    assert len(chals) == 24, f"expected 24 stage2 rounds in log, got {len(chals)}"
    for i in range(24):
        got = b.compressed_polys[i]
        assert got[0] == int.from_bytes(c0s[i], "little") % P, f"stage2 round {i} c0"
        assert got[1] == int.from_bytes(c2s[i], "little") % P, f"stage2 round {i} c2"
        assert got[2] == int.from_bytes(c3s[i], "little") % P, f"stage2 round {i} c3"
        assert b.challenges[i] == int.from_bytes(chals[i], "little") % P, f"stage2 round {i} challenge"


def test_stage2_cache_openings_transcript_state():
    data = parse_log()
    tau = [m * INV_2_128 % P for m in data["tau_masked"]]
    transcript = reconstruct_transcript(data)
    emu = run_elf("/root/reference/examples/fibonacci.elf")
    padded = pad_with_noop(list(emu.trace))
    from zolt_tpu.zkvm.proof_converter import convert_with_transcript

    convert_with_transcript(padded, tau, transcript, emulator=emu, stages=2)
    text = open(LOG, errors="ignore").read()
    m = re.search(r"Stage 2 transcript state after cache_openings = \{ ([0-9, ]+)", text)
    want = bytes(int(x) for x in m.group(1).replace(",", " ").split())
    assert transcript.state[: len(want)] == want, (
        f"transcript state after stage2 cache_openings mismatch: "
        f"{transcript.state[:8].hex()} vs {want.hex()}")


def test_stage3_bit_exact_vs_reference_log():
    data = parse_log()
    tau = [m * INV_2_128 % P for m in data["tau_masked"]]
    transcript = reconstruct_transcript(data)
    emu = run_elf("/root/reference/examples/fibonacci.elf")
    padded = pad_with_noop(list(emu.trace))
    from zolt_tpu.zkvm.proof_converter import convert_with_transcript

    conv = convert_with_transcript(padded, tau, transcript, emulator=emu)
    text = open(LOG, errors="ignore").read()

    s3 = conv.stage3
    assert s3 is not None

    def grab3(tag):
        out = {}
        for m in re.finditer(rf"STAGE3_ROUND_(\d+): {tag} = \{{ \{{ ([0-9, ]+) \}}", text):
            out[int(m.group(1))] = bytes(int(x.rstrip(",")) for x in m.group(2).split() if x.rstrip(","))
        return out

    # input claims from log
    def le_line(tag):
        m = re.search(rf"{tag} = \{{ \{{ ([0-9, ]+) \}}", text)
        return int.from_bytes(bytes(int(x.rstrip(",")) for x in m.group(1).split() if x.rstrip(",")), "little")

    assert s3.input_claims[0] == le_line(r"STAGE3_PRE: input_claim\[0\] \(Shift\)"), "shift input"
    assert s3.input_claims[1] == le_line(r"STAGE3_PRE: input_claim\[1\] \(InstrInput\)"), "instr input"
    assert s3.batching_coeffs[0] == le_line(r"STAGE3_PRE: batching_coeff\[0\]"), "stage3 alpha0"

    c0s, c2s, c3s, chals = grab3("c0"), grab3("c2"), grab3("c3"), grab3("challenge")
    assert len(chals) == 8, f"expected 8 stage3 rounds, got {len(chals)}"
    for i in range(8):
        got = s3.compressed_polys[i]
        assert got[0] == int.from_bytes(c0s[i], "little") % P, f"stage3 round {i} c0"
        assert got[1] == int.from_bytes(c2s[i], "little") % P, f"stage3 round {i} c2"
        assert got[2] == int.from_bytes(c3s[i], "little") % P, f"stage3 round {i} c3"
        assert s3.challenges[i] == int.from_bytes(chals[i], "little") % P, f"stage3 round {i} challenge"


def test_stage4_bit_exact_vs_reference_log():
    data = parse_log()
    tau = [m * INV_2_128 % P for m in data["tau_masked"]]
    transcript = reconstruct_transcript(data)
    emu = run_elf("/root/reference/examples/fibonacci.elf")
    padded = pad_with_noop(list(emu.trace))
    from zolt_tpu.zkvm.proof_converter import convert_with_transcript

    conv = convert_with_transcript(padded, tau, transcript, emulator=emu)
    text = open(LOG, errors="ignore").read()
    s4 = conv.stage4
    assert s4 is not None

    def be_line(pat):
        m = re.search(pat + r"\s*=\s*\{ ([0-9, ]+)\}", text)
        return int.from_bytes(
            bytes(int(x.rstrip(",")) for x in m.group(1).split() if x.rstrip(",")), "big")

    def le_line(pat):
        m = re.search(pat + r"\s*=\s*\{ ([0-9, ]+)\}", text)
        return int.from_bytes(
            bytes(int(x.rstrip(",")) for x in m.group(1).split() if x.rstrip(",")), "little")

    assert s4.gamma == be_line(r"\[STAGE4\] gamma_full_BE"), "stage4 gamma"
    assert s4.input_claims[0] == be_line(r"\[ZOLT STAGE4\] input_claim_registers_BE"), "regs input claim"
    assert s4.input_claims[1] == be_line(r"\[ZOLT STAGE4\] input_claim_val_eval_BE"), "val_eval input claim"
    assert s4.input_claims[2] == be_line(r"\[ZOLT STAGE4\] input_claim_val_final_BE"), "val_final input claim"
    assert s4.batching_coeffs[0] == be_line(r"\[ZOLT STAGE4\] batching_coeff\[0\]_BE"), "alpha0"
    assert s4.batching_coeffs[1] == be_line(r"\[ZOLT STAGE4\] batching_coeff\[1\]_BE"), "alpha1"
    assert s4.batching_coeffs[2] == be_line(r"\[ZOLT STAGE4\] batching_coeff\[2\]_BE"), "alpha2"

    # all 15 round challenges (transcript acts as running checksum over the
    # absorbed compressed round polys)
    chals = {}
    for m in re.finditer(
            r"\[ZOLT STAGE4\] Round (\d+): challenge \(LE\) = \{ ([0-9, ]+)\}", text):
        chals[int(m.group(1))] = int.from_bytes(
            bytes(int(x.rstrip(",")) for x in m.group(2).split() if x.rstrip(",")), "little")
    assert len(chals) == 15, f"expected 15 stage4 rounds in log, got {len(chals)}"
    for i in range(15):
        assert s4.challenges[i] == chals[i] % P, f"stage4 round {i} challenge"

    # round-0 compressed coefficients, byte-for-byte
    m = re.search(
        r"compressed\[0\] = c0 \(32 bytes\) = \{ ([0-9, ]+)\}.*?"
        r"compressed\[1\] = c2 \(32 bytes\) = \{ ([0-9, ]+)\}.*?"
        r"compressed\[2\] = c3 \(32 bytes\) = \{ ([0-9, ]+)\}", text, re.S)
    for j in range(3):
        want = int.from_bytes(
            bytes(int(x.rstrip(",")) for x in m.group(j + 1).split() if x.rstrip(",")),
            "little")
        assert s4.compressed_polys[0][j] == want % P, f"stage4 round0 compressed[{j}]"

    # final opening claims
    assert s4.regs_claims["val"] == le_line(r"\[ZOLT STAGE4 CLAIMS\] val_claim bytes"), "val claim"
    assert s4.regs_claims["rs1_ra"] == le_line(r"\[ZOLT STAGE4 CLAIMS\] rs1_ra_claim bytes"), "rs1_ra"
    assert s4.regs_claims["rs2_ra"] == le_line(r"\[ZOLT STAGE4 CLAIMS\] rs2_ra_claim bytes"), "rs2_ra"
    assert s4.regs_claims["rd_wa"] == le_line(r"\[ZOLT STAGE4 CLAIMS\] rd_wa_claim bytes"), "rd_wa"
    assert s4.regs_claims["inc"] == le_line(r"\[ZOLT STAGE4 CLAIMS\] inc_claim bytes"), "inc"
    assert s4.val_eval_openings["lt"] == be_line(
        r"\[ZOLT LT FINAL\] val_eval_openings.lt_eval \(from prover binding\)"), "lt opening"
    assert s4.val_eval_openings["inc"] == be_line(
        r"\[ZOLT LT FINAL\] val_eval_openings.inc_eval"), "val_eval inc"
    assert s4.val_eval_openings["wa"] == be_line(
        r"\[ZOLT LT FINAL\] val_eval_openings.wa_eval"), "val_eval wa"
    assert s4.val_final_openings["inc"] == be_line(
        r"  val_final_openings.inc_eval"), "val_final inc"
    assert s4.val_final_openings["wa"] == be_line(
        r"  val_final_openings.wa_eval"), "val_final wa"

    # transcript state after the 9 absorbed opening claims (running checksum
    # over every byte absorbed in stages 1-4)
    idx = text.index("[ZOLT STAGE4 VERIFY CHECK]")
    tail = text[idx:]
    states = re.findall(r"state_after=\{ ([0-9a-f ]+)\.\.\. \}", tail[:6000])
    assert len(states) >= 9
    want = bytes(int(b, 16) for b in states[8].split())
    assert transcript.state[: len(want)] == want, (
        f"post-stage4 transcript state {transcript.state[:8].hex()} != {want.hex()}")
