"""Transcript byte-exactness tests.

Golden vectors come from the reference's checked-in run log
(/root/reference/logs/zolt.log, [ZOLT TRANSCRIPT] lines) — usable as vectors
without running Zig (SURVEY §4).
"""

import hashlib

from zolt_tpu.field.params import FR
from zolt_tpu.transcript import Blake2bTranscript, KeccakTranscript


def test_blake2b_init_golden():
    # logs/zolt.log: init label "Jolt" -> initial_state 06 ce 2c 10 d1 d2 80 1c ...
    t = Blake2bTranscript(b"Jolt")
    assert t.state.hex() == (
        "06ce2c10d1d2801c48c859d7cb16510476b0d48667d9562ed021b20d9a05e547"
    )
    assert t.n_rounds == 0


def test_blake2b_state_evolution_matches_hand_hash():
    t = Blake2bTranscript(b"Jolt")
    s0 = t.state
    t.append_u64(123)
    h = hashlib.blake2b(digest_size=32)
    h.update(s0)
    h.update(b"\x00" * 28 + (0).to_bytes(4, "big"))
    h.update(b"\x00" * 24 + (123).to_bytes(8, "big"))
    assert t.state == h.digest()
    assert t.n_rounds == 1


def test_blake2b_challenge_flavors_differ():
    t1 = Blake2bTranscript(b"Jolt")
    t2 = Blake2bTranscript(b"Jolt")
    c_opt = t1.challenge_scalar()
    c_full = t2.challenge_scalar_full()
    # same bytes, different lifting AND different endianness (verified bit-exact
    # against the reference log in test_stage1_jolt): optimized reads the buf
    # little-endian + masks to 125 bits + divides by 2^128; full reads big-endian
    u_le = Blake2bTranscript(b"Jolt").challenge_u128()
    buf = Blake2bTranscript(b"Jolt").challenge_bytes(16)
    assert u_le == int.from_bytes(buf, "little")
    assert c_full == int.from_bytes(buf, "big") % FR.p
    assert c_opt == ((u_le & ((1 << 125) - 1)) * pow(1 << 128, -1, FR.p)) % FR.p
    assert c_opt != c_full


def test_blake2b_scalar_roundtrip_determinism():
    a = Blake2bTranscript(b"test")
    b = Blake2bTranscript(b"test")
    for t in (a, b):
        t.append_scalar(42)
        t.append_scalars([1, 2, 3])
        t.append_point(5, 7)
        t.append_point(None)
    assert a.state == b.state
    assert a.challenge_scalar() == b.challenge_scalar()


def test_blake2b_message_padding():
    # "x" padded to 32 bytes must equal explicit 32-byte message
    a = Blake2bTranscript(b"t")
    b = Blake2bTranscript(b"t")
    a.append_message(b"x")
    b.append_bytes(b"x" + b"\x00" * 31)
    assert a.state == b.state


def test_keccak_f_against_hashlib_sha3():
    # Absorb exactly rate bytes with the 0x06/0x80 sha3 padding and compare the
    # squeezed state to hashlib.sha3_256 — validates the permutation itself.
    msg = b"a" * 100
    pad = bytearray(136)
    pad[: len(msg)] = msg
    pad[len(msg)] ^= 0x06
    pad[135] ^= 0x80
    from zolt_tpu.transcript.keccak import keccak_f

    st = bytearray(200)
    for i, byte in enumerate(pad):
        st[i] ^= byte
    keccak_f(st)
    assert bytes(st[:32]) == hashlib.sha3_256(msg).digest()


def test_keccak_transcript_determinism_and_range():
    t1 = KeccakTranscript(b"Jolt")
    t2 = KeccakTranscript(b"Jolt")
    for t in (t1, t2):
        t.append_scalar(b"lbl", 99)
    c1, c2 = t1.challenge_scalar(b"c"), t2.challenge_scalar(b"c")
    assert c1 == c2
    assert 0 <= c1 < FR.p
    # different absorbs -> different challenge
    t3 = KeccakTranscript(b"Jolt")
    t3.append_scalar(b"lbl", 100)
    assert t3.challenge_scalar(b"c") != c1


def test_preamble_golden_vector_vs_reference_log():
    # logs/zolt.log:1163-1188 — fibonacci run preamble leaves the state at
    # cf cf 19 f2 ff b0 c7 21 ...
    from zolt_tpu.zkvm.preamble import fiat_shamir_preamble

    t = Blake2bTranscript(b"Jolt")
    t.append_u64(4096)
    t.append_u64(4096)
    t.append_u64(32768)
    assert t.state[:8].hex() == "ce55d444de489554"  # log: state_before inputs
    t.append_bytes(b"")  # inputs
    assert t.state[:8].hex() == "e724bd96416d4e39"
    t.append_bytes(b"")  # outputs
    assert t.state[:8].hex() == "cfcf19f2ffb0c721"
    # full preamble runs through the same path deterministically
    t2 = Blake2bTranscript(b"Jolt")
    fiat_shamir_preamble(
        t2, max_input_size=4096, max_output_size=4096, memory_size=32768,
        inputs=b"", outputs=b"", panic=False, ram_k=65536, trace_length=256)
    t.append_u64(0)
    t.append_u64(65536)
    t.append_u64(256)
    assert t2.state == t.state


def test_poseidon_transcript_determinism_and_sensitivity():
    from zolt_tpu.transcript import PoseidonTranscript

    a = PoseidonTranscript(b"test")
    b = PoseidonTranscript(b"test")
    a.absorb(12345)
    b.absorb(12345)
    assert a.squeeze() == b.squeeze()
    c = PoseidonTranscript(b"test")
    c.absorb(12346)
    d = PoseidonTranscript(b"other")
    d.absorb(12345)
    out_a = PoseidonTranscript(b"test")
    out_a.absorb(12345)
    assert c.squeeze() != out_a.squeeze()
    assert d.squeeze() != out_a.squeeze()


def test_poseidon_sbox_and_mds_shape():
    """Algorithm parameters match the reference (8 full + 56 partial rounds,
    t=3, x^5 S-box, [2,1,1] circulant MDS — transcripts/mod.zig:233-375)."""
    from zolt_tpu.transcript import poseidon

    assert poseidon.FULL_ROUNDS == 8
    assert poseidon.PARTIAL_ROUNDS == 56
    assert poseidon.STATE_WIDTH == 3
    # reference's deriveRoundConstant(0, 0)
    seed = 0x9E3779B97F4A7C15
    seed ^= seed >> 33
    seed = (seed * 0xFF51AFD7ED558CCD) % (1 << 64)
    seed ^= seed >> 33
    assert poseidon._ROUND_CONSTANTS[0][0] == seed % poseidon.P
