"""PTAU ceremony file parsing + raw SRS round-trip (reference srs.zig)."""

import struct

from zolt_tpu.curve import g2 as G2
from zolt_tpu.curve import host as G1
from zolt_tpu.field.params import FR
from zolt_tpu.pcs import srs as srs_mod


def _synth_ptau(tau: int, power: int) -> bytes:
    n_g1 = (1 << power) * 2 - 1
    n_g2 = (1 << power) + 1
    acc = 1
    g1pts = []
    for _ in range(n_g1):
        g1pts.append(G1.scalar_mul(G1.G1_GEN, acc))
        acc = acc * tau % FR.p
    acc = 1
    g2pts = []
    for _ in range(n_g2):
        g2pts.append(G2.scalar_mul(G2.G2_GEN, acc))
        acc = acc * tau % FR.p

    def g1le(p):
        return p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little")

    def g2le(p):
        return b"".join(v.to_bytes(32, "little")
                        for v in (p[0][0], p[0][1], p[1][0], p[1][1]))

    header = (struct.pack("<I", 32) + srs_mod.FP.p.to_bytes(32, "little")
              + struct.pack("<II", power, power))
    s_g1 = b"".join(g1le(p) for p in g1pts)
    s_g2 = b"".join(g2le(p) for p in g2pts)
    data = b"ptau" + struct.pack("<II", 1, 3)
    data += struct.pack("<IQ", 1, len(header)) + header
    data += struct.pack("<IQ", 2, len(s_g1)) + s_g1
    data += struct.pack("<IQ", 3, len(s_g2)) + s_g2
    return data


def test_ptau_load_and_basic():
    tau, power = 7777, 2
    srs = srs_mod.load_ptau(_synth_ptau(tau, power))
    assert srs.power == power
    basic = srs.to_basic()
    assert basic.powers_g1[0] == G1.G1_GEN
    assert basic.powers_g1[1] == G1.scalar_mul(G1.G1_GEN, tau)
    assert basic.tau_g2 == G2.scalar_mul(G2.G2_GEN, tau)


def test_ptau_bad_magic():
    import pytest

    with pytest.raises(srs_mod.SRSError):
        srs_mod.load_ptau(b"nope" + b"\x00" * 20)


def test_raw_binary_roundtrip():
    srs = srs_mod.load_ptau(_synth_ptau(31337, 2)).to_basic()
    rt = srs_mod.load_raw_binary(srs_mod.serialize_raw_binary(srs))
    assert rt.powers_g1 == srs.powers_g1
    assert rt.tau_g2 == srs.tau_g2
