"""Randomized sound-mode round-trips: seeded random guests covering ALU,
M-extension, branches, and in-window RAM traffic must prove sound and verify
strictly. This is the systematic net for cross-component inconsistencies
(e.g. the committed-poly vs stage-table RamInc divergence a RAM-dense guest
exposed) that hand-written goldens miss."""

import random

import pytest

from zolt_tpu.vm import elf as elf_mod, run_elf
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout

LAY = MemoryLayout.create(MemoryConfig(program_size=8192))


def random_guest(seed: int) -> bytes:
    rng = random.Random(seed)
    a = Asm()
    # x5 = RAM scratch base (zero-extended), x6 = word index bound
    a.li_addr(5, 0x80002000)
    a.addi(6, 0, 61)
    regs = list(range(1, 5)) + list(range(7, 15))
    for r in regs:
        a.addi(r, 0, rng.randrange(-2048, 2048))
    ops = ["add", "sub", "xor", "or_", "and_", "sll", "srl", "sra",
           "mul", "div", "rem", "slt", "sltu"]
    for i in range(rng.randrange(20, 60)):
        op = rng.choice(ops)
        rd, rs1, rs2 = (rng.choice(regs) for _ in range(3))
        getattr(a, op)(rd, rs1, rs2)
        kind = rng.randrange(6)
        if kind == 0:
            # in-window store: addr = base + 8*(reg mod 62)
            src = rng.choice(regs)
            a.rem(28, rng.choice(regs), 6)
            a.slli(28, 28, 3)
            # rem can be negative for negative operands: mask to the window
            a.andi(28, 28, 0x1F8)
            a.add(28, 28, 5)
            a.sd(28, src, 0)
        elif kind == 1:
            a.rem(28, rng.choice(regs), 6)
            a.andi(28, 28, 0x1F8)
            a.add(28, 28, 5)
            a.ld(rng.choice(regs), 28, 0)
        elif kind == 2:
            # short forward branch over one instruction
            lbl = f"sk{i}"
            a.beq(rng.choice(regs), rng.choice(regs), lbl)
            a.addi(rng.choice(regs), rng.choice(regs), 1)
            a.label(lbl)
    a.halt(LAY, provable=True)
    return elf_mod.write_minimal_elf(a.bytes())


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_random_guest_sound_roundtrip(tmp_path, seed):
    from zolt_tpu.zkvm.jolt_verifier import verify_jolt
    from zolt_tpu.zkvm.pipeline import prove_jolt

    blob = random_guest(seed)
    emu = run_elf(blob)  # must terminate cleanly
    assert emu.cycle > 10
    path = str(tmp_path / f"fuzz{seed}.elf")
    with open(path, "wb") as f:
        f.write(blob)
    res = prove_jolt(path, sound=True)
    assert verify_jolt(res.conv.proof, path)
