"""Full prove+verify e2e over the reference's golden-program table
(examples/README.md: sum->5050, gcd->63, bitwise->209, array->1465,
signed->-39, factorial->3628800, primes->25; fibonacci and collatz are
covered in test_jolt_e2e.py) — 9/9 goldens proven in total.

Each program is wrapped in the provable guest-halt convention (termination
write + `jal x0,0` self-loop), proved in sound mode, and verified strictly.
"""

import pytest

from golden_programs import (_golden_array, _golden_bitwise, _golden_gcd,
                             _golden_signed, _golden_sum)

from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout

LAY = MemoryLayout.create(MemoryConfig(program_size=1024))


def _golden_factorial():
    a = Asm()
    a.addi(1, 0, 10)
    a.addi(10, 0, 1)
    a.label("loop")
    a.mul(10, 10, 1)
    a.addi(1, 1, -1)
    a.bne(1, 0, "loop")
    return a


def _golden_primes():
    a = Asm()
    a.addi(1, 0, 2)
    a.addi(10, 0, 0)
    a.label("outer")
    a.addi(4, 0, 100)
    a.bge(1, 4, "done")
    a.addi(3, 0, 2)
    a.label("inner")
    a.bge(3, 1, "isprime")
    a.rem(7, 1, 3)
    a.beq(7, 0, "notprime")
    a.addi(3, 3, 1)
    a.jal(0, "inner")
    a.label("isprime")
    a.addi(10, 10, 1)
    a.label("notprime")
    a.addi(1, 1, 1)
    a.jal(0, "outer")
    a.label("done")
    return a


GOLDENS = [
    ("sum", _golden_sum, 5050),
    ("gcd", _golden_gcd, 63),
    ("bitwise", _golden_bitwise, 209),
    ("array", lambda: _golden_array(LAY), 1465),
    ("signed", _golden_signed, -39),
    ("factorial", _golden_factorial, 3628800),
    ("primes", _golden_primes, 25),
]


@pytest.mark.parametrize("name,builder,expected", GOLDENS,
                         ids=[g[0] for g in GOLDENS])
def test_golden_prove_verify(tmp_path, name, builder, expected):
    from zolt_tpu.vm import elf as elf_mod
    from zolt_tpu.zkvm.jolt_verifier import verify_jolt
    from zolt_tpu.zkvm.pipeline import prove_jolt

    a = builder()
    a.halt(LAY, tmp=30, one=31, provable=True)
    path = str(tmp_path / f"{name}.elf")
    with open(path, "wb") as f:
        f.write(elf_mod.write_minimal_elf(a.bytes()))

    res = prove_jolt(path, sound=True)
    v = res.emulator.registers.registers[10]
    if v >= 1 << 63:
        v -= 1 << 64
    assert v == expected, f"{name}: a0={v} != {expected}"
    report = {}
    assert verify_jolt(res.conv.proof, path, report=report)
    assert report["stage2_output_residual"] is not None
