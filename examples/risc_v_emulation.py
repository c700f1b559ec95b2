"""RV64IMC emulation — mirror of examples/risc_v_emulation.zig: run a small
hand-assembled program and inspect the trace."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zolt_tpu.vm import Emulator, MemoryConfig


def main() -> None:
    # addi x1,x0,5; addi x2,x0,0; add x2,x2,x1; addi x1,x1,-1; bne x1,x0,-8; j 0
    words = [0x00500093, 0x00000113, 0x00110133, 0xFFF08093, 0xFE101CE3, 0x0000006F]
    emu = Emulator(MemoryConfig(program_size=256))
    emu.load_program(b"".join(w.to_bytes(4, "little") for w in words))
    emu.run()
    print(f"terminated after {emu.cycle} cycles")
    print(f"x2 (sum 5+4+3+2+1) = {emu.registers.read(2)}")
    assert emu.registers.read(2) == 15
    for step in emu.trace[:5]:
        print(f"  cycle {step.cycle}: pc={step.pc:#x} instr={step.instruction:#010x}")


if __name__ == "__main__":
    main()
