"""Shared golden guest programs (reference examples/README.md table).

Asm re-implementations of the reference's C example programs with the same
expected results: sum->5050, gcd->63, bitwise->209, array->1465, signed->-39.
"""

def _golden_sum():
    from zolt_tpu.vm.guest import Asm

    a = Asm()
    a.addi(10, 0, 0)
    a.addi(1, 0, 1)
    a.addi(2, 0, 100)
    a.label("loop")
    a.add(10, 10, 1)
    a.addi(1, 1, 1)
    a.bge(2, 1, "loop")
    return a


def _golden_gcd():
    from zolt_tpu.vm.guest import Asm

    a = Asm()

    def gcd_inline(x, y, out):
        tag = f"g{out}"
        a.addi(1, 0, x)
        a.addi(2, 0, y)
        a.label(f"{tag}loop")
        a.beq(2, 0, f"{tag}done")
        a.rem(3, 1, 2)
        a.add(1, 2, 0)
        a.add(2, 3, 0)
        a.jal(0, f"{tag}loop")
        a.label(f"{tag}done")
        a.add(out, 1, 0)

    gcd_inline(48, 18, 20)     # 6
    gcd_inline(252, 105, 21)   # 21
    gcd_inline(12, 18, 22)     # gcd for the lcm
    a.addi(4, 0, 12)
    a.addi(5, 0, 18)
    a.mul(6, 4, 5)
    a.div(6, 6, 22)            # lcm(12,18) = 36
    a.add(10, 20, 21)
    a.add(10, 10, 6)
    return a


def _golden_bitwise():
    from zolt_tpu.vm.guest import Asm

    a = Asm()
    a.addi(28, 0, -1)          # mask32 = 0xFFFFFFFF
    a.srli(28, 28, 32)
    a.lui(1, 0xF0F0F)          # a = 0xF0F0F0F0
    a.addi(3, 0, 0x0F0)
    a.or_(1, 1, 3)
    a.and_(1, 1, 28)
    a.lui(2, 0x0F0F1)          # b = 0x0F0F0F0F
    a.addi(2, 2, -241)
    a.and_(2, 2, 28)
    a.addi(4, 0, 0)            # popcount(a)
    a.add(5, 1, 0)
    a.label("pop")
    a.beq(5, 0, "popd")
    a.andi(6, 5, 1)
    a.add(4, 4, 6)
    a.srli(5, 5, 1)
    a.jal(0, "pop")
    a.label("popd")
    a.and_(7, 1, 2)            # bit_ops with 32-bit masking
    a.or_(8, 1, 2)
    a.xor(9, 1, 2)
    a.slli(11, 1, 4)
    a.and_(11, 11, 28)
    a.srli(12, 2, 2)
    a.add(13, 7, 8)
    a.add(13, 13, 9)
    a.add(13, 13, 11)
    a.add(13, 13, 12)
    a.and_(13, 13, 28)
    a.andi(13, 13, 0xFF)
    a.add(10, 4, 13)
    return a


def _golden_array(lay):
    from zolt_tpu.vm.guest import Asm

    # 8-byte elements (ld/sd): sound-mode RAM read/write checking models RAM
    # as aligned 8-byte word slots, matching the Jolt doubleword RAM model.
    a = Asm()
    a.li_addr(20, lay.stack_end)   # array base in writable RAM
    a.addi(1, 0, 0)                # init: arr[i] = i*i
    a.addi(2, 0, 16)
    a.add(3, 20, 0)
    a.label("init")
    a.mul(4, 1, 1)
    a.sd(3, 4, 0)
    a.addi(3, 3, 8)
    a.addi(1, 1, 1)
    a.blt(1, 2, "init")
    a.addi(5, 0, 0)                # sum = 1240
    a.addi(1, 0, 0)
    a.add(3, 20, 0)
    a.label("sum")
    a.ld(6, 3, 0)
    a.add(5, 5, 6)
    a.addi(3, 3, 8)
    a.addi(1, 1, 1)
    a.blt(1, 2, "sum")
    a.ld(7, 20, 0)                 # max = 225
    a.addi(1, 0, 1)
    a.addi(3, 20, 8)
    a.label("max")
    a.ld(6, 3, 0)
    a.bge(7, 6, "skip")
    a.add(7, 6, 0)
    a.label("skip")
    a.addi(3, 3, 8)
    a.addi(1, 1, 1)
    a.blt(1, 2, "max")
    a.add(10, 5, 7)
    return a


def _golden_signed():
    from zolt_tpu.vm.guest import Asm

    a = Asm()
    a.addi(1, 0, -10)
    a.addi(2, 0, 25)
    a.add(3, 1, 2)        # 15
    a.addi(4, 0, -7)
    a.addi(5, 0, 6)
    a.mul(6, 4, 5)        # -42
    a.addi(7, 0, -100)
    a.addi(8, 0, 7)
    a.div(9, 7, 8)        # -14 (truncated toward zero)
    a.slt(11, 1, 2)       # 1
    a.slt(12, 7, 1)       # 1
    a.slt(13, 5, 4)       # 0
    a.add(10, 3, 6)
    a.add(10, 10, 9)
    a.add(10, 10, 11)
    a.add(10, 10, 12)
    a.add(10, 10, 13)
    return a


