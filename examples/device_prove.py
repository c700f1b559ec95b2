"""Device-tier proving: the same Jolt-format proof, with the wide sumcheck
instances (stage-1 az/bz rounds, stage-2 product/instruction, stage-4 RAM
val-evaluation/val-final) running on the accelerator — byte-identical to
the host prover.

On a multi-chip host, pass a mesh to shard the same instances across chips
(jax.sharding Mesh + shard_map with psum reductions over ICI):

    from zolt_tpu.parallel import make_mesh
    prove_jolt(elf, backend="mesh", mesh=make_mesh())

Run: python examples/device_prove.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from zolt_tpu.vm import elf as elf_mod
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
from zolt_tpu.zkvm.pipeline import prove_jolt

lay = MemoryLayout.create(MemoryConfig(program_size=1024))
a = Asm()
a.addi(1, 0, 30)            # sum 1..30
a.label("loop")
a.add(2, 2, 1)
a.addi(1, 1, -1)
a.bne(1, 0, "loop")
a.halt(lay, provable=True)

with tempfile.NamedTemporaryFile(suffix=".elf") as f:
    f.write(elf_mod.write_minimal_elf(a.bytes()))
    f.flush()

    host = prove_jolt(f.name).conv.proof.serialize_with_dory()
    dev = prove_jolt(f.name, backend="device").conv.proof.serialize_with_dory()

print(f"host proof:   {len(host)} bytes")
print(f"device proof: {len(dev)} bytes")
print(f"byte-identical: {dev == host}")
assert dev == host
