"""Stage-1 device/mesh backend equivalence: the remaining-round hot loops
(t0/t∞ evaluation + fold) run as Montgomery limb kernels — single-device and
sharded over the 8-device virtual mesh — and must produce proofs bit-identical
to the host-int prover (and therefore to the reference golden bytes, which
the host path reproduces in test_stage1_jolt.py / test_jolt_e2e.py)."""

import jax
import pytest

from zolt_tpu.r1cs import inputs as ri
from zolt_tpu.transcript import Blake2bTranscript
from zolt_tpu.vm import pad_with_noop, run_elf
from zolt_tpu.vm.guest import Asm
from zolt_tpu.vm import elf as elf_mod
from zolt_tpu.vm.layout import MemoryConfig, MemoryLayout
from zolt_tpu.zkvm.commitments import derive_tau
from zolt_tpu.zkvm.preamble import fiat_shamir_preamble
from zolt_tpu.zkvm.streaming_outer import prove_stage1_jolt


@pytest.fixture(scope="module")
def trace_and_tau():
    lay = MemoryLayout.create(MemoryConfig(program_size=1024))
    a = Asm()
    a.addi(1, 0, 20)
    a.label("loop")
    a.add(2, 2, 1)
    a.addi(1, 1, -1)
    a.bne(1, 0, "loop")
    a.halt(lay, provable=True)
    emu = run_elf(elf_mod.write_minimal_elf(a.bytes()))
    padded = pad_with_noop(list(emu.trace))
    T = len(padded)

    def mk():
        tp = Blake2bTranscript(b"Jolt")
        fiat_shamir_preamble(tp, max_input_size=4096, max_output_size=4096,
                             memory_size=32768, inputs=b"", outputs=b"",
                             panic=False, ram_k=1 << 16, trace_length=T)
        return tp, derive_tau(tp, T.bit_length() - 1)

    w = ri.witness_matrix(padded)
    tp, tau = mk()
    host = prove_stage1_jolt(padded, tau, tp, witness_rows=w)
    return padded, w, mk, host, tp.state


def test_device_backend_bit_exact(trace_and_tau):
    padded, w, mk, host, host_state = trace_and_tau
    tp, tau = mk()
    dev = prove_stage1_jolt(padded, tau, tp, witness_rows=w, backend="device")
    assert dev.uni_skip_coeffs == host.uni_skip_coeffs
    assert dev.compressed_polys == host.compressed_polys
    assert dev.challenges == host.challenges
    assert tp.state == host_state


def test_mesh_backend_bit_exact(trace_and_tau):
    from zolt_tpu.parallel.mesh import make_mesh

    padded, w, mk, host, host_state = trace_and_tau
    mesh = make_mesh(jax.devices()[:8])
    tp, tau = mk()
    m = prove_stage1_jolt(padded, tau, tp, witness_rows=w, backend="mesh",
                          mesh=mesh)
    assert m.compressed_polys == host.compressed_polys
    assert m.challenges == host.challenges
    assert tp.state == host_state
