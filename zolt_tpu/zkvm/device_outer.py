"""Device/mesh backends for the stage-1 streaming-outer remaining rounds.

The host prover (streaming_outer.StreamingOuterProver) drives the Gruen cubic
rounds with two O(n) inner loops per round: the (t0, t∞) evaluation sums and
the az/bz fold. This module re-expresses both as Montgomery limb-array
kernels (zolt_tpu.field.limb), bit-identical to the host ints:

  t0 = Σ_i e_i·az0_i·bz0_i      t∞ = Σ_i e_i·(az1_i−az0_i)(bz1_i−bz0_i)
  e_i = E_out[i >> h_in] · E_in[i & (2^h_in − 1)]   (Gruen prefix tables)
  fold: az'[i] = az[2i] + r·(az[2i+1] − az[2i])      (and likewise bz)

matching the reference's hot-loop structure
(src/zkvm/spartan/streaming_outer.zig:1577-1679, fold :1681-1722).

Shape discipline (the XLA-facing design decision): tables never change shape.
az/bz stay at their initial power-of-two size with the live prefix shrinking
by half each round and a zero tail behind it; the eq tables arrive as
fixed-size zero-padded buffers and are combined by a dynamic gather
(`i >> h_in`, `i & mask` with h_in a traced scalar). Every round therefore
reuses the same two compiled programs (one eval, one fold) instead of
recompiling per shrinking shape — zeros contribute nothing to the sums, so
the results are exactly the live-prefix sums. Per-round host↔device traffic:
two O(√n) eq-table uploads and the two evaluation sums down (the Fiat-Shamir
sync point, SURVEY §5.8).

The mesh backend shards az/bz over a 1-D device mesh. The live prefix lives
shard-locally (each shard's live chunk is its local prefix), global live
indices are reconstructed from `axis_index`, eq tables replicate, and the two
sums are `psum` reductions over ICI. Eval and fold are separate programs —
the challenge only exists after the evals are absorbed, so a fused step would
either run twice per round or fold blind (the double-step defect in the
round-1 generic demo, parallel/mesh.py, fixed the same way there).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import limb
from ..field.limb import FR_C
from ..field.params import FR
from ..parallel.mesh import AXIS, _psum_field
from ..poly import dense

P = FR.p
_U32 = jnp.uint32


def _ingest(vals) -> np.ndarray:
    """(n, 16) uint32 Montgomery limb array from an FrVec (byte
    reinterpretation — same Montgomery form both sides) or from host ints
    (C ingest when the native tier is up, Python bigint fallback)."""
    if hasattr(vals, "_mont"):                       # FrVec
        from ..parallel.stage_engine import frvec_to_limbs

        return frvec_to_limbs(vals)
    from ..native.frvec import FrVec

    v = FrVec.from_ints([x % P for x in vals])
    if v._mont is not None:
        from ..parallel.stage_engine import frvec_to_limbs

        return frvec_to_limbs(v)
    return np.asarray(limb.encode([x % P for x in vals], FR_C))


def _pad_encode(vals, size: int):
    """Encode host values to Montgomery limbs in a fixed-size zero-padded
    buffer (zero is zero in Montgomery form, so padding is inert)."""
    buf = np.zeros((size, 16), np.uint32)
    n = vals.n if hasattr(vals, "n") else len(vals)
    if n:
        buf[:n] = _ingest(vals)
    return jnp.asarray(buf)


def _eq_gather(e_out_p, e_in_p, idx, h_in):
    """e_i = E_out[i >> h_in] · E_in[i & (2^h_in − 1)] via dynamic gather."""
    f = FR_C
    mask = jnp.left_shift(jnp.uint32(1), h_in) - jnp.uint32(1)
    row = jax.lax.shift_right_logical(idx, h_in)
    col = idx & mask
    return limb.mont_mul(e_out_p[row], e_in_p[col], f)


@jax.jit
def _eval_fixed(az, bz, e_out_p, e_in_p, h_in):
    """(t0, t∞) over the live prefix; dead-tail terms vanish because the
    padded eq tables are zero there. Fixed shapes across all rounds."""
    f = FR_C
    n2 = az.shape[0] // 2
    a = az.reshape(n2, 2, -1)
    b = bz.reshape(n2, 2, -1)
    a0, a1 = a[:, 0], a[:, 1]
    b0, b1 = b[:, 0], b[:, 1]
    e = _eq_gather(e_out_p, e_in_p, jnp.arange(n2, dtype=_U32), h_in)
    t0 = dense.sum_mod(limb.mont_mul(e, limb.mont_mul(a0, b0, f), f), f)
    tinf = dense.sum_mod(
        limb.mont_mul(e, limb.mont_mul(limb.sub(a1, a0, f),
                                       limb.sub(b1, b0, f), f), f), f)
    return jnp.stack([t0, tinf])


@jax.jit
def _fold_fixed(az, bz, r):
    """Live prefix folds into a half-length prefix; shape restored with a
    zero tail so every round reuses this one compiled program."""
    f = FR_C
    na = dense.bind_low(az, r, f)
    nb = dense.bind_low(bz, r, f)
    z = jnp.zeros_like(na)
    return jnp.concatenate([na, z]), jnp.concatenate([nb, z])


class DeviceOuterRounds:
    """Single-device backend. az/bz live on device as Montgomery limbs; the
    host keeps only the split-eq scalars (cubic-poly bookkeeping)."""

    def __init__(self, az, bz):
        n = az.n if hasattr(az, "n") else len(az)
        self.n = n                       # fixed device size
        self.live = n                    # live prefix length (halves per round)
        self.az = jnp.asarray(_ingest(az))
        self.bz = jnp.asarray(_ingest(bz))
        self._e_in_size = max(1, self.n // 2)

    def num_pairs(self) -> int:
        return self.live // 2

    def round_evals(self, e_out: list[int], e_in: list[int]) -> tuple[int, int]:
        h_in = (len(e_in) - 1).bit_length() if len(e_in) > 1 else 0
        eo = _pad_encode(e_out, self.n // 2)
        ei = _pad_encode(e_in, self._e_in_size)
        out = _eval_fixed(self.az, self.bz, eo, ei, jnp.uint32(h_in))
        vals = limb.decode(np.asarray(out), FR_C)
        return int(vals[0]), int(vals[1])

    def bind(self, r: int) -> None:
        rl = limb.encode([r % P], FR_C)[0]
        self.az, self.bz = _fold_fixed(self.az, self.bz, rl)
        self.live //= 2

    def final_values(self) -> tuple[int, int]:
        return (int(limb.decode(np.asarray(self.az[0]), FR_C)),
                int(limb.decode(np.asarray(self.bz[0]), FR_C)))


# ---------------------------------------------------------------------------
# Mesh backend
# ---------------------------------------------------------------------------

def _make_mesh_steps(mesh):
    from jax.sharding import PartitionSpec as PS

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(PS(AXIS, None), PS(AXIS, None), PS(None, None),
                       PS(None, None), PS(), PS()),
             out_specs=PS(None, None), check_vma=False)
    def eval_step(az, bz, e_out_p, e_in_p, h_in, live_pairs):
        f = FR_C
        n2 = az.shape[0] // 2            # local pairs
        a = az.reshape(n2, 2, -1)
        b = bz.reshape(n2, 2, -1)
        a0, a1 = a[:, 0], a[:, 1]
        b0, b1 = b[:, 0], b[:, 1]
        # global live index of local slot j: shard*live_pairs_local + j,
        # valid while j < live_pairs_local (live data is the local prefix)
        s = jax.lax.axis_index(AXIS).astype(_U32)
        loc = jnp.arange(n2, dtype=_U32)
        gi = s * live_pairs + loc
        valid = loc < live_pairs
        e = _eq_gather(e_out_p, e_in_p, jnp.where(valid, gi, 0), h_in)
        e = jnp.where(valid[:, None], e, 0)
        t0 = dense.sum_mod(limb.mont_mul(e, limb.mont_mul(a0, b0, f), f), f)
        tinf = dense.sum_mod(
            limb.mont_mul(e, limb.mont_mul(limb.sub(a1, a0, f),
                                           limb.sub(b1, b0, f), f), f), f)
        return _psum_field(jnp.stack([t0, tinf]), f)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(PS(AXIS, None), PS(AXIS, None), PS(None)),
             out_specs=(PS(AXIS, None), PS(AXIS, None)), check_vma=False)
    def fold_step(az, bz, r):
        f = FR_C
        na = dense.bind_low(az, r, f)
        nb = dense.bind_low(bz, r, f)
        z = jnp.zeros_like(na)
        return jnp.concatenate([na, z]), jnp.concatenate([nb, z])

    return jax.jit(eval_step), jax.jit(fold_step)


class MeshOuterRounds:
    """Mesh backend: az/bz sharded on the pair axis; per-round sums are ICI
    psum reductions; folds shard-local. When the live prefix no longer spans
    the mesh (< 1 pair per shard — the last ~log2(n_dev) rounds, a vanishing
    fraction of the work), the tail finishes as host ints."""

    def __init__(self, az, bz, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as PS

        n = az.n if hasattr(az, "n") else len(az)
        self.mesh = mesh
        self.n_dev = int(mesh.devices.size)
        assert n % (2 * self.n_dev) == 0, \
            "table must give every shard an even pair count"
        self.n = n
        self.live = n
        self.eval_step, self.fold_step = _make_mesh_steps(mesh)
        sh = NamedSharding(mesh, PS(AXIS, None))
        self.az = jax.device_put(jnp.asarray(_ingest(az)), sh)
        self.bz = jax.device_put(jnp.asarray(_ingest(bz)), sh)
        self._e_in_size = max(1, self.n // 2)
        self._host_az: list[int] | None = None
        self._host_bz: list[int] | None = None

    def num_pairs(self) -> int:
        return self.live // 2

    @property
    def _on_host(self) -> bool:
        return self._host_az is not None

    def _live_pairs_local(self) -> int:
        return self.live // (2 * self.n_dev)

    def _to_host(self) -> None:
        """Gather the scattered live prefixes (each shard's local prefix)
        back into contiguous host ints for the tail rounds."""
        if self._on_host:
            return
        az = np.asarray(self.az)
        bz = np.asarray(self.bz)
        loc = self.n // self.n_dev
        live_loc = self.live // self.n_dev
        ha, hb = [], []
        for s in range(self.n_dev):
            sl = slice(s * loc, s * loc + live_loc)
            ha.extend(int(v) for v in limb.decode(az[sl], FR_C))
            hb.extend(int(v) for v in limb.decode(bz[sl], FR_C))
        self._host_az, self._host_bz = ha, hb

    def round_evals(self, e_out: list[int], e_in: list[int]) -> tuple[int, int]:
        if not self._on_host and self._live_pairs_local() < 1:
            self._to_host()
        if self._on_host:
            az, bz = self._host_az, self._host_bz
            h_in = (len(e_in) - 1).bit_length() if len(e_in) > 1 else 0
            t0 = tinf = 0
            for i in range(self.live // 2):
                e = e_out[i >> h_in] * e_in[i & ((1 << h_in) - 1)] % P
                a0, a1 = az[2 * i], az[2 * i + 1]
                b0, b1 = bz[2 * i], bz[2 * i + 1]
                t0 = (t0 + e * (a0 * b0 % P)) % P
                tinf = (tinf + e * ((a1 - a0) * (b1 - b0) % P)) % P
            return t0, tinf
        h_in = (len(e_in) - 1).bit_length() if len(e_in) > 1 else 0
        eo = _pad_encode(e_out, self.n // 2)
        ei = _pad_encode(e_in, self._e_in_size)
        out = self.eval_step(self.az, self.bz, eo, ei, jnp.uint32(h_in),
                             jnp.uint32(self._live_pairs_local()))
        vals = limb.decode(np.asarray(out), FR_C)
        return int(vals[0]), int(vals[1])

    def bind(self, r: int) -> None:
        if not self._on_host and self._live_pairs_local() < 1:
            self._to_host()
        if self._on_host:
            az, bz = self._host_az, self._host_bz
            half = self.live // 2
            self._host_az = [(az[2 * i] + r * (az[2 * i + 1] - az[2 * i])) % P
                             for i in range(half)]
            self._host_bz = [(bz[2 * i] + r * (bz[2 * i + 1] - bz[2 * i])) % P
                             for i in range(half)]
            self.live = half
            return
        rl = limb.encode([r % P], FR_C)[0]
        self.az, self.bz = self.fold_step(self.az, self.bz, rl)
        self.live //= 2

    def final_values(self) -> tuple[int, int]:
        self._to_host()
        return self._host_az[0], self._host_bz[0]
