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
by half each round and a zero tail behind it, masked by a traced live bound;
the Gruen eq prefix-table STACKS upload once per prover as flat buffers and
each round passes only level offsets into a fixed-shape gather
(`i >> h_in`, `i & mask` with h_in a traced scalar). Every round therefore
reuses the same two compiled programs (one eval, one fold) instead of
recompiling per shrinking shape. Per-round host↔device traffic: a handful
of scalars up and the two evaluation sums down (the Fiat-Shamir sync point,
SURVEY §5.8) — ~28 ms of tunnel latency on this box, which is why rounds
whose live prefix is at most ZOLT_TPU_DEVICE_TAIL finish on the host FrVec
tier instead.

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


def _ingest(vals, sharding=None):
    """Device (n, 16) uint32 Montgomery limb array from an FrVec (upload
    the 32-byte u16 wire form, widen on device — half the tunnel traffic)
    or from host ints (C ingest when the native tier is up, Python bigint
    fallback)."""
    from ..parallel.stage_engine import frvec_to_u16, widen_u16

    if isinstance(vals, jnp.ndarray):                # already device-resident
        return (jax.device_put(vals, sharding) if sharding is not None
                else vals)
    if not hasattr(vals, "_mont"):                   # host ints
        from ..native.frvec import FrVec

        vals = FrVec.from_ints([x % P for x in vals])
        if vals._mont is None:
            arr = jnp.asarray(np.asarray(
                limb.encode([x % P for x in vals.to_ints()], FR_C)))
            return jax.device_put(arr, sharding) if sharding is not None else arr
    u16 = frvec_to_u16(vals)
    buf = jax.device_put(u16, sharding) if sharding is not None \
        else jax.device_put(u16)
    return widen_u16(buf)


def _flat_stack(levels: list[list[int]]) -> np.ndarray:
    """Flatten a doubling eq-table stack (level k has 2^k entries, offset
    2^k − 1) into one (2^{K+1}−1, 16) Montgomery limb buffer — uploaded to
    the device ONCE per prover so per-round traffic is a handful of scalars
    instead of re-padded table buffers."""
    flat: list[int] = []
    for lvl in levels:
        flat.extend(v % P for v in lvl)
    return np.asarray(limb.encode(flat, FR_C))


def _eq_gather(e_out_p, e_in_p, idx, valid, off_out, off_in, h_in):
    """e_i = E_out[i >> h_in] · E_in[i & (2^h_in − 1)] for live lanes,
    gathered from the resident flat stacks at traced level offsets; dead
    lanes (valid false) contribute zero."""
    f = FR_C
    mask = jnp.left_shift(jnp.uint32(1), h_in) - jnp.uint32(1)
    safe = jnp.where(valid, idx, 0)
    row = off_out + jax.lax.shift_right_logical(safe, h_in)
    col = off_in + (safe & mask)
    e = limb.mont_mul(e_out_p[row], e_in_p[col], f)
    return jnp.where(valid[:, None], e, 0)


@jax.jit
def _eval_fixed(az, bz, e_out_p, e_in_p, off_out, off_in, h_in, live):
    """(t0, t∞) over the live prefix. Fixed shapes across all rounds: the
    tables keep their initial size and the eq weights are masked to the
    live prefix, so one compiled program serves every round."""
    f = FR_C
    n2 = az.shape[0] // 2
    a = az.reshape(n2, 2, -1)
    b = bz.reshape(n2, 2, -1)
    a0, a1 = a[:, 0], a[:, 1]
    b0, b1 = b[:, 0], b[:, 1]
    idx = jnp.arange(n2, dtype=_U32)
    e = _eq_gather(e_out_p, e_in_p, idx, idx < live, off_out, off_in, h_in)
    t0 = dense.sum_mod(limb.mont_mul(e, limb.mont_mul(a0, b0, f), f), f)
    tinf = dense.sum_mod(
        limb.mont_mul(e, limb.mont_mul(limb.sub(a1, a0, f),
                                       limb.sub(b1, b0, f), f), f), f)
    return jnp.stack([t0, tinf])


def _gruen_level_args(se) -> tuple[int, int, int, int]:
    """Per-round (off_out, off_in, h_in, live_pairs-independent) level
    offsets into the flat stacks, mirroring the host window selection
    (getWindowEqTables(·, 1), reference src/poly/split_eq.zig:311-351)."""
    head = se.current_index - 1
    head_out = min(head, se.m)
    head_in = head - head_out
    lvl_out = min(head_out, len(se.E_out_vec) - 1)
    lvl_in = min(head_in, len(se.E_in_vec) - 1)
    return (1 << lvl_out) - 1, (1 << lvl_in) - 1, head_in, head_out


@jax.jit
def _fold_fixed(az, bz, rt):
    """Live prefix folds into a half-length prefix; shape restored with a
    zero tail so every round reuses this one compiled program. The multiply
    by the shared challenge rides the MXU (field/mxu.py fold_shared: bf16
    Toeplitz product + matmul-Hensel REDC), bit-identical to the VPU fold."""
    from ..field import mxu

    na = mxu.fold_shared(az, rt, FR_C)
    nb = mxu.fold_shared(bz, rt, FR_C)
    z = jnp.zeros_like(na)
    return jnp.concatenate([na, z]), jnp.concatenate([nb, z])


def _gruen_tail_evals(se, az_fr, bz_fr, live: int) -> tuple[int, int]:
    """Host-tier (t0, t∞) via the native FrVec kernel — the narrow-tail
    rounds where a device dispatch would be pure latency."""
    from ..native.frvec import FrVec

    n2 = live // 2
    if n2 == 0:
        return 0, 0
    head = se.current_index - 1
    head_out = min(head, se.m)
    h_in = head - head_out
    e_out = se.E_out_vec[min(head_out, len(se.E_out_vec) - 1)]
    e_in = se.E_in_vec[min(h_in, len(se.E_in_vec) - 1)]
    n_out = max(1, n2 >> h_in)
    n_in = min(1 << h_in, n2)
    return FrVec.gruen_quad(FrVec.from_ints(e_out[:n_out]),
                            FrVec.from_ints(e_in[:n_in]), h_in,
                            az_fr, bz_fr, n2)


class DeviceOuterRounds:
    """Single-device backend. az/bz live on device as Montgomery limbs; the
    host keeps only the split-eq scalars (cubic-poly bookkeeping). Attach
    the prover's GruenSplitEq once — its prefix-table stacks become device-
    resident and every round passes only level offsets. Rounds whose live
    prefix is at most TAIL_N finish on the host FrVec tier — every device
    round costs a Fiat-Shamir round trip, so the device only owns rounds
    wide enough to out-earn that latency."""

    def __init__(self, az, bz, se=None):
        n = az.n if hasattr(az, "n") else len(az)
        self.n = n                       # fixed device size
        self.live = n                    # live prefix length (halves per round)
        self.az = _ingest(az)
        self.bz = _ingest(bz)
        self.se = None
        self._fr = None                  # (az, bz) FrVecs once on the tail
        if se is not None:
            self.attach_eq(se)

    def attach_eq(self, se) -> None:
        self.se = se
        self.eq_out = jnp.asarray(_flat_stack(se.E_out_vec))
        self.eq_in = jnp.asarray(_flat_stack(se.E_in_vec))

    def num_pairs(self) -> int:
        return self.live // 2

    def _maybe_tail(self) -> None:
        from ..parallel.stage_engine import limbs_to_frvec, tail_n

        from ..parallel.stage_engine import narrow_u16

        if self._fr is not None or self.live > tail_n():
            return
        arr = np.asarray(narrow_u16(jnp.stack([self.az[: self.live],
                                               self.bz[: self.live]])))
        self._fr = (limbs_to_frvec(arr[0]), limbs_to_frvec(arr[1]))
        self.az = self.bz = None

    def round_evals_device(self):
        """(2, 16) device array [t0, t∞] — no host sync — or None once on
        the host tail; callers batch the download across instances (one
        transfer per round per stage)."""
        self._maybe_tail()
        if self._fr is not None:
            return None
        off_out, off_in, h_in, _ = _gruen_level_args(self.se)
        return _eval_fixed(self.az, self.bz, self.eq_out, self.eq_in,
                           jnp.uint32(off_out), jnp.uint32(off_in),
                           jnp.uint32(h_in), jnp.uint32(self.live // 2))

    def round_evals(self) -> tuple[int, int]:
        dev = self.round_evals_device()
        if dev is None:
            return _gruen_tail_evals(self.se, self._fr[0], self._fr[1],
                                     self.live)
        vals = limb.decode(np.asarray(dev), FR_C)
        return int(vals[0]), int(vals[1])

    def bind(self, r: int) -> None:
        self._maybe_tail()
        if self._fr is not None:
            if self.live > 1:
                self._fr = (self._fr[0].fold_adj(r), self._fr[1].fold_adj(r))
                self.live //= 2
            return
        from ..field import mxu, pallas_redc as predc
        from ..field.params import FR as _FR

        if predc.available() and self.n >= 64:
            # fused Pallas fold: one VMEM-resident pass per table, dead-tail
            # blocks skipped (field/pallas_redc.fold_tail); bit-identical to
            # the XLA tier
            tp = predc.fold_toeplitz_dev(_FR.mont(r % P))
            lp = self.live // 2
            self.az = predc.fold_tail(self.az, tp, lp)
            self.bz = predc.fold_tail(self.bz, tp, lp)
        else:
            rt = jnp.asarray(mxu.scalar_toeplitz(_FR.mont(r % P)))
            self.az, self.bz = _fold_fixed(self.az, self.bz, rt)
        self.live //= 2

    def final_values(self) -> tuple[int, int]:
        if self._fr is not None:
            return self._fr[0].first(), self._fr[1].first()
        out = np.asarray(jnp.stack([self.az[0], self.bz[0]]))
        return (int(limb.decode(out[0], FR_C)), int(limb.decode(out[1], FR_C)))


# ---------------------------------------------------------------------------
# Mesh backend
# ---------------------------------------------------------------------------

def _make_mesh_steps(mesh):
    from jax.sharding import PartitionSpec as PS

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(PS(AXIS, None), PS(AXIS, None), PS(None, None),
                       PS(None, None), PS(), PS(), PS(), PS()),
             out_specs=PS(None, None), check_vma=False)
    def eval_step(az, bz, e_out_p, e_in_p, off_out, off_in, h_in, live_pairs):
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
        e = _eq_gather(e_out_p, e_in_p, gi, valid, off_out, off_in, h_in)
        t0 = dense.sum_mod(limb.mont_mul(e, limb.mont_mul(a0, b0, f), f), f)
        tinf = dense.sum_mod(
            limb.mont_mul(e, limb.mont_mul(limb.sub(a1, a0, f),
                                           limb.sub(b1, b0, f), f), f), f)
        return _psum_field(jnp.stack([t0, tinf]), f)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(PS(AXIS, None), PS(AXIS, None), PS(None, None)),
             out_specs=(PS(AXIS, None), PS(AXIS, None)), check_vma=False)
    def fold_step(az, bz, rt):
        from ..field import mxu

        na = mxu.fold_shared(az, rt, FR_C)
        nb = mxu.fold_shared(bz, rt, FR_C)
        z = jnp.zeros_like(na)
        return jnp.concatenate([na, z]), jnp.concatenate([nb, z])

    return jax.jit(eval_step), jax.jit(fold_step)


class MeshOuterRounds:
    """Mesh backend: az/bz sharded on the pair axis; per-round sums are ICI
    psum reductions; folds shard-local. When the live prefix no longer spans
    the mesh (< 1 pair per shard — the last ~log2(n_dev) rounds, a vanishing
    fraction of the work), the tail finishes as host ints."""

    def __init__(self, az, bz, mesh, se=None):
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
        self.az = _ingest(az, sharding=sh)
        self.bz = _ingest(bz, sharding=sh)
        self._host_az: list[int] | None = None
        self._host_bz: list[int] | None = None
        self.se = None
        if se is not None:
            self.attach_eq(se)

    def attach_eq(self, se) -> None:
        self.se = se
        self.eq_out = jnp.asarray(_flat_stack(se.E_out_vec))
        self.eq_in = jnp.asarray(_flat_stack(se.E_in_vec))

    def num_pairs(self) -> int:
        return self.live // 2

    @property
    def _on_host(self) -> bool:
        return self._host_az is not None

    def _live_pairs_local(self) -> int:
        return self.live // (2 * self.n_dev)

    def _needs_tail(self) -> bool:
        from ..parallel.stage_engine import tail_n

        if self._on_host:
            return False
        return self.live <= tail_n() or self._live_pairs_local() < 1

    def _to_host(self) -> None:
        """Gather the scattered live prefixes (each shard's local prefix)
        back into contiguous host FrVecs for the tail rounds. Compaction
        happens on device so only the live prefix crosses the wire."""
        from ..parallel.stage_engine import limbs_to_frvec

        if self._on_host:
            return
        from ..parallel.stage_engine import narrow_u16

        loc = self.n // self.n_dev
        live_loc = max(1, self.live // self.n_dev)
        idx = jnp.asarray(np.concatenate(
            [s * loc + np.arange(live_loc) for s in range(self.n_dev)]))
        az = np.asarray(narrow_u16(jnp.take(self.az, idx, axis=0)))[: self.live]
        bz = np.asarray(narrow_u16(jnp.take(self.bz, idx, axis=0)))[: self.live]
        self._host_az = limbs_to_frvec(az)
        self._host_bz = limbs_to_frvec(bz)
        self.az = self.bz = None

    def round_evals_device(self):
        if self._needs_tail():
            self._to_host()
        if self._on_host:
            return None
        off_out, off_in, h_in, _ = _gruen_level_args(self.se)
        return self.eval_step(self.az, self.bz, self.eq_out, self.eq_in,
                              jnp.uint32(off_out), jnp.uint32(off_in),
                              jnp.uint32(h_in),
                              jnp.uint32(self._live_pairs_local()))

    def round_evals(self) -> tuple[int, int]:
        dev = self.round_evals_device()
        if dev is None:
            return _gruen_tail_evals(self.se, self._host_az, self._host_bz,
                                     self.live)
        vals = limb.decode(np.asarray(dev), FR_C)
        return int(vals[0]), int(vals[1])

    def bind(self, r: int) -> None:
        if self._needs_tail():
            self._to_host()
        if self._on_host:
            if self.live > 1:
                self._host_az = self._host_az.fold_adj(r)
                self._host_bz = self._host_bz.fold_adj(r)
                self.live //= 2
            return
        from ..field import mxu
        from ..field.params import FR as _FR

        rt = jnp.asarray(mxu.scalar_toeplitz(_FR.mont(r % P)))
        self.az, self.bz = self.fold_step(self.az, self.bz, rt)
        self.live //= 2

    def final_values(self) -> tuple[int, int]:
        self._to_host()
        return self._host_az.first(), self._host_bz.first()
