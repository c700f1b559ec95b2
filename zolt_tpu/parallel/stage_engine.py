"""Generic device/mesh backend for dense product-sumcheck instances.

Most of the Jolt schedule's instances reduce per round to the same two
primitives over k dense tables (ValEvaluation: inc·wa·lt deg-3; ValFinal:
inc·wa deg-2; InstructionLookupsClaimReduction: eq·comb deg-2; the Gruen
instances factor their eq weight separately — see zkvm/device_outer):

    evals[t] = Σ_i Π_k (lo_k[i] + t·(hi_k[i] − lo_k[i]))   t = 0..degree
    fold:      tab_k[i] ← lo_k[i] + r·(hi_k[i] − lo_k[i])

This engine runs both on a single device or sharded over a jax Mesh with the
fixed-shape discipline proven out by the stage-1 backend (zkvm/device_outer):
tables keep their initial power-of-two size, the live prefix halves per round
behind a zero tail (zero factors kill tail products, so sums are exact), and
every round reuses the same two compiled programs. On the mesh, tables shard
on the pair axis, per-round sums reduce with `psum` over ICI, and folds stay
shard-local (pairs are adjacent and shards even-sized); the tail rounds where
the live prefix no longer spans the mesh finish on host.

"Passenger" tables ride along in the fold (no eval contribution) so that
instances can expose final openings of constituent polynomials (e.g. the
instruction instance proves with comb = lo + γ·left + γ²·right but must open
lo/left/right individually).

FrVec <-> device bridging is pure byte reinterpretation: both sides hold the
same Montgomery form (R = 2^256), FrVec as 32-byte LE scalars, the device as
16x16-bit LE limbs — a `<u2` view, no conversion kernels.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import limb
from ..field.limb import FR_C
from ..field.params import FR
from ..poly import dense
from .mesh import AXIS, _psum_field

P = FR.p

def stage_enabled(name: str) -> bool:
    """Per-stage device/mesh opt-in: ZOLT_TPU_DEVICE_STAGES is a comma list
    of stage tags ("stage1,stage2,stage3,stage4,opening"); unset means all.
    Each distinct (tables, degree, size) engine shape compiles its own XLA
    programs, so a cold CPU-mesh run (driver dryrun, fresh box) can scope
    the device backend to representative instances and stay inside its
    time budget — bit-identity to the host prover holds for any scope."""
    scope = os.environ.get("ZOLT_TPU_DEVICE_STAGES")
    if not scope:
        return True
    return name in {s.strip() for s in scope.split(",")}


def tail_n() -> int:
    """Narrow-tail threshold: once the live prefix is at most this many
    entries the remaining rounds move to the host FrVec tier. Rationale:
    every device round pays a full Fiat-Shamir round trip (~50 ms through
    the tunneled chip) while a narrow host round costs <1 ms in the native
    C kernels — the device should only own rounds wide enough to out-earn
    the latency. Read per call so tests/dryruns can pin it (e.g. to 0) and
    exercise the device path on tiny tables."""
    return int(os.environ.get("ZOLT_TPU_DEVICE_TAIL", "8192"))


def frvec_to_u16(v) -> np.ndarray:
    """FrVec Montgomery bytes as a zero-copy (n, 16) uint16 view — the
    minimal wire format for device uploads (half the bytes of the u32 limb
    array; the device widens after transfer, see widen_u16)."""
    if v._mont is not None:
        src = np.frombuffer(memoryview(v._mont), dtype="<u2", count=16 * v.n)
    else:
        from ..native.frvec import _mont_scalars

        src = np.frombuffer(_mont_scalars([x % P for x in v._ints]),
                            dtype="<u2")
    return src.reshape(v.n, 16)


@jax.jit
def widen_u16(x):
    """Device-side u16 -> u32 limb widening (post-upload)."""
    return x.astype(jnp.uint32)


def frvec_to_limbs(v) -> np.ndarray:
    """FrVec Montgomery bytes -> (n, 16) uint32 device limb array (view +
    widen only; both representations are the same Montgomery residue).
    Uses np.copyto into a preallocated buffer — this numpy build's bare
    astype takes a pathologically slow path (~100x) on large widenings."""
    src = frvec_to_u16(v).reshape(-1)
    out = np.empty(src.shape, np.uint32)
    np.copyto(out, src, casting="unsafe")
    return out.reshape(v.n, 16)


@jax.jit
def narrow_u16(x):
    """Device-side u32 -> u16 limb narrowing (pre-download wire form)."""
    return x.astype(jnp.uint16)


def limbs_to_frvec(arr) -> "object":
    """(n, 16) uint16/uint32 limb array -> FrVec (Montgomery bytes)."""
    from ..native.frvec import FrVec

    a = np.asarray(arr)
    if a.dtype != np.uint16:
        narrow = np.empty(a.shape, np.uint16)
        np.copyto(narrow, a, casting="unsafe")
        a = narrow
    return FrVec(a.shape[0], mont=bytearray(np.ascontiguousarray(a).tobytes()))


class EvalFuture:
    """A pending device round-eval with its own decode: `arr` is any-shape
    u32 device data; `decode(np_flat)` turns the downloaded flat u32 segment
    into the round's eval ints. Bare (k, 16) mont-limb arrays remain the
    default wire format (decoded by limb.decode); the MXU inner-product
    path returns raw product-plane sums instead."""

    __slots__ = ("arr", "_decode")

    def __init__(self, arr, decode):
        self.arr = arr
        self._decode = decode

    def decode(self, flat: np.ndarray) -> list[int]:
        return self._decode(flat)


def drain_futures(futures: list) -> list[list[int]]:
    """Download several instances' round-eval device arrays in ONE host
    transfer — each round trip through the tunneled chip costs ~30 ms, so a
    batched stage must not pay it once per instance. Entries are (k_i, 16)
    mont-limb arrays or EvalFuture wrappers; everything concatenates as one
    flat u32 transfer and decodes per segment."""
    if not futures:
        return []
    arrs = [f.arr if isinstance(f, EvalFuture) else f for f in futures]
    if len(arrs) == 1:
        big = np.asarray(arrs[0]).reshape(-1)
    else:
        big = np.asarray(jnp.concatenate(
            [a.reshape(-1) for a in arrs], axis=0))
    out, off = [], 0
    for f, a in zip(futures, arrs):
        size = int(np.prod(a.shape))
        seg = big[off: off + size]
        off += size
        if isinstance(f, EvalFuture):
            out.append(f.decode(seg))
        else:
            rows = seg.reshape(-1, 16)
            out.append([int(v)
                        for v in np.atleast_1d(limb.decode(rows, FR_C))])
    return out


def _split_pairs(tab):
    n2 = tab.shape[0] // 2
    pairs = tab.reshape(n2, 2, -1)
    lo, hi = pairs[:, 0], pairs[:, 1]
    return lo, limb.sub(hi, lo, FR_C)


@partial(jax.jit, static_argnames=("degree",))
def _evals_fixed(tables, degree: int):
    """Σ_i Π_k extensions at t=0..degree over all (zero-padded) pairs."""
    f = FR_C
    k = tables.shape[0]
    los, diffs = [], []
    for j in range(k):
        lo, d = _split_pairs(tables[j])
        los.append(lo)
        diffs.append(d)
    outs = []
    for t in range(degree + 1):
        prod = None
        for lo, d in zip(los, diffs):
            val = lo
            for _ in range(t):
                val = limb.add(val, d, f)
            prod = val if prod is None else limb.mont_mul(prod, val, f)
        outs.append(dense.sum_mod(prod, f))
    return jnp.stack(outs)


@jax.jit
def _fold_fixed_stack(tables, rt):
    """Fold every table (live prefix halves; zero tail restored). The
    shared-challenge multiply rides the MXU (field/mxu.fold_shared)."""
    from ..field import mxu

    out = []
    for j in range(tables.shape[0]):
        nb = mxu.fold_shared(tables[j], rt, FR_C)
        out.append(jnp.concatenate([nb, jnp.zeros_like(nb)]))
    return jnp.stack(out)


@partial(jax.jit, static_argnames="degree")
def _evals_mxu(tables2, degree: int):
    """Two-factor round evals as MXU byte-plane contractions: for each
    t ∈ 0..degree, Σ_i vf_t[i]·ve_t[i] is an inner product over elements —
    expressed on byte planes it is Σ_{u,v} 2^{8(u+v)}·(VF8ᵀ·VE8)[u,v], so
    the whole elementwise Montgomery-multiply + sum tree collapses into
    chunked (CH, 32)ᵀ@(CH, 32) bf16 matmuls (CH = 256 keeps f32
    accumulation exact: 256·255² < 2^24). Returns raw (degree+1, 2, 32, 32)
    u32 product-plane sums [lo16, hi16]; the host finishes with the tiny
    63-column bigint combine and one ·R⁻² (see _decode_mxu). Values are
    identical to the mont path — same terms, different summation order."""
    f = FR_C
    lo0, d0 = _split_pairs(tables2[0])
    lo1, d1 = _split_pairs(tables2[1])
    n2 = lo0.shape[0]
    ch = min(256, n2)
    nc = n2 // ch
    outs = []
    v0, v1 = lo0, lo1
    for t in range(degree + 1):
        if t > 0:
            v0 = limb.add(v0, d0, f)
            v1 = limb.add(v1, d1, f)
        from ..field import mxu

        b0 = mxu.to_bytes8(v0).reshape(nc, ch, 32).astype(jnp.bfloat16)
        b1 = mxu.to_bytes8(v1).reshape(nc, ch, 32).astype(jnp.bfloat16)
        m = jax.lax.dot_general(
            b0, b1, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (nc, 32, 32)
        mu = m.astype(jnp.uint32)
        acc_lo = jnp.sum(mu & jnp.uint32(0xFFFF), axis=0, dtype=jnp.uint32)
        acc_hi = jnp.sum(mu >> 16, axis=0, dtype=jnp.uint32)
        outs.append(jnp.stack([acc_lo, acc_hi]))
    return jnp.stack(outs)


_R_INV2 = pow(1 << 512, -1, P)
_R_INV3 = pow(1 << 768, -1, P)


def _decode_mxu(flat: np.ndarray, degree: int) -> list[int]:
    """Host finish for _evals_mxu: flat u32 of shape (degree+1, 2, 32, 32)
    -> eval ints. Collapses the (u, v) planes onto the 63 byte-column
    anti-diagonals in u64, then one bigint combine per t."""
    planes = flat.reshape(degree + 1, 2, 32, 32).astype(np.uint64)
    vals = []
    for t in range(degree + 1):
        m = planes[t, 0] + (planes[t, 1] << np.uint64(16))   # (32, 32) u64
        cols = np.zeros(63, dtype=np.uint64)
        for u in range(32):
            cols[u: u + 32] += m[u]
        tot = 0
        for c in range(62, -1, -1):
            tot = (tot << 8) + int(cols[c])
        vals.append(tot * _R_INV2 % P)
    return vals


def _make_mesh_steps(mesh, degree: int):
    from jax.sharding import PartitionSpec as PS

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(PS(None, AXIS, None),), out_specs=PS(None, None),
             check_vma=False)
    def eval_step(tables):
        f = FR_C
        k = tables.shape[0]
        los, diffs = [], []
        for j in range(k):
            lo, d = _split_pairs(tables[j])
            los.append(lo)
            diffs.append(d)
        outs = []
        for t in range(degree + 1):
            prod = None
            for lo, d in zip(los, diffs):
                val = lo
                for _ in range(t):
                    val = limb.add(val, d, f)
                prod = val if prod is None else limb.mont_mul(prod, val, f)
            outs.append(dense.sum_mod(prod, f))
        return _psum_field(jnp.stack(outs), f)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(PS(None, AXIS, None), PS(None, None)),
             out_specs=PS(None, AXIS, None), check_vma=False)
    def fold_step(tables, r):
        return _fold_fixed_stack(tables, r)

    return jax.jit(eval_step), jax.jit(fold_step)


class DeviceProductTables:
    """k product tables + passengers on one device or a mesh; see module doc.

    n_factors tables contribute to the evals; the rest only fold. The live
    prefix is tracked host-side; on a mesh the live data sits as each shard's
    local prefix and the tail rounds finish on host once the prefix no longer
    spans the mesh."""

    def __init__(self, factor_vecs, passenger_vecs=(), degree=None, mesh=None):
        self.k = len(factor_vecs)
        self.degree = degree if degree is not None else self.k
        all_vecs = list(factor_vecs) + list(passenger_vecs)

        def _n(v):
            return v.n if hasattr(v, "n") else int(v.shape[0])

        self.n = _n(all_vecs[0])
        assert all(_n(v) == self.n for v in all_vecs)
        if mesh is not None and self.n % (2 * int(mesh.devices.size)) != 0:
            # A tiny table (e.g. ValFinal at small trace lengths) can't give
            # every shard an even pair count — run it on one device instead
            # of refusing the prove.
            mesh = None
        self.mesh = mesh
        self.n_dev = int(mesh.devices.size) if mesh is not None else 1
        self.live = self.n
        from ..field import pallas_redc as predc

        # PACKED ROW layout on a real chip (pallas_redc module note): a
        # (n, 16)-resident u32 table is lane-padded 16 -> 128 by the TPU
        # tiled layout — 8× HBM bandwidth AND footprint waste on every
        # round. Single-device chip engines therefore keep tables as
        # (k, n/8, 128) u32 (same byte stream; host reshape is free) and
        # run the row-native pallas fold/eval kernels.
        self._rows = (mesh is None and self.n >= 1024 and self.n % 8 == 0
                      and predc.available())
        # FrVecs upload in the minimal 32-byte u16 wire form and widen on
        # device; tables already device-resident (parallel/device_cols —
        # raw-uploaded, device-encoded) stack without touching the host.
        if all(hasattr(v, "n") for v in all_vecs):
            stack = np.stack([frvec_to_u16(v) for v in all_vecs])
            if self._rows:
                stack = stack.reshape(len(all_vecs), self.n // 8, 128)
            widen = True
        else:
            def _dev_arr(v):
                d = (v if not hasattr(v, "n")
                     else widen_u16(jnp.asarray(frvec_to_u16(v))))
                return d.reshape(self.n // 8, 128) if self._rows else d

            stack = jnp.stack([_dev_arr(v) for v in all_vecs])
            widen = False
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as PS

            self._eval_step, self._fold_step = _make_mesh_steps(mesh, self.degree)
            self.tables = jax.device_put(
                stack, NamedSharding(mesh, PS(None, AXIS, None)))
        else:
            self.tables = jax.device_put(stack)
        if widen:
            self.tables = widen_u16(self.tables)
        self._host: list[list[int]] | None = None

    # -- host tail ----------------------------------------------------------
    def _live_local(self) -> int:
        return self.live // self.n_dev

    def _needs_tail(self) -> bool:
        if self._host is not None:
            return False
        if self.live <= tail_n():
            return True
        return self.mesh is not None and self._live_local() < 2

    def _to_host(self) -> None:
        """Move the live prefixes to host FrVecs (byte reinterpretation, no
        conversion) for the narrow-tail rounds; on a mesh, gather the
        scattered shard-local prefixes back into contiguous order. Only the
        live prefix crosses the wire — downloading the fixed-size stack
        would move the (mostly dead) full tables at tunnel bandwidth."""
        if self._host is not None:
            return
        loc = self.n // self.n_dev
        live_loc = max(1, self.live // self.n_dev)
        if self.n_dev > 1:
            # compact the scattered shard prefixes on device, then download
            idx = np.concatenate([s * loc + np.arange(live_loc)
                                  for s in range(self.n_dev)])
            arr = np.asarray(narrow_u16(jnp.take(
                self.tables, jnp.asarray(idx), axis=1)))[:, : self.live]
        elif self._rows:
            nr = max(1, self.live // 8)
            arr = np.asarray(narrow_u16(self.tables[:, :nr])) \
                .reshape(self.tables.shape[0], -1, 16)[:, : self.live]
        else:
            arr = np.asarray(narrow_u16(self.tables[:, : self.live]))
        self._host = [limbs_to_frvec(arr[j]) for j in range(arr.shape[0])]
        self.tables = None

    # -- protocol ------------------------------------------------------------
    def round_evals_device(self):
        """Device (degree+1, 16) eval array, or None once the narrow tail
        has moved to host (callers then use round_evals directly). Batching
        callers concatenate several instances' arrays into ONE download."""
        if self._needs_tail():
            self._to_host()
        if self._host is not None:
            return None
        if self.mesh is not None:
            return self._eval_step(self.tables[: self.k])
        if self._rows:
            from ..field import pallas_redc as predc

            deg = self.degree
            if self.k == 2 and self.n < (1 << 25):
                return EvalFuture(
                    predc.eval_rows_k2(self.tables[0], self.tables[1]),
                    lambda flat: predc.decode_eval_rows_k2(
                        flat, deg, P, _R_INV2))
            if self.k == 3 and self.n < (1 << 25):
                return EvalFuture(
                    predc.eval_rows_k3(self.tables[0], self.tables[1],
                                       self.tables[2]),
                    lambda flat: predc.decode_eval_rows_k3(
                        flat, deg, P, _R_INV3))
            # other k: transient (n,16) view for the mont eval path —
            # pays the padded-layout read once per round; the fold (the
            # write-heavy half) stays row-native
            t16 = self.tables.reshape(-1, self.n, 16)
            return _evals_fixed(t16[: self.k], self.degree)
        if self.k == 2:
            from ..field import pallas_redc as predc

            # real-chip only: the XLA-CPU backend takes ~16 s to COMPILE
            # this program per shape (the mont path compiles much faster),
            # which would swamp the CPU test env for zero benefit. The u32
            # plane accumulators hold nc = n2/256 chunk sums of <= 65535
            # each, so the path is exact only while nc <= 65536, i.e.
            # n2 < 2^24 pairs — larger tables take the mont path.
            if predc.available() and self.n < (1 << 25):
                deg = self.degree
                return EvalFuture(_evals_mxu(self.tables[:2], deg),
                                  lambda flat: _decode_mxu(flat, deg))
        return _evals_fixed(self.tables[: self.k], self.degree)

    def _tail_round_evals(self) -> list[int]:
        from ..native.frvec import FrVec

        if self.live // 2 == 0:
            return [0] * (self.degree + 1)
        return FrVec.prod_evals_adj(self._host[: self.k], self.degree)

    def round_evals(self) -> list[int]:
        dev = self.round_evals_device()
        if dev is None:
            return self._tail_round_evals()
        return drain_futures([dev])[0]

    def bind(self, r: int) -> None:
        if self._needs_tail():
            self._to_host()
        if self._host is not None:
            if self.live // 2 == 0:
                return
            self._host = [v.fold_adj(r) for v in self._host]
            self.live //= 2
            return
        from ..field import mxu, pallas_redc as predc

        if self.mesh is not None:
            rt = jnp.asarray(mxu.scalar_toeplitz(FR.mont(r % P)))
            self.tables = self._fold_step(self.tables, rt)
        elif self._rows:
            tp = predc.fold_toeplitz_dev(FR.mont(r % P))
            self.tables = predc.fold_rows_stack(self.tables, tp,
                                                self.live // 2)
        elif predc.available() and self.n >= 64:
            # fused Pallas fold: whole stack in one dispatch, dead-tail
            # blocks skipped (field/pallas_redc.fold_tail_stack);
            # bit-identical to the XLA tier
            tp = predc.fold_toeplitz_dev(FR.mont(r % P))
            self.tables = predc.fold_tail_stack(self.tables, tp,
                                                self.live // 2)
        else:
            rt = jnp.asarray(mxu.scalar_toeplitz(FR.mont(r % P)))
            self.tables = _fold_fixed_stack(self.tables, rt)
        self.live //= 2

    def finals(self) -> list[int]:
        """First element of every table (factors then passengers)."""
        if self._host is not None:
            return [v.first() for v in self._host]
        if self._rows:
            arr = np.asarray(self.tables[:, 0, :16])
            return [int(limb.decode(arr[j], FR_C))
                    for j in range(arr.shape[0])]
        arr = np.asarray(self.tables[:, :1])
        return [int(limb.decode(arr[j, 0], FR_C)) for j in range(arr.shape[0])]
