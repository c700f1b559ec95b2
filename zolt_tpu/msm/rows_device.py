"""Device (TPU) Dory row commitments: bit-plane subset-sum MSMs.

The reference's Dory commit hot loop is a per-row G1 MSM of each matrix row
against the fixed g1_vec basis (src/poly/commitment/dory.zig:989-1042). On
this framework's commit path the row scalars are TINY — 4-bit instruction /
ram / bytecode chunk values (zkvm/commitments.py builders) or 0/1 one-hot
cube indicators — so a row MSM is a weighted sum of at most 4 bit-plane
subset sums over the fixed basis:

    rowMSM = Σ_k 2^k · Σ_{c : bit k of scalar_c set} P_c      (k < 4)

With a per-SRS precomputed table of all 256 subset sums of every 8-column
group (native bn254_g1_subset_tables_mont — emitted in Montgomery residue
bytes, byte-identical to the device's 16x16-bit limb form), one plane
collapses to a single gather (rows x cols/8 lanes) plus a log2(cols/8)
batched Jacobian tree-add: ~n/8 EC adds per plane instead of the host
tier's ~n bucket adds, all vectorized on the VPU, with the fixed basis
uploaded once per SRS.

The host finishes with one batched-affine normalization (Montgomery
inversion trick) and the usual cached-line multi-pairing; results are
bit-identical to the host C tier (asserted in tests/test_rows_device.py and
by every proof-bytes golden test when the device path is enabled).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import device as dev
from ..field import limb
from ..field.limb import FP_C
from ..field.params import FP

GROUP = 8          # columns per subset table
# Gathered point slots per dispatch. The gather materializes
# slots x 16 u32 limbs x 3 Jacobian coords (192 B/slot) and the pairwise
# tree-add keeps same-order temporaries alive, so the cap bounds peak HBM
# at ~0.4-1.5 GB per dispatch regardless of matrix size (a 2^24-eval poly
# uncapped gathered 6.4 GB and OOM'd a 16 GB chip; dispatches are async,
# so chunking costs no extra tunnel round trips).
SLOT_CAP = 1 << 21


@partial(jax.jit, static_argnames=())
def _plane_sums(tx, ty, tz, idx):
    """Subset-sum gather + tree-add: idx (B, rows, nch) int32 indexes the
    (ntab, 16) Montgomery limb tables; returns (B, rows, 16) x3 Jacobian
    plane sums. The tree is a fully batched pairwise Jacobian add (edge
    cases handled inside dev.pt_add), log2(nch) levels."""
    gx = jnp.take(tx, idx, axis=0)
    gy = jnp.take(ty, idx, axis=0)
    gz = jnp.take(tz, idx, axis=0)
    n = idx.shape[-1]
    while n > 1:
        h = n // 2
        gx, gy, gz = dev.pt_add(
            (gx[..., :h, :], gy[..., :h, :], gz[..., :h, :]),
            (gx[..., h:, :], gy[..., h:, :], gz[..., h:, :]))
        n = h
    return gx[..., 0, :], gy[..., 0, :], gz[..., 0, :]


@partial(jax.jit, static_argnames=("nplanes",))
def _horner_planes(px, py, pz, nplanes: int):
    """Combine per-poly plane sums with weights 2^k (k = plane index):
    inputs (npoly, nplanes, rows, 16); Horner with batched doublings."""
    acc = (px[:, -1], py[:, -1], pz[:, -1])
    for k in range(nplanes - 2, -1, -1):
        acc = dev.pt_double(acc)
        acc = dev.pt_add(acc, (px[:, k], py[:, k], pz[:, k]))
    return acc


def _batch_affine(xs, ys, zs):
    """Host batched Jacobian->affine: one modular inversion for the whole
    batch (Montgomery trick). xs/ys/zs: lists of ints; returns list of
    (x, y) affine tuples or None for identity."""
    p = FP.p
    n = len(xs)
    pref = [1] * (n + 1)
    zz = [z if z else 1 for z in zs]
    for i in range(n):
        pref[i + 1] = pref[i] * zz[i] % p
    inv = pow(pref[n], p - 2, p)
    out: list = [None] * n
    for i in range(n - 1, -1, -1):
        zinv = inv * pref[i] % p
        inv = inv * zz[i] % p
        if zs[i] == 0:
            continue
        zi2 = zinv * zinv % p
        out[i] = (xs[i] * zi2 % p, ys[i] * zi2 % p * zinv % p)
    return out


class DeviceRowMSM:
    """Fixed-basis row-MSM engine for one SRS basis prefix.

    Uploads the 8-column subset tables once (device-resident); `commit_rows`
    then turns stacks of small-scalar (value < 16) polynomials into per-row
    affine commitments. Returns None from the constructor path if the
    native table builder is unavailable (callers fall back to the host
    tier)."""

    def __init__(self, g1_vec, num_cols: int):
        from ..native import g1_subset_tables_mont

        assert num_cols % GROUP == 0 and num_cols >= GROUP
        self.num_cols = num_cols
        built = g1_subset_tables_mont(list(g1_vec[:num_cols]))
        if built is None:
            raise RuntimeError("native tier unavailable for subset tables")
        tabs, valid = built
        self.nch = num_cols // GROUP
        ntab = self.nch * 256
        # Montgomery bytes -> device 16x16-bit limbs (pure reinterpretation)
        tx16 = tabs[:, :32].copy().view("<u2").reshape(ntab, 16)
        ty16 = tabs[:, 32:].copy().view("<u2").reshape(ntab, 16)
        one = np.asarray(limb.encode([1], FP_C)).reshape(16).astype(np.uint32)
        tz = np.where(valid[:, None].astype(bool), one[None, :],
                      np.uint32(0)).astype(np.uint32)
        self.tx = jax.device_put(jnp.asarray(tx16.astype(np.uint32)))
        self.ty = jax.device_put(jnp.asarray(ty16.astype(np.uint32)))
        self.tz = jax.device_put(jnp.asarray(tz))

    # -- mask building (host, vectorized) ---------------------------------
    def _plane_indices(self, vals: np.ndarray, nplanes: int) -> np.ndarray:
        """vals (rows, cols) uint8 (< 2^nplanes) -> (nplanes, rows, nch)
        int32 table indices (group*256 + subset byte)."""
        rows = vals.shape[0]
        out = np.empty((nplanes, rows, self.nch), np.int32)
        base = (np.arange(self.nch, dtype=np.int32) * 256)[None, :]
        for k in range(nplanes):
            bits = ((vals >> k) & 1).astype(np.uint8)
            by = np.packbits(bits.reshape(rows, self.nch, GROUP),
                             axis=-1, bitorder="little")[..., 0]
            out[k] = base + by.astype(np.int32)
        return out

    def commit_rows(self, polys: list[np.ndarray], nplanes: int = 4):
        """polys: list of 1-D uint8 arrays (values < 2^nplanes), each any
        length <= rows*num_cols; returns per poly a list of used_rows
        affine points (None = identity), bit-identical to the host MSM."""
        cols = self.num_cols
        metas = []          # (poly index, used_rows)
        idx_stack = []
        rows_max = 0
        for v in polys:
            n = len(v)
            used = -(-n // cols) if n else 1
            rows_max = max(rows_max, used)
            metas.append(used)
        for v in polys:
            n = len(v)
            pad = np.zeros(rows_max * cols, np.uint8)
            pad[:n] = v
            idx_stack.append(self._plane_indices(
                pad.reshape(rows_max, cols), nplanes))
        # flatten to independent plane-rows and chunk by the slot cap; the
        # block size is a pure function of nch (one compiled shape per
        # engine, plus a few smaller pow2 shapes for short batches)
        planes = np.concatenate(idx_stack, axis=0).reshape(-1, self.nch)
        total = planes.shape[0]
        rblk = max(8, 1 << max(0, (SLOT_CAP // self.nch).bit_length() - 1))
        if total < rblk:
            rblk = 1 << max(3, (total - 1).bit_length())
        outs_x, outs_y, outs_z = [], [], []
        for off in range(0, total, rblk):
            chunk = planes[off: off + rblk]
            if chunk.shape[0] < rblk:
                fill = np.zeros((rblk - chunk.shape[0], self.nch), np.int32)
                chunk = np.concatenate([chunk, fill], axis=0)
            sx, sy, sz = _plane_sums(self.tx, self.ty, self.tz,
                                     jnp.asarray(chunk))
            outs_x.append(sx)
            outs_y.append(sy)
            outs_z.append(sz)
        px = jnp.concatenate(outs_x, axis=0)[:total]
        py = jnp.concatenate(outs_y, axis=0)[:total]
        pz = jnp.concatenate(outs_z, axis=0)[:total]
        npoly = len(polys)
        px = px.reshape(npoly, nplanes, rows_max, 16)
        py = py.reshape(npoly, nplanes, rows_max, 16)
        pz = pz.reshape(npoly, nplanes, rows_max, 16)
        rx, ry, rz = _horner_planes(px, py, pz, nplanes)
        # ONE download, then host batched-affine normalization
        hx = np.asarray(rx).reshape(npoly * rows_max, 16)
        hy = np.asarray(ry).reshape(npoly * rows_max, 16)
        hz = np.asarray(rz).reshape(npoly * rows_max, 16)
        xs = [int(v) for v in np.atleast_1d(limb.decode(hx, FP_C))]
        ys = [int(v) for v in np.atleast_1d(limb.decode(hy, FP_C))]
        zs = [int(v) for v in np.atleast_1d(limb.decode(hz, FP_C))]
        aff = _batch_affine(xs, ys, zs)
        out = []
        for i, used in enumerate(metas):
            out.append(aff[i * rows_max: i * rows_max + used])
        return out


_ENGINES: dict = {}


def get_engine(srs, num_cols: int):
    """Per-(srs, num_cols) DeviceRowMSM cache, or None when the native
    table builder or a usable device is unavailable."""
    key = (id(srs), num_cols)
    if key not in _ENGINES:
        try:
            _ENGINES[key] = DeviceRowMSM(srs.g1_vec, num_cols)
        except Exception:
            _ENGINES[key] = None
    return _ENGINES[key]
