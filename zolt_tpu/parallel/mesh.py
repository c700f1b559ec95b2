"""Multi-chip sharding for the prover's hot loops.

The scaling axis is the evaluation-table index (cycle axis, SURVEY §5.7-§5.8):
tables of size 2^n shard across a 1-D device mesh; each sumcheck round's
p(0..d) sums are `psum` reductions over ICI; the fold new[i] = lo + r·(hi−lo)
is local as long as the pair stride stays inside a shard, which the layout
below guarantees (pairs are adjacent, shards are contiguous and even-sized).

Reference has no distributed backend (std.Thread only, src/msm/mod.zig:567-679)
— this module is the TPU-native replacement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PS

from ..field import limb
from ..field.limb import FR_C

AXIS = "shard"


def make_mesh(devices=None) -> Mesh:
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.array(devices), (AXIS,))


def shard_table(mesh: Mesh, table):
    """Place a (n, 16) limb table sharded on axis 0 over the mesh."""
    return jax.device_put(table, NamedSharding(mesh, PS(AXIS, None)))


def _local_round_evals(lo, diff, degree: int, f):
    """Partial sums of Π factors at t=0..degree for the local shard."""
    outs = []
    for t in range(degree + 1):
        prod = None
        for lo_k, diff_k in zip(lo, diff):
            val = lo_k
            for _ in range(t):
                val = limb.add(val, diff_k, f)
            prod = val if prod is None else limb.mont_mul(prod, val, f)
        # local tree-sum, then cross-chip psum is done by caller on u64-safe rep
        x = prod
        while x.shape[0] > 1:
            half = x.shape[0] // 2
            x = limb.add(x[:half], x[half:], f)
        outs.append(x[0])
    return jnp.stack(outs)  # (degree+1, 16)


def _psum_field(x, f):
    """Cross-chip modular sum of (..., 16) Montgomery values.

    psum adds raw u32 limbs; each limb < 2^16 and device count <= 2^15, so the
    raw sum cannot overflow u32. Renormalize by carry propagation, then fold the
    single overflow limb via 2^256 ≡ R (mod p) and a final conditional subtract.
    """
    s = jax.lax.psum(x, AXIS)  # limbs now < n_dev * 2^16
    # carry propagate into canonical 16-bit limbs + top carry
    limbs = [s[..., i] for i in range(16)]
    carry = jnp.zeros_like(limbs[0])
    out = []
    for i in range(16):
        v = limbs[i] + carry
        out.append(v & 0xFFFF)
        carry = v >> 16
    res = jnp.stack(out, axis=-1).astype(jnp.uint32)
    # fold carry * (2^256 mod p): carry is tiny (< n_dev); iterate to absorb
    r_vec = limb.const_vec(f.r_limbs)
    for _ in range(2):  # carry < 2^15 ⇒ two folds reach carry == 0
        prod = r_vec * carry[..., None]  # < 2^15 * 2^16 = 2^31, safe
        pl = [prod[..., i] for i in range(16)]
        c2 = jnp.zeros_like(carry)
        acc = []
        for i in range(16):
            v = res[..., i] + pl[i] + c2
            acc.append(v & 0xFFFF)
            c2 = v >> 16
        res = jnp.stack(acc, axis=-1).astype(jnp.uint32)
        carry = c2
    # final: res < 2^256 < 6p — a few conditional subtracts reach canonical range
    from ..field.limb import _cond_sub_p, _join, _split  # internal reuse

    for _ in range(6):
        res = _join(_cond_sub_p(_split(res), jnp.zeros(res.shape[:-1], jnp.uint32), f))
    return res


def make_sharded_product_round(mesh: Mesh, n_factors: int, f=FR_C):
    """Build a jitted sharded step: one sumcheck round (evals at 0..d, psum
    across chips) + fold by a provided challenge. Tables: (k, n, 16) stacked
    factors, sharded on the eval axis."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(PS(None, AXIS, None), PS(None)),
        out_specs=(PS(None, None), PS(None, AXIS, None)),
        check_vma=False,
    )
    def step(tables, r):
        lo_list, diff_list = [], []
        for k in range(n_factors):
            pairs = tables[k].reshape(tables.shape[1] // 2, 2, -1)
            lo, hi = pairs[:, 0, :], pairs[:, 1, :]
            lo_list.append(lo)
            diff_list.append(limb.sub(hi, lo, f))
        partial_evals = _local_round_evals(lo_list, diff_list, n_factors, f)
        evals = _psum_field(partial_evals, f)
        bound = jnp.stack(
            [limb.add(lo, limb.mont_mul(r[None], d, f), f) for lo, d in zip(lo_list, diff_list)]
        )
        return evals, bound

    return jax.jit(step)


def make_sharded_eval_fold(mesh: Mesh, n_factors: int, f=FR_C):
    """Separate jitted sharded programs for one sumcheck round: `evals`
    (round-poly partial sums + psum) and `fold` (challenge bind). They are
    separate because the challenge only exists after the evals are absorbed
    into the Fiat-Shamir transcript — a fused step would either run twice per
    round (discarding the first fold) or fold blind."""

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(PS(None, AXIS, None),),
        out_specs=PS(None, None),
        check_vma=False,
    )
    def evals(tables):
        lo_list, diff_list = [], []
        for k in range(n_factors):
            pairs = tables[k].reshape(tables.shape[1] // 2, 2, -1)
            lo, hi = pairs[:, 0, :], pairs[:, 1, :]
            lo_list.append(lo)
            diff_list.append(limb.sub(hi, lo, f))
        partial_evals = _local_round_evals(lo_list, diff_list, n_factors, f)
        return _psum_field(partial_evals, f)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(PS(None, AXIS, None), PS(None)),
        out_specs=PS(None, AXIS, None),
        check_vma=False,
    )
    def fold(tables, r):
        out = []
        for k in range(n_factors):
            pairs = tables[k].reshape(tables.shape[1] // 2, 2, -1)
            lo, hi = pairs[:, 0, :], pairs[:, 1, :]
            d = limb.sub(hi, lo, f)
            out.append(limb.add(lo, limb.mont_mul(r[None], d, f), f))
        return jnp.stack(out)

    return jax.jit(evals), jax.jit(fold)


def sharded_sumcheck_prove(mesh: Mesh, factor_tables, transcript, f=FR_C):
    """FULL mesh-sharded sumcheck prove of claim = Σ_x Π_k factor_k(x).

    The complete distributed prover step the framework scales by: per round,
    round-polynomial evaluations are computed shard-locally and reduced with
    `psum` over ICI, the (host) Fiat-Shamir transcript absorbs them and
    returns the challenge, and the fold runs shard-locally. When the table
    becomes too small to span the mesh (the last log2(n_dev)+1 rounds, a
    vanishing fraction of the work), the tail finishes on host.

    factor_tables: list of k python-int lists, each a power-of-two length.
    Returns (round_evals, challenges, final_values).
    """
    import numpy as np

    from ..field import FR

    P = FR.p
    k = len(factor_tables)
    n = len(factor_tables[0])
    n_dev = mesh.devices.size
    eval_step, fold_step = make_sharded_eval_fold(mesh, n_factors=k, f=f)

    tables = np.stack([np.asarray(limb.encode(t, f)) for t in factor_tables])
    dev_tables = jax.device_put(tables)
    host_tables = None

    round_evals, challenges = [], []
    while n > 1:
        if n >= 2 * n_dev and host_tables is None:
            evals_dev = eval_step(dev_tables)
            evals = [int(v) for v in limb.decode(np.asarray(evals_dev), f)]
            for e in evals:
                transcript.append_scalar(e)
            r = transcript.challenge_scalar()
            dev_tables = fold_step(dev_tables, limb.encode([r], f)[0])
        else:
            if host_tables is None:
                host_tables = [[int(v) for v in limb.decode(np.asarray(dev_tables[i]), f)]
                               for i in range(k)]
            evals = []
            for t in range(k + 1):
                s = 0
                for i in range(n // 2):
                    prod = 1
                    for ht in host_tables:
                        lo, hi = ht[2 * i], ht[2 * i + 1]
                        prod = prod * (lo + t * (hi - lo)) % P
                    s = (s + prod) % P
                evals.append(s)
            for e in evals:
                transcript.append_scalar(e)
            r = transcript.challenge_scalar()
            host_tables = [[(ht[2 * i] + r * (ht[2 * i + 1] - ht[2 * i])) % P
                            for i in range(n // 2)] for ht in host_tables]
        round_evals.append(evals)
        challenges.append(r)
        n //= 2

    finals = [ht[0] for ht in host_tables] if host_tables is not None else \
        [int(limb.decode(np.asarray(dev_tables[i]), f)[0]) for i in range(k)]
    return round_evals, challenges, finals
