"""Dory polynomial commitment scheme (Jolt-compatible GT commitments).

Commit: the evaluation vector is a 2^ν × 2^σ matrix (σ = (n+1)//2); each row is
a G1 MSM against g1_vec and the commitment is Π_row e(rowMSM, g2_vec[row]) ∈ GT
— matching Jolt's matrix layout (reference: src/poly/commitment/dory.zig:989-
1042). One shared final exponentiation via multi_pairing.

SRS: deterministic generators from SHA3-256("Jolt Dory URS seed") with
per-index SHA3(seed‖idx_le‖"G1"/"G2") scalars (dory.zig:setup+generateG1Point),
plus the JOLT_DORY_SRS_V1 file loader.

Open: the reduce-and-fold VMV protocol with Blake2b transcript challenges
(dory.zig:1404-...): VMV message (C, D2, E1) → per-round FirstReduce
(D1L/R, D2L/R, E1β, E2β) + β, SecondReduce (C±, E1±, E2±) + α folds → final
scalar-product message. verify_with_transcript REALLY checks the folded
relation: it replays the transcript, folds the Γ generators with the χ/Δ
ladders, and verifies the final pairing equations — going beyond the
reference, whose verify is a placeholder returning true (dory.zig:1381-1396).

Arkworks point compression follows the arkworks flag convention: 32-byte (G1) /
64-byte (G2) little-endian x with infinity (0x40) and y-lexicographically-
largest (0x80) flags in the top byte.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ..curve import g2 as G2
from ..curve import host as G1
from ..curve.pairing import multi_pairing
from ..field import tower as tw
from ..field.params import FP, FR
from ..msm import msm as g1_msm

P = FR.p
PQ = FP.p


# ---------------------------------------------------------------------------
# Arkworks compression
# ---------------------------------------------------------------------------

def compress_g1(pt) -> bytes:
    if pt is None:
        out = bytearray(32)
        out[31] |= 0x40
        return bytes(out)
    x, y = pt
    out = bytearray(x.to_bytes(32, "little"))
    if y > PQ - y:  # y lexicographically largest
        out[31] |= 0x80
    return bytes(out)


def decompress_g1(data: bytes):
    flags = data[31]
    if flags & 0x40:
        return None
    x = int.from_bytes(data[:31] + bytes([flags & 0x3F]), "little")
    y2 = (pow(x, 3, PQ) + 3) % PQ
    y = _sqrt_fp(y2)
    assert y is not None, "not on curve"
    if bool(flags & 0x80) != (y > PQ - y):
        y = PQ - y
    return (x, y)


def compress_g2(pt) -> bytes:
    if pt is None:
        out = bytearray(64)
        out[63] |= 0x40
        return bytes(out)
    (x0, x1), (y0, y1) = pt
    out = bytearray(x0.to_bytes(32, "little") + x1.to_bytes(32, "little"))
    # y largest: compare (y1, y0) lexicographically vs its negation
    ny0, ny1 = (-y0) % PQ, (-y1) % PQ
    if (y1, y0) > (ny1, ny0):
        out[63] |= 0x80
    return bytes(out)


def _sqrt_fp(a: int) -> int | None:
    """Square root in Fp (p ≡ 3 mod 4 — direct exponent)."""
    r = pow(a, (PQ + 1) // 4, PQ)
    return r if r * r % PQ == a % PQ else None


def _sqrt_fp2(a0: int, a1: int) -> tuple[int, int] | None:
    """Square root in Fp2 = Fp[u]/(u²+1) via the norm method."""
    if a1 == 0:
        r = _sqrt_fp(a0)
        if r is not None:
            return (r, 0)
        # a0 is a non-residue: sqrt is purely imaginary, (x·u)² = -x²
        r = _sqrt_fp((-a0) % PQ)
        return None if r is None else (0, r)
    n = (a0 * a0 + a1 * a1) % PQ
    lam = _sqrt_fp(n)
    if lam is None:
        return None
    inv2 = pow(2, -1, PQ)
    delta = (a0 + lam) * inv2 % PQ
    x0 = _sqrt_fp(delta)
    if x0 is None:
        delta = (a0 - lam) * inv2 % PQ
        x0 = _sqrt_fp(delta)
        if x0 is None:
            return None
    x1 = a1 * pow(2 * x0 % PQ, -1, PQ) % PQ
    return (x0, x1)


def decompress_g2(data: bytes):
    flags = data[63]
    if flags & 0x40:
        return None
    x0 = int.from_bytes(data[:32], "little")
    x1 = int.from_bytes(data[32:63] + bytes([flags & 0x3F]), "little")
    # y² = x³ + 3/(9+u) on the twist
    xx0 = (x0 * x0 - x1 * x1) % PQ
    xx1 = 2 * x0 * x1 % PQ
    x3_0 = (xx0 * x0 - xx1 * x1) % PQ
    x3_1 = (xx0 * x1 + xx1 * x0) % PQ
    # b' = 3/(9+u) = 3·(9-u)/82
    inv82 = pow(82, -1, PQ)
    b0 = 27 * inv82 % PQ
    b1 = (-3 * inv82) % PQ
    y2_0 = (x3_0 + b0) % PQ
    y2_1 = (x3_1 + b1) % PQ
    rt = _sqrt_fp2(y2_0, y2_1)
    assert rt is not None, "G2 point not on curve"
    y0, y1 = rt
    ny0, ny1 = (-y0) % PQ, (-y1) % PQ
    if bool(flags & 0x80) != ((y1, y0) > (ny1, ny0)):
        y0, y1 = ny0, ny1
    return ((x0, x1), (y0, y1))


# ---------------------------------------------------------------------------
# SRS
# ---------------------------------------------------------------------------

@dataclass
class DorySRS:
    g1_vec: list
    g2_vec: list
    sigma: int
    nu: int


def _derive_scalar(seed: bytes, index: int, tag: bytes) -> int:
    h = hashlib.sha3_256()
    h.update(seed)
    h.update(index.to_bytes(8, "little"))
    h.update(tag)
    return int.from_bytes(h.digest(), "little") % P


_SETUP_CACHE: dict[int, DorySRS] = {}


def setup(max_num_vars: int) -> DorySRS:
    """Deterministic SHA3-seeded SRS. Memoized per size: the derivation is a
    pure function of `max_num_vars`, every prove of the same trace size reuses
    the same object, and the per-SRS caches (`_beta_g2_cache`, Miller-line
    precomputes) hit across proves instead of being rebuilt each call."""
    cached = _SETUP_CACHE.get(max_num_vars)
    if cached is not None:
        return cached
    sigma = (max_num_vars + 1) // 2
    nu = max_num_vars - sigma
    seed = hashlib.sha3_256(b"Jolt Dory URS seed").digest()
    g1_vec = [G1.scalar_mul(G1.G1_GEN, _derive_scalar(seed, i, b"G1"))
              for i in range(1 << sigma)]
    from ..native import g2_batch_mul_native

    _g2s = [_derive_scalar(seed, (1 << sigma) + i, b"G2") for i in range(1 << nu)]
    g2_vec = g2_batch_mul_native(G2.G2_GEN, _g2s) or \
        [G2.scalar_mul(G2.G2_GEN, k) for k in _g2s]
    srs = DorySRS(g1_vec=g1_vec, g2_vec=g2_vec, sigma=sigma, nu=nu)
    _SETUP_CACHE[max_num_vars] = srs
    return srs


def load_srs_file(path: str) -> DorySRS:
    """JOLT_DORY_SRS_V1 format: magic, sigma/nu, arkworks-uncompressed points
    (reference dory.zig:752-822)."""
    with open(path, "rb") as f:
        data = f.read()
    magic = b"JOLT_DORY_SRS_V1"
    assert data[: len(magic)] == magic, "bad SRS magic"
    off = len(magic)
    sigma = int.from_bytes(data[off : off + 4], "little")
    nu = int.from_bytes(data[off + 4 : off + 8], "little")
    off += 8
    g1_vec = []
    for _ in range(1 << sigma):
        x = int.from_bytes(data[off : off + 32], "little")
        y = int.from_bytes(data[off + 32 : off + 64], "little")
        g1_vec.append(None if x == 0 and y == 0 else (x, y))
        off += 64
    g2_vec = []
    for _ in range(1 << nu):
        x0 = int.from_bytes(data[off : off + 32], "little")
        x1 = int.from_bytes(data[off + 32 : off + 64], "little")
        y0 = int.from_bytes(data[off + 64 : off + 96], "little")
        y1 = int.from_bytes(data[off + 96 : off + 128], "little")
        g2_vec.append(((x0, x1), (y0, y1)))
        off += 128
    return DorySRS(g1_vec=g1_vec, g2_vec=g2_vec, sigma=sigma, nu=nu)


# ---------------------------------------------------------------------------
# Commit
# ---------------------------------------------------------------------------

def _matrix_dims(n_evals: int) -> tuple[int, int]:
    num_vars = max(1, (n_evals - 1).bit_length())
    sigma = (num_vars + 1) // 2
    nu = num_vars - sigma
    return sigma, nu


def row_commitments(srs: DorySRS, evals, num_vars: int | None = None) -> list:
    """Per-row G1 MSMs of the 2^σ × 2^ν matrix. `evals` is a list of ints or
    an FrVec; with `num_vars` the matrix dims come from the target cube (the
    eval vector may be SHORTER — missing rows are the identity, exactly as if
    zero-padded, so short polys commit without materializing the padding)."""
    n_evals = len(evals)
    if num_vars is None:
        sigma, nu = _matrix_dims(n_evals)
    else:
        assert n_evals <= 1 << num_vars
        sigma = (num_vars + 1) // 2
        nu = num_vars - sigma
    num_cols = 1 << sigma
    assert len(srs.g1_vec) >= num_cols, (
        f"SRS too small: {len(srs.g1_vec)} G1 points < {num_cols} columns")
    from ..native import g1_msm_rows_canon_native, g1_msm_rows_native
    from ..native.frvec import FrVec

    used_rows = -(-n_evals // num_cols)
    native = None
    if isinstance(evals, FrVec):
        canon = evals.to_canonical_bytes()
        if len(canon) < 32 * used_rows * num_cols:  # partial last row
            canon += bytearray(32 * used_rows * num_cols - len(canon))
        native = g1_msm_rows_canon_native(srs.g1_vec[:num_cols], canon,
                                          used_rows)
        if native is None:
            evals = evals.to_ints()
    if native is None:
        full_rows = n_evals // num_cols
        if full_rows:
            scalar_rows = [evals[r * num_cols:(r + 1) * num_cols]
                           for r in range(full_rows)]
            native = g1_msm_rows_native(srs.g1_vec[:num_cols], scalar_rows)
        else:
            native = [] if g1_msm_rows_native(srs.g1_vec[:1], []) is not None else None
    rows = []
    for r in range(1 << nu):
        if r * num_cols >= n_evals:
            rows.append(None)
        elif native is not None and r < len(native):
            rows.append(native[r])
        else:
            seg = evals[r * num_cols : (r + 1) * num_cols]
            rows.append(g1_msm(srs.g1_vec[: len(seg)], [v % P for v in seg]))
    return rows


def pair_rows(srs: DorySRS, rows):
    """GT from row commitments: Π_i e(rows[i], g2_vec[i]) with cached
    precomputed Miller lines and a shared accumulator. rows may be shorter
    than 2^nu (missing/None rows are identity factors)."""
    from ..native import multi_pairing_fixed_native

    out = multi_pairing_fixed_native(rows, srs.g2_vec, len(rows))
    if out is not None:
        return out
    pairs = [(rc, srs.g2_vec[i]) for i, rc in enumerate(rows)
             if rc is not None and i < len(srs.g2_vec)]
    return multi_pairing(pairs)


def commit(srs: DorySRS, evals, num_vars: int | None = None):
    """GT commitment: Π_row e(rowMSM, g2_vec[row]). The G2 side is the fixed
    SRS vector, so the multi-pairing runs on cached precomputed Miller lines
    with a shared accumulator (one fp12 squaring chain for all rows)."""
    return pair_rows(srs, row_commitments(srs, evals, num_vars))


def commitment_bytes(gt) -> bytes:
    return tw.fp12_to_bytes(gt)


def square_embedding_point(point: list[int]) -> list[int]:
    """Canonical square embedding of an odd-num_vars (rectangular, σ = ν+1)
    Dory claim: padding the 2^σ × 2^ν matrix with zero ROWS to 2^σ × 2^σ
    leaves the GT commitment unchanged (zero rows contribute identity
    pairing factors) and the padded polynomial evaluates to the original
    value when the new row variables are fixed to 0 — `_split_point` binds
    rows with point[σ:], so the extra zeros are appended there. Opening and
    REAL algebraic verification (`verify_with_transcript`) then run on the
    square layout.

    The reference's own rectangular joint-opening artifacts remain outside
    algebraic verification for a different reason: `open_fixed` (which they
    use, dory.zig:1404 non-transcript path) derives its challenges
    deterministically rather than by Fiat-Shamir, so no verifier could
    soundly accept them; they are checked structurally (`verify_structure`,
    matching the reference's own placeholder verify, dory.zig:1381-1396)."""
    n = len(point)
    if n % 2 == 0:
        return list(point)
    sigma = (n + 1) // 2
    return list(point[:sigma]) + [0] * (sigma - (n - sigma)) + list(point[sigma:])


# ---------------------------------------------------------------------------
# Open (reduce-and-fold with transcript)
# ---------------------------------------------------------------------------

@dataclass
class VMVMessage:
    c: tuple
    d2: tuple
    e1: object


@dataclass
class FirstReduceMessage:
    d1_left: tuple
    d1_right: tuple
    d2_left: tuple
    d2_right: tuple
    e1_beta: object
    e2_beta: object


@dataclass
class SecondReduceMessage:
    c_plus: tuple
    c_minus: tuple
    e1_plus: object
    e1_minus: object
    e2_plus: object
    e2_minus: object


@dataclass
class DoryProof:
    vmv: VMVMessage
    first: list[FirstReduceMessage]
    second: list[SecondReduceMessage]
    final_e1: object
    final_e2: object
    nu: int
    sigma: int


def _lagrange_basis(point: list[int]) -> list[int]:
    """Multilinear Lagrange basis over a point (big-endian doubling)."""
    out = [1]
    for p_i in reversed(point):
        nxt = [0] * (2 * len(out))
        for i, v in enumerate(out):
            y = v * p_i % P
            nxt[i + len(out)] = y
            nxt[i] = (v - y) % P
        out = nxt
    return out


def _split_point(point: list[int], sigma: int, nu: int) -> tuple[list[int], list[int]]:
    n = len(point)
    if n == 0:
        return [1], [1]
    if n <= sigma:
        return [1], _lagrange_basis(point)
    return _lagrange_basis(point[sigma:]), _lagrange_basis(point[:sigma])


def _g1_scale_add(acc, pt, s):
    return G1.add(acc, G1.scalar_mul(pt, s))


def _msm_g2(points, scalars):
    acc = None
    for pt, s in zip(points, scalars):
        acc = G2.add(acc, G2.scalar_mul(pt, s % P))
    return acc


def open_with_transcript(srs: DorySRS, evals: list[int], point: list[int],
                         transcript, row_comms=None) -> DoryProof:
    sigma, nu = srs.sigma, srs.nu
    num_rounds = max(nu, sigma)
    num_cols = 1 << sigma

    rows = row_comms if row_comms is not None else row_commitments(srs, evals)
    left_vec, right_vec = _split_point(point, sigma, nu)
    left_vec = (left_vec + [0] * (1 << nu))[: 1 << nu]
    right_vec = (right_vec + [0] * num_cols)[:num_cols]

    # v = L^T · M (row-axpy accumulation on the native Fr tier)
    from ..native.frvec import FrVec

    _acc = FrVec.zeros(num_cols)
    if isinstance(evals, FrVec) and evals._mont is not None:
        mont = evals._mont
        for r in range(1 << nu):
            off = r * num_cols * 32
            if off >= 32 * evals.n:
                break
            # cap at 32·n: the backing buffer may be longer than the live
            # vector (in-place shrinking folds leave a stale tail)
            seg_b = bytearray(mont[off : min(off + num_cols * 32,
                                             32 * evals.n)])
            if len(seg_b) < num_cols * 32:
                seg_b += bytearray(num_cols * 32 - len(seg_b))
            _acc.axpy_(FrVec(num_cols, mont=seg_b), left_vec[r])
    else:
        if isinstance(evals, FrVec):
            evals = evals.to_ints()
        for r in range(1 << nu):
            seg = evals[r * num_cols : (r + 1) * num_cols]
            if not seg:
                break
            if len(seg) < num_cols:
                seg = list(seg) + [0] * (num_cols - len(seg))
            _acc.axpy_(FrVec.from_ints(seg), left_vec[r])
    v_vec = _acc.to_ints()

    padded_rows = (rows + [None] * num_cols)[:num_cols]

    t_vec_v = g1_msm([p if p else None for p in padded_rows], v_vec) if any(padded_rows) else None
    c_gt = multi_pairing([(t_vec_v, srs.g2_vec[0])]) if t_vec_v else tw.FP12_ONE
    d2_gt = multi_pairing([(g1_msm(srs.g1_vec[: len(v_vec)], v_vec), srs.g2_vec[0])])
    e1_pt = g1_msm((rows + [None] * (1 << nu))[: 1 << nu], left_vec) if any(rows) else None
    vmv = VMVMessage(c=c_gt, d2=d2_gt, e1=e1_pt)

    transcript.append_gt(tw.fp12_to_bytes(vmv.c))
    transcript.append_gt(tw.fp12_to_bytes(vmv.d2))
    transcript.append_bytes(compress_g1(vmv.e1))

    vec_len = num_cols
    v1 = list(padded_rows)
    from ..native import g2_batch_mul_native

    _v2n = g2_batch_mul_native(srs.g2_vec[0], v_vec)
    v2 = ([p if v % P else None for p, v in zip(_v2n, v_vec)] if _v2n is not None
          else [G2.scalar_mul(srs.g2_vec[0], v) if v else None for v in v_vec])
    s1 = list(right_vec)
    s2 = (left_vec + [0] * vec_len)[:vec_len]

    cur_col, cur_row = 1 << sigma, 1 << nu
    firsts, seconds = [], []
    for _ in range(num_rounds):
        cur = max(cur_col, cur_row)
        n2 = cur // 2
        g2_size = min(n2, cur_row)
        g1_size = min(n2, cur_col)

        from ..native import multi_pairing_fixed_native

        d1l = multi_pairing_fixed_native(v1[:g2_size], srs.g2_vec, g2_size)
        if d1l is None:
            d1l = multi_pairing(list(zip(v1[:g2_size], srs.g2_vec[:g2_size])))
        d1r = multi_pairing_fixed_native(v1[n2 : n2 + g2_size], srs.g2_vec, g2_size)
        if d1r is None:
            d1r = multi_pairing(list(zip(v1[n2 : n2 + g2_size], srs.g2_vec[:g2_size])))
        d2l = multi_pairing(list(zip(srs.g1_vec[:g1_size], v2[:g1_size])))
        d2r = multi_pairing(list(zip(srs.g1_vec[:g1_size], v2[n2 : n2 + g1_size])))
        e1b = g1_msm(srs.g1_vec[:cur_col], s2[:cur_col])
        e2b = _msm_g2(srs.g2_vec[:cur_row], s1[:cur_row])
        fm = FirstReduceMessage(d1l, d1r, d2l, d2r, e1b, e2b)
        firsts.append(fm)

        transcript.append_gt(tw.fp12_to_bytes(d1l))
        transcript.append_gt(tw.fp12_to_bytes(d1r))
        transcript.append_gt(tw.fp12_to_bytes(d2l))
        transcript.append_gt(tw.fp12_to_bytes(d2r))
        transcript.append_bytes(compress_g1(e1b))
        transcript.append_bytes(compress_g2(e2b))
        beta = transcript.challenge_scalar()
        beta_inv = pow(beta, -1, P) if beta else 1

        from ..native import g1_fold_native, g2_fold_native

        _f1 = g1_fold_native(srs.g1_vec[:cur_col], v1[:cur_col], beta)
        if _f1 is not None:
            v1[:cur_col] = _f1
        else:
            for i in range(cur_col):
                v1[i] = _g1_scale_add(v1[i], srs.g1_vec[i], beta)
        _f2 = g2_fold_native(srs.g2_vec[:cur_row], v2[:cur_row], beta_inv)
        if _f2 is not None:
            v2[:cur_row] = _f2
        else:
            for i in range(cur_row):
                v2[i] = G2.add(v2[i], G2.scalar_mul(srs.g2_vec[i], beta_inv))

        v1h = min(n2, cur_col)
        v2h = min(n2, cur_row)
        cp = multi_pairing(list(zip(v1[:v1h], v2[n2 : n2 + v2h])))
        cm = multi_pairing(list(zip(v1[n2 : n2 + v1h], v2[:v2h])))
        e1p = g1_msm(v1[:v1h], s2[n2 : n2 + v1h]) if v1h else None
        e1m = g1_msm(v1[n2 : n2 + v1h], s2[:v1h]) if v1h else None
        e2p = _msm_g2(v2[n2 : n2 + v2h], s1[:v2h])
        e2m = _msm_g2(v2[:v2h], s1[n2 : n2 + v2h])
        sm = SecondReduceMessage(cp, cm, e1p, e1m, e2p, e2m)
        seconds.append(sm)

        transcript.append_gt(tw.fp12_to_bytes(cp))
        transcript.append_gt(tw.fp12_to_bytes(cm))
        transcript.append_bytes(compress_g1(e1p))
        transcript.append_bytes(compress_g1(e1m))
        transcript.append_bytes(compress_g2(e2p))
        transcript.append_bytes(compress_g2(e2m))
        alpha = transcript.challenge_scalar()
        alpha_inv = pow(alpha, -1, P) if alpha else 1

        _f1 = g1_fold_native(v1[:v1h], v1[n2:n2 + v1h], alpha)
        if _f1 is not None:
            v1[:v1h] = _f1
        else:
            for i in range(v1h):
                v1[i] = G1.add(G1.scalar_mul(v1[i], alpha), v1[i + n2])
        _f2 = g2_fold_native(v2[:v2h], v2[n2:n2 + v2h], alpha_inv)
        if _f2 is not None:
            v2[:v2h] = _f2
        else:
            for i in range(v2h):
                v2[i] = G2.add(G2.scalar_mul(v2[i], alpha_inv), v2[i + n2])
        for i in range(v2h):
            s1[i] = (alpha * s1[i] + s1[i + n2]) % P
        for i in range(v1h):
            s2[i] = (alpha_inv * s2[i] + s2[i + n2]) % P

        cur_col = max(1, cur_col // 2)
        cur_row = max(1, cur_row // 2)

    gamma = transcript.challenge_scalar()
    gamma_inv = pow(gamma, -1, P) if gamma else 1
    final_e1 = G1.add(v1[0], G1.scalar_mul(G1.G1_GEN, gamma * s1[0] % P))
    final_e2 = G2.add(v2[0], G2.scalar_mul(G2.G2_GEN, gamma_inv * s2[0] % P))
    return DoryProof(vmv=vmv, first=firsts, second=seconds,
                     final_e1=final_e1, final_e2=final_e2, nu=nu, sigma=sigma)


def _smul1(pt, k: int):
    k %= P
    if pt is None or k == 0:
        return None
    return G1.scalar_mul(pt, k)


def _smul2(pt, k: int):
    k %= P
    if pt is None or k == 0:
        return None
    return G2.scalar_mul(pt, k)


_LADDER_CACHE: dict = {}


def verifier_ladders(srs: DorySRS) -> dict:
    """Per-level SRS pairing constants for the reduce verifier:
    chi[k]   = <Γ1[:k], Γ2[:k]>          (k a power of two)
    d1r[k]   = <Γ1[k:2k], Γ2[:k]>
    d2r[k]   = <Γ1[:k], Γ2[k:2k]>
    Mirrors the export's DoryVerifierSetup (reference preprocessing.zig:
    854-975); cached per SRS identity."""
    key = (id(srs), srs.sigma, srs.nu)
    if key in _LADDER_CACHE:
        return _LADDER_CACHE[key]
    chi, d1r, d2r = {}, {}, {}
    k = 1
    limit = min(len(srs.g1_vec), len(srs.g2_vec))
    while k <= limit:
        chi[k] = multi_pairing(list(zip(srs.g1_vec[:k], srs.g2_vec[:k])))
        if 2 * k <= len(srs.g1_vec):
            d1r[k] = multi_pairing(list(zip(srs.g1_vec[k:2 * k], srs.g2_vec[:k])))
        if 2 * k <= len(srs.g2_vec):
            d2r[k] = multi_pairing(list(zip(srs.g1_vec[:k], srs.g2_vec[k:2 * k])))
        k *= 2
    out = {"chi": chi, "d1r": d1r, "d2r": d2r}
    _LADDER_CACHE[key] = out
    return out


def verify_with_transcript(srs: DorySRS, commitment, point: list[int],
                           claimed_eval: int, proof: DoryProof,
                           transcript) -> bool:
    """REAL algebraic Dory verification of `open_with_transcript`.

    The reference's verify is a placeholder that returns true
    (dory.zig:1381-1396); this implements the actual Dory-Reduce verifier
    (Lee 2020) for the square matrix layout (σ == ν): track
    (C, D1, D2, E1, E2) through the β/α rounds using the χ/Δ SRS ladders,
    fold the public s-vectors alongside, and check the final scalar-product
    pairing equation
        e(E1_fin, E2_fin) == C · e(γ⁻¹E1, h2) · e(h1, γE2) · e(h1, h2)^{s1·s2}.
    """
    sigma, nu = srs.sigma, srs.nu
    if sigma != nu:
        # Odd num_vars gives the rectangular σ=ν+1 layout. The supported
        # path is the square embedding: zero-pad the evals to 2^(n+1) (row
        # padding preserves the GT commitment) and lift the point with
        # square_embedding_point — see
        # tests/test_dory.py::test_rectangular_claim_via_square_embedding.
        # The batch-opening accumulator (pcs/batch.py) always reduces to an
        # even-num-vars opening, so pipeline proofs never hit this.
        raise ValueError("algebraic Dory verification requires a square "
                         "matrix layout (even num_vars); zero-pad the evals "
                         "and lift the point with square_embedding_point")
    num_rounds = max(nu, sigma)
    num_cols = 1 << sigma

    left_vec, right_vec = _split_point(point, sigma, nu)
    s1 = (list(right_vec) + [0] * num_cols)[:num_cols]
    s2 = (list(left_vec) + [0] * num_cols)[:num_cols]

    lad = verifier_ladders(srs)
    chi, d1r_lad, d2r_lad = lad["chi"], lad["d1r"], lad["d2r"]

    # Initial state: the commitment binds D1; the claimed evaluation binds E2.
    c_state = proof.vmv.c
    d1_state = commitment
    d2_state = proof.vmv.d2
    e1_state = proof.vmv.e1
    e2_state = _smul2(srs.g2_vec[0], claimed_eval)

    transcript.append_gt(tw.fp12_to_bytes(proof.vmv.c))
    transcript.append_gt(tw.fp12_to_bytes(proof.vmv.d2))
    transcript.append_bytes(compress_g1(proof.vmv.e1))

    if len(proof.first) != num_rounds or len(proof.second) != num_rounds:
        return False

    cur = num_cols
    for fm, sm in zip(proof.first, proof.second):
        n2 = cur // 2
        transcript.append_gt(tw.fp12_to_bytes(fm.d1_left))
        transcript.append_gt(tw.fp12_to_bytes(fm.d1_right))
        transcript.append_gt(tw.fp12_to_bytes(fm.d2_left))
        transcript.append_gt(tw.fp12_to_bytes(fm.d2_right))
        transcript.append_bytes(compress_g1(fm.e1_beta))
        transcript.append_bytes(compress_g2(fm.e2_beta))
        beta = transcript.challenge_scalar()
        beta_inv = pow(beta, -1, P) if beta else 1

        # β-shift: v1 += βΓ1, v2 += β⁻¹Γ2
        c_state = tw.fp12_mul(
            tw.fp12_mul(c_state, tw.fp12_pow(d1_state, beta_inv)),
            tw.fp12_mul(tw.fp12_pow(d2_state, beta), chi[cur]))
        e1_state = G1.add(e1_state, _smul1(fm.e1_beta, beta))
        e2_state = G2.add(e2_state, _smul2(fm.e2_beta, beta_inv))

        transcript.append_gt(tw.fp12_to_bytes(sm.c_plus))
        transcript.append_gt(tw.fp12_to_bytes(sm.c_minus))
        transcript.append_bytes(compress_g1(sm.e1_plus))
        transcript.append_bytes(compress_g1(sm.e1_minus))
        transcript.append_bytes(compress_g2(sm.e2_plus))
        transcript.append_bytes(compress_g2(sm.e2_minus))
        alpha = transcript.challenge_scalar()
        alpha_inv = pow(alpha, -1, P) if alpha else 1

        # α-fold
        c_state = tw.fp12_mul(
            tw.fp12_mul(c_state, tw.fp12_pow(sm.c_plus, alpha)),
            tw.fp12_pow(sm.c_minus, alpha_inv))
        d1_state = tw.fp12_mul(
            tw.fp12_pow(tw.fp12_mul(fm.d1_left, tw.fp12_pow(chi[n2], beta)), alpha),
            tw.fp12_mul(fm.d1_right, tw.fp12_pow(d1r_lad[n2], beta)))
        d2_state = tw.fp12_mul(
            tw.fp12_pow(tw.fp12_mul(fm.d2_left, tw.fp12_pow(chi[n2], beta_inv)), alpha_inv),
            tw.fp12_mul(fm.d2_right, tw.fp12_pow(d2r_lad[n2], beta_inv)))
        e1_state = G1.add(G1.add(e1_state, _smul1(sm.e1_plus, alpha)),
                          _smul1(sm.e1_minus, alpha_inv))
        e2_state = G2.add(G2.add(e2_state, _smul2(sm.e2_plus, alpha)),
                          _smul2(sm.e2_minus, alpha_inv))
        s1 = [(alpha * s1[i] + s1[i + n2]) % P for i in range(n2)]
        s2 = [(alpha_inv * s2[i] + s2[i + n2]) % P for i in range(n2)]
        cur = n2

    gamma = transcript.challenge_scalar()
    gamma_inv = pow(gamma, -1, P) if gamma else 1

    lhs = multi_pairing([(proof.final_e1, proof.final_e2)]
                        if proof.final_e1 is not None and proof.final_e2 is not None
                        else [])
    pairs = []
    t = _smul1(e1_state, gamma_inv)
    if t is not None:
        pairs.append((t, G2.G2_GEN))
    t = _smul2(e2_state, gamma)
    if t is not None:
        pairs.append((G1.G1_GEN, t))
    t = _smul1(G1.G1_GEN, s1[0] * s2[0])
    if t is not None:
        pairs.append((t, G2.G2_GEN))
    rhs = tw.fp12_mul(c_state, multi_pairing(pairs))
    return lhs == rhs


def verify_structure(srs: DorySRS, commitment, proof: DoryProof, transcript) -> bool:
    """Replay the transcript and check message shape/counts. The algebraic
    Dory verification equations land in a later round (reference's verify is
    a placeholder too, dory.zig:1381-1396)."""
    transcript.append_gt(tw.fp12_to_bytes(proof.vmv.c))
    transcript.append_gt(tw.fp12_to_bytes(proof.vmv.d2))
    transcript.append_bytes(compress_g1(proof.vmv.e1))
    if len(proof.first) != max(proof.nu, proof.sigma):
        return False
    for fm, sm in zip(proof.first, proof.second):
        transcript.append_gt(tw.fp12_to_bytes(fm.d1_left))
        transcript.append_gt(tw.fp12_to_bytes(fm.d1_right))
        transcript.append_gt(tw.fp12_to_bytes(fm.d2_left))
        transcript.append_gt(tw.fp12_to_bytes(fm.d2_right))
        transcript.append_bytes(compress_g1(fm.e1_beta))
        transcript.append_bytes(compress_g2(fm.e2_beta))
        transcript.challenge_scalar()
        transcript.append_gt(tw.fp12_to_bytes(sm.c_plus))
        transcript.append_gt(tw.fp12_to_bytes(sm.c_minus))
        transcript.append_bytes(compress_g1(sm.e1_plus))
        transcript.append_bytes(compress_g1(sm.e1_minus))
        transcript.append_bytes(compress_g2(sm.e2_plus))
        transcript.append_bytes(compress_g2(sm.e2_minus))
        transcript.challenge_scalar()
    transcript.challenge_scalar()
    return proof.final_e1 is not None or proof.final_e2 is not None


# ---------------------------------------------------------------------------
# Fixed-challenge open (reference dory.zig:1052-1368 `open`) + serialization.
# The reference's joint opening proof in the Jolt proof file uses this
# deterministic variant: beta = round+1, alpha = round+100, gamma = 999.
# ---------------------------------------------------------------------------

def _mlb(point: list[int], out_len: int) -> list[int]:
    """multilinearLagrangeBasis (dory.zig:560-590): in-place doubling with
    clamping when the output is shorter than 2^len(point)."""
    out = [0] * out_len
    if not point or not out_len:
        if out_len:
            out[0] = 1
        return out
    out[0] = (1 - point[0]) % P
    if out_len > 1:
        out[1] = point[0] % P
    for level in range(1, len(point)):
        p_i = point[level] % P
        mid = 1 << level
        if mid >= out_len:
            for i in range(out_len):
                out[i] = out[i] * (1 - p_i) % P
        else:
            k = min(mid, out_len - mid)
            for i in range(k - 1, -1, -1):
                l_val = out[i]
                if i + mid < out_len:
                    out[i + mid] = l_val * p_i % P
                out[i] = l_val * (1 - p_i) % P
    return out


def _multi_pair(g1s, g2s):
    n = min(len(g1s), len(g2s))
    pairs = [(g1s[i], g2s[i]) for i in range(n)
             if g1s[i] is not None and g2s[i] is not None]
    return multi_pairing(pairs)


def _msm_g1(points, scalars):
    n = min(len(points), len(scalars))
    from ..native import g1_msm_native

    out = g1_msm_native(points[:n], scalars[:n])
    if out is not None:
        return out
    acc = None
    for i in range(n):
        if points[i] is None or scalars[i] % P == 0:
            continue
        acc = G1.add(acc, G1.scalar_mul(points[i], scalars[i] % P)) if acc is not None \
            else G1.scalar_mul(points[i], scalars[i] % P)
    return acc


def _msm_g2(points, scalars):
    n = min(len(points), len(scalars))
    from ..native import g2_msm_native

    out = g2_msm_native(points[:n], scalars[:n])
    if out is not None:
        return out
    acc = None
    for i in range(n):
        if points[i] is None or scalars[i] % P == 0:
            continue
        term = G2.scalar_mul(points[i], scalars[i] % P)
        acc = G2.add(acc, term) if acc is not None else term
    return acc


def open_fixed(srs: DorySRS, evals: list[int], point: list[int]) -> DoryProof:
    """Deterministic reduce-and-fold proof matching the reference's `open`."""
    nu, sigma = srs.nu, srs.sigma
    num_rounds = max(nu, sigma)
    num_cols = 1 << sigma

    num_rows = (len(evals) + num_cols - 1) // num_cols
    row_comms = []
    for r in range(num_rows):
        seg = evals[r * num_cols : r * num_cols + num_cols]
        row_comms.append(_msm_g1(srs.g1_vec[: len(seg)], seg))

    left_len, right_len = 1 << nu, 1 << sigma
    pd = len(point)
    if pd == 0:
        left_vec, right_vec = [1], [1]
    elif pd <= sigma:
        right_vec = _mlb(point, 1 << pd)
        left_vec = [1]
    else:
        right_vec = _mlb(point[:sigma], right_len)
        left_vec = _mlb(point[sigma:], min(1 << (pd - sigma), left_len))

    v_vec = [0] * num_cols
    for row in range(1 << nu):
        if row >= len(left_vec):
            break
        coeff = left_vec[row]
        for col in range(num_cols):
            idx = row * num_cols + col
            if idx < len(evals):
                v_vec[col] = (v_vec[col] + coeff * evals[idx]) % P

    padded_rows = list(row_comms[:num_cols]) + [None] * max(0, num_cols - len(row_comms))
    t_vec_v = _msm_g1(padded_rows, v_vec)
    c = multi_pairing([(t_vec_v, srs.g2_vec[0])] if t_vec_v else [])
    gamma1_v = _msm_g1(srs.g1_vec[: len(v_vec)], v_vec)
    d2 = multi_pairing([(gamma1_v, srs.g2_vec[0])] if gamma1_v else [])
    e1 = _msm_g1((row_comms + [None] * (1 << nu))[: 1 << nu], left_vec)
    vmv = VMVMessage(c=c, d2=d2, e1=e1)

    vec_len = num_cols
    v1 = list(padded_rows)
    from ..native import g2_batch_mul_native

    _v2n = g2_batch_mul_native(srs.g2_vec[0],
                               [(v_vec[i] if i < len(v_vec) else 0)
                                for i in range(vec_len)])
    if _v2n is not None:
        v2 = [(_v2n[i] if i < len(v_vec) and v_vec[i] % P else None)
              for i in range(vec_len)]
    else:
        v2 = [G2.scalar_mul(srs.g2_vec[0], v_vec[i]) if i < len(v_vec) and v_vec[i] else None
              for i in range(vec_len)]
    s1 = list(right_vec) + [0] * (vec_len - len(right_vec))
    s2 = list(left_vec) + [0] * (vec_len - len(left_vec))

    col_len, row_len = 1 << sigma, 1 << nu
    firsts, seconds = [], []
    for rnd in range(num_rounds):
        current_len = max(col_len, row_len)
        n2 = current_len // 2
        g2_size = min(n2, row_len)
        from ..native import multi_pairing_fixed_native

        d1_left = (multi_pairing_fixed_native(v1[:g2_size], srs.g2_vec, g2_size)
                   or _multi_pair(v1[:g2_size], srs.g2_vec[:g2_size]))
        _d1r_v1 = v1[n2 : min(n2 + g2_size, current_len)]
        d1_right = (multi_pairing_fixed_native(_d1r_v1, srs.g2_vec, g2_size)
                    or _multi_pair(_d1r_v1, srs.g2_vec[:g2_size]))
        g1_size = min(n2, col_len)
        d2_left = _multi_pair(srs.g1_vec[:g1_size], v2[:g1_size])
        d2_right = _multi_pair(srs.g1_vec[:g1_size], v2[n2 : min(n2 + g1_size, current_len)])
        e1_beta = _msm_g1(srs.g1_vec[:col_len], s2[:col_len])
        e2_beta = _msm_g2(srs.g2_vec[:row_len], s1[:row_len])
        firsts.append(FirstReduceMessage(d1_left, d1_right, d2_left, d2_right, e1_beta, e2_beta))

        beta = (rnd + 1) % P
        beta_inv = pow(beta, -1, P)
        from ..native import g1_fold_native, g2_fold_native

        _f1 = g1_fold_native(srs.g1_vec[:col_len], v1[:col_len], beta)
        if _f1 is not None:
            v1[:col_len] = _f1
        else:
            for i in range(col_len):
                v1[i] = G1.add(v1[i], G1.scalar_mul(srs.g1_vec[i], beta)) if v1[i] is not None \
                    else G1.scalar_mul(srs.g1_vec[i], beta)
        # beta_inv is a full-width scalar but g2_vec is the fixed SRS vector
        # and beta is deterministic (rnd+1), so beta_inv·g2_vec[:row_len] is
        # reusable across every opening with this SRS: cache it per (rnd,
        # row_len) and reduce the fold to row_len point additions (scalar=1).
        cache = getattr(srs, "_beta_g2_cache", None)
        if cache is None:
            cache = {}
            srs._beta_g2_cache = cache
        pre = cache.get((rnd, row_len))
        if pre is None and (rnd, row_len) not in cache:
            pre = g2_fold_native(srs.g2_vec[:row_len], [None] * row_len, beta_inv)
            cache[(rnd, row_len)] = pre
        if pre is not None:
            _f2 = g2_fold_native(pre, v2[:row_len], 1)
        else:
            _f2 = g2_fold_native(srs.g2_vec[:row_len], v2[:row_len], beta_inv)
        if _f2 is not None:
            v2[:row_len] = _f2
        else:
            for i in range(row_len):
                t = G2.scalar_mul(srs.g2_vec[i], beta_inv)
                v2[i] = G2.add(v2[i], t) if v2[i] is not None else t

        v1_half = min(n2, col_len)
        v2_half = min(n2, row_len)
        c_plus = _multi_pair(v1[:v1_half], v2[n2 : min(n2 + v2_half, current_len)])
        c_minus = _multi_pair(v1[n2 : min(n2 + v1_half, current_len)], v2[:v2_half])
        e1_plus = _msm_g1(v1[:v1_half], s2[n2 : min(n2 + v1_half, current_len)])
        e1_minus = _msm_g1(v1[n2 : min(n2 + v1_half, current_len)], s2[:v1_half])
        e2_plus = _msm_g2(v2[n2 : min(n2 + v2_half, current_len)], s1[:v2_half])
        e2_minus = _msm_g2(v2[:v2_half], s1[n2 : min(n2 + v2_half, current_len)])
        seconds.append(SecondReduceMessage(c_plus, c_minus, e1_plus, e1_minus, e2_plus, e2_minus))

        alpha = (rnd + 100) % P
        alpha_inv = pow(alpha, -1, P)
        _f1 = g1_fold_native(v1[:v1_half], v1[n2:n2 + v1_half], alpha)
        if _f1 is not None:
            v1[:v1_half] = _f1
        else:
            for i in range(v1_half):
                left = G1.scalar_mul(v1[i], alpha) if v1[i] is not None else None
                right = v1[i + n2]
                v1[i] = G1.add(left, right) if left is not None and right is not None \
                    else (left if left is not None else right)
        _f2 = g2_fold_native(v2[:v2_half], v2[n2:n2 + v2_half], alpha_inv)
        if _f2 is not None:
            v2[:v2_half] = _f2
        else:
            for i in range(v2_half):
                left = G2.scalar_mul(v2[i], alpha_inv) if v2[i] is not None else None
                right = v2[i + n2]
                v2[i] = G2.add(left, right) if left is not None and right is not None \
                    else (left if left is not None else right)
        for i in range(v2_half):
            s1[i] = (alpha * s1[i] + s1[i + n2]) % P
        for i in range(v1_half):
            s2[i] = (alpha_inv * s2[i] + s2[i + n2]) % P
        if col_len > 1:
            col_len //= 2
        if row_len > 1:
            row_len //= 2

    gamma = 999
    gamma_inv = pow(gamma, -1, P)
    scaled_h1 = G1.scalar_mul(G1.G1_GEN, gamma * s1[0] % P)
    final_e1 = G1.add(v1[0], scaled_h1) if v1[0] is not None else scaled_h1
    scaled_h2 = G2.scalar_mul(G2.G2_GEN, gamma_inv * s2[0] % P)
    final_e2 = G2.add(v2[0], scaled_h2) if v2[0] is not None else scaled_h2
    return DoryProof(vmv=vmv, first=firsts, second=seconds,
                     final_e1=final_e1, final_e2=final_e2, nu=nu, sigma=sigma)


def serialize_dory_proof(proof: DoryProof) -> bytes:
    """writeDoryProof layout (jolt_serialization.zig:148-175)."""
    import struct as _struct

    out = [tw.fp12_to_bytes(proof.vmv.c), tw.fp12_to_bytes(proof.vmv.d2),
           compress_g1(proof.vmv.e1), _struct.pack("<I", len(proof.first))]
    for m in proof.first:
        out += [tw.fp12_to_bytes(m.d1_left), tw.fp12_to_bytes(m.d1_right),
                tw.fp12_to_bytes(m.d2_left), tw.fp12_to_bytes(m.d2_right),
                compress_g1(m.e1_beta), compress_g2(m.e2_beta)]
    for m in proof.second:
        out += [tw.fp12_to_bytes(m.c_plus), tw.fp12_to_bytes(m.c_minus),
                compress_g1(m.e1_plus), compress_g1(m.e1_minus),
                compress_g2(m.e2_plus), compress_g2(m.e2_minus)]
    out += [compress_g1(proof.final_e1), compress_g2(proof.final_e2),
            _struct.pack("<II", proof.nu, proof.sigma)]
    return b"".join(out)


def deserialize_dory_proof(data: bytes) -> DoryProof:
    """Inverse of `serialize_dory_proof`."""
    import struct as _struct

    off = 0

    def gt():
        nonlocal off
        v = tw.fp12_from_bytes(data[off:off + 384])
        off += 384
        return v

    def g1():
        nonlocal off
        v = decompress_g1(data[off:off + 32])
        off += 32
        return v

    def g2():
        nonlocal off
        v = decompress_g2(data[off:off + 64])
        off += 64
        return v

    c, d2, e1 = gt(), gt(), g1()
    vmv = VMVMessage(c=c, d2=d2, e1=e1)
    (n_rounds,) = _struct.unpack_from("<I", data, off)
    off += 4
    firsts = [FirstReduceMessage(gt(), gt(), gt(), gt(), g1(), g2())
              for _ in range(n_rounds)]
    seconds = [SecondReduceMessage(gt(), gt(), g1(), g1(), g2(), g2())
               for _ in range(n_rounds)]
    final_e1, final_e2 = g1(), g2()
    nu, sigma = _struct.unpack_from("<II", data, off)
    return DoryProof(vmv=vmv, first=firsts, second=seconds,
                     final_e1=final_e1, final_e2=final_e2, nu=nu, sigma=sigma)
