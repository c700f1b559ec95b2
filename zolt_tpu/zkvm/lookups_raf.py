"""Sound-mode stage 8: the InstructionReadRaf sumcheck — the real protocol
behind the reference's zero-proof LookupsRAF placeholder
(src/zkvm/proof_converter.zig:2629-2677, SumcheckId InstructionReadRaf /
InstructionRaVirtualization in src/zkvm/jolt_types.zig:70-101).

Statement (over the (k, j) cube, k in {0,1}^128 address bits, j cycles):

  lo + gamma*left + gamma^2*right - const_claim + gamma^3*valid_rhs
    = sum_{k,j}  eq(rc1, j) * OH(k, j) * Gm(k, slot_j)

where lo/left/right are the stage-1 SpartanOuter claimed evaluations of
LookupOutput / LeftLookupOperand / RightLookupOperand at the cycle point
rc1, OH(k,j) = prod_d IOH_d(k_d, j) is the committed one-hot chunk
decomposition of the sound lookup index (zkvm/raf_gadgets.sound_lookup_index),
and Gm(k, s) combines the class-static closed-form gadgets:

  Gm(k, s) = outG_s(k) + g*leftG_s(k) + g^2*rightG_s(k) + g^3*ValidTable_s(k)

The static additive constants of the left/right gadgets are pulled out into
const_claim = sum_j eq*CONST(slot_j), and the validity right-hand side is
valid_rhs = sum_j eq*HasValidity(slot_j) — both are public tables over
bytecode slots, proven later by the BytecodeReadRaf stage (bytecode_raf.py).

Phase A binds the 128 address variables MSB-first with per-entry O(1)
incremental evaluation by gadget family (linear forms, eq/lt chains,
bitwise pair sums, shifts with concrete shamt, generic fallback for the
rare validity tables); the final 12 variables switch to a dense 4096-point
endgame. Phase B binds the cycle variables over eq * w * C(slot) dense
tables. Terminal claims (w, cs) are virtualized by stage 9
(InstructionRaVirtualization) and the bytecode read-check respectively.

Degrees: phase A rounds are degree 2 (chi * Gm), phase B degree 3.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

from ..field.params import FR
from ..poly import unipoly
from ..vm import tables as tb
from ..vm.tables import Table
from .raf_gadgets import (G, RafSpec, entry_spec, gadget_eval_point,
                          sound_lookup_index)

P = FR.p
ADDR_VARS = 128
ENDGAME_VARS = 12
LOG_K_CHUNK = 4
INSTRUCTION_D = ADDR_VARS // LOG_K_CHUNK   # 32 committed chunks
TWO64 = 1 << 64


def _absorb_round(transcript, compressed: list[int]) -> int:
    transcript.append_message(b"UniPoly_begin")
    for c in compressed:
        transcript.append_scalar(c % P)
    transcript.append_message(b"UniPoly_end")
    return transcript.challenge_scalar()


def eq_point_eval(a: list[int], b: list[int]) -> int:
    out = 1
    for x, y in zip(a, b):
        out = out * ((x * y + (1 - x) * (1 - y)) % P) % P
    return out


def _eval2(compressed2: list[int], hint: int, x: int) -> int:
    c0, c2 = compressed2[0] % P, compressed2[1] % P
    c1 = (hint - 2 * c0 - c2) % P
    return (c0 + c1 * x + c2 * x * x) % P


# ---------------------------------------------------------------------------
# Combined per-class gadget machinery
# ---------------------------------------------------------------------------

_BITWISE = {Table.And: 0, Table.Or: 1, Table.Xor: 2}
_SHIFTS = {Table.LeftShift: 0, Table.RightShift: 1,
           Table.RightShiftArithmetic: 2}
# (b_lt, b_eq, const, signed)
_CHAINS = {Table.UnsignedLessThan: (1, 0, 0, False),
           Table.SignedLessThan: (1, 0, 0, True),
           Table.UnsignedGreaterThanEqual: (-1, 0, 1, False),
           Table.SignedGreaterThanEqual: (-1, 0, 1, True),
           Table.Equal: (0, 1, 0, False),
           Table.NotEqual: (0, -1, 1, False)}


def _bit_op(kind: int, a: int, b: int) -> int:
    """Multilinear extension of the bit pair op (valid off-cube)."""
    if kind == 0:
        return a * b % P
    if kind == 1:
        return (a + b - a * b) % P
    return (a + b - 2 * a * b) % P


def _shift_w(kind: int, s: int, i: int) -> int:
    """Field weight of x_i in the shift-by-s linear form."""
    if kind == 0:
        return (1 << (i + s)) if i + s < 64 else 0
    w = (1 << (i - s)) if i >= s else 0
    if kind == 2 and i == 63 and s > 0:
        w += TWO64 - (1 << (64 - s))       # arithmetic fill bits
    return w % P


class ClassGroup:
    """All entries of one gadget class, with the class's combined Gm
    components and the per-entry incremental phase-A state."""

    def __init__(self, spec: RafSpec, gammas: list[int]):
        self.spec = spec
        self.lin_w = [0] * ADDR_VARS
        self.cc = 0
        self.chain = None       # (b_lt, b_eq, signed) coeff-scaled
        self.bitop = None       # (coeff, kind)
        self.shift = None       # (coeff, kind)
        self.valid = None       # (coeff, table)
        for slot, g in ((spec.out, gammas[0]), (spec.left, gammas[1]),
                        (spec.right, gammas[2])):
            self._add_slot(slot, g)
        if spec.valid_table is not None:
            self.valid = (gammas[3], spec.valid_table)
        # per-entry parallel arrays
        self.cyc: list[int] = []
        self.idx: list[int] = []
        self.eqw: list[int] = []
        self.pref: list[int] = []
        self.lin_s: list[int] = []
        self.lt_below: list[list[int]] = []
        self.eq_below: list[list[int]] = []
        self.bw_s: list[int] = []
        self.sh_cur: list[int] = []
        self.sh_s: list[int] = []
        # shared accumulators
        self.lin_b = 0
        self.LTb, self.EQb = 0, 1

    # -- class composition ---------------------------------------------------

    def _add_lin(self, positions, g):
        for pos, w in positions:
            self.lin_w[pos] = (self.lin_w[pos] + g * w) % P

    def _add_slot(self, slot, g: int):
        k = slot.g
        if k == G.ZERO:
            return
        if k == G.IDENT128:
            self._add_lin(((i, 1 << i) for i in range(128)), g)
        elif k == G.IDENT_LOW64:
            self._add_lin(((i, 1 << i) for i in range(64)), g)
        elif k == G.IDENT_LOW64_NO0:
            self._add_lin(((i, 1 << i) for i in range(1, 64)), g)
        elif k == G.ODDS:
            self._add_lin(((2 * i + 1, 1 << i) for i in range(64)), g)
        elif k == G.EVENS:
            self._add_lin(((2 * i, 1 << i) for i in range(64)), g)
        elif k == G.EVENS_PLUS_ODDS:
            self._add_lin(((i, 1 << (i // 2)) for i in range(128)), g)
        elif k == G.SUB_COMBO:
            self._add_lin(((2 * i + 1, 1 << i) for i in range(64)), g)
            self._add_lin(((2 * i, -(1 << i)) for i in range(64)), g)
            self.cc = (self.cc + g * TWO64) % P
        elif k == G.TABLE:
            t = slot.table
            if t == Table.Sub:
                self._add_lin(((2 * i + 1, 1 << i) for i in range(64)), g)
                self._add_lin(((2 * i, -(1 << i)) for i in range(64)), g)
                assert self.chain is None
                self.chain = (g * TWO64 % P, 0, False)
            elif t in _BITWISE:
                assert self.bitop is None
                self.bitop = (g % P, _BITWISE[t])
            elif t in _SHIFTS:
                assert self.shift is None
                self.shift = (g % P, _SHIFTS[t])
            elif t in _CHAINS:
                bl, be, c, signed = _CHAINS[t]
                assert self.chain is None
                self.chain = (g * bl % P, g * be % P, signed)
                self.cc = (self.cc + g * c) % P
            else:
                raise ValueError(f"no phase-A machinery for table {t}")
        else:
            raise ValueError(k)

    # -- entries ---------------------------------------------------------------

    def add_entry(self, cycle: int, idx: int, eqw: int):
        self.cyc.append(cycle)
        self.idx.append(idx)
        self.eqw.append(eqw)
        self.pref.append(1)
        self.lin_s.append(sum(self.lin_w[p] for p in range(ADDR_VARS)
                              if (idx >> p) & 1) % P)
        if self.chain is not None:
            x, y = tb.uninterleave_bits(idx, 64)
            lt, eq = [0] * 64, [0] * 64
            ltv, eqv = 0, 1
            for i in range(64):
                lt[i], eq[i] = ltv, eqv
                xb, yb = (x >> i) & 1, (y >> i) & 1
                ltv = 1 if (xb < yb or (xb == yb and ltv)) else 0
                eqv = eqv if xb == yb else 0
            self.lt_below.append(lt)
            self.eq_below.append(eq)
        if self.bitop is not None:
            x, y = tb.uninterleave_bits(idx, 64)
            kind = self.bitop[1]
            v = (x & y) if kind == 0 else (x | y) if kind == 1 else (x ^ y)
            self.bw_s.append(v)
        if self.shift is not None:
            x, y = tb.uninterleave_bits(idx, 64)
            s = y & 63
            kind = self.shift[1]
            self.sh_s.append(s)
            self.sh_cur.append(sum(_shift_w(kind, s, i) for i in range(64)
                                   if (x >> i) & 1) % P)


def _mixed_point(r_bound: dict[int, int], idx: int, pos: int, c: int) -> list[int]:
    pt = [0] * ADDR_VARS
    for p in range(ADDR_VARS):
        if p in r_bound:
            pt[p] = r_bound[p]
        elif p == pos:
            pt[p] = c
        else:
            pt[p] = (idx >> p) & 1
    return pt


def gm_eval_point(spec: RafSpec, gammas: list[int], point_le128: list[int]) -> int:
    """Gm(point, class) — the combined gadget value WITHOUT the static
    left/right constants (those live in the CONST bytecode table)."""
    v = 0
    for slot, g in ((spec.out, gammas[0]), (spec.left, gammas[1]),
                    (spec.right, gammas[2])):
        if slot.g != G.ZERO:
            v = (v + g * ((gadget_eval_point(slot, point_le128) - slot.const) % P)) % P
    if spec.valid_table is not None:
        v = (v + gammas[3] * tb.evaluate_mle(
            spec.valid_table, list(reversed(point_le128)), 64)) % P
    return v


# ---------------------------------------------------------------------------
# Stage-8 prover
# ---------------------------------------------------------------------------

@dataclass
class Stage8Result:
    compressed_addr: list[list[int]] = dfield(default_factory=list)  # [c0,c2]
    compressed_cycle: list[list[int]] = dfield(default_factory=list)  # [c0,c2,c3]
    r_addr: list[int] = dfield(default_factory=list)   # r_addr[pos] per bit
    r_cycle: list[int] = dfield(default_factory=list)  # phase-B challenges
    gamma: int = 0
    const_claim: int = 0
    valid_rhs: int = 0
    w_claim: int = 0
    cs_claim: int = 0
    final_claim: int = 0
    input_claim: int = 0


def collect_entries(padded_steps):
    """(cycle, index, spec) for every sound-lookup cycle."""
    out = []
    for j, s in enumerate(padded_steps):
        if getattr(s, "is_noop", False):
            continue
        idx = sound_lookup_index(s)
        if idx is None:
            continue
        out.append((j, idx, entry_spec(s.instruction)))
    return out


def _class_key(spec: RafSpec):
    return (spec.out.g, spec.out.table, spec.left.g, spec.right.g,
            spec.valid_table)


def ctable_values(bc_index, gammas: list[int], r_addr_le: list[int],
                  size: int) -> list[int]:
    """Public C(k) table over (padded) bytecode slots: Gm at r_addr per
    slot's class (0 for slots with no lookup)."""
    out = [0] * size
    cache: dict = {}
    for k in range(min(size, bc_index.size)):
        spec = bc_index.raf_spec(k)
        if spec is None:
            continue
        key = _class_key(spec)
        if key not in cache:
            cache[key] = gm_eval_point(spec, gammas, r_addr_le)
        out[k] = cache[key]
    return out


def const_table(bc_index, gammas: list[int], size: int) -> list[int]:
    """Public CONST(k) table: the static additive operand constants."""
    out = [0] * size
    for k in range(min(size, bc_index.size)):
        spec = bc_index.raf_spec(k)
        if spec is None:
            continue
        out[k] = (gammas[0] * spec.out.const + gammas[1] * spec.left.const
                  + gammas[2] * spec.right.const) % P
    return out


def prove_stage8(transcript, padded_steps, bc_index, lo_claim: int,
                 left_claim: int, right_claim: int, r_cycle_be: list[int],
                 n_cycle_vars: int) -> Stage8Result:
    from ..native.frvec import FrVec

    res = Stage8Result()
    T = 1 << n_cycle_vars
    g = transcript.challenge_scalar_full()
    res.gamma = g
    gammas = [1, g, g * g % P, g * g % P * g % P]

    eqv = FrVec.eq_table_be([c % P for c in r_cycle_be]).to_ints()
    entries = collect_entries(padded_steps)
    slots = bc_index.slots_per_cycle(padded_steps)

    # public-claim components (proven by the BytecodeReadRaf stage)
    const_c = valid_c = 0
    for j in range(T):
        spec = bc_index.raf_spec(slots[j])
        if spec is None:
            continue
        e = eqv[j]
        const_c = (const_c + e * ((gammas[0] * spec.out.const
                                   + gammas[1] * spec.left.const
                                   + gammas[2] * spec.right.const) % P)) % P
        if spec.valid_table is not None:
            valid_c = (valid_c + e) % P
    res.const_claim, res.valid_rhs = const_c, valid_c
    transcript.append_scalar(const_c)
    transcript.append_scalar(valid_c)

    claim = (lo_claim + g * left_claim + gammas[2] * right_claim
             - const_c + gammas[3] * valid_c) % P
    res.input_claim = claim

    # ---- group entries by class -------------------------------------------
    groups: dict = {}
    valid_entries = []   # (group, idx, cycle) — generic per-entry evaluation
    for (j, idx, spec) in entries:
        key = _class_key(spec)
        grp = groups.get(key)
        if grp is None:
            grp = groups[key] = ClassGroup(spec, gammas)
        grp.add_entry(j, idx, eqv[j])
    grouplist = list(groups.values())

    r_bound: dict[int, int] = {}
    last_x_challenge = 0

    # ---- Phase A: address rounds, MSB first --------------------------------
    for pos in range(ADDR_VARS - 1, ENDGAME_VARS - 1, -1):
        is_x = (pos & 1) == 1
        pair = pos >> 1
        e0 = e2 = 0
        for grp in grouplist:
            wp = grp.lin_w[pos]
            ch, bo, sh, va = grp.chain, grp.bitop, grp.shift, grp.valid
            for t in range(len(grp.idx)):
                idx = grp.idx[t]
                bit = (idx >> pos) & 1
                # remove this position from the per-entry suffix state
                if bit and grp.lin_s[t]:
                    grp.lin_s[t] = (grp.lin_s[t] - wp) % P
                elif bit:
                    grp.lin_s[t] = (-wp) % P
                base = grp.cc + grp.lin_b + grp.lin_s[t]
                v0 = base
                v2 = base + 2 * wp
                if ch is not None:
                    bl, be, signed = ch
                    ltb, eqb = grp.LTb, grp.EQb
                    lt_i = grp.lt_below[t][pair]
                    eq_i = grp.eq_below[t][pair]
                    if is_x:
                        ob = (idx >> (pos - 1)) & 1   # y bit (suffix)
                        for c, acc in ((0, 0), (2, 1)):
                            if signed and pair == 63:
                                ltt = c * (1 - ob)
                            else:
                                ltt = (1 - c) * ob
                            eqt = c * ob + (1 - c) * (1 - ob)
                            add = (bl * (ltb + eqb * ((ltt + eqt * lt_i) % P))
                                   + be * (eqb * eqt % P * eq_i)) % P
                            if acc == 0:
                                v0 += add
                            else:
                                v2 += add
                    else:
                        rx = last_x_challenge
                        for c, acc in ((0, 0), (2, 1)):
                            if signed and pair == 63:
                                ltt = rx * (1 - c) % P
                            else:
                                ltt = (1 - rx) * c % P
                            eqt = (rx * c + (1 - rx) * (1 - c)) % P
                            add = (bl * (ltb + eqb * ((ltt + eqt * lt_i) % P))
                                   + be * (eqb * eqt % P * eq_i)) % P
                            if acc == 0:
                                v0 += add
                            else:
                                v2 += add
                if bo is not None:
                    coeff, kind = bo
                    if is_x:
                        # strip the pair from the suffix sum once (at x round)
                        if (grp.bw_s[t] >> pair) & 1:
                            grp.bw_s[t] -= 1 << pair
                        rest = grp.bw_s[t] % P
                        ob = (idx >> (pos - 1)) & 1
                        v0 += coeff * ((rest + (1 << pair) * _bit_op(kind, 0, ob)) % P)
                        v2 += coeff * ((rest + (1 << pair) * _bit_op(kind, 2, ob)) % P)
                    else:
                        rx = last_x_challenge
                        rest = grp.bw_s[t] % P
                        v0 += coeff * ((rest + (1 << pair) * _bit_op(kind, rx, 0)) % P)
                        v2 += coeff * ((rest + (1 << pair) * _bit_op(kind, rx, 2)) % P)
                if sh is not None:
                    coeff, kind = sh
                    if is_x:
                        w = _shift_w(kind, grp.sh_s[t], pair)
                        if bit and w:
                            grp.sh_cur[t] = (grp.sh_cur[t] - w) % P
                        v0 += coeff * grp.sh_cur[t]
                        v2 += coeff * ((grp.sh_cur[t] + 2 * w) % P)
                    else:
                        v0 += coeff * grp.sh_cur[t]
                        v2 += coeff * grp.sh_cur[t]
                if va is not None:
                    coeff, vt = va
                    pt = _mixed_point(r_bound, idx, pos, 0)
                    v0 += coeff * tb.evaluate_mle(vt, list(reversed(pt)), 64)
                    pt[pos] = 2
                    v2 += coeff * tb.evaluate_mle(vt, list(reversed(pt)), 64)
                wt = grp.eqw[t] * grp.pref[t] % P
                if bit:
                    e2 += wt * 2 % P * (v2 % P)
                else:
                    e0 += wt * (v0 % P)
                    e2 -= wt * (v2 % P)
        e0 %= P
        e2 %= P
        e1 = (claim - e0) % P
        compressed = unipoly.compress(unipoly.interpolate([e0, e1, e2]))
        res.compressed_addr.append(compressed)
        r = _absorb_round(transcript, compressed)
        r_bound[pos] = r
        claim = _eval2(compressed, claim, r)
        if is_x:
            last_x_challenge = r
        # fold per-entry / shared state
        for grp in grouplist:
            wp = grp.lin_w[pos]
            grp.lin_b = (grp.lin_b + wp * r) % P
            omr = (1 - r) % P
            for t in range(len(grp.idx)):
                bit = (grp.idx[t] >> pos) & 1
                grp.pref[t] = grp.pref[t] * (r if bit else omr) % P
            if grp.shift is not None and is_x:
                kind = grp.shift[1]
                for t in range(len(grp.idx)):
                    w = _shift_w(kind, grp.sh_s[t], pair)
                    if w:
                        grp.sh_cur[t] = (grp.sh_cur[t] + w * r) % P
            if grp.chain is not None and not is_x:
                bl_, be_, signed = grp.chain
                rx = last_x_challenge
                if signed and pair == 63:
                    ltt = rx * (1 - r) % P
                else:
                    ltt = (1 - rx) * r % P
                eqt = (rx * r + (1 - rx) * (1 - r)) % P
                grp.LTb = (grp.LTb + grp.EQb * ltt) % P
                grp.EQb = grp.EQb * eqt % P
            if grp.bitop is not None and not is_x:
                # pair fully bound: fold into the shared bound sum via cc?
                # bound pairs contribute a SHARED value: add to lin_b-like cc
                coeff, kind = grp.bitop
                grp.cc = (grp.cc + coeff * (1 << pair) % P
                          * _bit_op(kind, last_x_challenge, r)) % P

    # ---- Endgame: dense 2^12 tables ----------------------------------------
    size = 1 << ENDGAME_VARS
    dense: list[tuple[list[int], list[int]]] = []
    endgame_valid: list[tuple] = []
    for grp in grouplist:
        V = [0] * size
        bsum = None
        if grp.shift is not None:
            coeff_s, kind = grp.shift
            bsum = [0] * 64
            for s in range(64):
                acc = 0
                for i in range(6, 64):
                    xpos = 2 * i + 1
                    if xpos in r_bound:
                        w = _shift_w(kind, s, i)
                        if w:
                            acc += w * r_bound[xpos]
                bsum[s] = acc % P
        for w in range(size):
            base = grp.cc + grp.lin_b
            for posn in range(ENDGAME_VARS):
                if (w >> posn) & 1:
                    base += grp.lin_w[posn]
            if grp.chain is not None:
                bl, be, signed = grp.chain
                xr = sum(((w >> (2 * i + 1)) & 1) << i for i in range(6))
                yr = sum(((w >> (2 * i)) & 1) << i for i in range(6))
                ltr = 1 if xr < yr else 0
                eqr = 1 if xr == yr else 0
                base += bl * ((grp.LTb + grp.EQb * ltr) % P) \
                    + be * (grp.EQb * eqr % P)
            if grp.bitop is not None:
                coeff, kind = grp.bitop
                xr = sum(((w >> (2 * i + 1)) & 1) << i for i in range(6))
                yr = sum(((w >> (2 * i)) & 1) << i for i in range(6))
                v = (xr & yr) if kind == 0 else (xr | yr) if kind == 1 \
                    else (xr ^ yr)
                base += coeff * v
            if grp.shift is not None:
                coeff_s, kind = grp.shift
                s = sum(((w >> (2 * i)) & 1) << i for i in range(6))
                acc = bsum[s]
                for i in range(6):
                    if (w >> (2 * i + 1)) & 1:
                        acc += _shift_w(kind, s, i)
                base += coeff_s * (acc % P)
            V[w] = base % P
        A = [0] * size
        mask = size - 1
        for t in range(len(grp.idx)):
            A[grp.idx[t] & mask] = (A[grp.idx[t] & mask]
                                    + grp.eqw[t] * grp.pref[t]) % P
        dense.append((A, V))
        if grp.valid is not None:
            coeff, vt = grp.valid
            for t in range(len(grp.idx)):
                endgame_valid.append(
                    (coeff, vt, grp.idx[t], grp.eqw[t] * grp.pref[t] % P))

    eg_challenges: list[int] = []
    for pos in range(ENDGAME_VARS - 1, -1, -1):
        half = 1 << pos
        e0 = e2 = 0
        for (A, V) in dense:
            for w in range(half):
                a0, a1 = A[w], A[w | half]
                v0, v1 = V[w], V[w | half]
                e0 += a0 * v0
                e2 += (2 * a1 - a0) * (2 * v1 - v0)
        for (coeff, vt, idx, wt) in endgame_valid:
            # weight: chi over already-bound endgame bits
            pw = wt
            for p2, rr in zip(range(ENDGAME_VARS - 1, pos, -1), eg_challenges):
                b = (idx >> p2) & 1
                pw = pw * (rr if b else (1 - rr)) % P
            bit = (idx >> pos) & 1
            pt = _mixed_point(r_bound, idx, pos, 0)
            val0 = tb.evaluate_mle(vt, list(reversed(pt)), 64)
            pt[pos] = 2
            val2 = tb.evaluate_mle(vt, list(reversed(pt)), 64)
            if bit:
                e2 += pw * 2 % P * (coeff * val2 % P)
            else:
                e0 += pw * (coeff * val0 % P)
                e2 -= pw * (coeff * val2 % P)
        e0 %= P
        e2 %= P
        e1 = (claim - e0) % P
        compressed = unipoly.compress(unipoly.interpolate([e0, e1, e2]))
        res.compressed_addr.append(compressed)
        r = _absorb_round(transcript, compressed)
        r_bound[pos] = r
        eg_challenges.append(r)
        claim = _eval2(compressed, claim, r)
        nxt = []
        for (A, V) in dense:
            A = [(A[w] + r * (A[w | half] - A[w])) % P for w in range(half)]
            V = [(V[w] + r * (V[w | half] - V[w])) % P for w in range(half)]
            nxt.append((A, V))
        dense = nxt

    res.r_addr = [r_bound[p] for p in range(ADDR_VARS)]   # LE by bit position

    # ---- Phase B: cycle rounds over eq * w * C(slot) ------------------------
    wv = [0] * T
    for grp in grouplist:
        for t in range(len(grp.idx)):
            full = grp.pref[t]
            for posn in range(ENDGAME_VARS):
                b = (grp.idx[t] >> posn) & 1
                rr = r_bound[posn]
                full = full * (rr if b else (1 - rr)) % P
            wv[grp.cyc[t]] = full
    ctab = ctable_values(bc_index, gammas, res.r_addr, bc_index.size)
    cs = [ctab[slots[j]] for j in range(T)]

    eqf = FrVec.from_ints(eqv)
    wf = FrVec.from_ints(wv)
    cf = FrVec.from_ints(cs)
    for _ in range(n_cycle_vars):
        evs = FrVec.prod_evals_adj([eqf, wf, cf], 3)
        e1 = (claim - evs[0]) % P
        compressed = unipoly.evals_to_compressed([evs[0], e1, evs[2], evs[3]])
        res.compressed_cycle.append(compressed)
        r = _absorb_round(transcript, compressed)
        res.r_cycle.append(r)
        claim = _eval3(compressed, claim, r)
        eqf = eqf.fold_adj(r)
        wf = wf.fold_adj(r)
        cf = cf.fold_adj(r)

    res.final_claim = claim
    res.w_claim = wf.first()
    res.cs_claim = cf.first()
    transcript.append_scalar(res.w_claim)
    transcript.append_scalar(res.cs_claim)
    return res


def _eval3(compressed3: list[int], hint: int, x: int) -> int:
    from .stage2_batch import eval_from_hint

    return eval_from_hint(compressed3, hint, x)


# ---------------------------------------------------------------------------
# Slow differential oracle (tests): per-round generic closed-form evaluation
# ---------------------------------------------------------------------------

def slow_phase_a_round_evals(entries, gammas, eqv, r_bound, pos, claim):
    e0 = e2 = 0
    for (j, idx, spec) in entries:
        pref = 1
        for p, rr in r_bound.items():
            b = (idx >> p) & 1
            pref = pref * (rr if b else (1 - rr)) % P
        wt = eqv[j] * pref % P
        bit = (idx >> pos) & 1
        for c in (0, 2):
            pt = _mixed_point(r_bound, idx, pos, c)
            val = gm_eval_point(spec, gammas, pt)
            chi = (1 - bit) if c == 0 else (2 if bit else -1)
            if c == 0:
                e0 += wt * chi % P * val
            else:
                e2 += wt * chi % P * val
    return e0 % P, e2 % P


# ---------------------------------------------------------------------------
# Stage-8 verifier
# ---------------------------------------------------------------------------

def verify_stage8(transcript, proof: Stage8Result, lo_claim: int,
                  left_claim: int, right_claim: int, r_cycle_be: list[int],
                  n_cycle_vars: int):
    """Replay the stage-8 transcript; returns (ok, info) where info carries
    the points/claims consumed by stages 9 and the bytecode read-check."""
    g = transcript.challenge_scalar_full()
    if g != proof.gamma % P:
        return False, {}
    gammas = [1, g, g * g % P, g * g % P * g % P]
    transcript.append_scalar(proof.const_claim % P)
    transcript.append_scalar(proof.valid_rhs % P)
    claim = (lo_claim + g * left_claim + gammas[2] * right_claim
             - proof.const_claim + gammas[3] * proof.valid_rhs) % P
    if len(proof.compressed_addr) != ADDR_VARS:
        return False, {}
    if len(proof.compressed_cycle) != n_cycle_vars:
        return False, {}
    r_addr_msb_first = []
    for cp in proof.compressed_addr:
        if len(cp) != 2:
            return False, {}
        r = _absorb_round(transcript, cp)
        r_addr_msb_first.append(r)
        claim = _eval2(cp, claim, r)
    r_cycle = []
    for cp in proof.compressed_cycle:
        if len(cp) != 3:
            return False, {}
        r = _absorb_round(transcript, cp)
        r_cycle.append(r)
        claim = _eval3(cp, claim, r)
    transcript.append_scalar(proof.w_claim % P)
    transcript.append_scalar(proof.cs_claim % P)
    # final identity: claim == eq(rc1, r_cycle) * w * cs
    eq_end = eq_point_eval(list(reversed([c % P for c in r_cycle_be])), r_cycle)
    ok = claim == eq_end * (proof.w_claim % P) % P * (proof.cs_claim % P) % P
    r_addr_le = [0] * ADDR_VARS
    for i, rr in enumerate(r_addr_msb_first):
        r_addr_le[ADDR_VARS - 1 - i] = rr
    info = {"gammas": gammas, "r_addr": r_addr_le, "r_cycle": r_cycle,
            "w_claim": proof.w_claim % P, "cs_claim": proof.cs_claim % P,
            "const_claim": proof.const_claim % P,
            "valid_rhs": proof.valid_rhs % P}
    return ok, info


# ---------------------------------------------------------------------------
# Stage 9: InstructionRaVirtualization — bind w_claim to the committed
# one-hot InstructionRa chunks (degree 33 sumcheck over the cycle cube)
# ---------------------------------------------------------------------------

@dataclass
class Stage9Result:
    compressed_polys: list[list[int]] = dfield(default_factory=list)
    challenges: list[int] = dfield(default_factory=list)
    oh_claims: list[int] = dfield(default_factory=list)
    final_claim: int = 0


def chunk_points(r_addr_le: list[int]) -> list[list[int]]:
    """4-bit LE point slice per committed chunk d (chunk 0 = high bits,
    commitments.build_instruction_ra layout: shift = 4*(D-1-d))."""
    out = []
    for d in range(INSTRUCTION_D):
        sh = LOG_K_CHUNK * (INSTRUCTION_D - 1 - d)
        out.append(r_addr_le[sh:sh + LOG_K_CHUNK])
    return out


def _eq_le_bits(r: list[int], v: int) -> int:
    out = 1
    for i, ri in enumerate(r):
        out = out * (ri if (v >> i) & 1 else (1 - ri)) % P
    return out


def prove_stage9(transcript, padded_steps, r_addr_le: list[int],
                 r_cycle8: list[int], w_claim: int,
                 n_cycle_vars: int) -> Stage9Result:
    from ..native.frvec import FrVec
    from .stage67 import eval_from_hint_any

    res = Stage9Result()
    T = 1 << n_cycle_vars
    pts = chunk_points(r_addr_le)
    luts = [[_eq_le_bits(pts[d], v) for v in range(16)]
            for d in range(INSTRUCTION_D)]

    oh_l = [[0] * T for _ in range(INSTRUCTION_D)]
    for j, s in enumerate(padded_steps):
        if getattr(s, "is_noop", False):
            continue
        idx = sound_lookup_index(s)
        if idx is None:
            continue
        for d in range(INSTRUCTION_D):
            sh = LOG_K_CHUNK * (INSTRUCTION_D - 1 - d)
            oh_l[d][j] = luts[d][(idx >> sh) & 15]

    eqf = FrVec.eq_table_be(list(reversed([c % P for c in r_cycle8])))
    oh = [FrVec.from_ints(t) for t in oh_l]
    deg = INSTRUCTION_D + 1
    claim = w_claim % P
    for _ in range(n_cycle_vars):
        evs = FrVec.prod_evals_adj([eqf] + oh, deg)
        compressed = unipoly.compress(unipoly.interpolate(evs))
        res.compressed_polys.append(compressed)
        r = _absorb_round(transcript, compressed)
        res.challenges.append(r)
        claim = eval_from_hint_any(compressed, claim, r)
        eqf = eqf.fold_adj(r)
        oh = [t.fold_adj(r) for t in oh]
    res.final_claim = claim
    res.oh_claims = [t.first() for t in oh]
    for v in res.oh_claims:
        transcript.append_scalar(v)
    return res


def verify_stage9(transcript, compressed_polys, oh_claims, r_cycle8,
                  w_claim: int, n_cycle_vars: int):
    from .stage67 import eval_from_hint_any

    if len(compressed_polys) != n_cycle_vars:
        return False, []
    claim = w_claim % P
    challenges = []
    for cp in compressed_polys:
        if len(cp) != INSTRUCTION_D + 1:
            return False, []
        r = _absorb_round(transcript, cp)
        challenges.append(r)
        claim = eval_from_hint_any(cp, claim, r)
    for v in oh_claims:
        transcript.append_scalar(v % P)
    eq_end = eq_point_eval(r_cycle8, challenges)
    expected = eq_end
    for v in oh_claims:
        expected = expected * (v % P) % P
    return claim == expected, challenges
