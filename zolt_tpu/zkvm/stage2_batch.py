"""Stage 2 batched sumcheck: 5 instances over max(log_ram_k + n_cycle) rounds.

Byte-exact re-implementation of the reference's stage-2 batch
(src/zkvm/proof_converter.zig:2736-3520) and its five instance provers:

  0 ProductVirtualRemainder   n_cycle rounds (spartan/product_remainder.zig)
  1 RamRafEvaluation          log_ram_k rounds (ram/raf_checking.zig)
  2 RamReadWriteChecking      log_ram_k + n_cycle rounds (ram/read_write_checking.zig)
  3 RamOutputCheck            log_ram_k rounds (ram/output_check.zig)
  4 InstructionLookupsClaimReduction  n_cycle rounds (claim_reductions/instruction_lookups.zig)

Instance i activates at round max_rounds − rounds_i; before activation it
contributes its input claim scaled by 2^(remaining−1) as a constant. Per round
the α-weighted evals are compressed to [c0,c2,c3], absorbed as
UniPoly_begin/…/UniPoly_end, and the batched claim evolves via evalFromHint.

Endianness quirks preserved: RWC/Output/Instr eq tables are big-endian over
their r vectors; RAF's eq is little-endian; all data folds are low-to-high.
"""

from __future__ import annotations

from ..parallel.stage_engine import stage_enabled as _se

from dataclasses import dataclass, field as dfield

from ..field.params import FR
from ..poly import unipoly
from ..poly.special import GruenSplitEq
from ..r1cs import inputs as ri
from ..r1cs import uniskip as us

P = FR.p
TWO64 = 1 << 64


def _eq_be(r: list[int], x: int, n: int) -> int:
    acc = 1
    for i in range(n):
        bit = (x >> (n - 1 - i)) & 1
        acc = acc * ((r[i] * bit + (1 - r[i]) * (1 - bit)) % P) % P
    return acc


def _eq_table_be(r: list[int]) -> list[int]:
    from ..native.frvec import FrVec

    return FrVec.eq_table_be([t % P for t in r]).to_ints()


def _eq_table_le(r: list[int], n_vars: int) -> list[int]:
    """Little-endian: bit i of index ↔ r[i] (raf_checking computeEqEvals)."""
    out = [1]
    for i in range(n_vars):
        t = r[i] if i < len(r) else 0
        nxt = [0] * (2 * len(out))
        for j, v in enumerate(out):
            nxt[j] = v * (1 - t) % P
            nxt[j + len(out)] = v * t % P
        out = nxt
    return out


def _lagrange_eval_0123(evals4: list[int], c: int) -> int:
    """Evaluate the cubic through evals at {0,1,2,3} at point c."""
    coeffs = unipoly.interpolate_degree3(evals4)
    return unipoly.horner_eval(coeffs, c)


def eval_from_hint(compressed: list[int], hint: int, x: int) -> int:
    c0, c2, c3 = compressed
    c1 = (hint - 2 * c0 - c2 - c3) % P
    return (c0 + c1 * x + c2 * x * x + c3 * x ** 3) % P


def _gruen_cubic(se: GruenSplitEq, q0: int, qinf: int, claim: int) -> list[int]:
    if se.current_index == 0:
        return [claim % P, 0, 0, 0]
    tau_c = se.tau[se.current_index - 1]
    eq0 = se.current_scalar * (1 - tau_c) % P
    eq1 = se.current_scalar * tau_c % P
    slope = (eq1 - eq0) % P
    l2 = (eq0 + 2 * slope) % P
    l3 = (eq0 + 3 * slope) % P
    c = q0 % P
    e = qinf % P
    q1 = 0 if eq1 == 0 else (claim - eq0 * c) % P * pow(eq1, -1, P) % P
    q2 = (2 * q1 - c + 2 * e) % P
    q3 = (q2 + q1 - c + 4 * e) % P
    return [eq0 * c % P, eq1 * q1 % P, l2 * q2 % P, l3 * q3 % P]


def _window_tables(se: GruenSplitEq):
    """getWindowEqTables(·, 1): E_out/E_in prefix tables + head_in_bits."""
    head = se.current_index - 1 if se.current_index > 0 else 0
    head_out = min(head, se.m)
    head_in = head - head_out
    E_out = se.E_out_vec[min(head_out, len(se.E_out_vec) - 1)]
    E_in = se.E_in_vec[min(head_in, len(se.E_in_vec) - 1)]
    return E_out, E_in, head_in


# ---------------------------------------------------------------------------
# Instance 0: ProductVirtualRemainder
# ---------------------------------------------------------------------------

class ProductVirtualRemainderProver:
    def __init__(self, r0: int, tau: list[int], uni_skip_claim: int, factors,
                 backend: str | None = None, mesh=None, dev_store=None):
        """`factors` are the 8 product-factor FrVec COLUMNS
        (proof_converter.extract_product_factors)."""
        padded = factors[0].n
        self.num_cycle_vars = padded.bit_length() - 1
        w = us.lagrange_evals(us.PV_DOMAIN, r0)
        tau_low, tau_high = tau[:-1], tau[-1]
        kern = us.lagrange_kernel(us.PV_DOMAIN, r0, tau_high)
        self.split_eq = GruenSplitEq(tau_low, scaling_factor=kern)
        self.current_round = 0
        self.current_claim = uni_skip_claim % P
        self._dev = None
        use_dev = (backend in ("device", "mesh") and padded >= 2
                   and _se("stage2"))
        if use_dev and dev_store is not None:
            # raw-upload tier: the fused left/right lincombs
            # (proof_converter.fused_factor_columns) build on device from
            # the resident raw columns — no 32-byte residue upload at all
            from ..parallel import device_cols as dc
            from ..r1cs import inputs as ri
            from .device_outer import DeviceOuterRounds, MeshOuterRounds

            I = ri.Inp
            g = dev_store.get
            left_d = dc.lincomb_dev(
                [g(I.LeftInstructionInput), g(I.FlagIsRdNotZero),
                 g(I.LookupOutput), g(I.FlagJump)],
                [w[0], (w[1] + w[2]) % P, w[3], w[4]])
            right_d = dc.lincomb_dev(
                [g(I.RightInstructionInput), g(I.FlagWriteLookupOutputToRD),
                 g(I.FlagJump), g(I.FlagBranch),
                 dev_store.shifted_flag_not(I.FlagIsNoop, fill=1)],
                [w[0], w[1], w[2], w[3], w[4]])
            self.left = self.right = None
            if backend == "mesh":
                self._dev = MeshOuterRounds(left_d, right_d, mesh,
                                            se=self.split_eq)
            else:
                self._dev = DeviceOuterRounds(left_d, right_d,
                                              se=self.split_eq)
            return
        from ..zkvm.proof_converter import fused_factor_columns

        self.left, self.right = fused_factor_columns(factors, w)
        if use_dev:
            from .device_outer import DeviceOuterRounds, MeshOuterRounds

            if backend == "mesh":
                self._dev = MeshOuterRounds(self.left, self.right, mesh,
                                            se=self.split_eq)
            else:
                self._dev = DeviceOuterRounds(self.left, self.right,
                                              se=self.split_eq)
            self.left = self.right = None

    def eval_future(self):
        """Device (2, 16) [t0, t∞] array for this round, or None when on
        host (the stage loop batches futures into one download per round)."""
        return self._dev.round_evals_device() if self._dev is not None else None

    def round_evals(self, pre: list[int] | None = None) -> list[int]:
        from ..native.frvec import FrVec

        if self._dev is not None:
            t0, tinf = pre if pre is not None else self._dev.round_evals()
            evals = _gruen_cubic(self.split_eq, t0, tinf, self.current_claim)
            return self._pv_compress(evals)
        E_out, E_in, head_in = _window_tables(self.split_eq)
        num_groups = len(self.left) // 2
        t0, tinf = FrVec.gruen_quad(FrVec.from_ints(E_out), FrVec.from_ints(E_in),
                                    head_in, self.left, self.right, num_groups)
        evals = _gruen_cubic(self.split_eq, t0, tinf, self.current_claim)
        return self._pv_compress(evals)

    def _pv_compress(self, evals: list[int]) -> list[int]:
        # replicate the driver's compressed->evals round trip (proof_converter)
        compressed = unipoly.evals_to_compressed(evals)
        c0, c2, c3 = compressed
        c1 = (self.current_claim - 2 * c0 - c2 - c3) % P
        s0 = c0
        s1 = (self.current_claim - s0) % P
        s2 = (c0 + 2 * c1 + 4 * c2 + 8 * c3) % P
        s3 = (c0 + 3 * c1 + 9 * c2 + 27 * c3) % P
        return [s0, s1, s2, s3]

    def bind(self, r: int) -> None:
        if self._dev is not None:
            self._dev.bind(r)
        else:
            self.left = self.left.fold_adj(r)
            self.right = self.right.fold_adj(r)
        self.split_eq.bind(r)
        self.current_round += 1

    def update_claim(self, evals4: list[int], r: int) -> None:
        self.current_claim = _lagrange_eval_0123(evals4, r)


# ---------------------------------------------------------------------------
# Instance 1: RamRafEvaluation
# ---------------------------------------------------------------------------

class RafEvaluationProver:
    def __init__(self, accesses, r_cycle: list[int], start_address: int,
                 log_k: int, initial_claim: int, sound: bool = False):
        k_size = 1 << log_k
        ra = [0] * k_size
        self.ra = ra
        if sound:
            # Sound mode: ra(k) = Σ_cycles eq_BE(r_cycle, cycle)·[cycle
            # accessed slot k] — the aggregation whose Σ_k ra(k)·unmap(k)
            # equals the RamAddress opening claim, making the verifier's
            # final check ra_claim·unmap(r) exact. (The reference-compat
            # mode reproduces the reference's LE-by-access-index table,
            # raf_checking.zig computeEqEvals.)
            eq = _eq_table_be(r_cycle)
            for a in accesses:
                if a.address >= start_address and a.timestamp < len(eq):
                    k = (a.address - start_address) // 8
                    if k < k_size:
                        self.ra[k] = (self.ra[k] + eq[a.timestamp]) % P
        else:
            n_acc = len(accesses)
            log_t = max(0, (n_acc - 1).bit_length()) if n_acc > 1 else 0
            eq = _eq_table_le(r_cycle, log_t)
            for j, a in enumerate(accesses):
                if a.address >= start_address:
                    k = (a.address - start_address) // 8
                    if k < k_size:
                        self.ra[k] = (self.ra[k] + (eq[j] if j < len(eq) else 0)) % P
        from ..native.frvec import FrVec

        self.ra = FrVec.from_ints(ra)
        self.num_vars = log_k
        self.start_address = start_address
        self.bound_values: list[int] = []
        self.round = 0
        self.current_claim = initial_claim % P

    def round_evals(self) -> list[int]:
        from ..native.frvec import FrVec

        base = self.start_address % P
        power = 8
        for v in self.bound_values:
            base = (base + v * power) % P
            power *= 2
        current_power = power
        # u(i) = base + 2·current_power·i on the lo lane (the per-bit rem
        # walk telescopes to 2·cp·i), u2(i) = u(i) + 2·current_power
        cp2 = 2 * current_power
        s_lo, s_lo_i, s_2, s_2_i = FrVec.raf_sums(self.ra)
        s0 = (s_lo * base + s_lo_i * cp2) % P
        s2 = (s_2 * (base + cp2) + s_2_i * cp2) % P
        s1 = (self.current_claim - s0) % P
        s3 = (s0 - 3 * s1 + 3 * s2) % P
        return [s0, s1, s2, s3]

    def bind(self, r: int) -> None:
        self.ra = self.ra.fold_adj(r)
        self.num_vars -= 1
        self.bound_values.append(r)
        self.round += 1

    def update_claim(self, evals4: list[int], r: int) -> None:
        self.current_claim = _lagrange_eval_0123(evals4, r)


# ---------------------------------------------------------------------------
# Instance 2: RamReadWriteChecking
# ---------------------------------------------------------------------------

@dataclass(slots=True)
class RWCEntry:
    cycle: int
    address: int
    ra: int       # field
    val: int      # field
    prev_val: int  # u64
    next_val: int  # u64


class RamReadWriteCheckingProver:
    def __init__(self, accesses, gamma: int, r_cycle: list[int], log_k: int,
                 log_t: int, phase1_rounds: int, start_address: int,
                 initial_claim: int, initial_ram: dict[int, int]):
        self.gamma = gamma % P
        self.log_k = log_k
        self.log_t = log_t
        self.phase1 = phase1_rounds
        self.round = 0
        self.current_claim = initial_claim % P
        self.challenges: list[int] = []
        K = 1 << log_k
        T = 1 << log_t

        self.inc = [0] * T
        self.val_init = [0] * K
        cur_val: dict[int, int] = {}
        for addr, val in initial_ram.items():
            if addr >= start_address:
                idx = (addr - start_address) // 8
                if idx < K:
                    self.val_init[idx] = val % P
                    cur_val[idx] = val

        entries: list[RWCEntry] = []
        for a in accesses:
            if a.timestamp >= T or a.address < start_address:
                continue
            idx = (a.address - start_address) // 8
            if idx >= K:
                continue
            prev = cur_val.get(idx, 0)
            if a.op == "write":
                new = a.post_value
                self.inc[a.timestamp] = (new - prev) % P
                cur_val[idx] = new
                val_coeff = prev % P
                next_val = new
            else:
                val_coeff = a.post_value % P
                next_val = a.post_value
            entries.append(RWCEntry(a.timestamp, idx, 1, val_coeff, prev, next_val))
        entries.sort(key=lambda e: (e.cycle, e.address))
        self.entries = entries

        from ..native.frvec import FrVec

        # FrVec with IN-PLACE PREFIX folds: this prover's byte-exact schedule
        # keeps full-length tables and reads beyond the fold frontier
        # (stale tails), matching the original in-place list folds
        self.inc = FrVec.from_ints(self.inc)
        self.val_init = FrVec.from_ints(self.val_init)
        self.eq_evals = FrVec.from_ints(_eq_table_be([c % P for c in r_cycle]))
        self.eq_size = T
        self.gruen = GruenSplitEq(list(r_cycle))

    # -- round polynomials -------------------------------------------------
    def round_evals(self) -> list[int]:
        phase2_end = self.phase1 + self.log_k
        if self.round < self.phase1 or self.round >= phase2_end:
            return self._phase1_poly()
        return self._phase2_poly()

    def _phase1_poly(self) -> list[int]:
        E_out, E_in, head_in = _window_tables(self.gruen)
        g = self.gamma
        q0 = qinf = 0
        items = self.entries
        # one batched from_mont decode per round instead of a ~9 µs
        # FrVec.get per entry (a dense ram trace has ~T entries; the
        # per-element path measured 150+ s at T=2^18) — full-length decode
        # keeps the byte-exact stale-tail read schedule
        inc_l = self.inc.to_ints()
        n_inc = len(inc_l)
        n_items = len(items)
        i = 0
        while i < n_items:
            e = items[i]
            pair = e.cycle // 2
            x_out = pair >> head_in
            x_in = pair & ((1 << head_in) - 1)
            e_out = E_out[x_out] if x_out < len(E_out) else 1
            e_in = E_in[x_in] if x_in < len(E_in) else 1
            E_pref = e_out * e_in % P
            jp = pair * 2
            inc0 = inc_l[jp] if jp < n_inc else 0
            inc1 = inc_l[jp + 1] if jp + 1 < n_inc else 0
            incI = (inc1 - inc0) % P

            if e.cycle % 2 == 0:
                has_odd = (i + 1 < n_items and items[i + 1].cycle // 2 == pair
                           and items[i + 1].address == e.address
                           and items[i + 1].cycle % 2 == 1)
                if has_odd:
                    o = items[i + 1]
                    ra0, raI = e.ra, (o.ra - e.ra) % P
                    val0, valI = e.val, (o.val - e.val) % P
                    i += 2
                else:
                    ra0, raI = e.ra, (-e.ra) % P
                    val0, valI = e.val, (e.next_val - e.val) % P
                    i += 1
            else:
                ra0, raI = 0, e.ra
                val0 = e.prev_val % P
                valI = (e.val - val0) % P
                i += 1

            inner0 = (val0 + g * ((inc0 + val0) % P)) % P
            innerI = (valI + g * ((incI + valI) % P)) % P
            q0 = (q0 + E_pref * ra0 % P * inner0) % P
            qinf = (qinf + E_pref * raI % P * innerI) % P
        return _gruen_cubic(self.gruen, q0, qinf, self.current_claim)

    def _phase2_poly(self) -> list[int]:
        addr_round = self.round - self.phase1
        if addr_round == 0:
            self.entries.sort(key=lambda e: (e.address, e.cycle))
        g = self.gamma
        eq_cycle = self.eq_evals.first()
        inc_s = self.inc.first()
        K = 1 << self.log_k
        vsize = K >> addr_round
        one_plus_g = (1 + g) % P
        s0 = s2 = 0
        items = self.entries
        vi_l = self.val_init.to_ints()  # one decode/round (see _phase1_poly)
        i = 0
        while i < len(items):
            col = items[i].address >> addr_round
            col_pair = col // 2
            even_cp = (vi_l[col_pair * 2] if col_pair * 2 < vsize else 0)
            odd_cp = (vi_l[col_pair * 2 + 1] if col_pair * 2 + 1 < vsize else 0)
            pair_end = i
            while pair_end < len(items) and (items[pair_end].address >> addr_round) // 2 == col_pair:
                pair_end += 1
            odd_start = i
            while odd_start < pair_end and (items[odd_start].address >> addr_round) % 2 == 0:
                odd_start += 1
            ei, oi = i, odd_start

            _eq_addr_memo: dict[int, int] = {}

            def eq_addr(entry):
                key = entry.address & ((1 << addr_round) - 1)
                v = _eq_addr_memo.get(key)
                if v is None:
                    acc = 1
                    for b in range(addr_round):
                        bit = (key >> b) & 1
                        rb = self.challenges[self.phase1 + b]
                        acc = acc * ((rb if bit else (1 - rb)) % P) % P
                    v = eq_cycle * acc % P
                    _eq_addr_memo[key] = v
                return v

            def contrib(ra0, ra2v, val0, val2v, eqp):
                nonlocal s0, s2
                s0 = (s0 + eqp * ra0 % P * ((val0 * one_plus_g + g * inc_s) % P)) % P
                s2 = (s2 + eqp * ra2v % P * ((val2v * one_plus_g + g * inc_s) % P)) % P

            while ei < odd_start and oi < pair_end:
                ee, oe = items[ei], items[oi]
                if ee.cycle == oe.cycle:
                    contrib(ee.ra, (2 * oe.ra - ee.ra) % P, ee.val,
                            (2 * oe.val - ee.val) % P, eq_addr(ee))
                    even_cp = ee.next_val % P
                    odd_cp = oe.next_val % P
                    ei += 1
                    oi += 1
                elif ee.cycle < oe.cycle:
                    contrib(ee.ra, (-ee.ra) % P, ee.val, (2 * odd_cp - ee.val) % P,
                            eq_addr(ee))
                    even_cp = ee.next_val % P
                    ei += 1
                else:
                    contrib(0, 2 * oe.ra % P, even_cp, (2 * oe.val - even_cp) % P,
                            eq_addr(oe))
                    odd_cp = oe.next_val % P
                    oi += 1
            while ei < odd_start:
                ee = items[ei]
                contrib(ee.ra, (-ee.ra) % P, ee.val, (2 * odd_cp - ee.val) % P, eq_addr(ee))
                even_cp = ee.next_val % P
                ei += 1
            while oi < pair_end:
                oe = items[oi]
                contrib(0, 2 * oe.ra % P, even_cp, (2 * oe.val - even_cp) % P, eq_addr(oe))
                odd_cp = oe.next_val % P
                oi += 1
            i = pair_end

        s1 = (self.current_claim - s0) % P
        s3 = (3 * s2 - 3 * s1 + s0) % P
        return [s0, s1, s2, s3]

    # -- binding ------------------------------------------------------------
    def bind(self, r: int) -> None:
        self.challenges.append(r)
        phase2_end = self.phase1 + self.log_k
        in_cycle = self.round < self.phase1 or self.round >= phase2_end
        if in_cycle and self.eq_size > 1:
            half = self.eq_size // 2
            self.eq_evals.fold_adj_prefix_(r, self.eq_size)
            self.inc.fold_adj_prefix_(r, self.eq_size)
            self.eq_size = half
            self.gruen.bind(r)
            self._bind_entries_cycle(r)
        if self.phase1 <= self.round < phase2_end:
            addr_round = self.round - self.phase1
            K = 1 << self.log_k
            size = K >> addr_round
            if size > 1:
                self.val_init.fold_adj_prefix_(r, size)
            self._bind_entries_address(r, addr_round)
        self.round += 1

    def _bind_entries_cycle(self, r: int) -> None:
        new: list[RWCEntry] = []
        items = self.entries
        i = 0
        while i < len(items):
            e = items[i]
            pair = e.cycle // 2
            even = odd = None
            if e.cycle % 2 == 0:
                even = e
                if (i + 1 < len(items) and items[i + 1].cycle // 2 == pair
                        and items[i + 1].address == e.address
                        and items[i + 1].cycle % 2 == 1):
                    odd = items[i + 1]
                    i += 1
            else:
                odd = e
            i += 1
            if even is not None and odd is not None:
                new.append(RWCEntry(even.cycle // 2, even.address,
                                    (even.ra + r * (odd.ra - even.ra)) % P,
                                    (even.val + r * (odd.val - even.val)) % P,
                                    even.prev_val, odd.next_val))
            elif even is not None:
                ov = even.next_val % P
                new.append(RWCEntry(even.cycle // 2, even.address,
                                    (1 - r) * even.ra % P,
                                    (even.val + r * (ov - even.val)) % P,
                                    even.prev_val, even.next_val))
            else:
                ev = odd.prev_val % P
                new.append(RWCEntry(odd.cycle // 2, odd.address,
                                    r * odd.ra % P,
                                    (ev + r * (odd.val - ev)) % P,
                                    odd.prev_val, odd.next_val))
        self.entries = new

    def _bind_entries_address(self, r: int, addr_round: int) -> None:
        K = 1 << self.log_k
        vsize = K >> addr_round
        new: list[RWCEntry] = []
        items = self.entries
        vi_l = self.val_init.to_ints()  # one decode/round (see _phase1_poly)
        i = 0
        while i < len(items):
            col = items[i].address >> addr_round
            col_pair = col // 2
            even_cp = (vi_l[col_pair * 2] if col_pair * 2 < vsize else 0)
            odd_cp = (vi_l[col_pair * 2 + 1] if col_pair * 2 + 1 < vsize else 0)
            pair_end = i
            while pair_end < len(items) and (items[pair_end].address >> addr_round) // 2 == col_pair:
                pair_end += 1
            odd_start = i
            while odd_start < pair_end and (items[odd_start].address >> addr_round) % 2 == 0:
                odd_start += 1
            ei, oi = i, odd_start
            while ei < odd_start and oi < pair_end:
                ee, oe = items[ei], items[oi]
                if ee.cycle == oe.cycle:
                    new.append(RWCEntry(ee.cycle, ee.address // 2,
                                        (ee.ra + r * (oe.ra - ee.ra)) % P,
                                        (ee.val + r * (oe.val - ee.val)) % P,
                                        ee.prev_val, oe.next_val))
                    even_cp, odd_cp = ee.next_val % P, oe.next_val % P
                    ei += 1
                    oi += 1
                elif ee.cycle < oe.cycle:
                    new.append(RWCEntry(ee.cycle, ee.address // 2,
                                        (1 - r) * ee.ra % P,
                                        (ee.val + r * (odd_cp - ee.val)) % P,
                                        ee.prev_val, ee.next_val))
                    even_cp = ee.next_val % P
                    ei += 1
                else:
                    new.append(RWCEntry(oe.cycle, oe.address // 2,
                                        r * oe.ra % P,
                                        (even_cp + r * (oe.val - even_cp)) % P,
                                        oe.prev_val, oe.next_val))
                    odd_cp = oe.next_val % P
                    oi += 1
            while ei < odd_start:
                ee = items[ei]
                new.append(RWCEntry(ee.cycle, ee.address // 2,
                                    (1 - r) * ee.ra % P,
                                    (ee.val + r * (odd_cp - ee.val)) % P,
                                    ee.prev_val, ee.next_val))
                even_cp = ee.next_val % P
                ei += 1
            while oi < pair_end:
                oe = items[oi]
                new.append(RWCEntry(oe.cycle, oe.address // 2,
                                    r * oe.ra % P,
                                    (even_cp + r * (oe.val - even_cp)) % P,
                                    oe.prev_val, oe.next_val))
                odd_cp = oe.next_val % P
                oi += 1
            i = pair_end
        self.entries = new

    def update_claim(self, evals4: list[int], r: int) -> None:
        self.current_claim = _lagrange_eval_0123(evals4, r)


# ---------------------------------------------------------------------------
# Instance 2 (sound mode): honest RAM read/write checking
# ---------------------------------------------------------------------------

class SoundRamReadWriteCheckingProver:
    """Honest RWC prover for sound mode (address-first schedule).

    Proves  rv + γ·wv  =  Σ_{k,j} eq(r_cycle,j)·Ra(k,j)·((1+γ)·Val(k,j) + γ·Inc(j))
    with Val(k,j) = value of word k *before* cycle j, Ra one-hot at the
    accessed word, Inc(j) the write delta. Unlike the reference's phase-interleaved
    sparse machinery (ram/read_write_checking.zig, reproduced bit-exactly in
    RamReadWriteCheckingProver above for compat mode), every round polynomial
    here is computed from the data — s1 equals claim − s0 *because the data
    sums correctly*, the final claim equals
        eq_bound · ra_bound · ((1+γ)·val_bound + γ·inc_bound)
    and the emitted opening claims ARE those bound MLE values, so the verifier
    can enforce the instance's final-output identity from public data alone.

    Schedule: the first log_k batch rounds bind ADDRESS bits (low bit first),
    the remaining n_cycle rounds bind CYCLE bits (low bit first). Encoded in
    the proof as ReadWriteConfig.ram_rw_phase1_num_rounds == 0 so the generic
    r_address/r_cycle bookkeeping (stage-4 + verifier) needs no special case.

    Val stays implicit during address rounds: block folds are
    background(val_init fold) + Σ_{touched k in block} lag(k)·(val_k(j)−init_k),
    with per-touched-address value timelines — memory is O(K + T·touched),
    never O(K·T).
    """

    def __init__(self, accesses, gamma: int, r_cycle: list[int], log_k: int,
                 log_t: int, start_address: int, initial_claim: int,
                 initial_ram: dict[int, int]):
        self.gamma = gamma % P
        self.log_k = log_k
        self.log_t = log_t
        self.round = 0
        self.current_claim = initial_claim % P
        K, T = 1 << log_k, 1 << log_t

        self.eqv = _eq_table_be([c % P for c in r_cycle])
        self.incv = [0] * T
        self.bg = [0] * K            # val_init fold (dense over addresses)
        init_word: dict[int, int] = {}
        for addr, val in initial_ram.items():
            if addr >= start_address:
                k = (addr - start_address) // 8
                if k < K:
                    self.bg[k] = val % P
                    init_word[k] = val % P

        # Replay: per-cycle access + per-touched-word WRITE EVENTS. The
        # bound val sum Σ_{k in block} lag[k]·(val_k(j)−init_k) is piecewise
        # constant in j with one step per write, so each block keeps a
        # sorted (cycle, prefix) event list; binding merges the two child
        # lists with the (1−r)/r factors applied uniformly per child (every
        # member of a child shares the same new lag factor). Memory and
        # per-round work are O(#writes), never O(touched·T).
        self.acc_k = [None] * T      # accessed word index per cycle
        cur: dict[int, int] = dict(init_word)
        # ev[c] = (cycles list asc, prefix sums list): Σ deltas with cycle<=j
        self.ev: dict[int, tuple[list[int], list[int]]] = {}
        raw_events: dict[int, list[tuple[int, int]]] = {}
        acc_by_cycle = {}
        for a in accesses:
            if a.address < start_address:
                continue
            k = (a.address - start_address) // 8
            if k >= K or a.timestamp >= T:
                continue
            acc_by_cycle[a.timestamp] = (k, a)
        for j in range(T):
            if j in acc_by_cycle:
                k, a = acc_by_cycle[j]
                self.acc_k[j] = k
                if a.op == "write":
                    old = cur.get(k, 0)
                    self.incv[j] = (a.post_value - old) % P
                    # val_k changes from cycle j+1 onward
                    raw_events.setdefault(k, []).append(
                        (j + 1, (a.post_value - old) % P))
                    cur[k] = a.post_value
        for k, evs in raw_events.items():
            cycles, prefix = [], []
            run = 0
            for c, d in evs:           # already in ascending cycle order
                run = (run + d) % P
                cycles.append(c)
                prefix.append(run)
            self.ev[k] = (cycles, prefix)

        self.rav = [1 if self.acc_k[j] is not None else 0 for j in range(T)]
        self.valv: list[int] | None = None   # dense Val fold, built after phase A

    # -- phase A helpers ---------------------------------------------------

    def _block_sum(self, c: int, j: int) -> int:
        """Σ_{k touched, k>>round == c} lag[k]·(val_k(j) − init_k)."""
        ent = self.ev.get(c)
        if ent is None:
            return 0
        import bisect

        cycles, prefix = ent
        i = bisect.bisect_right(cycles, j)
        return prefix[i - 1] if i else 0

    def _val_bound(self, c: int, j: int, blocks=None) -> int:
        return (self.bg[c] + self._block_sum(c, j)) % P

    def round_evals(self) -> list[int]:
        g = self.gamma
        if self.round < self.log_k:
            blocks = None
            b = self.round
            s = [0, 0, 0, 0]
            for j in range(1 << self.log_t):
                k = self.acc_k[j]
                if k is None or self.rav[j] == 0:
                    continue
                m = k >> b
                mp, parity = m >> 1, m & 1
                v_lo = self._val_bound(2 * mp, j, blocks)
                v_hi = self._val_bound(2 * mp + 1, j, blocks)
                dv = (v_hi - v_lo) % P
                ra = self.rav[j]
                eqj, incj = self.eqv[j], self.incv[j]
                for t in range(4):
                    ra_t = ra * (t if parity else (1 - t)) % P
                    if ra_t == 0:
                        continue
                    inner = ((1 + g) * ((v_lo + t * dv) % P) + g * incj) % P
                    s[t] = (s[t] + eqj * ra_t % P * inner) % P
            return s
        # phase B: dense cycle rounds over eq · ra · ((1+γ)·val + γ·inc)
        if self.valv is None:
            # sweep block 0's events across all cycles (O(T + #writes))
            bg0 = self.bg[0]
            ent = self.ev.get(0)
            T = 1 << self.log_t
            vals = [bg0] * T
            if ent is not None:
                cycles, prefix = ent
                pos = 0
                run = 0
                for j in range(T):
                    while pos < len(cycles) and cycles[pos] <= j:
                        run = prefix[pos]
                        pos += 1
                    vals[j] = (bg0 + run) % P
            self.valv = vals
        n = len(self.eqv)
        half = n // 2
        s = [0, 0, 0, 0]
        for i in range(half):
            e0, e1 = self.eqv[2 * i], self.eqv[2 * i + 1]
            r0, r1 = self.rav[2 * i], self.rav[2 * i + 1]
            v0, v1 = self.valv[2 * i], self.valv[2 * i + 1]
            i0, i1 = self.incv[2 * i], self.incv[2 * i + 1]
            de, dr, dv, di = e1 - e0, r1 - r0, v1 - v0, i1 - i0
            for t in range(4):
                ra_t = (r0 + t * dr) % P
                if ra_t == 0:
                    continue
                inner = ((1 + g) * ((v0 + t * dv) % P) + g * ((i0 + t * di) % P)) % P
                s[t] = (s[t] + (e0 + t * de) % P * ra_t % P * inner) % P
        return s

    def bind(self, r: int) -> None:
        if self.round < self.log_k:
            b = self.round
            half = len(self.bg) // 2
            self.bg = [(self.bg[2 * i] + r * (self.bg[2 * i + 1] - self.bg[2 * i])) % P
                       for i in range(half)]
            for j in range(1 << self.log_t):
                k = self.acc_k[j]
                if k is not None:
                    parity = (k >> b) & 1
                    self.rav[j] = self.rav[j] * ((r if parity else (1 - r)) % P) % P
            # merge child event lists into parents with the child's lag factor
            omr = (1 - r) % P
            new_ev: dict[int, tuple[list[int], list[int]]] = {}
            parents = {c >> 1 for c in self.ev}
            for p in parents:
                lo = self.ev.get(2 * p)
                hi = self.ev.get(2 * p + 1)
                # reconstruct per-event deltas from prefixes, scale, merge
                def _deltas(ent, scale):
                    if ent is None:
                        return []
                    cs, pref = ent
                    out = []
                    prev = 0
                    for c, pv in zip(cs, pref):
                        out.append((c, (pv - prev) * scale % P))
                        prev = pv
                    return out
                merged = sorted(_deltas(lo, omr) + _deltas(hi, r % P))
                run = 0
                cyc_out: list[int] = []
                pref_out: list[int] = []
                for c, d in merged:
                    run = (run + d) % P
                    if cyc_out and cyc_out[-1] == c:
                        pref_out[-1] = run
                    else:
                        cyc_out.append(c)
                        pref_out.append(run)
                new_ev[p] = (cyc_out, pref_out)
            self.ev = new_ev
        else:
            half = len(self.eqv) // 2
            for arr in (self.eqv, self.rav, self.valv, self.incv):
                for i in range(half):
                    arr[i] = (arr[2 * i] + r * (arr[2 * i + 1] - arr[2 * i])) % P
            del self.eqv[half:], self.rav[half:], self.valv[half:], self.incv[half:]
        self.round += 1

    def update_claim(self, evals4: list[int], r: int) -> None:
        self.current_claim = _lagrange_eval_0123(evals4, r)

    # -- honest final openings --------------------------------------------
    def final_openings(self) -> dict[str, int]:
        return {"ra": self.rav[0], "val": self.valv[0], "inc": self.incv[0],
                "eq": self.eqv[0]}


# ---------------------------------------------------------------------------
# Instance 3: RamOutputCheck
# ---------------------------------------------------------------------------

class OutputSumcheckProver:
    def __init__(self, initial_ram: dict[int, int], final_ram: dict[int, int],
                 r_address: list[int], layout, inputs: bytes, outputs: bytes,
                 is_panicking: bool):
        log_K = len(r_address)
        K = 1 << log_K
        lowest = layout.lowest_address()

        def remap(addr):
            if addr < lowest or (addr - lowest) % 8:
                return None
            return (addr - lowest) // 8

        import numpy as np

        # numpy scatter build over K (RAM words are u64 < p): the per-index
        # Python loops here were a fixed ~30 ms of every prove
        val_init = np.zeros(K, np.uint64)
        val_final = np.zeros(K, np.uint64)
        for addr, v in initial_ram.items():
            k = remap(addr)
            if k is not None and k < K:
                val_init[k] = v
        for addr, v in final_ram.items():
            k = remap(addr)
            if k is not None and k < K:
                val_final[k] = v

        panic_idx = remap(layout.panic_addr) or 0
        term_idx = remap(layout.termination) or 0
        if panic_idx < K:
            val_final[panic_idx] = 1 if is_panicking else 0
        if not is_panicking and term_idx < K:
            val_final[term_idx] = 1

        io_start = remap(layout.input_start) or 0
        io_end = remap(0x80000000) or K
        val_io = np.zeros(K, np.uint64)
        io_mask = np.zeros(K, bool)
        io_mask[io_start:min(io_end, K)] = True

        def fill_words(data: bytes, start_idx: int):
            nw = min((len(data) + 7) // 8, K - start_idx)
            if nw <= 0:
                return
            padded = data[: 8 * nw].ljust(8 * nw, b"\x00")
            val_io[start_idx:start_idx + nw] = np.frombuffer(padded, "<u8")

        if inputs:
            fill_words(inputs, remap(layout.input_start) or 0)
        if outputs:
            fill_words(outputs, remap(layout.output_start) or 0)
        if panic_idx < K:
            val_io[panic_idx] = 1 if is_panicking else 0
        if not is_panicking and term_idx < K:
            val_io[term_idx] = 1

        # unwritten-address reconciliation (output_check.zig:280-330)
        outside = ~io_mask
        outside[term_idx] = False
        outside[panic_idx] = False
        take = outside & (val_final == 0) & (val_init != 0)
        val_final[take] = val_init[take]
        inio = io_mask.copy()
        inio[term_idx] = False
        val_init[inio] = val_final[inio]

        from ..native.frvec import FrVec

        self.val_init = FrVec.from_u64_array(val_init)
        self.val_final = FrVec.from_u64_array(val_final)
        self.val_io = FrVec.from_u64_array(val_io)
        self.io_mask = FrVec.from_u64_array(io_mask.astype(np.uint64))
        self.eq = FrVec.eq_table_be([c % P for c in r_address])
        self.current_size = K
        self.current_claim = 0

    def round_evals(self) -> list[int]:
        from ..native.frvec import FrVec

        v = self.val_final.sub(self.val_io)
        return FrVec.prod_evals_adj([self.eq, self.io_mask, v], 3)

    def bind(self, r: int) -> None:
        self.eq = self.eq.fold_adj(r)
        self.io_mask = self.io_mask.fold_adj(r)
        self.val_final = self.val_final.fold_adj(r)
        self.val_io = self.val_io.fold_adj(r)
        self.val_init = self.val_init.fold_adj(r)
        self.current_size //= 2

    def update_claim(self, evals4: list[int], r: int) -> None:
        self.current_claim = _lagrange_eval_0123(evals4, r)


# ---------------------------------------------------------------------------
# Instance 4: InstructionLookupsClaimReduction
# ---------------------------------------------------------------------------

class InstructionLookupsProver:
    def __init__(self, gamma: int, r_spartan: list[int], n_cycle_vars: int,
                 initial_claim: int, lookup_outputs, left_ops, right_ops,
                 backend: str | None = None, mesh=None, dev_store=None):
        from ..native.frvec import FrVec

        T = 1 << n_cycle_vars
        self.gamma = gamma % P
        self.gamma_sqr = gamma * gamma % P
        assert len(r_spartan) == n_cycle_vars

        self.current_claim = initial_claim % P
        self._eng = None
        use_dev = backend in ("device", "mesh") and T >= 2 and _se("stage2")
        if use_dev and dev_store is not None:
            # raw-upload tier: eq from the challenge scalars, columns and
            # the γ-combination device-resident (parallel/device_cols)
            from ..parallel import device_cols as dc
            from ..parallel.stage_engine import DeviceProductTables
            from ..r1cs import inputs as ri

            I = ri.Inp
            eq_d = dc.eq_slice([c % P for c in r_spartan], T)
            comb_d = dev_store.combo(
                [I.LookupOutput, I.LeftLookupOperand, I.RightLookupOperand],
                [1, self.gamma, self.gamma_sqr])
            self._eng = DeviceProductTables(
                [eq_d, comb_d],
                passenger_vecs=[dev_store.get(I.LookupOutput),
                                dev_store.get(I.LeftLookupOperand),
                                dev_store.get(I.RightLookupOperand)],
                degree=2, mesh=mesh if backend == "mesh" else None)
            self.eq = self.comb = self.lo = self.left = self.right = None
            return

        def col(xs):
            if isinstance(xs, FrVec):
                return xs.copy() if xs.n == T else xs.zero_padded_copy(T)
            return FrVec.from_ints(([x % P for x in xs] + [0] * T)[:T])

        self.eq = FrVec.eq_table_be([c % P for c in r_spartan])
        self.lo = col(lookup_outputs)
        self.left = col(left_ops)
        self.right = col(right_ops)
        # combined c = lo + γ·left + γ²·right folds consistently with its
        # terms (the fold is linear), so keep it bound alongside them
        self.comb = self.lo.copy().axpy_(self.left, self.gamma).axpy_(
            self.right, self.gamma_sqr)
        if use_dev:
            from ..parallel.stage_engine import DeviceProductTables

            # factors [eq, comb] carry the round sums; lo/left/right ride as
            # passengers for the three final opening claims
            self._eng = DeviceProductTables(
                [self.eq, self.comb],
                passenger_vecs=[self.lo, self.left, self.right], degree=2,
                mesh=mesh if backend == "mesh" else None)
            self.eq = self.comb = self.lo = self.left = self.right = None

    def eval_future(self):
        """Device (3, 16) eval array, or None when on host."""
        return self._eng.round_evals_device() if self._eng is not None else None

    def round_evals(self, pre: list[int] | None = None) -> list[int]:
        from ..native.frvec import FrVec

        if pre is not None:
            s0, _, s2 = pre
        elif self._eng is not None:
            s0, _, s2 = self._eng.round_evals()
        else:
            s0, _, s2 = FrVec.prod_evals_adj([self.eq, self.comb], 2)
        s1 = (self.current_claim - s0) % P
        s3 = (s0 - 3 * s1 + 3 * s2) % P
        return [s0, s1, s2, s3]

    def bind(self, r: int) -> None:
        if self._eng is not None:
            self._eng.bind(r)
            return
        self.eq = self.eq.fold_adj(r)
        self.lo = self.lo.fold_adj(r)
        self.left = self.left.fold_adj(r)
        self.right = self.right.fold_adj(r)
        self.comb = self.comb.fold_adj(r)

    def final_openings(self) -> tuple[int, int, int]:
        """(lookup_output, left_operand, right_operand) final claims."""
        if self._eng is not None:
            f = self._eng.finals()
            return f[2], f[3], f[4]
        return self.lo.first(), self.left.first(), self.right.first()

    def update_claim(self, evals4: list[int], r: int) -> None:
        self.current_claim = _lagrange_eval_0123(evals4, r)


# ---------------------------------------------------------------------------
# Batch driver
# ---------------------------------------------------------------------------

@dataclass
class Stage2BatchResult:
    compressed_polys: list[list[int]] = dfield(default_factory=list)
    challenges: list[int] = dfield(default_factory=list)
    final_claim: int = 0
    gamma_rwc: int = 0
    gamma_instr: int = 0
    r_address: list[int] = dfield(default_factory=list)
    batching_coeffs: list[int] = dfield(default_factory=list)
    # post-batch opening claims (cache_openings order, proof_converter.zig:1290-1452)
    factor_evals: list[int] = dfield(default_factory=list)
    raf_final_claim: int = 0
    rwc_val_claim: int = 0
    rwc_ra_claim: int = 0
    rwc_inc_claim: int = 0
    output_val_final_claim: int = 0
    output_val_init_claim: int = 0
    instr_lookup_output_claim: int = 0
    instr_left_operand_claim: int = 0
    instr_right_operand_claim: int = 0


def prove_stage2_batch(transcript, *, r0_stage2: int, uni_skip_claim_stage2: int,
                       tau: list[int], r_spartan: list[int], wcols,
                       factors, input_evals: list[int], n_cycle_vars: int,
                       log_ram_k: int, accesses, initial_ram: dict[int, int],
                       final_ram: dict[int, int], layout, program_inputs: bytes,
                       program_outputs: bytes, is_panicking: bool,
                       sound: bool = False, backend: str | None = None,
                       mesh=None, dev_store=None) -> Stage2BatchResult:
    res = Stage2BatchResult()
    max_rounds = log_ram_k + n_cycle_vars

    ram_addr = input_evals[ri.Inp.RamAddress]
    ram_rv = input_evals[ri.Inp.RamReadValue]
    ram_wv = input_evals[ri.Inp.RamWriteValue]
    lookup_out = input_evals[ri.Inp.LookupOutput]
    left_op = input_evals[ri.Inp.LeftLookupOperand]
    right_op = input_evals[ri.Inp.RightLookupOperand]

    gamma_rwc = transcript.challenge_scalar_full()
    r_address = [transcript.challenge_scalar() for _ in range(log_ram_k)]
    gamma_instr = transcript.challenge_scalar_full()
    res.gamma_rwc, res.gamma_instr, res.r_address = gamma_rwc, gamma_instr, r_address

    input_claims = [
        uni_skip_claim_stage2 % P,
        ram_addr % P,
        (ram_rv + gamma_rwc * ram_wv) % P,
        0,
        (lookup_out + gamma_instr * left_op + gamma_instr * gamma_instr % P * right_op) % P,
    ]
    rounds_per = [n_cycle_vars, log_ram_k, log_ram_k + n_cycle_vars, log_ram_k, n_cycle_vars]

    for c in input_claims:
        transcript.append_scalar(c)
    alphas = [transcript.challenge_scalar_full() for _ in range(5)]
    res.batching_coeffs = alphas

    batched_claim = 0
    for i in range(5):
        batched_claim = (batched_claim
                         + (input_claims[i] << (max_rounds - rounds_per[i])) % P * alphas[i]) % P

    lowest = layout.lowest_address()
    product = ProductVirtualRemainderProver(r0_stage2, tau,
                                            uni_skip_claim_stage2, factors,
                                            backend=backend, mesh=mesh,
                                            dev_store=dev_store)
    output = OutputSumcheckProver(initial_ram, final_ram, r_address, layout,
                                  program_inputs, program_outputs, is_panicking)
    if sound:
        rwc = SoundRamReadWriteCheckingProver(
            accesses, gamma_rwc, tau[:n_cycle_vars], log_ram_k, n_cycle_vars,
            lowest, input_claims[2], initial_ram)
    else:
        rwc = RamReadWriteCheckingProver(accesses, gamma_rwc, tau[:n_cycle_vars], log_ram_k,
                                         n_cycle_vars, n_cycle_vars // 2, lowest,
                                         input_claims[2], initial_ram)
    raf = None
    instr = None

    for rnd in range(max_rounds):
        combined = [0, 0, 0, 0]
        per_inst_evals: list[list[int] | None] = [None] * 5
        # lazy instance creation must precede the prefetch pass
        if raf is None and rnd == max_rounds - rounds_per[1]:
            raf = RafEvaluationProver(accesses, tau[:n_cycle_vars], lowest,
                                      log_ram_k, input_claims[1],
                                      sound=sound)
        if instr is None and rnd == max_rounds - rounds_per[4]:
            instr = InstructionLookupsProver(
                gamma_instr, r_spartan, n_cycle_vars,
                input_claims[4],
                wcols[ri.Inp.LookupOutput],
                wcols[ri.Inp.LeftLookupOperand],
                wcols[ri.Inp.RightLookupOperand],
                backend=backend, mesh=mesh, dev_store=dev_store)
        # prefetch the device-backed instances' round evals and download
        # them in ONE transfer (drain_futures) — the per-round sync is the
        # dominant cost on a tunneled chip
        pre: dict[int, list[int]] = {}
        if backend in ("device", "mesh"):
            from ..parallel.stage_engine import drain_futures

            futs, fut_ids = [], []
            for i, p in ((0, product), (4, instr)):
                if rnd >= max_rounds - rounds_per[i] and p is not None:
                    fut = p.eval_future()
                    if fut is not None:
                        futs.append(fut)
                        fut_ids.append(i)
            for i, vals in zip(fut_ids, drain_futures(futs)):
                pre[i] = vals
        for i in range(5):
            start = max_rounds - rounds_per[i]
            if rnd >= start:
                if i == 0:
                    ev = product.round_evals(pre.get(0))
                elif i == 1:
                    ev = raf.round_evals()
                elif i == 2:
                    ev = rwc.round_evals()
                elif i == 3:
                    ev = output.round_evals()
                else:
                    ev = instr.round_evals(pre.get(4))
                per_inst_evals[i] = ev
                for j in range(4):
                    combined[j] = (combined[j] + ev[j] * alphas[i]) % P
            else:
                scale = max_rounds - rounds_per[i] - rnd - 1
                w = (input_claims[i] << scale) % P * alphas[i] % P
                for j in range(4):
                    combined[j] = (combined[j] + w) % P

        compressed = unipoly.evals_to_compressed(combined)
        res.compressed_polys.append(compressed)
        transcript.append_message(b"UniPoly_begin")
        for c in compressed:
            transcript.append_scalar(c)
        transcript.append_message(b"UniPoly_end")
        r = transcript.challenge_scalar()
        res.challenges.append(r)
        batched_claim = eval_from_hint(compressed, batched_claim, r)

        if rnd >= max_rounds - rounds_per[0]:
            product.update_claim(per_inst_evals[0], r)
            product.bind(r)
        if rnd >= max_rounds - rounds_per[3]:
            output.update_claim(per_inst_evals[3], r)
            output.bind(r)
        if raf is not None and rnd >= max_rounds - rounds_per[1]:
            raf.update_claim(per_inst_evals[1], r)
            raf.bind(r)
        if per_inst_evals[2] is not None:
            rwc.update_claim(per_inst_evals[2], r)
            rwc.bind(r)
        if instr is not None and rnd >= max_rounds - rounds_per[4]:
            instr.update_claim(per_inst_evals[4], r)
            instr.bind(r)

    res.final_claim = batched_claim
    # per-instance final claims (consumed by the Jolt-format verifier's
    # output-check development/tests)
    res.instance_final_claims = [
        product.current_claim, raf.current_claim if raf else 0,
        rwc.current_claim, output.current_claim,
        instr.current_claim if instr else 0]
    res.provers = {"product": product, "raf": raf, "rwc": rwc,
                   "output": output, "instr": instr}

    # -- post-batch opening claims (cache_openings) -------------------------
    # 8 product-factor MLE evals at reversed(last n_cycle challenges)
    from ..native.frvec import FrVec

    r_cycle_rev = list(reversed(res.challenges[-n_cycle_vars:]))
    eqv = FrVec.eq_table_be([c % P for c in r_cycle_rev])
    if eqv.n > factors[0].n:
        eqv = FrVec(factors[0].n, mont=eqv._mont) if eqv._mont is not None \
            else FrVec(factors[0].n, ints=eqv._ints[: factors[0].n])
    res.factor_evals = [eqv.inner(f) for f in factors]

    res.raf_final_claim = raf.ra.first() if raf is not None else 0

    if sound:
        # Honest bound MLE values: the verifier recomputes the instance's
        # final claim as eq_b · ra · ((1+γ)·val + γ·inc) from these.
        op = rwc.final_openings()
        res.rwc_ra_claim = op["ra"]
        res.rwc_val_claim = op["val"]
        res.rwc_inc_claim = op["inc"]
        res.output_val_final_claim = output.val_final.first()
        res.output_val_init_claim = output.val_init.first()
        if instr is not None:
            (res.instr_lookup_output_claim, res.instr_left_operand_claim,
             res.instr_right_operand_claim) = instr.final_openings()
        for v in res.factor_evals:
            transcript.append_scalar(v)
        transcript.append_scalar(res.raf_final_claim)
        transcript.append_scalar(res.rwc_val_claim)
        transcript.append_scalar(res.rwc_ra_claim)
        transcript.append_scalar(res.rwc_inc_claim)
        transcript.append_scalar(res.output_val_final_claim)
        transcript.append_scalar(res.output_val_init_claim)
        transcript.append_scalar(res.instr_lookup_output_claim)
        transcript.append_scalar(res.instr_left_operand_claim)
        transcript.append_scalar(res.instr_right_operand_claim)
        return res

    # RWC opening claims (read_write_checking.zig getOpeningClaims)
    phase1 = n_cycle_vars // 2
    phase2_end = phase1 + log_ram_k
    phase3_len = n_cycle_vars - phase1
    r_sc = res.challenges
    r_addr = [0] * log_ram_k
    for i in range(min(log_ram_k, max(0, len(r_sc) - phase1))):
        if phase1 + i < len(r_sc):
            r_addr[log_ram_k - 1 - i] = r_sc[phase1 + i]
    r_cyc = [0] * n_cycle_vars
    for i in range(min(phase1, len(r_sc))):
        dest = phase3_len + (phase1 - 1 - i)
        if dest < n_cycle_vars:
            r_cyc[dest] = r_sc[i]
    for i in range(min(phase3_len, max(0, len(r_sc) - phase2_end))):
        if phase2_end + i < len(r_sc):
            r_cyc[phase3_len - 1 - i] = r_sc[phase2_end + i]

    # eq factors per entry via memo (entries revisit few distinct points)
    _ea_memo: dict[int, int] = {}
    _ec_memo: dict[int, int] = {}

    def _ea(a):
        v = _ea_memo.get(a)
        if v is None:
            v = _ea_memo[a] = _eq_be(r_addr, a, log_ram_k)
        return v

    def _ec(c):
        v = _ec_memo.get(c)
        if v is None:
            v = _ec_memo[c] = _eq_be(r_cyc, c, n_cycle_vars)
        return v

    ra_claim = 0
    for e in rwc.entries:
        ra_claim = (ra_claim + _ea(e.address) * _ec(e.cycle) % P * e.ra) % P
    res.rwc_ra_claim = ra_claim
    val_claim = rwc.val_init.first()
    for e in rwc.entries:
        delta = (e.val - rwc.val_init.get(e.address)) % P
        val_claim = (val_claim + _ea(e.address) * _ec(e.cycle) % P * delta) % P
    res.rwc_val_claim = val_claim
    res.rwc_inc_claim = rwc.inc.first()

    res.output_val_final_claim = output.val_final.first()
    res.output_val_init_claim = output.val_init.first()
    if instr is not None:
        (res.instr_lookup_output_claim, res.instr_left_operand_claim,
         res.instr_right_operand_claim) = instr.final_openings()

    # cache_openings transcript absorption: 17 claims in instance order
    for v in res.factor_evals:
        transcript.append_scalar(v)
    transcript.append_scalar(res.raf_final_claim)
    transcript.append_scalar(res.rwc_val_claim)
    transcript.append_scalar(res.rwc_ra_claim)
    transcript.append_scalar(res.rwc_inc_claim)
    transcript.append_scalar(res.output_val_final_claim)
    transcript.append_scalar(res.output_val_init_claim)
    transcript.append_scalar(res.instr_lookup_output_claim)
    transcript.append_scalar(res.instr_left_operand_claim)
    transcript.append_scalar(res.instr_right_operand_claim)
    return res
