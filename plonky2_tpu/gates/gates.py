"""Plonky2 gate-constraint evaluators.

Each gate is a pure function: (local_constants, local_wires, pi_hash) ->
list of QE constraint values, evaluated at zeta over batched QE arrays.
Gate instances are parsed from plonky2's Rust Debug-string gate IDs found in
common_circuit_data.json (same regex registry idea as reference
plonk/gates/gates.go:20-54).

QE values here are plonky2_tpu.fields.goldilocks_ext pairs; extension-algebra
values ([2]QE) are used where a gate reads a D=2 extension wire
(reference plonk/gates/*.go; per-gate citations below).
"""

from __future__ import annotations

import re

from ..fields import goldilocks as gl
from ..fields import goldilocks_ext as qe
from ..hash import poseidon_gl_constants as PK

UNUSED_SELECTOR = (1 << 32) - 1
D = 2


def _ea(wires, start):
    """Extension-algebra value from wires[start:start+2]."""
    return (wires[start], wires[start + 1])


class ArithmeticGate:
    """const_0 * m0 * m1 + const_1 * addend == out, num_ops copies
    (reference plonk/gates/arithmetic_gate.go:58-84)."""

    def __init__(self, num_ops):
        self.num_ops = num_ops

    def eval(self, consts, wires, pi_hash):
        c0, c1 = consts[0], consts[1]
        out = []
        for i in range(self.num_ops):
            m0, m1, addend, o = (wires[4 * i], wires[4 * i + 1],
                                 wires[4 * i + 2], wires[4 * i + 3])
            computed = qe.add(qe.mul(qe.mul(m0, m1), c0), qe.mul(addend, c1))
            out.append(qe.sub(o, computed))
        return out


class ArithmeticExtensionGate:
    """Same over extension-algebra wires (reference
    plonk/gates/arithmetic_extension_gate.go:59-86)."""

    def __init__(self, num_ops):
        self.num_ops = num_ops

    def eval(self, consts, wires, pi_hash):
        c0, c1 = consts[0], consts[1]
        out = []
        for i in range(self.num_ops):
            m0 = _ea(wires, 4 * D * i)
            m1 = _ea(wires, 4 * D * i + D)
            addend = _ea(wires, 4 * D * i + 2 * D)
            o = _ea(wires, 4 * D * i + 3 * D)
            computed = qe.ea_add(qe.ea_scalar_mul(c1, addend),
                                 qe.ea_scalar_mul(c0, qe.ea_mul(m0, m1)))
            diff = qe.ea_sub(o, computed)
            out.extend([diff[0], diff[1]])
        return out


class BaseSumGate:
    """sum == sum_i limb_i base^i, plus per-limb range product
    (reference plonk/gates/base_sum_gate.go:66-96)."""

    def __init__(self, num_limbs, base):
        self.num_limbs = num_limbs
        self.base = base

    def eval(self, consts, wires, pi_hash):
        total = wires[0]
        limbs = [wires[1 + i] for i in range(self.num_limbs)]
        base_qe = qe.from_ints(self.base, 0, qe.shape_of(total))
        computed = qe.reduce_with_powers(limbs, base_qe)
        out = [qe.sub(computed, total)]
        for limb in limbs:
            acc = qe.ones(qe.shape_of(limb))
            for i in range(self.base):
                acc = qe.mul(acc, qe.sub(limb, qe.from_ints(i, 0, qe.shape_of(limb))))
            out.append(acc)
        return out


class ConstantGate:
    """wire_out[i] == constant[i] (reference plonk/gates/constant_gate.go:57-69)."""

    def __init__(self, num_consts):
        self.num_consts = num_consts

    def eval(self, consts, wires, pi_hash):
        return [qe.sub(consts[i], wires[i]) for i in range(self.num_consts)]


class CosetInterpolationGate:
    """Chunked barycentric interpolation over a coset of H
    (reference plonk/gates/coset_interpolation_gate.go:151-226)."""

    def __init__(self, subgroup_bits, degree, barycentric_weights):
        self.subgroup_bits = subgroup_bits
        self.degree = degree
        self.weights = barycentric_weights  # python ints

    @property
    def num_points(self):
        return 1 << self.subgroup_bits

    @property
    def num_intermediates(self):
        return (self.num_points - 2) // (self.degree - 1)

    def eval(self, consts, wires, pi_hash):
        n = self.num_points
        start_values = 1
        start_eval_point = start_values + n * D
        start_eval_value = start_eval_point + D
        start_intermediates = start_eval_value + D

        shift = wires[0]
        evaluation_point = _ea(wires, start_eval_point)
        shifted_evaluation_point = _ea(
            wires, start_intermediates + D * 2 * self.num_intermediates)

        constraints = []
        # evaluation_point - shift * shifted_evaluation_point == 0
        neg_shift = qe.neg(shift)
        tmp = qe.ea_add(
            (qe.mul(neg_shift, shifted_evaluation_point[0]),
             qe.mul(neg_shift, shifted_evaluation_point[1])),
            evaluation_point)
        constraints.extend([tmp[0], tmp[1]])

        domain = gl.two_adic_subgroup(self.subgroup_bits)
        values = [_ea(wires, start_values + i * D) for i in range(n)]

        shape = qe.shape_of(shift)
        computed_eval = qe.ea_zeros(shape)
        computed_prod = qe.ea_ones(shape)
        computed_eval, computed_prod = _partial_interpolate(
            domain[:self.degree], values[:self.degree],
            self.weights[:self.degree], shifted_evaluation_point,
            computed_eval, computed_prod)

        for i in range(self.num_intermediates):
            inter_eval = _ea(wires, start_intermediates + D * i)
            inter_prod = _ea(
                wires, start_intermediates + D * (self.num_intermediates + i))
            diff_e = qe.ea_sub(inter_eval, computed_eval)
            constraints.extend([diff_e[0], diff_e[1]])
            diff_p = qe.ea_sub(inter_prod, computed_prod)
            constraints.extend([diff_p[0], diff_p[1]])

            start_index = 1 + (self.degree - 1) * (i + 1)
            end_index = min(start_index + self.degree - 1, n)
            computed_eval, computed_prod = _partial_interpolate(
                domain[start_index:end_index], values[start_index:end_index],
                self.weights[start_index:end_index], shifted_evaluation_point,
                inter_eval, inter_prod)

        evaluation_value = _ea(wires, start_eval_value)
        diff = qe.ea_sub(evaluation_value, computed_eval)
        constraints.extend([diff[0], diff[1]])
        return constraints


def _partial_interpolate(domain, values, weights, point, init_eval, init_prod):
    """Incremental barycentric step (reference
    goldilocks/quadratic_extension_algebra.go:88-125)."""
    new_eval, new_prod = init_eval, init_prod
    for x, val, w in zip(domain, values, weights):
        x_ea = (qe.from_ints(x, 0, qe.shape_of(point[0])),
                qe.zeros(qe.shape_of(point[0])))
        term = qe.ea_sub(point, x_ea)
        weighted_val = (qe.scalar_mul_const(val[0], w),
                        qe.scalar_mul_const(val[1], w))
        new_eval = qe.ea_mul(new_eval, term)
        new_eval = qe.ea_add(new_eval, qe.ea_mul(weighted_val, new_prod))
        new_prod = qe.ea_mul(new_prod, term)
    return new_eval, new_prod


class ExponentiationGate:
    """Square-and-multiply chain (reference
    plonk/gates/exponentiation_gate.go:80-128)."""

    def __init__(self, num_power_bits):
        self.num_power_bits = num_power_bits

    def eval(self, consts, wires, pi_hash):
        npb = self.num_power_bits
        base = wires[0]
        power_bits = [wires[1 + i] for i in range(npb)]
        output = wires[1 + npb]
        inters = [wires[2 + npb + i] for i in range(npb)]
        one = qe.ones(qe.shape_of(base))
        constraints = []
        for i in range(npb):
            prev = one if i == 0 else qe.mul(inters[i - 1], inters[i - 1])
            cur_bit = power_bits[npb - i - 1]
            # mul_by = cur_bit*base - (cur_bit - 1)
            mul_by = qe.sub(qe.mul(cur_bit, base), qe.sub(cur_bit, one))
            diff = qe.sub(qe.mul(prev, mul_by), inters[i])
            constraints.append(diff)
        constraints.append(qe.sub(output, inters[npb - 1]))
        return constraints


class MulExtensionGate:
    """const_0 * m0 * m1 == out over ext algebra (reference
    plonk/gates/multiplication_extension_gate.go:55-76)."""

    def __init__(self, num_ops):
        self.num_ops = num_ops

    def eval(self, consts, wires, pi_hash):
        c0 = consts[0]
        out = []
        for i in range(self.num_ops):
            m0 = _ea(wires, 3 * D * i)
            m1 = _ea(wires, 3 * D * i + D)
            o = _ea(wires, 3 * D * i + 2 * D)
            computed = qe.ea_scalar_mul(c0, qe.ea_mul(m0, m1))
            diff = qe.ea_sub(o, computed)
            out.extend([diff[0], diff[1]])
        return out


class NoopGate:
    def eval(self, consts, wires, pi_hash):
        return []


class PublicInputGate:
    """wires[0..4] == public-inputs-hash elements (reference
    plonk/gates/public_input_gate.go:32-51)."""

    def eval(self, consts, wires, pi_hash):
        out = []
        for i in range(4):
            h = (pi_hash[0][..., i], pi_hash[1][..., i])
            out.append(qe.sub(wires[i], qe.from_base(h)))
        return out


class RandomAccessGate:
    """Mux-tree list access (reference plonk/gates/random_access_gate.go:131-190)."""

    def __init__(self, bits, num_copies, num_extra_constants):
        self.bits = bits
        self.num_copies = num_copies
        self.num_extra_constants = num_extra_constants

    @property
    def vec_size(self):
        return 1 << self.bits

    def eval(self, consts, wires, pi_hash):
        constraints = []
        stride = 2 + self.vec_size
        num_routed = stride * self.num_copies + self.num_extra_constants
        for copy in range(self.num_copies):
            access_index = wires[stride * copy]
            claimed = wires[stride * copy + 1]
            items = [wires[stride * copy + 2 + i] for i in range(self.vec_size)]
            bits = [wires[num_routed + copy * self.bits + i]
                    for i in range(self.bits)]
            for b in bits:
                constraints.append(qe.sub(qe.mul(b, b), b))
            two = qe.from_ints(2, 0, qe.shape_of(access_index))
            recon = qe.reduce_with_powers(bits, two)
            constraints.append(qe.sub(recon, access_index))
            for b in bits:
                items = [qe.add(items[i], qe.mul(b, qe.sub(items[i + 1], items[i])))
                         for i in range(0, len(items), 2)]
            assert len(items) == 1
            constraints.append(qe.sub(items[0], claimed))
        for i in range(self.num_extra_constants):
            constraints.append(qe.sub(consts[i],
                                      wires[stride * self.num_copies + i]))
        return constraints


class ReducingGate:
    """Horner accumulation with base-field coefficients (reference
    plonk/gates/reducing_gate.go:77-110)."""

    def __init__(self, num_coeffs):
        self.num_coeffs = num_coeffs

    def eval(self, consts, wires, pi_hash):
        start_coeffs = 3 * D
        alpha = _ea(wires, D)
        acc = _ea(wires, 2 * D)
        coeffs = [wires[start_coeffs + i] for i in range(self.num_coeffs)]
        start_accs = start_coeffs + self.num_coeffs

        constraints = []
        for i in range(self.num_coeffs):
            if i == self.num_coeffs - 1:
                acc_i = _ea(wires, 0)
            else:
                acc_i = _ea(wires, start_accs + D * i)
            coeff_ea = (coeffs[i], qe.zeros(qe.shape_of(coeffs[i])))
            tmp = qe.ea_sub(qe.ea_add(qe.ea_mul(acc, alpha), coeff_ea), acc_i)
            constraints.extend([tmp[0], tmp[1]])
            acc = acc_i
        return constraints


class ReducingExtensionGate:
    """Horner accumulation with extension coefficients (reference
    plonk/gates/reducing_extension_gate.go:77-109)."""

    def __init__(self, num_coeffs):
        self.num_coeffs = num_coeffs

    def eval(self, consts, wires, pi_hash):
        start_coeffs = 3 * D
        alpha = _ea(wires, D)
        acc = _ea(wires, 2 * D)
        start_accs = start_coeffs + self.num_coeffs * D

        constraints = []
        for i in range(self.num_coeffs):
            if i == self.num_coeffs - 1:
                acc_i = _ea(wires, 0)
            else:
                acc_i = _ea(wires, start_accs + D * i)
            coeff = _ea(wires, start_coeffs + D * i)
            tmp = qe.ea_sub(qe.ea_add(qe.ea_mul(acc, alpha), coeff), acc_i)
            constraints.extend([tmp[0], tmp[1]])
            acc = acc_i
        return constraints


class PoseidonMdsGate:
    """One MDS layer over ext-algebra width-12 state (reference
    plonk/gates/poseidon_mds_gate.go:43-99)."""

    WIDTH = 12

    def eval(self, consts, wires, pi_hash):
        inputs = [_ea(wires, i * D) for i in range(self.WIDTH)]
        constraints = []
        for r in range(self.WIDTH):
            acc = qe.ea_zeros(qe.shape_of(wires[0]))
            for i in range(self.WIDTH):
                coeff = PK.MDS_MATRIX_CIRC[i]
                term = (qe.scalar_mul_const(inputs[(i + r) % self.WIDTH][0], coeff),
                        qe.scalar_mul_const(inputs[(i + r) % self.WIDTH][1], coeff))
                acc = qe.ea_add(acc, term)
            coeff = PK.MDS_MATRIX_DIAG[r]
            if coeff:
                acc = qe.ea_add(acc, (qe.scalar_mul_const(inputs[r][0], coeff),
                                      qe.scalar_mul_const(inputs[r][1], coeff)))
            output = _ea(wires, (self.WIDTH + r) * D)
            diff = qe.ea_sub(output, acc)
            constraints.extend([diff[0], diff[1]])
        return constraints


class PoseidonGate:
    """Full Poseidon permutation as constraints, with S-box inputs pinned to
    witness wires each round (reference plonk/gates/poseidon_gate.go:92-181).
    Operates on QE values using the same fast-partial-round structure as
    hash/poseidon_gl.py."""

    WIDTH = 12
    HALF_FULL = 4
    N_PARTIAL = 22

    # wire layout (reference poseidon_gate.go:29-90)
    def w_input(self, i):
        return i

    def w_output(self, i):
        return self.WIDTH + i

    @property
    def w_swap(self):
        return 2 * self.WIDTH

    def w_delta(self, i):
        return 2 * self.WIDTH + 1 + i

    def w_full0(self, round_, i):
        return 2 * self.WIDTH + 5 + (round_ - 1) * self.WIDTH + i

    def w_partial(self, round_):
        return (2 * self.WIDTH + 5 + (self.HALF_FULL - 1) * self.WIDTH + round_)

    def w_full1(self, round_, i):
        return (2 * self.WIDTH + 5 + (self.HALF_FULL - 1) * self.WIDTH
                + self.N_PARTIAL + round_ * self.WIDTH + i)

    @staticmethod
    def _sbox(x):
        x2 = qe.mul(x, x)
        x4 = qe.mul(x2, x2)
        x3 = qe.mul(x, x2)
        return qe.mul(x4, x3)

    def _mds(self, state):
        out = []
        for r in range(self.WIDTH):
            acc = qe.ea_zeros(())  # placeholder; built below
            acc = None
            for i in range(self.WIDTH):
                term = qe.scalar_mul_const(state[(i + r) % self.WIDTH],
                                           PK.MDS_MATRIX_CIRC[i])
                acc = term if acc is None else qe.add(acc, term)
            if PK.MDS_MATRIX_DIAG[r]:
                acc = qe.add(acc, qe.scalar_mul_const(state[r],
                                                      PK.MDS_MATRIX_DIAG[r]))
            out.append(acc)
        return out

    def eval(self, consts, wires, pi_hash):
        constraints = []
        one = qe.ones(qe.shape_of(wires[0]))

        swap = wires[self.w_swap]
        constraints.append(qe.mul(swap, qe.sub(swap, one)))

        for i in range(4):
            lhs, rhs = wires[self.w_input(i)], wires[self.w_input(i + 4)]
            delta = wires[self.w_delta(i)]
            constraints.append(qe.sub(qe.mul(swap, qe.sub(rhs, lhs)), delta))

        state = [None] * self.WIDTH
        for i in range(4):
            delta = wires[self.w_delta(i)]
            state[i] = qe.add(wires[self.w_input(i)], delta)
            state[i + 4] = qe.sub(wires[self.w_input(i + 4)], delta)
        for i in range(8, self.WIDTH):
            state[i] = wires[self.w_input(i)]

        round_ctr = 0
        # first full rounds
        for r in range(self.HALF_FULL):
            for i in range(self.WIDTH):
                state[i] = qe.add(state[i], qe.from_ints(
                    PK.ALL_ROUND_CONSTANTS[i + self.WIDTH * round_ctr], 0,
                    qe.shape_of(state[i])))
            if r != 0:
                for i in range(self.WIDTH):
                    sbox_in = wires[self.w_full0(r, i)]
                    constraints.append(qe.sub(state[i], sbox_in))
                    state[i] = sbox_in
            state = [self._sbox(s) for s in state]
            state = self._mds(state)
            round_ctr += 1

        # partial rounds
        for i in range(self.WIDTH):
            state[i] = qe.add(state[i], qe.from_ints(
                PK.FAST_PARTIAL_FIRST_ROUND_CONSTANT[i], 0,
                qe.shape_of(state[i])))
        # init matrix
        new_state = [state[0]] + [None] * (self.WIDTH - 1)
        for d in range(1, self.WIDTH):
            acc = None
            for r in range(1, self.WIDTH):
                t = PK.FAST_PARTIAL_ROUND_INITIAL_MATRIX[r - 1][d - 1]
                term = qe.scalar_mul_const(state[r], t)
                acc = term if acc is None else qe.add(acc, term)
            new_state[d] = acc
        state = new_state

        for r in range(self.N_PARTIAL):
            sbox_in = wires[self.w_partial(r)]
            constraints.append(qe.sub(state[0], sbox_in))
            state[0] = self._sbox(sbox_in)
            if r < self.N_PARTIAL - 1:
                state[0] = qe.add(state[0], qe.from_ints(
                    PK.FAST_PARTIAL_ROUND_CONSTANTS[r], 0,
                    qe.shape_of(state[0])))
            # mds partial layer fast
            d_acc = qe.scalar_mul_const(state[0], PK.MDS0TO0)
            for i in range(1, self.WIDTH):
                d_acc = qe.add(d_acc, qe.scalar_mul_const(
                    state[i], PK.FAST_PARTIAL_ROUND_W_HATS[r][i - 1]))
            new_state = [d_acc]
            for i in range(1, self.WIDTH):
                new_state.append(qe.add(
                    qe.scalar_mul_const(state[0],
                                        PK.FAST_PARTIAL_ROUND_VS[r][i - 1]),
                    state[i]))
            state = new_state
        round_ctr += self.N_PARTIAL

        # second full rounds
        for r in range(self.HALF_FULL):
            for i in range(self.WIDTH):
                state[i] = qe.add(state[i], qe.from_ints(
                    PK.ALL_ROUND_CONSTANTS[i + self.WIDTH * round_ctr], 0,
                    qe.shape_of(state[i])))
            for i in range(self.WIDTH):
                sbox_in = wires[self.w_full1(r, i)]
                constraints.append(qe.sub(state[i], sbox_in))
                state[i] = sbox_in
            state = [self._sbox(s) for s in state]
            state = self._mds(state)
            round_ctr += 1

        for i in range(self.WIDTH):
            constraints.append(qe.sub(state[i], wires[self.w_output(i)]))
        return constraints


# ---------------------------------------------------------------------------
# Registry: parse plonky2 Rust Debug-string gate IDs
# ---------------------------------------------------------------------------

_REGISTRY = [
    (re.compile(r"ArithmeticGate { num_ops: (\d+) }"),
     lambda m: ArithmeticGate(int(m.group(1)))),
    (re.compile(r"ArithmeticExtensionGate { num_ops: (\d+) }"),
     lambda m: ArithmeticExtensionGate(int(m.group(1)))),
    (re.compile(r"BaseSumGate { num_limbs: (\d+) } \+ Base: (\d+)"),
     lambda m: BaseSumGate(int(m.group(1)), int(m.group(2)))),
    (re.compile(r"ConstantGate { num_consts: (\d+) }"),
     lambda m: ConstantGate(int(m.group(1)))),
    (re.compile(r"CosetInterpolationGate { subgroup_bits: (\d+), degree: (\d+),"
                r" barycentric_weights: \[([0-9, ]+)\]"),
     lambda m: CosetInterpolationGate(
         int(m.group(1)), int(m.group(2)),
         [int(x.strip()) for x in m.group(3).split(",")])),
    (re.compile(r"ExponentiationGate { num_power_bits: (\d+)"),
     lambda m: ExponentiationGate(int(m.group(1)))),
    (re.compile(r"MulExtensionGate { num_ops: (\d+) }"),
     lambda m: MulExtensionGate(int(m.group(1)))),
    (re.compile(r"NoopGate"), lambda m: NoopGate()),
    (re.compile(r"PoseidonMdsGate"), lambda m: PoseidonMdsGate()),
    (re.compile(r"PoseidonGate"), lambda m: PoseidonGate()),
    (re.compile(r"PublicInputGate"), lambda m: PublicInputGate()),
    (re.compile(r"RandomAccessGate { bits: (\d+), num_copies: (\d+), "
                r"num_extra_constants: (\d+)"),
     lambda m: RandomAccessGate(int(m.group(1)), int(m.group(2)),
                                int(m.group(3)))),
    (re.compile(r"ReducingExtensionGate { num_coeffs: (\d+) }"),
     lambda m: ReducingExtensionGate(int(m.group(1)))),
    (re.compile(r"ReducingGate { num_coeffs: (\d+) }"),
     lambda m: ReducingGate(int(m.group(1)))),
]


def gate_from_id(gate_id):
    for regex, ctor in _REGISTRY:
        m = regex.search(gate_id)
        if m:
            return ctor(m)
    raise ValueError(f"Unknown gate ID {gate_id}")


# ---------------------------------------------------------------------------
# Selector filtering + constraint accumulation
# (reference plonk/gates/evaluate_gates.go:33-105)
# ---------------------------------------------------------------------------

def evaluate_gate_constraints(gates, selector_indices, groups,
                              num_gate_constraints, local_constants,
                              local_wires, pi_hash):
    """Returns num_gate_constraints QE accumulators: filtered, summed gate
    constraints evaluated at zeta."""
    num_selectors = len(groups)
    shape = qe.shape_of(local_constants[0])
    accum = [qe.zeros(shape) for _ in range(num_gate_constraints)]
    for row, gate in enumerate(gates):
        sel_idx = selector_indices[row]
        group_start, group_end = groups[sel_idx]
        s = local_constants[sel_idx]
        # filter = prod_{i in group, i != row} (i - s) [* (UNUSED - s)]
        filt = qe.ones(shape)
        for i in range(group_start, group_end):
            if i == row:
                continue
            filt = qe.mul(filt, qe.sub(qe.from_ints(i, 0, shape), s))
        if num_selectors > 1:
            filt = qe.mul(filt, qe.sub(qe.from_ints(UNUSED_SELECTOR, 0, shape), s))

        consts = local_constants[num_selectors:]
        unfiltered = gate.eval(consts, local_wires, pi_hash)
        for k, c in enumerate(unfiltered):
            assert k < num_gate_constraints, "gate produced too many constraints"
            accum[k] = qe.add(accum[k], qe.mul(c, filt))
    return accum
