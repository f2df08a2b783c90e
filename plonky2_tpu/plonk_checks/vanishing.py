"""PLONK vanishing-polynomial check at zeta (reference plonk/plonk.go).

Evaluates gate constraints, the Z(zeta) boundary term, and the permutation
argument's partial-product checks, combines them with the alpha challenges,
and checks against Z_H(zeta) * t(zeta) -- all as batched QE arithmetic with
verdict-bit accumulation instead of circuit asserts.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import goldilocks as gl
from ..fields import goldilocks_ext as qe
from ..gates.gates import evaluate_gate_constraints


def _unstack_qe(arr):
    """QE pair-of-pairs with (B, n) components -> list of n QE (B,) values."""
    n = arr[0][0].shape[-1]
    return [((arr[0][0][..., i], arr[0][1][..., i]),
             (arr[1][0][..., i], arr[1][1][..., i])) for i in range(n)]


def verify_plonk(spec, dev, challenges, pi_hash, verdict):
    """Reference plonk/plonk.go:209-250 (Verify) + 121-207 (evalVanishingPoly)."""
    zeta = challenges["zeta"]
    B = zeta[0][0].shape[0]

    # zeta^n, n = 2^degree_bits (reference plonk/plonk.go:55-61)
    zeta_pow_n = zeta
    for _ in range(spec.degree_bits):
        zeta_pow_n = qe.square(zeta_pow_n)

    local_constants = _unstack_qe(dev["op_constants"])
    local_wires = _unstack_qe(dev["op_wires"])
    zs = _unstack_qe(dev["op_plonk_zs"])
    zs_next = _unstack_qe(dev["op_plonk_zs_next"])
    sigmas = _unstack_qe(dev["op_plonk_sigmas"])
    partial_products = _unstack_qe(dev["op_partial_products"])
    quotient_polys = _unstack_qe(dev["op_quotient_polys"])

    constraint_terms = evaluate_gate_constraints(
        spec.gates(), spec.selector_indices, spec.groups,
        spec.num_gate_constraints, local_constants, local_wires, pi_hash)

    # L_0(zeta) = (zeta^n - 1) / (n * (zeta - 1))  (reference plonk.go:63-83)
    n_const = 1 << spec.degree_bits
    numerator = qe.sub(zeta_pow_n, qe.ones((B,)))
    denominator = qe.sub(qe.scalar_mul_const(zeta, n_const),
                         qe.from_ints(n_const, 0, (B,)))
    verdict = verdict & ~qe.is_zero(denominator)
    l0_zeta = qe.mul(numerator, qe.inv(denominator))

    nc = spec.num_challenges
    qdf = spec.quotient_degree_factor
    npp = spec.num_partial_products

    z1_terms = []
    pp_terms = []
    for i in range(nc):
        beta = qe.from_base(challenges["plonk_betas"][i])
        gamma = qe.from_base(challenges["plonk_gammas"][i])
        # L_0(zeta) * (Z(zeta) - 1)
        z1_terms.append(qe.mul(l0_zeta, qe.sub(zs[i], qe.ones((B,)))))

        numerators, denominators = [], []
        for j in range(spec.num_routed_wires):
            # s_id_j = k_j * zeta
            s_id = qe.scalar_mul_const(zeta, spec.k_is[j])
            wire_plus_gamma = qe.add(local_wires[j], gamma)
            numerators.append(qe.add(qe.mul(beta, s_id), wire_plus_gamma))
            denominators.append(qe.add(qe.mul(beta, sigmas[j]),
                                       wire_plus_gamma))

        # partial product checks (reference plonk.go:85-119)
        prod_accs = ([zs[i]]
                     + partial_products[i * npp:(i + 1) * npp]
                     + [zs_next[i]])
        for k in range(npp + 1):
            start = k * qdf
            nume = numerators[start]
            deno = denominators[start]
            for j in range(1, qdf):
                nume = qe.mul(nume, numerators[start + j])
                deno = qe.mul(deno, denominators[start + j])
            pp_terms.append(qe.sub(qe.mul(prod_accs[k], nume),
                                   qe.mul(prod_accs[k + 1], deno)))

    vanishing_terms = z1_terms + pp_terms + constraint_terms

    # alpha-combine per challenge, reverse Horner (reference plonk.go:188-204)
    reduced = []
    for i in range(nc):
        alpha = qe.from_base(challenges["plonk_alphas"][i])
        acc = qe.zeros((B,))
        for t in reversed(vanishing_terms):
            acc = qe.add(t, qe.mul(acc, alpha))
        reduced.append(acc)

    # vanishing[i] == Z_H(zeta) * reduce(quotient chunk i, zeta^n)
    # (reference plonk.go:229-249)
    z_h_zeta = qe.sub(zeta_pow_n, qe.ones((B,)))
    for i in range(nc):
        chunk = quotient_polys[i * qdf:(i + 1) * qdf]
        combined = qe.reduce_with_powers(chunk, zeta_pow_n)
        rhs = qe.mul(z_h_zeta, combined)
        verdict = verdict & qe.eq(reduced[i], rhs)
    return verdict
