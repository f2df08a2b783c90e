"""PLONK vanishing-polynomial check at zeta (reference plonk/plonk.go).

Evaluates gate constraints, the Z(zeta) boundary term, and the permutation
argument's partial-product checks, combines them with the alpha challenges,
and checks against Z_H(zeta) * t(zeta) -- all as batched QE arithmetic with
verdict-bit accumulation instead of circuit asserts.

Vectorization: the reference walks the 80 routed wires and the ~145
alpha-combined terms as scalar loops (plonk/plonk.go:85-119, 188-204); here
the wires/terms are stacked array axes, the per-chunk products fold in
log-depth, and the alpha Horner runs as one lax.scan.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import goldilocks as gl
from ..fields import goldilocks_ext as qe
from ..gates.gates import evaluate_gate_constraints


def _gates_host(spec, local_constants, local_wires, pi_hash):
    """Gate-constraint evaluation as one pure_callback into the python-int
    reference (bench/cpu_reference._eval_gates_ref).  CPU-only structure
    mode: the traced per-gate graphs (PoseidonGate alone re-derives a full
    width-12 permutation over QE) push XLA:CPU compiles past 15 minutes;
    gate math stays covered by tests/test_gates.py goldens and the TPU
    path."""
    import jax
    import numpy as np

    B = local_constants[0][0].shape[0]
    n_out = spec.num_gate_constraints

    def pack(x):  # QE pair -> (4, B, n) uint32
        return jnp.stack([x[0][0], x[0][1], x[1][0], x[1][1]])

    def unpack_int(arr, b, i):  # (4, B, n) -> QE int tuple
        return (int(arr[0, b, i]) | (int(arr[1, b, i]) << 32),
                int(arr[2, b, i]) | (int(arr[3, b, i]) << 32))

    def host(consts4, wires4, pih_lo, pih_hi):
        from ..bench import cpu_reference as R
        consts4, wires4 = np.asarray(consts4), np.asarray(wires4)
        out = np.zeros((4, B, n_out), np.uint32)
        for b in range(B):
            all_consts = [unpack_int(consts4, b, i)
                          for i in range(consts4.shape[2])]
            wires = [unpack_int(wires4, b, i) for i in range(wires4.shape[2])]
            pih = [int(pih_lo[b, k]) | (int(pih_hi[b, k]) << 32)
                   for k in range(4)]
            accum = R._eval_gates_ref(spec, all_consts, wires, pih)
            for i, (c0, c1) in enumerate(accum):
                out[0, b, i] = c0 & 0xFFFFFFFF
                out[1, b, i] = c0 >> 32
                out[2, b, i] = c1 & 0xFFFFFFFF
                out[3, b, i] = c1 >> 32
        return out

    res = jax.pure_callback(
        host, jax.ShapeDtypeStruct((4, B, n_out), jnp.uint32),
        pack(local_constants), pack(local_wires), pi_hash[0], pi_hash[1])
    return ((res[0], res[1]), (res[2], res[3]))


def verify_plonk(spec, dev, challenges, pi_hash, verdict):
    """Reference plonk/plonk.go:209-250 (Verify) + 121-207 (evalVanishingPoly).

    dev's op_* entries are stacked QE arrays of shape (B, n)."""
    zeta = challenges["zeta"]
    B = zeta[0][0].shape[0]

    # zeta^n, n = 2^degree_bits (reference plonk/plonk.go:55-61)
    zeta_pow_n = zeta
    for _ in range(spec.degree_bits):
        zeta_pow_n = qe.square(zeta_pow_n)

    local_constants = dev["op_constants"]        # (B, n_constants)
    local_wires = dev["op_wires"]                # (B, num_wires)
    zs = dev["op_plonk_zs"]                      # (B, nc)
    zs_next = dev["op_plonk_zs_next"]            # (B, nc)
    sigmas = dev["op_plonk_sigmas"]              # (B, R)
    partial_products = dev["op_partial_products"]  # (B, nc*npp)
    quotient_polys = dev["op_quotient_polys"]    # (B, nc*qdf)

    from ..hash.poseidon_bn254 import _use_host_math
    if _use_host_math():
        constraint_terms = _gates_host(spec, local_constants, local_wires,
                                       pi_hash)
    else:
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
    R = spec.num_routed_wires
    wires_r = qe.index(local_wires, (Ellipsis, slice(0, R)))
    k_arr = gl.const_array(list(spec.k_is))

    def col(x):
        return qe.index(x, (Ellipsis, None))

    z1_terms = []
    pp_terms = []
    for i in range(nc):
        beta = col(qe.from_base(challenges["plonk_betas"][i]))
        gamma = col(qe.from_base(challenges["plonk_gammas"][i]))
        # L_0(zeta) * (Z(zeta) - 1)
        z_i = qe.index(zs, (Ellipsis, i))
        z1_terms.append(qe.mul(l0_zeta, qe.sub(z_i, qe.ones((B,)))))

        # s_id_j = k_j * zeta; numer_j = beta*s_id_j + wire_j + gamma
        # (reference plonk.go:85-119), all routed wires at once
        s_id = qe.mul_const_arr(col(zeta), k_arr)            # (B, R)
        wire_plus_gamma = qe.add(wires_r, gamma)
        numerators = qe.add(qe.mul(beta, s_id), wire_plus_gamma)
        denominators = qe.add(qe.mul(beta, sigmas), wire_plus_gamma)

        # chunk products of size qdf, folded in log-depth
        num_prod = qe.prod_axis(qe.reshape(numerators, (B, npp + 1, qdf)))
        den_prod = qe.prod_axis(qe.reshape(denominators, (B, npp + 1, qdf)))

        pps = qe.index(partial_products,
                       (Ellipsis, slice(i * npp, (i + 1) * npp)))
        accs = qe.concat([col(z_i), pps, col(qe.index(zs_next, (Ellipsis, i)))])
        lhs = qe.mul(qe.index(accs, (Ellipsis, slice(0, npp + 1))), num_prod)
        rhs = qe.mul(qe.index(accs, (Ellipsis, slice(1, None))), den_prod)
        pp_terms.append(qe.sub(lhs, rhs))                    # (B, npp+1)

    vanishing_terms = qe.concat(
        [qe.stack(z1_terms, axis=-1)] + pp_terms + [constraint_terms])

    # alpha-combine per challenge (reference plonk.go:188-204): the scalar
    # reverse-Horner loop equals sum_i terms[i] * alpha^i
    reduced = []
    for i in range(nc):
        alpha = qe.from_base(challenges["plonk_alphas"][i])
        reduced.append(qe.horner(vanishing_terms, alpha))

    # vanishing[i] == Z_H(zeta) * reduce(quotient chunk i, zeta^n)
    # (reference plonk.go:229-249)
    z_h_zeta = qe.sub(zeta_pow_n, qe.ones((B,)))
    chunks = qe.reshape(quotient_polys, (B, nc, qdf))
    combined = qe.horner(chunks, col(zeta_pow_n))            # (B, nc)
    rhs = qe.mul(col(z_h_zeta), combined)
    lhs = qe.stack(reduced, axis=-1)                         # (B, nc)
    verdict = verdict & jnp.all(qe.eq(lhs, rhs), axis=-1)
    return verdict
