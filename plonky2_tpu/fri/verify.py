"""FRI opening-proof verification, batched over (proof, query-round).

Reference: fri/fri.go.  All assertions become verdict-bit conjunctions so an
invalid proof yields False without aborting the batch.  Layout:

- Every per-query quantity is shaped (B, Q): B proofs x Q query rounds, all
  verified in parallel (the reference loops rounds sequentially,
  fri/fri.go:533-547).
- Merkle leaf hashing runs as one scan over absorb steps with (B, Q, 4)
  lanes; sibling chains as one scan over tree depth (reference
  fri/fri.go:97-157 walks them sequentially per round).
- Digest comparisons happen in the BN254 Montgomery domain (bijective), so
  no conversions appear on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import goldilocks as gl
from ..fields import goldilocks_ext as qe
from ..fields import bn254
from ..hash import poseidon_bn254 as pb
from ..proof.serde import leaf_layout, absorb_slot_masks


def _bits_to_index(bits):
    """Little-endian 0/1 uint32 arrays -> uint32 index."""
    idx = jnp.zeros(bits[0].shape, jnp.uint32)
    for i, b in enumerate(bits):
        idx = idx | (b << i)
    return idx


def _pow_ok(pr, pow_bits):
    """Proof-of-work check: the pow response must fit in 64 - pow_bits bits
    (reference fri/fri.go:75-80 does this as RangeCheckWithMaxBits).
    pr: GL pair (lo, hi) of the (canonical) pow_response challenge."""
    max_bits = 64 - pow_bits
    if max_bits < 32:
        return (pr[1] == 0) & (pr[0] < jnp.uint32(1 << max_bits))
    if max_bits == 32:
        return pr[1] == 0
    if max_bits < 64:
        return pr[1] < jnp.uint32(1 << (max_bits - 32))
    # pow_bits == 0: any canonical value passes
    return jnp.ones(pr[0].shape, bool)


def _merkle_chain(digest, siblings, index_bits, depth):
    """Walk a Merkle path: digest (..., 16) mont; siblings (..., depth, 16);
    index_bits: list of (...,) uint32 bits (bit i = level i).
    Reference fri/fri.go:104-116."""
    sibs = jnp.moveaxis(siblings, -2, 0)            # (depth, ..., 16)
    bits = jnp.stack(index_bits[:depth])            # (depth, ...)

    def level(cur, xs):
        sib, bit = xs
        m = bit.astype(bool)[..., None]
        left = jnp.where(m, sib, cur)
        right = jnp.where(m, cur, sib)
        z = jnp.zeros_like(cur)
        state = jnp.stack([z, z, left, right], axis=-2)
        return pb.permute(state)[..., 0, :], None

    out, _ = jax.lax.scan(level, digest, (sibs, bits))
    return out


def _cap_lookup(cap, cap_index):
    """cap: (B, cap_size, 16); cap_index: (B, ...) -> (B, ..., 16)."""
    B = cap.shape[0]
    flat_idx = cap_index.reshape(B, -1).astype(jnp.int32)     # (B, K)
    picked = cap[jnp.arange(B)[:, None], flat_idx]            # (B, K, 16)
    return picked.reshape(cap_index.shape + (16,))


def _hash_leaves_scan(packed, slot_mask):
    """Batched HashNoPad over precomputed absorb blocks.

    packed: (..., T, 3, 16) mont blocks; slot_mask: (T, 3) bool.
    Returns (..., 16) digests.  Every step is active: callers give each
    oracle its own scan sized to its leaf (LeafLayout.n_steps) rather than
    masking lanes through a shared max-length scan.
    """
    lead = packed.shape[:-3]
    T = packed.shape[-3]
    state = bn254.zeros(lead + (4,))
    blocks = jnp.moveaxis(packed, -3, 0)            # (T, ..., 3, 16)
    smask = jnp.asarray(slot_mask)                  # (T, 3)

    def step(st, xs):
        block, sm = xs
        sel = sm[..., None]                         # (3, 1)
        rest = jnp.where(sel, block, st[..., 1:, :])
        st_in = jnp.concatenate([st[..., :1, :], rest], axis=-2)
        return pb.permute(st_in), None

    state, _ = jax.lax.scan(step, state, (blocks, smask))
    return state[..., 0, :]


def _dot_base_with_alpha(evals, apows):
    """sum_i evals_i * alpha^i for base-field evals (B, Q, L) GL pair and
    QE alpha powers (B, L).  Returns QE of shape (B, Q)."""
    e = evals
    p0 = (apows[0][0][:, None, :], apows[0][1][:, None, :])
    p1 = (apows[1][0][:, None, :], apows[1][1][:, None, :])
    d0 = gl.sum_digits_axis(gl.mul_digits(e, p0), -1)
    d1 = gl.sum_digits_axis(gl.mul_digits(e, p1), -1)
    return (gl.reduce_digits(d0), gl.reduce_digits(d1))


def verify_fri(spec, dev, challenges, verdict):
    """Verify the FRI opening proof (reference fri/fri.go:500-548).

    dev: device proof dict; challenges: dict with zeta, fri_alpha, fri_betas,
    pow_response, query_indices (GL/QE values with batch dim B).
    Returns updated verdict (B,) bool.
    """
    B = dev["pow_witness"][0].shape[0]
    # Q from the data, not the spec: under query-axis sharding
    # (parallel/mesh.py 2-D path) each shard sees only its rounds.
    Q = dev["init_siblings"].shape[1]
    lde_bits = spec.lde_bits

    # --- proof of work: powResponse must fit in 64 - pow_bits bits
    # (reference fri/fri.go:75-80)
    verdict = verdict & _pow_ok(challenges["pow_response"], spec.pow_bits)

    # --- precomputed reduced openings (reference fri/fri.go:82-95)
    alpha = challenges["fri_alpha"]
    batch0 = qe.concat([dev[key] for key in
                        ["op_constants", "op_plonk_sigmas", "op_wires",
                         "op_plonk_zs", "op_partial_products",
                         "op_quotient_polys"]])           # QE (B, n0)
    batch1 = dev["op_plonk_zs_next"]                      # QE (B, nc)
    pre0 = qe.horner(batch0, alpha)                       # (B,)
    pre1 = qe.horner(batch1, alpha)

    # --- per-round index bits
    x_index = challenges["query_indices"]           # GL pair (B, Q)
    bits = gl.to_bits(x_index, 64)[:lde_bits]
    cap_bits = bits[lde_bits - spec.cap_height:]
    if cap_bits:
        cap_index = _bits_to_index(cap_bits)        # (B, Q)
    else:  # cap_height == 0: single-entry cap
        cap_index = jnp.zeros(x_index[0].shape, jnp.uint32)

    # --- initial tree Merkle proofs (reference fri/fri.go:146-157)
    layout = leaf_layout(spec)
    per_oracle = []
    for o in range(4):
        if layout.noop[o]:
            # HashOrNoop (reference poseidon/bn254.go:79-94): a <=3-element
            # leaf's digest is its packed value -- no sponge runs.
            per_oracle.append(dev["init_leaf_packed"][:, :, o, 0, 0, :])
        else:
            n = layout.n_steps[o]
            per_oracle.append(_hash_leaves_scan(
                dev["init_leaf_packed"][:, :, o, :n],
                layout.slot_mask[o, :n]))
    leaf_digests = jnp.stack(per_oracle, axis=2)      # (B, Q, 4, 16)
    bits4 = [jnp.broadcast_to(b[..., None], b.shape + (4,)) for b in bits]
    roots = _merkle_chain(leaf_digests, dev["init_siblings"], bits4,
                          spec.initial_tree_depth)   # (B, Q, 4, 16)
    caps = jnp.stack([dev["const_sigmas_cap"], dev["wires_cap"],
                      dev["zs_pp_cap"], dev["quotient_cap"]], axis=1)
    # expected cap entries (B, Q, 4, 16)
    for o in range(4):
        expected = _cap_lookup(caps[:, o], cap_index)
        verdict = verdict & jnp.all(
            bn254.eq(roots[..., o, :], expected), axis=-1)

    # --- subgroup_x (reference fri/fri.go:187-206)
    root = gl.primitive_root_of_unity(lde_bits)
    # subgroup_x = GENERATOR * root^bitrev(idx): bit i contributes 2^(n-1-i)
    prod = gl.ones((B, Q))
    pw = root
    for i in reversed(range(lde_bits)):
        term = gl.mul_const(prod, pw)
        prod = gl.select(bits[i].astype(bool), term, prod)
        pw = (pw * pw) % gl.P
    subgroup_x = gl.mul_const(prod, gl.MULTIPLICATIVE_GROUP_GENERATOR)

    # --- combine initial (reference fri/fri.go:208-251)
    zeta = challenges["zeta"]
    n0 = batch0[0][0].shape[-1]
    apow0 = qe.powers(alpha, n0)                           # QE (B, n0)
    evals0 = jnp.concatenate([dev[f"init_leaves_{o}"][0] for o in range(4)],
                             axis=-1), jnp.concatenate(
        [dev[f"init_leaves_{o}"][1] for o in range(4)], axis=-1)  # (B,Q,L)
    re0 = _dot_base_with_alpha(evals0, apow0)
    sx_qe = qe.from_base(subgroup_x)

    def bcast_qe(x):
        return ((x[0][0][:, None], x[0][1][:, None]),
                (x[1][0][:, None], x[1][1][:, None]))

    num0 = qe.sub(re0, bcast_qe(pre0))
    den0 = qe.sub(sx_qe, bcast_qe(zeta))
    verdict = verdict & jnp.all(~qe.is_zero(den0), axis=-1)
    total = qe.mul(num0, qe.inv(den0))

    # batch 1: Zs at g*zeta (first num_challenges leaf-2 elements)
    g_deg = gl.primitive_root_of_unity(spec.degree_bits)
    zeta_next = (gl.mul_const(zeta[0], g_deg), gl.mul_const(zeta[1], g_deg))
    nb1 = spec.num_challenges
    evals1 = (dev["init_leaves_2"][0][..., :nb1],
              dev["init_leaves_2"][1][..., :nb1])
    apow1 = qe.powers(alpha, nb1)
    re1 = _dot_base_with_alpha(evals1, apow1)
    num1 = qe.sub(re1, bcast_qe(pre1))
    den1 = qe.sub(sx_qe, bcast_qe(zeta_next))
    verdict = verdict & jnp.all(~qe.is_zero(den1), axis=-1)
    # sum = alpha^|batch1| * sum + num/den  (reference fri/fri.go:240-247)
    a_n = alpha
    for _ in range(nb1 - 1):
        a_n = qe.mul(a_n, alpha)
    total = qe.add(qe.mul(bcast_qe(a_n), total), qe.mul(num1, qe.inv(den1)))
    old_eval = total

    # --- reduction steps (reference fri/fri.go:421-491)
    for j, arity_bits in enumerate(spec.reduction_arity_bits):
        arity = 1 << arity_bits
        within_bits = bits[:arity_bits]
        coset_bits = bits[arity_bits:]
        within_idx = _bits_to_index(within_bits)    # (B, Q)

        evals = dev[f"step{j}_evals"]               # QE pair (B, Q, arity)
        # selected eval at within_idx must equal old_eval
        def gather_e(comp):
            return jnp.take_along_axis(comp, within_idx[..., None].astype(jnp.int32),
                                       axis=-1)[..., 0]
        sel = ((gather_e(evals[0][0]), gather_e(evals[0][1])),
               (gather_e(evals[1][0]), gather_e(evals[1][1])))
        verdict = verdict & jnp.all(qe.eq(sel, old_eval), axis=-1)

        # computeEvaluation (reference fri/fri.go:314-384)
        old_eval = _compute_evaluation(
            spec, subgroup_x, within_bits, arity_bits, evals,
            challenges["fri_betas"][j])
        # verdict: barycentric denominators nonzero handled inside? weights
        # of distinct points are nonzero by construction.

        # Merkle check of step evals against commit cap j
        depth = spec.step_tree_depths[j]
        smask = absorb_slot_masks(arity * 2)
        n_chunks = smask.shape[0]
        assert n_chunks == dev[f"step{j}_leaf_packed"].shape[2]
        leaf_digest = _hash_leaves_scan(dev[f"step{j}_leaf_packed"], smask)
        chain_bits = [b for b in coset_bits]
        root_j = _merkle_chain(leaf_digest, dev[f"step{j}_siblings"],
                               chain_bits, depth)
        expected = _cap_lookup(dev["commit_caps"][:, j], cap_index)
        verdict = verdict & jnp.all(bn254.eq(root_j, expected), axis=-1)

        # x <- x^arity
        for _ in range(arity_bits):
            subgroup_x = gl.mul(subgroup_x, subgroup_x)
        bits = coset_bits

    # --- final polynomial check (reference fri/fri.go:253-259, 493-497)
    sx_qe = qe.from_base(subgroup_x)
    fp = dev["final_poly"]                           # QE pair (B, F)
    # broadcast coeffs over the query axis: (B, F) -> (B, 1, F)
    fp_b = qe.index(fp, (Ellipsis, None, slice(None)))
    acc = qe.horner(fp_b, sx_qe)                     # (B, Q)
    verdict = verdict & jnp.all(qe.eq(old_eval, acc), axis=-1)
    return verdict


def _compute_evaluation(spec, x, within_bits, arity_bits, evals, beta):
    """Barycentric interpolation of the coset evals at beta
    (reference fri/fri.go:261-384), fully stacked over the coset axis:
    the O(arity^2) pairwise differences are one broadcast subtract and the
    per-point products fold in log-depth."""
    arity = 1 << arity_bits
    g = gl.primitive_root_of_unity(arity_bits)
    g_inv = pow(g, arity - 1, gl.P)

    # bit-reversed reorder of evals (static permutation)
    def bitrev(i):
        return int(f"{i:0{arity_bits}b}"[::-1], 2)

    perm = np.asarray([bitrev(i) for i in range(arity)])
    inv_perm = np.zeros(arity, dtype=np.int64)
    inv_perm[perm] = np.arange(arity)
    y_st = qe.index(evals, (Ellipsis, inv_perm))    # (B, Q, arity)

    # cosetStart = x * gInv^bitrev(within_idx)
    start = gl.ones(within_bits[0].shape)
    pw = g_inv
    for i in reversed(range(arity_bits)):
        term = gl.mul_const(start, pw)
        start = gl.select(within_bits[i].astype(bool), term, start)
        pw = (pw * pw) % gl.P
    coset_start = gl.mul(start, x)

    # x_i = coset_start * g^i: one constant-array multiply
    g_pows = gl.const_array([pow(g, i, gl.P) for i in range(arity)])
    cs_b = qe.index(qe.from_base(coset_start), (Ellipsis, None))  # (B, Q, 1)
    x_st = qe.mul_const_arr(cs_b, g_pows)            # (B, Q, arity)

    # barycentric weights w_i = 1 / prod_{j != i} (x_i - x_j):
    # pairwise diffs in one broadcast, diagonal masked to one
    xi = qe.index(x_st, (Ellipsis, slice(None), None))   # (B, Q, A, 1)
    xj = qe.index(x_st, (Ellipsis, None, slice(None)))   # (B, Q, 1, A)
    pd = qe.sub(xi, xj)                                  # (B, Q, A, A)
    eye = jnp.eye(arity, dtype=bool)
    pd = qe.select(eye, qe.ones(pd[0][0].shape), pd)
    w_inv = qe.inv(qe.prod_axis(pd))                     # (B, Q, A)

    beta_b = ((beta[0][0][:, None, None], beta[0][1][:, None, None]),
              (beta[1][0][:, None, None], beta[1][1][:, None, None]))

    # interpolate at beta (reference fri/fri.go:261-312)
    diff = qe.sub(beta_b, x_st)                     # (B, Q, arity)
    diff_inv = qe.inv(diff)
    any_zero = qe.is_zero(diff)                     # beta == x_i ?

    l_x = qe.prod_axis(diff)                        # prod (beta - x_i)
    terms = qe.mul(y_st, qe.mul(w_inv, diff_inv))
    interpolation = qe.mul(l_x, qe.sum_axis(terms))

    # fallback when beta coincides with a coset point
    hit = jnp.any(any_zero, axis=-1)
    picked = qe.select(any_zero, y_st, qe.zeros(y_st[0][0].shape))
    lookup_val = qe.sum_axis(picked)
    return qe.select(hit, lookup_val, interpolation)
