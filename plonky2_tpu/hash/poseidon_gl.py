"""Poseidon permutation over Goldilocks (width 12, plonky2 instance).

Used for the Fiat-Shamir transcript and the public-inputs hash (reference
poseidon/goldilocks.go).  States are GL values of shape ``(..., 12)`` --
i.e. a (lo, hi) pair of uint32 arrays.  Round loops are lax.scans with the
round constants as scanned inputs; the circulant MDS layer is one integer
matmul over 16-bit limb planes (MXU-friendly), mirroring plonky2's
"fast partial rounds" structure:

  full rounds:     +round-const, x^7 sbox, circulant MDS      (4 + 4 rounds)
  partial rounds:  folded first-constant layer + init matrix, then per round
                   a single x^7 sbox on lane 0 and a sparse w_hat/v update
                   (reference poseidon/goldilocks.go:92-331)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import goldilocks as gl
from . import poseidon_gl_constants as K

WIDTH = 12
RATE = 8
HASH_SIZE = 4
HALF_N_FULL_ROUNDS = 4
N_PARTIAL_ROUNDS = 22

_U32 = jnp.uint32


def _gl_np(values):
    """List (or nested list) of u64 ints -> (lo, hi) numpy uint32 arrays."""
    arr = np.asarray(values, dtype=np.uint64)
    return (np.asarray(arr & np.uint64(0xFFFFFFFF), dtype=np.uint32),
            np.asarray(arr >> np.uint64(32), dtype=np.uint32))


class _Consts:
    _cache = None

    @classmethod
    def get(cls):
        if cls._cache is not None:
            return cls._cache
        rc = np.asarray(K.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, 12)
        # full MDS matrix A[r][c] = circ[(c - r) % 12] + diag[r]*(c == r)
        circ = K.MDS_MATRIX_CIRC
        diag = K.MDS_MATRIX_DIAG
        A = np.zeros((12, 12), dtype=np.uint32)
        for r in range(12):
            for c in range(12):
                A[r][c] = circ[(c - r) % 12] + (diag[r] if r == c else 0)
        lo, hi = _gl_np(rc[:4])
        rc_first = (np.asarray(lo), np.asarray(hi))
        lo, hi = _gl_np(rc[26:30])
        rc_second = (np.asarray(lo), np.asarray(hi))
        lo, hi = _gl_np(K.FAST_PARTIAL_FIRST_ROUND_CONSTANT)
        first_const = (np.asarray(lo), np.asarray(hi))
        lo, hi = _gl_np(K.FAST_PARTIAL_ROUND_CONSTANTS)
        part_const = (np.asarray(lo), np.asarray(hi))
        lo, hi = _gl_np(K.FAST_PARTIAL_ROUND_W_HATS)
        w_hats = (np.asarray(lo), np.asarray(hi))  # (22, 11)
        lo, hi = _gl_np(K.FAST_PARTIAL_ROUND_VS)
        vs = (np.asarray(lo), np.asarray(hi))  # (22, 11)
        lo, hi = _gl_np(K.FAST_PARTIAL_ROUND_INITIAL_MATRIX)
        init_mat = (np.asarray(lo), np.asarray(hi))  # (11, 11) [r-1][d-1]
        cls._cache = dict(
            mds=np.asarray(A), rc_first=rc_first, rc_second=rc_second,
            first_const=first_const, part_const=part_const,
            w_hats=w_hats, vs=vs, init_mat=init_mat)
        return cls._cache


def _sbox(x):
    """x^7 on a GL value of any shape."""
    x2 = gl.mul(x, x)
    x3 = gl.mul(x, x2)
    x6 = gl.mul(x3, x3)
    return gl.mul(x, x6)


def _mds_layer(state):
    """Circulant MDS as a broadcast multiply + log-tree add over 16-bit limb
    planes.  state: GL of shape (..., 12).  Each product coefficient is
    <= 49, so column sums stay < 2^26, well within digit capacity.

    (Not an einsum/jnp.sum: XLA:CPU compiles integer reduce/dot ops with
    fused operands pathologically slowly -- see gl.tree_sum.)
    """
    A = jnp.asarray(_Consts.get()["mds"])
    limbs = jnp.stack([state[0] & 0xFFFF, state[0] >> 16,
                       state[1] & 0xFFFF, state[1] >> 16], axis=-1)  # (...,12,4)
    prod = A[:, :, None] * limbs[..., None, :, :]   # (..., 12r, 12c, 4)
    acc = gl.tree_sum(prod, axis=-2)                # (..., 12, 4)
    digits = [acc[..., k] for k in range(4)]
    return gl.reduce_digits(digits)


def _sum_digits_over_axis(digit_list, axis):
    return [gl.tree_sum(d, axis) for d in digit_list]


def permute(state):
    """Poseidon permutation; state GL shape (..., 12), canonical, -> same."""
    C = _Consts.get()

    def full_round(st, rc):
        st = gl.add(st, rc)
        st = _sbox(st)
        return _mds_layer(st), None

    state, _ = jax.lax.scan(full_round, state, C["rc_first"])

    # partial rounds: folded first constant layer + init matrix
    state = gl.add(state, C["first_const"])
    s0 = (state[0][..., 0], state[1][..., 0])
    rest = (state[0][..., 1:], state[1][..., 1:])  # (..., 11)
    # result[d] = sum_r rest[r] * INIT[r][d]  (init_mat indexed [r-1][d-1])
    d = gl.mul_digits((rest[0][..., :, None], rest[1][..., :, None]),
                      C["init_mat"])
    d = _sum_digits_over_axis(d, -2)  # (..., 11)
    rest = gl.reduce_digits(d)
    state = (jnp.concatenate([s0[0][..., None], rest[0]], axis=-1),
             jnp.concatenate([s0[1][..., None], rest[1]], axis=-1))

    def partial_round(st, xs):
        pc, what, vs_r = xs  # pc: scalar GL; what, vs_r: GL (11,)
        s0 = (st[0][..., 0], st[1][..., 0])
        s0 = _sbox(s0)
        s0 = gl.add(s0, pc)
        rest = (st[0][..., 1:], st[1][..., 1:])
        # d = MDS0TO0 * s0 + sum_i rest[i] * what[i]
        dd = gl.mul_digits(rest, what)
        dd = _sum_digits_over_axis(dd, -1)
        dd = gl.add_digits(dd, gl.mul_const_digits(s0, K.MDS0TO0))
        d = gl.reduce_digits(dd)
        # rest[i] = s0 * vs[i] + rest[i]
        rd = gl.mul_digits((s0[0][..., None], s0[1][..., None]), vs_r)
        rd = gl.add_to_digits(rd, rest)
        rest = gl.reduce_digits(rd)
        st = (jnp.concatenate([d[0][..., None], rest[0]], axis=-1),
              jnp.concatenate([d[1][..., None], rest[1]], axis=-1))
        return st, None

    state, _ = jax.lax.scan(partial_round, state,
                            (C["part_const"], C["w_hats"], C["vs"]))

    def full_round2(st, rc):
        st = gl.add(st, rc)
        st = _sbox(st)
        return _mds_layer(st), None

    state, _ = jax.lax.scan(full_round2, state, C["rc_second"])
    return state


def hash_no_pad(inputs, n_outputs=HASH_SIZE):
    """HashNoPad: absorb in rate-8 chunks (overwrite), squeeze n_outputs
    (reference poseidon/goldilocks.go:41-86).

    inputs: GL of shape (..., n); returns GL of shape (..., n_outputs).
    Empty input returns zeros (zero state squeezed without permuting).
    """
    n = inputs[0].shape[-1]
    batch_shape = inputs[0].shape[:-1]
    state = gl.zeros(batch_shape + (WIDTH,))
    assert n_outputs <= RATE
    if n == 0:
        return (state[0][..., :n_outputs], state[1][..., :n_outputs])

    # absorb as ONE scan over rate-size blocks (compile-friendly: a single
    # permute body regardless of input length), masking the slots the final
    # partial block does not overwrite
    n_blocks = -(-n // RATE)
    pad = n_blocks * RATE - n
    lo = jnp.concatenate(
        [inputs[0], jnp.zeros(batch_shape + (pad,), jnp.uint32)], axis=-1)
    hi = jnp.concatenate(
        [inputs[1], jnp.zeros(batch_shape + (pad,), jnp.uint32)], axis=-1)
    blocks = (jnp.moveaxis(lo.reshape(batch_shape + (n_blocks, RATE)), -2, 0),
              jnp.moveaxis(hi.reshape(batch_shape + (n_blocks, RATE)), -2, 0))
    mask = np.arange(n_blocks * RATE).reshape(n_blocks, RATE) < n

    def absorb(state, xs):
        blo, bhi, m = xs
        lo = jnp.concatenate(
            [jnp.where(m, blo, state[0][..., :RATE]), state[0][..., RATE:]],
            axis=-1)
        hi = jnp.concatenate(
            [jnp.where(m, bhi, state[1][..., :RATE]), state[1][..., RATE:]],
            axis=-1)
        return permute((lo, hi)), None

    state, _ = jax.lax.scan(absorb, state,
                            (blocks[0], blocks[1], jnp.asarray(mask)))
    return (state[0][..., :n_outputs], state[1][..., :n_outputs])
