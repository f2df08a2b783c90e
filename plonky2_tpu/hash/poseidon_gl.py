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

        # full-width variants (concat-free permute):
        #   init_mat12: out = x @ M^T with M[0]=e0, M[1+d][1+r]=init[r][d]
        #   w_full:  per-round [MDS0TO0, what_0..10]
        #   vs_full: per-round [0, vs_0..10]
        im = np.asarray(K.FAST_PARTIAL_ROUND_INITIAL_MATRIX, dtype=object)
        m12 = [[0] * WIDTH for _ in range(WIDTH)]
        m12[0][0] = 1
        for d in range(11):
            for r in range(11):
                m12[1 + d][1 + r] = int(im[r][d])
        init_mat12 = gl.const_array(m12)
        w_full = gl.const_array(
            [[K.MDS0TO0] + [int(x) for x in row]
             for row in K.FAST_PARTIAL_ROUND_W_HATS])           # (22, 12)
        vs_full = gl.const_array(
            [[0] + [int(x) for x in row]
             for row in K.FAST_PARTIAL_ROUND_VS])               # (22, 12)

        cls._cache = dict(
            mds=np.asarray(A), rc_first=rc_first, rc_second=rc_second,
            first_const=first_const, part_const=part_const,
            w_hats=w_hats, vs=vs, init_mat=init_mat,
            init_mat12=init_mat12, w_full=w_full, vs_full=vs_full)
        return cls._cache


def _sbox(x):
    """x^7 on a GL value of any shape."""
    x2 = gl.mul(x, x)
    x3 = gl.mul(x, x2)
    x6 = gl.mul(x3, x3)
    return gl.mul(x, x6)


def _mds_layer(state):
    """Circulant MDS as four per-limb u32 matmuls.  state: GL (..., 12).
    Each product coefficient is <= 49, so column sums stay < 2^26, well
    within digit capacity.

    NO jnp.stack/concatenate here: the XLA:CPU fusion emitter re-evaluates
    a concatenate's producer subgraph once per consumer depth, which turns
    a permutation into seconds of runtime (measured; see
    .claude/skills/verify/SKILL.md).  dot/einsum consumers are immune, so
    the limb planes stay a python list contracted by einsum."""
    A = jnp.asarray(_Consts.get()["mds"])
    digits = [
        jnp.einsum("rc,...c->...r", A, state[0] & 0xFFFF),
        jnp.einsum("rc,...c->...r", A, state[0] >> 16),
        jnp.einsum("rc,...c->...r", A, state[1] & 0xFFFF),
        jnp.einsum("rc,...c->...r", A, state[1] >> 16),
    ]
    return gl.reduce_digits(digits)


def _sum_digits_over_axis(digit_list, axis):
    return [gl.tree_sum(d, axis) for d in digit_list]


def _lane0_mask(ndim):
    """Broadcastable (..., 12) bool mask selecting lane 0."""
    shape = (1,) * (ndim - 1) + (WIDTH,)
    return (np.arange(WIDTH) == 0).reshape(shape)


def permute(state):
    """Poseidon permutation; state GL shape (..., 12), canonical, -> same.

    Everything is full-width: partial rounds compose lane 0 back into the
    state with `gl.select` on a lane mask instead of concatenating split
    halves (concatenate consumers are pathological on XLA:CPU -- see
    _mds_layer)."""
    C = _Consts.get()

    def full_round(st, rc):
        st = gl.add(st, rc)
        st = _sbox(st)
        return _mds_layer(st), None

    state, _ = jax.lax.scan(full_round, state, C["rc_first"])

    # partial rounds: folded first constant layer + init matrix, applied as
    # one full-width 12x12 constant matmul (row/col 0 is the identity lane)
    state = gl.add(state, C["first_const"])
    state = gl.matmul_const(state, C["init_mat12"])

    mask0 = _lane0_mask(state[0].ndim)

    def partial_round(st, xs):
        pc, wfull, vsfull = xs  # pc: scalar GL; wfull, vsfull: GL (12,)
        s0 = (st[0][..., 0], st[1][..., 0])
        s0 = _sbox(s0)
        s0 = gl.add(s0, pc)
        s0b = (s0[0][..., None], s0[1][..., None])
        st0 = gl.select(mask0, s0b, st)
        # d = MDS0TO0*s0 + sum_i rest[i]*what[i]  == st0 . wfull
        d = gl.dot(st0, (wfull[0], wfull[1]))
        # rest[i] += s0 * vs[i]  (vsfull[0] = 0 keeps lane 0 untouched)
        rest = gl.mul_add(s0b, (vsfull[0], vsfull[1]), st0)
        st = gl.select(mask0, (d[0][..., None], d[1][..., None]), rest)
        return st, None

    state, _ = jax.lax.scan(partial_round, state,
                            (C["part_const"], C["w_full"], C["vs_full"]))

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
