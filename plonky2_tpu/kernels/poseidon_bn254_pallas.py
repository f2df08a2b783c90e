"""Pallas TPU kernel: batched Poseidon-BN254 permutation.

The Merkle hashing inside FRI verification (reference fri/fri.go:97-157,
poseidon/bn254.go:130-169) is the protocol's dominant cost.  The jnp path
(hash/poseidon_bn254.py) keeps the 16 16-bit limbs on the minor axis, so the
VPU runs at 16/128 lane utilization and every CIOS iteration is a separate
XLA op.  This kernel flips the layout -- limbs on sublanes, hash lanes on
the 128-wide lane axis -- and runs the entire 64-round permutation out of
VMEM in one kernel launch:

  state (4, 16, T): 4 field elements x 16 limbs x T hash lanes.

Montgomery multiplication is the same redundant-column CIOS as the jnp path
(fields/bn254.py): 16 outer iterations with uint32 column accumulators and
no inner carry chain; one carry propagation + conditional subtract at the
end.  Full rounds run as two `fori_loop`s over stacked per-round constants,
partial rounds as one `fori_loop` over 56 rounds, so the Mosaic graph stays
compact while the hot loop never leaves VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bn254
from ..hash import poseidon_bn254 as pbj

NUM_LIMBS = bn254.NUM_LIMBS
LIMB_BITS = bn254.LIMB_BITS
_MASK = 0xFFFF
_U32 = jnp.uint32

WIDTH = pbj.WIDTH
FULL_HALF = pbj.FULL_ROUNDS // 2
PARTIAL = pbj.PARTIAL_ROUNDS

LANE_TILE = 512  # hash lanes per grid step (multiple of 128)


# ---------------------------------------------------------------------------
# Constant bundles, shaped for the kernel: trailing singleton lane axis so
# every constant broadcasts against (16, T) operands.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def _kernel_consts():
    C = pbj._Consts.get()
    mm = np.asarray(C["m_mat"])          # (4j, 4i, 16)
    pm = np.asarray(C["p_mat"])

    # first half: rounds 0..2 use mMatrix, round 3 uses pMatrix
    mats_first = np.stack([mm, mm, mm, pm])          # (4, 4, 4, 16)
    mats_second = np.stack([mm] * FULL_HALF)         # (4, 4, 4, 16)

    return dict(
        ark0=np.asarray(C["ark0"])[..., None],               # (4, 16, 1)
        arks_first=np.asarray(C["ark_first"])[..., None],    # (4, 4, 16, 1)
        arks_second=np.asarray(C["ark_second"])[..., None],  # (4, 4, 16, 1)
        mats_first=mats_first[..., None],                    # (4, 4, 4, 16, 1)
        mats_second=mats_second[..., None],
        part_c=np.asarray(C["part_c"])[..., None],           # (56, 16, 1)
        s_row=np.asarray(C["s_row"])[..., None],             # (56, 4, 16, 1)
        s_col=np.asarray(C["s_col"])[..., None],             # (56, 3, 16, 1)
    )


_P_COL = np.asarray(bn254.P_LIMBS, dtype=np.uint32)[:, None]      # (16, 1)
_N0_INV = np.uint32(bn254.N0_INV)


# ---------------------------------------------------------------------------
# In-kernel field ops on (16, T) uint32 limb planes.  Built as a closure
# over the prime-limb column (a kernel input: Pallas kernels cannot capture
# array constants).
# ---------------------------------------------------------------------------

def _field_ops(p_col):
    def cond_sub_p(limbs):
        """(16, T) clean limbs < 2p -> canonical < p."""
        T = limbs.shape[-1]

        def sub_step(k, st):
            diff, borrow = st
            row = jax.lax.dynamic_slice_in_dim(limbs, k, 1, 0)
            pk = jax.lax.dynamic_slice_in_dim(p_col, k, 1, 0)
            d = (row - pk - borrow) & _MASK
            borrow = (row < pk + borrow).astype(_U32)
            diff = jax.lax.dynamic_update_slice_in_dim(diff, d, k, 0)
            return (diff, borrow)

        diff, borrow = jax.lax.fori_loop(
            0, NUM_LIMBS, sub_step,
            (jnp.zeros_like(limbs), jnp.zeros((1, T), _U32)))
        ge = borrow[0:1] == 0  # no final borrow => limbs >= p
        return jnp.where(ge, diff, limbs)

    def carry_and_reduce(t):
        """Redundant columns (17, T) -> canonical (16, T) limbs (< p)."""
        T = t.shape[-1]

        def carry_step(k, st):
            t, carry = st
            row = jax.lax.dynamic_slice_in_dim(t, k, 1, 0) + carry
            t = jax.lax.dynamic_update_slice_in_dim(t, row & _MASK, k, 0)
            return (t, row >> LIMB_BITS)

        t, _ = jax.lax.fori_loop(0, NUM_LIMBS + 1, carry_step,
                                 (t, jnp.zeros((1, T), _U32)))
        return cond_sub_p(t[:NUM_LIMBS])

    def mont_mul(a, b):
        """Montgomery product of (16, T) canonical limb planes."""
        a, b = jnp.broadcast_arrays(a, b)
        T = a.shape[-1]
        zero1 = jnp.zeros((1, T), _U32)

        def step(i, t):
            ai = jax.lax.dynamic_slice_in_dim(a, i, 1, 0)      # (1, T)
            prod = ai * b                                       # (16, T)
            t = (t + jnp.concatenate([prod & _MASK, zero1], 0)
                 + jnp.concatenate([zero1, prod >> LIMB_BITS], 0))
            m = (t[0:1] * _N0_INV) & _MASK                      # (1, T)
            q = m * p_col                                       # (16, T)
            t = (t + jnp.concatenate([q & _MASK, zero1], 0)
                 + jnp.concatenate([zero1, q >> LIMB_BITS], 0))
            carry0 = t[0:1] >> LIMB_BITS
            return jnp.concatenate([t[1:2] + carry0, t[2:], zero1], 0)

        t = jax.lax.fori_loop(0, NUM_LIMBS, step,
                              jnp.zeros((NUM_LIMBS + 1, T), _U32))
        return carry_and_reduce(t)

    def add(a, b):
        """Modular addition of canonical (16, T) limb planes."""
        a, b = jnp.broadcast_arrays(a, b)
        return carry_and_reduce(
            jnp.concatenate([a + b, jnp.zeros((1, a.shape[-1]), _U32)], 0))

    def exp5(x):
        x2 = mont_mul(x, x)
        x4 = mont_mul(x2, x2)
        return mont_mul(x4, x)

    return mont_mul, add, exp5


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _kernel(p_ref, ark0_ref, arks_f_ref, mats_f_ref, part_c_ref, s_row_ref,
            s_col_ref, arks_s_ref, mats_s_ref, state_ref, out_ref):
    _mont_mul, _add, _exp5 = _field_ops(p_ref[:])
    s = [state_ref[j] for j in range(WIDTH)]              # 4 x (16, T)
    s = [_add(x, ark0_ref[j]) for j, x in enumerate(s)]

    def full_round(r, s, arks_ref, mats_ref):
        ark = jax.lax.dynamic_slice_in_dim(arks_ref[:], r, 1, 0)[0]
        mat = jax.lax.dynamic_slice_in_dim(mats_ref[:], r, 1, 0)[0]
        s = [_exp5(x) for x in s]
        s = [_add(x, ark[j]) for j, x in enumerate(s)]
        # out_i = sum_j mat[j][i] * s_j   (reference poseidon/bn254.go:194-208)
        out = []
        for i in range(WIDTH):
            acc = _mont_mul(s[0], mat[0, i])
            for j in range(1, WIDTH):
                acc = _add(acc, _mont_mul(s[j], mat[j, i]))
            out.append(acc)
        return out

    def first_half(r, s):
        return full_round(r, s, arks_f_ref, mats_f_ref)

    def second_half(r, s):
        return full_round(r, s, arks_s_ref, mats_s_ref)

    def partial_round(r, s):
        pc = jax.lax.dynamic_slice_in_dim(part_c_ref[:], r, 1, 0)[0]
        srow = jax.lax.dynamic_slice_in_dim(s_row_ref[:], r, 1, 0)[0]
        scol = jax.lax.dynamic_slice_in_dim(s_col_ref[:], r, 1, 0)[0]
        s0 = _add(_exp5(s[0]), pc)
        st = [s0] + s[1:]
        new0 = _mont_mul(st[0], srow[0])
        for j in range(1, WIDTH):
            new0 = _add(new0, _mont_mul(st[j], srow[j]))
        rest = [_add(st[k], _mont_mul(s0, scol[k - 1]))
                for k in range(1, WIDTH)]
        return [new0] + rest

    s = jax.lax.fori_loop(0, FULL_HALF, first_half, s)
    s = jax.lax.fori_loop(0, PARTIAL, partial_round, s)
    s = jax.lax.fori_loop(0, FULL_HALF, second_half, s)
    for j in range(WIDTH):
        out_ref[j] = s[j]


@functools.lru_cache(maxsize=16)
def _permute_lanes_compiled(n_lanes, interpret):
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except ImportError:  # pragma: no cover
        pltpu = None
        vmem = None

    K = _kernel_consts()
    consts = [_P_COL, K["ark0"], K["arks_first"], K["mats_first"],
              K["part_c"], K["s_row"], K["s_col"], K["arks_second"],
              K["mats_second"]]
    tile = LANE_TILE if n_lanes % LANE_TILE == 0 else n_lanes
    grid = (n_lanes // tile,)
    kw = {"memory_space": vmem} if vmem is not None else {}

    def const_spec(c):
        zeros = (0,) * c.ndim
        return pl.BlockSpec(c.shape, lambda i, _z=zeros: _z, **kw)

    in_specs = [const_spec(c) for c in consts]
    state_spec = pl.BlockSpec((WIDTH, NUM_LIMBS, tile),
                              lambda i: (0, 0, i), **kw)

    fn = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((WIDTH, NUM_LIMBS, n_lanes), _U32),
        grid=grid,
        in_specs=in_specs + [state_spec],
        out_specs=state_spec,
        interpret=bool(interpret),
    )

    def run(state):
        return fn(*[jnp.asarray(c) for c in consts], state)

    return jax.jit(run)


def permute_lanes(state, interpret=False):
    """Permute (4, 16, N) uint32 Montgomery states; N padded to a lane tile."""
    n = state.shape[-1]
    pad = (-n) % (LANE_TILE if n >= LANE_TILE else 128)
    if pad:
        state = jnp.pad(state, ((0, 0), (0, 0), (0, pad)))
    out = _permute_lanes_compiled(state.shape[-1], interpret)(state)
    return out[..., :n]


def permute(state, interpret=False):
    """Drop-in for hash/poseidon_bn254.permute: state (..., 4, 16) uint32."""
    lead = state.shape[:-2]
    m = int(np.prod(lead, dtype=np.int64)) if lead else 1
    st = state.reshape(m, WIDTH, NUM_LIMBS).transpose(1, 2, 0)
    out = permute_lanes(st, interpret=interpret)
    return out.transpose(2, 0, 1).reshape(lead + (WIDTH, NUM_LIMBS))
