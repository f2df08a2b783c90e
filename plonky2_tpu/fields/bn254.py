"""BN254 scalar-field arithmetic on TPU: 16x16-bit limbs, Montgomery domain.

Elements are ``(..., 16)`` uint32 arrays of little-endian 16-bit limbs.  The
hashing data path (Poseidon-BN254 Merkle trees) keeps everything in the
Montgomery domain (R = 2^256); all constants and proof inputs are converted
host-side, so the device never performs domain conversions.

The Montgomery multiplication is a CIOS variant restructured for SIMD lanes:
limb-column accumulators stay *redundant* (uint32 capacity, 16-bit positions)
through all 16 outer iterations -- only column 0 is exact at each step, which
is all that is needed to form the per-iteration Montgomery quotient digit.
This removes the sequential inner carry chain entirely; one carry propagation
runs at the end.  (The reference leans on gnark's native BN254 arithmetic:
poseidon/bn254.go:39-45 builds on frontend.API mul/add.)
"""

from __future__ import annotations

import jax.numpy as jnp

P = 21888242871839275222246405745257275088548364400416034343698204186575808495617
NUM_LIMBS = 16
LIMB_BITS = 16
R = 1 << 256
R_MOD_P = R % P
R2_MOD_P = (R * R) % P
# -p^-1 mod 2^16
N0_INV = (-pow(P, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)

_U32 = jnp.uint32
_MASK = 0xFFFF

P_LIMBS = [(P >> (LIMB_BITS * k)) & _MASK for k in range(NUM_LIMBS)]


# ---------------------------------------------------------------------------
# Host-side conversions (python ints / numpy)
# ---------------------------------------------------------------------------

def int_to_limbs(x):
    """Python int -> list of 16 int limbs."""
    x = int(x) % P
    return [(x >> (LIMB_BITS * k)) & _MASK for k in range(NUM_LIMBS)]


def limbs_to_int(limbs):
    out = 0
    for k in reversed(range(len(limbs))):
        out = (out << LIMB_BITS) | int(limbs[k])
    return out


def int_to_mont_limbs(x):
    """Python int -> Montgomery-domain limb list."""
    return int_to_limbs((int(x) * R) % P)


def from_int(x, shape=(), mont=True):
    """Constant element as a (..., 16) uint32 array."""
    limbs = int_to_mont_limbs(x) if mont else int_to_limbs(x)
    arr = jnp.array(limbs, dtype=_U32)
    return jnp.broadcast_to(arr, tuple(shape) + (NUM_LIMBS,))


def zeros(shape=()):
    return jnp.zeros(tuple(shape) + (NUM_LIMBS,), _U32)


# ---------------------------------------------------------------------------
# Device ops
# ---------------------------------------------------------------------------

def _carry_propagate_stack(dstack):
    """Redundant uint32 columns (K, ...) -> clean 16-bit limbs, via one scan
    body (the unrolled chain costs ~100 HLO ops per call site; the scan ~6)."""
    import jax

    def step(carry, d):
        t = d + carry
        return t >> LIMB_BITS, t & _MASK

    carry, clean = jax.lax.scan(
        step, jnp.zeros(dstack.shape[1:], _U32), dstack)
    return clean, carry


def _cond_sub_p_stack(limbs):
    """limbs (16, ...) clean, < 2p -> canonical < p; one conditional subtract."""
    import jax

    p_rows = jnp.asarray(_P_LIMBS_NP)  # (16,), scanned as scalars

    def step(borrow, xs):
        l, pk = xs
        d = (l - pk - borrow) & _MASK
        nb = (l < pk + borrow).astype(_U32)
        return nb, d

    borrow, diff = jax.lax.scan(
        step, jnp.zeros(limbs.shape[1:], _U32), (limbs, p_rows))
    ge = borrow == 0  # no final borrow => limbs >= p
    return jnp.where(ge, diff, limbs)


import numpy as _np

# numpy (not jnp) so closing over it inside traced scopes never leaks tracers
_P_LIMBS_NP = _np.array(P_LIMBS, dtype=_np.uint32)


def mont_mul(a, b):
    """Montgomery product a*b*R^-1 mod p; canonical output.

    a, b: (..., 16) uint32 clean-limb arrays (values < p).  The limb axis is
    one vector lane dimension: each CIOS iteration is ~10 whole-array ops
    (column accumulators stay redundant in uint32; only column 0 -- exact at
    each step -- feeds the Montgomery quotient digit, so no inner carry chain
    exists).  The 16 outer iterations run under `lax.scan` so every call site
    contributes a single small body to the traced graph: an unrolled CIOS
    costs XLA ~2s of compile time PER CALL SITE, which made whole-verifier
    compiles take tens of minutes.
    """
    import jax

    a, b = jnp.broadcast_arrays(a, b)
    shape = a.shape[:-1]
    ai_seq = jnp.moveaxis(a, -1, 0)  # (16, ...)
    zero1 = jnp.zeros(shape + (1,), _U32)
    p_arr = _P_LIMBS_NP

    def step(t, ai):
        prod = ai[..., None] * b  # (..., 16), each < 2^32, exact
        t = (t + jnp.concatenate([prod & _MASK, zero1], -1)
             + jnp.concatenate([zero1, prod >> LIMB_BITS], -1))
        # quotient digit from exact low 16 bits of column 0
        m = (t[..., 0:1] * _U32(N0_INV)) & _MASK
        q = m * p_arr  # (..., 16)
        t = (t + jnp.concatenate([q & _MASK, zero1], -1)
             + jnp.concatenate([zero1, q >> LIMB_BITS], -1))
        # low column is now divisible by 2^16; shift down
        carry0 = t[..., 0:1] >> LIMB_BITS
        t = jnp.concatenate([t[..., 1:2] + carry0, t[..., 2:], zero1], -1)
        return t, None

    t, _ = jax.lax.scan(step, jnp.zeros(shape + (NUM_LIMBS + 1,), _U32),
                        ai_seq)
    clean, _ = _carry_propagate_stack(jnp.moveaxis(t, -1, 0))
    # result < 2p < 2^256 so column 16 and the final carry are zero.
    return jnp.moveaxis(_cond_sub_p_stack(clean[:NUM_LIMBS]), 0, -1)


def mont_sqr(a):
    return mont_mul(a, a)


def add(a, b):
    """Modular addition (works in either domain); canonical inputs."""
    digits = jnp.moveaxis(a + b, -1, 0)
    clean, carry = _carry_propagate_stack(digits)
    # a+b < 2p < 2^255 so carry == 0
    return jnp.moveaxis(_cond_sub_p_stack(clean), 0, -1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(mask, a, b):
    return jnp.where(mask[..., None], a, b)


# ---------------------------------------------------------------------------
# Host-side reference (for tests / precompute)
# ---------------------------------------------------------------------------

def host_mont_mul(x_mont_int, y_mont_int):
    return (x_mont_int * y_mont_int * pow(R, -1, P)) % P
