"""Poseidon permutation over the BN254 scalar field (width 4, iden3 variant).

This is the Merkle-tree hasher of the protocol (reference poseidon/bn254.go).
States are ``(..., 4, 16)`` uint32 arrays: 4 field elements of 16x16-bit
limbs, always in the Montgomery domain.  Round structure (8 full + 56
partial, with the pre-round ark and the p-matrix mix after the first half,
reference poseidon/bn254.go:39-45,130-169) is driven by `lax.scan` so the
permutation traces to a compact, compile-friendly graph regardless of batch.

All round constants / matrices are baked in Montgomery form at import time
(tools/gen_constants.py), so the device path is pure mont_mul/add.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bn254
from . import poseidon_bn254_constants as K

FULL_ROUNDS = 8
PARTIAL_ROUNDS = 56
WIDTH = 4
RATE = 3

_U32 = jnp.uint32


def _limbs(x):
    return bn254.int_to_limbs(x)


def _np_limbs(values):
    """Nested list of mont ints -> numpy uint32 limb array (appends limb dim)."""
    arr = np.asarray(
        [[_limbs(v) for v in row] for row in values]
        if isinstance(values[0], (list, tuple)) else [_limbs(v) for v in values],
        dtype=np.uint32)
    return arr


class _Consts:
    """Lazily-built device constant bundle."""
    _cache = None

    @classmethod
    def get(cls):
        if cls._cache is not None:
            return cls._cache
        c = K.C_CONSTANTS_MONT
        s = K.S_CONSTANTS_MONT
        m = K.M_MATRIX_MONT
        p = K.P_MATRIX_MONT

        # ark schedule for first half: rounds 0..3 use c[(i+1)*4 .. ] for
        # i=0..2 and c[(FULL/2)*4] = c[16] for the 4th; last of them mixes
        # with pMatrix instead of mMatrix.
        ark_first = np.stack([
            _np_limbs([c[(i + 1) * WIDTH + k] for k in range(WIDTH)])
            for i in range(FULL_ROUNDS // 2)])  # (4, 4, 16)
        use_p = np.array([0, 0, 0, 1], dtype=np.uint32)

        # ark schedule for second half: rounds use
        # c[(FULL/2+1)*4 + PARTIAL + i*4]; the final round has no ark (zeros).
        base = (FULL_ROUNDS // 2 + 1) * WIDTH + PARTIAL_ROUNDS
        ark_second = np.stack(
            [_np_limbs([c[base + i * WIDTH + k] for k in range(WIDTH)])
             for i in range(FULL_ROUNDS // 2 - 1)]
            + [np.zeros((WIDTH, 16), dtype=np.uint32)])  # (4, 4, 16)

        # partial rounds: constant added to state[0] after its sbox,
        # plus the 7 sparse-matrix coefficients per round.
        part_c = _np_limbs(
            [c[(FULL_ROUNDS // 2 + 1) * WIDTH + i] for i in range(PARTIAL_ROUNDS)])
        s_row = np.stack([
            _np_limbs([s[(WIDTH * 2 - 1) * i + j] for j in range(WIDTH)])
            for i in range(PARTIAL_ROUNDS)])  # (56, 4, 16): newState0 coeffs
        s_col = np.stack([
            _np_limbs([s[(WIDTH * 2 - 1) * i + WIDTH + k - 1]
                       for k in range(1, WIDTH)])
            for i in range(PARTIAL_ROUNDS)])  # (56, 3, 16): state[k] += ...

        cls._cache = dict(
            ark0=np.asarray(_np_limbs([c[k] for k in range(WIDTH)])),
            ark_first=np.asarray(ark_first),
            ark_second=np.asarray(ark_second),
            use_p=np.asarray(use_p),
            part_c=np.asarray(part_c),
            s_row=np.asarray(s_row),
            s_col=np.asarray(s_col),
            m_mat=np.asarray(_np_limbs(m)),  # (4j, 4i, 16)
            p_mat=np.asarray(_np_limbs(p)),
        )
        return cls._cache


def _exp5(x):
    x2 = bn254.mont_mul(x, x)
    x4 = bn254.mont_mul(x2, x2)
    return bn254.mont_mul(x4, x)


def _mix(state, matrix):
    """state (..., 4, 16) x matrix (4, 4, 16): out_i = sum_j M[j][i] * s_j
    (reference poseidon/bn254.go:194-208)."""
    prod = bn254.mont_mul(state[..., :, None, :], matrix)  # (..., j, i, 16)
    acc = prod[..., 0, :, :]
    for j in range(1, WIDTH):
        acc = bn254.add(acc, prod[..., j, :, :])
    return acc


def _use_pallas():
    """The Pallas kernel is the TPU path; jnp scans remain the portable one.

    Env override PLONKY2_TPU_PB_KERNEL=0/1 forces the choice (e.g. for
    interpret-mode parity tests or TPU A/B benchmarks)."""
    import os
    flag = os.environ.get("PLONKY2_TPU_PB_KERNEL")
    if flag is not None:
        return flag not in ("0", "false")
    import jax
    return jax.default_backend() == "tpu"


def _kernel_impl():
    """Which Pallas kernel: 'mxu' (matmul linear layers, default) or 'cios'
    (all-VPU first-generation kernel), via PLONKY2_TPU_PB_IMPL."""
    import os
    return os.environ.get("PLONKY2_TPU_PB_IMPL", "mxu")


def _use_host_math():
    """Host-callback mode (CPU only): the permutation runs as one
    jax.pure_callback into the python-int reference implementation instead
    of tracing ~3k HLO ops per call site.  XLA:CPU cannot compile the full
    traced graph of a production-size circuit in reasonable time (>15 min
    measured), so CPU structure tests opt in via PLONKY2_TPU_HOST_MATH=1;
    the permutation math itself is covered by golden-vector and Pallas
    parity tests, and by bench.py on real TPU hardware.

    Read at trace time; the verifier/mesh compile caches key on
    (_use_host_math(), _use_pallas()) so toggling the env var within one
    process retraces instead of reusing a stale executable."""
    import os
    import jax
    return (os.environ.get("PLONKY2_TPU_HOST_MATH") == "1"
            and jax.default_backend() == "cpu")


def permute(state):
    """Full Poseidon-BN254 permutation; state (..., 4, 16) uint32, Montgomery."""
    if _use_pallas():
        if _kernel_impl() == "cios":
            from ..kernels.poseidon_bn254_pallas import permute as _pp
        else:
            from ..kernels.poseidon_bn254_mxu import permute as _pp
        return _pp(state)
    if _use_host_math():
        return _permute_host(state)
    return _permute_jnp(state)


def _permute_host(state):
    """pure_callback to the python-int reference (bench/cpu_reference.py)."""
    shape = state.shape

    def host(st):
        from ..bench import cpu_reference as R
        st = np.asarray(st)
        flat = st.reshape(-1, WIDTH, bn254.NUM_LIMBS)
        rinv = pow(bn254.R, -1, bn254.P)
        out = np.empty_like(flat)
        for i in range(flat.shape[0]):
            vals = [(bn254.limbs_to_int(flat[i, j]) * rinv) % bn254.P
                    for j in range(WIDTH)]
            res = R.poseidon_bn254(vals)
            for j in range(WIDTH):
                out[i, j] = bn254.int_to_mont_limbs(res[j])
        return out.reshape(shape)

    return jax.pure_callback(
        host, jax.ShapeDtypeStruct(shape, jnp.uint32), state)


def _permute_jnp(state):
    """Portable jnp/lax.scan permutation (CPU tests, kernel cross-checks)."""
    C = _Consts.get()
    state = bn254.add(state, C["ark0"])

    def full_round_first(st, xs):
        ark, usep = xs
        st = _exp5(st)
        st = bn254.add(st, ark)
        mat = jnp.where(usep.astype(bool), C["p_mat"], C["m_mat"])
        return _mix(st, mat), None

    state, _ = jax.lax.scan(full_round_first, state,
                            (C["ark_first"], C["use_p"]))

    def partial_round(st, xs):
        pc, srow, scol = xs
        s0 = bn254.add(_exp5(st[..., 0, :]), pc)
        st = jnp.concatenate([s0[..., None, :], st[..., 1:, :]], axis=-2)
        # newState0 = sum_j srow[j] * st_j
        prod = bn254.mont_mul(st, srow)  # (..., 4, 16)
        new0 = prod[..., 0, :]
        for j in range(1, WIDTH):
            new0 = bn254.add(new0, prod[..., j, :])
        # st[k] += st[0] * scol[k-1]  for k=1..3
        upd = bn254.mont_mul(s0[..., None, :], scol)  # (..., 3, 16)
        rest = bn254.add(st[..., 1:, :], upd)
        st = jnp.concatenate([new0[..., None, :], rest], axis=-2)
        return st, None

    state, _ = jax.lax.scan(partial_round, state,
                            (C["part_c"], C["s_row"], C["s_col"]))

    def full_round_second(st, ark):
        st = _exp5(st)
        st = bn254.add(st, ark)
        return _mix(st, C["m_mat"]), None

    state, _ = jax.lax.scan(full_round_second, state, C["ark_second"])
    return state


def two_to_one(left, right):
    """Merkle node combine (reference poseidon/bn254.go:96-104)."""
    shape = left.shape[:-1]
    z = bn254.zeros(shape)
    state = jnp.stack([z, z, left, right], axis=-2)
    return permute(state)[..., 0, :]


# ---------------------------------------------------------------------------
# Host-side helpers
# ---------------------------------------------------------------------------

def host_pack_gl_chunk(gl_values):
    """Pack <=3 canonical GL ints into one BN254 int: sum v_k * 2^(64k)
    (reference poseidon/bn254.go:58-71)."""
    out = 0
    for k, v in enumerate(gl_values):
        out += int(v) << (64 * k)
    return out


def host_absorb_schedule(n_inputs):
    """Absorb schedule for HashNoPad of n_inputs GL elements.

    Returns list of per-permutation slot maps: for each permutation, a list
    of (state_slot in 1..3, input_start, input_len<=3).
    """
    sched = []
    i = 0
    while i < n_inputs or (i == 0 and n_inputs == 0):
        if n_inputs == 0:
            break
        chunk = min(n_inputs - i, RATE * 3)
        slots = []
        j = 0
        slot = 1
        while j < chunk:
            ln = min(chunk - j, 3)
            slots.append((slot, i + j, ln))
            slot += 1
            j += ln
        sched.append(slots)
        i += chunk
    return sched
