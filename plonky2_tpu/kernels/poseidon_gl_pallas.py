"""Pallas TPU kernel: the full Fiat-Shamir transcript scan in one launch.

The transcript (transcript/challenger.py) is a strictly sequential duplex
sponge: ~50 Poseidon-GL permutations of a (B, 12) state, each ~30 rounds of
small ops.  As XLA ops this is thousands of tiny sequential dispatches on
(B, 12) tensors -- measured at ~35 ms per batch on TPU v5e *independent of
B* (pure per-op latency; bench.py `phases.transcript`).  This kernel runs
the whole scan out of VMEM in a single launch.

Design mirrors kernels/poseidon_bn254_mxu.py: multiplication of a
Goldilocks element by a *constant* is linear over the element's byte
decomposition,

    c * x mod p  =  sum_k x_byte[k] * ((c * 2^(8k)) mod p),

so every linear layer of the permutation -- the circulant MDS matrix, the
fast-partial-rounds initial matrix, and each partial round's w_hat/v sparse
update (reference poseidon/goldilocks.go:92-331) -- is ONE exact bf16
(96, 96) x (96, B) matmul on the MXU (12 elements x 8 bytes; entries < 256
exact in bf16, column sums < 96*255*255 < 2^24 exact in f32), followed by
the standard digit reduction (fields/goldilocks.py reduce_digits, whose
elementwise ops lower to Mosaic directly).  The x^7 S-boxes stay on the
VPU via gl.mul.

State layout: two (12, B) uint32 planes (lo, hi), batch lanes minor.
Absorb blocks are pre-gathered host/XLA-side into (n_perms, 2, 8, B) so the
kernel's per-step work is one masked overwrite + one permutation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import goldilocks as gl
from ..hash import poseidon_gl as pgl

WIDTH = pgl.WIDTH
RATE = pgl.RATE
HALF_FULL = pgl.HALF_N_FULL_ROUNDS
N_PARTIAL = pgl.N_PARTIAL_ROUNDS

_U32 = jnp.uint32
_MASK16 = 0xFFFF


# ---------------------------------------------------------------------------
# Host-side constant builder
# ---------------------------------------------------------------------------

def _gl_byte_matrix(coeffs):
    """coeffs[r][c] (python ints mod P): out_r = sum_c coeffs[r][c] * x_c
    -> (96, 96) bf16 matrix over the byte decomposition.

    Row/col layout is byte-position-major: index m*12 + e = byte m of
    element e.  The kernel then extracts input bytes with full-plane
    masks/shifts (no per-element slicing) and recombines output digits
    from two contiguous 12-row slices (Mosaic has no strided slice)."""
    M = np.zeros((96, 96), dtype=np.float32)
    for r in range(WIDTH):
        for c in range(WIDTH):
            v = int(coeffs[r][c]) % gl.P
            if v == 0:
                continue
            for k in range(8):
                vk = (v << (8 * k)) % gl.P
                for m in range(8):
                    M[m * 12 + r, k * 12 + c] = (vk >> (8 * m)) & 0xFF
    return M.astype(jnp.bfloat16)


@functools.lru_cache(maxsize=1)
def _kernel_consts():
    from ..hash import poseidon_gl_constants as K
    C = pgl._Consts.get()

    # MDS matrix (integer entries <= 49): same byte-matrix treatment
    mds = _gl_byte_matrix(np.asarray(C["mds"], dtype=np.int64).tolist())

    # initial matrix, widened to 12x12 with identity lane 0
    im = K.FAST_PARTIAL_ROUND_INITIAL_MATRIX
    m12 = [[0] * WIDTH for _ in range(WIDTH)]
    m12[0][0] = 1
    for d in range(11):
        for r in range(11):
            m12[1 + d][1 + r] = int(im[r][d])
    init_mat = _gl_byte_matrix(m12)

    # per partial round r the linear map after the lane-0 sbox+const:
    #   out_0 = MDS0TO0*st_0 + sum_i w_hat[i]*st_{1+i}
    #   out_c = st_c + v[c-1]*st_0     (c = 1..11)
    mats_partial = []
    for r in range(N_PARTIAL):
        w = [K.MDS0TO0] + [int(x) for x in K.FAST_PARTIAL_ROUND_W_HATS[r]]
        v = [int(x) for x in K.FAST_PARTIAL_ROUND_VS[r]]
        A = [[0] * WIDTH for _ in range(WIDTH)]
        A[0] = list(w)
        for c in range(1, WIDTH):
            A[c][c] = 1
            A[c][0] = v[c - 1]
        mats_partial.append(_gl_byte_matrix(A))
    mats_partial = np.stack(mats_partial)                 # (22, 96, 96)

    def rc_pair(pair):
        # GL pair arrays (n, 12) -> (n, 2, 12, 1) u32
        return np.stack([np.asarray(pair[0]), np.asarray(pair[1])],
                        axis=1)[..., None]

    rc_first = rc_pair(C["rc_first"])                     # (4, 2, 12, 1)
    rc_second = rc_pair(C["rc_second"])
    fc = np.stack([np.asarray(C["first_const"][0]),
                   np.asarray(C["first_const"][1])])[:, :, None]  # (2, 12, 1)
    pc = np.stack([np.asarray(C["part_const"][0]),
                   np.asarray(C["part_const"][1])], axis=1)[..., None]
    # pc: (22, 2, 1) scalars per partial round
    return dict(mds=mds, init_mat=init_mat, mats_partial=mats_partial,
                rc_first=rc_first, rc_second=rc_second, first_const=fc,
                part_c=pc)


# ---------------------------------------------------------------------------
# In-kernel helpers (state = GL pair of (12, B) planes)
# ---------------------------------------------------------------------------

def _to_bytes96(st):
    """GL pair (12, B) -> (96, B) bf16 byte rows (byte-position-major)."""
    lo, hi = st
    rows = [lo & 0xFF, (lo >> 8) & 0xFF, (lo >> 16) & 0xFF, lo >> 24,
            hi & 0xFF, (hi >> 8) & 0xFF, (hi >> 16) & 0xFF, hi >> 24]
    cat = jnp.concatenate(rows, axis=0)                   # (96, B)
    return cat.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _linear(st, mat):
    """One byte matmul + digit reduction: GL (12, B) -> GL (12, B)."""
    xb = _to_bytes96(st)
    y = jax.lax.dot_general(mat, xb, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (96, B)
    yi = y.astype(jnp.int32).astype(_U32)
    # recombine bytes into 4 base-2^16 digit planes (12, B), each < 2^32
    digits = [yi[2 * d * 12:(2 * d + 1) * 12]
              + (yi[(2 * d + 1) * 12:(2 * d + 2) * 12] << 8)
              for d in range(4)]
    return gl.reduce_digits(digits)


def _sbox_all(st):
    return pgl._sbox(st)


def _kernel(n_perms, absorb_ref, mask_ref, rc_f_ref, fc_ref, mats_p_ref,
            pc_ref, rc_s_ref, mds_ref, init_ref, out_ref):
    B = absorb_ref.shape[-1]
    mds = mds_ref[:]
    init_mat = init_ref[:]

    def permute(st):
        def full_round(r, st, rc_ref):
            rc = rc_ref[r]                                # (2, 12, 1)
            st = gl.add(st, (rc[0], rc[1]))
            st = _sbox_all(st)
            return _linear(st, mds)

        def first(r, st):
            return full_round(r, st, rc_f_ref)

        def second(r, st):
            return full_round(r, st, rc_s_ref)

        st = jax.lax.fori_loop(0, HALF_FULL, first, st)

        fc = fc_ref[:]                                    # (2, 12, 1)
        st = gl.add(st, (fc[0], fc[1]))
        st = _linear(st, init_mat)

        def partial(r, st):
            pc = pc_ref[r]                                # (2, 1)
            s0 = (st[0][0:1], st[1][0:1])                 # (1, B)
            s0 = pgl._sbox(s0)
            s0 = gl.add(s0, (pc[0:1], pc[1:2]))
            st = (jnp.concatenate([s0[0], st[0][1:]], axis=0),
                  jnp.concatenate([s0[1], st[1][1:]], axis=0))
            return _linear(st, mats_p_ref[r])

        st = jax.lax.fori_loop(0, N_PARTIAL, partial, st)
        return jax.lax.fori_loop(0, HALF_FULL, second, st)

    def step(p, st):
        blk = absorb_ref[p]                               # (2, 8, B)
        m = mask_ref[p]                                   # (8, 1)
        sel = m.astype(bool)
        lo = jnp.concatenate(
            [jnp.where(sel, blk[0], st[0][:RATE]), st[0][RATE:]], axis=0)
        hi = jnp.concatenate(
            [jnp.where(sel, blk[1], st[1][:RATE]), st[1][RATE:]], axis=0)
        st = permute((lo, hi))
        out_ref[p, 0] = st[0]
        out_ref[p, 1] = st[1]
        return st

    st = (jnp.zeros((WIDTH, B), _U32), jnp.zeros((WIDTH, B), _U32))
    jax.lax.fori_loop(0, n_perms, step, st)


@functools.lru_cache(maxsize=8)
def _transcript_compiled(n_perms, B, interpret):
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except ImportError:  # pragma: no cover
        vmem = None

    K = _kernel_consts()
    consts = [K["rc_first"], K["first_const"], K["mats_partial"],
              K["part_c"], K["rc_second"], K["mds"], K["init_mat"]]
    kw = {"memory_space": vmem} if vmem is not None else {}

    def spec(shape):
        zeros = (0,) * len(shape)
        return pl.BlockSpec(shape, lambda *_, _z=zeros: _z, **kw)

    in_specs = ([spec((n_perms, 2, RATE, B)), spec((n_perms, RATE, 1))]
                + [spec(c.shape) for c in consts])
    out_spec = spec((n_perms, 2, WIDTH, B))

    fn = pl.pallas_call(
        functools.partial(_kernel, n_perms),
        out_shape=jax.ShapeDtypeStruct((n_perms, 2, WIDTH, B), _U32),
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=bool(interpret),
    )

    def run(absorb, mask):
        return fn(absorb, mask, *[jnp.asarray(c) for c in consts])

    return jax.jit(run)


def run_transcript_kernel(schedule, obs, pi_hash, interpret=False):
    """Drop-in device path for challenger.run_transcript.

    obs: GL pair (B, n_obs); pi_hash: GL pair (B, 4).
    Returns stacked states as a GL pair of shape (n_perms, B, 12).
    """
    off = schedule.pi_hash_offset
    lo = jax.lax.dynamic_update_slice_in_dim(obs[0], pi_hash[0], off, axis=-1)
    hi = jax.lax.dynamic_update_slice_in_dim(obs[1], pi_hash[1], off, axis=-1)

    B = obs[0].shape[0]
    n_perms = schedule.n_perms
    g = schedule.gather_idx.reshape(-1)                   # (n_perms*8,)
    # ONE gather outside the kernel: (B, n_perms*8) -> (n_perms, 8, B)
    blk_lo = jnp.moveaxis(lo[:, g].reshape(B, n_perms, RATE), 0, -1)
    blk_hi = jnp.moveaxis(hi[:, g].reshape(B, n_perms, RATE), 0, -1)
    absorb = jnp.stack([blk_lo, blk_hi], axis=1)          # (n_perms,2,8,B)
    mask = jnp.asarray(schedule.mask.astype(np.uint32))[..., None]

    pad = (-B) % 128
    if pad:
        absorb = jnp.pad(absorb, ((0, 0), (0, 0), (0, 0), (0, pad)))
    states = _transcript_compiled(n_perms, B + pad, interpret)(absorb, mask)
    states = states[..., :B]                              # (n_perms,2,12,B)
    return (jnp.moveaxis(states[:, 0], -1, 1),
            jnp.moveaxis(states[:, 1], -1, 1))            # (n_perms, B, 12)
