"""Pallas TPU kernel: Poseidon-BN254 permutation with MXU linear layers.

Second-generation kernel (first: poseidon_bn254_pallas.py).  The insight:
every multiplication in Poseidon's linear layers (the 4x4 MDS mix, the
p-matrix mix, and the partial-round sparse updates; reference
poseidon/bn254.go:130-169, 194-208) is by a *constant* field element, and
multiplication by a constant is linear over the input's limb decomposition:

    c * x mod p  =  sum_k x_byte[k] * ((c * 2^(8k)) mod p)

Stacking the width-4 state's 4x32 byte-limbs into one 128-vector, an entire
round's linear layer becomes ONE exact 128x128 matmul on the MXU systolic
array:

    out_bytes[i*32+m] = sum_{j,k} x_byte[j*32+k] * byte_m(c_{j,i} 2^(8k) mod p)

with bf16 inputs (all values < 256, exactly representable) and f32
accumulation (column sums < 128*255*255 < 2^24, exact).  One batched
Montgomery reduction (REDC, no product accumulation) brings the redundant
columns back to clean 16-bit limbs < 2p.  Matrix entries are Montgomery-
domain constants, so REDC's R^-1 restores the domain; identity terms in the
partial-round sparse map use coefficient mont(1) = R mod p.

Versus the CIOS kernel this removes ALL multi-product CIOS passes from the
mix layers (the VPU keeps only the x^5 S-box chains and the REDC carry
arithmetic); the matmuls ride the otherwise-idle MXU.  Output is bit-exact
with hash/poseidon_bn254._permute_jnp (canonical < p limbs).

Layout conventions (host builder + kernel must agree):
  - input rows per element j: [limb0..15 low byte | limb0..15 high byte]
    (j*32+r = low byte of limb r; j*32+16+r = high byte), so the kernel
    builds them with two cheap masks and a concatenate -- no interleave.
  - output rows use the same convention, so 16-bit columns are recovered
    with one shift-add of two contiguous (16, T) slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import bn254
from ..hash import poseidon_bn254 as pbj
from . import poseidon_bn254_pallas as ck  # CIOS kernel: shared limb ops

NUM_LIMBS = bn254.NUM_LIMBS
LIMB_BITS = bn254.LIMB_BITS
_MASK = 0xFFFF
_U32 = jnp.uint32

WIDTH = pbj.WIDTH
FULL_HALF = pbj.FULL_ROUNDS // 2
PARTIAL = pbj.PARTIAL_ROUNDS

LANE_TILE = 512

_N0_INV = np.uint32(bn254.N0_INV)
_P_COL = np.asarray(bn254.P_LIMBS, dtype=np.uint32)[:, None]
_MONT_ONE = bn254.R % bn254.P


# ---------------------------------------------------------------------------
# Host-side constant-matrix builder
# ---------------------------------------------------------------------------

def _byte_rows(v):
    """254-bit int -> 32 bytes in [low bytes of limbs | high bytes] order."""
    out = np.zeros(32, dtype=np.float32)
    for m in range(32):
        b = (v >> (8 * m)) & 0xFF
        row = (m // 2) if m % 2 == 0 else 16 + (m - 1) // 2
        out[row] = b
    return out


def _linear_matrix(coeffs):
    """coeffs[j][i] (mont-domain ints): out_i = sum_j coeffs[j][i] * s_j
    -> (128, 128) bf16 matmul matrix (rows=out bytes, cols=in bytes)."""
    C = np.zeros((128, 128), dtype=np.float32)
    for j in range(WIDTH):
        for i in range(WIDTH):
            c = int(coeffs[j][i])
            if c == 0:
                continue
            for k in range(32):
                v = (c << (8 * k)) % bn254.P
                rows = _byte_rows(v)
                col = j * 32 + ((k // 2) if k % 2 == 0 else 16 + (k - 1) // 2)
                C[i * 32:(i + 1) * 32, col] = rows
    return C.astype(jnp.bfloat16)


@functools.lru_cache(maxsize=1)
def _mxu_consts():
    from ..hash import poseidon_bn254_constants as K
    CIOS = pbj._Consts.get()

    m = K.M_MATRIX_MONT   # [j][i] mont ints
    p = K.P_MATRIX_MONT
    s = K.S_CONSTANTS_MONT

    m_mat = _linear_matrix(m)
    p_mat = _linear_matrix(p)
    # first half: rounds 0..2 mMatrix, round 3 pMatrix
    mats_first = np.stack([m_mat, m_mat, m_mat, p_mat])       # (4, 128, 128)
    mats_second = np.stack([m_mat] * FULL_HALF)

    # partial round r linear map (reference poseidon/bn254.go:150-168):
    #   out_0 = sum_j srow[j] * st_j
    #   out_k = st_k + scol[k-1] * st_0       (k = 1..3)
    mats_partial = []
    for r in range(PARTIAL):
        srow = [s[(WIDTH * 2 - 1) * r + j] for j in range(WIDTH)]
        scol = [s[(WIDTH * 2 - 1) * r + WIDTH + k - 1] for k in range(1, WIDTH)]
        A = [[0] * WIDTH for _ in range(WIDTH)]   # A[j][i]
        for j in range(WIDTH):
            A[j][0] = srow[j]
        for k in range(1, WIDTH):
            A[k][k] = _MONT_ONE
            A[0][k] = scol[k - 1]
        mats_partial.append(_linear_matrix(A))
    mats_partial = np.stack(mats_partial)                     # (56, 128, 128)

    return dict(
        ark0=np.asarray(CIOS["ark0"])[..., None],             # (4, 16, 1)
        arks_first=np.asarray(CIOS["ark_first"])[..., None],  # (4, 4, 16, 1)
        arks_second=np.asarray(CIOS["ark_second"])[..., None],
        part_c=np.asarray(CIOS["part_c"])[..., None],         # (56, 16, 1)
        mats_first=np.asarray(mats_first),
        mats_second=np.asarray(mats_second),
        mats_partial=np.asarray(mats_partial),
    )


# ---------------------------------------------------------------------------
# In-kernel helpers
# ---------------------------------------------------------------------------

def _to_byte_rows(s):
    """list of 4 clean (16, T) u32 limb planes -> (128, T) bf16 byte rows."""
    rows = []
    for x in s:
        rows.append(x & 0xFF)          # low bytes  (16, T)
        rows.append(x >> 8)            # high bytes (16, T)
    cat = jnp.concatenate(rows, axis=0)                       # (128, T)
    # Mosaic has no u32->f32 cast; byte values < 256 are i32-safe
    return cat.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _redc(v16, p_col):
    """Montgomery reduction of redundant base-2^16 columns (16, T) u32
    (value < 2^15 * p, columns < 2^31.1) -> clean limbs of value*R^-1 mod p,
    < 2p.  Same column/shift discipline as the CIOS kernel, minus the
    product accumulation."""
    T = v16.shape[-1]
    z1 = jnp.zeros((1, T), _U32)
    t = jnp.concatenate([v16, z1], 0)                         # (17, T)
    for _ in range(NUM_LIMBS):
        m = (t[0:1] * _N0_INV) & _MASK
        q = m * p_col                                         # (16, T)
        t = (t + jnp.concatenate([q & _MASK, z1], 0)
             + jnp.concatenate([z1, q >> LIMB_BITS], 0))
        carry0 = t[0:1] >> LIMB_BITS
        t = jnp.concatenate([t[1:2] + carry0, t[2:], z1], 0)
    return ck._carry(t)


def _linear_layer(s, mat, p_col):
    """Full linear layer: 4 elements < 2p in, 4 elements < 2p out, via one
    MXU matmul + one lane-batched REDC."""
    xb = _to_byte_rows(s)                                     # (128, T) bf16
    y = jax.lax.dot_general(
        mat, xb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (128, T) f32
    yi = y.astype(jnp.int32).astype(_U32)
    v16 = [yi[i * 32:i * 32 + 16] + (yi[i * 32 + 16:i * 32 + 32] << 8)
           for i in range(WIDTH)]                             # 4 x (16, T)
    red = _redc(jnp.concatenate(v16, axis=-1), p_col)         # (16, 4T)
    T = s[0].shape[-1]
    return [red[:, i * T:(i + 1) * T] for i in range(WIDTH)]


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

def _kernel(p_ref, ark0_ref, arks_f_ref, part_c_ref, arks_s_ref,
            mats_f_ref, mats_p_ref, mats_s_ref, state_ref, out_ref):
    p_col = p_ref[:]
    T = state_ref.shape[-1]
    z1 = jnp.zeros((1, T), _U32)

    def add_ark0(x, ark):
        return ck._carry(jnp.concatenate([x + ark, z1], 0))

    s = [add_ark0(state_ref[j], ark0_ref[j]) for j in range(WIDTH)]

    def full_round(r, s, arks_ref, mats_ref):
        ark = arks_ref[r]
        # _exp5_ark output < 2p but only *clean* after its cond_sub; REDC
        # wants clean inputs for the byte split -- _exp5_ark provides that.
        # (A lane-batched 4-in-1 S-box variant measured NEUTRAL here --
        # the kernel is VPU-throughput-bound, not instruction-issue-bound,
        # so fewer/wider ops buy nothing; see BASELINE.md roofline.)
        s = [ck._exp5_ark(x, ark[j], p_col) for j, x in enumerate(s)]
        return _linear_layer(s, mats_ref[r], p_col)

    def first_half(r, s):
        return full_round(r, s, arks_f_ref, mats_f_ref)

    def second_half(r, s):
        return full_round(r, s, arks_s_ref, mats_s_ref)

    def partial_round(r, s):
        s0 = ck._exp5_ark(s[0], part_c_ref[r], p_col)
        return _linear_layer([s0] + s[1:], mats_p_ref[r], p_col)

    s = jax.lax.fori_loop(0, FULL_HALF, first_half, s)
    s = jax.lax.fori_loop(0, PARTIAL, partial_round, s)
    s = jax.lax.fori_loop(0, FULL_HALF, second_half, s)
    for j in range(WIDTH):
        out_ref[j] = ck._cond_sub(s[j], ck._P_INT_LIMBS)


@functools.lru_cache(maxsize=16)
def _permute_lanes_compiled(n_lanes, interpret):
    from jax.experimental import pallas as pl
    try:
        from jax.experimental.pallas import tpu as pltpu
        vmem = pltpu.VMEM
    except ImportError:  # pragma: no cover
        vmem = None

    K = _mxu_consts()
    consts = [_P_COL, K["ark0"], K["arks_first"], K["part_c"],
              K["arks_second"], K["mats_first"], K["mats_partial"],
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
