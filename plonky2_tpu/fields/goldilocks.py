"""Goldilocks field arithmetic (p = 2^64 - 2^32 + 1), TPU-native.

Values are represented as pairs ``(lo, hi)`` of ``uint32`` JAX arrays holding
the canonical (< p) 64-bit element.  TPUs have no native 64-bit integer
datapath, so every operation is built from 32-bit lane ops; multiplications
decompose into 16x16->32-bit limb products which the VPU executes natively.
The same code runs under the Pallas TPU kernel language and plain jnp (CPU),
so correctness tests run anywhere and kernels reuse identical math.

Reduction uses the Goldilocks identities 2^64 = 2^32 - 1 and 2^96 = -1
(mod p), folding a <=160-bit accumulation into canonical form with a fixed,
branchless op sequence (cf. reference goldilocks/base.go:196-294, which
instead witnesses quotients via gnark hints -- unnecessary here since we
verify natively).

Unreduced accumulators ("digits") are length-8+ lists of uint32 arrays in a
redundant base-2^16 representation, supporting lazy reduction of inner
products up to 8192 terms (reference's analog: RANGE_CHECK_NB_BITS=144-bit
accumulation bound in goldilocks/base.go:48).
"""

from __future__ import annotations

import jax.numpy as jnp

# Field constants.
P = (1 << 64) - (1 << 32) + 1
EPSILON = (1 << 32) - 1  # 2^64 mod p
MULTIPLICATIVE_GROUP_GENERATOR = 7
TWO_ADICITY = 32
POWER_OF_TWO_GENERATOR = 1753635133440165772
# Quadratic extension parameters (F_p[X]/(X^2 - W)).
W = 7
DTH_ROOT = 18446744069414584320
D = 2

_U32 = jnp.uint32
_MASK16 = 0xFFFF

# Maximum number of mul_digits accumulations before digit overflow:
# each digit < 2^19, capacity 2^32.
MAX_DIGIT_TERMS = 1 << 13


def _u32(x):
    return jnp.asarray(x, dtype=_U32)


# ---------------------------------------------------------------------------
# Construction / conversion
# ---------------------------------------------------------------------------

def from_int(value, shape=()):
    """Constant field element (python int, already canonical or reduced here)."""
    value = int(value) % P
    lo = jnp.full(shape, value & 0xFFFFFFFF, dtype=_U32)
    hi = jnp.full(shape, value >> 32, dtype=_U32)
    return (lo, hi)


def zeros(shape=()):
    return (jnp.zeros(shape, _U32), jnp.zeros(shape, _U32))


def ones(shape=()):
    return (jnp.ones(shape, _U32), jnp.zeros(shape, _U32))


def from_u64_limbs(lo, hi):
    """Wrap existing uint32 arrays (assumed canonical < p)."""
    return (_u32(lo), _u32(hi))


# ---------------------------------------------------------------------------
# 64-bit primitives on (lo, hi) uint32 pairs
# ---------------------------------------------------------------------------

def _add64(a, b):
    """(a + b) mod 2^64 plus carry-out (uint32 0/1)."""
    lo = a[0] + b[0]
    c0 = (lo < a[0]).astype(_U32)
    hi = a[1] + b[1] + c0
    # carry-out of high word: hi wrapped if hi < a[1]+c0 computed carefully.
    h1 = a[1] + b[1]
    c1 = (h1 < a[1]).astype(_U32) | ((h1 + c0) < c0).astype(_U32)
    return lo, hi, c1


def _sub64(a, b):
    """(a - b) mod 2^64 plus borrow-out (uint32 0/1)."""
    lo = a[0] - b[0]
    br0 = (a[0] < b[0]).astype(_U32)
    hi = a[1] - b[1] - br0
    h1 = a[1] - b[1]
    br1 = (a[1] < b[1]).astype(_U32) | (h1 < br0).astype(_U32)
    return lo, hi, br1


def _canon(lo, hi):
    """Reduce r < 2^64 into canonical [0, p): conditionally subtract p once."""
    is_ge = (hi == _u32(0xFFFFFFFF)) & (lo != _u32(0))
    lo = jnp.where(is_ge, lo - _u32(1), lo)
    hi = jnp.where(is_ge, _u32(0), hi)
    return (lo, hi)


def add(a, b):
    """Modular addition of canonical elements."""
    lo, hi, carry = _add64(a, b)
    # 2^64 == EPSILON (mod p); wrapped sum is < 2^64 - 2^33 so +EPSILON
    # cannot carry again.
    lo2 = lo + _u32(EPSILON)
    c2 = (lo2 < lo).astype(_U32)
    lo = jnp.where(carry == 1, lo2, lo)
    hi = jnp.where(carry == 1, hi + c2, hi)
    return _canon(lo, hi)


def sub(a, b):
    """Modular subtraction of canonical elements."""
    lo, hi, borrow = _sub64(a, b)
    # wrapped difference is a - b + 2^64; subtract EPSILON to add p instead.
    lo2 = lo - _u32(EPSILON)
    br2 = (lo < _u32(EPSILON)).astype(_U32)
    lo = jnp.where(borrow == 1, lo2, lo)
    hi = jnp.where(borrow == 1, hi - br2, hi)
    return (lo, hi)


def neg(a):
    return sub(zeros(jnp.shape(a[0])), a)


def eq(a, b):
    return (a[0] == b[0]) & (a[1] == b[1])


def is_zero(a):
    return (a[0] == _u32(0)) & (a[1] == _u32(0))


def select(mask, a, b):
    """mask ? a : b (mask is a bool array broadcastable to the operands)."""
    return (jnp.where(mask, a[0], b[0]), jnp.where(mask, a[1], b[1]))


# ---------------------------------------------------------------------------
# Digit accumulators: redundant base-2^16, uint32 capacity per digit
# ---------------------------------------------------------------------------

def _split16(a):
    """(lo, hi) -> 4 16-bit limbs (as uint32 arrays), little-endian."""
    return (a[0] & _MASK16, a[0] >> 16, a[1] & _MASK16, a[1] >> 16)


def zero_digits(shape=(), n=8):
    return [jnp.zeros(shape, _U32) for _ in range(n)]


def mul_digits(a, b):
    """Full 128-bit product of two field elements as 8 digit accumulators.

    Each output digit < 2^19, so ~2^13 of these can be summed digit-wise
    before reduction without overflowing uint32.
    """
    al = _split16(a)
    bl = _split16(b)
    digits = [None] * 8
    for i in range(4):
        for j in range(4):
            p = al[i] * bl[j]  # < 2^32, exact in uint32
            lo16, hi16 = p & _MASK16, p >> 16
            k = i + j
            digits[k] = lo16 if digits[k] is None else digits[k] + lo16
            if k + 1 < 8:
                digits[k + 1] = hi16 if digits[k + 1] is None else digits[k + 1] + hi16
    return digits


def mul_const_digits(a, c):
    """Product of element `a` with python-int constant c (< p), as digits."""
    c = int(c) % P
    al = _split16(a)
    cl = [(c >> (16 * k)) & _MASK16 for k in range(4)]
    digits = [None] * 8
    for i in range(4):
        for j in range(4):
            if cl[j] == 0:
                continue
            p = al[i] * _u32(cl[j])
            lo16, hi16 = p & _MASK16, p >> 16
            k = i + j
            digits[k] = lo16 if digits[k] is None else digits[k] + lo16
            if k + 1 < 8:
                digits[k + 1] = hi16 if digits[k + 1] is None else digits[k + 1] + hi16
    shape = jnp.shape(a[0])
    return [d if d is not None else jnp.zeros(shape, _U32) for d in digits]


def add_digits(x, y):
    n = max(len(x), len(y))
    out = []
    for k in range(n):
        if k >= len(x):
            out.append(y[k])
        elif k >= len(y):
            out.append(x[k])
        else:
            out.append(x[k] + y[k])
    return out


def add_to_digits(acc, a):
    """Add a canonical element into a digit accumulator."""
    al = _split16(a)
    out = list(acc)
    for k in range(4):
        out[k] = out[k] + al[k]
    return out


def scale_digits(d, c):
    """Scale digit accumulator by a small python int (caller checks budget)."""
    return [x * _u32(c) for x in d]


def reduce_digits(digits):
    """Fold a digit accumulator (value < 2^160) into a canonical element."""
    # 1. carry-propagate into clean 16-bit digits (append room for carries)
    shape = jnp.shape(digits[0])
    ds = list(digits) + [jnp.zeros(shape, _U32), jnp.zeros(shape, _U32)]
    assert len(ds) <= 10, "accumulation too wide for reduce_digits"
    while len(ds) < 10:
        ds.append(jnp.zeros(shape, _U32))
    carry = jnp.zeros(shape, _U32)
    clean = []
    for d in ds:
        t = d + carry
        clean.append(t & _MASK16)
        carry = t >> 16
    # value < 2^160 by contract, so no residual carry remains.

    # 2. 32-bit words w0..w4
    w = [clean[2 * k] | (clean[2 * k + 1] << 16) for k in range(5)]

    # 3. x == lo64 + w2*(2^32-1) - w3 - w4*2^32  (mod p)
    #    compute S = lo64 + w2*EPSILON + (2p - w3 - w4*2^32) in 3 words.
    # w2 * EPSILON = (w2 << 32) - w2:
    e_lo = _u32(0) - w[2]
    e_hi = w[2] - (w[2] != _u32(0)).astype(_U32)
    # T = 2p - (w3 + w4*2^32); 2p = 0x1_FFFF_FFFE_0000_0002
    t0 = _u32(2) - w[3]
    tb0 = (_u32(2) < w[3]).astype(_U32)
    t1 = _u32(0xFFFFFFFE) - w[4] - tb0
    tb1 = ((_u32(0xFFFFFFFE) < w[4])
           | ((_u32(0xFFFFFFFE) - w[4]) < tb0)).astype(_U32)
    t2 = _u32(1) - tb1
    # S = (w0,w1,0) + (e_lo,e_hi,0) + (t0,t1,t2)
    s0 = w[0] + e_lo
    c0 = (s0 < w[0]).astype(_U32)
    s0 = s0 + t0
    c0 = c0 + (s0 < t0).astype(_U32)
    s1a = w[1] + e_hi
    c1 = (s1a < w[1]).astype(_U32)
    s1b = s1a + t1
    c1 = c1 + (s1b < t1).astype(_U32)
    s1 = s1b + c0
    c1 = c1 + (s1 < c0).astype(_U32)
    s2 = t2 + c1  # <= 3 + carries, small

    # 4. fold s2 * 2^64 == s2 * EPSILON: r = (s0, s1) + s2*EPSILON
    # s2*EPSILON = (s2 << 32) - s2, split into words (s2 is small):
    f_lo = s2 * _u32(0xFFFFFFFF)  # wraps: equals (s2*EPSILON) mod 2^32
    f_hi = s2 - (s2 != _u32(0)).astype(_U32)
    r_lo = s0 + f_lo
    rc = (r_lo < s0).astype(_U32)
    r_hi = s1 + f_hi + rc
    # carry out of r_hi: possible single wrap of 2^64 -> add EPSILON once more.
    h = s1 + f_hi
    rc2 = (h < s1).astype(_U32) | ((h + rc) < rc).astype(_U32)
    r_lo2 = r_lo + _u32(EPSILON)
    rc3 = (r_lo2 < r_lo).astype(_U32)
    r_lo = jnp.where(rc2 == 1, r_lo2, r_lo)
    r_hi = jnp.where(rc2 == 1, r_hi + rc3, r_hi)

    return _canon(r_lo, r_hi)


# ---------------------------------------------------------------------------
# Multiplication and friends
# ---------------------------------------------------------------------------

def mul(a, b):
    return reduce_digits(mul_digits(a, b))


def mul_const(a, c):
    c = int(c) % P
    if c == 0:
        return zeros(jnp.shape(a[0]))
    if c == 1:
        return a
    return reduce_digits(mul_const_digits(a, c))


def mul_add(a, b, c):
    """a * b + c (mod p)."""
    return reduce_digits(add_to_digits(mul_digits(a, b), c))


def square(a):
    return mul(a, a)


def pow_const(a, e):
    """a ** e for python-int exponent (statically unrolled square&multiply)."""
    e = int(e)
    if e == 0:
        return ones(jnp.shape(a[0]))
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    return result


def _nsquare(a, n):
    """a^(2^n) via a scanned squaring run (compact graph, n sequential)."""
    import jax

    def body(x, _):
        return mul(x, x), None

    out, _ = jax.lax.scan(body, a, None, length=n)
    return out


_P_MINUS_2_BITS_MSB = [(P - 2) >> i & 1 for i in reversed(range(64))]


def inv(a):
    """a^(p-2); returns 0 for input 0 (matches gnark-crypto Inverse hint
    semantics used at reference goldilocks/base.go:316-336).

    One MSB-first square-and-multiply scan over the constant exponent bit
    schedule.  Each inversion call site traces to a single
    square+multiply+select scan body (~1k HLO lines) -- 7x smaller than a
    2^k-1 addition-chain expansion (measured), which dominates compile
    time at the ~7 inversion sites in the FRI/PLONK graphs.  The extra
    ~54 multiplies are runtime noise: inversions sit on small
    latency-bound tensors in both backends."""
    import jax

    bits = jnp.asarray(_P_MINUS_2_BITS_MSB, dtype=jnp.uint32)

    def body(acc, bit):
        acc = mul(acc, acc)
        with_mul = mul(acc, a)
        return select(bit.astype(bool), with_mul, acc), None

    acc, _ = jax.lax.scan(body, ones(jnp.shape(a[0])), bits)
    return acc


# ---------------------------------------------------------------------------
# Stacked-axis (vector) helpers
# ---------------------------------------------------------------------------

def stack(values, axis=-1):
    """List of GL values -> GL array with a new stacked axis."""
    return (jnp.stack([v[0] for v in values], axis=axis),
            jnp.stack([v[1] for v in values], axis=axis))


def concat(arrs, axis=-1):
    return (jnp.concatenate([a[0] for a in arrs], axis=axis),
            jnp.concatenate([a[1] for a in arrs], axis=axis))


def index(a, idx):
    """Apply the same (numpy-style) index to both limb planes."""
    return (a[0][idx], a[1][idx])


def reshape(a, shape):
    return (a[0].reshape(shape), a[1].reshape(shape))


def broadcast_to(a, shape):
    return (jnp.broadcast_to(a[0], shape), jnp.broadcast_to(a[1], shape))


def const_array(values):
    """List/array of python ints -> constant GL array.

    Returns NUMPY (not jnp) limb planes: numpy constants are safe to cache
    and close over across traces (a jnp array created inside a shard_map
    trace is a tracer, and caching it leaks it -- cf. bn254._P_LIMBS_NP)."""
    import numpy as np
    arr = np.asarray([[int(v) % P for v in row] for row in values]
                     if values and isinstance(values[0], (list, tuple))
                     else [int(v) % P for v in values], dtype=np.uint64)
    return ((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (arr >> np.uint64(32)).astype(np.uint32))


def tree_sum(x, axis=-1):
    """Sum a jnp array along an axis via log-depth pairwise adds.

    jnp.sum lowers to an XLA reduce op, which XLA:CPU compiles
    pathologically slowly (minutes) for integer operands produced by fused
    expressions; explicit adds compile instantly and fuse equally well on
    TPU for the small axes used here.

    The odd-length tail folds in with a `where` on an iota mask, NOT a
    concatenate: the XLA:CPU fusion emitter re-executes a concatenate's
    producer subgraph per consumer depth (measured ~100x per level; see
    .claude/skills/verify/SKILL.md), while where/select consumers are
    immune."""
    if axis < 0:
        axis += x.ndim
    n = x.shape[axis]
    if n == 0:
        return jnp.zeros(x.shape[:axis] + x.shape[axis + 1:], x.dtype)
    while n > 1:
        half = n // 2
        lo = jax_slice(x, axis, 0, half)
        hi = jax_slice(x, axis, half, 2 * half)
        s = lo + hi
        if n % 2:
            # fold the odd tail into slot 0 instead of concatenating it
            tail = jax_slice(x, axis, n - 1, n)
            mshape = [1] * x.ndim
            mshape[axis] = half
            mask = jnp.arange(half).reshape(mshape) == 0
            s = jnp.where(mask, s + tail, s)
        n = half
        x = s
    return jnp.squeeze(x, axis=axis)


def jax_slice(x, axis, start, stop):
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, stop)
    return x[tuple(idx)]


def sum_digits_axis(digits, axis):
    """Digit-wise sum of a digit accumulator along an array axis."""
    return [tree_sum(d, axis) for d in digits]


def sum_axis(a, axis=-1):
    """Modular sum of canonical GL array along an axis (lazy digits).

    Safe for up to ~2^13 terms (digit capacity)."""
    d = [tree_sum(a[0] & _MASK16, axis), tree_sum(a[0] >> 16, axis),
         tree_sum(a[1] & _MASK16, axis), tree_sum(a[1] >> 16, axis)]
    return reduce_digits(d)


def matmul_const(x, m_const):
    """x @ M^T for canonical GL array x (..., n) and constant GL matrix
    M (k, n) given as a (lo, hi) pair (from const_array).  Returns (..., k).

    One lazy-digit contraction + one reduction; n may be up to ~2^13."""
    d = mul_digits((x[0][..., None, :], x[1][..., None, :]),
                   (m_const[0], m_const[1]))           # digits of (..., k, n)
    return reduce_digits(sum_digits_axis(d, -1))


def dot(a, b, axis=-1):
    """sum_i a_i * b_i along an axis with one reduction (traced x traced)."""
    return reduce_digits(sum_digits_axis(mul_digits(a, b), axis))


# ---------------------------------------------------------------------------
# Bit manipulation
# ---------------------------------------------------------------------------

def to_bits(a, n):
    """Little-endian bits [0..n) of a canonical element, as uint32 0/1."""
    bits = []
    for i in range(min(n, 32)):
        bits.append((a[0] >> i) & _u32(1))
    for i in range(max(0, n - 32)):
        bits.append((a[1] >> i) & _u32(1))
    return bits


def from_bits(bits):
    """Little-endian 0/1 uint32 arrays -> canonical element (n <= 64 bits)."""
    lo = jnp.zeros(jnp.shape(bits[0]), _U32)
    hi = jnp.zeros(jnp.shape(bits[0]), _U32)
    for i, b in enumerate(bits):
        if i < 32:
            lo = lo | (b << i)
        else:
            hi = hi | (b << (i - 32))
    return (lo, hi)


# ---------------------------------------------------------------------------
# Host-side helpers (python ints; for spec/precompute paths)
# ---------------------------------------------------------------------------

def primitive_root_of_unity(n_log):
    """g_n with g_n^(2^n_log) = 1 (reference goldilocks/base.go:445-454)."""
    assert n_log <= TWO_ADICITY
    res = POWER_OF_TWO_GENERATOR
    for _ in range(TWO_ADICITY - n_log):
        res = (res * res) % P
    return res


def two_adic_subgroup(n_log):
    """[1, g, g^2, ...] of size 2^n_log (reference goldilocks/base.go:456-471)."""
    g = primitive_root_of_unity(n_log)
    out = [1]
    for _ in range((1 << n_log) - 1):
        out.append((out[-1] * g) % P)
    return out


def host_inv(x):
    return pow(int(x), P - 2, P)
