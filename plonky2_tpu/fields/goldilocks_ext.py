"""Goldilocks quadratic extension F_p[X]/(X^2 - 7) and the degree-2
extension algebra over it, TPU-native.

A QE value is a pair ``(c0, c1)`` of base elements (each a (lo, hi) uint32
pair); an extension-algebra value is a pair of QE values (elements of
F_{p^2}[Y]/(Y^2 - 7)).  Mirrors the capabilities of reference
goldilocks/quadratic_extension.go and quadratic_extension_algebra.go, but as
straight modular arithmetic (no hints/range proofs) with lazy digit
accumulation inside products.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import goldilocks as gl


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

def from_base(a):
    return (a, gl.zeros(jnp.shape(a[0])))


def from_ints(c0, c1, shape=()):
    return (gl.from_int(c0, shape), gl.from_int(c1, shape))


def zeros(shape=()):
    return (gl.zeros(shape), gl.zeros(shape))


def ones(shape=()):
    return (gl.ones(shape), gl.zeros(shape))


def shape_of(a):
    return jnp.shape(a[0][0])


# ---------------------------------------------------------------------------
# Ring ops
# ---------------------------------------------------------------------------

def add(a, b):
    return (gl.add(a[0], b[0]), gl.add(a[1], b[1]))


def sub(a, b):
    return (gl.sub(a[0], b[0]), gl.sub(a[1], b[1]))


def neg(a):
    return (gl.neg(a[0]), gl.neg(a[1]))


def mul(a, b):
    """(a0 + a1 X)(b0 + b1 X) = (a0 b0 + 7 a1 b1) + (a0 b1 + a1 b0) X."""
    d0 = gl.add_digits(gl.mul_digits(a[0], b[0]),
                       gl.scale_digits(gl.mul_digits(a[1], b[1]), gl.W))
    d1 = gl.add_digits(gl.mul_digits(a[0], b[1]), gl.mul_digits(a[1], b[0]))
    return (gl.reduce_digits(d0), gl.reduce_digits(d1))


def mul_add(a, b, c):
    """a * b + c."""
    d0 = gl.add_digits(gl.mul_digits(a[0], b[0]),
                       gl.scale_digits(gl.mul_digits(a[1], b[1]), gl.W))
    d0 = gl.add_to_digits(d0, c[0])
    d1 = gl.add_digits(gl.mul_digits(a[0], b[1]), gl.mul_digits(a[1], b[0]))
    d1 = gl.add_to_digits(d1, c[1])
    return (gl.reduce_digits(d0), gl.reduce_digits(d1))


def square(a):
    return mul(a, a)


def scalar_mul(a, s):
    """QE times base-field element s."""
    return (gl.mul(a[0], s), gl.mul(a[1], s))


def scalar_mul_const(a, c):
    return (gl.mul_const(a[0], c), gl.mul_const(a[1], c))


def mul_const_qe(a, c0, c1=0):
    """QE times compile-time QE constant (c0, c1)."""
    if c1 == 0:
        return scalar_mul_const(a, c0)
    d0 = gl.add_digits(gl.mul_const_digits(a[0], c0),
                       gl.mul_const_digits(a[1], (gl.W * c1) % gl.P))
    d1 = gl.add_digits(gl.mul_const_digits(a[0], c1),
                       gl.mul_const_digits(a[1], c0))
    return (gl.reduce_digits(d0), gl.reduce_digits(d1))


def dot(a_list, b_list):
    """Sum_i a_i * b_i with a single reduction (<= ~2000 terms)."""
    assert len(a_list) == len(b_list) and a_list
    assert 4 * len(a_list) <= gl.MAX_DIGIT_TERMS
    d0 = None
    d1 = None
    for a, b in zip(a_list, b_list):
        t0 = gl.add_digits(gl.mul_digits(a[0], b[0]),
                           gl.scale_digits(gl.mul_digits(a[1], b[1]), gl.W))
        t1 = gl.add_digits(gl.mul_digits(a[0], b[1]), gl.mul_digits(a[1], b[0]))
        d0 = t0 if d0 is None else gl.add_digits(d0, t0)
        d1 = t1 if d1 is None else gl.add_digits(d1, t1)
    return (gl.reduce_digits(d0), gl.reduce_digits(d1))


def exp_const(a, e):
    """a ** e for python-int exponent."""
    e = int(e)
    if e == 0:
        return ones(shape_of(a))
    result = None
    base = a
    while e:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = mul(base, base)
    return result


def inv(a):
    """Inverse via the conjugate trick: a^-1 = conj(a) / N(a) where
    conj(a) = a^p = (a0, DTH_ROOT * a1) and N(a) = a * conj(a) is in the base
    field (reference goldilocks/quadratic_extension.go:123-134).
    Returns 0 for input 0."""
    conj = (a[0], gl.mul_const(a[1], gl.DTH_ROOT))
    # norm = (a * conj)[0]; the X-coefficient is 0 by construction.
    norm = gl.reduce_digits(
        gl.add_digits(gl.mul_digits(a[0], conj[0]),
                      gl.scale_digits(gl.mul_digits(a[1], conj[1]), gl.W)))
    norm_inv = gl.inv(norm)
    return scalar_mul(conj, norm_inv)


def div(a, b):
    return mul(a, inv(b))


def is_zero(a):
    return gl.is_zero(a[0]) & gl.is_zero(a[1])


def eq(a, b):
    return gl.eq(a[0], b[0]) & gl.eq(a[1], b[1])


def select(mask, a, b):
    return (gl.select(mask, a[0], b[0]), gl.select(mask, a[1], b[1]))


def reduce_with_powers(terms, alpha):
    """Horner: sum_i terms[i] * alpha^i (reference quadratic_extension.go:177-193)."""
    if len(terms) > 8:
        return horner(stack(terms, axis=-1), alpha)
    acc = zeros(shape_of(terms[0]))
    for t in reversed(terms):
        acc = mul_add(acc, alpha, t)
    return acc


# ---------------------------------------------------------------------------
# Stacked-axis (vector) helpers: a "QE array" is the same pair-of-pairs
# structure with an extra trailing element axis on every component.  All the
# elementwise ring ops above already work on such arrays; these helpers cover
# construction, indexing, and the sequential chains (Horner, powers) which
# compile to a single small lax.scan body instead of an unrolled graph.
# ---------------------------------------------------------------------------

def stack(values, axis=-1):
    return (gl.stack([v[0] for v in values], axis),
            gl.stack([v[1] for v in values], axis))


def concat(arrs, axis=-1):
    return (gl.concat([a[0] for a in arrs], axis),
            gl.concat([a[1] for a in arrs], axis))


def index(a, idx):
    """Apply the same (numpy-style) index to all four limb planes."""
    return (gl.index(a[0], idx), gl.index(a[1], idx))


def reshape(a, shape):
    return (gl.reshape(a[0], shape), gl.reshape(a[1], shape))


def broadcast_to(a, shape):
    return (gl.broadcast_to(a[0], shape), gl.broadcast_to(a[1], shape))


def unstack(a):
    """QE array (..., n) -> list of n QE values."""
    n = a[0][0].shape[-1]
    return [index(a, (Ellipsis, i)) for i in range(n)]


def horner(terms, x):
    """sum_i terms[..., i] * x^i over the last axis, via lax.scan.

    terms: QE array (..., n); x: QE broadcastable to (...)."""
    import jax

    def to_front(c):
        return jnp.moveaxis(c, -1, 0)[::-1]

    seq = ((to_front(terms[0][0]), to_front(terms[0][1])),
           (to_front(terms[1][0]), to_front(terms[1][1])))
    acc0 = zeros(jnp.broadcast_shapes(terms[0][0].shape[:-1],
                                      jnp.shape(x[0][0])))

    def body(acc, t):
        return mul_add(acc, x, t), None

    acc, _ = jax.lax.scan(body, acc0, seq)
    return acc


def powers(x, n):
    """[x^0, .., x^(n-1)] as a QE array (..., n), via lax.scan."""
    import jax

    def body(p, _):
        return mul(p, x), p

    _, ps = jax.lax.scan(body, ones(shape_of(x)), None, length=n)

    def to_back(c):
        return jnp.moveaxis(c, 0, -1)

    return ((to_back(ps[0][0]), to_back(ps[0][1])),
            (to_back(ps[1][0]), to_back(ps[1][1])))


def prod_axis(a, axis=-1):
    """Product along the last axis via log-depth pairwise folding.

    Requires the axis length to be known statically; pads odd lengths
    with ones."""
    assert axis == -1
    n = a[0][0].shape[-1]
    while n > 1:
        if n % 2:
            a = concat([a, ones(a[0][0].shape[:-1] + (1,))], axis=-1)
            n += 1
        a = mul(index(a, (Ellipsis, slice(0, None, 2))),
                index(a, (Ellipsis, slice(1, None, 2))))
        n //= 2
    return index(a, (Ellipsis, 0))


def sum_axis(a, axis=-1):
    """Modular sum along an axis (lazy digit accumulation, one reduction)."""
    return (gl.sum_axis(a[0], axis), gl.sum_axis(a[1], axis))


def mul_const_arr(a, const_arr):
    """QE array (..., n) times a constant base-field array (n,) elementwise.

    const_arr: (lo, hi) from gl.const_array."""
    def comp(c):
        return gl.reduce_digits(gl.mul_digits(c, const_arr))
    return (comp(a[0]), comp(a[1]))


def matmul_const(x, m_const):
    """x @ M^T per QE component: x (..., n) QE, M (k, n) constant base-field
    matrix from gl.const_array.  Returns QE (..., k)."""
    return (gl.matmul_const(x[0], m_const), gl.matmul_const(x[1], m_const))


def dot_alpha(evals, apows):
    """sum_i evals[..., i] * apows[..., i] -> QE (...): one lazy contraction.

    evals, apows: QE arrays with matching/broadcastable shapes."""
    a, b = evals, apows
    d0 = gl.add_digits(gl.mul_digits(a[0], b[0]),
                       gl.scale_digits(gl.mul_digits(a[1], b[1]), gl.W))
    d1 = gl.add_digits(gl.mul_digits(a[0], b[1]), gl.mul_digits(a[1], b[0]))
    return (gl.reduce_digits(gl.sum_digits_axis(d0, -1)),
            gl.reduce_digits(gl.sum_digits_axis(d1, -1)))


# ---------------------------------------------------------------------------
# Extension algebra: degree-2 polynomials over QE, modulo Y^2 - 7
# (used when gates operate on extension wires evaluated at an extension point;
# reference goldilocks/quadratic_extension_algebra.go)
# ---------------------------------------------------------------------------

def ea_from_qe(a):
    return (a, zeros(shape_of(a)))


def ea_zeros(shape=()):
    return (zeros(shape), zeros(shape))


def ea_ones(shape=()):
    return (ones(shape), zeros(shape))


def ea_add(a, b):
    return (add(a[0], b[0]), add(a[1], b[1]))


def ea_sub(a, b):
    return (sub(a[0], b[0]), sub(a[1], b[1]))


def ea_mul(a, b):
    """(a0 + a1 Y)(b0 + b1 Y) mod (Y^2 - 7)."""
    c0 = add(mul(a[0], b[0]), scalar_mul_const(mul(a[1], b[1]), gl.W))
    c1 = add(mul(a[0], b[1]), mul(a[1], b[0]))
    return (c0, c1)


def ea_scalar_mul(s, a):
    """QE scalar s times extension-algebra a."""
    return (mul(s, a[0]), mul(s, a[1]))
