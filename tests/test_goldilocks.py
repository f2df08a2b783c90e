"""Goldilocks base-field and quadratic-extension tests.

Property-tests the uint32-limb arithmetic against python big-int ground truth
and pins the reference's golden vectors
(reference goldilocks/quadratic_extension_test.go:25-94).
"""
import numpy as np
import jax.numpy as jnp

from plonky2_tpu.fields import goldilocks as gl
from plonky2_tpu.fields import goldilocks_ext as qe

P = gl.P
RNG = np.random.default_rng(0xC0FFEE)

EDGE = np.array([0, 1, 2, P - 1, P - 2, (1 << 32) - 1, 1 << 32, (1 << 32) + 1,
                 P - (1 << 32), 7, gl.DTH_ROOT, gl.POWER_OF_TWO_GENERATOR],
                dtype=np.uint64)


def rand_elems(n):
    vals = RNG.integers(0, P, size=n, dtype=np.uint64)
    return np.concatenate([EDGE, vals])


def pack(vals):
    vals = np.asarray(vals, dtype=np.uint64)
    return (jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((vals >> np.uint64(32)).astype(np.uint32)))


def unpack(a):
    lo = np.asarray(a[0], dtype=np.uint64)
    hi = np.asarray(a[1], dtype=np.uint64)
    return lo | (hi << np.uint64(64 - 32))


def test_add_sub_neg():
    x = rand_elems(500)
    y = np.flip(rand_elems(500))
    a, b = pack(x), pack(y)
    assert (unpack(gl.add(a, b)) == (x.astype(object) + y.astype(object)) % P).all()
    assert (unpack(gl.sub(a, b)) == (x.astype(object) - y.astype(object)) % P).all()
    assert (unpack(gl.neg(a)) == (-x.astype(object)) % P).all()


def test_mul():
    x = rand_elems(500)
    y = np.flip(rand_elems(500))
    got = unpack(gl.mul(pack(x), pack(y)))
    want = (x.astype(object) * y.astype(object)) % P
    assert (got == want).all()


def test_mul_const():
    x = rand_elems(100)
    for c in [0, 1, 7, 25, gl.DTH_ROOT, P - 1, (1 << 48) + 12345]:
        got = unpack(gl.mul_const(pack(x), c))
        want = (x.astype(object) * c) % P
        assert (got == want).all(), c


def test_mul_add():
    x, y, z = rand_elems(200), np.flip(rand_elems(200)), np.roll(rand_elems(200), 7)
    got = unpack(gl.mul_add(pack(x), pack(y), pack(z)))
    want = (x.astype(object) * y.astype(object) + z.astype(object)) % P
    assert (got == want).all()


def test_big_dot_accumulation():
    """Lazy digit accumulation of a long inner product."""
    n = 300
    x = RNG.integers(0, P, size=n, dtype=np.uint64)
    y = RNG.integers(0, P, size=n, dtype=np.uint64)
    digits = None
    for i in range(n):
        d = gl.mul_digits(pack(np.array([x[i]])), pack(np.array([y[i]])))
        digits = d if digits is None else gl.add_digits(digits, d)
    got = unpack(gl.reduce_digits(digits))[0]
    want = sum(int(a) * int(b) for a, b in zip(x, y)) % P
    assert got == want


def test_inv_pow():
    x = rand_elems(50)
    inv = unpack(gl.inv(pack(x)))
    for xi, ii in zip(x, inv):
        if xi == 0:
            assert ii == 0
        else:
            assert (int(xi) * int(ii)) % P == 1
    got = unpack(gl.pow_const(pack(x), 12345))
    want = np.array([pow(int(v), 12345, P) for v in x], dtype=object)
    assert (got == want).all()


def test_bits_roundtrip():
    x = rand_elems(50)
    bits = gl.to_bits(pack(x), 64)
    assert len(bits) == 64
    back = unpack(gl.from_bits(bits))
    assert (back == x).all()


def test_roots_of_unity():
    for nlog in [0, 1, 4, 12, 13, 16]:
        g = gl.primitive_root_of_unity(nlog)
        assert pow(g, 1 << nlog, P) == 1
        if nlog > 0:
            assert pow(g, 1 << (nlog - 1), P) != 1
    sub = gl.two_adic_subgroup(4)
    assert len(sub) == 16 and sub[0] == 1


# ---------------------------------------------------------------------------
# Quadratic extension
# ---------------------------------------------------------------------------

def qe_pack(c0, c1):
    return (pack(np.asarray(c0, dtype=np.uint64)), pack(np.asarray(c1, dtype=np.uint64)))


def qe_unpack(a):
    return unpack(a[0]), unpack(a[1])


def qe_ref_mul(a, b):
    c0 = (a[0] * b[0] + 7 * a[1] * b[1]) % P
    c1 = (a[0] * b[1] + a[1] * b[0]) % P
    return c0, c1


def test_qe_mul_reference_vector():
    # reference goldilocks/quadratic_extension_test.go:25-51
    a = qe_pack([4994088319481652598], [16489566008211790727])
    b = qe_pack([3797605683985595697], [13424401189265534004])
    c0, c1 = qe_unpack(qe.mul(a, b))
    assert c0[0] == 15052319864161058789 and c1[0] == 16841416332519902625


def test_qe_div_reference_vector():
    # reference goldilocks/quadratic_extension_test.go:68-94
    a = qe_pack([4994088319481652598], [16489566008211790727])
    b = qe_pack([7166004739148609569], [14655965871663555016])
    c0, c1 = qe_unpack(qe.div(a, b))
    assert c0[0] == 15052319864161058789 and c1[0] == 16841416332519902625


def test_qe_mul_random():
    n = 100
    a0, a1 = RNG.integers(0, P, n, dtype=np.uint64), RNG.integers(0, P, n, dtype=np.uint64)
    b0, b1 = RNG.integers(0, P, n, dtype=np.uint64), RNG.integers(0, P, n, dtype=np.uint64)
    c0, c1 = qe_unpack(qe.mul(qe_pack(a0, a1), qe_pack(b0, b1)))
    for i in range(n):
        w0, w1 = qe_ref_mul((int(a0[i]), int(a1[i])), (int(b0[i]), int(b1[i])))
        assert c0[i] == w0 and c1[i] == w1


def test_qe_inv_random():
    n = 20
    a0, a1 = RNG.integers(1, P, n, dtype=np.uint64), RNG.integers(0, P, n, dtype=np.uint64)
    a = qe_pack(a0, a1)
    prod = qe.mul(a, qe.inv(a))
    c0, c1 = qe_unpack(prod)
    assert (c0 == 1).all() and (c1 == 0).all()


def test_qe_dot_matches_horner():
    n = 37
    terms = [qe_pack(RNG.integers(0, P, 3, dtype=np.uint64),
                     RNG.integers(0, P, 3, dtype=np.uint64)) for _ in range(n)]
    alpha = qe_pack(RNG.integers(0, P, 3, dtype=np.uint64),
                    RNG.integers(0, P, 3, dtype=np.uint64))
    horner = qe.reduce_with_powers(terms, alpha)
    # powers-and-dot formulation
    powers = [qe.ones((3,))]
    for _ in range(n - 1):
        powers.append(qe.mul(powers[-1], alpha))
    dotted = qe.dot(terms, powers)
    h0, h1 = qe_unpack(horner)
    d0, d1 = qe_unpack(dotted)
    assert (h0 == d0).all() and (h1 == d1).all()


def test_ea_mul():
    def r(): return RNG.integers(0, P, 2, dtype=np.uint64)
    a = (qe_pack(r(), r()), qe_pack(r(), r()))
    b = (qe_pack(r(), r()), qe_pack(r(), r()))

    def as_ints(x):
        return (tuple(int(v) for v in qe_unpack(x[0])[0]), )  # unused

    got = qe.ea_mul(a, b)
    # ground truth via python ints on index 0
    def qv(x, i):
        u = qe_unpack(x)
        return (int(u[0][i]), int(u[1][i]))
    for i in range(2):
        a0, a1, b0, b1 = qv(a[0], i), qv(a[1], i), qv(b[0], i), qv(b[1], i)
        w0 = tuple((x + 7 * y) % P for x, y in zip(qe_ref_mul(a0, b0), qe_ref_mul(a1, b1)))
        w1 = tuple((x + y) % P for x, y in zip(qe_ref_mul(a0, b1), qe_ref_mul(a1, b0)))
        assert qv(got[0], i) == w0 and qv(got[1], i) == w1
