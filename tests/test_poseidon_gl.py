"""Poseidon-Goldilocks permutation + sponge tests.

Golden vectors: zero-state permutation (reference poseidon/goldilocks_test.go:47-58)
and the public-inputs-hash sponge vector (reference
poseidon/public_inputs_hash_test.go:53-58).
"""
import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.fields import goldilocks as gl
from plonky2_tpu.hash import poseidon_gl as pgl

_permute = jax.jit(pgl.permute)


def pack(vals):
    vals = np.asarray(vals, dtype=np.uint64)
    return (jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32)),
            jnp.asarray((vals >> np.uint64(32)).astype(np.uint32)))


def unpack(a):
    lo = np.asarray(a[0], dtype=np.uint64)
    hi = np.asarray(a[1], dtype=np.uint64)
    return lo | (hi << np.uint64(32))


ZERO_PERM_OUT = [
    4330397376401421145, 14124799381142128323, 8742572140681234676,
    14345658006221440202, 15524073338516903644, 5091405722150716653,
    15002163819607624508, 2047012902665707362, 16106391063450633726,
    4680844749859802542, 15019775476387350140, 1698615465718385111,
]


def test_permute_zero_vector():
    state = pack(np.zeros((12,), dtype=np.uint64))
    out = unpack(_permute(state))
    assert out.tolist() == ZERO_PERM_OUT


def test_permute_batched():
    st = pack(np.zeros((3, 12), dtype=np.uint64))
    out = unpack(_permute(st))
    for b in range(3):
        assert out[b].tolist() == ZERO_PERM_OUT


def test_public_inputs_hash_vector():
    inputs = pack(np.array([0, 1, 3736710860384812976], dtype=np.uint64))
    out = unpack(jax.jit(pgl.hash_no_pad)(inputs))
    assert out.tolist() == [8416658900775745054, 12574228347150446423,
                            9629056739760131473, 3119289788404190010]


def test_hash_empty():
    inputs = pack(np.zeros((0,), dtype=np.uint64))
    out = unpack(jax.jit(pgl.hash_no_pad)(inputs))
    assert out.tolist() == [0, 0, 0, 0]


def test_hash_multi_chunk():
    """>8 inputs exercises multiple absorb chunks; checked against a direct
    python model of the sponge using the permutation above."""
    vals = np.arange(1, 20, dtype=np.uint64)
    out = unpack(jax.jit(pgl.hash_no_pad)(pack(vals)))

    state = np.zeros(12, dtype=np.uint64)
    i = 0
    while i < len(vals):
        k = min(8, len(vals) - i)
        state[:k] = vals[i:i + k]
        state = unpack(_permute(pack(state)))
        i += 8
    assert out.tolist() == state[:4].tolist()
