"""Parity tests: Pallas kernels vs the portable jnp implementations.

Kernels run in interpret mode on CPU here; on TPU hardware the same kernel
code is the production path (hash/poseidon_bn254.permute dispatch).
"""
import numpy as np
import jax.numpy as jnp

from plonky2_tpu.fields import bn254
from plonky2_tpu.hash import poseidon_bn254 as pbj
from plonky2_tpu.kernels import poseidon_bn254_pallas as pk


def _random_states(n, seed=0):
    rng = np.random.default_rng(seed)
    state = np.zeros((n, 4, 16), np.uint32)
    ints = rng.integers(0, 1 << 62, size=(n, 4))
    # include boundary values: 0, 1, p-1
    ints[0, :3] = [0, 1, 0]
    state_ints = ints.tolist()
    state_ints[0][2] = bn254.P - 1
    for i in range(n):
        for j in range(4):
            state[i, j] = bn254.int_to_mont_limbs(int(state_ints[i][j]))
    return jnp.asarray(state)


def test_poseidon_bn254_kernel_matches_jnp():
    st = _random_states(5)
    ref = np.asarray(pbj._permute_jnp(st))
    got = np.asarray(pk.permute(st, interpret=True))
    assert np.array_equal(ref, got)


def test_poseidon_bn254_kernel_batched_shapes():
    st = _random_states(6).reshape(3, 2, 4, 16)
    ref = np.asarray(pbj._permute_jnp(st))
    got = np.asarray(pk.permute(st, interpret=True))
    assert np.array_equal(ref, got)


def test_poseidon_bn254_mxu_kernel_matches_jnp():
    """MXU kernel (matmul linear layers) must be bit-exact with the jnp
    path -- the bf16 matmul is exact because inputs are bytes (< 256) and
    f32-accumulated column sums stay < 2^24."""
    from plonky2_tpu.kernels import poseidon_bn254_mxu as mk
    st = _random_states(5, seed=7)
    ref = np.asarray(pbj._permute_jnp(st))
    got = np.asarray(mk.permute(st, interpret=True))
    assert np.array_equal(ref, got)


def test_poseidon_bn254_mxu_kernel_batched_shapes():
    from plonky2_tpu.kernels import poseidon_bn254_mxu as mk
    st = _random_states(6, seed=8).reshape(3, 2, 4, 16)
    ref = np.asarray(pbj._permute_jnp(st))
    got = np.asarray(mk.permute(st, interpret=True))
    assert np.array_equal(ref, got)


def test_transcript_kernel_matches_jnp_scan():
    """The one-launch Pallas transcript kernel must reproduce the jnp scan
    path bit-exactly on a real schedule (decode_block: 125 permutations)."""
    from plonky2_tpu.proof.spec import load_circuit_spec
    from plonky2_tpu.transcript import challenger as chal
    from plonky2_tpu.kernels import poseidon_gl_pallas as gk
    from plonky2_tpu import verifier

    spec = load_circuit_spec("testdata/decode_block/common_circuit_data.json")
    schedule = chal.build_schedule(spec)
    B = 2
    rng = np.random.default_rng(3)
    obs = verifier._split_u64(
        rng.integers(0, chal.gl.P, size=(B, schedule.n_obs), dtype=np.uint64))
    pi = verifier._split_u64(
        rng.integers(0, chal.gl.P, size=(B, 4), dtype=np.uint64))

    ref = chal._run_transcript_jnp(schedule, obs, pi)
    got = gk.run_transcript_kernel(schedule, obs, pi, interpret=True)
    assert np.array_equal(np.asarray(ref[0]), np.asarray(got[0]))
    assert np.array_equal(np.asarray(ref[1]), np.asarray(got[1]))
