"""Transcript (Fiat-Shamir) tests against the pinned decode_block challenge
values (reference fri/fri_test.go:36-67)."""
import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.proof.spec import load_circuit_spec
from plonky2_tpu.proof import serde
from plonky2_tpu.transcript import challenger as chal
from plonky2_tpu.hash import poseidon_gl as pgl
from plonky2_tpu.verifier import _split_u64


def u64(a):
    lo = np.asarray(a[0], dtype=np.uint64)
    hi = np.asarray(a[1], dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def test_decode_block_transcript_vectors():
    spec = load_circuit_spec("testdata/decode_block/common_circuit_data.json")
    proof = serde.load_proof(
        spec, "testdata/decode_block/proof_with_public_inputs.json",
        "testdata/decode_block/verifier_only_circuit_data.json")
    batch = serde.stack_proofs([proof])

    schedule = chal.build_schedule(spec)
    obs_np = chal.build_observed_host(spec, batch)
    assert obs_np.shape == (1, schedule.n_obs), (obs_np.shape, schedule.n_obs)
    obs = _split_u64(obs_np)

    pis = _split_u64(batch["public_inputs"])
    run = jax.jit(lambda obs, pis: chal.run_transcript(
        schedule, obs, pgl.hash_no_pad(pis)))
    states = run(obs, pis)

    def rd(pos):
        return int(u64(chal.read_challenge(states, pos))[0])

    assert rd(schedule.plonk_betas[0]) == 17615363392879944733
    assert rd(schedule.plonk_gammas[0]) == 15174493176564484303
    assert rd(schedule.plonk_alphas[0]) == 9276470834414745550
    assert rd(schedule.plonk_zeta[0]) == 3892795992421241388
    assert rd(schedule.fri_alpha[0]) == 885535811531859621
    assert rd(schedule.fri_betas[0][0]) == 5231781384587895507
    assert rd(schedule.fri_pow_response) == 70715523064019
    assert rd(schedule.fri_query_indices[0]) == 11890500485816111017
