"""Top-level Plonky2 verifier: one jitted program per circuit shape.

Native analog of the reference's VerifierChip.Verify
(verifier/verifier.go:143-170):

    range-check proof        -> done at ingestion (proof/serde.py)
    public-inputs hash       -> Poseidon-GL sponge on device
    GetChallenges            -> statically-scheduled transcript scan
    plonkChip.Verify         -> plonk_checks/vanishing.py
    friChip.VerifyFriProof   -> fri/verify.py

`verify_batch(spec, proofs)` verifies B same-shape proofs at once and
returns a boolean verdict per proof; proof invalidity is data, never an
exception.  The jitted device function is cached per (spec, batch-size).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .fields import goldilocks as gl
from .hash import poseidon_gl as pgl
from .transcript import challenger as chal
from .plonk_checks.vanishing import verify_plonk
from .fri.verify import verify_fri


def _split_u64_np(arr):
    # split in numpy: jnp would silently truncate uint64 with x64 disabled
    arr = np.asarray(arr, dtype=np.uint64)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    return (lo, hi)


def _split_u64(arr):
    lo, hi = _split_u64_np(arr)
    return (jnp.asarray(lo), jnp.asarray(hi))


def proof_to_device_np(proof):
    """Batched numpy serde dict -> pytree of numpy GL/QE limb pairs.

    Kept in numpy so multi-host feeding (parallel/distributed.py) can wrap
    each leaf in a global array without a device round-trip."""
    dev = {}
    for k, v in proof.items():
        if v.dtype == np.uint64:
            if k.startswith("op_") or k == "final_poly" or k.endswith("_evals"):
                # QE arrays (..., n, 2)
                comp0 = _split_u64_np(v[..., 0])
                comp1 = _split_u64_np(v[..., 1])
                dev[k] = (comp0, comp1)
            elif k.endswith("_tovec"):
                continue  # folded into the observed sequence host-side
            else:
                dev[k] = _split_u64_np(v)
        else:
            dev[k] = np.asarray(v)
    return dev


def proof_to_device(proof):
    """Batched numpy serde dict -> device dict with GL/QE limb pairs."""
    return jax.tree.map(jnp.asarray, proof_to_device_np(proof))


def _extract_challenges(schedule, states):
    def one(pos):
        return chal.read_challenge(states, pos)

    def stack(positions):
        vals = [one(p) for p in positions]
        return (jnp.stack([v[0] for v in vals], axis=-1),
                jnp.stack([v[1] for v in vals], axis=-1))

    return {
        "plonk_betas": [one(p) for p in schedule.plonk_betas],
        "plonk_gammas": [one(p) for p in schedule.plonk_gammas],
        "plonk_alphas": [one(p) for p in schedule.plonk_alphas],
        "zeta": chal.read_qe(states, schedule.plonk_zeta),
        "fri_alpha": chal.read_qe(states, schedule.fri_alpha),
        "fri_betas": [chal.read_qe(states, p) for p in schedule.fri_betas],
        "pow_response": one(schedule.fri_pow_response),
        "query_indices": stack(schedule.fri_query_indices),
    }


def _verify_device(spec, schedule, dev, obs, diagnostics=False,
                   query_shard=None):
    """query_shard: optional (mesh_axis_name, n_shards) when the FRI query
    rounds are sharded over a second mesh axis (parallel/mesh.py 2-D path):
    dev's query-axis arrays hold only this shard's rounds, so the
    transcript's full query-index vector is sliced to the local window."""
    B = obs[0].shape[0]
    # public inputs hash (reference verifier/verifier.go:41-43)
    pi_hash = pgl.hash_no_pad(dev["public_inputs"])
    states = chal.run_transcript(schedule, obs, pi_hash)
    challenges = _extract_challenges(schedule, states)
    if query_shard is not None:
        axis_name, n_shards = query_shard
        qi = challenges["query_indices"]
        q_local = qi[0].shape[-1] // n_shards
        start = jax.lax.axis_index(axis_name) * q_local
        challenges = dict(challenges, query_indices=(
            jax.lax.dynamic_slice_in_dim(qi[0], start, q_local, axis=-1),
            jax.lax.dynamic_slice_in_dim(qi[1], start, q_local, axis=-1)))

    # pow_witness hashes to pow_response structurally via the transcript;
    # the leading-zero check happens in verify_fri.
    ones = jnp.ones((B,), bool)
    plonk_ok = verify_plonk(spec, dev, challenges, pi_hash, ones)
    fri_ok = verify_fri(spec, dev, challenges, ones)
    verdict = plonk_ok & fri_ok
    if diagnostics:
        return {"verdict": verdict, "plonk_ok": plonk_ok, "fri_ok": fri_ok}
    return verdict


@functools.lru_cache(maxsize=8)
def _compiled_verifier(spec, batch_size, mode):
    # `mode` captures trace-time env switches (host-math / pallas kernel) so
    # toggling them within one process retraces instead of silently reusing
    # an executable compiled under the other mode.
    schedule = chal.build_schedule(spec)

    def run(dev, obs):
        return _verify_device(spec, schedule, dev, obs)

    return jax.jit(run), schedule


def _mode_key():
    from .hash import poseidon_bn254 as pb
    from .transcript import challenger as chal
    return (pb._use_host_math(), pb._use_pallas(), pb._kernel_impl(),
            chal._use_gl_kernel())


def verify_batch(spec, proof_batch, valid_mask=None):
    """Verify a batched serde dict (leading axis B). Returns (B,) bool.

    valid_mask: optional (B,) bool from quarantined ingestion
    (serde.ingest_batch): lanes that failed structural validation at load
    time are forced to False without aborting the batch."""
    B = proof_batch["pow_witness"].shape[0]
    fn, schedule = _compiled_verifier(spec, B, _mode_key())
    obs_np = chal.build_observed_host(spec, proof_batch)
    obs = _split_u64(obs_np)
    dev = proof_to_device(proof_batch)
    out = np.asarray(fn(dev, obs))
    if valid_mask is not None:
        out = out & np.asarray(valid_mask, dtype=bool)
    return out


def verify_one(spec, proof):
    from .proof.serde import stack_proofs
    return bool(verify_batch(spec, stack_proofs([proof]))[0])
