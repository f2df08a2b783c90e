"""Phase-level timing of the verifier on the default device.

Times three separately-jitted programs on the step fixture batch:
transcript (+PI hash), PLONK vanishing check, FRI opening check -- the
phases of reference verifier/verifier.go:143-170 -- so optimization effort
lands where the cycles are.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from plonky2_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp
import numpy as np

from plonky2_tpu.proof.spec import load_circuit_spec
from plonky2_tpu.proof import serde
from plonky2_tpu.transcript import challenger as chal
from plonky2_tpu import verifier
from plonky2_tpu.hash import poseidon_gl as pgl
from plonky2_tpu.plonk_checks.vanishing import verify_plonk
from plonky2_tpu.fri.verify import verify_fri

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
name = os.environ.get("BENCH_FIXTURE", "step")
B = int(os.environ.get("BENCH_BATCH", "32"))

spec = load_circuit_spec(f"{root}/testdata/{name}/common_circuit_data.json")
proof = serde.load_proof(
    spec, f"{root}/testdata/{name}/proof_with_public_inputs.json",
    f"{root}/testdata/{name}/verifier_only_circuit_data.json")
batch = serde.stack_proofs([proof] * B)

schedule = chal.build_schedule(spec)
obs = verifier._split_u64(chal.build_observed_host(spec, batch))
dev = verifier.proof_to_device(batch)
dev = jax.device_put(dev)
obs = jax.device_put(obs)


def transcript_phase(dev, obs):
    pi_hash = pgl.hash_no_pad(dev["public_inputs"])
    states = chal.run_transcript(schedule, obs, pi_hash)
    ch = verifier._extract_challenges(schedule, states)
    return pi_hash, ch


def plonk_phase(dev, obs):
    pi_hash, ch = transcript_phase(dev, obs)
    ones = jnp.ones((B,), bool)
    return verify_plonk(spec, dev, ch, pi_hash, ones)


def fri_phase(dev, obs):
    _, ch = transcript_phase(dev, obs)
    ones = jnp.ones((B,), bool)
    return verify_fri(spec, dev, ch, ones)


def time_fn(label, fn):
    jf = jax.jit(fn)
    t0 = time.time()
    out = jf(dev, obs)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)
    compile_t = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        out = jf(dev, obs)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        times.append(time.time() - t0)
    print(f"{label:12s} compile={compile_t:7.1f}s best={min(times):.4f}s")
    return min(times)


print(f"device={jax.devices()[0]} fixture={name} batch={B}")
t_tr = time_fn("transcript", transcript_phase)
t_pl = time_fn("plonk", plonk_phase)
t_fri = time_fn("fri", fri_phase)
print(f"# plonk-only ~{t_pl - t_tr:.4f}s, fri-only ~{t_fri - t_tr:.4f}s")
