#!/usr/bin/env python3
"""Benchmark: Plonky2 proofs verified per second per chip.

Runs on whatever jax.devices() provides (the real TPU chip under axon;
CPU elsewhere).  Verifies a batch of copies of the testdata/step proof
(degree 2^13, 28 FRI query rounds -- the heavier fixture) through the full
jitted pipeline and reports steady-state throughput.

Baseline: the pure-CPU single-core reference verifier
(plonky2_tpu/bench/cpu_reference.py) on the same proof -- measured at
~1.53 s/proof on this image (tools/ref_verify.py).  The reference repo
publishes no numbers (BASELINE.md); a python-int verifier is a generous
denominator, so the JSON also reports the raw per-chip numbers
(proofs/s, Poseidon-BN254 permutations/s, estimated VPU utilization)
that stand on their own.

Prints ONE json line:
  {"metric": "step_proofs_per_sec_per_chip", "value": N, "unit": "proofs/s",
   "vs_baseline": ratio, ...extra context keys}

NOTE on timing: on the axon TPU tunnel, `block_until_ready()` returns
before single pallas_call dispatches complete (verified empirically), so
every measured iteration ends with a host fetch of the (tiny) verdict
array, which forces real completion.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Measured on this image's CPU (single core, python-int verifier,
# tools/ref_verify.py step): ~1.53 s/proof.
CPU_BASELINE_PROOFS_PER_SEC = 1.0 / 1.53


def main():
    import jax
    import numpy as np
    from plonky2_tpu.utils.cache import enable_persistent_cache
    from plonky2_tpu.proof.spec import load_circuit_spec
    from plonky2_tpu.proof import serde
    from plonky2_tpu.transcript import challenger as chal
    from plonky2_tpu import verifier

    cache_dir = enable_persistent_cache()

    root = os.path.dirname(os.path.abspath(__file__))
    name = os.environ.get("BENCH_FIXTURE", "step")
    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    iters = int(os.environ.get("BENCH_ITERS", "5"))

    spec = load_circuit_spec(f"{root}/testdata/{name}/common_circuit_data.json")
    proof = serde.load_proof(
        spec, f"{root}/testdata/{name}/proof_with_public_inputs.json",
        f"{root}/testdata/{name}/verifier_only_circuit_data.json")
    batch = serde.stack_proofs([proof] * batch_size)

    schedule = chal.build_schedule(spec)
    obs = verifier._split_u64(chal.build_observed_host(spec, batch))
    dev = verifier.proof_to_device(batch)
    dev = jax.device_put(dev)
    obs = jax.device_put(obs)

    fn = jax.jit(lambda d, o: verifier._verify_device(spec, schedule, d, o))

    t0 = time.time()
    out = np.asarray(fn(dev, obs))
    compile_time = time.time() - t0
    assert bool(out.all()), "benchmark proofs must verify"

    # steady state; host-fetch the verdict each iter to force completion
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = np.asarray(fn(dev, obs))
        times.append(time.time() - t0)
    best = min(times)
    throughput = batch_size / best

    result = {
        "metric": "step_proofs_per_sec_per_chip",
        "value": round(throughput, 3),
        "unit": "proofs/s",
        "vs_baseline": round(throughput / CPU_BASELINE_PROOFS_PER_SEC, 2),
        "baseline_anchor": "python-int cpu_reference 1.53 s/proof (see BASELINE.md; reference repo publishes no numbers)",
    }
    result.update(_poseidon_micro())
    print(json.dumps(result))
    print(f"# batch={batch_size} best={best:.4f}s mean={sum(times)/len(times):.4f}s "
          f"compile={compile_time:.1f}s cache={cache_dir or 'off'} "
          f"device={jax.devices()[0]}",
          file=sys.stderr)


def _poseidon_micro():
    """Poseidon-BN254 permutations/s + estimated VPU utilization.

    The permutation kernel is the protocol's hot op (SURVEY.md section 3.5);
    this grounds the proofs/s number in a speed-of-light-style metric.
    Chained dispatches amortize the axon tunnel's per-call latency.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        from plonky2_tpu.kernels import poseidon_bn254_pallas as pk
        from plonky2_tpu.hash import poseidon_bn254 as pb
        if jax.default_backend() != "tpu":
            return {}
        N, CHAIN = 8192, 10
        state = jnp.asarray(np.zeros((4, 16, N), np.uint32))
        fn = pk._permute_lanes_compiled(N, False)
        cf = jax.jit(lambda x: [x := fn(x) for _ in range(CHAIN)][-1])
        np.asarray(cf(state))
        ts = []
        for _ in range(3):
            t0 = time.time()
            np.asarray(cf(state))
            ts.append(time.time() - t0)
        perms_s = CHAIN * N / min(ts)
        # ~784 Montgomery multiplies per permutation, ~2e3 u32 lane-ops each;
        # v5e VPU peak ~= 8*128 lanes * 4 units * 0.94 GHz ~= 3.85e12 ops/s.
        ops_per_perm = 784 * 2000.0
        vpu_util = perms_s * ops_per_perm / 3.85e12
        return {
            "poseidon_bn254_perms_per_sec": round(perms_s),
            "est_vpu_util": round(vpu_util, 3),
        }
    except Exception as e:  # never fail the bench over the micro metric
        print(f"# poseidon micro skipped: {e}", file=sys.stderr)
        return {}


if __name__ == "__main__":
    main()
