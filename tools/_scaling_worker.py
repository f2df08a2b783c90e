"""Worker for tools/scaling_bench.py --processes: one 'host' in a
jax.distributed job, timing the globally-sharded verifier (tiny spec,
fully-traced math) through parallel/distributed.py.

Usage: python _scaling_worker.py <pid> <nproc> <port> <local_batch> <out>
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from plonky2_tpu.utils.envflags import apply_cpu_xla_flags  # noqa: E402

apply_cpu_xla_flags()


def main():
    pid, nproc, port, b_local, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
        int(sys.argv[4]), sys.argv[5])
    import jax
    jax.config.update("jax_platforms", "cpu")
    from plonky2_tpu.parallel import distributed as dist
    if nproc > 1:
        dist.initialize(coordinator_address=f"localhost:{port}",
                        num_processes=nproc, process_id=pid)
    from plonky2_tpu.proof.synthetic import make_tiny_spec, make_dummy_proof
    from plonky2_tpu.proof.serde import stack_proofs

    spec = make_tiny_spec()
    local = stack_proofs([make_dummy_proof(spec, seed=pid * 100 + i)
                          for i in range(b_local)])
    mesh = dist.global_mesh()

    t0 = time.time()
    verdicts, n_accept = dist.verify_batch_distributed(spec, local, mesh)
    compile_s = time.time() - t0
    assert n_accept == 0  # dummy proofs reject everywhere
    B_global = b_local * nproc
    assert verdicts.shape == (B_global,)

    times = []
    for _ in range(5):
        t0 = time.time()
        dist.verify_batch_distributed(spec, local, mesh)
        times.append(time.time() - t0)

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump({"processes": nproc, "global_batch": B_global,
                       "best_s": min(times),
                       "proofs_per_sec": B_global / min(times),
                       "compile_s": round(compile_s, 1)}, f)
    print(f"[{pid}] done best={min(times):.3f}s", flush=True)


if __name__ == "__main__":
    main()
