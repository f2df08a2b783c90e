"""Subprocess worker for the two-process jax.distributed CPU test.

Each worker is one "host": it initializes the distributed runtime against a
localhost coordinator, ingests ONLY its local proof (per-host shard
feeding), and runs the globally-sharded verifier; the verdict all_gather
must hand every process the full verdict vector.

Usage: python _dist_worker.py <process_id> <num_processes> <port> <out_json>
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from plonky2_tpu.utils.envflags import apply_cpu_xla_flags  # noqa: E402

apply_cpu_xla_flags()
os.environ["PLONKY2_TPU_HOST_MATH"] = "1"


def main():
    pid, nproc, port, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    import jax
    jax.config.update("jax_platforms", "cpu")

    from plonky2_tpu.parallel import distributed as dist
    dist.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * jax.local_device_count()

    from plonky2_tpu.proof import serde
    from plonky2_tpu.proof.fixtures import load_fixture, corrupt_wires_opening

    spec, raw, vraw = load_fixture(f"{ROOT}/testdata/decode_block")
    if pid == nproc - 1:  # the last host's proof is corrupted
        raw = corrupt_wires_opening(raw)
    local = serde.stack_proofs([serde.ingest_proof(spec, raw, vraw)])

    mesh = dist.global_mesh()
    verdicts, n_accept = dist.verify_batch_distributed(spec, local, mesh)

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "verdicts": verdicts.tolist(),
                   "n_accept": n_accept}, f)
    print(f"[{pid}] verdicts={verdicts.tolist()} n_accept={n_accept}",
          flush=True)


if __name__ == "__main__":
    main()
