#!/usr/bin/env python3
"""Scaling-efficiency harness: proofs/s at mesh size 1 vs N.

Measures the sharded verifier (parallel/mesh.verify_batch_sharded) over
device meshes of increasing size and records throughput + parallel
efficiency into a JSON artifact (SCALING_r{N}.json).

Modes:
  --virtual  (default) N virtual CPU devices (xla_force_host_platform_
             device_count).  IMPORTANT CAVEAT: virtual devices share this
             image's 2 host cores, so efficiency numbers measure harness +
             sharding correctness (the program partitions, runs, and
             gathers verdicts at every mesh size), NOT hardware scaling --
             there is no multi-chip hardware in this environment.  Real
             scaling must be measured on a pod slice via
             parallel/distributed.py (same code path).
  --tpu      single real chip sanity point (mesh size 1 == bench.py).

The tiny synthetic spec with fully-traced math is used so per-device work
is real compute (host-math callbacks would serialize on the host and
corrupt the comparison).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(spec, batch, mesh, iters=5):
    import numpy as np
    from plonky2_tpu.parallel import mesh as pmesh
    t0 = time.time()
    pmesh.verify_batch_sharded(spec, batch, mesh)  # compile + run
    compile_s = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        pmesh.verify_batch_sharded(spec, batch, mesh)  # host-fetches inside
        times.append(time.time() - t0)
    B = batch["pow_witness"].shape[0]
    return {"batch": B, "best_s": min(times), "mean_s": sum(times) / iters,
            "proofs_per_sec": B / min(times), "compile_s": round(compile_s, 1)}


def measure_processes(proc_counts, b_local=4):
    """Multi-process (multi-'host') scaling via parallel/distributed.py:
    spawn N jax.distributed worker processes on localhost (gloo) and time
    the globally-sharded verifier from rank 0.  Same caveat as the virtual
    sweep: processes share 2 physical cores here, so this validates the
    full distributed path (initialize -> per-host shard feeding -> verdict
    collectives), not hardware scaling."""
    import socket
    import subprocess
    import tempfile
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_scaling_worker.py")
    results = []
    for nproc in proc_counts:
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        out = tempfile.mktemp(suffix=".json")
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env.pop("XLA_FLAGS", None)
        procs = [subprocess.Popen(
            [sys.executable, worker, str(i), str(nproc), str(port),
             str(b_local), out], env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            for i in range(nproc)]
        # wait on every worker (no short-circuit) and kill stragglers by
        # exact handle, so a failed/hung rank can't leak orphans holding
        # the coordinator port
        ok = True
        try:
            for p in procs:
                try:
                    ok &= p.wait(timeout=900) == 0
                except subprocess.TimeoutExpired:
                    ok = False
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait()
        if ok and os.path.exists(out):
            with open(out) as f:
                r = json.load(f)
            results.append(r)
            print(f"# processes={nproc} {r['proofs_per_sec']:.1f} proofs/s "
                  f"(compile {r['compile_s']}s)", file=sys.stderr)
        else:
            print(f"# processes={nproc} FAILED", file=sys.stderr)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,8")
    ap.add_argument("--total-batch", type=int, default=8)
    ap.add_argument("--processes", default="",
                    help="also run multi-process points, e.g. 1,2")
    ap.add_argument("--out", default=None)
    ap.add_argument("--tpu", action="store_true",
                    help="single-chip TPU point instead of the virtual sweep")
    args = ap.parse_args()

    proc_results = []
    if args.processes:
        proc_results = measure_processes(
            [int(x) for x in args.processes.split(",")])

    if not args.tpu:
        from plonky2_tpu.utils.envflags import apply_cpu_xla_flags
        apply_cpu_xla_flags(
            extra=("--xla_force_host_platform_device_count=8",))

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    from plonky2_tpu.proof.synthetic import make_tiny_spec, make_dummy_proof
    from plonky2_tpu.proof.serde import stack_proofs
    from plonky2_tpu.parallel import mesh as pmesh

    spec = make_tiny_spec()
    B = args.total_batch
    batch = stack_proofs([make_dummy_proof(spec, seed=i) for i in range(B)])

    sizes = [int(s) for s in args.sizes.split(",")]
    results = []
    for n in sizes:
        devs = jax.devices()[:n]
        if len(devs) < n:
            print(f"# skip mesh size {n}: only {len(devs)} devices",
                  file=sys.stderr)
            continue
        mesh = pmesh.make_mesh(devs)
        r = {"mesh_size": n, **measure(spec, batch, mesh)}
        results.append(r)
        print(f"# mesh={n} {r['proofs_per_sec']:.1f} proofs/s "
              f"(best {r['best_s']*1e3:.1f} ms, compile {r['compile_s']}s)",
              file=sys.stderr)

    base = results[0]["proofs_per_sec"] if results else None
    for r in results:
        r["efficiency_vs_mesh1"] = round(
            r["proofs_per_sec"] / (base * r["mesh_size"]), 3)

    out = {
        "metric": "sharded_verify_scaling",
        "backend": jax.default_backend(),
        "devices": str(jax.devices()[0]) + f" x{len(jax.devices())}",
        "workload": "tiny synthetic spec, fully-traced math, strong scaling "
                    f"(fixed total batch {B})",
        "results": results,
        "process_results": proc_results,
        "caveat": ("virtual CPU devices share 2 physical cores: this "
                   "validates the sharded program at every mesh size, not "
                   "hardware scaling (no multi-chip hardware available; "
                   "run on a pod slice via parallel/distributed.py for "
                   "real efficiency numbers)") if not args.tpu else None,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
