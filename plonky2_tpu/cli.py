"""Command-line driver (the reference's benchmark.go analog, TPU-native).

Reference flags (benchmark.go:306-324): -plonky2-circuit {step,decode_block},
-proof-system, -profile, -dummy, -save.  The outer-SNARK flags have no
native analog (no Groth16/PLONK wrapping on the verification path); the
rest map to:

    python -m plonky2_tpu.cli verify  --circuit testdata/step [--batch N]
    python -m plonky2_tpu.cli bench   --circuit testdata/step [--batch N]
                                      [--iters K]
    python -m plonky2_tpu.cli inspect --circuit testdata/step
    python -m plonky2_tpu.cli ... --profile DIR   (device trace -> DIR)
    python -m plonky2_tpu.cli ... --cpu           (force CPU backend)

`inspect` prints the static cost model (the constraint-count printout
analog, reference benchmark.go:61-69); `--profile` writes an XProf trace
(the pprof analog, reference benchmark.go:40-43).
"""

from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time


def _load(circuit_dir):
    from .proof.spec import load_circuit_spec
    from .proof import serde

    spec = load_circuit_spec(
        os.path.join(circuit_dir, "common_circuit_data.json"))
    proof = serde.load_proof(
        spec,
        os.path.join(circuit_dir, "proof_with_public_inputs.json"),
        os.path.join(circuit_dir, "verifier_only_circuit_data.json"))
    return spec, proof


def cmd_verify(args):
    import jax
    from .proof.serde import stack_proofs
    from . import verifier
    from .utils.profiling import StageTimer

    spec, proof = _load(args.circuit)
    timer = StageTimer()
    with timer.stage("ingest"):
        batch = stack_proofs([proof] * args.batch)
    with timer.stage("compile_and_verify"):
        verdicts = verifier.verify_batch(spec, batch)
    ok = bool(verdicts.all())
    report = timer.report(
        circuit=args.circuit, batch=args.batch,
        device=str(jax.devices()[0]), all_valid=ok,
        verdicts=verdicts.astype(int).tolist())
    print(report)
    _maybe_save(args, report)
    return 0 if ok else 1


def cmd_bench(args):
    import jax
    from .proof.serde import stack_proofs
    from .transcript import challenger as chal
    from . import verifier

    spec, proof = _load(args.circuit)
    batch = stack_proofs([proof] * args.batch)
    schedule = chal.build_schedule(spec)
    obs = jax.device_put(verifier._split_u64(
        chal.build_observed_host(spec, batch)))
    dev = jax.device_put(verifier.proof_to_device(batch))
    fn = jax.jit(lambda d, o: verifier._verify_device(spec, schedule, d, o))

    t0 = time.perf_counter()
    out = fn(dev, obs)
    out.block_until_ready()
    compile_s = time.perf_counter() - t0
    assert bool(out.all()), "fixture proof must verify"

    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        fn(dev, obs).block_until_ready()
        times.append(time.perf_counter() - t0)
    best = min(times)
    report = json.dumps({
        "circuit": args.circuit, "batch": args.batch,
        "device": str(jax.devices()[0]), "compile_s": round(compile_s, 3),
        "steady_state_s": round(best, 6),
        "proofs_per_sec": round(args.batch / best, 2)})
    print(report)
    _maybe_save(args, report)
    return 0


def _maybe_save(args, report_json_line):
    if getattr(args, "out", None):
        with open(args.out, "w") as f:
            f.write(report_json_line.rstrip() + "\n")


def cmd_inspect(args):
    from .proof.spec import load_circuit_spec
    from .utils.profiling import flops_report

    spec = load_circuit_spec(
        os.path.join(args.circuit, "common_circuit_data.json"))
    report = flops_report(spec)
    report["gates"] = list(spec.gate_ids)
    print(json.dumps(report, indent=2))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="plonky2_tpu")
    ap.add_argument("command", choices=["verify", "bench", "inspect"])
    ap.add_argument("--circuit", default="testdata/step",
                    help="dir with common_circuit_data.json / proof / vk")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a device trace to DIR")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--out", default=None, metavar="FILE",
                    help="also write the JSON report to FILE (the artifact-"
                         "saving analog of the reference's -save flag, "
                         "benchmark.go:137-158; no proving keys exist here)")
    args = ap.parse_args(argv)

    from .utils import cache as _cache
    if args.cpu:
        _cache.force_cpu()
    _cache.enable_persistent_cache()

    cmds = {"verify": cmd_verify, "bench": cmd_bench, "inspect": cmd_inspect}
    if args.profile and args.command != "inspect":
        from .utils.profiling import trace
        ctx = trace(args.profile)
    else:
        ctx = contextlib.nullcontext()
    with ctx:
        return cmds[args.command](args)


if __name__ == "__main__":
    sys.exit(main())
