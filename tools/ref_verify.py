#!/usr/bin/env python3
"""Run the pure-python CPU reference verifier on a fixture (cross-check +
CPU baseline timing)."""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from plonky2_tpu.proof.spec import load_circuit_spec
from plonky2_tpu.bench import cpu_reference


def main(name="decode_block"):
    d = f"testdata/{name}"
    spec = load_circuit_spec(f"{d}/common_circuit_data.json")
    raw = json.load(open(f"{d}/proof_with_public_inputs.json"))
    vo = json.load(open(f"{d}/verifier_only_circuit_data.json"))
    t0 = time.time()
    ok = cpu_reference.verify(spec, raw, vo)
    dt = time.time() - t0
    print(f"{name}: verified={ok} in {dt:.3f}s")
    return ok, dt


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "decode_block")
