#!/usr/bin/env python3
"""Soundness matrix: corrupt every major proof component, one per lane,
and verify the verdict vector rejects exactly the corrupted lanes --
through the production traced/Pallas math on the default device.

Each corruption is a single bit-flip / value-tweak in the RAW proof JSON
(so ingestion stays structurally valid and the reject is cryptographic),
covering every component the reference's rangeCheck/assert structure
guards (verifier/verifier.go:84-141, fri/fri.go, plonk/plonk.go):
openings (each category), final poly, pow witness, Merkle caps, initial-
tree leaves and siblings, commit-phase step evals and siblings, the
circuit digest, and the public inputs.

Writes SOUNDNESS_r{N}.json-style output: one row per lane with the
component name and its verdict (expected False everywhere except lane 0).

Usage: python tools/soundness_matrix.py [--fixture step] [--out FILE]
"""
import argparse
import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_cases(raw, vraw):
    """[(name, raw_variant, vraw_variant)] -- lane 0 is the valid proof."""
    P = "proof"

    def mut(fn):
        r, v = copy.deepcopy(raw), copy.deepcopy(vraw)
        fn(r, v)
        return r, v

    def flip_dec_str(container, key_or_idx):
        # decimal-string digest -> +-1 (stays in range: digests are random)
        s = container[key_or_idx]
        container[key_or_idx] = str(int(s) ^ 1)

    cases = [("valid", raw, vraw)]

    for opening in ["constants", "plonk_sigmas", "wires", "plonk_zs",
                    "plonk_zs_next", "partial_products", "quotient_polys"]:
        cases.append((f"openings.{opening}", *mut(
            lambda r, v, o=opening: r[P]["openings"].__setitem__(
                o, [[r[P]["openings"][o][0][0] ^ 1,
                     r[P]["openings"][o][0][1]]] + r[P]["openings"][o][1:]))))

    cases.append(("final_poly", *mut(
        lambda r, v: r[P]["opening_proof"]["final_poly"]["coeffs"][0].__setitem__(
            0, r[P]["opening_proof"]["final_poly"]["coeffs"][0][0] ^ 1))))
    cases.append(("pow_witness", *mut(
        lambda r, v: r[P]["opening_proof"].__setitem__(
            "pow_witness", r[P]["opening_proof"]["pow_witness"] ^ 1))))

    cases.append(("wires_cap", *mut(
        lambda r, v: flip_dec_str(r[P]["wires_cap"], 0))))
    cases.append(("zs_partial_products_cap", *mut(
        lambda r, v: flip_dec_str(r[P]["plonk_zs_partial_products_cap"], 3))))
    cases.append(("quotient_polys_cap", *mut(
        lambda r, v: flip_dec_str(r[P]["quotient_polys_cap"], 1))))
    cases.append(("commit_phase_cap", *mut(
        lambda r, v: flip_dec_str(
            r[P]["opening_proof"]["commit_phase_merkle_caps"][0], 2))))

    def qr(r):
        return r[P]["opening_proof"]["query_round_proofs"]

    cases.append(("initial_tree_leaf", *mut(
        lambda r, v: qr(r)[5]["initial_trees_proof"]["evals_proofs"][1][0]
        .__setitem__(3, qr(r)[5]["initial_trees_proof"]["evals_proofs"][1][0][3] ^ 1))))
    cases.append(("initial_tree_sibling", *mut(
        lambda r, v: flip_dec_str(
            qr(r)[2]["initial_trees_proof"]["evals_proofs"][0][1]["siblings"],
            4))))
    cases.append(("step_evals", *mut(
        lambda r, v: qr(r)[7]["steps"][0]["evals"][3].__setitem__(
            0, qr(r)[7]["steps"][0]["evals"][3][0] ^ 1))))
    cases.append(("step_sibling", *mut(
        lambda r, v: flip_dec_str(
            qr(r)[1]["steps"][1]["merkle_proof"]["siblings"], 0))))

    cases.append(("circuit_digest", *mut(
        lambda r, v: flip_dec_str(v, "circuit_digest"))))
    cases.append(("constants_sigmas_cap", *mut(
        lambda r, v: flip_dec_str(v["constants_sigmas_cap"], 0))))

    if raw["public_inputs"]:
        cases.append(("public_inputs", *mut(
            lambda r, v: r["public_inputs"].__setitem__(
                0, r["public_inputs"][0] ^ 1))))
    return cases


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fixture", default="step")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import numpy as np
    from plonky2_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    from plonky2_tpu.proof import serde
    from plonky2_tpu.proof.fixtures import load_fixture
    from plonky2_tpu import verifier

    spec, raw, vraw = load_fixture(f"{ROOT}/testdata/{args.fixture}")
    cases = build_cases(raw, vraw)
    names = [c[0] for c in cases]
    batch, mask, errors = serde.ingest_batch(
        spec, [(r, v) for _, r, v in cases])
    assert mask.all(), f"corruptions must stay structurally valid: {errors}"

    verdicts = verifier.verify_batch(spec, batch)
    rows = [{"component": n, "verdict": bool(b)}
            for n, b in zip(names, verdicts)]
    expected = [i == 0 for i in range(len(cases))]
    ok = verdicts.tolist() == expected

    out = {
        "metric": "soundness_matrix",
        "fixture": args.fixture,
        "device": str(jax.devices()[0]),
        "lanes": len(cases),
        "all_correct": ok,
        "rows": rows,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    if not ok:
        bad = [r for r, e in zip(rows, expected) if r["verdict"] != e]
        print(f"# MISMATCH: {bad}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())


def _selftest_cases():
    """Imported by tests: the case builder must produce distinct,
    structurally-valid mutations."""
    from plonky2_tpu.proof.fixtures import load_fixture
    spec, raw, vraw = load_fixture(f"{ROOT}/testdata/decode_block")
    return spec, build_cases(raw, vraw)
