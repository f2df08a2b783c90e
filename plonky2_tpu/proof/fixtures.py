"""Shared helpers for loading the reference proof fixtures and producing
canonical corrupted variants (used by bench.py, the multichip dryrun, and
the mesh/distributed tests -- one source of truth for the fixture paths
and the corruption site)."""

from __future__ import annotations

import copy
import json
import os

from .spec import load_circuit_spec


def load_fixture(circuit_dir):
    """testdata dir -> (spec, raw_proof_json, verifier_only_json)."""
    spec = load_circuit_spec(
        os.path.join(circuit_dir, "common_circuit_data.json"))
    with open(os.path.join(circuit_dir, "proof_with_public_inputs.json")) as f:
        raw = json.load(f)
    with open(os.path.join(circuit_dir,
                           "verifier_only_circuit_data.json")) as f:
        vraw = json.load(f)
    return spec, raw, vraw


def corrupt_wires_opening(raw):
    """Deep-copied proof JSON with one bit flipped in openings.wires[0][0]
    -- the canonical 'cryptographically invalid, structurally fine'
    corruption used across bench and tests."""
    bad = copy.deepcopy(raw)
    bad["proof"]["openings"]["wires"][0][0] ^= 1
    return bad
