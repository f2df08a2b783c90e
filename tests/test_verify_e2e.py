"""End-to-end proof verification on the reference fixtures.

- testdata/decode_block and testdata/step must verify (reference
  verifier/verifier_test.go, fri/fri_test.go, plonk/plonk_test.go).
- corrupting any proof component must flip the verdict to False
  (the native analog of gnark assert failures).
"""
import copy

import numpy as np
import pytest

from plonky2_tpu.proof.spec import load_circuit_spec
from plonky2_tpu.proof import serde
from plonky2_tpu import verifier


def load(name):
    spec = load_circuit_spec(f"testdata/{name}/common_circuit_data.json")
    proof = serde.load_proof(
        spec, f"testdata/{name}/proof_with_public_inputs.json",
        f"testdata/{name}/verifier_only_circuit_data.json")
    return spec, proof


@pytest.mark.parametrize("name", ["decode_block", "step"])
def test_verify_valid(name):
    spec, proof = load(name)
    assert verifier.verify_one(spec, proof)


def test_reject_corrupted_opening():
    spec, proof = load("decode_block")
    bad = copy.deepcopy(proof)
    bad["op_wires"] = bad["op_wires"].copy()
    bad["op_wires"][3, 0] ^= np.uint64(1)
    batch = serde.stack_proofs([proof, bad])
    got = verifier.verify_batch(spec, batch)
    assert got.tolist() == [True, False]


def test_reject_corrupted_merkle_leaf():
    spec, proof = load("decode_block")
    bad = copy.deepcopy(proof)
    # corrupting a leaf element breaks its Merkle digest
    bad["init_leaves_1"] = bad["init_leaves_1"].copy()
    bad["init_leaves_1"][0, 5] ^= np.uint64(1)
    # keep the packed blocks consistent with the corrupted leaf so the
    # failure comes from the Merkle check, not ingest inconsistency
    from plonky2_tpu.proof.serde import _pack_leaf_mont
    blocks = _pack_leaf_mont([int(x) for x in bad["init_leaves_1"][0]])
    pk = bad["init_leaf_packed"].copy()
    for t, (block, _) in enumerate(blocks):
        pk[0, 1, t] = block
    bad["init_leaf_packed"] = pk
    batch = serde.stack_proofs([bad])
    got = verifier.verify_batch(spec, batch)
    assert got.tolist() == [False]


def test_reject_corrupted_pow():
    spec, proof = load("decode_block")
    bad = copy.deepcopy(proof)
    bad["pow_witness"] = bad["pow_witness"] ^ np.uint64(1)
    got = verifier.verify_batch(spec, serde.stack_proofs([bad]))
    assert got.tolist() == [False]
