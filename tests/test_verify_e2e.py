"""End-to-end proof verification on the reference fixtures.

- testdata/decode_block and testdata/step must verify (reference
  verifier/verifier_test.go, fri/fri_test.go, plonk/plonk_test.go).
- corrupting any proof component must flip the verdict to False
  (the native analog of gnark assert failures).

All decode_block cases (valid + 3 corruptions) run as ONE batch so the
verifier compiles once per fixture: invalidity is data, and a batch mixing
valid and invalid proofs is exactly the production shape.

These tests run in host-math mode (PLONKY2_TPU_HOST_MATH=1): the BN254
permutation and gate-constraint evaluation execute as pure_callbacks into
the independent python-int reference (bench/cpu_reference.py) instead of
the traced limb graphs, because XLA:CPU cannot compile the full-size
traced graph in reasonable time (>15 min measured; the TPU path compiles
and runs it fine -- bench.py exercises that every round).  This keeps the
e2e structure (serde -> transcript -> challenges -> vanishing -> FRI ->
verdicts) fully under test on CPU while the heavy math is covered by
golden-vector and kernel-parity tests.
"""
import copy

import numpy as np
import pytest

from plonky2_tpu.proof.spec import load_circuit_spec
from plonky2_tpu.proof import serde
from plonky2_tpu import verifier


@pytest.fixture(autouse=True)
def host_math(monkeypatch):
    monkeypatch.setenv("PLONKY2_TPU_HOST_MATH", "1")


def load(name):
    spec = load_circuit_spec(f"testdata/{name}/common_circuit_data.json")
    proof = serde.load_proof(
        spec, f"testdata/{name}/proof_with_public_inputs.json",
        f"testdata/{name}/verifier_only_circuit_data.json")
    return spec, proof


@pytest.mark.slow
def test_verify_step_valid():
    """slow (~4.5 min XLA:CPU compile): the step fixture is verified on
    real TPU hardware by bench.py every round (all-verdicts assert);
    decode_block below keeps full e2e accept+reject coverage in the
    default gate."""
    spec, proof = load("step")
    assert verifier.verify_one(spec, proof)


def test_decode_block_valid_and_corrupted_batch():
    spec, proof = load("decode_block")

    bad_opening = copy.deepcopy(proof)
    bad_opening["op_wires"] = bad_opening["op_wires"].copy()
    bad_opening["op_wires"][3, 0] ^= np.uint64(1)

    # corrupting a leaf element breaks its Merkle digest; keep the packed
    # blocks consistent with the corrupted leaf so the failure comes from
    # the Merkle check, not ingest inconsistency
    bad_leaf = copy.deepcopy(proof)
    bad_leaf["init_leaves_1"] = bad_leaf["init_leaves_1"].copy()
    bad_leaf["init_leaves_1"][0, 5] ^= np.uint64(1)
    from plonky2_tpu.proof.serde import _pack_leaf_mont
    blocks = _pack_leaf_mont([int(x) for x in bad_leaf["init_leaves_1"][0]])
    pk = bad_leaf["init_leaf_packed"].copy()
    for t, (block, _) in enumerate(blocks):
        pk[0, 1, t] = block
    bad_leaf["init_leaf_packed"] = pk

    bad_pow = copy.deepcopy(proof)
    bad_pow["pow_witness"] = bad_pow["pow_witness"] ^ np.uint64(1)

    batch = serde.stack_proofs([proof, bad_opening, bad_leaf, bad_pow])
    got = verifier.verify_batch(spec, batch)
    assert got.tolist() == [True, False, False, False]


def test_ingest_batch_quarantines_malformed_proofs():
    """A structurally-malformed proof must not abort batch ingestion: its
    lane is masked False and every other lane still verifies
    (SURVEY.md section 5 failure-detection row; the reference panics because
    it verifies one proof per process -- a batch verifier must not)."""
    import json
    spec = load_circuit_spec("testdata/decode_block/common_circuit_data.json")
    with open("testdata/decode_block/proof_with_public_inputs.json") as f:
        raw = json.load(f)
    with open("testdata/decode_block/verifier_only_circuit_data.json") as f:
        vraw = json.load(f)

    bad_shape = copy.deepcopy(raw)          # truncated openings
    bad_shape["proof"]["openings"]["wires"] = \
        bad_shape["proof"]["openings"]["wires"][:-1]
    bad_range = copy.deepcopy(raw)          # non-canonical GL element (= p)
    bad_range["proof"]["openings"]["wires"][0][0] = 18446744069414584321

    bad_missing = copy.deepcopy(raw)      # missing field -> KeyError
    del bad_missing["proof"]["openings"]["wires"]
    bad_ragged = copy.deepcopy(raw)       # ragged array -> numpy ValueError
    bad_ragged["proof"]["openings"]["wires"][0] = \
        bad_ragged["proof"]["openings"]["wires"][0][:1]

    batch, mask, errors = serde.ingest_batch(
        spec, [(raw, vraw), (bad_shape, vraw), (bad_range, vraw),
               (bad_missing, vraw), (bad_ragged, vraw)])
    assert mask.tolist() == [True, False, False, False, False]
    assert sorted(errors) == [1, 2, 3, 4]
    assert "length mismatch" in errors[1]
    assert "non-canonical" in errors[2]
    assert "KeyError" in errors[3]

    got = verifier.verify_batch(spec, batch, valid_mask=mask)
    assert got.tolist() == [True, False, False, False, False]

    # an all-invalid batch has no shape to run: the only case that raises
    with pytest.raises(serde.InvalidProofError):
        serde.ingest_batch(spec, [(bad_shape, vraw)])
