"""Adversarial ingest tests: every InvalidProofError branch must fire.

The reference proves rejection behavior with ProverFailed-style tests
(reference goldilocks/base_test.go:37-38: RangeCheck must fail on x = p;
fri/fri_utils.go:167-228: shape validation panics).  Here ingestion is the
rejection surface: structurally invalid proofs raise InvalidProofError at
load time (cryptographically invalid ones yield verdict False on device).

All host-side: no XLA compiles, so this file runs in seconds.
"""
import copy
import json
import os

import numpy as np
import pytest

from plonky2_tpu.proof.spec import load_circuit_spec
from plonky2_tpu.proof import serde
from plonky2_tpu.fields import bn254, goldilocks as gl

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIX = f"{ROOT}/testdata/decode_block"


@pytest.fixture(scope="module")
def spec():
    return load_circuit_spec(f"{FIX}/common_circuit_data.json")


@pytest.fixture(scope="module")
def raw():
    with open(f"{FIX}/proof_with_public_inputs.json") as f:
        proof = json.load(f)
    with open(f"{FIX}/verifier_only_circuit_data.json") as f:
        vdata = json.load(f)
    return proof, vdata


def _expect_reject(spec, proof, vdata, match):
    with pytest.raises(serde.InvalidProofError, match=match):
        serde.ingest_proof(spec, proof, vdata)


def test_fixture_ingests_clean(spec, raw):
    out = serde.ingest_proof(spec, copy.deepcopy(raw[0]),
                             copy.deepcopy(raw[1]))
    assert out["pow_witness"].dtype == np.uint64


def test_noncanonical_gl_opening_rejected(spec, raw):
    """The RangeCheck analog (reference goldilocks/base_test.go:37-38):
    x = p is a non-canonical encoding and must be rejected."""
    proof = copy.deepcopy(raw[0])
    proof["proof"]["openings"]["wires"][0][0] = gl.P
    _expect_reject(spec, proof, raw[1], "non-canonical")


def test_noncanonical_gl_leaf_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    ep = proof["proof"]["opening_proof"]["query_round_proofs"][0][
        "initial_trees_proof"]["evals_proofs"][0]
    ep[0][0] = gl.P + 5
    _expect_reject(spec, proof, raw[1], "non-canonical")


def test_noncanonical_pow_witness_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    proof["proof"]["opening_proof"]["pow_witness"] = gl.P
    _expect_reject(spec, proof, raw[1], "non-canonical")


def test_digest_out_of_range_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    proof["proof"]["wires_cap"][0] = str(bn254.P)
    _expect_reject(spec, proof, raw[1], "out of range")


def test_sibling_out_of_range_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    mp = proof["proof"]["opening_proof"]["query_round_proofs"][0][
        "initial_trees_proof"]["evals_proofs"][0][1]
    mp["siblings"][0] = str(bn254.P + 1)
    _expect_reject(spec, proof, raw[1], "out of range")


def test_wrong_cap_size_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    proof["proof"]["wires_cap"] = proof["proof"]["wires_cap"][:-1]
    _expect_reject(spec, proof, raw[1], "size mismatch")


def test_wrong_query_round_count_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    op = proof["proof"]["opening_proof"]
    op["query_round_proofs"] = op["query_round_proofs"][:-1]
    _expect_reject(spec, proof, raw[1], "query rounds")


def test_truncated_openings_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    proof["proof"]["openings"]["wires"] = (
        proof["proof"]["openings"]["wires"][:-1])
    _expect_reject(spec, proof, raw[1], "length mismatch")


def test_final_poly_length_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    fp = proof["proof"]["opening_proof"]["final_poly"]["coeffs"]
    proof["proof"]["opening_proof"]["final_poly"]["coeffs"] = fp + [[0, 0]]
    _expect_reject(spec, proof, raw[1], "final poly")


def test_wrong_merkle_depth_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    mp = proof["proof"]["opening_proof"]["query_round_proofs"][0][
        "initial_trees_proof"]["evals_proofs"][1][1]
    mp["siblings"] = mp["siblings"][:-1]
    _expect_reject(spec, proof, raw[1], "depth mismatch")


def test_wrong_leaf_size_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    ep = proof["proof"]["opening_proof"]["query_round_proofs"][0][
        "initial_trees_proof"]["evals_proofs"][3]
    ep[0] = ep[0][:-1]
    _expect_reject(spec, proof, raw[1], "leaf size")


def test_wrong_step_evals_rejected(spec, raw):
    proof = copy.deepcopy(raw[0])
    st = proof["proof"]["opening_proof"]["query_round_proofs"][0]["steps"][0]
    st["evals"] = st["evals"][:-1]
    _expect_reject(spec, proof, raw[1], "step evals")


def test_wrong_vdata_cap_rejected(spec, raw):
    vdata = copy.deepcopy(raw[1])
    vdata["constants_sigmas_cap"] = vdata["constants_sigmas_cap"][:-1]
    _expect_reject(spec, raw[0], vdata, "size mismatch")


# ---------------------------------------------------------------------------
# HashOrNoop packing (reference poseidon/bn254.go:79-94)
# ---------------------------------------------------------------------------

def test_hash_or_noop_short_leaf_packing():
    """A <=3-element leaf's digest is sum v_k * 2^(64k), no permutation."""
    vals = [123456789, 987654321, 5]
    blocks = serde._pack_leaf_mont(vals)
    assert len(blocks) == 1
    block, mask = blocks[0]
    packed = vals[0] + (vals[1] << 64) + (vals[2] << 128)
    assert list(block[0]) == bn254.int_to_mont_limbs(packed)
    assert list(mask) == [True, False, False]
    # 1- and 2-element leaves pack the same way
    b1, m1 = serde._pack_leaf_mont([42])[0]
    assert list(b1[0]) == bn254.int_to_mont_limbs(42)


def test_leaf_layout_noop_flags():
    """Oracle with <=3 leaf elements is marked noop; big oracles are not."""
    from plonky2_tpu.proof.synthetic import make_tiny_spec
    layout = serde.leaf_layout(make_tiny_spec())
    sizes = make_tiny_spec().oracle_leaf_sizes
    for o, size in enumerate(sizes):
        assert layout.noop[o] == (size <= 3)


def test_noncanonical_indices_check():
    """reference fri/fri_utils.go:156-163: sane rates pass, rate 2^-50 fails."""
    import dataclasses
    from plonky2_tpu.proof.synthetic import make_tiny_spec
    spec = make_tiny_spec()
    spec.assert_noncanonical_indices_ok()  # rate_bits=3: fine
    bad = dataclasses.replace(spec, rate_bits=50)
    with pytest.raises(ValueError, match="non-canonical"):
        bad.assert_noncanonical_indices_ok()


def test_fri_pow_check_all_branches():
    """The proof-of-work bound (reference fri/fri.go:75-80) across all four
    trace-time branches of 64 - pow_bits: <32, ==32, in (32,64), ==64."""
    import numpy as np
    import jax.numpy as jnp
    from plonky2_tpu.fri.verify import _pow_ok

    def pr(v):
        v = int(v)
        return (jnp.asarray([v & 0xFFFFFFFF], jnp.uint32),
                jnp.asarray([v >> 32], jnp.uint32))

    # pow_bits=40 -> max_bits=24
    assert bool(_pow_ok(pr((1 << 24) - 1), 40)[0])
    assert not bool(_pow_ok(pr(1 << 24), 40)[0])
    assert not bool(_pow_ok(pr(1 << 35), 40)[0])
    # pow_bits=32 -> max_bits=32
    assert bool(_pow_ok(pr((1 << 32) - 1), 32)[0])
    assert not bool(_pow_ok(pr(1 << 32), 32)[0])
    # pow_bits=16 -> max_bits=48 (the step/decode_block configuration)
    assert bool(_pow_ok(pr((1 << 48) - 1), 16)[0])
    assert not bool(_pow_ok(pr(1 << 48), 16)[0])
    assert bool(_pow_ok(pr(123), 16)[0])
    # pow_bits=0 -> every canonical value passes
    assert bool(_pow_ok(pr((1 << 63) + 5), 0)[0])


def test_soundness_matrix_cases_structurally_valid():
    """tools/soundness_matrix.py's corruption builder must stay ingestible:
    every mutation is cryptographically invalid but structurally fine, so
    the reject comes from the verdict math, not ingestion."""
    import importlib.util
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec_ = importlib.util.spec_from_file_location(
        "soundness_matrix", os.path.join(root, "tools/soundness_matrix.py"))
    sm = importlib.util.module_from_spec(spec_)
    spec_.loader.exec_module(sm)

    from plonky2_tpu.proof import serde
    from plonky2_tpu.proof.fixtures import load_fixture
    spec, raw, vraw = load_fixture(f"{root}/testdata/decode_block")
    cases = sm.build_cases(raw, vraw)
    names = [c[0] for c in cases]
    assert names[0] == "valid" and len(set(names)) == len(names)
    assert len(cases) >= 20  # decode_block has no public inputs (one fewer)
    _, mask, errors = serde.ingest_batch(spec, [(r, v) for _, r, v in cases])
    assert mask.all(), errors
