"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

SURVEY.md section 2.4 (multi-host row): the proof batch is the data-parallel
axis, sharded with shard_map over a Mesh; verification is per-proof, the
only cross-device dependence is the gathered verdict vector.  conftest.py
provisions 8 virtual devices via --xla_force_host_platform_device_count.
"""
import os

import numpy as np
import pytest

import jax

from plonky2_tpu.proof import serde
from plonky2_tpu.proof.synthetic import make_tiny_spec, make_dummy_proof
from plonky2_tpu.parallel import mesh as pmesh

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_eight_virtual_devices_present():
    assert len(jax.devices()) == 8, jax.devices()


def test_tiny_dummy_batch_sharded_rejects(monkeypatch):
    """Dummy proofs are structurally valid but cryptographically meaningless:
    every shard must return False, and invalidity must be data, not an
    exception (SURVEY.md section 5 failure-detection row).

    Runs in host-math mode to keep the shard_map compile short; the
    driver-level dryrun (__graft_entry__.dryrun_multichip) exercises the
    same sharded program with the fully-traced math every round."""
    monkeypatch.setenv("PLONKY2_TPU_HOST_MATH", "1")
    spec = make_tiny_spec()
    mesh = pmesh.make_mesh(jax.devices())
    batch = serde.stack_proofs([make_dummy_proof(spec, seed=i)
                                for i in range(8)])
    verdicts = pmesh.verify_batch_sharded(spec, batch, mesh)
    assert verdicts.shape == (8,)
    assert not verdicts.any()


def test_pad_batch_uneven():
    """Uneven batches pad with copies of lane 0 (valid proofs, so padding
    lanes verify fine) and report the real count for verdict slicing."""
    spec = make_tiny_spec()
    batch = serde.stack_proofs([make_dummy_proof(spec, seed=i)
                                for i in range(5)])
    padded, real = pmesh.pad_batch(batch, 8)
    assert real == 5
    for k, v in padded.items():
        assert v.shape[0] == 8, k
        assert (v[5] == v[0]).all() and (v[7] == v[0]).all(), k
    same, real2 = pmesh.pad_batch(batch, 5)
    assert real2 == 5 and same is batch


def test_tiny_2d_mesh_proof_by_query(monkeypatch):
    """2-D ("proof", "query") mesh: 4-way proof batch x 2-way FRI
    query-round sharding (SURVEY.md section 2.4 row 2).  Dummy proofs must
    be rejected on every lane; the reject must survive the cross-query
    psum reduction regardless of which query shard catches it.

    Fully-traced math (tiny spec)."""
    spec = make_tiny_spec(num_query_rounds=4)
    mesh = pmesh.make_mesh_2d(jax.devices(), (4, 2))
    batch = serde.stack_proofs([make_dummy_proof(spec, seed=i)
                                for i in range(4)])
    verdicts = pmesh.verify_batch_sharded_2d(spec, batch, mesh)
    assert verdicts.shape == (4,)
    assert not verdicts.any()


@pytest.mark.slow
def test_decode_block_2d_mesh_accepts_and_rejects():
    """Real proofs on the 2-D mesh: positive accept + exact reject
    (host-math mode; the traced equivalent is the tiny-spec default test)."""
    from plonky2_tpu.proof.fixtures import load_fixture, corrupt_wires_opening
    os.environ["PLONKY2_TPU_HOST_MATH"] = "1"
    try:
        spec, raw, vraw = load_fixture(f"{ROOT}/testdata/decode_block")
        good = serde.ingest_proof(spec, raw, vraw)
        bad = serde.ingest_proof(spec, corrupt_wires_opening(raw), vraw)
        mesh = pmesh.make_mesh_2d(jax.devices(), (2, 4))
        batch = serde.stack_proofs([good, bad])
        verdicts = pmesh.verify_batch_sharded_2d(spec, batch, mesh)
        assert verdicts.tolist() == [True, False]
    finally:
        os.environ.pop("PLONKY2_TPU_HOST_MATH", None)


@pytest.mark.slow
def test_decode_block_sharded_accepts_and_rejects():
    """Real proofs across the mesh: 8 copies of the decode_block proof, one
    per device, with one corrupted -- verdicts must be per-shard exact.

    slow: the full-size circuit under shard_map is a ~30+ minute XLA:CPU
    compile on this 2-core image (measured).  The default gate covers the
    sharded path with the tiny spec (above) and real-proof acceptance with
    the unsharded e2e tests; run `pytest -m slow tests/test_mesh.py` for
    the full cross product."""
    from plonky2_tpu.proof.fixtures import load_fixture, corrupt_wires_opening
    spec, raw, vraw = load_fixture(f"{ROOT}/testdata/decode_block")
    good = serde.ingest_proof(spec, raw, vraw)
    bad = serde.ingest_proof(spec, corrupt_wires_opening(raw), vraw)

    proofs = [good] * 8
    proofs[3] = bad
    batch = serde.stack_proofs(proofs)
    mesh = pmesh.make_mesh(jax.devices())
    verdicts = pmesh.verify_batch_sharded(spec, batch, mesh)
    expected = np.asarray([i != 3 for i in range(8)])
    assert (verdicts == expected).all(), verdicts
