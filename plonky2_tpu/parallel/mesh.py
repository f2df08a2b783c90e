"""Multi-chip scaling: shard the proof batch (and FRI query rounds) over a
device mesh.

The reference is a single-process library (SURVEY.md section 2.4); scaling
here is TPU-native: the proof batch is the data-parallel axis ("proof"),
sharded with `shard_map` over a `jax.sharding.Mesh`; per-proof verification
is embarrassingly parallel, so the only collective is an all-gather of the
verdict bits (rides ICI).  A second mesh axis ("query") subdivides the
independent FRI query rounds across chips (verify_batch_sharded_2d) for
when the proof batch alone cannot fill a slice; its only collective is a
psum AND-reduction of per-shard verdicts.

Usage:
    mesh = make_mesh()                     # all local devices on axis "proof"
    verdicts = verify_batch_sharded(spec, proof_batch, mesh)

    mesh2 = make_mesh_2d(shape=(4, 2))     # ("proof", "query")
    verdicts = verify_batch_sharded_2d(spec, proof_batch, mesh2)

For multi-host pods use parallel/distributed.py, which composes this over
jax.distributed with per-host shard feeding and verdict collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def _make_shard_map():
    """Version-portable shard_map: the replication-check kwarg was renamed
    check_rep -> check_vma across jax releases, and the symbol moved from
    jax.experimental to jax.  Select by signature, not by import success."""
    import inspect
    try:
        from jax import shard_map as sm
    except ImportError:
        from jax.experimental.shard_map import shard_map as sm
    try:
        params = inspect.signature(sm).parameters
        kw = ("check_vma" if "check_vma" in params
              else "check_rep" if "check_rep" in params else None)
    except (TypeError, ValueError):
        kw = None

    def wrapped(f, mesh, in_specs, out_specs, check_rep=False):
        kwargs = {kw: check_rep} if kw else {}
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  **kwargs)

    return wrapped


shard_map = _make_shard_map()

from ..transcript import challenger as chal
from .. import verifier as _verifier


def make_mesh(devices=None, axis_name="proof"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


@functools.lru_cache(maxsize=8)
def _compiled_sharded(spec, batch_size, mesh, axis_name, mode):
    # `mode` captures trace-time env switches (host-math / pallas) so a
    # toggle within one process retraces instead of reusing a stale
    # executable (the traced graph reads them at trace time).
    schedule = chal.build_schedule(spec)

    def run_shard(dev, obs):
        verdict = _verifier._verify_device(spec, schedule, dev, obs)
        return verdict

    n_dev = mesh.devices.size
    assert batch_size % n_dev == 0, (
        f"padded batch size {batch_size} must divide by mesh size {n_dev}")

    sharded = shard_map(
        run_shard, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_rep=False)
    return jax.jit(sharded), schedule


def pad_batch(proof_batch, multiple):
    """Pad the leading batch axis up to a multiple by repeating lane 0.

    Returns (padded_batch, real_count).  Padding lanes are real proofs, so
    they verify fine; callers slice verdicts back to `real_count`."""
    B = proof_batch["pow_witness"].shape[0]
    pad = (-B) % multiple
    if pad == 0:
        return proof_batch, B
    out = {k: np.concatenate([v, np.repeat(v[:1], pad, axis=0)], axis=0)
           for k, v in proof_batch.items()}
    return out, B


def verify_batch_sharded(spec, proof_batch, mesh, axis_name="proof"):
    """Verify a batched serde dict with the batch axis sharded over `mesh`.

    Uneven batches are padded up to the mesh size with copies of lane 0 and
    the verdict vector sliced back, so any B >= 1 works on any mesh."""
    n_dev = mesh.devices.size
    proof_batch, B = pad_batch(proof_batch, n_dev)
    Bp = proof_batch["pow_witness"].shape[0]
    mode = _verifier._mode_key()
    fn, schedule = _compiled_sharded(spec, Bp, mesh, axis_name, mode)
    obs = _verifier._split_u64(chal.build_observed_host(spec, proof_batch))
    dev = _verifier.proof_to_device(proof_batch)
    return np.asarray(fn(dev, obs))[:B]


# ---------------------------------------------------------------------------
# 2-D mesh: ("proof", "query") -- shard FRI query rounds across chips too
# ---------------------------------------------------------------------------

# serde keys whose axis 1 (after batching) is the FRI query-round axis
_QUERY_AXIS_KEYS = ("init_leaves_0", "init_leaves_1", "init_leaves_2",
                    "init_leaves_3", "init_leaf_packed", "init_siblings")


def _query_keys(spec):
    return _QUERY_AXIS_KEYS + tuple(
        f"step{j}_{part}" for j in range(len(spec.reduction_arity_bits))
        for part in ("evals", "leaf_packed", "siblings"))


def make_mesh_2d(devices=None, shape=None, axis_names=("proof", "query")):
    """2-D mesh over (proof-batch, FRI-query-round) axes.

    Useful when the proof batch alone cannot fill a slice: the 28+
    independent query rounds per proof (reference fri/fri.go:533-547) are a
    second embarrassingly-parallel axis (SURVEY.md section 2.4 row 2)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size, 1)
    return Mesh(devices.reshape(shape), axis_names)


@functools.lru_cache(maxsize=8)
def _compiled_sharded_2d(spec, batch_size, mesh, mode, dev_keys):
    schedule = chal.build_schedule(spec)
    n_proof = mesh.shape["proof"]
    n_query = mesh.shape["query"]
    assert batch_size % n_proof == 0, (batch_size, n_proof)
    assert spec.num_query_rounds % n_query == 0, (
        f"{spec.num_query_rounds} query rounds must divide by the query "
        f"mesh axis {n_query}")

    def run_shard(dev, obs):
        # local verdict: plonk (replicated over "query") AND the local
        # query rounds' FRI checks; a proof is valid iff NO query shard
        # rejects -- one psum of the reject bits across "query".
        v_local = _verifier._verify_device(
            spec, schedule, dev, obs, query_shard=("query", n_query))
        n_bad = jax.lax.psum((~v_local).astype(jnp.int32), "query")
        return n_bad == 0

    # partition specs derived from the ACTUAL device-dict keys (single
    # source of truth = serde/proof_to_device): only the per-query-round
    # arrays carry the "query" axis
    qkeys = set(_query_keys(spec))
    dev_specs = {k: (P("proof", "query") if k in qkeys else P("proof"))
                 for k in dev_keys}
    sharded = shard_map(
        run_shard, mesh=mesh,
        in_specs=(dev_specs, P("proof")),
        out_specs=P("proof"),
        check_rep=False)
    return jax.jit(sharded), schedule


def verify_batch_sharded_2d(spec, proof_batch, mesh):
    """Verify with the proof batch AND the FRI query rounds sharded over a
    2-D ("proof", "query") mesh.  Returns (B,) bool verdicts."""
    n_proof = mesh.shape["proof"]
    proof_batch, B = pad_batch(proof_batch, n_proof)
    Bp = proof_batch["pow_witness"].shape[0]
    obs = _verifier._split_u64(chal.build_observed_host(spec, proof_batch))
    dev = _verifier.proof_to_device(proof_batch)
    fn, schedule = _compiled_sharded_2d(
        spec, Bp, mesh, _verifier._mode_key(), tuple(sorted(dev.keys())))
    return np.asarray(fn(dev, obs))[:B]
