"""Multi-chip / multi-host scaling: shard the proof batch over a device mesh.

The reference is a single-process library (SURVEY.md section 2.4); scaling
here is TPU-native: the proof batch is the data-parallel axis ("proof"),
sharded with `shard_map` over a `jax.sharding.Mesh`; per-proof verification
is embarrassingly parallel, so the only collective is an all-gather of the
verdict bits (rides ICI).  Optionally a second mesh axis ("query") can
subdivide FRI query rounds across chips -- round 1 exposes the proof axis.

Usage:
    mesh = make_mesh()                     # all local devices on axis "proof"
    verdicts = verify_batch_sharded(spec, proof_batch, mesh)

For multi-host pods, call jax.distributed.initialize() first; each host
feeds its local shard of the batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=check_rep)
except ImportError:  # older jax: experimental API (check_rep kwarg)
    from jax.experimental.shard_map import shard_map

from ..transcript import challenger as chal
from .. import verifier as _verifier


def make_mesh(devices=None, axis_name="proof"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


@functools.lru_cache(maxsize=8)
def _compiled_sharded(spec, batch_size, mesh, axis_name):
    schedule = chal.build_schedule(spec)

    def run_shard(dev, obs):
        verdict = _verifier._verify_device(spec, schedule, dev, obs)
        return verdict

    n_dev = mesh.devices.size
    assert batch_size % n_dev == 0, (
        f"batch size {batch_size} must divide by mesh size {n_dev}")

    sharded = shard_map(
        run_shard, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_rep=False)
    return jax.jit(sharded), schedule


def verify_batch_sharded(spec, proof_batch, mesh, axis_name="proof"):
    """Verify a batched serde dict with the batch axis sharded over `mesh`."""
    B = proof_batch["pow_witness"].shape[0]
    fn, schedule = _compiled_sharded(spec, B, mesh, axis_name)
    obs = _verifier._split_u64(chal.build_observed_host(spec, proof_batch))
    dev = _verifier.proof_to_device(proof_batch)
    return np.asarray(fn(dev, obs))
