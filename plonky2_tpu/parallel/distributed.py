"""Multi-host distributed verification runtime.

The reference is a single-process library (SURVEY.md section 2.4); this is
the TPU-native scale-out path (BASELINE.md north star: 1 chip -> 1 host ->
N hosts at >= 80% scaling efficiency):

- `initialize()` wires `jax.distributed` (coordinator + process grid); on
  the CPU backend it selects the gloo collectives implementation so the
  same code path runs as a multi-process localhost test
  (tests/test_distributed.py) before it ever sees a pod slice.
- Each host feeds ONLY its local shard of the proof batch
  (`feed_local_batch` -> `jax.make_array_from_process_local_data`); no host
  ever materializes the global batch.
- Verification itself is embarrassingly parallel over the "proof" mesh
  axis; the only cross-host traffic is the verdict collective
  (`lax.all_gather` of the per-proof verdict bits + a `lax.psum` of the
  accept count), which rides ICI within a slice / DCN across slices.
  Verification is read-only -- there is no gradient-style traffic.

Single-process use is unchanged: parallel/mesh.py already covers the
one-host multi-chip case; this module composes it across processes.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..transcript import challenger as chal
from .. import verifier as _verifier
from .mesh import shard_map, pad_batch


def initialize(coordinator_address=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Wire up the jax.distributed runtime for multi-host verification.

    Arguments default to the standard env vars jax reads (JAX_COORDINATOR_
    ADDRESS etc.); on TPU pods all of them are auto-detected and calling
    initialize() with no args is correct.  On the CPU backend the gloo
    collectives implementation is selected (the default cross-process CPU
    transport available on this image).  Idempotent per process.
    """
    if _is_initialized():
        return  # already wired
    # NOTE: must not touch the XLA backend before jax.distributed.initialize
    # (jax.devices()/default_backend() would initialize it), so the platform
    # check reads config/env only.
    platforms = (getattr(jax.config, "jax_platforms", None)
                 or os.environ.get("JAX_PLATFORMS", "") or "")
    if platforms.startswith("cpu"):
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass  # older jax: gloo is the only impl / flag absent
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(**kwargs)


def _is_initialized():
    try:
        from jax._src import distributed as _d
        return _d.global_state.client is not None
    except Exception:
        return False


def global_mesh(axis_name="proof"):
    """1-D mesh over ALL devices in the job (local + remote processes)."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))


def feed_local_batch(spec, local_batch, mesh, axis_name="proof"):
    """Per-host shard feeding: this process's serde batch -> global arrays.

    `local_batch` holds this host's proofs only (B_local = B_global /
    process_count, equal on every host).  Returns (dev, obs) pytrees of
    global jax.Arrays whose addressable shards are exactly this host's
    data -- nothing is gathered.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def globalize(x):
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    obs_np = chal.build_observed_host(spec, local_batch)
    obs = jax.tree.map(globalize, _verifier._split_u64_np(obs_np))
    dev = jax.tree.map(globalize, _verifier.proof_to_device_np(local_batch))
    return dev, obs


@functools.lru_cache(maxsize=8)
def _compiled_distributed(spec, global_batch, mesh, axis_name, mode):
    schedule = chal.build_schedule(spec)
    n_dev = mesh.devices.size
    assert global_batch % n_dev == 0, (global_batch, n_dev)

    def run_shard(dev, obs):
        verdict = _verifier._verify_device(spec, schedule, dev, obs)
        # verdict collective (SURVEY.md section 2.4 row 5): every device --
        # hence every host -- ends up with the full (B_global,) verdict
        # vector and the global accept count, in one all_gather + psum.
        all_verdicts = jax.lax.all_gather(verdict, axis_name, tiled=True)
        n_accept = jax.lax.psum(jnp.sum(verdict.astype(jnp.int32)), axis_name)
        return all_verdicts, n_accept

    sharded = shard_map(
        run_shard, mesh=mesh,
        in_specs=(P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_rep=False)
    return jax.jit(sharded), schedule


def verify_batch_distributed(spec, local_batch, mesh=None, axis_name="proof"):
    """Verify a globally-sharded proof batch; every host gets all verdicts.

    Each process passes its LOCAL serde batch (the SAME size on every host
    -- the global layout is [host0 lanes | host1 lanes | ...]).  Uneven
    local batches are padded to the local device count with copies of lane
    0; padding lanes are sliced out of each host's segment before
    returning, so verdict indices match the caller's proofs.

    Returns (verdicts, n_accept): the full global (B_real_global,) bool
    vector (identical on every host, via the all_gather collective) and
    the global accept count over the real lanes only.
    """
    mesh = mesh if mesh is not None else global_mesh(axis_name)
    n_local_dev = jax.local_device_count()
    local_batch, B_real = pad_batch(local_batch, n_local_dev)
    B_local = local_batch["pow_witness"].shape[0]
    nproc = jax.process_count()
    B_global = B_local * nproc
    mode = _verifier._mode_key()
    fn, _ = _compiled_distributed(spec, B_global, mesh, axis_name, mode)
    dev, obs = feed_local_batch(spec, local_batch, mesh, axis_name)
    verdicts, _ = fn(dev, obs)
    # drop each host's padding lanes (every host padded identically, per
    # the same-local-size contract)
    verdicts = np.asarray(verdicts).reshape(nproc, B_local)[:, :B_real]
    verdicts = verdicts.reshape(-1)
    return verdicts, int(verdicts.sum())
