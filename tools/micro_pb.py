"""Microbenchmark: Poseidon-BN254 permutation throughput on the default device.

Measures chains of sequential permutations over a wide lane batch -- the
shape of the Merkle/leaf hashing inside FRI verification (the reference's
dominant cost, fri/fri.go:97-157) -- at two chain lengths, with full
device_get synchronization, so async-dispatch artifacts can't fake the
numbers: real compute scales with chain length.

PLONKY2_TPU_PB_KERNEL=0 forces the portable jnp path; =1 the Pallas kernel.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

from plonky2_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp
import numpy as np

from plonky2_tpu.fields import bn254
from plonky2_tpu.hash import poseidon_bn254 as pb

LANES = int(os.environ.get("LANES", str(32 * 28 * 4)))

rng = np.random.default_rng(0)
state_ints = rng.integers(0, 1 << 62, size=(LANES, 4))
state = np.zeros((LANES, 4, 16), np.uint32)
for i in range(LANES):
    for j in range(4):
        state[i, j] = bn254.int_to_mont_limbs(int(state_ints[i, j]))
state = jnp.asarray(state)


def make_chain(steps):
    @jax.jit
    def chain(st):
        def body(s, _):
            return pb.permute(s), None
        out, _ = jax.lax.scan(body, st, None, length=steps)
        return out
    return chain


def run(steps):
    chain = make_chain(steps)
    t0 = time.time()
    out = jax.device_get(chain(state))
    first = time.time() - t0
    times = []
    for _ in range(2):
        t0 = time.time()
        out = jax.device_get(chain(state))
        times.append(time.time() - t0)
    best = min(times)
    print(f"steps={steps:3d} first(+compile)={first:8.2f}s best={best:8.4f}s "
          f"perms/s={LANES*steps/best:,.0f}", flush=True)
    return out, best


print(f"device={jax.devices()[0]} lanes={LANES} "
      f"kernel={pb._use_pallas()}", flush=True)
out5, t5 = run(5)
out25, t25 = run(25)
print(f"# scaling check: t25/t5 = {t25/max(t5,1e-9):.2f} (expect ~5 if real)")
