"""Test configuration: force an 8-device virtual CPU mesh.

Tests always run on CPU (deterministic, no TPU needed); multi-chip sharding
tests use the 8 virtual devices.  Must set env vars before jax imports.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the sandbox presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# CPU runs only need correctness: level-1 LLVM optimization cuts XLA:CPU
# compile time of the big integer graphs here by >10x (the default pipeline
# spends minutes on them).  Level 0 is NOT usable: executables built at
# level 0 hang at dispatch on this image (same class of bug as the AOT-cache
# note below).
if "xla_backend_optimization_level" not in flags:
    flags = flags + " --xla_backend_optimization_level=1"
# Disabling the fusion pass is a ~2000x RUNTIME win on this image: the
# XLA:CPU fusion emitter executes any concatenate whose operands are deep
# fused chains pathologically (measured 4.8s/permutation -> 2ms without
# fusion; optimization_barrier does NOT help).  Per-op thunk overhead
# without fusion is negligible at test shapes.
if "xla_disable_hlo_passes" not in flags:
    flags = flags + " --xla_disable_hlo_passes=fusion"
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NOTE: this image's sitecustomize.py imports jax at interpreter startup (to
# register the axon TPU plugin), so the env vars above are too late for jax's
# config defaults -- everything must go through jax.config.update, before any
# backend is initialized.  Without the platform override, tests would compile
# over the remote axon tunnel (minutes per compile).
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable the persistent compilation cache for CPU test runs.
# XLA:CPU AOT cache entries on this image record target-machine features
# (+prefer-no-scatter/+prefer-no-gather) that the loader rejects against the
# detected host features, and the mismatched executable hangs at dispatch.
