"""Test configuration: force an 8-device virtual CPU mesh.

Tests always run on CPU (deterministic, no TPU needed); multi-chip sharding
tests use the 8 virtual devices.  Must set env vars before jax imports.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the sandbox presets JAX_PLATFORMS=axon
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_p2tpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
