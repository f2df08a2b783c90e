"""Persistent compilation-cache + platform setup.

The reference caches its expensive artifacts on disk (SRS `srs_setup`,
proving/verifying keys -- benchmark.go:113-158).  The analog here is XLA's
persistent compilation cache: one circuit shape compiles once per machine,
every later process loads the executable from disk.

NOTE this image's sitecustomize.py imports jax at interpreter startup, so
env vars like JAX_COMPILATION_CACHE_DIR set by application code are too late
-- everything must go through jax.config.update before first backend use.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str:
    """Enable the on-disk executable cache (idempotent).  Returns the dir.

    Skipped on the CPU backend: XLA:CPU AOT cache entries on this image
    record target-machine features the loader rejects against the detected
    host features, and the mismatched executable hangs at dispatch.  TPU
    executables have no such host-feature coupling.
    """
    import jax

    if jax.default_backend() == "cpu":
        return ""
    path = path or os.environ.get(
        "PLONKY2_TPU_CACHE_DIR", "/tmp/jax_cache_p2tpu")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def force_cpu(n_virtual_devices: int | None = None) -> None:
    """Force the CPU backend (tests / CI), optionally with N virtual devices.

    Must run before any jax backend is initialized.
    """
    import jax

    flags = os.environ.get("XLA_FLAGS", "")
    if n_virtual_devices and (
            "xla_force_host_platform_device_count" not in flags):
        flags = (flags +
                 f" --xla_force_host_platform_device_count={n_virtual_devices}")
    # see tests/conftest.py: the XLA:CPU fusion emitter is pathological on
    # concat-of-deep-chain graphs on this image; runs are ~2000x faster
    # with the fusion pass disabled.
    if "xla_disable_hlo_passes" not in flags:
        flags = flags + " --xla_disable_hlo_passes=fusion"
    os.environ["XLA_FLAGS"] = flags.strip()
    jax.config.update("jax_platforms", "cpu")
