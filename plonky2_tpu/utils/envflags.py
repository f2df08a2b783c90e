"""XLA env-flag setup helpers that must run BEFORE jax is imported.

This module deliberately imports nothing heavy (no jax): worker
subprocesses (tests/_dist_worker.py, tools/_scaling_worker.py) import it
first thing to configure the CPU backend flags this image needs (see
tests/conftest.py for the full rationale: level-1 LLVM optimization and a
disabled fusion pass are correctness-speed requirements for XLA:CPU
here).
"""

from __future__ import annotations

import os

CPU_FLAGS = ("--xla_backend_optimization_level=1",
             "--xla_disable_hlo_passes=fusion")


def apply_cpu_xla_flags(extra=()):
    """Merge the CPU-backend XLA flags into os.environ['XLA_FLAGS'],
    keeping any already-set flag of the same name.  Call before the first
    jax import of the process."""
    flags = os.environ.get("XLA_FLAGS", "")
    for f in tuple(CPU_FLAGS) + tuple(extra):
        if f.split("=")[0] not in flags:
            flags = (flags + " " + f).strip()
    os.environ["XLA_FLAGS"] = flags
    return flags
