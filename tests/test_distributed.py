"""Multi-host (multi-process) distributed verification tests.

The reference has no distributed runtime (SURVEY.md section 2.4); the
north-star scale-out axis (BASELINE.md: 1 chip -> 1 host -> N hosts) is
proven here on the CPU backend: two OS processes, each its own
"host" with its own local device, wired through jax.distributed + gloo
collectives.  Each process feeds only its local proof shard; the verdict
all_gather must deliver the full global verdict vector to every process --
with a POSITIVE verdict for the valid proof (reference correctness bar:
verifier/verifier_test.go:13-41), not just all-False rejects.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_dist_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_verify(tmp_path):
    """Two jax.distributed processes on localhost verify a 2-proof global
    batch (one valid, one corrupted); both must see verdicts [True, False]
    and psum accept count 1."""
    port = _free_port()
    env = dict(os.environ)
    # the workers manage their own backend config; drop the test session's
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    outs = [str(tmp_path / f"out{i}.json") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i]}"
    for i in range(2):
        with open(outs[i]) as f:
            res = json.load(f)
        assert res["verdicts"] == [True, False], (i, res, logs)
        assert res["n_accept"] == 1, (i, res)
