"""Two-PROCESS multi-host simulation: jax.distributed over localhost,
each process owning half the virtual devices — the closest available
stand-in for the BASELINE N>=2 hosts config (no second host in this
image)."""

import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
WORKER = os.path.join(ROOT, "tests", "support", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_multihost_channelizer():
    port = str(_free_port())
    env = {**os.environ, "PYTHONPATH": ROOT}
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n"
                    + "\n".join(o or "" for o in outs))
    assert all(p.returncode == 0 for p in procs), outs
    assert any("MULTIHOST_OK" in (o or "") for o in outs), outs
