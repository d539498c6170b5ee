"""Multi-host time-block ingest pipeline (BASELINE config 5, VERDICT r3
item 5): sustained N-process streaming with host-local ingest shards,
ordered reassembly, and a throughput/scaling-efficiency measurement."""

import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
WORKER = os.path.join(ROOT, "tests", "support", "timeblock_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run(num_procs: int, mode: str, timeout=240):
    env = {**os.environ, "PYTHONPATH": ROOT}
    env.pop("XLA_FLAGS", None)
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(num_procs), port, mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env=env) for i in range(num_procs)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("timeblock workers timed out:\n"
                    + "\n".join(o or "" for o in outs))
    assert all(p.returncode == 0 for p in procs), outs
    return outs


@pytest.mark.slow
def test_two_process_ordered_reassembly():
    outs = _run(2, "check")
    assert any("TIMEBLOCK_OK" in (o or "") for o in outs), outs


@pytest.mark.slow
def test_scaling_efficiency_1_to_2_procs():
    """The committed bench emitting {cycles/s, efficiency} for 1 -> 2
    processes (VERDICT r3 item 5 'done' bar).  Both configs run the
    same global mesh size per process count; on one shared CPU the
    efficiency number is informational (printed), the assertion is
    that the measurement machinery produces coherent stats."""
    def stats_of(outs):
        for o in outs:
            for line in (o or "").splitlines():
                if line.startswith("TIMEBLOCK_STATS "):
                    return json.loads(line[len("TIMEBLOCK_STATS "):])
        raise AssertionError(f"no stats line in {outs}")

    s1 = stats_of(_run(1, "measure"))
    s2 = stats_of(_run(2, "measure"))
    from cyberether_tpu.parallel.timeblock import scaling_efficiency

    eff = scaling_efficiency(s2["samples_per_s"], s1["samples_per_s"],
                             1)   # same-total-work strong scaling
    print(f"\n1-proc: {s1['samples_per_s']/1e6:.1f} Msamp/s  "
          f"2-proc: {s2['samples_per_s']/1e6:.1f} Msamp/s  "
          f"efficiency: {eff:.2f}")
    assert s1["cycles_per_s"] > 0 and s2["cycles_per_s"] > 0
    assert s2["processes"] == 2 and s1["processes"] == 1


def test_measure_device_scaling_decomposition():
    """The scaling measurement reports both the naive efficiency and
    the shared-hardware-normalized proxy efficiency with the fixed-
    overhead/compute decomposition (VERDICT r4 item 2).  Tiny shapes —
    this checks the machinery, not the committed number."""
    from cyberether_tpu.parallel.timeblock import (
        _fit_cycle_cost, measure_device_scaling)

    # exact fit on synthetic points: t = 2e-3 + 5e-9 * samples
    a, b = _fit_cycle_cost([(1e6, 2e-3 + 5e-9 * 1e6),
                            (4e6, 2e-3 + 5e-9 * 4e6),
                            (16e6, 2e-3 + 5e-9 * 16e6)])
    assert abs(a - 2e-3) < 1e-6 and abs(b - 5e-9) < 1e-12

    stats = measure_device_scaling(n_devices=2, frames=256,
                                   sweep=(1, 2))
    for key in ("efficiency", "proxy_efficiency", "shared_hardware",
                "overhead_ms_n", "ns_per_sample_n",
                "compute_fraction_n", "sweep"):
        assert key in stats, key
    assert stats["shared_hardware"] is True      # CPU conftest
    assert stats["proxy_efficiency"] > 0
    assert len(stats["sweep"]) == 4              # 2 meshes x 2 sizes
    assert 0 < stats["compute_fraction_n"] <= 1.0
