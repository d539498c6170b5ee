"""CLI integration tests (reference tests/core/integration/cli.cc —
spawns the real binary)."""

import json
import os
import subprocess
import sys

import pytest

ENV = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu",
       "PYTHONPATH": os.path.dirname(os.path.dirname(
           os.path.abspath(__file__)))}


def _run(*args, timeout=90):
    return subprocess.run([sys.executable, "-m", "cyberether_tpu",
                           *args], capture_output=True, text=True,
                          env=ENV, timeout=timeout)


def test_cli_no_args_shows_help():
    r = _run()
    assert r.returncode == 2
    assert "usage" in (r.stdout + r.stderr).lower()


def test_cli_info():
    r = _run("info")
    assert r.returncode == 0
    assert "blocks:" in r.stdout


def test_cli_list_blocks():
    r = _run("list", "blocks")
    assert r.returncode == 0
    assert "fft" in r.stdout and "waterfall" in r.stdout


def test_cli_describe():
    r = _run("describe", "filter_taps")
    assert r.returncode == 0
    assert "sampleRate" in r.stdout
    r = _run("describe", "not_a_block")
    assert r.returncode == 1


def test_cli_run_example_and_benchmark():
    r = _run("run", "signal-generator", "--duration", "1.0")
    assert r.returncode == 0, r.stderr[-500:]
    r = _run("benchmark", "window", "--format", "json")
    assert r.returncode == 0, r.stderr[-500:]
    data = json.loads(r.stdout)
    assert data[0]["component"] == "window"


def test_cli_rejects_missing_flowgraph():
    r = _run("run", "/nonexistent/graph.yml", "--duration", "0.1")
    assert r.returncode != 0


def test_cli_benchmark_unknown_component():
    r = _run("benchmark", "nonexistent_xyz")
    assert r.returncode == 1


def test_benchmarks_registered_through_registry():
    """JST_BENCHMARKS cognate (VERDICT r3 item 9): benchmark cases
    live in the component Registry — the CLI, modal and REST all read
    one source, and plugin-origin cases unload with their plugin."""
    from cyberether_tpu import benchmark
    from cyberether_tpu.core.registry import registry

    comps = benchmark.list_components()
    assert "fft" in comps and "channelizer" in comps
    # the registry IS the source
    assert set(comps) <= set(registry.list_benchmarks())
    assert registry.benchmark("fft").cases, "cases live on the entry"

    # plugin-scoped registration unloads with its origin
    with registry.origin("bench-test-plugin"):
        benchmark.register_case(benchmark.Case(
            "zzz_test_only", "v", {}, dict))
    assert "zzz_test_only" in benchmark.list_components()
    removed = registry.unregister_origin("bench-test-plugin")
    assert removed >= 1
    assert "zzz_test_only" not in benchmark.list_components()
