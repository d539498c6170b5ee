"""C++ Superluminal embed (reference include/jetstream/superluminal.hh
:18-211 + examples/jetstream/hello_world.cc): build the native demo
and run it end-to-end — a C++ program owns the IQ buffer, registers a
zero-copy plot, starts the session, mutates + update()s from C++, and
tears down."""

import os
import pathlib
import shutil
import subprocess

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
def test_cpp_hello_world_builds_and_runs():
    build = subprocess.run(
        ["make", "superluminal_demo"], cwd=ROOT / "native",
        capture_output=True, text=True, timeout=300)
    assert build.returncode == 0, build.stderr[-2000:]
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    run = subprocess.run(
        [str(ROOT / "native" / "build" / "superluminal_demo")],
        cwd=ROOT / "native", capture_output=True, text=True,
        timeout=280, env=env)
    assert run.returncode == 0, (run.stdout[-1000:],
                                 run.stderr[-2000:])
    assert "superluminal-cpp-ok" in run.stdout
