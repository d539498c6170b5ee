#!/usr/bin/env python
"""Benchmark driver: 64-channel FM channelizer+demod throughput on one
chip.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: BASELINE.json north star — >1 Gsamp/s aggregate on v5e-16
== 62.5 Msamp/s per chip.  vs_baseline = per-chip samples/s / 62.5e6.

Extra configs (spectrum, WBFM) are reported on stderr for the record.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import numpy as np

import jax

# NOTE: do NOT enable the persistent compilation cache here — the axon
# backend cannot deserialize cached executables (UNIMPLEMENTED), so a
# populated cache poisons every subsequent program.  Opt in explicitly
# with CYBERETHER_JAX_CACHE_DIR on backends that support it.
if os.environ.get("CYBERETHER_JAX_CACHE_DIR"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["CYBERETHER_JAX_CACHE_DIR"])

BASELINE_PER_CHIP = 62.5e6   # 1 Gsamp/s / 16 chips (v5e-16)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_steps(fn, make_args, steps: int, warmup: int = 3):
    """Median-of-runs steady-state timing with donation-safe arg
    regeneration."""
    args = make_args()
    for _ in range(warmup):
        out = fn(*args)
        args = regen(out, args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
        args = regen(out, args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def regen(out, args):
    """If fn returns (y, state) thread state; else keep args."""
    if isinstance(out, tuple) and len(out) == 2 and \
            isinstance(out[1], dict):
        return (out[1],) + tuple(args[1:])
    return args


def bench_channelizer() -> float:
    from cyberether_tpu.models.channelizer import Channelizer

    model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
    frames = 1 << 17                       # 8.4 Msamp per step
    iq = jax.device_put(model.make_input(frames))
    step = model.jitted_step()

    state = model.init_state()
    t0 = time.perf_counter()
    audio, state = step(state, iq)
    jax.block_until_ready(audio)
    log(f"channelizer first-step (compile) {time.perf_counter()-t0:.1f}s")

    def fn(state, iq):
        return step(state, iq)

    dt = time_steps(fn, lambda: (model.init_state(), iq), steps=10)
    samples = frames * model.channels
    rate = samples / dt
    log(f"channelizer: {rate/1e6:.1f} Msamp/s/chip "
        f"({dt*1e3:.2f} ms / {samples/1e6:.1f} Msamp)")
    return rate


def bench_spectrum() -> float:
    from cyberether_tpu.models.spectrum import SpectrumPipeline

    best = 0.0
    # batches=4096 (8.4 Msamp/step): at 512 every variant plateaued at
    # ~378 MS/s == the per-dispatch tunnel floor, not compute
    for mxu, fast in ((False, False), (True, True)):
        pipe = SpectrumPipeline(fft_size=2048, batches=4096,
                                use_mxu_fft=mxu, fast_math=fast)
        iq = jax.device_put(pipe.make_input())
        step = pipe.jitted_step()
        out = step(iq)
        jax.block_until_ready(out)
        dt = time_steps(lambda iq: step(iq), lambda: (iq,), steps=10)
        rate = pipe.batches * pipe.fft_size / dt
        log(f"spectrum[{'mxu' if mxu else 'xla'}-fft"
            f"{'+fastmath' if fast else ''}]: "
            f"{rate/1e6:.1f} Msamp/s/chip")
        best = max(best, rate)
    return best


def bench_spectrum_pallas() -> float:
    from cyberether_tpu.models.spectrum import SpectrumPipeline

    pipe = SpectrumPipeline(fft_size=2048, batches=4096)
    iq = jax.device_put(pipe.make_input())
    best = 0.0
    for name, step in (
            ("pallas-f32", pipe.jitted_step_pallas()),
            ("pallas-bf16", pipe.jitted_step_pallas(bf16=True)),
            ("dft-f32", pipe.jitted_step_dft()),
            ("dft-bf16", pipe.jitted_step_dft(bf16=True))):
        try:
            out = step(iq)
            jax.block_until_ready(out)
            dt = time_steps(lambda iq: step(iq), lambda: (iq,),
                            steps=10)
            rate = pipe.batches * pipe.fft_size / dt
            log(f"spectrum[{name}]: {rate/1e6:.1f} Msamp/s/chip")
            best = max(best, rate)
        except Exception as e:
            msg = re.sub(r"\\x1b\[[0-9;]*m", "", repr(e))
            m = re.search(
                r"(Mosaic[^\\]{0,400}|tpu\.[a-z_]+[^\\]{0,300})",
                msg)
            log(f"spectrum[{name}] failed:",
                m.group(0) if m else msg[:300])
    return best


def bench_wbfm() -> float:
    from cyberether_tpu.models.wbfm import WbfmReceiver

    best = 0.0
    for impl, fast in (("pallas", True), ("fft", True),
                       ("conv", False)):
        rx = WbfmReceiver(fir_impl="conv" if impl == "pallas" else impl,
                          fast_atan2=fast)
        # ~8.4 Msamp, divisible by decim (40) and by 128*512 so the
        # pallas row grid tiles at full tile_r
        n = 8_192_000
        iq = jax.device_put(rx.make_input(n))
        step = rx.jitted_step_pallas() if impl == "pallas" \
            else rx.jitted_step()
        audio, st = step(rx.init_state(), iq)
        jax.block_until_ready(audio)
        dt = time_steps(lambda s, iq: step(s, iq),
                        lambda: (rx.init_state(), iq), steps=10)
        rate = n / dt
        log(f"wbfm[{impl}{'+fastatan' if fast else ''}]: "
            f"{rate/1e6:.1f} Msamp/s/chip")
        best = max(best, rate)
    return best


def bench_channelizer_pallas() -> float:
    from cyberether_tpu.models.channelizer import Channelizer

    model = Channelizer(channels=64, taps_per_branch=8, audio_decim=16)
    frames = 1 << 17
    iq = jax.device_put(model.make_input(frames))
    step = model.jitted_step_pallas()
    audio, st = step(model.init_state(), iq)
    jax.block_until_ready(audio)
    dt = time_steps(lambda s, iq: step(s, iq),
                    lambda: (model.init_state(), iq), steps=10)
    rate = frames * model.channels / dt
    log(f"channelizer-pallas: {rate/1e6:.1f} Msamp/s/chip")
    return rate


def bench_flowgraph() -> float:
    """Compiled-graph throughput including the host dispatch loop: the
    spectrum-analyzer graph fed by a dti source (framework overhead on
    top of the raw model = the scheduler's cost)."""
    import numpy as np

    from cyberether_tpu import Flowgraph

    rng = np.random.default_rng(0)
    # big enough that the tunnel's ~2.3 ms/dispatch floor amortizes
    nb, n = 512, 2048
    # real-valued source: keeps the host->device boundary on float32
    # (the axon backend cannot transfer complex64); the engine's cast
    # promotes to CF32 on device
    buf = rng.standard_normal((nb, n)).astype(np.float32)
    fg = Flowgraph()
    fg.block_create("src", "dti", {"shape": [nb, n],
                                   "dataType": "F32"})
    fg.records["src"].build.modules["src/m"].attach_buffer(buf)
    fg.block_create("spec", "spectrum_engine", {"enableScale": True},
                    {"buffer": "${graph.src.output.buffer}"})
    try:
        for _ in range(3):
            ok = fg.compute(timeout=10.0)
        errored = {b: fg.block_error(b) for b in fg.records
                   if fg.block_state(b).value != "complete"}
        if not ok or errored:
            raise RuntimeError(f"flowgraph did not run: {errored}")
        fg.scheduler.synchronize()
        t0 = time.perf_counter()
        steps = 20
        for _ in range(steps):
            fg.compute(timeout=10.0)
        fg.scheduler.synchronize()
        dt = (time.perf_counter() - t0) / steps
        rate = nb * n / dt
        log(f"flowgraph spectrum: {rate/1e6:.1f} Msamp/s "
            f"({dt*1e3:.2f} ms/cycle incl. host loop)")
        # burst mode: k cycles per dispatch (lax.scan over the cycle
        # axis) — the dispatch-floor amortization path
        k = 16
        fg.compute_burst(k, timeout=10.0)   # compile scan
        fg.scheduler.synchronize()
        t0 = time.perf_counter()
        for _ in range(4):
            assert fg.compute_burst(k, timeout=10.0) == k
        fg.scheduler.synchronize()
        dtb = (time.perf_counter() - t0) / (4 * k)
        rb = nb * n / dtb
        log(f"flowgraph burst[{k}]: {rb/1e6:.1f} Msamp/s "
            f"({dtb*1e3:.2f} ms/cycle)")
        return max(rate, rb)
    finally:
        fg.stop()


def main() -> None:
    log("devices:", jax.devices())
    results = {}
    # primary metric FIRST: a failure in any secondary bench can wedge
    # the axon client for the rest of the process
    rate = 0.0
    try:
        rate = bench_channelizer()
        results["channelizer"] = rate
    except Exception as e:
        log("channelizer bench failed:", repr(e))
    try:
        pallas_rate = bench_channelizer_pallas()
        results["channelizer_pallas"] = pallas_rate
        rate = max(rate, pallas_rate)
    except Exception as e:
        log("pallas channelizer bench failed:", repr(e))
    if rate == 0.0:
        log("FATAL: no channelizer measurement")
    try:
        results["spectrum"] = bench_spectrum()
    except Exception as e:
        log("spectrum bench failed:", repr(e))
    try:
        results["spectrum_pallas"] = bench_spectrum_pallas()
    except Exception as e:
        log("spectrum-pallas bench failed:", repr(e))
    try:
        results["wbfm"] = bench_wbfm()
    except Exception as e:
        log("wbfm bench failed:", repr(e))
    try:
        results["flowgraph"] = bench_flowgraph()
    except Exception as e:
        log("flowgraph bench failed:", repr(e))

    print(json.dumps({
        "metric": "channelizer64_fm_samples_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(rate / BASELINE_PER_CHIP, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
