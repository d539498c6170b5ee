"""Custom drawing with the retained canvas widget — the analog of the
reference's Sakura Retained::Canvas usage (an app-owned draw surface
beside the plot panels;
include/jetstream/render/sakura/components/retained/canvas.hh).

Draws a live oscilloscope-style trace plus overlay text into a canvas
panel while a normal spectrum plot runs beside it.

Run:  python examples/canvas_scope.py
"""

import numpy as np

import cyberether_tpu.superluminal as lm

N = 2048
buf = np.zeros(N, np.complex64)
phase = {"t": 0}


def draw_scope(dl, layout):
    w, h = layout["framebufferSize"]
    dl.clear("#0b0b12")
    mid = h / 2
    dl.line(0, mid, w - 1, mid, "#334", 1)
    xs = np.linspace(0, w - 1, 256)
    sig = np.real(buf[:: max(N // 256, 1)][:256])
    ys = mid - sig * (h * 0.4)
    dl.polyline(list(zip(xs, ys)), "#4be", 2)
    dl.text(6, 4, f"frame {phase['t']}", "#9ab")


lm.initialize({})
lm.plot(buf, lm.line, label="signal")
lm.canvas("scope", size=(512, 200), draw=draw_scope)
lm.start()

for k in range(20):
    phase["t"] = k
    t = np.arange(N) / N
    buf[:] = np.exp(2j * np.pi * (8 + k) * t).astype(np.complex64)
    lm.update()

frames = lm.present()
assert "canvas0" in frames, sorted(frames)
print("canvas frame:", frames["canvas0"]["frame"].shape)
lm.stop()
lm.terminate()
