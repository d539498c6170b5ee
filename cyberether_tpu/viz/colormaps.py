"""Colormaps for plot surfaces.

The reference ships a turbo LUT for its lineplot/waterfall shaders
(/root/reference/src/domains/visualization/lineplot/module_impl.cc turbo
LUT).  Here the LUT is generated from the published turbo polynomial
approximation (Google AI blog, public domain reference implementation).
"""

from __future__ import annotations

import numpy as np

_TURBO_R = np.array([0.13572138, 4.61539260, -42.66032258, 132.13108234,
                     -152.94239396, 59.28637943])
_TURBO_G = np.array([0.09140261, 2.19418839, 4.84296658, -14.18503333,
                     4.27729857, 2.82956604])
_TURBO_B = np.array([0.10667330, 12.64194608, -60.58204836, 110.36276771,
                     -89.90310912, 27.34824973])


def _poly(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    v = np.zeros_like(x)
    for i in range(len(c) - 1, -1, -1):
        v = v * x + c[i]
    return v


def turbo_lut(size: int = 256) -> np.ndarray:
    """(size, 3) uint8 turbo LUT."""
    x = np.linspace(0.0, 1.0, size)
    rgb = np.stack([_poly(x, _TURBO_R), _poly(x, _TURBO_G),
                    _poly(x, _TURBO_B)], axis=-1)
    return (np.clip(rgb, 0.0, 1.0) * 255).astype(np.uint8)


_LUT256 = turbo_lut(256)


def apply_colormap(norm: np.ndarray, lut: np.ndarray = None) -> np.ndarray:
    """Map [0,1] values to RGBA uint8 using the turbo LUT.

    Runs through the native rasterizer (native/ceruntime.cc
    ce_colormap — the host-side leg of the present path, called per
    frame for every streamed surface) when the library is available;
    numpy fallback otherwise."""
    lut = _LUT256 if lut is None else lut
    try:
        from cyberether_tpu.io.native import colormap_rgba

        out = colormap_rgba(norm, lut)
        if out is not None:
            return out
    except Exception:   # pragma: no cover — fallback is identical
        pass
    idx = np.clip((np.nan_to_num(norm, nan=0.0, posinf=1.0, neginf=0.0)
                   * (len(lut) - 1)).astype(np.int32), 0, len(lut) - 1)
    rgb = lut[idx]
    alpha = np.full(rgb.shape[:-1] + (1,), 255, np.uint8)
    return np.concatenate([rgb, alpha], axis=-1)
