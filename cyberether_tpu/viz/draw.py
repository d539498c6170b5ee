"""Host-side immediate-mode 2D rasterizer backing the retained Canvas
widget (reference cognate:
include/jetstream/render/sakura/components/retained/canvas.hh:13-43 —
an app-owned drawing surface with a framebuffer-layout callback; the
reference records draw commands into ImGui draw lists on the GPU, here
they rasterize host-side to an RGBA frame that rides the normal
surface stream).

Primary backend is Pillow's ``ImageDraw`` (the same optional
dependency the remote codecs use); a pure-numpy fallback covers the
shape primitives when PIL is absent (text is skipped there — the
fallback exists so headless pipelines never hard-require PIL).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

try:                                           # optional, like codecs
    from PIL import Image, ImageDraw, ImageFont
    _HAS_PIL = True
except Exception:                              # pragma: no cover
    _HAS_PIL = False

Color = Tuple[int, int, int, int]


def _color(c) -> Color:
    """Accept (r,g,b), (r,g,b,a), '#rgb'/'#rgba' CSS shorthand, or
    '#rrggbb'/'#rrggbbaa'."""
    if isinstance(c, str):
        s = c.lstrip("#")
        if len(s) in (3, 4):             # CSS shorthand: #9ab = #99aabb
            s = "".join(ch * 2 for ch in s)
        v = [int(s[i:i + 2], 16) for i in range(0, len(s), 2)]
        return tuple(v + [255] * (4 - len(v)))[:4]
    c = tuple(int(x) for x in c)
    return (c + (255,) * (4 - len(c)))[:4]


class DrawList:
    """A drawing surface: create, issue commands, read ``.rgba``.

    ``layout`` mirrors the reference Canvas layout callback payload
    (framebufferSize + pixelRatio) so draw callbacks can adapt to the
    panel size.
    """

    def __init__(self, width: int, height: int,
                 clear_color=(0, 0, 0, 255),
                 pixel_ratio: float = 1.0) -> None:
        self.width = int(width)
        self.height = int(height)
        self.pixel_ratio = float(pixel_ratio)
        self._clear = _color(clear_color)
        if _HAS_PIL:
            self._img = Image.new(
                "RGBA", (self.width, self.height), self._clear)
            self._draw = ImageDraw.Draw(self._img)
            try:
                self._font = ImageFont.load_default()
            except Exception:               # pragma: no cover
                self._font = None
        else:                               # pragma: no cover
            self._buf = np.zeros((self.height, self.width, 4), np.uint8)
            self._buf[:] = self._clear

    # -- introspection -------------------------------------------------
    @property
    def layout(self) -> Dict[str, Any]:
        return {"framebufferSize": (self.width, self.height),
                "pixelRatio": self.pixel_ratio}

    @property
    def rgba(self) -> np.ndarray:
        if _HAS_PIL:
            return np.asarray(self._img, dtype=np.uint8)
        return self._buf.copy()             # pragma: no cover

    # -- commands ------------------------------------------------------
    def clear(self, color=None) -> None:
        c = self._clear if color is None else _color(color)
        if _HAS_PIL:
            self._draw.rectangle(
                [0, 0, self.width - 1, self.height - 1], fill=c)
        else:                               # pragma: no cover
            self._buf[:] = c

    def rect(self, x: float, y: float, w: float, h: float, color,
             fill: bool = True, thickness: int = 1) -> None:
        c = _color(color)
        if _HAS_PIL:
            box = [x, y, x + w - 1, y + h - 1]
            if fill:
                self._draw.rectangle(box, fill=c)
            else:
                self._draw.rectangle(box, outline=c, width=thickness)
            return
        self._np_rect(x, y, w, h, c, fill, thickness)  # pragma: no cover

    def line(self, x0: float, y0: float, x1: float, y1: float, color,
             thickness: int = 1) -> None:
        c = _color(color)
        if _HAS_PIL:
            self._draw.line([x0, y0, x1, y1], fill=c, width=thickness)
            return
        self._np_line(x0, y0, x1, y1, c, thickness)    # pragma: no cover

    def polyline(self, points: Sequence[Tuple[float, float]], color,
                 thickness: int = 1, closed: bool = False) -> None:
        pts = list(points)
        if closed and pts:
            pts.append(pts[0])
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            self.line(x0, y0, x1, y1, color, thickness)

    def circle(self, cx: float, cy: float, r: float, color,
               fill: bool = False, thickness: int = 1) -> None:
        c = _color(color)
        if _HAS_PIL:
            box = [cx - r, cy - r, cx + r, cy + r]
            if fill:
                self._draw.ellipse(box, fill=c)
            else:
                self._draw.ellipse(box, outline=c, width=thickness)
            return
        # fallback: coarse polyline circle
        ang = np.linspace(0, 2 * np.pi, 33)            # pragma: no cover
        self.polyline(list(zip(cx + r * np.cos(ang),
                               cy + r * np.sin(ang))), c,
                      thickness)                       # pragma: no cover

    def text(self, x: float, y: float, s: str, color,
             size: int = 1) -> None:
        """Bitmap text at (x, y) top-left; ``size`` is an integer
        scale of the base bitmap font."""
        if not _HAS_PIL or self._font is None:         # pragma: no cover
            return
        c = _color(color)
        if size <= 1:
            self._draw.text((x, y), s, fill=c, font=self._font)
            return
        # integer-upscale the base font for crisp large labels
        w, h = self._draw.textbbox((0, 0), s, font=self._font)[2:]
        if w <= 0 or h <= 0:
            return
        tmp = Image.new("RGBA", (w, h), (0, 0, 0, 0))
        ImageDraw.Draw(tmp).text((0, 0), s, fill=c, font=self._font)
        tmp = tmp.resize((w * size, h * size), Image.NEAREST)
        self._img.alpha_composite(tmp, (int(x), int(y)))

    def image(self, x: int, y: int, rgba: np.ndarray) -> None:
        """Blit an (h, w, 4) uint8 array."""
        arr = np.asarray(rgba, np.uint8)
        if _HAS_PIL:
            self._img.alpha_composite(
                Image.fromarray(arr, "RGBA"), (int(x), int(y)))
            return
        h, w = arr.shape[:2]                           # pragma: no cover
        y2, x2 = min(y + h, self.height), min(x + w, self.width)
        self._buf[y:y2, x:x2] = arr[:y2 - y, :x2 - x]  # pragma: no cover

    # -- numpy fallbacks (no PIL) -------------------------------------
    def _np_rect(self, x, y, w, h, c, fill, t):        # pragma: no cover
        x0, y0 = max(int(x), 0), max(int(y), 0)
        x1 = min(int(x + w), self.width)
        y1 = min(int(y + h), self.height)
        if x1 <= x0 or y1 <= y0:
            return
        if fill:
            self._buf[y0:y1, x0:x1] = c
        else:
            self._buf[y0:min(y0 + t, y1), x0:x1] = c
            self._buf[max(y1 - t, y0):y1, x0:x1] = c
            self._buf[y0:y1, x0:min(x0 + t, x1)] = c
            self._buf[y0:y1, max(x1 - t, x0):x1] = c

    def _np_line(self, x0, y0, x1, y1, c, t):          # pragma: no cover
        n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
        xs = np.linspace(x0, x1, n).round().astype(int)
        ys = np.linspace(y0, y1, n).round().astype(int)
        r = max(t // 2, 0)
        for dx in range(-r, r + 1):
            for dy in range(-r, r + 1):
                xi = np.clip(xs + dx, 0, self.width - 1)
                yi = np.clip(ys + dy, 0, self.height - 1)
                self._buf[yi, xi] = c
