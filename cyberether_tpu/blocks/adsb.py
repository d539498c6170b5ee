"""adsb — Mode-S/ADS-B decoder block.

Reference: /root/reference/src/domains/dsp/adsb/ (libmodes decode of a
2 MS/s CF32 stream, SURFACE module feeding the geomap flight tracker).

Here the magnitude computation happens wherever the input lives (the
scheduler fuses it upstream when the producer is a device segment) and
the bit-level decoding runs host-side
(:mod:`cyberether_tpu.ops.modes`); ``present_data`` exposes the
aircraft table for the map surface / web UI.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from cyberether_tpu.blocks.dsp import resolve_signal_axes
from cyberether_tpu.core.block import simple_block
from cyberether_tpu.core.module import Module
from cyberether_tpu.core.params import Field, Schema
from cyberether_tpu.core.registry import register_block, register_module
from cyberether_tpu.core.tensor import TensorSpec
from cyberether_tpu.core.types import DataType, Device, Runtime, Taint, \
    ValidationError
from cyberether_tpu.ops.modes import ModeSDecoder


@register_module
class AdsbModule(Module):
    module_type = "adsb"
    device = Device.CPU
    runtime = Runtime.HOST
    taints = Taint.HOST_SINK | Taint.SURFACE
    input_ports = ("signal",)
    schema = Schema(Field("threshold", "float", 2.0),
                    Field("expireSeconds", "float", 60.0))

    def validate(self) -> None:
        spec = self.input_specs["signal"]
        if spec.dtype not in (DataType.CF32, DataType.F32):
            raise ValidationError("input must be CF32 or F32")
        axes = resolve_signal_axes(spec)
        if axes.channel is not None:
            raise ValidationError("channel inputs are not supported")
        expected_rank = 2 if axes.batch is not None else 1
        if spec.rank != expected_rank:
            raise ValidationError(
                "input must contain only a sample axis and an optional "
                "batch axis")
        sr = spec.attr("sampleRate")
        if sr is not None and float(sr) != 2.0e6:
            raise ValidationError(
                f"input sample rate must be 2 MHz ({sr})")

    def create(self) -> Dict[str, TensorSpec]:
        return {}

    def host_start(self) -> None:
        self.decoder = ModeSDecoder(
            expire_s=float(self.config["expireSeconds"]))

    def host_consume(self, outputs: Dict[str, np.ndarray],
                     valid: bool) -> None:
        if not valid:
            return
        x = np.asarray(outputs["signal"]).reshape(-1)
        mag = np.abs(x).astype(np.float32) if np.iscomplexobj(x) \
            else x.astype(np.float32)
        self.decoder.feed(mag)

    def present_data(self, outputs, state) -> Optional[Dict[str, Any]]:
        dec = getattr(self, "decoder", None)
        if dec is None:
            return None
        aircraft = [
            {"icao": a.icao, "callsign": a.callsign,
             "lat": a.lat, "lon": a.lon,
             "altitude_ft": a.altitude_ft,
             "speed_kt": a.speed_kt,
             "heading_deg": a.heading_deg,
             "messages": a.messages}
            for a in dec.aircraft.values()]
        return {
            "kind": "map",
            "aircraft": aircraft,
            "frame": _render_map(aircraft),
            "stats": dict(dec.stats),
        }


def _render_map(aircraft, size: int = 256) -> np.ndarray:
    """Minimal geomap surface (the reference's geodata flight-tracker
    map, src/render/components/geomap): positioned aircraft plotted on
    an equirectangular RGBA canvas around their centroid."""
    img = np.zeros((size, size, 4), np.uint8)
    img[..., 3] = 255
    img[..., :3] = 12
    located = [a for a in aircraft
               if a["lat"] is not None and a["lon"] is not None]
    if not located:
        return img
    lats = np.array([a["lat"] for a in located])
    lons = np.array([a["lon"] for a in located])
    lat0, lon0 = lats.mean(), lons.mean()
    span = max(np.abs(lats - lat0).max(), np.abs(lons - lon0).max(),
               0.5) * 1.2
    ys = np.clip(((lat0 + span - lats) / (2 * span) * (size - 1))
                 .astype(int), 0, size - 1)
    xs = np.clip(((lons - (lon0 - span)) / (2 * span) * (size - 1))
                 .astype(int), 0, size - 1)
    for x, y, a in zip(xs, ys, located):
        img[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2, :3] = \
            (80, 250, 160)
        hdg = a.get("heading_deg")
        if hdg is not None:
            dx = int(round(5 * np.sin(np.radians(hdg))))
            dy = -int(round(5 * np.cos(np.radians(hdg))))
            ty, tx = np.clip(y + dy, 0, size - 1), \
                np.clip(x + dx, 0, size - 1)
            img[ty, tx, :3] = (250, 220, 80)
    return img


register_block(simple_block("adsb"))
