"""Remote interface: web UI + streaming of plot surfaces.

The reference streams its rendered desktop over WebRTC/GStreamer with a
broker/signaller (/root/reference/src/instance_remote_impl.cc, SURVEY.md
§2.6).  The TPU-native equivalent streams *reduced device arrays*
(spectra, waterfall frames) to a browser client over WebSocket and
exposes the flowgraph as a remote-controllable JSON API — the same
capability (remote view + remote control + remote signal ingest via the
websocket source block) without shipping pixels from a GPU swapchain.
"""

from cyberether_tpu.remote.server import RemoteServer  # noqa: F401
