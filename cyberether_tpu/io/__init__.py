"""Host-side IO support: ring buffers, IQ file access, drivers."""

from cyberether_tpu.io.ringbuffer import CircularBuffer  # noqa: F401
