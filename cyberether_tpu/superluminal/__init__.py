"""Superluminal — the plotting API.

Mirrors the reference's Python package surface
(/root/reference/python/superluminal/_module/__init__.py:
``plot/configure/show/running/realtime/layout/box/text/slider/update``
with type/domain/operation constants) over the TPU-native runtime: each
plotted numpy buffer becomes a ``dti`` (dynamic tensor import) source in
a hidden flowgraph, wired through spectrum/visualization blocks; the
rendered surfaces stream through the remote web UI when enabled.

Typical use::

    import numpy as np
    import cyberether_tpu.superluminal as lm

    buf = np.zeros(8192, np.complex64)
    lm.plot(buf, lm.waterfall, domain=(lm.time, lm.frequency))

    def producer():
        while lm.running():
            buf[:] = next_block()
            lm.update()

    lm.realtime(producer)
"""

from cyberether_tpu.superluminal.api import (  # noqa: F401
    amplitude,
    box,
    canvas,
    configure,
    cpu,
    frequency,
    heat,
    imag,
    initialize,
    instance,
    line,
    mosaic_layout,
    none,
    phase,
    plot,
    poll_events,
    present,
    presenting,
    print_remote_info,
    real,
    realtime,
    remote_access_token,
    remote_invite_url,
    remote_room_id,
    running,
    scatter,
    show,
    slider,
    start,
    stop,
    terminate,
    text,
    time,
    tpu,
    update,
    waterfall,
    layout,
)
