"""Functional DSP ops — the compute vocabulary of the domain library.

Pure JAX functions (plus Pallas kernels in
:mod:`cyberether_tpu.ops.pallas_kernels`) used by the block/module layer.
Replaces the reference's per-device kernel implementations
(/root/reference/src/domains/**/module_impl_native_{cpu,cuda}.cc).
"""

from cyberether_tpu.ops.streaming import (  # noqa: F401
    first_order_iir,
    moving_sum,
)
from cyberether_tpu.ops.windows import blackman  # noqa: F401
from cyberether_tpu.ops.firs import (  # noqa: F401
    windowed_sinc_bandpass,
    rrc_taps,
    fir_filter_streaming,
)
from cyberether_tpu.ops.fftops import (  # noqa: F401
    fft_c2c,
    fft_r2c,
    fft_r2r_fftpack,
)
