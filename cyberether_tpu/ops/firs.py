"""FIR design and streaming FIR filtering.

Tap designers match the reference bit-for-bit in double precision:
- windowed-sinc bandpass with Blackman window + complex upconversion
  (/root/reference/src/domains/dsp/filter_taps/module_impl_native_cpu.cc:46-82)
- root-raised-cosine
  (/root/reference/src/domains/dsp/rrc_filter/module_impl.cc
  generateCoefficients)

The streaming FIR runs as a batched valid convolution over
[history | block] — the TPU-native replacement for the reference's
per-sample circular-history loop
(rrc_filter/module_impl_native_cpu.cc:110-160).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp


def windowed_sinc_bandpass(taps: int, sample_rate: float, bandwidth: float,
                           centers) -> np.ndarray:
    """Complex band-pass taps, shape (heads, taps), dtype complex64."""
    centers = np.atleast_1d(np.asarray(centers, dtype=np.float64))
    filter_width = (bandwidth / sample_rate) / 2.0
    i = np.arange(taps, dtype=np.float64)
    half_len = (taps - 1) / 2.0
    n = i - half_len
    sinc = np.where(
        n == 0.0,
        2.0 * filter_width,
        np.sin(2.0 * np.pi * filter_width * n) / (np.pi * np.where(n == 0.0,
                                                                   1.0, n)))
    if taps == 1:
        win = np.ones_like(i)
    else:
        win = (0.42 - 0.50 * np.cos(2.0 * np.pi * i / (taps - 1))
               + 0.08 * np.cos(4.0 * np.pi * i / (taps - 1)))
    offsets = centers[:, None] / sample_rate                  # (H, 1)
    upconvert = np.exp(1j * 2.0 * np.pi * n[None, :] * offsets)
    return (sinc[None, :] * win[None, :] * upconvert).astype(np.complex64)


def rrc_taps(taps: int, sample_rate: float, symbol_rate: float,
             roll_off: float) -> np.ndarray:
    """Root-raised-cosine taps, shape (taps,), dtype float32."""
    sps = float(sample_rate) / float(symbol_rate)
    beta = float(roll_off)
    norm = np.sqrt(1.0 / sps)
    i = np.arange(taps, dtype=np.float64)
    t = (i - (taps - 1) / 2.0) / sps
    out = np.empty(taps, dtype=np.float64)
    for k in range(taps):
        tk = t[k]
        if abs(tk) < 1e-10:
            out[k] = norm * (1.0 + beta * (4.0 / np.pi - 1.0))
        elif beta > 0.0 and abs(abs(4.0 * beta * tk) - 1.0) < 1e-10:
            p = np.pi / (4.0 * beta)
            out[k] = (norm * beta / np.sqrt(2.0) *
                      ((1.0 + 2.0 / np.pi) * np.sin(p) +
                       (1.0 - 2.0 / np.pi) * np.cos(p)))
        else:
            pit = np.pi * tk
            fbt = 4.0 * beta * tk
            out[k] = (norm * (np.sin(pit * (1.0 - beta)) +
                              4.0 * beta * tk * np.cos(pit * (1.0 + beta)))
                      / (pit * (1.0 - fbt * fbt)))
    return out.astype(np.float32)


def fir_filter_streaming(x: jnp.ndarray, taps: jnp.ndarray,
                         history: jnp.ndarray, axis: int = -1
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal FIR along ``axis``: ``y[n] = sum_k h[k] x[n-k]`` with
    ``history`` providing the ``len(taps)-1`` samples before the block.

    ``history`` has the same shape as ``x`` except ``axis`` has extent
    ``len(taps)-1``.  Returns ``(y, new_history)``.
    """
    axis = axis % x.ndim
    ntaps = taps.shape[-1]
    ext = jnp.concatenate([history.astype(x.dtype), x], axis=axis)
    n = x.shape[axis]
    # move axis last, flatten lanes -> (lanes, time)
    perm = [d for d in range(x.ndim) if d != axis] + [axis]
    inv_perm = np.argsort(perm)
    extt = jnp.transpose(ext, perm)
    lane_shape = extt.shape[:-1]
    flat = extt.reshape((-1, extt.shape[-1]))

    h = taps[::-1]  # convolution kernel ordering for correlation
    if jnp.iscomplexobj(x) and not jnp.iscomplexobj(taps):
        yr = _corr_valid(jnp.real(flat), jnp.real(h))
        yi = _corr_valid(jnp.imag(flat), jnp.real(h))
        y = yr + 1j * yi
        y = y.astype(x.dtype)
    elif jnp.iscomplexobj(taps):
        rr = _corr_valid(jnp.real(flat), jnp.real(h))
        ri = _corr_valid(jnp.real(flat), jnp.imag(h))
        if jnp.iscomplexobj(x):
            ir = _corr_valid(jnp.imag(flat), jnp.real(h))
            ii = _corr_valid(jnp.imag(flat), jnp.imag(h))
            y = (rr - ii) + 1j * (ri + ir)
        else:
            y = rr + 1j * ri
        y = y.astype(jnp.complex64)
    else:
        y = _corr_valid(flat, h).astype(x.dtype)

    y = y.reshape(lane_shape + (n,))
    y = jnp.transpose(y, inv_perm)
    new_hist = jax.lax.slice_in_dim(ext, ext.shape[axis] - (ntaps - 1),
                                    ext.shape[axis], axis=axis) \
        if ntaps > 1 else history
    return y, new_hist


def fir_matmul_streaming(x: jnp.ndarray, taps: jnp.ndarray,
                         history: jnp.ndarray, frame: int = 128
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal FIR as a banded matmul on the MXU.

    ``y[i] = sum_k h[k] x[i-k]`` is re-expressed per output frame of
    ``frame`` samples as ``frames (nf, frame+T-1) @ M (frame+T-1,
    frame)`` with the taps laid out on M's band — the TPU-native way to
    run long real FIRs at matmul throughput instead of VPU conv.

    x: (..., n) with n divisible by ``frame``; taps real (T,);
    history: (..., T-1).  Returns (y, new_history).
    """
    T = taps.shape[-1]
    K = T - 1
    n = x.shape[-1]
    pad = (-n) % frame
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
    npad = n + pad
    nf = npad // frame

    h = np.asarray(taps, np.float32)
    M = np.zeros((frame + K, frame), np.float32)
    for j in range(frame):
        M[j:j + T, j] = h[::-1]
    Mj = jnp.asarray(M)

    lead = x.shape[:-1]
    # overlapping frames WITHOUT a gather (TPU gathers are element-wise
    # slow): front-pad so history ends on a frame boundary, reshape to
    # frame blocks, then window i = concat(blocks[i..i+m])[q:q+frame+K]
    # — shifted reshapes + one contiguous slice
    m = -(-K // frame) if K else 0
    q = m * frame - K
    extp = jnp.concatenate(
        ([jnp.zeros(lead + (q,), x.dtype)] if q else [])
        + [history.astype(x.dtype), x], axis=-1)
    blocks = extp.reshape(lead + (nf + m, frame))
    if m:
        spans = jnp.concatenate(
            [blocks[..., j:nf + j, :] for j in range(m + 1)], axis=-1)
        frames = spans[..., q:q + frame + K]  # (..., nf, frame+K)
    else:
        frames = blocks
    flat = frames.reshape((-1, frame + K))
    if jnp.iscomplexobj(x):
        yr = jnp.dot(jnp.real(flat), Mj,
                     preferred_element_type=jnp.float32)
        yi = jnp.dot(jnp.imag(flat), Mj,
                     preferred_element_type=jnp.float32)
        y = (yr + 1j * yi).astype(x.dtype)
    else:
        y = jnp.dot(flat, Mj,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    y = y.reshape(lead + (npad,))[..., :n]
    if not K:
        new_hist = history
    elif n >= K:
        new_hist = x[..., n - K:n]   # x may carry end padding
    else:
        new_hist = jnp.concatenate(
            [history.astype(x.dtype), x[..., :n]],
            axis=-1)[..., -K:]
    return y, new_hist


def fir_fft_streaming(x: jnp.ndarray, taps: jnp.ndarray,
                      history: jnp.ndarray, fft_size: int = 8192
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Causal real-tap FIR via overlap-save frequency-domain
    convolution — the filter_engine strategy
    (reference src/domains/dsp/filter_engine/block_impl.cc:432-649)
    applied to a streaming step: segments of ``fft_size`` overlap by
    ``len(taps)-1``, multiply by the taps' rfft, and the first ``T-1``
    outputs of each segment (circular wrap) are discarded.

    For long filters this rides XLA's TPU FFT (measured GS/s-class)
    instead of VPU convolution.  x real (..., n); taps real (T,) with
    T <= fft_size // 2; history (..., T-1).  Returns (y, new_history).
    """
    T = taps.shape[-1]
    K = T - 1
    if K >= fft_size // 2:
        raise ValueError("fft_size must be > 2*taps for overlap-save")
    L = int(fft_size)
    step = L - K
    n = x.shape[-1]
    nseg = -(-n // step)
    pad = nseg * step - n
    xp = jnp.concatenate(
        [x] + ([jnp.zeros(x.shape[:-1] + (pad,), x.dtype)]
               if pad else []), axis=-1)
    # overlap-save segments WITHOUT a gather (TPU gathers are
    # element-wise slow): bodies are a plain reshape, and each
    # segment's K-sample head is the tail of the previous body
    lead = x.shape[:-1]
    bodies = xp.reshape(lead + (nseg, step))
    heads = jnp.concatenate(
        [history.astype(x.dtype)[..., None, :],
         bodies[..., :-1, step - K:]], axis=-2)  # (..., nseg, K)
    segs = jnp.concatenate([heads, bodies], axis=-1)  # (..., nseg, L)
    H = jnp.fft.rfft(taps.astype(jnp.float32), L)
    Y = jnp.fft.irfft(jnp.fft.rfft(segs.astype(jnp.float32), L)
                      * H, L)[..., K:]         # valid part per segment
    y = Y.reshape(x.shape[:-1] + (nseg * step,))[..., :n]
    if not K:
        new_hist = history
    elif n >= K:
        new_hist = x[..., n - K:]
    else:
        new_hist = jnp.concatenate(
            [history.astype(x.dtype), x], axis=-1)[..., -K:]
    return y.astype(x.dtype), new_hist


def _corr_valid(x2d: jnp.ndarray, k1d: jnp.ndarray) -> jnp.ndarray:
    """(lanes, T) valid cross-correlation with flipped kernel == causal
    FIR; implemented with conv_general_dilated (maps onto the MXU)."""
    lhs = x2d[:, None, :]                     # (N, C=1, W)
    rhs = k1d[None, None, :]                  # (O=1, I=1, W)
    out = jax.lax.conv_general_dilated(
        lhs.astype(jnp.float32), rhs.astype(jnp.float32),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out[:, 0, :]
