"""Polyphase audio resampling as an XLA dilated convolution.

Replaces the reference's torchaudio ``functional.resample`` host call
(reference: ``stt_server/utils/audio.py:22-27``) with a TPU-resident
upfirdn: upsample-by-L via ``lhs_dilation``, windowed-sinc lowpass FIR,
downsample-by-M via conv stride — one ``lax.conv_general_dilated`` call
that XLA lowers onto the MXU/VPU. Filters are designed once per
(src, dst) rate pair on host with scipy and cached.

Equivalent quality to ``scipy.signal.resample_poly`` (same Kaiser-windowed
sinc design); tested against it.
"""

from __future__ import annotations

import math
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as _signal


@lru_cache(maxsize=32)
def _design(src_rate: int, dst_rate: int):
    """Return (up, down, fir) for a rate pair. fir is float32, scaled by up."""
    g = math.gcd(src_rate, dst_rate)
    up, down = dst_rate // g, src_rate // g
    if up == down:
        return 1, 1, None
    max_rate = max(up, down)
    half_len = 10 * max_rate  # 10 taps per zero crossing, resample_poly default
    fir = _signal.firwin(
        2 * half_len + 1, 1.0 / max_rate, window=("kaiser", 5.0)
    ).astype(np.float32)
    return up, down, fir * up


@partial(jax.jit, static_argnames=("src_rate", "dst_rate"))
def resample(audio: jnp.ndarray, src_rate: int, dst_rate: int) -> jnp.ndarray:
    """Resample a (T,) or (B, T) float32 waveform between fixed rates.

    Output length is ``ceil(T * dst / src)`` (matches resample_poly).
    """
    up, down, fir = _design(src_rate, dst_rate)
    if fir is None:
        return audio
    squeeze = audio.ndim == 1
    x = audio[None, :] if squeeze else audio
    b, t = x.shape

    n_out = -(-t * up // down)  # ceil
    h = jnp.asarray(fir)
    n_taps = h.shape[0]
    half = n_taps // 2

    # upfirdn: pad so output sample k corresponds to input position k*down/up
    # with the filter centered (delay `half` at the upsampled rate).
    y = jax.lax.conv_general_dilated(
        x[:, None, :],  # (B, C=1, T)
        h[None, None, :],  # (O=1, I=1, K)
        window_strides=(down,),
        padding=((half, half + down),),
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]
    y = y[:, :n_out]
    return y[0] if squeeze else y


def resample_np(audio: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Host-side helper returning a numpy array (device roundtrip)."""
    return np.asarray(resample(jnp.asarray(audio), src_rate, dst_rate))


__all__ = ["resample", "resample_np"]
