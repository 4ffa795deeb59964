"""Log-mel spectrogram front end as MXU-friendly JAX.

Numerically equivalent to Whisper's torch front end (reference decode path
enters it via backend ``transcribe()``; openai-whisper ``audio.py``):
Hann-windowed STFT (n_fft=400, hop=160, centered reflect padding, last frame
dropped), power spectrum, Slaney-normalized mel filterbank (librosa
``filters.mel`` defaults), ``log10`` with -8 dynamic-range clamp and
``(x+4)/4`` normalization.

TPU-first design: the STFT is *not* an FFT — frames are extracted with a
gather-free reshape trick and projected against a precomputed real/imag DFT
basis with one matmul, so the whole front end is two matmuls + elementwise,
all of which XLA fuses and tiles onto the MXU. A 30 s window is ~2 GFLOP —
microseconds on a v5e — and the same code path vectorizes over a batch of
sessions.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_SECONDS = 30
N_SAMPLES_PER_CHUNK = SAMPLE_RATE * CHUNK_SECONDS  # 480_000
N_FRAMES_PER_CHUNK = N_SAMPLES_PER_CHUNK // HOP_LENGTH  # 3000


@lru_cache(maxsize=4)
def mel_filterbank(n_mels: int = 80, n_fft: int = N_FFT, sr: int = SAMPLE_RATE):
    """Slaney-scale, slaney-normalized mel filter matrix (n_mels, n_fft//2+1).

    Reimplements librosa.filters.mel defaults (htk=False, norm="slaney"),
    which is what Whisper's shipped ``mel_filters.npz`` contains.
    """

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        # linear below 1 kHz, log above (Slaney)
        mel = f / (200.0 / 3.0)
        log_region = f >= 1000.0
        mel = np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
            mel,
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3.0)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2))

    fdiff = np.diff(mel_pts)
    ramps = mel_pts.reshape(-1, 1) - fft_freqs.reshape(1, -1)

    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # slaney normalization: constant energy per channel
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm.reshape(-1, 1)
    return weights.astype(np.float32)


@lru_cache(maxsize=2)
def _dft_basis(n_fft: int = N_FFT):
    """Windowed real-DFT basis: (n_fft, 2*(n_fft//2+1)) = [cos | -sin].

    The Hann window is folded into the basis so framing -> spectrum is a
    single matmul.
    """
    n_bins = n_fft // 2 + 1
    window = np.hanning(n_fft + 1)[:-1]  # periodic hann, matches torch
    k = np.arange(n_bins).reshape(1, -1)
    n = np.arange(n_fft).reshape(-1, 1)
    angle = 2.0 * np.pi * n * k / n_fft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)
    return (window.reshape(-1, 1) * basis).astype(np.float32)


def _frame(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Centered framing with reflect padding; drops the trailing frame to
    match Whisper's ``stft[..., :-1]``. audio: (T,) -> (T//hop, n_fft)."""
    pad = n_fft // 2
    padded = jnp.pad(audio, (pad, pad), mode="reflect")
    n_frames = audio.shape[0] // hop  # one fewer than the centered STFT emits
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return padded[idx]


@partial(jax.jit, static_argnames=("n_mels", "n_fft", "hop"))
def log_mel_spectrogram(
    audio: jnp.ndarray,
    n_mels: int = 80,
    n_fft: int = N_FFT,
    hop: int = HOP_LENGTH,
) -> jnp.ndarray:
    """float32 waveform (..., T) -> log-mel features (..., n_mels, T//hop).

    Accepts a single waveform or a batch (leading dims are mapped). T must be
    a multiple of ``hop`` (the engine always supplies bucketed lengths).
    """
    if audio.ndim > 1:
        return jax.vmap(lambda a: log_mel_spectrogram(a, n_mels, n_fft, hop))(audio)

    frames = _frame(audio.astype(jnp.float32), n_fft, hop)  # (F, n_fft)
    basis = jnp.asarray(_dft_basis(n_fft))  # (n_fft, 2*bins)
    spec = jnp.dot(frames, basis, preferred_element_type=jnp.float32)
    n_bins = n_fft // 2 + 1
    power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2  # (F, bins)

    mel = jnp.asarray(mel_filterbank(n_mels, n_fft))  # (n_mels, bins)
    mel_power = jnp.dot(power, mel.T, preferred_element_type=jnp.float32)

    log_spec = jnp.log10(jnp.maximum(mel_power, 1e-10))
    log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.T  # (n_mels, F)


def pad_or_trim(audio: jnp.ndarray, length: int = N_SAMPLES_PER_CHUNK) -> jnp.ndarray:
    """Right-pad with zeros or trim to exactly ``length`` samples."""
    t = audio.shape[-1]
    if t == length:
        return audio
    if t > length:
        return audio[..., :length]
    pad_widths = [(0, 0)] * (audio.ndim - 1) + [(0, length - t)]
    return jnp.pad(audio, pad_widths)


__all__ = [
    "CHUNK_SECONDS",
    "HOP_LENGTH",
    "N_FFT",
    "N_FRAMES_PER_CHUNK",
    "N_SAMPLES_PER_CHUNK",
    "SAMPLE_RATE",
    "log_mel_spectrogram",
    "mel_filterbank",
    "pad_or_trim",
]
