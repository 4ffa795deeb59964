"""Fused log-mel front end as a Pallas TPU kernel.

The XLA path (:mod:`stt_tpu.ops.mel`) materializes the framing gather
``(F, n_fft)`` in HBM before the DFT matmul — for a 16-row 30 s batch
that's ~75 MB of HBM traffic for data that is 60% duplicated (hop 160 <
n_fft 400). This kernel streams audio tiles into VMEM once and builds the
overlapped frames *in registers* with three shifted reshapes
(400 = 160 + 160 + 80), then runs both matmuls (windowed DFT basis, mel
filterbank) on the MXU per tile:

    HBM reads:  audio (B*S*4 bytes)         [vs ~2.5x that + frames]
    HBM writes: (B, F, n_mels) log-mel

The global ``max - 8`` dynamic-range clamp needs a full-spectrogram
reduction, so the kernel emits un-clamped ``log10`` mel power and the tiny
clamp+normalize epilogue stays in XLA (it fuses into the consumer).

Grid: ``(B, F // TILE_F)``; each program loads its (1, TILE_F*hop + n_fft)
audio slice from a VMEM-resident padded row. TILE_F=100 divides every
engine audio bucket (100/200/500/1000/3000 frames).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mel import HOP_LENGTH, N_FFT, _dft_basis, mel_filterbank

TILE_F = 100  # frames per program; divides all engine bucket frame counts


def _mel_kernel(audio_ref, basis_ref, mel_ref, out_ref):
    """One (batch row, frame tile): frames -> DFT -> power -> mel -> log10."""
    i = pl.program_id(1)
    hop, n_fft = HOP_LENGTH, N_FFT
    start = i * (TILE_F * hop)

    # overlapped framing without gather: 400 = 160 + 160 + 80; three shifted
    # strided views of the padded row, each reshaped to (TILE_F, hop)
    a = audio_ref[0, 0, pl.ds(start, TILE_F * hop)].reshape(TILE_F, hop)
    b = audio_ref[0, 0, pl.ds(start + hop, TILE_F * hop)].reshape(TILE_F, hop)
    c = audio_ref[0, 0, pl.ds(start + 2 * hop, TILE_F * hop)].reshape(
        TILE_F, hop
    )[:, : n_fft - 2 * hop]
    frames = jnp.concatenate([a, b, c], axis=1)  # (TILE_F, n_fft)

    spec = jnp.dot(frames, basis_ref[:], preferred_element_type=jnp.float32)
    n_bins = n_fft // 2 + 1
    power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2  # (TILE_F, bins)
    mel_power = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0, 0, :, :] = jnp.log10(jnp.maximum(mel_power, 1e-10))


@partial(jax.jit, static_argnames=("n_mels", "interpret"))
def log_mel_spectrogram_pallas(
    audio: jnp.ndarray, n_mels: int = 80, interpret: bool = False
) -> jnp.ndarray:
    """float32 waveform (B, T) -> log-mel (B, n_mels, T//hop).

    Matches :func:`stt_tpu.ops.mel.log_mel_spectrogram` numerically
    (golden-tested). T must be a multiple of ``TILE_F * HOP_LENGTH`` — the
    engine's audio buckets always are.
    """
    if audio.ndim == 1:
        audio = audio[None]
    b, t = audio.shape
    n_frames = t // HOP_LENGTH
    if n_frames % TILE_F != 0:
        raise ValueError(
            f"frame count {n_frames} not a multiple of TILE_F={TILE_F}"
        )
    pad = N_FFT // 2
    padded = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)),
                     mode="reflect")
    # TPU block shapes must divide (8, 128) or equal the array dims on the
    # last two axes; lifting to (B, 1, S) / (B, tiles, TILE_F, n_mels) makes
    # every block equal its trailing array dims.
    padded = padded[:, None, :]  # (B, 1, S_pad)
    basis = jnp.asarray(_dft_basis(N_FFT))            # (400, 402)
    mel_t = jnp.asarray(mel_filterbank(n_mels, N_FFT).T)  # (201, n_mels)

    n_tiles = n_frames // TILE_F
    raw = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct(
            (b, n_tiles, TILE_F, n_mels), jnp.float32
        ),
        grid=(b, n_tiles),
        in_specs=[
            # one padded audio row per program, reused across frame tiles
            pl.BlockSpec(
                (1, 1, padded.shape[2]),
                lambda bi, fi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                basis.shape, lambda bi, fi: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                mel_t.shape, lambda bi, fi: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TILE_F, n_mels),
            lambda bi, fi: (bi, fi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(padded, basis, mel_t)

    # clamp + normalize epilogue (needs the per-row global max)
    log_spec = raw.reshape(b, n_frames, n_mels).transpose(0, 2, 1)
    row_max = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, row_max - 8.0)
    return (log_spec + 4.0) / 4.0


__all__ = ["TILE_F", "log_mel_spectrogram_pallas"]
