"""Log-mel front-end correctness tests (vs numpy FFT reference)."""

import numpy as np

from stt_tpu.ops.mel import (
    HOP_LENGTH,
    N_FFT,
    log_mel_spectrogram,
    mel_filterbank,
    pad_or_trim,
)


def reference_log_mel(audio: np.ndarray, n_mels: int = 80) -> np.ndarray:
    """Straight-line numpy port of Whisper's torch front end."""
    window = np.hanning(N_FFT + 1)[:-1]
    padded = np.pad(audio, (N_FFT // 2, N_FFT // 2), mode="reflect")
    n_frames = 1 + (len(padded) - N_FFT) // HOP_LENGTH
    frames = np.stack(
        [padded[i * HOP_LENGTH : i * HOP_LENGTH + N_FFT] for i in range(n_frames)]
    )
    spec = np.fft.rfft(frames * window, axis=-1)
    power = np.abs(spec[:-1]) ** 2  # drop last frame like whisper
    mel = mel_filterbank(n_mels) @ power.T
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def test_matches_fft_reference():
    rng = np.random.default_rng(0)
    audio = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    mine = np.asarray(log_mel_spectrogram(audio))
    ref = reference_log_mel(audio)
    assert mine.shape == ref.shape == (80, 100)
    assert np.max(np.abs(mine - ref)) < 1e-4


def test_128_mel_variant():
    rng = np.random.default_rng(1)
    audio = (0.1 * rng.standard_normal(8000)).astype(np.float32)
    out = np.asarray(log_mel_spectrogram(audio, n_mels=128))
    assert out.shape == (128, 50)


def test_batched_input():
    rng = np.random.default_rng(2)
    audio = (0.1 * rng.standard_normal((3, 4800))).astype(np.float32)
    out = np.asarray(log_mel_spectrogram(audio))
    assert out.shape == (3, 80, 30)
    single = np.asarray(log_mel_spectrogram(audio[1]))
    assert np.allclose(out[1], single, atol=1e-5)


def test_tone_lands_in_correct_mel_band():
    t = np.arange(32000) / 16000
    tone = (0.5 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
    out = np.asarray(log_mel_spectrogram(tone))
    # energy concentrated around the 1 kHz mel channel, stable over time
    peak_channels = out[:, 10:-10].argmax(axis=0)
    assert peak_channels.std() < 1.0
    fb = mel_filterbank(80)
    freqs = np.linspace(0, 8000, fb.shape[1])
    center = freqs[fb[int(np.median(peak_channels))].argmax()]
    assert abs(center - 1000) < 150


def test_pad_or_trim():
    x = np.ones(10, np.float32)
    assert pad_or_trim(x, 10).shape == (10,)
    assert pad_or_trim(x, 4).shape == (4,)
    padded = np.asarray(pad_or_trim(x, 16))
    assert padded.shape == (16,)
    assert padded[10:].sum() == 0


def test_mel_filterbank_rows_nonzero():
    fb = mel_filterbank(80)
    assert fb.shape == (80, 201)
    assert (fb.sum(axis=1) > 0).all()
