"""Host audio helper tests."""

import numpy as np

from stt_tpu.utils.audio import (
    chunk_duration_seconds,
    chunk_rms,
    float32_to_pcm16,
    pcm16_to_float32,
    resample_linear,
)


def test_pcm16_roundtrip():
    rng = np.random.default_rng(0)
    audio = (rng.uniform(-0.9, 0.9, 1600)).astype(np.float32)
    back = pcm16_to_float32(float32_to_pcm16(audio))
    assert np.max(np.abs(back - audio)) < 1.0 / 32768.0 + 1e-6


def test_pcm16_range():
    pcm = np.array([-32768, 0, 32767], dtype=np.int16).tobytes()
    f = pcm16_to_float32(pcm)
    assert f[0] == -1.0
    assert f[1] == 0.0
    assert abs(f[2] - (32767 / 32768)) < 1e-7


def test_chunk_duration():
    assert chunk_duration_seconds(32000, 16000) == 1.0
    assert chunk_duration_seconds(3200, 16000) == 0.1
    assert chunk_duration_seconds(100, 0) == 0.0


def test_chunk_rms_sine():
    t = np.arange(16000) / 16000
    sine = 0.5 * np.sin(2 * np.pi * 440 * t)
    rms = chunk_rms(float32_to_pcm16(sine.astype(np.float32)))
    assert abs(rms - 0.5 / np.sqrt(2)) < 0.01


def test_chunk_rms_empty_and_silence():
    assert chunk_rms(b"") == 0.0
    assert chunk_rms(np.zeros(100, dtype=np.int16)) == 0.0


def test_resample_linear_preserves_duration_and_tone():
    sr_in, sr_out = 44100, 16000
    t = np.arange(sr_in) / sr_in
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = resample_linear(tone, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 1
    # dominant frequency survives resampling
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * sr_out / len(out)
    assert abs(peak_hz - 440) < 5


def test_resample_noop_same_rate():
    x = np.ones(10, dtype=np.float32)
    assert resample_linear(x, 16000, 16000) is x
