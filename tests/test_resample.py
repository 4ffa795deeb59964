"""Polyphase resampler tests vs scipy.signal.resample_poly."""

import numpy as np
import pytest
from scipy import signal

from stt_tpu.ops.resample import resample_np


@pytest.mark.parametrize("src", [8000, 22050, 24000, 44100, 48000])
def test_matches_scipy(src):
    rng = np.random.default_rng(src)
    t = np.arange(src) / src
    x = (0.5 * np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(src)).astype(
        np.float32
    )
    ref = signal.resample_poly(x, 16000, src, window=("kaiser", 5.0))
    mine = resample_np(x, src, 16000)
    n = min(len(ref), len(mine))
    assert abs(len(mine) - len(ref)) <= 1
    assert np.max(np.abs(ref[:n] - mine[:n])) < 1e-5


def test_identity_same_rate():
    x = np.ones(100, np.float32)
    out = resample_np(x, 16000, 16000)
    assert np.array_equal(out, x)


def test_batched():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 48000)).astype(np.float32)
    out = resample_np(x, 48000, 16000)
    assert out.shape == (4, 16000)
    single = resample_np(x[2], 48000, 16000)
    assert np.allclose(out[2], single, atol=1e-6)


def test_tone_preserved():
    src = 44100
    t = np.arange(src * 2) / src
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample_np(x, src, 16000)
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = spec.argmax() * 16000 / len(y)
    assert abs(peak_hz - 440) < 2
