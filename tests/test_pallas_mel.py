"""Golden tests: Pallas fused log-mel == XLA log-mel (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from stt_tpu.ops.mel import HOP_LENGTH, log_mel_spectrogram
from stt_tpu.ops.pallas.mel import TILE_F, log_mel_spectrogram_pallas


def _audio(batch, seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000.0
    sig = 0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.normal(0, 1, t.shape)
    return np.tile(sig.astype(np.float32), (batch, 1))


@pytest.mark.parametrize("seconds", [1.0, 5.0])
@pytest.mark.parametrize("batch", [1, 3])
def test_pallas_mel_matches_xla(batch, seconds):
    audio = _audio(batch, seconds)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    got = np.asarray(
        log_mel_spectrogram_pallas(jnp.asarray(audio), interpret=True)
    )
    assert got.shape == ref.shape == (batch, 80, int(seconds * 100))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_pallas_mel_silence():
    audio = np.zeros((1, 16000), np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    got = np.asarray(
        log_mel_spectrogram_pallas(jnp.asarray(audio), interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-4)


def test_pallas_mel_rejects_non_hop_multiple():
    audio = np.zeros((1, HOP_LENGTH * 10 + 7), np.float32)
    with pytest.raises(ValueError):
        log_mel_spectrogram_pallas(jnp.asarray(audio), interpret=True)


def test_pallas_mel_non_tile_multiple_frames():
    # 1.5s = 150 frames: not a TILE_F multiple; tail tile is masked out
    audio = _audio(2, 1.5)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(audio)))
    got = np.asarray(
        log_mel_spectrogram_pallas(jnp.asarray(audio), interpret=True)
    )
    assert got.shape == ref.shape == (2, 80, 150)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
