"""VADGate + pool semantics tests."""

import numpy as np

from stt_tpu.server.component.vad_gate import (
    VADGate,
    VADModelPool,
    buffer_is_speech,
)
from stt_tpu.utils.audio import float32_to_pcm16

SR = 16000


def speech_pcm(dur=1.0, seed=0, level=0.1):
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * dur)) / SR
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.3 * t)
    phase = np.cumsum(2 * np.pi * f0 / SR)
    sig = sum((1.0 / k) * np.sin(k * phase) for k in range(1, 9))
    am = 0.5 * (1 + np.sin(2 * np.pi * 3.5 * t))
    wave = level * am * sig / np.abs(sig).max() + 0.003 * rng.standard_normal(len(t))
    return float32_to_pcm16(wave.astype(np.float32))


def silence_pcm(dur=0.1, seed=1):
    rng = np.random.default_rng(seed)
    return float32_to_pcm16(
        (0.002 * rng.standard_normal(int(SR * dur))).astype(np.float32)
    )


def feed(gate, pcm, chunk_ms=100):
    step = int(SR * chunk_ms / 1000) * 2
    updates = []
    for i in range(0, len(pcm), step):
        updates.append(gate.update(pcm[i : i + step], SR))
    return updates


class TestVADGate:
    def test_trigger_after_speech_then_silence(self):
        gate = VADGate(vad_threshold=0.5, vad_silence=0.3)
        # noise floor adaptation period
        feed(gate, silence_pcm(0.5))
        ups = feed(gate, speech_pcm(1.0))
        assert any(u.speech_active for u in ups)
        assert not any(u.triggered for u in ups)
        ups = feed(gate, silence_pcm(1.0, seed=9))
        assert any(u.triggered for u in ups)

    def test_no_trigger_without_speech(self):
        gate = VADGate(vad_threshold=0.5, vad_silence=0.3)
        ups = feed(gate, silence_pcm(2.0))
        assert not any(u.triggered for u in ups)
        assert not any(u.speech_active for u in ups)

    def test_threshold_zero_treats_everything_as_speech(self):
        gate = VADGate(vad_threshold=0.0, vad_silence=10.0)
        ups = feed(gate, silence_pcm(0.2))
        assert all(u.speech_active for u in ups)

    def test_empty_chunk_with_duration_counts_silence(self):
        gate = VADGate(vad_threshold=0.5, vad_silence=0.3)
        feed(gate, silence_pcm(0.5))
        feed(gate, speech_pcm(1.0))
        up = gate.update(b"", SR)
        assert up.chunk_duration == 0.0

    def test_reset_after_trigger(self):
        gate = VADGate(vad_threshold=0.5, vad_silence=0.2)
        feed(gate, silence_pcm(0.5))
        feed(gate, speech_pcm(1.0))
        feed(gate, silence_pcm(0.5, seed=3))
        gate.reset_after_trigger()
        assert not gate.speech_active
        assert gate.silence_duration == 0.0
        assert gate.speech_started_at is None

    def test_speech_started_at_estimates_onset(self):
        gate = VADGate(vad_threshold=0.5, vad_silence=10.0)
        feed(gate, silence_pcm(1.0))
        feed(gate, speech_pcm(0.5))
        assert gate.speech_started_at is not None
        assert 0.5 <= gate.speech_started_at <= 1.2

    def test_frame_buffering_across_odd_chunks(self):
        """Chunks not aligned to 512 samples still produce frame scores."""
        gate = VADGate(vad_threshold=0.5, vad_silence=0.3)
        pcm = speech_pcm(1.0)
        feed(gate, silence_pcm(0.5))
        step = 700  # bytes, 350 samples — below one frame
        for i in range(0, len(pcm), step):
            gate.update(pcm[i : i + step], SR)
        assert gate.speech_active


class TestVADModelPool:
    def test_reserve_within_capacity(self):
        pool = VADModelPool()
        pool.configure(max_size=2, max_capacity=2)
        assert pool.reserve_slot()
        assert pool.reserve_slot()
        assert not pool.reserve_slot()
        pool.release_slot()
        assert pool.reserve_slot()

    def test_growth_up_to_max(self):
        pool = VADModelPool()
        pool.configure(max_size=2, max_capacity=5, growth_factor=1.5)
        for _ in range(5):
            assert pool.reserve_slot()
        assert not pool.reserve_slot()
        assert pool.stats()["capacity"] == 5

    def test_unconfigured_pool_unlimited(self):
        pool = VADModelPool()
        for _ in range(100):
            assert pool.reserve_slot()

    def test_acquire_release_reuses_instances(self):
        pool = VADModelPool()
        pool.configure(max_size=2, prewarm=2, max_capacity=2)
        a = pool.acquire_model()
        pool.release_model(a)
        b = pool.acquire_model()
        assert b is a  # LIFO reuse
        assert pool.stats()["total_created"] == 2

    def test_gate_returns_model_on_close(self):
        pool = VADModelPool()
        pool.configure(max_size=1, prewarm=1, max_capacity=1)
        gate = VADGate(0.5, 0.5, model_pool=pool)
        assert pool.stats()["free"] == 0
        gate.close()
        assert pool.stats()["free"] == 1


def test_buffer_is_speech_rms_gate():
    assert buffer_is_speech(speech_pcm(0.5), 0.02)
    assert not buffer_is_speech(silence_pcm(0.5), 0.02)
    assert buffer_is_speech(silence_pcm(0.5), 0.0)  # disabled gate
