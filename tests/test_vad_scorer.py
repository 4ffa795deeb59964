"""Cross-session batched VAD scoring (SURVEY §7 step 4): the device path
must be interchangeable with per-session numpy scoring."""

import threading

import numpy as np

from stt_tpu.ops import vad as V
from stt_tpu.server.component.vad_scorer import BatchedVadScorer


def _chunks(seed: int, n_chunks: int = 6, frames_per_chunk: int = 3):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n_chunks):
        level = 0.2 if i % 2 == 0 else 0.005
        out.append(
            (level * rng.standard_normal(
                (frames_per_chunk, V.VAD_FRAME_SAMPLES)
            )).astype(np.float32)
        )
    return out


def _numpy_stream(chunks):
    state = V.init_state(np)
    probs = []
    for frames in chunks:
        p, state = V.vad_step(np, frames, state)
        probs.append(p)
    return np.concatenate(probs)


def test_batched_scorer_matches_numpy_stream():
    scorer = BatchedVadScorer(batch_window_ms=1.0)
    try:
        chunks = _chunks(0)
        state = V.init_state(np)
        got = []
        for frames in chunks:
            p, state = scorer.score(frames, state)
            got.append(np.asarray(p))
        np.testing.assert_allclose(
            np.concatenate(got), _numpy_stream(chunks), atol=1e-5
        )
    finally:
        scorer.close()


def test_batched_scorer_concurrent_sessions_independent():
    """N sessions scoring concurrently through one scorer each match
    their own sequential numpy stream — batching leaks nothing across
    rows."""
    scorer = BatchedVadScorer(batch_window_ms=3.0)
    results = {}
    errors = []

    def session(seed: int):
        try:
            chunks = _chunks(seed)
            state = V.init_state(np)
            got = []
            for frames in chunks:
                p, state = scorer.score(frames, state)
                got.append(np.asarray(p))
            results[seed] = np.concatenate(got)
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [
        threading.Thread(target=session, args=(seed,)) for seed in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    try:
        assert not errors
        for seed in range(6):
            np.testing.assert_allclose(
                results[seed], _numpy_stream(_chunks(seed)), atol=1e-5
            )
    finally:
        scorer.close()


def test_batched_scorer_mixed_frame_counts():
    """Chunks with different frame counts in one window group correctly."""
    scorer = BatchedVadScorer(batch_window_ms=3.0)
    try:
        rng = np.random.default_rng(3)
        for n_frames in (1, 2, 3, 5):
            frames = (0.1 * rng.standard_normal(
                (n_frames, V.VAD_FRAME_SAMPLES)
            )).astype(np.float32)
            p, state = scorer.score(frames, V.init_state(np))
            assert np.asarray(p).shape == (n_frames,)
            assert np.asarray(state.frames_seen) == n_frames
    finally:
        scorer.close()


def test_scorer_failure_falls_back_to_numpy():
    scorer = BatchedVadScorer(batch_window_ms=1.0)

    def boom(*a, **k):
        raise RuntimeError("injected")

    scorer._jit = boom
    frames = np.zeros((2, V.VAD_FRAME_SAMPLES), np.float32)
    p, state = scorer.score(frames, V.init_state(np))
    assert not scorer.healthy
    expected, _ = V.vad_step(np, frames, V.init_state(np))
    np.testing.assert_allclose(p, expected)
    scorer.close()


def test_pool_attached_scorer_used_by_gate():
    """VADGate endpointing through the batched scorer is identical to the
    host path (threshold semantics transfer unchanged)."""
    from stt_tpu.server.component.vad_gate import VADGate, VADModelPool

    # harmonic, amplitude-modulated signal (the DSP VAD rejects flat
    # white noise by design — see tests/test_vad.py speech_like)
    t = np.arange(1600) / 16000.0
    speech = (0.2 * np.sin(2 * np.pi * 220 * t)
              * (0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t))).astype(np.float32)
    silence = np.zeros(1600, np.float32)
    seq = [speech] * 6 + [silence] * 12

    def run(pool):
        gate = VADGate(vad_threshold=0.5, vad_silence=0.4, model_pool=pool)
        trig = []
        for chunk in seq:
            pcm = (chunk * 32767).astype(np.int16).tobytes()
            trig.append(gate.update(pcm, 16000).triggered)
        gate.close()
        return trig

    host_pool = VADModelPool()
    scorer = BatchedVadScorer(batch_window_ms=1.0)
    dev_pool = VADModelPool()
    dev_pool.set_scorer(scorer)
    try:
        host_trig = run(host_pool)
        dev_trig = run(dev_pool)
        assert host_trig == dev_trig
        assert any(host_trig), "endpointing never triggered"
    finally:
        scorer.close()


def test_prewarm_compiles():
    scorer = BatchedVadScorer()
    try:
        scorer.prewarm(frame_counts=(1, 3), batch_sizes=(1, 2))
        frames = np.zeros((3, V.VAD_FRAME_SAMPLES), np.float32)
        p, _ = scorer.score(frames, V.init_state(np))
        assert np.asarray(p).shape == (3,)
    finally:
        scorer.close()
