"""DSP VAD scoring tests: discrimination, streaming state, host/device parity."""

import jax
import jax.numpy as jnp
import numpy as np

from stt_tpu.ops import vad as V

SR = 16000
RNG = np.random.default_rng(7)


def frames_of(x):
    n = len(x) // V.VAD_FRAME_SAMPLES
    return x[: n * V.VAD_FRAME_SAMPLES].reshape(n, V.VAD_FRAME_SAMPLES).astype(
        np.float32
    )


def speech_like(dur=2.0, level=0.08):
    t = np.arange(int(SR * dur)) / SR
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.3 * t)
    phase = np.cumsum(2 * np.pi * f0 / SR)
    sig = sum((1.0 / k) * np.sin(k * phase) for k in range(1, 9))
    am = 0.5 * (1 + np.sin(2 * np.pi * 3.5 * t))
    return (level * am * sig / np.abs(sig).max()).astype(np.float32)


def room_noise(dur=1.0, level=0.003):
    return (level * RNG.standard_normal(int(SR * dur))).astype(np.float32)


def test_speech_vs_noise_discrimination():
    state = V.init_state()
    p_noise, state = V.vad_step(np, frames_of(room_noise(1.0)), state)
    speech = speech_like(2.0) + room_noise(2.0)
    p_speech, _ = V.vad_step(np, frames_of(speech), state)
    assert p_noise.max() < 0.35
    assert (p_speech > 0.5).mean() > 0.9


def test_loud_white_noise_not_speech():
    state = V.init_state()
    _, state = V.vad_step(np, frames_of(room_noise(1.0)), state)
    white = (0.08 * RNG.standard_normal(2 * SR)).astype(np.float32)
    p, _ = V.vad_step(np, frames_of(white), state)
    assert (p > 0.5).mean() < 0.1


def test_trailing_silence_decays():
    state = V.init_state()
    _, state = V.vad_step(np, frames_of(room_noise(1.0)), state)
    _, state = V.vad_step(np, frames_of(speech_like(1.0) + room_noise(1.0)), state)
    p_tail, _ = V.vad_step(np, frames_of(room_noise(1.0)), state)
    # drops below threshold within ~10 frames (320 ms)
    assert (p_tail[:10] < 0.5).any()
    assert p_tail[-1] < 0.35


def test_silence_is_zero_prob():
    p, _ = V.vad_step(np, np.zeros((5, 512), np.float32), V.init_state())
    assert p.max() < 0.3


def test_numpy_jax_parity():
    frames = frames_of(speech_like(1.0) + room_noise(1.0))
    p_np, s_np = V.vad_step(np, frames, V.init_state())
    jit_step = jax.jit(lambda f, s: V.vad_step(jnp, f, s))
    p_jx, s_jx = jit_step(jnp.asarray(frames), V.init_state(jnp))
    assert np.allclose(p_np, np.asarray(p_jx), atol=2e-5)
    assert np.allclose(s_np.noise_floor, np.asarray(s_jx.noise_floor), atol=1e-7)


def test_batched_jax_scoring():
    """One jitted call scores frames for many sessions at once."""
    batch = np.stack(
        [
            frames_of(speech_like(1.0)),
            frames_of(room_noise(1.0) * 0.0),
        ]
    )  # (2, F, 512)
    states = V.VadState(
        noise_floor=jnp.full((2,), 1e-6, jnp.float32),
        prob=jnp.zeros((2,), jnp.float32),
        frames_seen=jnp.zeros((2,), jnp.int32),
    )
    step = jax.jit(jax.vmap(lambda f, s: V.vad_step(jnp, f, s)))
    probs, _ = step(jnp.asarray(batch), states)
    assert probs.shape == batch.shape[:2]
    assert float(probs[0].max()) > 0.5  # speech row
    assert float(probs[1].max()) < 0.3  # silence row


def test_state_carries_across_chunks():
    """Scoring chunk-by-chunk equals scoring all frames at once."""
    frames = frames_of(speech_like(1.5) + room_noise(1.5))
    p_all, _ = V.vad_step(np, frames, V.init_state())
    state = V.init_state()
    parts = []
    for i in range(0, len(frames), 3):
        p, state = V.vad_step(np, frames[i : i + 3], state)
        parts.append(p)
    p_chunked = np.concatenate(parts)
    assert np.allclose(p_all, p_chunked, atol=1e-6)
