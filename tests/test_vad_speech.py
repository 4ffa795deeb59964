"""VAD endpointing on formant-synthesized speech.

VERDICT weak #6: the DSP VAD was validated only on steady harmonic tones.
A recorded-speech fixture cannot be obtained in a zero-egress image, so
these tests use the Klatt-style formant synthesizer (tools/synth_speech.py)
— glottal pulses through moving formant resonators with fricatives,
plosive closures, word gaps, pitch declination and jitter — which has real
speech's temporal/spectral structure (and indeed exposed a real dynamics
bug in an earlier synthesizer revision that tones never would).

Reference behavior under test: the Silero-driven endpointing semantics of
``stt_server/backend/component/vad_gate.py:326-394`` — trigger only after
``vad_silence`` seconds of sub-threshold audio once speech was active;
sub-second word gaps must NOT trigger.
"""

import numpy as np

from stt_tpu.ops import vad as V
from stt_tpu.server.component.vad_gate import VADGate
from tools.synth_speech import HELLO_WORDS, synthesize

SR = 16000
CHUNK = SR // 10  # 100 ms, the reference clients' pacing


def _pcm16(x: np.ndarray) -> bytes:
    return (np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes()


def _run_gate(sig: np.ndarray, threshold=0.5, silence=0.5):
    """Feed 100 ms chunks; returns (trigger_times, speech_started_at)."""
    gate = VADGate(vad_threshold=threshold, vad_silence=silence)
    triggers = []
    for i in range(0, len(sig) - CHUNK + 1, CHUNK):
        upd = gate.update(_pcm16(sig[i : i + CHUNK]), SR)
        if upd.triggered:
            triggers.append((i + CHUNK) / SR)
            started = gate.speech_started_at
            gate.reset_after_trigger()
            gate.speech_started_at = started  # keep for assertion
    return triggers, gate.speech_started_at


def test_utterance_end_triggers_within_tolerance():
    sig, info = synthesize()
    triggers, _ = _run_gate(sig)
    assert triggers, "utterance end never triggered the VAD gate"
    first = triggers[0]
    # trigger = speech end + vad_silence (0.5) + release decay; allow 1.0 s
    assert info["speech_end"] + 0.4 <= first <= info["speech_end"] + 1.2, (
        f"trigger at {first:.2f}s, speech ended {info['speech_end']:.2f}s"
    )


def test_word_gaps_do_not_trigger():
    """120 ms inter-word gaps and ~50 ms plosive closures must not end the
    utterance at vad_silence=0.5 (reference semantics: silence accumulates
    per chunk and resets on any speech-positive chunk)."""
    sig, info = synthesize()
    triggers, _ = _run_gate(sig, silence=0.5)
    assert all(t > info["speech_end"] for t in triggers), (
        f"triggered mid-utterance: {triggers}"
    )


def test_longer_pause_triggers_with_tight_silence():
    """A 450 ms hesitation pause ends the utterance when vad_silence is
    tighter than the pause — threshold semantics, not accidental
    insensitivity to quiet spans."""
    sig, info = synthesize(gap_sec=0.45)
    triggers, _ = _run_gate(sig, silence=0.25)
    assert any(t <= info["speech_end"] + 0.2 for t in triggers), (
        "tight vad_silence should trigger at an intra-utterance pause"
    )


def test_speech_started_at_estimate():
    """Leading-silence trim anchor: speech_started_at must land near the
    true utterance onset (0.35 s lead), not at stream start."""
    sig, info = synthesize()
    gate = VADGate(vad_threshold=0.5, vad_silence=10.0)
    for i in range(0, len(sig) - CHUNK + 1, CHUNK):
        gate.update(_pcm16(sig[i : i + CHUNK]), SR)
    assert gate.speech_started_at is not None
    assert abs(gate.speech_started_at - info["speech_start"]) <= 0.3


def test_vad_probs_profile_on_speech():
    """Frame-level profile: high during the utterance, low on lead/tail."""
    sig, info = synthesize()
    n = len(sig) // V.VAD_FRAME_SAMPLES
    frames = sig[: n * V.VAD_FRAME_SAMPLES].reshape(n, V.VAD_FRAME_SAMPLES)
    probs, _ = V.vad_step(np, frames, V.init_state())
    t = np.arange(n) * V.VAD_FRAME_SAMPLES / SR
    speech = (t >= info["speech_start"] + 0.05) & (t <= info["speech_end"] - 0.1)
    lead = t < info["speech_start"] - 0.1
    tail = t > info["speech_end"] + 0.3
    assert (probs[speech] > 0.5).mean() > 0.7
    assert (probs[lead] > 0.5).mean() == 0.0
    assert (probs[tail] > 0.5).mean() == 0.0


def test_synthesizer_deterministic_and_formanty():
    """Same seed -> identical samples; voiced spectrum shows harmonic
    structure with energy concentrated in the speech band."""
    a, _ = synthesize(seed=11)
    b, _ = synthesize(seed=11)
    assert np.array_equal(a, b)
    c, _ = synthesize(seed=12)
    assert not np.array_equal(a, c)
    # spectral check over a vowel ("OW" of hello, ~0.55-0.7 s in)
    seg = a[int(0.55 * SR) : int(0.70 * SR)].astype(np.float64)
    spec = np.abs(np.fft.rfft(seg * np.hanning(len(seg))))
    freqs = np.fft.rfftfreq(len(seg), 1 / SR)
    band = spec[(freqs > 80) & (freqs < 4000)].sum()
    assert band / spec.sum() > 0.8  # speech-band concentration
    # harmonicity: autocorrelation peak in the 70-200 Hz pitch range
    ac = np.correlate(seg, seg, "full")[len(seg) - 1 :]
    lag_lo, lag_hi = SR // 200, SR // 70
    assert ac[lag_lo:lag_hi].max() > 0.25 * ac[0]


def test_committed_fixture_endpoints():
    """The committed WAV (tests/fixtures/speech_hello.wav — the analogue of
    the reference's stt_client/assets/hello.wav) endpoints like the
    freshly-synthesized signal: one trigger, shortly after speech ends."""
    import wave
    from pathlib import Path

    path = Path(__file__).parent / "fixtures" / "speech_hello.wav"
    with wave.open(str(path), "rb") as w:
        assert w.getframerate() == SR and w.getnchannels() == 1
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    sig = pcm.astype(np.float32) / 32768.0
    triggers, _ = _run_gate(sig)
    assert len(triggers) == 1
    assert 2.6 <= triggers[0] <= 3.5  # speech ends at ~2.29 s


def test_gap_scaling_words():
    """Sanity on the phone expansion: more words -> longer utterance."""
    short, si = synthesize(words=HELLO_WORDS[:2])
    full, fi = synthesize()
    assert fi["speech_end"] - fi["speech_start"] > (
        si["speech_end"] - si["speech_start"]
    )
    assert len(full) > len(short)
