"""FakeBackend determinism and prefix-stability tests."""

import numpy as np

from stt_tpu.backends.fake import FakeBackend


def speechy(dur, seed=0, level=0.1):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * dur)) / 16000
    return (level * np.sin(2 * np.pi * 220 * t)
            + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def test_deterministic():
    b = FakeBackend()
    audio = speechy(2.0)
    s1, _ = b.transcribe(audio, {})
    s2, _ = b.transcribe(audio, {})
    assert [x.text for x in s1] == [x.text for x in s2]
    assert s1[0].text.startswith(" ")


def test_silence_empty():
    b = FakeBackend()
    segments, info = b.transcribe(np.zeros(16000, np.float32), {})
    assert segments == []
    assert info.language == "en"


def test_growing_window_extends_transcript():
    """Longer window over the same audio keeps the earlier words as prefix —
    the property the commit/unstable logic depends on."""
    b = FakeBackend()
    audio = speechy(3.0)
    first, _ = b.transcribe(audio[: 16000 * 2], {})
    longer, _ = b.transcribe(audio, {})
    assert longer[0].text.startswith(first[0].text)
    assert len(longer[0].text) > len(first[0].text)


def test_language_option_respected():
    b = FakeBackend()
    _, info = b.transcribe(speechy(1.0), {"language": "ko"})
    assert info.language == "ko"


def test_different_audio_different_words():
    b = FakeBackend()
    s1, _ = b.transcribe(speechy(1.0, seed=1), {})
    s2, _ = b.transcribe(speechy(1.0, seed=2) * 1.7, {})
    assert s1 and s2
    assert s1[0].text != s2[0].text
