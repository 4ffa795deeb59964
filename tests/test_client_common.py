"""Client common-helper tests: WAV loading, chunking, transcript tracking."""

import wave

import numpy as np
import pytest

from stt_tpu.client.common import (
    TranscriptTracker,
    chunk_stream,
    load_audio,
    merge_transcript,
)
from stt_tpu.gen import stt_pb2


def _write_wav(path, samples, sr=16000, sampwidth=2, channels=1):
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(sampwidth)
        wf.setframerate(sr)
        wf.writeframes(samples)


def test_load_wav_16bit_mono(tmp_path):
    samples = (np.arange(1600, dtype=np.int16) * 3).tobytes()
    _write_wav(tmp_path / "a.wav", samples)
    audio, sr = load_audio(str(tmp_path / "a.wav"))
    assert sr == 16000
    assert audio.dtype == np.int16
    assert len(audio) == 1600


def test_load_wav_stereo_takes_left(tmp_path):
    left = np.arange(100, dtype=np.int16)
    right = -left
    inter = np.empty(200, np.int16)
    inter[0::2] = left
    inter[1::2] = right
    _write_wav(tmp_path / "s.wav", inter.tobytes(), channels=2)
    audio, _ = load_audio(str(tmp_path / "s.wav"))
    np.testing.assert_array_equal(audio, left)


def test_chunk_stream_final_chunk():
    audio = np.zeros(16000, np.int16)
    chunks = list(chunk_stream(audio, 16000, 100, "s1", realtime=False))
    assert len(chunks) == 11  # 10 x 100ms + empty final
    assert all(not c.is_final for c in chunks[:-1])
    assert chunks[-1].is_final and chunks[-1].pcm16 == b""
    assert all(c.session_id == "s1" for c in chunks)


def test_merge_transcript():
    assert merge_transcript("", "hello") == "hello"
    assert merge_transcript("hello", "") == "hello"
    assert merge_transcript("hello", "hello world") == "hello world"
    assert merge_transcript("hello", "there") == "hello there"


def test_transcript_tracker_prefers_server_fields():
    tracker = TranscriptTracker()
    partial = stt_pb2.STTResult(
        text="x", is_final=False,
        committed_text="hello", unstable_text="wor",
    )
    assert tracker.display_text(partial) == "hello wor"
    assert tracker.committed == "hello"
    final = stt_pb2.STTResult(
        text="x", is_final=True,
        committed_text="", unstable_text="world",
    )
    assert tracker.display_text(final) == "world"


def test_transcript_tracker_local_fallback():
    tracker = TranscriptTracker()
    p = stt_pb2.STTResult(text="hello wor", is_final=False)
    assert tracker.display_text(p) == "hello wor"
    f = stt_pb2.STTResult(text="hello world", is_final=True)
    assert tracker.display_text(f) == "hello world"
    assert tracker.committed == "hello world"
    f2 = stt_pb2.STTResult(text="again", is_final=True)
    assert tracker.display_text(f2) == "hello world again"
