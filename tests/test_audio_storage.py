"""Audio storage capture + retention tests."""

import os
import time
import wave

import numpy as np

from stt_tpu.server.component.audio_storage import (
    AudioStorageConfig,
    AudioStorageManager,
)


def test_capture_roundtrip(tmp_path):
    mgr = AudioStorageManager(AudioStorageConfig(directory=str(tmp_path)))
    rec = mgr.create_recorder("sess/../1", 16000)
    pcm = np.arange(1600, dtype=np.int16).tobytes()
    rec.append(pcm)
    rec.append(pcm)
    path = rec.finalize()
    assert path and os.path.exists(path)
    assert "/" not in os.path.basename(path).replace(".wav", "").split("_", 1)[1]
    with wave.open(path) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.readframes(10**6) == pcm + pcm


def test_empty_capture_deleted(tmp_path):
    mgr = AudioStorageManager(AudioStorageConfig(directory=str(tmp_path)))
    rec = mgr.create_recorder("empty", 16000)
    assert rec.finalize() is None
    assert list(tmp_path.iterdir()) == []


def test_queue_drop_oldest(tmp_path):
    mgr = AudioStorageManager(
        AudioStorageConfig(directory=str(tmp_path), queue_max_chunks=2)
    )
    rec = mgr.create_recorder("drop", 16000)
    # flood faster than the writer can drain; must never block
    for _ in range(200):
        rec.append(b"\x01\x02" * 100)
    path = rec.finalize()
    assert path is None or os.path.exists(path)


def _touch(tmp_path, name, size=100, age_sec=0):
    p = tmp_path / name
    p.write_bytes(b"x" * size)
    if age_sec:
        past = time.time() - age_sec
        os.utime(p, (past, past))
    return p


def test_retention_max_files(tmp_path):
    mgr = AudioStorageManager(
        AudioStorageConfig(directory=str(tmp_path), max_files=2)
    )
    _touch(tmp_path, "a.wav", age_sec=300)
    _touch(tmp_path, "b.wav", age_sec=200)
    _touch(tmp_path, "c.wav", age_sec=100)
    assert mgr.enforce_retention() == 1
    assert not (tmp_path / "a.wav").exists()
    assert (tmp_path / "c.wav").exists()


def test_retention_max_age(tmp_path):
    mgr = AudioStorageManager(
        AudioStorageConfig(directory=str(tmp_path), max_age_days=1)
    )
    _touch(tmp_path, "old.wav", age_sec=2 * 86400)
    _touch(tmp_path, "new.wav", age_sec=60)
    assert mgr.enforce_retention() == 1
    assert (tmp_path / "new.wav").exists()


def test_retention_max_bytes(tmp_path):
    mgr = AudioStorageManager(
        AudioStorageConfig(directory=str(tmp_path), max_bytes=250)
    )
    _touch(tmp_path, "a.wav", size=100, age_sec=300)
    _touch(tmp_path, "b.wav", size=100, age_sec=200)
    _touch(tmp_path, "c.wav", size=100, age_sec=100)
    assert mgr.enforce_retention() == 1
    assert not (tmp_path / "a.wav").exists()
