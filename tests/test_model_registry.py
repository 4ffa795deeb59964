"""ModelRegistry scheduling semantics: fairness, cancellation, fallback."""

import threading
import time
from concurrent import futures

import numpy as np
import pytest

from stt_tpu.engine.registry import (
    FairSessionQueue,
    ModelRegistry,
    WorkerResult,
    _Task,
)
from stt_tpu.utils.audio import float32_to_pcm16


def make_task(session="s1", is_final=False):
    return _Task(
        pcm=b"\x00\x01" * 160,
        sample_rate=16000,
        options=None,
        session_id=session,
        is_final=is_final,
        submitted_at=time.perf_counter(),
        future=futures.Future(),
    )


class TestFairSessionQueue:
    def test_round_robin_across_sessions(self):
        q = FairSessionQueue()
        for sid in ("a", "a", "b", "c"):
            q.push(make_task(sid))
        order = []
        for _ in range(3):
            t = q.pop(timeout=0)
            order.append(t.session_id)
            q.release(t.session_id)
        # one per session first (a, b, c), then a's second
        assert order == ["a", "b", "c"]
        assert q.pop(timeout=0).session_id == "a"

    def test_one_inflight_per_session(self):
        q = FairSessionQueue()
        q.push(make_task("a"))
        q.push(make_task("a"))
        first = q.pop(timeout=0)
        assert first is not None
        # second task for same session blocked while first inflight
        assert q.pop(timeout=0) is None
        q.release("a")
        assert q.pop(timeout=0) is not None

    def test_final_cancels_queued_partials(self):
        q = FairSessionQueue()
        p1, p2 = make_task("a"), make_task("a")
        q.push(p1)
        q.push(p2)
        final = make_task("a", is_final=True)
        q.push(final)
        assert p1.future.cancelled()
        assert p2.future.cancelled()
        t = q.pop(timeout=0)
        assert t is final

    def test_depth(self):
        q = FairSessionQueue()
        q.push(make_task("a"))
        q.push(make_task("b"))
        assert q.depth() == 2


@pytest.fixture
def registry():
    reg = ModelRegistry()
    reg.load_model(
        "default",
        {"backend": "fake", "model_size": "fake", "device": "cpu",
         "compute_type": "float32", "pool_size": 2},
    )
    yield reg
    reg.close()


def speech_pcm(dur=1.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * dur)) / 16000
    wave = 0.2 * np.sin(2 * np.pi * 220 * t) + 0.01 * rng.standard_normal(len(t))
    return float32_to_pcm16(wave.astype(np.float32))


def test_submit_decode_returns_result(registry):
    fut = registry.submit_decode("default", "s1", speech_pcm(), 16000, {}, True)
    result = fut.result(timeout=10)
    assert isinstance(result, WorkerResult)
    assert result.audio_duration == pytest.approx(1.0, abs=0.01)
    assert result.latency_sec >= 0
    assert result.segments


def test_unknown_model_falls_back_to_default(registry):
    fut = registry.submit_decode("nope", "s1", speech_pcm(), 16000, {}, True)
    assert fut.result(timeout=10).segments


def test_no_models_loaded_errors():
    reg = ModelRegistry()
    fut = reg.submit_decode("default", "s", b"\x00\x00", 16000, {}, True)
    with pytest.raises(RuntimeError):
        fut.result(timeout=5)


def test_resample_path(registry):
    rng = np.random.default_rng(1)
    t = np.arange(44100) / 44100
    wave = (0.2 * np.sin(2 * np.pi * 220 * t)
            + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    fut = registry.submit_decode(
        "default", "s1", float32_to_pcm16(wave), 44100, {}, True
    )
    result = fut.result(timeout=30)
    assert result.audio_duration == pytest.approx(1.0, abs=0.01)


def test_request_cancel_cooperative(registry):
    futs = [
        registry.submit_decode("default", f"s{i}", speech_pcm(2.0, i), 16000, {}, False)
        for i in range(8)
    ]
    for f in futs[4:]:
        registry.request_cancel(f)
    done = 0
    for f in futs:
        try:
            f.result(timeout=10)
            done += 1
        except (futures.CancelledError, Exception):
            pass
    assert done >= 4  # uncancelled ones complete


def test_health_summary_and_listing(registry):
    summary = registry.health_summary()
    assert summary["models_loaded"] == ["default"]
    assert summary["total_workers"] == 2
    assert summary["empty_pools"] == 0
    models = registry.list_models()
    assert models[0]["model_id"] == "default"
    assert models[0]["pool_size"] == 2


def test_load_duplicate_rejected(registry):
    with pytest.raises(ValueError):
        registry.load_model("default", {"backend": "fake"})


def test_unload_semantics(registry):
    registry.load_model(
        "extra", {"backend": "fake", "model_size": "fake", "device": "cpu",
                  "compute_type": "float32", "pool_size": 1},
    )
    assert registry.unload_model("extra")
    assert not registry.unload_model("extra")   # already gone
    assert not registry.unload_model("default")  # default protected


def test_engine_pool_with_registry():
    """jax_whisper pools batch across sessions through one engine."""
    reg = ModelRegistry()
    reg.load_model(
        "default",
        {"backend": "jax_whisper", "model_size": "test", "device": "cpu",
         "compute_type": "float32", "pool_size": 1,
         "audio_buckets_sec": (1.0,), "batch_buckets": (1, 2, 4),
         "max_decode_tokens": 24, "batch_window_ms": 20.0, "max_batch": 4},
    )
    try:
        futs = [
            reg.submit_decode(
                "default", f"s{i}", speech_pcm(0.8, i), 16000,
                {"language": "en"}, True,
            )
            for i in range(3)
        ]
        results = [f.result(timeout=120) for f in futs]
        assert all(isinstance(r, WorkerResult) for r in results)
        assert all(r.language_code == "en" for r in results)
    finally:
        reg.close()


def test_pool_size_creates_device_replicas():
    """pool_size maps to engine replicas on distinct devices (virtual
    8-device CPU mesh in tests)."""
    import jax
    from stt_tpu.engine.registry import ModelRegistry

    registry = ModelRegistry()
    registry.load_model("default", {
        "backend": "jax_whisper", "model_size": "test",
        "device": "cpu", "compute_type": "float32", "pool_size": 3,
    })
    try:
        pools = registry.list_models()
        assert pools[0]["pool_size"] == 3
        summary = registry.health_summary()
        assert summary["total_workers"] == min(3, jax.device_count())
        # replicas pinned to distinct devices
        pool = registry._pools["default"]
        devices = {e._device for e in pool.engines}
        assert len(devices) == len(pool.engines)
        # a decode still round-trips
        fut = registry.submit_decode(
            "default", "s1", b"\x00\x01" * 8000, 16000, {"language": "en"},
            True,
        )
        result = fut.result(timeout=120)
        assert result.audio_duration > 0
    finally:
        registry.close(drain_timeout_sec=5)


def test_mesh_shape_creates_sharded_engine():
    """tpu_mesh_shape != 1x1 loads one mesh-sharded engine instead of
    replicas and still serves decodes."""
    import jax
    import pytest
    from stt_tpu.engine.registry import ModelRegistry

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    registry = ModelRegistry(engine_defaults={"mesh_shape": (2, 4)})
    registry.load_model("default", {
        "backend": "jax_whisper", "model_size": "test",
        "device": "cpu", "compute_type": "float32", "pool_size": 4,
    })
    try:
        pool = registry._pools["default"]
        assert len(pool.engines) == 1
        assert pool.engines[0]._mesh is not None
        fut = registry.submit_decode(
            "default", "s1", b"\x00\x01" * 8000, 16000, {"language": "en"},
            True,
        )
        assert fut.result(timeout=120).audio_duration > 0
    finally:
        registry.close(drain_timeout_sec=5)


def test_draft_mode_option_plumbs_to_engine():
    """A model load profile can pin the partial-draft routing mode
    (docs/tuning.md: `draft_mode` option; env sets the default)."""
    reg = ModelRegistry()
    reg.load_model(
        "default",
        {"backend": "jax_whisper", "model_size": "test", "device": "cpu",
         "compute_type": "float32", "pool_size": 1, "prewarm": False,
         "audio_buckets_sec": (1.0,), "batch_buckets": (1,),
         "max_decode_tokens": 24, "batch_window_ms": 0.0, "max_batch": 1,
         "draft_mode": "on"},
    )
    try:
        eng = reg._pools["default"].engine
        assert eng._draft_mode == "on"
        assert eng._draft_engaged  # 'on' engages unconditionally
    finally:
        reg.close()
