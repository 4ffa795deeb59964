"""DecodeStream tests: golden commit/unstable cases, pending/timeout paths."""

import time
from concurrent import futures

import pytest

from stt_tpu.backends.base import Segment
from stt_tpu.engine.registry import WorkerResult
from stt_tpu.errors import STTError
from stt_tpu.server.component.decode_scheduler import (
    DecodeScheduler,
    DecodeSchedulerHooks,
    commit_from_partials,
    merge_transcript,
)


def make_scheduler(**kwargs):
    submitted = []

    def submit_fn(model_id, session_id, pcm, rate, options, is_final):
        fut = futures.Future()
        submitted.append((fut, model_id, session_id, pcm, is_final))
        return fut

    sched = DecodeScheduler(submit_fn=submit_fn, **kwargs)
    sched._submitted = submitted
    return sched


def result_of(text, latency=0.1, lang="en"):
    return WorkerResult(
        segments=[Segment(0.0, 1.0, text)] if text else [],
        language_code=lang,
        language_probability=1.0,
        latency_sec=latency,
        rtf=0.1,
        queue_wait_sec=0.01,
        audio_duration=1.0,
    )


# -- golden commit-state cases (reference test_decode_stream.py:254-309) ------


def test_commit_state_progression():
    stream = make_scheduler().new_stream()
    assert stream._update_commit_state("hello wor", False) == ("", "hello wor")
    assert stream._update_commit_state("hello world again", False) == (
        "hello", "world again"
    )
    assert stream._update_commit_state("hello world again please", False) == (
        "hello world", "again please"
    )
    assert stream._update_commit_state("hello world again please", True) == (
        "hello world again please", ""
    )


def test_commit_state_cjk_without_spaces():
    stream = make_scheduler().new_stream()
    first = "안녕하세"
    second = "안녕하세요"
    assert stream._update_commit_state(first, False) == ("", first)
    assert stream._update_commit_state(second, False) == (first, "요")


def test_commit_state_punctuation_boundary():
    stream = make_scheduler().new_stream()
    first = "你好世界。"
    second = "你好世界。今天"
    assert stream._update_commit_state(first, False) == ("", first)
    assert stream._update_commit_state(second, False) == (first, "今天")


def test_commit_state_empty_final_keeps_committed():
    stream = make_scheduler().new_stream()
    stream._update_commit_state("hello world again", False)
    stream._update_commit_state("hello world again still", False)
    committed, unstable = stream._update_commit_state("", True)
    assert committed == "hello world"
    assert unstable == ""


def test_merge_transcript_rules():
    assert merge_transcript("", "abc") == "abc"
    assert merge_transcript("abc", "") == "abc"
    assert merge_transcript("hello", "hello world") == "hello world"
    assert merge_transcript("hello", "there") == "hello there"


def test_commit_from_partials_requires_both():
    assert commit_from_partials("c", "", "current") == "c"
    assert commit_from_partials("c", "prev", "") == "c"


# -- scheduling / emission -----------------------------------------------------


def test_schedule_and_emit_nonblocking():
    sched = make_scheduler()
    stream = sched.new_stream()
    stream.set_session_id("s1")
    stream.schedule_decode(b"\x00\x01" * 100, 16000, {}, False, 0.5)
    assert stream.pending_count() == 1
    assert list(stream.emit_ready(block=False)) == []  # not done yet
    fut = sched._submitted[0][0]
    fut.set_result(result_of(" hello"))
    msgs = list(stream.emit_ready(block=False))
    assert len(msgs) == 1
    assert msgs[0].text == " hello"
    assert msgs[0].start_sec == 0.5
    assert msgs[0].end_sec == 1.5
    assert msgs[0].language == "English"
    assert not msgs[0].is_final
    assert stream.pending_count() == 0


def test_empty_pcm_skipped():
    sched = make_scheduler()
    stream = sched.new_stream()
    stream.schedule_decode(b"", 16000, {}, True, 0.0)
    assert stream.pending_count() == 0
    assert sched._submitted == []


def test_blocking_emit_timeout_raises_err2001():
    sched = make_scheduler(decode_timeout_sec=0.2)
    stream = sched.new_stream()
    stream.schedule_decode(b"\x00" * 10, 16000, {}, True, 0.0)
    with pytest.raises(STTError) as exc:
        list(stream.emit_ready(block=True))
    assert "ERR2001" in str(exc.value)
    assert stream.pending_count() == 0


def test_blocking_emit_returns_when_done():
    sched = make_scheduler(decode_timeout_sec=5.0)
    stream = sched.new_stream()
    stream.schedule_decode(b"\x00" * 10, 16000, {}, True, 0.0)
    fut = sched._submitted[0][0]

    import threading

    threading.Timer(0.05, lambda: fut.set_result(result_of(" done"))).start()
    msgs = list(stream.emit_ready(block=True))
    assert [m.text for m in msgs] == [" done"]
    assert msgs[0].is_final


def test_failed_future_raises_err2002():
    sched = make_scheduler()
    stream = sched.new_stream()
    stream.schedule_decode(b"\x00" * 10, 16000, {}, False, 0.0)
    sched._submitted[0][0].set_exception(RuntimeError("boom"))
    with pytest.raises(STTError) as exc:
        list(stream.emit_ready(block=False))
    assert "ERR2002" in str(exc.value)


def test_cancelled_future_skipped_silently():
    sched = make_scheduler()
    stream = sched.new_stream()
    stream.schedule_decode(b"\x00" * 10, 16000, {}, False, 0.0)
    sched._submitted[0][0].cancel()
    assert list(stream.emit_ready(block=False)) == []
    assert stream.pending_count() == 0


def test_drop_pending_partials_keeps_finals():
    sched = make_scheduler()
    stream = sched.new_stream()
    stream.schedule_decode(b"\x01" * 4, 16000, {}, False, 0.0)
    stream.schedule_decode(b"\x02" * 4, 16000, {}, False, 0.0)
    stream.schedule_decode(b"\x03" * 4, 16000, {}, True, 0.0)
    cancelled, orphaned = stream.drop_pending_partials()
    assert cancelled == 2
    assert orphaned == 0
    assert stream.pending_count() == 1
    assert stream.pending_partial_decodes() == 0


def test_drop_pending_partials_max_drop():
    sched = make_scheduler()
    stream = sched.new_stream()
    for _ in range(3):
        stream.schedule_decode(b"\x01" * 4, 16000, {}, False, 0.0)
    cancelled, _ = stream.drop_pending_partials(max_drop=1)
    assert cancelled == 1
    assert stream.pending_count() == 2


def test_orphaned_counts_as_health_error():
    sched = make_scheduler(health_min_events=1)
    assert sched.workers_healthy()
    sched.notify_orphaned(1)
    assert not sched.workers_healthy()


def test_health_ratios():
    sched = make_scheduler(health_min_events=4, health_max_timeout_ratio=0.5)
    for _ in range(3):
        sched.record_health_event("success")
    sched.record_health_event("timeout")
    assert sched.workers_healthy()  # 25% timeout < 50%
    sched.record_health_event("timeout")
    sched.record_health_event("timeout")
    assert not sched.workers_healthy()  # 50% timeout


def test_registry_health_gates():
    sched = make_scheduler()
    sched.registry_health_fn = lambda: {
        "models_loaded": [], "total_workers": 0,
        "empty_pools": 0, "shutdown_workers": 0,
    }
    assert not sched.workers_healthy()


def test_global_pending_slots():
    sched = make_scheduler(max_pending_decodes_global=2)
    assert sched.acquire_pending_slot(block=False, timeout=None)
    assert sched.acquire_pending_slot(block=False, timeout=None)
    assert not sched.acquire_pending_slot(block=False, timeout=None)
    sched.release_pending_slot()
    assert sched.acquire_pending_slot(block=False, timeout=None)
    # over-release is tolerated
    sched.release_pending_slot()
    sched.release_pending_slot()
    sched.release_pending_slot()


def test_timing_summary_accumulates():
    sched = make_scheduler()
    stream = sched.new_stream()
    stream.schedule_decode(
        b"\x00" * 10, 16000, {}, True, 0.0,
        buffer_started_at=time.perf_counter() - 0.1,
    )
    sched._submitted[0][0].set_result(result_of(" x", latency=0.25))
    list(stream.emit_ready(block=False))
    buffer_wait, queue_wait, inference, emit, count = stream.timing_summary()
    assert count == 1
    assert inference == pytest.approx(0.25)
    assert buffer_wait == pytest.approx(0.1, abs=0.05)


def test_hooks_fanout_on_result():
    events = []
    hooks = DecodeSchedulerHooks(
        on_decode_result=lambda *a: events.append(("result", a)),
        on_vad_utterance_end=lambda: events.append(("vad", ())),
    )
    sched = make_scheduler(hooks=hooks)
    stream = sched.new_stream()
    stream.schedule_decode(b"\x00" * 10, 16000, {}, True, 0.0, count_vad=True)
    sched._submitted[0][0].set_result(result_of(" y"))
    list(stream.emit_ready(block=False))
    kinds = [k for k, _ in events]
    assert "result" in kinds and "vad" in kinds


def test_condition_on_previous_text_injects_committed():
    sched = make_scheduler()
    stream = sched.new_stream()
    # establish committed text via a final decode result path
    stream._update_commit_state("hello world", True)
    stream.schedule_decode(
        b"\x00\x01" * 100, 16000,
        {"condition_on_previous_text": True}, False, 0.0,
    )
    fut, model_id, session_id, pcm, is_final = sched._submitted[-1]
    # options are passed positionally as the 5th arg of submit_fn; grab via
    # a fresh scheduler capture instead
    captured = {}

    def submit_fn(model_id, session_id, pcm, rate, options, is_final):
        captured.update(options or {})
        import concurrent.futures as cf
        return cf.Future()

    from stt_tpu.server.component.decode_scheduler import DecodeScheduler
    sched2 = DecodeScheduler(submit_fn=submit_fn)
    stream2 = sched2.new_stream()
    stream2._update_commit_state("previous words", True)
    stream2.schedule_decode(
        b"\x00\x01" * 100, 16000,
        {"condition_on_previous_text": True}, False, 0.0,
    )
    assert captured.get("initial_prompt") == "previous words"
    # without the option, no injection
    captured.clear()
    stream3 = sched2.new_stream()
    stream3._update_commit_state("other", True)
    stream3.schedule_decode(b"\x00\x01" * 100, 16000, {}, False, 0.0)
    assert "initial_prompt" not in captured
