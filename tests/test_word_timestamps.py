"""word_timestamps via cross-attention DTW (VERDICT missing #3): the last
inert decode option is now live end to end."""

import numpy as np

from stt_tpu.models import timing as T


def test_median_filter_basic():
    x = np.asarray([[1.0, 9.0, 1.0, 1.0, 9.0, 1.0, 1.0, 1.0, 1.0]])
    out = T.median_filter(x, width=3)
    assert out.shape == x.shape
    assert out[0, 1] == 1.0  # lone spikes removed
    np.testing.assert_allclose(T.median_filter(x, width=1), x)


def test_dtw_path_follows_diagonal():
    """A cost matrix cheap on the diagonal yields a monotonic path along
    it."""
    n = 8
    cost = np.ones((n, n))
    for i in range(n):
        cost[i, i] = 0.0
    ti, fi = T.dtw_path(cost)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == n - 1 and fi[-1] == n - 1
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()


def test_group_word_tokens_space_split():
    from stt_tpu.models.tokenizer import FallbackTokenizer

    tok = FallbackTokenizer(51865)
    # fallback decodes ids >= 256 as space-prefixed pseudo-words -> each
    # its own group; byte ids (no leading space) glue to the previous
    groups = T.group_word_tokens([1000, 2000, 3000], tok)
    assert groups == [[0], [1], [2]]


def test_word_alignments_synthetic_attention():
    """Tokens attending to successive frame bands align in order with
    times inside the audio duration."""
    from stt_tpu.models.tokenizer import FallbackTokenizer

    tok = FallbackTokenizer(51865)
    n_tok, n_frames = 4, 100
    rng = np.random.default_rng(0)
    weights = 0.01 * rng.random((2, n_tok, n_frames))
    for t in range(n_tok):
        weights[:, t, t * 20 : (t + 1) * 20] += 1.0
    words = T.word_alignments(
        weights, [1000, 2000, 3000, 4000], list(range(n_tok)), tok,
        duration=2.0,
    )
    assert len(words) == 4
    starts = [w.start for w in words]
    assert starts == sorted(starts)
    for w in words:
        assert 0.0 <= w.start <= w.end <= 2.0


def test_engine_word_timestamps_option():
    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    eng = WhisperEngine("test", device="cpu", compute_type="float32",
                        audio_buckets_sec=(1.0, 2.0), batch_buckets=(1,),
                        max_decode_tokens=16)
    rng = np.random.default_rng(5)
    audio = (0.1 * rng.standard_normal(24000)).astype(np.float32)
    out = eng.transcribe_sync(DecodeRequest(
        audio=audio, language="en",
        options={"word_timestamps": True, "no_speech_threshold": None},
    ))
    if out.segments:  # random weights may produce an empty transcript
        assert out.words, "word_timestamps produced no words"
        starts = [w[0] for w in out.words]
        assert starts == sorted(starts)
        for ws, we, wt in out.words:
            assert 0.0 <= ws <= we <= 1.5 + 1e-6
            assert wt.strip()
        # segment boundary refined to the aligned word extent
        assert abs(out.segments[0].start - out.words[0][0]) < 1e-6
    # without the option: no words computed
    plain = eng.transcribe_sync(DecodeRequest(
        audio=audio, language="en",
        options={"no_speech_threshold": None},
    ))
    assert plain.words == []
    eng.close()


def test_engine_word_timestamps_long_final_offsets():
    """The seek loop shifts word times by the window offset."""
    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    eng = WhisperEngine("test", device="cpu", compute_type="float32",
                        audio_buckets_sec=(1.0,), batch_buckets=(1,),
                        max_decode_tokens=16)
    rng = np.random.default_rng(6)
    audio = (0.1 * rng.standard_normal(3 * 16000)).astype(np.float32)
    out = eng.transcribe_sync(DecodeRequest(
        audio=audio, language="en", is_final=True,
        options={"word_timestamps": True, "no_speech_threshold": None},
    ))
    starts = [w[0] for w in out.words]
    assert starts == sorted(starts)
    for ws, we, _ in out.words:
        assert 0.0 <= ws <= we <= 3.0 + 1e-6
    eng.close()


def test_scheduler_stores_offset_word_timings():
    """DecodeStream captures word timings shifted by the decode window's
    stream offset, for the trailing-metadata surface."""
    from stt_tpu.server.component.decode_scheduler import (
        DecodeScheduler, DecodeSchedulerHooks, PendingDecode,
    )
    from stt_tpu.config.languages import SupportedLanguages
    from concurrent.futures import Future

    from stt_tpu.engine.registry import WorkerResult
    from stt_tpu.backends.base import Segment

    fut = Future()
    sched = DecodeScheduler(
        submit_fn=lambda *a, **k: fut,
        hooks=DecodeSchedulerHooks(),
        language_lookup=SupportedLanguages(),
    )
    stream = sched.new_stream()
    fut.set_result(WorkerResult(
        segments=[Segment(0.0, 1.0, " hi there")],
        language_code="en", language_probability=1.0,
        latency_sec=0.01, rtf=0.01, queue_wait_sec=0.0,
        audio_duration=1.0,
        words=((0.1, 0.4, "hi"), (0.5, 0.9, "there")),
    ))
    item = PendingDecode(
        future=fut, is_final=True, offset_sec=10.0, count_vad=False,
        buffer_wait_sec=0.0, holds_slot=False,
    )
    results = list(stream._emit_result(item, fut.result()))
    assert results and results[0].is_final
    assert stream.last_word_timings == [
        (10.1, 10.4, "hi"), (10.5, 10.9, "there")
    ]


def _emit_window(stream, offset_sec, words, is_final):
    """Drive one decode's words through ``_emit_result``."""
    from stt_tpu.server.component.decode_scheduler import PendingDecode
    from concurrent.futures import Future

    from stt_tpu.engine.registry import WorkerResult
    from stt_tpu.backends.base import Segment

    fut = Future()
    fut.set_result(WorkerResult(
        segments=[Segment(0.0, 1.0, " ".join(w[2] for w in words))],
        language_code="en", language_probability=1.0,
        latency_sec=0.01, rtf=0.01, queue_wait_sec=0.0,
        audio_duration=1.0, words=tuple(words),
    ))
    item = PendingDecode(
        future=fut, is_final=is_final, offset_sec=offset_sec,
        count_vad=False, buffer_wait_sec=0.0, holds_slot=False,
    )
    list(stream._emit_result(item, fut.result()))


def test_word_timings_accumulate_across_windows():
    """Multi-window decodes (REST uploads past max_buffer_sec: overflow
    partials + final) accumulate words; each window replaces only the
    span it re-covers (ADVICE r4 medium)."""
    from stt_tpu.server.component.decode_scheduler import (
        DecodeScheduler, DecodeSchedulerHooks,
    )
    from stt_tpu.config.languages import SupportedLanguages

    sched = DecodeScheduler(
        submit_fn=lambda *a, **k: None,
        hooks=DecodeSchedulerHooks(),
        language_lookup=SupportedLanguages(),
    )
    stream = sched.new_stream()
    # window 1: [0, 10) — overflow partial
    _emit_window(
        stream, 0.0, [(0.5, 0.9, "alpha"), (8.0, 8.4, "beta")], False
    )
    # window 2: [10, 20) — second overflow partial; earlier words kept
    _emit_window(stream, 10.0, [(0.2, 0.6, "gamma")], False)
    assert stream.last_word_timings == [
        (0.5, 0.9, "alpha"), (8.0, 8.4, "beta"), (10.2, 10.6, "gamma"),
    ]
    # final re-decodes [10, 22): replaces window 2's words, keeps window 1
    _emit_window(
        stream, 10.0, [(0.2, 0.6, "gamma2"), (11.0, 11.5, "delta")], True
    )
    assert stream.last_word_timings == [
        (0.5, 0.9, "alpha"), (8.0, 8.4, "beta"),
        (10.2, 10.6, "gamma2"), (21.0, 21.5, "delta"),
    ]
