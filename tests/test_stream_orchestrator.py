"""StreamOrchestrator scenarios (reference test_stream_orchestrator.py:150-1265).

Pattern: FakeContext implementing the grpc.ServicerContext surface, a real
DecodeScheduler whose submit_fn hands back controllable futures, and a
scripted FakeVADGate substituted via the orchestrator's vad-state factory.
"""

import threading
import time
from concurrent import futures

import pytest

from stt_tpu.backends.base import Segment
from stt_tpu.engine.registry import WorkerResult
from stt_tpu.gen import stt_pb2
from stt_tpu.server.application.orchestrator import (
    BufferLimits,
    DecodeQueueSettings,
    OrchestratorConfig,
    OrchestratorHooks,
    PartialDecodeSettings,
    StreamOrchestrator,
    StreamSettings,
    StorageSettings,
    VADPoolSettings,
    trim_leading_silence,
)
from stt_tpu.server.application.session_manager import (
    SessionFacade,
    SessionInfo,
    SessionRegistry,
)
from stt_tpu.server.component.decode_scheduler import DecodeScheduler
from stt_tpu.server.component.vad_gate import VADModelPool


class AbortError(Exception):
    def __init__(self, code, details):
        self.code = code
        self.details = details
        super().__init__(f"{code}: {details}")


class FakeContext:
    def __init__(self, metadata=(), peer="ipv4:1.2.3.4:5678"):
        self._metadata = tuple(metadata)
        self._peer = peer
        self._callbacks = []
        self._active = True
        self.trailing = None
        self.aborted = None

    def invocation_metadata(self):
        return self._metadata

    def peer(self):
        return self._peer

    def add_callback(self, cb):
        self._callbacks.append(cb)
        return True

    def is_active(self):
        return self._active

    def set_trailing_metadata(self, md):
        self.trailing = dict(md)

    def abort(self, code, details):
        self.aborted = (code, details)
        raise AbortError(code, details)

    def fire_disconnect(self):
        self._active = False
        for cb in self._callbacks:
            cb()


class FakeVADUpdate:
    def __init__(self, triggered=False, speech_active=True, silence=0.0,
                 duration=0.1, rms=0.5):
        self.triggered = triggered
        self.speech_active = speech_active
        self.silence_duration = silence
        self.chunk_duration = duration
        self.chunk_rms = rms


class FakeVADGate:
    """Scripted VAD gate: pops one update per chunk, last one repeats."""

    def __init__(self, script=None):
        self.script = list(script or [])
        self.closed = False
        self.resets = 0
        self.speech_started_at = None

    def update(self, chunk_bytes, sample_rate):
        if self.script:
            upd = self.script.pop(0)
        else:
            upd = FakeVADUpdate()
        return upd

    def reset_after_trigger(self):
        self.resets += 1

    def close(self):
        self.closed = True


def result_of(text, latency=0.1):
    return WorkerResult(
        segments=[Segment(0.0, 1.0, text)] if text else [],
        language_code="en",
        language_probability=1.0,
        latency_sec=latency,
        rtf=0.1,
        queue_wait_sec=0.01,
        audio_duration=1.0,
    )


SR = 16000
LOUD = (b"\x00\x40" * int(SR * 0.1))  # 100ms of loud audio


def chunk(pcm=LOUD, final=False, session_id="", rate=SR, token=""):
    return stt_pb2.AudioChunk(
        session_id=session_id, pcm16=pcm, sample_rate=rate,
        is_final=final, session_token=token,
    )


class Harness:
    def __init__(self, *, config=None, hooks=None, session=None,
                 vad_script=None, auto_resolve="ok", vad_pool=None):
        self.registry = SessionRegistry()
        self.facade = SessionFacade(self.registry)
        self.submitted = []
        self.auto_resolve = auto_resolve

        def submit_fn(model_id, session_id, pcm, rate, options, is_final):
            fut = futures.Future()
            self.submitted.append(
                {"future": fut, "model_id": model_id, "session_id": session_id,
                 "pcm": pcm, "rate": rate, "options": options,
                 "is_final": is_final}
            )
            if self.auto_resolve == "ok":
                fut.set_result(result_of("hello world"))
            return fut

        cfg = config or OrchestratorConfig()
        self.scheduler = DecodeScheduler(
            submit_fn=submit_fn,
            decode_timeout_sec=cfg.stream.decode_timeout_sec,
            max_pending_decodes_global=cfg.decode_queue.max_pending_decodes_global,
        )
        self.orch = StreamOrchestrator(
            self.facade, self.scheduler, cfg, hooks=hooks,
            vad_model_pool=vad_pool,
        )
        self.vad_gate = FakeVADGate(vad_script)
        self.orch._create_vad_state = lambda ss, ctx: self.vad_gate
        info = session or make_info()
        self.registry.create_session("s1", info)

    def run(self, chunks, metadata=(("session-id", "s1"),)):
        ctx = FakeContext(metadata=metadata)
        results = list(self.orch.run(iter(chunks), ctx))
        return results, ctx


def make_info(**kwargs):
    base = dict(
        attributes={}, vad_mode=stt_pb2.VAD_CONTINUE, vad_silence=0.8,
        vad_threshold=0.5, token="", token_required=False,
        client_ip="1.2.3.4", api_key="", decode_profile="realtime",
        decode_options={}, language_code="", task="transcribe",
        model_id="default", vad_reserved=False,
    )
    base.update(kwargs)
    return SessionInfo(**base)


def cfg(**over):
    stream_over = {"session_timeout_sec": 5.0}
    stream_over.update(over.pop("stream", {}))
    return OrchestratorConfig(stream=StreamSettings(**stream_over), **over)


# -- basic flow -----------------------------------------------------------------


def test_final_chunk_schedules_final_decode_and_emits():
    h = Harness(config=cfg())
    results, ctx = h.run([chunk(), chunk(final=True)])
    finals = [s for s in h.submitted if s["is_final"]]
    assert len(finals) == 1
    assert finals[0]["session_id"] == "s1"
    assert any(r.is_final for r in results)
    assert any(r.text == "hello world" for r in results)
    # session removed at finalize
    assert h.registry.get_session("s1") is None


def test_trailing_metadata_decode_timing():
    h = Harness(config=cfg())
    _, ctx = h.run([chunk(), chunk(final=True)])
    assert ctx.trailing is not None
    assert "stt-decode-inference-sec" in ctx.trailing
    assert float(ctx.trailing["stt-decode-inference-sec"]) > 0
    assert int(ctx.trailing["stt-decode-count"]) == 1
    total = float(ctx.trailing["stt-decode-total-sec"])
    parts = sum(
        float(ctx.trailing[k]) for k in (
            "stt-decode-buffer-wait-sec", "stt-decode-queue-wait-sec",
            "stt-decode-inference-sec", "stt-decode-response-emit-sec",
        )
    )
    assert abs(total - parts) < 5e-6  # fields independently rounded to 1e-6


def test_trailing_word_timestamps_capped_on_wire_contexts(monkeypatch):
    """Real gRPC clients reject >8KB metadata (and drop the whole trailing
    block); the wire path keeps the most recent words within the byte
    budget and reports the dropped count. In-process contexts
    (``inprocess_trailing``) get full coverage."""
    import json

    monkeypatch.setenv("STT_WORD_METADATA_MAX_BYTES", "600")
    h = Harness(config=cfg())
    words = [(i * 0.5, i * 0.5 + 0.4, f"word{i}") for i in range(200)]

    # pre-seed every new decode stream with the accumulated word list:
    # run() finalizes (and emits trailing metadata) only after the
    # result generator is exhausted, so the factory is the clean seam
    orig_new_stream = h.scheduler.new_stream

    def new_stream_with_words(*a, **k):
        ds = orig_new_stream(*a, **k)
        ds.last_word_timings = list(words)
        return ds

    h.scheduler.new_stream = new_stream_with_words

    def run_with(ctx_extra):
        if h.registry.get_session("s1") is None:
            h.registry.create_session("s1", make_info())  # finalize removes it
        ctx = FakeContext(metadata=(("session-id", "s1"),))
        for k, v in ctx_extra.items():
            setattr(ctx, k, v)
        list(h.orch.run(iter([chunk(), chunk(final=True)]), ctx))
        return ctx

    ctx = run_with({})
    payload = ctx.trailing["stt-word-timestamps"]
    assert len(payload) <= 600
    dropped = int(ctx.trailing["stt-word-timestamps-dropped"])
    kept = json.loads(payload)
    assert dropped + len(kept) == len(words)
    assert kept[-1][2] == "word199"  # most recent words win

    ctx2 = run_with({"inprocess_trailing": True})
    full = json.loads(ctx2.trailing["stt-word-timestamps"])
    assert len(full) == len(words)
    assert "stt-word-timestamps-dropped" not in ctx2.trailing


def test_empty_stream_clean_finalize():
    h = Harness(config=cfg())
    results, ctx = h.run([])
    assert results == []
    assert h.registry.get_session("s1") is None


# -- VAD trigger paths ------------------------------------------------------------


def test_vad_trigger_schedules_partial_by_default():
    script = [FakeVADUpdate(), FakeVADUpdate(triggered=True, silence=0.9)]
    h = Harness(config=cfg(), vad_script=script)
    h.run([chunk(), chunk()])
    trig = [s for s in h.submitted if not s["is_final"]]
    assert len(trig) == 1
    assert h.vad_gate.resets >= 1


def test_emit_final_on_vad_config():
    script = [FakeVADUpdate(triggered=True, silence=0.9)]
    h = Harness(
        config=cfg(stream={"emit_final_on_vad": True}), vad_script=script
    )
    h.run([chunk()])
    assert [s["is_final"] for s in h.submitted] == [True]


def test_emit_final_on_vad_attribute_override_wins():
    script = [FakeVADUpdate(triggered=True, silence=0.9)]
    info = make_info(attributes={"emit_final_on_vad": "false"})
    h = Harness(
        config=cfg(stream={"emit_final_on_vad": True}),
        vad_script=script, session=info,
    )
    h.run([chunk()])
    assert [s["is_final"] for s in h.submitted] == [False]


def test_auto_end_mode_finalizes_stream():
    script = [FakeVADUpdate(triggered=True, silence=0.9)]
    info = make_info(vad_mode=stt_pb2.VAD_AUTO_END)
    h = Harness(config=cfg(), vad_script=script, session=info)
    results, _ = h.run([chunk(), chunk()])  # second chunk never processed
    assert [s["is_final"] for s in h.submitted] == [True]
    assert any(r.is_final for r in results)


def test_low_energy_buffer_skips_decode_on_trigger():
    script = [FakeVADUpdate(triggered=True, silence=0.9, rms=0.0001)]
    quiet = b"\x01\x00" * int(SR * 0.1)
    h = Harness(
        config=cfg(stream={"speech_rms_threshold": 0.05}), vad_script=script
    )
    h.run([chunk(pcm=quiet)])
    assert h.submitted == []  # trigger dropped AND no drain final (buffer cleared)


def test_leading_silence_trimmed_on_final():
    # utterance starts 1s into a 2s buffer -> final decode gets ~1s of audio
    assert trim_leading_silence(b"ab" * SR * 2, 0.0, 1.0, SR)[1] == 1.0
    script = [
        FakeVADUpdate(speech_active=False),  # 100ms silence
        FakeVADUpdate(speech_active=True),   # speech starts
        FakeVADUpdate(triggered=True, speech_active=True, silence=0.9),
    ]
    h = Harness(config=cfg(stream={"emit_final_on_vad": True}), vad_script=script)
    h.run([chunk(), chunk(), chunk()])
    finals = [s for s in h.submitted if s["is_final"]]
    assert len(finals) == 1
    # 300ms buffered, ~100ms leading silence trimmed
    assert len(finals[0]["pcm"]) < 3 * len(LOUD)


# -- limits -------------------------------------------------------------------------


def test_oversized_chunk_aborts_err1007():
    big = b"\x00\x01" * (SR * 3)  # 3s chunk > 2000ms limit
    h = Harness(config=cfg())
    with pytest.raises(AbortError) as exc:
        h.run([chunk(pcm=big)])
    assert "ERR1007" in exc.value.details


def test_stream_rate_limit_err2003():
    h = Harness(
        config=cfg(stream={
            "max_audio_bytes_per_sec": 100,
            "max_audio_bytes_per_sec_burst": 200,
        })
    )
    with pytest.raises(AbortError) as exc:
        h.run([chunk(), chunk(), chunk()])
    assert "ERR2003" in exc.value.details


def test_batch_mode_uses_batch_limiter():
    info = make_info(attributes={"upload_mode": "batch"})
    h = Harness(
        config=cfg(stream={
            "max_audio_bytes_per_sec": 100,
            "max_audio_bytes_per_sec_burst": 200,
            "max_audio_bytes_per_sec_batch": 10_000_000,
            "max_audio_bytes_per_sec_burst_batch": 10_000_000,
        }),
        session=info,
    )
    results, ctx = h.run([chunk(), chunk(), chunk(final=True)])
    assert ctx.aborted is None


def test_audio_seconds_limit_err2004():
    h = Harness(
        config=cfg(stream={"max_audio_seconds_per_session": 0.15})
    )
    with pytest.raises(AbortError) as exc:
        h.run([chunk(), chunk()])
    assert "ERR2004" in exc.value.details


def test_mismatched_session_id_chunk_ignored():
    h = Harness(config=cfg())
    results, ctx = h.run([chunk(session_id="other"), chunk(final=True)])
    assert ctx.aborted is None
    # the mismatched chunk contributed no audio
    finals = [s for s in h.submitted if s["is_final"]]
    assert len(finals) == 1
    assert len(finals[0]["pcm"]) == len(LOUD)


def test_invalid_token_aborts():
    info = make_info(token="secret", token_required=True)
    h = Harness(config=cfg(), session=info)
    with pytest.raises(AbortError) as exc:
        h.run([chunk(token="wrong")])
    assert "ERR1005" in exc.value.details


# -- pending caps ----------------------------------------------------------------------


def test_per_stream_pending_cap_drops_partial():
    drops = []
    hooks = OrchestratorHooks(on_partial_drop=lambda n: drops.append(n))
    script = [FakeVADUpdate(triggered=True, silence=0.9) for _ in range(4)]
    h = Harness(
        config=cfg(decode_queue=DecodeQueueSettings(
            max_pending_decodes_per_stream=1,
            max_pending_decodes_global=0,
        )),
        hooks=hooks, vad_script=script, auto_resolve="hang",
    )

    def feeder():
        for _ in range(3):
            yield chunk()
        # settle any still-hung futures so the drain phase doesn't block
        for sub in h.submitted:
            if not sub["future"].done():
                sub["future"].set_result(result_of("done"))
        yield chunk(pcm=b"", final=True)

    h.run(feeder())
    assert drops  # older partials evicted to admit newer ones


def test_global_pending_cap_drops_partial_without_abort():
    script = [FakeVADUpdate(triggered=True, silence=0.9) for _ in range(4)]
    h = Harness(
        config=cfg(decode_queue=DecodeQueueSettings(
            max_pending_decodes_per_stream=0,
            max_pending_decodes_global=1,
            decode_queue_timeout_sec=0.05,
        )),
        vad_script=script, auto_resolve="hang",
    )

    def feeder():
        yield chunk()
        yield chunk()
        for sub in h.submitted:
            if not sub["future"].done():
                sub["future"].set_result(result_of("done"))
        yield chunk(pcm=b"", final=True)

    results, ctx = h.run(feeder())
    # first partial takes the only slot; second partial is dropped silently
    assert len(h.submitted) == 1
    assert ctx.aborted is None


def test_global_pending_cap_final_aborts_err2001():
    h = Harness(
        config=cfg(
            decode_queue=DecodeQueueSettings(
                max_pending_decodes_per_stream=0,
                max_pending_decodes_global=1,
                decode_queue_timeout_sec=0.05,
            ),
            stream={"emit_final_on_vad": True},
        ),
        vad_script=[
            FakeVADUpdate(triggered=True, silence=0.9),
            FakeVADUpdate(triggered=True, silence=0.9),
        ],
        auto_resolve="hang",
    )
    with pytest.raises(AbortError) as exc:
        h.run([chunk(), chunk()])
    assert "ERR2001" in exc.value.details


# -- buffer limits -----------------------------------------------------------------------


def test_buffer_overflow_schedules_partial_with_overlap():
    info = make_info(attributes={"partial": "true"})
    h = Harness(
        config=cfg(
            buffer_limits=BufferLimits(
                max_buffer_sec=0.2, buffer_overlap_sec=0.1, max_chunk_ms=2000
            ),
            partial_decode=PartialDecodeSettings(interval_sec=999.0),
        ),
        session=info,
        vad_script=[FakeVADUpdate(speech_active=True)] ,
    )
    h.run([chunk() for _ in range(4)])
    partials = [s for s in h.submitted if not s["is_final"]]
    assert partials, "overflow should schedule a partial decode"
    # window is capped at the buffer limit (0.2s = 6400 bytes)
    assert len(partials[0]["pcm"]) <= int(0.2 * SR * 2) + len(LOUD)


def test_buffer_overflow_trims_without_partial_mode():
    h = Harness(
        config=cfg(buffer_limits=BufferLimits(max_buffer_sec=0.2)),
    )
    results, ctx = h.run([chunk() for _ in range(5)])
    assert not [s for s in h.submitted if not s["is_final"]]
    assert ctx.aborted is None


def test_global_buffer_ledger_sheds_oldest():
    h = Harness(
        config=cfg(buffer_limits=BufferLimits(
            max_total_buffer_bytes=len(LOUD) * 2, max_buffer_sec=None,
        )),
    )
    results, ctx = h.run([chunk() for _ in range(5)])
    assert h.orch.buffer_total_bytes <= len(LOUD) * 2
    assert ctx.aborted is None


# -- periodic partials ---------------------------------------------------------------------


def test_periodic_partial_when_enabled():
    info = make_info(attributes={"partial": "true"})
    h = Harness(
        config=cfg(partial_decode=PartialDecodeSettings(
            interval_sec=0.15, window_sec=10.0,
        )),
        session=info,
    )
    h.run([chunk() for _ in range(5)])
    partials = [s for s in h.submitted if not s["is_final"]]
    assert partials


def test_partial_window_trailing_slice_and_cross_window_conditioning():
    """The shipped partial policy: periodic partials decode at most the
    trailing ``window_sec`` of the buffer (default 5 s — the decode-loop
    halving that meets p95 < 300 ms at 64 streams), and once text has
    committed, later windows are conditioned on it via initial_prompt
    (``condition_on_previous_text`` is in the shipped profile) so the
    shorter window keeps transcript continuity."""
    info = make_info(
        attributes={"partial": "true"},
        decode_options={"condition_on_previous_text": True},
    )
    h = Harness(
        config=cfg(
            partial_decode=PartialDecodeSettings(
                interval_sec=0.05, window_sec=0.3,
            ),
            buffer_limits=BufferLimits(max_buffer_sec=10.0),
        ),
        session=info,
    )
    h.run([chunk() for _ in range(8)])  # 0.8s buffered > 0.3s window
    partials = [s for s in h.submitted if not s["is_final"]]
    assert len(partials) >= 3
    window_bytes = int(0.3 * SR * 2)
    # every partial decodes at most the trailing window
    assert all(len(p["pcm"]) <= window_bytes for p in partials)
    # the buffer outgrew the window, so the LAST partial is exactly capped
    assert len(partials[-1]["pcm"]) == window_bytes
    # after two agreeing partials ("hello world" both times) text commits;
    # later windows must carry it as decode context
    conditioned = [
        p for p in partials
        if (p["options"] or {}).get("initial_prompt")
    ]
    assert conditioned, "no window was conditioned on committed text"
    assert conditioned[-1]["options"]["initial_prompt"].endswith("hello world")


def test_no_periodic_partial_without_attribute():
    h = Harness(
        config=cfg(partial_decode=PartialDecodeSettings(interval_sec=0.1)),
    )
    h.run([chunk() for _ in range(5)])
    assert not [s for s in h.submitted if not s["is_final"]]


def test_adaptive_partial_interval_override():
    info = make_info(attributes={"partial": "true"})
    h = Harness(
        config=cfg(partial_decode=PartialDecodeSettings(interval_sec=0.1)),
        session=info,
    )
    h.orch.set_partial_interval_override(999.0)
    h.run([chunk() for _ in range(5)])
    assert not [s for s in h.submitted if not s["is_final"]]


# -- disconnect / timeout -------------------------------------------------------------------


def test_disconnect_cancels_pending_decodes():
    script = [FakeVADUpdate(triggered=True, silence=0.9)]
    h = Harness(config=cfg(), vad_script=script, auto_resolve="hang")
    ctx = FakeContext(metadata=(("session-id", "s1"),))

    def feeder():
        yield chunk()
        ctx.fire_disconnect()
        yield chunk()

    results = list(h.orch.run(feeder(), ctx))
    assert h.registry.get_session("s1") is None
    # the pending hung decode was cancelled by the disconnect callback
    assert h.submitted[0]["future"].cancelled()


def test_timeout_event_aborts_err1006():
    h = Harness(config=cfg())
    ctx = FakeContext(metadata=(("session-id", "s1"),))
    state_holder = {}
    orig = h.orch._bootstrap_stream

    def spy(state, md, c):
        state_holder["state"] = state
        return orig(state, md, c)

    h.orch._bootstrap_stream = spy

    def feeder():
        yield chunk()
        state_holder["state"].timeout_event.set()
        yield chunk()

    with pytest.raises(AbortError) as exc:
        list(h.orch.run(feeder(), ctx))
    assert "ERR1006" in exc.value.details


def test_watchdog_fires_on_inactivity():
    h = Harness(config=cfg(stream={"session_timeout_sec": 0.1}))
    ctx = FakeContext(metadata=(("session-id", "s1"),))

    def slow_feeder():
        yield chunk()
        time.sleep(0.4)
        yield chunk()

    with pytest.raises(AbortError) as exc:
        list(h.orch.run(slow_feeder(), ctx))
    assert "ERR1006" in exc.value.details


def test_pending_decode_keeps_session_alive():
    """Activity watchdog must not fire while a decode is in flight."""
    h = Harness(config=cfg(stream={"session_timeout_sec": 0.3}),
                auto_resolve="hang")
    script = [FakeVADUpdate(triggered=True, silence=0.9)]
    h.vad_gate.script = script
    ctx = FakeContext(metadata=(("session-id", "s1"),))

    def feeder():
        yield chunk()
        time.sleep(0.5)  # longer than timeout; pending decode keeps us alive
        h.submitted[0]["future"].set_result(result_of("late"))
        h.auto_resolve = "ok"  # let the final decode resolve normally
        yield chunk(final=True)

    results = list(h.orch.run(feeder(), ctx))
    assert ctx.aborted is None
    assert any(r.text == "late" for r in results)


# -- VAD pool ------------------------------------------------------------------------------


def test_vad_pool_exhausted_aborts_err1008():
    h = Harness(
        config=cfg(vad_pool=VADPoolSettings(size=1, max_size=1, growth_factor=1.0))
    )
    # force the real factory (harness normally stubs it out) and fill the pool
    h.orch._create_vad_state = StreamOrchestrator._create_vad_state.__get__(h.orch)
    assert h.orch._vad_pool.reserve_slot()  # consume the only slot
    with pytest.raises(AbortError) as exc:
        h.run([chunk()])
    assert "ERR1008" in exc.value.details


def test_vad_gate_closed_on_finalize():
    h = Harness(config=cfg())
    h.run([chunk(), chunk(final=True)])
    assert h.vad_gate.closed


def test_sample_rate_change_mid_stream():
    """Chunks carrying a new sample rate update duration accounting."""
    h = Harness(config=cfg())
    results, ctx = h.run([
        chunk(rate=16000),
        chunk(pcm=b"\x00\x40" * 800, rate=8000),  # 100ms at 8k
        chunk(final=True, pcm=b"", rate=8000),
    ])
    finals = [s for s in h.submitted if s["is_final"]]
    assert len(finals) == 1
    assert finals[0]["rate"] == 8000  # latest rate wins for the decode


def test_zero_length_chunks_are_harmless():
    h = Harness(config=cfg())
    results, ctx = h.run([
        chunk(pcm=b""), chunk(), chunk(pcm=b""), chunk(final=True, pcm=b""),
    ])
    assert ctx.aborted is None
    finals = [s for s in h.submitted if s["is_final"]]
    assert len(finals) == 1
    assert len(finals[0]["pcm"]) == len(LOUD)


def test_emit_final_on_vad_then_more_speech_new_utterance():
    """After a VAD-final the stream stays open (CONTINUE) and a second
    utterance produces a second final."""
    script = [
        FakeVADUpdate(triggered=True, silence=0.9),
        FakeVADUpdate(),                       # new speech
        FakeVADUpdate(triggered=True, silence=0.9),
    ]
    h = Harness(config=cfg(stream={"emit_final_on_vad": True}),
                vad_script=script)
    h.run([chunk(), chunk(), chunk()])
    finals = [s for s in h.submitted if s["is_final"]]
    assert len(finals) == 2
