"""Adaptive throttle: pressure signals scale partial cadence and gate
CreateSession (reference runtime.py:276-374 behavior)."""

import time

import pytest

from stt_tpu.config.loader import ServerConfig
from stt_tpu.server.runtime.runtime import AdaptiveThrottle, ApplicationRuntime


@pytest.fixture()
def runtime():
    cfg = ServerConfig(
        model="tiny", model_backend="fake", device="cpu",
        adaptive_throttle_enabled=False,  # drive ticks by hand
        max_pending_decodes_global=10,
        max_total_buffer_bytes=1000,
        partial_decode_interval_sec=1.5,
        adaptive_partial_interval_scale=2.0,
        adaptive_partial_interval_max_sec=5.0,
        adaptive_pending_ratio_high=0.8,
        adaptive_buffer_ratio_high=0.8,
        adaptive_orphan_rate_high=0.5,
        adaptive_create_session_backoff_sec=30.0,
    )
    rt = ApplicationRuntime(cfg)
    yield rt
    rt.shutdown(drain_timeout_sec=2.0)


def test_pending_pressure_throttles_and_recovers(runtime):
    throttle = AdaptiveThrottle(runtime, runtime.config)
    # hot: 9/10 pending
    runtime.metrics.set_decode_pending(9)
    throttle._tick()
    assert not runtime._allow_overload_sessions()
    assert runtime.stream_orchestrator._partial_interval_sec() == 3.0  # 1.5*2

    # cool down: pressure clears, defaults restored (overload window remains
    # until its deadline passes — CreateSession backoff is time-based)
    runtime.metrics.set_decode_pending(0)
    throttle._tick()
    assert runtime.stream_orchestrator._partial_interval_sec() == 1.5


def test_buffer_pressure_triggers(runtime):
    throttle = AdaptiveThrottle(runtime, runtime.config)
    runtime.metrics.set_buffer_total(900)  # 90% of the 1000-byte cap
    throttle._tick()
    assert not runtime._allow_overload_sessions()


def test_orphan_rate_triggers(runtime):
    throttle = AdaptiveThrottle(runtime, runtime.config)
    throttle._tick()  # baseline snapshot (deltas start at 0)
    runtime.metrics.record_decode_orphaned(8)
    runtime.metrics.record_decode_cancelled(2)
    throttle._tick()  # orphan rate 0.8 >= 0.5
    assert not runtime._allow_overload_sessions()


def test_partial_interval_capped(runtime):
    throttle = AdaptiveThrottle(runtime, runtime.config)
    # scale repeatedly; max_sec caps at 5.0
    runtime.metrics.set_decode_pending(9)
    for _ in range(5):
        throttle._tick()
    assert runtime.stream_orchestrator._partial_interval_sec() <= 5.0


def test_create_session_rejected_during_overload(runtime):
    from stt_tpu.gen import stt_pb2

    class Ctx:
        def peer(self):
            return "ipv4:8.8.4.4:2"

        def invocation_metadata(self):
            return ()

        def abort(self, code, details):
            raise RuntimeError(details)

    throttle = AdaptiveThrottle(runtime, runtime.config)
    runtime.metrics.set_decode_pending(10)
    throttle._tick()
    with pytest.raises(RuntimeError) as exc:
        runtime.create_session_handler.handle(
            stt_pb2.SessionRequest(session_id="overload-1"), Ctx()
        )
    assert "ERR1012" in str(exc.value)
