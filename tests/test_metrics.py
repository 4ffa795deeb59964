"""Metrics registry and histogram tests."""

import grpc

from stt_tpu.server.runtime.metrics import Histogram, Metrics, hash_key


def test_histogram_cumulative_counts():
    h = Histogram((0.1, 1.0, 10.0))
    for v in [0.05, 0.5, 0.5, 5.0, 50.0]:
        h.observe(v)
    snap = h.snapshot()
    assert snap.count == 5
    assert abs(snap.sum - 56.05) < 1e-9
    # cumulative: <=0.1 -> 1, <=1.0 -> 3, <=10.0 -> 4, +Inf -> 5
    assert snap.cumulative_counts == (1, 3, 4, 5)


def test_histogram_negative_clamped():
    h = Histogram((1.0,))
    h.observe(-5.0)
    snap = h.snapshot()
    assert snap.cumulative_counts == (1, 1)
    assert snap.sum == 0.0


def test_session_counters_and_api_key_hashing():
    m = Metrics()
    m.set_expose_api_key_metrics(True)
    m.increase_active_sessions("key-1")
    m.increase_active_sessions("key-1")
    m.increase_active_sessions("key-2")
    payload = m.render()
    assert payload["active_sessions"] == 3
    by_api = payload["active_sessions_by_api"]
    assert set(by_api.values()) == {2, 1}
    # raw keys never appear
    assert "key-1" not in by_api and "key-2" not in by_api
    m.decrease_active_sessions("key-1")
    m.decrease_active_sessions("key-1")
    payload = m.render()
    assert payload["active_sessions"] == 1
    assert len(payload["active_sessions_by_api"]) == 1


def test_decode_timing_aggregates():
    m = Metrics()
    m.record_decode(
        0.5, buffer_wait_sec=0.1, queue_wait_sec=0.02, response_emit_sec=0.01,
        real_time_factor=0.2,
    )
    m.record_decode(1.5, real_time_factor=0.4)
    payload = m.render()
    assert payload["decode_latency_count"] == 2
    assert abs(payload["decode_latency_total"] - 2.0) < 1e-9
    assert payload["decode_latency_max"] == 1.5
    assert payload["decode_buffer_wait_count"] == 1
    snap = m.snapshot()
    assert abs(snap["decode_latency_avg"] - 1.0) < 1e-9
    assert abs(snap["rtf_avg"] - 0.3) < 1e-9
    hist = payload["histograms"]["decode_latency_sec"]
    assert hist["count"] == 2


def test_error_and_rate_limit_counters():
    m = Metrics()
    m.record_error(grpc.StatusCode.RESOURCE_EXHAUSTED)
    m.record_error(grpc.StatusCode.RESOURCE_EXHAUSTED)
    m.record_rate_limit_block("create_session", key="1.2.3.4")
    payload = m.render()
    assert payload["error_counts"]["RESOURCE_EXHAUSTED"] == 2
    assert payload["rate_limit_blocks"]["create_session"] == 1
    assert any(
        k.startswith("create_session_") for k in payload["rate_limit_blocks_by_key"]
    )


def test_engine_metrics():
    m = Metrics()
    m.record_engine_batch(rows=8, capacity=16, step_sec=0.004)
    m.record_engine_compile(12.0)
    payload = m.render()
    assert payload["engine_batch_rows_count"] == 1
    assert payload["engine_compile_count"] == 1
    snap = m.snapshot()
    assert abs(snap["engine_batch_occupancy_avg"] - 0.5) < 1e-9


def test_stream_buffer_tracking():
    m = Metrics()
    m.set_stream_buffer_bytes("sess-a", 1024)
    payload = m.render()
    assert list(payload["stream_buffer_bytes"].values()) == [1024]
    assert "sess-a" not in payload["stream_buffer_bytes"]
    m.clear_stream_buffer("sess-a")
    assert "stream_buffer_bytes" not in m.render()


def test_hash_key_stable_and_empty():
    assert hash_key("") == ""
    assert hash_key("abc") == hash_key("abc")
    assert len(hash_key("abc")) == 16
