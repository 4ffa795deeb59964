"""HTTP plane unit tests (reference tests/test_http_server.py:17-678).

Drives HttpPlane.handle() directly with env monkeypatching — admin/obs
tokens, health modes, rate limit, allowlist, forwarded-IP, Prometheus
format — without binding a socket.
"""

import json
import time

import pytest

from stt_tpu.config.loader import ServerConfig
from stt_tpu.server.runtime.runtime import ApplicationRuntime
from stt_tpu.server.transport.http_server import (
    HttpPlane,
    flatten_metrics,
    prometheus_text,
)


@pytest.fixture(scope="module")
def runtime():
    cfg = ServerConfig(
        model="tiny", model_backend="fake", device="cpu",
        adaptive_throttle_enabled=False,
    )
    rt = ApplicationRuntime(cfg)
    yield rt
    rt.shutdown(drain_timeout_sec=2.0)


def make_plane(runtime, *, rps=0.0, burst=0.0, proxies=None, grpc_running=True):
    return HttpPlane(
        runtime,
        {"grpc_running": grpc_running},
        http_rate_limit_rps=rps,
        http_rate_limit_burst=burst,
        http_trusted_proxies=proxies,
    )


def call(plane, method, path, *, headers=None, body=b"", peer="1.2.3.4",
         query=None):
    return plane.handle(method, path, query or {}, headers or {}, body, peer)


# -- health ----------------------------------------------------------------


def test_health_ok(runtime):
    status, _, payload = call(make_plane(runtime), "GET", "/health")
    assert status == 200
    assert payload["status"] == "ok"
    assert payload["models_loaded"] == ["default"]
    assert payload["grpc_running"] is True


def test_health_unhealthy_when_grpc_down(runtime):
    plane = make_plane(runtime, grpc_running=False)
    status, _, payload = call(plane, "GET", "/health")
    assert status == 500
    assert payload["status"] == "error"


def test_health_minimal_mode(runtime, monkeypatch):
    monkeypatch.setenv("STT_PUBLIC_HEALTH", "minimal")
    status, _, payload = call(make_plane(runtime), "GET", "/health")
    assert status == 200
    assert payload == {"status": "ok"}


def test_health_detail_token_mode(runtime, monkeypatch):
    monkeypatch.setenv("STT_HEALTH_DETAIL_MODE", "token")
    monkeypatch.setenv("STT_OBSERVABILITY_TOKEN", "obstok")
    plane = make_plane(runtime)
    status, _, payload = call(plane, "GET", "/health")
    assert status == 200 and payload == {"status": "ok"}
    status, _, payload = call(
        plane, "GET", "/health",
        headers={"authorization": "Bearer obstok"},
    )
    assert status == 200
    assert "models_loaded" in payload


# -- observability auth -------------------------------------------------------


def test_metrics_requires_obs_token(runtime, monkeypatch):
    monkeypatch.setenv("STT_OBSERVABILITY_TOKEN", "sekret")
    plane = make_plane(runtime)
    status, _, payload = call(plane, "GET", "/metrics")
    assert status == 401
    assert payload["code"] == "ERR4006"
    status, ctype, text = call(
        plane, "GET", "/metrics", headers={"authorization": "Bearer sekret"}
    )
    assert status == 200
    assert "stt_active_sessions" in text


def test_metrics_json(runtime):
    status, _, payload = call(make_plane(runtime), "GET", "/metrics.json")
    assert status == 200
    assert "decode_pending" in payload
    assert "histograms" in payload


def test_system_endpoint(runtime):
    status, _, payload = call(make_plane(runtime), "GET", "/system")
    assert status == 200
    assert payload["process"]["rss_bytes"] > 0
    assert payload["runtime"]["model"]["model_backend"] == "fake"


# -- rate limit / allowlist ----------------------------------------------------


def test_http_rate_limit(runtime):
    plane = make_plane(runtime, rps=1.0, burst=2.0)
    assert call(plane, "GET", "/health")[0] == 200
    assert call(plane, "GET", "/health")[0] == 200
    status, _, payload = call(plane, "GET", "/health")
    assert status == 429
    assert payload["code"] == "ERR4007"


def test_ip_allowlist(runtime, monkeypatch):
    monkeypatch.setenv("STT_HTTP_ALLOWLIST", "10.0.0.0/8")
    plane = make_plane(runtime)
    status, _, payload = call(plane, "GET", "/health", peer="1.2.3.4")
    assert status == 403 and payload["code"] == "ERR4008"
    assert call(plane, "GET", "/health", peer="10.1.2.3")[0] == 200


def test_forwarded_for_only_from_trusted_proxy(runtime, monkeypatch):
    monkeypatch.setenv("STT_HTTP_ALLOWLIST", "10.0.0.0/8")
    plane = make_plane(runtime, proxies=["192.168.0.1"])
    # untrusted peer: header ignored -> denied
    status, _, _ = call(
        plane, "GET", "/health", peer="1.2.3.4",
        headers={"x-forwarded-for": "10.9.9.9"},
    )
    assert status == 403
    # trusted proxy: forwarded IP honored -> allowed
    status, _, _ = call(
        plane, "GET", "/health", peer="192.168.0.1",
        headers={"x-forwarded-for": "10.9.9.9"},
    )
    assert status == 200


# -- admin ------------------------------------------------------------------------


def test_admin_disabled_without_env(runtime):
    status, _, payload = call(make_plane(runtime), "GET", "/admin/list_models")
    assert status == 501 and payload["code"] == "ERR4001"


def test_admin_wrong_token(runtime, monkeypatch):
    monkeypatch.setenv("STT_ADMIN_ENABLED", "1")
    monkeypatch.setenv("STT_ADMIN_TOKEN", "right")
    plane = make_plane(runtime)
    status, _, payload = call(
        plane, "GET", "/admin/list_models",
        headers={"authorization": "Bearer wrong"},
    )
    assert status == 401 and payload["code"] == "ERR4004"


def test_admin_load_unload_cycle(runtime, monkeypatch):
    monkeypatch.setenv("STT_ADMIN_ENABLED", "1")
    monkeypatch.setenv("STT_ADMIN_TOKEN", "tok")
    plane = make_plane(runtime)
    headers = {"authorization": "Bearer tok"}
    status, _, payload = call(plane, "GET", "/admin/list_models", headers=headers)
    assert status == 200
    assert [m["model_id"] for m in payload["models"]] == ["default"]

    body = json.dumps({
        "model_id": "extra", "model_size": "tiny",
        "backend": "fake", "device": "cpu",
    }).encode()
    status, _, payload = call(
        plane, "POST", "/admin/load_model", headers=headers, body=body
    )
    assert status == 200 and payload["status"] == "loading_started"
    deadline = time.monotonic() + 10
    while time.monotonic() < deadline:
        status, _, payload = call(
            plane, "GET", "/admin/load_model_status",
            headers=headers, query={"model_id": ["extra"]},
        )
        if payload["status"] in ("success", "failed"):
            break
        time.sleep(0.05)
    assert payload["status"] == "success"
    assert runtime.model_registry.has_model("extra")

    status, _, payload = call(
        plane, "POST", "/admin/unload_model",
        headers=headers, query={"model_id": ["extra"]},
    )
    assert status == 200 and payload["status"] == "unloaded"
    assert not runtime.model_registry.has_model("extra")


def test_admin_unknown_profile(runtime, monkeypatch):
    monkeypatch.setenv("STT_ADMIN_ENABLED", "1")
    monkeypatch.setenv("STT_ADMIN_TOKEN", "tok")
    plane = make_plane(runtime)
    body = json.dumps({"model_id": "x", "profile_id": "nope"}).encode()
    status, _, payload = call(
        plane, "POST", "/admin/load_model",
        headers={"authorization": "Bearer tok"}, body=body,
    )
    assert status == 400 and payload["code"] == "ERR4009"


def test_admin_model_path_forbidden(runtime, monkeypatch):
    monkeypatch.setenv("STT_ADMIN_ENABLED", "1")
    monkeypatch.setenv("STT_ADMIN_TOKEN", "tok")
    # STT_ADMIN_ALLOW_MODEL_PATH unset -> any model_path is forbidden
    plane = make_plane(runtime)
    body = json.dumps({
        "model_id": "y", "model_path": "/etc/passwd", "backend": "fake",
    }).encode()
    status, _, payload = call(
        plane, "POST", "/admin/load_model",
        headers={"authorization": "Bearer tok"}, body=body,
    )
    assert status == 403 and payload["code"] == "ERR4005"


def test_admin_duplicate_load_conflict(runtime, monkeypatch):
    monkeypatch.setenv("STT_ADMIN_ENABLED", "1")
    monkeypatch.setenv("STT_ADMIN_TOKEN", "tok")
    plane = make_plane(runtime)
    body = json.dumps({"model_id": "default", "backend": "fake"}).encode()
    status, _, payload = call(
        plane, "POST", "/admin/load_model",
        headers={"authorization": "Bearer tok"}, body=body,
    )
    assert status == 409 and payload["code"] == "ERR4002"


# -- prometheus rendering ------------------------------------------------------------


def test_flatten_metrics_sanitizes_names():
    flat = flatten_metrics({"a b": 1, "nested": {"x-y": 2.5}, "skip": None})
    assert flat == {"a_b": 1.0, "nested_x_y": 2.5}


def test_prometheus_text_format(runtime):
    text = prometheus_text(runtime.metrics.render())
    lines = text.splitlines()
    assert any(line.startswith("# TYPE stt_") for line in lines)
    assert any("histogram" in line for line in lines)
    # histogram buckets are cumulative & ordered with a +Inf terminal
    bucket_lines = [l for l in lines if "decode_latency_sec_bucket" in l]
    assert bucket_lines and 'le="+Inf"' in bucket_lines[-1]


def test_unknown_path_404(runtime):
    status, _, _ = call(make_plane(runtime), "GET", "/nope")
    assert status == 404
