"""Abuse/load scenarios: graceful rejection under hostile traffic.

Parity with the reference (``tests/test_abuse_scenarios.py:38-371``):
spawn a server with tightened limits, then assert ERR1011/ERR1012 session
storms, ERR2004 over-long streams, /health staying 200 under noise, and
backpressure metrics actually moving. Gated by STT_RUN_ABUSE_TESTS=1.
"""

import json
import os
import socket
import subprocess
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

import grpc
import numpy as np
import pytest
import yaml

from stt_tpu.gen import stt_pb2, stt_pb2_grpc

pytestmark = pytest.mark.skipif(
    os.environ.get("STT_RUN_ABUSE_TESTS", "").strip().lower()
    not in {"1", "true", "yes"},
    reason="abuse tests disabled (set STT_RUN_ABUSE_TESTS=1)",
)

REPO_ROOT = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def abuse_server():
    grpc_port, http_port = _free_port(), _free_port()
    # base profile = the SHIPPED operator backpressure config (so the file
    # operators tune from is the one CI exercises); only ports are local
    with open(
        REPO_ROOT / "config" / "loadtest" / "bench_backpressure.yaml"
    ) as fh:
        config = yaml.safe_load(fh)
    config["server"].update({
        "port": grpc_port,
        "metrics_port": http_port,
        "ws_port": 0,
    })
    with tempfile.NamedTemporaryFile("w", suffix=".yaml", delete=False) as fh:
        yaml.safe_dump(config, fh)
        config_path = fh.name
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "stt_tpu.server.main",
            "--config", config_path,
            "--model", "tiny", "--model-backend", "fake", "--device", "cpu",
        ],
        cwd=REPO_ROOT, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(
                    "server exited: " + proc.stdout.read().decode(errors="replace")
                )
            try:
                if urllib.request.urlopen(
                    f"http://127.0.0.1:{http_port}/health", timeout=1
                ).status == 200:
                    break
            except Exception:
                time.sleep(0.3)
        else:
            raise TimeoutError("server never healthy")
        yield {
            "grpc": f"127.0.0.1:{grpc_port}",
            "http": f"http://127.0.0.1:{http_port}",
        }
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
        os.unlink(config_path)


def _stub(server):
    channel = grpc.insecure_channel(server["grpc"])
    return stt_pb2_grpc.STTBackendStub(channel), channel


def _metrics(server):
    return json.loads(
        urllib.request.urlopen(f"{server['http']}/metrics.json", timeout=5).read()
    )


def _noise(seconds, seed=7):
    rng = np.random.default_rng(seed)
    return (rng.normal(0, 0.2, int(16000 * seconds)) * 32767).astype(
        np.int16
    ).tobytes()


def _end_session(stub, sid):
    """Stream a lone final chunk to tear the session down server-side."""
    def only_final():
        yield stt_pb2.AudioChunk(session_id=sid, is_final=True, sample_rate=16000)
    try:
        list(stub.StreamingRecognize(only_final(), metadata=(("session-id", sid),)))
    except grpc.RpcError:
        pass


def _create_with_retry(stub, request, attempts=30):
    """CreateSession, waiting out the shared rate-limit bucket."""
    for _ in range(attempts):
        try:
            return stub.CreateSession(request)
        except grpc.RpcError as exc:
            if "ERR1012" in (exc.details() or ""):
                time.sleep(0.4)
                continue
            raise
    raise TimeoutError("CreateSession rate limit never refilled")


def test_session_storm_rate_limited(abuse_server):
    stub, channel = _stub(abuse_server)
    codes, created = [], []
    for i in range(20):
        try:
            stub.CreateSession(stt_pb2.SessionRequest(session_id=f"storm-{i}"))
            codes.append("ok")
            created.append(f"storm-{i}")
        except grpc.RpcError as exc:
            details = exc.details() or ""
            codes.append(details[:7])
    rejected = [c for c in codes if c.startswith("ERR")]
    assert rejected, f"expected rate-limit rejections, got {codes}"
    assert any("ERR1012" in c or "ERR1011" in c for c in rejected)
    for sid in created:  # free the per-IP slots for the following tests
        _end_session(stub, sid)
    channel.close()


def test_over_long_stream_err2004(abuse_server):
    stub, channel = _stub(abuse_server)
    sid = "abuse-long"
    _create_with_retry(stub, stt_pb2.SessionRequest(session_id=sid))
    pcm = _noise(1.0)

    def chunks():
        for _ in range(12):  # 12s > 8s cap
            yield stt_pb2.AudioChunk(session_id=sid, pcm16=pcm, sample_rate=16000)
        yield stt_pb2.AudioChunk(session_id=sid, is_final=True)

    with pytest.raises(grpc.RpcError) as exc:
        list(stub.StreamingRecognize(chunks(), metadata=(("session-id", sid),)))
    assert "ERR2004" in exc.value.details()
    channel.close()


def test_noise_stream_keeps_health_green(abuse_server):
    stub, channel = _stub(abuse_server)
    sid = "abuse-noise"
    _create_with_retry(stub, stt_pb2.SessionRequest(session_id=sid))
    pcm = _noise(0.1)

    def chunks():
        for _ in range(60):
            yield stt_pb2.AudioChunk(session_id=sid, pcm16=pcm, sample_rate=16000)
        yield stt_pb2.AudioChunk(session_id=sid, is_final=True)

    list(stub.StreamingRecognize(chunks(), metadata=(("session-id", sid),)))
    health = urllib.request.urlopen(f"{abuse_server['http']}/health", timeout=5)
    assert health.status == 200
    channel.close()


def test_backpressure_metrics_move(abuse_server):
    """Buffer caps must actually shed: buffer_bytes_total plateaus and the
    tight per-stream buffer forces trims rather than unbounded growth."""
    stub, channel = _stub(abuse_server)
    before = _metrics(abuse_server)
    sid = "abuse-pressure"
    _create_with_retry(stub, stt_pb2.SessionRequest(
        session_id=sid, attributes={"partial": "true"}, vad_threshold=0.01
    ))
    pcm = _noise(0.25)

    def chunks():
        for _ in range(24):  # 6s of loud noise into a 1s buffer cap
            yield stt_pb2.AudioChunk(session_id=sid, pcm16=pcm, sample_rate=16000)
        yield stt_pb2.AudioChunk(session_id=sid, is_final=True)

    list(stub.StreamingRecognize(chunks(), metadata=(("session-id", sid),)))
    after = _metrics(abuse_server)
    # buffer cap enforced: global buffer total stayed under the 1 MiB cap
    assert after["buffer_bytes_total"] <= 1_048_576
    # decodes actually happened under pressure
    assert after["decode_latency_count"] > before["decode_latency_count"]
    channel.close()
