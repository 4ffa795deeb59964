"""Integration tests: real subprocess server + gRPC/HTTP/WS/clients.

Pattern parity with the reference (``tests/test_integration.py:63-180``):
spawn ``python -m stt_tpu.server.main`` on random ports with the fake
backend (no model weights, no TPU — reference uses ``--model tiny``; our
hermetic equivalent is ``--model-backend fake``), poll /health, then
exercise the full stack. Gate with STT_SKIP_INTEGRATION=1.
"""

import contextlib
import json
import os
import socket
import subprocess
import sys
import time
import urllib.request
import wave
from pathlib import Path

import grpc
import numpy as np
import pytest

from stt_tpu.gen import stt_pb2, stt_pb2_grpc

pytestmark = pytest.mark.skipif(
    os.environ.get("STT_SKIP_INTEGRATION") == "1",
    reason="integration tests skipped (STT_SKIP_INTEGRATION=1)",
)

REPO_ROOT = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def tone_wav(tmp_path_factory):
    """1.5s 220Hz tone + trailing silence, 16k mono WAV."""
    path = tmp_path_factory.mktemp("audio") / "tone.wav"
    sr = 16000
    t = np.arange(int(sr * 1.5)) / sr
    tone = (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16)
    silence = np.zeros(int(sr * 0.5), np.int16)
    samples = np.concatenate([tone, silence])
    with wave.open(str(path), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(samples.tobytes())
    return str(path)


@contextlib.contextmanager
def temp_server(extra_args=(), env_extra=None):
    grpc_port, http_port = _free_port(), _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "stt_tpu.server.main",
            "--model", "tiny",
            "--model-backend", "fake",
            "--device", "cpu",
            "--port", str(grpc_port),
            "--metrics-port", str(http_port),
            "--ws-port", "0",
            *extra_args,
        ],
        cwd=REPO_ROOT,
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.monotonic() + 60
        last_err = None
        while time.monotonic() < deadline:
            if proc.poll() is not None:
                out = proc.stdout.read().decode(errors="replace")
                raise RuntimeError(f"server exited early:\n{out}")
            try:
                resp = urllib.request.urlopen(
                    f"http://127.0.0.1:{http_port}/health", timeout=1
                )
                if resp.status == 200:
                    break
            except Exception as exc:
                last_err = exc
                time.sleep(0.25)
        else:
            raise TimeoutError(f"server never became healthy: {last_err}")
        yield grpc_port, http_port
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait(timeout=10)


@pytest.fixture(scope="module")
def server():
    with temp_server() as ports:
        yield ports


def _stub(port):
    channel = grpc.insecure_channel(f"127.0.0.1:{port}")
    return stt_pb2_grpc.STTBackendStub(channel), channel


def test_streaming_roundtrip(server, tone_wav):
    grpc_port, _ = server
    stub, channel = _stub(grpc_port)
    sid = "int-roundtrip"
    stub.CreateSession(stt_pb2.SessionRequest(session_id=sid))
    with wave.open(tone_wav, "rb") as wf:
        pcm = wf.readframes(wf.getnframes())
        sr = wf.getframerate()

    def chunks():
        step = int(sr * 0.1) * 2
        for i in range(0, len(pcm), step):
            yield stt_pb2.AudioChunk(
                session_id=sid, pcm16=pcm[i:i + step], sample_rate=sr
            )
        yield stt_pb2.AudioChunk(session_id=sid, is_final=True, sample_rate=sr)

    call = stub.StreamingRecognize(chunks(), metadata=(("session-id", sid),))
    results = list(call)
    assert results, "expected at least one result"
    assert any(r.is_final for r in results)
    assert all(r.text for r in results if r.is_final)
    trailing = {k: v for k, v in call.trailing_metadata()}
    assert "stt-decode-count" in trailing
    assert int(trailing["stt-decode-count"]) >= 1
    channel.close()


def test_duplicate_session_rejected(server):
    grpc_port, _ = server
    stub, channel = _stub(grpc_port)
    stub.CreateSession(stt_pb2.SessionRequest(session_id="dup-1"))
    with pytest.raises(grpc.RpcError) as exc:
        stub.CreateSession(stt_pb2.SessionRequest(session_id="dup-1"))
    assert "ERR1002" in exc.value.details()
    channel.close()


def test_missing_session_id_rejected(server):
    grpc_port, _ = server
    stub, channel = _stub(grpc_port)
    with pytest.raises(grpc.RpcError) as exc:
        stub.CreateSession(stt_pb2.SessionRequest())
    assert "ERR1001" in exc.value.details()
    channel.close()


def test_http_plane(server):
    _, http_port = server
    health = json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{http_port}/health").read()
    )
    assert health["status"] == "ok"
    assert health["models_loaded"] == ["default"]
    metrics_text = urllib.request.urlopen(
        f"http://127.0.0.1:{http_port}/metrics"
    ).read().decode()
    assert "stt_active_sessions" in metrics_text
    assert "# TYPE stt_decode_latency_sec histogram" in metrics_text
    metrics_json = json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{http_port}/metrics.json").read()
    )
    assert "decode_pending" in metrics_json
    system = json.loads(
        urllib.request.urlopen(f"http://127.0.0.1:{http_port}/system").read()
    )
    assert "process" in system and "rss_bytes" in system["process"]


def test_admin_endpoints(server):
    _, http_port = server
    # admin disabled without env gates
    req = urllib.request.Request(
        f"http://127.0.0.1:{http_port}/admin/list_models", method="GET"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req)
    assert exc.value.code == 501  # ERR4001 Admin API not enabled


def test_realtime_file_client(server, tone_wav):
    grpc_port, _ = server
    proc = subprocess.run(
        [
            sys.executable, "-m", "stt_tpu.client.realtime_file",
            tone_wav,
            "--target", f"127.0.0.1:{grpc_port}",
            "--no-realtime",
            "--session-id", "int-client-file",
        ],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "[FINAL]" in proc.stdout
    assert "[METRIC]" in proc.stdout


def test_batch_file_client(server, tone_wav):
    grpc_port, _ = server
    proc = subprocess.run(
        [
            sys.executable, "-m", "stt_tpu.client.batch_file",
            tone_wav,
            "--target", f"127.0.0.1:{grpc_port}",
            "--session-id", "int-client-batch",
        ],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr + proc.stdout
    assert "[FINAL]" in proc.stdout


def test_admin_multi_model_serving(tone_wav):
    """Load a second model via the admin API and decode against it by
    session model_id attribute."""
    with temp_server(env_extra={
        "STT_ADMIN_ENABLED": "1", "STT_ADMIN_TOKEN": "itok",
    }) as (grpc_port, http_port):
        body = json.dumps({
            "model_id": "alt", "model_size": "tiny",
            "backend": "fake", "device": "cpu",
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{http_port}/admin/load_model",
            data=body, method="POST",
            headers={"authorization": "Bearer itok",
                     "content-type": "application/json"},
        )
        assert json.loads(urllib.request.urlopen(req).read())["status"] in (
            "loading_started", "running"
        )
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline:
            status = json.loads(urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{http_port}/admin/load_model_status?model_id=alt",
                headers={"authorization": "Bearer itok"},
            )).read())
            if status["status"] in ("success", "failed"):
                break
            time.sleep(0.2)
        assert status["status"] == "success"

        stub, channel = _stub(grpc_port)
        stub.CreateSession(stt_pb2.SessionRequest(
            session_id="mm-1", attributes={"model_id": "alt"},
        ))
        pcm = (np.sin(np.linspace(0, 2000, 16000)) * 9000).astype(np.int16)

        def chunks():
            yield stt_pb2.AudioChunk(
                session_id="mm-1", pcm16=pcm.tobytes(), sample_rate=16000
            )
            yield stt_pb2.AudioChunk(session_id="mm-1", is_final=True)

        results = list(stub.StreamingRecognize(
            chunks(), metadata=(("session-id", "mm-1"),)
        ))
        assert any(r.is_final and r.text for r in results)
        models = json.loads(urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{http_port}/admin/list_models",
            headers={"authorization": "Bearer itok"},
        )).read())["models"]
        assert {m["model_id"] for m in models} == {"default", "alt"}
        channel.close()


def test_ws_bridge_streaming(tone_wav):
    """WS bridge end to end inside the subprocess server."""
    import asyncio
    import socket as socket_mod

    import websockets

    with socket_mod.socket() as s:
        s.bind(("127.0.0.1", 0))
        ws_port = s.getsockname()[1]
    with temp_server(
        extra_args=("--ws-port", str(ws_port), "--vad-silence", "0.4"),
        env_extra={"STT_ALLOW_INSECURE_WS": "1"},
    ):
        with wave.open(tone_wav, "rb") as wf:
            pcm = wf.readframes(wf.getnframes())

        async def drive():
            async with websockets.connect(
                f"ws://127.0.0.1:{ws_port}/ws/stream"
            ) as ws:
                await ws.send(json.dumps({
                    "type": "start", "session_id": "int-ws-1",
                    "sample_rate": 16000,
                    "attributes": {"partial": "true"},
                }))
                hello = json.loads(await ws.recv())
                assert hello["type"] == "session"
                step = 3200
                for i in range(0, len(pcm), step):
                    await ws.send(pcm[i:i + step])
                    await asyncio.sleep(0.02)
                await ws.send(json.dumps({"type": "end"}))
                kinds = []
                while True:
                    msg = json.loads(await ws.recv())
                    kinds.append(msg["type"])
                    if msg["type"] in ("done", "error"):
                        return kinds, msg

        kinds, last = asyncio.run(drive())
        assert "result" in kinds
        assert last["type"] == "done"
        assert "stt-decode-count" in (last.get("trailing") or {})
