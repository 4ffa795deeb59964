"""Real TLS roundtrip over gRPC (reference tests/test_tls_grpc.py:60-141).

Generates a self-signed cert with openssl, starts the server with TLS
flags, and exercises CreateSession + streaming over a secure channel with
``grpc.ssl_target_name_override``. Also checks the tls_required guard.
"""

import os
import socket
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import grpc
import pytest

from stt_tpu.config.loader import ServerConfig
from stt_tpu.gen import stt_pb2, stt_pb2_grpc
from stt_tpu.server.main import bind_grpc_port

REPO_ROOT = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    os.environ.get("STT_SKIP_INTEGRATION") == "1",
    reason="integration tests skipped",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    d = tmp_path_factory.mktemp("tls")
    key, crt = d / "server.key", d / "server.crt"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", str(key), "-out", str(crt),
            "-days", "2", "-nodes",
            "-subj", "/CN=localhost",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
        ],
        check=True, capture_output=True,
    )
    return str(crt), str(key)


def test_tls_required_without_certs_refuses():
    cfg = ServerConfig(tls_required=True)
    with pytest.raises(ValueError):
        bind_grpc_port(None, cfg)


def test_tls_streaming_roundtrip(certs):
    crt, key = certs
    grpc_port, http_port = _free_port(), _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "stt_tpu.server.main",
            "--model", "tiny", "--model-backend", "fake", "--device", "cpu",
            "--port", str(grpc_port), "--metrics-port", str(http_port),
            "--ws-port", "0",
            "--tls-cert-file", crt, "--tls-key-file", key, "--tls-required",
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

        creds = grpc.ssl_channel_credentials(
            root_certificates=Path(crt).read_bytes()
        )
        channel = grpc.secure_channel(
            f"127.0.0.1:{grpc_port}", creds,
            options=[("grpc.ssl_target_name_override", "localhost")],
        )
        stub = stt_pb2_grpc.STTBackendStub(channel)
        resp = stub.CreateSession(
            stt_pb2.SessionRequest(session_id="tls-1"), timeout=10
        )
        assert resp.vad_silence > 0

        def chunks():
            yield stt_pb2.AudioChunk(
                session_id="tls-1", pcm16=b"\x00\x40" * 8000, sample_rate=16000
            )
            yield stt_pb2.AudioChunk(session_id="tls-1", is_final=True)

        results = list(
            stub.StreamingRecognize(
                chunks(), metadata=(("session-id", "tls-1"),), timeout=60
            )
        )
        assert any(r.is_final for r in results)

        # plaintext client against the TLS port must fail
        insecure = grpc.insecure_channel(f"127.0.0.1:{grpc_port}")
        stub2 = stt_pb2_grpc.STTBackendStub(insecure)
        with pytest.raises(grpc.RpcError):
            stub2.CreateSession(
                stt_pb2.SessionRequest(session_id="tls-plain"), timeout=5
            )
        insecure.close()
        channel.close()
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=20)
        except subprocess.TimeoutExpired:
            proc.kill()
