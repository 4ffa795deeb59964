"""WS bridge unit tests (reference tests/test_ws_server.py + protocol bits).

Covers the admission guards, SessionRequest construction from the start
payload, and a full in-process streaming session driven through
WsBridge.handle_connection with a fake websocket.
"""

import asyncio
import json

import numpy as np
import pytest

from stt_tpu.config.loader import ServerConfig
from stt_tpu.errors import STTError
from stt_tpu.gen import stt_pb2
from stt_tpu.server.runtime.runtime import ApplicationRuntime
from stt_tpu.server.transport.ws_server import WsBridge


@pytest.fixture(scope="module")
def runtime():
    cfg = ServerConfig(
        model="tiny", model_backend="fake", device="cpu",
        adaptive_throttle_enabled=False,
        vad_silence=0.4,
    )
    rt = ApplicationRuntime(cfg)
    yield rt
    rt.shutdown(drain_timeout_sec=2.0)


def test_session_request_parsing():
    payload = {
        "session_id": "s1",
        "vad_mode": "auto",
        "vad_silence": "0.7",
        "vad_threshold": 0.3,
        "require_token": "true",
        "language_code": "ko",
        "task": "translate",
        "decode_profile": "accurate",
        "attributes": {"api_key": "k", "n": 1},
    }
    req = WsBridge.build_session_request(payload, "s1")
    assert req.session_id == "s1"
    assert req.vad_mode == stt_pb2.VAD_AUTO_END
    assert abs(req.vad_silence - 0.7) < 1e-6
    assert req.require_token is True
    assert req.language_code == "ko"
    assert req.task == stt_pb2.TASK_TRANSLATE
    assert req.decode_profile == stt_pb2.DECODE_PROFILE_ACCURATE
    assert dict(req.attributes) == {"api_key": "k", "n": "1"}
    assert not req.HasField("vad_threshold_override")
    req2 = WsBridge.build_session_request(
        {"vad_threshold_override": 0.0}, "s2"
    )
    assert req2.HasField("vad_threshold_override")


def test_admission_allowlist(runtime, monkeypatch):
    monkeypatch.setenv("STT_HTTP_ALLOWLIST", "10.0.0.0/8")
    bridge = WsBridge(runtime)
    with pytest.raises(STTError):
        bridge.check_admission("1.2.3.4")
    bridge.check_admission("10.0.0.5")  # allowed


def test_admission_rate_limit(runtime):
    bridge = WsBridge(runtime, ws_rate_limit_rps=1.0, ws_rate_limit_burst=1.0)
    bridge.check_admission("9.9.9.9")
    with pytest.raises(STTError):
        bridge.check_admission("9.9.9.9")


def test_forwarded_ip_requires_trusted_proxy(runtime):
    bridge = WsBridge(runtime, ws_trusted_proxies=["172.16.0.0/12"])
    assert bridge.client_ip("1.1.1.1", {"x-forwarded-for": "8.8.8.8"}) == "1.1.1.1"
    assert bridge.client_ip("172.16.0.9", {"x-forwarded-for": "8.8.8.8"}) == "8.8.8.8"


class FakeWebSocket:
    """Minimal async websocket double: scripted inbound, captured outbound."""

    def __init__(self, inbound):
        self._inbound = list(inbound)
        self.sent = []
        self.closed = None
        self.remote_address = ("1.2.3.4", 1234)

    async def recv(self):
        if not self._inbound:
            raise ConnectionError("closed")
        return self._inbound.pop(0)

    def __aiter__(self):
        return self

    async def __anext__(self):
        # pace frames so the orchestrator thread can decode + emit between
        # chunks (a real client is paced by capture time)
        await asyncio.sleep(0.02)
        if not self._inbound:
            raise StopAsyncIteration
        return self._inbound.pop(0)

    async def send(self, data):
        self.sent.append(data)

    async def close(self, code=1000):
        self.closed = code


def _pcm(seconds: float) -> bytes:
    t = np.arange(int(16000 * seconds)) / 16000
    return (0.3 * np.sin(2 * np.pi * 220 * t) * 32767).astype(np.int16).tobytes()


def test_full_ws_session(runtime):
    start = json.dumps({
        "type": "start",
        "session_id": "ws-unit-1",
        "sample_rate": 16000,
        "attributes": {"partial": "true"},
        "vad_silence": 0.4,
    })
    # 1s tone, then 1s silence (triggers the VAD), then end
    frames = [_pcm(0.1) for _ in range(10)]
    frames += [b"\x00\x00" * 1600 for _ in range(10)]
    ws = FakeWebSocket([start] + frames + [json.dumps({"type": "end"})])
    bridge = WsBridge(runtime)
    asyncio.run(bridge.handle_connection(ws))

    messages = [json.loads(m) for m in ws.sent]
    kinds = [m["type"] for m in messages]
    assert kinds[0] == "session"
    assert messages[0]["session_id"] == "ws-unit-1"
    assert "result" in kinds
    assert kinds[-1] == "done"
    result = next(m for m in messages if m["type"] == "result")
    assert result["text"]
    assert "committed_text" in result


def test_ws_session_create_error(runtime):
    # duplicate session id -> error frame + close 4401
    runtime.session_registry  # ensure built
    start = json.dumps({"type": "start", "session_id": "ws-dup", "sample_rate": 16000})
    ws1 = FakeWebSocket([start, json.dumps({"type": "end"})])
    bridge = WsBridge(runtime)
    asyncio.run(bridge.handle_connection(ws1))

    # second connection with the same id while... first already ended ->
    # session removed, so use a *concurrent* duplicate via direct registry
    from tests.test_stream_orchestrator import make_info
    runtime.session_registry.create_session("ws-dup2", make_info())
    ws2 = FakeWebSocket([
        json.dumps({"type": "start", "session_id": "ws-dup2"}),
    ])
    asyncio.run(bridge.handle_connection(ws2))
    messages = [json.loads(m) for m in ws2.sent]
    assert messages and messages[0]["type"] == "error"
    assert messages[0]["code"] == "ERR1002"
    assert ws2.closed == 4401


def test_ws_graceful_end_yields_final(runtime):
    """A graceful {"type":"end"} must drain a FINAL result, not cancel.

    Regression: closing the WS context before the orchestrator consumed
    the is_final chunk read as a client disconnect, so the buffered tail
    was never decoded (reason=client_disconnect, no final frame).
    """
    start = json.dumps({
        "type": "start",
        "session_id": "ws-graceful-1",
        "sample_rate": 16000,
        "vad_threshold": 0.0,
        "attributes": {"upload_mode": "batch"},
    })
    # unpaced burst + immediate end: the final decode only happens if the
    # bridge keeps the context alive through the drain
    frames = [_pcm(0.25) for _ in range(8)]
    ws = FakeWebSocket([start] + frames + [json.dumps({"type": "end"})])
    asyncio.run(WsBridge(runtime).handle_connection(ws))

    messages = [json.loads(m) for m in ws.sent]
    finals = [m for m in messages if m["type"] == "result" and m["is_final"]]
    assert finals, f"no final result frame; got kinds {[m['type'] for m in messages]}"
    assert finals[-1]["text"]
    assert messages[-1]["type"] == "done"


def test_ws_invalid_start_closes_1003(runtime):
    ws = FakeWebSocket(["not json {{{"])
    bridge = WsBridge(runtime)
    asyncio.run(bridge.handle_connection(ws))
    assert ws.closed == 1003
    assert ws.sent == []
