"""WebSocket bridge for browser streaming clients.

Wire-protocol parity with the reference bridge (``stt_server/backend/
transport/ws_server.py:29-521``): endpoint ``/ws/stream``; JSON ``start``
payload -> ``SessionRequest``; ``{"type":"session",...}`` echo; binary
frames = PCM16 audio; ``{"type":"end"}`` finishes; results stream back as
``{"type":"result"|"error"|"done"}`` frames (done carries the trailing
decode-timing metadata). Pre-accept allowlist/rate-limit rejection and
X-Forwarded-For handling behind trusted proxies are kept.

Substrate: the ``websockets`` asyncio server instead of FastAPI/uvicorn
(neither ships in the serving image). The orchestrator still runs on a
worker thread; audio flows asyncio -> ``queue.Queue`` -> sync generator,
and results bounce back with ``loop.call_soon_threadsafe``, exactly the
reference's threading model.
"""

from __future__ import annotations

import asyncio
import ipaddress
import json
import os
import queue
import threading
import uuid
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import grpc

from ...errors import ErrorCode, STTError
from ...gen import stt_pb2
from ...utils.logging import LOGGER
from ...utils.rate_limit import KeyedRateLimiter

_HTTP_RATE_LIMIT_RPS_ENV = "STT_HTTP_RATE_LIMIT_RPS"
_HTTP_RATE_LIMIT_BURST_ENV = "STT_HTTP_RATE_LIMIT_BURST"
_HTTP_ALLOWLIST_ENV = "STT_HTTP_ALLOWLIST"
_HTTP_TRUSTED_PROXIES_ENV = "STT_HTTP_TRUSTED_PROXIES"


def _parse_bool(value: Any, default: bool = False) -> bool:
    if isinstance(value, bool):
        return value
    if value is None:
        return default
    text = str(value).strip().lower()
    if text in {"1", "true", "yes", "on"}:
        return True
    if text in {"0", "false", "no", "off"}:
        return False
    return default


def _parse_float(value: Any, default: float = 0.0) -> float:
    if value is None:
        return default
    try:
        return float(value)
    except (TypeError, ValueError):
        return default


def _parse_decode_profile(value: Any) -> int:
    if isinstance(value, int):
        return value
    raw = str(value or "").strip().lower()
    if raw in {"realtime", "rt", "low", "low_latency"}:
        return stt_pb2.DECODE_PROFILE_REALTIME
    if raw in {"accurate", "accuracy", "high"}:
        return stt_pb2.DECODE_PROFILE_ACCURATE
    return stt_pb2.DECODE_PROFILE_UNSPECIFIED


def _parse_task(value: Any) -> int:
    if isinstance(value, int):
        return value
    raw = str(value or "").strip().lower()
    if raw in {"translate", "translation"}:
        return stt_pb2.TASK_TRANSLATE
    if raw in {"transcribe", "transcription"}:
        return stt_pb2.TASK_TRANSCRIBE
    return stt_pb2.TASK_UNSPECIFIED


def _parse_vad_mode(value: Any) -> int:
    if isinstance(value, int):
        return value
    raw = str(value or "").strip().lower()
    if raw in {"auto", "auto_end", "auto-end", "end"}:
        return stt_pb2.VAD_AUTO_END
    return stt_pb2.VAD_CONTINUE


def _normalize_attributes(raw: Any) -> Dict[str, str]:
    if not isinstance(raw, dict):
        return {}
    return {
        str(k): str(v) for k, v in raw.items() if k is not None and v is not None
    }


def _normalize_metadata(raw: Any) -> List[Tuple[str, str]]:
    if not isinstance(raw, dict):
        return []
    return [
        (str(k).lower(), str(v)) for k, v in raw.items() if k and v is not None
    ]


def _peer_for_ws(client_ip: str) -> str:
    if not client_ip:
        return ""
    if ":" in client_ip:
        return f"ipv6:[{client_ip}]:0"
    return f"ipv4:{client_ip}:0"


class WebSocketAbort(RuntimeError):
    def __init__(self, status: grpc.StatusCode, details: str) -> None:
        super().__init__(details)
        self.status = status
        self.details = details


class WebSocketContext:
    """grpc.ServicerContext stand-in backing the orchestrator over WS."""

    def __init__(self, metadata: List[Tuple[str, str]], peer: str) -> None:
        self._metadata = metadata
        self._peer = peer
        self._callbacks: List[Any] = []
        self._active = True
        self.trailing_metadata = None

    def invocation_metadata(self):
        return list(self._metadata)

    def add_callback(self, callback):
        self._callbacks.append(callback)
        return True

    def is_active(self) -> bool:
        return self._active

    def set_trailing_metadata(self, metadata):
        self.trailing_metadata = metadata

    def peer(self) -> str:
        return self._peer

    def abort(self, code, details):
        raise WebSocketAbort(code, details)

    def close(self) -> None:
        if not self._active:
            return
        self._active = False
        for callback in self._callbacks:
            try:
                callback()
            except Exception:
                LOGGER.exception("WebSocket disconnect callback failed")


class WsBridge:
    """Connection-handling core (transport-agnostic for unit tests)."""

    def __init__(
        self,
        runtime,
        ws_rate_limit_rps: Optional[float] = None,
        ws_rate_limit_burst: Optional[float] = None,
        ws_trusted_proxies: Optional[List[str]] = None,
    ) -> None:
        self.runtime = runtime
        if ws_rate_limit_rps is None:
            try:
                ws_rate_limit_rps = float(os.getenv(_HTTP_RATE_LIMIT_RPS_ENV, ""))
            except (TypeError, ValueError):
                ws_rate_limit_rps = 0.0
        if ws_rate_limit_burst is None:
            try:
                ws_rate_limit_burst = float(os.getenv(_HTTP_RATE_LIMIT_BURST_ENV, ""))
            except (TypeError, ValueError):
                ws_rate_limit_burst = max(1.0, ws_rate_limit_rps)
        self._rate_limiter = KeyedRateLimiter(
            ws_rate_limit_rps, ws_rate_limit_burst or 0.0
        )
        self._allowlist: List[Any] = []
        for entry in os.getenv(_HTTP_ALLOWLIST_ENV, "").split(","):
            entry = entry.strip()
            if not entry:
                continue
            try:
                self._allowlist.append(ipaddress.ip_network(entry, strict=False))
            except ValueError:
                LOGGER.warning("invalid WS allowlist entry ignored: %s", entry)
        if ws_trusted_proxies is None:
            proxy_entries = [
                e.strip()
                for e in os.getenv(_HTTP_TRUSTED_PROXIES_ENV, "").split(",")
                if e.strip()
            ]
        else:
            proxy_entries = [e.strip() for e in ws_trusted_proxies if e]
        self._trusted_proxies: List[Any] = []
        self._trusted_proxy_hosts: List[str] = []
        for entry in proxy_entries:
            try:
                self._trusted_proxies.append(ipaddress.ip_network(entry, strict=False))
            except ValueError:
                if any(ch.isalpha() for ch in entry):
                    self._trusted_proxy_hosts.append(entry)
                else:
                    LOGGER.warning("invalid trusted proxy entry ignored: %s", entry)

    def client_ip(self, peer_ip: str, headers) -> str:
        trusted = peer_ip in self._trusted_proxy_hosts
        if not trusted and self._trusted_proxies:
            try:
                addr = ipaddress.ip_address(peer_ip)
                trusted = any(addr in net for net in self._trusted_proxies)
            except ValueError:
                pass
        if not trusted:
            return peer_ip
        forwarded = (headers.get("x-forwarded-for") or "").strip()
        if not forwarded:
            return peer_ip
        return forwarded.split(",")[-1].strip()

    def check_admission(self, client_ip: str) -> None:
        """Raises STTError for blocked/ratelimited clients (pre-accept)."""
        if self._allowlist:
            try:
                addr = ipaddress.ip_address(client_ip)
            except ValueError:
                raise STTError(ErrorCode.HTTP_IP_FORBIDDEN)
            if not any(addr in net for net in self._allowlist):
                raise STTError(ErrorCode.HTTP_IP_FORBIDDEN)
        key = client_ip or "unknown"
        if not self._rate_limiter.allow(key):
            self.runtime.metrics.record_rate_limit_block("http", key)
            raise STTError(ErrorCode.HTTP_RATE_LIMITED)

    @staticmethod
    def build_session_request(payload: Dict[str, Any], session_id: str):
        request = stt_pb2.SessionRequest(
            session_id=session_id,
            attributes=_normalize_attributes(payload.get("attributes")),
            vad_mode=_parse_vad_mode(payload.get("vad_mode")),
            vad_silence=_parse_float(payload.get("vad_silence"), 0.0),
            vad_threshold=_parse_float(payload.get("vad_threshold"), 0.0),
            require_token=_parse_bool(payload.get("require_token"), False),
            language_code=str(payload.get("language_code") or ""),
            task=_parse_task(payload.get("task")),
            decode_profile=_parse_decode_profile(payload.get("decode_profile")),
        )
        if "vad_threshold_override" in payload:
            request.vad_threshold_override = _parse_float(
                payload.get("vad_threshold_override"), 0.0
            )
        return request

    async def handle_connection(self, websocket) -> None:
        """Drive one WS streaming session end to end."""
        try:
            raw = await websocket.recv()
            start_payload = json.loads(raw)
        except Exception:
            await websocket.close(code=1003)
            return
        if isinstance(start_payload, dict) and start_payload.get("type") == "start":
            payload = start_payload.get("data") or start_payload
        else:
            payload = start_payload if isinstance(start_payload, dict) else {}

        session_id = str(payload.get("session_id") or uuid.uuid4().hex)
        sample_rate = int(payload.get("sample_rate") or 16000)
        metadata = _normalize_metadata(payload.get("metadata"))
        peer_ip = (
            websocket.remote_address[0]
            if getattr(websocket, "remote_address", None)
            else ""
        )
        context = WebSocketContext(metadata, _peer_for_ws(peer_ip))
        request = self.build_session_request(payload, session_id)

        try:
            response = self.runtime.create_session_handler.handle(request, context)
        except WebSocketAbort as exc:
            await websocket.send(json.dumps({
                "type": "error",
                "code": str(exc.details).split()[0],
                "message": exc.details,
            }))
            await websocket.close(code=4401)
            return

        await websocket.send(json.dumps({
            "type": "session",
            "session_id": session_id,
            "attributes": dict(response.attributes),
            "token": response.token,
            "token_required": response.token_required,
            "vad_mode": int(response.vad_mode),
            "vad_silence": response.vad_silence,
            "vad_threshold": response.vad_threshold,
            "language_code": response.language_code,
            "task": int(response.task),
            "decode_profile": int(response.decode_profile),
        }))

        audio_queue: "queue.Queue[Optional[bytes]]" = queue.Queue()
        result_queue: "asyncio.Queue[Tuple[str, Any]]" = asyncio.Queue()
        loop = asyncio.get_running_loop()
        session_token = response.token if response.token_required else ""

        def audio_iter():
            while True:
                item = audio_queue.get()
                if item is None:
                    yield stt_pb2.AudioChunk(
                        session_id=session_id,
                        sample_rate=sample_rate,
                        is_final=True,
                        session_token=session_token,
                    )
                    return
                yield stt_pb2.AudioChunk(
                    session_id=session_id,
                    sample_rate=sample_rate,
                    pcm16=item,
                    is_final=False,
                    session_token=session_token,
                )

        def run_stream():
            try:
                for result in self.runtime.stream_orchestrator.run(
                    audio_iter(), context
                ):
                    loop.call_soon_threadsafe(
                        result_queue.put_nowait, ("result", result)
                    )
                loop.call_soon_threadsafe(result_queue.put_nowait, ("done", None))
            except Exception as exc:
                loop.call_soon_threadsafe(result_queue.put_nowait, ("error", exc))

        thread = threading.Thread(target=run_stream, daemon=True)
        thread.start()

        async def recv_audio() -> None:
            try:
                async for message in websocket:
                    if isinstance(message, (bytes, bytearray)):
                        if message:
                            audio_queue.put(bytes(message))
                        continue
                    try:
                        data = json.loads(message)
                    except (ValueError, TypeError):
                        continue
                    if isinstance(data, dict) and data.get("type") == "end":
                        break
            except Exception:
                pass
            finally:
                context.close()
                audio_queue.put(None)

        async def send_results() -> None:
            while True:
                kind, item = await result_queue.get()
                if kind == "result":
                    try:
                        await websocket.send(json.dumps({
                            "type": "result",
                            "is_final": item.is_final,
                            "text": item.text,
                            "committed_text": item.committed_text,
                            "unstable_text": item.unstable_text,
                            "start_sec": item.start_sec,
                            "end_sec": item.end_sec,
                            "language_code": item.language_code,
                            "language": item.language,
                            "probability": item.probability,
                        }))
                    except Exception:
                        break
                    continue
                if kind == "error":
                    details = (
                        item.details
                        if isinstance(item, WebSocketAbort)
                        else str(item)
                    )
                    try:
                        await websocket.send(json.dumps({
                            "type": "error", "message": details,
                        }))
                    except Exception:
                        pass
                    break
                if kind == "done":
                    trailing = (
                        dict(context.trailing_metadata)
                        if context.trailing_metadata
                        else None
                    )
                    try:
                        await websocket.send(json.dumps({
                            "type": "done", "trailing": trailing,
                        }))
                    except Exception:
                        pass
                    break

        await asyncio.gather(recv_audio(), send_results())
        try:
            await websocket.close()
        except Exception:
            pass


@dataclass
class WebSocketServerHandle:
    thread: threading.Thread
    loop: asyncio.AbstractEventLoop
    stop_event: "asyncio.Event"

    def stop(self, timeout: Optional[float] = None) -> None:
        if self.thread.is_alive():
            try:
                self.loop.call_soon_threadsafe(self.stop_event.set)
            except RuntimeError:
                pass
            self.thread.join(timeout=timeout)


def start_ws_server(
    runtime,
    host: str,
    port: int,
    ws_rate_limit_rps: Optional[float] = None,
    ws_rate_limit_burst: Optional[float] = None,
    ws_trusted_proxies: Optional[List[str]] = None,
) -> WebSocketServerHandle:
    """Start the WS bridge on a daemon thread running its own event loop."""
    import websockets
    from websockets.http11 import Response
    from websockets.datastructures import Headers

    bridge = WsBridge(
        runtime,
        ws_rate_limit_rps=ws_rate_limit_rps,
        ws_rate_limit_burst=ws_rate_limit_burst,
        ws_trusted_proxies=ws_trusted_proxies,
    )

    loop = asyncio.new_event_loop()
    stop_event: "asyncio.Event" = None  # created inside the loop
    started = threading.Event()
    holder: Dict[str, Any] = {}

    def _process_request(connection, request):
        # reject before the websocket handshake completes
        if request.path != "/ws/stream":
            return Response(404, "Not Found", Headers(), b"not found\n")
        peer_ip = (
            connection.remote_address[0]
            if getattr(connection, "remote_address", None)
            else ""
        )
        client_ip = bridge.client_ip(peer_ip, request.headers)
        try:
            bridge.check_admission(client_ip)
        except STTError as exc:
            return Response(
                exc.http_status, "Forbidden", Headers(),
                (exc.detail + "\n").encode(),
            )
        return None

    async def _serve() -> None:
        nonlocal stop_event
        stop_event = asyncio.Event()
        holder["stop_event"] = stop_event
        async with websockets.serve(
            bridge.handle_connection,
            host,
            port,
            process_request=_process_request,
            max_size=16 * 1024 * 1024,
        ):
            started.set()
            await stop_event.wait()

    def _run() -> None:
        asyncio.set_event_loop(loop)
        try:
            loop.run_until_complete(_serve())
        except Exception:
            LOGGER.exception("WS server crashed")
            started.set()
        finally:
            loop.close()

    thread = threading.Thread(target=_run, daemon=True)
    thread.start()
    started.wait(timeout=10.0)
    LOGGER.info("WS bridge listening on %s:%d", host, port)
    return WebSocketServerHandle(
        thread=thread, loop=loop, stop_event=holder.get("stop_event")
    )


__all__ = [
    "WebSocketAbort",
    "WebSocketContext",
    "WebSocketServerHandle",
    "WsBridge",
    "start_ws_server",
]
