"""REST one-shot transcription endpoint tests.

Drives ``POST /v1/audio/transcriptions`` through ``HttpPlane.handle()``
with a real ApplicationRuntime on the fake backend — the full session
gauntlet + orchestrator + decode path, no sockets. Beyond-reference
surface; decode semantics mirror the gRPC batch client
(``/root/reference/stt_client/batch/file.py:271-292``).
"""

import io
import json
import wave

import numpy as np
import pytest

from stt_tpu.config.loader import ServerConfig
from stt_tpu.server.runtime.runtime import ApplicationRuntime
from stt_tpu.server.transport.http_server import HttpPlane
from stt_tpu.server.transport.rest_transcribe import (
    handle_transcription,
    parse_multipart,
    parse_wav_bytes,
    words_from_trailing,
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


@pytest.fixture(scope="module")
def plane(runtime):
    return HttpPlane(runtime, {"grpc_running": True})


def wav_bytes(seconds=1.0, sr=16000, channels=1, freq=220.0):
    t = np.arange(int(sr * seconds)) / sr
    pcm = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    if channels == 2:
        inter = np.empty(len(pcm) * 2, np.int16)
        inter[0::2] = pcm
        inter[1::2] = -pcm
        pcm = inter
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


_PEER_COUNTER = iter(range(1, 250))


def post(plane, body, *, query=None, headers=None, path="/v1/audio/transcriptions"):
    # distinct peer per call: the endpoint rides the real per-IP
    # stream-byte-rate gauntlet, which a shared test IP would trip
    peer = f"9.8.7.{next(_PEER_COUNTER)}"
    return plane.handle(
        "POST", path, query or {}, headers or {}, body, peer
    )


def multipart_body(file_bytes, fields):
    boundary = "xxBOUNDARYxx"
    parts = []
    for name, value in fields.items():
        parts.append(
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="{name}"\r\n\r\n'
            f"{value}\r\n".encode()
        )
    parts.append(
        (
            f"--{boundary}\r\n"
            f'Content-Disposition: form-data; name="file"; '
            f'filename="a.wav"\r\n'
            f"Content-Type: audio/wav\r\n\r\n"
        ).encode()
        + file_bytes
        + b"\r\n"
    )
    parts.append(f"--{boundary}--\r\n".encode())
    return b"".join(parts), f"multipart/form-data; boundary={boundary}"


# -- WAV / multipart parsing ------------------------------------------------


def test_parse_wav_mono():
    pcm, sr = parse_wav_bytes(wav_bytes(seconds=0.5))
    assert sr == 16000 and len(pcm) == 16000  # 0.5s * 16k * 2 bytes


def test_parse_wav_stereo_takes_left():
    mono_pcm, _ = parse_wav_bytes(wav_bytes(seconds=0.1))
    stereo_pcm, _ = parse_wav_bytes(wav_bytes(seconds=0.1, channels=2))
    assert stereo_pcm == mono_pcm


def test_parse_wav_rejects_garbage():
    with pytest.raises(ValueError):
        parse_wav_bytes(b"definitely not a wav")


def test_parse_multipart_roundtrip():
    body, ctype = multipart_body(b"\x00\x01\xff\xfe", {"language": "en"})
    fields, file_bytes = parse_multipart(ctype, body)
    assert fields == {"language": "en"}
    assert file_bytes == b"\x00\x01\xff\xfe"


# -- endpoint: happy paths --------------------------------------------------


def test_raw_wav_json_response(plane):
    status, ctype, payload = post(
        plane, wav_bytes(), headers={"content-type": "audio/wav"}
    )
    assert status == 200, payload
    assert ctype == "application/json"
    assert payload["text"].strip()  # fake backend emits deterministic words


def test_multipart_verbose_json(plane):
    body, ctype = multipart_body(
        wav_bytes(seconds=2.0), {"response_format": "verbose_json"}
    )
    status, rtype, payload = post(
        plane, body, headers={"content-type": ctype}
    )
    assert status == 200, payload
    assert payload["duration"] == pytest.approx(2.0)
    assert payload["segments"], payload
    seg = payload["segments"][0]
    assert set(seg) == {"id", "start", "end", "text"}
    assert payload["text"].strip()


def test_text_format(plane):
    status, ctype, payload = post(
        plane, wav_bytes(), query={"response_format": ["text"]}
    )
    assert status == 200
    assert ctype.startswith("text/plain")
    assert isinstance(payload, str) and payload.endswith("\n")


def test_srt_and_vtt_formats(plane):
    status, _, srt = post(
        plane, wav_bytes(), query={"response_format": ["srt"]}
    )
    assert status == 200 and srt.startswith("1\n00:00:00,000 --> ")
    status, ctype, vtt = post(
        plane, wav_bytes(), query={"response_format": ["vtt"]}
    )
    assert status == 200 and vtt.startswith("WEBVTT\n")
    assert ctype.startswith("text/vtt")


# -- endpoint: error paths --------------------------------------------------


def test_empty_body_rejected(plane):
    status, _, payload = post(plane, b"")
    assert status == 400 and payload["code"] == "invalid_request"


def test_non_wav_body_rejected(plane):
    status, _, payload = post(plane, b"\x00" * 64)
    assert status == 400 and "WAV" in payload["message"]


def test_bad_response_format_rejected(plane):
    status, _, payload = post(
        plane, wav_bytes(), query={"response_format": ["yaml"]}
    )
    assert status == 400 and "response_format" in payload["message"]


def test_bad_task_rejected(plane):
    status, _, payload = post(plane, wav_bytes(), query={"task": ["summon"]})
    assert status == 400


def test_unknown_model_id_falls_back_to_default(plane):
    # registry semantics: unknown model_id logs and serves via 'default'
    status, _, payload = post(
        plane, wav_bytes(), query={"model_id": ["nope"]}
    )
    assert status == 200 and payload["text"].strip()


def test_abort_maps_err_code_to_http_status(plane):
    # same peer posting repeatedly trips the per-IP stream byte-rate
    # gauntlet (batch lane) -> ERR-coded JSON with its HTTP status
    statuses = []
    for _ in range(6):
        status, _, payload = plane.handle(
            "POST", "/v1/audio/transcriptions", {}, {},
            wav_bytes(seconds=2.0), "9.8.250.1",
        )
        statuses.append((status, payload))
    errored = [(s, p) for s, p in statuses if s != 200]
    assert errored, "rate gauntlet never tripped"
    status, payload = errored[0]
    assert status == 429
    assert payload["code"].startswith("ERR"), payload


def test_multipart_without_file_rejected(plane):
    body, ctype = multipart_body(b"x", {"language": "en"})
    body = body.replace(b'name="file"', b'name="nope"')
    status, _, payload = post(plane, body, headers={"content-type": ctype})
    assert status == 400 and "file" in payload["message"]


def test_disabled_via_env(plane, monkeypatch):
    monkeypatch.setenv("STT_REST_TRANSCRIBE", "0")
    status, _, _ = post(plane, wav_bytes())
    assert status == 404


# -- POST /v1/audio/translations (task=translate alias) -----------------------


def test_translations_alias_forces_translate(plane):
    body, ctype = multipart_body(
        wav_bytes(), {"response_format": "verbose_json"}
    )
    status, _, payload = post(
        plane, body, headers={"content-type": ctype},
        path="/v1/audio/translations",
    )
    assert status == 200, payload
    assert payload["task"] == "translate"
    assert payload["text"].strip()


def test_translations_alias_accepts_matching_task_field(plane):
    status, _, payload = post(
        plane, wav_bytes(), query={"task": ["translate"]},
        path="/v1/audio/translations",
    )
    assert status == 200 and payload["text"].strip()


def test_translations_alias_rejects_conflicting_task(plane):
    status, _, payload = post(
        plane, wav_bytes(), query={"task": ["transcribe"]},
        path="/v1/audio/translations",
    )
    assert status == 400
    assert "transcriptions" in payload["message"]


def test_translations_disabled_via_env(plane, monkeypatch):
    monkeypatch.setenv("STT_REST_TRANSCRIBE", "no")
    status, _, _ = post(
        plane, wav_bytes(), path="/v1/audio/translations"
    )
    assert status == 404


def test_json_payload_serializable(plane):
    status, _, payload = post(
        plane, wav_bytes(), query={"response_format": ["verbose_json"]}
    )
    assert status == 200
    json.dumps(payload)  # the HTTP layer json-encodes dict payloads


# -- word timestamps in verbose_json ------------------------------------------


def test_words_from_trailing_parses_and_tolerates_garbage():
    meta = (
        ("stt-decode-count", "3"),
        ("stt-word-timestamps", '[[0.0,0.42,"hi"],[0.42,1.0,"there"]]'),
    )
    assert words_from_trailing(meta) == [
        {"word": "hi", "start": 0.0, "end": 0.42},
        {"word": "there", "start": 0.42, "end": 1.0},
    ]
    assert words_from_trailing(None) == []
    assert words_from_trailing((("stt-word-timestamps", "not json"),)) == []
    assert words_from_trailing((("other", "x"),)) == []


def test_verbose_json_includes_words_when_profile_emits_them():
    # stub runtime: the orchestrator sets the same trailing metadata the
    # real _finalize_stream emits when word_timestamps is enabled
    import types

    class _Handler:
        def handle(self, request, context):
            return types.SimpleNamespace(token="", token_required=False)

    class _Orchestrator:
        def run(self, chunks, context):
            list(chunks)
            context.set_trailing_metadata((
                ("stt-word-timestamps", '[[0.0,0.5,"zu"],[0.5,1.0,"zo"]]'),
            ))
            yield types.SimpleNamespace(
                is_final=True, text=" zu zo", start_sec=0.0, end_sec=1.0,
                language_code="en",
            )

    runtime = types.SimpleNamespace(
        create_session_handler=_Handler(), stream_orchestrator=_Orchestrator()
    )
    status, ctype, payload = handle_transcription(
        runtime, {"response_format": ["verbose_json"]}, {}, wav_bytes(),
        "9.8.252.1", "",
    )
    assert status == 200, payload
    assert payload["words"] == [
        {"word": "zu", "start": 0.0, "end": 0.5},
        {"word": "zo", "start": 0.5, "end": 1.0},
    ]


def test_verbose_json_omits_words_without_metadata(plane):
    # the fake backend does not emit word timings -> no "words" key
    status, _, payload = post(
        plane, wav_bytes(), query={"response_format": ["verbose_json"]}
    )
    assert status == 200 and "words" not in payload


# -- timestamp_granularities ---------------------------------------------------


def test_granularities_word_only_omits_segments(plane):
    # "word" requested but the fake backend's profile emits no word
    # timings -> OpenAI shape: empty words list, segments omitted
    status, _, payload = post(
        plane, wav_bytes(),
        query={
            "response_format": ["verbose_json"],
            "timestamp_granularities[]": ["word"],
        },
    )
    assert status == 200, payload
    assert payload["words"] == []
    assert "segments" not in payload
    assert payload["text"].strip()


def test_granularities_segment_only_omits_words(plane):
    status, _, payload = post(
        plane, wav_bytes(),
        query={
            "response_format": ["verbose_json"],
            "timestamp_granularities": ["segment"],
        },
    )
    assert status == 200 and payload["segments"]
    assert "words" not in payload


def test_granularities_invalid_rejected(plane):
    status, _, payload = post(
        plane, wav_bytes(), query={"timestamp_granularities[]": ["sentence"]}
    )
    assert status == 400
    assert "timestamp_granularities" in payload["message"]


def test_granularities_multipart_repeated_parts():
    # OpenAI sends one `timestamp_granularities[]` part per value; the
    # multipart parser comma-joins repeats and the parser splits them
    body, ctype = multipart_body(
        b"x",
        {"response_format": "verbose_json"},
    )
    extra = (
        b"--xxBOUNDARYxx\r\n"
        b'Content-Disposition: form-data; '
        b'name="timestamp_granularities[]"\r\n\r\nword\r\n'
        b"--xxBOUNDARYxx\r\n"
        b'Content-Disposition: form-data; '
        b'name="timestamp_granularities[]"\r\n\r\nsegment\r\n'
    )
    body = body.replace(b"--xxBOUNDARYxx--", extra + b"--xxBOUNDARYxx--")
    fields, _ = parse_multipart(ctype, body)
    assert fields["timestamp_granularities[]"] == "word,segment"
    from stt_tpu.server.transport.rest_transcribe import parse_granularities

    assert parse_granularities({}, fields) == {"word", "segment"}


def test_multipart_repeated_scalar_field_last_wins():
    # only the known multi-valued keys comma-join; a client repeating a
    # scalar field (e.g. task) keeps last-wins instead of producing
    # "translate,translate" and a 400 (ADVICE r4 low)
    body, ctype = multipart_body(b"x", {"response_format": "json"})
    extra = (
        b"--xxBOUNDARYxx\r\n"
        b'Content-Disposition: form-data; name="task"\r\n\r\ntranscribe\r\n'
        b"--xxBOUNDARYxx\r\n"
        b'Content-Disposition: form-data; name="task"\r\n\r\ntranslate\r\n'
    )
    body = body.replace(b"--xxBOUNDARYxx--", extra + b"--xxBOUNDARYxx--")
    fields, _ = parse_multipart(ctype, body)
    assert fields["task"] == "translate"


def test_granularities_require_verbose_json(plane):
    # OpenAI rejects granularities outside verbose_json; silently
    # ignoring them hid client mistakes (ADVICE r4 low)
    for fmt in ("json", "text", "srt"):
        status, _, payload = post(
            plane, wav_bytes(),
            query={
                "response_format": [fmt],
                "timestamp_granularities[]": ["word"],
            },
        )
        assert status == 400, (fmt, payload)
        assert "verbose_json" in payload["message"]


# -- GET /v1/models ----------------------------------------------------------


def test_v1_models_lists_loaded_models(plane):
    status, ctype, payload = plane.handle(
        "GET", "/v1/models", {}, {}, b"", "9.8.251.1"
    )
    assert status == 200 and ctype == "application/json"
    assert payload["object"] == "list"
    ids = [m["id"] for m in payload["data"]]
    assert "default" in ids  # the boot model registers as "default"
    for m in payload["data"]:
        assert m["object"] == "model"
        # operational fields stay behind /admin/list_models
        assert "pending" not in m and "device" not in m


def test_v1_models_disabled_via_env(plane, monkeypatch):
    monkeypatch.setenv("STT_REST_TRANSCRIBE", "off")
    status, _, _ = plane.handle(
        "GET", "/v1/models", {}, {}, b"", "9.8.251.2"
    )
    assert status == 404


# -- body-size cap (socket layer) ---------------------------------------------


def test_oversized_body_rejected_before_buffering(runtime, monkeypatch):
    import urllib.error
    import urllib.request

    from stt_tpu.server.transport.http_server import start_http_server

    monkeypatch.setenv("STT_HTTP_MAX_BODY_MB", "0.001")  # ~1 KB cap
    handle = start_http_server(runtime, {"grpc_running": True},
                               "127.0.0.1", 0)
    try:
        url = (f"http://127.0.0.1:{handle.port}"
               f"/v1/audio/transcriptions")
        req = urllib.request.Request(
            url, data=wav_bytes(seconds=0.5), method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=5)
        assert exc_info.value.code == 413
        payload = json.loads(exc_info.value.read())
        assert payload["code"] == "payload_too_large"

        # under the cap the request flows normally
        monkeypatch.setenv("STT_HTTP_MAX_BODY_MB", "128")
        req = urllib.request.Request(
            url, data=wav_bytes(seconds=0.5), method="POST"
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            assert resp.status == 200
            assert "text" in json.loads(resp.read())
    finally:
        handle.stop(timeout=5)


# -- round-4 review regressions ----------------------------------------------


def test_parse_multipart_lf_only_and_binary_crlf():
    # LF-only separators (sloppy client) and CRLF bytes inside the payload
    boundary = "bb"
    payload = b"\x00\r\n\x01\xff--not-a-boundary\r\n"
    body = (
        b"--bb\nContent-Disposition: form-data; name=\"file\"\n\n"
        + payload
        + b"\n--bb\nContent-Disposition: form-data; name=\"language\"\n\nen\n--bb--\n"
    )
    fields, file_bytes = parse_multipart(
        f"multipart/form-data; boundary={boundary}", body
    )
    assert fields == {"language": "en"}
    assert file_bytes == payload


def test_parse_multipart_base64_transfer_encoding():
    import base64 as b64

    raw = bytes(range(256))
    body = (
        b"--bb\r\nContent-Disposition: form-data; name=\"file\"\r\n"
        b"Content-Transfer-Encoding: base64\r\n\r\n"
        + b64.b64encode(raw)
        + b"\r\n--bb--\r\n"
    )
    _, file_bytes = parse_multipart("multipart/form-data; boundary=bb", body)
    assert file_bytes == raw


def test_rest_context_forwards_metadata_and_ipv6_peer():
    from stt_tpu.server.application.session_manager import extract_client_ip
    from stt_tpu.server.transport.rest_transcribe import RestContext
    from stt_tpu.server.transport.ws_server import _peer_for_ws

    ctx = RestContext(
        peer=_peer_for_ws("2001:db8::1"),
        metadata=[("authorization", "Bearer sig")],
    )
    # per-IP caps/limits must key on the full IPv6 address, not its
    # first hextet (the old "ipv4:2001:db8::1:0" label truncated at ":")
    assert extract_client_ip(ctx) == "2001:db8::1"
    assert ctx.invocation_metadata() == [("authorization", "Bearer sig")]


def test_signed_token_auth_over_rest():
    """The HMAC gauntlet must see the HTTP headers as invocation
    metadata, and the client must be able to supply the session_id its
    signature covers (regression: RestContext returned [] metadata, so
    signed_token deployments got ERR1014 on every REST request)."""
    import hashlib
    import hmac as hmac_mod
    import time as time_mod

    secret = "resttopsecret"
    cfg = ServerConfig(
        model="tiny", model_backend="fake", device="cpu",
        adaptive_throttle_enabled=False,
        create_session_auth_profile="signed_token",
        create_session_auth_secret=secret,
    )
    rt = ApplicationRuntime(cfg)
    try:
        auth_plane = HttpPlane(rt, {"grpc_running": True})
        body = wav_bytes()

        # no auth headers -> the gauntlet's ERR1014, mapped to HTTP
        status, _, payload = post(
            auth_plane, body, headers={"content-type": "audio/wav"}
        )
        assert status == 401, payload
        assert "ERR1014" in json.dumps(payload)

        # signed request: client picks the session_id it signs
        session_id = "rest-signed-1"
        ts = int(time_mod.time())
        sig = hmac_mod.new(
            secret.encode(), f"{session_id}:{ts}".encode(), hashlib.sha256
        ).hexdigest()
        status, _, payload = post(
            auth_plane, body,
            query={"session_id": [session_id]},
            headers={
                "content-type": "audio/wav",
                "authorization": f"Bearer {sig}",
                "x-stt-auth-ts": str(ts),
            },
        )
        assert status == 200, payload
        assert payload["text"].strip()
    finally:
        rt.shutdown(drain_timeout_sec=2.0)


def test_max_body_bytes_hostile_env_values(monkeypatch):
    from stt_tpu.server.transport.http_server import (
        _HTTP_MAX_BODY_MB_DEFAULT,
        _max_body_bytes,
    )

    default = int(_HTTP_MAX_BODY_MB_DEFAULT * 1024 * 1024)
    for hostile in ("nan", "-1", "garbage", "1e309-junk"):
        monkeypatch.setenv("STT_HTTP_MAX_BODY_MB", hostile)
        assert _max_body_bytes() == default, hostile
    # inf / overflowing values disable the cap instead of crashing
    import sys as sys_mod

    for huge in ("inf", "1e309"):
        monkeypatch.setenv("STT_HTTP_MAX_BODY_MB", huge)
        assert _max_body_bytes() == sys_mod.maxsize, huge
    monkeypatch.setenv("STT_HTTP_MAX_BODY_MB", "0.5")
    assert _max_body_bytes() == 512 * 1024


def test_malformed_content_length_is_400(runtime):
    import http.client

    from stt_tpu.server.transport.http_server import start_http_server

    handle = start_http_server(runtime, {"grpc_running": True},
                               "127.0.0.1", 0)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", handle.port,
                                          timeout=5)
        conn.putrequest("POST", "/v1/audio/transcriptions",
                        skip_accept_encoding=True)
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        resp = conn.getresponse()
        payload = json.loads(resp.read())
        assert resp.status == 400
        assert payload["code"] == "invalid_request"
        conn.close()
    finally:
        handle.stop()
