"""Client SDK unit tests: retry policy, backoff, auth metadata, error codes."""

import hashlib
import hmac
import time

import grpc
import pytest

from stt_tpu.client.sdk import (
    RetryConfig,
    _backoff_delay,
    _should_retry,
    build_signed_token_metadata,
    parse_error_code,
)


class FakeRpcError(grpc.RpcError):
    def __init__(self, code, details=""):
        self._code = code
        self._details = details

    def code(self):
        return self._code

    def details(self):
        return self._details


def test_parse_error_code():
    assert parse_error_code(
        FakeRpcError(grpc.StatusCode.INVALID_ARGUMENT, "ERR1007 too big")
    ) == "ERR1007"
    assert parse_error_code(
        FakeRpcError(grpc.StatusCode.UNKNOWN, "no code here")
    ) is None


def test_should_retry_status_filter():
    retry = RetryConfig(attempts=2)
    assert _should_retry(FakeRpcError(grpc.StatusCode.UNAVAILABLE), retry, 0)
    assert _should_retry(
        FakeRpcError(grpc.StatusCode.RESOURCE_EXHAUSTED), retry, 1
    )
    assert not _should_retry(
        FakeRpcError(grpc.StatusCode.INVALID_ARGUMENT), retry, 0
    )
    # attempts exhausted
    assert not _should_retry(FakeRpcError(grpc.StatusCode.UNAVAILABLE), retry, 2)


def test_backoff_exponential_with_cap():
    retry = RetryConfig(attempts=5, base_backoff_sec=0.5, max_backoff_sec=2.0)
    d0 = _backoff_delay(retry, 0)
    d3 = _backoff_delay(retry, 3)
    assert 0.3 <= d0 <= 0.7           # 0.5 +/- 20% jitter
    assert d3 <= 2.0 * 1.2            # capped at max (+jitter)


def test_signed_token_metadata_roundtrip():
    md = build_signed_token_metadata("sess-1", "topsecret")
    assert [k for k, _ in md] == ["authorization", "x-stt-auth-ts"]
    sig = md[0][1].removeprefix("Bearer ")
    ts = md[1][1]
    expected = hmac.new(
        b"topsecret", f"sess-1:{ts}".encode(), hashlib.sha256
    ).hexdigest()
    assert sig == expected
    assert abs(int(ts) - time.time()) < 5


def test_signed_token_metadata_empty_secret():
    assert build_signed_token_metadata("sess-1", "") == []
    assert build_signed_token_metadata("sess-1", None) == []


def test_signed_metadata_accepted_by_session_manager():
    """The SDK's metadata must satisfy the server's HMAC validator."""
    from stt_tpu.gen import stt_pb2
    from stt_tpu.server.application.session_manager import (
        CreateSessionConfig, CreateSessionHandler, SessionRegistry,
    )
    from stt_tpu.server.component.vad_gate import VADModelPool

    handler = CreateSessionHandler(
        CreateSessionConfig(
            create_session_auth_profile="signed_token",
            create_session_auth_secret="topsecret",
            create_session_auth_ttl_sec=60.0,
        ),
        SessionRegistry(),
        VADModelPool(),
    )

    class Ctx:
        def __init__(self, metadata):
            self._md = metadata

        def peer(self):
            return "ipv4:9.9.9.9:1"

        def invocation_metadata(self):
            return self._md

        def abort(self, code, details):
            raise AssertionError(f"aborted: {details}")

    md = build_signed_token_metadata("sdk-auth-1", "topsecret")
    resp = handler.handle(
        stt_pb2.SessionRequest(session_id="sdk-auth-1"), Ctx(md)
    )
    assert resp.vad_silence > 0
