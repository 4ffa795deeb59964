"""CreateSession pipeline tests: one per error path + auth + VAD semantics."""

import hashlib
import hmac
import time

import pytest

from stt_tpu.config import default_decode_profiles
from stt_tpu.gen import stt_pb2
from stt_tpu.server.application.session_manager import (
    CreateSessionConfig,
    CreateSessionHandler,
    SessionFacade,
    SessionRegistry,
    extract_client_ip,
)
from stt_tpu.server.component.vad_gate import VADModelPool
from stt_tpu.utils.rate_limit import KeyedRateLimiter


class AbortError(Exception):
    def __init__(self, code, details):
        self.code = code
        self.details = details
        super().__init__(f"{code}: {details}")


class FakeContext:
    def __init__(self, peer="ipv4:1.2.3.4:5678", metadata=()):
        self._peer = peer
        self._metadata = tuple(metadata)

    def peer(self):
        return self._peer

    def invocation_metadata(self):
        return self._metadata

    def abort(self, code, details):
        raise AbortError(code, details)


def make_handler(
    *, config_kwargs=None, pool=None, limiter=None, registry=None
):
    kwargs = {
        "decode_profiles": default_decode_profiles()
        | {"accurate": {"beam_size": 5}},
        "default_decode_profile": "realtime",
    }
    kwargs.update(config_kwargs or {})
    cfg = CreateSessionConfig(**kwargs)
    pool = pool or VADModelPool()
    registry = registry or SessionRegistry()
    handler = CreateSessionHandler(
        cfg, registry, pool, rate_limiter=limiter
    )
    handler._test_registry = registry
    handler._test_pool = pool
    return handler


def req(session_id="s1", **kwargs):
    return stt_pb2.SessionRequest(session_id=session_id, **kwargs)


def expect_err(handler, request, context, err):
    with pytest.raises(AbortError) as exc:
        handler.handle(request, context)
    assert err in exc.value.details


def test_basic_session_created():
    handler = make_handler()
    resp = handler.handle(req(), FakeContext())
    assert resp.vad_mode == stt_pb2.VAD_CONTINUE
    assert resp.vad_silence == 0.8
    assert resp.vad_threshold == 0.5
    assert resp.token == ""
    assert not resp.token_required
    assert resp.attributes["decode_profile"] == "realtime"
    assert handler._test_registry.active_count() == 1


def test_err1001_session_id_required():
    expect_err(make_handler(), req(session_id=""), FakeContext(), "ERR1001")


def test_err1002_duplicate_session():
    handler = make_handler()
    handler.handle(req(), FakeContext())
    expect_err(handler, req(), FakeContext(), "ERR1002")


def test_err1003_negative_threshold():
    expect_err(
        make_handler(), req(vad_threshold=-0.1), FakeContext(), "ERR1003"
    )


def test_err1009_api_key_required():
    handler = make_handler(config_kwargs={"require_api_key": True})
    expect_err(handler, req(), FakeContext(), "ERR1009")
    resp = handler.handle(
        req(session_id="s2", attributes={"api_key": "k"}), FakeContext()
    )
    assert resp is not None


def test_err1010_invalid_decode_option():
    handler = make_handler(
        config_kwargs={
            "decode_profiles": {"realtime": {"beam_size": 1, "bogus_key": 1}},
        }
    )
    expect_err(handler, req(), FakeContext(), "ERR1010")


def test_err1011_sessions_per_ip():
    handler = make_handler(config_kwargs={"max_sessions_per_ip": 1})
    handler.handle(req("a"), FakeContext())
    expect_err(handler, req("b"), FakeContext(), "ERR1011")
    # different IP is fine
    handler.handle(req("c"), FakeContext(peer="ipv4:9.9.9.9:1"))


def test_err1011_sessions_per_api_key():
    handler = make_handler(config_kwargs={"max_sessions_per_api_key": 1})
    attrs = {"api_key": "k1"}
    handler.handle(req("a", attributes=attrs), FakeContext())
    expect_err(handler, req("b", attributes=attrs), FakeContext(), "ERR1011")


def test_err1012_rate_limited():
    clock = [0.0]
    limiter = KeyedRateLimiter(1.0, 1.0, time_fn=lambda: clock[0])
    handler = make_handler(limiter=limiter)
    handler.handle(req("a"), FakeContext())
    expect_err(handler, req("b"), FakeContext(), "ERR1012")


def test_err1013_shutting_down():
    handler = make_handler(config_kwargs={"allow_new_sessions": lambda: False})
    expect_err(handler, req(), FakeContext(), "ERR1013")


def test_overload_gate_err1012():
    handler = make_handler(
        config_kwargs={"allow_overload_sessions": lambda: False}
    )
    expect_err(handler, req(), FakeContext(), "ERR1012")


def test_err1008_vad_pool_exhausted():
    pool = VADModelPool()
    pool.configure(max_size=1, max_capacity=1)
    handler = make_handler(pool=pool)
    handler.handle(req("a"), FakeContext())
    expect_err(handler, req("b"), FakeContext(), "ERR1008")


def test_vad_pool_growth_allows_more_sessions():
    pool = VADModelPool()
    pool.configure(max_size=1, max_capacity=3, growth_factor=2.0)
    handler = make_handler(pool=pool)
    for sid in ("a", "b", "c"):
        handler.handle(req(sid), FakeContext())
    expect_err(handler, req("d"), FakeContext(), "ERR1008")


def test_token_session_skips_vad_reservation():
    pool = VADModelPool()
    pool.configure(max_size=1, max_capacity=1)
    handler = make_handler(pool=pool)
    resp = handler.handle(req("a", require_token=True), FakeContext())
    assert resp.token_required and len(resp.token) == 32
    # pool untouched, a second token session also fine
    handler.handle(req("b", require_token=True), FakeContext())
    assert pool.stats()["reserved"] == 0


def test_threshold_override_allows_zero():
    pool = VADModelPool()
    pool.configure(max_size=1, max_capacity=1)
    handler = make_handler(pool=pool)
    resp = handler.handle(
        req("a", vad_threshold_override=0.0), FakeContext()
    )
    assert resp.vad_threshold == 0.0  # explicit 0, no default substitution
    assert pool.stats()["reserved"] == 0  # threshold 0 -> no reservation


def test_plain_zero_threshold_uses_default():
    resp = make_handler().handle(req(vad_threshold=0.0), FakeContext())
    assert resp.vad_threshold == 0.5


def test_language_and_task_resolution():
    handler = make_handler()
    resp = handler.handle(
        req(language_code="KO", task=stt_pb2.TASK_TRANSLATE), FakeContext()
    )
    assert resp.language_code == "ko"
    assert resp.task == stt_pb2.TASK_TRANSLATE
    assert resp.attributes["language_code"] == "ko"
    # unknown language falls back to auto ("")
    resp2 = handler.handle(req("s2", language_code="zz"), FakeContext())
    assert resp2.language_code == ""


def test_profile_resolution_from_enum_and_attribute():
    handler = make_handler()
    resp = handler.handle(
        req(decode_profile=stt_pb2.DECODE_PROFILE_ACCURATE), FakeContext()
    )
    assert resp.decode_profile == stt_pb2.DECODE_PROFILE_ACCURATE
    resp2 = handler.handle(
        req("s2", attributes={"decode_profile": "accurate"}), FakeContext()
    )
    assert resp2.decode_profile == stt_pb2.DECODE_PROFILE_ACCURATE
    # unknown profile falls back to default
    resp3 = handler.handle(
        req("s3", attributes={"decode_profile": "warp9"}), FakeContext()
    )
    assert resp3.decode_profile == stt_pb2.DECODE_PROFILE_REALTIME


# -- signed-token auth ---------------------------------------------------------

SECRET = "topsecret"


def signed_metadata(session_id, ts=None, secret=SECRET, legacy=False):
    ts = int(ts if ts is not None else time.time())
    sig = hmac.new(
        secret.encode(), f"{session_id}:{ts}".encode(), hashlib.sha256
    ).hexdigest()
    if legacy:
        return [("authorization", f"Bearer {ts}:{sig}")]
    return [("authorization", f"Bearer {sig}"), ("x-stt-auth-ts", str(ts))]


def auth_handler(ttl=0.0):
    return make_handler(
        config_kwargs={
            "create_session_auth_profile": "signed_token",
            "create_session_auth_secret": SECRET,
            "create_session_auth_ttl_sec": ttl,
        }
    )


def test_signed_token_valid():
    handler = auth_handler()
    ctx = FakeContext(metadata=signed_metadata("s1"))
    assert handler.handle(req("s1"), ctx) is not None


def test_signed_token_legacy_format():
    handler = auth_handler()
    ctx = FakeContext(metadata=signed_metadata("s1", legacy=True))
    assert handler.handle(req("s1"), ctx) is not None


def test_signed_token_bad_signature_err1014():
    handler = auth_handler()
    ctx = FakeContext(metadata=signed_metadata("s1", secret="wrong"))
    expect_err(handler, req("s1"), ctx, "ERR1014")


def test_signed_token_missing_err1014():
    expect_err(auth_handler(), req("s1"), FakeContext(), "ERR1014")


def test_signed_token_expired_err1014():
    handler = auth_handler(ttl=10.0)
    ctx = FakeContext(metadata=signed_metadata("s1", ts=time.time() - 1000))
    expect_err(handler, req("s1"), ctx, "ERR1014")


def test_auth_attrs_sanitized_from_response():
    handler = make_handler()
    resp = handler.handle(
        req(attributes={"auth_sig": "x", "timestamp": "1", "keep": "y"}),
        FakeContext(),
    )
    assert "auth_sig" not in resp.attributes
    assert "timestamp" not in resp.attributes
    assert resp.attributes["keep"] == "y"


# -- facade --------------------------------------------------------------------


def test_facade_resolution_and_token_validation():
    handler = make_handler()
    resp = handler.handle(req("s1", require_token=True), FakeContext())
    facade = SessionFacade(handler._test_registry)
    ctx = FakeContext()
    state = facade.resolve_from_metadata({"session-id": "s1"}, ctx)
    assert state.session_id == "s1"
    # correct token passes
    chunk = stt_pb2.AudioChunk(session_id="s1", session_token=resp.token)
    facade.validate_token(state, chunk, ctx)
    # wrong token aborts and removes session
    bad = stt_pb2.AudioChunk(session_id="s1", session_token="nope")
    with pytest.raises(AbortError) as exc:
        facade.validate_token(state, bad, ctx)
    assert "ERR1005" in exc.value.details
    assert handler._test_registry.active_count() == 0


def test_facade_unknown_session_err1004():
    facade = SessionFacade(SessionRegistry())
    with pytest.raises(AbortError) as exc:
        facade.resolve_from_metadata({"session-id": "ghost"}, FakeContext())
    assert "ERR1004" in exc.value.details


def test_facade_chunk_without_session_err1004():
    facade = SessionFacade(SessionRegistry())
    with pytest.raises(AbortError) as exc:
        facade.ensure_session_from_chunk(
            None, stt_pb2.AudioChunk(), FakeContext()
        )
    assert "ERR1004" in exc.value.details


def test_extract_client_ip():
    assert extract_client_ip(FakeContext("ipv4:10.0.0.1:1234")) == "10.0.0.1"
    assert extract_client_ip(FakeContext("ipv6:[::1]:1234")) == "::1"
    assert extract_client_ip(FakeContext("unix:/tmp/sock")) == ""
    assert extract_client_ip(None) == ""
