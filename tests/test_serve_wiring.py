"""serve()-layer wiring units (reference tests/test_shutdown.py analogue):
WS auth guard, gRPC channel options, TLS preconditions — without booting
a model or binding real sockets where avoidable."""

import pytest

from stt_tpu.config.loader import ServerConfig
from stt_tpu.server.main import (
    bind_grpc_port, build_grpc_server, enforce_ws_auth_guard,
)


def _cfg(**kw) -> ServerConfig:
    base = dict(ServerConfig().__dict__)
    base.update(kw)
    return ServerConfig(**base)


def test_ws_auth_guard_rejects_public_ws_without_auth(monkeypatch):
    monkeypatch.delenv("STT_ALLOW_INSECURE_WS", raising=False)
    cfg = _cfg(ws_port=18999, ws_host="0.0.0.0",
               create_session_auth_profile="", require_api_key=False)
    with pytest.raises(ValueError, match="non-loopback"):
        enforce_ws_auth_guard(cfg)


def test_ws_auth_guard_env_escape_hatch(monkeypatch):
    monkeypatch.setenv("STT_ALLOW_INSECURE_WS", "1")
    cfg = _cfg(ws_port=18999, ws_host="0.0.0.0",
               create_session_auth_profile="", require_api_key=False)
    enforce_ws_auth_guard(cfg)  # warns, does not raise


def test_ws_auth_guard_allows_with_auth_or_loopback(monkeypatch):
    monkeypatch.delenv("STT_ALLOW_INSECURE_WS", raising=False)
    enforce_ws_auth_guard(_cfg(
        ws_port=18999, ws_host="0.0.0.0",
        create_session_auth_profile="signed_token",
    ))
    enforce_ws_auth_guard(_cfg(ws_port=18999, ws_host="127.0.0.1",
                               create_session_auth_profile=""))
    enforce_ws_auth_guard(_cfg(ws_port=0, ws_host="0.0.0.0",
                               create_session_auth_profile=""))


def test_grpc_server_gets_message_limit_options(monkeypatch):
    import stt_tpu.server.main as main_mod

    captured = {}

    def fake_server(executor, options=None):
        captured["options"] = options
        class _S:  # noqa: N801
            pass
        return _S()

    monkeypatch.setattr(main_mod.grpc, "server", fake_server)
    build_grpc_server(_cfg(
        grpc_max_receive_message_bytes=4 * 1024 * 1024,
        grpc_max_send_message_bytes=2 * 1024 * 1024,
    ))
    opts = dict(captured["options"])
    assert opts["grpc.max_receive_message_length"] == 4 * 1024 * 1024
    assert opts["grpc.max_send_message_length"] == 2 * 1024 * 1024

    build_grpc_server(_cfg(grpc_max_receive_message_bytes=0,
                           grpc_max_send_message_bytes=0))
    assert captured["options"] is None


def test_bind_requires_tls_when_configured():
    with pytest.raises(ValueError, match="TLS is required"):
        bind_grpc_port(object(), _cfg(tls_required=True))


def test_bind_rejects_half_configured_tls():
    with pytest.raises(ValueError, match="Both tls_cert_file"):
        bind_grpc_port(object(), _cfg(tls_cert_file="/tmp/only-cert.pem"))


def test_bind_missing_cert_file(tmp_path):
    key = tmp_path / "k.pem"
    key.write_text("x")
    with pytest.raises(FileNotFoundError, match="cert"):
        bind_grpc_port(object(), _cfg(
            tls_cert_file=str(tmp_path / "missing.pem"),
            tls_key_file=str(key),
        ))
