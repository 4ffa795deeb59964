"""gRPC servicer error-mapping tests (reference tests/test_grpc_servicer.py)."""

import grpc
import pytest

from stt_tpu.errors import ErrorCode, STTError, status_for
from stt_tpu.server.transport.grpc_servicer import STTGrpcServicer
from stt_tpu.gen import stt_pb2


class AbortError(Exception):
    def __init__(self, code, details):
        self.code = code
        self.details = details
        super().__init__(details)


class FakeContext:
    def __init__(self):
        self.aborted = None

    def abort(self, code, details):
        self.aborted = (code, details)
        raise AbortError(code, details)

    def invocation_metadata(self):
        return ()

    def peer(self):
        return "ipv4:1.1.1.1:1"


class StubRuntime:
    """Minimal runtime double with pluggable behaviors."""

    class _Metrics:
        def __init__(self):
            self.errors = []

        def record_error(self, status):
            self.errors.append(status)

    def __init__(self, create_fn=None, stream_fn=None):
        self.metrics = self._Metrics()
        self._create_fn = create_fn
        self._stream_fn = stream_fn

    @property
    def create_session_handler(self):
        outer = self

        class H:
            def handle(self, request, context):
                return outer._create_fn(request, context)

        return H()

    @property
    def stream_orchestrator(self):
        outer = self

        class O:
            def run(self, it, context):
                return outer._stream_fn(it, context)

        return O()


def test_create_session_sttl_error_maps_to_abort():
    def boom(request, context):
        raise STTError(ErrorCode.VAD_POOL_EXHAUSTED)

    servicer = STTGrpcServicer(StubRuntime(create_fn=boom))
    ctx = FakeContext()
    with pytest.raises(AbortError) as exc:
        servicer.CreateSession(stt_pb2.SessionRequest(session_id="x"), ctx)
    assert exc.value.code == status_for(ErrorCode.VAD_POOL_EXHAUSTED)
    assert "ERR1008" in exc.value.details
    assert servicer.runtime.metrics.errors == [
        status_for(ErrorCode.VAD_POOL_EXHAUSTED)
    ]


def test_create_session_unexpected_recorded_and_reraised():
    def boom(request, context):
        raise ValueError("nope")

    servicer = STTGrpcServicer(StubRuntime(create_fn=boom))
    with pytest.raises(ValueError):
        servicer.CreateSession(stt_pb2.SessionRequest(session_id="x"), FakeContext())
    assert servicer.runtime.metrics.errors == [
        status_for(ErrorCode.CREATE_SESSION_UNEXPECTED)
    ]


def test_streaming_stt_error_maps_to_abort():
    def boom(it, context):
        raise STTError(ErrorCode.DECODE_TIMEOUT)
        yield  # pragma: no cover

    servicer = STTGrpcServicer(StubRuntime(stream_fn=boom))
    with pytest.raises(AbortError) as exc:
        list(servicer.StreamingRecognize(iter(()), FakeContext()))
    assert "ERR2001" in exc.value.details
    assert servicer.runtime.metrics.errors == [
        status_for(ErrorCode.DECODE_TIMEOUT)
    ]


def test_streaming_passthrough():
    def ok(it, context):
        yield stt_pb2.STTResult(text="hi", is_final=True)

    servicer = STTGrpcServicer(StubRuntime(stream_fn=ok))
    results = list(servicer.StreamingRecognize(iter(()), FakeContext()))
    assert [r.text for r in results] == ["hi"]
    assert servicer.runtime.metrics.errors == []


def test_streaming_unexpected_recorded():
    def boom(it, context):
        raise RuntimeError("boom")
        yield  # pragma: no cover

    servicer = STTGrpcServicer(StubRuntime(stream_fn=boom))
    with pytest.raises(RuntimeError):
        list(servicer.StreamingRecognize(iter(()), FakeContext()))
    assert servicer.runtime.metrics.errors == [
        status_for(ErrorCode.STREAM_UNEXPECTED)
    ]
