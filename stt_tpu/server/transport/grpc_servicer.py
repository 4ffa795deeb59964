"""gRPC transport adapter: maps application errors to RPC aborts.

Parity with the reference servicer (``stt_server/backend/transport/
grpc_servicer.py:15-81``): a thin layer that delegates to the runtime's
CreateSession handler and stream orchestrator, records error metrics, and
converts :class:`STTError` into ``context.abort`` with the mapped status.
Unlike the reference, the runtime is injected instead of constructed here so
one runtime can back gRPC, HTTP, and WS transports simultaneously.
"""

from __future__ import annotations

from typing import Iterable

import grpc

from ...errors import ErrorCode, STTError, format_error, status_for
from ...gen import stt_pb2, stt_pb2_grpc
from ...utils.logging import LOGGER
from ..runtime.runtime import ApplicationRuntime


class STTGrpcServicer(stt_pb2_grpc.STTBackendServicer):
    """Implements the STTBackend service over a shared runtime."""

    def __init__(self, runtime: ApplicationRuntime) -> None:
        self.runtime = runtime

    def CreateSession(
        self, request: stt_pb2.SessionRequest, context: grpc.ServicerContext
    ) -> stt_pb2.SessionResponse:
        try:
            return self.runtime.create_session_handler.handle(request, context)
        except grpc.RpcError as exc:
            self._record_error(self._rpc_status(exc))
            raise
        except STTError as exc:
            self._record_error(exc.status)
            LOGGER.error(str(exc))
            context.abort(exc.status, str(exc))
        except (AttributeError, KeyError, OSError, RuntimeError, TypeError, ValueError):
            self._record_error(status_for(ErrorCode.CREATE_SESSION_UNEXPECTED))
            LOGGER.exception(format_error(ErrorCode.CREATE_SESSION_UNEXPECTED))
            raise

    def StreamingRecognize(
        self,
        request_iterator: Iterable[stt_pb2.AudioChunk],
        context: grpc.ServicerContext,
    ) -> Iterable[stt_pb2.STTResult]:
        try:
            yield from self.runtime.stream_orchestrator.run(request_iterator, context)
        except grpc.RpcError as exc:
            self._record_error(self._rpc_status(exc))
            raise
        except STTError as exc:
            self._record_error(exc.status)
            LOGGER.error(str(exc))
            context.abort(exc.status, str(exc))
        except (AttributeError, KeyError, OSError, RuntimeError, TypeError, ValueError):
            self._record_error(status_for(ErrorCode.STREAM_UNEXPECTED))
            LOGGER.exception(format_error(ErrorCode.STREAM_UNEXPECTED))
            raise

    def _record_error(self, status_code: grpc.StatusCode) -> None:
        self.runtime.metrics.record_error(status_code)

    @staticmethod
    def _rpc_status(exc: grpc.RpcError) -> grpc.StatusCode:
        code = getattr(exc, "code", None)
        if callable(code):
            try:
                value = code()
                if isinstance(value, grpc.StatusCode):
                    return value
            except Exception:
                pass
        return grpc.StatusCode.UNKNOWN


__all__ = ["STTGrpcServicer"]
