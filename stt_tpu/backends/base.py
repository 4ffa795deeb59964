"""ModelBackend contract shared by all inference implementations.

Identical surface to the reference protocol (``stt_server/model/backends/
base.py:7-35``): a backend is constructed with (model_size, device,
compute_type) and exposes ``transcribe(audio, options) -> (segments, info)``
over float32 16 kHz waveforms. Keeping this seam means orchestrator tests run
against :class:`stt_tpu.backends.fake.FakeBackend` with zero device
dependencies, and external callers can slot in other engines.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Protocol, Tuple, runtime_checkable

import numpy as np


class Segment(NamedTuple):
    start: float
    end: float
    text: str


class BackendInfo(NamedTuple):
    language: str
    language_probability: float


@runtime_checkable
class ModelBackend(Protocol):
    def __init__(self, model_size: str, device: str, compute_type: str) -> None: ...

    def transcribe(
        self, audio: np.ndarray, options: Dict[str, Any]
    ) -> Tuple[List[Segment], BackendInfo]: ...


__all__ = ["BackendInfo", "ModelBackend", "Segment"]
