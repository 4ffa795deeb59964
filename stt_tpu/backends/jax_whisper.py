"""``jax_whisper`` ModelBackend: the TPU-native replacement for the
reference's faster_whisper/torch_whisper/mlx_whisper backends
(``stt_server/model/backends/*.py``).

A thin adapter from the synchronous ``transcribe(audio, options)`` protocol
onto :class:`stt_tpu.engine.engine.WhisperEngine`. When the backend is used
standalone (batch client, tests) requests run synchronously; inside the
server the shared engine instance is driven by the model registry's batching
path instead, so many sessions share one device program.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..engine.engine import DecodeRequest, WhisperEngine
from .base import BackendInfo, Segment


class JaxWhisperBackend:
    def __init__(
        self,
        model_size: str,
        device: str = "tpu",
        compute_type: str = "bfloat16",
        *,
        weights_path: Optional[str] = None,
        tokenizer_path: Optional[str] = None,
        engine: Optional[WhisperEngine] = None,
        **engine_kwargs: Any,
    ) -> None:
        self.engine = engine or WhisperEngine(
            model_size,
            device,
            compute_type,
            weights_path=weights_path,
            tokenizer_path=tokenizer_path,
            **engine_kwargs,
        )

    def transcribe(
        self, audio: np.ndarray, options: Dict[str, Any]
    ) -> Tuple[List[Segment], BackendInfo]:
        request = DecodeRequest(
            audio=np.asarray(audio, np.float32),
            language=options.get("language") or None,
            task=str(options.get("task", "transcribe")),
            options=dict(options),
            # a standalone transcribe() is a complete decode: audio past
            # the largest window runs the sequential seek loop instead of
            # being truncated (reference backends decode arbitrary length)
            is_final=True,
        )
        out = self.engine.transcribe_sync(request)
        return out.segments, out.info

    def close(self) -> None:
        self.engine.close()


__all__ = ["JaxWhisperBackend"]
