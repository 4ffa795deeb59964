"""Backend registry: name -> ModelBackend class with lazy imports.

Mirrors the reference resolver surface (``stt_server/model/backends/
__init__.py:9-33``). ``jax_whisper`` is the production TPU backend; ``fake``
is the hermetic test/dev backend. The reference's faster_whisper/torch/mlx
names alias to ``jax_whisper`` so existing configs keep working on TPU hosts.
"""

from __future__ import annotations

from typing import Type

from .base import BackendInfo, ModelBackend, Segment  # noqa: F401

_ALIASES = {
    "jax_whisper": "jax_whisper",
    "jax": "jax_whisper",
    "whisper_jax": "jax_whisper",
    # reference backend names accepted for config compatibility
    "faster_whisper": "jax_whisper",
    "torch_whisper": "jax_whisper",
    "mlx_whisper": "jax_whisper",
    "fake": "fake",
    "test": "fake",
}


def get_backend(name: str) -> Type:
    key = _ALIASES.get((name or "").lower())
    if key == "jax_whisper":
        from .jax_whisper import JaxWhisperBackend

        return JaxWhisperBackend
    if key == "fake":
        from .fake import FakeBackend

        return FakeBackend
    raise ValueError(f"unknown model backend: {name!r}")


__all__ = ["BackendInfo", "ModelBackend", "Segment", "get_backend"]
