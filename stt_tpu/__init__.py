"""TPU-native streaming speech-to-text serving framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``brightleeh/whisper-streaming-stt-server``: a gRPC
``CreateSession``/``StreamingRecognize`` service with VAD endpointing,
periodic partial decodes, committed/unstable transcript tracking, an HTTP
observability/admin plane, a WebSocket browser bridge, and a full client
suite — with the inference data plane implemented as jitted XLA programs
with a cross-session continuous-batching decode engine instead of
thread-per-worker native-library calls.

Package map:
- ``proto``/``gen``   — wire contract and protocol bindings
- ``ops``             — JAX/Pallas audio front-end and compute kernels
- ``models``          — Whisper (JAX) and VAD model definitions
- ``engine``          — TPU decode engine: batching, scheduling, fairness
- ``backends``        — ModelBackend implementations (jax_whisper, fake)
- ``parallel``        — device mesh, shardings, fine-tune train step
- ``server``          — transports, runtime, application, components
- ``client``          — SDK and CLI/web clients
- ``config``/``utils``/``errors`` — cross-cutting host code
"""

__version__ = "0.1.0"
