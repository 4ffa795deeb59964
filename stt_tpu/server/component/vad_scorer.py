"""Cross-session batched VAD scoring: ONE jitted call per tick.

SURVEY §7 step 4 / VERDICT missing #5: the DSP VAD math in
:mod:`stt_tpu.ops.vad` is namespace-generic, and its streaming state is a
pytree of scalars — stackable along a batch axis. This module exploits
that: all sessions whose chunks arrive within a short batch window are
scored by one jitted ``vad_step`` over (B, F, 512) frames instead of N
per-session numpy calls, mirroring the decode engine's micro-batching loop
(``engine/engine.py``).

Grouping is by EXACT frame count (real deployments chunk at a fixed
cadence — 100 ms = 3 frames — so nearly every tick forms one group);
padding the batch axis with dummy rows is harmless, padding the frame
axis would corrupt the sequential noise-floor state, so it is never done.

The numpy path stays bit-compatible (``tests/test_vad.py`` numpy/jax
parity) and remains the fallback if the scorer thread dies — endpointing
never takes the data plane down.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Dict, List, Optional, Tuple

import numpy as np

from ...ops import vad as vad_ops
from ...utils.logging import LOGGER

_DEFAULT_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64)


def _score_batch_impl(frames, noise_floor, prob, frames_seen):
    import jax.numpy as jnp

    state = vad_ops.VadState(noise_floor, prob, frames_seen)
    probs, new_state = vad_ops.vad_step(jnp, frames, state)
    return probs, new_state.noise_floor, new_state.prob, new_state.frames_seen


class _Pending:
    __slots__ = ("frames", "state", "future")

    def __init__(self, frames: np.ndarray, state: vad_ops.VadState):
        self.frames = frames
        self.state = state
        self.future: Future = Future()


class BatchedVadScorer:
    """Micro-batching device scorer for the streaming DSP VAD.

    ``score(frames, state)`` blocks until the batch containing the request
    has been scored (window ``batch_window_ms``, a couple of ms — small
    against the 32 ms frame cadence). Shapes are static per
    (batch-bucket, frame-count) pair, so XLA compiles a handful of tiny
    programs; ``prewarm()`` compiles the common ones up front.
    """

    def __init__(
        self,
        *,
        batch_window_ms: float = 2.0,
        max_batch: int = 64,
        batch_buckets: Tuple[int, ...] = _DEFAULT_BATCH_BUCKETS,
    ) -> None:
        import jax

        self._jit = jax.jit(_score_batch_impl)
        self.batch_window_sec = max(0.0, float(batch_window_ms) / 1000.0)
        self.max_batch = max(1, int(max_batch))
        self.batch_buckets = tuple(sorted(batch_buckets))
        self._queue: "queue.Queue[Optional[_Pending]]" = queue.Queue()
        self._thread: Optional[threading.Thread] = None
        self._lock = threading.Lock()
        self._running = False
        self._failed = False

    # -- lifecycle -------------------------------------------------------

    def start(self) -> None:
        with self._lock:
            if self._running:
                return
            self._running = True
            self._thread = threading.Thread(
                target=self._loop, name="vad-scorer", daemon=True
            )
            self._thread.start()

    def close(self) -> None:
        with self._lock:
            if not self._running:
                return
            self._running = False
        self._queue.put(None)
        if self._thread:
            self._thread.join(timeout=10)
            self._thread = None

    @property
    def healthy(self) -> bool:
        return not self._failed

    def prewarm(
        self, frame_counts=(1, 2, 3, 4), batch_sizes=(1, 8)
    ) -> None:
        """Compile the common (batch, frames) shapes before serving."""
        for f in frame_counts:
            for b in batch_sizes:
                frames = np.zeros((b, f, vad_ops.VAD_FRAME_SAMPLES), np.float32)
                state = self._stack_states(
                    [vad_ops.init_state(np) for _ in range(b)]
                )
                self._jit(frames, *state)

    # -- public scoring API ------------------------------------------------

    def score(
        self, frames: np.ndarray, state: vad_ops.VadState
    ) -> Tuple[np.ndarray, vad_ops.VadState]:
        """frames (F, 512) + per-session state -> (probs (F,), new state).

        Thread-safe; called concurrently from every stream's gRPC thread.
        Falls back to the numpy path if the scorer has failed.
        """
        if self._failed:
            return vad_ops.vad_step(np, frames, state)
        self.start()
        pending = _Pending(frames, state)
        self._queue.put(pending)
        try:
            # generous: a first decode on an unwarmed shape pays an XLA
            # compile (tens of seconds on TPU); prewarm() avoids this for
            # the common shapes
            return pending.future.result(timeout=60.0)
        except Exception:
            LOGGER.exception(
                "batched VAD scorer failed; falling back to host scoring"
            )
            self._failed = True
            return vad_ops.vad_step(np, frames, state)

    # -- batching loop -----------------------------------------------------

    def _batch_bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return self.batch_buckets[-1]

    @staticmethod
    def _stack_states(states: List[vad_ops.VadState]):
        return (
            np.stack([np.asarray(s.noise_floor, np.float32) for s in states]),
            np.stack([np.asarray(s.prob, np.float32) for s in states]),
            np.stack([np.asarray(s.frames_seen, np.int32) for s in states]),
        )

    def _loop(self) -> None:
        import time

        while True:
            try:
                first = self._queue.get(timeout=0.25)
            except queue.Empty:
                if not self._running:
                    return
                continue
            if first is None:
                return
            batch = [first]
            deadline = time.monotonic() + self.batch_window_sec
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._queue.put(None)
                    break
                batch.append(nxt)
            self._process(batch)
            if not self._running and self._queue.empty():
                return

    def _process(self, batch: List[_Pending]) -> None:
        groups: Dict[int, List[_Pending]] = {}
        for p in batch:
            groups.setdefault(p.frames.shape[0], []).append(p)
        for n_frames, group in groups.items():
            try:
                self._score_group(n_frames, group)
            except Exception as exc:
                for p in group:
                    if not p.future.done():
                        p.future.set_exception(exc)

    def _score_group(self, n_frames: int, group: List[_Pending]) -> None:
        b = self._batch_bucket(len(group))
        frames = np.zeros((b, n_frames, vad_ops.VAD_FRAME_SAMPLES), np.float32)
        states = [p.state for p in group]
        # dummy rows reuse a fresh state; their outputs are discarded
        states.extend(vad_ops.init_state(np) for _ in range(b - len(group)))
        for i, p in enumerate(group):
            frames[i] = p.frames
        probs, nf, pr, fs = self._jit(frames, *self._stack_states(states))
        probs = np.asarray(probs)
        nf, pr, fs = np.asarray(nf), np.asarray(pr), np.asarray(fs)
        for i, p in enumerate(group):
            new_state = vad_ops.VadState(
                nf[i].astype(np.float32),
                pr[i].astype(np.float32),
                fs[i].astype(np.int32),
            )
            if not p.future.done():
                p.future.set_result((probs[i], new_state))


__all__ = ["BatchedVadScorer"]
