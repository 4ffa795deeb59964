"""Headline benchmark: whisper-small RTFx under 64 concurrent streams.

Measures the BASELINE.json north-star configuration — whisper-small serving
64 concurrent streams on one chip through the cross-session micro-batching
engine — and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

``vs_baseline`` is RTFx / 20 (the north-star threshold "RTFx > 20/chip").
Weights are randomly initialized (zero-egress image): FLOPs, memory traffic
and decode-loop cost are identical to real checkpoints, so throughput is
representative; transcripts are not checked here (accuracy parity is
covered by tests/golden cases).

Run directly: ``python bench.py [--streams N] [--model SIZE] [--secs S]``.
Diagnostics go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from concurrent import futures

import numpy as np


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--streams", type=int, default=64)
    parser.add_argument("--model", default="small")
    parser.add_argument("--secs", type=float, default=10.0,
                        help="utterance length per request")
    parser.add_argument("--rounds", type=int, default=3,
                        help="measured rounds (best of)")
    parser.add_argument("--compute-type", default="bfloat16")
    parser.add_argument("--no-pallas", dest="use_pallas",
                        action="store_false", default=True,
                        help="disable the Pallas mel kernel inside the "
                             "fused serve program (A/B against XLA mel)")
    parser.add_argument("--batch-buckets", default="1,2,4,8,16,32,64",
                        help="comma-separated compiled batch shapes")
    args = parser.parse_args()

    import jax

    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    devices = jax.devices()
    log(f"devices: {devices}")
    log(f"building engine model={args.model} compute={args.compute_type}")

    engine = WhisperEngine(
        args.model,
        device=devices[0].platform,
        compute_type=args.compute_type,
        max_batch=args.streams,
        batch_window_ms=5.0,
        batch_buckets=tuple(
            int(b) for b in args.batch_buckets.split(",") if b.strip()
        ),
        use_pallas=args.use_pallas and devices[0].platform != "cpu",
    )
    engine.start()
    try:
        # deterministic synthetic speech-band audio
        rng = np.random.default_rng(0)
        n = int(args.secs * 16000)
        t = np.arange(n) / 16000.0
        audio = (
            0.1 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * rng.normal(0, 1, n)
        ).astype(np.float32)

        bucket = engine._bucket_for(n)
        warm_sizes = [b for b in engine.batch_buckets if b <= args.streams]
        if args.streams not in warm_sizes:
            warm_sizes.append(engine._batch_bucket(args.streams))
        # only the shapes this run will hit: the full batch + the tail shape
        warm_sizes = sorted({warm_sizes[-1], engine._batch_bucket(args.streams)})
        log(f"prewarming bucket={bucket}s batch sizes={warm_sizes}")
        compile_sec = engine.prewarm(
            bucket_secs=[bucket], batch_sizes=warm_sizes
        )
        log(f"compile: {compile_sec:.1f}s")

        def run_round() -> float:
            reqs = [
                DecodeRequest(audio=audio, language="en")
                for _ in range(args.streams)
            ]
            t0 = time.perf_counter()
            futs = [engine.submit(r) for r in reqs]
            futures.wait(futs)
            wall = time.perf_counter() - t0
            for f in futs:
                f.result()  # surface errors
            return wall

        best_wall = float("inf")
        for i in range(args.rounds):
            wall = run_round()
            log(f"round {i}: wall={wall:.2f}s")
            best_wall = min(best_wall, wall)

        total_audio = args.streams * args.secs
        rtfx = total_audio / best_wall
        log(f"RTFx = {total_audio:.0f}s audio / {best_wall:.2f}s wall")

        # secondary: p95 single-request latency at the 1s partial bucket
        # (the streaming partial path; north star p95 < 300 ms)
        partial_audio = audio[: 16000]
        engine.prewarm(bucket_secs=[engine._bucket_for(len(partial_audio))],
                       batch_sizes=[1])
        lats = []
        for _ in range(20):
            t0 = time.perf_counter()
            engine.transcribe_sync(
                DecodeRequest(audio=partial_audio, language="en")
            )
            lats.append(time.perf_counter() - t0)
        lats.sort()
        p95 = lats[int(len(lats) * 0.95) - 1]
        log(f"partial (1s bucket) p50={lats[len(lats)//2]*1000:.0f}ms "
            f"p95={p95*1000:.0f}ms")
        print(json.dumps({
            "metric": f"rtfx_whisper_{args.model}_{args.streams}streams",
            "value": round(rtfx, 2),
            "unit": "x_realtime_per_chip",
            "vs_baseline": round(rtfx / 20.0, 3),
        }), flush=True)
    finally:
        engine.close()


if __name__ == "__main__":
    main()
