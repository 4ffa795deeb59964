"""A/B the partial-draft verification path on the real device.

Measures per-wave latency of batched PARTIAL decodes through the full
engine (mel + encode + decode dispatch + harvest) in four modes:

- ``plain``          — session-less requests: the undrafted greedy serve
                       program (the r2 partial path).
- ``drafted_empty``  — fresh sessions each wave: the drafted program
                       with draft_len == 0 (measures the verify-pass
                       overhead a session's FIRST partial pays).
- ``drafted_perfect``— fixed sessions, identical audio each wave: every
                       draft fully accepted (the asymptotic best case —
                       the sequential loop runs ~0 steps).
- ``drafted_stream`` — fixed sessions, the buffer GROWS each wave
                       (8.5 s -> 10 s in the same bucket), drafts come
                       from the previous tick: the realistic streaming
                       acceptance profile.

Waves are submitted synchronously (one outstanding wave) because the
partial metric is LATENCY per tick, not pipelined throughput. The first
wave of each mode is logged separately (it may pay the drafted
program's one-time compile) and excluded from the median.

Output: one JSON line with per-mode median/min/max wall, accept-rate
stats, and the drafted/plain speedup.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from concurrent import futures
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--streams", type=int, default=64)
    parser.add_argument("--model", default="small")
    parser.add_argument("--secs", type=float, default=10.0)
    parser.add_argument("--waves", type=int, default=5,
                        help="measured waves per mode (first excluded)")
    parser.add_argument("--compute-type", default="bfloat16")
    parser.add_argument("--modes",
                        default="plain,drafted_empty,drafted_perfect,"
                                "drafted_stream")
    args = parser.parse_args()

    import jax

    env_platforms = os.environ.get("JAX_PLATFORMS", "").strip()
    if env_platforms and env_platforms != jax.config.jax_platforms:
        jax.config.update("jax_platforms", env_platforms)
    cache_dir = os.getenv("STT_XLA_CACHE_DIR", "").strip() or os.path.join(
        os.path.expanduser("~"), ".cache", "stt_tpu_xla"
    )
    if cache_dir.lower() != "off":
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from stt_tpu.engine.engine import DecodeRequest, WhisperEngine

    # bounded device discovery: a dead tunnel hangs jax.devices() forever
    # (same guard as bench.py)
    import threading

    box: list = []
    t_probe = threading.Thread(
        target=lambda: box.append(jax.devices()), daemon=True
    )
    t_probe.start()
    t_probe.join(timeout=float(os.getenv("STT_BENCH_DEVICE_WAIT", "600")))
    if not box:
        log("device discovery timed out — TPU tunnel down?")
        print(json.dumps({"error": "device discovery timed out"}))
        sys.exit(3)
    dev = box[0][0]
    log(f"device: {dev}")
    engine = WhisperEngine(
        args.model,
        device=dev.platform,
        compute_type=args.compute_type,
        max_batch=args.streams,
        batch_window_ms=5.0,
        batch_buckets=(1, 2, 4, 8, 16, 32, 64),
        # this harness MEASURES the drafted path; the serving default is
        # adaptive (routes plain until the acceptance EMA engages)
        draft_mode="on",
    )
    engine.start()
    rng = np.random.default_rng(0)
    n = int(args.secs * 16000)
    t = np.arange(n) / 16000.0
    audio = (
        0.1 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.normal(0, 1, n)
    ).astype(np.float32)
    bucket = engine._bucket_for(n)
    bsz = engine._batch_bucket(args.streams)
    log(f"prewarm bucket={bucket} batch={bsz}")
    t0 = time.monotonic()
    engine.prewarm(bucket_secs=[bucket], batch_sizes=[bsz],
                   mode="aot", parallelism=2)
    engine.prewarm(bucket_secs=[bucket], batch_sizes=[bsz])
    log(f"prewarm: {time.monotonic() - t0:.1f}s")

    def wave_requests(mode: str, w: int):
        if mode == "plain":
            return [
                DecodeRequest(audio=audio, language="en", is_final=False)
                for _ in range(args.streams)
            ]
        if mode == "drafted_empty":
            return [
                DecodeRequest(audio=audio, language="en", is_final=False,
                              session_id=f"e{w}_{i}")
                for i in range(args.streams)
            ]
        if mode == "drafted_perfect":
            return [
                DecodeRequest(audio=audio, language="en", is_final=False,
                              session_id=f"p_{i}")
                for i in range(args.streams)
            ]
        # drafted_stream: per-session growing buffer within the bucket
        grow0 = int(0.85 * n)
        step = (n - grow0) // max(1, args.waves - 1)
        ln = min(n, grow0 + step * w)
        return [
            DecodeRequest(audio=audio[:ln], language="en", is_final=False,
                          session_id=f"s_{i}")
            for i in range(args.streams)
        ]

    results = {}
    for mode in [m.strip() for m in args.modes.split(",") if m.strip()]:
        walls = []
        stats0 = dict(engine.draft_stats)
        for w in range(args.waves):
            reqs = wave_requests(mode, w)
            tw = time.perf_counter()
            futs = [engine.submit(r) for r in reqs]
            futures.wait(futs)
            wall = time.perf_counter() - tw
            for f in futs:
                f.result()  # surface failures
            walls.append(wall)
            log(f"{mode} wave {w}: {wall:.3f}s")
        stats1 = dict(engine.draft_stats)
        offered = stats1["offered"] - stats0["offered"]
        accepted = stats1["accepted"] - stats0["accepted"]
        steady = walls[1:] if len(walls) > 1 else walls
        results[mode] = {
            "first_wave_s": round(walls[0], 3),
            "median_s": round(float(np.median(steady)), 3),
            "min_s": round(float(np.min(steady)), 3),
            "max_s": round(float(np.max(steady)), 3),
            "offered": int(offered),
            "accepted": int(accepted),
            "accept_rate": round(accepted / offered, 3) if offered else None,
        }
    engine.close()

    out = {"model": args.model, "streams": args.streams,
           "secs": args.secs, "modes": results}
    if "plain" in results and "drafted_perfect" in results:
        out["speedup_perfect"] = round(
            results["plain"]["median_s"]
            / results["drafted_perfect"]["median_s"], 2,
        )
    if "plain" in results and "drafted_stream" in results:
        out["speedup_stream"] = round(
            results["plain"]["median_s"]
            / results["drafted_stream"]["median_s"], 2,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
