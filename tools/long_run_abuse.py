"""Long-running abuse/soak helper (manual execution).

Parity with the reference tool (``tools/long_run_abuse.py``): streams
noise or silence for a configurable duration across N workers and reports
the RSS/thread delta from /system before vs after — a leak smoke test.
Uses urllib (requests is not in the image).

Run: ``python -m tools.long_run_abuse --target localhost:50051
--http http://localhost:8000 --mode noise --duration 60 --workers 4``.
"""

from __future__ import annotations

import argparse
import json
import random
import sys
import threading
import time
import urllib.request
from pathlib import Path

import grpc

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from stt_tpu.gen import stt_pb2, stt_pb2_grpc  # noqa: E402


def system_metrics(http_base: str, token: str = "") -> dict:
    req = urllib.request.Request(f"{http_base}/system")
    if token:
        req.add_header("authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=5) as resp:
        return json.loads(resp.read())


def pcm_silence(sample_rate: int, chunk_ms: int) -> bytes:
    return b"\x00\x00" * int(sample_rate * chunk_ms / 1000.0)


def pcm_noise(sample_rate: int, chunk_ms: int) -> bytes:
    n = int(sample_rate * chunk_ms / 1000.0)
    rnd = random.Random(1234)
    return b"".join(
        rnd.randint(-32768, 32767).to_bytes(2, "little", signed=True)
        for _ in range(n)
    )


def run_stream(stub, session_id, sample_rate, chunk_ms, duration_sec, mode):
    payload = (
        pcm_noise(sample_rate, chunk_ms) if mode == "noise"
        else pcm_silence(sample_rate, chunk_ms)
    )

    def chunks():
        end_at = time.time() + duration_sec
        while time.time() < end_at:
            yield stt_pb2.AudioChunk(
                session_id=session_id, sample_rate=sample_rate, pcm16=payload
            )
            time.sleep(chunk_ms / 1000.0)
        yield stt_pb2.AudioChunk(session_id=session_id, is_final=True)

    for _ in stub.StreamingRecognize(
        chunks(), metadata=(("session-id", session_id),)
    ):
        pass


def main() -> None:
    parser = argparse.ArgumentParser(description="long-run abuse soak")
    parser.add_argument("--target", default="localhost:50051")
    parser.add_argument("--http", default="http://localhost:8000")
    parser.add_argument("--token", default="")
    parser.add_argument("--mode", choices=("noise", "silence"), default="noise")
    parser.add_argument("--duration", type=int, default=60)
    parser.add_argument("--workers", type=int, default=2)
    parser.add_argument("--rounds", type=int, default=1)
    parser.add_argument("--chunk-ms", type=int, default=100)
    parser.add_argument("--sample-rate", type=int, default=16000)
    args = parser.parse_args()

    before = system_metrics(args.http, args.token)
    channel = grpc.insecure_channel(args.target)
    stub = stt_pb2_grpc.STTBackendStub(channel)

    for round_idx in range(args.rounds):
        threads = []
        for w in range(args.workers):
            sid = f"abuse-{round_idx}-{w}-{int(time.time())}"
            stub.CreateSession(stt_pb2.SessionRequest(session_id=sid))
            t = threading.Thread(
                target=run_stream,
                args=(stub, sid, args.sample_rate, args.chunk_ms,
                      args.duration, args.mode),
                daemon=True,
            )
            t.start()
            threads.append(t)
        for t in threads:
            t.join()
        print(f"[round {round_idx}] complete", file=sys.stderr)

    after = system_metrics(args.http, args.token)
    b, a = before.get("process", {}), after.get("process", {})
    summary = {
        "mode": args.mode,
        "rounds": args.rounds,
        "workers": args.workers,
        "duration_sec": args.duration,
        "rss_before": b.get("rss_bytes"),
        "rss_after": a.get("rss_bytes"),
        "rss_delta": (
            a.get("rss_bytes", 0) - b.get("rss_bytes", 0)
            if a.get("rss_bytes") and b.get("rss_bytes") else None
        ),
        "threads_before": b.get("num_threads"),
        "threads_after": a.get("num_threads"),
    }
    print(json.dumps(summary, indent=2))
    channel.close()


if __name__ == "__main__":
    main()
