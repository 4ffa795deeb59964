"""gRPC load-test harness: N concurrent channels x iterations.

Capability parity with the reference harness (``tools/bench/
grpc_load_test.py:1-1225``): warmup sessions, ramp steps, realtime pacing
with a speed factor, per-session records (JSONL/CSV) joining client-side
latencies with the server's trailing ``stt-decode-*`` metadata, and a
summary with p50/p90/p95/p99 of CreateSession / first-partial / final
latency plus RTF — the metrics BASELINE.md names.

Extras for the TPU build: ``--synthetic-sec`` generates tone audio so no
WAV fixture is needed, and the summary includes an aggregate RTFx
(total audio seconds / wall seconds) per run.

Run: ``python -m tools.bench.grpc_load_test --target localhost:50051
--sessions 8 --iterations 2 --synthetic-sec 5``.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import threading
import time
import uuid
import wave
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import grpc
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from stt_tpu.gen import stt_pb2, stt_pb2_grpc  # noqa: E402

BYTES_PER_SAMPLE = 2


def load_wav(path: str) -> Tuple[bytes, int]:
    with wave.open(path, "rb") as wf:
        if wf.getnchannels() != 1:
            raise ValueError("only mono WAV files are supported")
        if wf.getsampwidth() != BYTES_PER_SAMPLE:
            raise ValueError("only 16-bit PCM WAV files are supported")
        return wf.readframes(wf.getnframes()), wf.getframerate()


def synthetic_audio(seconds: float, sample_rate: int = 16000) -> Tuple[bytes, int]:
    """Tone bursts with a mid-stream silence gap.

    The gap trips the VAD (exercising the utterance-commit path) while
    the stream still ENDS with speech: a trailing-silence tail would be
    endpointed away, leaving the end-of-stream final to decode pure
    silence — zero segments, so no ``is_final`` response ever reaches
    the client (reference-parity wire behavior) and the final-latency
    metric records nothing."""
    rng = np.random.default_rng(0)
    t = np.arange(int(sample_rate * seconds)) / sample_rate
    sig = 0.25 * np.sin(2 * np.pi * 220 * t) + 0.02 * rng.normal(0, 1, t.shape)
    gap = int(sample_rate * min(1.0, seconds * 0.2))
    if gap:
        mid = int(len(sig) * 0.55)
        sig[mid:mid + gap] = 0.0
    return (sig * 32767).astype(np.int16).tobytes(), sample_rate


def make_channel(target, tls, ca_cert, server_hostname, options):
    if not tls and not ca_cert:
        return grpc.insecure_channel(target, options=options)
    root = Path(ca_cert).expanduser().read_bytes() if ca_cert else None
    if server_hostname:
        options = options + [("grpc.ssl_target_name_override", server_hostname)]
    creds = grpc.ssl_channel_credentials(root_certificates=root)
    return grpc.secure_channel(target, creds, options=options)


@dataclass
class SessionRecord:
    session_id: str
    worker: int
    iteration: int
    ok: bool = True
    error: str = ""
    create_latency_sec: float = 0.0
    first_partial_sec: Optional[float] = None
    final_latency_sec: Optional[float] = None
    # latency of the LAST response regardless of its is_final flag —
    # robust when real audio ends in silence (endpointed away, so the
    # stream closes without an is_final response, matching the reference)
    last_result_latency_sec: Optional[float] = None
    audio_sec: float = 0.0
    wall_sec: float = 0.0
    rtf: float = 0.0
    results: int = 0
    finals: int = 0
    transcript: str = ""
    server_timing: Dict[str, float] = field(default_factory=dict)

    COLUMNS = (
        "session_id", "worker", "iteration", "ok", "error",
        "create_latency_sec", "first_partial_sec", "final_latency_sec",
        "last_result_latency_sec",
        "audio_sec", "wall_sec", "rtf", "results", "finals", "transcript",
    )

    def to_row(self) -> Dict[str, Any]:
        row = {
            "session_id": self.session_id,
            "worker": self.worker,
            "iteration": self.iteration,
            "ok": self.ok,
            "error": self.error,
            "create_latency_sec": round(self.create_latency_sec, 6),
            "first_partial_sec": (
                round(self.first_partial_sec, 6)
                if self.first_partial_sec is not None else None
            ),
            "final_latency_sec": (
                round(self.final_latency_sec, 6)
                if self.final_latency_sec is not None else None
            ),
            "last_result_latency_sec": (
                round(self.last_result_latency_sec, 6)
                if self.last_result_latency_sec is not None else None
            ),
            "audio_sec": round(self.audio_sec, 3),
            "wall_sec": round(self.wall_sec, 6),
            "rtf": round(self.rtf, 4),
            "results": self.results,
            "finals": self.finals,
            "transcript": self.transcript,
        }
        row.update({f"server_{k}": v for k, v in self.server_timing.items()})
        return row


class SessionLogWriter:
    """Per-session artifact logs in jsonl/csv/tsv/markdown (reference
    harness session-log formats, ``grpc_load_test.py:501-538``)."""

    def __init__(self, path: str, fmt: str) -> None:
        import csv as _csv

        self.fmt = fmt
        self.handle = open(path, "w", newline="")
        self._csv = _csv
        self._writer = None
        self._lock = threading.Lock()
        if fmt in ("csv", "tsv"):
            delim = "," if fmt == "csv" else "\t"
            self._writer = _csv.writer(self.handle, delimiter=delim)
            self._writer.writerow(SessionRecord.COLUMNS)
        elif fmt == "markdown":
            self.handle.write(
                "| " + " | ".join(SessionRecord.COLUMNS) + " |\n"
            )
            self.handle.write(
                "|" + "|".join("---" for _ in SessionRecord.COLUMNS) + "|\n"
            )

    def write(self, record: SessionRecord) -> None:
        row = record.to_row()
        with self._lock:
            if self.fmt == "jsonl":
                self.handle.write(json.dumps(row) + "\n")
            elif self.fmt in ("csv", "tsv"):
                self._writer.writerow(
                    ["" if row.get(c) is None else row.get(c)
                     for c in SessionRecord.COLUMNS]
                )
            else:  # markdown
                self.handle.write("| " + " | ".join(
                    str(row.get(c, "")).replace("|", "\\|")
                    for c in SessionRecord.COLUMNS
                ) + " |\n")
            self.handle.flush()

    def close(self) -> None:
        self.handle.close()


def percentile(values: List[float], pct: float) -> Optional[float]:
    if not values:
        return None
    ordered = sorted(values)
    k = (len(ordered) - 1) * (pct / 100.0)
    lo, hi = math.floor(k), math.ceil(k)
    if lo == hi:
        return ordered[lo]
    return ordered[lo] * (hi - k) + ordered[hi] * (k - lo)


def run_session(
    args, pcm: bytes, sample_rate: int, worker: int, iteration: int
) -> SessionRecord:
    session_id = f"load-{worker}-{iteration}-{uuid.uuid4().hex[:8]}"
    record = SessionRecord(session_id=session_id, worker=worker, iteration=iteration)
    record.audio_sec = len(pcm) / (sample_rate * BYTES_PER_SAMPLE)
    options = [("grpc.max_receive_message_length", 16 * 1024 * 1024)]
    channel = make_channel(
        args.target, args.tls, args.ca_cert, args.server_hostname, options
    )
    stub = stt_pb2_grpc.STTBackendStub(channel)
    try:
        attributes = {}
        if args.partial:
            attributes["partial"] = "true"
        if args.api_key:
            attributes["api_key"] = args.api_key
        if args.mode == "batch":
            attributes["upload_mode"] = "batch"
        request = stt_pb2.SessionRequest(
            session_id=session_id,
            attributes=attributes,
            vad_mode=(
                stt_pb2.VAD_AUTO_END if args.vad_mode == "auto"
                else stt_pb2.VAD_CONTINUE
            ),
            vad_silence=args.vad_silence,
            language_code=args.language,
            task=(
                stt_pb2.TASK_TRANSLATE if args.task == "translate"
                else stt_pb2.TASK_TRANSCRIBE
            ),
            decode_profile=(
                stt_pb2.DECODE_PROFILE_ACCURATE if args.profile == "accurate"
                else stt_pb2.DECODE_PROFILE_REALTIME
            ),
        )
        t0 = time.perf_counter()
        stub.CreateSession(request, timeout=args.rpc_timeout)
        record.create_latency_sec = time.perf_counter() - t0

        chunk_samples = max(int(sample_rate * args.chunk_ms / 1000.0), 1)
        chunk_bytes = chunk_samples * BYTES_PER_SAMPLE
        pace = (args.chunk_ms / 1000.0) / max(args.speed, 1e-6)
        last_chunk_at = [0.0]

        def chunks():
            for idx in range(0, len(pcm), chunk_bytes):
                last_chunk_at[0] = time.perf_counter()
                yield stt_pb2.AudioChunk(
                    pcm16=pcm[idx:idx + chunk_bytes],
                    sample_rate=sample_rate,
                    is_final=False,
                    session_id=session_id,
                )
                if args.mode == "realtime" and pace > 0:
                    time.sleep(pace)
            last_chunk_at[0] = time.perf_counter()
            yield stt_pb2.AudioChunk(
                pcm16=b"", sample_rate=sample_rate, is_final=True,
                session_id=session_id,
            )

        stream_start = time.perf_counter()
        call = stub.StreamingRecognize(
            chunks(),
            metadata=(("session-id", session_id),),
            timeout=args.rpc_timeout,
        )
        for result in call:
            now = time.perf_counter()
            record.results += 1
            if not result.is_final and record.first_partial_sec is None:
                record.first_partial_sec = now - stream_start
            record.last_result_latency_sec = now - last_chunk_at[0]
            if result.is_final:
                record.finals += 1
                record.final_latency_sec = now - last_chunk_at[0]
                record.transcript = (
                    (record.transcript + " " + (result.text or "").strip())
                    .strip()[:200]
                )
        record.wall_sec = time.perf_counter() - stream_start
        record.rtf = (
            record.wall_sec / record.audio_sec if record.audio_sec > 0 else 0.0
        )
        try:
            record.server_timing = {
                k.replace("stt-decode-", "").replace("-", "_"): float(v)
                for k, v in call.trailing_metadata()
                if k.startswith("stt-decode-")
            }
        except Exception:
            pass
    except grpc.RpcError as exc:
        record.ok = False
        record.error = f"{exc.code()}: {exc.details()}"
    finally:
        channel.close()
    return record


def summarize(records: List[SessionRecord], wall_sec: float) -> Dict[str, Any]:
    ok = [r for r in records if r.ok]
    creates = [r.create_latency_sec for r in ok]
    firsts = [r.first_partial_sec for r in ok if r.first_partial_sec is not None]
    finals = [r.final_latency_sec for r in ok if r.final_latency_sec is not None]
    lasts = [r.last_result_latency_sec for r in ok
             if r.last_result_latency_sec is not None]
    rtfs = [r.rtf for r in ok if r.rtf > 0]
    total_audio = sum(r.audio_sec for r in ok)

    def stats(values):
        return {
            "count": len(values),
            "p50": percentile(values, 50),
            "p90": percentile(values, 90),
            "p95": percentile(values, 95),
            "p99": percentile(values, 99),
            "max": max(values) if values else None,
        }

    # server decode-phase breakdown (joined from trailing metadata)
    phases = {}
    for key in ("buffer_wait_sec", "queue_wait_sec", "inference_sec",
                "response_emit_sec", "total_sec"):
        vals = [r.server_timing[key] for r in ok if key in r.server_timing]
        if vals:
            phases[f"server_{key}"] = stats(vals)
    responses = [float(r.results) for r in ok]

    return {
        "sessions": len(records),
        "ok": len(ok),
        "errors": len(records) - len(ok),
        "error_rate": (len(records) - len(ok)) / max(1, len(records)),
        "sessions_per_sec": (
            round(len(ok) / wall_sec, 3) if wall_sec > 0 else None
        ),
        "create_latency_sec": stats(creates),
        "first_partial_sec": stats(firsts),
        "final_latency_sec": stats(finals),
        "last_result_latency_sec": stats(lasts),
        "rtf": stats(rtfs),
        "responses_per_session": stats(responses),
        "total_audio_sec": round(total_audio, 2),
        "audio_sec_per_sec": (
            round(total_audio / wall_sec, 2) if wall_sec > 0 else None
        ),
        "wall_sec": round(wall_sec, 2),
        "rtfx_aggregate": round(total_audio / wall_sec, 2) if wall_sec > 0 else None,
        **phases,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description="gRPC streaming load test")
    parser.add_argument("--target", default="localhost:50051")
    parser.add_argument("--wav", default=None, help="mono 16-bit PCM WAV")
    parser.add_argument("--synthetic-sec", type=float, default=5.0,
                        help="generate tone audio of this length when no --wav")
    parser.add_argument("--sessions", type=int, default=4,
                        help="concurrent channels")
    parser.add_argument("--iterations", type=int, default=1,
                        help="sequential sessions per channel")
    parser.add_argument("--warmup", type=int, default=0,
                        help="untimed warmup sessions before the run")
    parser.add_argument("--ramp-step", type=int, default=0,
                        help="start N workers at a time (0 = all at once)")
    parser.add_argument("--ramp-delay-sec", type=float, default=1.0)
    parser.add_argument("--chunk-ms", type=int, default=100)
    parser.add_argument("--mode", choices=("realtime", "batch"), default="realtime")
    parser.add_argument("--speed", type=float, default=1.0,
                        help="realtime pacing speed factor (2.0 = 2x)")
    parser.add_argument("--partial", action="store_true", default=True)
    parser.add_argument("--no-partial", dest="partial", action="store_false")
    parser.add_argument("--vad-mode", choices=("continue", "auto"),
                        default="continue")
    parser.add_argument("--vad-silence", type=float, default=0.0)
    parser.add_argument("--language", default="")
    parser.add_argument("--task", choices=("transcribe", "translate"),
                        default="transcribe")
    parser.add_argument("--profile", choices=("realtime", "accurate"),
                        default="realtime")
    parser.add_argument("--api-key", default="")
    parser.add_argument("--rpc-timeout", type=float, default=120.0)
    parser.add_argument("--tls", action="store_true")
    parser.add_argument("--ca-cert", default=None)
    parser.add_argument("--server-hostname", default=None)
    parser.add_argument("--out", default=None,
                        help="write per-session records to this file")
    parser.add_argument("--session-log-format",
                        choices=("jsonl", "csv", "tsv", "markdown"),
                        default="jsonl", help="format for --out")
    parser.add_argument("--out-dir", default=None,
                        help="write a full artifact set (session logs in "
                             "jsonl+csv+markdown, summary.json, "
                             "run_meta.json) into this directory")
    args = parser.parse_args()

    if args.wav:
        pcm, sample_rate = load_wav(args.wav)
    else:
        pcm, sample_rate = synthetic_audio(args.synthetic_sec)
    audio_sec = len(pcm) / (sample_rate * BYTES_PER_SAMPLE)
    print(
        f"[load] target={args.target} sessions={args.sessions} "
        f"iterations={args.iterations} audio={audio_sec:.1f}s mode={args.mode}",
        file=sys.stderr,
    )

    for i in range(args.warmup):
        rec = run_session(args, pcm, sample_rate, worker=-1, iteration=i)
        print(
            f"[warmup {i}] ok={rec.ok} wall={rec.wall_sec:.2f}s"
            + (f" error={rec.error}" if rec.error else ""),
            file=sys.stderr,
        )

    records: List[SessionRecord] = []
    records_lock = threading.Lock()

    def worker_loop(worker: int) -> None:
        for iteration in range(args.iterations):
            rec = run_session(args, pcm, sample_rate, worker, iteration)
            with records_lock:
                records.append(rec)

    threads = [
        threading.Thread(target=worker_loop, args=(i,), daemon=True)
        for i in range(args.sessions)
    ]
    run_start = time.perf_counter()
    if args.ramp_step and args.ramp_step > 0:
        for i in range(0, len(threads), args.ramp_step):
            for t in threads[i:i + args.ramp_step]:
                t.start()
            if i + args.ramp_step < len(threads):
                time.sleep(args.ramp_delay_sec)
    else:
        for t in threads:
            t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - run_start

    writers: List[SessionLogWriter] = []
    if args.out:
        writers.append(SessionLogWriter(args.out, args.session_log_format))
    if args.out_dir:
        out_dir = Path(args.out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for fmt, name in (
            ("jsonl", "sessions.jsonl"),
            ("csv", "sessions.csv"),
            ("markdown", "sessions.md"),
        ):
            writers.append(SessionLogWriter(str(out_dir / name), fmt))
    for writer in writers:
        for rec in records:
            writer.write(rec)
        writer.close()
    if writers:
        print(
            f"[load] wrote {len(records)} records to "
            f"{len(writers)} session log(s)",
            file=sys.stderr,
        )

    summary = summarize(records, wall)
    if args.out_dir:
        out_dir = Path(args.out_dir)
        (out_dir / "summary.json").write_text(json.dumps(summary, indent=2))
        (out_dir / "run_meta.json").write_text(json.dumps({
            "target": args.target,
            "sessions": args.sessions,
            "iterations": args.iterations,
            "warmup": args.warmup,
            "mode": args.mode,
            "speed": args.speed,
            "chunk_ms": args.chunk_ms,
            "profile": args.profile,
            "language": args.language,
            "audio_sec": audio_sec,
            "started_at": run_start,
            "wall_sec": wall,
        }, indent=2))
    print(json.dumps(summary, indent=2))
    sys.exit(0 if summary["errors"] == 0 else 1)


if __name__ == "__main__":
    main()
