"""Web dashboard: manage load-test runs and watch live server KPIs.

Functional parity with the reference web dashboard (``tools/web_dashboard/
core/run_manager.py`` + Next.js frontend): a RunManager spawns
``tools.bench.grpc_load_test`` subprocesses, tracks run status, stores
artifacts under ``runs/<id>/``, and streams live KPIs from the STT server's
``/metrics.json`` over SSE. Substrate: stdlib ``http.server`` + a
vanilla-JS single-page frontend (no FastAPI/Node in the image).

Run: ``python -m tools.web_dashboard.server --port 8090
--stt-http http://127.0.0.1:8000 --stt-grpc 127.0.0.1:50051``.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time
import urllib.request
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any, Dict, List, Optional
from urllib.parse import parse_qs, urlparse

REPO_ROOT = Path(__file__).resolve().parents[2]
STATIC_DIR = Path(__file__).parent / "static"


class RunManager:
    """Spawn and track grpc_load_test runs with on-disk artifacts."""

    def __init__(
        self,
        runs_dir: Path,
        stt_grpc: str,
        targets_path: Optional[Path] = None,
    ) -> None:
        self.runs_dir = runs_dir
        self.stt_grpc = stt_grpc
        self.targets_path = (
            targets_path
            if targets_path is not None
            else Path(__file__).parent / "targets.json"
        )
        self.runs_dir.mkdir(parents=True, exist_ok=True)
        self._lock = threading.Lock()
        self._runs: Dict[str, Dict[str, Any]] = {}
        self._procs: Dict[str, subprocess.Popen] = {}

    def list_targets(self) -> List[Dict[str, str]]:
        """Operator-defined server targets (reference run_manager.py:430-452
        schema: id / grpc_target / http_base); re-read per call so edits to
        targets.json land without a restart."""
        if not self.targets_path.exists():
            return []
        try:
            raw = json.loads(self.targets_path.read_text())
        except (OSError, ValueError):
            return []
        targets: List[Dict[str, str]] = []
        if isinstance(raw, list):
            for entry in raw:
                if not isinstance(entry, dict):
                    continue
                if not entry.get("id") or not entry.get("grpc_target"):
                    continue
                targets.append({
                    "id": str(entry["id"]),
                    "grpc_target": str(entry["grpc_target"]),
                    "http_base": str(entry.get("http_base") or ""),
                })
        return targets

    def get_target(self, target_id: str) -> Optional[Dict[str, str]]:
        for target in self.list_targets():
            if target["id"] == target_id:
                return target
        return None

    def probe_target(self, target: Dict[str, str]) -> Dict[str, Any]:
        """Liveness probe: TCP dial the gRPC port, fetch /system and
        /metrics.json from the HTTP plane (reference run_manager.py:460+)."""
        import socket

        start = time.time()
        grpc_ok = False
        host, _, port = target["grpc_target"].rpartition(":")
        # gRPC targets write IPv6 hosts in URL bracket syntax ("[::1]");
        # socket wants the bare address
        host = host.strip("[]")
        try:
            with socket.create_connection((host or "127.0.0.1",
                                           int(port)), timeout=2):
                grpc_ok = True
        except (OSError, ValueError):
            grpc_ok = False
        system_payload: Optional[Dict[str, Any]] = None
        metrics_payload: Optional[Dict[str, Any]] = None
        base = target.get("http_base") or ""
        if base:
            for name in ("system", "metrics.json"):
                try:
                    with urllib.request.urlopen(
                        f"{base}/{name}", timeout=2
                    ) as resp:
                        payload = json.loads(resp.read())
                except Exception:
                    payload = None
                if name == "system":
                    system_payload = payload
                else:
                    metrics_payload = payload
        ok = grpc_ok or system_payload is not None or metrics_payload is not None
        return {
            "target_id": target["id"],
            "grpc_ok": grpc_ok,
            "http_ok": system_payload is not None or metrics_payload is not None,
            "rtt_ms": int((time.time() - start) * 1000),
            "last_ok_ts": time.time() if ok else None,
            "system": system_payload,
            "metrics": metrics_payload,
        }

    def start_run(self, params: Dict[str, Any]) -> Dict[str, Any]:
        # validate BEFORE creating the run dir — a rejected request must
        # not leave an orphan empty directory behind
        grpc_target = params.get("target")
        if not grpc_target and params.get("target_id"):
            resolved = self.get_target(str(params["target_id"]))
            if resolved is None:
                raise ValueError(f"unknown target_id {params['target_id']!r}")
            grpc_target = resolved["grpc_target"]
        run_id = time.strftime("%Y%m%d_%H%M%S") + "_" + uuid.uuid4().hex[:6]
        run_dir = self.runs_dir / run_id
        run_dir.mkdir(parents=True)
        cmd = [
            sys.executable, str(REPO_ROOT / "tools/bench/grpc_load_test.py"),
            "--target", str(grpc_target or self.stt_grpc),
            "--sessions", str(int(params.get("sessions", 4))),
            "--iterations", str(int(params.get("iterations", 1))),
            "--synthetic-sec", str(float(params.get("audio_sec", 5.0))),
            "--chunk-ms", str(int(params.get("chunk_ms", 100))),
            "--mode", str(params.get("mode", "realtime")),
            "--speed", str(float(params.get("speed", 1.0))),
            "--profile", str(params.get("profile", "realtime")),
            "--out-dir", str(run_dir),
        ]
        if params.get("warmup"):
            cmd += ["--warmup", str(int(params["warmup"]))]
        if params.get("language"):
            cmd += ["--language", str(params["language"])]
        (run_dir / "params.json").write_text(json.dumps(params, indent=2))
        stderr = open(run_dir / "run.log", "w")
        proc = subprocess.Popen(
            cmd, cwd=REPO_ROOT, stdout=subprocess.DEVNULL, stderr=stderr
        )
        record = {
            "id": run_id,
            "params": params,
            "status": "running",
            "started_at": time.time(),
            "finished_at": None,
            "returncode": None,
        }
        with self._lock:
            self._runs[run_id] = record
            self._procs[run_id] = proc

        def waiter():
            rc = proc.wait()
            stderr.close()
            with self._lock:
                if record["status"] == "cancelled":
                    pass
                else:
                    record["status"] = "success" if rc == 0 else "failed"
                record["returncode"] = rc
                record["finished_at"] = time.time()
                self._procs.pop(run_id, None)

        threading.Thread(target=waiter, daemon=True).start()
        return dict(record)

    def cancel_run(self, run_id: str) -> Optional[Dict[str, Any]]:
        with self._lock:
            proc = self._procs.get(run_id)
            record = self._runs.get(run_id)
            if proc is None or record is None:
                return None
            record["status"] = "cancelled"
        proc.terminate()
        return dict(record)

    def artifacts(self, run_id: str) -> List[str]:
        run_dir = self.runs_dir / run_id
        if not run_dir.is_dir():
            return []
        return sorted(p.name for p in run_dir.iterdir() if p.is_file())

    def artifact_path(self, run_id: str, name: str) -> Optional[Path]:
        # run_id/name are path components, never traversal
        if "/" in name or ".." in name or "/" in run_id or ".." in run_id:
            return None
        path = self.runs_dir / run_id / name
        return path if path.is_file() else None

    def list_runs(self) -> List[Dict[str, Any]]:
        with self._lock:
            live = {r["id"]: dict(r) for r in self._runs.values()}
        for entry in sorted(self.runs_dir.iterdir(), reverse=True):
            if entry.is_dir() and entry.name not in live:
                live[entry.name] = {
                    "id": entry.name, "status": "archived",
                    "params": {}, "started_at": None, "finished_at": None,
                }
        return sorted(live.values(), key=lambda r: r["id"], reverse=True)

    def run_detail(self, run_id: str) -> Optional[Dict[str, Any]]:
        run_dir = self.runs_dir / run_id
        if not run_dir.is_dir():
            return None
        with self._lock:
            record = dict(self._runs.get(run_id) or {"id": run_id, "status": "archived"})
        summary_path = run_dir / "summary.json"
        if summary_path.exists():
            try:
                record["summary"] = json.loads(summary_path.read_text() or "{}")
            except ValueError:
                record["summary"] = None
        sessions_path = run_dir / "sessions.jsonl"
        if sessions_path.exists():
            record["sessions"] = [
                json.loads(line)
                for line in sessions_path.read_text().splitlines() if line
            ][:500]
        return record


def fetch_kpis(stt_http: str) -> Dict[str, Any]:
    try:
        with urllib.request.urlopen(f"{stt_http}/metrics.json", timeout=2) as resp:
            m = json.loads(resp.read())
        count = m.get("decode_latency_count") or 0
        total = m.get("decode_latency_total") or 0.0
        occ_c = m.get("engine_batch_occupancy_count") or 0
        occ_t = m.get("engine_batch_occupancy_total") or 0.0
        return {
            "ok": True,
            "active_sessions": m.get("active_sessions", 0),
            "decode_pending": m.get("decode_pending", 0),
            "decode_count": count,
            "decode_latency_avg": (total / count) if count else 0.0,
            "buffer_bytes_total": m.get("buffer_bytes_total", 0),
            "partial_drops": m.get("partial_drop_count", 0),
            "vad_triggers": m.get("vad_triggers_total", 0),
            "engine_occupancy_avg": (occ_t / occ_c) if occ_c else 0.0,
            "errors": m.get("error_counts", {}),
        }
    except Exception as exc:
        return {"ok": False, "error": str(exc)}


def build_handler(manager: RunManager, stt_http: str):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def _json(self, payload, status=200):
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("content-type", "application/json")
            self.send_header("content-length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            parsed = urlparse(self.path)
            path = parsed.path
            if path in ("/", "/index.html"):
                body = (STATIC_DIR / "index.html").read_bytes()
                self.send_response(200)
                self.send_header("content-type", "text/html")
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if path == "/api/runs":
                self._json({"runs": manager.list_runs()})
                return
            if path.startswith("/api/runs/") and path.endswith("/events"):
                # per-run SSE: status + tail of the live run log
                run_id = path.split("/")[3]
                self.send_response(200)
                self.send_header("content-type", "text/event-stream")
                self.send_header("cache-control", "no-cache")
                self.end_headers()
                log_path = manager.runs_dir / run_id / "run.log"
                offset = 0
                try:
                    while True:
                        lines = []
                        if log_path.exists():
                            with open(log_path) as f:
                                f.seek(offset)
                                chunk = f.read()
                                offset = f.tell()
                            lines = [
                                ln for ln in chunk.splitlines() if ln.strip()
                            ]
                        detail = manager.run_detail(run_id) or {}
                        payload = json.dumps({
                            "status": detail.get("status", "unknown"),
                            "log": lines,
                            "summary": detail.get("summary"),
                        })
                        self.wfile.write(f"data: {payload}\n\n".encode())
                        self.wfile.flush()
                        if detail.get("status") not in ("running", None):
                            return
                        time.sleep(1.0)
                except (BrokenPipeError, ConnectionResetError):
                    return
            if path.startswith("/api/runs/") and "/artifact" in path:
                parts = path.split("/")
                run_id = parts[3]
                query = parse_qs(parsed.query)
                name = (query.get("name") or [""])[0]
                fpath = manager.artifact_path(run_id, name)
                if fpath is None:
                    self._json({"error": "not found"}, 404)
                    return
                body = fpath.read_bytes()
                ctype = (
                    "application/json" if name.endswith(".json")
                    else "text/plain"
                )
                self.send_response(200)
                self.send_header("content-type", ctype)
                self.send_header("content-length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            if path.startswith("/api/runs/"):
                run_id = path.rsplit("/", 1)[1]
                detail = manager.run_detail(run_id)
                if detail is None:
                    self._json({"error": "not found"}, 404)
                else:
                    detail["artifacts"] = manager.artifacts(run_id)
                    self._json(detail)
                return
            if path == "/api/targets":
                self._json({"targets": manager.list_targets()})
                return
            if path.startswith("/api/targets/") and path.endswith("/status"):
                target_id = path.split("/")[3]
                target = manager.get_target(target_id)
                if target is None:
                    self._json({"error": "unknown target"}, 404)
                else:
                    self._json(manager.probe_target(target))
                return
            if path == "/api/kpis":
                self._json(fetch_kpis(stt_http))
                return
            if path == "/api/kpis/stream":
                self.send_response(200)
                self.send_header("content-type", "text/event-stream")
                self.send_header("cache-control", "no-cache")
                self.end_headers()
                try:
                    while True:
                        payload = json.dumps(fetch_kpis(stt_http))
                        self.wfile.write(f"data: {payload}\n\n".encode())
                        self.wfile.flush()
                        time.sleep(1.0)
                except (BrokenPipeError, ConnectionResetError):
                    return
            self._json({"error": "not found"}, 404)

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path == "/api/runs":
                length = int(self.headers.get("content-length") or 0)
                try:
                    params = json.loads(self.rfile.read(length) or b"{}")
                except ValueError:
                    self._json({"error": "invalid JSON"}, 400)
                    return
                try:
                    self._json(manager.start_run(params))
                except ValueError as exc:
                    self._json({"error": str(exc)}, 400)
                return
            if parsed.path.startswith("/api/runs/") and (
                parsed.path.endswith("/cancel")
            ):
                run_id = parsed.path.split("/")[3]
                record = manager.cancel_run(run_id)
                if record is None:
                    self._json({"error": "not running"}, 404)
                else:
                    self._json(record)
                return
            self._json({"error": "not found"}, 404)

    return Handler


def main() -> None:
    parser = argparse.ArgumentParser(description="STT web dashboard")
    parser.add_argument("--port", type=int, default=8090)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--stt-http", default="http://127.0.0.1:8000")
    parser.add_argument("--stt-grpc", default="127.0.0.1:50051")
    parser.add_argument("--runs-dir", default=str(REPO_ROOT / "runs"))
    parser.add_argument(
        "--targets", default=None,
        help="path to a targets.json (default: alongside this module)",
    )
    args = parser.parse_args()

    manager = RunManager(
        Path(args.runs_dir), args.stt_grpc,
        targets_path=Path(args.targets) if args.targets else None,
    )
    server = ThreadingHTTPServer(
        (args.host, args.port), build_handler(manager, args.stt_http)
    )
    server.daemon_threads = True
    print(f"dashboard on http://{args.host}:{args.port}", file=sys.stderr)
    server.serve_forever()


if __name__ == "__main__":
    main()
