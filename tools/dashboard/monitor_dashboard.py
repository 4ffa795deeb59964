"""Terminal dashboard: poll /metrics.json + /system and render a text view.

Parity with the reference dashboard (``tools/dashboard/
monitor_dashboard.py``), plus TPU engine rows (batch occupancy, step time,
compile count). Uses urllib instead of requests (not in the image).

Run: ``python -m tools.dashboard.monitor_dashboard --base-url
http://127.0.0.1:8000 [--interval 2] [--once]``.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import urllib.request
from datetime import datetime
from typing import Any, Dict, Optional, Tuple


def fetch_json(
    url: str, timeout: float, token: str = ""
) -> Tuple[Optional[Dict[str, Any]], Optional[str]]:
    try:
        req = urllib.request.Request(url)
        if token:
            req.add_header("authorization", f"Bearer {token}")
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return json.loads(resp.read()), None
    except Exception as exc:
        return None, str(exc)


def _fmt_bytes(value: Optional[float]) -> str:
    if value is None:
        return "n/a"
    size = float(value)
    for unit in ("B", "KB", "MB", "GB", "TB"):
        if size < 1024 or unit == "TB":
            return f"{size:.1f}{unit}"
        size /= 1024
    return f"{size:.1f}TB"


def _avg(payload: Dict[str, Any], name: str) -> float:
    total = payload.get(f"{name}_total") or 0.0
    count = payload.get(f"{name}_count") or 0
    return total / count if count else 0.0


def render(
    metrics: Optional[Dict[str, Any]], system: Optional[Dict[str, Any]]
) -> str:
    now = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    lines = [f"STT Dashboard - {now}"]
    if metrics is None:
        lines.append("Metrics: unavailable")
    else:
        lines.append(
            "Sessions: active={a} vad_utterances={v} vad_triggers={t}".format(
                a=metrics.get("active_sessions", 0),
                v=metrics.get("active_vad_utterances", 0),
                t=metrics.get("vad_triggers_total", 0),
            )
        )
        lines.append(
            "Decode: count={c} avg={avg:.3f}s max={mx:.3f}s queue_avg={qa:.3f}s "
            "pending={p} cancelled={cn} orphaned={o} dropped={d}".format(
                c=metrics.get("decode_latency_count", 0),
                avg=_avg(metrics, "decode_latency"),
                mx=metrics.get("decode_latency_max") or 0.0,
                qa=_avg(metrics, "decode_queue_wait"),
                p=metrics.get("decode_pending", 0),
                cn=metrics.get("decode_cancelled", 0),
                o=metrics.get("decode_orphaned", 0),
                d=metrics.get("partial_drop_count", 0),
            )
        )
        lines.append(
            "Engine: batches={b} rows_avg={r:.1f} occupancy_avg={occ:.2f} "
            "step_avg={s:.3f}s compiles={cc}".format(
                b=metrics.get("engine_step_count", 0),
                r=_avg(metrics, "engine_batch_rows"),
                occ=_avg(metrics, "engine_batch_occupancy"),
                s=_avg(metrics, "engine_step"),
                cc=metrics.get("engine_compile_count", 0),
            )
        )
        lines.append(
            "Buffers: total={bt} rtf_avg={r:.3f}".format(
                bt=_fmt_bytes(metrics.get("buffer_bytes_total")),
                r=_avg(metrics, "rtf"),
            )
        )
        errors = metrics.get("error_counts") or {}
        if errors:
            lines.append(
                "Errors: " + " ".join(f"{k}={v}" for k, v in sorted(errors.items()))
            )
        blocks = metrics.get("rate_limit_blocks") or {}
        if blocks:
            lines.append(
                "RateLimit: " + " ".join(f"{k}={v}" for k, v in sorted(blocks.items()))
            )
    if system is None:
        lines.append("System: unavailable")
    else:
        proc = system.get("process") or {}
        sysm = system.get("system") or {}
        lines.append(
            "Process: rss={rss} cpu={cpu}% threads={th}".format(
                rss=_fmt_bytes(proc.get("rss_bytes")),
                cpu=proc.get("cpu_percent"),
                th=proc.get("num_threads"),
            )
        )
        if sysm:
            lines.append(
                "System: mem={pct}% cpu={cpu}% load={load}".format(
                    pct=sysm.get("memory_percent"),
                    cpu=sysm.get("cpu_percent"),
                    load=sysm.get("load_avg"),
                )
            )
        tpu = system.get("tpu") or {}
        if tpu:
            devs = ", ".join(
                f"{d.get('kind','?')}#{d.get('id')} "
                f"{_fmt_bytes(d.get('bytes_in_use'))}/{_fmt_bytes(d.get('bytes_limit'))}"
                for d in tpu.get("devices", [])
            )
            lines.append(f"TPU[{tpu.get('device_count')}]: {devs}")
    return "\n".join(lines)


def main() -> None:
    parser = argparse.ArgumentParser(description="STT terminal dashboard")
    parser.add_argument("--base-url", default="http://127.0.0.1:8000")
    parser.add_argument("--interval", type=float, default=2.0)
    parser.add_argument("--timeout", type=float, default=2.0)
    parser.add_argument("--token", default="", help="observability bearer token")
    parser.add_argument("--once", action="store_true")
    args = parser.parse_args()

    while True:
        metrics, merr = fetch_json(
            f"{args.base_url}/metrics.json", args.timeout, args.token
        )
        system, serr = fetch_json(
            f"{args.base_url}/system", args.timeout, args.token
        )
        output = render(metrics, system)
        if merr:
            output += f"\n(metrics error: {merr})"
        if serr:
            output += f"\n(system error: {serr})"
        if args.once:
            print(output)
            return
        sys.stdout.write("\033[2J\033[H" + output + "\n")
        sys.stdout.flush()
        time.sleep(max(0.2, args.interval))


if __name__ == "__main__":
    main()
