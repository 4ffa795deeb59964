"""Capture /metrics.json + /system samples to JSONL or CSV over time.

Parity with ``tools/dashboard/metrics_capture.py`` in the reference.

Run: ``python -m tools.dashboard.metrics_capture --base-url
http://127.0.0.1:8000 --out run.jsonl --interval 2 --duration 60``.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from typing import Any, Dict

from .monitor_dashboard import fetch_json

_CSV_FIELDS = [
    "ts", "active_sessions", "decode_pending", "decode_latency_count",
    "decode_latency_total", "decode_latency_max", "decode_cancelled",
    "decode_orphaned", "partial_drop_count", "buffer_bytes_total",
    "vad_triggers_total", "engine_step_count", "engine_batch_rows_total",
    "engine_batch_occupancy_total", "rss_bytes", "cpu_percent",
]


def _flatten(metrics: Dict[str, Any], system: Dict[str, Any]) -> Dict[str, Any]:
    row = {"ts": time.time()}
    for key in _CSV_FIELDS[1:]:
        if key in ("rss_bytes", "cpu_percent"):
            row[key] = (system.get("process") or {}).get(key)
        else:
            row[key] = metrics.get(key)
    return row


def main() -> None:
    parser = argparse.ArgumentParser(description="Capture server metrics over time")
    parser.add_argument("--base-url", default="http://127.0.0.1:8000")
    parser.add_argument("--out", required=True, help=".jsonl or .csv output path")
    parser.add_argument("--interval", type=float, default=2.0)
    parser.add_argument("--duration", type=float, default=0.0,
                        help="seconds to capture (0 = until Ctrl+C)")
    parser.add_argument("--timeout", type=float, default=2.0)
    parser.add_argument("--token", default="")
    args = parser.parse_args()

    is_csv = args.out.endswith(".csv")
    deadline = time.monotonic() + args.duration if args.duration > 0 else None
    count = 0
    with open(args.out, "w", newline="") as f:
        writer = None
        if is_csv:
            writer = csv.DictWriter(f, fieldnames=_CSV_FIELDS)
            writer.writeheader()
        try:
            while deadline is None or time.monotonic() < deadline:
                metrics, _ = fetch_json(
                    f"{args.base_url}/metrics.json", args.timeout, args.token
                )
                system, _ = fetch_json(
                    f"{args.base_url}/system", args.timeout, args.token
                )
                if metrics is not None:
                    row = _flatten(metrics, system or {})
                    if is_csv:
                        writer.writerow(row)
                    else:
                        f.write(json.dumps(row) + "\n")
                    f.flush()
                    count += 1
                time.sleep(max(0.2, args.interval))
        except KeyboardInterrupt:
            pass
    print(f"captured {count} samples to {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
