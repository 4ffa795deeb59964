"""Plot captured metrics (JSONL/CSV from metrics_capture) with matplotlib.

Parity with the reference plotter (``tools/dashboard/plot_metrics.py``).

Run: ``python -m tools.dashboard.plot_metrics run.jsonl --out run.png``.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path
from typing import Any, Dict, List


def load_rows(path: str) -> List[Dict[str, Any]]:
    p = Path(path)
    text = p.read_text()
    if p.suffix == ".csv":
        return [dict(row) for row in csv.DictReader(text.splitlines())]
    return [json.loads(line) for line in text.splitlines() if line.strip()]


def main() -> None:
    parser = argparse.ArgumentParser(description="Plot captured STT metrics")
    parser.add_argument("capture", help="JSONL or CSV from metrics_capture")
    parser.add_argument("--out", default=None, help="output PNG (default: show)")
    args = parser.parse_args()

    import matplotlib

    if args.out:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = load_rows(args.capture)
    if not rows:
        print("no samples", file=sys.stderr)
        sys.exit(1)

    def series(key, cast=float):
        out = []
        for r in rows:
            v = r.get(key)
            try:
                out.append(cast(v) if v not in (None, "") else None)
            except (TypeError, ValueError):
                out.append(None)
        return out

    t0 = float(rows[0].get("ts") or 0)
    ts = [float(r.get("ts") or 0) - t0 for r in rows]

    fig, axes = plt.subplots(4, 1, figsize=(10, 11), sharex=True)
    axes[0].plot(ts, series("active_sessions"), label="active_sessions")
    axes[0].plot(ts, series("decode_pending"), label="decode_pending")
    axes[0].set_ylabel("count")
    axes[0].legend(loc="upper left")

    lat_total = series("decode_latency_total")
    lat_count = series("decode_latency_count")
    avg = [
        (t / c) if (t and c) else None
        for t, c in zip(lat_total, lat_count)
    ]
    axes[1].plot(ts, avg, label="decode_latency_avg (cum)")
    axes[1].plot(ts, series("decode_latency_max"), label="decode_latency_max")
    axes[1].set_ylabel("seconds")
    axes[1].legend(loc="upper left")

    axes[2].plot(ts, series("buffer_bytes_total"), label="buffer_bytes_total")
    axes[2].plot(ts, series("rss_bytes"), label="rss_bytes")
    axes[2].set_ylabel("bytes")
    axes[2].legend(loc="upper left")

    axes[3].plot(ts, series("partial_drop_count"), label="partial_drops")
    axes[3].plot(ts, series("decode_cancelled"), label="cancelled")
    axes[3].plot(ts, series("decode_orphaned"), label="orphaned")
    axes[3].plot(ts, series("vad_triggers_total"), label="vad_triggers")
    axes[3].set_ylabel("count")
    axes[3].set_xlabel("seconds")
    axes[3].legend(loc="upper left")

    fig.suptitle("STT server metrics")
    fig.tight_layout()
    if args.out:
        fig.savefig(args.out, dpi=120)
        print(f"wrote {args.out}", file=sys.stderr)
    else:
        plt.show()


if __name__ == "__main__":
    main()
