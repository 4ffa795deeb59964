"""Web dashboard server + static frontend contract.

The frontend (static/index.html) renders latency-percentile charts and
run comparison from /api/runs and /api/runs/<id> — these tests pin the
server side of that contract with archived-run fixtures so a frontend
or RunManager change that breaks the data shape fails here.
Reference role: tools/web_dashboard (RunManager + Next.js page).
"""
from __future__ import annotations

import json
import re
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

SUMMARY = {
    "rtfx_aggregate": 512.0,
    "sessions": 8, "sessions_ok": 8, "errors": 0,
    "create_sec": {"p50": 0.02, "p90": 0.03, "p95": 0.04, "p99": 0.08},
    "first_partial_sec": {"p50": 1.6, "p90": 1.9, "p95": 2.1, "p99": 2.8},
    "final_sec": {"p50": 0.4, "p90": 0.6, "p95": 0.78, "p99": 1.1},
}


@pytest.fixture()
def dashboard(tmp_path):
    import sys

    sys.path.insert(0, str(REPO / "tools" / "web_dashboard"))
    try:
        import server as dash_server
    finally:
        sys.path.pop(0)
    runs = tmp_path / "runs"
    for rid in ("run-001", "run-002"):
        (runs / rid).mkdir(parents=True)
        (runs / rid / "summary.json").write_text(json.dumps(SUMMARY))
    manager = dash_server.RunManager(runs, "127.0.0.1:1")
    httpd = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        dash_server.build_handler(manager, "http://127.0.0.1:1"),
    )
    httpd.daemon_threads = True
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
    finally:
        httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.status, resp.read()


def test_index_served_with_chart_sections(dashboard):
    status, body = _get(dashboard + "/")
    assert status == 200
    page = body.decode()
    for anchor in ("chart-percentiles", "chart-compare", "chart-counts",
                   "chart-latency", "compare-btn", "pct-table"):
        assert anchor in page, f"frontend anchor {anchor} missing"


def test_runs_listing_and_detail_contract(dashboard):
    status, body = _get(dashboard + "/api/runs")
    assert status == 200
    runs = json.loads(body)["runs"]
    assert {r["id"] for r in runs} >= {"run-001", "run-002"}
    status, body = _get(dashboard + "/api/runs/run-001")
    assert status == 200
    summary = json.loads(body)["summary"]
    # the fields the percentile chart + comparison table consume
    assert summary["rtfx_aggregate"] == 512.0
    for metric in ("create_sec", "first_partial_sec", "final_sec"):
        for pct in ("p50", "p90", "p95", "p99"):
            assert isinstance(summary[metric][pct], float)


def test_frontend_palette_uses_text_tokens_for_labels():
    """Chart text must wear text tokens, never series colors (the
    dataviz discipline the page documents); spot-check the stylesheet
    wires svg text to the secondary/muted tokens."""
    page = (REPO / "tools/web_dashboard/static/index.html").read_text()
    assert re.search(r"svg text \{ fill:var\(--text-secondary\)", page)
    assert "--series-1" in page and "--seq-600" in page
