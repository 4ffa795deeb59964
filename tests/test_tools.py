"""Ops tooling tests: load-test artifact writers + web-dashboard RunManager
(VERDICT missing #6/#7: tooling parity with the reference harness)."""

import json
import sys
import time
import types
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from tools.bench.grpc_load_test import (  # noqa: E402
    SessionLogWriter, SessionRecord, summarize,
)
from tools.web_dashboard.server import RunManager, fetch_kpis  # noqa: E402


def _record(i=0, ok=True):
    return SessionRecord(
        session_id=f"s{i}", worker=i, iteration=0, ok=ok,
        error="" if ok else "boom",
        create_latency_sec=0.01, first_partial_sec=0.5,
        final_latency_sec=0.2, audio_sec=5.0, wall_sec=5.1, rtf=1.02,
        results=4, finals=1, transcript="hello there",
        server_timing={"inference_sec": 0.12, "buffer_wait_sec": 0.01},
    )


def test_session_log_formats(tmp_path):
    recs = [_record(0), _record(1, ok=False)]
    for fmt, check in (
        ("jsonl", lambda text: json.loads(text.splitlines()[0])["rtf"] == 1.02),
        ("csv", lambda text: text.splitlines()[0].startswith("session_id,")),
        ("tsv", lambda text: "\t" in text.splitlines()[0]),
        ("markdown", lambda text: text.splitlines()[0].startswith("| session_id")),
    ):
        path = tmp_path / f"log.{fmt}"
        writer = SessionLogWriter(str(path), fmt)
        for rec in recs:
            writer.write(rec)
        writer.close()
        text = path.read_text()
        assert check(text), f"{fmt} log malformed:\n{text[:200]}"
        # every record present
        assert text.count("s0") >= 1 and text.count("s1") >= 1


def test_summary_includes_phase_breakdown():
    summary = summarize([_record(0), _record(1)], wall_sec=10.0)
    assert summary["ok"] == 2
    assert summary["server_inference_sec"]["p95"] == pytest.approx(0.12)
    assert summary["server_buffer_wait_sec"]["count"] == 2
    assert summary["sessions_per_sec"] == pytest.approx(0.2)
    assert summary["responses_per_session"]["p50"] == 4
    assert summary["rtfx_aggregate"] == pytest.approx(1.0)


def test_run_manager_lifecycle(tmp_path, monkeypatch):
    """start -> running -> artifacts -> cancel; archived listing."""
    manager = RunManager(tmp_path / "runs", "127.0.0.1:1")

    class FakeProc:
        def __init__(self, cmd, **kw):
            self.cmd = cmd
            self._done = time.monotonic() + 30
            self.terminated = False

        def wait(self):
            while not self.terminated and time.monotonic() < self._done:
                time.sleep(0.02)
            return -15 if self.terminated else 0

        def terminate(self):
            self.terminated = True

    import tools.web_dashboard.server as mod

    monkeypatch.setattr(mod.subprocess, "Popen", FakeProc)
    record = manager.start_run({"sessions": 2, "audio_sec": 1.0})
    run_id = record["id"]
    assert record["status"] == "running"
    # artifact dir created with params.json
    assert "params.json" in manager.artifacts(run_id)
    # the spawned command writes the FULL artifact set via --out-dir
    proc_cmd = manager._procs[run_id].cmd
    assert "--out-dir" in proc_cmd

    cancelled = manager.cancel_run(run_id)
    assert cancelled["status"] == "cancelled"
    for _ in range(100):
        detail = manager.run_detail(run_id)
        if detail["status"] == "cancelled" and detail["finished_at"]:
            break
        time.sleep(0.05)
    assert manager.run_detail(run_id)["status"] == "cancelled"

    # a run dir not in memory lists as archived
    (tmp_path / "runs" / "20000101_000000_aaaaaa").mkdir()
    listed = {r["id"]: r for r in manager.list_runs()}
    assert listed["20000101_000000_aaaaaa"]["status"] == "archived"


def test_run_manager_artifact_path_traversal_blocked(tmp_path):
    manager = RunManager(tmp_path / "runs", "127.0.0.1:1")
    (tmp_path / "runs" / "r1").mkdir(parents=True)
    (tmp_path / "runs" / "r1" / "summary.json").write_text("{}")
    assert manager.artifact_path("r1", "summary.json") is not None
    assert manager.artifact_path("r1", "../../etc/passwd") is None
    assert manager.artifact_path("../r1", "summary.json") is None
    assert manager.artifact_path("r1", "missing.json") is None


def test_fetch_kpis_unreachable():
    out = fetch_kpis("http://127.0.0.1:1")
    assert out["ok"] is False and out["error"]


def test_run_manager_targets(tmp_path, monkeypatch):
    """targets.json schema + target_id resolution + probe of a dead target
    (reference core/run_manager.py:430-470)."""
    targets = tmp_path / "targets.json"
    targets.write_text(json.dumps([
        {"id": "local", "grpc_target": "127.0.0.1:1",
         "http_base": "http://127.0.0.1:1"},
        {"grpc_target": "no-id:1"},          # invalid: dropped
        "not-a-dict",                         # invalid: dropped
    ]))
    manager = RunManager(tmp_path / "runs", "127.0.0.1:1",
                         targets_path=targets)
    listed = manager.list_targets()
    assert [t["id"] for t in listed] == ["local"]
    assert manager.get_target("nope") is None

    status = manager.probe_target(manager.get_target("local"))
    assert status["target_id"] == "local"
    assert status["grpc_ok"] is False and status["http_ok"] is False
    assert status["last_ok_ts"] is None and status["rtt_ms"] >= 0

    # target_id resolves the grpc target for a spawned run
    spawned = []

    class FakeProc:
        def __init__(self, cmd, **kw):
            self.cmd = cmd
            spawned.append(cmd)

        def wait(self):
            return 0

        def terminate(self):
            pass

    import tools.web_dashboard.server as mod

    monkeypatch.setattr(mod.subprocess, "Popen", FakeProc)
    record = manager.start_run({"sessions": 1, "target_id": "local"})
    # resolved grpc target landed on the command line
    cmd = spawned[0]
    assert cmd[cmd.index("--target") + 1] == "127.0.0.1:1"
    with pytest.raises(ValueError):
        manager.start_run({"sessions": 1, "target_id": "missing"})
    started = [r for r in manager.list_runs() if r["id"] == record["id"]]
    assert started and started[0]["params"]["target_id"] == "local"


def test_run_manager_targets_missing_file(tmp_path):
    manager = RunManager(tmp_path / "runs", "127.0.0.1:1",
                         targets_path=tmp_path / "absent.json")
    assert manager.list_targets() == []
