"""Pin tools/measure_session.py's ladder-control logic with stubbed
subprocesses: the mid-ladder health gate (round-5: a window that dies
must abort instead of burning hours of stage timeouts) and the
64-stream escalation (only fires when the 32-stream rung confirmed the
batch-amortization scaling prediction, docs/PERF.md)."""

import importlib.util
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)


def _load():
    spec = importlib.util.spec_from_file_location(
        "measure_session", os.path.join(ROOT, "tools", "measure_session.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _drive(tmp_path, monkeypatch, probe_results, rt32):
    """Run main() with run_stage/window_alive stubbed; returns the list
    of stage names that ran and the log records."""
    m = _load()
    ran = []

    def fake_probe(cmd_self=None, **kw):
        return probe_results.pop(0) if probe_results else True
    monkeypatch.setattr(m, "window_alive", lambda *a, **k: fake_probe())
    monkeypatch.setattr(m.time, "sleep", lambda s: None)

    def fake_run_stage(name, cmd, timeout, log):
        ran.append(name)
        rec = {"stage": name, "rc": 0, "results": []}
        if name == "fleet-resident-32":
            rec["results"] = [{"mode": "fused-resident",
                               "realtime_ensembles": rt32}]
        with open(log, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec
    monkeypatch.setattr(m, "run_stage", fake_run_stage)

    # the opening health probe subprocess must report healthy
    import subprocess as sp

    class R:
        returncode = 0
        stdout = "probe ok 1.0s\nPROBE_S=1.0"
        stderr = ""
    monkeypatch.setattr(sp, "run", lambda *a, **k: R())

    log = str(tmp_path / "log.jsonl")
    rc = m.main(["--log", log])
    recs = [json.loads(ln) for ln in open(log)]
    return rc, ran, recs


def test_healthy_window_runs_whole_ladder_no_escalation(tmp_path,
                                                        monkeypatch):
    rc, ran, _ = _drive(tmp_path, monkeypatch, [], rt32=90.0)
    assert rc == 0
    assert "fleet-resident-32" in ran and "fleet-resident" in ran
    assert "ingest-overlap" in ran            # reached the end
    # 90 rt at 32 streams did NOT confirm the 2x scaling prediction
    assert "fleet-resident-64" not in ran


def test_escalates_to_64_streams_when_32_confirms_scaling(tmp_path,
                                                          monkeypatch):
    rc, ran, _ = _drive(tmp_path, monkeypatch, [], rt32=150.0)
    assert rc == 0
    i32 = ran.index("fleet-resident-32")
    assert ran[i32 + 1] == "fleet-resident-64"
    assert "ingest-overlap" in ran            # rest of ladder still ran


def test_dead_window_aborts_with_logged_record(tmp_path, monkeypatch):
    # first gate probe fails twice (initial + retry) -> abort before the
    # second ladder stage; the CPU-only consume stage never runs either
    # because the ladder stopped
    rc, ran, recs = _drive(tmp_path, monkeypatch,
                           [False, False], rt32=150.0)
    assert rc == 0
    assert ran == ["bench"]
    aborts = [r for r in recs if r["stage"] == "session-abort"]
    assert len(aborts) == 1 and aborts[0]["next_stage"] == "stages-core"
