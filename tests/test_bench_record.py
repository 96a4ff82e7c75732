"""bench.py is the official perf-record path: pin its degraded-window
behavior with stubbed workers (no device needed).

- A semi-degraded window (measurements land but sit below the
  track-record floors) must be retried — best-so-far recovery clears the
  floors and the final record carries no degraded note.
- A permanently-degraded window must terminate within the overtime wall
  and carry an explicit degraded-window note (never silently record the
  link as the chip).
"""

import importlib.util
import io
import json
import os
import sys
import time
import types

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench(budget_s, overtime_s):
    os.environ["BENCH_BUDGET_S"] = str(budget_s)
    os.environ["BENCH_OVERTIME_S"] = str(overtime_s)
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(ROOT, "bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _run_main(m):
    sys.argv = ["bench.py"]
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        m.main()
    finally:
        sys.stdout = old
    lines = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")]
    assert lines, "bench must emit at least the startup record line"
    return [json.loads(ln) for ln in lines]


def _stub(m, demod_seq, vit_seq, fleet_seq):
    """Install a fake _run_sub yielding successive values per worker kind
    (the last value repeats once a sequence is exhausted)."""
    calls = {"demod": 0, "vit": 0, "fleet": 0}

    def pick(seq, k):
        calls[k] += 1
        return seq[min(calls[k] - 1, len(seq) - 1)]

    def fake_run_sub(args, timeout):
        a = [str(x) for x in args]
        if "--worker" in a:
            return [{"batch": 128, "iters": 30, "sync": "fetch_verified",
                     "msps": pick(demod_seq, "demod")}]
        if "--viterbi-worker" in a:
            return [{"viterbi_mbps": pick(vit_seq, "vit"),
                     "mode": "exact", "batch": int(a[2])}]
        if "bench_fleet" in a[0]:
            rt = pick(fleet_seq, "fleet")
            streams = int(a[a.index("--streams") + 1])
            calls.setdefault("fleet_streams", []).append(streams)
            return [{"mode": "fused-resident", "realtime_ensembles": rt,
                     "access_units": 100, "streams": streams},
                    {"mode": "fused-ingest", "realtime_ensembles": 6.5,
                     "access_units": 100, "streams": streams}]
        return []

    m._run_sub = fake_run_sub
    m.time = types.SimpleNamespace(time=time.time, sleep=lambda s: None)
    return calls


def test_bench_semi_degraded_window_recovers():
    m = _load_bench(budget_s=900, overtime_s=1800)
    calls = _stub(m, demod_seq=[120.0, 1450.0], vit_seq=[21.0, 175.0],
                  fleet_seq=[6.9, 70.2])
    last = _run_main(m)[-1]
    assert last["value"] >= m.DEMOD_FLOOR
    assert last["viterbi_mbps"] >= m.VITERBI_FLOOR
    assert last["fleet_resident_rt"] >= m.FLEET_FLOOR
    assert "degraded" not in last.get("note", "")
    assert calls["demod"] >= 2 and calls["fleet"] >= 2 and calls["vit"] >= 2


def test_bench_permanently_degraded_window_notes_and_terminates():
    # overtime wall barely past the 240 s loop guard: the loop must exit
    # promptly and the final record must say the window was degraded
    m = _load_bench(budget_s=60, overtime_s=250)
    _stub(m, demod_seq=[120.0], vit_seq=[21.0], fleet_seq=[6.9])
    t0 = time.time()
    last = _run_main(m)[-1]
    assert time.time() - t0 < 60
    assert last["value"] == 120.0            # best-so-far still recorded
    assert "degraded-window record" in last.get("note", "")


def test_bench_healthy_window_untouched():
    m = _load_bench(budget_s=900, overtime_s=1800)
    calls = _stub(m, demod_seq=[1500.0], vit_seq=[175.5], fleet_seq=[70.0])
    last = _run_main(m)[-1]
    assert last["value"] == 1500.0 and last["viterbi_mbps"] == 175.5
    assert last["fleet_resident_rt"] == 70.0
    assert "note" not in last and "error" not in last
    # the healthy-window ladder runs exactly the 16/32/8 rungs, and no
    # healthy metric is re-run in overtime
    assert calls["fleet_streams"] == [16, 32, 8]
    assert calls["vit"] == 1


def test_bench_small_rung_success_does_not_suppress_full_rung():
    """r04 VERDICT weak #2: the old FLEET_FLOOR short-circuit let an early
    8-stream success (52.99 rt) permanently block the 16-stream rung and
    the driver record regressed vs r03. Pin: in a slow window where the
    warm-up rung lands first, the full-size rung is STILL attempted, and
    the headline comes from it."""
    m = _load_bench(budget_s=900, overtime_s=1800)
    # demod returns 0 first -> slow_window branch (8-rung runs first)
    calls = _stub(m, demod_seq=[0.0, 1450.0], vit_seq=[175.0],
                  fleet_seq=[52.99, 80.45])

    def fake_run_sub(args, timeout, _orig=m._run_sub):
        a = [str(x) for x in args]
        if "--worker" in a:      # demod worker: fail first (slow window)
            calls["demod"] += 1
            if calls["demod"] == 1:
                return []
            return [{"batch": 128, "iters": 30, "sync": "fetch_verified",
                     "msps": 1450.0}]
        return _orig(args, timeout)

    m._run_sub = fake_run_sub
    last = _run_main(m)[-1]
    assert 16 in calls["fleet_streams"], \
        "full-size rung was never attempted after the small rung landed"
    assert last["fleet_resident_rt"] == 80.45    # headline = 16-stream rung
    assert last["fleet_streams"] == 16
    assert "fleet_resident_note" not in last


def test_bench_headline_annotated_when_only_small_rung_lands():
    """If the full-size rung never completes, the record must say so
    explicitly instead of silently presenting the warm-up number."""
    m = _load_bench(budget_s=900, overtime_s=250)
    calls = _stub(m, demod_seq=[1450.0], vit_seq=[175.0], fleet_seq=[52.99])

    def fake_run_sub(args, timeout, _orig=m._run_sub):
        a = [str(x) for x in args]
        if "bench_fleet" in a[0]:
            streams = int(a[a.index("--streams") + 1])
            if streams >= 16:
                calls.setdefault("fleet_streams", []).append(streams)
                return []                 # full-size rung times out
        return _orig(args, timeout)

    m._run_sub = fake_run_sub
    last = _run_main(m)[-1]
    assert last["fleet_resident_rt"] == 52.99
    assert last["fleet_streams"] == 8
    assert "partial window" in last.get("fleet_resident_note", "")


@pytest.fixture(autouse=True)
def _restore_env():
    saved = {k: os.environ.get(k)
             for k in ("BENCH_BUDGET_S", "BENCH_OVERTIME_S")}
    yield
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v


def test_bench_records_and_window_health():
    """Round-4 provenance fields: the final record carries per-metric raw
    measurement lists (replication evidence) and a window_health
    classification a reader can trust at a glance."""
    m = _load_bench(budget_s=900, overtime_s=1800)
    _stub(m, demod_seq=[1500.0, 1480.0], vit_seq=[175.5], fleet_seq=[70.0])
    last = _run_main(m)[-1]
    assert last["window_health"] == "healthy"
    recs = last["records"]
    assert recs["demod_msps"] and recs["viterbi_mbps"]
    # one entry per rung (16/32/8), each tagged with its stream count
    assert recs["fleet_resident_rt"] == [70.0, 70.0, 70.0]
    assert recs["fleet_resident_streams"] == [16, 32, 8]
    assert recs["fleet_ingest_rt"] == [6.5, 6.5, 6.5]
    assert last["value"] in recs["demod_msps"]

    # semi-degraded: values landed but below floors -> classified as such
    m2 = _load_bench(budget_s=60, overtime_s=250)
    _stub(m2, demod_seq=[120.0], vit_seq=[21.0], fleet_seq=[6.9])
    last2 = _run_main(m2)[-1]
    assert last2["window_health"] == "semi-degraded"
    assert 120.0 in last2["records"]["demod_msps"]
