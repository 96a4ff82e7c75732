"""One-shot TPU measurement session: run every relay-dependent benchmark
in priority order while a healthy window lasts, appending each result line
to a log as it lands (a window can degrade mid-session — partial results
must survive, same philosophy as bench.py).

Order: health probe (abort fast if degraded) -> bench.py (the official
record shape) -> Viterbi sanity -> serving latency ladder (the
exact/tiled x sequential/parallel lever matrix) -> resident fleet.

Usage:  python tools/measure_session.py [--log docs/MEASUREMENTS.jsonl]
Exit 0 if the probe passed (even if later stages timed out; the log says
which landed).
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

# session id: re-runs of the same stage across sessions stay
# distinguishable when indexing records by stage name (round-4 ADVICE:
# two 'fleet-resident' rows were ambiguous)
SESSION = time.strftime("%m%d-%H%M")


PROBE_CODE = ("import time,jax,jax.numpy as jnp;t0=time.time();"
              "f=jax.jit(lambda x:(x@x).sum());"
              "r=float(f(jnp.ones((256,256))));"
              "print('PROBE_S=%.1f'%(time.time()-t0))")


def window_alive(strict_s=25.0, timeout=90):
    """Cheap strict re-probe between ladder stages: a window that died
    mid-session must not burn the remaining stages' full timeouts on
    link-dominated junk (the supervisor re-arms the watcher for the next
    window, which replicates better than grinding this one)."""
    try:
        r = subprocess.run([sys.executable, "-c", PROBE_CODE],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return False
    if r.returncode != 0 or "PROBE_S=" not in r.stdout:
        return False
    return float(r.stdout.split("PROBE_S=")[1].split()[0]) <= strict_s


def run_stage(name, cmd, timeout, log):
    t0 = time.time()
    print(f"# stage {name}: {' '.join(cmd)}", file=sys.stderr, flush=True)
    try:
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout, cwd=ROOT)
        rc = r.returncode
        out = r.stdout
    except subprocess.TimeoutExpired as e:
        rc = 124
        out = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) \
            else (e.stdout or "")
    lines = [ln for ln in out.splitlines() if ln.startswith("{")]
    rec = {"stage": name, "session": SESSION, "rc": rc,
           "seconds": round(time.time() - t0, 1),
           "results": []}
    for ln in lines:
        try:
            rec["results"].append(json.loads(ln))
        except json.JSONDecodeError:
            pass
    with open(log, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(f"# stage {name}: rc={rc} {len(rec['results'])} result lines",
          file=sys.stderr, flush=True)
    return rec


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--log", default=os.path.join(ROOT, "docs",
                                                  "MEASUREMENTS.jsonl"))
    ap.add_argument("--probe-timeout", type=int, default=150)
    args = ap.parse_args(argv)

    # 1. health probe: trivial jit+fetch must return quickly
    probe = ("import time,jax,jax.numpy as jnp;t0=time.time();"
             "f=jax.jit(lambda x:(x@x).sum());"
             "r=float(f(jnp.ones((256,256))));"
             "print('probe ok %.1fs'%(time.time()-t0))")
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, text=True,
                           timeout=args.probe_timeout)
        healthy = r.returncode == 0 and "probe ok" in r.stdout
    except subprocess.TimeoutExpired:
        healthy = False
    with open(args.log, "a") as f:
        f.write(json.dumps({"stage": "probe", "healthy": healthy,
                            "ts": time.time()}) + "\n")
    if not healthy:
        print("# relay degraded - aborting measurement session",
              file=sys.stderr)
        return 1

    py = sys.executable
    fleet = os.path.join(HERE, "bench_fleet.py")
    stages_tool = os.path.join(HERE, "bench_stages.py")
    bench = os.path.join(ROOT, "bench.py")
    # ---- round-5 ladder, decisive stages first (windows degrade) ----
    # 1.  bench: the official record (per-rung fleet records + the
    #     32-stream scaling rung live inside bench.py)
    # 2.  stages-core: per-stage ablation of the fused round (rtt floor,
    #     demod vs forward ACS vs full; full-acs = chainback+descramble+
    #     pack) — THE round-5 decision data
    # 3.  fleet-resident-32: batch-scaling hypothesis (per-frame step
    #     time looked batch-independent; if true, rt ∝ streams)
    # 4.  fleet-resident + consume-standalone: replication rung + the
    #     SAME-WINDOW host-consume baseline (VERDICT #4); the resident
    #     record carries consume_diag so a slow consume says why
    # 5-6. stages-rest / stages-demod-32: remaining ablation deltas +
    #     demod batch scaling in the fused program shape
    # 7.  viterbi rungs incl. B=32768 lane sweep and the LUT roofline
    #     lever (docs/PERF.md speed-of-light)
    # 8.  second-window A/B replication for every round-4/5 lever
    # 9.  demod-256: now emits compile provenance even on timeout
    # 10. ingest-overlap on the real link (unclamped hidden-ratio)
    LADDER = [
        ("bench", [py, bench], 1100),
        ("stages-core",
         [py, stages_tool, "--streams", "16", "--frames-per-step", "16",
          "--rounds", "5", "--stages", "rtt,demod,acs,full"], 1500),
        ("fleet-resident-32",
         [py, fleet, "--fused", "--resident", "--streams", "32",
          "--frames", "160", "--frames-per-step", "16"], 1500),
        ("fleet-resident",
         [py, fleet, "--fused", "--resident", "--streams", "16",
          "--frames", "160", "--frames-per-step", "16"], 900),
        ("consume-standalone",
         [py, os.path.join(HERE, "bench_consume.py")], 700),
        ("stages-rest",
         [py, stages_tool, "--streams", "16", "--frames-per-step", "16",
          "--rounds", "5", "--stages", "ingest,subs,deint,depunct"], 1500),
        ("stages-demod-32",
         [py, stages_tool, "--streams", "32", "--frames-per-step", "16",
          "--rounds", "4", "--stages", "demod"], 1200),
        ("viterbi", [py, bench, "--viterbi-worker", "16384", "8", "exact",
                     "3"], 600),
        ("viterbi-32768", [py, bench, "--viterbi-worker", "32768", "6",
                           "exact", "3"], 700),
        ("viterbi-lut", [py, bench, "--viterbi-worker", "16384", "8",
                         "lut", "3"], 600),
        ("latency-exact-sequential",
         [py, fleet, "--fused", "--latency", "--streams", "16",
          "--frames", "84", "--frames-per-step", "16"], 700),
        ("latency-exact-fused",
         [py, fleet, "--fused", "--latency", "--streams", "16",
          "--frames", "84", "--frames-per-step", "16",
          "--chainback", "fused"], 700),
        ("fleet-resident-blocktracking",
         [py, fleet, "--fused", "--resident", "--streams", "16",
          "--frames", "160", "--frames-per-step", "16",
          "--block-tracking"], 900),
        ("fleet-resident-nofusefic",
         [py, fleet, "--fused", "--resident", "--streams", "16",
          "--frames", "160", "--frames-per-step", "16",
          "--no-fuse-fic"], 900),
        ("fleet-resident-lutbranch",
         [py, fleet, "--fused", "--resident", "--streams", "16",
          "--frames", "160", "--frames-per-step", "16",
          "--viterbi-branch", "lut"], 900),
        ("fleet-resident-radix8",
         [py, fleet, "--fused", "--resident", "--streams", "16",
          "--frames", "160", "--frames-per-step", "16",
          "--viterbi", "radix8"], 900),
        ("fleet-resident-k32",
         [py, fleet, "--fused", "--resident", "--streams", "16",
          "--frames", "200", "--frames-per-step", "32"], 1200),
        ("fleet-resident-mindepth",
         [py, fleet, "--fused", "--resident", "--streams", "16",
          "--frames", "160", "--frames-per-step", "16",
          "--block-tracking", "--viterbi", "tiled",
          "--chainback", "fused"], 900),
        ("demod-256", [py, bench, "--worker", "256", "15", "19"], 1100),
        ("ingest-overlap",
         [py, fleet, "--fused", "--overlap", "--streams", "16",
          "--frames", "160", "--frames-per-step", "16"], 900),
    ]
    # CPU-only stages run regardless of link health
    NO_RELAY = {"consume-standalone"}
    i = 0
    while i < len(LADDER):
        name, cmd, cap = LADDER[i]
        i += 1
        if i > 1 and name not in NO_RELAY:
            ok = window_alive()
            if not ok:
                print(f"# stage {name}: probe failed once - retrying "
                      "probe in 60 s", file=sys.stderr, flush=True)
                time.sleep(60)
                ok = window_alive()
            if not ok:
                with open(args.log, "a") as f:
                    f.write(json.dumps(
                        {"stage": "session-abort", "session": SESSION,
                         "reason": "window died mid-ladder",
                         "next_stage": name}) + "\n")
                print(f"# window died before stage {name} - aborting "
                      "session (supervisor re-arms)", file=sys.stderr)
                return 0
        rec = run_stage(name, cmd, cap, args.log)
        if name == "fleet-resident-32":
            # escalation: if 32 streams confirmed the batch-amortization
            # scaling (PERF.md predicts ~2x of the 72-80 rt 16-stream
            # band), double again — 64 streams would put the per-chip
            # headline near 300 rt. Compile risk is the only cost, so
            # gate on the confirmed prediction, not hope.
            rt32 = max((r.get("realtime_ensembles", 0.0)
                        for r in rec["results"]
                        if r.get("mode") == "fused-resident"), default=0.0)
            if rt32 >= 120.0:
                LADDER.insert(i, (
                    "fleet-resident-64",
                    [py, fleet, "--fused", "--resident", "--streams", "64",
                     "--frames", "160", "--frames-per-step", "16"], 1800))
    print(f"# measurement session complete -> {args.log}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
