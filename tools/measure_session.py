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
    # ---- round-5 ladder, decisive stages first (windows degrade) ----
    # 1. the official bench record (per-rung fleet records + the
    #    32-stream scaling rung are inside bench.py now)
    run_stage("bench", [py, os.path.join(ROOT, "bench.py")], 1100, args.log)
    # 2. THE round-5 decision data: per-stage ablation of the fused round
    #    (where do the ~330 ms go?). Core rungs first — demod vs forward
    #    ACS vs the full program (full-acs = chainback+descramble+pack).
    run_stage("stages-core",
              [py, stages_tool, "--streams", "16", "--frames-per-step",
               "16", "--rounds", "5", "--stages", "rtt,demod,acs,full"],
              1500, args.log)
    # 3. batch-scaling hypothesis: per-frame step time looked
    #    batch-independent between the batch-128 demod ladder and the
    #    16-stream fleet — if true, resident rt scales with streams and
    #    32 streams is the 2x VERDICT target in one move.
    run_stage("fleet-resident-32",
              [py, fleet, "--fused", "--resident", "--streams", "32",
               "--frames", "160", "--frames-per-step", "16"], 1500, args.log)
    # 4. replication rung: 16-stream resident (host consume target <0.5 s
    #    needs a 2nd window; r4's two windows measured 0.878 and 0.444).
    #    The resident record now carries consume_diag (per-round times +
    #    ctx-switch/fault counters + cpu-vs-wall) so a slow consume says
    #    why; the standalone rung right after it is the SAME-WINDOW
    #    baseline VERDICT #4 asks for (CPU-only: forces jax_platforms=cpu
    #    internally, no relay dependence).
    run_stage("fleet-resident",
              [py, fleet, "--fused", "--resident", "--streams", "16",
               "--frames", "160", "--frames-per-step", "16"], 900, args.log)
    run_stage("consume-standalone",
              [py, os.path.join(HERE, "bench_consume.py")], 700, args.log)
    # 5. remaining ablation rungs (ingest/subs/deint/depunct deltas)
    run_stage("stages-rest",
              [py, stages_tool, "--streams", "16", "--frames-per-step",
               "16", "--rounds", "5",
               "--stages", "ingest,subs,deint,depunct"], 1500, args.log)
    # 6. demod batch scaling through the SAME fused-demod program shape
    #    (not the ladder's standalone step): 32-stream demod-only rung
    run_stage("stages-demod-32",
              [py, stages_tool, "--streams", "32", "--frames-per-step",
               "16", "--rounds", "4", "--stages", "demod"], 1200, args.log)
    # 7. Viterbi record + the speed-of-light batch rung (docs/PERF.md
    #    roofline: is 308-317 Mbit/s lane-bound? B=32768 doubles lanes)
    run_stage("viterbi", [py, os.path.join(ROOT, "bench.py"),
                          "--viterbi-worker", "16384", "8", "exact", "3"],
              600, args.log)
    run_stage("viterbi-32768", [py, os.path.join(ROOT, "bench.py"),
                                "--viterbi-worker", "32768", "6", "exact",
                                "3"], 700, args.log)
    run_stage("viterbi-lut", [py, os.path.join(ROOT, "bench.py"),
                              "--viterbi-worker", "16384", "8", "lut", "3"],
              600, args.log)
    # 8. second-window A/B replication for the round-4 levers (each has
    #    exactly one healthy-window record; VERDICT #5)
    run_stage("latency-exact-sequential",
              [py, fleet, "--fused", "--latency", "--streams", "16",
               "--frames", "84", "--frames-per-step", "16"], 700, args.log)
    run_stage("latency-exact-fused",
              [py, fleet, "--fused", "--latency", "--streams", "16",
               "--frames", "84", "--frames-per-step", "16",
               "--chainback", "fused"], 700, args.log)
    run_stage("fleet-resident-blocktracking",
              [py, fleet, "--fused", "--resident", "--streams", "16",
               "--frames", "160", "--frames-per-step", "16",
               "--block-tracking"], 900, args.log)
    run_stage("fleet-resident-nofusefic",
              [py, fleet, "--fused", "--resident", "--streams", "16",
               "--frames", "160", "--frames-per-step", "16",
               "--no-fuse-fic"], 900, args.log)
    run_stage("fleet-resident-lutbranch",
              [py, fleet, "--fused", "--resident", "--streams", "16",
               "--frames", "160", "--frames-per-step", "16",
               "--viterbi-branch", "lut"], 900, args.log)
    run_stage("fleet-resident-k32",
              [py, fleet, "--fused", "--resident", "--streams", "16",
               "--frames", "200", "--frames-per-step", "32"], 1200, args.log)
    run_stage("fleet-resident-mindepth",
              [py, fleet, "--fused", "--resident", "--streams", "16",
               "--frames", "160", "--frames-per-step", "16",
               "--block-tracking", "--viterbi", "tiled",
               "--chainback", "fused"], 900, args.log)
    # 9. the batch-256 demod rung: the worker now emits a compile-
    #    provenance line before timing, so even a timeout documents the
    #    compile cost (r3/r4 rc=124 were opaque); one long attempt
    run_stage("demod-256",
              [py, os.path.join(ROOT, "bench.py"), "--worker", "256", "15",
               "19"], 1100, args.log)
    # 10. compute/H2D overlap on the real link (now with the unclamped
    #     hidden-ratio alongside the clamped efficiency)
    run_stage("ingest-overlap",
              [py, fleet, "--fused", "--overlap", "--streams", "16",
               "--frames", "160", "--frames-per-step", "16"], 900, args.log)
    print(f"# measurement session complete -> {args.log}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
