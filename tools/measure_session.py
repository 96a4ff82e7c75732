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
    rec = {"stage": name, "rc": rc, "seconds": round(time.time() - t0, 1),
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
    # 2. the official bench record (emits incrementally; 900 s budget)
    run_stage("bench", [py, os.path.join(ROOT, "bench.py")], 1100, args.log)
    # 3. Viterbi sanity: packed-min ACS must hold the ~175 Mbit/s record
    run_stage("viterbi", [py, os.path.join(ROOT, "bench.py"),
                          "--viterbi-worker", "16384", "8", "exact", "3"],
              600, args.log)
    # 4. serving latency ladder: the sequential-depth lever matrix.
    #    exact/tiled x sequential/parallel was measured twice in healthy
    #    windows (2026-08-19, MEASUREMENTS.jsonl): parallel chainback is
    #    15-50x SLOWER on this chip at B=16 streams (the O(T log T)
    #    gather volume dominates), so the matrix now prioritises the
    #    register-exchange 'fused' chainback instead and keeps one
    #    parallel point for provenance.
    for vit, cb in (("exact", "sequential"), ("exact", "fused"),
                    ("tiled", "sequential"), ("tiled", "fused"),
                    ("exact", "parallel")):
        run_stage(f"latency-{vit}-{cb}",
                  [py, os.path.join(HERE, "bench_fleet.py"), "--fused",
                   "--latency", "--streams", "16", "--frames", "84",
                   "--frames-per-step", "16", "--viterbi", vit,
                   "--chainback", cb], 700, args.log)
    # 5. resident fleet (chip-bound throughput with today's round changes)
    #    + the round-4 A/B levers: block-tracking demod, separate-FIC
    run_stage("fleet-resident",
              [py, os.path.join(HERE, "bench_fleet.py"), "--fused",
               "--resident", "--streams", "16", "--frames", "160",
               "--frames-per-step", "16"], 900, args.log)
    run_stage("fleet-resident-blocktracking",
              [py, os.path.join(HERE, "bench_fleet.py"), "--fused",
               "--resident", "--streams", "16", "--frames", "160",
               "--frames-per-step", "16", "--block-tracking"], 900, args.log)
    run_stage("fleet-resident-nofusefic",
              [py, os.path.join(HERE, "bench_fleet.py"), "--fused",
               "--resident", "--streams", "16", "--frames", "160",
               "--frames-per-step", "16", "--no-fuse-fic"], 900, args.log)
    # 5b. the minimum-sequential-depth stack (block-tracked demod +
    #     tiled Viterbi + register-exchange chainback): if the fused
    #     round is iteration-bound as the roofline analysis says
    #     (docs/PERF.md: ~40x under the compute/HBM roofline at ~2900
    #     scan iterations), this config's ~15x depth cut is the
    #     experiment that shows the new ceiling. AU-stream parity with
    #     the host path is pinned by test_fused_fleet_mode_2_serving.
    run_stage("fleet-resident-mindepth",
              [py, os.path.join(HERE, "bench_fleet.py"), "--fused",
               "--resident", "--streams", "16", "--frames", "160",
               "--frames-per-step", "16", "--block-tracking",
               "--viterbi", "tiled", "--chainback", "fused"], 900, args.log)
    run_stage("latency-mindepth",
              [py, os.path.join(HERE, "bench_fleet.py"), "--fused",
               "--latency", "--streams", "16", "--frames", "84",
               "--frames-per-step", "16", "--block-tracking",
               "--viterbi", "tiled", "--chainback", "fused"], 700, args.log)
    # 6. the batch-256 demod rung (timed out in the r03 driver run)
    run_stage("demod-256",
              [py, os.path.join(ROOT, "bench.py"), "--worker", "256", "15",
               "19"], 700, args.log)
    # 7. compute/H2D overlap on the real link (feeder architecture proof)
    run_stage("ingest-overlap",
              [py, os.path.join(HERE, "bench_fleet.py"), "--fused",
               "--overlap", "--streams", "16", "--frames", "160",
               "--frames-per-step", "16"], 900, args.log)
    print(f"# measurement session complete -> {args.log}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
