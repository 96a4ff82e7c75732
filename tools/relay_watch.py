"""Relay recovery watcher: poll TPU health with a STRICT probe and fire
tools/measure_session.py on the first genuinely healthy window.

measure_session's own probe accepts any jit+fetch under 150 s, which a
semi-degraded relay (e.g. 70 s fetches) passes — producing junk-inflated
timings. This watcher requires the strict criterion twice in a row
(compile+run+fetch of a small matmul under --strict-s seconds, default
20) before launching the ladder, then exits. Intended to run in the
background for a whole work session:

    python tools/relay_watch.py --interval 600 &

Each probe result is appended to the log so the session leaves a health
timeline even if no healthy window ever appears.
"""

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

PROBE = (
    "import time,jax,jax.numpy as jnp;"
    "t0=time.time();"
    "f=jax.jit(lambda x:(x@x).sum());"
    "r=float(f(jnp.ones((256,256))));"
    "print('PROBE_S=%.1f'%(time.time()-t0))"
)


def probe_once(strict_s, timeout):
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return False, timeout
    took = time.time() - t0
    ok = r.returncode == 0 and "PROBE_S=" in r.stdout
    if not ok:
        return False, took
    # the in-process number excludes interpreter+jax import startup
    inner = float(r.stdout.split("PROBE_S=")[1].split()[0])
    return inner <= strict_s, inner


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--interval", type=int, default=600,
                    help="seconds between probes")
    ap.add_argument("--strict-s", type=float, default=20.0,
                    help="in-process jit+fetch must finish within this")
    ap.add_argument("--probe-timeout", type=int, default=150)
    ap.add_argument("--max-hours", type=float, default=2.0)
    ap.add_argument("--log", default=os.path.join(ROOT, "docs",
                                                  "MEASUREMENTS.jsonl"))
    args = ap.parse_args(argv)

    deadline = time.time() + args.max_hours * 3600
    streak = 0
    while time.time() < deadline:
        ok, took = probe_once(args.strict_s, args.probe_timeout)
        with open(args.log, "a") as f:
            f.write(json.dumps({"stage": "watch-probe", "healthy": ok,
                                "probe_s": round(took, 1),
                                "ts": time.time()}) + "\n")
        print(f"# watch-probe healthy={ok} {took:.1f}s", file=sys.stderr,
              flush=True)
        streak = streak + 1 if ok else 0
        if streak >= 2:
            print("# healthy window confirmed - running measurement "
                  "session", file=sys.stderr, flush=True)
            rc = subprocess.call(
                [sys.executable, os.path.join(HERE, "measure_session.py"),
                 "--log", args.log])
            return rc
        # second confirmation probe quickly after a first success
        time.sleep(30 if streak == 1 else args.interval)
    print("# watcher expired without a healthy window", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
