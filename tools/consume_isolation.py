"""Isolate why host consume measures 2-3x slower INSIDE the fleet bench
than in the standalone replay (round-4 VERDICT #4: 0.88-1.71 s in-fleet
vs 0.41-0.55 s standalone for the same 2,304 stream-frames on the same
1-core host).

The byte layer is pure host work (numpy RS + native CRC + Python
superframe machines — no device dispatch), so the in-fleet inflation
must come from the PROCESS STATE the fleet bench runs under, not the
work itself. This tool separates the candidates:

  capture : (CPU backend) run the real fused program for R rounds and
            save the packed (fib, msc) host arrays to an npz — the
            exact consume input the serving bench uses.
  replay  : load the npz and replay _consume rep-by-rep in a fresh
            process, printing EVERY rep (not best-of). Flags toggle the
            candidate contaminants:
              --backend axon  : initialize the TPU relay client first
                                (tunnel/keepalive threads share the one
                                core — the fleet bench always has these)
              --ballast       : hold ~R rounds of fetched arrays live on
                                the heap (the resident bench's deferred
                                `fetched` list) to expose GC/paging cost
              --gc-off        : disable the cyclic GC during reps

Verdict lives in docs/NOTES_r5.md + MEASUREMENTS.jsonl (stage
consume-isolation). Usage:
    python tools/consume_isolation.py capture
    python tools/consume_isolation.py replay --backend cpu --reps 6
    timeout 600 python tools/consume_isolation.py replay --backend axon
"""

import argparse
import gc
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

NPZ = os.path.join("/tmp", "consume_rounds.npz")


def capture(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_consume", os.path.join(ROOT, "tools", "bench_consume.py"))
    bc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bc)
    from dab_radio_tpu.models.fused_fleet import FusedFleet
    from dab_radio_tpu.params import SubchannelConfig

    N, K, S = args.streams, args.frames_per_step, args.services
    iq = bc.make_capture(K * (args.rounds + 1) + 3, S)
    cfgs = [SubchannelConfig(s * 48, 48, False, eep_type="A",
                             eep_prot_level=2) for s in range(S)]
    fleet = FusedFleet(N, cfgs, transmission_mode=1, frames_per_step=K)
    chunk = 2 * fleet.round_samples
    tb = fleet.tail_bytes
    fibs, mscs = [], []
    for r in range(min(args.rounds, iq.shape[0] // chunk - 1)):
        blk = np.tile(iq[r * chunk:(r + 1) * chunk][None], (N, 1))
        t = iq[(r + 1) * chunk:(r + 1) * chunk + tb]
        tail = jnp.asarray(np.tile(t[None], (N, 1))) \
            if t.shape[0] == tb else None
        fleet._carry, fleet._hist, out = fleet.step(
            fleet._carry, fleet._hist, jnp.asarray(blk), tail)
        fib, msc, _ = fleet._pack(out)
        fibs.append(np.asarray(fib))
        mscs.append(np.asarray(msc))
    np.savez(NPZ, fib=np.stack(fibs), msc=np.stack(mscs),
             meta=np.array([N, K, S,
                            fleet.step.msc_nb_data_bits[0]], np.int64))
    print(f"# captured {len(fibs)} rounds -> {NPZ}", file=sys.stderr)
    return 0


def replay(args):
    import jax
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    t0 = time.time()
    dev = jax.devices()[0]
    # a tiny jit round-trip: makes sure the backend's client threads
    # (for axon: the relay tunnel) are fully up before we time host work
    x = float(jax.jit(lambda a: (a * a).sum())(jax.numpy.ones(64)))
    assert x == 64.0
    init_s = time.time() - t0

    z = np.load(NPZ)
    fib, msc = z["fib"], z["msc"]
    N, K, S, nbytes_bits = (int(v) for v in z["meta"])

    # byte-layer-only FusedFleet: stub out the device program (replay
    # never calls step); msc_nb_data_bits comes from the capture
    from dab_radio_tpu.models import fused_fleet as ff
    from dab_radio_tpu.parallel import mesh as mesh_mod
    from dab_radio_tpu.params import SubchannelConfig

    class _StubStep:
        per_stream = False
        msc_nb_data_bits = [nbytes_bits] * S

        def __call__(self, *a, **k):
            raise AssertionError("replay must not run the device step")

    real = mesh_mod.multichip_receiver_step
    mesh_mod.multichip_receiver_step = lambda *a, **k: (
        _StubStep(), (None, None, None))
    try:
        cfgs = [SubchannelConfig(s * 48, 48, False, eep_type="A",
                                 eep_prot_level=2) for s in range(S)]
        fleet = ff.FusedFleet(N, cfgs, transmission_mode=1,
                              frames_per_step=K)
    finally:
        mesh_mod.multichip_receiver_step = real

    ballast = []
    if args.ballast:
        # what the resident bench's deferred `fetched` list holds during
        # its consume phase: every round's fetched arrays, live
        ballast = [(fib[r].copy(), msc[r].copy())
                   for r in range(fib.shape[0])] * 4

    if args.gc_off:
        gc.disable()
    reps = []
    aus = 0
    for rep in range(args.reps):
        fleet.receivers = [type(fleet.receivers[0])(fleet._mode)
                           for _ in range(N)]
        fleet._sfp = fleet._make_procs()
        fleet.total_aus = 0
        t0 = time.time()
        for r in range(fib.shape[0]):
            fleet._consume(fib[r], msc[r])
        reps.append(round(time.time() - t0, 3))
        aus = fleet.total_aus
        print(f"# rep {rep}: {reps[-1]:.3f}s", file=sys.stderr, flush=True)
    gc.enable()
    rec = {
        "metric": "consume_isolation",
        "backend": args.backend,
        "backend_init_s": round(init_s, 1),
        "device": str(dev),
        "ballast": bool(ballast),
        "gc_off": args.gc_off,
        "stream_frames": N * K * fib.shape[0],
        "rep_seconds": reps,
        "median_s": round(float(np.median(reps)), 3),
        "best_s": min(reps),
        "worst_s": max(reps),
        "aus": int(aus),
    }
    print(json.dumps(rec), flush=True)
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("cmd", choices=["capture", "replay"])
    ap.add_argument("--streams", type=int, default=16)
    ap.add_argument("--frames-per-step", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=9)
    ap.add_argument("--services", type=int, default=2)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--backend", default="cpu", choices=["cpu", "axon"])
    ap.add_argument("--ballast", action="store_true")
    ap.add_argument("--gc-off", action="store_true")
    args = ap.parse_args(argv)
    return capture(args) if args.cmd == "capture" else replay(args)


if __name__ == "__main__":
    sys.exit(main())
