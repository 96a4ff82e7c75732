"""End-to-end fleet benchmark: N concurrent mode-I ensembles, RF in ->
audio access units out, one chip.

The BASELINE.md north star is >=100 concurrent real-time ensembles
demodulated+decoded per chip. This harness runs the full receive chain —
MultiStreamDemodulator (batched frame steps) -> ReceiverFleet (FIC batched
across ensembles, MSC batched across every channel of every ensemble) ->
superframe/AU host layer — and reports the aggregate ingest rate as a
multiple of the 2.048 MSPS per-ensemble SLO.

Timing is honest by construction: every dispatch's decoded bits are fetched
back to host (the byte-protocol layers consume them), so the measurement
cannot be an enqueue-rate artifact even on the fire-and-forget relay.

Usage: python tools/bench_fleet.py --streams 16 --frames 20 [--backend cpu]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--services", type=int, default=2,
                    help="DAB+ services per ensemble")
    ap.add_argument("--backend", default="default",
                    choices=["default", "cpu", "tpu"])
    ap.add_argument("--pipeline-depth", type=int, default=2,
                    help="rounds of deferred host fetch (hides device latency)")
    ap.add_argument("--viterbi", default="exact", choices=["exact", "tiled"])
    ap.add_argument("--frames-per-step", type=int, default=1,
                    help="fuse K demod tracking steps per device dispatch")
    args = ap.parse_args(argv)
    if args.backend != "default":
        import jax
        jax.config.update("jax_platforms", args.backend)

    import numpy as np
    import jax
    if args.viterbi != "exact":
        from dab_radio_tpu.dab.msc import set_decode_mode
        set_decode_mode(args.viterbi)
    from dab_radio_tpu.models.demodulator import OFDMDemodulator
    from dab_radio_tpu.models.multistream import MultiStreamDemodulator
    from dab_radio_tpu.models.fleet import ReceiverFleet

    N, F = args.streams, args.frames
    print(f"# backend={jax.default_backend()} streams={N} frames={F}",
          file=sys.stderr)

    # one synthetic ensemble's IQ, replicated across streams (identical
    # decode work per stream; receivers keep independent state). Synthesis is
    # host tooling — run it on CPU in a subprocess (the accelerator relay is
    # slow for eager TX work) and cache the capture.
    import subprocess
    import tempfile
    cache = os.path.join(tempfile.gettempdir(),
                         f"bench_fleet_iq_s{args.services}_f{F + 3}.c64")
    t0 = time.time()
    if not os.path.exists(cache):
        r = subprocess.run(
            [sys.executable, "-m", "dab_radio_tpu.apps.simulate_transmitter",
             "--backend", "cpu", "--payload", "ensemble",
             "--services", str(args.services), "-n", str(F + 3), "-F", "f32"],
            capture_output=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert r.returncode == 0, r.stderr.decode()[-400:]
        with open(cache, "wb") as f:
            f.write(r.stdout)
    iq = np.fromfile(cache, dtype=np.complex64)
    print(f"# synth {F + 3} frames in {time.time() - t0:.1f}s", file=sys.stderr)

    demod = OFDMDemodulator(1)
    ms = MultiStreamDemodulator(demod, N,
                                frames_per_step=args.frames_per_step)
    fleet = ReceiverFleet(N, pipeline_depth=args.pipeline_depth)
    aus = [0] * N

    def attach(k):
        def on_channel(sub_id, ch):
            ch.events.on_access_unit.append(
                lambda i, n, au, hdr: aus.__setitem__(k, aus[k] + 1))
        fleet.receivers[k].on_audio_channel.append(on_channel)
    for k in range(N):
        attach(k)

    def feed_fleet(res):
        """step() may emit several frames per stream (frames_per_step>1);
        the fleet takes one frame per receiver per round."""
        rounds = {}
        for i, bits in res:
            rounds.setdefault(i, []).append(bits)
        for k in range(max(len(v) for v in rounds.values())):
            fleet.process_frames([(i, v[k]) for i, v in rounds.items()
                                  if len(v) > k])

    # warmup: acquire all streams + first frames (compiles everything)
    p = demod.params
    warm = 3 * p.nb_frame_samples + demod.window_len
    for k in range(N):
        ms.push(k, iq[:warm])
    t0 = time.time()
    for _ in range(16):
        res = ms.step()
        if res:
            feed_fleet(res)
        if all(ms.tracking) and ms.frames_emitted >= 2 * N:
            break
    print(f"# warmup {time.time() - t0:.1f}s tracking={int(ms.tracking.sum())}"
          f"/{N} frames={ms.frames_emitted}", file=sys.stderr)

    # steady state: feed the remaining frames and time the full chain
    feed = iq[warm:]
    chunk = p.nb_frame_samples
    nb_rounds = feed.shape[0] // chunk
    emitted0 = ms.frames_emitted
    t0 = time.time()
    for r in range(nb_rounds):
        blk = feed[r * chunk:(r + 1) * chunk]
        for k in range(N):
            ms.push(k, blk)
        res = ms.step()
        if res:
            feed_fleet(res)
    fleet.flush()
    dt = time.time() - t0
    frames_done = ms.frames_emitted - emitted0

    samples = frames_done * p.nb_frame_samples
    msps = samples / dt / 1e6
    rt = msps / 2.048
    result = {
        "metric": "fleet_end_to_end_throughput",
        "streams": N,
        "frames_decoded": frames_done,
        "seconds": round(dt, 3),
        "msps_aggregate": round(msps, 2),
        "realtime_ensembles": round(rt, 2),
        "channels": fleet.summary()["channels"],
        "access_units": int(sum(aus)),
    }
    print(json.dumps(result))
    assert sum(aus) > 0, "no audio decoded — benchmark not end-to-end"
    return 0


if __name__ == "__main__":
    sys.exit(main())
