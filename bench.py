"""Benchmark: Mode-I OFDM demodulation throughput per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The metric is sustained mode-I demod throughput (sync search + CFO correction
+ 77x2048 FFT + DQPSK + deinterleave + int8 soft demap per frame) in
Msamples/s on one chip at the best batch size. Baseline: the reference's
implicit SLO of real-time decode at 2.048 MSPS per stream (BASELINE.md), so
vs_baseline = concurrent real-time mode-I ensembles per chip.

The axon TPU backend is intermittently flaky (UNIMPLEMENTED on some
compiles/transfers); every stage retries and the bench falls back to smaller
batches if a configuration repeatedly fails.
"""

import json
import sys
import time

import numpy as np

BASELINE_MSPS = 2.048   # real-time rate of one ensemble (2.048 MSPS IQ)


def _bench_batch(demod, batch, n_iters=20, attempts=3):
    import jax
    import jax.numpy as jnp
    from dab_radio_tpu.models.demodulator import DemodCarry

    rng = np.random.default_rng(0)
    win = (rng.normal(0, 0.5, (batch, demod.window_len))
           + 1j * rng.normal(0, 0.5, (batch, demod.window_len))
           ).astype(np.complex64)
    for attempt in range(attempts):
        try:
            wins = jax.device_put(jnp.asarray(win))
            carry = DemodCarry.init((batch,))
            step = demod.frame_step_batch
            carry, out = step(carry, wins)
            jax.block_until_ready(out["bits"])
            # warmup
            for _ in range(3):
                carry, out = step(carry, wins)
            jax.block_until_ready(out["bits"])
            t0 = time.time()
            for _ in range(n_iters):
                carry, out = step(carry, wins)
            jax.block_until_ready(out["bits"])
            dt = (time.time() - t0) / n_iters
            samples = batch * demod.params.nb_frame_samples
            return samples / dt / 1e6
        except Exception as e:
            print(f"# batch={batch} attempt={attempt} failed: {str(e)[:90]}",
                  file=sys.stderr)
            time.sleep(2)
    return None


def main():
    import jax
    from dab_radio_tpu.models.demodulator import OFDMDemodulator

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    demod = OFDMDemodulator(1)

    best = 0.0
    best_batch = 0
    for batch in (32, 64, 16, 128, 8, 1):
        msps = _bench_batch(demod, batch)
        if msps is not None:
            print(f"# batch={batch}: {msps:.1f} Msamples/s", file=sys.stderr)
            if msps > best:
                best, best_batch = msps, batch
            # stop early once a larger batch stops helping
            if best_batch != batch and best > msps:
                break

    if best == 0.0:
        print(json.dumps({"metric": "mode1_ofdm_demod_throughput",
                          "value": 0.0, "unit": "Msamples/s/chip",
                          "vs_baseline": 0.0, "error": "all configs failed"}))
        return

    print(json.dumps({
        "metric": "mode1_ofdm_demod_throughput",
        "value": round(best, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(best / BASELINE_MSPS, 2),
        "batch": best_batch,
    }))


if __name__ == "__main__":
    main()
