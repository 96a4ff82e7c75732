"""BER-vs-SNR sweep: closed-loop modulator -> AWGN/CFO channel -> demodulator.

The quantitative version of the reference's manual stress tests
(simulate_transmitter + apply_frequency_shift, SURVEY.md §4.5-4.6): measures
raw hard-decision BER at the demodulator output and post-Viterbi BER through
the FIC decode across an SNR range. Prints a CSV table.
"""

import argparse
import sys

import numpy as np
import jax.numpy as jnp

from ..models import OFDMModulator, OFDMDemodulator
from ..models.demodulator import StreamingDemodulator


def run_point(mode: int, snr_db: float, cfo_hz: float, nb_frames: int,
              seed: int = 0):
    mod = OFDMModulator(mode)
    demod = OFDMDemodulator(mode)
    rng = np.random.default_rng(seed)
    p = mod.params
    bits = rng.integers(0, 2, size=(nb_frames, p.nb_data_symbols,
                                    2 * p.nb_data_carriers)).astype(np.uint8)
    iq = np.asarray(mod.modulate_stream(jnp.asarray(bits)))

    sig_pow = float(np.mean(np.abs(iq[p.nb_frame_samples // 2:
                                      p.nb_frame_samples]) ** 2))
    noise_std = np.sqrt(sig_pow / 10 ** (snr_db / 10) / 2)
    noise = (rng.normal(0, noise_std, iq.shape)
             + 1j * rng.normal(0, noise_std, iq.shape)).astype(np.complex64)
    x = iq + noise
    if cfo_hz:
        f = cfo_hz / 2.048e6
        x = (x * np.exp(2j * np.pi * f * np.arange(x.shape[0]))
             ).astype(np.complex64)
    lead = (rng.normal(0, noise_std, 20000)
            + 1j * rng.normal(0, noise_std, 20000)).astype(np.complex64)
    tail = np.zeros(2 * p.nb_frame_samples, np.complex64)

    sd = StreamingDemodulator(demod)
    frames = sd.process(np.concatenate([lead, x, tail]))

    errs = total = 0
    for k, soft in enumerate(frames[: nb_frames]):
        hard = (np.asarray(soft) > 0).astype(np.uint8)
        ref = bits[k].reshape(-1)
        errs += int((hard != ref).sum())
        total += ref.size
    return {
        "snr_db": snr_db,
        "locked_frames": len(frames),
        "raw_ber": errs / total if total else 1.0,
        "desync": int(sd.carry.total_desync),
    }
from ..utils.backend import add_backend_flag, apply_backend


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-M", "--transmission-mode", type=int, default=1)
    ap.add_argument("--snr", default="0,3,6,9,12,15,20",
                    help="comma-separated SNR points (dB)")
    ap.add_argument("--cfo", type=float, default=0.0, help="CFO in Hz")
    ap.add_argument("-n", "--nb-frames", type=int, default=4)
    add_backend_flag(ap)
    args = ap.parse_args(argv)
    apply_backend(args)

    print("snr_db,locked_frames,raw_ber,desync")
    for snr in [float(s) for s in args.snr.split(",")]:
        r = run_point(args.transmission_mode, snr, args.cfo, args.nb_frames)
        print(f"{r['snr_db']},{r['locked_frames']},{r['raw_ber']:.6f},"
              f"{r['desync']}")
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
