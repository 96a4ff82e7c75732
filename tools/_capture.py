"""Shared synthetic-capture cache for the bench drivers.

One canonical implementation of "synthesize a decodable ensemble via
simulate_transmitter on the CPU backend and cache it in /tmp" — the
cache filename IS the contract (bench_fleet, bench_stages and
bench_consume all read/write the same namespace, so the transmitter
flags and the key must change together)."""

import os
import subprocess
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_capture(services: int, frames: int, fmt: str = "u8") -> np.ndarray:
    """Cached u8 (or c64) IQ of `frames` mode-I frames of a
    `services`-service tone-audio ensemble (the bench_fleet capture)."""
    cache = os.path.join(tempfile.gettempdir(),
                         f"bench_fleet_iq_s{services}_f{frames}.{fmt}")
    if not os.path.exists(cache):
        r = subprocess.run(
            [sys.executable, "-m",
             "dab_radio_tpu.apps.simulate_transmitter", "--backend", "cpu",
             "--payload", "ensemble", "--services", str(services),
             "-n", str(frames), "-F", "u8" if fmt == "u8" else "f32"],
            capture_output=True, cwd=ROOT)
        assert r.returncode == 0, r.stderr.decode()[-500:]
        with open(cache, "wb") as f:
            f.write(r.stdout)
    return np.fromfile(cache,
                       dtype=np.uint8 if fmt == "u8" else np.complex64)
