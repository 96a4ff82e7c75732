"""Multi-stream batched demodulation: B streams with different content and
timing offsets all lock and decode bit-exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from dab_radio_tpu.models import OFDMModulator, OFDMDemodulator
from dab_radio_tpu.models.multistream import MultiStreamDemodulator


def test_multistream_locks_and_decodes():
    mode = 2
    mod = OFDMModulator(mode)
    demod = OFDMDemodulator(mode)
    B, F = 3, 4
    rng = np.random.default_rng(0)
    p = mod.params
    bits = rng.integers(0, 2, size=(B, F, p.nb_data_symbols,
                                    2 * p.nb_data_carriers)).astype(np.uint8)

    ms = MultiStreamDemodulator(demod, B)
    offsets = [0, 12345, 30011]
    for i in range(B):
        iq = np.asarray(mod.modulate_stream(jnp.asarray(bits[i])))
        lead = (rng.normal(0, 0.01, offsets[i])
                + 1j * rng.normal(0, 0.01, offsets[i])).astype(np.complex64)
        tail = np.zeros(2 * p.nb_frame_samples, np.complex64)
        ms.push(i, np.concatenate([lead, iq, tail]))

    got = {i: [] for i in range(B)}
    for idx, frame in ms.run_available():
        got[idx].append(frame)

    for i in range(B):
        assert len(got[i]) >= F - 1, f"stream {i} locked {len(got[i])} frames"
        # offsets < frame length: all streams start at their frame 0
        for k, frame in enumerate(got[i][:F]):
            hard = (frame > 0).astype(np.uint8)
            np.testing.assert_array_equal(
                hard, bits[i, k].reshape(-1), err_msg=f"stream {i} frame {k}")


def test_multistream_fused_frames():
    """frames_per_step>1 (vmapped frame_scan) emits the same frames as the
    single-step multistream."""
    from dab_radio_tpu.models.multistream import MultiStreamDemodulator
    from dab_radio_tpu.models import OFDMModulator, OFDMDemodulator
    import jax.numpy as jnp

    mod = OFDMModulator(1)
    demod = OFDMDemodulator(1)
    rng = np.random.default_rng(9)
    p = mod.params
    F = 7
    bits = rng.integers(0, 2, size=(F, p.nb_data_symbols,
                                    2 * p.nb_data_carriers)).astype(np.uint8)
    iq = np.asarray(mod.modulate_stream(jnp.asarray(bits)))
    iq = np.concatenate([iq, np.zeros(2 * p.nb_frame_samples, np.complex64)])

    def run(K):
        ms = MultiStreamDemodulator(demod, 2, frames_per_step=K)
        for i in range(2):
            ms.push(i, iq)
        got = {0: [], 1: []}
        for _ in range(30):
            res = ms.step()
            if not res and not any(
                    b.shape[0] >= demod.window_len for b in ms.bufs):
                break
            for i, fbits in res:
                got[i].append(np.asarray(fbits))
        return got

    a, b = run(1), run(3)
    for i in range(2):
        n = min(len(a[i]), len(b[i]))
        assert n >= 4
        for x, y in zip(a[i][:n], b[i][:n]):
            np.testing.assert_array_equal(x > 0, y > 0)


def test_u8_ingest_and_device_bits_match_c64():
    """u8 ingest (device-side dequantization) + fetch_bits=False (device-
    resident frame bits) must produce the same hard decisions as the c64
    host path — the transfer-optimised fleet configuration."""
    import jax
    from dab_radio_tpu.host.native import iq_quantize_u8
    mode = 2
    mod = OFDMModulator(mode)
    demod = OFDMDemodulator(mode)
    rng = np.random.default_rng(11)
    p = mod.params
    bits_tx = rng.integers(0, 2, (4, p.nb_data_symbols,
                                  2 * p.nb_data_carriers)).astype(np.uint8)
    iq = np.asarray(mod.modulate_stream(jnp.asarray(bits_tx)))
    iq = iq / (np.abs(iq).max() * 2.0)          # headroom like the apps
    lead = (rng.normal(0, 0.005, 1000)
            + 1j * rng.normal(0, 0.005, 1000)).astype(np.complex64)
    stream_c64 = np.concatenate([lead, iq])
    stream_u8 = np.frombuffer(iq_quantize_u8(stream_c64), np.uint8)
    # c64 reference path (u8 round trip so quantization noise matches)
    from dab_radio_tpu.host.native import iq_convert
    stream_rt = iq_convert(stream_u8.tobytes(), "u8")

    ms_a = MultiStreamDemodulator(demod, 2, frames_per_step=2)
    ms_b = MultiStreamDemodulator(demod, 2, frames_per_step=2,
                                  ingest="u8", fetch_bits=False)
    for k in range(2):
        ms_a.push(k, stream_rt)
        ms_b.push(k, stream_u8)
    got_a, got_b = [], []
    for _ in range(8):
        got_a.extend(ms_a.step())
        got_b.extend(ms_b.step())
    assert len(got_a) == len(got_b) >= 4
    for (ia, ba), (ib, bb) in zip(got_a, got_b):
        assert ia == ib
        a = np.asarray(ba)
        b = np.asarray(jax.device_get(bb))      # device-resident row
        np.testing.assert_array_equal(a > 0, b > 0)
