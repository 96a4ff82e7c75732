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
