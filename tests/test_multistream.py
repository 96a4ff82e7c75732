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
