"""MSC subchannel decoder: CIF slice -> time deinterleave -> punctured
Viterbi -> energy-dispersal descramble.

Parity surface: reference src/dab/msc/msc_decoder.cpp + cif_deinterleaver.cpp.
The deinterleaver history is an explicit (16, nb_bits) carry and the Viterbi
runs on device; an encoder inverse (interleave + encode) supports closed-loop
tests and the ensemble transmitter.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import viterbi as vit
from ..ops.deinterleave import make_gather_index, deinterleave_push, DEPTH, CIF_OFFSETS
from ..ops.scrambler import prbs_bytes
from ..params import msc_puncture_schedule, SubchannelConfig
from ..params.puncture import build_puncture_mask

CU_BITS = 64


@functools.lru_cache(maxsize=None)
def _decoder_fns(cfg: SubchannelConfig):
    """Jitted per-CIF and per-frame decode steps, shared across all
    MSCDecoder instances with the same subchannel configuration (channels
    are recreated per run/ensemble; recompiling per instance would dominate
    startup at many-ensemble scale)."""
    spec = vit.ViterbiSpec.from_schedule(msc_puncture_schedule(cfg))
    gather_idx = jnp.asarray(make_gather_index(cfg.nb_cif_bits))

    @jax.jit
    def step(history, cif_soft):
        new_hist, deint = deinterleave_push(history, cif_soft, gather_idx)
        bits, err = vit.viterbi_decode(deint[..., :spec.nb_in], spec)
        return new_hist, bits, err

    @jax.jit
    def frame(history, cifs_soft):
        def body(hist, cif):
            new_hist, deint = deinterleave_push(hist, cif, gather_idx)
            return new_hist, deint[..., :spec.nb_in]

        history, deints = jax.lax.scan(body, history, cifs_soft)
        bits, err = vit.viterbi_decode(deints, spec)
        return history, bits, err

    return spec, step, frame


class MSCDecoder:
    """Streaming decoder for one subchannel (per-CIF)."""

    def __init__(self, cfg: SubchannelConfig):
        self.cfg = cfg
        self.nb_bits = cfg.nb_cif_bits
        self.spec, self._step, self._frame = _decoder_fns(cfg)
        self.history = jnp.zeros((DEPTH, self.nb_bits), jnp.int8)
        self.nb_pushed = 0

    def decode_cif(self, msc_soft_bits: np.ndarray):
        """msc_soft_bits: one CIF of soft bits (nb_cif_bits of the whole MSC).
        Returns decoded bytes (descrambled) or None while the deinterleaver
        is still filling."""
        start = self.cfg.start_address * CU_BITS
        sub = np.asarray(msc_soft_bits)[start:start + self.nb_bits]
        self.history, bits, err = self._step(self.history, jnp.asarray(sub))
        self.nb_pushed += 1
        if self.nb_pushed < DEPTH:
            return None
        by = np.packbits(np.asarray(bits, np.uint8))
        return bytes(by ^ prbs_bytes(by.shape[0]))

    def decode_frame(self, msc_cifs: np.ndarray):
        """All CIFs of one frame: (nb_cifs, nb_msc_cif_bits) -> list of
        decoded byte payloads (None entries while the deinterleaver fills)."""
        nb_cifs = msc_cifs.shape[0]
        start = self.cfg.start_address * CU_BITS
        sub = np.asarray(msc_cifs)[:, start:start + self.nb_bits]
        self.history, bits, err = self._frame(self.history, jnp.asarray(sub))
        bits = np.asarray(bits, np.uint8)
        out = []
        for c in range(nb_cifs):
            self.nb_pushed += 1
            if self.nb_pushed < DEPTH:
                out.append(None)
                continue
            by = np.packbits(bits[c])
            out.append(bytes(by ^ prbs_bytes(by.shape[0])))
        return out


class MSCEncoder:
    """Inverse path for tests/transmitter: payload bytes -> interleaved CIF
    soft bits of the subchannel."""

    def __init__(self, cfg: SubchannelConfig):
        self.cfg = cfg
        self.nb_bits = cfg.nb_cif_bits
        self.mask = build_puncture_mask(msc_puncture_schedule(cfg))
        self.nb_data_bits = self.mask.shape[0] // 4 - 6
        self.nb_data_bytes = self.nb_data_bits // 8
        # interleaver state: future CIF contributions (bit i of the CIF sent
        # at time t+offset comes from the frame encoded at time t)
        self._pending = np.zeros((DEPTH, self.nb_bits), dtype=np.int8)
        self._t = 0

    def encode_cif(self, payload: bytes) -> np.ndarray:
        """Encode one logical frame and emit the time-interleaved CIF soft
        bits that would be transmitted this CIF period (includes
        contributions from the previous 15 logical frames)."""
        assert len(payload) == self.nb_data_bytes
        data = np.frombuffer(payload, dtype=np.uint8) ^ prbs_bytes(self.nb_data_bytes)
        bits = np.unpackbits(data)
        coded = vit.conv_encode(bits)
        tx = vit.bits_to_soft(vit.puncture(coded, self.mask))
        if tx.shape[0] < self.nb_bits:    # UEP padding bits
            tx = np.concatenate([tx, np.zeros(self.nb_bits - tx.shape[0], np.int8)])

        # scatter: bit i of this frame goes out at time t + offset[i%16]
        offs = CIF_OFFSETS[np.arange(self.nb_bits) % DEPTH]
        for d in range(DEPTH):
            sel = offs == d
            self._pending[(self._t + d) % DEPTH][sel] = tx[sel]
        out = self._pending[self._t % DEPTH].copy()
        self._t += 1
        return out
