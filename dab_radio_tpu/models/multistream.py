"""Batched multi-ensemble streaming demodulation.

The north-star workload (BASELINE.md): many independent 2.048 MSPS IQ
streams demodulated concurrently on one chip (or a mesh). Each stream keeps
its own host read pointer and sync state, but every tracking round batches
all locked streams' windows into ONE vmapped device step — the per-sample
state machines of the reference become a dense (B, window) tensor program.

Streams acquire independently (acquisition is rare); tracking dominates and
is fully batched. Mis-locked streams fall back to acquisition without
stalling the batch.
"""

from typing import List

import numpy as np
import jax
import jax.numpy as jnp

from .demodulator import OFDMDemodulator, DemodCarry
from ..ops.iq import iq_pairs


class MultiStreamDemodulator:
    """B concurrent streams over one OFDMDemodulator."""

    def __init__(self, demod: OFDMDemodulator, nb_streams: int,
                 sharding=None, frames_per_step: int = 1):
        self.demod = demod
        self.B = nb_streams
        self.bufs: List[np.ndarray] = [np.zeros(0, np.complex64)
                                       for _ in range(nb_streams)]
        self.tracking = np.zeros(nb_streams, dtype=bool)
        self.l1 = np.zeros(nb_streams, dtype=np.float32)
        self.carry = DemodCarry.init((nb_streams,))
        self.sharding = sharding
        self.frames_emitted = 0
        # one jit call per round: vmapped step + ready-mask carry merge
        # fused on device (eager per-field merges cost a round trip each on
        # a tunneled accelerator)
        def _masked(carry, wins, mask):
            new_c, out = jax.vmap(demod._frame_step_impl)(carry, wins)
            merged = jax.tree.map(
                lambda n, o: jnp.where(
                    mask.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                new_c, carry)
            return merged, out
        self._masked_step = jax.jit(_masked)
        # K-frame fused rounds: B streams x K tracking steps per dispatch
        self.frames_per_step = max(1, frames_per_step)
        K = self.frames_per_step

        def _masked_scan(carry, bufs, mask):
            new_c, consumed, outs = jax.vmap(
                lambda c, b: demod._frame_scan_impl(K, c, b))(carry, bufs)
            merged = jax.tree.map(
                lambda n, o: jnp.where(
                    mask.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                new_c, carry)
            valid = jnp.logical_and(outs["valid"], mask[:, None])
            return merged, consumed, valid, outs["bits"]
        self._masked_scan = jax.jit(_masked_scan) if K > 1 else None

    def push(self, stream_idx: int, iq: np.ndarray):
        self.bufs[stream_idx] = np.concatenate(
            [self.bufs[stream_idx], np.asarray(iq, np.complex64)])

    def _acquire_stream(self, i: int) -> bool:
        d = self.demod
        buf = self.bufs[i]
        while buf.shape[0] >= d.window_len:
            block = jnp.asarray(iq_pairs(buf[:d.window_len]))
            if self.l1[i] == 0.0:
                self.l1[i] = float(d._l1(block))
            found, end_idx = d._acquire(block, jnp.float32(self.l1[i]))
            self.l1[i] = 0.7 * self.l1[i] + 0.3 * float(d._l1(block))
            if bool(found):
                rewind = 2 * d.cfg.null_search_nb_samples
                start = max(int(end_idx) - d.params.nb_null_period - rewind, 0)
                buf = buf[start:]
                self.bufs[i] = buf
                return True
            buf = buf[d.window_len - d.params.nb_null_period:]
            self.bufs[i] = buf
        return False

    def step(self):
        """One round: acquire unlocked streams, batch-demod locked ones.
        Returns list of (stream_idx, bits) for frames produced."""
        d = self.demod
        for i in range(self.B):
            if not self.tracking[i]:
                if self._acquire_stream(i):
                    self.tracking[i] = True
                    prev_frames = self.carry.total_frames
                    prev_desync = self.carry.total_desync
                    self.carry = jax.tree.map(
                        lambda x: x.at[i].set(jnp.zeros((), x.dtype)),
                        self.carry)
                    # cumulative counters survive re-acquisition
                    self.carry = self.carry._replace(
                        signal_l1_avg=self.carry.signal_l1_avg.at[i].set(
                            self.l1[i]),
                        total_frames=prev_frames,
                        total_desync=prev_desync)

        K = self.frames_per_step
        scan_len = K * d.frame_advance + d.window_len
        if K > 1:
            ready = [i for i in range(self.B)
                     if self.tracking[i]
                     and self.bufs[i].shape[0] >= scan_len]
            if not ready:
                return []
            bufs = np.zeros((self.B, scan_len), np.complex64)
            for i in ready:
                bufs[i] = self.bufs[i][:scan_len]
            mask = np.zeros(self.B, dtype=bool)
            mask[ready] = True
            self.carry, consumed, valid, bits = self._masked_scan(
                self.carry, jnp.asarray(iq_pairs(bufs)), jnp.asarray(mask))
            consumed, valid, bits = jax.device_get((consumed, valid, bits))
            results = []
            for k in range(K):
                for i in ready:
                    if valid[i, k]:
                        results.append((i, bits[i, k]))
            for i in ready:
                nb_ok = int(valid[i].sum())
                self.bufs[i] = self.bufs[i][int(consumed[i]):]
                if nb_ok < K:
                    self.tracking[i] = False
                    self.bufs[i] = self.bufs[i][d.params.nb_null_period:]
            self.frames_emitted += len(results)
            return results

        ready = [i for i in range(self.B)
                 if self.tracking[i] and self.bufs[i].shape[0] >= d.window_len]
        if not ready:
            return []

        # batch: ready streams contribute real windows; others get zeros
        # (their carry is restored afterwards, so the wasted lanes only cost
        # FLOPs — acquisition gaps are rare in steady state)
        windows = np.zeros((self.B, d.window_len), np.complex64)
        for i in ready:
            windows[i] = self.bufs[i][:d.window_len]
        wins = jnp.asarray(iq_pairs(windows))
        if self.sharding is not None:
            wins = jax.device_put(wins, self.sharding)
        ready_mask = np.zeros(self.B, dtype=bool)
        ready_mask[ready] = True
        self.carry, out = self._masked_step(self.carry, wins,
                                            jnp.asarray(ready_mask))

        # single bulk fetch of the round's outputs (per-stream fetches are
        # one round trip each)
        sync_ok, offsets, bits = jax.device_get(
            (out["sync_ok"], out["offset"], out["bits"]))
        results = []
        for i in ready:
            if sync_ok[i]:
                results.append((i, bits[i]))
                adv = int(offsets[i]) + d.frame_advance
                self.bufs[i] = self.bufs[i][adv:]
            else:
                self.tracking[i] = False
                self.bufs[i] = self.bufs[i][d.params.nb_null_period:]
        self.frames_emitted += len(results)
        return results

    def run_available(self, max_rounds: int = 1000):
        """Drain all buffered samples; yields (stream_idx, bits)."""
        for _ in range(max_rounds):
            res = self.step()
            if not res:
                break
            yield from res
