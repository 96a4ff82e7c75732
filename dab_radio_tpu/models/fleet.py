"""Fleet orchestration: many ensembles decoded with cross-ensemble batching.

The north-star workload (BASELINE.md) is >=100 concurrent real-time Mode-I
ensembles per chip. A naive fleet runs one DabReceiver per ensemble and pays
one FIC dispatch plus one MSC dispatch per channel per frame — O(ensembles x
subchannels) tiny device calls. This orchestrator flips that (the TPU analog
of the reference's per-subchannel thread pool, basic_radio.cpp:51-62, scaled
across ensembles):

  * FIC: every receiver's CIF groups stack into ONE Viterbi batch per round
    (N ensembles x 4 groups lanes).
  * MSC: all active subchannels across ALL ensembles group by protection
    shape (dab.msc.group_key) and decode in one dispatch per shape.

Host byte-level work (FIG parse, superframe/PAD/MOT, database) stays
per-receiver and untouched, so fleet decode is bit-identical to running the
receivers standalone (tests/test_fleet.py).
"""

from typing import Dict, List, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..params import get_dab_params
from ..dab.fic import _fic_decode_fn
from ..dab.msc import decode_frame_group, group_key
from ..utils.profiler import profile_scope
from .receiver import DabReceiver


class ReceiverFleet:
    """N independent ensembles, one device-batched decode path."""

    def __init__(self, nb_receivers: int, transmission_mode: int = 1,
                 benchmark_all: bool = False):
        self.dab = get_dab_params(transmission_mode)
        self.receivers: List[DabReceiver] = [
            DabReceiver(transmission_mode, benchmark_all=benchmark_all)
            for _ in range(nb_receivers)]
        self.spec, self._fic_decode = _fic_decode_fn()
        self.total_frames = 0

    def process_frames(self, frames: Sequence[Tuple[int, np.ndarray]]):
        """One round: frames is a sequence of (receiver_index, frame_soft_bits)
        — typically the per-stream output of MultiStreamDemodulator.step().
        At most one frame per receiver per round."""
        if not frames:
            return
        idxs = [i for i, _ in frames]
        assert len(set(idxs)) == len(idxs), "one frame per receiver per round"

        # ---- FIC: one Viterbi dispatch over all receivers' CIF groups ----
        fics, all_cifs = [], {}
        for i, frame in frames:
            fic, cifs = self.receivers[i].split_frame(frame)
            fics.append(fic.reshape(self.receivers[i].fic.nb_groups, -1))
            all_cifs[i] = cifs
        groups_per_rx = [f.shape[0] for f in fics]
        with profile_scope("fleet/fic_decode"):
            stacked = np.concatenate(fics, axis=0)
            bits, _err = self._fic_decode(jnp.asarray(stacked))
            bits = np.asarray(bits, dtype=np.uint8)
        ofs = 0
        for (i, _), g in zip(frames, groups_per_rx):
            rx = self.receivers[i]
            fibs, _ = rx.fic.postprocess(bits[ofs:ofs + g])
            ofs += g
            rx.ingest_fibs(fibs)

        # ---- MSC: group all channels across receivers by protection shape --
        jobs: Dict[object, list] = {}
        for i, _ in frames:
            for ch in list(self.receivers[i].channels.values()):
                key = group_key(ch.msc.cfg)
                jobs.setdefault(key, []).append((ch, all_cifs[i]))
        with profile_scope("fleet/msc_decode"):
            for chans in jobs.values():
                results = decode_frame_group(
                    [ch.msc for ch, _ in chans], [c for _, c in chans])
                for (ch, _), payloads in zip(chans, results):
                    for p in payloads:
                        if p is not None:
                            ch._handle_payload(p)

        for i, _ in frames:
            self.receivers[i].total_frames += 1
        self.total_frames += len(frames)

    def summary(self) -> dict:
        return {
            "receivers": len(self.receivers),
            "frames": self.total_frames,
            "ensembles_discovered": sum(
                1 for r in self.receivers if r.db.services),
            "channels": sum(len(r.channels) for r in self.receivers),
        }
