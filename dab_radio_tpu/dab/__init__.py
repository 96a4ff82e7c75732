"""DAB digital decode layers (host-side byte protocols + device FEC).

FIC/FIG ensemble metadata, the ensemble database with CRDT-ish updaters,
MSC subchannel decode, DAB+ superframes, PAD/MOT data applications. The
bit-level framing is branchy byte-protocol work with no FLOPs and runs on
host (SURVEY.md §7 design stance); FEC (Viterbi/RS) runs on device via ops/.
"""
