"""DAB+ superframe round trip: encode AUs -> 5 logical frames -> decode,
with RS-correctable corruption and firecode desync behavior."""

import numpy as np
import pytest

from dab_radio_tpu.dab.aac import (
    SuperframeProcessor, SuperframeEncoder, SuperFrameHeader,
    mpeg4_audio_specific_config, adts_header, TOTAL_DAB_FRAMES,
)


HDR = SuperFrameHeader(sampling_rate=48000, is_stereo=True, sbr=True,
                       ps=False, mpeg_surround=0)


def _make_superframe(frame_bytes=360, seed=0, header=HDR):
    rng = np.random.default_rng(seed)
    enc = SuperframeEncoder(frame_bytes, header)
    cap = enc.au_capacity()
    n = header.num_aus
    sizes = [cap // n] * (n - 1) + [cap - (cap // n) * (n - 1)]
    aus = [rng.integers(0, 256, size=s).astype(np.uint8).tobytes()
           for s in sizes]
    return enc.encode(aus), aus


def test_superframe_roundtrip():
    frames, aus = _make_superframe()
    proc = SuperframeProcessor()
    results = [proc.process_frame(f) for f in frames]
    assert all(r is None for r in results[:-1])
    header, out_aus = results[-1]
    assert header == HDR
    assert header.num_aus == 3
    assert out_aus == aus
    assert proc.stats["superframes"] == 1
    assert proc.stats["au_crc_errors"] == 0


def test_superframe_rs_correction():
    frames, aus = _make_superframe(seed=1)
    # corrupt up to 5 bytes per RS codeword across the superframe
    sf = bytearray(b"".join(frames))
    rng = np.random.default_rng(2)
    n_cols = len(sf) // 120
    for col in range(0, n_cols, 3):
        for j in rng.choice(120, size=5, replace=False):
            sf[col + j * n_cols] ^= 0xA5
    frames2 = [bytes(sf[i * 360:(i + 1) * 360]) for i in range(TOTAL_DAB_FRAMES)]
    proc = SuperframeProcessor()
    # first frame's firecode may be corrupted: pre-sync the processor
    proc.frame_bytes = 360
    proc.is_synced = True
    res = None
    for f in frames2:
        r = proc.process_frame(f)
        res = r or res
    assert res is not None
    header, out_aus = res
    assert out_aus == aus
    assert proc.stats["rs_corrected_bytes"] > 0


def test_superframe_uncorrectable_desync():
    frames, _ = _make_superframe(seed=3)
    garbage = bytes(np.random.default_rng(4).integers(0, 256, 360).astype(np.uint8))
    proc = SuperframeProcessor()
    proc.frame_bytes = 360
    proc.is_synced = True
    for _ in range(TOTAL_DAB_FRAMES):
        assert proc.process_frame(garbage) is None
    assert proc.stats["rs_errors"] == 1
    assert proc.desync_count == 1
    # valid superframe afterwards still decodes (desync < max keeps collecting)
    res = None
    for f in frames:
        res = proc.process_frame(f) or res
    assert res is not None


def test_num_aus_matrix():
    cases = {(32000, True): 2, (48000, True): 3, (32000, False): 4,
             (48000, False): 6}
    for (rate, sbr), n in cases.items():
        h = SuperFrameHeader(rate, False, sbr, False, 0)
        assert h.num_aus == n


def test_asc_and_adts():
    asc = mpeg4_audio_specific_config(HDR)
    # AAC-LC object type 2 in the first 5 bits
    assert (asc[0] >> 3) == 2
    # SBR core rate = 24 kHz (index 6)
    assert ((asc[0] & 0b111) << 1 | (asc[1] >> 7)) == 6
    h = adts_header(HDR, 100)
    assert h[0] == 0xFF and (h[1] & 0xF0) == 0xF0
    frame_len = ((h[3] & 0b11) << 11) | (h[4] << 3) | (h[5] >> 5)
    assert frame_len == 107
