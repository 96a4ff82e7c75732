"""AAC-LC bitstream walker tests.

Oracle: the system libavcodec AAC *encoder* (1024-frame) produces real AUs —
sections, scalefactors, TNS, short windows, escapes; the walker must consume
every AU to exactly its byte length. 960-frame structures are checked with
hand-built AUs that libavcodec then decodes (it supports LC@960), proving the
stripped-core path used for DAB+ SBR streams.
"""

import ctypes

import numpy as np
import pytest

from dab_radio_tpu.dab.bits import BitReader, BitWriter
from dab_radio_tpu.dab.aac_bits import (
    RawDataBlockWalker, SCE, CPE, DSE, FIL, EXT_SBR_DATA)
from dab_radio_tpu.host.native import codecs_lib


def _encoder_aus(sample_rate=48000, channels=2, seconds=1.0):
    lib = codecs_lib()
    if lib is None or not hasattr(lib, "enc_open"):
        pytest.skip("libavcodec shim unavailable")
    h = lib.enc_open(0, sample_rate, channels, 128000)
    if not h:
        pytest.skip("AAC encoder unavailable")
    fs = lib.enc_frame_size(h)
    rng = np.random.default_rng(7)
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    sig = 0.3 * np.sin(2 * np.pi * 997 * t)
    burst = rng.standard_normal(n) * (np.sin(2 * np.pi * 9 * t) > 0.9) * 0.5
    pcm = np.clip(sig + burst, -1, 1)
    pcm = np.stack([pcm] * channels, axis=1)
    pcm16 = (pcm * 32767).astype(np.int16)
    out = np.zeros(1 << 20, np.uint8)
    sizes = np.zeros(1024, np.int32)
    aus = []

    def drain(npk, off=0):
        for k in range(npk):
            aus.append(out[off:off + sizes[k]].tobytes())
            off += sizes[k]

    for i in range(0, n - fs, fs):
        chunk = np.ascontiguousarray(pcm16[i:i + fs])
        npk = lib.enc_encode(h, chunk.ctypes.data, fs, out.ctypes.data,
                             out.shape[0], sizes.ctypes.data, 1024)
        assert npk >= 0
        drain(npk)
    npk = lib.enc_encode(h, None, 0, out.ctypes.data, out.shape[0],
                         sizes.ctypes.data, 1024)
    drain(max(npk, 0))
    lib.enc_close(h)
    return aus


def test_walker_consumes_real_encoder_aus_exactly():
    aus = _encoder_aus()
    assert len(aus) > 20
    w = RawDataBlockWalker(sampling_index=3, frame_len=1024)
    for au in aus:
        res = w.walk(au)
        assert (res.end_bit + 7) // 8 == len(au)
        assert not res.has_sbr


def _silent_cpe_au_960(with_sbr_fill=False, with_dse=False):
    bw = BitWriter()
    if with_dse:
        bw.write(DSE, 3).write(0, 4).write(0, 1).write(4, 8)
        bw.align()
        for b in b"\xfe\x00\x11\x22":
            bw.write(b, 8)
    bw.write(CPE, 3).write(0, 4)
    bw.write(0, 1)                         # common_window = 0
    for _ in range(2):                     # two ics
        bw.write(100, 8)                   # global gain
        bw.write(0, 1).write(0, 2).write(0, 1)  # long window
        bw.write(0, 6).write(0, 1)         # max_sfb=0, no predictor
        bw.write(0, 1).write(0, 1).write(0, 1)  # pulse/tns/gain off
    if with_sbr_fill:
        payload = bytes([0xA5, 0x5A, 0xC3, 0x3C, 0x81])
        cnt = 1 + len(payload)             # ext header nibble + payload
        bw.write(FIL, 3).write(cnt, 4)
        bw.write(EXT_SBR_DATA, 4)
        for b in payload:
            bw.write(b, 8)
        bw.write(0, 4)                     # pad to cnt bytes
    bw.write(7, 3)                         # END
    bw.align()
    return bw.tobytes()


def test_walker_960_structures_and_sbr_capture():
    w = RawDataBlockWalker(sampling_index=6, frame_len=960)
    au = _silent_cpe_au_960(with_sbr_fill=True, with_dse=True)
    res = w.walk(au)
    assert [e.etype for e in res.elements] == [DSE, CPE, FIL]
    assert res.has_sbr and len(res.sbr) == 1
    p = res.sbr[0]
    assert not p.has_crc and p.for_element == CPE
    assert p.nbits == 8 * 5 + 4            # payload bytes + pad nibble
    assert p.data[:5] == bytes([0xA5, 0x5A, 0xC3, 0x3C, 0x81])

    core = w.strip_sbr(au, res)
    res2 = w.walk(core)
    assert not res2.has_sbr
    assert [e.etype for e in res2.elements] == [DSE, CPE]


def test_stripped_core_decodes_via_libavcodec_at_960():
    lib = codecs_lib()
    if lib is None:
        pytest.skip("libavcodec shim unavailable")
    # AudioSpecificConfig: AOT=2 LC, fs idx 6 (24 kHz), 2ch, 960 frames
    asc = bytes([0b00010_011, 0b0_0010_100])
    buf = np.frombuffer(asc, np.uint8)
    h = lib.dec_open(0, buf.ctypes.data, len(asc))
    assert h, "libavcodec rejected LC@960"
    w = RawDataBlockWalker(sampling_index=6, frame_len=960)
    core = w.strip_sbr(_silent_cpe_au_960(with_sbr_fill=True))
    au = np.frombuffer(core, np.uint8)
    pcm = np.empty(16 * 4096, np.int16)
    rate = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    for _ in range(2):
        n = lib.dec_decode(h, au.ctypes.data, au.shape[0], pcm.ctypes.data,
                           pcm.shape[0], ctypes.byref(rate), ctypes.byref(ch))
    lib.dec_close(h)
    assert n == 960 * 2 and rate.value == 24000 and ch.value == 2


def test_bitreader_writer_roundtrip():
    bw = BitWriter()
    vals = [(0x1, 1), (0x5, 3), (0xABC, 12), (0x12345, 17), (0, 2)]
    for v, n in vals:
        bw.write(v, n)
    data = bw.tobytes()
    br = BitReader(data)
    for v, n in vals:
        assert br.read(n) == v


def test_sbr_found_after_other_extensions_in_fil():
    """A FIL whose SBR extension sits AFTER a data-element and a DRC
    extension must still yield the SBR payload (round-2 ADVICE: the old
    parser consumed the whole fill on the first non-SBR type)."""
    from dab_radio_tpu.dab.aac_bits import EXT_DATA_ELEMENT, EXT_DYNAMIC_RANGE
    bw = BitWriter()
    bw.write(CPE, 3).write(0, 4)
    bw.write(0, 1)
    for _ in range(2):
        bw.write(100, 8)
        bw.write(0, 1).write(0, 2).write(0, 1)
        bw.write(0, 6).write(0, 1)
        bw.write(0, 1).write(0, 1).write(0, 1)
    payload = bytes([0xA5, 0x5A, 0xC3, 0x3C, 0x81])
    # extensions: data_element(v0, 2 bytes) + DRC(minimal) + SBR
    ext = BitWriter()
    ext.write(EXT_DATA_ELEMENT, 4).write(0, 4)    # version 0
    ext.write(2, 8)                               # 2 data bytes
    ext.write(0xDE, 8).write(0xAD, 8)
    ext.write(EXT_DYNAMIC_RANGE, 4)
    ext.write(0, 1).write(0, 1).write(0, 1).write(0, 1)  # no optional parts
    ext.write(0x42, 8)                            # one band's dyn_rng
    ext.write(EXT_SBR_DATA, 4)
    for b in payload:
        ext.write(b, 8)
    cnt = (len(ext) + 7) // 8
    bw.write(FIL, 3).write(cnt, 4)
    nbits = len(ext)
    bw.extend(ext)
    bw.write(0, 8 * cnt - nbits)
    bw.write(7, 3)
    bw.align()
    au = bw.tobytes()

    w = RawDataBlockWalker(sampling_index=6, frame_len=960)
    res = w.walk(au)
    assert res.has_sbr and len(res.sbr) == 1
    assert res.sbr[0].data[:5] == payload
    core = w.strip_sbr(au, res)
    assert not w.walk(core).has_sbr
