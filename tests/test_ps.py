"""Parametric stereo (HE-AAC v2) bitstream layer tests.

The writer's output is validated against the system libavcodec's conformant
PS decode (a hard-left IID pan must come out as a strong L/R energy ratio),
and the parser round-trips the writer — together pinning the bit layout to
the conformant implementation.
"""

import ctypes

import numpy as np
import pytest

from dab_radio_tpu.dab.bits import BitWriter, BitReader
from dab_radio_tpu.dab.ps import PSData, PSBitstream, write_ps_data, nr_par
from dab_radio_tpu.dab import sbr as S
from dab_radio_tpu.dab.aac_bits import RawDataBlockWalker
from dab_radio_tpu.host.native import codecs_lib


def test_ps_writer_parser_roundtrip():
    rng = np.random.default_rng(0)
    d = PSData(enable_iid=True, iid_mode=1, enable_icc=True, icc_mode=1,
               num_env=2)
    d.iid_par = np.cumsum(rng.integers(-2, 3, (2, nr_par(1))), axis=1)
    d.icc_par = np.clip(
        np.cumsum(rng.integers(-1, 2, (2, nr_par(1))), axis=1), 0, 7)
    bw = BitWriter()
    write_ps_data(bw, d, nts=32)
    p = PSBitstream(32).parse(BitReader(bw.tobytes()))
    assert p.enable_iid and p.iid_mode == 1 and p.num_env == 2
    np.testing.assert_array_equal(p.iid_par, d.iid_par)
    np.testing.assert_array_equal(p.icc_par, d.icc_par)


def test_ps_rides_sbr_extension():
    rng = np.random.default_rng(1)
    d = PSData(enable_iid=True, iid_mode=0, num_env=1)
    d.iid_par = np.cumsum(rng.integers(-2, 3, (1, nr_par(0))), axis=1)
    hdr = S.SBRHeader(amp_res=1, start_freq=5, stop_freq=3)
    ft = S.make_freq_tables(hdr, 48000)
    env = np.full(ft.n[1], 30, np.int64)
    noise = np.full(len(ft.f_noise) - 1, 14, np.int64)
    payload, nbits = S.build_sbr_payload(hdr, 48000, 16, [[env]], [[noise]],
                                         ps_data=d)
    fr = S.SBRBitstream(48000, 16, is_cpe=False).parse(payload, nbits, False)
    assert fr.ps is not None and fr.ps.enable_iid
    np.testing.assert_array_equal(fr.ps.iid_par, d.iid_par)


def test_ps_payload_conformant_via_libavcodec():
    """Splice our SBR+PS payload onto real mono cores; libavcodec's HE-AACv2
    decode must produce the intended stereo pan."""
    lib = codecs_lib()
    if lib is None:
        pytest.skip("libavcodec shim unavailable")

    def asc_hev2(fs_core, ch, fs_out):
        bw = BitWriter()
        bw.write(2, 5).write(fs_core, 4).write(ch, 4)
        bw.write(0, 1).write(0, 1).write(0, 1)
        bw.write(0x2B7, 11).write(5, 5).write(1, 1).write(fs_out, 4)
        bw.write(0x548, 11).write(1, 1)
        return bw.tobytes()

    h = lib.enc_open(0, 24000, 1, 48000)
    fs = lib.enc_frame_size(h)
    n = 24000
    t = np.arange(n) / 24000
    pcm16 = np.clip(0.4 * np.sin(2 * np.pi * 800 * t) * 32767,
                    -32768, 32767).astype(np.int16).reshape(-1, 1)
    out = np.zeros(1 << 20, np.uint8)
    sizes = np.zeros(1024, np.int32)
    aus = []
    for i in range(0, n - fs, fs):
        c = np.ascontiguousarray(pcm16[i:i + fs])
        npk = lib.enc_encode(h, c.ctypes.data, fs, out.ctypes.data,
                             out.shape[0], sizes.ctypes.data, 1024)
        off = 0
        for k in range(npk):
            aus.append(out[off:off + sizes[k]].tobytes())
            off += sizes[k]
    lib.enc_close(h)

    hdr = S.SBRHeader(amp_res=1, start_freq=5, stop_freq=3, smoothing_mode=0)
    ft = S.make_freq_tables(hdr, 48000)
    env = np.full(ft.n[1], 27, np.int64)
    noise = np.full(len(ft.f_noise) - 1, 14, np.int64)
    d = PSData(enable_iid=True, iid_mode=1, num_env=1)
    d.iid_par = np.full((1, nr_par(1)), 7, np.int64)  # hard left pan
    payload, nbits = S.build_sbr_payload(hdr, 48000, 16, [[env]], [[noise]],
                                         ps_data=d)
    walker = RawDataBlockWalker(6, 1024)

    asc = asc_hev2(6, 1, 3)
    b = np.frombuffer(asc, np.uint8)
    hd = lib.dec_open(0, b.ctypes.data, len(asc))
    assert hd
    chunks = []
    nch = 0
    for au in aus:
        au_ps = S.add_sbr_fill_to_au(au, payload, nbits, walker)
        buf = np.frombuffer(au_ps, np.uint8)
        pcm = np.empty(1 << 18, np.int16)
        r = ctypes.c_int32(0)
        c = ctypes.c_int32(0)
        got = lib.dec_decode(hd, buf.ctypes.data, buf.shape[0],
                             pcm.ctypes.data, pcm.shape[0],
                             ctypes.byref(r), ctypes.byref(c))
        nch = c.value
        if got > 0:
            chunks.append(pcm[:got].reshape(-1, max(c.value, 1)))
    lib.dec_close(hd)
    o = np.concatenate(chunks).astype(np.float64)
    assert nch == 2
    seg = o[len(o) // 2:]
    ratio = seg[:, 0].std() / max(seg[:, 1].std(), 1e-9)
    assert ratio > 5.0, f"expected a strong left pan, got ratio {ratio}"
