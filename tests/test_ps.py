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


def _encode_mono_lc(lib, sig, rate=24000):
    pcm16 = np.clip(sig * 32767, -32768, 32767).astype(np.int16).reshape(-1, 1)
    h = lib.enc_open(0, rate, 1, 48000)
    fs = lib.enc_frame_size(h)
    out = np.zeros(1 << 20, np.uint8)
    sizes = np.zeros(1024, np.int32)
    aus = []
    for i in range(0, len(pcm16) - fs, fs):
        c = np.ascontiguousarray(pcm16[i:i + fs])
        npk = lib.enc_encode(h, c.ctypes.data, fs, out.ctypes.data,
                             out.shape[0], sizes.ctypes.data, 1024)
        off = 0
        for k in range(npk):
            aus.append(out[off:off + sizes[k]].tobytes())
            off += sizes[k]
    lib.enc_close(h)
    return aus, fs


@pytest.mark.parametrize("variant", ["pan", "icc", "ipdopd", "fine",
                                     "coarse10", "vargrid", "deltatime",
                                     "band34", "mixed34", "mixed34_ipd",
                                     "mixed34_ipd5"])
def test_ps_synthesis_differential_vs_libavcodec_1024(variant):
    """Full-chain stereo oracle: our PS synthesis (LC core via libavcodec +
    own SBR + own PS reconstruction) must match libavcodec's conformant
    HE-AAC v2 decode. Covers IID pan, ICC decorrelation, IPD/OPD phase and
    fine-IID quantization."""
    lib = codecs_lib()
    if lib is None:
        pytest.skip("libavcodec shim unavailable")
    rng = np.random.default_rng(3)
    n = 24000 * 2
    t = np.arange(n) / 24000
    sig = (0.25 * np.sin(2 * np.pi * 700 * t)
           + 0.15 * np.sin(2 * np.pi * 2500 * t + 1.0)
           + 0.05 * rng.standard_normal(n))
    aus, fs = _encode_mono_lc(lib, sig)
    assert fs == 1024 and len(aus) > 20

    hdr = S.SBRHeader(amp_res=1, start_freq=5, stop_freq=3, xover_band=0,
                      freq_scale=2, alter_scale=1, noise_bands=2,
                      limiter_bands=2, limiter_gains=2, interpol_freq=1,
                      smoothing_mode=0)
    ft = S.make_freq_tables(hdr, 48000)
    env = np.full(ft.n[1], 27, np.int64)
    noise = np.full(len(ft.f_noise) - 1, 14, np.int64)

    if variant == "fine":
        d = PSData(enable_iid=True, iid_mode=4, enable_icc=True, icc_mode=1,
                   num_env=1)
        d.iid_par = (np.arange(nr_par(4)) % 11 - 5).reshape(1, -1) * 2
        d.icc_par = (np.arange(nr_par(1)) % 4).reshape(1, -1)
    elif variant == "coarse10":
        # 10-parameter modes exercise the 10->20 band upsampling
        d = PSData(enable_iid=True, iid_mode=0, enable_icc=True, icc_mode=0,
                   num_env=1)
        d.iid_par = (np.arange(nr_par(0)) % 9 - 4).reshape(1, -1)
        d.icc_par = (np.arange(nr_par(0)) % 5).reshape(1, -1)
    elif variant == "deltatime":
        # inter-frame delta-time coded IID/ICC (df=1 was writer-unreachable
        # before round 3); handled below with alternating payloads
        d = PSData(enable_iid=True, iid_mode=1, enable_icc=True, icc_mode=1,
                   num_env=1)
        d.iid_par = (np.arange(nr_par(1)) % 9 - 4).reshape(1, -1)
        d.icc_par = (np.arange(nr_par(1)) % 4).reshape(1, -1)
    elif variant == "mixed34":
        # mixed resolution: 34-band IID with 20-band ICC (exercises the
        # bitwise-derived 20->34 upmap incl. the averaged bands 1/4)
        d = PSData(enable_iid=True, iid_mode=2, enable_icc=True, icc_mode=1,
                   num_env=1)
        d.iid_par = (np.arange(nr_par(2)) % 9 - 4).reshape(1, -1)
        d.icc_par = (np.arange(nr_par(1)) % 5).reshape(1, -1)
    elif variant == "band34":
        # 34-band high-resolution config (iid/icc modes 2): full hybrid
        # filterbank split of QMF bands 0..4
        d = PSData(enable_iid=True, iid_mode=2, enable_icc=True, icc_mode=2,
                   num_env=1)
        d.iid_par = (np.arange(nr_par(2)) % 9 - 4).reshape(1, -1)
        d.icc_par = (np.arange(nr_par(2)) % 5).reshape(1, -1)
    elif variant == "vargrid":
        # VAR frame class: explicit envelope borders + per-envelope rows
        d = PSData(enable_iid=True, iid_mode=1, enable_icc=True, icc_mode=1,
                   num_env=2, frame_class=1, border_position=[13, 31])
        d.iid_par = np.stack([(np.arange(nr_par(1)) % 9 - 4),
                              (np.arange(nr_par(1)) % 7 - 3)])
        d.icc_par = np.stack([(np.arange(nr_par(1)) % 4),
                              (np.arange(nr_par(1)) % 3)])
    elif variant == "mixed34_ipd":
        # the former mono-dup fallback: a 34-band stream (icc_mode 2) whose
        # ipd/opd ride an 11-band iid mode — exercises the non-full
        # map_idx_20_to_34 upmap (first 17 entries incl. averaged bands 1/4)
        d = PSData(enable_iid=True, iid_mode=1, enable_icc=True, icc_mode=2,
                   num_env=1)
        d.iid_par = (np.arange(nr_par(1)) % 9 - 4).reshape(1, -1)
        d.icc_par = (np.arange(nr_par(2)) % 3).reshape(1, -1)
    elif variant == "mixed34_ipd5":
        # 5-band ipd/opd (10-band iid mode 0) on a 34-band stream: the
        # 10->34 duplication upmap with mapped[16] = 0
        d = PSData(enable_iid=True, iid_mode=0, enable_icc=True, icc_mode=2,
                   num_env=1)
        d.iid_par = (np.arange(nr_par(0)) % 9 - 4).reshape(1, -1)
        d.icc_par = (np.arange(nr_par(2)) % 3).reshape(1, -1)
    else:
        d = PSData(enable_iid=True, iid_mode=1, enable_icc=True, icc_mode=1,
                   num_env=1)
        d.iid_par = (np.arange(nr_par(1)) % 9 - 4).reshape(1, -1)
        d.icc_par = np.zeros((1, nr_par(1)), np.int64)
        if variant == "icc":
            d.icc_par = (np.arange(nr_par(1)) % 6).reshape(1, -1)
        if variant == "ipdopd":
            d.icc_par = (np.arange(nr_par(1)) % 3).reshape(1, -1)

    payload, nbits = S.build_sbr_payload(hdr, 48000, 16, [[env]], [[noise]],
                                         ps_data=d)
    if variant in ("ipdopd", "mixed34_ipd", "mixed34_ipd5"):
        # re-serialize with the ipd/opd extension
        from dab_radio_tpu.dab.ps import _huff, _huff_offset
        d2 = PSData(enable_iid=True, iid_mode=d.iid_mode, enable_icc=True,
                    icc_mode=d.icc_mode, num_env=1)
        d2.iid_par, d2.icc_par = d.iid_par, d.icc_par
        bw = BitWriter()
        bw.write(1, 1)                       # header
        bw.write(1, 1).write(d.iid_mode, 3)  # iid
        bw.write(1, 1).write(d.icc_mode, 3)  # icc
        bw.write(1, 1)                       # enable_ext
        bw.write(0, 1).write(1, 2)           # FIX grid, 1 envelope
        for row, name in ((d2.iid_par, "iid_df0"), (d2.icc_par, "icc_df")):
            h = _huff(name)
            off = _huff_offset(h)
            bw.write(0, 1)
            acc = 0
            for v in row[0]:
                h.encode(bw, int(v) - acc + off)
                acc = int(v)
        # extension: ipdopd rows (delta-freq, mod 8)
        ext = BitWriter()
        ext.write(0, 2)                      # ext id 0: ipdopd
        ext.write(1, 1)                      # enable_ipdopd
        nipd = 5 if d.iid_mode in (0, 3) else 11
        ipd_row = (np.arange(nipd) % 8)
        opd_row = ((np.arange(nipd) * 3) % 8)
        for row, name in ((ipd_row, "ipd_df"), (opd_row, "opd_df")):
            h = _huff(name)
            ext.write(0, 1)
            acc = 0
            for v in row:
                h.encode(ext, (int(v) - acc) % 8)
                acc = int(v)
        nbytes = (len(ext) + 7) // 8
        bw.write(nbytes, 4)
        ext_bits = len(ext)
        bw.extend(ext)
        bw.write(0, 8 * nbytes - ext_bits)
        ps_payload = bw
        payload, nbits = S.build_sbr_payload(hdr, 48000, 16, [[env]],
                                             [[noise]])
        # splice: rebuild with raw ps bits is intricate; instead craft via
        # build_sbr_payload's ps_data path but monkey-patching write_ps_data
        import dab_radio_tpu.dab.sbr as sbr_mod
        from dab_radio_tpu.dab import ps as ps_mod
        orig = ps_mod.write_ps_data

        def patched(bw2, dd, nts=32, send_header=True):
            bw2.extend(ps_payload)
        ps_mod.write_ps_data = patched
        try:
            payload, nbits = S.build_sbr_payload(
                hdr, 48000, 16, [[env]], [[noise]], ps_data=d2)
        finally:
            ps_mod.write_ps_data = orig

    walker = RawDataBlockWalker(6, 1024)
    if variant == "deltatime":
        iid_b = d.iid_par + 1
        icc_b = np.clip(d.icc_par + 1, 0, 7)
        d_up = PSData(enable_iid=True, iid_mode=1, enable_icc=True,
                      icc_mode=1, num_env=1)
        d_up.iid_par, d_up.icc_par = iid_b, icc_b
        d_up.iid_dt, d_up.icc_dt = [1], [1]
        d_up.prev_iid, d_up.prev_icc = d.iid_par[0], d.icc_par[0]
        d_dn = PSData(enable_iid=True, iid_mode=1, enable_icc=True,
                      icc_mode=1, num_env=1)
        d_dn.iid_par, d_dn.icc_par = d.iid_par, d.icc_par
        d_dn.iid_dt, d_dn.icc_dt = [1], [1]
        d_dn.prev_iid, d_dn.prev_icc = iid_b[0], icc_b[0]
        p_up = S.build_sbr_payload(hdr, 48000, 16, [[env]], [[noise]],
                                   ps_data=d_up, ps_send_header=False)
        p_dn = S.build_sbr_payload(hdr, 48000, 16, [[env]], [[noise]],
                                   ps_data=d_dn, ps_send_header=False)
        seq = [(payload, nbits)] + [p_up if k % 2 == 0 else p_dn
                                    for k in range(len(aus) - 1)]
        aus_ps = [S.add_sbr_fill_to_au(au, p[0], p[1], walker)
                  for au, p in zip(aus, seq)]
    else:
        aus_ps = [S.add_sbr_fill_to_au(au, payload, nbits, walker)
                  for au in aus]

    def asc_hev2(fs_core, ch, fs_out):
        bw = BitWriter()
        bw.write(2, 5).write(fs_core, 4).write(ch, 4)
        bw.write(0, 1).write(0, 1).write(0, 1)
        bw.write(0x2B7, 11).write(5, 5).write(1, 1).write(fs_out, 4)
        bw.write(0x548, 11).write(1, 1)
        return bw.tobytes()

    asc = asc_hev2(6, 1, 3)
    b = np.frombuffer(asc, np.uint8)
    hd = lib.dec_open(0, b.ctypes.data, len(asc))
    assert hd
    ref = []
    for au in aus_ps:
        buf = np.frombuffer(au, np.uint8)
        pcm = np.empty(1 << 18, np.int16)
        r = ctypes.c_int32(0)
        c = ctypes.c_int32(0)
        got = lib.dec_decode(hd, buf.ctypes.data, buf.shape[0],
                             pcm.ctypes.data, pcm.shape[0],
                             ctypes.byref(r), ctypes.byref(c))
        if got > 0:
            ref.append(pcm[:got].reshape(-1, max(c.value, 1)))
    lib.dec_close(hd)
    ref = np.concatenate(ref)
    assert ref.shape[1] == 2
    ref = ref.astype(np.float64)

    # ours: LC core (libavcodec f32) -> own SBR -> own PS
    from dab_radio_tpu.dab.bits import BitWriter as BW
    bw = BW()
    bw.write(2, 5).write(6, 4).write(1, 4)
    bw.write(0, 1).write(0, 1).write(0, 1)
    asc_lc = bw.tobytes()
    b = np.frombuffer(asc_lc, np.uint8)
    hc = lib.dec_open(0, b.ctypes.data, len(asc_lc))
    dec = S.SBRDecoder(48000, num_time_slots=16, is_cpe=False)
    ours = []
    for au, au_s in zip(aus, aus_ps):
        buf = np.frombuffer(au, np.uint8)
        pcm = np.empty(1 << 18, np.float32)
        r = ctypes.c_int32(0)
        c = ctypes.c_int32(0)
        got = lib.dec_decode_f32(hc, buf.ctypes.data, buf.shape[0],
                                 pcm.ctypes.data, pcm.shape[0],
                                 ctypes.byref(r), ctypes.byref(c))
        core = (pcm[:got].reshape(-1, 1).astype(np.float64) if got > 0
                else np.zeros((1024, 1)))
        sb = walker.walk(au_s).sbr[0]
        ours.append(dec.decode_frame(core, sb.data, sb.nbits, sb.has_crc))
    lib.dec_close(hc)
    ours = np.concatenate(ours)
    assert ours.shape[1] == 2, "PS synthesis did not produce stereo"

    # align: PS carries one frame (2048 samples) of filterbank latency
    a = ref[40000:72000, 0]
    best_lag, best = None, -1.0
    for lag in range(1500, 2600):
        bseg = ours[40000 + lag:72000 + lag, 0]
        v = float(np.dot(a, bseg)) / (np.linalg.norm(a) *
                                      np.linalg.norm(bseg) + 1e-9)
        if v > best:
            best, best_lag = v, lag
    rels = []
    for chn in range(2):
        a = ref[40000:72000, chn]
        bseg = ours[40000 + best_lag:72000 + best_lag, chn]
        rels.append(np.linalg.norm(a - bseg) / np.linalg.norm(a))
    assert max(rels) < 0.02, \
        f"PS differential rel err {rels} (lag {best_lag}, corr {best:.4f})"


def test_ps_mixed_resolution_upmaps_bitwise_vs_libavcodec():
    """The 10/20 -> 34 parameter upmaps must be EXACTLY libavcodec's: a
    mixed-resolution stream and a direct 34-band stream carrying the
    upmapped row must decode to bitwise-identical PCM (same internal
    parameters -> same float ops)."""
    lib = codecs_lib()
    if lib is None:
        pytest.skip("libavcodec shim unavailable")
    from dab_radio_tpu.dab.ps_synth import _map_idx_20_to_34, _IDX_10_TO_34
    rng = np.random.default_rng(11)
    n = 24000
    t = np.arange(n) / 24000
    sig = (0.25 * np.sin(2 * np.pi * 700 * t)
           + 0.05 * rng.standard_normal(n))
    aus, fs = _encode_mono_lc(lib, sig)
    hdr = S.SBRHeader(amp_res=1, start_freq=5, stop_freq=3, xover_band=0,
                      freq_scale=2, alter_scale=1, noise_bands=2,
                      limiter_bands=2, limiter_gains=2, interpol_freq=1,
                      smoothing_mode=0)
    ft = S.make_freq_tables(hdr, 48000)
    env = np.full(ft.n[1], 27, np.int64)
    noise = np.full(len(ft.f_noise) - 1, 14, np.int64)
    walker = RawDataBlockWalker(6, 1024)

    def asc():
        bw = BitWriter()
        bw.write(2, 5).write(6, 4).write(1, 4)
        bw.write(0, 1).write(0, 1).write(0, 1)
        bw.write(0x2B7, 11).write(5, 5).write(1, 1).write(3, 4)
        bw.write(0x548, 11).write(1, 1)
        return bw.tobytes()

    def ff(d):
        payload, nbits = S.build_sbr_payload(hdr, 48000, 16, [[env]],
                                             [[noise]], ps_data=d)
        a = asc()
        b = np.frombuffer(a, np.uint8)
        hd = lib.dec_open(0, b.ctypes.data, len(a))
        out = []
        for au in aus:
            au_ps = S.add_sbr_fill_to_au(au, payload, nbits, walker)
            buf = np.frombuffer(au_ps, np.uint8)
            pcm = np.empty(1 << 18, np.int16)
            r = ctypes.c_int32(0)
            c = ctypes.c_int32(0)
            got = lib.dec_decode(hd, buf.ctypes.data, buf.shape[0],
                                 pcm.ctypes.data, pcm.shape[0],
                                 ctypes.byref(r), ctypes.byref(c))
            if got > 0:
                out.append(pcm[:got].reshape(-1, max(c.value, 1)).copy())
        lib.dec_close(hd)
        return np.concatenate(out)

    for mode, n_coded, upmap in ((1, 20, _map_idx_20_to_34),
                                 (0, 10, lambda p: p[_IDX_10_TO_34])):
        row = rng.integers(0, 8, n_coded)
        d_mix = PSData(enable_iid=True, iid_mode=2, enable_icc=True,
                       icc_mode=mode, num_env=1)
        d_mix.iid_par = np.zeros((1, nr_par(2)), np.int64)
        d_mix.icc_par = row.reshape(1, -1)
        d_dir = PSData(enable_iid=True, iid_mode=2, enable_icc=True,
                       icc_mode=2, num_env=1)
        d_dir.iid_par = np.zeros((1, nr_par(2)), np.int64)
        d_dir.icc_par = np.asarray(upmap(row)).reshape(1, -1)
        a, b = ff(d_mix), ff(d_dir)
        assert a.shape == b.shape and np.array_equal(a, b), \
            f"icc_mode {mode} upmap diverges from libavcodec"


def test_ps_config_switch_mid_stream():
    """A stream toggling 20-band <-> 34-band PS configs mid-service must
    not crash (state resets on switch; real broadcasts never toggle)."""
    from dab_radio_tpu.dab.ps_synth import PSSynthesis
    rng = np.random.default_rng(0)
    ps = PSSynthesis(n_slots=32)
    X = (rng.standard_normal((32, 64)) + 1j * rng.standard_normal((32, 64)))
    for mode in (1, 2, 1, 2):
        d = PSData(enable_iid=True, iid_mode=mode, enable_icc=True,
                   icc_mode=mode, num_env=1)
        d.iid_par = np.zeros((1, nr_par(mode)), np.int64)
        d.icc_par = np.zeros((1, nr_par(mode)), np.int64)
        res = ps.process(X, d)
        if res is not None:
            L, R = res
            assert L.shape == (32, 64) and R.shape == (32, 64)
            assert np.isfinite(L).all() and np.isfinite(R).all()


def test_ps_native_decorrelator_bit_identical_to_numpy():
    """The C decorrelator kernels (io_kernels.cpp ps_ducker/ps_allpass)
    must reproduce the NumPy reference loops BIT-FOR-BIT (the Makefile
    compiles with -ffp-contract=off so no FMA changes the rounding)."""
    import dab_radio_tpu.dab.ps_synth as PS
    from dab_radio_tpu.dab.ps_synth import PSSynthesis
    if PS._native_ps() is None:
        pytest.skip("native io library unavailable")

    def run(native, seed):
        rng = np.random.default_rng(seed)
        orig = PS._native_ps
        if not native:
            PS._native_ps = lambda: None
        try:
            syn = PSSynthesis(n_slots=32)
            outs = []
            for is34 in (False, False, True, False):  # incl. config switch
                syn._set_config(is34)
                s = (rng.standard_normal((syn.c.NB, 32))
                     + 1j * rng.standard_normal((syn.c.NB, 32)))
                outs.append(syn.decorrelate(s))
        finally:
            PS._native_ps = orig
        return outs

    for x, y in zip(run(True, 42), run(False, 42)):
        np.testing.assert_array_equal(x, y)


def test_ps_ipd_resolution_switch_no_crash():
    """A stream whose iid_mode switches band resolution between frames
    (5- vs 11-band ipd/opd) must not index-crash delta-time ipd rows
    against the stale previous-frame row: like iid/icc, a mismatched
    prev resets to zeros (parse continues)."""
    bs = PSBitstream(32)

    def frame(iid_mode, ipd_dt):
        d = PSData(enable_iid=True, iid_mode=iid_mode, num_env=1,
                   enable_ipdopd=True)
        d.iid_par = np.zeros((1, nr_par(iid_mode)), np.int64)
        nipd = 5 if iid_mode in (0, 3) else 11
        d.ipd_par = np.zeros((1, nipd), np.int64)
        d.opd_par = np.zeros((1, nipd), np.int64)
        if ipd_dt:
            d.ipd_dt = d.opd_dt = [1]
            d.prev_ipd = np.zeros(nipd, np.int64)
            d.prev_opd = np.zeros(nipd, np.int64)
        bw = BitWriter()
        write_ps_data(bw, d, nts=32)
        return bs.parse(BitReader(bw.tobytes()))

    p0 = frame(0, False)               # 5-band ipd
    assert p0.ipd_par.shape[1] == 5
    p1 = frame(1, True)                # 11-band ipd, delta-TIME coded
    assert p1.ipd_par.shape[1] == 11   # stale 5-band prev reset, no crash
    p2 = frame(0, True)                # back down: 11 -> 5
    assert p2.ipd_par.shape[1] == 5


def test_ps_headerless_frame_under_enable_ext_config():
    """A send_header=False frame without ipd rows, following a header that
    enabled extensions, must emit an EMPTY extension length (the parser
    reads one under the persisted config) — not desync the payload."""
    bs = PSBitstream(32)

    d0 = PSData(enable_iid=True, iid_mode=1, num_env=1, enable_ipdopd=True)
    d0.iid_par = np.zeros((1, nr_par(1)), np.int64)
    d0.ipd_par = np.zeros((1, 11), np.int64)
    d0.opd_par = np.zeros((1, 11), np.int64)
    bw = BitWriter()
    write_ps_data(bw, d0, nts=32)
    p0 = bs.parse(BitReader(bw.tobytes()))
    assert p0.enable_ext and p0.ipd_par is not None

    # headerless follow-up with no ipd: sentinel bits after the PS frame
    # must land exactly where the parser resumes
    d1 = PSData(enable_iid=True, iid_mode=1, num_env=1, enable_ext=True)
    d1.iid_par = np.arange(nr_par(1)).reshape(1, -1) % 3
    bw = BitWriter()
    write_ps_data(bw, d1, nts=32, send_header=False)
    sentinel_pos = len(bw)
    bw.write(0b1011, 4)
    br = BitReader(bw.tobytes())
    p1 = bs.parse(br)
    np.testing.assert_array_equal(p1.iid_par, d1.iid_par)
    assert br.pos == sentinel_pos
    assert br.read(4) == 0b1011

    # headerless ipd under a header that did NOT enable ext: writer refuses
    d2 = PSData(enable_iid=True, iid_mode=1, num_env=1, enable_ipdopd=True)
    d2.iid_par = np.zeros((1, nr_par(1)), np.int64)
    d2.ipd_par = np.zeros((1, 11), np.int64)
    d2.opd_par = np.zeros((1, 11), np.int64)
    with pytest.raises(ValueError):
        write_ps_data(BitWriter(), d2, nts=32, send_header=False)
