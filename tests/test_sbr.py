"""SBR decoder tests.

The decisive test is a full differential against the system libavcodec's own
conformant HE-AAC SBR decode at 1024 frames: we craft SBR payloads with our
writer, splice them into real libavcodec-encoded AAC-LC cores, and require
our (LC core via libavcodec) + (SBR stage, this repo) pipeline to match
ffmpeg's HE-AAC output within 1% RMS. The identical SBR code path then runs
at 15 slots for DAB+'s 960 frames (where no mainstream decoder exists — the
reason the reference vendors faad2, aac_audio_decoder.cpp:86-251).
"""

import ctypes

import numpy as np
import pytest

from dab_radio_tpu.dab.bits import BitWriter, BitReader
from dab_radio_tpu.dab.aac_bits import RawDataBlockWalker
from dab_radio_tpu.dab import sbr as S
from dab_radio_tpu.host.native import codecs_lib


def _lib():
    lib = codecs_lib()
    if lib is None:
        pytest.skip("libavcodec shim unavailable")
    return lib


def _asc_lc(fs_idx, ch, f960=False):
    bw = BitWriter()
    bw.write(2, 5).write(fs_idx, 4).write(ch, 4)
    bw.write(1 if f960 else 0, 1).write(0, 1).write(0, 1)
    return bw.tobytes()


def _asc_he(fs_idx_core, ch, fs_idx_out, f960=False):
    bw = BitWriter()
    bw.write(2, 5).write(fs_idx_core, 4).write(ch, 4)
    bw.write(1 if f960 else 0, 1).write(0, 1).write(0, 1)
    bw.write(0x2B7, 11).write(5, 5).write(1, 1).write(fs_idx_out, 4)
    return bw.tobytes()


def _open(lib, asc):
    buf = np.frombuffer(asc, np.uint8)
    h = lib.dec_open(0, buf.ctypes.data, len(asc))
    assert h
    return h


def _decode16(lib, h, au):
    buf = np.frombuffer(au, np.uint8)
    pcm = np.empty(1 << 18, np.int16)
    rate = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    n = lib.dec_decode(h, buf.ctypes.data, buf.shape[0], pcm.ctypes.data,
                       pcm.shape[0], ctypes.byref(rate), ctypes.byref(ch))
    return ((pcm[:n].copy() if n > 0 else np.zeros(0, np.int16)),
            rate.value, ch.value)


def _decode_f32(lib, h, au):
    buf = np.frombuffer(au, np.uint8)
    pcm = np.empty(1 << 18, np.float32)
    rate = ctypes.c_int32(0)
    ch = ctypes.c_int32(0)
    n = lib.dec_decode_f32(h, buf.ctypes.data, buf.shape[0], pcm.ctypes.data,
                           pcm.shape[0], ctypes.byref(rate), ctypes.byref(ch))
    return ((pcm[:n].copy() if n > 0 else np.zeros(0, np.float32)),
            rate.value, ch.value)


def _encode_lc(lib, pcm16, sample_rate, channels, bitrate=48000):
    h = lib.enc_open(0, sample_rate, channels, bitrate)
    assert h
    fs = lib.enc_frame_size(h)
    out = np.zeros(1 << 20, np.uint8)
    sizes = np.zeros(1024, np.int32)
    aus = []

    def drain(npk, off=0):
        for k in range(npk):
            aus.append(out[off:off + sizes[k]].tobytes())
            off += sizes[k]

    for i in range(0, len(pcm16) - fs, fs):
        c = np.ascontiguousarray(pcm16[i:i + fs])
        npk = lib.enc_encode(h, c.ctypes.data, fs, out.ctypes.data,
                             out.shape[0], sizes.ctypes.data, 1024)
        assert npk >= 0
        drain(npk)
    lib.enc_close(h)
    return aus, fs


def test_qmf_perfect_reconstruction_and_streaming():
    from dab_radio_tpu.ops.qmf import AnalysisQMF, SynthesisQMF
    rng = np.random.default_rng(5)
    n = 32 * 200
    x2 = rng.standard_normal(n * 2)
    X2 = np.fft.rfft(x2)
    f2 = np.fft.rfftfreq(len(x2), 1 / 48000)
    X2[f2 > 10000] = 0
    x = np.fft.irfft(X2)[::2][:n]
    up = np.fft.irfft(np.concatenate([np.fft.rfft(x), np.zeros(n // 2)])) * 2
    W = AnalysisQMF().process(x)
    X = np.zeros((200, 64), complex)
    X[:, :32] = W
    y = SynthesisQMF().process(X)
    best = max(range(400, 800),
               key=lambda d: abs(np.dot(y[6000:11000], up[6000 - d:11000 - d])))
    b = up[6000 - best:11000 - best]
    a = y[6000:11000]
    assert abs(np.dot(b, a) / np.dot(a, a) - 1) < 0.01       # unity gain
    assert np.linalg.norm(b - a) / np.linalg.norm(b) < 0.005  # PR quality
    # chunked streaming is bit-identical to one-shot
    a2, s2 = AnalysisQMF(), SynthesisQMF()
    ys = []
    for i in range(0, 200, 7):
        Wc = a2.process(x[i * 32:(i + 7) * 32])
        Xc = np.zeros((Wc.shape[0], 64), complex)
        Xc[:, :32] = Wc
        ys.append(s2.process(Xc))
    y2 = np.concatenate(ys)
    np.testing.assert_allclose(y2, y[:len(y2)], atol=1e-9)


def test_freq_tables_sane():
    h = S.SBRHeader(start_freq=5, stop_freq=3, freq_scale=2, alter_scale=1,
                    noise_bands=2)
    ft = S.make_freq_tables(h, 48000)
    assert ft.kx == int(ft.f_master[0]) and ft.kx + ft.M <= 64
    assert np.all(np.diff(ft.f_master) > 0)
    assert np.all(np.diff(ft.f_low) > 0)
    assert ft.f_noise[0] == ft.f_low[0] and ft.f_noise[-1] == ft.f_low[-1]
    assert sum(ft.patch_num) == ft.M
    # payload writer <-> parser round trip
    n_high = ft.n[1]
    env = np.full(n_high, 25, np.int64)
    noise = np.full(len(ft.f_noise) - 1, 10, np.int64)
    payload, nbits = S.build_sbr_payload(h, 48000, 16, [[env, env + 1]],
                                         [[noise, noise]], is_cpe=False)
    bs = S.SBRBitstream(48000, 16, is_cpe=False)
    frame = bs.parse(payload, nbits, has_crc=False)
    cd = frame.channels[0]
    assert cd.n_env == 2 and cd.n_q == 2
    np.testing.assert_array_equal(cd.env_q[0], env)
    np.testing.assert_array_equal(cd.env_q[1], env + 1)
    np.testing.assert_array_equal(cd.noise_q[0], noise)


@pytest.mark.parametrize("variant", ["mono", "stereo", "coupled",
                                     "fixfix2", "fixvar", "fixvar1",
                                     "varfix", "varvar", "deltatime"])
def test_sbr_differential_vs_libavcodec_1024(variant):
    """Full-chain oracle: our SBR stage must match libavcodec's conformant
    HE-AAC@1024 decode within 1% RMS on a realistic signal. Variants cover
    the FIXVAR/VARFIX grids (transient frames, round-2 ADVICE medium) and
    the coupled CPE balance path (round-2 ADVICE low)."""
    lib = _lib()
    stereo = variant in ("stereo", "coupled")
    ch = 2 if stereo else 1
    rng = np.random.default_rng(3)
    n = 24000 * 2
    t = np.arange(n) / 24000
    sig = (0.25 * np.sin(2 * np.pi * 700 * t)
           + 0.15 * np.sin(2 * np.pi * 2500 * t + 1.0)
           + 0.05 * rng.standard_normal(n))
    pcm = np.stack([sig] * ch, axis=1)
    if stereo:
        pcm[:, 1] = np.roll(pcm[:, 1], 11)
    pcm16 = np.clip(pcm * 32767, -32768, 32767).astype(np.int16)
    aus, fs = _encode_lc(lib, pcm16, 24000, ch)
    assert fs == 1024 and len(aus) > 20

    hdr = S.SBRHeader(amp_res=1, start_freq=5, stop_freq=3, xover_band=0,
                      freq_scale=2, alter_scale=1, noise_bands=2,
                      limiter_bands=2, limiter_gains=2, interpol_freq=1,
                      smoothing_mode=0)
    ft = S.make_freq_tables(hdr, 48000)
    env = np.full(ft.n[1], 27, np.int64)
    noise = np.full(len(ft.f_noise) - 1, 14, np.int64)
    walker = RawDataBlockWalker(6, 1024)
    if variant == "coupled":
        # ch1 carries stored-domain balance rows (even; env center=12 at
        # amp_res 1, noise center=12): a slight right pan
        bal_env = np.full(ft.n[1], 16, np.int64)
        bal_noise = np.full(len(ft.f_noise) - 1, 14, np.int64)
        payload, nbits = S.build_sbr_payload(
            hdr, 48000, 16, [[env], [bal_env]], [[noise], [bal_noise]],
            is_cpe=True, coupling=True)
    elif variant == "fixfix2":
        # 2-envelope FIXFIX: exercises the multi-envelope 3.0 dB path
        env3 = np.full(ft.n[1], 13, np.int64)
        payload, nbits = S.build_sbr_payload(
            hdr, 48000, 16, [[env3, env3 + 1]], [[noise, noise]])
    elif variant in ("fixvar", "fixvar1", "varfix"):
        fc = S.VARFIX if variant == "varfix" else S.FIXVAR
        # n_env=2; VARFIX pointer=1 exercises the l_a<=1 -> -1 rule and the
        # middleBorder=n_env-1 case; FIXVAR pointer=2 puts l_a at env 1;
        # FIXVAR pointer=1 covers the pointer<=1 middle-border branch
        # (mid = n_env-1) with l_a = n_env (transient in the LAST env).
        # Multi-envelope frames use the header amp_res (3.0 dB): env 13 =
        # 2^20 target, same level as the single-envelope config (values
        # >~20 make the int16 oracle clip and the differential meaningless)
        env3 = np.full(ft.n[1], 13, np.int64)
        ptr = {"fixvar": 2, "fixvar1": 1, "varfix": 1}[variant]
        payload, nbits = S.build_sbr_payload(
            hdr, 48000, 16, [[env3, env3 + 1]], [[noise, noise]],
            is_cpe=False, frame_class=fc, pointer=ptr, var_bord=0,
            rel_bords=[1])
    elif variant == "varvar":
        # 3-envelope VARVAR with both leading and trailing variable
        # borders: t_env = [1, 7, 13, 17] (trailing border past nts=16
        # exercises envelope spill), pointer=2 -> l_a = n_env+1-ptr = 2
        # and middleBorder = n_env+1-ptr = 2. The only grid class with no
        # differential coverage before this variant.
        env3 = np.full(ft.n[1], 13, np.int64)
        payload, nbits = S.build_sbr_payload(
            hdr, 48000, 16, [[env3, env3 + 1, env3]],
            [[noise, noise]], is_cpe=False, frame_class=S.VARVAR,
            pointer=2, var_bord=1, rel_bords=[2],
            var_bord1=1, rel_bords1=[1])
    elif variant == "deltatime":
        # delta-TIME coded envelopes/noise (real broadcasts inter-frame
        # code constantly; df=1 was writer-unreachable before round 3):
        # frame 0 df=0 at env 26, then alternating df=1 frames 28 <-> 26
        e_lo = np.full(ft.n[1], 26, np.int64)
        e_hi = np.full(ft.n[1], 28, np.int64)
        n_lo = np.full(len(ft.f_noise) - 1, 14, np.int64)
        n_hi = np.full(len(ft.f_noise) - 1, 16, np.int64)
        p0 = S.build_sbr_payload(hdr, 48000, 16, [[e_lo]], [[n_lo]])
        p_up = S.build_sbr_payload(
            hdr, 48000, 16, [[e_hi]], [[n_hi]], env_df=[1], noise_df=[1],
            prev_env_rows_per_ch=[e_lo], prev_noise_rows_per_ch=[n_lo],
            send_header=False)
        p_dn = S.build_sbr_payload(
            hdr, 48000, 16, [[e_lo]], [[n_lo]], env_df=[1], noise_df=[1],
            prev_env_rows_per_ch=[e_hi], prev_noise_rows_per_ch=[n_hi],
            send_header=False)
        seq = [p0] + [p_up if k % 2 == 0 else p_dn
                      for k in range(len(aus) - 1)]
        aus_sbr = [S.add_sbr_fill_to_au(au, p[0], p[1], walker)
                   for au, p in zip(aus, seq)]
        payload = None
    else:
        payload, nbits = S.build_sbr_payload(
            hdr, 48000, 16, [[env]] * ch, [[noise]] * ch, is_cpe=stereo)
    if variant != "deltatime":
        aus_sbr = [S.add_sbr_fill_to_au(au, payload, nbits, walker)
                   for au in aus]

    hd = _open(lib, _asc_he(6, ch, 3))
    ref = []
    for au in aus_sbr:
        p, r, c = _decode16(lib, hd, au)
        ref.append(p.reshape(-1, max(c, 1)))
    lib.dec_close(hd)
    # ffmpeg upmixes mono HE-AAC to stereo with identical channels
    ref = np.concatenate(ref)[:, :ch].astype(np.float64)

    hc = _open(lib, _asc_lc(6, ch))
    dec = S.SBRDecoder(48000, num_time_slots=16, is_cpe=stereo)
    ours = []
    for au, au_s in zip(aus, aus_sbr):
        p, r, c = _decode_f32(lib, hc, au)
        if len(p) == 0:
            p = np.zeros(1024 * ch, np.float32)
        sb = walker.walk(au_s).sbr[0]
        o = dec.decode_frame(p.reshape(-1, ch).astype(np.float64),
                             sb.data, sb.nbits, sb.has_crc)
        ours.append(o)
    lib.dec_close(hc)
    ours = np.concatenate(ours)

    a = ref[48000:80000]
    b = ours[48000:80000]
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.01, f"SBR differential rel err {rel}"


def test_sbr_at_960_reconstructs_high_band():
    """At 15 slots (DAB+ 960 frames) there is no external oracle; assert the
    structural contract: 2x output rate, low band passthrough, high-band
    energy matching the envelope target within the limiter's range."""
    hdr = S.SBRHeader(amp_res=1, start_freq=5, stop_freq=3, xover_band=0,
                      freq_scale=2, alter_scale=1, noise_bands=2,
                      limiter_bands=2, limiter_gains=2, interpol_freq=1,
                      smoothing_mode=0)
    ft = S.make_freq_tables(hdr, 48000)
    # single-envelope FIXFIX uses 1.5 dB steps: E = 2^(q/2 + 7)
    env = np.full(ft.n[1], 52, np.int64)
    noise = np.full(len(ft.f_noise) - 1, 14, np.int64)
    payload, nbits = S.build_sbr_payload(hdr, 48000, 15, [[env]], [[noise]])
    dec = S.SBRDecoder(48000, num_time_slots=15, is_cpe=False)
    rng = np.random.default_rng(0)
    n_frames = 40
    t = np.arange(n_frames * 960) / 24000
    core = (8000 * np.sin(2 * np.pi * 2000 * t)
            + 300 * rng.standard_normal(len(t))).reshape(-1, 1)
    outs = [dec.decode_frame(core[i * 960:(i + 1) * 960], payload, nbits)
            for i in range(n_frames)]
    out = np.concatenate(outs)[:, 0]
    assert out.shape[0] == n_frames * 1920
    seg = out[48000:72000]
    F = np.abs(np.fft.rfft(seg * np.hanning(len(seg)))) ** 2
    fr = np.fft.rfftfreq(len(seg), 1 / 48000)
    kx_hz = ft.kx * 375
    low = F[(fr > 1800) & (fr < 2200)].sum()
    high = F[(fr > kx_hz) & (fr < (ft.kx + ft.M) * 375)].sum()
    assert low > 0 and high > 0
    # high band is present and substantial (envelope-controlled), but the
    # signal remains dominated by the core tone
    assert high > 0.01 * low
    # and the band above k2 stays empty
    above = F[fr > (ft.kx + ft.M) * 375 + 400].sum()
    assert above < 0.01 * high


def test_sbr_parser_fuzz_no_crash():
    """Random payload bytes through the stateful SBR(+PS) parser: must
    either parse or raise SBRError/EOFError/ValueError — never crash with
    anything else, never corrupt subsequent valid-frame parsing."""
    rng = np.random.default_rng(99)
    hdr = S.SBRHeader(amp_res=1, start_freq=5, stop_freq=3, smoothing_mode=0)
    ft = S.make_freq_tables(hdr, 48000)
    env = np.full(ft.n[1], 27, np.int64)
    noise = np.full(len(ft.f_noise) - 1, 14, np.int64)
    good, good_bits = S.build_sbr_payload(hdr, 48000, 16, [[env]], [[noise]])
    bs = S.SBRBitstream(48000, 16, is_cpe=False)
    ok = bad = 0
    for k in range(300):
        if k % 3 == 0:
            payload, nbits = good, good_bits
        else:
            n = int(rng.integers(1, 40))
            payload = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            nbits = 8 * n
        try:
            frame = bs.parse(payload, nbits, has_crc=False)
            ok += frame is not None
        except (S.SBRError, EOFError, ValueError):
            bad += 1
    assert ok >= 100    # every good frame (and some lucky fuzz) parses
    # the parser state survived the garbage: a final good frame decodes
    frame = bs.parse(good, good_bits, has_crc=False)
    assert frame is not None and frame.channels
    np.testing.assert_array_equal(frame.channels[0].env_q[0], env)
