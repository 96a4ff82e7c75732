"""Differential codec fuzz: valid-but-mutated SBR/PS bitstreams vs libavcodec.

Round-3's codec fuzz was decode-or-reject (no escaping exceptions); this is
the next level the VERDICT asked for: mutate SBR and PS bitstream FIELDS
within their spec ranges (ISO/IEC 14496-3 sbr_data / ps_data), splice each
mutation into a real LC AU stream, and assert RMS-BOUNDED AGREEMENT against
libavcodec's conformant HE-AAC(v2)@1024 decode per mutation class — the
codec analog of the FIG differential fuzz that caught the reference's
FIG 0/13 out-of-bounds bug (docs/FINDINGS.md #2).

Classes (each N seeded draws x ~35 AUs; >=1,500 mutated frames total):
  env        random envelope rows/counts/resolutions (delta-freq coded)
  noise      random noise-floor rows
  header     random SBR header tuples (start/stop freq, freq_scale,
             alter_scale, noise/limiter bands, amp_res, interpol)
  grid       random FIXVAR/VARFIX/VARVAR grids (borders, pointer)
  invf       random inverse-filtering modes per noise band
  deltatime  random inter-frame delta-time coding walks
  coupled    CPE coupling with random balance rows
  ps         random PS configs (iid/icc modes+values, VAR grids)

A draw where libavcodec itself rejects most frames is skipped (the writer
stays within spec, so this is rare); our decoder must never raise either
way. Divergence beyond the class tolerance fails the test and is either a
bug to fix or a libavcodec defect to pin.
"""

import ctypes
import zlib

import numpy as np
import pytest

from dab_radio_tpu.dab.bits import BitWriter
from dab_radio_tpu.dab.ps import PSData, nr_par
from dab_radio_tpu.dab import sbr as S
from dab_radio_tpu.dab.aac_bits import RawDataBlockWalker
from dab_radio_tpu.host.native import codecs_lib

from tests.test_sbr import (_lib, _asc_lc, _asc_he, _open, _decode16,
                            _decode_f32, _encode_lc)


@pytest.fixture(scope="module")
def base():
    lib = _lib()
    rng = np.random.default_rng(3)
    n = 24000 * 2
    t = np.arange(n) / 24000
    sig = (0.25 * np.sin(2 * np.pi * 700 * t)
           + 0.15 * np.sin(2 * np.pi * 2500 * t + 1.0)
           + 0.05 * rng.standard_normal(n))
    pcm16 = np.clip(sig[:, None] * 32767, -32768, 32767).astype(np.int16)
    aus_m, fs = _encode_lc(lib, pcm16, 24000, 1)
    assert fs == 1024 and len(aus_m) > 20
    pcm2 = np.stack([sig, np.roll(sig, 11)], axis=1)
    pcm16s = np.clip(pcm2 * 32767, -32768, 32767).astype(np.int16)
    aus_s, fs = _encode_lc(lib, pcm16s, 24000, 2)
    assert fs == 1024
    return lib, aus_m, aus_s


_HDR_BASE = dict(amp_res=1, start_freq=5, stop_freq=3, xover_band=0,
                 freq_scale=2, alter_scale=1, noise_bands=2,
                 limiter_bands=2, limiter_gains=2, interpol_freq=1,
                 smoothing_mode=0)


def _rows(ft, rng, n_env, amp_res_eff, freq_res=1):
    """Random in-range envelope + noise rows for this frequency layout."""
    nb = ft.n[freq_res]
    target = 26 if amp_res_eff == 0 else 13
    envs = [np.clip(target + rng.integers(-4, 5, nb), 0, 30 if
                    amp_res_eff == 0 else 20).astype(np.int64)
            for _ in range(n_env)]
    nq = len(ft.f_noise) - 1
    noises = [rng.integers(5, 26, nq).astype(np.int64)
              for _ in range(1 if n_env == 1 else 2)]
    return envs, noises


def _draw_payload(cls, rng, is_cpe=False):
    """One in-spec mutated frame payload for the class. Returns
    (payload, nbits, hdr) or a per-frame payload list for deltatime."""
    hdr = S.SBRHeader(**_HDR_BASE)
    if cls == "header":
        for _ in range(50):
            cand = dict(_HDR_BASE)
            cand.update(
                amp_res=int(rng.integers(0, 2)),
                start_freq=int(rng.integers(0, 12)),
                stop_freq=int(rng.integers(0, 9)),
                freq_scale=int(rng.integers(1, 4)),
                alter_scale=int(rng.integers(0, 2)),
                noise_bands=int(rng.integers(1, 3)),
                limiter_bands=int(rng.integers(0, 4)),
                limiter_gains=int(rng.integers(0, 3)),
                interpol_freq=int(rng.integers(0, 2)),
                smoothing_mode=int(rng.integers(0, 2)))
            try:
                h = S.SBRHeader(**cand)
                ft = S.make_freq_tables(h, 48000)
            except Exception:
                continue
            if (ft.M >= 2 and ft.kx + ft.M <= 64 and ft.kx >= 8
                    and ft.n[1] >= 2 and len(ft.f_noise) >= 2
                    and np.all(np.diff(ft.f_master) > 0)):
                hdr = h
                break
        else:
            pytest.skip("no valid random header found")
    ft = S.make_freq_tables(hdr, 48000)

    if cls == "env":
        freq_res = int(rng.integers(0, 2))
        n_env = int(rng.integers(1, 3))
        envs, noises = _rows(ft, rng, n_env,
                             0 if n_env == 1 else hdr.amp_res, freq_res)
        p, nb = S.build_sbr_payload(hdr, 48000, 16, [envs], [noises],
                                    is_cpe=False, freq_res=freq_res)
        return p, nb, hdr
    if cls == "noise":
        envs, noises = _rows(ft, rng, 2, hdr.amp_res)
        noises = [rng.integers(0, 31, len(ft.f_noise) - 1).astype(np.int64)
                  for _ in range(2)]
        p, nb = S.build_sbr_payload(hdr, 48000, 16, [envs], [noises])
        return p, nb, hdr
    if cls == "header":
        n_env = int(rng.integers(1, 3))
        envs, noises = _rows(ft, rng, n_env,
                             0 if n_env == 1 else hdr.amp_res)
        p, nb = S.build_sbr_payload(hdr, 48000, 16, [envs], [noises])
        return p, nb, hdr
    if cls == "invf":
        envs, noises = _rows(ft, rng, 1, 0)
        invf = [int(v) for v in rng.integers(0, 4, len(ft.f_noise) - 1)]
        p, nb = S.build_sbr_payload(hdr, 48000, 16, [envs], [noises],
                                    invf_modes=invf)
        return p, nb, hdr
    if cls == "grid":
        fc = [S.FIXVAR, S.VARFIX, S.VARVAR][int(rng.integers(0, 3))]
        if fc == S.VARVAR:
            n_lead = int(rng.integers(1, 3))
            n_trail = int(rng.integers(1, 3))
            n_env = n_lead + n_trail + 1
            if n_env > 4:
                n_env, n_lead, n_trail = 3, 1, 1
            kw = dict(frame_class=fc, pointer=int(rng.integers(0, n_env + 1)),
                      var_bord=int(rng.integers(0, 3)),
                      rel_bords=[int(rng.integers(1, 3))] * n_lead,
                      var_bord1=int(rng.integers(0, 3)),
                      rel_bords1=[int(rng.integers(1, 3))] * n_trail)
        else:
            n_env = int(rng.integers(2, 4))
            kw = dict(frame_class=fc, pointer=int(rng.integers(0, n_env + 1)),
                      var_bord=int(rng.integers(0, 3)),
                      rel_bords=[int(rng.integers(1, 3))] * (n_env - 1))
        envs, noises = _rows(ft, rng, n_env, hdr.amp_res)
        p, nb = S.build_sbr_payload(hdr, 48000, 16, [envs], [noises], **kw)
        # in-spec means STRICTLY MONOTONE envelope borders (libavcodec
        # rejects the frame otherwise: "Not strictly monotone time
        # borders"); random border/pointer combos can violate it — parse
        # the candidate back and redraw until valid
        try:
            bs = S.SBRBitstream(48000, 16, is_cpe=False)
            t_env = bs.parse(p, nb, has_crc=False).channels[0].t_env
            ok = bool(np.all(np.diff(np.asarray(t_env)) > 0))
        except S.SBRError:
            ok = False          # our parser rejects them too
        if not ok:
            return _draw_payload(cls, rng, is_cpe)
        return p, nb, hdr
    if cls == "coupled":
        envs, noises = _rows(ft, rng, 1, 0)
        # channel-1 rows are stored-domain balance (even values, center 12
        # at amp_res 1 / 24 at amp_res 0; single-env frames use 1.5 dB)
        bal_e = 24 + 2 * rng.integers(-4, 5, ft.n[1])
        bal_n = 12 + 2 * rng.integers(-3, 4, len(ft.f_noise) - 1)
        p, nb = S.build_sbr_payload(
            hdr, 48000, 16, [envs, [bal_e.astype(np.int64)]],
            [noises, [bal_n.astype(np.int64)]], is_cpe=True, coupling=True)
        return p, nb, hdr
    raise AssertionError(cls)


def _sbr_differential(lib, aus, payloads, is_cpe, span=(48000, 80000)):
    """rel RMS between libavcodec HE decode and LC + our SBR, splicing
    payloads[i] into aus[i]."""
    ch = 2 if is_cpe else 1
    walker = RawDataBlockWalker(6, 1024)
    aus_sbr = [S.add_sbr_fill_to_au(au, p, nb, walker)
               for au, (p, nb) in zip(aus, payloads)]
    hd = _open(lib, _asc_he(6, ch, 3))
    ref, rejected = [], 0
    for au in aus_sbr:
        p, r, c = _decode16(lib, hd, au)
        if len(p) == 0:
            rejected += 1
            ref.append(np.zeros((2048, max(ch, 1)), np.int16))
            continue
        ref.append(p.reshape(-1, max(c, 1)))
    lib.dec_close(hd)
    if rejected > len(aus_sbr) // 5:
        return None                      # libavcodec refused this draw
    ref = np.concatenate(ref)[:, :ch].astype(np.float64)

    hc = _open(lib, _asc_lc(6, ch))
    dec = S.SBRDecoder(48000, num_time_slots=16, is_cpe=is_cpe)
    ours = []
    for au, au_s in zip(aus, aus_sbr):
        p, r, c = _decode_f32(lib, hc, au)
        if len(p) == 0:
            p = np.zeros(1024 * ch, np.float32)
        sb = walker.walk(au_s).sbr[0]
        ours.append(dec.decode_frame(p.reshape(-1, ch).astype(np.float64),
                                     sb.data, sb.nbits, sb.has_crc))
    lib.dec_close(hc)
    ours = np.concatenate(ours)
    a, b = ref[span[0]:span[1]], ours[span[0]:span[1]]
    return float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9))


# tolerance per class: the curated variants hold <1%; random draws admit
# more quantizer-edge energy (random noise floors, limiter corners)
_TOL = {"env": 0.02, "noise": 0.02, "header": 0.03, "grid": 0.025,
        "invf": 0.02, "coupled": 0.025, "deltatime": 0.02}


@pytest.mark.slow
@pytest.mark.parametrize("cls,n_draws", [
    ("env", 14), ("noise", 10), ("header", 16), ("grid", 16),
    ("invf", 8), ("coupled", 10),
])
def test_sbr_mutation_class_differential(base, cls, n_draws):
    lib, aus_m, aus_s = base
    aus = aus_s if cls == "coupled" else aus_m
    rels, skipped = [], 0
    for draw in range(n_draws):
        rng = np.random.default_rng(
            zlib.crc32(cls.encode()) % 99991 + draw)
        p, nb, hdr = _draw_payload(cls, rng, is_cpe=(cls == "coupled"))
        rel = _sbr_differential(lib, aus, [(p, nb)] * len(aus),
                                is_cpe=(cls == "coupled"))
        if rel is None:
            skipped += 1
            continue
        rels.append(rel)
    assert len(rels) >= max(2, n_draws - 2), \
        f"{cls}: libavcodec rejected {skipped}/{n_draws} draws"
    assert max(rels) < _TOL[cls], \
        f"{cls}: rel errs {['%.4f' % r for r in rels]}"
    print(f"# fuzz {cls}: {len(rels)} draws x {len(aus)} frames, "
          f"max rel {max(rels):.4f}")


@pytest.mark.slow
def test_sbr_mutation_deltatime_walk(base):
    """Random inter-frame delta-time walks: each frame delta-codes its
    envelopes/noise against the previous frame's ACTUAL rows."""
    lib, aus_m, _ = base
    hdr = S.SBRHeader(**_HDR_BASE)
    ft = S.make_freq_tables(hdr, 48000)
    rels = []
    for draw in range(6):
        rng = np.random.default_rng(7000 + draw)
        nb_bands = ft.n[1]
        nq = len(ft.f_noise) - 1
        env = np.full(nb_bands, 26, np.int64)
        noi = np.full(nq, 14, np.int64)
        payloads = [S.build_sbr_payload(hdr, 48000, 16, [[env]], [[noi]])]
        for _ in range(len(aus_m) - 1):
            nxt_e = np.clip(env + rng.integers(-2, 3, nb_bands), 18, 30)
            nxt_n = np.clip(noi + rng.integers(-2, 3, nq), 2, 28)
            df = int(rng.integers(0, 2))
            payloads.append(S.build_sbr_payload(
                hdr, 48000, 16, [[nxt_e]], [[nxt_n]],
                env_df=[df], noise_df=[df],
                prev_env_rows_per_ch=[env], prev_noise_rows_per_ch=[noi],
                send_header=False))
            env, noi = nxt_e, nxt_n
        rel = _sbr_differential(lib, aus_m, payloads, is_cpe=False)
        assert rel is not None
        rels.append(rel)
    assert max(rels) < _TOL["deltatime"], rels
    print(f"# fuzz deltatime: {len(rels)} walks x {len(aus_m)} frames, "
          f"max rel {max(rels):.4f}")


@pytest.mark.slow
def test_ps_mutation_class_differential(base):
    """Random in-spec PS configs: iid/icc modes and values, FIX/VAR grids.
    HE-AAC v2 reference decode vs LC + our SBR + our PS synthesis."""
    lib, aus_m, _ = base
    hdr = S.SBRHeader(**_HDR_BASE)
    ft = S.make_freq_tables(hdr, 48000)
    env = np.full(ft.n[1], 27, np.int64)
    noise = np.full(len(ft.f_noise) - 1, 14, np.int64)
    walker = RawDataBlockWalker(6, 1024)

    def asc_hev2(fs_core, ch, fs_out):
        bw = BitWriter()
        bw.write(2, 5).write(fs_core, 4).write(ch, 4)
        bw.write(0, 1).write(0, 1).write(0, 1)
        bw.write(0x2B7, 11).write(5, 5).write(1, 1).write(fs_out, 4)
        bw.write(0x548, 11).write(1, 1)
        return bw.tobytes()

    rels = []
    for draw in range(14):
        rng = np.random.default_rng(9000 + draw)
        iid_mode = int(rng.integers(0, 6))       # 0-2 coarse, 3-5 fine
        icc_mode = int(rng.integers(0, 3))
        lim = 7 if iid_mode < 3 else 15
        num_env = int(rng.integers(1, 3))
        d = PSData(enable_iid=True, iid_mode=iid_mode,
                   enable_icc=True, icc_mode=icc_mode, num_env=num_env)
        if num_env == 2:
            d.frame_class = 1
            d.border_position = sorted(
                {int(rng.integers(4, 16)), int(rng.integers(17, 32))})
        d.iid_par = rng.integers(-lim, lim + 1,
                                 (num_env, nr_par(iid_mode))
                                 ).astype(np.int64)
        d.icc_par = rng.integers(0, 8, (num_env, nr_par(icc_mode))
                                 ).astype(np.int64)
        payload, nbits = S.build_sbr_payload(hdr, 48000, 16, [[env]],
                                             [[noise]], ps_data=d)
        aus_ps = [S.add_sbr_fill_to_au(au, payload, nbits, walker)
                  for au in aus_m]

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
        ref = np.concatenate(ref).astype(np.float64)
        assert ref.shape[1] == 2

        hc = _open(lib, _asc_lc(6, 1))
        dec = S.SBRDecoder(48000, num_time_slots=16, is_cpe=False)
        ours = []
        for au, au_s in zip(aus_m, aus_ps):
            p, r, c = _decode_f32(lib, hc, au)
            core = (p.reshape(-1, 1).astype(np.float64) if len(p)
                    else np.zeros((1024, 1)))
            sb = walker.walk(au_s).sbr[0]
            ours.append(dec.decode_frame(core, sb.data, sb.nbits,
                                         sb.has_crc))
        lib.dec_close(hc)
        ours = np.concatenate(ours)
        assert ours.shape[1] == 2, "PS synthesis did not produce stereo"

        # PS carries ~1 frame of filterbank latency: align by correlation
        a = ref[40000:72000, 0]
        best_lag, best = 0, -1.0
        for lag in range(1500, 2600):
            bseg = ours[40000 + lag:72000 + lag, 0]
            v = float(np.dot(a, bseg)) / (np.linalg.norm(a) *
                                          np.linalg.norm(bseg) + 1e-9)
            if v > best:
                best, best_lag = v, lag
        # Error relative to PROGRAM scale (stereo Frobenius), not per
        # channel: extreme random IID pans (fine indices near ±15) leave
        # one channel 25+ dB down where a per-channel ratio degenerates —
        # a constant-index sweep shows our ABSOLUTE error on the panned
        # channel shrinking monotonically (680 -> 105 LSB from index 8 to
        # 15) while the ratio grows, i.e. the pan itself tracks libavcodec
        # exactly and the residual is the common-mode ~0.35% floor. A
        # separate per-channel NORM check still catches a genuinely wrong
        # pan (e.g. a silent channel that should carry -20 dB content).
        a = ref[40000:72000]
        b = ours[40000 + best_lag:72000 + best_lag]
        total = max(float(np.linalg.norm(a)), 1e-9)
        rels.append(float(np.linalg.norm(a - b)) / total)
        for chn in range(2):
            na, nb = np.linalg.norm(a[:, chn]), np.linalg.norm(b[:, chn])
            assert abs(na - nb) / max(na, 0.02 * total) < 0.15, \
                (draw, chn, na, nb)
    assert max(rels) < 0.02, \
        f"ps: rel errs {['%.4f' % r for r in rels]}"
    print(f"# fuzz ps: {len(rels)} draws x {len(aus_m)} frames, "
          f"max rel {max(rels):.4f}")
