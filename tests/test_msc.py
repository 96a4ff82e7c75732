"""MSC path tests: time (de)interleaver, subchannel encode/decode round
trips, Reed-Solomon codec."""

import numpy as np
import jax.numpy as jnp
import pytest

from dab_radio_tpu.ops.deinterleave import (
    make_gather_index, deinterleave_push, deinterleave_push_block,
    DEPTH, CIF_OFFSETS,
)
from dab_radio_tpu.ops.rs import ReedSolomonDecoder, rs_encode, dab_plus_rs, packet_rs
from dab_radio_tpu.dab.msc import MSCDecoder, MSCEncoder
from dab_radio_tpu.params import SubchannelConfig


def test_deinterleaver_reconstructs_oldest_frame():
    """Push 16 interleaved CIFs built from known frames; the deinterleaved
    output must equal the frame from 15 CIFs ago."""
    nb_bits = 64
    rng = np.random.default_rng(0)
    frames = rng.integers(-127, 128, size=(40, nb_bits)).astype(np.int8)
    offs = CIF_OFFSETS[np.arange(nb_bits) % DEPTH]

    # transmit side: cif[t][i] = frames[t - offs[i]][i]
    cifs = np.zeros_like(frames)
    for t in range(DEPTH, 40):
        for i in range(nb_bits):
            cifs[t, i] = frames[t - offs[i], i]

    hist = jnp.zeros((DEPTH, nb_bits), jnp.int8)
    gidx = jnp.asarray(make_gather_index(nb_bits))
    outs = []
    for t in range(40):
        hist, out = deinterleave_push(hist, jnp.asarray(cifs[t]), gidx)
        outs.append(np.asarray(out))
    # after the pipe is full, output at time t equals frames[t-15]
    for t in range(2 * DEPTH, 40):
        np.testing.assert_array_equal(outs[t], frames[t - 15])


def test_deinterleave_block_matches_scan():
    """deinterleave_push_block (one gather for C CIFs) must be bit-identical
    to C sequential deinterleave_push calls, for any C and batch shape —
    including C that leaves part of the old history in the final window."""
    rng = np.random.default_rng(3)
    nb_bits = 96
    gidx = jnp.asarray(make_gather_index(nb_bits))
    for C in (1, 3, 8, 32):
        for batch in ((), (2,), (2, 3)):
            hist0 = jnp.asarray(rng.integers(
                -127, 128, size=(*batch, DEPTH, nb_bits)).astype(np.int8))
            seq = jnp.asarray(rng.integers(
                -127, 128, size=(*batch, C, nb_bits)).astype(np.int8))
            h = hist0
            outs = []
            for c in range(C):
                h, o = deinterleave_push(h, seq[..., c, :], gidx)
                outs.append(np.asarray(o))
            ref = np.stack(outs, axis=-2)
            hb, ob = deinterleave_push_block(hist0, seq, gidx)
            np.testing.assert_array_equal(np.asarray(ob), ref)
            np.testing.assert_array_equal(np.asarray(hb), np.asarray(h))


@pytest.mark.parametrize("nroots,pad", [(10, 135), (16, 51)])
def test_rs_roundtrip(nroots, pad):
    dec = ReedSolomonDecoder(nroots, pad)
    rng = np.random.default_rng(1)
    k = dec.k
    msg = rng.integers(0, 256, size=(5, k)).astype(np.uint8)
    cw = rs_encode(msg, nroots, pad)
    assert cw.shape == (5, dec.n)

    # no errors
    out, nerr = dec.decode(cw.copy())
    np.testing.assert_array_equal(out, cw)
    assert (nerr == 0).all()

    # correctable errors (t/2 per codeword)
    bad = cw.copy()
    for b in range(5):
        pos = rng.choice(dec.n, size=nroots // 2, replace=False)
        bad[b, pos] ^= rng.integers(1, 256, size=nroots // 2).astype(np.uint8)
    out, nerr = dec.decode(bad)
    np.testing.assert_array_equal(out, cw)
    assert (nerr == nroots // 2).all()

    # uncorrectable
    bad = cw.copy()
    bad[0, :nroots + 2] ^= 0x55
    out, nerr = dec.decode(bad)
    assert nerr[0] == -1


def test_rs_syndrome_zero_for_codeword():
    enc = rs_encode(np.arange(110, dtype=np.uint8)[None], 10, 135)
    dec = dab_plus_rs()
    _, nerr = dec.decode(enc)
    assert nerr[0] == 0


@pytest.mark.parametrize("cfg", [
    SubchannelConfig(0, 48, False, eep_type="A", eep_prot_level=2),
    SubchannelConfig(4, 42, False, eep_type="B", eep_prot_level=1),
    SubchannelConfig(0, 84, True, uep_table_index=33),
])
def test_msc_subchannel_roundtrip(cfg):
    enc = MSCEncoder(cfg)
    dec = MSCDecoder(cfg)
    rng = np.random.default_rng(2)
    total_cif_bits = (cfg.start_address + cfg.length) * 64 + 128

    payloads = [rng.integers(0, 256, enc.nb_data_bytes).astype(np.uint8).tobytes()
                for _ in range(20)]
    decoded = []
    for t in range(20):
        sub_bits = enc.encode_cif(payloads[t])
        # embed at the subchannel's start address inside a larger CIF
        cif = np.zeros(total_cif_bits, dtype=np.int8)
        cif[cfg.start_address * 64: cfg.start_address * 64 + cfg.nb_cif_bits] = sub_bits
        out = dec.decode_cif(cif)
        if out is not None:
            decoded.append(out)
    # pipeline delay: encoder interleaves over 16 CIFs, decoder waits 16;
    # decoded frame k corresponds to payload k (both sides add the same skew)
    assert len(decoded) == 5
    for k, out in enumerate(decoded):
        assert out == payloads[k], f"frame {k} mismatch"


def test_msc_group_decode_matches_individual():
    """decode_frame_group (one batched dispatch over same-protection
    subchannels) must produce exactly what per-decoder decode_frame does."""
    from dab_radio_tpu.dab.msc import decode_frame_group, group_key
    cfgs = [
        SubchannelConfig(0, 48, False, eep_type="A", eep_prot_level=2),
        SubchannelConfig(48, 48, False, eep_type="A", eep_prot_level=2),
        SubchannelConfig(100, 48, False, eep_type="A", eep_prot_level=2),
    ]
    assert len({group_key(c) for c in cfgs}) == 1
    encs = [MSCEncoder(c) for c in cfgs]
    dec_ref = [MSCDecoder(c) for c in cfgs]
    dec_grp = [MSCDecoder(c) for c in cfgs]
    rng = np.random.default_rng(3)
    nb_cifs = 4
    total_cif_bits = 160 * 64

    for frame in range(6):
        cifs = np.zeros((nb_cifs, total_cif_bits), dtype=np.int8)
        for enc, cfg in zip(encs, cfgs):
            for c in range(nb_cifs):
                payload = rng.integers(0, 256, enc.nb_data_bytes
                                       ).astype(np.uint8).tobytes()
                s = cfg.start_address * 64
                cifs[c, s:s + cfg.nb_cif_bits] = enc.encode_cif(payload)
        ref_out = [d.decode_frame(cifs) for d in dec_ref]
        grp_out = decode_frame_group(dec_grp, cifs)
        assert ref_out == grp_out


def test_msc_roundtrip_tiled_mode():
    """The tiled Viterbi mode decodes the subchannel stream identically on
    clean input (set_decode_mode is process-global; restore after)."""
    from dab_radio_tpu.dab.msc import set_decode_mode
    cfg = SubchannelConfig(0, 48, False, eep_type="A", eep_prot_level=2)
    set_decode_mode("tiled")
    try:
        enc = MSCEncoder(cfg)
        dec = MSCDecoder(cfg)
        rng = np.random.default_rng(5)
        payloads = [rng.integers(0, 256, enc.nb_data_bytes
                                 ).astype(np.uint8).tobytes()
                    for _ in range(20)]
        decoded = []
        for t in range(20):
            cif = np.zeros(cfg.nb_cif_bits, dtype=np.int8)
            cif[:] = enc.encode_cif(payloads[t])
            out = dec.decode_cif(cif)
            if out is not None:
                decoded.append(out)
        assert decoded == payloads[:len(decoded)] and len(decoded) == 5
    finally:
        set_decode_mode("exact")


@pytest.mark.parametrize("nroots,pad", [(10, 135), (16, 51)])
def test_rs_vectorized_matches_scalar(nroots, pad):
    """The batched BM/Chien/Forney path must match the scalar reference on
    every error weight from 0 to beyond capacity."""
    dec = ReedSolomonDecoder(nroots, pad)
    rng = np.random.default_rng(7)
    msg = rng.integers(0, 256, size=(40, dec.k)).astype(np.uint8)
    cw = rs_encode(msg, nroots, pad)
    bad = cw.copy().astype(np.int32)
    weights = []
    for b in range(40):
        w = b % (nroots // 2 + 3)   # 0..t/2+2 errors (some uncorrectable)
        weights.append(w)
        pos = rng.choice(dec.n, size=w, replace=False)
        bad[b, pos] ^= rng.integers(1, 256, w).astype(np.int32)

    out_vec, nerr_vec = dec.decode(bad.astype(np.uint8))

    # scalar oracle row by row
    exp, _ = __import__("dab_radio_tpu.ops.rs", fromlist=["_tables"])._tables()[0], None
    for b in range(40):
        row = bad[b].copy()
        pw = np.arange(dec.n)[::-1]
        from dab_radio_tpu.ops.rs import _gf_mul, _tables
        e, _ = _tables()
        S = [int(np.bitwise_xor.reduce(_gf_mul(row, e[(pw * j) % 255])))
             for j in range(nroots)]
        if not any(S):
            assert nerr_vec[b] == 0
            np.testing.assert_array_equal(out_vec[b], cw[b])
            continue
        ref_row = row.copy()
        ref_n = dec._decode_one(ref_row, S)
        assert nerr_vec[b] == ref_n, (b, weights[b])
        if ref_n >= 0:
            np.testing.assert_array_equal(out_vec[b], ref_row)
