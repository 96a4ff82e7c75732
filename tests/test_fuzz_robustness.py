"""Garbage-input robustness for every host byte-protocol layer.

Real broadcasts deliver bit errors past the CRC gates occasionally; no
layer may crash with anything but its declared parse errors, and parser
state must survive garbage (the SBR/PS variant lives in test_sbr.py and
already caught a reserved-PS-mode IndexError escape)."""

import numpy as np

from dab_radio_tpu.ops.crc import crc16


def test_packet_processor_fuzz():
    from dab_radio_tpu.dab.packets import PacketProcessor
    rng = np.random.default_rng(6)
    for fec in (False, True):
        pp = PacketProcessor(packet_address=1, use_fec=fec)
        for _ in range(1500):
            pp.process(rng.integers(0, 256, int(rng.integers(1, 100)),
                                    dtype=np.uint8).tobytes())


def test_mp2_pad_extractor_fuzz():
    from dab_radio_tpu.dab.mp2 import MP2PadExtractor
    rng = np.random.default_rng(7)
    mx = MP2PadExtractor()
    for _ in range(1500):
        mx.process_frame(rng.integers(0, 256, int(rng.integers(1, 300)),
                                      dtype=np.uint8).tobytes())


def test_pad_processor_fuzz():
    from dab_radio_tpu.dab.pad import PADProcessor
    rng = np.random.default_rng(8)
    px = PADProcessor()
    for _ in range(2000):
        fpad = rng.integers(0, 256, 2, dtype=np.uint8).tobytes()
        xpad = rng.integers(0, 256, int(rng.integers(0, 30)),
                            dtype=np.uint8).tobytes()
        px.process(fpad, xpad)


def test_mot_processor_fuzz_crc_valid_garbage():
    """CRC-valid random data groups (what slips past the CRC gate) must
    not crash the MOT assembler."""
    from dab_radio_tpu.dab.packets import parse_data_group
    from dab_radio_tpu.dab.mot import MOTProcessor
    rng = np.random.default_rng(9)
    mp = MOTProcessor()
    n = 0
    for _ in range(1500):
        body = rng.integers(0, 256, int(rng.integers(2, 90)),
                            dtype=np.uint8).tobytes()
        c = crc16(np.frombuffer(body, np.uint8))
        res = parse_data_group(body + bytes([c >> 8, c & 0xFF]))
        if res is None:
            continue
        mp.process_data_group(res, res.data)
        n += 1
    assert n > 500


def test_fig_parser_fuzz_raw():
    """Raw random FIBs through both FIG parsers (the structured fuzz vs
    the reference lives in test_golden_reference)."""
    from dab_radio_tpu.dab.fig import FIGParser
    rng = np.random.default_rng(10)
    p = FIGParser()
    for _ in range(1500):
        fib = rng.integers(0, 256, 30, dtype=np.uint8).tobytes()
        for _ev in p.parse_fib(fib):
            pass


def test_superframe_processor_fuzz():
    from dab_radio_tpu.dab.aac import SuperframeProcessor
    rng = np.random.default_rng(11)
    sfp = SuperframeProcessor()
    for _ in range(1500):
        sfp.process_frame(rng.integers(0, 256, 192,
                                       dtype=np.uint8).tobytes())


def test_aac_decoder_fuzz_corrupted_aus():
    """Bit-corrupted / truncated access units through the FULL HE-AAC v2
    decode (raw_data_block walker -> core -> SBR -> PS synthesis): every
    AU must decode or be rejected — no exception may escape decode_au
    (the superframe CRC gate is not a security boundary; post-CRC
    corruption happens on real RF)."""
    import numpy as np
    from dab_radio_tpu.models.transmitter import ToneAudioSource
    from dab_radio_tpu.dab.aac import SuperFrameHeader
    from dab_radio_tpu.host.codecs import AACDecoder

    hdr = SuperFrameHeader(sampling_rate=48000, is_stereo=False, sbr=True,
                           ps=True, mpeg_surround=0)
    aus = ToneAudioSource(hdr, freq=440.0)(700, 3)
    dec = AACDecoder(hdr)
    if not dec.is_available:
        import pytest
        pytest.skip("codec shim unavailable")
    rng = np.random.default_rng(99)
    ok = err = 0
    for i in range(300):
        au = bytearray(aus[i % len(aus)])
        nflip = int(rng.integers(1, 12))
        for _ in range(nflip):
            p = int(rng.integers(0, len(au)))
            au[p] ^= 1 << int(rng.integers(0, 8))
        if rng.random() < 0.25:
            au = au[:int(rng.integers(1, len(au)))]
        out = dec.decode_au(bytes(au))
        if out is None:
            err += 1
        else:
            pcm, rate, ch = out
            assert rate == 48000 and ch in (1, 2)
            ok += 1
    # both outcomes must occur: silent acceptance of every corruption
    # would mean the parsers aren't validating at all
    assert ok > 0 and err > 0, (ok, err)
