"""PAD closed loop: build X-PAD fields carrying a dynamic label and a MOT
slideshow, route through PADProcessor, verify label text and slideshow
reconstruction (incl. AAC data_stream_element extraction)."""

import numpy as np
import pytest

from dab_radio_tpu.ops.crc import crc16
from dab_radio_tpu.dab.pad import PADProcessor, CI_LENGTH_TABLE
from dab_radio_tpu.dab.aac_data import AACDataDecoder, build_data_stream_element
from dab_radio_tpu.dab.slideshow import SlideshowManager
from tests.test_packets import build_mot_segment, build_mot_header  # reuse builders
from dab_radio_tpu.dab.mot import HEADER, UNSCRAMBLED_BODY


# ---- TX-side helpers ----

def fpad_for(xpad_len_kind, ci_flag):
    """xpad_len_kind: 'short' (0b01) or 'variable' (0b10)."""
    indicator = 0b01 if xpad_len_kind == "short" else 0b10
    b0 = (0 << 6) | (indicator << 4)
    b1 = (int(ci_flag) << 1)
    return bytes([b0, b1])


def label_data_groups(text: str, charset=0):
    """Dynamic label segments -> list of (is_first, group_bytes)."""
    data = text.encode("ascii")
    segs = [data[i:i + 16] for i in range(0, len(data), 16)]
    groups = []
    for i, seg in enumerate(segs):
        is_first = i == 0
        is_last = i == len(segs) - 1
        toggle = 1
        b0 = (toggle << 7) | ((int(is_first) << 1 | int(is_last)) << 5) \
            | (0 << 4) | (len(seg) - 1)
        field2 = charset if is_first else i
        b1 = (field2 << 4)
        g = bytes([b0, b1]) + seg
        g += crc16(g).to_bytes(2, "big")
        groups.append(g)
    return groups


def chunk_xpad_fields(payload: bytes, app_start: int, app_cont: int,
                      length_prefix: bytes = b""):
    """Split a data group into variable-size X-PAD subfields with CI lists.
    Returns a list of (fpad, xpad_reversed) pairs ready for PADProcessor."""
    fields = []
    CHUNK = 48
    pieces = [payload[i:i + CHUNK] for i in range(0, len(payload), CHUNK)]
    for k, piece in enumerate(pieces):
        sub = piece.ljust(CHUNK, b"\x00")
        li = CI_LENGTH_TABLE.index(CHUNK)
        app = app_start if k == 0 else app_cont
        cis = bytearray()
        data = bytearray()
        if k == 0 and length_prefix:
            cis.append((CI_LENGTH_TABLE.index(4) << 5) | 1)
            data += length_prefix.ljust(4, b"\x00")
        cis.append((li << 5) | app)
        if len(cis) < 4:
            cis.append(0)                      # end marker
        xpad = bytes(cis) + bytes(data) + sub
        fields.append((fpad_for("variable", True), bytes(reversed(xpad))))
    return fields


def dli_prefix(group_len: int) -> bytes:
    b = bytes([(group_len >> 8) & 0b111111, group_len & 0xFF])
    return b + crc16(b).to_bytes(2, "big")


def test_dynamic_label():
    proc = PADProcessor()
    labels = []
    proc.on_label.append(labels.append)
    for g in label_data_groups("Now playing: TPU Radio hits!"):
        for fpad, xpad in chunk_xpad_fields(g, 2, 3):
            proc.process(fpad, xpad)
    assert labels and labels[-1] == "Now playing: TPU Radio hits!"


def test_mot_slideshow_over_xpad():
    rng = np.random.default_rng(0)
    body = rng.integers(0, 256, 500).astype(np.uint8).tobytes()
    tid = 77
    hdr = build_mot_header(body, content_name="slide.png")
    # patch content subtype to PNG (3)
    hdr = bytearray(hdr)
    hdr[5] = (hdr[5] & 0x81) | (2 << 1)          # content_type=2 image
    hdr[6] = 3                                   # subtype png
    groups = [build_mot_segment(HEADER, 0, True, tid, bytes(hdr))]
    segs = [body[i:i + 128] for i in range(0, len(body), 128)]
    for i, s in enumerate(segs):
        groups.append(build_mot_segment(UNSCRAMBLED_BODY, i,
                                        i == len(segs) - 1, tid, s))

    proc = PADProcessor()
    slides = []
    mgr = SlideshowManager()
    mgr.on_slideshow.append(slides.append)
    proc.on_mot_entity.append(mgr.process_mot_entity)
    for g in groups:
        for fpad, xpad in chunk_xpad_fields(g, 12, 13,
                                            length_prefix=dli_prefix(len(g))):
            proc.process(fpad, xpad)
    assert len(slides) == 1
    s = slides[0]
    assert s.image_type == "png"
    assert s.data == body
    assert s.name == "slide.png"


def test_aac_data_stream_element_roundtrip():
    proc = AACDataDecoder()
    labels = []
    proc.pad.on_label.append(labels.append)
    for g in label_data_groups("DSE label"):
        for fpad, xpad_rev in chunk_xpad_fields(g, 2, 3):
            au = build_data_stream_element(fpad, xpad_rev) + b"\xAA" * 10
            assert proc.process_access_unit(au)
    assert labels and labels[-1] == "DSE label"


def test_mp2_header_and_pad_location():
    from dab_radio_tpu.dab.mp2 import parse_mp2_header, locate_pad
    # MPEG-1 Layer II, 128 kbps, 48 kHz, stereo
    hdr = bytes([0xFF, 0xFC | 0b00, (8 << 4) | (1 << 2), 0x00])
    h = parse_mp2_header(hdr + b"\x00" * 100)
    assert h is not None
    assert h.sample_rate == 48000 and h.bitrate_kbps == 128
    assert h.frame_bytes == 1152 * 128000 // 8 // 48000
    frame = hdr + bytes(range(100))
    fpad, xpad = locate_pad(frame, h)
    assert fpad == frame[-2:]
    assert xpad[-1] == frame[-7]    # 4 scale-factor CRC bytes skipped
