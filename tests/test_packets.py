"""Packet mode + MOT round trip: build MOT header-mode data groups, packetize,
run through PacketProcessor (with and without the RS FEC layer)."""

import numpy as np
import pytest

from dab_radio_tpu.ops.crc import crc16
from dab_radio_tpu.ops.rs import rs_encode
from dab_radio_tpu.dab.packets import (
    PacketProcessor, RSPacketFEC, PACKET_LENGTH, FEC_ADDRESS,
    APP_DATA_TABLE, RS_ROWS, RS_DATA, RS_PARITY, FEC_PACKET_LEN,
    TOTAL_FEC_PACKETS, FEC_HDR,
)
from dab_radio_tpu.dab.mot import HEADER, UNSCRAMBLED_BODY


# ---- TX-side builders (shared with the transmitter: models/pad_writer) ----

from dab_radio_tpu.models.pad_writer import (  # noqa: E402
    build_data_group, build_mot_header, build_mot_segment)


def packetize(data_group: bytes, address: int, start_ci=0):
    """Split one data group into 96/24-byte packets (first/intermediate/last)."""
    packets = []
    max_useful = {96: 91, 72: 67, 48: 43, 24: 19}
    pieces = [data_group[i:i + 91] for i in range(0, len(data_group), 91)]
    ci = start_ci
    for k, piece in enumerate(pieces):
        if len(pieces) == 1:
            loc = 0b11
        elif k == 0:
            loc = 0b10
        elif k == len(pieces) - 1:
            loc = 0b01
        else:
            loc = 0b00
        # pick smallest packet length that fits
        plen = next(L for L in PACKET_LENGTH if L - 5 >= len(piece))
        lid = PACKET_LENGTH.index(plen)
        p = bytearray(plen)
        p[0] = (lid << 6) | ((ci & 0b11) << 4) | (loc << 2) | ((address >> 8) & 0b11)
        p[1] = address & 0xFF
        p[2] = len(piece)
        p[3:3 + len(piece)] = piece
        c = crc16(bytes(p[:-2]))
        p[-2], p[-1] = c >> 8, c & 0xFF
        packets.append(bytes(p))
        ci = (ci + 1) % 4
    return packets, ci


def make_mot_stream(address=42, body_len=300, seed=0):
    rng = np.random.default_rng(seed)
    body = rng.integers(0, 256, body_len).astype(np.uint8).tobytes()
    tid = 0x1234
    groups = [build_mot_segment(HEADER, 0, True, tid, build_mot_header(body))]
    seg_size = 128
    segs = [body[i:i + seg_size] for i in range(0, len(body), seg_size)]
    for i, s in enumerate(segs):
        groups.append(build_mot_segment(UNSCRAMBLED_BODY, i,
                                        i == len(segs) - 1, tid, s))
    stream, ci = [], 0
    for g in groups:
        pkts, ci = packetize(g, address, ci)
        stream += pkts
    return b"".join(stream), body


def test_packet_mot_roundtrip():
    stream, body = make_mot_stream()
    proc = PacketProcessor(packet_address=42)
    got = []
    proc.mot.on_entity.append(got.append)
    proc.process(stream)
    assert proc.stats["crc_errors"] == 0
    assert proc.stats["data_groups"] >= 4
    assert len(got) == 1
    ent = got[0]
    assert ent.transport_id == 0x1234
    assert ent.body == body
    assert ent.header.content_name == "test.jpg"
    assert ent.header.content_type == 2 and ent.header.content_sub_type == 1


def test_packet_address_filter():
    stream, _ = make_mot_stream(address=42)
    proc = PacketProcessor(packet_address=7)
    got = []
    proc.mot.on_entity.append(got.append)
    proc.process(stream)
    assert len(got) == 0
    assert proc.stats["address_filtered"] > 0


def _fec_frame(app_packets: bytes, corrupt=0, seed=0):
    """Build one complete FEC frame: 2256 app bytes + 9 FEC packets."""
    assert len(app_packets) == APP_DATA_TABLE
    app = np.frombuffer(app_packets, dtype=np.uint8)
    msgs = app.reshape(RS_DATA, RS_ROWS).T                    # (12, 188)
    cw = rs_encode(msgs, RS_PARITY, 51)                       # (12, 204)
    parity = cw[:, RS_DATA:].T.reshape(-1).tobytes()          # 192 bytes
    parity += b"\x00" * 6                                     # padding
    fec_packets = bytearray()
    for i in range(TOTAL_FEC_PACKETS):
        hdr0 = (0 << 6) | ((i & 0xF) << 2) | ((FEC_ADDRESS >> 8) & 0b11)
        fec_packets += bytes([hdr0, FEC_ADDRESS & 0xFF])
        fec_packets += parity[i * (FEC_PACKET_LEN - FEC_HDR):
                              (i + 1) * (FEC_PACKET_LEN - FEC_HDR)]
    frame = bytearray(app_packets + bytes(fec_packets))
    if corrupt:
        # avoid packet-start offsets (multiples of 24): a corrupted length
        # header breaks stream framing, which FEC cannot repair (the
        # reference has the same constraint)
        rng = np.random.default_rng(seed)
        candidates = np.array([p for p in range(APP_DATA_TABLE) if p % 24])
        for pos in rng.choice(candidates, corrupt, replace=False):
            frame[pos] ^= 0xFF
    return bytes(frame)


def test_packet_fec_corrects_errors():
    stream, body = make_mot_stream(address=42, body_len=600)
    # pad the app stream to a whole number of FEC frames with idle packets
    pad_packet = bytearray(24)
    pad_packet[0] = (0 << 6) | (0b11 << 2) | ((1023 >> 8) & 0b11)
    pad_packet[1] = 1023 & 0xFF
    c = crc16(bytes(pad_packet[:-2]))
    pad_packet[-2], pad_packet[-1] = c >> 8, c & 0xFF
    while len(stream) % APP_DATA_TABLE:
        stream += bytes(pad_packet)

    frames = b"".join(
        _fec_frame(stream[i:i + APP_DATA_TABLE], corrupt=60, seed=i)
        for i in range(0, len(stream), APP_DATA_TABLE))

    proc = PacketProcessor(packet_address=42, use_fec=True)
    got = []
    proc.mot.on_entity.append(got.append)
    proc.process(frames)
    assert proc._fec.stats["rs_failures"] == 0
    assert proc._fec.stats["corrected"] > 0
    assert len(got) == 1 and got[0].body == body
