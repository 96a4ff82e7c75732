"""Mixed-ensemble end-to-end: DAB+ audio + classic DAB (MP2) + packet-mode
MOT services through the full RF chain, exercising all three channel types.
"""

import numpy as np
import pytest

from dab_radio_tpu.params import SubchannelConfig
from dab_radio_tpu.models.transmitter import EnsembleTransmitter, ServiceSpec
from dab_radio_tpu.models.demodulator import OFDMDemodulator, StreamingDemodulator
from dab_radio_tpu.models.receiver import DabReceiver
from tests.test_packets import build_mot_segment, build_mot_header
from dab_radio_tpu.dab.mot import HEADER, UNSCRAMBLED_BODY


@pytest.fixture(scope="module")
def mixed_system():
    services = [
        ServiceSpec(0xA001, 1, "AAC Service",
                    SubchannelConfig(0, 48, False, eep_type="A",
                                     eep_prot_level=2), kind="dab+"),
        ServiceSpec(0xA002, 2, "MP2 Service",
                    SubchannelConfig(48, 84, True, uep_table_index=33),
                    kind="dab"),
        ServiceSpec(0xA003, 3, "Data Service",
                    SubchannelConfig(132, 48, False, eep_type="A",
                                     eep_prot_level=2), kind="packet",
                    scid=0x10, packet_address=2),
    ]
    tx = EnsembleTransmitter(1, services=services)

    # queue an MOT object on the packet carousel
    rng = np.random.default_rng(7)
    body = rng.integers(0, 256, 400).astype(np.uint8).tobytes()
    tid = 0x42
    # MOT is a repeating carousel: early repetitions are lost while the
    # 16-CIF deinterleaver fills and the channel spins up
    segs = [body[i:i + 128] for i in range(0, len(body), 128)]
    for _ in range(12):
        tx.push_packet_data_group(
            3, build_mot_segment(HEADER, 0, True, tid,
                                 build_mot_header(body, "file.bin")))
        for i, s in enumerate(segs):
            tx.push_packet_data_group(
                3, build_mot_segment(UNSCRAMBLED_BODY, i, i == len(segs) - 1,
                                     tid, s))

    iq = tx.generate(28)
    demod = OFDMDemodulator(1)
    sd = StreamingDemodulator(demod)
    rx = DabReceiver(1)

    got = {"mp2_frames": [], "aus": [], "mot": [], "channels": {}}

    def on_channel(sub_id, ch):
        got["channels"][sub_id] = ch.kind
        if ch.kind == "dab":
            ch.events.on_frame_data.append(got["mp2_frames"].append)
        elif ch.kind == "dab+":
            ch.events.on_access_unit.append(
                lambda i, n, au, hdr: got["aus"].append(au))
    rx.on_audio_channel.append(on_channel)

    def on_data_channel(sub_id, ch):
        got["channels"][sub_id] = ch.kind
        ch.processor.mot.on_entity.append(got["mot"].append)
    rx.on_data_channel.append(on_data_channel)

    lead = np.zeros(10000, np.complex64)
    frames = sd.process(np.concatenate(
        [lead, iq, np.zeros(200000, np.complex64)]))
    for fr in frames:
        rx.process_frame(fr)
    return tx, rx, got, body


def test_all_channel_kinds_created(mixed_system):
    _, rx, got, _ = mixed_system
    assert got["channels"] == {1: "dab+", 2: "dab", 3: "packet"}
    db = rx.db
    assert db.services[0xA002].label == "MP2 Service"
    assert db.subchannels[2].is_uep
    assert db.subchannels[3].fec_scheme == 0
    comp = db.component_by_subchannel(3)
    assert comp.global_id == 0x10 and comp.packet_address == 2


def test_mp2_frames_parse(mixed_system):
    from dab_radio_tpu.dab.mp2 import parse_mp2_header
    _, _, got, _ = mixed_system
    assert len(got["mp2_frames"]) >= 10
    h = parse_mp2_header(got["mp2_frames"][0])
    assert h is not None and h.sample_rate == 48000
    # UEP row 33: 84 CU @ 128 kbps -> 384 bytes per 24 ms frame
    assert len(got["mp2_frames"][0]) == 384


def test_dab_plus_aus_decode(mixed_system):
    _, _, got, _ = mixed_system
    assert len(got["aus"]) >= 3


def test_packet_mot_received(mixed_system):
    _, _, got, body = mixed_system
    assert len(got["mot"]) >= 1
    ent = got["mot"][0]
    assert ent.transport_id == 0x42
    assert ent.body == body
    assert ent.header.content_name == "file.bin"
