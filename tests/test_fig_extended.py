"""Extended FIG parser coverage: linkage, country, user apps, FEC,
frequency info, other ensembles, component labels, packet components."""

import pytest

from dab_radio_tpu.dab.fig import FIGParser
from dab_radio_tpu.dab import fig as F
from dab_radio_tpu.dab.database import DatabaseUpdater
from tests.test_fic import fig_header, fig0


def parse_one(payload: bytes):
    return FIGParser().parse_fib(payload + b"\xff")


def test_fig0_6_service_linkage():
    # id list: 2 x 16-bit DAB sids, not international, pd=0
    body = bytes([
        0b1110_0000 | 0, 0x2A,          # ld=1 LA=1 S/H=1 ILS=0 LSN=0x02A
        0b0000_0010,                     # IdLQ=00, 2 ids
        0xF1, 0x23, 0xF4, 0x56,
    ])
    evs = parse_one(fig0(6, body))
    assert len(evs) == 1
    ev = evs[0]
    assert isinstance(ev, F.ServiceLinkage)
    assert ev.lsn == 0x2A and ev.is_active_link and ev.is_hard_link
    assert ev.service_ids == [0xF123, 0xF456]

    # RDS PI list, international (3-byte entries with ECC)
    body2 = bytes([
        0b1101_0000 | 0, 0x10,          # ILS=1
        0b0010_0001,                     # IdLQ=01, 1 id
        0xE1, 0xAB, 0xCD,
    ])
    ev2 = parse_one(fig0(6, body2))[0]
    assert ev2.rds_pi_ids == [0xABCD]


def test_fig0_9_extended_country():
    body = bytes([
        0x80 | 0x05,                    # ext=1, lto=+5 half-hours
        0xE1, 0x02,                     # ecc, table id
        (1 << 6) | 0, 0xE2,             # 1 service, ecc E2
        0xF9, 0x99,
    ])
    evs = parse_one(fig0(9, body))
    ev = evs[0]
    assert isinstance(ev, F.EnsembleCountry)
    assert ev.ecc == 0xE1 and ev.international_table_id == 2
    assert ev.service_ids == [(0xE2 << 16) | 0xF999]
    upd = DatabaseUpdater()
    upd.apply(ev)
    assert upd.db.ensemble.local_time_offset == 5
    assert (0xE2 << 16) | 0xF999 in upd.db.services


def test_fig0_13_user_application():
    body = bytes([
        0xF1, 0x23,                     # sid
        (0x2 << 4) | 1,                 # SCIdS=2, 1 app
        0x00, (0x2 << 5) | 2,           # app type 2 (slideshow), 2 data bytes
        0xAA, 0xBB,
    ])
    evs = parse_one(fig0(13, body))
    ev = evs[0]
    assert isinstance(ev, F.UserApplication)
    assert ev.app_type == 2 and ev.scids == 2 and ev.app_data == b"\xaa\xbb"


def test_fig0_14_fec():
    evs = parse_one(fig0(14, bytes([(7 << 2) | 1])))
    ev = evs[0]
    assert ev.subchannel_id == 7 and ev.fec_scheme == 1
    upd = DatabaseUpdater()
    upd.apply(ev)
    assert upd.db.subchannels[7].fec_scheme == 1


def test_fig0_21_frequency_info():
    # RM=0000 (DAB ensemble), one 3-byte freq entry
    freq = 225648000 // 16000
    body = bytes([
        0x00, 3 + 3,                    # Rfa, fi list = 6 bytes
        0xC1, 0x85,                     # ensemble id
        (0b0000 << 4) | (1 << 3) | 3,   # RM=0, cont=1, 3 freq bytes
        (freq >> 16) & 0b111, (freq >> 8) & 0xFF, freq & 0xFF,
    ])
    evs = parse_one(fig0(21, body))
    ev = evs[0]
    assert isinstance(ev, F.FrequencyInfo)
    assert ev.frequency_hz == 225648000 and ev.is_continuous
    upd = DatabaseUpdater()
    upd.apply(ev)
    assert upd.db.other_ensembles[ev.id_value].frequency_hz == 225648000


def test_fig0_24_other_ensemble_services():
    body = bytes([0xF1, 0x23, 0x01, 0xC1, 0x85])
    # oe=1: bit 6 of the descriptor byte
    evs = parse_one(fig_header(0, bytes([(1 << 6) | 24]) + body))
    ev = evs[0]
    assert isinstance(ev, F.OtherEnsembleService)
    assert ev.service_id == 0xF123 and ev.ensemble_id == 0xC185


def test_fig1_4_component_label():
    body = bytes([(0 << 7) | 0x3]) + bytes([0xF1, 0x23]) \
        + b"Component Label ".ljust(16)[:16] + bytes([0xFF, 0x00])
    evs = parse_one(fig_header(1, bytes([(0 << 4) | 4]) + body))
    ev = evs[0]
    assert isinstance(ev, F.Label)
    assert ev.kind == "component" and ev.scids == 3
    assert ev.label == "Component Label"
    assert ev.short_label == "Componen"


def test_fig0_3_packet_component_with_ca():
    body = bytes([
        0x12, (0x3 << 4) | 1,           # SCId=0x123, CAOrg flag set
        0x80 | 60,                      # dg=1, DSCTy=60 (MOT)
        (5 << 2) | 0b01, 0x02,          # subch 5, addr 0x102
        0xDE, 0xAD,                     # CAOrg field (skipped)
    ])
    evs = parse_one(fig0(3, body))
    ev = evs[0]
    assert isinstance(ev, F.PacketComponent)
    assert (ev.scid, ev.subchannel_id, ev.dscty, ev.packet_address,
            ev.dg_flag) == (0x123, 5, 60, 0x102, 1)


def test_fig0_5_language():
    evs = parse_one(fig0(5, bytes([0x05, 0x09])))     # short form, subch 5
    assert evs[0].subchannel_id == 5 and evs[0].language == 0x09
    evs2 = parse_one(fig0(5, bytes([0x80 | 0x01, 0x23, 0x0F])))
    assert evs2[0].scid == 0x123 and evs2[0].language == 0x0F


def test_fig0_7_and_0_10():
    evs = parse_one(fig0(7, bytes([(12 << 2) | 0, 0x05])))
    assert evs[0].nb_services == 12 and evs[0].reconfiguration_count == 5
    # date/time: MJD for 2024-01-01 = 60310, 13:37 long form
    mjd = 60310
    b = bytes([
        (mjd >> 10) & 0x7F, (mjd >> 2) & 0xFF,
        ((mjd & 0b11) << 6) | (1 << 3) | (13 >> 2),
        ((13 & 0b11) << 6) | 37,
        (42 << 2), 0x00,
    ])
    ev = parse_one(fig0(10, b))[0]
    assert (ev.mjd, ev.hours, ev.minutes, ev.seconds) == (60310, 13, 37, 42)
    from dab_radio_tpu.dab.mot import mjd_to_ymd
    assert mjd_to_ymd(60310) == (2024, 1, 1)
