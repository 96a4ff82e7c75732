"""FIC + FIG + database closed-loop tests: synthesize a FIC carrying a full
ensemble description, decode it, and check the database contents."""

import numpy as np
import pytest

from dab_radio_tpu.dab.fic import FICDecoder, FICEncoder
from dab_radio_tpu.dab.fig import FIGParser
from dab_radio_tpu.dab.database import (
    DatabaseUpdater, STREAM_AUDIO, AUDIO_DAB_PLUS,
)
from dab_radio_tpu.dab.charsets import decode_label


# ---- FIG payload builders (TX side of the FIC schema) ----

def fig_header(fig_type: int, body: bytes) -> bytes:
    assert len(body) <= 29
    return bytes([(fig_type << 5) | len(body)]) + body


def fig0(ext: int, data: bytes, pd: int = 0) -> bytes:
    return fig_header(0, bytes([(pd << 5) | ext]) + data)


def fig0_0(eid: int, cif_upper=0, cif_lower=0) -> bytes:
    return fig0(0, bytes([eid >> 8, eid & 0xFF, cif_upper & 0b11111, cif_lower]))


def fig0_1_long(sub_id, start, option, prot_level, size) -> bytes:
    return fig0(1, bytes([
        (sub_id << 2) | ((start >> 8) & 0b11), start & 0xFF,
        0x80 | (option << 4) | (prot_level << 2) | ((size >> 8) & 0b11),
        size & 0xFF]))


def fig0_2_audio(sid, sub_id, ascty, primary=True) -> bytes:
    return fig0(2, bytes([
        sid >> 8, sid & 0xFF, 0x01,
        ascty & 0b111111, (sub_id << 2) | (int(primary) << 1)]))


def fig1_label(ext, idbytes: bytes, label: str, flags=0xFF00, charset=0) -> bytes:
    lab = label.encode("ascii").ljust(16)[:16]
    return fig_header(1, bytes([(charset << 4) | ext]) + idbytes + lab
                      + bytes([flags >> 8, flags & 0xFF]))


def build_test_fic(encoder: FICEncoder):
    """12 FIBs describing one ensemble with one DAB+ audio service."""
    eid, sid, sub = 0xCDEF, 0xF123, 5
    figs = [
        fig0_0(eid) + fig0_1_long(sub, 0, 0, 2, 48),       # EEP 3-A 48 CU
        fig0_2_audio(sid, sub, AUDIO_DAB_PLUS),
        fig1_label(0, bytes([eid >> 8, eid & 0xFF]), "Test Ensemble"),
        fig1_label(1, bytes([sid >> 8, sid & 0xFF]), "Radio One"),
    ]
    payloads = [figs[i % len(figs)] for i in range(encoder.dab.nb_fibs)]
    return encoder.encode_fic(payloads), (eid, sid, sub)


def test_fic_roundtrip_and_database():
    enc = FICEncoder(1)
    dec = FICDecoder(1)
    soft, (eid, sid, sub) = build_test_fic(enc)
    assert soft.shape == (3 * 3072,)

    fibs, info = dec.decode_fic(soft)
    assert info["crc_errors"] == 0
    assert len(fibs) == 12

    parser = FIGParser()
    upd = DatabaseUpdater()
    for fib in fibs:
        for ev in parser.parse_fib(fib):
            upd.apply(ev)

    db = upd.db
    assert db.ensemble.id == eid
    assert db.ensemble.label == "Test Ensemble"
    assert sid in db.services
    assert db.services[sid].label == "Radio One"
    assert sub in db.subchannels
    sch = db.subchannels[sub]
    assert sch.is_complete
    assert (sch.start_address, sch.length, sch.is_uep) == (0, 48, False)
    assert (sch.eep_type, sch.eep_prot_level) == ("A", 2)
    comp = db.component_by_subchannel(sub)
    assert comp is not None and comp.is_complete
    assert comp.transport_mode == STREAM_AUDIO
    assert comp.audio_service_type == AUDIO_DAB_PLUS


def test_fic_with_noise():
    enc = FICEncoder(1)
    dec = FICDecoder(1)
    soft, _ = build_test_fic(enc)
    rng = np.random.default_rng(0)
    noisy = np.clip(soft.astype(np.int32)
                    + rng.normal(0, 60, soft.shape).astype(np.int32),
                    -127, 127).astype(np.int8)
    fibs, info = dec.decode_fic(noisy)
    assert info["crc_errors"] == 0
    assert len(fibs) == 12


def test_fib_crc_gate():
    enc = FICEncoder(1)
    dec = FICDecoder(1)
    soft, _ = build_test_fic(enc)
    # saturate one group with garbage: its 3 FIBs must be dropped
    bad = soft.copy()
    bad[:2304] = 127
    fibs, info = dec.decode_fic(bad)
    assert info["crc_errors"] == 3
    assert len(fibs) == 9


def test_charsets():
    assert decode_label(b"Hello", 0) == "Hello"
    assert decode_label(bytes([0x24]), 0) == "ł"     # EBU Latin specific
    assert decode_label("héllo".encode("latin-1"), 4) == "héllo"
    assert decode_label("héllo".encode("utf-16-be"), 6) == "héllo"
    assert decode_label("héllo".encode("utf-8"), 15) == "héllo"


def test_crc16_batch_matches_scalar():
    """Vectorized row-CRC (serving-fleet host path) equals the scalar
    engine, valid and invalid rows alike."""
    import numpy as np
    from dab_radio_tpu.ops.crc import crc16, crc16_check, crc16_check_batch
    rng = np.random.default_rng(2)
    rows = rng.integers(0, 256, (64, 32), dtype=np.uint8)
    for i in range(0, 64, 2):
        c = crc16(rows[i, :30])
        rows[i, 30], rows[i, 31] = c >> 8, c & 0xFF
    got = crc16_check_batch(rows)
    ref = np.array([crc16_check(r) for r in rows])
    np.testing.assert_array_equal(got, ref)
    assert got.sum() >= 32


def test_ingest_fibs_memo_converges_out_of_order_figs():
    """Regression: the carousel-FIB memo must not block convergence when a
    FIG's application is a silent no-op against an incomplete database.

    A packet service's FIG 0/13 (user application) only applies once the
    FIG 0/2 packet ref has linked the component to its service; on the
    first carousel pass it does nothing, and only the re-application on the
    next pass completes the component. A value-blind exact-repeat memo
    froze the database there (round-4 regression); the mutation-clock memo
    only caches proven no-ops and flushes on any database change."""
    from dab_radio_tpu.params import SubchannelConfig
    from dab_radio_tpu.models.transmitter import (
        EnsembleTransmitter, ServiceSpec)
    from dab_radio_tpu.models.receiver import DabReceiver

    tx = EnsembleTransmitter(1, services=[
        ServiceSpec(0xA003, 3, "Data Service",
                    SubchannelConfig(132, 48, False, eep_type="A",
                                     eep_prot_level=2), kind="packet",
                    scid=0x10, packet_address=2),
    ])
    enc = FICEncoder(1)
    fib_bytes = [bytes(enc.encode_fib_payload(p))
                 for p in tx._fib_payloads()]
    rx = DabReceiver(1)
    for _ in range(3):          # carousel repetitions of IDENTICAL bytes
        rx.ingest_fibs(fib_bytes)
    assert {k: ch.kind for k, ch in rx.channels.items()} == {3: "packet"}
    comp = rx.db.component_by_subchannel(3)
    assert comp.is_complete and comp.user_app_types

    # steady state: every FIB is now a proven no-op and memoized
    assert len(rx._fib_memo) == len(set(fib_bytes))
    stats_before = rx.updater.stats()
    rx.ingest_fibs(fib_bytes)
    assert rx.updater.stats() == stats_before


def test_mutation_clock_identical_reapplication_is_noop():
    """Regression (round-4 review): applying a byte-identical FIG event a
    second time must NOT advance the database mutation clock — an eager
    dict.setdefault constructed tracked entities on pure lookups (FIG
    0/6/0/21/0/24), bumping the clock every carousel pass and permanently
    defeating the FIB memo."""
    from dab_radio_tpu.dab.database import (
        DatabaseUpdater, db_mutation_clock)
    from dab_radio_tpu.dab import fig as F

    events = [
        F.ServiceLinkage(lsn=5, is_active_link=True, is_hard_link=False,
                         is_international=False, service_ids=[0xF123],
                         rds_pi_ids=[0x1234], drm_ids=[]),
        F.FrequencyInfo(rm=0, id_value=0xC0FF, frequency_hz=206352000,
                        is_continuous=True, geo_adjacent=False,
                        mode_one=True),
        F.OtherEnsembleService(ensemble_id=0xC0FF, service_id=0xF200,
                               is_other_ensemble=True),
    ]
    up = DatabaseUpdater()
    for ev in events:
        up.apply(ev)
    clock = db_mutation_clock()
    for ev in events:            # carousel repetition: identical bytes
        up.apply(ev)
    assert db_mutation_clock() == clock
