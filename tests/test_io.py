"""Host IO: WAV-wrapped IQ reading (reference app_wav_reader.h) and the
loop-rewind contract (the data chunk, never the RIFF header)."""

import io
import struct

import numpy as np

from dab_radio_tpu.host.io import IQReader, parse_wav_header


def _wav_bytes(samples_s16: np.ndarray, rate: int = 2048000,
               extra_chunk: bytes = b"") -> bytes:
    """Minimal 2-channel s16le WAV; optional junk chunk before 'data'."""
    data = samples_s16.astype("<i2").tobytes()
    body = b"WAVEfmt " + struct.pack("<IHHIIHH", 16, 1, 2, rate,
                                     rate * 4, 4, 16)
    if extra_chunk:
        body += b"LIST" + struct.pack("<I", len(extra_chunk)) + extra_chunk
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + body


def test_wav_reader_data_offset_and_samples():
    rng = np.random.default_rng(0)
    samples = rng.integers(-3000, 3000, 64).astype(np.int16)
    raw = _wav_bytes(samples)
    f = io.BytesIO(raw)
    r = IQReader(f, "wav")
    assert r.fmt == "s16le" and r.sample_rate == 2048000
    assert r.data_offset == 44           # standard header
    iq = r.read_block(len(samples) * 2)
    np.testing.assert_allclose(
        iq.view(np.float32), samples / 32767.0, atol=1e-6)
    # loop rewind contract: seeking to data_offset replays the SAME
    # samples (webmon --loop), not the RIFF header as IQ
    f.seek(r.data_offset)
    iq2 = r.read_block(len(samples) * 2)
    np.testing.assert_array_equal(iq.view(np.float32), iq2.view(np.float32))


def test_wav_reader_skips_extra_chunks():
    samples = np.arange(-8, 8, dtype=np.int16)
    raw = _wav_bytes(samples, extra_chunk=b"junkmeta")
    f = io.BytesIO(raw)
    r = IQReader(f, "wav")
    assert r.data_offset == 44 + 8 + 8   # LIST chunk + its header
    iq = r.read_block(len(samples) * 2)
    assert iq.shape[0] == len(samples) // 2


def test_wav_reader_rejects_non_wav():
    f = io.BytesIO(b"\x00" * 64)
    assert parse_wav_header(f) is None
    import pytest
    with pytest.raises(ValueError):
        IQReader(io.BytesIO(b"\x01" * 64), "wav")


def test_iq_reader_saturation_counter():
    """A clipped u8 capture (mis-scaled transmitter / over-driven tuner)
    is detected by IQReader.saturation; a healthy capture reads ~0. The
    failure mode it diagnoses: clipping preserves phase so FIC still
    decodes while higher-rate MSC dies silently."""
    import io as io_mod
    from dab_radio_tpu.host.io import IQReader

    rng = np.random.default_rng(0)
    healthy = np.clip(rng.normal(127.5, 30, 4096), 1, 254).astype(np.uint8)
    r = IQReader(io_mod.BytesIO(healthy.tobytes()), "u8")
    assert r.read_block(4096) is not None
    assert r.saturation < 0.01

    clipped = np.clip(rng.normal(127.5, 300, 4096), 0, 255).astype(np.uint8)
    r = IQReader(io_mod.BytesIO(clipped.tobytes()), "u8")
    assert r.read_block(4096) is not None
    assert r.saturation > 0.3

    # wider formats report 0 (no 8-bit rails to hit)
    wide = (rng.normal(0, 0.5, 2048).astype(np.float32)).tobytes()
    r = IQReader(io_mod.BytesIO(wide), "f32le")
    assert r.read_block(len(wide)) is not None
    assert r.saturation == 0.0


def test_fleet_serve_load_u8_formats(tmp_path):
    """fleet_serve._load_u8: u8 maps straight in; s16le requantizes
    through the shared read path to the same u8 stream the transmitter
    would have emitted directly."""
    from dab_radio_tpu.apps.fleet_serve import _load_u8
    from dab_radio_tpu.host.native import iq_convert, iq_quantize_u8

    rng = np.random.default_rng(0)
    iq = (rng.normal(0, 0.3, 2048) + 1j * rng.normal(0, 0.3, 2048)) \
        .astype(np.complex64)
    u8 = np.frombuffer(iq_quantize_u8(iq), np.uint8)
    p8 = tmp_path / "a.u8"
    p8.write_bytes(u8.tobytes())
    np.testing.assert_array_equal(_load_u8(str(p8), "u8"), u8)

    # s16 round trip: quantize the same complex to s16, then load
    s16 = np.clip(np.stack([iq.real, iq.imag], -1) * 32767.5 - 0.5,
                  -32768, 32767).astype("<i2")
    p16 = tmp_path / "a.s16"
    p16.write_bytes(s16.tobytes())
    got = _load_u8(str(p16), "s16le")
    back = iq_convert(got.tobytes(), "u8")
    orig = iq_convert(s16.tobytes(), "s16le")
    assert np.abs(back - orig).max() < 0.02   # ~2 u8 LSB of requantization
