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
