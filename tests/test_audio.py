"""Audio pipeline tests: per-source resampling ring, mixer, WAV sink
(reference examples/audio/audio_pipeline.{h,cpp} + ring_buffer.h)."""

import struct
import wave

import numpy as np
import pytest

from dab_radio_tpu.host.audio import (AudioPipeline, AudioSource, NullSink,
                                      WavFileSink)


def test_source_passthrough_same_rate():
    src = AudioSource(48000)
    pcm = (np.arange(96, dtype=np.int16)).reshape(-1, 2)
    src.write(pcm.reshape(-1), 48000, 2)
    out = src.pull(48)
    assert out.shape == (48, 2)
    np.testing.assert_allclose(out, pcm.astype(np.float32) / 32768.0,
                               atol=1e-4)


def test_source_linear_resample_upsamples():
    """A 24 kHz ramp written into a 48 kHz pipeline doubles in length and
    stays monotonic (linear interpolation)."""
    src = AudioSource(48000)
    ramp = np.linspace(-10000, 10000, 480).astype(np.int16)
    stereo = np.repeat(ramp, 2)
    src.write(stereo, 24000, 2)
    out = src.pull(900)
    assert out.shape == (900, 2)
    left = out[:, 0]
    got = left[np.abs(left) > 0]
    assert got.shape[0] > 800
    assert (np.diff(got) >= -1e-5).all()


def test_source_mono_duplicates_to_stereo():
    src = AudioSource(48000)
    src.write(np.full(100, 1000, np.int16), 48000, 1)
    out = src.pull(100)
    np.testing.assert_array_equal(out[:, 0], out[:, 1])


def test_pipeline_mixes_sources():
    pipe = AudioPipeline(sink=NullSink(), sample_rate=48000)
    a = pipe.create_source()
    b = pipe.create_source()
    a.write(np.full(200, 8000, np.int16), 48000, 1)
    b.write(np.full(200, -3000, np.int16), 48000, 1)
    mixed = pipe.mix_block(100)
    assert mixed.shape == (100, 2)
    expect = (8000 - 3000) / 32768.0
    np.testing.assert_allclose(mixed[:50, 0], expect, atol=1e-3)


def test_wav_sink_roundtrip(tmp_path):
    path = tmp_path / "out.wav"
    sink = WavFileSink(str(path), sample_rate=48000, channels=2)
    tone = (np.sin(np.linspace(0, 40 * np.pi, 4800)) * 0.5)
    frames = np.stack([tone, -tone], axis=-1).astype(np.float32)
    sink.write_frames(frames)
    sink.close()

    with wave.open(str(path)) as w:
        assert w.getframerate() == 48000
        assert w.getnchannels() == 2
        assert w.getnframes() == 4800
        raw = w.readframes(4800)
    data = np.frombuffer(raw, np.int16).reshape(-1, 2)
    np.testing.assert_allclose(data[:, 0] / 32767.0, tone, atol=1e-3)


def test_alsa_sink_graceful_degradation():
    """The live ALSA sink (portaudio_sink analog) must report honestly and
    raise cleanly when no sound stack exists; when libasound IS present
    (real deployments), construction succeeds or raises RuntimeError —
    never an attribute/segfault class of failure."""
    from dab_radio_tpu.host.audio import AlsaSink
    if not AlsaSink.is_available():
        with pytest.raises(RuntimeError):
            AlsaSink()
        return
    try:
        sink = AlsaSink()
    except RuntimeError:
        return                  # lib present but no device: clean failure
    sink.write_frames(np.zeros((480, 2), np.float32))
    sink.close()
