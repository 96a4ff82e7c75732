"""Audio-controls parity (reference src/basic_radio/basic_audio_controls.cpp:5-65)
and the StreamingDemodulator ingest buffer."""

import numpy as np

from dab_radio_tpu.models.controls import AudioControls
from dab_radio_tpu.models.demodulator import _StreamBuffer


def test_controls_implications():
    c = AudioControls(decode_audio=False, decode_data=False, play_audio=False)
    assert not c.any_enabled
    # enabling playback implies audio decode (reference SetIsPlayAudio)
    c.play_audio = True
    assert c.decode_audio and c.play_audio
    # disabling audio decode forces playback off (reference SetIsDecodeAudio)
    c.decode_audio = False
    assert not c.play_audio
    # decode_data is independent
    c.decode_data = True
    assert c.decode_data and not c.decode_audio

    c.run_all()
    assert c.all_enabled and c.any_enabled
    c.stop_all()
    assert not c.any_enabled

    # constructor applies the same implication
    c2 = AudioControls(decode_audio=False, play_audio=True)
    assert c2.decode_audio


def test_channel_controls_gate_decode():
    from dab_radio_tpu.params import SubchannelConfig
    from dab_radio_tpu.models.receiver import DabPlusChannel
    cfg = SubchannelConfig(0, 54, False, eep_type="A", eep_prot_level=2)
    ch = DabPlusChannel(cfg)
    # defaults: data decode on, audio decode off
    assert ch.controls.decode_data and not ch.controls.decode_audio
    ch.enable_audio_decode()
    assert ch.controls.decode_audio
    # snapshot round-trips the control flags
    import pickle
    ch2 = pickle.loads(pickle.dumps(ch))
    assert ch2.controls.decode_audio


def test_stream_buffer_append_view_consume():
    buf = _StreamBuffer(dtype=np.complex64, capacity=16)
    rng = np.random.default_rng(0)
    ref = np.zeros(0, np.complex64)
    consumed = 0
    for _ in range(200):
        chunk = (rng.standard_normal(13) + 1j * rng.standard_normal(13)
                 ).astype(np.complex64)
        buf.append(chunk)
        ref = np.concatenate([ref, chunk])
        live = ref[consumed:] if consumed else ref
        assert len(buf) == live.shape[0]
        np.testing.assert_array_equal(buf.view(0, len(buf)), live)
        take = int(rng.integers(0, len(buf) + 1))
        buf.consume(take)
        consumed += take
        ref = ref[consumed:]
        consumed = 0
    # to_array/set round trip
    arr = buf.to_array()
    b2 = _StreamBuffer()
    b2.set(arr)
    np.testing.assert_array_equal(b2.to_array(), arr)
