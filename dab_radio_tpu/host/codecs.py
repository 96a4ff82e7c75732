"""Audio decoders (AAC for DAB+, MP2 for classic DAB) over the native
libavcodec shim.

Mirrors the reference's AAC_Audio_Decoder (faad2, src/dab/audio/
aac_audio_decoder.cpp) and MP2_Audio_Decoder (mpg123): initialised from the
superframe-derived AudioSpecificConfig, emits interleaved int16 PCM.
ffmpeg's AAC decoder may reject DAB+'s 960-sample transform; `is_available`
reports that and callers fall back to bitstream export.
"""

import ctypes
from typing import Optional, Tuple

import numpy as np

from .native import codecs_lib
from ..dab.aac import SuperFrameHeader, mpeg4_audio_specific_config, adts_header

_PCM_CAPACITY = 16 * 4096


class _Decoder:
    def __init__(self, kind: int, extradata: bytes = b""):
        self._lib = codecs_lib()
        self._h = None
        if self._lib is None:
            return
        buf = np.frombuffer(extradata, dtype=np.uint8) if extradata else None
        self._h = self._lib.dec_open(
            kind, buf.ctypes.data if buf is not None else None,
            len(extradata))
        self._pcm = np.empty(_PCM_CAPACITY, dtype=np.int16)

    @property
    def is_available(self) -> bool:
        return self._h is not None

    def decode(self, frame: bytes) -> Optional[Tuple[np.ndarray, int, int]]:
        """Returns (pcm int16 interleaved, sample_rate, channels) or None."""
        if self._h is None:
            return None
        buf = np.frombuffer(frame, dtype=np.uint8)
        rate = ctypes.c_int32(0)
        ch = ctypes.c_int32(0)
        n = self._lib.dec_decode(self._h, buf.ctypes.data, buf.shape[0],
                                 self._pcm.ctypes.data, _PCM_CAPACITY,
                                 ctypes.byref(rate), ctypes.byref(ch))
        if n <= 0:
            return None
        return self._pcm[:n].copy(), int(rate.value), int(ch.value)

    def close(self):
        if self._h is not None:
            self._lib.dec_close(self._h)
            self._h = None


class AACDecoder(_Decoder):
    """DAB+ HE-AAC access-unit decoder."""

    def __init__(self, header: SuperFrameHeader):
        self.header = header
        super().__init__(0, mpeg4_audio_specific_config(header))

    def decode_au(self, au: bytes):
        return self.decode(au)

    def adts_frame(self, au: bytes) -> bytes:
        """AU wrapped with an ADTS header for bitstream export."""
        return adts_header(self.header, len(au)) + au


class MP2Decoder(_Decoder):
    """Classic DAB MPEG Layer II frame decoder."""

    def __init__(self):
        super().__init__(1)
