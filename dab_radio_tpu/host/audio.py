"""Audio output pipeline: N sources -> mixer -> sink.

Parity surface: reference examples/audio/ (audio_pipeline.{h,cpp},
portaudio_sink, ring_buffer): per-source ring buffer with linear resampling
to the sink rate, float mixing with clipping, pluggable sinks. This image has
no sound hardware, so the sinks are WAV files, raw-PCM writers, or a null
sink; the pipeline API matches so a PortAudio-style sink can slot in.
"""

import struct
import threading
from typing import List

import numpy as np


class AudioSource:
    """One channel's PCM feed with linear resampling to the pipeline rate."""

    def __init__(self, pipeline_rate: int, max_buffer_frames: int = 192000):
        self.pipeline_rate = pipeline_rate
        self.max_buffer_frames = max_buffer_frames
        self._buf = np.zeros((0, 2), dtype=np.float32)
        self._lock = threading.Lock()
        self.muted = False

    def write(self, pcm: np.ndarray, sample_rate: int, channels: int):
        """pcm: int16 interleaved."""
        x = np.asarray(pcm, dtype=np.float32) / 32768.0
        frames = x.reshape(-1, channels)
        if channels == 1:
            frames = np.repeat(frames, 2, axis=1)
        elif channels > 2:
            frames = frames[:, :2]
        if sample_rate != self.pipeline_rate:
            n_in = frames.shape[0]
            n_out = int(n_in * self.pipeline_rate / sample_rate)
            t = np.linspace(0.0, n_in - 1, n_out, dtype=np.float32)
            i0 = np.floor(t).astype(np.int64)
            i1 = np.minimum(i0 + 1, n_in - 1)
            w = (t - i0)[:, None]
            frames = frames[i0] * (1 - w) + frames[i1] * w
        with self._lock:
            self._buf = np.concatenate([self._buf, frames])
            if self._buf.shape[0] > self.max_buffer_frames:
                self._buf = self._buf[-self.max_buffer_frames:]

    def pull(self, nb_frames: int) -> np.ndarray:
        with self._lock:
            take = min(nb_frames, self._buf.shape[0])
            out = np.zeros((nb_frames, 2), dtype=np.float32)
            if take and not self.muted:
                out[:take] = self._buf[:take]
            if take:
                self._buf = self._buf[take:]
        return out


class AudioPipeline:
    def __init__(self, sink=None, sample_rate: int = 48000):
        self.sample_rate = sample_rate
        self.sources: List[AudioSource] = []
        self.sink = sink
        self.volume = 1.0

    def create_source(self) -> AudioSource:
        src = AudioSource(self.sample_rate)
        self.sources.append(src)
        return src

    def mix_block(self, nb_frames: int) -> np.ndarray:
        mix = np.zeros((nb_frames, 2), dtype=np.float32)
        for s in self.sources:
            mix += s.pull(nb_frames)
        return np.clip(mix * self.volume, -1.0, 1.0)

    def run_block(self, nb_frames: int = 4800):
        block = self.mix_block(nb_frames)
        if self.sink is not None:
            self.sink.write_frames(block)
        return block


class NullSink:
    def write_frames(self, frames: np.ndarray):
        pass

    def close(self):
        pass


class WavFileSink:
    """Streaming stereo 16-bit WAV writer with header patch-on-close
    (reference basic_scraper WavFileWriter)."""

    def __init__(self, path: str, sample_rate: int = 48000, channels: int = 2):
        self.path = path
        self.sample_rate = sample_rate
        self.channels = channels
        self._f = open(path, "wb")
        self._data_bytes = 0
        self._write_header()

    def _write_header(self):
        f = self._f
        byte_rate = self.sample_rate * self.channels * 2
        f.seek(0)
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + self._data_bytes))
        f.write(b"WAVEfmt ")
        f.write(struct.pack("<IHHIIHH", 16, 1, self.channels,
                            self.sample_rate, byte_rate,
                            self.channels * 2, 16))
        f.write(b"data")
        f.write(struct.pack("<I", self._data_bytes))

    def write_frames(self, frames: np.ndarray):
        pcm = np.clip(frames * 32767.0, -32768, 32767).astype("<i2")
        self._f.seek(44 + self._data_bytes)
        self._f.write(pcm.tobytes())
        self._data_bytes += pcm.nbytes

    def write_pcm16(self, pcm: np.ndarray):
        """Raw interleaved int16 (already at file rate/channels)."""
        pcm = np.asarray(pcm, dtype="<i2")
        self._f.seek(44 + self._data_bytes)
        self._f.write(pcm.tobytes())
        self._data_bytes += pcm.nbytes

    def close(self):
        self._write_header()
        self._f.close()
