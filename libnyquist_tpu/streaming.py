"""Positioned-read / seek API over decoded audio.

The reference's Opus path exposes opusfile's positioned reader —
op_read_float, op_pcm_seek / op_pcm_tell / op_pcm_total, op_raw_total
and link management (reference: third_party/opus/opusfile/src/
opusfile.c:2911 op_read_float, :1711 op_pcm_total; vorbisfile has the
same surface, vorbisfile.c:2114 ov_read_float).  The fork's facade
(src/OpusDecoder.cpp:95-122 readInternal) drains the whole stream into
one in-memory AudioData, so this framework's reader is decode-backed:
decode once through the same facade paths, then serve reads and seeks
as O(1) array positioning.  That keeps seeks sample-exact (opusfile's
page-bisection + 80 ms preroll converges only approximately after a
seek) at the reference's own memory cost.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .errors import DecodeError
from .io import load

__all__ = ["StreamReader"]


class StreamReader:
    """Sample-positioned reader over any supported format.

    >>> r = StreamReader("music.opus")
    >>> r.pcm_seek(48000)           # 1 s in
    >>> chunk = r.read(960)         # [960, channels] float32
    """

    def __init__(self, source, extension: Optional[str] = None):
        audio = load(source, extension=extension)
        self.sample_rate = audio.sample_rate
        self.channel_count = audio.channel_count
        self._pcm = np.asarray(audio.samples, np.float32).reshape(
            -1, audio.channel_count
        )
        self._pos = 0

    # -- opusfile-style surface -------------------------------------
    def pcm_total(self) -> int:
        """Total samples per channel (op_pcm_total)."""
        return self._pcm.shape[0]

    def pcm_tell(self) -> int:
        """Current sample offset (op_pcm_tell)."""
        return self._pos

    def pcm_seek(self, offset: int) -> None:
        """Seek to an absolute sample offset (op_pcm_seek)."""
        if offset < 0 or offset > self._pcm.shape[0]:
            raise DecodeError("seek out of range")
        self._pos = int(offset)

    def time_tell(self) -> float:
        return self._pos / self.sample_rate

    def time_seek(self, seconds: float) -> None:
        self.pcm_seek(int(round(seconds * self.sample_rate)))

    def read(self, n: int) -> np.ndarray:
        """Read up to n samples -> [k, channels] float32, k <= n;
        empty at end of stream (op_read_float semantics)."""
        if n < 0:
            raise DecodeError("negative read size")
        chunk = self._pcm[self._pos : self._pos + n]
        self._pos += chunk.shape[0]
        return chunk

    def __iter__(self):
        """Iterate fixed 20 ms chunks from the current position."""
        step = max(1, self.sample_rate // 50)
        while True:
            chunk = self.read(step)
            if chunk.shape[0] == 0:
                return
            yield chunk
