"""Positioned-read / seek API: decode-backed and true page-bisection.

The reference's Opus path exposes opusfile's positioned reader —
op_read_float, op_pcm_seek / op_pcm_tell / op_pcm_total, op_raw_total
and link management (reference: third_party/opus/opusfile/src/
opusfile.c:2911 op_read_float, :2400 op_pcm_seek, :2160
op_pcm_seek_page, :1711 op_pcm_total; vorbisfile has the same surface,
vorbisfile.c:2114 ov_read_float / ov_pcm_seek).

Two readers:

* StreamReader (default) — decode-backed: decode once through the
  facade, then O(1) array positioning.  Sample-exact seeks at the
  reference fork's own memory cost (src/OpusDecoder.cpp:95-122
  readInternal drains the whole stream too).
* StreamReader(lazy=True) / OggSeekReader — opusfile-style O(log)
  byte-range bisection over Ogg granule positions for Opus and Vorbis,
  decoding only a bounded window around the target with pre-roll
  (opusfile.c:2160 op_pcm_seek_page bisection; 80 ms+ pre-roll for
  decoder convergence, one-packet window priming for Vorbis).  Neither
  O(file) memory nor O(file) startup: total() comes from the tail
  page's granule, seeks touch O(log) byte windows.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

from .errors import DecodeError
from .io import load

__all__ = ["StreamReader", "OggSeekReader", "CountingSource"]


class StreamReader:
    """Sample-positioned reader over any supported format.

    >>> r = StreamReader("music.opus")
    >>> r.pcm_seek(48000)           # 1 s in
    >>> chunk = r.read(960)         # [960, channels] float32
    """

    def __new__(cls, source, extension: Optional[str] = None,
                lazy: bool = False):
        if lazy and cls is StreamReader:
            return OggSeekReader(source)
        return super().__new__(cls)

    def __init__(self, source, extension: Optional[str] = None,
                 lazy: bool = False):
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


# ======================================================================
# Lazy Ogg reader: opusfile-style granule bisection without full decode
# ======================================================================

class CountingSource:
    """Positioned byte source over bytes / a path / a file object,
    counting read operations and bytes (the op_bisect read-cost model:
    opusfile.c:1098 op_bisect_forward_serialno)."""

    def __init__(self, src):
        if isinstance(src, (bytes, bytearray, memoryview)):
            self._buf = bytes(src)
            self._f = None
            self.size = len(self._buf)
        else:
            self._f = open(src, "rb") if isinstance(src, str) else src
            self._f.seek(0, 2)
            self.size = self._f.tell()
            self._buf = None
        self.reads = 0
        self.bytes_read = 0

    def pread(self, off: int, n: int) -> bytes:
        off = max(0, min(off, self.size))
        n = max(0, min(n, self.size - off))
        self.reads += 1
        self.bytes_read += n
        if self._buf is not None:
            return self._buf[off : off + n]
        self._f.seek(off)
        return self._f.read(n)


_WIN = 128 * 1024         # bisection window (>= 2 max Ogg pages, so a
#                           fresh read at a page start always completes)


def _scan_page(buf: bytes, base: int, serial=None, header_only=False):
    """First complete Ogg page in buf (file offset base); returns
    (granule, serial, start, end, continued, last_complete) or None.
    header_only=True accepts pages whose BODY extends past the buffer
    (bisection probes only need granule + extent, not packets)."""
    pos = 0
    while True:
        idx = buf.find(b"OggS", pos)
        if idx < 0 or idx + 27 > len(buf):
            return None
        ver, htype, gran, ser, seq, _crc, nseg = struct.unpack_from(
            "<BBqIIIB", buf, idx + 4)
        lace_end = idx + 27 + nseg
        if ver != 0:
            pos = idx + 1
            continue
        if lace_end > len(buf):
            return None
        lacing = buf[idx + 27 : lace_end]
        end = lace_end + sum(lacing)
        if not header_only and end > len(buf):
            return None
        if serial is not None and ser != serial:
            pos = end
            continue
        last_complete = len(lacing) > 0 and lacing[-1] < 255
        return (gran, ser, base + idx, base + end,
                bool(htype & 1), last_complete)


class OggSeekReader:
    """opusfile/vorbisfile-style positioned reader over one Ogg Opus or
    Ogg Vorbis link: pcm_total from the tail page, pcm_seek by O(log)
    granule bisection, reads decode a bounded window with pre-roll.

    Output matches the full decode to float tolerance (Vorbis exactly;
    Opus after the >= 1 s pre-roll the decoder state has converged far
    below f32 resolution — opusfile itself guarantees only 80 ms)."""

    PREROLL_OPUS = 48000          # 1 s @48 kHz (>> opusfile's 80 ms)

    def __init__(self, source):
        self.src = (source if isinstance(source, CountingSource)
                    else CountingSource(source))
        head = self.src.pread(0, _WIN)
        page = _scan_page(head, 0)
        if page is None:
            raise DecodeError("not an Ogg stream")
        self.serial = page[1]
        # collect header packets from the first pages
        segs = []
        pkts = []
        off = 0
        need = 3
        while len(pkts) < need:
            buf = self.src.pread(off, _WIN)
            p = _scan_page(buf, off, self.serial)
            if p is None:
                raise DecodeError("truncated Ogg headers")
            gran, _ser, start, end, _cont, _lc = p
            raw = buf[start - off : end - off]
            nseg = raw[26]
            lacing = raw[27 : 27 + nseg]
            body = raw[27 + nseg :]
            o = 0
            for lace in lacing:
                segs.append(body[o : o + lace])
                o += lace
                if lace < 255:
                    pkts.append(b"".join(segs))
                    segs = []
            off = end
            if pkts and pkts[0][:8] == b"OpusHead":
                need = 2
        first = pkts[0]
        if first[:8] == b"OpusHead":
            self.codec = "opus"
            self.channel_count = first[9]
            self.preskip = struct.unpack_from("<H", first, 10)[0]
            self.sample_rate = 48000
            self.headers = pkts[:2]
        elif first[:7] == b"\x01vorbis":
            self.codec = "vorbis"
            self.channel_count = first[11]
            self.sample_rate = struct.unpack_from("<I", first, 12)[0]
            self.preskip = 0
            self.headers = pkts[:3]
        else:
            raise DecodeError("lazy reader supports Ogg Opus/Vorbis")
        self.data_off = off
        # tail granule -> total
        tail = self.src.pread(max(0, self.src.size - _WIN), _WIN)
        tbase = max(0, self.src.size - _WIN)
        last_gran = None
        o = 0
        while True:
            p = _scan_page(tail[o:], tbase + o, self.serial)
            if p is None:
                break
            if p[0] >= 0:
                last_gran = p[0]
            o = p[3] - tbase
        if last_gran is None:
            raise DecodeError("no tail granule (grow _WIN?)")
        self.end_gran = last_gran
        self._pos = 0
        self._buf = np.zeros((0, self.channel_count), np.float32)
        self._buf_start = 0

    # -- surface -----------------------------------------------------
    def pcm_total(self) -> int:
        return max(self.end_gran - self.preskip, 0)

    def pcm_tell(self) -> int:
        return self._pos

    def pcm_seek(self, offset: int) -> None:
        if offset < 0 or offset > self.pcm_total():
            raise DecodeError("seek out of range")
        self._pos = int(offset)

    def time_tell(self) -> float:
        return self._pos / self.sample_rate

    def time_seek(self, seconds: float) -> None:
        self.pcm_seek(int(round(seconds * self.sample_rate)))

    def read(self, n: int) -> np.ndarray:
        if n < 0:
            raise DecodeError("negative read size")
        n = min(n, self.pcm_total() - self._pos)
        if n <= 0:
            return np.zeros((0, self.channel_count), np.float32)
        lo = self._pos - self._buf_start
        if not (0 <= lo and lo + n <= self._buf.shape[0]):
            self._decode_window(self._pos, n)
            lo = self._pos - self._buf_start
        out = self._buf[lo : lo + n]
        self._pos += out.shape[0]
        return out

    # -- bisection + windowed decode ----------------------------------
    _PROBE = 66 * 1024     # > max Ogg page: a probe always finds the
    #                        next page HEADER in one read

    def _first_page_after(self, off):
        """First serial-matching page header at/after byte off
        (header-only: bisection probes don't need packet bodies)."""
        base = off
        while base < self.src.size:
            buf = self.src.pread(base, self._PROBE)
            p = _scan_page(buf, base, self.serial, header_only=True)
            if p is not None:
                return p
            if len(buf) < self._PROBE:
                return None
            base += self._PROBE - 300   # resync past a foreign header
        return None

    def _bisect(self, target_gran):
        """Byte offset whose next page has granule < target but is
        within ~2 windows of it (op_pcm_seek_page bisection)."""
        lo = self.data_off
        hi = self.src.size
        while hi - lo > 2 * _WIN:
            mid = (lo + hi) // 2
            p = self._first_page_after(mid)
            if p is None or p[0] < 0:
                hi = mid
                continue
            if p[0] < target_gran:
                lo = p[3]
            else:
                hi = mid
        return lo

    def _collect_packets(self, start_off, end_gran_needed):
        """Pages from start_off until a completed-packet page with
        granule >= end_gran_needed.  Returns (packets, first_gran, k0):
        the first completed page's granule and how many packets
        complete by its end — the exact position anchor (a page's
        granule is the position of its last completed packet's final
        sample).  Leading continued segments are dropped."""
        pkts = []
        segs = []
        drop_continued = True
        first_gran = None
        k0 = 0
        off = start_off
        buf = b""
        base = start_off
        while off < self.src.size:
            p = None
            if base <= off < base + len(buf):
                p = _scan_page(buf[off - base:], off, self.serial)
            if p is None:
                buf = self.src.pread(off, _WIN)
                base = off
                p = _scan_page(buf, off, self.serial)
                if p is None:
                    break
            gran, _ser, start, end, cont, last_complete = p
            raw = buf[start - base : end - base]
            nseg = raw[26]
            lacing = raw[27 : 27 + nseg]
            body = raw[27 + nseg :]
            if drop_continued and cont:
                segs = []
            drop_continued = False
            o = 0
            ncomplete = 0
            for lace in lacing:
                segs.append(body[o : o + lace])
                o += lace
                if lace < 255:
                    pkts.append(b"".join(segs))
                    segs = []
                    ncomplete += 1
            off = end
            if gran >= 0 and ncomplete and last_complete:
                if first_gran is None:
                    first_gran = gran
                    k0 = len(pkts)
                if gran >= end_gran_needed:
                    break
        if first_gran is None:
            raise DecodeError("seek target beyond stream data")
        return pkts, first_gran, k0

    def _decode_window(self, pos, n):
        """Bisect + decode a window covering [pos, pos+n)."""
        preroll = self.PREROLL_OPUS if self.codec == "opus" else 0
        target = pos + self.preskip
        start_gran = max(target - preroll, 0)
        start_off = self._bisect(start_gran)
        end_needed = min(pos + n + self.preskip, self.end_gran)
        pkts, first_gran, k0 = self._collect_packets(
            start_off, end_needed)
        if self.codec == "opus":
            from .formats.opus.decoder import OpusDecoder
            from .formats.opus.packet import parse_packet

            dec = OpusDecoder(self.channel_count)
            outs = []
            durs = []
            for pk in pkts:
                if not pk:
                    durs.append(0)
                    continue
                pr = parse_packet(pk)
                durs.append(pr.frame_size * len(pr.frames))
                out = dec.decode_packet(pk)
                outs.append(np.asarray(out, np.float32).reshape(
                    -1, self.channel_count))
            pcm = (np.concatenate(outs, axis=0) if outs
                   else np.zeros((0, self.channel_count), np.float32))
        else:
            import types

            from .formats import vorbis as V

            st = types.SimpleNamespace(
                packets=[types.SimpleNamespace(data=d)
                         for d in self.headers + pkts],
                last_granule=-1)    # window-relative: no absolute trim
            out, ch, _rate = V._decode_stream_packets(st)
            pcm = np.asarray(out, np.float32).reshape(-1, ch)
            # per-packet output lengths from the mode blockflags (the
            # setup cache was just populated by the decode)
            idh = self.headers[0]
            b = V.LsbBits(idh[7:])
            b.read(32 + 8 + 32 + 96)
            bs = (1 << b.read(4), 1 << b.read(4))
            cached = V._SETUP_CACHE[(hash(self.headers[2]),
                                     self.channel_count)]
            modes = cached[4]
            mode_bits = V.ilog(len(modes) - 1)

            def pk_n(d):
                bb = V.LsbBits(d)
                if bb.read1():
                    raise DecodeError("not an audio packet")
                return bs[modes[bb.read(mode_bits)][0]]

            ns = [pk_n(d) for d in pkts if d]
            durs = [0] + [(ns[j - 1] + ns[j]) // 4
                          for j in range(1, len(ns))]
        # anchor: the first completed page's granule = final-sample
        # position of packet k0-1 -> window start position
        lead = int(np.sum(durs[:k0]))
        win_start = first_gran - lead - self.preskip
        self._buf = pcm
        self._buf_start = win_start
