"""FLAC decoder: host-side container/entropy + native/NumPy LPC synthesis.

Re-implementation of the libFLAC decode path (reference:
third_party/FLAC/src/stream_decoder.c — frame header :read_frame_header_,
subframes :2463-2533, Rice residual :2597, lpc.c:784
FLAC__lpc_restore_signal, fixed.c FLAC__fixed_restore_signal) from the
FLAC format specification. Rice decoding and integer LPC synthesis run in
the native host library (native/hostops.c) with Python fallbacks.

Output normalization matches upstream libnyquist's FlacDecoder:
int32 samples / 2^(bps-1) -> float32.
"""

from __future__ import annotations

import os

import numpy as np

from ..audio_data import AudioData, PCMFormat
from ..errors import DecodeError
from ..runtime import native


class BitReader:
    """MSB-first bit reader over bytes."""

    __slots__ = ("buf", "pos", "limit")

    def __init__(self, buf: bytes, pos_bits: int = 0):
        self.buf = buf
        self.pos = pos_bits
        self.limit = len(buf) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > self.limit:
            raise DecodeError("FLAC bitstream overrun")
        first = self.pos >> 3
        last = (end - 1) >> 3
        chunk = int.from_bytes(self.buf[first : last + 1], "big")
        total_bits = (last + 1 - first) * 8
        chunk >>= total_bits - (end - first * 8)
        self.pos = end
        return chunk & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while True:
            if self.pos >= self.limit:
                raise DecodeError("FLAC bitstream overrun")
            byte = self.buf[self.pos >> 3]
            off = self.pos & 7
            b = (byte << off) & 0xFF
            if b:
                lead = 8 - b.bit_length()
                q += lead
                self.pos += lead + 1
                return q
            q += 8 - off
            self.pos += 8 - off

    def align(self):
        self.pos = (self.pos + 7) & ~7


def _read_utf8_coded(br: BitReader) -> int:
    v = br.read(8)
    if v < 0x80:
        return v
    n = 0
    mask = 0x40
    while v & mask:
        n += 1
        mask >>= 1
    val = v & (mask - 1) if mask > 1 else 0
    val = v & ((1 << (6 - n)) - 1)
    for _ in range(n):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise DecodeError("bad UTF-8 coded number")
        val = (val << 6) | (c & 0x3F)
    return val


_BLOCKSIZE_TAB = [
    0, 192, 576, 1152, 2304, 4608, -1, -2, 256, 512, 1024, 2048, 4096,
    8192, 16384, 32768,
]
_RATE_TAB = [
    0, 88200, 176400, 192000, 8000, 16000, 22050, 24000, 32000, 44100,
    48000, 96000, -1, -2, -3, 0,
]
_BPS_TAB = [0, 8, 12, 0, 16, 20, 24, 32]


def _rice_python(br: BitReader, out, n, k):
    for i in range(n):
        q = br.read_unary()
        u = (q << k) | br.read(k) if k else q
        out[i] = (u >> 1) ^ -(u & 1)


def _decode_residual(br: BitReader, blocksize, predictor_order, out):
    """Rice-partitioned residual (FLAC spec §9.2.7)."""
    method = br.read(2)
    if method > 1:
        raise DecodeError("reserved residual coding method")
    plen = 4 if method == 0 else 5
    escape = 15 if method == 0 else 31
    porder = br.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise DecodeError("bad partition order")
    part_samples = blocksize >> porder
    L = native.lib()
    idx = 0
    for p in range(nparts):
        n = part_samples - (predictor_order if p == 0 else 0)
        k = br.read(plen)
        if k == escape:
            esc_bits = br.read(5)
            kk, eb = -1, esc_bits
        else:
            kk, eb = k, 0
        if L is not None:
            arr = out[idx : idx + n]
            br.pos = int(
                L.flac_rice_decode(
                    br.buf, br.limit, br.pos,
                    arr.ctypes.data_as(
                        __import__("ctypes").POINTER(
                            __import__("ctypes").c_int32
                        )
                    ),
                    n, kk, eb,
                )
            )
            if br.pos > br.limit:
                raise DecodeError("FLAC bitstream overrun")
        else:
            if kk < 0:
                for i in range(n):
                    out[idx + i] = br.read_signed(eb) if eb else 0
            else:
                _rice_python(br, out[idx:], n, kk)
        idx += n


def _decode_subframe(br: BitReader, blocksize, bps):
    pad = br.read(1)
    if pad:
        raise DecodeError("invalid subframe padding bit")
    sftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
        bps -= wasted
        if bps <= 0:
            # corrupt wasted-bits count (libFLAC errors out too; a
            # negative width would feed negative shifts downstream)
            raise DecodeError("subframe wasted bits exceed bps")
    out = np.zeros(blocksize, np.int32)
    L = native.lib()
    if sftype == 0:  # constant
        out[:] = br.read_signed(bps)
    elif sftype == 1:  # verbatim
        for i in range(blocksize):
            out[i] = br.read_signed(bps)
    elif 8 <= sftype <= 12:  # fixed
        order = sftype - 8
        data = np.zeros(blocksize, np.int32)
        for i in range(order):
            data[i] = br.read_signed(bps)
        res = np.zeros(blocksize - order, np.int32)
        _decode_residual(br, blocksize, order, res)
        if L is not None:
            import ctypes as C
            L.flac_fixed_restore(
                res.ctypes.data_as(C.POINTER(C.c_int32)),
                len(res), order,
                data[order:].ctypes.data_as(C.POINTER(C.c_int32)),
            )
        else:
            for i in range(blocksize - order):
                j = order + i
                if order == 0:
                    data[j] = res[i]
                elif order == 1:
                    data[j] = res[i] + data[j - 1]
                elif order == 2:
                    data[j] = res[i] + 2 * data[j - 1] - data[j - 2]
                elif order == 3:
                    data[j] = (res[i] + 3 * data[j - 1] - 3 * data[j - 2]
                               + data[j - 3])
                else:
                    data[j] = (res[i] + 4 * data[j - 1] - 6 * data[j - 2]
                               + 4 * data[j - 3] - data[j - 4])
        out[:] = data
    elif sftype >= 32:  # LPC
        order = (sftype & 31) + 1
        warm = np.zeros(order + blocksize, np.int32)
        for i in range(order):
            warm[i] = br.read_signed(bps)
        prec = br.read(4) + 1
        if prec == 16:
            raise DecodeError("invalid qlp precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise DecodeError("negative qlp shift")
        coefs = np.zeros(order, np.int32)
        for i in range(order):
            coefs[i] = br.read_signed(prec)
        res = np.zeros(blocksize - order, np.int32)
        _decode_residual(br, blocksize, order, res)
        if L is not None:
            import ctypes as C
            L.flac_lpc_restore(
                res.ctypes.data_as(C.POINTER(C.c_int32)),
                len(res),
                coefs.ctypes.data_as(C.POINTER(C.c_int32)),
                order, shift,
                warm[order:].ctypes.data_as(C.POINTER(C.c_int32)),
            )
        else:
            data = warm
            for i in range(blocksize - order):
                j = order + i
                acc = 0
                for c in range(order):
                    acc += int(coefs[c]) * int(data[j - c - 1])
                data[j] = res[i] + (acc >> shift)
        out[:] = warm[:blocksize]
    else:
        raise DecodeError(f"reserved subframe type {sftype}")
    if wasted:
        out <<= wasted
    return out


def _native_stream_decode(data: bytes, pos: int, stream_bps: int,
                          stream_channels: int, total_samples: int):
    """Whole-stream native frame decode (native/flac_stream.c): one C
    call replaces the per-frame Python loop below (same semantics; the
    Python loop remains the spec/fallback).  Returns interleaved int32
    [n, ch], or None to fall back (no native lib, NO_NATIVE_FLAC, or a
    malformed stream — the fallback re-decodes for the exact error)."""
    L = native.lib()
    if L is None or os.environ.get("LIBNYQUIST_NO_NATIVE_FLAC"):
        return None
    import ctypes as C

    i32p = C.POINTER(C.c_int32)
    ch = stream_channels or 1
    # total_samples is an untrusted 36-bit header field: a corrupt value
    # must not drive a huge allocation (fuzz doctrine — bound every size
    # field before it allocates).  Start from it only when plausible
    # against the input size; undershoot is handled by grow-and-resume.
    cap = max(1 << 20, 2 * len(data))
    if total_samples:
        cap = min((total_samples + 65536) * ch, max(cap, 64 * len(data)))
    work = np.empty(8 * (32 + 65536) + 65536, np.int32)
    state = np.zeros(4, np.int64)
    state[0] = pos
    chunks = []
    while True:
        out = np.empty(cap, np.int32)
        r = L.flac_decode_stream(
            data, len(data), stream_bps,
            out.ctypes.data_as(i32p), cap, -1,
            work.ctypes.data_as(i32p),
            state.ctypes.data_as(C.POINTER(C.c_int64)))
        if r < 0:
            return None
        chunks.append(out[: int(state[2])])
        if state[3] != 1:          # 0 = EOF; 1 = output full, resume
            break
        cap *= 2
    got_ch = int(state[1])
    allv = np.concatenate(chunks) if len(chunks) > 1 else chunks[0]
    if got_ch == 0 or allv.size % got_ch:
        return None
    return allv.reshape(-1, got_ch)


def decode_ogg_flac(data: bytes, audio: AudioData) -> None:
    """Ogg-encapsulated FLAC (reference: FLAC/src/ogg_decoder_aspect.c,
    ogg_mapping.c: first packet = 0x7F 'FLAC' major minor nheaders(be16)
    + 'fLaC' + STREAMINFO; nheaders more metadata packets; then one
    audio frame per packet).  Strip the 9-byte mapping header and
    concatenate — the native stream scanner handles the rest."""
    from . import ogg

    for st in ogg.demux(data).values():
        if not (st.packets
                and st.packets[0].data.startswith(b"\x7fFLAC")):
            continue
        first = st.packets[0].data
        if len(first) < 13 or first[9:13] != b"fLaC":
            raise DecodeError("bad Ogg FLAC first packet")
        if first[5] != 1:
            raise DecodeError("unsupported Ogg FLAC mapping version")
        body = bytearray(first[9:])
        for p in st.packets[1:]:
            body += p.data
        decode_flac_buffer(bytes(body), audio)
        return
    raise DecodeError("no Ogg FLAC stream found")


def decode_flac_buffer(data: bytes, audio: AudioData) -> None:
    if not data.startswith(b"fLaC"):
        raise DecodeError("bad FLAC marker")
    pos = 4
    stream_bps = 16
    stream_channels = 0
    stream_rate = 0
    total_samples = 0
    md5_expect = b""
    # Metadata blocks
    while pos + 4 <= len(data):
        hdr = data[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0 and length >= 34:  # STREAMINFO
            stream_rate = int.from_bytes(body[10:13], "big") >> 4
            stream_channels = ((body[12] >> 1) & 0x7) + 1
            stream_bps = (
                ((body[12] & 1) << 4) | (body[13] >> 4)
            ) + 1
            total_samples = (
                (body[13] & 0xF) << 32
            ) | int.from_bytes(body[14:18], "big")
            md5_expect = bytes(body[18:34])
        pos += 4 + length
        if last:
            break

    pcm = _native_stream_decode(data, pos, stream_bps, stream_channels,
                                total_samples)
    if pcm is None:
        pcm = _python_stream_decode(data, pos, stream_bps, stream_rate)
    if total_samples:
        pcm = pcm[:total_samples]
    if (md5_expect and md5_expect != b"\x00" * 16
            and os.environ.get("LIBNYQUIST_FLAC_MD5")):
        # STREAMINFO MD5 of the unencoded data: interleaved little-endian
        # signed samples, (bps+7)/8 bytes each (libFLAC md5.c
        # format_input_ / stream_decoder.c FLAC__stream_decoder_finish
        # md5 comparison).  Off by default like libFLAC's md5_checking;
        # set LIBNYQUIST_FLAC_MD5=1 to verify (decode integrity test).
        import hashlib

        nb = (stream_bps + 7) // 8
        flat = pcm.reshape(-1)
        if nb in (1, 2, 4):
            raw = flat.astype(f"<i{nb}").tobytes()
        else:
            raw = (flat.astype("<i8").view(np.uint8)
                   .reshape(-1, 8)[:, :nb].tobytes())
        if hashlib.md5(raw).digest() != md5_expect:
            raise DecodeError("FLAC MD5 signature mismatch")
    scale = np.float32(1.0 / (1 << (stream_bps - 1)))
    audio.channel_count = pcm.shape[1]
    audio.sample_rate = stream_rate
    audio.source_format = {
        8: PCMFormat.PCM_S8, 16: PCMFormat.PCM_16, 20: PCMFormat.PCM_24,
        24: PCMFormat.PCM_24, 32: PCMFormat.PCM_32,
    }.get(stream_bps, PCMFormat.PCM_16)
    audio.samples = (pcm.reshape(-1).astype(np.float32) * scale)
    audio.length_seconds = (
        pcm.shape[0] / stream_rate if stream_rate else 0.0
    )


def _python_stream_decode(data: bytes, pos: int, stream_bps: int,
                          stream_rate: int):
    """Pure-Python frame loop: the spec for native/flac_stream.c and
    the fallback when it is unavailable or rejects a stream.  Returns
    int64 [n, ch]."""
    chunks = []
    n = len(data)
    while pos + 4 < n:
        # Frame sync: 14 bits 0b11111111111110
        if not (data[pos] == 0xFF and (data[pos + 1] & 0xFC) == 0xF8):
            pos += 1
            continue
        br = BitReader(data, pos * 8)
        br.read(14)
        br.read(1)  # reserved
        _blocking = br.read(1)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)  # reserved
        _num = _read_utf8_coded(br)
        blocksize = _BLOCKSIZE_TAB[bs_code]
        if blocksize == -1:
            blocksize = br.read(8) + 1
        elif blocksize == -2:
            blocksize = br.read(16) + 1
        rate = _RATE_TAB[sr_code]
        if rate == -1:
            rate = br.read(8) * 1000
        elif rate == -2:
            rate = br.read(16)
        elif rate == -3:
            rate = br.read(16) * 10
        elif rate == 0:
            rate = stream_rate
        bps = _BPS_TAB[bps_code] or stream_bps
        br.read(8)  # CRC-8 (not verified; libFLAC verifies)
        if ch_code < 8:
            channels = ch_code + 1
            assign = "indep"
        elif ch_code == 8:
            channels, assign = 2, "left_side"
        elif ch_code == 9:
            channels, assign = 2, "right_side"
        elif ch_code == 10:
            channels, assign = 2, "mid_side"
        else:
            raise DecodeError("reserved channel assignment")

        subs = []
        for c in range(channels):
            ebps = bps
            if assign == "left_side" and c == 1:
                ebps += 1
            elif assign == "right_side" and c == 0:
                ebps += 1
            elif assign == "mid_side" and c == 1:
                ebps += 1
            subs.append(
                _decode_subframe(br, blocksize, ebps).astype(np.int64)
            )
        br.align()
        br.read(16)  # CRC-16
        pos = (br.pos + 7) // 8

        if assign == "left_side":
            left = subs[0]
            side = subs[1]
            right = left - side
            frame = np.stack([left, right], 1)
        elif assign == "right_side":
            side, right = subs[0], subs[1]
            left = side + right
            frame = np.stack([left, right], 1)
        elif assign == "mid_side":
            mid, side = subs[0], subs[1]
            mid = (mid << 1) | (side & 1)
            left = (mid + side) >> 1
            right = (mid - side) >> 1
            frame = np.stack([left, right], 1)
        else:
            frame = np.stack(subs, 1)
        chunks.append(frame)

    if not chunks:
        raise DecodeError("no FLAC frames decoded")
    return np.concatenate(chunks, axis=0)
