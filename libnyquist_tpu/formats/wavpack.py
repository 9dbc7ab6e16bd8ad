"""WavPack (.wv) lossless decoder.

Re-implementation of the WavPack 4/5 decode path from the format's
public semantics (reference: third_party/wavpack/src — block layout
wavpack_local.h:134 WavpackHeader, metadata walk open_utils.c:655
read_metadata_buff/process_metadata, entropy words read_words.c:327
get_words_lossless, decorrelation unpack.c:506/568 decorr_*_pass,
joint-stereo undo + final shift unpack.c:199/680 fixup_samples, float
restore unpack_floats.c float_values_nowvx, int32 info open_utils.c:412).

The branchy entropy/decorrelation hot loops run in the native host
library (native/hostops.c wv_words_lossless / wv_decorr_*) with pure
Python fallbacks. Output is interleaved float32: float streams pass
through (normalized), integer streams are scaled by 2^(bps-1) like the
upstream consumer.

Lossless, hybrid lossy (incl. wvx float restore), int32 and DSD
streams are supported (tests/test_wavpack.py covers all four; DSD
modes 0/1/3 per unpack_dsd.c, decoded bit-exact and decimated 8:1 to
24-bit PCM like OPEN_DSD_AS_PCM).
"""

from __future__ import annotations

import ctypes
import os
import struct

import numpy as np

from ..audio_data import AudioData, PCMFormat
from ..errors import DecodeError
from ..runtime import native

# header flags (wavpack_local.h:176-201)
BYTES_STORED = 3
MONO_FLAG = 4
HYBRID_FLAG = 8
JOINT_STEREO = 0x10
CROSS_DECORR = 0x20
HYBRID_SHAPE = 0x40
FLOAT_DATA = 0x80
INT32_DATA = 0x100
HYBRID_BITRATE = 0x200
HYBRID_BALANCE = 0x400
INITIAL_BLOCK = 0x800
FINAL_BLOCK = 0x1000
SHIFT_LSB = 13
MAG_LSB = 18
SRATE_LSB = 23
FALSE_STEREO = 0x40000000
MONO_DATA = MONO_FLAG | FALSE_STEREO

# metadata ids (wavpack_local.h:228-260)
ID_DECORR_TERMS = 0x2
ID_DECORR_WEIGHTS = 0x3
ID_DECORR_SAMPLES = 0x4
ID_ENTROPY_VARS = 0x5
ID_HYBRID_PROFILE = 0x6
ID_FLOAT_INFO = 0x8
ID_INT32_INFO = 0x9
ID_WV_BITSTREAM = 0xA
ID_WVX_BITSTREAM = 0xC
ID_DSD_BLOCK = 0xE
ID_SAMPLE_RATE = 0x27
ID_ODD_SIZE = 0x40
ID_LARGE = 0x80

DSD_FLAG = 0x80000000

MAX_TERM = 8

SAMPLE_RATES = [6000, 8000, 9600, 11025, 12000, 16000, 22050, 24000,
                32000, 44100, 48000, 64000, 88200, 96000, 192000]

# float_flags (wavpack_local.h:435-439)
FLOAT_SHIFT_ONES = 1
FLOAT_SHIFT_SAME = 2
FLOAT_SHIFT_SENT = 4
FLOAT_ZEROS_SENT = 8
FLOAT_NEG_ZEROS = 0x10

_EXP2 = [
    0x00, 0x01, 0x01, 0x02, 0x03, 0x03, 0x04, 0x05, 0x06, 0x06, 0x07, 0x08,
    0x08, 0x09, 0x0A, 0x0B, 0x0B, 0x0C, 0x0D, 0x0E, 0x0E, 0x0F, 0x10, 0x10,
    0x11, 0x12, 0x13, 0x13, 0x14, 0x15, 0x16, 0x16, 0x17, 0x18, 0x19, 0x19,
    0x1A, 0x1B, 0x1C, 0x1D, 0x1D, 0x1E, 0x1F, 0x20, 0x20, 0x21, 0x22, 0x23,
    0x24, 0x24, 0x25, 0x26, 0x27, 0x28, 0x28, 0x29, 0x2A, 0x2B, 0x2C, 0x2C,
    0x2D, 0x2E, 0x2F, 0x30, 0x30, 0x31, 0x32, 0x33, 0x34, 0x35, 0x35, 0x36,
    0x37, 0x38, 0x39, 0x3A, 0x3A, 0x3B, 0x3C, 0x3D, 0x3E, 0x3F, 0x40, 0x41,
    0x41, 0x42, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x48, 0x49, 0x4A, 0x4B,
    0x4C, 0x4D, 0x4E, 0x4F, 0x50, 0x51, 0x51, 0x52, 0x53, 0x54, 0x55, 0x56,
    0x57, 0x58, 0x59, 0x5A, 0x5B, 0x5C, 0x5D, 0x5E, 0x5E, 0x5F, 0x60, 0x61,
    0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x6B, 0x6C, 0x6D,
    0x6E, 0x6F, 0x70, 0x71, 0x72, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x7B, 0x7C, 0x7D, 0x7E, 0x7F, 0x80, 0x81, 0x82, 0x83, 0x84, 0x85,
    0x87, 0x88, 0x89, 0x8A, 0x8B, 0x8C, 0x8D, 0x8E, 0x8F, 0x90, 0x91, 0x92,
    0x93, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0x9B, 0x9C, 0x9D, 0x9F, 0xA0,
    0xA1, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA8, 0xA9, 0xAA, 0xAB, 0xAC, 0xAD,
    0xAF, 0xB0, 0xB1, 0xB2, 0xB3, 0xB4, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xBC,
    0xBD, 0xBE, 0xBF, 0xC0, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC8, 0xC9, 0xCA,
    0xCB, 0xCD, 0xCE, 0xCF, 0xD0, 0xD2, 0xD3, 0xD4, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDB, 0xDC, 0xDD, 0xDE, 0xE0, 0xE1, 0xE2, 0xE4, 0xE5, 0xE6, 0xE8, 0xE9,
    0xEA, 0xEC, 0xED, 0xEE, 0xF0, 0xF1, 0xF2, 0xF4, 0xF5, 0xF6, 0xF8, 0xF9,
    0xFA, 0xFC, 0xFD, 0xFF,
]


def _exp2s(log: int) -> int:
    """entropy_utils.c wp_exp2s: signed log2 -> 32-bit value."""
    if log < 0:
        return -_exp2s(-log)
    value = _EXP2[log & 0xFF] | 0x100
    shift = (log >> 8) - 9
    return value << shift if shift > 0 else value >> -shift


def _restore_weight(w: int) -> int:
    """entropy_utils.c restore_weight (signed char -> weight)."""
    if w >= 128:
        w -= 256
    result = w << 3
    if result > 0:
        result += (result + 64) >> 7
    return result


def _i32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


class _Pass:
    __slots__ = ("term", "delta", "weight_a", "weight_b",
                 "samples_a", "samples_b")

    def __init__(self, term, delta):
        self.term = term
        self.delta = delta
        self.weight_a = 0
        self.weight_b = 0
        self.samples_a = np.zeros(MAX_TERM, np.int32)
        self.samples_b = np.zeros(MAX_TERM, np.int32)


# ---------------------------------------------------------------------------
# pure-Python fallbacks for the native hot loops
# ---------------------------------------------------------------------------

class _LsbBits:
    """LSB-first bit reader (WavPack bitstream convention)."""

    __slots__ = ("buf", "pos", "limit")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.limit = len(buf) * 8

    def getbit(self) -> int:
        p = self.pos
        self.pos = p + 1
        if p >= self.limit:
            return 1
        return (self.buf[p >> 3] >> (p & 7)) & 1

    def getbits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.getbit() << i
        return v


def _read_code(bs: _LsbBits, maxcode: int) -> int:
    if maxcode < 2:
        return bs.getbit() if maxcode else 0
    bitcount = maxcode.bit_length()
    extras = (1 << bitcount) - maxcode - 1
    code = bs.getbits(bitcount - 1)
    if code >= extras:
        code = (code << 1) - extras + bs.getbit()
    return code


def _unary_escape(bs: _LsbBits, limit: int = 33):
    cbits = 0
    while cbits < limit and bs.getbit():
        cbits += 1
    if cbits == limit:
        return None
    if cbits < 2:
        return cbits
    return (1 << (cbits - 1)) | bs.getbits(cbits - 1)


def _words_lossless_py(bs, out, nvalues, med, st, mono):
    holding_one, holding_zero, zeros_acc = st[0], st[1], st[2]

    def get_med(c, m):
        return (int(med[c * 3 + m]) >> 4) + 1

    def inc(c, m, div):
        med[c * 3 + m] = (med[c * 3 + m]
                          + ((med[c * 3 + m] + div) // div) * 5) & 0xFFFFFFFF

    def dec(c, m, div):
        med[c * 3 + m] = (med[c * 3 + m]
                          - ((med[c * 3 + m] + div - 2) // div) * 2) & 0xFFFFFFFF

    divs = (128, 64, 32)
    n = 0
    while n < nvalues:
        c = 0 if mono else (n & 1)
        if holding_zero:
            holding_zero = 0
            low = _read_code(bs, get_med(c, 0) - 1)
            dec(c, 0, 128)
            out[n] = _i32(~low) if bs.getbit() else low
            n += 1
            if n == nvalues:
                break
            c = 0 if mono else (n & 1)

        if med[0] < 2 and not holding_one and med[3] < 2:
            if zeros_acc:
                zeros_acc -= 1
                if zeros_acc:
                    out[n] = 0
                    n += 1
                    continue
            else:
                v = _unary_escape(bs)
                if v is None:
                    break
                zeros_acc = v
                if zeros_acc:
                    med[:] = 0
                    out[n] = 0
                    n += 1
                    continue

        ones_count = 0
        while ones_count < 17 and bs.getbit():
            ones_count += 1
        if ones_count == 17:
            break
        if ones_count == 16:
            v = _unary_escape(bs)
            if v is None:
                break
            ones_count = v + 16

        prev = holding_one
        holding_one = ones_count & 1
        holding_zero = (~ones_count) & 1
        ones_count = (ones_count >> 1) + prev

        if ones_count == 0:
            low = 0
            high = get_med(c, 0) - 1
            dec(c, 0, 128)
        else:
            low = get_med(c, 0)
            inc(c, 0, 128)
            if ones_count == 1:
                high = low + get_med(c, 1) - 1
                dec(c, 1, 64)
            else:
                low += get_med(c, 1)
                inc(c, 1, 64)
                if ones_count == 2:
                    high = low + get_med(c, 2) - 1
                    dec(c, 2, 32)
                else:
                    low += (ones_count - 2) * get_med(c, 2)
                    high = low + get_med(c, 2) - 1
                    inc(c, 2, 32)

        low += _read_code(bs, high - low)
        out[n] = _i32(~low) if bs.getbit() else low
        n += 1

    st[0], st[1], st[2], st[3] = holding_one, holding_zero, zeros_acc, n


_NBITS = [0] + [i.bit_length() for i in range(1, 256)]

_LOG2_T = [
    0x00, 0x01, 0x03, 0x04, 0x06, 0x07, 0x09, 0x0A, 0x0B, 0x0D, 0x0E, 0x10,
    0x11, 0x12, 0x14, 0x15, 0x16, 0x18, 0x19, 0x1A, 0x1C, 0x1D, 0x1E, 0x20,
    0x21, 0x22, 0x24, 0x25, 0x26, 0x28, 0x29, 0x2A, 0x2C, 0x2D, 0x2E, 0x2F,
    0x31, 0x32, 0x33, 0x34, 0x36, 0x37, 0x38, 0x39, 0x3B, 0x3C, 0x3D, 0x3E,
    0x3F, 0x41, 0x42, 0x43, 0x44, 0x45, 0x47, 0x48, 0x49, 0x4A, 0x4B, 0x4D,
    0x4E, 0x4F, 0x50, 0x51, 0x52, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A,
    0x5C, 0x5D, 0x5E, 0x5F, 0x60, 0x61, 0x62, 0x63, 0x64, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x6B, 0x6C, 0x6D, 0x6E, 0x6F, 0x70, 0x71, 0x72, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x7B, 0x7C, 0x7D, 0x7E, 0x7F, 0x80, 0x81,
    0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x8B, 0x8C, 0x8D,
    0x8E, 0x8F, 0x90, 0x91, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99,
    0x9A, 0x9B, 0x9B, 0x9C, 0x9D, 0x9E, 0x9F, 0xA0, 0xA1, 0xA2, 0xA3, 0xA4,
    0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xA9, 0xAA, 0xAB, 0xAC, 0xAD, 0xAE, 0xAF,
    0xB0, 0xB1, 0xB2, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xB9,
    0xBA, 0xBB, 0xBC, 0xBD, 0xBE, 0xBF, 0xC0, 0xC0, 0xC1, 0xC2, 0xC3, 0xC4,
    0xC5, 0xC6, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xCB, 0xCB, 0xCC, 0xCD, 0xCE,
    0xCF, 0xD0, 0xD0, 0xD1, 0xD2, 0xD3, 0xD4, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
    0xD8, 0xD9, 0xDA, 0xDB, 0xDC, 0xDC, 0xDD, 0xDE, 0xDF, 0xE0, 0xE0, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE4, 0xE5, 0xE6, 0xE7, 0xE7, 0xE8, 0xE9, 0xEA, 0xEA,
    0xEB, 0xEC, 0xED, 0xEE, 0xEE, 0xEF, 0xF0, 0xF1, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF4, 0xF5, 0xF6, 0xF7, 0xF7, 0xF8, 0xF9, 0xF9, 0xFA, 0xFB, 0xFC, 0xFC,
    0xFD, 0xFE, 0xFF, 0xFF,
]


def _wp_log2(avalue: int) -> int:
    """entropy_utils.c wp_log2."""
    avalue += avalue >> 9
    if avalue < (1 << 8):
        dbits = _NBITS[avalue]
        return (dbits << 8) + _LOG2_T[(avalue << (9 - dbits)) & 0xFF]
    if avalue < (1 << 16):
        dbits = _NBITS[avalue >> 8] + 8
    elif avalue < (1 << 24):
        dbits = _NBITS[avalue >> 16] + 16
    else:
        dbits = _NBITS[avalue >> 24] + 24
    return (dbits << 8) + _LOG2_T[(avalue >> (dbits - 9)) & 0xFF]


def _words_hybrid_py(bs, out, nvalues, med, st, hyb, flags):
    """Pure-Python get_word loop (read_words.c:67) for hybrid blocks."""
    SLS, SLO = 8, 128
    mono = bool(flags & MONO_DATA)
    hbr = bool(flags & HYBRID_BITRATE)
    hbal = bool(flags & HYBRID_BALANCE)
    holding_one, holding_zero, zeros_acc = int(st[0]), int(st[1]), int(st[2])
    error_limit = [0, 0]

    def get_med(c, m):
        return (int(med[c * 3 + m]) >> 4) + 1

    def inc(c, m, div):
        med[c * 3 + m] = (int(med[c * 3 + m])
                          + ((int(med[c * 3 + m]) + div) // div) * 5) \
            & 0xFFFFFFFF

    def dec(c, m, div):
        med[c * 3 + m] = (int(med[c * 3 + m])
                          - ((int(med[c * 3 + m]) + div - 2) // div) * 2) \
            & 0xFFFFFFFF

    n = 0
    while n < nvalues:
        c = 0 if mono else (n & 1)
        if med[0] < 2 and not holding_zero and not holding_one and med[3] < 2:
            if zeros_acc:
                zeros_acc -= 1
                if zeros_acc:
                    hyb[c] = _i32(int(hyb[c])
                                  - ((int(hyb[c]) + SLO) >> SLS))
                    out[n] = 0
                    n += 1
                    continue
            else:
                v = _unary_escape(bs)
                if v is None:
                    break
                zeros_acc = v
                if zeros_acc:
                    hyb[c] = _i32(int(hyb[c])
                                  - ((int(hyb[c]) + SLO) >> SLS))
                    med[:] = 0
                    out[n] = 0
                    n += 1
                    continue

        if holding_zero:
            ones_count = holding_zero = 0
        else:
            ones_count = 0
            while ones_count < 17 and bs.getbit():
                ones_count += 1
            if ones_count == 17:
                break
            if ones_count == 16:
                v = _unary_escape(bs)
                if v is None:
                    break
                ones_count = v + 16
            if holding_one:
                holding_one = ones_count & 1
                ones_count = (ones_count >> 1) + 1
            else:
                holding_one = ones_count & 1
                ones_count >>= 1
            holding_zero = (~holding_one) & 1

        if c == 0:
            # update_error_limit; bitrate_acc is uint32 (logical shift)
            hyb[2] = _i32(int(hyb[2]) + int(hyb[4]))
            b0 = (int(hyb[2]) & 0xFFFFFFFF) >> 16
            if mono:
                if hbr:
                    sl0 = (int(hyb[0]) + SLO) >> SLS
                    error_limit[0] = (_exp2s(sl0 - b0 + 0x100)
                                      if sl0 - b0 > -0x100 else 0)
                else:
                    error_limit[0] = _exp2s(b0)
            else:
                hyb[3] = _i32(int(hyb[3]) + int(hyb[5]))
                b1 = (int(hyb[3]) & 0xFFFFFFFF) >> 16
                if hbr:
                    sl0 = (int(hyb[0]) + SLO) >> SLS
                    sl1 = (int(hyb[1]) + SLO) >> SLS
                    if hbal:
                        balance = (sl1 - sl0 + b1 + 1) >> 1
                        if balance > b0:
                            b1, b0 = b0 * 2, 0
                        elif -balance > b0:
                            b0, b1 = b0 * 2, 0
                        else:
                            b0, b1 = b0 - balance, b0 + balance
                    error_limit[0] = (_exp2s(sl0 - b0 + 0x100)
                                      if sl0 - b0 > -0x100 else 0)
                    error_limit[1] = (_exp2s(sl1 - b1 + 0x100)
                                      if sl1 - b1 > -0x100 else 0)
                else:
                    error_limit[0] = _exp2s(b0)
                    error_limit[1] = _exp2s(b1)

        if ones_count == 0:
            low = 0
            high = get_med(c, 0) - 1
            dec(c, 0, 128)
        else:
            low = get_med(c, 0)
            inc(c, 0, 128)
            if ones_count == 1:
                high = low + get_med(c, 1) - 1
                dec(c, 1, 64)
            else:
                low += get_med(c, 1)
                inc(c, 1, 64)
                if ones_count == 2:
                    high = low + get_med(c, 2) - 1
                    dec(c, 2, 32)
                else:
                    low += (ones_count - 2) * get_med(c, 2)
                    high = low + get_med(c, 2) - 1
                    inc(c, 2, 32)

        low &= 0x7FFFFFFF
        high &= 0x7FFFFFFF
        if low > high:
            high = low
        mid = (high + low + 1) >> 1
        if not error_limit[c]:
            mid = _read_code(bs, high - low) + low
        else:
            while high - low > error_limit[c]:
                if bs.getbit():
                    low = mid
                    mid = (high + low + 1) >> 1
                else:
                    high = mid - 1
                    mid = (high + low + 1) >> 1
        sign = bs.getbit()
        if hbr:
            hyb[c] = _i32(int(hyb[c]) - ((int(hyb[c]) + SLO) >> SLS)
                          + _wp_log2(mid))
        out[n] = _i32(~mid) if sign else mid
        n += 1

    st[0], st[1], st[2], st[3] = holding_one, holding_zero, zeros_acc, n


def _apply_weight(weight: int, sample: int) -> int:
    # exact int32-wrapping version of wavpack_local.h:532-548 apply_weight
    if -32768 <= sample <= 32767:
        return _i32(_i32(weight * sample) + 512) >> 10
    lo = _i32((sample & 0xFFFF) * weight) >> 9
    hi = _i32(((sample - (sample & 0xFFFF)) >> 9) * weight)
    return _i32(lo + hi + 1) >> 1


def _update_weight(weight, delta, source, result):
    if source and result:
        s = -1 if (source ^ result) < 0 else 0
        weight = (delta ^ s) + (weight - s)
    return weight


def _update_weight_clip(weight, delta, source, result):
    if source and result:
        s = -1 if (source ^ result) < 0 else 0
        weight = (weight ^ s) + (delta - s)
        if weight > 1024:
            weight = 1024
        weight = (weight ^ s) - s
    return weight


def _decorr_mono_py(p: _Pass, buf, nsamples):
    w = p.weight_a
    sa = [int(x) for x in p.samples_a]
    term, delta = p.term, p.delta
    if term == 17 or term == 18:
        for i in range(nsamples):
            if term == 17:
                sam = _i32(2 * sa[0] - sa[1])
            else:
                sam = _i32((3 * sa[0] - sa[1]) >> 1)
            sa[1] = sa[0]
            sa[0] = _i32(_apply_weight(w, sam) + int(buf[i]))
            w = _update_weight(w, delta, sam, int(buf[i]))
            buf[i] = sa[0]
    else:
        m, k = 0, term & (MAX_TERM - 1)
        for i in range(nsamples):
            sam = sa[m]
            v = _i32(_apply_weight(w, sam) + int(buf[i]))
            w = _update_weight(w, delta, sam, int(buf[i]))
            sa[k] = v
            buf[i] = v
            m = (m + 1) & (MAX_TERM - 1)
            k = (k + 1) & (MAX_TERM - 1)
        if m:
            tmp = list(sa)
            for k in range(MAX_TERM):
                sa[k] = tmp[(m + k) & (MAX_TERM - 1)]
    p.weight_a = w
    p.samples_a[:] = sa


def _decorr_stereo_py(p: _Pass, buf, nsamples):
    wa, wb = p.weight_a, p.weight_b
    sa = [int(x) for x in p.samples_a]
    sb = [int(x) for x in p.samples_b]
    term, delta = p.term, p.delta
    nv = nsamples * 2
    if term in (17, 18):
        for i in range(0, nv, 2):
            if term == 17:
                sam = _i32(2 * sa[0] - sa[1])
            else:
                sam = _i32(sa[0] + ((sa[0] - sa[1]) >> 1))
            sa[1] = sa[0]
            tmp = int(buf[i])
            sa[0] = _i32(_apply_weight(wa, sam) + tmp)
            wa = _update_weight(wa, delta, sam, tmp)
            buf[i] = sa[0]
            if term == 17:
                sam = _i32(2 * sb[0] - sb[1])
            else:
                sam = _i32(sb[0] + ((sb[0] - sb[1]) >> 1))
            sb[1] = sb[0]
            tmp = int(buf[i + 1])
            sb[0] = _i32(_apply_weight(wb, sam) + tmp)
            wb = _update_weight(wb, delta, sam, tmp)
            buf[i + 1] = sb[0]
    elif term > 0:
        m, k = 0, term & (MAX_TERM - 1)
        for i in range(0, nv, 2):
            sam = sa[m]
            v = _i32(_apply_weight(wa, sam) + int(buf[i]))
            wa = _update_weight(wa, delta, sam, int(buf[i]))
            sa[k] = v
            buf[i] = v
            sam = sb[m]
            v = _i32(_apply_weight(wb, sam) + int(buf[i + 1]))
            wb = _update_weight(wb, delta, sam, int(buf[i + 1]))
            sb[k] = v
            buf[i + 1] = v
            m = (m + 1) & (MAX_TERM - 1)
            k = (k + 1) & (MAX_TERM - 1)
    elif term == -1:
        for i in range(0, nv, 2):
            sam = _i32(int(buf[i]) + _apply_weight(wa, sa[0]))
            wa = _update_weight_clip(wa, delta, sa[0], int(buf[i]))
            buf[i] = sam
            sa[0] = _i32(int(buf[i + 1]) + _apply_weight(wb, sam))
            wb = _update_weight_clip(wb, delta, sam, int(buf[i + 1]))
            buf[i + 1] = sa[0]
    elif term == -2:
        for i in range(0, nv, 2):
            sam = _i32(int(buf[i + 1]) + _apply_weight(wb, sb[0]))
            wb = _update_weight_clip(wb, delta, sb[0], int(buf[i + 1]))
            buf[i + 1] = sam
            sb[0] = _i32(int(buf[i]) + _apply_weight(wa, sam))
            wa = _update_weight_clip(wa, delta, sam, int(buf[i]))
            buf[i] = sb[0]
    elif term == -3:
        for i in range(0, nv, 2):
            sam_a = _i32(int(buf[i]) + _apply_weight(wa, sa[0]))
            wa = _update_weight_clip(wa, delta, sa[0], int(buf[i]))
            sam_b = _i32(int(buf[i + 1]) + _apply_weight(wb, sb[0]))
            wb = _update_weight_clip(wb, delta, sb[0], int(buf[i + 1]))
            buf[i] = sb[0] = sam_a
            buf[i + 1] = sa[0] = sam_b
    p.weight_a, p.weight_b = wa, wb
    p.samples_a[:] = sa
    p.samples_b[:] = sb


# ---------------------------------------------------------------------------
# block decode
# ---------------------------------------------------------------------------

class _Block:
    """One parsed WavPack block with its metadata applied."""

    def __init__(self, hdr_flags, block_samples, data):
        self.flags = hdr_flags
        self.block_samples = block_samples
        self.passes: list[_Pass] = []
        self.medians = np.zeros(6, np.uint32)
        self.wvbits = None
        self.wvxbits = None
        self.float_flags = 0
        self.float_shift = 0
        self.float_max_exp = 0
        self.float_norm_exp = 0
        self.int32_sent_bits = 0
        self.int32_zeros = 0
        self.int32_ones = 0
        self.int32_dups = 0
        # hybrid state: [slow0, slow1, acc0, acc1, delta0, delta1]
        self.hyb = np.zeros(6, np.int32)
        self._parse_metadata(data)

    def _parse_metadata(self, data: bytes):
        mono = bool(self.flags & MONO_DATA)
        pos = 0
        while pos + 2 <= len(data):
            mid = data[pos]
            length = data[pos + 1] << 1
            pos += 2
            if mid & ID_LARGE:
                mid &= ~ID_LARGE
                length += (data[pos] << 9) + (data[pos + 1] << 17)
                pos += 2
            if mid & ID_ODD_SIZE:
                mid &= ~ID_ODD_SIZE
                length -= 1
            body = data[pos : pos + length]
            pos += length + (length & 1)

            if mid == ID_DECORR_TERMS:
                terms = []
                for b in body:
                    term = (b & 0x1F) - 5
                    delta = (b >> 5) & 0x7
                    terms.append(_Pass(term, delta))
                terms.reverse()
                self.passes = terms
            elif mid == ID_DECORR_WEIGHTS:
                # specified from the last term backwards (decorr_utils.c:61)
                cnt = len(body) // (1 if mono else 2)
                bi = 0
                for p in reversed(self.passes):
                    if cnt == 0:
                        break
                    cnt -= 1
                    p.weight_a = _restore_weight(body[bi])
                    bi += 1
                    if not mono:
                        p.weight_b = _restore_weight(body[bi])
                        bi += 1
            elif mid == ID_DECORR_SAMPLES:
                bi = 0
                for p in reversed(self.passes):
                    if bi >= len(body):
                        break
                    if p.term > MAX_TERM:
                        p.samples_a[0] = _exp2s(
                            struct.unpack_from("<h", body, bi)[0])
                        p.samples_a[1] = _exp2s(
                            struct.unpack_from("<h", body, bi + 2)[0])
                        bi += 4
                        if not mono:
                            p.samples_b[0] = _exp2s(
                                struct.unpack_from("<h", body, bi)[0])
                            p.samples_b[1] = _exp2s(
                                struct.unpack_from("<h", body, bi + 2)[0])
                            bi += 4
                    elif p.term < 0:
                        p.samples_a[0] = _exp2s(
                            struct.unpack_from("<h", body, bi)[0])
                        p.samples_b[0] = _exp2s(
                            struct.unpack_from("<h", body, bi + 2)[0])
                        bi += 4
                    else:
                        for m in range(p.term):
                            p.samples_a[m] = _exp2s(
                                struct.unpack_from("<h", body, bi)[0])
                            bi += 2
                            if not mono:
                                p.samples_b[m] = _exp2s(
                                    struct.unpack_from("<h", body, bi)[0])
                                bi += 2
            elif mid == ID_ENTROPY_VARS:
                vals = struct.unpack_from(f"<{len(body) // 2}H", body, 0)
                for i, v in enumerate(vals[: 3 if mono else 6]):
                    self.medians[i] = _exp2s(v) & 0xFFFFFFFF
            elif mid == ID_HYBRID_PROFILE:
                # read_hybrid_profile (entropy_utils.c)
                bi = 0
                if self.flags & HYBRID_BITRATE:
                    self.hyb[0] = _exp2s(
                        struct.unpack_from("<h", body, bi)[0])
                    bi += 2
                    if not mono:
                        self.hyb[1] = _exp2s(
                            struct.unpack_from("<h", body, bi)[0])
                        bi += 2
                self.hyb[2] = _i32(
                    struct.unpack_from("<H", body, bi)[0] << 16)
                bi += 2
                if not mono:
                    self.hyb[3] = _i32(
                        struct.unpack_from("<H", body, bi)[0] << 16)
                    bi += 2
                if bi < len(body):
                    self.hyb[4] = _exp2s(
                        struct.unpack_from("<h", body, bi)[0])
                    bi += 2
                    if not mono:
                        self.hyb[5] = _exp2s(
                            struct.unpack_from("<h", body, bi)[0])
                        bi += 2
            elif mid == ID_FLOAT_INFO and len(body) == 4:
                self.float_flags = body[0]
                self.float_shift = body[1]
                self.float_max_exp = body[2]
                self.float_norm_exp = body[3]
            elif mid == ID_INT32_INFO and len(body) == 4:
                self.int32_sent_bits = body[0]
                self.int32_zeros = body[1]
                self.int32_ones = body[2]
                self.int32_dups = body[3]
            elif mid == ID_WV_BITSTREAM:
                self.wvbits = body
            elif mid == ID_WVX_BITSTREAM:
                # 4-byte crc_x then the side bitstream (open_utils.c:393)
                self.wvxbits = body[4:]

    def decode(self) -> np.ndarray:
        """-> int32 array [block_samples * (1 or 2)] (pre-normalization)."""
        flags = self.flags
        if self.wvbits is None:
            raise DecodeError("WavPack block has no audio bitstream")
        mono = bool(flags & MONO_DATA)
        hybrid = bool(flags & HYBRID_FLAG)
        nvalues = self.block_samples * (1 if mono else 2)
        out = np.zeros(nvalues, np.int32)
        st = np.zeros(4, np.uint32)
        L = native.lib()
        if L is not None and hasattr(L, "wv_decode_block"):
            # Fused native path: words -> decorr -> joint stereo in one
            # call (native/hostops.c wv_decode_block).
            i32p = ctypes.POINTER(ctypes.c_int32)
            buf = self.wvbits + b"\xff" * 8
            nps = len(self.passes)
            terms = np.zeros(max(nps, 1), np.int32)
            deltas = np.zeros(max(nps, 1), np.int32)
            weights = np.zeros((max(nps, 1), 2), np.int32)
            sa = np.zeros((max(nps, 1), MAX_TERM), np.int32)
            sb = np.zeros((max(nps, 1), MAX_TERM), np.int32)
            for i, p in enumerate(self.passes):
                terms[i] = p.term
                deltas[i] = p.delta
                weights[i] = (p.weight_a, p.weight_b)
                sa[i] = p.samples_a
                sb[i] = p.samples_b
            hflg = ((1 if flags & HYBRID_BITRATE else 0)
                    | (2 if flags & HYBRID_BALANCE else 0)
                    | (4 if mono else 0))
            L.wv_decode_block(
                buf, len(self.wvbits) * 8,
                out.ctypes.data_as(i32p), nvalues,
                self.medians.ctypes.data_as(
                    ctypes.POINTER(ctypes.c_uint32)),
                st.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                self.hyb.ctypes.data_as(i32p), hflg,
                1 if hybrid else 0,
                nps, terms.ctypes.data_as(i32p),
                deltas.ctypes.data_as(i32p),
                weights.ctypes.data_as(i32p),
                sa.ctypes.data_as(i32p), sb.ctypes.data_as(i32p),
                1 if mono else 0,
                1 if (not mono and flags & JOINT_STEREO) else 0,
                self.block_samples,
            )
            if int(st[3]) != nvalues:
                raise DecodeError("WavPack entropy decode ran out of data")
            for i, p in enumerate(self.passes):
                p.weight_a = int(weights[i, 0])
                p.weight_b = int(weights[i, 1])
                p.samples_a[:] = sa[i]
                p.samples_b[:] = sb[i]
            return self._fixup(out, flags)
        out = self.decode_words()
        self.apply_decorr(out)
        return self._fixup(out, flags)

    def decode_words(self) -> np.ndarray:
        """Entropy words only -> int32 residuals (pre-decorrelation).

        Split out of decode() so the cross-block SIMD decorrelation
        (native/wv_simd.c) can batch the decorrelation of many blocks
        after their serial entropy stages.
        """
        flags = self.flags
        if self.wvbits is None:
            raise DecodeError("WavPack block has no audio bitstream")
        mono = bool(flags & MONO_DATA)
        hybrid = bool(flags & HYBRID_FLAG)
        nvalues = self.block_samples * (1 if mono else 2)
        out = np.zeros(nvalues, np.int32)
        st = np.zeros(4, np.uint32)
        L = native.lib()
        if L is not None and hasattr(L, "wv_words_lossless"):
            buf = self.wvbits + b"\xff" * 8
            if hybrid:
                hflg = ((1 if flags & HYBRID_BITRATE else 0)
                        | (2 if flags & HYBRID_BALANCE else 0)
                        | (4 if mono else 0))
                L.wv_words_hybrid(
                    buf, len(self.wvbits) * 8, 0,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    nvalues,
                    self.medians.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_uint32)),
                    st.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                    self.hyb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    hflg,
                )
            else:
                L.wv_words_lossless(
                    buf, len(self.wvbits) * 8, 0,
                    out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                    nvalues,
                    self.medians.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_uint32)),
                    st.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                    1 if mono else 0,
                )
            got = int(st[3])
        else:
            bs = _LsbBits(self.wvbits)
            if hybrid:
                _words_hybrid_py(bs, out, nvalues, self.medians, st,
                                 self.hyb, flags)
            else:
                _words_lossless_py(bs, out, nvalues, self.medians, st, mono)
            got = int(st[3])
        if got != nvalues:
            raise DecodeError("WavPack entropy decode ran out of data")
        return out

    def apply_decorr(self, out: np.ndarray) -> None:
        """Decorrelation passes + joint-stereo undo, in place (scalar)."""
        flags = self.flags
        mono = bool(flags & MONO_DATA)
        L = native.lib()
        if L is not None and hasattr(L, "wv_decorr_stereo"):
            for p in self.passes:
                weights = np.array([p.weight_a, p.weight_b], np.int32)
                if mono:
                    L.wv_decorr_mono(
                        p.term, p.delta,
                        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        p.samples_a.ctypes.data_as(
                            ctypes.POINTER(ctypes.c_int32)),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        self.block_samples,
                    )
                else:
                    L.wv_decorr_stereo(
                        p.term, p.delta,
                        weights.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        p.samples_a.ctypes.data_as(
                            ctypes.POINTER(ctypes.c_int32)),
                        p.samples_b.ctypes.data_as(
                            ctypes.POINTER(ctypes.c_int32)),
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        self.block_samples,
                    )
                p.weight_a, p.weight_b = int(weights[0]), int(weights[1])
        else:
            for p in self.passes:
                if mono:
                    _decorr_mono_py(p, out, self.block_samples)
                else:
                    _decorr_stereo_py(p, out, self.block_samples)

        if not mono and (flags & JOINT_STEREO):
            # unpack.c:199 joint stereo undo (vectorized, int32 wrap)
            left = out[0::2]
            right = out[1::2]
            right -= left >> 1
            left += right

    def _fixup(self, out: np.ndarray, flags: int) -> np.ndarray:
        # fixup_samples (unpack.c:680)
        hybrid = bool(flags & HYBRID_FLAG)
        shift = (flags >> SHIFT_LSB) & 0x1F
        if flags & FLOAT_DATA:
            out = self._restore_float(out).view(np.int32)
            if flags & FALSE_STEREO:
                out = np.repeat(out, 2)
            return out
        if flags & INT32_DATA:
            sb, z = self.int32_sent_bits, self.int32_zeros
            o, d = self.int32_ones, self.int32_dups
            if self.wvxbits is not None:
                # literally-sent low bits from the side stream (unpack.c:699);
                # fixed-width LSB-first fields -> vectorized unpack
                if sb:
                    bits = np.unpackbits(
                        np.frombuffer(self.wvxbits, np.uint8),
                        bitorder="little",
                    )
                    need = len(out) * sb
                    if bits.size < need:
                        raise DecodeError("WavPack wvx stream too short")
                    fields = bits[:need].reshape(len(out), sb).astype(np.int64)
                    data = fields @ (1 << np.arange(sb, dtype=np.int64))
                    out = ((out.astype(np.int64) << sb) | data)
                    out = (out & 0xFFFFFFFF)
                    out = np.where(out >= 1 << 31, out - (1 << 32),
                                   out).astype(np.int32)
                if z:
                    out <<= z
                elif o:
                    out = ((out + 1) << o) - 1
                elif d:
                    out = ((out + (out & 1)) << d) - (out & 1)
            elif not sb and (z or o or d):
                if z:
                    out <<= z
                elif o:
                    out = ((out + 1) << o) - 1
                elif d:
                    out = ((out + (out & 1)) << d) - (out & 1)
            else:
                shift += z + sb + o + d
        if hybrid:
            # lossy clip+shift (fixup_samples, unpack.c:750-785)
            bits = ((flags & BYTES_STORED) + 1) * 8
            min_v = -(1 << (bits - 1)) >> shift
            max_v = ((1 << (bits - 1)) - 1) >> shift
            out = np.clip(out, min_v, max_v) << shift
        elif shift:
            out <<= shift
        if flags & FALSE_STEREO:
            out = np.repeat(out, 2)
        return out

    def _restore_float(self, values: np.ndarray) -> np.ndarray:
        if self.wvxbits is not None:
            return self._restore_float_wvx(values)
        return self._restore_float_nowvx(values)

    def _restore_float_wvx(self, values: np.ndarray) -> np.ndarray:
        """unpack_floats.c float_values (lossless, with side bitstream)."""
        n = len(values)
        out = np.zeros(n, np.uint32)
        L = native.lib()
        if L is not None and hasattr(L, "wv_float_values"):
            L.wv_float_values(
                values.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
                self.wvxbits + b"\x00" * 8, len(self.wvxbits) * 8,
                self.float_flags, self.float_shift, self.float_max_exp,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            )
        else:
            bs = _LsbBits(self.wvxbits)
            ff = self.float_flags
            for i in range(n):
                shift_count = 0
                exp = self.float_max_exp
                sign = mantissa = exponent = 0
                v = int(values[i])
                if v == 0:
                    if ff & FLOAT_ZEROS_SENT:
                        if bs.getbit():
                            mantissa = bs.getbits(23)
                            if exp >= 25:
                                exponent = bs.getbits(8)
                            sign = bs.getbit()
                        elif ff & FLOAT_NEG_ZEROS:
                            sign = bs.getbit()
                else:
                    v = _i32(v << self.float_shift)
                    if v < 0:
                        v = -v
                        sign = 1
                    if v == 0x1000000:
                        if bs.getbit():
                            mantissa = bs.getbits(23)
                        exponent = 255
                    else:
                        if exp:
                            while not (v & 0x800000):
                                exp -= 1
                                if not exp:
                                    break
                                shift_count += 1
                                v = _i32(v << 1)
                        if shift_count:
                            if (ff & FLOAT_SHIFT_ONES) or (
                                (ff & FLOAT_SHIFT_SAME) and bs.getbit()
                            ):
                                v |= (1 << shift_count) - 1
                            elif ff & FLOAT_SHIFT_SENT:
                                v |= bs.getbits(shift_count)
                        mantissa = v & 0x7FFFFF
                        exponent = exp
                out[i] = (sign << 31) | (exponent << 23) | mantissa
        return self._normalize_float_bits(out)

    def _normalize_float_bits(self, bits: np.ndarray) -> np.ndarray:
        """WavpackFloatNormalize with OPEN_NORMALIZE (common_utils.c:576)."""
        delta_exp = 127 - self.float_norm_exp
        if delta_exp:
            e = (bits >> 23) & 0xFF
            new_e = e.astype(np.int64) + delta_exp
            zero_out = (e == 0) | (new_e <= 0)
            inf = (e == 255) | (new_e >= 255)
            bits = (bits & ~np.uint32(0xFF << 23)) \
                | ((np.clip(new_e, 0, 255).astype(np.uint32) & 0xFF) << 23)
            bits = np.where(zero_out, np.uint32(0), bits)
            bits = np.where(inf, (bits & np.uint32(0x80000000))
                            | np.uint32(0xFF << 23), bits)
        return bits.view(np.float32)

    def _restore_float_nowvx(self, values: np.ndarray) -> np.ndarray:
        """unpack_floats.c float_values_nowvx (native; numpy fallback)."""
        L = native.lib()
        if L is not None and hasattr(L, "wv_float_nowvx"):
            vals = np.ascontiguousarray(values, np.int32)
            out = np.empty(len(vals), np.uint32)
            L.wv_float_nowvx(
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(vals), self.float_flags, self.float_shift,
                self.float_max_exp,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            )
            return self._normalize_float_bits(out)
        v = values.astype(np.int64)
        v <<= self.float_shift
        v = (v & 0xFFFFFFFF)
        v = np.where(v >= 1 << 31, v - (1 << 32), v)
        sign = (v < 0).astype(np.uint32)
        v = np.abs(v)
        exp = np.full(v.shape, self.float_max_exp, np.int64)

        # case: overflow past 2^24 -> shift down, bump exponent
        big = v >= 0x1000000
        idx = big & ((v & 0xF000000) != 0)
        while np.any(idx):
            v[idx] >>= 1
            exp[idx] += 1
            idx = big & ((v & 0xF000000) != 0)

        # case: normalize small values up; C decrements exp on each failed
        # test too: while (!(v & 0x800000) && --exp) { shift; }
        small = (~big) & (v != 0)
        shift_count = np.zeros(v.shape, np.int64)
        if self.float_max_exp:
            pend = small.copy()
            while True:
                test = pend & ((v & 0x800000) == 0)
                if not test.any():
                    break
                exp[test] -= 1
                cont = test & (exp > 0)
                pend = cont
                v[cont] <<= 1
                shift_count[cont] += 1
        if self.float_flags & FLOAT_SHIFT_ONES:
            fill = np.where(shift_count > 0, (1 << shift_count) - 1, 0)
            v |= fill
        zero = values == 0
        exp = np.where(zero, 0, exp)
        v = np.where(zero, 0, v)
        sign = np.where(zero, 0, sign)
        bits = (sign.astype(np.uint32) << 31) \
            | ((exp.astype(np.uint32) & 0xFF) << 23) \
            | (v.astype(np.uint32) & 0x7FFFFF)
        return self._normalize_float_bits(bits)


# ---------------------------------------------------------------------------
# DSD (1-bit) blocks — reference unpack_dsd.c (a surface the reference
# ships in source but never compiles: its CMake omits ENABLE_DSD).
# Entropy decode is native (native/wv_dsd.c) with the bit-identical
# Python fallback below; the 8:1 decimation to PCM is the reference's
# 56-tap integer conv-table filter, vectorized (a [56]-tap strided conv
# — trivially a device matmul, but the facade path is host-bound).
# ---------------------------------------------------------------------------

_DSD_DECM_FILTER = (
    4, 17, 56, 147, 336, 692, 1315, 2337,
    3926, 6281, 9631, 14216, 20275, 28021, 37619, 49155,
    62616, 77870, 94649, 112551, 131049, 149507, 167220, 183448,
    197472, 208636, 216402, 220385, 220385, 216402, 208636, 197472,
    183448, 167220, 149507, 131049, 112551, 94649, 77870, 62616,
    49155, 37619, 28021, 20275, 14216, 9631, 6281, 3926,
    2337, 1315, 692, 336, 147, 56, 17, 4,
)
_DSD_LUT = None


def _dsd_decimate(ch_bytes: np.ndarray) -> np.ndarray:
    """DSD bytes [n] u8 -> 24-bit PCM [n] int32 (decimate_dsd_run:
    history primed with 0x55, per-byte conv tables, sum >> 4)."""
    global _DSD_LUT
    if _DSD_LUT is None:
        filt = np.asarray(_DSD_DECM_FILTER, np.int64)
        scale = ((1 << 23) - 1) / float(filt.sum()) * 16.0
        lut = np.zeros((7, 256), np.int64)
        j = np.arange(256)
        for i in range(56):
            term = int(np.floor(filt[i] * scale + 0.5))
            if term:
                bit = (j & (0x80 >> (i & 7))) != 0
                lut[i >> 3] += np.where(bit, term, -term)
        _DSD_LUT = lut
    n = ch_bytes.size
    hist = np.concatenate(
        [np.full(6, 0x55, np.uint8), ch_bytes]).astype(np.intp)
    acc = np.zeros(n, np.int64)
    for i in range(7):
        acc += _DSD_LUT[i][hist[i : i + n]]
    return (acc >> 4).astype(np.int32)


def _dsd_decode_py(data: bytes, mode: int, stereo: bool,
                   nframes: int) -> np.ndarray:
    """Pure-Python mirror of native/wv_dsd.c (unpack_dsd.c semantics).
    Returns interleaved DSD bytes [nframes * nch] u8."""
    nch = 2 if stereo else 1
    total = nframes * nch
    M = 0xFFFFFFFF

    if mode == 0:
        if len(data) != total:
            raise DecodeError("DSD raw block size mismatch")
        return np.frombuffer(data, np.uint8).copy()

    if mode == 1:
        pos = 0
        if len(data) < 2:
            raise DecodeError("short DSD fast block")
        history_bits = data[pos]; pos += 1
        if history_bits > 5:
            raise DecodeError("bad DSD history bits")
        bins = 1 << history_bits
        max_prob = data[pos]; pos += 1
        plane = np.zeros(bins * 256, np.uint8)
        if max_prob < 0xFF:
            op, oe = 0, bins * 256
            while op < oe and pos < len(data):
                code = data[pos]; pos += 1
                if code > max_prob:
                    run = min(code - max_prob, oe - op)
                    op += run
                elif code:
                    plane[op] = code
                    op += 1
                else:
                    break
            if op < oe or (pos < len(data) and data[pos] != 0):
                raise DecodeError("bad DSD probability plane")
            if pos < len(data):
                pos += 1
        elif len(data) - pos > bins * 256:
            plane[:] = np.frombuffer(data, np.uint8, bins * 256, pos)
            pos += bins * 256
        else:
            raise DecodeError("short DSD probability plane")
        prob = plane.reshape(bins, 256).astype(np.int64)
        summed = prob.cumsum(axis=1)
        if (summed[:, 255] > 32767).any():
            raise DecodeError("DSD probability bin overflow")
        if int(summed[:, 255].sum()) > bins * 1280:
            raise DecodeError("DSD probabilities too dense")
        lookup = [np.repeat(np.arange(256, dtype=np.uint8), prob[b])
                  for b in range(bins)]
        if len(data) - pos < 4:
            raise DecodeError("short DSD stream")
        value = int.from_bytes(data[pos : pos + 4], "big"); pos += 4
        low, high = 0, M
        p0 = p1 = 0
        out = np.zeros(total, np.uint8)
        sp = summed
        for i in range(total):
            s = int(sp[p0, 255])
            if not s:
                raise DecodeError("empty DSD probability bin")
            mult = (high - low) // s
            if not mult:
                if len(data) - pos >= 4:
                    value = ((value << 32) & M) | int.from_bytes(
                        data[pos : pos + 4], "big")
                    value &= M
                    pos += 4
                low, high = 0, M
                mult = high // s
                if not mult:
                    raise DecodeError("DSD coder stall")
            index = ((value - low) & M) // mult
            if index >= s:
                raise DecodeError("DSD index out of range")
            code = int(lookup[p0][index])
            if code:
                low = (low + int(sp[p0, code - 1]) * mult) & M
            high = (low + int(prob[p0, code]) * mult - 1) & M
            out[i] = code
            if not stereo:
                p0 = code & (bins - 1)
            else:
                p0, p1 = p1, code & (bins - 1)
            while not ((high ^ low) & 0xFF000000) and pos < len(data):
                value = ((value << 8) & M) | data[pos]
                high = ((high << 8) & M) | 0xFF
                low = (low << 8) & M
                pos += 1
        return out

    if mode == 3:
        pos = 0
        if len(data) < (20 if stereo else 13):
            raise DecodeError("short DSD high block")
        rate_i = data[pos]; pos += 1
        rate_s = data[pos]; pos += 1
        if rate_s != 20:
            raise DecodeError("bad DSD high rate_s")
        # init_ptable
        ptable = [0] * 256
        value = 0x808000
        rate = rate_i << 8
        for _ in range((rate + 128) >> 8):
            value += (0x00010000 - value) >> 8
        for i in range(128):
            ptable[i] = value
            ptable[255 - i] = 0x100FFFF - value
            if value > 0x010000:
                rate += (rate * rate_s + 128) >> 8
                for _ in range((rate + 64) >> 7):
                    value += (0x00010000 - value) >> 8
        filts = []
        for _ in range(nch):
            f = [0] * 10  # f0..f6, factor, byte, value
            f[1] = data[pos] << 12; pos += 1
            f[2] = data[pos] << 12; pos += 1
            f[3] = data[pos] << 12; pos += 1
            f[4] = data[pos] << 12; pos += 1
            f[5] = data[pos] << 12; pos += 1
            factor = data[pos] | (data[pos + 1] << 8); pos += 2
            if factor >= 0x8000:
                factor -= 0x10000
            f[7] = factor
            filts.append(f)
        if len(data) - pos < 4:
            raise DecodeError("short DSD stream")
        value = int.from_bytes(data[pos : pos + 4], "big"); pos += 4
        low, high = 0, M
        out = np.zeros(total, np.uint8)
        VALUE_ONE = 1 << 20

        def i32(x):  # the native plane computes in wrapping int32
            x &= M
            return x - 0x100000000 if x >= 0x80000000 else x

        for n in range(nframes):
            for f in filts:
                f[9] = i32(f[1] - f[5] + ((f[6] * f[7]) >> 2))
            for _ in range(8):
                for f in filts:
                    pi = (f[9] >> 8) & 0xFF
                    p = ptable[pi]
                    split = (low + ((high - low) >> 8) * (p >> 16)) & M
                    if value <= split:
                        high = split
                        ptable[pi] = p + ((0x010000FE - p) >> 8)
                        f[0] = -1
                    else:
                        low = (split + 1) & M
                        ptable[pi] = p + ((0x00010000 - p) >> 8)
                        f[0] = 0
                    while not ((high ^ low) & 0xFF000000) and pos < len(data):
                        value = ((value << 8) & M) | data[pos]
                        high = ((high << 8) & M) | 0xFF
                        low = (low << 8) & M
                        pos += 1
                    f[9] = i32(f[9] + (f[6] << 3))
                    f[8] = ((f[8] << 1) | (f[0] & 1)) & M
                    a = -1 if ((f[9] ^ f[0]) & 0x80000000) else 1
                    b = (-1 if ((f[9] ^ i32(f[9] - (f[6] << 4)))
                                & 0x80000000) else 0)
                    f[7] += a & b
                    f[1] += ((f[0] & VALUE_ONE) - f[1]) >> 6
                    f[2] += ((f[0] & VALUE_ONE) - f[2]) >> 4
                    f[3] += (f[2] - f[3]) >> 4
                    f[4] += (f[3] - f[4]) >> 4
                    f[9] = (f[4] - f[5]) >> 4
                    f[5] += f[9]
                    f[6] += (f[9] - f[6]) >> 3
                    f[9] = i32(f[1] - f[5] + ((f[6] * f[7]) >> 2))
            for c, f in enumerate(filts):
                out[n * nch + c] = f[8] & 0xFF
                f[7] -= (f[7] + 512) >> 10
        return out

    raise DecodeError(f"unsupported DSD mode {mode}")


def _decode_dsd_block(flags: int, block_samples: int,
                      body: bytes) -> tuple[np.ndarray, int]:
    """-> (interleaved DSD bytes u8 [block_samples * nch], dsd_power)."""
    # metadata walk for ID_DSD_BLOCK only (open_utils.c:754)
    pos = 0
    dsd = None
    while pos + 2 <= len(body):
        mid = body[pos]
        length = body[pos + 1] << 1
        pos += 2
        if mid & ID_LARGE:
            mid &= ~ID_LARGE
            length += (body[pos] << 9) + (body[pos + 1] << 17)
            pos += 2
        if mid & ID_ODD_SIZE:
            mid &= ~ID_ODD_SIZE
            length -= 1
        if mid == ID_DSD_BLOCK:
            dsd = body[pos : pos + length]
            break
        pos += length + (length & 1)
    if dsd is None or len(dsd) < 2:
        raise DecodeError("DSD block without DSD metadata")
    power, mode = dsd[0], dsd[1]
    if power > 14:
        raise DecodeError("bad DSD rate multiplier")
    payload = dsd[2:]
    stereo = not (flags & MONO_DATA)
    nch = 2 if stereo else 1

    L = native.lib()
    if L is not None and hasattr(L, "wv_dsd_decode"):
        out = np.zeros(block_samples * nch, np.uint8)
        r = L.wv_dsd_decode(
            payload, len(payload), int(mode), int(stereo),
            block_samples, out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)))
        if r < 0:
            raise DecodeError("malformed DSD block")
    else:
        out = _dsd_decode_py(payload, mode, stereo, block_samples)

    if flags & FALSE_STEREO:
        out = np.repeat(out, 2)
    return out, power


_SIMD_LANES = 8


def _decode_pcm_blocks(blocks: list) -> list:
    """Decode PCM blocks, batching decorrelation across blocks.

    WavPack blocks are independently decodable (each carries its own
    decorrelation spec/weights/history and entropy state in metadata —
    unpack_utils.c opens any block standalone), so blocks that declare
    the same term sequence run their decorrelation passes in lockstep
    SIMD lanes (native/wv_simd.c, 8 blocks per AVX2 vector).  The
    serial entropy stage stays per block; grouping is by
    (terms, block_samples, mono, joint).  Falls back to the scalar
    per-block path when the native SIMD kernel is unavailable.
    """
    L = native.lib()
    if (L is None or not hasattr(L, "wv_decorr_simd8")
            or len(blocks) < 4
            or os.environ.get("LIBNYQUIST_NO_WV_SIMD")):
        return [b.decode() for b in blocks]

    res = [b.decode_words() for b in blocks]
    groups: dict = {}
    for i, b in enumerate(blocks):
        mono = bool(b.flags & MONO_DATA)
        key = (tuple(p.term for p in b.passes), mono,
               bool(not mono and (b.flags & JOINT_STEREO)))
        groups.setdefault(key, []).append(i)

    i32p = ctypes.POINTER(ctypes.c_int32)
    vpp = ctypes.POINTER(ctypes.c_void_p)
    for (terms_t, mono, joint), idxs in groups.items():
        k = 0
        nps = len(terms_t)
        terms = np.array(terms_t or [0], np.int32)
        # a partial tail group of >=4 real lanes still beats the scalar
        # path (one 8-lane sweep costs about 3.5 scalar blocks measured);
        # unused lanes run on a scratch copy whose output is discarded.
        # Lanes may carry DIFFERENT block lengths (the stream's final
        # short blocks): shorter lanes run on a zero-padded copy up to
        # the sweep's longest block — the padded tail computes garbage
        # that is never copied back, and per-block weights/history are
        # not carried across blocks on this path (each block's metadata
        # restates them), so the over-run is harmless.
        while len(idxs) - k >= 4:
            lanes = idxs[k : k + _SIMD_LANES]
            bsamp = max(blocks[i].block_samples for i in lanes)
            nmax = max(res[i].size for i in lanes)
            deltas = np.zeros((max(nps, 1), 8), np.int32)
            weights = np.zeros((max(nps, 1), 2, 8), np.int32)
            sa = np.zeros((max(nps, 1), MAX_TERM, 8), np.int32)
            sb = np.zeros((max(nps, 1), MAX_TERM, 8), np.int32)
            addr = np.zeros(8, np.uint64)
            scratch = None
            padded = {}
            for ln, i in enumerate(lanes):
                for pi, p in enumerate(blocks[i].passes):
                    deltas[pi, ln] = p.delta
                    weights[pi, 0, ln] = p.weight_a
                    weights[pi, 1, ln] = p.weight_b
                    sa[pi, :, ln] = p.samples_a
                    sb[pi, :, ln] = p.samples_b
                if res[i].size < nmax:
                    pad = np.zeros(nmax, np.int32)
                    pad[: res[i].size] = res[i]
                    padded[i] = pad
                    addr[ln] = pad.ctypes.data
                else:
                    addr[ln] = res[i].ctypes.data
            if len(lanes) < _SIMD_LANES:
                scratch = np.zeros(nmax, np.int32)  # pad lanes, discarded
                for ln in range(len(lanes), _SIMD_LANES):
                    addr[ln] = scratch.ctypes.data
            rc = L.wv_decorr_simd8(
                nps, terms.ctypes.data_as(i32p),
                deltas.ctypes.data_as(i32p), weights.ctypes.data_as(i32p),
                sa.ctypes.data_as(i32p), sb.ctypes.data_as(i32p),
                addr.ctypes.data_as(vpp), bsamp,
                1 if mono else 0, 1 if joint else 0,
            )
            del scratch
            if not rc:      # no AVX2 / unsupported term: scalar lanes
                for i in lanes:
                    blocks[i].apply_decorr(res[i])
            else:
                for i, pad in padded.items():
                    res[i][:] = pad[: res[i].size]
            k += len(lanes)
        for i in idxs[k:]:
            blocks[i].apply_decorr(res[i])

    return [b._fixup(res[i], b.flags) for i, b in enumerate(blocks)]


def decode_wavpack_buffer(data: bytes, audio: AudioData) -> None:
    pos = 0
    n = len(data)
    chunks = []
    sample_rate = 0
    channels = 0
    total_samples = -1
    bps = 16
    is_float = False
    is_dsd = False
    dsd_power = -1
    found = False

    while pos + 32 <= n:
        if data[pos : pos + 4] != b"wvpk":
            pos += 1
            continue
        (cksize, version, index_u8, total_u8, total_lo, block_index,
         block_samples, flags, crc) = struct.unpack_from(
            "<IHBBIIIII", data, pos + 4)
        if cksize < 24 or pos + 8 + cksize > n or not (0x402 <= version
                                                       <= 0x410):
            pos += 1
            continue
        body = data[pos + 32 : pos + 8 + cksize]
        pos += 8 + cksize
        if not found:
            found = True
            if total_lo != 0xFFFFFFFF:
                total_samples = total_lo + (total_u8 << 32) - total_u8
            srate_idx = (flags >> SRATE_LSB) & 0xF
            sample_rate = (44100 if srate_idx == 0xF
                           else SAMPLE_RATES[srate_idx])
            is_float = bool(flags & FLOAT_DATA)
            shift = (flags >> SHIFT_LSB) & 0x1F
            bps = ((flags & BYTES_STORED) + 1) * 8 - shift
        if not block_samples:
            continue  # metadata-only block (tags etc.)
        if block_samples > 1 << 20:
            # no real encoder writes megasample blocks (PCM blocks are
            # <= ~1 s; DSD64 byte blocks ~350k/s); a corrupt u32 here
            # otherwise drives the native DSD bit loop for billions of
            # iterations — a CPU-burn denial found by the soak fuzzer
            raise DecodeError("implausible WavPack block length")
        if not (flags & INITIAL_BLOCK) or not (flags & FINAL_BLOCK):
            raise DecodeError(
                "multichannel (>2ch) WavPack segments not supported")
        nch = 1 if (flags & MONO_FLAG) and not (flags & FALSE_STEREO) else 2
        if channels == 0:
            channels = nch
            is_dsd = bool(flags & DSD_FLAG)
        elif is_dsd != bool(flags & DSD_FLAG):
            raise DecodeError("mixed DSD and PCM WavPack blocks")
        if flags & DSD_FLAG:
            dsd_bytes, power = _decode_dsd_block(flags, block_samples, body)
            if dsd_power < 0:
                dsd_power = power
            chunks.append(dsd_bytes)
        else:
            blk = _Block(flags, block_samples, body)
            chunks.append(blk)          # decoded in batch below

    pcm_blocks = [c for c in chunks if isinstance(c, _Block)]
    if pcm_blocks:
        decoded = iter(_decode_pcm_blocks(pcm_blocks))
        chunks = [next(decoded) if isinstance(c, _Block) else c
                  for c in chunks]

    if not found or not chunks:
        raise DecodeError("no WavPack blocks found")

    if dsd_power >= 0:
        # DSD: entropy-decoded 1-bit stream -> 24-bit PCM at the byte
        # rate (WavpackGetSampleRate semantics: header rate x 2^power;
        # one PCM sample per 8 DSD bits, unpack_dsd.c + OPEN_DSD_AS_PCM)
        planes = np.concatenate(chunks).reshape(-1, channels)
        pcm_i = np.stack(
            [_dsd_decimate(planes[:, c]) for c in range(channels)], axis=1
        ).reshape(-1)
        pcm = pcm_i.astype(np.float32) * np.float32(1.0 / (1 << 23))
        sample_rate *= 1 << dsd_power
        is_float = False
        bps = 24
    else:
        raw = np.concatenate(chunks)
        if is_float:
            pcm = raw.view(np.float32).copy()
        else:
            pcm = raw.astype(np.float32) * np.float32(1.0 / (1 << (bps - 1)))
    if total_samples >= 0:
        pcm = pcm[: total_samples * channels]

    audio.samples = pcm
    audio.channel_count = channels
    audio.sample_rate = sample_rate
    audio.source_format = (
        PCMFormat.PCM_FLT if is_float else
        {8: PCMFormat.PCM_S8, 16: PCMFormat.PCM_16, 24: PCMFormat.PCM_24,
         32: PCMFormat.PCM_32}.get(bps, PCMFormat.PCM_16)
    )
    audio.length_seconds = (
        len(pcm) / channels / sample_rate if sample_rate else 0.0
    )
