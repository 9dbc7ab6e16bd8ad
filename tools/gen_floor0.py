#!/usr/bin/env python3
"""Synthesize a floor0 (LSP floor) Ogg Vorbis fixture.

Modern encoders emit floor1 only; floor0 is extinct in the wild but
normative (Vorbis I spec §6, reference libvorbis/src/floor0.c), so the
fixture is built by hand: a minimal mono 8 kHz stream — one 256-sample
block mode, an LSP codebook (lookup type 1), a residue-1 setup with a
scalar classbook and one value book — packed with an LSB-first writer
mirroring the decoder's LsbBits.  Validated against the reference's
own libvorbis build (tests/test_vorbis.py floor0 cases).

Usage: python tools/gen_floor0.py [out.ogg]
"""

import pathlib
import struct
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from libnyquist_tpu.formats.ogg import write_page_multi, write_page
from libnyquist_tpu.formats.vorbis import build_codewords


class W:
    """LSB-first bit writer (inverse of vorbis.LsbBits)."""

    def __init__(self):
        self.bits = []

    def write(self, v, n):
        for i in range(n):
            self.bits.append((int(v) >> i) & 1)

    def write_code(self, code, n):
        """Huffman codeword: decoder reads bit-by-bit MSB-first."""
        for i in range(n - 1, -1, -1):
            self.bits.append((int(code) >> i) & 1)

    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def f32_pack(x):
    """Inverse of vorbis float32_unpack."""
    if x == 0:
        return 0
    sign = 0x80000000 if x < 0 else 0
    x = abs(x)
    exp = 788
    while x < (1 << 20):
        x *= 2.0
        exp -= 1
    while x >= (1 << 21):
        x /= 2.0
        exp += 1
    return sign | (exp << 21) | int(round(x)) & 0x1FFFFF


ORDER = 8
RATE = 8000
BARKMAP = 64
AMPBITS = 6
AMPDB = 60
BS_EXP = 8            # blocksize 256, n2 = 128
N2 = 128
PART_SIZE = 8
N_PART = N2 // PART_SIZE          # 16
CLASSES = 2
CB_DIM = 4                        # classbook dim: 4 partitions/word


def codebooks():
    """(floor LSP book, residue classbook, residue value book) specs:
    (dim, entries, lengths, lookup: None | (min, delta, valbits, seq,
    quantvals_list))."""
    # lookup type 1: quantvals = largest v with v^dim <= entries, so
    # dim-4 16-entry books carry exactly 2 quant values each
    # sequence_p=1: coefficients accumulate by at least `min` per step,
    # keeping the LSP roots distinct (coincident roots make p+q -> 0)
    lsp = (4, 16, [4] * 16, (0.15, 0.22, 1, 1, [0, 1]))
    # classbook: scalar, 16 entries (2 classes ^ dim 4)
    cls = (CB_DIM, 16, [4] * 16, None)
    # value book: dim 4, 16 entries, values {-1.5, +1.5}
    val = (4, 16, [4] * 16, (-1.5, 3.0, 1, 0, [0, 1]))
    return [lsp, cls, val]


def write_codebook(w, spec):
    dim, entries, lengths, lookup = spec
    w.write(0x564342, 24)
    w.write(dim, 16)
    w.write(entries, 24)
    w.write(0, 1)               # not ordered
    w.write(0, 1)               # not sparse
    for ln in lengths:
        w.write(ln - 1, 5)
    if lookup is None:
        w.write(0, 4)
        return
    mn, delta, valbits, seq, quants = lookup
    w.write(1, 4)               # lookup type 1
    w.write(f32_pack(mn), 32)
    w.write(f32_pack(delta), 32)
    w.write(valbits - 1, 4)
    w.write(seq, 1)
    # type 1: lookup_values = largest v with v^dim <= entries
    v = 1
    while (v + 1) ** dim <= entries:
        v += 1
    assert v == len(quants)
    for qv in quants:
        w.write(qv, valbits)


def setup_packet():
    w = W()
    for ch in b"\x05vorbis":
        w.write(ch, 8)
    books = codebooks()
    w.write(len(books) - 1, 8)
    for spec in books:
        write_codebook(w, spec)
    w.write(0, 6)               # 1 time domain transform
    w.write(0, 16)
    w.write(0, 6)               # 1 floor
    w.write(0, 16)              # floor type 0
    w.write(ORDER, 8)
    w.write(RATE, 16)
    w.write(BARKMAP, 16)
    w.write(AMPBITS, 6)
    w.write(AMPDB, 8)
    w.write(0, 4)               # numbooks - 1
    w.write(0, 8)               # book id 0 (LSP book)
    w.write(0, 6)               # 1 residue
    w.write(1, 16)              # residue type 1
    w.write(0, 24)              # begin
    w.write(N2, 24)             # end
    w.write(PART_SIZE - 1, 24)
    w.write(CLASSES - 1, 6)
    w.write(1, 8)               # classbook id
    # cascade: class 0 -> no passes, class 1 -> pass 0
    w.write(0, 3); w.write(0, 1)          # class 0 low bits, no high
    w.write(1, 3); w.write(0, 1)          # class 1: pass 0 on
    w.write(2, 8)               # class 1 pass 0 -> value book id 2
    w.write(0, 6)               # 1 mapping
    w.write(0, 16)              # mapping type 0
    w.write(0, 1)               # no submaps flag
    w.write(0, 1)               # no coupling
    w.write(0, 2)               # reserved
    # mono, 1 submap: no mux written
    w.write(0, 8)               # time config (unused)
    w.write(0, 8)               # submap floor 0
    w.write(0, 8)               # submap residue 0
    w.write(0, 6)               # 1 mode
    w.write(0, 1)               # blockflag 0
    w.write(0, 16); w.write(0, 16)        # window/transform type
    w.write(0, 8)               # mapping 0
    w.write(1, 1)               # framing
    return w.bytes()


def _lsp_vector(entry):
    """Unquantized dim-4 LSP-book vector for `entry` (lookup type 1,
    quants [0,1], seq accumulation — mirrors _book_unquantize)."""
    mn, delta = codebooks()[0][3][:2]
    vals, last = [], 0.0
    for j in range(4):
        v = mn + ((entry >> j) & 1) * delta + last
        vals.append(v)
        last = v
    return vals


def _sim_curve_max(e1, e2, ampraw):
    """Max of the floor0 curve these packet choices produce (the same
    even-order p/q product the decoder computes) — used to reject
    degenerate root sets that drive the reference to inf."""
    v1 = _lsp_vector(e1)
    lsp = np.array(v1 + [v + v1[-1] for v in _lsp_vector(e2)])
    amp = ampraw / ((1 << AMPBITS) - 1) * AMPDB
    lsp2 = 2.0 * np.cos(lsp)
    ks = np.arange(BARKMAP)
    w = 2.0 * np.cos(np.pi * ks / BARKMAP)
    p = np.full(len(ks), 0.5)
    q = np.full(len(ks), 0.5)
    for j in range(1, ORDER, 2):
        q *= w - lsp2[j - 1]
        p *= w - lsp2[j]
    p = p * p * (2.0 - w)
    q = q * q * (2.0 + w)
    with np.errstate(divide="ignore", over="ignore"):
        val = np.exp((amp / np.sqrt(p + q) - AMPDB) * 0.11512925)
    return float(np.max(val))


def _pick_packet_params(k):
    """Deterministic per-packet (ampraw, lsp entries) with a bounded
    curve (reference float32 stays finite with ample margin)."""
    for attempt in range(64):
        e1 = (3 * k + 1 + attempt) % 16
        e2 = (5 * k + 7 + 3 * attempt) % 16
        ampraw = 8 + ((k + attempt) % 9)
        if _sim_curve_max(e1, e2, ampraw) < 50.0:
            return ampraw, e1, e2
    raise AssertionError(f"no sane floor0 packet params for k={k}")


def audio_packet(k):
    """One mono packet: floor0 amplitude + LSP words, residue-1 data."""
    w = W()
    w.write(0, 1)               # audio packet
    # ilog(0 modes - 1) = 0 bits of mode number (single mode)
    books = codebooks()
    lsp_codes = build_codewords(books[0][2])
    cls_codes = build_codewords(books[1][2])
    val_codes = build_codewords(books[2][2])
    ampraw, e1, e2 = _pick_packet_params(k)
    w.write(ampraw, AMPBITS)
    w.write(0, 1)               # book number (ilog(1) = 1 bit)
    # 2 LSP codewords (dim 4 x 2 = order 8): pick varying entries
    w.write_code(lsp_codes[e1], 4)
    w.write_code(lsp_codes[e2], 4)
    # residue type 1, 1 pass: partitions classified by classbook words
    # classword value = sum class_i * CLASSES^(dim-1-i) — all class 1
    # -> entry 15
    ptr = 0
    rng = np.random.default_rng(k)
    while ptr < N_PART:
        w.write_code(cls_codes[15], 4)
        for _ in range(min(CB_DIM, N_PART - ptr)):
            # class 1 decodes PART_SIZE/dim = 2 value words
            for _ in range(PART_SIZE // 4):
                w.write_code(val_codes[int(rng.integers(16))], 4)
            ptr += 1
    return w.bytes()


def main(out_path):
    idw = W()
    for ch in b"\x01vorbis":
        idw.write(ch, 8)
    idw.write(0, 32)            # version
    idw.write(1, 8)             # channels
    idw.write(RATE, 32)
    idw.write(0, 32); idw.write(0, 32); idw.write(0, 32)  # bitrates
    idw.write(BS_EXP, 4); idw.write(BS_EXP, 4)
    idw.write(1, 1)             # framing
    idp = idw.bytes()

    cw = W()
    for ch in b"\x03vorbis":
        cw.write(ch, 8)
    vendor = b"libnyquist_tpu floor0 fixture"
    cw.write(len(vendor), 32)
    for ch in vendor:
        cw.write(ch, 8)
    cw.write(0, 32)             # no comments
    cw.write(1, 1)
    cmt = cw.bytes()

    setup = setup_packet()
    n_pkts = 40
    pkts = [audio_packet(k) for k in range(n_pkts)]

    serial = 0x464C3030
    pages = [write_page(idp, 0, serial, 0, bos=True),
             write_page_multi([cmt, setup], 0, serial, 1)]
    half = N2
    # packet k>=1 contributes n2 samples; granule = samples so far
    group = 8
    seq = 2
    for i in range(0, n_pkts, group):
        sub = pkts[i : i + group]
        done = min(i + group, n_pkts)
        granule = max(done - 1, 0) * half
        pages.append(write_page_multi(
            sub, granule, serial, seq, eos=(done >= n_pkts)))
        seq += 1
    data = b"".join(pages)
    pathlib.Path(out_path).write_bytes(data)
    print(f"wrote {out_path}: {len(data)} bytes, "
          f"{(n_pkts - 1) * half} samples @ {RATE} Hz")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "tests/fixtures/floor0_mono8k.ogg")
