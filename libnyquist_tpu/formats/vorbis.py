"""Ogg Vorbis decoder (Vorbis I).

Re-implementation of the libvorbis decode path from the Vorbis I
specification (reference behavior: third_party/libvorbis/src —
codebook.c/sharedbook.c codebook decode, floor1.c floor curves (:956
floor1_inverse1, :1042 inverse2), res0.c residues 0/1/2, mapping0.c:700
channel coupling, mdct.c:397 IMDCT, block.c long/short window lapping,
vorbisfile.c ov_read_float output semantics).

Host side: Ogg demux, header/codebook parsing, packet entropy decode,
floor posts, residue vectors — branchy and serial. Dense side: the floor
curve multiply, IMDCT and window overlap-add are batched array math
(NumPy here; the CELT-style matmul IMDCT formulation in ops/imdct.py
applies identically and is used by the TPU batch path for fixed block
sizes).
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np

from ..audio_data import AudioData, PCMFormat
from ..errors import DecodeError
from . import ogg

_DATA = pathlib.Path(__file__).resolve().parents[1] / "data" / (
    "vorbis_tables.npz"
)


@functools.lru_cache(maxsize=1)
def _floor1_fromdb():
    return np.load(_DATA)["floor1_fromdb"].astype(np.float32)


def ilog(x: int) -> int:
    """Vorbis ilog: bits needed for x (ilog(0)=0, negative -> 0)."""
    if x <= 0:
        return 0
    return x.bit_length()


def float32_unpack(x: int) -> float:
    mantissa = x & 0x1FFFFF
    sign = x & 0x80000000
    exponent = (x & 0x7FE00000) >> 21
    if sign:
        mantissa = -mantissa
    return float(mantissa) * (2.0 ** (exponent - 788))


class LsbBits:
    """LSB-first bit reader (Vorbis convention)."""

    __slots__ = ("data", "pos", "limit", "eop")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.limit = len(data) * 8
        self.eop = False

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.limit:
            self.eop = True
            self.pos = self.limit
            return -1 if False else 0
        byte = self.pos >> 3
        off = self.pos & 7
        nbytes = (off + n + 7) >> 3
        chunk = int.from_bytes(
            self.data[byte : byte + nbytes], "little"
        )
        self.pos += n
        return (chunk >> off) & ((1 << n) - 1)

    def read1(self) -> int:
        return self.read(1)

    def peek(self, n: int) -> int:
        """Peek n bits without consuming; past-end bits read as zero."""
        byte = self.pos >> 3
        off = self.pos & 7
        nbytes = (off + n + 7) >> 3
        chunk = int.from_bytes(self.data[byte : byte + nbytes], "little")
        return (chunk >> off) & ((1 << n) - 1)


def build_codewords(lengths):
    """Assign codewords per the Vorbis I spec (§3.2.1 decision tree):
    entries in order each take the lowest available leaf at their depth in
    an incrementally-built binary tree. NOT canonical Huffman — the two
    differ when lengths are not sorted."""
    n = len(lengths)
    codes = [0] * n
    available = [0] * 33        # left-justified 32-bit prefixes
    first = True
    for i, ln in enumerate(lengths):
        if ln <= 0:
            continue
        if first:
            first = False
            codes[i] = 0
            for j in range(1, ln + 1):
                available[j] = 1 << (32 - j)
            continue
        z = ln
        while z > 0 and not available[z]:
            z -= 1
        if z == 0:
            raise DecodeError("over-subscribed codebook")
        res = available[z]
        available[z] = 0
        codes[i] = res >> (32 - ln)
        for y in range(z + 1, ln + 1):
            available[y] = res + (1 << (32 - y))
    return codes


class VorbisCodebook:
    def __init__(self, bits: LsbBits):
        if bits.read(24) != 0x564342:
            raise DecodeError("bad codebook sync")
        self.dimensions = bits.read(16)
        self.entries = bits.read(24)
        # every entry costs >= 1 coded bit, so a valid codebook can
        # never declare more entries than bits remain in the setup
        # packet — corrupt headers otherwise drive multi-minute parse
        # loops (decompression-bomb DoS)
        if self.entries > bits.limit - bits.pos:
            raise DecodeError("codebook entries exceed setup packet")
        ordered = bits.read1()
        lengths = [0] * self.entries
        if not ordered:
            sparse = bits.read1()
            for i in range(self.entries):
                if sparse:
                    if bits.read1():
                        lengths[i] = bits.read(5) + 1
                    else:
                        lengths[i] = 0  # unused
                else:
                    lengths[i] = bits.read(5) + 1
        else:
            cur_len = bits.read(5) + 1
            i = 0
            while i < self.entries:
                num = bits.read(ilog(self.entries - i))
                if bits.eop or cur_len > 32:
                    # EOF reads return 0 here (libvorbis gets -1 and
                    # errors), and codeword lengths cap at 32: without
                    # these checks a corrupt ordered codebook loops
                    # forever (num == 0 alone is legal: an empty run)
                    raise DecodeError("bad ordered codebook run")
                for _ in range(num):
                    if i >= self.entries:
                        raise DecodeError("ordered codebook overrun")
                    lengths[i] = cur_len
                    i += 1
                cur_len += 1
        self.lengths = lengths

        self.lookup_type = bits.read(4)
        self.vq = None
        if self.lookup_type == 1 or self.lookup_type == 2:
            if self.entries * max(self.dimensions, 1) > (1 << 18):
                # VQ expansion is an entries x dims Python loop; real
                # codebooks top out around 2.5k values (every ad-hoc
                # fixture) — 256k is a generous bomb guard
                raise DecodeError("codebook VQ table too large")
            minimum = float32_unpack(bits.read(32))
            delta = float32_unpack(bits.read(32))
            value_bits = bits.read(4) + 1
            sequence_p = bits.read1()
            if self.lookup_type == 1:
                if self.dimensions == 0:
                    # (lv+1)**0 == 1 <= entries would loop forever
                    raise DecodeError("VQ codebook with zero dimensions")
                # lookup1_values: largest v with v^dim <= entries
                lv = 0
                while (lv + 1) ** self.dimensions <= self.entries:
                    lv += 1
                quant_count = lv
            else:
                quant_count = self.entries * self.dimensions
            # same bomb guard: every mult costs value_bits >= 1 bits
            if quant_count > bits.limit - bits.pos:
                raise DecodeError("codebook lookup exceeds setup packet")
            mults = [bits.read(value_bits) for _ in range(quant_count)]
            # Build per-entry VQ vectors
            vq = np.zeros((self.entries, self.dimensions), np.float32)
            if self.lookup_type == 1:
                for e in range(self.entries):
                    last = 0.0
                    idx_div = 1
                    for d in range(self.dimensions):
                        off = (e // idx_div) % quant_count
                        v = mults[off] * delta + minimum + last
                        vq[e, d] = v
                        if sequence_p:
                            last = v
                        idx_div *= quant_count
            else:
                for e in range(self.entries):
                    last = 0.0
                    for d in range(self.dimensions):
                        v = (
                            mults[e * self.dimensions + d] * delta
                            + minimum + last
                        )
                        vq[e, d] = v
                        if sequence_p:
                            last = v
            # malformed float32_unpack exponents overflow the f32 cast
            # to inf and would NaN the whole spectrum downstream (fuzz
            # policy: finite output or typed error; no real encoder
            # emits values near f32 max)
            np.nan_to_num(vq, copy=False, posinf=0.0, neginf=0.0)
            self.vq = vq
        elif self.lookup_type != 0:
            raise DecodeError("reserved codebook lookup type")

        # Flat decode table over max 24-bit prefixes is too big; use a
        # two-level dict keyed by (length, code). Decoding walks bit by
        # bit accumulating the code MSB-first.
        codes = build_codewords(self.lengths)
        self.decode_map = {}
        self.min_len = 33
        self.max_len = 0
        for i, ln in enumerate(self.lengths):
            if ln > 0:
                self.decode_map[(ln, codes[i])] = i
                self.min_len = min(self.min_len, ln)
                self.max_len = max(self.max_len, ln)
        # Fast path: a W-bit LUT over the LSB-first peek window. Codeword
        # bits arrive MSB-of-codeword first, so the key is the
        # bit-reversed codeword with every upper-bit suffix filled in.
        W = min(self.max_len, 11) if self.max_len > 0 else 0
        self.lut_w = W
        if W > 0:
            lut = np.full(1 << W, -1, np.int32)
            for (ln, code), i in self.decode_map.items():
                if ln <= W:
                    rev = int(format(code, f"0{ln}b")[::-1], 2)
                    lut[rev :: 1 << ln] = (i << 6) | ln
            self.lut = lut
        else:
            self.lut = None

    def decode_scalar(self, bits: LsbBits) -> int:
        if self.lut is not None:
            v = int(self.lut[bits.peek(self.lut_w)])
            if v >= 0:
                ln = v & 63
                if bits.pos + ln > bits.limit:
                    bits.eop = True
                    bits.pos = bits.limit
                    raise EndOfPacket()
                bits.pos += ln
                return v >> 6
        code = 0
        ln = 0
        dm = self.decode_map
        while ln < self.max_len:
            b = bits.read1()
            if bits.eop:
                raise EndOfPacket()
            code = (code << 1) | b
            ln += 1
            if ln >= self.min_len:
                e = dm.get((ln, code))
                if e is not None:
                    return e
        raise EndOfPacket()

    def decode_vq(self, bits) -> np.ndarray:
        return self.vq[self.decode_scalar(bits)]

    def _tree_nodes(self) -> np.ndarray:
        """Binary decode tree as flat int32 node pairs for the native
        decoder: child 0 = unset, negative = ~entry leaf (-(entry+1))."""
        tr = getattr(self, "_tree", None)
        if tr is not None:
            return tr
        nodes = [0, 0]
        for (ln, code), e in self.decode_map.items():
            cur = 0
            for depth in range(ln - 1, 0, -1):
                b = (code >> depth) & 1
                nxt = nodes[2 * cur + b]
                if nxt == 0:
                    nodes.extend((0, 0))
                    nxt = (len(nodes) >> 1) - 1
                    nodes[2 * cur + b] = nxt
                cur = nxt
            nodes[2 * cur + (code & 1)] = -(e + 1)
        self._tree = np.array(nodes, np.int32)
        return self._tree


class EndOfPacket(Exception):
    pass


# --------------------------------------------------------------------------
# Native residue decode (native/vorbis_res.c) support
# --------------------------------------------------------------------------
_NATIVE_RES = None
_NATIVE_RES_TRIED = False


def _native_res():
    """The native library with vorbis_residue_decode, or None (cached:
    this sits on the per-call hot path)."""
    global _NATIVE_RES, _NATIVE_RES_TRIED
    if _NATIVE_RES_TRIED:
        return _NATIVE_RES
    _NATIVE_RES_TRIED = True
    import os

    if os.environ.get("LIBNYQUIST_NO_NATIVE_VORBIS"):
        return None
    from ..runtime import native

    L = native.lib()
    if L is None or not hasattr(L, "vorbis_residue_decode"):
        return None
    _NATIVE_RES = L
    return L


def _book_registry(books):
    """Flat codebook registry (LUTs, trees, VQ tables) marshalled once per
    logical stream; cached on books[0] so its lifetime tracks the setup."""
    first = books[0]
    reg = getattr(first, "_native_reg", None)
    if reg is not None and reg["key"] == id(books):
        return reg
    import ctypes

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    luts, lut_off, lut_w = [], [], []
    trees, tree_off, maxlen = [], [], []
    vq_chunks, vq_off, dims = [], [], []
    lo = to = vo = 0
    for bk in books:
        if bk.lut is not None:
            luts.append(np.ascontiguousarray(bk.lut, np.int32))
            lut_off.append(lo)
            lo += bk.lut.size
            lut_w.append(bk.lut_w)
        else:
            lut_off.append(lo)
            lut_w.append(0)
        tr = bk._tree_nodes()
        trees.append(tr)
        tree_off.append(to)
        to += tr.size
        maxlen.append(bk.max_len if bk.max_len <= 32 else 32)
        dims.append(bk.dimensions)
        if bk.vq is not None:
            v = np.ascontiguousarray(bk.vq, np.float32).reshape(-1)
            vq_chunks.append(v)
            vq_off.append(vo)
            vo += v.size
        else:
            vq_off.append(-1)

    def cat(chunks, dt):
        return (np.concatenate(chunks).astype(dt, copy=False)
                if chunks else np.zeros(1, dt))

    luts_a = cat(luts, np.int32)
    trees_a = cat(trees, np.int32)
    vqs_a = cat(vq_chunks, np.float32)
    reg = dict(
        key=id(books),
        luts=luts_a, trees=trees_a, vqs=vqs_a,
        lut_off=np.asarray(lut_off, np.int64),
        lut_w=np.asarray(lut_w, np.int32),
        tree_off=np.asarray(tree_off, np.int64),
        maxlen=np.asarray(maxlen, np.int32),
        vq_off=np.asarray(vq_off, np.int64),
        dims=np.asarray(dims, np.int32),
    )
    reg["ptrs"] = (
        reg["luts"].ctypes.data_as(i32p),
        reg["lut_off"].ctypes.data_as(i64p),
        reg["lut_w"].ctypes.data_as(i32p),
        reg["trees"].ctypes.data_as(i32p),
        reg["tree_off"].ctypes.data_as(i64p),
        reg["maxlen"].ctypes.data_as(i32p),
        reg["vqs"].ctypes.data_as(f32p),
        reg["vq_off"].ctypes.data_as(i64p),
        reg["dims"].ctypes.data_as(i32p),
    )
    reg["f32p"] = f32p
    reg["i64p"] = i64p
    reg["i32p"] = i32p
    first._native_reg = reg
    return reg




def _native_packet_ctx(channels, blocksizes, modes, mappings, floors,
                       residues, books):
    """Marshal the whole stream config for native/vorbis_res.c
    vorbis_packet_decode (built once per logical stream)."""
    L = _native_res()
    if L is None or not hasattr(L, "vorbis_packet_decode"):
        return None
    if channels > 8:
        return None
    if any(isinstance(fl, Floor0) for fl in floors):
        return None     # floor0: Python path (extinct stream shape)
    import ctypes

    try:
        reg = _book_registry(books)
        mode_cfg = np.asarray(
            [[bf, mi] for bf, mi in modes], np.int32).reshape(-1)
        map_meta, map_mux, map_submap, map_coup = [], [], [], []
        for mp in mappings:
            map_meta.extend([mp.submaps, len(mp.coupling),
                             len(map_mux), len(map_submap),
                             len(map_coup)])
            map_mux.extend(int(x) for x in mp.mux)
            for s in range(mp.submaps):
                map_submap.extend([int(mp.submap_floor[s]),
                                   int(mp.submap_residue[s])])
            for mag, ang in mp.coupling:
                map_coup.extend([int(mag), int(ang)])
        fl_cfgs, fl_nbrs, fl_sorts, fl_off = [], [], [], []
        for fl in floors:
            c = fl._native_cfg()
            fl_off.extend([sum(a.size for a in fl_cfgs),
                           sum(a.size for a in fl_nbrs),
                           sum(a.size for a in fl_sorts)])
            fl_cfgs.append(c["cfg"])
            fl_nbrs.append(c["nbrs"])
            fl_sorts.append(c["sort"])
        res_meta, res_books8 = [], []
        for r in residues:
            res_meta.extend([r.type, r.begin, r.end, r.partition_size,
                             r.classifications, r.classbook,
                             len(res_books8)])
            for row in r.books:
                res_books8.extend(int(b) for b in row)

        def cat(chunks, dt):
            return (np.concatenate(chunks).astype(dt, copy=False)
                    if chunks else np.zeros(1, dt))

        i32 = np.int32
        ctx = dict(
            reg=reg,
            channels=channels,
            bs0=int(blocksizes[0]), bs1=int(blocksizes[1]),
            mode_bits=ilog(len(modes) - 1),
            nmodes=len(modes),
            mode_cfg=np.ascontiguousarray(mode_cfg, i32),
            map_meta=np.asarray(map_meta, i32),
            map_mux=np.asarray(map_mux or [0], i32),
            map_submap=np.asarray(map_submap or [0], i32),
            map_coup=np.asarray(map_coup or [0], i32),
            fl_cfgs=cat(fl_cfgs, i32), fl_nbrs=cat(fl_nbrs, i32),
            fl_sorts=cat(fl_sorts, i32),
            fl_off=np.asarray(fl_off, np.int64),
            fromdb=np.ascontiguousarray(_floor1_fromdb(), np.float32),
            res_meta=np.asarray(res_meta, i32),
            res_books8=np.asarray(res_books8 or [0], i32),
        )
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        ctx["args"] = (
            int(channels), ctx["bs0"], ctx["bs1"], ctx["mode_bits"],
            ctx["mode_cfg"].ctypes.data_as(i32p), ctx["nmodes"],
            ctx["map_meta"].ctypes.data_as(i32p),
            ctx["map_mux"].ctypes.data_as(i32p),
            ctx["map_submap"].ctypes.data_as(i32p),
            ctx["map_coup"].ctypes.data_as(i32p),
            ctx["fl_cfgs"].ctypes.data_as(i32p),
            ctx["fl_nbrs"].ctypes.data_as(i32p),
            ctx["fl_sorts"].ctypes.data_as(i32p),
            ctx["fl_off"].ctypes.data_as(i64p),
            ctx["fromdb"].ctypes.data_as(f32p),
            ctx["res_meta"].ctypes.data_as(i32p),
            ctx["res_books8"].ctypes.data_as(i32p),
            *reg["ptrs"],
        )
        ctx["f32p"] = f32p
        ctx["i32p"] = i32p
        ctx["L"] = L
        return ctx
    except Exception:
        return None


# --------------------------------------------------------------------------
# Floors
# --------------------------------------------------------------------------
class Floor0:
    """LSP floor (Vorbis I spec §6, reference: libvorbis/src/floor0.c
    + lsp.c vorbis_lsp_to_curve).  Extinct in modern encoders but part
    of the spec surface; decoded on the Python path (the native packet
    plane handles floor1 streams only)."""

    def __init__(self, bits: LsbBits):
        self.order = bits.read(8)
        self.rate = bits.read(16)
        self.barkmap = bits.read(16)
        self.ampbits = bits.read(6)
        self.ampdB = bits.read(8)
        self.numbooks = bits.read(4) + 1
        self.books = [bits.read(8) for _ in range(self.numbooks)]
        if self.order < 1 or self.rate < 1 or self.barkmap < 1:
            raise DecodeError("bad floor0 header")
        self._maps = {}

    def _map(self, n2):
        m = self._maps.get(n2)
        if m is None:
            # floor0.c:126 floor0_map_lazy_init — band-edge bark bins
            def bark(x):
                return (13.1 * np.arctan(0.00074 * x)
                        + 2.24 * np.arctan(x * x * 1.85e-8)
                        + 1e-4 * x)

            scale = self.barkmap / bark(self.rate / 2.0)
            j = np.arange(n2)
            val = np.floor(
                bark((self.rate / 2.0) / n2 * j) * scale).astype(int)
            m = np.minimum(val, self.barkmap - 1)
            self._maps[n2] = m
        return m

    def decode_curve_native(self, bits, books, n2):
        """Full decode + LSP curve synthesis (floor0_inverse1/2).
        Returns the curve [n2] float64, or None (unused channel)."""
        ampraw = bits.read(self.ampbits)
        if ampraw <= 0:
            return None
        amp = ampraw / ((1 << self.ampbits) - 1) * self.ampdB
        booknum = bits.read(ilog(self.numbooks))
        if booknum >= self.numbooks:
            return None
        book = books[self.books[booknum]]
        lsp = []
        last = 0.0
        while len(lsp) < self.order:
            vec = book.decode_vq(bits)
            lsp.extend(float(v) + last for v in vec)
            last = lsp[-1]
        lsp = np.asarray(lsp[: self.order], np.float64)
        if not np.isfinite(lsp).all():
            # malformed stream: codebook float32_unpack overflow feeds
            # cos() a non-finite value (fuzz policy: typed error, never
            # NaN output)
            raise DecodeError("non-finite floor0 LSP values")

        # vorbis_lsp_to_curve (lsp.c:140): products over 2cos(lsp)
        m = self.order
        lsp2 = 2.0 * np.cos(lsp)
        mapv = self._map(n2)
        ks = np.unique(mapv)
        w = 2.0 * np.cos(np.pi * ks / self.barkmap)
        q = np.full(len(ks), 0.5)
        p = np.full(len(ks), 0.5)
        j = 1
        while j < m:
            q *= w - lsp2[j - 1]
            p *= w - lsp2[j]
            j += 2
        if j == m:  # odd order
            q *= w - lsp2[j - 1]
            p = p * p * (4.0 - w * w)
            q = q * q
        else:       # even order
            p = p * p * (2.0 - w)
            q = q * q * (2.0 + w)
        # clip: degenerate (coincident) LSP roots drive p+q -> 0; the
        # reference computes inf here, we keep the curve finite
        expo = np.clip(amp / np.sqrt(np.maximum(p + q, 1e-300))
                       - self.ampdB, -400.0, 400.0)
        val = np.exp(expo * 0.11512925)
        lut = np.zeros(self.barkmap, np.float64)
        lut[ks] = val
        return lut[mapv]


class Floor1:
    def __init__(self, bits: LsbBits):
        self.partitions = bits.read(5)
        self.partition_class = [bits.read(4) for _ in range(self.partitions)]
        maxclass = max(self.partition_class) if self.partitions else -1
        self.class_dim = []
        self.class_subs = []
        self.class_book = []
        self.subclass_books = []
        for c in range(maxclass + 1):
            self.class_dim.append(bits.read(3) + 1)
            subs = bits.read(2)
            self.class_subs.append(subs)
            self.class_book.append(bits.read(8) if subs else -1)
            books = []
            for _ in range(1 << subs):
                books.append(bits.read(8) - 1)
            self.subclass_books.append(books)
        self.mult = bits.read(2) + 1
        rangebits = bits.read(4)
        xs = [0, 1 << rangebits]
        for p in range(self.partitions):
            cls = self.partition_class[p]
            for _ in range(self.class_dim[cls]):
                xs.append(bits.read(rangebits))
        self.xlist = xs
        self.posts = len(xs)
        # sort order for curve rendering
        self.sort_idx = sorted(range(self.posts), key=lambda i: xs[i])

    RANGES = [256, 128, 86, 64]

    def _native_cfg(self):
        """Packed config for native/vorbis_res.c vorbis_floor1_decode
        (layout documented there); cached per floor instance."""
        cfg = getattr(self, "_ncfg", None)
        if cfg is not None:
            return cfg
        import ctypes

        nc = len(self.class_dim)
        rng = self.RANGES[self.mult - 1]
        parts = [self.partitions, self.mult, self.posts, rng,
                 ilog(rng - 1), nc]
        parts += list(self.partition_class)
        parts += list(self.class_dim)
        parts += list(self.class_subs)
        parts += list(self.class_book)
        for books in self.subclass_books:
            row = list(books) + [-1] * (8 - len(books))
            parts += row[:8]
        parts += list(self.xlist)
        cfg_a = np.asarray(parts, np.int32)
        nbrs = np.asarray(
            [v for pair in self._neighbors_all() for v in pair], np.int32)
        if nbrs.size == 0:
            nbrs = np.zeros(1, np.int32)
        sort_a = np.asarray(self.sort_idx, np.int32)
        fromdb = np.ascontiguousarray(_floor1_fromdb(), np.float32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        cfg = dict(
            cfg=cfg_a, nbrs=nbrs, sort=sort_a, fromdb=fromdb,
            cfg_p=cfg_a.ctypes.data_as(i32p),
            nbrs_p=nbrs.ctypes.data_as(i32p),
            sort_p=sort_a.ctypes.data_as(i32p),
            fromdb_p=fromdb.ctypes.data_as(f32p),
        )
        self._ncfg = cfg
        return cfg

    def decode_curve_native(self, bits, books, n2):
        """Native decode+curve: returns float32 curve [n2], None for an
        unused channel, raising EndOfPacket like the Python path.
        Falls back by returning False when native is unavailable."""
        L = _native_res()
        if L is None:
            return False
        import ctypes

        reg = _book_registry(books)
        cfg = self._native_cfg()
        st = np.array([bits.pos, 1 if bits.eop else 0], np.int64)
        curve = np.empty(n2, np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        rc = L.vorbis_floor1_decode(
            bits.data, len(bits.data), st.ctypes.data_as(reg["i64p"]),
            cfg["cfg_p"], cfg["nbrs_p"], cfg["sort_p"],
            *reg["ptrs"][:6],
            cfg["fromdb_p"], n2, curve.ctypes.data_as(f32p),
        )
        bits.pos = int(st[0])
        bits.eop = bool(st[1])
        if rc == -2:
            raise EndOfPacket()
        if rc == 0:
            return None
        return curve

    def decode(self, bits, books):
        if not bits.read1():
            return None  # unused channel this frame
        rng = self.RANGES[self.mult - 1]
        ys = [0] * self.posts
        ys[0] = bits.read(ilog(rng - 1))
        ys[1] = bits.read(ilog(rng - 1))
        offset = 2
        for p in range(self.partitions):
            cls = self.partition_class[p]
            cdim = self.class_dim[cls]
            csub = self.class_subs[cls]
            csubbits = csub
            cval = 0
            if csub:
                cval = books[self.class_book[cls]].decode_scalar(bits)
            for d in range(cdim):
                book = self.subclass_books[cls][cval & ((1 << csub) - 1)]
                cval >>= csub
                if book >= 0:
                    ys[offset + d] = books[book].decode_scalar(bits)
                else:
                    ys[offset + d] = 0
            offset += cdim
        return ys

    def compute(self, ys, n2):
        """Posts -> floor curve (length n2), integer math per spec
        (§7.2.4 curve computation)."""
        rng = self.RANGES[self.mult - 1]
        xs = self.xlist
        posts = self.posts
        step2 = [False] * posts
        finaly = [0] * posts
        finaly[0] = ys[0]
        finaly[1] = ys[1]
        step2[0] = step2[1] = True
        nbs = self._neighbors_all()
        for i in range(2, posts):
            lo, hi = nbs[i - 2]
            predicted = render_point(
                xs[lo], finaly[lo], xs[hi], finaly[hi], xs[i]
            )
            val = ys[i]
            highroom = rng - predicted
            lowroom = predicted
            room = 2 * min(highroom, lowroom)
            if val:
                step2[lo] = True
                step2[hi] = True
                step2[i] = True
                if val >= room:
                    if highroom > lowroom:
                        finaly[i] = val - lowroom + predicted
                    else:
                        finaly[i] = predicted - val + highroom - 1
                else:
                    if val & 1:
                        finaly[i] = predicted - ((val + 1) >> 1)
                    else:
                        finaly[i] = predicted + (val >> 1)
            else:
                step2[i] = False
                finaly[i] = predicted
        # One pass over the whole curve: each segment's Bresenham is the
        # closed form y(x) = y0 + sign(dy) * floor(|dy|*(x-x0)/adx), so
        # the full piecewise curve is a searchsorted + one integer
        # evaluation (replaces per-segment render_line calls, which
        # dominated the Vorbis host half).
        si = self.sort_idx
        bx = [0]
        by = [finaly[si[0]] * self.mult]
        for j in range(1, posts):
            i = si[j]
            if not step2[i]:
                continue
            bx.append(xs[i])
            by.append(finaly[i] * self.mult)
        bxa = np.asarray(bx, np.int64)
        bya = np.asarray(by, np.int64)
        curve = np.zeros(n2, np.int64)
        hx = int(bxa[-1])
        m = min(hx, n2)
        if len(bxa) > 1 and m > 0:
            x = np.arange(m)
            seg = np.searchsorted(bxa, x, side="right") - 1
            seg = np.clip(seg, 0, len(bxa) - 2)
            x0 = bxa[seg]
            y0 = bya[seg]
            dy = bya[seg + 1] - y0
            adx = np.maximum(bxa[seg + 1] - x0, 1)
            off = (np.abs(dy) * (x - x0)) // adx
            curve[:m] = y0 + np.where(dy >= 0, off, -off)
        if hx < n2:
            curve[hx:] = bya[-1]
        return _floor1_fromdb()[np.clip(curve, 0, 255)]

    def _neighbors(self, i):
        """low/high neighbor post indices (spec low_neighbor/
        high_neighbor: nearest xs below/above among posts 0..i-1)."""
        xs = self.xlist
        lo = max((j for j in range(i) if xs[j] < xs[i]),
                 key=lambda j: xs[j])
        hi = min((j for j in range(i) if xs[j] > xs[i]),
                 key=lambda j: xs[j])
        return lo, hi

    def _neighbors_all(self):
        """Neighbors depend only on the static xlist: compute once."""
        nb = getattr(self, "_nb", None)
        if nb is None:
            nb = [self._neighbors(i) for i in range(2, self.posts)]
            self._nb = nb
        return nb


def render_point(x0, y0, x1, y1, x):
    dy = y1 - y0
    adx = x1 - x0
    ady = abs(dy)
    err = ady * (x - x0)
    off = err // adx
    return y0 - off if dy < 0 else y0 + off


def render_line(x0, y0, x1, y1, curve, n):
    """Bresenham per the spec; the error accumulation collapses to the
    closed form y(x) = y0 + sign(dy) * floor(|dy|*(x-x0)/adx), which is
    what render_point computes -- vectorized over the segment."""
    dy = y1 - y0
    adx = x1 - x0
    if x1 > n:
        x1 = n
    if x0 >= x1:
        return
    xr = np.arange(x0, x1)
    if adx:
        off = (abs(dy) * (xr - x0)) // adx
        ys_ = y0 + off if dy >= 0 else y0 - off
    else:
        ys_ = np.full(x1 - x0, y0)
    curve[x0:x1] = ys_


# --------------------------------------------------------------------------
# Residues
# --------------------------------------------------------------------------
class Residue:
    def __init__(self, bits: LsbBits, rtype: int):
        self.type = rtype
        self.begin = bits.read(24)
        self.end = bits.read(24)
        self.partition_size = bits.read(24) + 1
        self.classifications = bits.read(6) + 1
        self.classbook = bits.read(8)
        cascades = []
        for _ in range(self.classifications):
            high = 0
            low = bits.read(3)
            if bits.read1():
                high = bits.read(5)
            cascades.append((high << 3) | low)
        self.cascades = cascades
        self.books = []
        for c in range(self.classifications):
            row = []
            for b in range(8):
                if cascades[c] & (1 << b):
                    row.append(bits.read(8))
                else:
                    row.append(-1)
            self.books.append(row)

    def _books8_np(self):
        a = getattr(self, "_b8", None)
        if a is None:
            a = np.ascontiguousarray(
                np.asarray(self.books, np.int32).reshape(-1)
            )
            self._b8 = a
        return a

    def _max_book(self):
        m = getattr(self, "_maxb", None)
        if m is None:
            m = max((max(row) for row in self.books), default=-1)
            self._maxb = m
        return m

    def decode(self, bits, books, do_not_decode, ch, n2):
        """Returns [ch, n2] float residue vectors."""
        out = np.zeros((ch, n2), np.float32)
        rtype = self.type
        if rtype == 2:
            vecs = 1
            total = n2 * ch
        else:
            vecs = ch
            total = n2
        begin = min(self.begin, total)
        end = min(self.end, total)
        if end <= begin:
            return out
        psize = self.partition_size
        classbook = books[self.classbook]
        cdim = classbook.dimensions
        n_to_read = end - begin
        parts = n_to_read // psize

        if rtype == 2 and all(do_not_decode):
            return out
        # Residue 2 codes ONE channel-interleaved vector of length ch*n2.
        work = np.zeros(n2 * ch, np.float32) if rtype == 2 else out

        L = _native_res()
        if (L is not None and isinstance(bits.data, bytes)
                and self.classbook < len(books)
                and self._max_book() < len(books)):
            reg = _book_registry(books)
            st = np.array([bits.pos, 1 if bits.eop else 0], np.int64)
            dnd = bytes(1 if x else 0 for x in do_not_decode)
            L.vorbis_residue_decode(
                bits.data, len(bits.data),
                st.ctypes.data_as(reg["i64p"]),
                *reg["ptrs"],
                int(rtype), int(begin), int(end), int(psize),
                int(self.classifications), int(self.classbook),
                self._books8_np().ctypes.data_as(reg["i32p"]), dnd,
                int(ch if rtype != 2 else ch), int(n2),
                work.ctypes.data_as(reg["f32p"]),
            )
            bits.pos = int(st[0])
            bits.eop = bool(st[1])
            if rtype == 2:
                for c in range(ch):
                    out[c] = work[c::ch]
            return out

        classifs = [[0] * parts for _ in range(vecs)]
        try:
            for passn in range(8):
                pcount = 0
                while pcount < parts:
                    if passn == 0:
                        for v in range(vecs):
                            if rtype != 2 and do_not_decode[v]:
                                continue
                            tmp = classbook.decode_scalar(bits)
                            for d in range(cdim - 1, -1, -1):
                                if pcount + d < parts:
                                    classifs[v][pcount + d] = (
                                        tmp % self.classifications
                                    )
                                tmp //= self.classifications
                    for d in range(cdim):
                        if pcount >= parts:
                            break
                        for v in range(vecs):
                            if rtype != 2 and do_not_decode[v]:
                                continue
                            cls = classifs[v][pcount]
                            book_idx = self.books[cls][passn]
                            if book_idx < 0:
                                continue
                            book = books[book_idx]
                            offset = begin + pcount * psize
                            row = work[v] if rtype != 2 else work
                            if rtype == 0:
                                # interleaved within partition
                                step = psize // book.dimensions
                                for sidx in range(step):
                                    vec = book.decode_vq(bits)
                                    row[offset + sidx : offset + sidx
                                        + step * book.dimensions : step] \
                                        += vec
                            else:
                                i = 0
                                while i < psize:
                                    vec = book.decode_vq(bits)
                                    row[offset + i : offset + i
                                        + book.dimensions] += vec
                                    i += book.dimensions
                        pcount += 1
        except EndOfPacket:
            pass
        if rtype == 2:
            for c in range(ch):
                out[c] = work[c::ch]
        return out


# --------------------------------------------------------------------------
# Mapping / mode
# --------------------------------------------------------------------------
class Mapping:
    def __init__(self, bits: LsbBits, channels, n_floors, n_residues):
        self.submaps = bits.read(4) + 1 if bits.read1() else 1
        if bits.read1():
            steps = bits.read(8) + 1
            self.coupling = []
            for _ in range(steps):
                mag = bits.read(ilog(channels - 1))
                ang = bits.read(ilog(channels - 1))
                self.coupling.append((mag, ang))
        else:
            self.coupling = []
        if bits.read(2):
            raise DecodeError("reserved mapping bits")
        if self.submaps > 1:
            self.mux = [bits.read(4) for _ in range(channels)]
        else:
            self.mux = [0] * channels
        self.submap_floor = []
        self.submap_residue = []
        for _ in range(self.submaps):
            bits.read(8)  # unused time config
            self.submap_floor.append(bits.read(8))
            self.submap_residue.append(bits.read(8))


# --------------------------------------------------------------------------
# IMDCT + windowing (reference: libvorbis mdct.c:397, block.c lapping)
# --------------------------------------------------------------------------
@functools.lru_cache(maxsize=8)
def vorbis_window(n: int) -> np.ndarray:
    x = (np.arange(n) + 0.5) / n * np.pi / 2
    return np.sin(0.5 * np.pi * np.sin(x) ** 2).astype(np.float64)


@functools.lru_cache(maxsize=8)
def imdct_matrix(n: int) -> np.ndarray:
    n2 = n // 2
    j = np.arange(n, dtype=np.float64)
    k = np.arange(n2, dtype=np.float64)
    return np.cos(
        (np.pi * 2.0 / n) * np.outer(j + 0.5 + n2 / 2.0, k + 0.5)
    )


def imdct_apply(spec: np.ndarray, n: int) -> np.ndarray:
    return spec.astype(np.float64) @ imdct_matrix(n).T


# --------------------------------------------------------------------------
# Top-level decode
# --------------------------------------------------------------------------
def _lap_window(n, blocksizes, blockflag, long_prev, long_next):
    bs0, bs1 = blocksizes
    w = np.zeros(n, np.float64)
    if not blockflag or (long_prev and long_next):
        full = vorbis_window(n // 2)
        w[: n // 2] = full
        w[n // 2:] = full[::-1]
        return w
    # long block with short neighbors: flat top with short slopes
    ws = vorbis_window(bs0 // 2)
    left_start = n // 4 - bs0 // 4
    w[:] = 0.0
    if long_prev:
        wl = vorbis_window(n // 2)
        w[: n // 2] = wl
    else:
        w[left_start : left_start + bs0 // 2] = ws
        w[left_start + bs0 // 2 : n // 2] = 1.0
    if long_next:
        wr = vorbis_window(n // 2)
        w[n // 2:] = wr[::-1]
    else:
        right_start = n - n // 4 - bs0 // 4
        w[n // 2 : right_start] = 1.0
        w[right_start : right_start + bs0 // 2] = ws[::-1]
    return w




class _CollectedStream:
    """Shim for _decode_stream_packets over the native Ogg collector:
    header packets materialize as bytes; the audio packets stay in the
    contiguous C-filled payload (consumed directly by the whole-stream
    native decode)."""

    def __init__(self, payload, offs, lens, last_granule):
        import types

        self._payload = payload
        self._offs = offs
        self._lens = lens
        self.last_granule = last_granule
        self.packets = [
            types.SimpleNamespace(data=bytes(
                payload[offs[i] : offs[i] + lens[i]]))
            for i in range(min(3, len(offs)))
        ]

    def materialize(self):
        """Full packet list (python fallback path only)."""
        import types

        return self.packets + [
            types.SimpleNamespace(data=bytes(
                self._payload[self._offs[i] : self._offs[i]
                              + self._lens[i]]))
            for i in range(3, len(self._offs))
        ]


def _collect_stream_native(data: bytes):
    """One-pass native Ogg demux for the first Vorbis stream; returns a
    _CollectedStream or None (chained files, native unavailable)."""
    L = _native_res()
    if L is None or not hasattr(L, "ogg_collect_packets"):
        return None
    import ctypes

    n = len(data)
    payload = np.empty(max(n, 1), np.uint8)
    cap = 4096 + n // 8
    offs = np.empty(cap, np.int64)
    lens = np.empty(cap, np.int64)
    info = np.zeros(3, np.int64)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = L.ogg_collect_packets(
        data, n, b"\x01vorbis", 7,
        payload.ctypes.data_as(ctypes.c_char_p), n,
        offs.ctypes.data_as(i64p), lens.ctypes.data_as(i64p), cap,
        info.ctypes.data_as(i64p),
    )
    if rc < 3 or info[1]:       # no stream / too few packets / chained
        return None
    return _CollectedStream(payload, offs[:rc], lens[:rc], int(info[0]))


def decode_vorbis_buffer(data: bytes, audio: AudioData) -> None:
    """Chained files (sequential links, each its own serial + id header)
    decode link by link and concatenate like vorbisfile's ov_read across
    links; later links must keep the first link's channel count and
    rate (ov_info varies per link, but this facade returns one fixed
    AudioData shape like the reference's loaders)."""
    st_c = _collect_stream_native(data)
    if st_c is not None:
        out, channels, rate = _decode_stream_packets(st_c)
        audio.channel_count = channels
        audio.sample_rate = rate
        audio.source_format = PCMFormat.PCM_FLT
        audio.samples = np.ascontiguousarray(out.reshape(-1), np.float32)
        audio.length_seconds = out.shape[0] / rate if rate else 0.0
        return
    streams = ogg.demux(data)
    links = [s for s in streams.values()
             if s.packets and s.packets[0].data.startswith(b"\x01vorbis")]
    if not links:
        raise DecodeError("no Vorbis stream in Ogg container")
    out, channels, rate = _decode_stream_packets(links[0])
    chunks = [out]
    for link in links[1:]:
        try:
            out_l, ch_l, rate_l = _decode_stream_packets(link)
        except DecodeError:
            break
        if ch_l != channels or rate_l != rate:
            break
        chunks.append(out_l)
    out = np.concatenate(chunks, axis=0) if len(chunks) > 1 else out
    audio.channel_count = channels
    audio.sample_rate = rate
    audio.source_format = PCMFormat.PCM_FLT
    audio.samples = np.ascontiguousarray(out.reshape(-1), np.float32)
    audio.length_seconds = out.shape[0] / rate if rate else 0.0


# Setup-header cache: codebook/floor/residue/mapping parse and the
# native packet context are pure functions of the setup packet bytes;
# repeated loads of the same stream config (serving, re-decodes) skip
# the ~25 ms rebuild.
_SETUP_CACHE: dict = {}


def _decode_stream_packets(st, return_entropy: bool = False):
    """Decode one logical Vorbis stream.  With return_entropy=True,
    stops at the host/device boundary and returns
    (staged, blocksizes, channels, rate, end_granule) — per-packet
    (specs [ch, n2], n, blockflag, long_prev, long_next, nonzero)
    tuples for the batched serving path
    (runtime/serving.synthesize_vorbis_streams_mixed)."""
    packets = st.packets
    idp = packets[0].data
    b = LsbBits(idp[7:])
    b.read(32)
    channels = b.read(8)
    rate = b.read(32)
    b.read(96)
    bs0 = 1 << b.read(4)
    bs1 = 1 << b.read(4)
    # info.c:217-219 vorbis_unpack_info bounds; without the 8192 cap a
    # corrupt 4-bit exponent (up to 2^15) makes the dense IMDCT matrix
    # multi-GB and turns one packet into ~minutes of float64 matmul
    # (CPU-burn found by the round-3 soak fuzzer)
    if rate < 1 or channels < 1:
        raise DecodeError("vorbis: bad ID header")
    if bs0 < 64 or bs1 < bs0 or bs1 > 8192:
        raise DecodeError("vorbis: invalid blocksizes")

    setup = packets[2].data
    setup_key = (hash(setup), channels)
    cached = _SETUP_CACHE.get(setup_key)
    if cached is None:
        b = LsbBits(setup[7:])
        books = [VorbisCodebook(b) for _ in range(b.read(8) + 1)]
        for _ in range(b.read(6) + 1):
            if b.read(16):
                raise DecodeError("reserved time domain")
        floors = []
        for _ in range(b.read(6) + 1):
            ftype = b.read(16)
            if ftype == 0:
                floors.append(Floor0(b))
            elif ftype == 1:
                floors.append(Floor1(b))
            else:
                raise DecodeError(f"unsupported floor type {ftype}")
        residues = []
        for _ in range(b.read(6) + 1):
            rtype = b.read(16)
            if rtype > 2:
                raise DecodeError("reserved residue type")
            residues.append(Residue(b, rtype))
        mappings = []
        for _ in range(b.read(6) + 1):
            if b.read(16):
                raise DecodeError("reserved mapping type")
            mappings.append(
                Mapping(b, channels, len(floors), len(residues)))
        modes = []
        for _ in range(b.read(6) + 1):
            blockflag = b.read1()
            if b.read(16) or b.read(16):
                raise DecodeError("reserved mode bits")
            modes.append((blockflag, b.read(8)))
        # validate every codebook reference once at parse time: corrupt
        # setups otherwise index past the registry (IndexError in the
        # Python path, out-of-bounds table reads in the native one)
        nb = len(books)
        for fl in floors:
            if isinstance(fl, Floor0):
                if any(bk >= nb for bk in fl.books):
                    raise DecodeError("floor references missing codebook")
                continue
            if any(bk >= nb for bk in fl.class_book if bk >= 0):
                raise DecodeError("floor references missing codebook")
            for row in fl.subclass_books:
                if any(bk >= nb for bk in row if bk >= 0):
                    raise DecodeError("floor references missing codebook")
        for r in residues:
            if r.classbook >= nb:
                raise DecodeError("residue references missing codebook")
            for row in r.books:
                if any(bk >= nb for bk in row if bk >= 0):
                    raise DecodeError("residue references missing codebook")
        for mp in mappings:
            if any(m >= mp.submaps for m in mp.mux):
                raise DecodeError("mapping mux exceeds submap count")
            for s in range(mp.submaps):
                if (mp.submap_floor[s] >= len(floors)
                        or mp.submap_residue[s] >= len(residues)):
                    raise DecodeError("mapping references missing config")
        for bf, mi in modes:
            if mi >= len(mappings):
                raise DecodeError("mode references missing mapping")
        cached = (books, floors, residues, mappings, modes)
        if len(_SETUP_CACHE) > 16:
            _SETUP_CACHE.clear()
        _SETUP_CACHE[setup_key] = cached
    books, floors, residues, mappings, modes = cached
    mode_bits = ilog(len(modes) - 1)
    blocksizes = (bs0, bs1)

    chunks = []
    cache = None  # right-half cache [channels, n_prev/2] (windowed)
    prev_n = 0
    total = 0
    end_granule = st.last_granule
    staged = []
    npk = _SETUP_CACHE.get((setup_key, "ctx"))
    if npk is None and (setup_key, "ctx") not in _SETUP_CACHE:
        npk = _native_packet_ctx(channels, blocksizes, modes, mappings,
                                 floors, residues, books)
        _SETUP_CACHE[(setup_key, "ctx")] = npk
    if npk is not None:
        import ctypes

        n2max = blocksizes[1] // 2
        if isinstance(st, _CollectedStream):
            payload = st._payload.ctypes.data_as(ctypes.c_char_p)
            keepalive = st._payload
            poff = np.ascontiguousarray(st._offs[3:])
            plen = np.ascontiguousarray(st._lens[3:])
            n_pk = len(poff)
        else:
            pkts = [p.data for p in packets[3:] if p.data]
            n_pk = len(pkts)
            payload = b"".join(pkts)
            plen = np.fromiter((len(p) for p in pkts), np.int64, n_pk)
            poff = np.concatenate(([0], np.cumsum(plen[:-1]))) \
                if n_pk else np.zeros(0, np.int64)
        cap = n_pk * channels * n2max
        flat = np.empty(max(cap, 1), np.float32)
        infos = np.zeros((max(n_pk, 1), 12), np.int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        rc = npk["L"].vorbis_stream_decode(
            payload, poff.ctypes.data_as(i64p),
            plen.ctypes.data_as(i64p), n_pk,
            *npk["args"],
            cap, flat.ctypes.data_as(npk["f32p"]),
            infos.ctypes.data_as(npk["i32p"]),
        )
        if rc < 0:
            npk = None       # unsupported shape: python path below
        else:
            pos = 0
            for k in range(int(rc)):
                info = infos[k]
                n = int(info[0])
                n2 = n // 2
                # zero-copy float32 views into the C output buffer
                # (consumers cast; `flat` stays alive via these refs)
                specs = flat[pos : pos + channels * n2].reshape(
                    channels, n2)
                pos += channels * n2
                staged.append((
                    specs, n,
                    bool(info[1]), bool(info[2]), bool(info[3]),
                    [bool(info[4 + c]) for c in range(channels)],
                ))
    if npk is None:
        staged = staged or []
        if isinstance(st, _CollectedStream):
            packets = st.materialize()
    for pkt in (packets[3:] if npk is None else []):
        if not pkt.data:
            continue
        bits = LsbBits(pkt.data)
        if bits.read1():
            continue
        mode_idx = bits.read(mode_bits)
        if mode_idx >= len(modes):
            continue
        blockflag, map_idx = modes[mode_idx]
        n = blocksizes[blockflag]
        long_prev = long_next = True
        if blockflag:
            long_prev = bool(bits.read1())
            long_next = bool(bits.read1())
        mapping = mappings[map_idx]
        n2 = n // 2

        floors_out = [None] * channels
        curves_out = [None] * channels
        nonzero = [False] * channels
        res_out = np.zeros((channels, n2), np.float32)
        try:
            for c in range(channels):
                fl = floors[mapping.submap_floor[mapping.mux[c]]]
                curve = fl.decode_curve_native(bits, books, n2)
                if curve is False:
                    ys = fl.decode(bits, books)
                    floors_out[c] = ys
                    nonzero[c] = ys is not None
                else:
                    curves_out[c] = curve
                    nonzero[c] = curve is not None
            nz = list(nonzero)
            for mag, ang in mapping.coupling:
                if nz[mag] or nz[ang]:
                    nz[mag] = nz[ang] = True
            for s in range(mapping.submaps):
                ch_in = [c for c in range(channels) if mapping.mux[c] == s]
                dnd = [not nz[c] for c in ch_in]
                r = residues[mapping.submap_residue[s]]
                dec = r.decode(bits, books, dnd, len(ch_in), n2)
                for i, c in enumerate(ch_in):
                    res_out[c] = dec[i]
        except EndOfPacket:
            pass

        for mag, ang in reversed(mapping.coupling):
            m = res_out[mag].copy()
            a = res_out[ang].copy()
            M2 = np.where(m > 0, np.where(a > 0, m, m + a),
                          np.where(a > 0, m, m - a))
            A2 = np.where(m > 0, np.where(a > 0, m - a, m),
                          np.where(a > 0, m + a, m))
            res_out[mag] = M2
            res_out[ang] = A2

        specs = np.zeros((channels, n2), np.float64)
        for c in range(channels):
            if nonzero[c]:
                if curves_out[c] is not None:
                    curve = curves_out[c]
                else:
                    fl = floors[mapping.submap_floor[mapping.mux[c]]]
                    curve = fl.compute(floors_out[c], n2)
                specs[c] = res_out[c] * curve

        staged.append((specs, n, blockflag, long_prev, long_next,
                       list(nonzero)))

    if return_entropy:
        return staged, (bs0, bs1), channels, rate, end_granule

    # Batched IMDCT: one matmul per blocksize over every staged spectrum
    # (the per-packet matvec re-reads the n2 x n matrix each call and
    # dominates decode time; batching amortizes it on BLAS).
    td_all = {}
    for bs in set(item[1] for item in staged):
        rows = []
        index = []
        for k, (specs, n, *_rest) in enumerate(staged):
            if n != bs:
                continue
            for c in range(channels):
                rows.append(specs[c])
                index.append((k, c))
        if rows:
            out_rows = imdct_apply(np.stack(rows), bs)
            for (k, c), row in zip(index, out_rows):
                td_all.setdefault(k, np.zeros((channels, bs)))[c] = row

    for k, (specs, n, blockflag, long_prev, long_next, nz_flags) in             enumerate(staged):
        n2 = n // 2
        td = td_all.get(k, np.zeros((channels, n)))
        for c in range(channels):
            if not nz_flags[c]:
                td[c] = 0.0
        w = _lap_window(n, blocksizes, blockflag, long_prev, long_next)
        td = td * w[None, :]

        # Lapping (spec §1.3.2/4.3.9): emit from the previous window's
        # center to this window's center (prev_n/4 + n/4 samples); the
        # windows' sloped regions sum to one across the join.
        if cache is not None:
            L = prev_n // 4 + n // 4
            out = np.zeros((channels, L))
            p_len = prev_n // 2
            m = min(p_len, L)
            out[:, :m] += cache[:, :m]
            o = prev_n // 4 - n // 4      # cur window start vs prev center
            s0 = max(o, 0)
            ss = s0 - o
            length = min(L - s0, n2 - ss)
            if length > 0:
                out[:, s0 : s0 + length] += td[:, ss : ss + length]
            chunks.append(out.T.copy())
            total += L
        cache = td[:, n2:].copy()
        prev_n = n

    if not chunks:
        raise DecodeError("no Vorbis audio decoded")
    pcm = np.concatenate(chunks, axis=0)
    if end_granule >= 0:
        pcm = pcm[: int(end_granule)]
    # corrupt streams can blow the float64 residue/floor product past
    # float32 range; an unclamped cast would turn that into +-inf
    # (libvorbis computes in float32 throughout, so it saturates
    # instead).  Legit output is O(1) — the clamp is inert for it.
    np.clip(pcm, np.finfo(np.float32).min, np.finfo(np.float32).max,
            out=pcm)
    return pcm.astype(np.float32), channels, rate
