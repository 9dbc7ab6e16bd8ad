"""Musepack SV8 decoder (MPCK container).

Re-implementation of the libmpcdec decode path from the MPC SV8 spec:
container demux (reference: third_party/musepack/libmpcdec/mpc_demux.c
:579 mpc_demux_decode_inner — byte-aligned tagged blocks, 2^block_pwr
frames per AP block, first frame of each block is a key frame), stream
header (streaminfo.c:187 streaminfo_read_header_sv8), bitstream
(mpc_decoder.c:499 mpc_decoder_read_bitstream_sv8 — canonical-huffman
band/Res chains, enumerative-coded MS flags and Q1 positions, DSCF
deltas mod 128), requantization (mpc_decoder.c:188 — Cc[Res] * SCF
per 12-sample third, inverse MS), and the 32-band synthesis filter
(synth_filter.c:90 mpc_compute_new_V + Di_opt windowing).

Normative tables (huffman codebooks, Cc/Dc requant constants, Di_opt
window) are extracted as *data* by tools/gen_mpc_tables.py into
data/mpc_tables.npz. The fast-DCT in mpc_compute_new_V is a fixed
linear map of the 32 subband samples; we materialize it once as a
64x32 matrix (row 16 is identically zero — the C code never writes
V[16], which stays 0 forever) and run the whole V update + Di_opt
windowing as NumPy matmuls/gathers per frame instead of scalar code.

Float build semantics: MPC_SHL/SHR are no-ops, all MPC_*_CONST macros
are plain float multiplies (mpcdec_math.h:120-127), output is -1..1.
"""

from __future__ import annotations

import math
import pathlib

import numpy as np

from ..audio_data import AudioData, PCMFormat
from ..errors import DecodeError

_DATA = pathlib.Path(__file__).resolve().parents[1] / "data" / "mpc_tables.npz"

FRAME_LENGTH = 36 * 32  # samples per mpc frame (mpcdec.h:50)
SYNTH_DELAY = 481       # mpcdec.h:52
V_MEM = 2304            # decoder.h:54

_SAMPLE_FREQS = [44100, 48000, 37800, 32000, 0, 0, 0, 0]


# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------

class _Can:
    """Canonical-huffman table: sorted (code, length) rows + symbol map.

    Matches mpc_bits_can_dec (mpc_bits_reader.h:80): peek 16 bits, scan
    rows while code < row.Code, consume row.Length bits, then map
    sym[(row.Value - (code >> (16 - row.Length))) & 0xFF].
    """

    __slots__ = ("rows", "sym")

    def __init__(self, rows: np.ndarray, sym: np.ndarray):
        self.rows = [(int(c), int(l), int(v)) for c, l, v in rows]
        self.sym = [int(s) for s in sym]


def _load_tables():
    z = np.load(_DATA)

    def can(name):
        return _Can(z[f"huff_mpc_huff_{name}"], z[f"sym_mpc_sym_{name}"])

    t = {
        "Bands": can("Bands"),
        "SCFI": [can("SCFI_1"), can("SCFI_2")],
        "DSCF": [can("DSCF_1"), can("DSCF_2")],
        "Res": [can("Res_1"), can("Res_2")],
        "Q1": can("Q1"),
        "Q9up": can("Q9up"),
        "Q": [
            [can("Q2_1"), can("Q2_2")],
            [can("Q3"), can("Q4")],
            [can("Q5_1"), can("Q5_2")],
            [can("Q6_1"), can("Q6_2")],
            [can("Q7_1"), can("Q7_2")],
            [can("Q8_1"), can("Q8_2")],
        ],
    }
    # __Cc is stored /2^14 by the extractor (fixed-point form); the float
    # build uses the raw constants (MAKE_MPC_SAMPLE_EX is identity).
    t["Cc"] = (z["Cc"] * float(1 << 14)).tolist()   # index by Res+1
    t["Dc"] = z["Dc"].tolist()                       # index by Res+1
    t["Res_bit"] = z["Res_bit"].tolist()             # index by Res (SV7)
    t["Di"] = np.asarray(z["Di_opt"], np.float64)    # [32][16], /65536 baked

    # SV7 lut-style tables (huffman.c mpc_table_*): rows of
    # (Code, Length, Value), decoded by first-row-with-peek>=Code scan,
    # returning Value directly (mpc_bits_reader.h:67 mpc_bits_huff_dec).
    def lut(name):
        rows = z[f"huff_mpc_table_{name}"]
        if rows.ndim == 3:
            return [[(int(c), int(l), int(v)) for c, l, v in tab]
                    for tab in rows]
        return [(int(c), int(l), int(v)) for c, l, v in rows]

    t["Hdr7"] = lut("HuffHdr")
    t["SCFI7"] = lut("HuffSCFI")
    t["DSCF7"] = lut("HuffDSCF")
    t["Q7"] = [lut(f"HuffQ{i}") for i in range(1, 8)]
    return t


_T = _load_tables()

# ---------------------------------------------------------------------------
# native frame reader (native/mpc_frame.c): same bit-exact entropy decode
# with the Python read_frame/read_frame_sv7 below as fallback and spec.
# ---------------------------------------------------------------------------
_NATIVE_MPC = None
_NATIVE_MPC_TRIED = False
_NATIVE_MPC_LOCK = None


def _native_mpc():
    """One-time native setup, locked: mpc_set_tables writes C globals
    and concurrent serving threads must not race it."""
    global _NATIVE_MPC_LOCK
    if _NATIVE_MPC_TRIED:
        return _NATIVE_MPC
    if _NATIVE_MPC_LOCK is None:
        import threading

        _NATIVE_MPC_LOCK = threading.Lock()
    with _NATIVE_MPC_LOCK:
        return _native_mpc_locked()


def _native_mpc_locked():
    global _NATIVE_MPC, _NATIVE_MPC_TRIED
    if _NATIVE_MPC_TRIED:
        return _NATIVE_MPC
    _NATIVE_MPC_TRIED = True
    import ctypes
    import os

    if os.environ.get("LIBNYQUIST_NO_NATIVE_MPC"):
        return None
    from ..runtime.native import lib

    L = lib()
    if L is None or not hasattr(L, "mpc_read_frame"):
        return None

    T = _T
    cans = [T["Bands"], T["SCFI"][0], T["SCFI"][1], T["DSCF"][0],
            T["DSCF"][1], T["Res"][0], T["Res"][1], T["Q1"], T["Q9up"],
            T["Q"][0][0], T["Q"][0][1], T["Q"][1][0], T["Q"][1][1],
            T["Q"][2][0], T["Q"][2][1], T["Q"][3][0], T["Q"][3][1],
            T["Q"][4][0], T["Q"][4][1], T["Q"][5][0], T["Q"][5][1]]
    luts = [T["Hdr7"], T["SCFI7"], T["DSCF7"]]
    for pair in T["Q7"]:
        luts.append(pair[0])
        luts.append(pair[1])

    can_rows, can_syms, can_meta = [], [], []
    row_off = sym_off = 0
    for c in cans:
        can_meta.extend([row_off, len(c.rows), sym_off])
        can_rows.append(np.asarray(c.rows, np.int32).reshape(-1, 3))
        can_syms.append(np.asarray(c.sym, np.int8))
        row_off += len(c.rows)
        sym_off += len(c.sym)
    lut_rows, lut_meta = [], []
    row_off = 0
    for rows in luts:
        lut_meta.extend([row_off, len(rows)])
        lut_rows.append(np.asarray(rows, np.int32).reshape(-1, 3))
        row_off += len(rows)

    keep = dict(
        can_rows=np.concatenate(can_rows).astype(np.int32),
        can_syms=np.concatenate(can_syms).astype(np.int8),
        can_meta=np.asarray(can_meta, np.int64),
        lut_rows=np.concatenate(lut_rows).astype(np.int32),
        lut_meta=np.asarray(lut_meta, np.int64),
        dc=np.asarray(T["Dc"], np.int32),
        res_bit=np.asarray(T["Res_bit"], np.int32),
    )
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    L.mpc_set_tables(
        keep["can_rows"].ctypes.data_as(i32p),
        keep["can_syms"].ctypes.data_as(ctypes.c_char_p),
        keep["can_meta"].ctypes.data_as(i64p),
        keep["lut_rows"].ctypes.data_as(i32p),
        keep["lut_meta"].ctypes.data_as(i64p),
        keep["dc"].ctypes.data_as(i32p),
        keep["res_bit"].ctypes.data_as(i32p),
    )
    _NATIVE_MPC = (L, keep)   # blobs must outlive the library pointers
    return _NATIVE_MPC


# SCF factor table (requant.c:95 mpc_decoder_scale_output with
# scale_factor=1, float mode: factor = 1/2^(16-1)).
def _build_scf() -> np.ndarray:
    scf = np.zeros(256, np.float64)
    factor = 1.0 / 32768.0
    scf[1] = factor
    f1 = factor * 0.83298066476582673961
    f2 = factor / 0.83298066476582673961
    for n in range(1, 129):
        scf[(1 + n) & 0xFF] = np.float32(f1)
        scf[(1 - n) & 0xFF] = np.float32(f2)
        f1 *= 0.83298066476582673961
        f2 /= 0.83298066476582673961
    scf[1] = np.float32(factor)
    return scf


_SCF = _build_scf()

# enumerative coding helpers (mpc_bits_reader.c:40 Cnk tables == C(n,k))
_COMB = [[math.comb(n, k) for n in range(33)] for k in range(17)]


# ---------------------------------------------------------------------------
# bit reader
# ---------------------------------------------------------------------------

class _Bits:
    """MSB-first bit reader; peeks past the end read as zero bits."""

    __slots__ = ("buf", "pos", "limit")

    def __init__(self, buf: bytes):
        self.buf = buf + b"\x00" * 8
        self.pos = 0
        self.limit = len(buf) * 8

    def read(self, n: int) -> int:
        if n <= 0:
            return 0
        p = self.pos
        self.pos = p + n
        first = p >> 3
        last = (p + n - 1) >> 3
        chunk = int.from_bytes(self.buf[first : last + 1], "big")
        chunk >>= ((last + 1) << 3) - (p + n)
        return chunk & ((1 << n) - 1)

    def peek16(self) -> int:
        p = self.pos
        first = p >> 3
        chunk = int.from_bytes(self.buf[first : first + 3], "big")
        return (chunk >> (8 - (p & 7))) & 0xFFFF


def _lut_dec(br: _Bits, rows) -> int:
    """SV7 huffman decode: first row whose Code <= peek16; return Value."""
    code = br.peek16()
    for c, length, v in rows:
        if code >= c:
            br.pos += length
            return v
    raise DecodeError("mpc: bad SV7 huffman code")


def _can_dec(br: _Bits, can: _Can) -> int:
    code = br.peek16()
    for c, length, v in can.rows:
        if code >= c:
            br.pos += length
            return can.sym[(v - (code >> (16 - length))) & 0xFF]
    raise DecodeError("mpc: bad huffman code")


def _log_dec(br: _Bits, mx: int) -> int:
    # mpc_bits_reader.c:136 mpc_bits_log_dec
    if mx == 0:
        return 0
    ln = mx.bit_length()
    lost = (1 << ln) - 1 - mx
    value = br.read(ln - 1) if ln > 1 else 0
    if value >= lost:
        value = ((value << 1) | br.read(1)) - lost
    return value


def _enum_dec(br: _Bits, k: int, n: int) -> int:
    # mpc_bits_reader.h:128 mpc_bits_enum_dec
    total = _COMB[k][n]
    ln = (total - 1).bit_length()
    lost = (1 << ln) - total
    code = br.read(ln - 1)
    if code >= lost:
        code = ((code << 1) | br.read(1)) - lost
    bits = 0
    while k > 0:
        n -= 1
        c = _COMB[k][n]
        if code >= c:
            bits |= 1 << n
            code -= c
            k -= 1
    return bits


# ---------------------------------------------------------------------------
# synthesis filter as a 64x32 matrix (mpc_compute_new_V is linear)
# ---------------------------------------------------------------------------

def _compute_new_v(s: np.ndarray) -> np.ndarray:
    """Float transcription of synth_filter.c:90 mpc_compute_new_V."""
    v = np.zeros(64, np.float64)
    a = [s[i] + s[31 - i] for i in range(16)]
    b = [0.0] * 16
    for i in range(8):
        b[i] = a[i] + a[15 - i]
    consts1 = [0.5024192929, 0.5224986076, 0.5669440627, 0.6468217969,
               0.7881546021, 1.0606776476, 1.7224471569, 5.1011486053]
    for i in range(8):
        b[8 + i] = (a[i] - a[15 - i]) * consts1[i]
    consts2 = [0.5097956061, 0.6013448834, 0.8999761939, 2.5629155636]
    a = [0.0] * 16
    for i in range(4):
        a[i] = b[i] + b[7 - i]
        a[4 + i] = (b[i] - b[7 - i]) * consts2[i]
        a[8 + i] = b[8 + i] + b[15 - i]
        a[12 + i] = (b[8 + i] - b[15 - i]) * consts2[i]
    b = [0.0] * 16
    for g in range(4):
        b[4 * g + 0] = a[4 * g] + a[4 * g + 3]
        b[4 * g + 1] = a[4 * g + 1] + a[4 * g + 2]
        b[4 * g + 2] = (a[4 * g] - a[4 * g + 3]) * 0.5411961079
        b[4 * g + 3] = (a[4 * g + 1] - a[4 * g + 2]) * 1.3065630198
    a = [0.0] * 16
    for g in range(8):
        a[2 * g] = b[2 * g] + b[2 * g + 1]
        a[2 * g + 1] = (b[2 * g] - b[2 * g + 1]) * 0.7071067691

    v[48] = -a[0]
    v[0] = a[1]
    v[8] = a[3]
    v[40] = -a[2] - v[8]
    v[12] = a[7]
    v[4] = a[5] + v[12]
    v[36] = -(v[4] + a[6])
    v[44] = -a[4] - a[6] - a[7]
    v[14] = a[15]
    v[10] = a[11] + v[14]
    v[6] = v[10] + a[13]
    v[2] = a[9] + a[13] + a[15]
    v[34] = -v[2] - a[14]
    v[38] = v[34] + a[9] - a[10] - a[11]
    tmp = -(a[12] + a[14] + a[15])
    v[46] = tmp - a[8]
    v[42] = tmp - a[10] - a[11]

    consts0 = [0.5006030202, 0.5054709315, 0.5154473186, 0.5310425758,
               0.5531039238, 0.5829349756, 0.6225041151, 0.6748083234,
               0.7445362806, 0.8393496275, 0.9725682139, 1.1694399118,
               1.4841645956, 2.0577809811, 3.4076085091, 10.1900081635]
    a = [(s[i] - s[31 - i]) * consts0[i] for i in range(16)]
    b = [0.0] * 16
    for i in range(8):
        b[i] = a[i] + a[15 - i]
        b[8 + i] = (a[i] - a[15 - i]) * consts1[i]
    a = [0.0] * 16
    for i in range(4):
        a[i] = b[i] + b[7 - i]
        a[4 + i] = (b[i] - b[7 - i]) * consts2[i]
        a[8 + i] = b[8 + i] + b[15 - i]
        a[12 + i] = (b[8 + i] - b[15 - i]) * consts2[i]
    b = [0.0] * 16
    for g in range(4):
        b[4 * g + 0] = a[4 * g] + a[4 * g + 3]
        b[4 * g + 1] = a[4 * g + 1] + a[4 * g + 2]
        b[4 * g + 2] = (a[4 * g] - a[4 * g + 3]) * 0.5411961079
        b[4 * g + 3] = (a[4 * g + 1] - a[4 * g + 2]) * 1.3065630198
    a = [0.0] * 16
    for g in range(8):
        a[2 * g] = b[2 * g] + b[2 * g + 1]
        a[2 * g + 1] = (b[2 * g] - b[2 * g + 1]) * 0.7071067691

    v[15] = a[15]
    v[13] = a[7] + v[15]
    v[11] = v[13] + a[11]
    v[5] = v[11] + a[5] + a[13]
    v[9] = a[3] + a[11] + a[15]
    v[7] = v[9] + a[13]
    v[1] = a[1] + a[9] + a[13] + a[15]
    v[33] = -v[1] - a[14]
    v[3] = a[5] + a[7] + a[9] + a[13] + a[15]
    v[35] = -v[3] - a[6] - a[14]
    tmp = -(a[10] + a[11] + a[13] + a[14] + a[15])
    v[37] = tmp - a[5] - a[6] - a[7]
    v[39] = tmp - a[2] - a[3]
    tmp += a[13] - a[12]
    v[41] = tmp - a[2] - a[3]
    v[43] = tmp - a[4] - a[6] - a[7]
    tmp2 = -(a[8] + a[12] + a[14] + a[15])
    v[47] = tmp2 - a[0]
    v[45] = tmp2 - a[4] - a[6] - a[7]

    # mirrors (synth_filter.c:297-328); v[16] is never written and stays 0
    for i in range(17, 33):
        v[i] = -v[32 - i]
    for i in range(49, 64):
        v[i] = v[96 - i]
    return v


def _build_synth_matrix() -> np.ndarray:
    m = np.zeros((64, 32), np.float64)
    for i in range(32):
        e = np.zeros(32, np.float64)
        e[i] = 1.0
        m[:, i] = _compute_new_v(e)
    return m


_M_SYNTH = _build_synth_matrix()

# Di_opt windowing gather: output sample k sums V[base + k + OFF[j]] * Di[k][j]
_V_OFF = np.array([0, 96, 128, 224, 256, 352, 384, 480,
                   512, 608, 640, 736, 768, 864, 896, 992], np.int64)
_K_IDX = np.arange(32, dtype=np.int64)[:, None] + _V_OFF[None, :]  # [32,16]


class _Synth:
    """Per-channel sliding V buffer + windowed output (synth_filter.c:331)."""

    __slots__ = ("v",)

    def __init__(self):
        self.v = np.zeros(V_MEM + 960, np.float64)

    def run(self, y: np.ndarray) -> np.ndarray:
        """y: [36,32] requantized subband samples -> [36,32] pcm.

        Step n writes v[base_n : base_n+64] (base_n descending by 64)
        and reads v[base_n + 0..1023]: later writes land strictly below
        every earlier read window, so all 36 matmuls and gathers batch
        with identical results."""
        v = self.v
        v[V_MEM:] = v[:960]
        blocks = y @ _M_SYNTH.T                      # [36, 64]
        v[V_MEM - 64 * 36 : V_MEM] = blocks[::-1].reshape(-1)
        bases = V_MEM - 64 * (np.arange(36, dtype=np.int64) + 1)
        gathered = v[bases[:, None, None] + _K_IDX[None]]  # [36,32,16]
        return np.sum(gathered * _T["Di"][None], axis=2)


def _synth_stream(Y: np.ndarray) -> np.ndarray:
    """Whole-stream synthesis: Y [T, 32] requantized rows in time order
    -> [T, 32] pcm, zero initial V state.

    Equivalent to chaining _Synth.run over frames: step t's V block only
    feeds steps t..t+15 (_K_IDX[k, j] // 64 == j), so the sliding read
    collapses to one matmul plus a 16-tap gather-combine over the block
    sequence -- the same batched-FIR structure as ops/mp3_synth.py."""
    T = Y.shape[0]
    blocks = Y @ _M_SYNTH.T                          # [T, 64]
    bpad = np.vstack([np.zeros((15, 64), blocks.dtype), blocks])
    # Tap columns are fixed: _K_IDX % 64 == k for even taps, k + 32 for
    # odd taps, so each tap is a contiguous column slice (view), not a
    # gather.
    di = np.asarray(_T["Di"], np.float64)            # [32, 16]
    a = bpad[:, :32]
    b = bpad[:, 32:64]
    out = np.zeros((T, 32), np.float64)
    for j in range(0, 16, 2):
        out += a[15 - j : 15 - j + T] * di[:, j]
        out += b[14 - j : 14 - j + T] * di[:, j + 1]
    return out


# ---------------------------------------------------------------------------
# frame bitstream (SV8)
# ---------------------------------------------------------------------------

# SV7 bundled-quantizer expansion tables (mpc_decoder.c:349-353)
_IDX30_7 = [(i % 3) - 1 for i in range(27)]
_IDX31_7 = [((i // 3) % 3) - 1 for i in range(27)]
_IDX32_7 = [(i // 9) - 1 for i in range(27)]
_IDX50_7 = [(i % 5) - 2 for i in range(25)]
_IDX51_7 = [(i // 5) - 2 for i in range(25)]

_IDX50 = np.array([(i % 5) - 2 for i in range(125)], np.int32)
_IDX51 = np.array([((i // 5) % 5) - 2 for i in range(125)], np.int32)
_IDX52 = np.array([(i // 25) - 2 for i in range(125)], np.int32)
_THRES = [0, 0, 3, 0, 0, 1, 3, 4, 8]
_HUFFQ2_VAR = [abs((i % 5) - 2) + abs(((i // 5) % 5) - 2) + abs((i // 25) - 2)
               for i in range(125)]


class MusepackDecoder:
    """SV8 frame decoder state (mirrors struct mpc_decoder, decoder.h:60)."""

    def __init__(self, max_band: int, ms: bool, channels: int):
        self.max_band = max_band
        self.ms = ms
        self.channels = channels
        self.last_max_band = 0
        self.res = [np.zeros(32, np.int32), np.zeros(32, np.int32)]
        self.scfi = [np.zeros(32, np.int32), np.zeros(32, np.int32)]
        self.scf_index = [np.zeros((32, 3), np.int32),
                          np.zeros((32, 3), np.int32)]
        self.dscf_flag = [np.ones(32, np.int32), np.ones(32, np.int32)]
        self.ms_flag = np.zeros(32, np.int32)
        self.q = [np.zeros((32, 36), np.int32), np.zeros((32, 36), np.int32)]
        self.synth = [_Synth(), _Synth()]
        self.__r1 = 1
        self.__r2 = 1

    # random generator for Res == -1 bands (synth_filter.c:414)
    def _random_int(self) -> int:
        r1, r2 = self.__r1, self.__r2
        t1 = bin(r1 & 0xF5).count("1") & 1
        t2 = bin((r2 >> 25) & 0x63).count("1") & 1
        self.__r1 = (r1 >> 1) | (t1 << 31)
        self.__r2 = ((r2 << 1) & 0xFFFFFFFF) | t2
        return (self.__r1 ^ self.__r2) & 0xFFFFFFFF

    def _native_read(self, br: _Bits, is_key_frame: bool,
                     sv7: bool) -> bool:
        """Run the frame entropy decode in C; returns False when the
        native library is unavailable (caller falls back to Python)."""
        import ctypes

        native = _native_mpc()
        if native is None:
            return False
        L = native[0]
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        cache = getattr(self, "_nat_ptrs", None)
        if cache is None:
            def p(a):
                return a.ctypes.data_as(i32p)

            io = np.zeros(4, np.int64)
            cache = (io, io.ctypes.data_as(i64p),
                     (p(self.res[0]), p(self.res[1]),
                      p(self.scfi[0]), p(self.scfi[1]),
                      p(self.scf_index[0]), p(self.scf_index[1]),
                      p(self.dscf_flag[0]), p(self.dscf_flag[1]),
                      p(self.ms_flag), p(self.q[0]), p(self.q[1])))
            self._nat_ptrs = cache
        io, io_p, ptrs = cache
        io[0] = br.pos
        io[1] = self._MusepackDecoder__r1
        io[2] = self._MusepackDecoder__r2
        io[3] = self.last_max_band
        rc = L.mpc_read_frame(
            br.buf, len(br.buf), io_p,
            int(sv7), int(is_key_frame), int(self.max_band),
            int(self.ms), *ptrs,
        )
        if rc < 0:
            raise DecodeError("mpc: bad huffman code")
        br.pos = int(io[0])
        self._MusepackDecoder__r1 = int(io[1])
        self._MusepackDecoder__r2 = int(io[2])
        self.last_max_band = int(io[3])
        return True

    def read_block_native(self, br: _Bits, n_frames: int,
                          key_first: bool):
        """Decode n_frames SV8 frames in one native call, returning
        per-frame (q, res, scf, ms) snapshot arrays for batched
        requantization — or None (caller falls back per frame)."""
        import ctypes

        native = _native_mpc()
        if native is None or n_frames <= 0:
            return None
        L = native[0]
        if not hasattr(L, "mpc_read_frames_sv8"):
            return None
        i32p = ctypes.POINTER(ctypes.c_int32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        # reuse (or build) the pointer cache shared with _native_read
        if getattr(self, "_nat_ptrs", None) is None:
            def p(a):
                return a.ctypes.data_as(i32p)

            io = np.zeros(4, np.int64)
            self._nat_ptrs = (io, io.ctypes.data_as(i64p),
                              (p(self.res[0]), p(self.res[1]),
                               p(self.scfi[0]), p(self.scfi[1]),
                               p(self.scf_index[0]), p(self.scf_index[1]),
                               p(self.dscf_flag[0]), p(self.dscf_flag[1]),
                               p(self.ms_flag), p(self.q[0]), p(self.q[1])))
        io, io_p, ptrs = self._nat_ptrs
        io[0] = br.pos
        io[1] = self._MusepackDecoder__r1
        io[2] = self._MusepackDecoder__r2
        io[3] = self.last_max_band
        q = np.empty((n_frames, 2, 32, 36), np.int32)
        res = np.empty((n_frames, 2, 32), np.int32)
        scf = np.empty((n_frames, 2, 32, 3), np.int32)
        msf = np.empty((n_frames, 32), np.int32)
        rc = L.mpc_read_frames_sv8(
            br.buf, len(br.buf), io_p,
            int(n_frames), int(bool(key_first)), int(self.max_band),
            int(self.ms), *ptrs,
            q.ctypes.data_as(i32p), res.ctypes.data_as(i32p),
            scf.ctypes.data_as(i32p), msf.ctypes.data_as(i32p),
        )
        if rc < 0:
            raise DecodeError("mpc: bad huffman code")
        br.pos = int(io[0])
        self._MusepackDecoder__r1 = int(io[1])
        self._MusepackDecoder__r2 = int(io[2])
        self.last_max_band = int(io[3])
        return q, res, scf, msf

    def read_frame(self, br: _Bits, is_key_frame: bool) -> None:
        if self._native_read(br, is_key_frame, sv7=False):
            return
        T = _T
        res_l, res_r = self.res
        scfi_l, scfi_r = self.scfi

        if is_key_frame:
            max_used = _log_dec(br, self.max_band + 1)
        else:
            max_used = self.last_max_band + _can_dec(br, T["Bands"])
            if max_used > 32:
                max_used -= 33
        self.last_max_band = max_used

        if max_used:
            v = _can_dec(br, T["Res"][0])
            res_l[max_used - 1] = v - 17 if v > 15 else v
            v = _can_dec(br, T["Res"][0])
            res_r[max_used - 1] = v - 17 if v > 15 else v
            for n in range(max_used - 2, -1, -1):
                v = _can_dec(br, T["Res"][1 if res_l[n + 1] > 2 else 0]) \
                    + res_l[n + 1]
                res_l[n] = v - 17 if v > 15 else v
                v = _can_dec(br, T["Res"][1 if res_r[n + 1] > 2 else 0]) \
                    + res_r[n + 1]
                res_r[n] = v - 17 if v > 15 else v

            if self.ms:
                tot = sum(1 for n in range(max_used)
                          if res_l[n] != 0 or res_r[n] != 0)
                cnt = _log_dec(br, tot)
                tmp = 0
                if cnt != 0 and cnt != tot:
                    tmp = _enum_dec(br, min(cnt, tot - cnt), tot)
                if cnt * 2 > tot:
                    tmp = (~tmp) & 0xFFFFFFFF
                for n in range(max_used - 1, -1, -1):
                    if res_l[n] != 0 or res_r[n] != 0:
                        self.ms_flag[n] = tmp & 1
                        tmp >>= 1

        res_l[max_used : self.max_band + 1] = 0
        res_r[max_used : self.max_band + 1] = 0

        # SCFI
        if is_key_frame:
            self.dscf_flag[0][:] = 1
            self.dscf_flag[1][:] = 1
        for n in range(max_used):
            cnt = -1
            if res_l[n]:
                cnt += 1
            if res_r[n]:
                cnt += 1
            if cnt >= 0:
                tmp = _can_dec(br, T["SCFI"][cnt])
                if res_l[n]:
                    scfi_l[n] = tmp >> (2 * cnt)
                if res_r[n]:
                    scfi_r[n] = tmp & 3

        # SCF / DSCF
        for n in range(max_used):
            for ch in range(2):
                if not self.res[ch][n]:
                    continue
                scf = self.scf_index[ch][n]
                if self.dscf_flag[ch][n] == 1:
                    scf[0] = br.read(7) - 6
                    self.dscf_flag[ch][n] = 0
                else:
                    tmp = _can_dec(br, T["DSCF"][1])
                    if tmp == 64:
                        tmp += br.read(6)
                    scf[0] = ((scf[2] - 25 + tmp) & 127) - 6
                scfi = self.scfi[ch][n]
                for m in range(2):
                    if ((scfi << m) & 2) == 0:
                        tmp = _can_dec(br, T["DSCF"][0])
                        if tmp == 31:
                            tmp = 64 + br.read(6)
                        scf[m + 1] = ((scf[m] - 25 + tmp) & 127) - 6
                    else:
                        scf[m + 1] = scf[m]

        # samples
        for n in range(max_used):
            for ch in range(2):
                q = self.q[ch][n]
                res = int(self.res[ch][n])
                if res == 0:
                    continue
                if res == 2:
                    tabs = T["Q"][0]
                    idx = 2 * _THRES[2]
                    for k in range(0, 36, 3):
                        tmp = _can_dec(br, tabs[1 if idx > _THRES[2] else 0])
                        q[k] = _IDX50[tmp]
                        q[k + 1] = _IDX51[tmp]
                        q[k + 2] = _IDX52[tmp]
                        idx = (idx >> 1) + _HUFFQ2_VAR[tmp]
                elif res == 1:
                    for k0 in (0, 18):
                        cnt = _can_dec(br, T["Q1"])
                        idx = 0
                        if 0 < cnt < 18:
                            idx = _enum_dec(
                                br, cnt if cnt <= 9 else 18 - cnt, 18)
                        if cnt > 9:
                            idx = (~idx) & 0x3FFFF
                        for k in range(k0, k0 + 18):
                            q[k] = 0
                            if idx & (1 << 17):
                                q[k] = (br.read(1) << 1) - 1
                            idx = (idx << 1) & 0x3FFFF
                elif res == -1:
                    for k in range(36):
                        t = self._random_int()
                        q[k] = (((t >> 24) & 0xFF) + ((t >> 16) & 0xFF)
                                + ((t >> 8) & 0xFF) + (t & 0xFF) - 510)
                elif res <= 4:
                    tab = T["Q"][1][res - 3]
                    for k in range(0, 36, 2):
                        v = _can_dec(br, tab) & 0xFF
                        q[k] = ((v & 0xF) ^ 8) - 8
                        q[k + 1] = (((v >> 4) & 0xF) ^ 8) - 8
                elif res <= 8:
                    tabs = T["Q"][res - 3]
                    th = _THRES[res]
                    idx = 2 * th
                    for k in range(36):
                        q[k] = _can_dec(br, tabs[1 if idx > th else 0])
                        idx = (idx >> 1) + abs(int(q[k]))
                else:
                    dc = T["Dc"][res + 1]
                    for k in range(36):
                        v = _can_dec(br, T["Q9up"]) & 0xFF
                        if res != 9:
                            v = (v << (res - 9)) | br.read(res - 9)
                        q[k] = v - dc

    def read_frame_sv7(self, br: _Bits) -> None:
        """mpc_decoder.c:346 mpc_decoder_read_bitstream_sv7."""
        if self._native_read(br, False, sv7=True):
            return
        T = _T
        res_l, res_r = self.res
        scfi_l, scfi_r = self.scfi
        max_used = 0

        res_l[0] = br.read(4)
        res_r[0] = br.read(4)
        if res_l[0] or res_r[0]:
            if self.ms:
                self.ms_flag[0] = br.read(1)
            max_used = 1
        for n in range(1, self.max_band + 1):
            idx = _lut_dec(br, T["Hdr7"])
            res_l[n] = res_l[n - 1] + idx if idx != 4 else br.read(4)
            idx = _lut_dec(br, T["Hdr7"])
            res_r[n] = res_r[n - 1] + idx if idx != 4 else br.read(4)
            # corrupt streams can walk Res out of table range via the
            # unbounded delta chain; valid SV7 stays within [-17, 17]
            if not (-17 <= res_l[n] <= 17 and -17 <= res_r[n] <= 17):
                raise DecodeError("mpc: Res index out of range")
            if res_l[n] or res_r[n]:
                if self.ms:
                    self.ms_flag[n] = br.read(1)
                max_used = n + 1

        for n in range(max_used):
            if res_l[n]:
                scfi_l[n] = _lut_dec(br, T["SCFI7"])
            if res_r[n]:
                scfi_r[n] = _lut_dec(br, T["SCFI7"])

        def dscf(prev):
            idx = _lut_dec(br, T["DSCF7"])
            return prev + idx if idx != 8 else br.read(6)

        for n in range(max_used):
            for ch in range(2):
                if not self.res[ch][n]:
                    continue
                scf = self.scf_index[ch][n]
                scfi = int(self.scfi[ch][n])
                if scfi == 1:
                    scf[0] = dscf(scf[2])
                    scf[1] = dscf(scf[0])
                    scf[2] = scf[1]
                elif scfi == 3:
                    scf[0] = dscf(scf[2])
                    scf[1] = scf[0]
                    scf[2] = scf[1]
                elif scfi == 2:
                    scf[0] = dscf(scf[2])
                    scf[1] = scf[0]
                    scf[2] = dscf(scf[1])
                else:
                    scf[0] = dscf(scf[2])
                    scf[1] = dscf(scf[0])
                    scf[2] = dscf(scf[1])
                for m in range(3):
                    if scf[m] > 1024:
                        scf[m] = 0x8080

        idx30 = _IDX30_7
        idx31 = _IDX31_7
        idx32 = _IDX32_7
        idx50 = _IDX50_7
        idx51 = _IDX51_7
        for n in range(max_used):
            for ch in range(2):
                q = self.q[ch][n]
                res = int(self.res[ch][n])
                if res == 0 or res <= -2:
                    continue
                if res == -1:
                    for k in range(36):
                        t = self._random_int()
                        q[k] = (((t >> 24) & 0xFF) + ((t >> 16) & 0xFF)
                                + ((t >> 8) & 0xFF) + (t & 0xFF) - 510)
                elif res == 1:
                    tab = T["Q7"][0][br.read(1)]
                    for k in range(0, 36, 3):
                        idx = _lut_dec(br, tab)
                        q[k] = idx30[idx]
                        q[k + 1] = idx31[idx]
                        q[k + 2] = idx32[idx]
                elif res == 2:
                    tab = T["Q7"][1][br.read(1)]
                    for k in range(0, 36, 2):
                        idx = _lut_dec(br, tab)
                        q[k] = idx50[idx]
                        q[k + 1] = idx51[idx]
                elif res <= 7:
                    tab = T["Q7"][res - 1][br.read(1)]
                    for k in range(36):
                        q[k] = _lut_dec(br, tab)
                else:
                    nbits = T["Res_bit"][res]
                    dc = T["Dc"][res + 1]
                    for k in range(36):
                        q[k] = br.read(nbits) - dc

    def requantize(self) -> tuple[np.ndarray, np.ndarray]:
        """mpc_decoder.c:188 mpc_decoder_requantisierung -> Y_L, Y_R
        [36,32] (vectorized over bands; same per-element math)."""
        nb = self.max_band + 1
        cc = np.asarray(_T["Cc"], np.float64)
        scf_tab = np.asarray(_SCF, np.float64)
        q = np.stack([self.q[0][:nb], self.q[1][:nb]]).astype(np.float64)
        res = np.stack([self.res[0][:nb], self.res[1][:nb]]).astype(np.int64)
        scf = np.stack([self.scf_index[0][:nb],
                        self.scf_index[1][:nb]]) & 0xFF
        fac = cc[res + 1][..., None] * scf_tab[scf]       # [2, nb, 3]
        v = np.repeat(fac, 12, axis=2) * q                # [2, nb, 36]
        v *= (res != 0)[..., None]
        ms = self.ms_flag[:nb].astype(bool)[:, None]
        yl = np.zeros((36, 32), np.float64)
        yr = np.zeros((36, 32), np.float64)
        yl[:, :nb] = np.where(ms, v[0] + v[1], v[0]).T
        yr[:, :nb] = np.where(ms, v[0] - v[1], v[1]).T
        return yl, yr

    def synthesize(self, yl: np.ndarray, yr: np.ndarray) -> np.ndarray:
        """-> interleaved [1152 * channels] float64."""
        left = self.synth[0].run(yl).reshape(-1)
        if self.channels == 1:
            return left
        right = self.synth[1].run(yr).reshape(-1)
        out = np.empty(FRAME_LENGTH * 2, np.float64)
        out[0::2] = left
        out[1::2] = right
        return out


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    size = 0
    while True:
        if pos >= len(data):
            raise DecodeError("mpc: truncated varint")
        b = data[pos]
        pos += 1
        size = (size << 7) | (b & 0x7F)
        if not (b & 0x80):
            return size, pos


def _requantize_batch(q, res, scf, msf, max_band):
    """Vectorized requantize over all frames at once: q [F,2,32,36],
    res [F,2,32], scf [F,2,32,3], msf [F,32] -> (YL, YR) [F,36,32]."""
    F = q.shape[0]
    nb = max_band + 1
    cc = np.asarray(_T["Cc"], np.float64)
    scf_tab = np.asarray(_SCF, np.float64)
    qq = q[:, :, :nb].astype(np.float64)
    rr = res[:, :, :nb].astype(np.int64)
    sc = scf[:, :, :nb] & 0xFF
    fac = cc[rr + 1][..., None] * scf_tab[sc]          # [F,2,nb,3]
    v = np.repeat(fac, 12, axis=3) * qq                # [F,2,nb,36]
    v *= (rr != 0)[..., None]
    ms_b = msf[:, None, :nb].astype(bool)              # [F,1,nb]
    v0 = v[:, 0].transpose(0, 2, 1)                    # [F,36,nb]
    v1 = v[:, 1].transpose(0, 2, 1)
    YL = np.zeros((F, 36, 32), np.float64)
    YR = np.zeros((F, 36, 32), np.float64)
    YL[:, :, :nb] = np.where(ms_b, v0 + v1, v0)
    YR[:, :, :nb] = np.where(ms_b, v0 - v1, v1)
    return YL, YR


def _finish_batched(audio: AudioData, ys, spans, dec, channels,
                    sample_rate) -> None:
    """Run the deferred whole-stream synthesis and assemble the trimmed
    pcm.  ys entries are either (yl, yr) pairs (per-frame requantize:
    SV7 / Python fallback) or raw (q, res, scf, ms) snapshots (native
    SV8 block decode), which batch-requantize here in one pass."""
    if ys and len(ys[0]) == 4:
        q = np.stack([y[0] for y in ys])
        res = np.stack([y[1] for y in ys])
        scf = np.stack([y[2] for y in ys])
        msf = np.stack([y[3] for y in ys])
        YL, YR = _requantize_batch(q, res, scf, msf, dec.max_band)
        ys = list(zip(YL, YR))
    chunks: list[np.ndarray] = []
    if ys:
        F = len(ys)
        yl = np.stack([y[0] for y in ys]).reshape(F * 36, 32)
        left = _synth_stream(yl).reshape(F, FRAME_LENGTH)
        if channels == 2:
            yr = np.stack([y[1] for y in ys]).reshape(F * 36, 32)
            right = _synth_stream(yr).reshape(F, FRAME_LENGTH)
            frames = np.empty((F, FRAME_LENGTH * 2), np.float64)
            frames[:, 0::2] = left
            frames[:, 1::2] = right
        else:
            frames = left
        for fidx, start, stop in spans:
            chunks.append(frames[fidx][start * channels : stop * channels])
    _finish(audio, chunks, channels, sample_rate)


def _finish(audio: AudioData, chunks, channels, sample_rate) -> None:
    pcm = (np.concatenate(chunks) if chunks
           else np.zeros(0, np.float64)).astype(np.float32)
    audio.samples = pcm
    audio.channel_count = channels
    audio.sample_rate = sample_rate
    audio.source_format = PCMFormat.PCM_16
    audio.length_seconds = (
        len(pcm) / channels / sample_rate if sample_rate else 0.0
    )


def _decode_sv7(data: bytes, audio: AudioData, return_entropy=False):
    """SV7 stream (streaminfo.c:108 read_header_sv7, mpc_demux.c:621
    20-bit frame sizes, mpc_decoder.c:162 last-frame length fixup).
    The payload is byte-swapped 32-bit words (MPC_BUFFER_SWAP)."""
    if (data[3] & 15) != 7:
        raise DecodeError(f"unsupported MPC SV{data[3] & 15} stream")
    body = data[4:]
    body += b"\x00" * ((-len(body)) % 4)
    arr = np.frombuffer(body, np.uint8).reshape(-1, 4)[:, ::-1]
    br = _Bits(arr.tobytes())

    frames = (br.read(16) << 16) | br.read(16)
    br.read(1)  # intensity stereo (should be 0)
    ms = bool(br.read(1))
    max_band = br.read(6)
    if max_band > 31:
        # decoder state arrays are 32 bands wide; the 6-bit field can
        # encode up to 63 in corrupt headers (native reader would
        # otherwise write out of bounds)
        raise DecodeError("mpc: max_band out of range")
    br.read(4)  # profile
    br.read(2)  # link
    sample_rate = _SAMPLE_FREQS[br.read(2)]
    for _ in range(5):
        br.read(16)  # peak/gain fields
    is_true_gapless = br.read(1)
    last_frame_samples = br.read(11)
    br.read(1)  # fast seek
    br.read(19)
    br.read(8)  # encoder version
    channels = 2

    if last_frame_samples == 0:
        last_frame_samples = FRAME_LENGTH
    si_samples = frames * FRAME_LENGTH
    if is_true_gapless:
        si_samples -= FRAME_LENGTH - last_frame_samples
    else:
        si_samples -= SYNTH_DELAY

    # mpc_decoder_set_streaminfo (mpc_decoder.c:102)
    if is_true_gapless:
        d_samples = ((si_samples + FRAME_LENGTH - 1)
                     // FRAME_LENGTH) * FRAME_LENGTH
    else:
        d_samples = si_samples
    samples_to_skip = SYNTH_DELAY

    dec = MusepackDecoder(max_band, ms, channels)
    decoded = 0
    ys: list = []
    spans: list = []
    while decoded < d_samples and br.pos + 20 <= br.limit:
        br.read(20)  # frame bit size (trusted; consistency not enforced)
        samples_left = d_samples - decoded + SYNTH_DELAY
        if samples_left <= 0 and d_samples != 0:
            break
        dec.read_frame_sv7(br)
        fidx = None
        if samples_to_skip < FRAME_LENGTH + SYNTH_DELAY:
            fidx = len(ys)
            ys.append(dec.requantize())
        decoded += FRAME_LENGTH
        # C compares uint64: true only once decoded >= samples (last frame)
        if 0 <= decoded - d_samples < FRAME_LENGTH:
            lfs = br.read(11)
            if decoded == d_samples:
                if lfs == 0:
                    lfs = FRAME_LENGTH
                d_samples += lfs - FRAME_LENGTH
                samples_left += lfs - FRAME_LENGTH
        n_out = min(max(samples_left, 0), FRAME_LENGTH)
        start = 0
        if samples_to_skip:
            if n_out <= samples_to_skip:
                samples_to_skip -= n_out
                n_out = 0
            else:
                n_out -= samples_to_skip
                start = samples_to_skip
                samples_to_skip = 0
        if n_out and fidx is not None:
            spans.append((fidx, start, start + n_out))
        if br.pos > br.limit:
            raise DecodeError("MPC SV7 bitstream overrun")
    if return_entropy:
        return ys, spans, channels, sample_rate
    _finish_batched(audio, ys, spans, dec, channels, sample_rate)


def decode_musepack_buffer(data: bytes, audio: AudioData,
                           return_entropy=False):
    if data[:4] != b"MPCK":
        if data[:3] == b"MP+":
            return _decode_sv7(data, audio, return_entropy)
        raise DecodeError("bad musepack magic")

    pos = 4
    dec = None
    sample_rate = 0
    channels = 0
    total_samples = 0
    beg_silence = 0
    block_pwr = 0
    samples_to_skip = 0
    decoded_samples = 0
    stream_samples = 0
    ys: list = []
    spans: list = []
    done = False

    while pos + 3 <= len(data) and not done:
        key = data[pos : pos + 2]
        size, hdr_end = _read_varint(data, pos + 2)
        if size < hdr_end - pos:
            # block size includes its own header: anything smaller
            # (notably 0 from a corrupt varint) cannot advance
            raise DecodeError("mpc: bad block size")
        body = data[hdr_end : pos + size]
        pos += size

        if key == b"SH":
            # streaminfo.c:187 streaminfo_read_header_sv8
            br = _Bits(body)
            br.read(32)  # CRC (not verified)
            version = br.read(8)
            if version != 8:
                raise DecodeError(f"unsupported MPC stream version {version}")
            total_samples, p = _read_varint(body, (br.pos // 8))
            beg_silence, p = _read_varint(body, p)
            br.pos = p * 8
            sample_rate = _SAMPLE_FREQS[br.read(3)]
            max_band = br.read(5) + 1
            if max_band > 31:
                raise DecodeError("mpc: max_band out of range")
            channels = br.read(4) + 1
            ms = bool(br.read(1))
            block_pwr = br.read(3) * 2
            dec = MusepackDecoder(max_band, ms, channels)
            samples_to_skip = SYNTH_DELAY + beg_silence
            stream_samples = total_samples
        elif key == b"AP":
            if dec is None:
                raise DecodeError("MPC audio block before stream header")
            br = _Bits(body)
            n_block = 1 << block_pwr
            if stream_samples:
                rem = stream_samples - decoded_samples + SYNTH_DELAY
                if rem <= 0:
                    done = True
                    n_eff = 0
                else:
                    n_eff = min(n_block, -(-rem // FRAME_LENGTH))
            else:
                n_eff = n_block
            snap = dec.read_block_native(br, n_eff, key_first=True) \
                if n_eff else None
            if snap is not None:
                # native block decode: bookkeeping only per frame
                q_s, res_s, scf_s, ms_s = snap
                for f in range(n_eff):
                    samples_left = (stream_samples - decoded_samples
                                    + SYNTH_DELAY)
                    fidx = None
                    if samples_to_skip < FRAME_LENGTH + SYNTH_DELAY:
                        fidx = len(ys)
                        ys.append((q_s[f], res_s[f], scf_s[f], ms_s[f]))
                    decoded_samples += FRAME_LENGTH
                    n_out = min(max(samples_left, 0), FRAME_LENGTH)
                    start = 0
                    if samples_to_skip:
                        if n_out <= samples_to_skip:
                            samples_to_skip -= n_out
                            n_out = 0
                        else:
                            n_out -= samples_to_skip
                            start = samples_to_skip
                            samples_to_skip = 0
                    if n_out and fidx is not None:
                        spans.append((fidx, start, start + n_out))
                if br.pos > br.limit:
                    raise DecodeError("MPC bitstream overrun")
                if n_eff < n_block:
                    done = True
                continue
            for f in range(n_block):
                samples_left = (stream_samples - decoded_samples
                                + SYNTH_DELAY)
                if samples_left <= 0 and stream_samples != 0:
                    done = True
                    break
                dec.read_frame(br, is_key_frame=(f == 0))
                fidx = None
                if samples_to_skip < FRAME_LENGTH + SYNTH_DELAY:
                    fidx = len(ys)
                    ys.append(dec.requantize())
                decoded_samples += FRAME_LENGTH
                n_out = min(max(samples_left, 0), FRAME_LENGTH)
                start = 0
                if samples_to_skip:
                    if n_out <= samples_to_skip:
                        samples_to_skip -= n_out
                        n_out = 0
                    else:
                        n_out -= samples_to_skip
                        start = samples_to_skip
                        samples_to_skip = 0
                if n_out and fidx is not None:
                    spans.append((fidx, start, start + n_out))
                if br.pos > br.limit:
                    raise DecodeError("MPC bitstream overrun")
        elif key == b"SE":
            done = True
        # other blocks (RG, EI, ST, SO, CT) are metadata: skipped

    if dec is None:
        raise DecodeError("no MPC stream header found")
    if return_entropy:
        return ys, spans, channels, sample_rate
    _finish_batched(audio, ys, spans, dec, channels, sample_rate)
