"""Native host-ops loader: builds and binds libnyquist_tpu/native/*.c.

The reference's host side is C/C++ (SURVEY.md §2); this framework keeps
the branchy bitstream hot loops native too. The shared library is built
once with the system compiler and bound via ctypes (pybind11 is not in
the image); every call site has a pure-Python fallback so the package
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[1] / "native"
_LIB = None
_TRIED = False


def _build() -> pathlib.Path | None:
    srcs = sorted(_NATIVE_DIR.glob("*.c"))
    out = _NATIVE_DIR / "libhostops.so"
    if out.exists() and all(
        out.stat().st_mtime >= s.stat().st_mtime for s in srcs
    ):
        return out
    # Compile to a per-process temp file and atomically rename into place
    # so concurrent builders (parallel pytest workers, multi-process
    # serving) never load a half-written .so.
    tmp = out.with_name(f".libhostops.{os.getpid()}.so")
    # -march=native is safe here by construction (the .so is always
    # compiled on the machine that runs it) and worth ~5% on the
    # branchless bitstream loops; retry without it for compilers that
    # reject the flag.
    for extra in (["-march=native"], []):
        try:
            subprocess.run(
                ["cc", "-O3", *extra, "-fPIC", "-shared",
                 *map(str, srcs), "-o", str(tmp), "-lm"],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, out)
            return out
        except Exception:
            try:
                tmp.unlink(missing_ok=True)
            except OSError:
                pass
    return None


def lib():
    """Return the loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _build()
    if path is None:
        return None
    try:
        L = ctypes.CDLL(str(path))
        L.flac_rice_decode.restype = ctypes.c_uint64
        L.flac_rice_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
        ]
        L.flac_decode_stream.restype = ctypes.c_int64
        L.flac_decode_stream.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        L.flac_lpc_restore.restype = None
        L.flac_lpc_restore.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        L.flac_fixed_restore.restype = None
        L.flac_fixed_restore.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32),
        ]
        L.wv_words_lossless.restype = ctypes.c_uint64
        L.wv_words_lossless.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
        ]
        L.wv_decorr_mono.restype = None
        L.wv_decorr_mono.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
        ]
        i32p = ctypes.POINTER(ctypes.c_int32)
        L.wv_decode_block.restype = ctypes.c_uint64
        L.wv_decode_block.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64,
            i32p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            i32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, i32p, i32p, i32p, i32p, i32p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int64,
        ]
        L.mp3_l3_huffman.restype = None
        L.mp3_l3_huffman.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int64,
            ctypes.c_int32,
        ]
        L.celt_bands_decode.restype = ctypes.c_uint32
        L.celt_bands_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int64),                 # ec state
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int,   # eBands
            ctypes.POINTER(ctypes.c_int16),                 # logN
            ctypes.POINTER(ctypes.c_int16),                 # cache_index
            ctypes.c_char_p,                                # cache_bits
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,                     # ... intensity
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint32, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_char_p,
        ]
        i16p_ = ctypes.POINTER(ctypes.c_int16)
        i32p_ = ctypes.POINTER(ctypes.c_int32)
        i64p_ = ctypes.POINTER(ctypes.c_int64)
        f32p_ = ctypes.POINTER(ctypes.c_float)
        f64p_ = ctypes.POINTER(ctypes.c_double)
        L.celt_decode_stream.restype = ctypes.c_int64
        L.celt_decode_stream.argtypes = [
            ctypes.c_char_p, i64p_, i64p_,          # payload, offs, lens
            i32p_, i32p_, i32p_, ctypes.c_int64,    # fsz, ends, chs, n
            i16p_, ctypes.c_int, i16p_, i16p_,      # eBands, nb, logN, ci
            ctypes.c_char_p, ctypes.c_char_p,       # cache_bits, cache_caps
            ctypes.c_char_p, ctypes.c_int,          # allocVectors, nbAV
            f64p_, i32p_,                           # eMeans, prob_model
            ctypes.c_int, ctypes.c_int,             # shortMdctSize, effEBands
            f64p_, f64p_, f64p_, f64p_, i64p_,      # state + rng
            ctypes.c_int, ctypes.c_int,             # CC, CCout
            ctypes.c_int, ctypes.c_int,             # downsample, start
            ctypes.c_int32, f32p_,                  # nmax, freq_out
            i32p_, i32p_, f64p_, i32p_, i32p_,      # sb, pfp, pfg, pft, sil
        ]
        i8p_ = ctypes.POINTER(ctypes.c_int8)
        u8p_ = ctypes.POINTER(ctypes.c_uint8)
        u32p_ = ctypes.POINTER(ctypes.c_uint32)
        i16p__ = ctypes.POINTER(ctypes.c_int16)
        f64p__ = ctypes.POINTER(ctypes.c_double)
        L.celt_decode_stream_trace.restype = ctypes.c_int64
        L.celt_decode_stream_trace.argtypes = [
            ctypes.c_char_p, i64p_, i64p_,          # payload, offs, lens
            i32p_, i32p_, i32p_, ctypes.c_int64,    # fsz, ends, chs, n
            i16p__, ctypes.c_int, i16p__, i16p__,   # eBands, nb, logN, ci
            ctypes.c_char_p, ctypes.c_char_p,       # cache_bits, cache_caps
            ctypes.c_char_p, ctypes.c_int,          # allocVectors, nbAV
            f64p__, i32p_,                          # eMeans, prob_model
            ctypes.c_int, ctypes.c_int,             # shortMdctSize, effEBands
            f64p__, f64p__, f64p__, f64p__, i64p_,  # state + rng
            ctypes.c_int, ctypes.c_int,             # CC, CCout
            ctypes.c_int, ctypes.c_int,             # downsample, start
            i32p_, i32p_, f64p__, i32p_, i32p_,     # sb, pfp, pfg, pft, sil
            i64p_,                                  # tcaps[6]
            i32p_, i8p_, i8p_, i8p_,                # lf frame/band/call/type
            i16p__, i16p__, i32p_, i16p__,          # lf off/len/k/stride
            f64p__, u32p_, i64p_,                   # lf gain/seed/iy_off
            i16p__,                                 # iy_heap
            u8p_, i32p_, i8p_,                      # bd mode/eff_lb/tf
            i16p__, i16p__, i16p__,                 # bd imid/iside/itheta
            i8p_, i8p_, i8p_,                       # bd inv/sign/cflag
            i32p_, i8p_, i8p_, i8p_, u32p_,         # ac frame/band/c/k/seed
            ctypes.POINTER(ctypes.c_float),         # ac_r
            i32p_, ctypes.POINTER(ctypes.c_float),  # fr_misc, fr_gains
            ctypes.POINTER(ctypes.c_float), ctypes.c_int32,  # xs, nmax
            i32p_, i32p_, i32p_,                    # rot row/col/pk
            ctypes.POINTER(ctypes.c_float),         # rot_th
            ctypes.POINTER(ctypes.c_float),         # rot_g
            i32p_,                                  # rot_leaf
        ]
        L.celt_compute_allocation.restype = None
        L.celt_compute_allocation.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int16), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ]
        L.celt_coarse_energy.restype = None
        L.celt_coarse_energy.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int64),                 # ec state
            ctypes.POINTER(ctypes.c_int32),                 # prob_model[42]
            ctypes.c_int, ctypes.c_int,                     # start, end
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,  # oldEBands, nbE
            ctypes.c_int, ctypes.c_int, ctypes.c_int,       # intra, C, LM
        ]
        L.celt_fine_energy.restype = None
        L.celt_fine_energy.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),                 # fine_quant
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        L.celt_energy_finalise.restype = ctypes.c_int64
        L.celt_energy_finalise.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),                 # fine_quant
            ctypes.POINTER(ctypes.c_int32),                 # fine_priority
            ctypes.c_int64,                                 # bits_left
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        L.celt_dynalloc.restype = ctypes.c_int64
        L.celt_dynalloc.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int16),                 # eBands
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,  # cap, total
            ctypes.POINTER(ctypes.c_int32),                 # offsets
            ctypes.POINTER(ctypes.c_int32),                 # trim out
        ]
        L.celt_tf_decode.restype = None
        L.celt_tf_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,       # start,end,trans
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,   # tf_res, LM
        ]
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        L.vorbis_residue_decode.restype = None
        L.vorbis_residue_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, i64p,          # data, st
            i32p, i64p, i32p,                               # luts
            i32p, i64p, i32p,                               # trees, maxlen
            ctypes.POINTER(ctypes.c_float), i64p, i32p,     # vqs, dims
            ctypes.c_int, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,                     # classifs, cbook
            i32p, ctypes.c_char_p,                          # books8, dnd
            ctypes.c_int64, ctypes.c_int64,                 # ch, n2
            ctypes.POINTER(ctypes.c_float),                 # work
        ]
        f32p_ = ctypes.POINTER(ctypes.c_float)
        L.vorbis_floor1_decode.restype = ctypes.c_int64
        L.vorbis_floor1_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, i64p_,     # data, n, st
            i32p_, i32p_, i32p_,                        # cfg, nbrs, sort
            i32p_, i64p_, i32p_,                        # luts
            i32p_, i64p_, i32p_,                        # trees, maxlen
            f32p_, ctypes.c_int64, f32p_,               # fromdb, n2, out
        ]
        L.ogg_collect_packets.restype = ctypes.c_int64
        L.ogg_collect_packets.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_char_p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int64,
            i64p_, i64p_, ctypes.c_int64, i64p_,
        ]
        L.vorbis_stream_decode.restype = ctypes.c_int64
        L.vorbis_stream_decode.argtypes = [
            ctypes.c_char_p, i64p_, i64p_, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p_, ctypes.c_int,
            i32p_, i32p_, i32p_, i32p_,
            i32p_, i32p_, i32p_, i64p_,
            f32p_,
            i32p_, i32p_,
            i32p_, i64p_, i32p_,
            i32p_, i64p_, i32p_,
            f32p_, i64p_, i32p_,
            ctypes.c_int64, f32p_, i32p_,
        ]
        L.celt_comb_stream_host.restype = None
        L.celt_comb_stream_host.argtypes = [
            f32p_, ctypes.c_int64, ctypes.c_int64,
            i32p_, i32p_, i32p_, f64p_, i32p_,
            f64p_, ctypes.c_int, ctypes.c_int, f64p_,
        ]
        L.celt_deemph_stream_host.restype = ctypes.c_float
        L.celt_deemph_stream_host.argtypes = [
            f32p_, ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ]
        L.vorbis_packet_decode.restype = ctypes.c_int64
        L.vorbis_packet_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i32p_, ctypes.c_int,                    # mode_cfg, nmodes
            i32p_, i32p_, i32p_, i32p_,             # map blobs
            i32p_, i32p_, i32p_, i64p_,             # floor blobs
            f32p_,                                  # fromdb
            i32p_, i32p_,                           # res meta/books8
            i32p_, i64p_, i32p_,                    # luts
            i32p_, i64p_, i32p_,                    # trees
            f32p_, i64p_, i32p_,                    # vqs
            f32p_, i32p_,                           # specs, info
        ]
        L.wv_words_hybrid.restype = ctypes.c_uint64
        L.wv_words_hybrid.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        L.wv_float_values.restype = None
        L.wv_float_values.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_uint64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint32),
        ]
        L.wv_float_nowvx.restype = None
        L.wv_float_nowvx.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint32),
        ]
        L.mpc_set_tables.restype = None
        L.mpc_set_tables.argtypes = [
            i32p_, ctypes.c_char_p, i64p_,          # can rows/syms/meta
            i32p_, i64p_,                           # lut rows/meta
            i32p_, i32p_,                           # dc, res_bit
        ]
        L.mpc_read_frame.restype = ctypes.c_int64
        L.mpc_read_frame.argtypes = (
            [ctypes.c_char_p, ctypes.c_int64, i64p_]
            + [ctypes.c_int] * 4 + [i32p_] * 11
        )
        L.mpc_read_frames_sv8.restype = ctypes.c_int64
        L.mpc_read_frames_sv8.argtypes = (
            [ctypes.c_char_p, ctypes.c_int64, i64p_]
            + [ctypes.c_int] * 4 + [i32p_] * 15
        )
        L.silk_set_tables.restype = None
        L.silk_set_tables.argtypes = [
            ctypes.c_char_p, i64p_, ctypes.c_int,   # u8 blob, offs, n
            i32p_, i64p_, ctypes.c_int,             # i32 blob, offs, n
        ]
        L.silk_create.restype = ctypes.c_void_p
        L.silk_create.argtypes = [ctypes.c_int]
        L.silk_free.restype = None
        L.silk_free.argtypes = [ctypes.c_void_p]
        L.silk_decode_lost.restype = ctypes.c_int64
        L.silk_decode_lost.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i16p_,
        ]
        L.silk_decode.restype = ctypes.c_int64
        L.silk_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
            i64p_, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            i16p_,
        ]
        L.ogg_opus_celt_scan.restype = ctypes.c_int64
        L.ogg_opus_celt_scan.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,        # data, len
            ctypes.c_char_p, ctypes.c_int64,        # payload_out, cap
            i64p_, i64p_,                           # offs, lens
            i32p_, i32p_, i32p_,                    # fsz, ends, chs
            ctypes.c_int64, i32p_,                  # max_frames, info
        ]
        i8p0 = ctypes.POINTER(ctypes.c_int8)
        L.celt_pvq_bucket_count.restype = ctypes.c_int64
        L.celt_pvq_bucket_count.argtypes = [
            i8p0, ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        L.celt_pvq_bucket_fill.restype = None
        L.celt_pvq_bucket_fill.argtypes = [
            i8p0, ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int32), i8p0, i8p0,
            ctypes.POINTER(ctypes.c_int16),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        L.wv_dsd_decode.restype = ctypes.c_int64
        L.wv_dsd_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
        ]
        L.wv_decorr_stereo.restype = None
        L.wv_decorr_stereo.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        L.wv_decorr_simd8.restype = ctypes.c_int
        L.wv_decorr_simd8.argtypes = [
            ctypes.c_int, i32p, i32p, i32p, i32p, i32p,
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int,
        ]
        _LIB = L
    except OSError:
        _LIB = None
    return _LIB
