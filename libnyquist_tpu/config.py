"""Runtime configuration surface.

The reference exposes its options at build time (CMake: USE_CUDA,
ENABLE_CPU_PROFILING, LIBNYQUIST_BUILD_EXAMPLE, backend selectors —
reference CMakeLists.txt:12,20-29,83-85,150-160).  A Python/JAX
framework has no build step, so the equivalent surface is environment
flags, all read at first use and centralized here.

| flag | effect |
|---|---|
| LIBNYQUIST_NO_NATIVE_CELT   | Python CELT band decode (no celt_bands.c) |
| LIBNYQUIST_NO_NATIVE_SILK   | Python SILK decoder (no silk_dec.c) |
| LIBNYQUIST_NO_NATIVE_MP3    | Python MP3 entropy path |
| LIBNYQUIST_NO_NATIVE_VORBIS | Python Vorbis residue/floor decode |
| LIBNYQUIST_NO_NATIVE_MPC    | Python Musepack frame reader |
| LIBNYQUIST_NO_NATIVE_FLAC   | Python FLAC frame loop (no flac_stream.c) |
| LIBNYQUIST_OPUS_PIPELINE    | single-file Opus loads use the device
|                             | (TPU) batched pipeline |
| LIBNYQUIST_OPUS_FRAME_SYNTH | single-file Opus loads use per-frame
|                             | host synthesis (oracle path) |
| LIBNYQUIST_FLAC_MD5         | verify the STREAMINFO MD5 of decoded
|                             | FLAC audio (libFLAC md5_checking) |
| LIBNYQUIST_ROT_PALLAS       | single-kernel Pallas CELT rotation
|                             | (ops/rot_pallas.py) instead of the
|                             | XLA scan formulation |

The NO_NATIVE_* flags are the analog of building the reference without
its optimized translation units: every native plane keeps a pure-Python
fallback that doubles as its spec and correctness oracle.
"""

from __future__ import annotations

import os
from dataclasses import dataclass


@dataclass(frozen=True)
class Config:
    no_native_celt: bool
    no_native_silk: bool
    no_native_mp3: bool
    no_native_vorbis: bool
    no_native_mpc: bool
    no_native_flac: bool
    opus_device_pipeline: bool
    opus_frame_synth: bool
    flac_md5: bool
    rot_pallas: bool


def current() -> Config:
    """Snapshot of the flag environment (flags are consulted lazily by
    the modules that own them; this is the introspection surface)."""
    e = os.environ.get
    return Config(
        no_native_celt=bool(e("LIBNYQUIST_NO_NATIVE_CELT")),
        no_native_silk=bool(e("LIBNYQUIST_NO_NATIVE_SILK")),
        no_native_mp3=bool(e("LIBNYQUIST_NO_NATIVE_MP3")),
        no_native_vorbis=bool(e("LIBNYQUIST_NO_NATIVE_VORBIS")),
        no_native_mpc=bool(e("LIBNYQUIST_NO_NATIVE_MPC")),
        no_native_flac=bool(e("LIBNYQUIST_NO_NATIVE_FLAC")),
        opus_device_pipeline=bool(e("LIBNYQUIST_OPUS_PIPELINE")),
        opus_frame_synth=bool(e("LIBNYQUIST_OPUS_FRAME_SYNTH")),
        flac_md5=bool(e("LIBNYQUIST_FLAC_MD5")),
        rot_pallas=bool(e("LIBNYQUIST_ROT_PALLAS")),
    )
