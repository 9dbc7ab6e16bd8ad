"""NyquistIO facade: decoder dispatch by extension or magic bytes.

Equivalent of the reference's ``nqr::NyquistIO`` (reference:
src/Common.cpp:36-151 — Load entry points, :66-74 magic-number map,
:93-105 Ogg subtype sniffing, :153-188 extension parsing + decoder table).
Unlike the fork (which only registers WAV and Opus, src/Common.cpp:184-188),
this registry covers all seven formats the project advertises.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Union

from .audio_data import AudioData
from .errors import (
    DecodeError,
    NyquistError,
    UnsupportedExtensionError,
)

# A decoder is a callable (data: bytes, audio: AudioData) -> None that fills
# `audio` in place, mirroring BaseDecoder::LoadFromBuffer
# (reference: include/libnyquist/Decoders.h:38-44).
DecoderFn = Callable[[bytes, AudioData], None]

# Extension aliases (wave/ambix -> wav, oga -> ogg) are handled by
# registering every alias directly in _build_decoder_table below.
_DECODER_TABLE: Dict[str, DecoderFn] = {}


def register_decoder(extensions, fn: DecoderFn) -> None:
    if isinstance(extensions, str):
        extensions = [extensions]
    for ext in extensions:
        _DECODER_TABLE[ext.lower()] = fn


def _ensure_registry() -> None:
    """Populate the decoder table lazily (avoids import cycles)."""
    if _DECODER_TABLE:
        return
    from .formats import aiff, wav, flac, mp3, vorbis, wavpack, musepack
    from .formats.opus import decode_opus_buffer

    register_decoder(["wav", "wave", "ambix"], wav.decode_wav_buffer)
    register_decoder(["aiff", "aif", "aifc"], aiff.decode_aiff_buffer)
    register_decoder("caf", aiff.decode_caf_buffer)
    register_decoder("flac", flac.decode_flac_buffer)
    register_decoder("oggflac", flac.decode_ogg_flac)
    register_decoder("mp3", mp3.decode_mp3_buffer)
    register_decoder(["ogg", "oga"], vorbis.decode_vorbis_buffer)
    register_decoder("opus", decode_opus_buffer)
    register_decoder("wv", wavpack.decode_wavpack_buffer)
    register_decoder("mpc", musepack.decode_musepack_buffer)


def parse_path_for_extension(path: str) -> str:
    """Lowercased extension without the dot (reference: Common.cpp:153-164)."""
    ext = os.path.splitext(path)[1]
    return ext[1:].lower() if ext else ""


def sniff_extension(data: bytes) -> Optional[str]:
    """Identify a format from magic bytes (reference: Common.cpp:66-127).

    Returns the canonical extension string or None. For Ogg containers the
    first page's payload is inspected to distinguish Opus from Vorbis
    (reference: match_ogg_subtype, Common.cpp:93-105).
    """
    if len(data) < 12:
        return None
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if data[:4] == b"FORM" and data[8:12] in (b"AIFF", b"AIFC"):
        return "aiff"
    if data[:4] == b"caff":
        return "caf"
    if data[:4] == b"fLaC":
        return "flac"
    if data[:4] == b"OggS":
        # First Ogg page: 27-byte header + seg table, payload starts after.
        nsegs = data[26] if len(data) > 26 else 0
        off = 27 + nsegs
        head = data[off : off + 8]
        if head[:8] == b"OpusHead":
            return "opus"
        if head[:7] == b"\x01vorbis":
            return "ogg"
        if head[:5] == b"\x7fFLAC":
            return "oggflac"
        return "ogg"
    if data[:4] == b"wvpk":
        return "wv"
    if data[:4] == b"MPCK" or data[:3] == b"MP+":
        return "mpc"
    if data[:3] == b"ID3":
        return "mp3"
    if data[0] == 0xFF and (data[1] & 0xE0) == 0xE0:
        return "mp3"
    return None


def is_file_supported(path: str) -> bool:
    _ensure_registry()
    ext = parse_path_for_extension(path)
    return ext in _DECODER_TABLE


def load(
    source: Union[str, bytes, bytearray, memoryview],
    extension: Optional[str] = None,
) -> AudioData:
    """Decode an audio file or in-memory buffer.

    Mirrors the three reference overloads (Decoders.h:48-63):
      load(path), load(buffer), load(buffer, ext).
    Dispatch order matches the reference: explicit extension, then path
    extension, then magic sniffing of the buffer contents.
    """
    _ensure_registry()
    if isinstance(source, str):
        with open(source, "rb") as f:
            data = f.read()
        if extension is None:
            extension = parse_path_for_extension(source)
    else:
        data = bytes(source)

    if not extension:
        extension = sniff_extension(data)
    else:
        extension = extension.lower().lstrip(".")
        # Re-sniff when the extension doesn't match contents (e.g. .ogg
        # holding an Opus stream), like the buffer-based reference path.
        sniffed = sniff_extension(data)
        if sniffed is not None and extension in ("ogg", "oga", "opus"):
            extension = sniffed

    if not extension or extension not in _DECODER_TABLE:
        raise UnsupportedExtensionError(
            f"no decoder for extension {extension!r}"
        )

    audio = AudioData()
    try:
        _DECODER_TABLE[extension](data, audio)
    except NyquistError:
        raise
    except Exception as e:  # malformed input tripped an internal path
        raise DecodeError(
            f"malformed {extension} stream: {type(e).__name__}: {e}"
        ) from e
    if audio.sample_rate > 0 and audio.channel_count > 0:
        audio.length_seconds = (
            audio.sample_count / audio.channel_count / audio.sample_rate
        )
    if not audio.frame_size and audio.channel_count:
        from .audio_data import PCMFormat

        bps = {
            PCMFormat.PCM_U8: 1, PCMFormat.PCM_S8: 1, PCMFormat.PCM_16: 2,
            PCMFormat.PCM_24: 3, PCMFormat.PCM_32: 4, PCMFormat.PCM_64: 8,
            PCMFormat.PCM_FLT: 4, PCMFormat.PCM_DBL: 8,
        }.get(audio.source_format, 0)
        audio.frame_size = audio.channel_count * bps
    return audio


class NyquistIO:
    """Thin OO wrapper matching the reference class shape."""

    def load(self, source, extension: Optional[str] = None) -> AudioData:
        return load(source, extension)

    @staticmethod
    def is_file_supported(path: str) -> bool:
        return is_file_supported(path)
