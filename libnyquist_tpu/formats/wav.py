"""WAV (RIFF) decoder: host-side chunk parsing + TPU sample conversion.

Behavioral equivalent of the reference WavDecoder
(reference: src/WavDecoder.cpp:146-321) including its quirks:
  * chunks are located by scanning the whole file for the fourcc on 2-byte
    boundaries (reference: ScanForChunk, include/libnyquist/Common.h:579-597),
    which tolerates junk between chunks (test_data/degenerate fixtures);
  * a declared RIFF size inconsistent with the true file size is an error
    (WavDecoder.cpp:178-182);
  * IMA-ADPCM (format 0x11) decodes via the fact-chunk sample count.

The branchy parsing stays on host; sample normalization and ADPCM decode
run as batched TPU ops (libnyquist_tpu.ops.pcm / ops.adpcm).
"""

from __future__ import annotations

import struct

import numpy as np

from ..audio_data import AudioData, PCMFormat
from ..errors import DecodeError
from ..ops import adpcm as adpcm_ops
from ..ops import pcm as pcm_ops

FORMAT_PCM = 0x0001
FORMAT_IEEE = 0x0003
FORMAT_ALAW = 0x0006
FORMAT_MULAW = 0x0007
FORMAT_IMA_ADPCM = 0x0011
FORMAT_EXT = 0xFFFE


def _scan_for_chunk(data: bytes, fourcc: bytes):
    """Find `fourcc` at any 2-byte boundary; return (offset, size) with
    offset pointing at the fourcc itself, or (0, 0) if absent.
    Mirrors ScanForChunk (Common.h:579-597)."""
    start = 0
    while True:
        idx = data.find(fourcc, start)
        if idx < 0:
            return 0, 0
        if idx % 2 == 0:
            if idx + 8 <= len(data):
                size = struct.unpack_from("<I", data, idx + 4)[0]
                return idx, size
            return idx, 0
        start = idx + 1


def decode_wav_buffer(data: bytes, audio: AudioData) -> None:
    if len(data) < 12:
        raise DecodeError("file too small for RIFF header")
    riff_id = data[0:4]
    file_size = struct.unpack_from("<I", data, 4)[0]
    wave_id = data[8:12]

    if riff_id != b"RIFF":
        if riff_id in (b"RIFX", b"FFIR"):
            raise DecodeError("big endian RIFF files not supported")
        raise DecodeError("bad RIFF/RIFX/FFIR file header")
    if wave_id != b"WAVE":
        raise DecodeError("bad WAVE header")
    if len(data) - file_size != 8:
        # Same strictness as the reference (WavDecoder.cpp:178-182);
        # catches the header_larger_than_file_size degenerate fixture.
        raise DecodeError("declared size of file less than file size")

    fmt_off, fmt_size = _scan_for_chunk(data, b"fmt ")
    if fmt_off == 0:
        raise DecodeError("couldn't find fmt chunk")
    if fmt_size < 16:
        raise DecodeError("format chunk too small")
    (
        wformat,
        channel_count,
        sample_rate,
        _data_rate,
        frame_size,
        bit_depth,
    ) = struct.unpack_from("<HHIIHH", data, fmt_off + 8)

    audio.channel_count = channel_count
    audio.sample_rate = sample_rate
    audio.frame_size = frame_size

    if bit_depth == 4:
        audio.source_format = PCMFormat.PCM_16  # IMA ADPCM decodes to 16-bit
    elif bit_depth == 8:
        audio.source_format = PCMFormat.PCM_U8
    elif bit_depth == 16:
        audio.source_format = PCMFormat.PCM_16
    elif bit_depth == 24:
        audio.source_format = PCMFormat.PCM_24
    elif bit_depth == 32:
        audio.source_format = (
            PCMFormat.PCM_FLT if wformat == FORMAT_IEEE else PCMFormat.PCM_32
        )
    elif bit_depth == 64:
        audio.source_format = (
            PCMFormat.PCM_DBL if wformat == FORMAT_IEEE else PCMFormat.PCM_64
        )
    else:
        raise DecodeError(f"unsupported bit depth {bit_depth}")

    if wformat == 0:
        raise DecodeError("unknown wave format")
    adpcm_encoded = wformat == FORMAT_IMA_ADPCM

    fact_sample_length = 0
    if wformat in (FORMAT_IEEE, FORMAT_IMA_ADPCM, FORMAT_EXT):
        fact_off, fact_size = _scan_for_chunk(data, b"fact")
        if fact_size >= 4 and fact_off + 12 <= len(data):
            fact_sample_length = struct.unpack_from("<I", data, fact_off + 8)[0]

    data_off, data_size = _scan_for_chunk(data, b"data")
    if data_off == 0:
        raise DecodeError("couldn't find data chunk")
    payload_off = data_off + 8
    data_size = min(data_size, len(data) - payload_off)

    if adpcm_encoded:
        if frame_size <= 0:
            raise DecodeError("bad ADPCM block align")
        total_samples = fact_sample_length * channel_count
        raw = np.frombuffer(
            data, dtype=np.uint8, count=(data_size // frame_size) * frame_size,
            offset=payload_off,
        )
        samples = adpcm_ops.decode_ima_adpcm(
            raw, frame_size, channel_count, total_samples
        )
        audio.samples = np.asarray(samples, dtype=np.float32)
        audio.length_seconds = (
            total_samples / sample_rate / channel_count if sample_rate else 0.0
        )
        return

    total_frames = data_size // frame_size if frame_size else 0
    total_samples = total_frames * channel_count
    bytes_per_sample = frame_size // channel_count if channel_count else 0
    payload = data[payload_off : payload_off + total_samples * bytes_per_sample]
    audio.samples = pcm_ops.convert_buffer_to_float32(
        payload, audio.source_format
    )
    audio.length_seconds = total_frames / sample_rate if sample_rate else 0.0
