"""Encoder API (reference: include/libnyquist/Encoders.h:33-41).

The reference fork declares `encode_wav_to_disk` / `encode_opus_to_disk`
but ships no implementation (SURVEY.md L4: "encoder API declared but
unimplemented in the fork"); upstream libnyquist implements the WAV
encoder. This module provides a complete WAV encoder (PCM u8/16/24/32
and IEEE float32, optional TPDF dither via the TPU conversion kernels in
ops/pcm.py) with the upstream validation semantics, plus the matching
error codes.
"""

from __future__ import annotations

import dataclasses
import enum
import struct

import numpy as np

from .audio_data import AudioData, PCMFormat


class EncoderError(enum.IntEnum):
    """Mirrors Common.h:391-401."""

    NoError = 0
    InsufficientSampleData = 1
    FileIOError = 2
    UnsupportedSamplerate = 3
    UnsupportedChannelConfiguration = 4
    UnsupportedBitdepth = 5
    UnsupportedChannelMix = 6
    BufferTooBig = 7


class DitherType(enum.IntEnum):
    DITHER_NONE = 0
    DITHER_TRIANGLE = 1


@dataclasses.dataclass
class EncoderParams:
    """Mirrors Common.h:384-389."""

    channel_count: int
    target_format: PCMFormat
    dither: DitherType = DitherType.DITHER_NONE


_BITS = {
    PCMFormat.PCM_U8: 8,
    PCMFormat.PCM_16: 16,
    PCMFormat.PCM_24: 24,
    PCMFormat.PCM_32: 32,
    PCMFormat.PCM_FLT: 32,
}


def _pack24(v: np.ndarray) -> bytes:
    """int32 -> little-endian 3-byte packing."""
    b = np.empty((len(v), 3), np.uint8)
    u = v.astype(np.int64) & 0xFFFFFF
    b[:, 0] = u & 0xFF
    b[:, 1] = (u >> 8) & 0xFF
    b[:, 2] = (u >> 16) & 0xFF
    return b.tobytes()


def encode_wav_to_buffer(p: EncoderParams, d: AudioData) -> bytes:
    """Serialize AudioData to a RIFF/WAVE byte string.

    Raises ValueError with an EncoderError name on invalid input —
    encode_wav_to_disk converts these to the reference's int codes.
    """
    if d.samples is None or len(d.samples) == 0:
        raise ValueError(EncoderError.InsufficientSampleData.name)
    if d.sample_rate <= 0:
        raise ValueError(EncoderError.UnsupportedSamplerate.name)
    if p.channel_count < 1 or p.channel_count > 8:
        raise ValueError(EncoderError.UnsupportedChannelConfiguration.name)
    if p.target_format not in _BITS:
        raise ValueError(EncoderError.UnsupportedBitdepth.name)

    samples = np.asarray(d.samples, np.float32)
    # channel mixdown: like upstream, only stereo->mono is supported
    if p.channel_count != d.channel_count:
        if d.channel_count == 2 and p.channel_count == 1:
            samples = 0.5 * (samples[0::2] + samples[1::2])
        else:
            raise ValueError(EncoderError.UnsupportedChannelMix.name)

    from .ops import pcm as pcm_ops

    import jax.numpy as jnp

    pcm = np.asarray(
        pcm_ops.float32_to_pcm(
            jnp.asarray(samples), p.target_format,
            dither=(p.dither == DitherType.DITHER_TRIANGLE
                    and p.target_format != PCMFormat.PCM_FLT),
        )
    )

    bits = _BITS[p.target_format]
    is_float = p.target_format == PCMFormat.PCM_FLT
    if p.target_format == PCMFormat.PCM_24:
        payload = _pack24(pcm)
    else:
        payload = pcm.tobytes()

    # RIFF sizes are uint32 (Common.h EncoderError::BufferTooBig): the
    # data chunk length and the total RIFF size must both fit.
    if len(payload) + 64 > 0xFFFFFFFF:
        raise ValueError(EncoderError.BufferTooBig.name)

    ch = p.channel_count
    byte_rate = d.sample_rate * ch * (bits // 8)
    block_align = ch * (bits // 8)
    fmt_code = 3 if is_float else 1

    out = bytearray()
    out += b"RIFF"
    out += b"\x00\x00\x00\x00"  # patched below
    out += b"WAVE"
    out += b"fmt "
    out += struct.pack("<IHHIIHH", 16, fmt_code, ch, d.sample_rate,
                       byte_rate, block_align, bits)
    if is_float:
        out += b"fact" + struct.pack("<II", 4, len(samples) // ch)
    out += b"data" + struct.pack("<I", len(payload))
    out += payload
    if len(payload) & 1:
        out += b"\x00"
    struct.pack_into("<I", out, 4, len(out) - 8)
    return bytes(out)


def encode_wav_to_disk(p: EncoderParams, d: AudioData, path: str) -> int:
    """Reference signature (Encoders.h:36): returns an EncoderError code."""
    try:
        buf = encode_wav_to_buffer(p, d)
    except ValueError as e:
        return int(EncoderError[str(e)])
    try:
        with open(path, "wb") as f:
            f.write(buf)
    except OSError:
        return int(EncoderError.FileIOError)
    return int(EncoderError.NoError)


def _f80(rate: int) -> bytes:
    """Encode a sample rate as an 80-bit IEEE extended float (AIFF COMM)."""
    if rate <= 0:
        raise ValueError(EncoderError.UnsupportedSamplerate.name)
    exp = rate.bit_length() - 1
    mant = rate << (63 - exp)
    return struct.pack(">HQ", 16383 + exp, mant)


def encode_aiff_to_buffer(p: EncoderParams, d: AudioData) -> bytes:
    """Serialize AudioData to an AIFF byte string (big-endian PCM).

    Writer parity with the reference example app, which saves WAV *and*
    AIFF (reference: examples/src/AudioFile.h:105 AIFFAudioFormat /
    saveToAiffFile). Integer PCM 8/16/24/32; AIFF stores signed 8-bit
    (unlike WAV's unsigned), so PCM_U8 is emitted as signed. Float
    output would need an AIFC "fl32" container and is rejected like the
    reference writer, which is integer-only.
    """
    if d.samples is None or len(d.samples) == 0:
        raise ValueError(EncoderError.InsufficientSampleData.name)
    if d.sample_rate <= 0:
        raise ValueError(EncoderError.UnsupportedSamplerate.name)
    if p.channel_count < 1 or p.channel_count > 8:
        raise ValueError(EncoderError.UnsupportedChannelConfiguration.name)
    if p.target_format not in _BITS or p.target_format == PCMFormat.PCM_FLT:
        raise ValueError(EncoderError.UnsupportedBitdepth.name)

    samples = np.asarray(d.samples, np.float32)
    if p.channel_count != d.channel_count:
        if d.channel_count == 2 and p.channel_count == 1:
            samples = 0.5 * (samples[0::2] + samples[1::2])
        else:
            raise ValueError(EncoderError.UnsupportedChannelMix.name)

    from .ops import pcm as pcm_ops

    import jax.numpy as jnp

    pcm = np.asarray(
        pcm_ops.float32_to_pcm(
            jnp.asarray(samples), p.target_format,
            dither=(p.dither == DitherType.DITHER_TRIANGLE),
        )
    )

    bits = _BITS[p.target_format]
    if p.target_format == PCMFormat.PCM_U8:
        payload = (pcm.astype(np.int16) - 128).astype(np.int8).tobytes()
    elif p.target_format == PCMFormat.PCM_24:
        le = np.frombuffer(_pack24(pcm), np.uint8).reshape(-1, 3)
        payload = le[:, ::-1].tobytes()
    else:
        payload = pcm.astype(">i%d" % (bits // 8)).tobytes()

    ch = p.channel_count
    frames = len(samples) // ch
    if len(payload) + 64 > 0xFFFFFFFF:
        raise ValueError(EncoderError.BufferTooBig.name)

    out = bytearray()
    out += b"FORM\x00\x00\x00\x00AIFF"
    out += b"COMM" + struct.pack(">IhIh", 18, ch, frames, bits) + _f80(
        d.sample_rate)
    out += b"SSND" + struct.pack(">III", len(payload) + 8, 0, 0)
    out += payload
    if len(payload) & 1:
        out += b"\x00"
    struct.pack_into(">I", out, 4, len(out) - 8)
    return bytes(out)


def encode_aiff_to_disk(p: EncoderParams, d: AudioData, path: str) -> int:
    """AIFF analog of encode_wav_to_disk: returns an EncoderError code."""
    try:
        buf = encode_aiff_to_buffer(p, d)
    except ValueError as e:
        return int(EncoderError[str(e)])
    try:
        with open(path, "wb") as f:
            f.write(buf)
    except OSError:
        return int(EncoderError.FileIOError)
    return int(EncoderError.NoError)


def encode_opus_to_buffer(p: EncoderParams, d: AudioData,
                          bitrate_kbps: int = 96,
                          frame_ms: float = 20,
                          mode: str = "celt",
                          bandwidth: str = "wb",
                          dtx: bool = False,
                          fec: bool = False) -> bytes:
    """Encode AudioData to Ogg Opus.

    mode="celt" (default): CELT-only fullband frames of 2.5/5/10/20 ms.
    mode="silk": SILK-only 20 ms frames (mono or stereo mid/side with
    per-frame stereo prediction) — the speech coding half of Opus
    (reference: silk/enc_API.c, stereo_LR_to_MS.c); rate follows the
    signal (closed-loop VBR), bitrate_kbps is ignored.  bandwidth
    picks the SILK internal rate: "nb" (8 kHz), "mb" (12 kHz) or "wb"
    (16 kHz, default); frame_ms 10/20/40/60 — 40/60 ms packets carry
    2/3 conditionally-coded SILK frames (TOC configs 0-3/4-7/8-11).
    dtx=True emits TOC-only packets through silent stretches with a
    ~400 ms refresh (OPUS_SET_DTX) — SILK mono and CELT mode; CELT
    reactivation frames are forced intra so the energy prediction
    resyncs exactly.  fec=True (SILK 20 ms, mono or stereo) adds in-band LBRR:
    each packet re-encodes the previous frame at coarser gains so a
    lost packet recovers from the next one
    (decode_packet(next, fec=True) or libopus decode_fec=1).
    mode="hybrid": SILK low band + CELT from 8 kHz up in one shared
    range coder per packet (mono or stereo, frame_ms 10/20,
    bandwidth "swb"/"fb" — the four hybrid TOC configs 12-15;
    reference: opus_encoder.c hybrid path).  The SILK half is VBR-uncontrolled,
    so the total rate may exceed bitrate_kbps on busy content.
    mode="auto": per-segment automatic celt/silk/hybrid selection from
    an original speech/music analysis (formats/opus/analysis.py — the
    reference's analysis.c + mode machinery surface, re-designed; its
    trained MLP weights are data we must not copy).  20 ms frames;
    frame_ms/bandwidth are ignored.

    The reference declares this API but ships no implementation
    (Encoders.h:40); both modes are working encoders validated against
    our decoder and the reference's own libopus/opusfile decoders
    (SILK: bit-identical output between the two). Non-48 kHz input is
    resampled with the polyphase SRC first, per the header's
    "re-formatted to satisfy the Ogg/Opus spec" contract.
    """
    if d.samples is None or len(d.samples) == 0:
        raise ValueError(EncoderError.InsufficientSampleData.name)
    if not np.isfinite(np.asarray(d.samples)).all():
        # NaN/Inf input would otherwise surface as foreign numerical
        # exceptions deep in the analysis (typed-error policy)
        raise ValueError(EncoderError.InsufficientSampleData.name)
    ch = d.channel_count
    if p.channel_count != ch:
        if ch == 2 and p.channel_count == 1:
            mono = 0.5 * (np.asarray(d.samples[0::2])
                          + np.asarray(d.samples[1::2]))
            samples, ch = mono.astype(np.float32), 1
        else:
            raise ValueError(EncoderError.UnsupportedChannelMix.name)
    else:
        samples = np.asarray(d.samples, np.float32)
    if ch not in (1, 2):
        raise ValueError(EncoderError.UnsupportedChannelConfiguration.name)
    rate = d.sample_rate
    if rate != 48000:
        per = samples.reshape(-1, ch).T
        from .ops.src import resample

        per = np.asarray(resample(per, rate, 48000))
        samples = per.T.reshape(-1).astype(np.float32)
    if mode == "auto":
        # Automatic per-segment celt/silk/hybrid selection — the
        # analysis.c + opus_encoder.c mode machinery, original design
        # (reference: third_party/opus/libopus/src/analysis.c;
        # src/OpusDependencies.c:246-256 compiles it).  Segments are
        # runs of equal mode on a 20 ms grid with hysteresis + dwell.
        from .formats.opus.analysis import encode_ogg_opus_auto

        return encode_ogg_opus_auto(samples, ch,
                                    bitrate_kbps=bitrate_kbps,
                                    dtx=dtx, fec=fec)
    if mode == "silk":
        if ch == 2:
            from .formats.opus.silk_encoder import (
                encode_ogg_opus_silk_stereo)

            return encode_ogg_opus_silk_stereo(samples, 48000,
                                               bandwidth=bandwidth,
                                               frame_ms=int(frame_ms),
                                               lbrr=fec)
        from .formats.opus.silk_encoder import encode_ogg_opus_silk

        return encode_ogg_opus_silk(samples, 48000, bandwidth=bandwidth,
                                    frame_ms=int(frame_ms), dtx=dtx,
                                    lbrr=fec)
    if mode == "hybrid":
        from .formats.opus.hybrid_encoder import encode_ogg_opus_hybrid

        return encode_ogg_opus_hybrid(
            samples, 48000, bitrate_kbps, channels=ch,
            frame_ms=int(frame_ms),
            bandwidth=bandwidth if bandwidth in ("swb", "fb") else "fb")
    from .formats.opus.celt_encoder import encode_ogg_opus

    return encode_ogg_opus(samples, ch, 48000, bitrate_kbps,
                           frame_ms=frame_ms, dtx=dtx)


def encode_opus_multistream_to_buffer(p: EncoderParams, d: AudioData,
                                      bitrate_kbps: int | None = None,
                                      frame_ms: float = 20) -> bytes:
    """Encode 1-8 channel AudioData to Ogg Opus with channel mapping
    family 1 (the reference's surround encoder surface,
    opus_multistream_encoder.c + RFC 7845 §5.1.1.2).  Channels in
    Vorbis surround order; bitrate_kbps is the TOTAL target (default
    48 kbps/channel).  Output decodes through our multistream decoder
    and the reference's own opusfile (validated to float32 noise)."""
    if d.samples is None or len(d.samples) == 0:
        raise ValueError(EncoderError.InsufficientSampleData.name)
    if not np.isfinite(np.asarray(d.samples)).all():
        raise ValueError(EncoderError.InsufficientSampleData.name)
    ch = d.channel_count
    if not 1 <= ch <= 8:
        raise ValueError(EncoderError.UnsupportedChannelConfiguration.name)
    samples = np.asarray(d.samples, np.float32)
    rate = d.sample_rate
    if rate != 48000:
        per = samples.reshape(-1, ch).T
        from .ops.src import resample

        per = np.asarray(resample(per, rate, 48000))
        samples = per.T.reshape(-1).astype(np.float32)
    from .formats.opus.celt_encoder import encode_ogg_opus_multistream

    return encode_ogg_opus_multistream(samples, ch, 48000, bitrate_kbps,
                                       frame_ms=frame_ms)


def encode_opus_to_disk(p: EncoderParams, d: AudioData, path: str) -> int:
    """Reference signature (Encoders.h:40): returns an EncoderError code."""
    try:
        buf = encode_opus_to_buffer(p, d)
    except ValueError as e:
        if str(e) in EncoderError.__members__:
            return int(EncoderError[str(e)])
        raise
    try:
        with open(path, "wb") as f:
            f.write(buf)
    except OSError:
        return int(EncoderError.FileIOError)
    return int(EncoderError.NoError)
