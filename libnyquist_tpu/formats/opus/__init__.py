"""Ogg Opus decoding: container + multistream + trimming.

Equivalent of the reference's OpusDecoder glue + opusfile slice
(reference: src/OpusDecoder.cpp:44-122, third_party/opus/opusfile:
op_read_float :2911, op_head/op_pcm_total :1741/:1711) and the
multistream channel mapping (libopus/src/opus_multistream_decoder.c:184).
Output: interleaved float32 at 48 kHz, like the reference (fixed 48 kHz,
OpusDecoder.cpp:75-84).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import List

import numpy as np

from ...audio_data import AudioData, PCMFormat
from ...errors import DecodeError
from .. import ogg
from .decoder import OpusDecoder
from .repacketizer import Repacketizer, packet_pad, packet_unpad  # noqa: F401


@dataclass
class OpusHead:
    version: int
    channels: int
    pre_skip: int
    input_rate: int
    output_gain_q8: int
    mapping_family: int
    stream_count: int
    coupled_count: int
    mapping: List[int]


def parse_opus_head(data: bytes) -> OpusHead:
    if not data.startswith(b"OpusHead") or len(data) < 19:
        raise DecodeError("bad OpusHead")
    version = data[8]
    channels = data[9]
    pre_skip = struct.unpack_from("<H", data, 10)[0]
    input_rate = struct.unpack_from("<I", data, 12)[0]
    output_gain = struct.unpack_from("<h", data, 16)[0]
    family = data[18]
    if family == 0:
        if channels > 2:
            raise DecodeError("mapping family 0 allows at most 2 channels")
        streams, coupled = 1, channels - 1
        mapping = list(range(channels))
    else:
        if len(data) < 21 + channels:
            raise DecodeError("truncated OpusHead channel mapping")
        streams = data[19]
        coupled = data[20]
        mapping = list(data[21 : 21 + channels])
    return OpusHead(
        version=version,
        channels=channels,
        pre_skip=pre_skip,
        input_rate=input_rate,
        output_gain_q8=output_gain,
        mapping_family=family,
        stream_count=streams,
        coupled_count=coupled,
        mapping=mapping,
    )


class OpusMultistreamDecoder:
    """N elementary streams -> mapped output channels
    (reference: opus_multistream_decoder.c:184-404)."""

    def __init__(self, head: OpusHead):
        self.head = head
        self.decoders = []
        for s in range(head.stream_count):
            ch = 2 if s < head.coupled_count else 1
            dec = OpusDecoder(ch)
            dec.decode_gain = head.output_gain_q8
            self.decoders.append(dec)

    def decode_packet(self, data) -> np.ndarray:
        head = self.head
        if data is None:
            # Packet loss: conceal every elementary stream.
            outs = [d.decode_packet(None) for d in self.decoders]
            n = outs[0].shape[0]
            result = np.zeros((n, head.channels))
            for c, m in enumerate(head.mapping):
                if m == 255:
                    continue
                if m < 2 * head.coupled_count:
                    result[:, c] = outs[m >> 1][:, m & 1]
                else:
                    result[:, c] = outs[
                        head.coupled_count + (m - 2 * head.coupled_count)
                    ][:, 0]
            return result
        # Split the multistream packet: self-delimited for all but last.
        frames_per_stream = []
        pos = 0
        for s in range(head.stream_count):
            last = s == head.stream_count - 1
            if last:
                seg = data[pos:]
                pos = len(data)
            else:
                seg, pos = self._undelimit(data, pos)
            frames_per_stream.append(seg)
        outs = [
            self.decoders[s].decode_packet(frames_per_stream[s])
            for s in range(head.stream_count)
        ]
        n = outs[0].shape[0]
        chans = []
        for s, out in enumerate(outs):
            if out.shape[0] != n:
                raise DecodeError("stream length mismatch in multistream")
        result = np.zeros((n, head.channels))
        for c, m in enumerate(head.mapping):
            if m == 255:
                continue
            if m < 2 * head.coupled_count:
                result[:, c] = outs[m >> 1][:, m & 1]
            else:
                result[:, c] = outs[head.coupled_count + (m - 2 * head.coupled_count)][:, 0]
        return result

    @staticmethod
    def _undelimit(data: bytes, pos: int):
        """Strip RFC 6716 Appendix B self-delimited framing.

        Returns (undelimited_packet_bytes, next_pos). Self-delimited
        packets carry one extra frame-length field (the otherwise-implicit
        last-frame size); reconstruct the equivalent undelimited packet
        for the standard packet parser.
        """
        if pos >= len(data):
            raise DecodeError("truncated multistream packet")
        toc = data[pos]
        code = toc & 0x3

        def parse_size(p):
            if p >= len(data):
                raise DecodeError("truncated multistream packet")
            b = data[p]
            p += 1
            if b < 252:
                return b, p
            if p >= len(data):
                raise DecodeError("truncated multistream packet")
            return 4 * data[p] + b, p + 1

        p = pos + 1
        if code == 0:
            size, p = parse_size(p)  # extra field: the single frame's size
            end = p + size
            pkt = bytes([toc]) + data[p:end]
            return pkt, end
        if code == 1:
            size, p = parse_size(p)  # extra field: per-frame size
            end = p + 2 * size
            pkt = bytes([toc]) + data[p:end]
            return pkt, end
        if code == 2:
            sz_field_start = p
            s1, p = parse_size(p)
            s2, p = parse_size(p)   # extra field: second frame's size
            end = p + s1 + s2
            pkt = bytes([toc]) + data[sz_field_start:sz_field_start + (
                1 if s1 < 252 else 2)] + data[p:end]
            return pkt, end
        # code 3
        hdr_start = p
        ch = data[p]
        p += 1
        count = ch & 0x3F
        if count <= 0:
            raise DecodeError("invalid multistream frame count")
        padding = 0
        while_pad_start = p
        if ch & 0x40:
            while True:
                b = data[p]
                p += 1
                padding += b if b < 255 else 254
                if b != 255:
                    break
        pad_bytes = data[while_pad_start:p]
        if ch & 0x80:  # VBR: all `count` sizes present (extra = last one)
            size_fields_start = p
            sizes = []
            for _ in range(count):
                sz, p = parse_size(p)
                sizes.append(sz)
            # Undelimited keeps only the first count-1 size fields.
            q = size_fields_start
            for _ in range(count - 1):
                _, q = parse_size(q)
            kept_fields = data[size_fields_start:q]
            frames_start = p
            total = sum(sizes)
            end = frames_start + total + padding
            pkt = (
                bytes([toc, ch])
                + pad_bytes
                + kept_fields
                + data[frames_start : frames_start + total]
                + data[frames_start + total : end]  # padding bytes
            )
            return pkt, end
        # CBR: one size field (extra; undelimited CBR has none)
        sz, p = parse_size(p)
        frames_start = p
        total = sz * count
        end = frames_start + total + padding
        pkt = (
            bytes([toc, ch])
            + pad_bytes
            + data[frames_start : frames_start + total]
            + data[frames_start + total : end]
        )
        return pkt, end


def _decode_celt_only_pipeline(st, head, device=False):
    """Fast path: single-stream CELT-only files go through the batched
    synthesis pipeline (host entropy decode + batched IMDCT/comb/deemph)
    instead of per-frame host synthesis. device=False runs the NumPy/BLAS
    variant (default for file loads); device=True the TPU one.
    Returns pcm [n, channels] or None when the stream doesn't qualify.
    """
    from .celt import (
        CeltDecoderState, celt_decode_frame_to_freq,
        celt_decode_stream_native,
    )
    from .decoder import _endband_for_bandwidth
    from .packet import MODE_CELT_ONLY, parse_packet

    pkts = []
    for pkt in st.packets[2:]:
        if len(pkt.data) == 0:
            continue
        try:
            parsed = parse_packet(pkt.data)
        except Exception:
            return None
        if (parsed.mode != MODE_CELT_ONLY
                or parsed.stream_channels != head.channels
                or parsed.frame_size < 120):
            return None
        pkts.append(parsed)
    if not pkts:
        return None

    cs = CeltDecoderState(channels=head.channels)

    # Whole-stream native entropy decode: one C call for all frames.
    frames, sizes, ends, chs = [], [], [], []
    for parsed in pkts:
        eb = _endband_for_bandwidth(parsed.bandwidth)
        for fr in parsed.frames:
            frames.append(fr)
            sizes.append(parsed.frame_size)
            ends.append(eb)
            chs.append(parsed.stream_channels)
    infos = celt_decode_stream_native(cs, frames, sizes, ends, chs)

    if infos is None:  # native lib unavailable: per-frame fallback
        infos = []
        for parsed in pkts:
            cs.end = _endband_for_bandwidth(parsed.bandwidth)
            cs.stream_channels = parsed.stream_channels
            for fr in parsed.frames:
                infos.append(
                    celt_decode_frame_to_freq(cs, fr, parsed.frame_size)
                )

    from ...runtime.opus_pipeline import (
        synthesize_stream, synthesize_stream_host,
    )

    synth = synthesize_stream if device else synthesize_stream_host
    pcm = np.asarray(synth(infos, head.channels), np.float64)
    if head.output_gain_q8:
        pcm = pcm * (10.0 ** (head.output_gain_q8 / (20.0 * 256.0)))
    return pcm


def _decode_celt_multistream_pipeline(st, head):
    """Batched fast path for family-1 multistream CELT-only files: each
    elementary stream runs the whole-stream native entropy decode, then
    ALL streams synthesize together through the batched serving path
    (grouped by channel count), and the mapping table assembles output
    channels.  Returns pcm [n, channels] or None (caller falls back)."""
    from ...runtime.opus_pipeline import synthesize_stream_host
    from .celt import CeltDecoderState, celt_decode_stream_native
    from .decoder import _endband_for_bandwidth
    from .packet import MODE_CELT_ONLY, parse_packet

    S = head.stream_count
    per_stream = [[] for _ in range(S)]     # parsed packets per stream
    for pkt in st.packets[2:]:
        if len(pkt.data) == 0:
            continue
        pos = 0
        try:
            for s in range(S):
                if s == S - 1:
                    seg = pkt.data[pos:]
                    pos = len(pkt.data)
                else:
                    seg, pos = OpusMultistreamDecoder._undelimit(
                        pkt.data, pos)
                parsed = parse_packet(seg)
                if parsed.mode != MODE_CELT_ONLY:
                    return None
                per_stream[s].append(parsed)
        except Exception:
            return None
    if not per_stream[0]:
        return None
    fsz0 = [p.frame_size for p in per_stream[0]]
    for s in range(1, S):
        if [p.frame_size for p in per_stream[s]] != fsz0:
            return None

    infos_per_stream = []
    for s in range(S):
        ch = 2 if s < head.coupled_count else 1
        cs = CeltDecoderState(channels=ch)
        frames, sizes, ends, chs = [], [], [], []
        for parsed in per_stream[s]:
            eb = _endband_for_bandwidth(parsed.bandwidth)
            for fr in parsed.frames:
                frames.append(fr)
                sizes.append(parsed.frame_size)
                ends.append(eb)
                chs.append(parsed.stream_channels)
        infos = celt_decode_stream_native(cs, frames, sizes, ends, chs)
        if infos is None:
            return None
        infos_per_stream.append(infos)

    # whole-stream batched synthesis per elementary stream (BLAS host
    # path, like single-stream file loads; the device serving route
    # stays opt-in because it only wins when the accelerator is local)
    outs = [None] * S
    for s in range(S):
        ch = 2 if s < head.coupled_count else 1
        try:
            pcm = synthesize_stream_host(infos_per_stream[s], ch)
        except Exception:
            return None
        outs[s] = np.asarray(pcm, np.float64)

    n = min(o.shape[0] for o in outs)
    result = np.zeros((n, head.channels))
    for c, m in enumerate(head.mapping):
        if m == 255:
            continue
        if m < 2 * head.coupled_count:
            result[:, c] = outs[m >> 1][:n, m & 1]
        else:
            result[:, c] = outs[
                head.coupled_count + (m - 2 * head.coupled_count)][:n, 0]
    if head.output_gain_q8:
        result = result * (10.0 ** (head.output_gain_q8 / (20.0 * 256.0)))
    return result


def _decode_via_native_scan(data: bytes):
    """Fastest load path: one C pass demuxes + TOC-splits the whole file
    (native/ogg_opus.c), one C call entropy-decodes every CELT frame,
    and the whole-stream BLAS synthesis runs once.  Returns
    (pcm, head) or None when the stream needs the general path
    (SILK/hybrid, multistream, lost pages, chained files, native lib
    unavailable, or explicit routing flags)."""
    import os

    if (os.environ.get("LIBNYQUIST_OPUS_FRAME_SYNTH")
            or os.environ.get("LIBNYQUIST_OPUS_PIPELINE")):
        return None
    from ...runtime.opus_pipeline import synthesize_stream_host
    from .celt import (
        CeltDecoderState, _raw_to_infos, celt_decode_ogg_raw,
        celt_scan_ogg_native,
    )

    scan = celt_scan_ogg_native(data)
    if scan is None:
        return None
    info = scan[6]
    channels = int(info[0])
    if channels not in (1, 2):
        return None
    st = ogg_state = CeltDecoderState(channels=channels)
    out = celt_decode_ogg_raw(ogg_state, data)
    if out is None:
        return None
    raw, scan_info = out[:8], out[8]
    infos = _raw_to_infos(st, raw)
    if not infos:
        return None
    pcm = np.asarray(synthesize_stream_host(infos, channels), np.float64)
    gain_q8 = int(scan_info[3])
    if gain_q8:
        pcm = pcm * (10.0 ** (gain_q8 / (20.0 * 256.0)))
    start = int(scan_info[1])               # preskip
    end_granule = int(scan_info[7])
    end = min(pcm.shape[0], end_granule) if end_granule >= 0 \
        else pcm.shape[0]
    pcm = pcm[start:end]
    head = OpusHead(
        version=1, channels=channels, pre_skip=start,
        input_rate=int(scan_info[2]), output_gain_q8=gain_q8,
        mapping_family=int(scan_info[4]), stream_count=1,
        coupled_count=channels - 1, mapping=list(range(channels)),
    )
    return pcm, head


def decode_ogg_opus(data: bytes):
    """Full Ogg Opus decode -> (float64 [n, channels], head).

    Chained files (sequential links, each its own serial + OpusHead)
    decode link by link and concatenate, like opusfile's op_read loop
    across links; later links must keep the first link's channel count
    (our facade returns one fixed layout, reference OpusDecoder.cpp
    likewise reads a single AudioData shape)."""
    streams = ogg.demux(data)
    links = [s for s in streams.values()
             if s.packets and s.packets[0].data.startswith(b"OpusHead")]
    if len(links) > 1:
        first_pcm, head = _decode_one_link(data, links[0])
        chunks = [first_pcm]
        for link in links[1:]:
            try:
                pcm_l, head_l = _decode_one_link(None, link)
            except DecodeError:
                break
            if head_l.channels != head.channels:
                break
            chunks.append(pcm_l)
        return np.concatenate(chunks, axis=0), head
    return _decode_one_link(data, links[0] if links else None)


def _decode_one_link(data, st):
    """Decode one logical Opus stream (link).  data is the raw file for
    the first link (enables the whole-native fast path) or None."""
    if data is not None:
        fast = _decode_via_native_scan(data)
        if fast is not None:
            return fast
    if st is None:
        raise DecodeError("no Opus stream found in Ogg container")
    head = parse_opus_head(st.packets[0].data)
    if head.version >> 4 != 0:
        raise DecodeError("unsupported OpusHead version")
    end_granule = None
    for pkt in st.packets[2:]:
        if pkt.granule_pos >= 0:
            end_granule = pkt.granule_pos

    # Single-stream CELT-only files default to the batched host (BLAS)
    # pipeline; the device pipeline (the multi-stream serving route,
    # runtime/serving.py) stays opt-in for single-file loads since it
    # only wins when the accelerator is local.
    pcm = None
    has_hole = any(p.hole for p in st.packets)
    if (head.stream_count > 1 and head.mapping_family == 1
            and not has_hole):
        pcm = _decode_celt_multistream_pipeline(st, head)
    if pcm is None and (head.stream_count == 1
                        and head.coupled_count in (0, 1)
                        and not has_hole):
        import os

        if os.environ.get("LIBNYQUIST_OPUS_PIPELINE"):
            pcm = _decode_celt_only_pipeline(st, head, device=True)
        elif not os.environ.get("LIBNYQUIST_OPUS_FRAME_SYNTH"):
            pcm = _decode_celt_only_pipeline(st, head)

    if pcm is None:
        # general path: per-packet decode (SILK/hybrid/transitions/PLC)
        from .packet import parse_packet as _pp

        ms = OpusMultistreamDecoder(head)
        chunks = []
        last_gran = None
        for pkt in st.packets[2:]:
            if pkt.hole:
                # Lost pages precede this packet (opusfile: OP_HOLE).
                # Size the concealment from the granule jump when both
                # endpoints are known; else conceal one packet duration.
                missing = None
                if last_gran is not None and pkt.granule_pos >= 0:
                    try:
                        pp = _pp(pkt.data)
                        cur = pp.frame_size * len(pp.frames)
                        missing = min(
                            pkt.granule_pos - last_gran - cur,
                            48000 * 10,  # cap runaway granule jumps
                        )
                    except Exception:
                        missing = None
                if missing is None:
                    chunks.append(ms.decode_packet(None))
                else:
                    while missing > 0:
                        c = ms.decode_packet(None)
                        if c.shape[0] <= 0:
                            break
                        chunks.append(c[:missing])
                        missing -= c.shape[0]
            if pkt.granule_pos >= 0:
                last_gran = pkt.granule_pos
            if len(pkt.data) == 0:
                continue
            chunks.append(ms.decode_packet(pkt.data))
        if not chunks:
            return np.zeros((0, head.channels)), head
        pcm = np.concatenate(chunks, axis=0)
    # Trim: drop pre-skip, honor final granule position (opusfile
    # op_pcm_total semantics).
    start = head.pre_skip
    if end_granule is not None:
        end = min(pcm.shape[0], end_granule)
    else:
        end = pcm.shape[0]
    pcm = pcm[start:end]
    return pcm, head


def decode_opus_buffer(data: bytes, audio: AudioData) -> None:
    pcm, head = decode_ogg_opus(data)
    audio.channel_count = head.channels
    audio.sample_rate = 48000  # fixed like the reference (OpusDecoder.cpp:75)
    audio.source_format = PCMFormat.PCM_FLT
    audio.samples = np.ascontiguousarray(
        pcm.reshape(-1), dtype=np.float32
    )
    audio.length_seconds = pcm.shape[0] / 48000.0
