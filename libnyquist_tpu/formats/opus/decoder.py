"""Top-level Opus decoder: SILK/CELT/hybrid mode dispatch per packet.

Equivalent of opus_decode_native / opus_decode_frame (reference:
third_party/opus/libopus/src/opus_decoder_clean.c:210-723). Host-side
orchestration; the dense synthesis inside the CELT path is shared with the
TPU pipeline. decode_packet(None) conceals one lost packet: noise-mode
CELT PLC (upstream celt_decoder.c:351 celt_decode_lost; the fork's clean
variant stripped it) or waveform-fade concealment for SILK/hybrid.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from ...errors import DecodeError
from .celt import (
    CeltDecoderState,
    celt_decode_frame,
    mode48000,
)
from .packet import (
    BW_MEDIUMBAND,
    BW_NARROWBAND,
    BW_SUPERWIDEBAND,
    BW_WIDEBAND,
    MODE_CELT_ONLY,
    MODE_HYBRID,
    MODE_SILK_ONLY,
    parse_packet,
)
from .range_coder import RangeDecoder


def _endband_for_bandwidth(bw: int) -> int:
    if bw == BW_NARROWBAND:
        return 13
    if bw in (BW_MEDIUMBAND, BW_WIDEBAND):
        return 17
    if bw == BW_SUPERWIDEBAND:
        return 19
    return 21


def smooth_fade(in1, in2, out, overlap, channels, window, Fs):
    """Crossfade via squared window (reference: opus_decoder_clean.c:85-105)."""
    inc = 48000 // Fs
    for c in range(channels):
        for i in range(overlap):
            w = window[i * inc] * window[i * inc]
            out[i * channels + c] = (
                w * in2[i * channels + c]
                + (1.0 - w) * in1[i * channels + c]
            )


class OpusDecoder:
    """Single-stream Opus decoder producing 48 kHz float PCM."""

    def __init__(self, channels: int, Fs: int = 48000):
        if channels not in (1, 2):
            raise DecodeError("opus supports 1 or 2 channels per stream")
        if Fs != 48000:
            raise DecodeError("TPU rebuild decodes at 48 kHz (resample after)")
        self.Fs = Fs
        self.channels = channels
        self.celt = CeltDecoderState(channels=channels)
        self.silk = None  # created lazily (silk.SilkDecoder)
        self.prev_mode = 0
        self.prev_redundancy = False
        self.stream_channels = channels
        self.bandwidth = 0
        self.mode = 0
        self.frame_size = 0
        self.decode_gain = 0  # Q8 dB (OPUS_SET_GAIN)
        self.rangeFinal = 0
        self.loss_count = 0        # consecutive concealed packets
        self._last_pcm = None      # last decoded frame (for SILK PLC)

    # -- public API ---------------------------------------------------------
    def decode_packet(self, data: Optional[bytes],
                      fec: bool = False) -> np.ndarray:
        """Decode one packet -> [samples, channels] float64 at 48 kHz.
        data=None (or empty) requests packet-loss concealment for one
        packet duration (reference: opus_decode with data==NULL).

        fec=True recovers the PREVIOUS (lost) frame from this packet's
        in-band LBRR data (opus_decode(..., decode_fec=1)); SILK-only
        packets carrying LBRR, one 20 ms frame.  Requires the Python
        SILK decoder (set LIBNYQUIST_NO_NATIVE_SILK=1 or build the
        decoder with it); raises the typed error when the packet has
        no LBRR."""
        if fec:
            return self._decode_fec(data)
        if data is None or len(data) == 0:
            out = self._conceal_packet(self.frame_size or 960)
            self.loss_count += 1
            self._last_pcm = out
            return out
        pkt = parse_packet(data)
        self.mode = pkt.mode
        self.bandwidth = pkt.bandwidth
        self.frame_size = pkt.frame_size
        self.stream_channels = pkt.stream_channels
        outs = [self._decode_frame(fr, pkt.frame_size) for fr in pkt.frames]
        self.loss_count = 0
        out = np.concatenate(outs, axis=0)
        self._last_pcm = out
        return out

    def _decode_fec(self, data: Optional[bytes]) -> np.ndarray:
        from . import silk as silk_mod
        from .range_coder import RangeDecoder

        if not data:
            raise DecodeError("FEC recovery needs the next packet")
        pkt = parse_packet(data)
        if pkt.mode != MODE_SILK_ONLY:
            raise DecodeError("in-band FEC lives in SILK packets")
        if self.silk is None or not isinstance(self.silk,
                                               silk_mod.SilkDecoder):
            # FEC runs on the Python decoder's channel state; start a
            # fresh one when the native plane (opaque state) is active
            self.silk = silk_mod.SilkDecoder(self.channels)
        if self.bandwidth == BW_NARROWBAND:
            internal_rate = 8000
        elif self.bandwidth == BW_MEDIUMBAND:
            internal_rate = 12000
        else:
            internal_rate = 16000
        payload_ms = max(10, 1000 * pkt.frame_size // self.Fs)
        dec = RangeDecoder(pkt.frames[0])
        out = self.silk.decode(
            dec, n_channels_internal=self.stream_channels or 1,
            internal_rate=internal_rate, payload_ms=payload_ms,
            total_ms=1000 * pkt.frame_size // self.Fs, fec=True)
        out = np.asarray(out, np.float64) / 32768.0
        if out.shape[1] != self.channels:
            out = (np.repeat(out[:, :1], self.channels, axis=1)
                   if out.shape[1] < self.channels else
                   out[:, : self.channels])
        self._last_pcm = out
        self.loss_count = 0
        return out

    def _conceal_packet(self, frame_size: int) -> np.ndarray:
        """Packet-loss concealment for one frame duration.

        CELT streams: spectral noise-mode PLC (celt_decode_lost) — the
        TDAC overlap memory keeps the splice clickless and repeated
        losses decay to the background noise floor.  SILK/hybrid:
        waveform repetition with decay and a 2.5 ms raised-cosine
        crossfade (the reference's silk/PLC.c LPC extrapolation is not
        reproduced; scope documented in README)."""
        channels = self.channels
        if self.prev_mode == 0 or self._last_pcm is None:
            return np.zeros((frame_size, channels))
        if self.prev_mode == MODE_CELT_ONLY:
            from .celt import celt_decode_lost

            return celt_decode_lost(self.celt, frame_size, self.loss_count)
        if (self.prev_mode == MODE_SILK_ONLY and self.silk is not None
                and hasattr(self.silk, "conceal")):
            # reference opus_decode(NULL): decode_frame PLC path
            return self._decode_frame(None, frame_size)
        # hybrid (or Python SILK fallback): repeat + fade the last output
        F2_5 = self.Fs // 400
        last = self._last_pcm
        reps = int(np.ceil(frame_size / max(len(last), 1)))
        tiled = np.tile(last, (reps, 1))[:frame_size]
        gain = 0.8 * (0.6 ** self.loss_count)
        out = tiled * gain
        # decay within the frame too, so long losses fade to silence
        ramp = np.linspace(1.0, 0.8, frame_size)[:, None]
        out = out * ramp
        # crossfade the splice against a copy of the frame tail
        n = min(F2_5, frame_size)
        w = 0.5 - 0.5 * np.cos(np.pi * (np.arange(n) + 0.5) / n)
        out[:n] = (w[:, None] * out[:n]
                   + (1.0 - w[:, None]) * last[-n:] * gain)
        return out

    # -- internals ----------------------------------------------------------
    def _decode_frame(self, data: Optional[bytes], frame_size: int):
        F20 = self.Fs // 50
        F10, F5, F2_5 = F20 // 2, F20 // 4, F20 // 8
        channels = self.channels

        if data is not None and len(data) <= 1:
            data = None
        if data is not None:
            audiosize = self.frame_size
            mode = self.mode
            dec = RangeDecoder(data)
            length = len(data)
        else:
            audiosize = frame_size
            mode = self.prev_mode
            length = 0
            if mode == 0:
                return np.zeros((audiosize, channels))
            if audiosize > F20:
                parts = []
                remaining = audiosize
                while remaining > 0:
                    n = min(remaining, F20)
                    parts.append(self._decode_frame(None, n))
                    remaining -= n
                return np.concatenate(parts, axis=0)
            if audiosize < F20:
                if audiosize > F10:
                    audiosize = F10
                elif mode != MODE_SILK_ONLY and F5 < audiosize < F10:
                    audiosize = F5
            if mode == MODE_CELT_ONLY:
                # CELT PLC (reference opus_decoder.c:528
                # celt_decode_with_ec(celt_dec, NULL, ...) ->
                # celt_decode_lost) — also the CELT->SILK/hybrid
                # transition frame (opus_decoder.c:471-476); an empty
                # range-decoder stream would decode silence instead of
                # extrapolating.
                from .celt import celt_decode_lost

                out = celt_decode_lost(self.celt, audiosize,
                                       self.loss_count)
                self.prev_mode = mode
                return out
            dec = RangeDecoder(b"")

        transition = False
        pcm_transition = None
        if (
            data is not None
            and self.prev_mode > 0
            and (
                (mode == MODE_CELT_ONLY and self.prev_mode != MODE_CELT_ONLY
                 and not self.prev_redundancy)
                or (mode != MODE_CELT_ONLY
                    and self.prev_mode == MODE_CELT_ONLY)
            )
        ):
            transition = True
            if mode == MODE_CELT_ONLY:
                pcm_transition = self._decode_frame(None, min(F5, audiosize))

        frame_size = audiosize

        # SILK half
        pcm_silk = None
        if mode != MODE_CELT_ONLY:
            from . import silk as silk_mod

            if self.silk is None or self.prev_mode == MODE_CELT_ONLY:
                self.silk = silk_mod.make_silk_decoder(self.channels)
            if mode == MODE_SILK_ONLY:
                if self.bandwidth == BW_NARROWBAND:
                    internal_rate = 8000
                elif self.bandwidth == BW_MEDIUMBAND:
                    internal_rate = 12000
                else:
                    internal_rate = 16000
            else:
                internal_rate = 16000
            payload_ms = max(10, 1000 * audiosize // self.Fs)
            if data is None and hasattr(self.silk, "conceal"):
                # lost frame: LPC/LTP extrapolation + comfort noise
                # (reference silk/PLC.c, CNG.c via silk_decode_lost)
                pcm_silk = self.silk.conceal(
                    n_channels_internal=self.stream_channels,
                    internal_rate=internal_rate,
                    payload_ms=payload_ms,
                    total_ms=1000 * frame_size // self.Fs,
                )
            else:
                pcm_silk = self.silk.decode(
                    dec,
                    n_channels_internal=self.stream_channels,
                    internal_rate=internal_rate,
                    payload_ms=payload_ms,
                    total_ms=1000 * frame_size // self.Fs,
                )  # int16-scaled float array [frame_size, channels]

        # Redundancy signaling
        redundancy = False
        celt_to_silk = 0
        redundancy_bytes = 0
        start_band = 0
        if (
            mode != MODE_CELT_ONLY
            and data is not None
            and dec.tell() + 17 + 20 * (1 if self.mode == MODE_HYBRID else 0)
            <= 8 * length
        ):
            if mode == MODE_HYBRID:
                redundancy = bool(dec.dec_bit_logp(12))
            else:
                redundancy = True
            if redundancy:
                celt_to_silk = dec.dec_bit_logp(1)
                if mode == MODE_HYBRID:
                    redundancy_bytes = dec.dec_uint(256) + 2
                else:
                    redundancy_bytes = length - ((dec.tell() + 7) >> 3)
                length -= redundancy_bytes
                if length * 8 < dec.tell():
                    length = 0
                    redundancy_bytes = 0
                    redundancy = False
                dec.storage -= redundancy_bytes

        if mode != MODE_CELT_ONLY:
            start_band = 17

        endband = _endband_for_bandwidth(self.bandwidth) if data is not None \
            else self.celt.end
        self.celt.end = endband
        self.celt.stream_channels = self.stream_channels

        if redundancy:
            transition = False

        if transition and mode != MODE_CELT_ONLY:
            pcm_transition = self._decode_frame(None, min(F5, audiosize))

        redundant_audio = None
        mode_obj = mode48000()
        window = mode_obj.window
        if redundancy and celt_to_silk:
            self.celt.start = 0
            redundant_audio = celt_decode_frame(
                self.celt, data[length : length + redundancy_bytes], F5
            )

        self.celt.start = start_band

        if mode != MODE_SILK_ONLY:
            celt_frame_size = min(F20, frame_size)
            if mode != self.prev_mode and self.prev_mode > 0 \
                    and not self.prev_redundancy:
                self.celt = CeltDecoderState(channels=self.channels)
                self.celt.end = endband
                self.celt.stream_channels = self.stream_channels
                self.celt.start = start_band
            if data is None:
                # hybrid PLC: the MDCT half extrapolates too
                # (reference opus_decoder.c:528 passes NULL through to
                # celt_decode_lost)
                from .celt import celt_decode_lost

                pcm = celt_decode_lost(self.celt, celt_frame_size,
                                       self.loss_count)
            else:
                pcm = celt_decode_frame(
                    self.celt, data[:length], celt_frame_size, dec=dec,
                )
            if celt_frame_size < frame_size:
                pcm = np.vstack(
                    [pcm, np.zeros((frame_size - celt_frame_size, channels))]
                )
        else:
            pcm = np.zeros((frame_size, channels))
            if self.prev_mode == MODE_HYBRID and not (
                redundancy and celt_to_silk and self.prev_redundancy
            ):
                self.celt.start = 0
                sil = celt_decode_frame(self.celt, b"\xff\xff", F2_5)
                pcm[:F2_5] = sil

        if mode != MODE_CELT_ONLY and pcm_silk is not None:
            pcm = pcm + pcm_silk[:frame_size] * (1.0 / 32768.0)

        if redundancy and not celt_to_silk:
            self.celt = CeltDecoderState(channels=self.channels)
            self.celt.end = endband
            self.celt.stream_channels = self.stream_channels
            self.celt.start = 0
            redundant_audio = celt_decode_frame(
                self.celt, data[length : length + redundancy_bytes], F5
            )
            # crossfade tail
            for c in range(channels):
                for i in range(F2_5):
                    w = window[i] * window[i]
                    pcm[frame_size - F2_5 + i, c] = (
                        w * redundant_audio[F2_5 + i, c]
                        + (1.0 - w) * pcm[frame_size - F2_5 + i, c]
                    )
        if redundancy and celt_to_silk:
            pcm[:F2_5] = redundant_audio[:F2_5]
            for c in range(channels):
                for i in range(F2_5):
                    w = window[i] * window[i]
                    pcm[F2_5 + i, c] = (
                        w * pcm[F2_5 + i, c]
                        + (1.0 - w) * redundant_audio[F2_5 + i, c]
                    )
        if transition and pcm_transition is not None:
            if audiosize >= F5:
                pcm[:F2_5] = pcm_transition[:F2_5]
                for c in range(channels):
                    for i in range(F2_5):
                        w = window[i] * window[i]
                        pcm[F2_5 + i, c] = (
                            w * pcm[F2_5 + i, c]
                            + (1.0 - w) * pcm_transition[F2_5 + i, c]
                        )
            else:
                for c in range(channels):
                    for i in range(F2_5):
                        w = window[i] * window[i]
                        pcm[i, c] = (
                            w * pcm[i, c]
                            + (1.0 - w) * pcm_transition[i, c]
                        )

        if self.decode_gain:
            gain = math.exp(
                0.6931471805599453094
                * (6.48814081e-4 * self.decode_gain)
            )
            pcm = pcm * gain

        self.rangeFinal = dec.rng if data is not None else 0
        self.prev_mode = mode
        self.prev_redundancy = redundancy and not celt_to_silk
        return pcm[:audiosize]
