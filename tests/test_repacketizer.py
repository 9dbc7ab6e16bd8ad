"""Opus repacketizer vs the reference libopus repacketizer.

Golden hex lines in tests/golden/repacketizer_oracle.txt were produced
by tools/repacketizer_golden.c driving the reference's own
opus_repacketizer_* / opus_packet_pad / opus_packet_unpad
(third_party/opus/libopus/src/repacketizer.c) over the golden packet
corpus — every output here is compared bit-exact against that.
"""

import pathlib
import struct

import numpy as np
import pytest

from libnyquist_tpu.errors import DecodeError
from libnyquist_tpu.formats.opus.packet import parse_packet
from libnyquist_tpu.formats.opus.repacketizer import (
    Repacketizer, packet_pad, packet_unpad)

HERE = pathlib.Path(__file__).parent


def _packets():
    raw = (HERE / "golden" / "opus_packets.bin").read_bytes()
    pos = 4
    ch, sr, n_packets, frame = struct.unpack_from("<4i", raw, pos)
    pos += 16
    pkts = []
    for _ in range(24):
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        pkts.append(raw[pos : pos + ln])
        pos += ln
    return pkts


def _oracle():
    text = (HERE / "golden" / "repacketizer_oracle.txt").read_text()
    return dict(line.split(None, 1) for line in text.splitlines() if line)


def test_merge_matches_reference():
    pkts, oracle = _packets(), _oracle()
    for g in range(0, 12, 3):
        rp = Repacketizer()
        for i in range(3):
            rp.cat(pkts[g + i])
        assert rp.nb_frames == 3
        assert rp.out().hex() == oracle[f"merge{g}"].strip()


def test_pad_unpad_matches_reference():
    pkts, oracle = _packets(), _oracle()
    padded = packet_pad(pkts[0], len(pkts[0]) + 37)
    assert padded.hex() == oracle["pad0"].strip()
    assert packet_unpad(padded).hex() == oracle["unpad0"].strip()


def test_out_range_matches_reference():
    pkts, oracle = _packets(), _oracle()
    rp = Repacketizer()
    for i in range(3):
        rp.cat(pkts[i])
    assert rp.out(1, 3).hex() == oracle["range13"].strip()


def test_merged_packet_decodes_identically():
    """A merged code-3 packet must decode exactly like its parts."""
    from libnyquist_tpu.formats.opus.decoder import OpusDecoder

    pkts = _packets()
    rp = Repacketizer()
    for i in range(3):
        rp.cat(pkts[i])
    merged = rp.out()

    d1 = OpusDecoder(channels=2)
    a = np.concatenate([d1.decode_packet(p) for p in pkts[:3]])
    d2 = OpusDecoder(channels=2)
    b = d2.decode_packet(merged)
    assert a.shape == b.shape
    assert np.array_equal(a, b)


def test_frames_survive_round_trip():
    pkts = _packets()
    rp = Repacketizer()
    for p in pkts[:3]:
        rp.cat(p)
    back = parse_packet(rp.out())
    orig = [f for p in pkts[:3] for f in parse_packet(p).frames]
    assert back.frames == orig


def test_toc_mismatch_and_overflow_rejected():
    pkts = _packets()
    rp = Repacketizer()
    rp.cat(pkts[0])
    bad = bytes([pkts[0][0] ^ 0x80]) + pkts[0][1:]
    with pytest.raises(DecodeError):
        rp.cat(bad)
    rp = Repacketizer()
    with pytest.raises(DecodeError):  # 7 x 20 ms > 120 ms
        for _ in range(7):
            rp.cat(pkts[0])
    with pytest.raises(DecodeError):
        packet_pad(pkts[0], len(pkts[0]) - 1)
