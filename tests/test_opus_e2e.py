"""End-to-end Ogg Opus decode tests against the reference (opusfile) output.

Mirrors the reference's ctest suite (reference: CMakeLists.txt:199-215 and
examples/src/Main.cpp:144-154 checksum oracles).
"""

import pathlib

import numpy as np
import pytest

import libnyquist_tpu as nq

from .helpers import assert_matches_golden, load_golden

TEST_DATA = pathlib.Path("/root/reference/test_data")


def test_short_opus(test_data_dir):
    audio = nq.load(str(test_data_dir / "short.opus"))
    assert audio.sample_rate == 48000
    assert audio.channel_count == 2
    assert_matches_golden(audio, "short")


def test_detodos_opus(test_data_dir):
    # Pure SILK-WB stream (reference: opus_decoder_clean.c silk path).
    from libnyquist_tpu.errors import DecodeError

    try:
        audio = nq.load(str(test_data_dir / "ad_hoc" / "detodos.opus"))
    except DecodeError as e:
        if "not yet implemented" in str(e):
            pytest.skip(str(e))
        raise
    assert_matches_golden(audio, "detodos")


def test_sb_reverie_oracle(test_data_dir):
    """The reference's headline ctest: int(sum)==403, 21472602 samples."""
    audio = nq.load(str(test_data_dir / "sb-reverie.opus"))
    assert audio.sample_count == 21472602
    total = float(audio.samples.astype(np.float64).sum())
    assert int(total) == 403
    assert_matches_golden(audio, "sb-reverie")


def test_sb_reverie_60ms_oracle(test_data_dir):
    """60 ms packets = 3 x 20 ms internal frames
    (reference: opus_decoder_clean.c:286-297)."""
    audio = nq.load(str(test_data_dir / "sb-reverie-60ms-frames.opus"))
    assert audio.sample_count == 21472602
    total = float(audio.samples.astype(np.float64).sum())
    assert int(total) == 719
    assert_matches_golden(audio, "sb-reverie-60ms-frames")


def test_chained_opus_links_concatenate():
    """Chained Ogg Opus (two sequential links, distinct serials) decodes
    link by link and concatenates, like opusfile's op_read across links
    (opusfile.c op_set_current_link semantics)."""
    import struct

    import numpy as np

    from libnyquist_tpu.formats import ogg
    from libnyquist_tpu.formats.opus import decode_ogg_opus

    raw = (pathlib.Path(__file__).parent
           / "golden" / "opus_packets.bin").read_bytes()
    pos = 4
    ch, sr, n_packets, frame = struct.unpack_from("<4i", raw, pos)
    pos += 16
    pkts = []
    for _ in range(24):
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        pkts.append(raw[pos : pos + ln])
        pos += ln

    def one_link(serial, packets):
        head = (b"OpusHead" + bytes([1, ch]) + struct.pack("<H", 0)
                + struct.pack("<I", 48000) + struct.pack("<h", 0)
                + bytes([0]))
        tags = (b"OpusTags" + struct.pack("<I", 1) + b"x"
                + struct.pack("<I", 0))
        pages = [ogg.write_page(head, 0, serial, 0, bos=True),
                 ogg.write_page(tags, 0, serial, 1)]
        g = 0
        for i, p in enumerate(packets):
            g += frame
            pages.append(ogg.write_page(p, g, serial, 2 + i,
                                        eos=(p is packets[-1])))
        return b"".join(pages)

    link_a = one_link(11, pkts[:12])
    link_b = one_link(22, pkts[12:])
    pcm_a, _ = decode_ogg_opus(link_a)
    pcm_b, _ = decode_ogg_opus(link_b)
    pcm_ab, head = decode_ogg_opus(link_a + link_b)
    assert head.channels == ch
    assert pcm_ab.shape[0] == pcm_a.shape[0] + pcm_b.shape[0]
    assert np.array_equal(pcm_ab[: pcm_a.shape[0]], pcm_a)
    assert np.array_equal(pcm_ab[pcm_a.shape[0]:], pcm_b)
