"""Bisection-seek reader (streaming.OggSeekReader): O(log) byte access,
output matching the decode-backed reader.

Reference surface: opusfile op_pcm_seek/op_pcm_seek_page
(opusfile.c:2400/:2160, bisection op_bisect_forward_serialno :1098) and
vorbisfile ov_pcm_seek.  The read-cost assertions mirror the VERDICT
'touches O(log) pages' bar via CountingSource.
"""

import pathlib

import numpy as np
import pytest

from libnyquist_tpu.errors import DecodeError
from libnyquist_tpu.streaming import (
    CountingSource, FlacSeekReader, Mp3SeekReader, OggSeekReader,
    StreamReader, seek_reader)

REF = pathlib.Path("/root/reference/test_data")


def _check_lazy_vs_full(path, positions, tol, max_reads_per_seek=40,
                        max_bytes_per_seek=900_000):
    data = pathlib.Path(path).read_bytes()
    full = StreamReader(data, extension=pathlib.Path(path).suffix[1:])
    src = CountingSource(data)
    r = OggSeekReader(src)
    assert r.sample_rate == full.sample_rate
    assert r.channel_count == full.channel_count
    # totals agree (tail-granule vs decoded length)
    assert abs(r.pcm_total() - full.pcm_total()) <= 1
    assert src.reads <= 10          # setup: head + tail windows only
    for pos in positions:
        pos = min(pos, r.pcm_total() - 4800)
        r0, b0 = src.reads, src.bytes_read
        r.pcm_seek(pos)
        got = r.read(4800)
        full.pcm_seek(pos)
        want = full.read(4800)
        n = min(len(got), len(want))
        assert n >= 4000
        err = np.abs(got[:n] - want[:n]).max()
        assert err <= tol, f"seek {pos}: max err {err}"
        # O(log) page touches: a handful of probe/collect reads, far
        # from O(file) (the decode-backed reader reads + decodes all)
        assert src.reads - r0 <= max_reads_per_seek, (
            f"seek {pos}: {src.reads - r0} reads")
        assert src.bytes_read - b0 <= max_bytes_per_seek, (
            f"seek {pos}: {src.bytes_read - b0} bytes")


@pytest.mark.skipif(not (REF / "sb-reverie.opus").exists(),
                    reason="reference corpus absent")
def test_opus_bisection_seek():
    """Opus: 1 s pre-roll converges the decoder far below f32
    resolution; positions are sample-exact via TOC-duration anchoring
    on page granules."""
    total_s = 223  # sb-reverie ~3.7 min
    _check_lazy_vs_full(
        REF / "sb-reverie.opus",
        [30 * 48000, 120 * 48000, (total_s - 2) * 48000, 0],
        tol=2e-4)


@pytest.mark.skipif(not (REF / "ad_hoc" / "BlockWoosh_Stereo.ogg").exists(),
                    reason="reference corpus absent")
def test_vorbis_bisection_seek():
    """Vorbis: one-packet window priming makes mid-stream decode
    sample-exact."""
    data = (REF / "ad_hoc" / "BlockWoosh_Stereo.ogg").read_bytes()
    full = StreamReader(data, extension="ogg")
    src = CountingSource(data)
    r = OggSeekReader(src)
    assert abs(r.pcm_total() - full.pcm_total()) <= 1
    for frac in (0.3, 0.7, 0.05):
        pos = int(frac * (r.pcm_total() - 5000))
        r.pcm_seek(pos)
        got = r.read(4800)
        full.pcm_seek(pos)
        want = full.read(4800)
        n = min(len(got), len(want))
        assert n >= 4000
        np.testing.assert_allclose(got[:n], want[:n], rtol=0, atol=1e-6)


def test_lazy_flag_dispatch():
    """StreamReader(lazy=True) returns the bisection reader for Ogg."""
    p = REF / "sb-reverie.opus"
    if not p.exists():
        pytest.skip("reference corpus absent")
    r = StreamReader(str(p), lazy=True)
    assert isinstance(r, OggSeekReader)
    r.time_seek(10.0)
    assert r.pcm_tell() == 480000
    chunk = r.read(960)
    assert chunk.shape == (960, r.channel_count)


def test_sequential_reads_after_seek():
    p = REF / "sb-reverie.opus"
    if not p.exists():
        pytest.skip("reference corpus absent")
    data = p.read_bytes()
    src = CountingSource(data)
    r = OggSeekReader(src)
    full = StreamReader(data, extension="opus")
    pos = 50 * 48000
    r.pcm_seek(pos)
    full.pcm_seek(pos)
    for _ in range(5):
        a = r.read(960)
        b = full.read(960)
        assert np.abs(a - b).max() <= 2e-4


def test_flac_frame_bisection_seek():
    """FlacSeekReader: O(log) frame-header bisection (CRC-8 validated
    probes), windows bit-identical to the full decode (FLAC frames are
    independent)."""
    p = REF / "ad_hoc" / "KittyPurr16_Stereo.flac"
    if not p.exists():
        pytest.skip("reference corpus absent")
    data = p.read_bytes()
    full = StreamReader(data, extension="flac")
    src = CountingSource(data)
    r = FlacSeekReader(src)
    assert r.pcm_total() == full.pcm_total()
    assert src.reads <= 3               # setup reads the head only
    for pos in (5, 4096, 123457, 900000, r.pcm_total() - 50):
        r0 = src.reads
        r.pcm_seek(pos)
        full.pcm_seek(pos)
        a = r.read(200)
        b = full.read(200)
        assert a.shape == b.shape
        assert np.abs(a - b).max() == 0.0, pos       # bit-exact
        assert src.reads - r0 <= 25, (pos, src.reads - r0)


def test_mp3_frame_index_seek():
    """Mp3SeekReader: lazy frame-index walk (headers only, buffered
    sequential reads), then bounded windowed re-decode with reservoir
    pre-roll — bit-identical to the full decode at any offset."""
    p = REF / "ad_hoc" / "acetylene.mp3"
    if not p.exists():
        pytest.skip("reference corpus absent")
    data = p.read_bytes()
    full = StreamReader(data, extension="mp3")
    src = CountingSource(data)
    r = Mp3SeekReader(src)
    assert r.pcm_total() == full.pcm_total()
    # the index walk reads the file once in big chunks, not per frame
    assert src.reads <= 4 + len(data) // (256 * 1024)
    for pos in (0, 12345, 100000, r.pcm_total() - 2000):
        r.pcm_seek(pos)
        full.pcm_seek(pos)
        a = r.read(1500)
        b = full.read(1500)
        assert a.shape == b.shape
        assert np.abs(a - b).max() == 0.0, pos       # bit-exact


def test_seek_reader_factory_dispatch():
    cases = [
        (REF / "sb-reverie.opus", OggSeekReader),
        (REF / "ad_hoc" / "KittyPurr16_Stereo.flac", FlacSeekReader),
        (REF / "ad_hoc" / "acetylene.mp3", Mp3SeekReader),
    ]
    for path, cls in cases:
        if not path.exists():
            pytest.skip("reference corpus absent")
        r = seek_reader(str(path))
        assert isinstance(r, cls), path
        r.time_seek(1.0)
        assert r.read(100).shape[0] == 100


def test_chained_ogg_lazy_reader():
    """Chained Ogg (two links, distinct serials): link boundaries
    discovered by serial bisection (op_bisect_forward_serialno,
    opusfile.c:1098) in O(links x log size) reads; reads stitch across
    the boundary and match the full chained decode bit-exactly."""
    from libnyquist_tpu.streaming import ChainedOggSeekReader

    pa = REF / "ad_hoc" / "LR_Stereo.ogg"
    pb = REF / "ad_hoc" / "BlockWoosh_Stereo.ogg"
    if not (pa.exists() and pb.exists()):
        pytest.skip("reference corpus absent")
    da, db = pa.read_bytes(), pb.read_bytes()
    chained = da + db
    full = StreamReader(chained, extension="ogg")
    src = CountingSource(chained)
    r = ChainedOggSeekReader(src)
    assert len(r.links) == 2
    assert r.pcm_total() == full.pcm_total()
    assert src.reads < 80       # discovery + headers, not O(file)
    link0 = r.links[0].pcm_total()
    for pos in (0, 1000, link0 - 500, link0 + 500,
                r.pcm_total() - 3000):
        r.pcm_seek(pos)
        full.pcm_seek(pos)
        a = r.read(1200)
        b = full.read(1200)
        assert a.shape == b.shape
        assert np.abs(a - b).max() == 0.0, pos
    # lazy dispatch picks the chained reader for chained content
    assert isinstance(StreamReader(chained, extension="ogg", lazy=True),
                      ChainedOggSeekReader)
    assert isinstance(seek_reader(chained), ChainedOggSeekReader)


def test_chained_opus_lazy_reader():
    """Chained Ogg Opus links through the lazy reader (preroll keeps
    windows within float tolerance of the full decode)."""
    from libnyquist_tpu.streaming import ChainedOggSeekReader

    pa = REF / "short.opus"
    pb = REF / "sb-reverie.opus"
    if not (pa.exists() and pb.exists()):
        pytest.skip("reference corpus absent")
    chained = pa.read_bytes() + pb.read_bytes()
    full = StreamReader(chained, extension="opus")
    r = ChainedOggSeekReader(CountingSource(chained))
    assert len(r.links) == 2
    assert r.pcm_total() == full.pcm_total()
    l0 = r.links[0].pcm_total()
    for pos in (0, l0 - 300, l0 + 300, r.pcm_total() - 2000):
        r.pcm_seek(pos)
        full.pcm_seek(pos)
        a = r.read(1000)
        b = full.read(1000)
        assert a.shape == b.shape
        assert np.abs(a - b).max() < 2e-4, pos


def test_mpc_sv8_seek_reader():
    """Musepack SV8: ST seek-table jump (mpc_demux.c:274 mpc_demux_ST,
    reached via the SO pointer block :324 mpc_demux_SP) + block-header
    walk to the target AP block (:651 mpc_demux_seek_sample).  AP
    blocks open with a key frame, and the one-block synthesis warm-up
    exceeds the 512-tap polyphase memory, so every window is
    bit-identical to the linear decode."""
    from libnyquist_tpu.streaming import MpcSeekReader

    for name in ("44_16_stereo.mpc", "44_16_mono.mpc"):
        path = REF / "ad_hoc" / name
        if not path.exists():
            pytest.skip("reference corpus absent")
        full = StreamReader(str(path))
        src = CountingSource(str(path))
        r = MpcSeekReader(src)
        assert r.sample_rate == full.sample_rate
        assert r.channel_count == full.channel_count
        assert r.pcm_total() == full.pcm_total()
        # the fixtures carry a real ST table; every entry must point
        # at an AP block header (golomb second-order delta decode)
        assert r._st and len(r._st) >= 1
        for off in r._st:
            assert r._read_block_header(off)[0] == b"AP"
        total = r.pcm_total()
        for pos in (0, 1000, total // 2, total - 700):
            r.pcm_seek(pos)
            full.pcm_seek(pos)
            a = r.read(600)
            b = full.read(600)
            assert a.shape == b.shape
            assert np.abs(a - b).max() == 0.0, pos   # bit-exact


def test_mpc_sv7_seek_reader():
    """Musepack SV7: 20-bit frame-size walk (mpc_demux.c:712) with the
    reference's backup-and-reset warm-up (:664 fwd -= 32,
    mpc_decoder.c:85 mpc_decoder_reset_scf -> 0x01010101 -> the >1024
    clamp parks un-refreshed bands at SCF[0x80] near-silence).  Our
    64-frame warm-up measures bit-exact on this fixture where the
    reference's 32 still drifts."""
    from libnyquist_tpu.streaming import MpcSeekReader

    path = pathlib.Path(__file__).parent / "fixtures" / "sv7_stereo.mpc"
    full = StreamReader(str(path))
    r = MpcSeekReader(CountingSource(str(path)))
    assert r.pcm_total() == full.pcm_total()
    assert r.channel_count == full.channel_count == 2
    total = r.pcm_total()
    for pos in (0, 1000, total // 2, total - 700):
        r.pcm_seek(pos)
        full.pcm_seek(pos)
        a = r.read(600)
        b = full.read(600)
        assert a.shape == b.shape
        assert np.abs(a - b).max() == 0.0, pos
    # factory + lazy StreamReader dispatch
    assert isinstance(seek_reader(str(path)), MpcSeekReader)
    assert isinstance(StreamReader(str(path), lazy=True), MpcSeekReader)
    # out-of-range seeks reject
    with pytest.raises(DecodeError):
        r.pcm_seek(total + 1)


def test_mpc_sv8_seek_io_bounded():
    """A far seek through the ST table must not read the whole file:
    the reader jumps to the nearest table entry and walks block
    headers from there."""
    from libnyquist_tpu.streaming import MpcSeekReader

    path = REF / "ad_hoc" / "44_16_stereo.mpc"
    if not path.exists():
        pytest.skip("reference corpus absent")
    src = CountingSource(str(path))
    r = MpcSeekReader(src)
    r.pcm_seek(r.pcm_total() - 700)
    r.read(600)
    # header scan + ST + the last two AP block bodies; the first/bulk
    # AP blocks (~58 KB of the 70 KB file) stay untouched
    assert src.bytes_read < src.size * 0.45, src.bytes_read


def test_seek_reader_fuzz():
    """Byte-mutation fuzz over every lazy reader type (Ogg bisection,
    FLAC frame probe, MP3 index, MPC SV7/SV8 incl. the golomb ST
    parse): open + random seeks + reads must produce output or typed
    errors, never foreign exceptions or hangs."""
    import random
    import time

    from libnyquist_tpu.errors import NyquistError

    fixtures = pathlib.Path(__file__).parent / "fixtures"
    targets = [
        REF / "ad_hoc" / "detodos.opus",
        REF / "ad_hoc" / "KittyPurr16_Stereo.flac",
        REF / "ad_hoc" / "acetylene.mp3",
        REF / "ad_hoc" / "44_16_stereo.mpc",
        fixtures / "sv7_stereo.mpc",
    ]
    rng = random.Random(5)
    for path in targets:
        if not path.exists():
            continue
        data = path.read_bytes()
        for _ in range(12):
            mut = bytearray(data)
            region = rng.choice([len(data), min(2048, len(data))])
            for _ in range(rng.randint(1, 10)):
                mut[rng.randrange(region)] = rng.randrange(256)
            t0 = time.monotonic()
            try:
                r = seek_reader(bytes(mut))
                total = r.pcm_total()
                for _ in range(4):
                    if total > 1:
                        r.pcm_seek(rng.randrange(max(total, 2)))
                    r.read(rng.randrange(1, 4000))
            except (NyquistError, MemoryError):
                pass
            assert time.monotonic() - t0 < 30.0, path.name


def test_ogg_flac_lazy_reader():
    """Ogg FLAC link through the granule-bisection reader: FLAC frames
    are independent and self-describe their sample position, so
    windows are bit-exact with zero pre-roll.  (The reference cannot
    even decode Ogg FLAC — its loader only wires vorbisfile/opusfile;
    ours decodes and lazy-seeks it.)"""
    path = pathlib.Path(__file__).parent / "fixtures" / \
        "kitty8_dithered.oga"
    full = StreamReader(str(path))
    src = CountingSource(str(path))
    r = seek_reader(src)
    assert isinstance(r, OggSeekReader) and r.codec == "flac"
    assert r.pcm_total() == full.pcm_total()
    assert r.channel_count == full.channel_count
    total = r.pcm_total()
    for pos in (0, 100, total // 2, total - 600):
        r.pcm_seek(pos)
        full.pcm_seek(pos)
        a = r.read(500)
        b = full.read(500)
        assert a.shape == b.shape
        assert np.abs(a - b).max() == 0.0, pos     # bit-exact
    assert src.reads < 40                          # windows, not O(file)


def test_wav_lazy_reader_and_fallbacks():
    """WAV PCM/float seeks are O(1) preads (WavSeekReader, bit-exact
    vs the decode-backed reader); content without a lazy path
    (IMA-ADPCM WAV, AIFF, WavPack) falls back to the decode-backed
    StreamReader so seek_reader() is total over every supported
    container."""
    from libnyquist_tpu.streaming import WavSeekReader

    p = REF / "ad_hoc" / "Sequence44k_24b.wav"
    if not p.exists():
        pytest.skip("reference corpus absent")
    full = StreamReader(str(p))
    src = CountingSource(str(p))
    r = seek_reader(src)
    assert isinstance(r, WavSeekReader)
    assert r.pcm_total() == full.pcm_total()
    for pos in (0, 1000, full.pcm_total() - 50):
        r.pcm_seek(pos)
        full.pcm_seek(pos)
        a = r.read(40)
        b = full.read(40)
        assert a.shape == b.shape
        assert np.abs(a - b).max() == 0.0
    assert src.bytes_read < src.size // 4      # windows, not O(file)

    adpcm = REF / "ad_hoc" / "TestBeat_44_16_stereo-ima4-reaper.wav"
    if adpcm.exists():
        r = seek_reader(str(adpcm))
        assert isinstance(r, StreamReader)
        r.time_seek(0.5)
        assert r.read(100).shape[0] == 100
    wv = REF / "ad_hoc" / "TestBeat_Int16.wv"
    if wv.exists():
        r = seek_reader(str(wv))
        assert isinstance(r, StreamReader)
        assert r.read(100).shape == (100, 2)


def test_chained_ogg_flac_lazy_reader():
    """Chained Ogg FLAC links (distinct serials) stitch through the
    chain reader bit-exactly — including a seek landing across the
    link boundary.  (Beyond the reference: its loader has no Ogg FLAC
    path at all.)"""
    import struct

    from libnyquist_tpu.formats.ogg import _ogg_crc
    from libnyquist_tpu.streaming import ChainedOggSeekReader

    def reserial(data, new_serial):
        out = bytearray(data)
        pos = 0
        while pos + 27 <= len(out):
            idx = out.find(b"OggS", pos)
            if idx < 0:
                break
            nseg = out[idx + 26]
            end = (idx + 27 + nseg
                   + sum(out[idx + 27 : idx + 27 + nseg]))
            struct.pack_into("<I", out, idx + 14, new_serial)
            struct.pack_into("<I", out, idx + 22, 0)
            struct.pack_into("<I", out, idx + 22,
                             _ogg_crc(bytes(out[idx:end])))
            pos = end
        return bytes(out)

    fl = (pathlib.Path(__file__).parent / "fixtures"
          / "kitty8_dithered.oga").read_bytes()
    chained = fl + reserial(fl, 0x7777)
    solo = StreamReader(fl, extension="ogg")
    r = seek_reader(chained)
    assert isinstance(r, ChainedOggSeekReader) and len(r.links) == 2
    l0 = r.links[0].pcm_total()
    assert r.pcm_total() == 2 * solo.pcm_total()
    for pos, ref_pos in ((100, 100), (l0 + 100, 100),
                         (2 * l0 - 500, l0 - 500)):
        r.pcm_seek(pos)
        solo.pcm_seek(ref_pos)
        a = r.read(150)
        b = solo.read(150)
        assert a.shape == b.shape
        assert np.abs(a - b).max() == 0.0, pos
