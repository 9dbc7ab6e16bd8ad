"""Malformed-input robustness across every format.

The reference's fault-injection corpus is the degenerate WAV set
(SURVEY.md §5); this extends the idea to all seven formats: truncations
and random byte corruptions must either decode (corruption may land in
payload) or raise a NyquistError — never an uncontrolled exception or a
hang.
"""

import pathlib

import numpy as np
import pytest

import libnyquist_tpu as nq
from libnyquist_tpu.errors import NyquistError

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
AD_HOC = pathlib.Path("/root/reference/test_data/ad_hoc")

CASES = [
    AD_HOC / "TestBeat_44_16_stereo-ima4.wav",
    AD_HOC / "KittyPurr16_Mono.flac",
    AD_HOC / "TestBeat_Int16.wv",
    AD_HOC / "44_16_mono.mpc",
    FIXTURES / "sv7_stereo.mpc",
    FIXTURES / "l2_stereo_44k.mp3",
    FIXTURES / "ms8ch.opus",
    AD_HOC / "TestBeatMono.ogg",
]


def _try(data: bytes, ext: str):
    try:
        nq.load(data, extension=ext)
    except NyquistError:
        pass  # controlled rejection is fine


@pytest.mark.parametrize("path", CASES, ids=lambda p: p.name)
def test_truncations(path):
    if not path.exists():
        pytest.skip(f"{path} missing")
    data = path.read_bytes()
    ext = path.suffix[1:]
    n = len(data)
    for frac in (0.01, 0.1, 0.45):
        _try(data[: max(4, int(n * frac))], ext)


@pytest.mark.parametrize("path", CASES, ids=lambda p: p.name)
def test_byte_corruption(path):
    if not path.exists():
        pytest.skip(f"{path} missing")
    data = bytearray(path.read_bytes()[:65536])  # cap cost per decode
    ext = path.suffix[1:]
    rng = np.random.default_rng(hash(path.name) & 0xFFFF)
    for _ in range(4):
        corrupted = bytearray(data)
        for _ in range(8):
            pos = int(rng.integers(0, len(corrupted)))
            corrupted[pos] = int(rng.integers(0, 256))
        _try(bytes(corrupted), ext)


def test_flac_native_rice_overrun_saturates():
    """Corrupt FLAC bitstreams must saturate, not read out of bounds.

    Exercises the guards in native/hostops.c br_read/br_read_unary: a
    4-byte buffer asked for 1000 Rice(14) residuals previously read ~2 KB
    past the end of the heap buffer (advisor finding, round 1)."""
    import ctypes

    from libnyquist_tpu.runtime.native import lib

    L = lib()
    if L is None:
        pytest.skip("native library unavailable")
    buf = b"\xff\x00\xab\xcd"
    out = np.zeros(1000, np.int32)
    pos = L.flac_rice_decode(
        buf, len(buf) * 8, 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 1000, 14, 0,
    )
    assert pos > len(buf) * 8  # overrun marker the Python caller checks
    assert (out[8:] == 0).all()  # saturated, deterministic


def test_ogg_orphaned_continuation_dropped():
    """A stream entered mid-file (first page lost, next page continued)
    must drop the orphaned fragment like libogg, not emit a corrupt
    leading packet."""
    from libnyquist_tpu.formats import ogg

    serial = 42
    # Page with continuation flag set and segments [255, 10, 20]: the
    # 255+10 run ends a packet we never saw the start of; the 20-byte
    # segment is the first complete packet.
    body = bytes(255) + bytes(10) + b"B" * 20
    import struct as _s

    def page(flags, segs, seq):
        lacing = []
        for s in segs:
            lacing.extend([255] * (len(s) // 255) + [len(s) % 255]
                          if len(s) % 255 or not s else [255])
        # simpler: exact lacing for our segment sizes (<255 or ==255)
        lacing = [len(s) for s in segs]
        hdr = b"OggS" + bytes([0, flags]) + _s.pack(
            "<qIIi", 0, serial, seq, 0
        ) + bytes([len(lacing)]) + bytes(lacing)
        return hdr + b"".join(segs)

    raw = page(0x01, [bytes(255), bytes(10), b"B" * 20], 7)
    streams = ogg.demux(raw, verify_crc=False)
    pkts = streams[serial].packets
    assert len(pkts) == 1
    assert pkts[0].data == b"B" * 20


def test_wav_encoder_buffer_too_big_guard(monkeypatch):
    """encode_wav_to_buffer raises ValueError('BufferTooBig') for >4 GiB
    payloads instead of letting struct.error escape (Common.h semantics).
    A real 4 GiB buffer is impractical in CI, so the 24-bit packer is
    patched to report a huge length; the guard fires before the payload
    bytes are ever touched."""
    from libnyquist_tpu import encoders
    from libnyquist_tpu.audio_data import AudioData, PCMFormat

    class HugePayload(bytes):
        def __len__(self):
            return 0x100000000

    monkeypatch.setattr(encoders, "_pack24", lambda v: HugePayload())
    d = AudioData(
        sample_rate=48000, channel_count=1,
        samples=np.zeros(16, np.float32), source_format=PCMFormat.PCM_FLT,
    )
    p = encoders.EncoderParams(channel_count=1,
                               target_format=PCMFormat.PCM_24)
    with pytest.raises(ValueError, match="BufferTooBig"):
        encoders.encode_wav_to_buffer(p, d)


def _golden_opus_stream_with_loss(drop_from: int, drop_count: int):
    """Build an Ogg Opus stream from the golden CELT packets with
    `drop_count` audio pages deleted (page-sequence gap -> concealment)."""
    import struct

    from libnyquist_tpu.formats import ogg

    raw = (pathlib.Path(__file__).parent
           / "golden" / "opus_packets.bin").read_bytes()
    pos = 4
    ch, sr, n_packets, frame = struct.unpack_from("<4i", raw, pos)
    pos += 16
    pkts = []
    for _ in range(n_packets):
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        pkts.append(raw[pos : pos + ln])
        pos += ln
    head = (b"OpusHead" + bytes([1, ch]) + struct.pack("<H", 0)
            + struct.pack("<I", 48000) + struct.pack("<h", 0) + bytes([0]))
    tags = (b"OpusTags" + struct.pack("<I", 4) + b"test"
            + struct.pack("<I", 0))
    pages = [ogg.write_page(head, 0, 99, 0, bos=True),
             ogg.write_page(tags, 0, 99, 1)]
    g = 0
    for i, p in enumerate(pkts):
        g += frame
        pages.append(ogg.write_page(p, g, 99, 2 + i,
                                    eos=(p is pkts[-1])))
    kept = pages[: 2 + drop_from] + pages[2 + drop_from + drop_count :]
    return b"".join(kept), b"".join(pages), ch, frame, len(pkts)


def test_opus_packet_loss_concealment():
    """Deleting pages mid-stream must conceal, not error: output stays
    finite, sample-continuous at the splices (no clicks), and outside
    the loss neighborhood matches the intact decode (VERDICT r1 item 7)."""
    lossy, intact, ch, frame, n_pkts = _golden_opus_stream_with_loss(10, 3)
    a = nq.load(intact, extension="opus").samples.reshape(-1, ch)
    b = nq.load(lossy, extension="opus").samples.reshape(-1, ch)
    assert np.isfinite(b).all()
    # concealment keeps the stream duration (3 packets concealed)
    assert b.shape[0] == a.shape[0]
    # bounded amplitude and no clicks: the max sample-to-sample jump in
    # the lossy decode stays comparable to the intact stream's
    jump_a = np.abs(np.diff(a, axis=0)).max()
    jump_b = np.abs(np.diff(b, axis=0)).max()
    assert np.abs(b).max() <= 2 * max(np.abs(a).max(), 0.1)
    assert jump_b <= 4 * max(jump_a, 0.05)
    # far from the loss, decode is unaffected up to resync
    pre = slice(0, 8 * frame)
    assert np.allclose(a[pre], b[pre], atol=1e-6)


def test_silk_packet_loss_concealment():
    """SILK-mode loss conceals by waveform fade: decoder-level check."""
    import struct

    from libnyquist_tpu.formats.opus.decoder import OpusDecoder

    raw = (pathlib.Path(__file__).parent
           / "golden" / "opus_packets.bin").read_bytes()
    # reuse the SILK golden cases from test_opus_packets
    from .test_opus_packets import CASES, SILK_CASES

    if not CASES:
        pytest.skip("opus packet goldens not generated")
    case = CASES[SILK_CASES[0]]
    dec = OpusDecoder(case["ch"])
    outs = [dec.decode_packet(p) for p in case["packets"][:3]]
    lost1 = dec.decode_packet(None)
    lost2 = dec.decode_packet(None)
    ref = np.concatenate(outs)
    assert np.isfinite(lost1).all() and np.isfinite(lost2).all()
    assert lost1.shape[0] > 0
    assert np.abs(lost1).max() <= max(np.abs(ref).max(), 1e-3) * 1.5
    # repeated losses decay
    assert np.abs(lost2).max() <= np.abs(lost1).max() + 1e-9
    # recovery: a real packet decodes fine afterwards
    back = dec.decode_packet(case["packets"][3])
    assert np.isfinite(back).all()


def test_native_paths_byte_fuzz():
    """Random byte mutations through every native decode plane (opus
    scan + SILK, MPC SV7/SV8 frame reader, Vorbis whole-packet decode)
    must produce typed errors or output, never crashes or foreign
    exceptions."""
    import random

    from libnyquist_tpu.audio_data import PCMFormat

    random.seed(11)
    targets = [
        ("/root/reference/test_data/ad_hoc/detodos.opus", "opus"),
        ("/root/reference/test_data/ad_hoc/44_16_stereo.mpc", "mpc"),
        (str(pathlib.Path(__file__).parent / "fixtures" / "sv7_stereo.mpc"),
         "mpc"),
        ("/root/reference/test_data/ad_hoc/LR_Stereo.ogg", "ogg"),
        # DSD planes (native/wv_dsd.c): fast + high arithmetic coders
        (str(pathlib.Path(__file__).parent / "fixtures" / "dsd_fast.wv"),
         "wv"),
        (str(pathlib.Path(__file__).parent / "fixtures" / "dsd_high.wv"),
         "wv"),
        # floor0 LSP path (Python, extinct shape)
        (str(pathlib.Path(__file__).parent / "fixtures"
             / "floor0_mono8k.ogg"), "ogg"),
        # whole-stream native FLAC frame parser (native/flac_stream.c)
        ("/root/reference/test_data/ad_hoc/KittyPurr8_Stereo_Dithered.flac",
         "flac"),
    ]
    for path, ext in targets:
        p = pathlib.Path(path)
        if not p.exists():
            continue
        data = bytearray(p.read_bytes())
        for region in (len(data), min(1024, len(data))):  # body + header
            for _ in range(15):
                mut = bytearray(data)
                for _ in range(random.randint(1, 8)):
                    pos = random.randrange(region)
                    mut[pos] = random.randrange(256)
                try:
                    d = nq.load(bytes(mut), extension=ext)
                    # finite-or-typed-error policy for CODEC decoders:
                    # adversarial input must never NaN the output
                    # (caught a real floor0 / VQ-overflow leak in
                    # round 3).  Float CONTAINERS are exempt — they
                    # pass the file's own IEEE bits through verbatim,
                    # like the reference.  The exemption keys off the
                    # DECODED source format, not the fixture: a flags
                    # mutation can legally turn a .wv block into
                    # FLOAT_DATA (found by the round-3 deep soak), and
                    # libwavpack too then reconstructs whatever
                    # NaN/Inf bits the "mantissas" encode.
                    if d.source_format != PCMFormat.PCM_FLT:
                        assert np.isfinite(np.asarray(d.samples)).all()
                except (NyquistError, MemoryError):
                    pass


def test_reference_corpus_sweep():
    """Every file in the reference corpus either decodes to finite
    output or raises a typed error — never a foreign exception (the
    reference's asset matrix is the fixture sweep, SURVEY section 4)."""
    root = pathlib.Path("/root/reference/test_data")
    if not root.is_dir():
        pytest.skip("reference test_data not available")
    ok = 0
    for f in sorted(root.rglob("*")):
        if not f.is_file():
            continue
        if f.suffix.lower().lstrip(".") in ("txt", "md", "bin", "py", "sh"):
            continue
        try:
            d = nq.load(str(f))
            assert np.isfinite(np.asarray(d.samples)).all(), f.name
            ok += 1
        except NyquistError:
            pass
    assert ok >= 55   # 61 at round 2; guard against silent regressions


def test_celt_pitch_plc_extrapolates_and_decays():
    """The pitch-based PLC branch (upstream celt_decoder.c:465-678):
    first losses extrapolate the waveform periodically with decaying
    energy; from the 5th consecutive loss the decoder switches to the
    noise branch (noise_based = loss_count >= 5)."""
    import pathlib

    from libnyquist_tpu.formats import ogg as oggmod
    from libnyquist_tpu.formats.opus.celt import (
        CeltDecoderState, celt_decode_frame, celt_decode_lost)

    data = pathlib.Path(
        "/root/reference/test_data/sb-reverie.opus").read_bytes()
    stream = list(oggmod.demux(data).values())[0]
    pkts = [p.data for p in stream.packets
            if not p.data.startswith((b"OpusHead", b"OpusTags"))][:260]
    st = CeltDecoderState(channels=2)
    for p in pkts[:256]:
        last = celt_decode_frame(st, p, 960)
    rms_real = float(np.sqrt((last ** 2).mean()))

    rms = []
    for lc in range(6):
        pcm = celt_decode_lost(st, 960, lc)
        assert pcm.shape == (960, 2)
        assert np.isfinite(pcm).all()
        rms.append(float(np.sqrt((pcm ** 2).mean())))
    # a pitch was detected and reused across consecutive losses
    assert 100 <= st.last_pitch_index <= 720
    # losses 1..4 fade monotonically below the first concealed frame
    assert rms[1] < rms[0] * 1.01
    assert rms[4] < rms[1]
    # concealment energy stays in the ballpark of the real signal
    assert rms[0] <= 2.0 * max(rms_real, 1e-6)
    # the next real frame still decodes cleanly after the losses
    nxt = celt_decode_frame(st, pkts[256], 960)
    assert np.isfinite(nxt).all()


def test_silk_plc_golden_invariants():
    """SILK loss concealment vs the reference's own PLC output
    (tests/golden/opus_plc.bin, generated by tools/opus_plc_golden.c:
    opus_decode_float(NULL) on the golden SILK cases — the fork's clean
    CELT decoder has PLC stripped, so only pure-SILK cases exist).

    The native silk/PLC.c + CNG.c port (native/silk_dec.c silk_plc /
    silk_cng, plus the post-loss bandwidth expansion of
    decode_parameters.c:81 and the voiced-PLC transition patch of
    decode_core.c:125) makes the whole lossy decode BIT-EXACT against
    the reference decoder's own concealment, including recovery
    frames."""
    import pathlib
    import struct

    from libnyquist_tpu.formats.opus.decoder import OpusDecoder

    here = pathlib.Path(__file__).parent / "golden"
    blob = (here / "opus_plc.bin").read_bytes()
    raw = (here / "opus_packets.bin").read_bytes()

    pos = 4
    (n_cases,) = struct.unpack_from("<i", raw, 0)
    cases = []
    for _ in range(n_cases):
        ch, sr, npk, frame = struct.unpack_from("<4i", raw, pos)
        pos += 16
        pkts = []
        for _ in range(npk):
            (ln,) = struct.unpack_from("<i", raw, pos)
            pos += 4
            pkts.append(raw[pos : pos + ln])
            pos += ln
        (ns,) = struct.unpack_from("<q", raw, pos)
        pos += 8 + ns * 4
        cases.append((ch, npk, frame, pkts))

    p = 4
    (nplc,) = struct.unpack_from("<i", blob, 0)
    assert nplc >= 6
    for _ in range(nplc):
        ci, ch, npk, frame = struct.unpack_from("<4i", blob, p)
        p += 16
        lost = np.frombuffer(blob, np.uint8, npk, p)
        p += npk
        (total,) = struct.unpack_from("<q", blob, p)
        p += 8
        ref = np.frombuffer(blob, np.float32, total, p)
        p += total * 4
        _, _, _, pkts = cases[ci]
        dec = OpusDecoder(channels=ch)
        outs = [dec.decode_packet(None if lost[i] else pkts[i])
                for i in range(npk)]
        mine = np.concatenate(outs).reshape(-1).astype(np.float32)
        assert mine.size == total
        from libnyquist_tpu.formats.opus.silk import _native_silk

        if _native_silk() is not None:
            # native PLC port: bit-exact including every concealed and
            # recovery frame
            assert np.array_equal(mine, ref)
        else:
            # pure-Python fallback conceals with a waveform fade only
            assert np.isfinite(mine).all()
            pre = int(np.argmax(lost)) * frame * ch
            assert pre > 0
            assert np.array_equal(mine[:pre], ref[:pre])
            assert np.abs(mine).max() <= max(2.0 * np.abs(ref).max(), 0.1)


def test_dtx_packets_conceal():
    """DTX: a TOC-only packet (zero-length frame) decodes as a
    concealment frame of the TOC's duration, like the reference's
    opus_decode treating len<=1 data as loss (opus_decoder_clean.c
    data==NULL path).  Both packet-level and full Ogg-file level."""
    import pathlib
    import struct

    from libnyquist_tpu.formats import ogg as oggmod
    from libnyquist_tpu.formats.opus.decoder import OpusDecoder

    raw = (pathlib.Path(__file__).parent
           / "golden" / "opus_packets.bin").read_bytes()
    pos = 4
    ch, sr, npk, frame = struct.unpack_from("<4i", raw, pos)
    pos += 16
    pkts = []
    for _ in range(12):
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        pkts.append(raw[pos : pos + ln])
        pos += ln

    dec = OpusDecoder(channels=ch)
    for p in pkts[:5]:
        dec.decode_packet(p)
    out = dec.decode_packet(bytes([pkts[5][0] & 0xFC]))
    assert out.shape == (frame, ch)
    assert np.isfinite(out).all()

    pkts[6] = bytes([pkts[6][0] & 0xFC])
    head = (b"OpusHead" + bytes([1, ch]) + struct.pack("<H", 0)
            + struct.pack("<I", 48000) + struct.pack("<h", 0)
            + bytes([0]))
    tags = b"OpusTags" + struct.pack("<I", 1) + b"x" + struct.pack("<I", 0)
    pages = [oggmod.write_page(head, 0, 7, 0, bos=True),
             oggmod.write_page(tags, 0, 7, 1)]
    g = 0
    for i, p in enumerate(pkts):
        g += frame
        pages.append(oggmod.write_page(p, g, 7, 2 + i,
                                       eos=(i == len(pkts) - 1)))
    a = nq.load(b"".join(pages), extension="opus")
    assert a.sample_count == frame * 12 * ch
    assert np.isfinite(a.samples).all()


def _audio(sig: np.ndarray, ch: int = 1):
    from libnyquist_tpu.audio_data import AudioData, PCMFormat

    a = AudioData()
    a.samples = sig.astype(np.float32)
    a.channel_count = ch
    a.sample_rate = 48000
    a.source_format = PCMFormat.PCM_FLT
    return a


def _speechish48(seconds, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(int(48000 * seconds)) / 48000
    env = np.clip(np.sin(2 * np.pi * 3.1 * t), 0, None) ** 2
    f0 = 120 * (1 + 0.25 * np.sin(2 * np.pi * 0.7 * t))
    ph = 2 * np.pi * np.cumsum(f0) / 48000
    buzz = sum(np.sin(k * ph) / k for k in range(1, 9))
    return (env * (0.5 * buzz + rng.standard_normal(len(t)) * 0.1)
            ).astype(np.float32) * 0.4


def test_fec_lbrr_packet_mutation_soak():
    """The in-band FEC path (decode_packet(fec=True) -> LBRR parser,
    round-3's newest attack surface): random byte mutations of FEC
    packets must produce finite output or a typed error, never foreign
    exceptions — through BOTH the fec=True recovery decode and the
    subsequent normal decode of the same mutated packet (state
    interaction)."""
    import random

    from libnyquist_tpu.audio_data import PCMFormat
    from libnyquist_tpu.encoders import EncoderParams, encode_opus_to_buffer
    from libnyquist_tpu.formats.ogg import demux
    from libnyquist_tpu.formats.opus.decoder import OpusDecoder

    random.seed(7)
    for ch in (1, 2):
        sig = _speechish48(1.2)
        if ch == 2:
            sig = np.stack([sig, np.roll(sig, 240) * 0.9], 1).reshape(-1)
        buf = encode_opus_to_buffer(
            EncoderParams(ch, PCMFormat.PCM_FLT), _audio(sig, ch),
            mode="silk", fec=True)
        pkts = [q.data for q in
                next(iter(demux(buf).values())).packets[2:]]
        dec = OpusDecoder(ch)
        muts = 0
        for i, q in enumerate(pkts):
            dec.decode_packet(q)          # keep real state evolving
            for _ in range(3):
                mut = bytearray(q)
                for _ in range(random.randint(1, 6)):
                    mut[random.randrange(len(mut))] = \
                        random.randrange(256)
                mdec = OpusDecoder(ch)
                try:
                    out = mdec.decode_packet(bytes(mut), fec=True)
                    assert np.isfinite(np.asarray(out)).all()
                    out2 = mdec.decode_packet(bytes(mut))
                    assert np.isfinite(np.asarray(out2)).all()
                except (NyquistError, ValueError, MemoryError):
                    pass
                muts += 1
        assert muts >= 100


def test_dtx_stream_mutation_soak():
    """DTX streams (TOC-only packets + reactivation frames) under
    whole-file byte mutation: finite-or-typed-error, both SILK and
    CELT DTX encoders."""
    import random

    from libnyquist_tpu.audio_data import PCMFormat
    from libnyquist_tpu.encoders import EncoderParams, encode_opus_to_buffer

    random.seed(13)
    sp = _speechish48(0.8)
    gap = np.zeros(48000 // 2, np.float32)
    sig = np.concatenate([sp, gap, sp * 0.5, gap, sp])
    for mode in ("silk", "celt"):
        buf = encode_opus_to_buffer(
            EncoderParams(1, PCMFormat.PCM_FLT), _audio(sig),
            mode=mode, dtx=True)
        # sanity: the clean stream decodes finite
        a = nq.load(buf, extension="opus")
        assert np.isfinite(np.asarray(a.samples)).all()
        data = bytearray(buf)
        for region in (len(data), min(2048, len(data))):
            for _ in range(12):
                mut = bytearray(data)
                for _ in range(random.randint(1, 8)):
                    mut[random.randrange(region)] = random.randrange(256)
                try:
                    d = nq.load(bytes(mut), extension="opus")
                    assert np.isfinite(np.asarray(d.samples)).all()
                except (NyquistError, MemoryError):
                    pass


def test_auto_mode_edge_inputs():
    """mode='auto' (the analysis.c-surface detector) on adversarial
    inputs: silence, DC, full-scale square, impulse train, one frame,
    clipped content — must encode, and the stream must decode finite
    at the right length; NaN input raises the typed guard."""
    from libnyquist_tpu.audio_data import PCMFormat
    from libnyquist_tpu.encoders import EncoderParams, encode_opus_to_buffer

    n = 48000
    t = np.arange(n) / 48000.0
    rng = np.random.default_rng(5)
    edges = {
        "silence": np.zeros(n, np.float32),
        "dc": np.full(n, 0.5, np.float32),
        "square_fs": np.sign(np.sin(2 * np.pi * 1000 * t)
                             ).astype(np.float32),
        "impulses": (np.arange(n) % 4800 == 0).astype(np.float32),
        "clipped": np.clip(3.0 * _speechish48(1.0), -1, 1),
        "tiny": (rng.standard_normal(n) * 1e-6).astype(np.float32),
        "one_frame": _speechish48(0.02),
    }
    for name, sig in edges.items():
        buf = encode_opus_to_buffer(
            EncoderParams(1, PCMFormat.PCM_FLT), _audio(sig),
            mode="auto")
        d = nq.load(buf, extension="opus")
        assert np.isfinite(np.asarray(d.samples)).all(), name
        # duration within one frame of the input (preskip-trimmed)
        assert abs(d.sample_count - len(sig)) <= 960, (
            name, d.sample_count, len(sig))
    bad = np.zeros(n, np.float32)
    bad[100] = np.nan
    with pytest.raises(ValueError):
        encode_opus_to_buffer(
            EncoderParams(1, PCMFormat.PCM_FLT), _audio(bad), mode="auto")
