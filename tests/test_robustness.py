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
