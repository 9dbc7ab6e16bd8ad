"""Opus decoder validated packet-for-packet against reference libopus.

Golden corpus: tests/golden/opus_packets.bin (tools/opus_packets_golden.c)
— encoder-forced CELT / SILK / hybrid cases decoded by opus_decode_float.
"""

import pathlib
import struct

import numpy as np
import pytest

from libnyquist_tpu.formats.opus.decoder import OpusDecoder

GOLDEN = pathlib.Path(__file__).parent / "golden" / "opus_packets.bin"


def load_cases():
    if not GOLDEN.exists():
        return []
    raw = GOLDEN.read_bytes()
    pos = 0
    (n_cases,) = struct.unpack_from("<i", raw, pos)
    pos += 4
    cases = []
    for _ in range(n_cases):
        ch, sr, n_packets, frame = struct.unpack_from("<4i", raw, pos)
        pos += 16
        packets = []
        for _ in range(n_packets):
            (ln,) = struct.unpack_from("<i", raw, pos)
            pos += 4
            packets.append(raw[pos : pos + ln])
            pos += ln
        (n_samples,) = struct.unpack_from("<q", raw, pos)
        pos += 8
        pcm = np.frombuffer(raw, "<f4", n_samples, pos)
        pos += 4 * n_samples
        cases.append(dict(ch=ch, sr=sr, frame=frame, packets=packets, pcm=pcm))
    return cases


CASES = load_cases()
CELT_CASES = [0, 1, 2, 3, 4, 5, 6, 7, 13]  # 13 = auto (chose CELT)
# 8/9 = SILK-WB 20 ms, 10 = 40 ms, 14 = 10 ms (nb_subfr=2),
# 15/16 = 60 ms (3-frame SILK groups)
SILK_CASES = [8, 9, 10, 14, 15, 16]
HYBRID_CASES = [11, 12, 17]  # 17 = 10 ms hybrid


def run_case(idx, tol=1e-4):
    from libnyquist_tpu.errors import DecodeError

    case = CASES[idx]
    dec = OpusDecoder(case["ch"])
    try:
        outs = [dec.decode_packet(p) for p in case["packets"]]
    except DecodeError as e:
        if "not yet implemented" in str(e):
            pytest.skip(str(e))
        raise
    mine = np.concatenate(outs, axis=0).reshape(-1)
    ref = case["pcm"]
    assert mine.size == ref.size, (mine.size, ref.size)
    err = np.abs(mine - ref).max()
    assert err < tol, f"case {idx}: max abs err {err}"


@pytest.mark.parametrize("idx", CELT_CASES)
def test_celt_only_cases(idx):
    if not CASES:
        pytest.skip("opus packet goldens not generated")
    run_case(idx)


@pytest.mark.parametrize("idx", SILK_CASES)
def test_silk_cases(idx):
    if not CASES:
        pytest.skip("opus packet goldens not generated")
    run_case(idx)


@pytest.mark.parametrize("idx", HYBRID_CASES)
def test_hybrid_cases(idx):
    if not CASES:
        pytest.skip("opus packet goldens not generated")
    run_case(idx)


def test_native_band_decode_matches_python(monkeypatch):
    """native/celt_bands.c must agree with the Python band decoder."""
    import numpy as np

    from libnyquist_tpu.formats.opus import celt
    from libnyquist_tpu.formats.opus.packet import parse_packet

    from .helpers import GOLDEN_DIR
    import struct

    path = GOLDEN_DIR / "opus_packets.bin"
    if not path.exists():
        import pytest

        pytest.skip("packet fixture missing")
    raw = path.read_bytes()
    pos = 4
    ch, sr, n_packets, frame = struct.unpack_from("<4i", raw, pos)
    pos += 16
    pkts = []
    for _ in range(min(n_packets, 40)):
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        pkts.append(raw[pos : pos + ln])
        pos += ln

    def run(no_native):
        if no_native:
            monkeypatch.setenv("LIBNYQUIST_NO_NATIVE_CELT", "1")
        else:
            monkeypatch.delenv("LIBNYQUIST_NO_NATIVE_CELT", raising=False)
        st = celt.CeltDecoderState(channels=ch)
        out = []
        for p in pkts:
            pkt = parse_packet(p)
            for fr in pkt.frames:
                out.append(
                    celt.celt_decode_frame_to_freq(st, fr, pkt.frame_size)[
                        "freq"
                    ]
                )
        return np.concatenate([f.ravel() for f in out])

    a = run(True)
    b = run(False)
    assert np.abs(a - b).max() < 1e-9


def test_native_silk_decode_matches_python(monkeypatch):
    """native/silk_dec.c must agree bit-for-bit with the Python SILK
    decoder (both are integer-exact, so equality is exact) on the
    SILK-only and hybrid golden cases."""
    from libnyquist_tpu.formats.opus import silk as silk_mod

    if silk_mod._native_silk() is None:
        pytest.skip("native SILK unavailable")
    if not CASES:
        pytest.skip("opus packet goldens not generated")

    def run():
        outs = []
        for idx in SILK_CASES + HYBRID_CASES:
            case = CASES[idx]
            dec = OpusDecoder(case["ch"])
            for p in case["packets"]:
                outs.append(dec.decode_packet(p).reshape(-1))
        return np.concatenate(outs)

    monkeypatch.setattr(
        silk_mod, "make_silk_decoder",
        lambda ch: silk_mod.SilkDecoder(ch))
    a = run()
    monkeypatch.undo()
    b = run()
    assert np.array_equal(a, b)
