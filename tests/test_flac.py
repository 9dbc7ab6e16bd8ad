"""FLAC decoder vs libFLAC oracle — expected bit-exact (lossless)."""

import numpy as np
import pytest

import libnyquist_tpu as nq

from .helpers import assert_matches_golden, load_golden


@pytest.mark.parametrize(
    "name",
    [
        "KittyPurr16_Mono", "KittyPurr16_Stereo", "KittyPurr24_Stereo",
        "KittyPurr8_Stereo", "KittyPurr8_Stereo_Dithered",
    ],
)
def test_flac(name, test_data_dir):
    audio = nq.load(str(test_data_dir / "ad_hoc" / f"{name}.flac"))
    g = load_golden(f"{name}_flac")
    assert audio.sample_count == int(g["count"])
    ref = g["full"] if "full" in g.files else None
    if ref is not None:
        assert np.abs(audio.samples - ref).max() == 0.0  # lossless
    else:
        assert_matches_golden(audio, f"{name}_flac")


def test_flac_md5_checking(test_data_dir, monkeypatch):
    """STREAMINFO MD5 verification (libFLAC md5_checking; off by
    default like FLAC__stream_decoder_set_md5_checking)."""
    from libnyquist_tpu.errors import DecodeError

    monkeypatch.setenv("LIBNYQUIST_FLAC_MD5", "1")
    for name in ("KittyPurr16_Stereo", "KittyPurr24_Stereo",
                 "KittyPurr8_Stereo"):
        nq.load(str(test_data_dir / "ad_hoc" / f"{name}.flac"))

    data = bytearray(
        (test_data_dir / "ad_hoc" / "KittyPurr8_Stereo.flac").read_bytes()
    )
    data[-40] ^= 0x40  # corrupt audio data far from the headers
    with pytest.raises(DecodeError):
        nq.load(bytes(data), extension="flac")


def test_native_stream_matches_python(test_data_dir, monkeypatch):
    """native/flac_stream.c (whole-stream frame decode) vs the Python
    frame loop it mirrors: bit-exact on every corpus fixture."""
    from libnyquist_tpu.runtime import native

    if native.lib() is None:
        pytest.skip("no native toolchain")
    for name in ("KittyPurr16_Mono", "KittyPurr16_Stereo",
                 "KittyPurr24_Stereo", "KittyPurr8_Stereo",
                 "KittyPurr8_Stereo_Dithered"):
        data = (test_data_dir / "ad_hoc" / f"{name}.flac").read_bytes()
        a = nq.load(data, extension="flac")
        monkeypatch.setenv("LIBNYQUIST_NO_NATIVE_FLAC", "1")
        b = nq.load(data, extension="flac")
        monkeypatch.delenv("LIBNYQUIST_NO_NATIVE_FLAC")
        assert a.sample_count == b.sample_count, name
        assert np.array_equal(a.samples, b.samples), name


def test_native_stream_resume_growth(test_data_dir, monkeypatch):
    """Unknown-total streams (STREAMINFO total_samples = 0) exercise the
    native decoder's grow-and-resume path: the initial output buffer is
    sized from the input length, which undershoots for well-compressed
    audio, so the C call must stop at a frame boundary and resume."""
    from libnyquist_tpu.runtime import native

    if native.lib() is None:
        pytest.skip("no native toolchain")
    src = (test_data_dir / "ad_hoc" / "KittyPurr16_Stereo.flac")
    data = bytearray(src.read_bytes())
    # STREAMINFO: 'fLaC' + 4-byte block header, body byte 13 low nibble
    # + bytes 14..17 hold total_samples (36 bits) — zero them
    body = 8
    data[body + 13] &= 0xF0
    data[body + 14 : body + 18] = b"\x00" * 4
    ref = nq.load(src.read_bytes(), extension="flac")
    a = nq.load(bytes(data), extension="flac")
    assert a.sample_count == ref.sample_count
    assert np.array_equal(a.samples, ref.samples)
    monkeypatch.setenv("LIBNYQUIST_NO_NATIVE_FLAC", "1")
    b = nq.load(bytes(data), extension="flac")
    assert np.array_equal(a.samples, b.samples)


def test_lying_total_samples_bounded(test_data_dir):
    """A corrupt 36-bit STREAMINFO total_samples must not drive a huge
    output pre-allocation (192 GiB on the found fuzz case); the decoder
    starts bounded and grows from actual frame content, and the trim
    keeps the (lying, larger) total harmless."""
    src = test_data_dir / "ad_hoc" / "KittyPurr8_Stereo_Dithered.flac"
    ref = nq.load(src.read_bytes(), extension="flac")
    data = bytearray(src.read_bytes())
    body = 8
    data[body + 13] |= 0x0F          # total_samples -> ~2^36
    data[body + 14 : body + 18] = b"\xff" * 4
    a = nq.load(bytes(data), extension="flac")
    assert a.sample_count == ref.sample_count
    assert np.array_equal(a.samples, ref.samples)


def test_ogg_flac(test_data_dir):
    """Ogg-encapsulated FLAC (reference: FLAC/src/ogg_decoder_aspect.c,
    mapping per ogg_mapping.c).  Fixture muxed by tools/gen_ogg_flac.py
    from a corpus file; decode must be bit-identical to the native
    .flac through every dispatch route (path ext, magic sniff, and an
    .ogg extension that re-sniffs to the FLAC subtype)."""
    import pathlib

    ref = nq.load(
        str(test_data_dir / "ad_hoc" / "KittyPurr8_Stereo_Dithered.flac"))
    fix = pathlib.Path(__file__).parent / "fixtures" / "kitty8_dithered.oga"
    data = fix.read_bytes()
    for audio in (nq.load(str(fix)), nq.load(data),
                  nq.load(data, extension="ogg")):
        assert audio.sample_count == ref.sample_count
        assert audio.sample_rate == ref.sample_rate
        assert np.array_equal(audio.samples, ref.samples)
