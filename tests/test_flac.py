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
