"""WAV decoder tests against reference-decoded golden vectors.

Mirrors the reference's fixture strategy (SURVEY.md §4): the bit-depth ×
rate × channel WAV matrix, IMA-ADPCM files, and the degenerate error-path
fixtures.
"""

import pathlib

import numpy as np
import pytest

import libnyquist_tpu as nq

from .helpers import assert_matches_golden

TEST_DATA = pathlib.Path("/root/reference/test_data")

MATRIX = [
    (ch, rate, depth)
    for ch in ("1ch", "2ch")
    for rate in ("8000", "22050", "44100", "96000")
    for depth in ("8", "16", "24", "32", "64")
    if not (ch == "1ch" and rate != "44100")
    and not (ch == "2ch" and rate == "96000" and depth == "64")  # stripped blob
]


@pytest.mark.parametrize("ch,rate,depth", MATRIX)
def test_wav_matrix(ch, rate, depth, test_data_dir):
    path = test_data_dir / ch / rate / depth / "test.wav"
    if not path.exists():
        pytest.skip("fixture missing")
    audio = nq.load(str(path))
    assert_matches_golden(audio, f"{ch}_{rate}_{depth}_test")


@pytest.mark.parametrize(
    "name",
    [
        "TestBeat_44_16_stereo-ima4",
        "TestBeat_44_16_mono-ima4-reaper",
        "TestBeat_44_16_stereo-ima4-reaper",
        "Block-split-stereo-ima4-reaper",
        "6_channel_44k_16b",
        "Sequence44k_24b",
        "TestLaugh_Float32",
        "TestSine_24b",
        "TestSine_Float32",
        "TestTone_24b",
    ],
)
def test_wav_ad_hoc(name, test_data_dir):
    path = test_data_dir / "ad_hoc" / f"{name}.wav"
    if not path.exists():
        pytest.skip("fixture missing")
    audio = nq.load(str(path))
    assert_matches_golden(audio, name)


@pytest.mark.parametrize(
    "name", ["header_larger_than_file_size.wav", "junk_after_riff.wav"]
)
def test_degenerate_rejected(name, test_data_dir):
    # The reference rejects both: declared RIFF size inconsistent with the
    # true file size (WavDecoder.cpp:178-182). Verified against the oracle.
    path = test_data_dir / "degenerate" / name
    with pytest.raises(nq.NyquistError):
        nq.load(str(path))


def test_degenerate_tolerated(test_data_dir):
    # Whole-file chunk scanning tolerates an odd-length unknown chunk
    # (oracle decodes this fixture to 9 samples @ 8 kHz mono).
    path = test_data_dir / "degenerate" / "odd_length_random_chunk.wav"
    audio = nq.load(str(path))
    assert audio.sample_count == 9
    assert audio.sample_rate == 8000
    assert audio.channel_count == 1
    assert np.isfinite(audio.samples).all()


def test_load_from_buffer(test_data_dir):
    path = test_data_dir / "2ch" / "44100" / "16" / "test.wav"
    data = path.read_bytes()
    audio = nq.load(data)  # magic-sniffed, no extension
    assert_matches_golden(audio, "2ch_44100_16_test")
