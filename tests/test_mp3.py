"""MP3 decoder vs minimp3 oracle (reference: BASELINE config #3)."""

import numpy as np
import pytest

import libnyquist_tpu as nq

from .helpers import assert_matches_golden


def test_acetylene_mp3(test_data_dir):
    audio = nq.load(str(test_data_dir / "ad_hoc" / "acetylene.mp3"))
    assert audio.sample_rate == 44100
    assert audio.channel_count == 2
    assert_matches_golden(audio, "acetylene_mp3")


def test_native_huffman_matches_python(test_data_dir, monkeypatch):
    """native/mp3_huff.c must agree bit-for-bit with the Python decoder."""
    import numpy as np

    import libnyquist_tpu as nq
    from libnyquist_tpu.formats import mp3 as M

    path = test_data_dir / "ad_hoc" / "acetylene.mp3"
    monkeypatch.setenv("LIBNYQUIST_NO_NATIVE_MP3", "1")
    M._native_lib.cache_clear()
    a = nq.load(str(path))
    monkeypatch.delenv("LIBNYQUIST_NO_NATIVE_MP3")
    M._native_lib.cache_clear()
    b = nq.load(str(path))
    assert np.abs(a.samples - b.samples).max() == 0.0
