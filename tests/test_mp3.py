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
