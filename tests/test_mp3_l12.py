"""MPEG Layer I/II decode vs minimp3 oracle.

Fixtures are synthetic budget-tracked random streams (see
tools/gen_l12_streams.py) covering: L2 MPEG1 stereo/joint/mono-lowrate
(all three alloc tables), L1, and MPEG2 L2 (22.05 kHz alloc table).
"""

import pathlib

import numpy as np
import pytest

import libnyquist_tpu as nq

from .helpers import load_golden

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


@pytest.mark.parametrize(
    "name",
    [
        "l2_stereo_44k", "l2_joint_44k", "l2_mono_44k_56k",
        "l1_stereo_44k", "l2_mpeg2_22k",
    ],
)
def test_mp3_l12(name):
    g = load_golden(name)
    audio = nq.load(str(FIXTURES / f"{name}.mp3"))
    assert audio.channel_count == int(g["channels"])
    assert audio.sample_rate == int(g["rate"])
    assert audio.sample_count == int(g["count"])
    err = np.abs(audio.samples - g["full"]).max()
    # random scalefactors push values to ~8 fullscale; 1e-5 abs is ~1e-6 rel
    assert err < 1e-4, err
