"""Musepack SV8 decoder vs libmpcdec oracle.

Golden fixtures are raw float output of libmpcdec (mpc_demux_decode);
our decoder replicates the SV8 bitstream and synthesis exactly, so the
only difference is float32-vs-float64 accumulation order (~3e-7).
"""

import numpy as np
import pytest

import libnyquist_tpu as nq
from libnyquist_tpu.errors import DecodeError

from .helpers import assert_matches_golden


@pytest.mark.parametrize(
    "name,fixture",
    [("44_16_mono", "mpc_mono"), ("44_16_stereo", "mpc_stereo")],
)
def test_musepack_sv8(name, fixture, test_data_dir):
    audio = nq.load(str(test_data_dir / "ad_hoc" / f"{name}.mpc"))
    assert_matches_golden(audio, fixture, tol=1e-5)


def test_musepack_bad_magic():
    with pytest.raises(DecodeError):
        nq.load(b"MPXX" + b"\x00" * 64, extension="mpc")


def test_musepack_truncated_header(test_data_dir):
    data = (test_data_dir / "ad_hoc" / "44_16_mono.mpc").read_bytes()
    with pytest.raises(DecodeError):
        nq.load(data[:5], extension="mpc")


def test_musepack_sv7():
    """Synthetic SV7 stream (tools/gen_sv7_stream.py) vs libmpcdec oracle."""
    import pathlib

    fixtures = pathlib.Path(__file__).parent / "fixtures"
    audio = nq.load(str(fixtures / "sv7_stereo.mpc"))
    assert_matches_golden(audio, "mpc_sv7", tol=1e-4)
