"""WavPack decoder vs libwavpack oracle — expected bit-exact (lossless)."""

import numpy as np
import pytest

import libnyquist_tpu as nq
from libnyquist_tpu.errors import DecodeError

from .helpers import load_golden


@pytest.mark.parametrize(
    "name",
    [
        "TestBeat_Int16", "TestBeat_Int24", "TestBeat_Int32",
        "TestBeat_Float32", "TestBeat_Int24_Mono", "TestBeat_Float32_Mono",
    ],
)
def test_wavpack(name, test_data_dir):
    audio = nq.load(str(test_data_dir / "ad_hoc" / f"{name}.wv"))
    g = load_golden(f"{name}_wv")
    assert audio.channel_count == int(g["channels"])
    assert audio.sample_rate == int(g["rate"])
    assert audio.sample_count == int(g["count"])
    assert np.abs(audio.samples - g["full"]).max() == 0.0  # lossless


def test_wavpack_python_fallback(test_data_dir, monkeypatch):
    """The pure-Python entropy/decorr/float paths must agree with native."""
    from libnyquist_tpu.runtime import native

    monkeypatch.setattr(native, "lib", lambda: None)
    audio = nq.load(
        str(test_data_dir / "ad_hoc" / "TestBeat_Float32_Mono.wv")
    )
    g = load_golden("TestBeat_Float32_Mono_wv")
    assert np.abs(audio.samples - g["full"]).max() == 0.0


def test_wavpack_bad_data():
    with pytest.raises(DecodeError):
        nq.load(b"not wavpack data at all" * 4, extension="wv")


@pytest.mark.parametrize(
    "name", ["hybrid_stereo", "hybrid_shape", "hybrid_mono"]
)
def test_wavpack_hybrid(name):
    """Hybrid (lossy) mode vs libwavpack — bit-exact reconstruction of
    the quantized stream (fixtures encoded with the reference encoder,
    tools built in /tmp; see tests/fixtures/)."""
    import pathlib

    fixtures = pathlib.Path(__file__).parent / "fixtures"
    audio = nq.load(str(fixtures / f"{name}.wv"))
    g = load_golden(f"{name}_wv")
    assert audio.sample_count == int(g["count"])
    assert np.abs(audio.samples - g["full"]).max() == 0.0


def test_wavpack_hybrid_python_fallback(monkeypatch):
    import pathlib

    from libnyquist_tpu.runtime import native

    monkeypatch.setattr(native, "lib", lambda: None)
    fixtures = pathlib.Path(__file__).parent / "fixtures"
    audio = nq.load(str(fixtures / "hybrid_mono.wv"))
    g = load_golden("hybrid_mono_wv")
    assert np.abs(audio.samples - g["full"]).max() == 0.0
