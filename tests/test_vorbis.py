"""Ogg Vorbis decoder vs libvorbis ov_read_float oracle."""

import numpy as np
import pytest

import libnyquist_tpu as nq

from .helpers import load_golden


@pytest.mark.parametrize(
    "name",
    [
        "TestLaugh_44k", "BlockWoosh_Stereo", "BlockSplit_Stereo",
        "LR_Stereo", "TestBeat", "TestBeatMono",
    ],
)
def test_vorbis(name, test_data_dir):
    audio = nq.load(str(test_data_dir / "ad_hoc" / f"{name}.ogg"))
    g = load_golden(f"{name}_ogg")
    assert audio.sample_count == int(g["count"])
    assert audio.sample_rate == int(g["rate"])
    assert np.abs(audio.samples - g["full"][: audio.sample_count]).max() < 1e-4


def test_native_residue_matches_python(test_data_dir, monkeypatch):
    """native/vorbis_res.c must be bit-identical to the Python residue
    decode (same codebook walk, same end-of-packet semantics)."""
    from libnyquist_tpu.formats import vorbis

    path = str(test_data_dir / "ad_hoc" / "TestBeat.ogg")
    a = nq.load(path)
    monkeypatch.setenv("LIBNYQUIST_NO_NATIVE_VORBIS", "1")
    monkeypatch.setattr(vorbis, "_NATIVE_RES", None)
    monkeypatch.setattr(vorbis, "_NATIVE_RES_TRIED", False)
    monkeypatch.setattr(vorbis, "_SETUP_CACHE", {})  # drop cached native ctx
    b = nq.load(path)
    assert vorbis._NATIVE_RES is None  # fallback really exercised
    assert a.sample_count == b.sample_count
    assert np.abs(a.samples - b.samples).max() == 0.0


def test_chained_vorbis_links_concatenate(test_data_dir):
    """Chained Ogg Vorbis (two sequential links with distinct serials)
    concatenates like vorbisfile's ov_read across links."""
    da = (test_data_dir / "ad_hoc" / "LR_Stereo.ogg").read_bytes()
    db = (test_data_dir / "ad_hoc" / "BlockWoosh_Stereo.ogg").read_bytes()
    a = nq.load(da, extension="ogg")
    b = nq.load(db, extension="ogg")
    assert (a.channel_count, a.sample_rate) == (b.channel_count,
                                                b.sample_rate)
    ab = nq.load(da + db, extension="ogg")
    assert ab.channel_count == a.channel_count
    assert ab.sample_count == a.sample_count + b.sample_count
    assert np.array_equal(ab.samples[: a.sample_count], a.samples)
    assert np.array_equal(ab.samples[a.sample_count :], b.samples)
