"""Console entry point (libnyquist_tpu/cli.py — the packaged twin of
the reference example app, examples/src/Main.cpp)."""

import pathlib

import numpy as np
import pytest

from libnyquist_tpu import cli

REF = pathlib.Path("/root/reference/test_data/ad_hoc")
OPUS = REF / "detodos.opus"

pytestmark = pytest.mark.skipif(not OPUS.exists(),
                                reason="reference corpus absent")


def test_cli_decode_prints_len_sum(capsys):
    assert cli.main([str(OPUS)]) == 0
    out = capsys.readouterr().out
    assert "len: 139848" in out
    assert "1ch 48000Hz" in out


def test_cli_info_lazy(capsys):
    assert cli.main([str(OPUS), "--info"]) == 0
    out = capsys.readouterr().out
    assert "OggSeekReader: 139848" in out


def test_cli_save_wav_roundtrip(tmp_path, capsys):
    import libnyquist_tpu as nq

    out_wav = tmp_path / "out.wav"
    assert cli.main([str(OPUS), "--save", str(out_wav)]) == 0
    ref = nq.load(str(OPUS))
    got = nq.load(str(out_wav))
    assert got.sample_rate == ref.sample_rate
    assert got.sample_count == ref.sample_count
    # PCM_16 save: within one LSB of the float decode
    err = np.abs(np.asarray(got.samples) - np.asarray(ref.samples)).max()
    assert err < 2.0 / 32768


def test_cli_check_flags_wrong_oracle(tmp_path, capsys, monkeypatch):
    # detodos is not one of the three oracle files: --check must fail
    # and write the mismatch WAV like the reference app
    monkeypatch.chdir(tmp_path)
    assert cli.main([str(OPUS), "--check"]) == 1
    assert (tmp_path / "opusdec.wav").exists()
