"""Per-stage profiling harness (utils/profiling.py)."""

import pathlib

from libnyquist_tpu.utils.profiling import (
    StageProfile, profile_load, profile_opus_load)

TEST_DATA = pathlib.Path("/root/reference/test_data")


def test_stage_profile_report():
    p = StageProfile()
    p.record("a", 0.075)
    with p.time("b"):
        pass
    assert p.total >= 0.075
    rep = p.report()
    assert "a" in rep and "b" in rep and "total" in rep
    assert "75.00" in rep


def test_profile_opus_load(test_data_dir):
    import pytest

    data = (test_data_dir / "short.opus").read_bytes()
    try:
        prof = profile_opus_load(data)
    except ValueError:
        # the whole-native scan path is disabled (NO_NATIVE_* run)
        pytest.skip("native CELT scan unavailable; profile_load covers")
    names = [n for n, _ in prof.stages]
    assert "entropy decode (C)" in names
    assert "synthesis (GEMM+comb)" in names
    assert prof.total > 0


def test_profile_load(test_data_dir):
    prof = profile_load(str(test_data_dir / "ad_hoc" / "TestBeat.ogg"))
    assert [n for n, _ in prof.stages] == ["read file", "decode"]
