"""StreamReader: opusfile-style positioned read/seek surface."""

import numpy as np
import pytest

import libnyquist_tpu as nq
from libnyquist_tpu.errors import DecodeError


def test_sequential_reads_match_load(test_data_dir):
    path = str(test_data_dir / "short.opus")
    full = nq.load(path)
    r = nq.StreamReader(path)
    assert r.sample_rate == full.sample_rate
    assert r.channel_count == full.channel_count
    assert r.pcm_total() * r.channel_count == full.sample_count
    chunks = []
    while True:
        c = r.read(1000)
        if c.shape[0] == 0:
            break
        chunks.append(c)
    got = np.concatenate(chunks).reshape(-1)
    assert np.array_equal(got, full.samples)


def test_seek_is_sample_exact(test_data_dir):
    path = str(test_data_dir / "ad_hoc" / "TestLaugh_44k.ogg")
    full = nq.load(path)
    ref = np.asarray(full.samples, np.float32).reshape(
        -1, full.channel_count)
    r = nq.StreamReader(path)
    for pos in (0, 1, 4097, r.pcm_total() - 10):
        r.pcm_seek(pos)
        assert r.pcm_tell() == pos
        c = r.read(256)
        assert np.array_equal(c, ref[pos : pos + 256])
    r.time_seek(0.5)
    assert r.pcm_tell() == full.sample_rate // 2
    assert r.time_tell() == pytest.approx(0.5, abs=1e-4)


def test_seek_bounds(test_data_dir):
    r = nq.StreamReader(str(test_data_dir / "short.opus"))
    with pytest.raises(DecodeError):
        r.pcm_seek(-1)
    with pytest.raises(DecodeError):
        r.pcm_seek(r.pcm_total() + 1)
    r.pcm_seek(r.pcm_total())
    assert r.read(100).shape[0] == 0


def test_iter_chunks(test_data_dir):
    r = nq.StreamReader(str(test_data_dir / "short.opus"))
    total = sum(c.shape[0] for c in r)
    assert total == r.pcm_total()
