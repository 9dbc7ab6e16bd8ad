"""Shared test helpers: golden fixture comparison."""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


def load_golden(name: str):
    path = GOLDEN_DIR / f"{name}.npz"
    if not path.exists():
        pytest.skip(f"golden fixture {name} not generated")
    return np.load(path)


def assert_matches_golden(audio, name: str, tol: float = 1e-4):
    """Compare an AudioData result against a stored reference decode."""
    g = load_golden(name)
    assert audio.channel_count == int(g["channels"])
    assert audio.sample_rate == int(g["rate"])
    assert audio.sample_count == int(g["count"]), (
        f"sample count {audio.sample_count} != golden {int(g['count'])}"
    )
    s = np.asarray(audio.samples, dtype=np.float32)
    if "full" in g.files:
        err = np.abs(s - g["full"]).max() if s.size else 0.0
        assert err < tol, f"max abs err {err} vs full golden"
    else:
        head = g["head"]
        err = np.abs(s[: head.size] - head).max()
        assert err < tol, f"max abs err {err} vs golden head"
        stride = g["stride997"]
        err = np.abs(s[::997] - stride).max()
        assert err < tol, f"max abs err {err} vs golden stride"
    total = s.astype(np.float64).sum()
    assert abs(total - float(g["sum64"])) < max(1e-2, tol * s.size), (
        f"sum {total} vs golden {float(g['sum64'])}"
    )
