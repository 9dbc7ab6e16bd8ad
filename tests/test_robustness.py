"""Malformed-input robustness across every format.

The reference's fault-injection corpus is the degenerate WAV set
(SURVEY.md §5); this extends the idea to all seven formats: truncations
and random byte corruptions must either decode (corruption may land in
payload) or raise a NyquistError — never an uncontrolled exception or a
hang.
"""

import pathlib

import numpy as np
import pytest

import libnyquist_tpu as nq
from libnyquist_tpu.errors import NyquistError

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
AD_HOC = pathlib.Path("/root/reference/test_data/ad_hoc")

CASES = [
    AD_HOC / "TestBeat_44_16_stereo-ima4.wav",
    AD_HOC / "KittyPurr16_Mono.flac",
    AD_HOC / "TestBeat_Int16.wv",
    AD_HOC / "44_16_mono.mpc",
    FIXTURES / "sv7_stereo.mpc",
    FIXTURES / "l2_stereo_44k.mp3",
    FIXTURES / "ms8ch.opus",
    AD_HOC / "TestBeatMono.ogg",
]


def _try(data: bytes, ext: str):
    try:
        nq.load(data, extension=ext)
    except NyquistError:
        pass  # controlled rejection is fine


@pytest.mark.parametrize("path", CASES, ids=lambda p: p.name)
def test_truncations(path):
    if not path.exists():
        pytest.skip(f"{path} missing")
    data = path.read_bytes()
    ext = path.suffix[1:]
    n = len(data)
    for frac in (0.01, 0.1, 0.45):
        _try(data[: max(4, int(n * frac))], ext)


@pytest.mark.parametrize("path", CASES, ids=lambda p: p.name)
def test_byte_corruption(path):
    if not path.exists():
        pytest.skip(f"{path} missing")
    data = bytearray(path.read_bytes()[:65536])  # cap cost per decode
    ext = path.suffix[1:]
    rng = np.random.default_rng(hash(path.name) & 0xFFFF)
    for _ in range(4):
        corrupted = bytearray(data)
        for _ in range(8):
            pos = int(rng.integers(0, len(corrupted)))
            corrupted[pos] = int(rng.integers(0, 256))
        _try(bytes(corrupted), ext)
