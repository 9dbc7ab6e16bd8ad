"""Batched polyphase SRC: tone SNR, lengths, batching, parity resamplers.

The reference has no polyphase SRC (only the low-quality linear/hermite
helpers in Common.h:220-261); this is the BASELINE-required added
capability, so it is validated against analytic sinusoids.
"""

import numpy as np
import pytest


def _tone_snr(sr_in, sr_out, freq, seconds=1.5):
    from libnyquist_tpu.ops.src import resample

    t = np.arange(int(sr_in * seconds)) / sr_in
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    y = np.array(resample(x, sr_in, sr_out))
    n = len(y)
    ideal = np.sin(2 * np.pi * freq * np.arange(n) / sr_out)
    sl = slice(3000, n - 3000)
    err = y[sl] - ideal[sl]
    return 10 * np.log10(np.mean(ideal[sl] ** 2) / np.mean(err ** 2)), n


@pytest.mark.parametrize(
    "sr_in,sr_out,freq",
    [
        (48000, 44100, 440.0), (48000, 44100, 15000.0),
        (44100, 48000, 1000.0), (48000, 16000, 6000.0),
        (16000, 48000, 5000.0), (48000, 24000, 9000.0),
    ],
)
def test_src_tone_snr(sr_in, sr_out, freq):
    snr, n = _tone_snr(sr_in, sr_out, freq)
    assert n == round(int(sr_in * 1.5) * sr_out / sr_in)
    assert snr > 80.0, f"SNR {snr:.1f} dB"


def test_src_batched_matches_single():
    from libnyquist_tpu.ops.src import resample

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 9600)).astype(np.float32)
    yb = np.array(resample(x, 48000, 44100))
    for i in range(3):
        yi = np.array(resample(x[i], 48000, 44100))
        assert np.abs(yb[i] - yi).max() < 1e-6


def test_src_passthrough():
    from libnyquist_tpu.ops.src import resample

    x = np.random.default_rng(1).standard_normal(1000).astype(np.float32)
    y = np.array(resample(x, 48000, 48000))
    assert np.array_equal(x, y)


def test_naive_resamplers():
    from libnyquist_tpu.ops.src import hermite_resample, linear_resample

    t = np.arange(4800) / 48000
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    for fn, tol in ((linear_resample, 5e-3), (hermite_resample, 1e-3)):
        y = np.array(fn(x, 4410))
        ideal = np.sin(2 * np.pi * 440 * np.arange(4410) / 44100)
        assert np.abs(y[:-2] - ideal[:-2]).max() < tol
