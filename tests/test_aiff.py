"""AIFF / AIFF-C / CAF container tests.

The reference ships IMA4-compressed Apple-container fixtures
(test_data/ad_hoc/TestBeat_44_16_stereo-ima4.{aiff,caf}) that nothing in
the fork can decode. The ima4 scan kernel (ops/adpcm.decode_ima4_nibbles)
is validated bit-exactly against a scalar decoder written straight from
the IMA spec (predictor saturates at the int16 rails, step index clips to
[0,88]); the container fixtures — which are different-length edits of the
same material, so no cross-container golden exists — are checked for
decode sanity (stereo coherence, scale, duration implied by payload).
The AIFF writer (reference parity: examples/src/AudioFile.h:105) is
validated by round-trip through our reader.
"""

import numpy as np
import pytest

import libnyquist_tpu as nq
from libnyquist_tpu.audio_data import AudioData, PCMFormat
from libnyquist_tpu.encoders import (
    EncoderParams,
    encode_aiff_to_buffer,
)
from libnyquist_tpu.ops.adpcm import (
    IMA_INDEX_TABLE,
    IMA_STEP_TABLE,
    decode_ima4_nibbles,
)

BASE = "TestBeat_44_16_stereo-ima4"


def _scalar_ima4(nibbles, pred, step):
    """Spec-derived serial IMA decoder with saturating predictor."""
    out = np.empty(len(nibbles), np.int32)
    for i, nb in enumerate(nibbles):
        s = IMA_STEP_TABLE[step]
        diff = s >> 3
        if nb & 4:
            diff += s
        if nb & 2:
            diff += s >> 1
        if nb & 1:
            diff += s >> 2
        pred = pred - diff if nb & 8 else pred + diff
        pred = min(max(pred, -32768), 32767)
        step = min(max(step + IMA_INDEX_TABLE[nb], 0), 88)
        out[i] = pred
    return out


def test_ima4_scan_matches_scalar_spec():
    rng = np.random.default_rng(7)
    B, S = 8, 64
    nibbles = rng.integers(0, 16, (B, S)).astype(np.int32)
    # include rail-hugging initial predictors to exercise saturation
    preds = np.array([0, 100, -32768, 32767, -32700, 32700, 5, -5],
                     np.int32)
    steps = np.array([0, 88, 40, 88, 80, 85, 1, 2], np.int32)
    import jax.numpy as jnp

    got = np.asarray(
        decode_ima4_nibbles(jnp.asarray(nibbles), jnp.asarray(preds),
                            jnp.asarray(steps)))
    for b in range(B):
        want = _scalar_ima4(nibbles[b], int(preds[b]), int(steps[b]))
        np.testing.assert_array_equal(got[b], want)


@pytest.mark.parametrize("ext", ["aiff", "caf"])
def test_ima4_fixture_decodes_sane(test_data_dir, ext):
    a = nq.load(str(test_data_dir / "ad_hoc" / f"{BASE}.{ext}"))
    assert a.channel_count == 2
    assert a.sample_rate == 44100
    assert a.sample_count > 400_000
    s = a.samples
    assert np.isfinite(s).all()
    assert float(np.abs(s).max()) <= 1.01
    # music: channels strongly correlated; garbage decode decorrelates
    cc = np.corrcoef(s[0::2], s[1::2])[0, 1]
    assert cc > 0.9, f"L/R corrcoef {cc}"


def _tone(frames=4410, ch=2, rate=44100):
    t = np.arange(frames, dtype=np.float32) / rate
    chans = [0.5 * np.sin(2 * np.pi * (440.0 + 100 * k) * t)
             for k in range(ch)]
    inter = np.stack(chans, 1).reshape(-1).astype(np.float32)
    return AudioData(samples=inter, channel_count=ch, sample_rate=rate)


@pytest.mark.parametrize(
    "fmt,tol",
    [
        (PCMFormat.PCM_16, 1 / 30000.0),
        (PCMFormat.PCM_24, 1 / 8_000_000.0),
        (PCMFormat.PCM_32, 1e-7),
    ],
)
def test_aiff_roundtrip(fmt, tol):
    audio = _tone()
    buf = encode_aiff_to_buffer(
        EncoderParams(channel_count=2, target_format=fmt), audio)
    back = nq.load(buf, extension="aiff")
    assert back.channel_count == 2
    assert back.sample_rate == 44100
    assert back.sample_count == audio.sample_count
    err = np.abs(np.asarray(back.samples) - audio.samples).max()
    assert err <= tol, f"{fmt}: {err}"


def test_aiff_float_rejected():
    audio = _tone()
    with pytest.raises(ValueError):
        encode_aiff_to_buffer(
            EncoderParams(channel_count=2, target_format=PCMFormat.PCM_FLT),
            audio)


def test_aiff_magic_sniff():
    audio = _tone(frames=441)
    buf = encode_aiff_to_buffer(
        EncoderParams(channel_count=2, target_format=PCMFormat.PCM_16),
        audio)
    back = nq.load(buf)  # no extension: magic-number dispatch
    assert back.sample_rate == 44100
