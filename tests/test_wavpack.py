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


@pytest.mark.parametrize("name", ["dsd_fast", "dsd_high", "dsd_raw"])
def test_wavpack_dsd(name):
    """DSD blocks (reference unpack_dsd.c modes 1/3/0 respectively):
    entropy-decoded 1-bit stream, decimated 8:1 to 24-bit PCM at the
    byte rate — vs the reference decoder opened with OPEN_DSD_AS_PCM.
    The reference's own CMake never defines ENABLE_DSD, so the goldens
    come from a standalone build of its wavpack sources
    (tools/gen_dsd_wv.c, which also synthesizes the delta-sigma
    fixtures)."""
    import pathlib

    fixtures = pathlib.Path(__file__).parent / "fixtures"
    audio = nq.load(str(fixtures / f"{name}.wv"))
    g = load_golden(f"{name}_wv")
    assert audio.channel_count == int(g["channels"])
    assert audio.sample_rate == int(g["rate"]) == 352800
    assert audio.sample_count == int(g["count"])
    assert np.abs(audio.samples - g["full"]).max() == 0.0  # bit-exact


def test_wavpack_implausible_block_samples():
    """A corrupt block_samples u32 (e.g. 0xFFFFFFF from a flipped header
    byte) must raise quickly instead of driving the native DSD bit loop
    through billions of iterations (CPU-burn DoS found by the soak
    fuzzer; the reference relies on block checksums here —
    open_utils.c:1202 WavpackVerifySingleBlock)."""
    import pathlib
    import struct
    import time

    fixtures = pathlib.Path(__file__).parent / "fixtures"
    for name in ["dsd_high", "dsd_fast"]:
        data = bytearray((fixtures / f"{name}.wv").read_bytes())
        struct.pack_into("<I", data, 20, 0xFFFFFFF)  # block_samples
        t0 = time.monotonic()
        with pytest.raises(DecodeError):
            nq.load(bytes(data), extension="wv")
        assert time.monotonic() - t0 < 5.0


@pytest.mark.parametrize("name", ["dsd_fast", "dsd_high", "dsd_raw"])
def test_wavpack_dsd_bytes_native_and_python(name, monkeypatch):
    """The decoded DSD byte planes match the reference's
    OPEN_DSD_NATIVE output byte-for-byte, through BOTH the native
    plane (wv_dsd.c) and the pure-Python fallback."""
    import pathlib
    import struct

    from libnyquist_tpu.formats import wavpack as wv
    from libnyquist_tpu.runtime import native

    fixtures = pathlib.Path(__file__).parent / "fixtures"
    data = (fixtures / f"{name}.wv").read_bytes()
    g = load_golden(f"{name}_wv")

    def decode_bytes():
        chunks = []
        pos = 0
        while pos + 32 <= len(data):
            if data[pos : pos + 4] != b"wvpk":
                pos += 1
                continue
            (cksize, _ver, _iu8, _tu8, _tlo, _bidx, bsamp, flags,
             _crc) = struct.unpack_from("<IHBBIIIII", data, pos + 4)
            body = data[pos + 32 : pos + 8 + cksize]
            pos += 8 + cksize
            if bsamp:
                chunks.append(wv._decode_dsd_block(flags, bsamp, body)[0])
        return np.concatenate(chunks)

    nat = decode_bytes()
    assert np.array_equal(nat, g["native_bytes"])
    monkeypatch.setattr(native, "lib", lambda: None)
    py = decode_bytes()
    assert np.array_equal(py, g["native_bytes"])


@pytest.mark.parametrize(
    "name",
    [
        "TestBeat_Int16", "TestBeat_Int32", "TestBeat_Int24_Mono",
        "TestBeat_Float32",
    ],
)
def test_wavpack_simd_decorr_matches_scalar(name, test_data_dir,
                                            monkeypatch):
    """The cross-block SIMD decorrelation (native/wv_simd.c) must be
    bit-identical to the scalar per-block path on every lane, including
    the padded partial tail group."""
    path = str(test_data_dir / "ad_hoc" / f"{name}.wv")
    simd = nq.load(path)
    monkeypatch.setenv("LIBNYQUIST_NO_WV_SIMD", "1")
    scalar = nq.load(path)
    assert np.array_equal(simd.samples, scalar.samples)
