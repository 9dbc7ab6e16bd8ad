"""IMDCT core validation.

Three layers, mirroring the reference's own test strategy (SURVEY.md §4):
 1. The bundled golden IFFT vectors (test_data/ifft_*_N{60,480}.bin, the two
    CELT IFFT sizes) validate the FFT convention.
 2. C golden vectors for clt_mdct_backward (tests/golden/mdct/*, generated
    by tools/mdct_golden.c from the reference lib) validate the NumPy port
    at every (shift, stride) the CELT decoder uses.
 3. The fused matmul+overlap-add op is validated against chained sequential
    application of the NumPy port.
"""

import pathlib
import struct

import numpy as np
import pytest

from libnyquist_tpu.ops import imdct

GOLDEN = pathlib.Path(__file__).parent / "golden" / "mdct"
TEST_DATA = pathlib.Path("/root/reference/test_data")


def read_mdct_case(path):
    raw = path.read_bytes()
    N, overlap, stride, n_frames = struct.unpack_from("<4i", raw, 0)
    off = 16
    n2 = N // 2
    in_len, out_len = n2 * stride, n2 + overlap
    frames = []
    for _ in range(n_frames):
        x = np.frombuffer(raw, "<f4", in_len, off)
        off += 4 * in_len
        pre = np.frombuffer(raw, "<f4", out_len, off)
        off += 4 * out_len
        post = np.frombuffer(raw, "<f4", out_len, off)
        off += 4 * out_len
        frames.append((x, pre, post))
    return N, overlap, stride, frames


@pytest.mark.parametrize("n", [60, 480])
def test_golden_ifft_vectors(n):
    """kiss_fft's opus_ifft is an unnormalized inverse DFT
    (reference: celt/kiss_fft.c:696); np.fft.ifft * N must match."""
    fin = TEST_DATA / f"ifft_input_N{n}.bin"
    fout = TEST_DATA / f"ifft_output_N{n}.bin"
    if not fin.exists():
        pytest.skip("golden ifft vectors unavailable")
    x = np.frombuffer(fin.read_bytes(), "<f4").astype(np.float64)
    y = np.frombuffer(fout.read_bytes(), "<f4").astype(np.float64)
    xc = x[0::2] + 1j * x[1::2]
    yc = y[0::2] + 1j * y[1::2]
    mine = np.fft.ifft(xc) * n
    err = np.abs(np.stack([mine.real, mine.imag], -1).reshape(-1) -
                 np.stack([yc.real, yc.imag], -1).reshape(-1)).max()
    assert err < 1e-3 * max(1.0, np.abs(yc).max()), err


@pytest.mark.parametrize(
    "case",
    [
        "mdct_shift0_stride1",
        "mdct_shift1_stride1",
        "mdct_shift2_stride1",
        "mdct_shift3_stride1",
        "mdct_shift3_stride8",
    ],
)
def test_numpy_port_vs_c_golden(case):
    path = GOLDEN / f"{case}.bin"
    if not path.exists():
        pytest.skip("mdct golden vectors not generated")
    N, overlap, stride, frames = read_mdct_case(path)
    n2, half = N // 2, overlap // 2
    for x, pre, post in frames:
        spec = x[::stride][:n2]
        out = imdct.celt_imdct_reference(
            spec, N, overlap, prev_tail=pre[:half]
        )
        # Reference writes only [0, n2 + overlap/2); compare that region.
        lim = n2 + half
        err = np.abs(out[:lim] - post[:lim]).max()
        assert err < 2e-5 * max(1.0, np.abs(post).max()), (case, err)


@pytest.mark.parametrize("N,B", [(1920, 1), (960, 1), (480, 1), (240, 1), (240, 8)])
def test_fused_batch_op_matches_sequential(N, B):
    """The one-matmul-per-frame op + shifted add must equal chaining the
    NumPy port frame by frame with carried tails."""
    rng = np.random.default_rng(7)
    overlap = 120
    n2 = N // 2
    F = 5
    spectra = rng.standard_normal((F, B * n2)).astype(np.float32)

    # Sequential oracle: emulate the CELT decode buffer.
    total = F * B * n2 + overlap
    buf = np.zeros(total, dtype=np.float64)
    pos = 0
    for f in range(F):
        for b in range(B):
            spec = spectra[f, b::B] if B > 1 else spectra[f]
            out = imdct.celt_imdct_reference(
                spec.astype(np.float64), N, overlap,
                prev_tail=buf[pos : pos + overlap // 2].copy(),
            )
            buf[pos : pos + n2 + overlap] = out
            # Mirror only wrote [0, ov); post-rotate [ov/2, ov/2+n2);
            # region beyond n2+ov/2 must keep old contents (zeros here).
            pos += n2

    pcm, tail = imdct.celt_imdct_batch(spectra, N, overlap, B=B)
    pcm = np.asarray(pcm)
    # Compare the fully-settled region (everything before the last tail).
    settle = F * B * n2 - overlap
    err = np.abs(pcm[:settle] - buf[:settle]).max()
    assert err < 1e-4, err
    # And the final carry tail must let the next batch continue the stream.
    pcm2, _ = imdct.celt_imdct_batch(
        spectra[:1], N, overlap, B=B, init_tail=tail
    )
    nxt = imdct.celt_imdct_reference(
        (spectra[0, ::B] if B > 1 else spectra[0]).astype(np.float64),
        N, overlap, prev_tail=buf[pos : pos + overlap // 2].copy(),
    )
    err2 = np.abs(np.asarray(pcm2)[:overlap] - nxt[:overlap]).max()
    assert err2 < 1e-4, err2
