"""iy-split trace + replay vs the full native decode (DESIGN_iy_split.md).

The bits-only native trace decode (celt_decode_stream_trace) plus the
float64 NumPy replayer must reproduce celt_decode_stream's denormalised
spectra to float32 rounding, with identical decoder state evolution —
this is the reference chain the JAX device replay is validated against.
Reference spec: third_party/opus/celt/bands.c quant_all_bands value
plane (bands.c:653), vq.c/cwrs.c, anti_collapse (bands.c:284).
"""

import pathlib
import struct

import numpy as np
import pytest

import libnyquist_tpu  # noqa: F401
from libnyquist_tpu.formats import ogg as oggmod
from libnyquist_tpu.formats.opus import iy_split
from libnyquist_tpu.formats.opus.celt import (
    CeltDecoderState, celt_decode_stream_raw, _native_celt,
)
from libnyquist_tpu.formats.opus.decoder import _endband_for_bandwidth
from libnyquist_tpu.formats.opus.packet import parse_packet

pytestmark = pytest.mark.skipif(
    _native_celt() is None, reason="native host library unavailable")


def _frames_from_ogg(data):
    streams = oggmod.demux(data)
    st = oggmod.first_stream_matching(streams, b"OpusHead")
    frames, sizes, ends, chs = [], [], [], []
    for pkt in st.packets[2:]:
        if not pkt.data:
            continue
        parsed = parse_packet(pkt.data)
        eb = _endband_for_bandwidth(parsed.bandwidth)
        for fr in parsed.frames:
            frames.append(fr)
            sizes.append(parsed.frame_size)
            ends.append(eb)
            chs.append(parsed.stream_channels)
    return frames, sizes, ends, chs


def _frames_from_golden(path):
    raw = path.read_bytes()
    pos = 4
    ch, _sr, n_packets, _frame = struct.unpack_from("<4i", raw, pos)
    pos += 16
    frames, sizes, ends, chs = [], [], [], []
    for _ in range(n_packets):
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        pk = parse_packet(raw[pos : pos + ln])
        pos += ln
        eb = _endband_for_bandwidth(pk.bandwidth)
        for fr in pk.frames:
            frames.append(fr)
            sizes.append(pk.frame_size)
            ends.append(eb)
            chs.append(pk.stream_channels)
    return ch, frames, sizes, ends, chs


def _trace(st, frames, sizes, ends, chs, raw_iy=False, xs_heap=False,
           idx_mode=False):
    payload = b"".join(frames)
    lens = np.fromiter((len(f) for f in frames), np.int64, len(frames))
    offs = np.concatenate(([0], np.cumsum(lens[:-1])))
    return iy_split.celt_trace_stream_arrays(
        st, payload, offs, lens, np.asarray(sizes, np.int32),
        np.asarray(ends, np.int32), np.asarray(chs, np.int32),
        raw_iy=raw_iy, xs_heap=xs_heap, idx_mode=idx_mode)


def _check_replay(ch, frames, sizes, ends, chs):
    st1 = CeltDecoderState(channels=ch)
    freq_ref = celt_decode_stream_raw(st1, frames, sizes, ends, chs)[0]
    st2 = CeltDecoderState(channels=ch)
    tr = _trace(st2, frames, sizes, ends, chs)
    assert tr is not None
    freq_rep = iy_split.replay_numpy(tr)
    d = np.abs(freq_rep.astype(np.float64) - freq_ref.astype(np.float64))
    rel = (d / (1.0 + np.abs(freq_ref))).max()
    assert rel < 1e-6, f"replay relative error {rel}"
    # identical state evolution (entropy plane untouched by the split)
    assert np.array_equal(st1.oldEBands, st2.oldEBands)
    assert st1.rng == st2.rng
    return tr


def test_replay_golden_corpus(golden_dir):
    ch, frames, sizes, ends, chs = _frames_from_golden(
        golden_dir / "opus_packets.bin")
    tr = _check_replay(ch, frames, sizes, ends, chs)
    # the corpus must exercise stereo bands + anti-collapse
    assert (tr.bd_mode == 2).any()
    assert len(tr.ac_frame) > 0


def test_replay_short_opus(test_data_dir):
    data = (test_data_dir / "short.opus").read_bytes()
    frames, sizes, ends, chs = _frames_from_ogg(data)
    _check_replay(2, frames, sizes, ends, chs)


@pytest.mark.parametrize("frame_ms", [2.5, 5, 10])
def test_replay_small_frames(frame_ms):
    """Encoder-generated small-frame streams exercise LM 0-2 geometry
    (N=120/240/480) through the trace replay."""
    from libnyquist_tpu.formats.opus.celt_encoder import encode_ogg_opus

    rng = np.random.default_rng(5)
    sr = 48000
    t = np.arange(sr) / sr
    pcm = np.stack([
        0.4 * np.sin(2 * np.pi * 440 * t)
        + 0.1 * rng.standard_normal(sr),
        0.4 * np.sin(2 * np.pi * 660 * t)
        + 0.1 * rng.standard_normal(sr),
    ], axis=1).reshape(-1).astype(np.float32)
    data = encode_ogg_opus(pcm, 2, sr, bitrate_kbps=96,
                           frame_ms=frame_ms)
    frames, sizes, ends, chs = _frames_from_ogg(data)
    assert sizes[0] == int(120 * frame_ms / 2.5)
    _check_replay(2, frames, sizes, ends, chs)


def test_replay_sb_reverie_slice():
    """First 2000 frames of the reference headliner (transients, dual
    stereo, folds)."""
    import pathlib

    p = pathlib.Path("/root/reference/test_data/sb-reverie.opus")
    if not p.exists():
        pytest.skip("reference corpus unavailable")
    frames, sizes, ends, chs = _frames_from_ogg(p.read_bytes())
    tr = _check_replay(2, frames[:2000], sizes[:2000], ends[:2000],
                       chs[:2000])
    assert (tr.bd_mode == 4).any()      # dual stereo exercised
    assert (tr.lf_type == iy_split.LF_FOLD).any()


def test_replay_device_golden_corpus(golden_dir):
    """JAX device replay (ops/celt_replay.py) vs the full native decode
    on the golden corpus (runs on the virtual CPU mesh in CI; the bench
    exercises it on the real chip with the end-to-end oracle)."""
    from libnyquist_tpu.ops import celt_replay

    ch, frames, sizes, ends, chs = _frames_from_golden(
        golden_dir / "opus_packets.bin")
    st1 = CeltDecoderState(channels=ch)
    freq_ref = celt_decode_stream_raw(st1, frames, sizes, ends, chs)[0]
    st2 = CeltDecoderState(channels=ch)
    tr = _trace(st2, frames, sizes, ends, chs)
    freq_dev = np.asarray(celt_replay.replay_device(tr))
    d = np.abs(freq_dev.astype(np.float64) - freq_ref.astype(np.float64))
    rel = d / (1.0 + np.abs(freq_ref))
    # f32 device plane: bulk ~1e-5 in the freq domain = ~3e-10 on PCM
    # after the 1/32768 signal scale (BASELINE.md demands <1e-4 on PCM);
    # isolated positions hit f32 cancellation in the stereo merge
    assert rel.max() < 1e-3, f"device replay relative error {rel.max()}"
    assert (rel > 1e-4).mean() < 1e-5


def test_replay_device_raw_iy_golden(golden_dir):
    """Raw-iy traces (device-side spreading rotation + per-leaf gain,
    celt_replay rotate_plane pre-pass) vs the full native decode.  This
    is the production serving configuration (bench.py): the host emits
    only integer PVQ vectors and compact sub-segment markers; vq.c
    exp_rotation replays as masked segmented affine scans on device."""
    from libnyquist_tpu.ops import celt_replay

    ch, frames, sizes, ends, chs = _frames_from_golden(
        golden_dir / "opus_packets.bin")
    st1 = CeltDecoderState(channels=ch)
    freq_ref = celt_decode_stream_raw(st1, frames, sizes, ends, chs)[0]
    st2 = CeltDecoderState(channels=ch)
    tr = _trace(st2, frames, sizes, ends, chs, raw_iy=True)
    assert tr.raw_iy
    # float64 validation replayer understands raw traces too
    freq_np = iy_split.replay_numpy(tr)
    d = np.abs(freq_np.astype(np.float64) - freq_ref.astype(np.float64))
    assert (d / (1.0 + np.abs(freq_ref))).max() < 1e-6
    freq_dev = np.asarray(celt_replay.replay_device(tr))
    d = np.abs(freq_dev.astype(np.float64) - freq_ref.astype(np.float64))
    rel = d / (1.0 + np.abs(freq_ref))
    assert rel.max() < 1e-3, f"raw-iy device replay error {rel.max()}"
    assert (rel > 1e-4).mean() < 1e-5


def test_replay_device_xs_heap_golden(golden_dir):
    """Heap-mode traces (xs_heap=True, the bench/serving production
    config): the host emits ONLY the compact int16 value heap — no
    dense plane — and the device scatter pre-pass (celt_replay
    heap_spec: per-leaf delta fill-forward along the heap axis)
    rebuilds [F, 2, nmax] before the rotation."""
    from libnyquist_tpu.ops import celt_replay

    ch, frames, sizes, ends, chs = _frames_from_golden(
        golden_dir / "opus_packets.bin")
    st1 = CeltDecoderState(channels=ch)
    freq_ref = celt_decode_stream_raw(st1, frames, sizes, ends, chs)[0]
    st2 = CeltDecoderState(channels=ch)
    tr = _trace(st2, frames, sizes, ends, chs, raw_iy=True,
                xs_heap=True)
    assert tr.xs_heap and len(tr.iy_heap)
    # f64 validation replayer reads the heap directly
    freq_np = iy_split.replay_numpy(tr)
    d = np.abs(freq_np.astype(np.float64) - freq_ref.astype(np.float64))
    assert (d / (1.0 + np.abs(freq_ref))).max() < 1e-6
    freq_dev = np.asarray(celt_replay.replay_device(tr))
    d = np.abs(freq_dev.astype(np.float64) - freq_ref.astype(np.float64))
    rel = d / (1.0 + np.abs(freq_ref))
    assert rel.max() < 1e-3, f"heap-mode device replay error {rel.max()}"
    assert (rel > 1e-4).mean() < 1e-5


def test_replay_device_idx_mode_golden(golden_dir):
    """idx-mode traces (LF_PVQ_IDX, the serving production config):
    B<=1 PVQ leaves skip host cwrsi — the device kernel
    (celt_replay.cwrsi_kernel) expands codeword index -> pulse vector
    from the saturated-u32 U table, computes g = gain*rsqrt(Ryy), and
    the marker gains are fixed up per leaf.  Transient-frame leaves
    (value-dependent collapse masks) stay host-decoded."""
    from libnyquist_tpu.ops import celt_replay

    ch, frames, sizes, ends, chs = _frames_from_golden(
        golden_dir / "opus_packets.bin")
    st1 = CeltDecoderState(channels=ch)
    freq_ref = celt_decode_stream_raw(st1, frames, sizes, ends, chs)[0]
    st2 = CeltDecoderState(channels=ch)
    tr = _trace(st2, frames, sizes, ends, chs, raw_iy=True,
                xs_heap=True, idx_mode=True)
    assert tr.idx_mode
    assert (tr.lf_type == iy_split.LF_PVQ_IDX).sum() > 0
    # f64 validator expands idx leaves via the Python cwrsi spec
    freq_np = iy_split.replay_numpy(tr)
    d = np.abs(freq_np.astype(np.float64) - freq_ref.astype(np.float64))
    assert (d / (1.0 + np.abs(freq_ref))).max() < 1e-6
    freq_dev = np.asarray(celt_replay.replay_device(tr))
    d = np.abs(freq_dev.astype(np.float64) - freq_ref.astype(np.float64))
    rel = d / (1.0 + np.abs(freq_ref))
    assert rel.max() < 1e-3, f"idx-mode device replay error {rel.max()}"
    assert (rel > 1e-4).mean() < 1e-5


def test_cwrsi_kernel_matches_spec():
    """Device cwrsi vs the Python spec (celt.py cwrsi) over random
    (N, K, index) triples spanning the codebook ranges."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from libnyquist_tpu.formats.opus.celt import cwrsi as spec, pvq_v
    from libnyquist_tpu.ops.celt_replay import (
        cwrsi_kernel, pvq_u_table_u32)

    rng = np.random.default_rng(7)
    cases = []
    for N in (2, 3, 4, 5, 8, 16, 22, 44, 96, 176):
        for K in (1, 2, 4, 11, 40, 128):
            V = pvq_v(N, K)
            for _ in range(4):
                cases.append((N, K, int(rng.integers(0, min(V, 1 << 32)))))
    Lb = max(c[0] for c in cases)
    lanes = len(cases)
    n_v = np.array([c[0] for c in cases], np.int32)
    k_v = np.array([c[1] for c in cases], np.int32)
    i_v = np.array([c[2] for c in cases], np.uint32)
    utab = jnp.asarray(pvq_u_table_u32())
    iy, ryy = jax.jit(
        lambda n, k, i: cwrsi_kernel(jnp, lax, utab, n, k, i, Lb)
    )(n_v, k_v, i_v)
    iy = np.asarray(iy)
    for r, (N, K, idx) in enumerate(cases):
        want = np.asarray(spec(N, K, idx), np.float32)
        # kernel columns are tail-aligned: position j at Lb - N + j
        np.testing.assert_array_equal(iy[r, Lb - N :], want,
                                      err_msg=str((N, K, idx)))
        assert abs(float(np.asarray(ryy)[r]) - (want ** 2).sum()) < 1e-3


def test_batched_stream_program_matches_single(golden_dir):
    """serving.make_opus_stream_program_batched (K streams, one fused
    executable) must reproduce the single-stream program's per-row PCM
    sums for every row."""
    import jax

    from libnyquist_tpu.formats.opus.celt_tables import mode48000
    from libnyquist_tpu.ops import imdct as imdct_ops
    from libnyquist_tpu.ops.celt_replay import build_replay_arrays
    from libnyquist_tpu.runtime import serving

    ch, frames, sizes, ends, chs = _frames_from_golden(
        golden_dir / "opus_packets.bin")
    st = CeltDecoderState(channels=ch)
    tr = _trace(st, frames, sizes, ends, chs, raw_iy=True, xs_heap=True,
                idx_mode=True)
    arrs, _static, key = build_replay_arrays(tr)
    mode = mode48000()
    F = len(tr.fsz)
    N = int(tr.fsz[0])
    CC = tr.CC
    FC = 64
    n_steps = (F + FC - 1) // FC
    Fpad = n_steps * FC
    TA, gA, TB1, gB1 = serving.postfilter_params_arrays(
        tr.sb, tr.pfp, tr.pfg, tr.pft)

    def chunked(vals, fill, tail=()):
        out = np.full((Fpad,) + tail, fill, np.asarray(vals).dtype)
        out[:F] = vals
        return out.reshape((n_steps, FC) + tail)

    msk = np.zeros(Fpad, np.float32)
    msk[:F] = np.asarray(tr.sb) != 0
    B_short = int(tr.sb.max()) if len(tr.sb) else 1
    T1m, T1p, _ = imdct_ops.celt_synthesis_matrices_paired(
        2 * N, mode.overlap, 1)
    T8m, T8p, _ = imdct_ops.celt_synthesis_matrices_paired(
        2 * mode.shortMdctSize, mode.overlap, max(B_short, 1))
    synth1 = {
        "msk": msk.reshape(n_steps, FC),
        "TA": chunked(TA, 15), "gA": chunked(gA, 0.0, (3,)),
        "TB1": chunked(TB1, 15), "gB1": chunked(gB1, 0.0, (3,)),
        "fade": serving._fade_pattern(N, mode.overlap,
                                      mode.shortMdctSize),
        "T1m": T1m, "T1p": T1p, "T8m": T8m, "T8p": T8p,
    }
    single = serving.make_opus_stream_program(
        key, F, N, CC, n_steps, FC, mode.overlap, mode.shortMdctSize)
    acc1 = np.asarray(single(arrs, synth1))

    K = 3
    arrsK = {k: np.broadcast_to(v[None], (K,) + v.shape).copy()
             for k, v in arrs.items()}
    synthK = dict(synth1)
    for k in ("msk", "TA", "gA", "TB1", "gB1"):
        synthK[k] = np.broadcast_to(
            synth1[k][None], (K,) + synth1[k].shape).copy()
    batched = serving.make_opus_stream_program_batched(
        key, K, F, N, CC, n_steps, FC, mode.overlap, mode.shortMdctSize)
    accK = np.asarray(batched(arrsK, synthK))
    assert accK.shape == (K, CC)
    for k in range(K):
        np.testing.assert_allclose(accK[k], acc1, rtol=0, atol=1e-3)


def test_native_rotation_markers_match_python(golden_dir):
    """Native marker emission (celt_bands.c emit_rot_markers) must be
    bit-identical to the Python spec (celt_replay._rotation_markers)
    up to ordering (the device scatter is order-insensitive: marker
    positions are unique)."""
    from libnyquist_tpu.formats.opus.celt_tables import mode48000
    from libnyquist_tpu.ops import celt_replay

    ch, frames, sizes, ends, chs = _frames_from_golden(
        golden_dir / "opus_packets.bin")
    st = CeltDecoderState(channels=ch)
    tr = _trace(st, frames, sizes, ends, chs, raw_iy=True)
    assert tr.rot_rows is not None and len(tr.rot_rows)

    mode = mode48000()
    nb = mode.nbEBands
    eB = np.asarray(mode.eBands, np.int64)[: nb + 1]
    LM = int(np.log2(int(tr.fsz[0]) // mode.shortMdctSize))
    band_off = ((1 << LM) * eB).astype(np.int64)
    rows, cols, pk, th, g, sigmas = celt_replay._rotation_markers(
        tr, band_off, nb)
    assert tuple(sigmas) == tuple(tr.rot_sigmas)
    assert len(rows) == len(tr.rot_rows)

    def order(r, c, p, t, gg):
        key = np.lexsort((p, c, r))
        return (r[key], c[key], p[key], t[key], gg[key])

    a = order(rows, cols, pk, th, g)
    b = order(tr.rot_rows, tr.rot_cols, tr.rot_pk, tr.rot_th, tr.rot_g)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_replay_device_raw_iy_transients():
    """Raw-iy device replay across LM 0-2 with transients (multi-block
    exp_rotation sub-segments + theta-split coverage gaps)."""
    from libnyquist_tpu.formats.opus.celt_encoder import encode_ogg_opus
    from libnyquist_tpu.ops import celt_replay

    rng = np.random.default_rng(11)
    sr = 48000
    t = np.arange(sr // 2) / sr
    burst = (rng.standard_normal(len(t)) *
             (1 + 5 * (np.sin(2 * np.pi * 7 * t) > 0.9)))
    pcm = np.stack([
        0.4 * np.sin(2 * np.pi * 500 * t) + 0.15 * burst,
        0.4 * np.sin(2 * np.pi * 750 * t) + 0.15 * burst,
    ], axis=1).reshape(-1).astype(np.float32)
    for frame_ms in (5, 10, 20):
        data = encode_ogg_opus(pcm, 2, sr, bitrate_kbps=128,
                               frame_ms=frame_ms)
        frames, sizes, ends, chs = _frames_from_ogg(data)
        st1 = CeltDecoderState(channels=2)
        freq_ref = celt_decode_stream_raw(st1, frames, sizes, ends,
                                          chs)[0]
        st2 = CeltDecoderState(channels=2)
        tr = _trace(st2, frames, sizes, ends, chs, raw_iy=True)
        freq_dev = np.asarray(celt_replay.replay_device(tr))
        d = np.abs(freq_dev.astype(np.float64)
                   - freq_ref.astype(np.float64))
        rel = d / (1.0 + np.abs(freq_ref))
        assert rel.max() < 1e-3, (frame_ms, rel.max())


def test_replay_device_small_frames():
    """Device replay across LM 0-2 geometry."""
    from libnyquist_tpu.formats.opus.celt_encoder import encode_ogg_opus
    from libnyquist_tpu.ops import celt_replay

    rng = np.random.default_rng(7)
    sr = 48000
    t = np.arange(sr // 2) / sr
    pcm = np.stack([
        0.5 * np.sin(2 * np.pi * 500 * t)
        + 0.2 * rng.standard_normal(len(t)),
        0.5 * np.sin(2 * np.pi * 750 * t)
        + 0.2 * rng.standard_normal(len(t)),
    ], axis=1).reshape(-1).astype(np.float32)
    for frame_ms in (2.5, 5, 10):
        data = encode_ogg_opus(pcm, 2, sr, bitrate_kbps=128,
                               frame_ms=frame_ms)
        frames, sizes, ends, chs = _frames_from_ogg(data)
        st1 = CeltDecoderState(channels=2)
        freq_ref = celt_decode_stream_raw(st1, frames, sizes, ends,
                                          chs)[0]
        st2 = CeltDecoderState(channels=2)
        tr = _trace(st2, frames, sizes, ends, chs)
        freq_dev = np.asarray(celt_replay.replay_device(tr))
        d = np.abs(freq_dev.astype(np.float64)
                   - freq_ref.astype(np.float64))
        rel = d / (1.0 + np.abs(freq_ref))
        assert rel.max() < 1e-3, (frame_ms, rel.max())
        assert (rel > 1e-4).mean() < 1e-4, frame_ms


def test_native_pack_matches_python(golden_dir):
    """native/replay_pack.c (the O(n) C bucket packer) produces
    bit-identical replay arrays to the NumPy fallback path — every
    key, every element, and the same static program key."""
    from libnyquist_tpu.ops import celt_replay

    ch, frames, sizes, ends, chs = _frames_from_golden(
        golden_dir / "opus_packets.bin")
    st = CeltDecoderState(channels=ch)
    tr = _trace(st, frames, sizes, ends, chs, raw_iy=True,
                xs_heap=True, idx_mode=True)
    assert celt_replay._native_pack() is not None

    a_nat, _, k_nat = celt_replay.build_replay_arrays(tr)
    orig = celt_replay._native_pack
    try:
        celt_replay._native_pack = lambda: None
        a_py, _, k_py = celt_replay.build_replay_arrays(tr)
    finally:
        celt_replay._native_pack = orig
    assert k_nat == k_py
    assert set(a_nat) == set(a_py)
    for key in a_nat:
        assert np.array_equal(np.asarray(a_nat[key]),
                              np.asarray(a_py[key])), key


def test_batched_stream_program_stage_variants(golden_dir):
    """The bench stage-split variants (with_synth/with_comb/with_deemph
    static switches) must compile, keep the [K, CC] output contract,
    and the all-on variant must be bit-identical to the default
    program (the switches exist for subtraction timing only —
    bench.py _opus_stage_split)."""
    from libnyquist_tpu.formats.opus.celt_tables import mode48000
    from libnyquist_tpu.ops import imdct as imdct_ops
    from libnyquist_tpu.ops.celt_replay import build_replay_arrays
    from libnyquist_tpu.runtime import serving

    ch, frames, sizes, ends, chs = _frames_from_golden(
        golden_dir / "opus_packets.bin")
    st = CeltDecoderState(channels=ch)
    tr = _trace(st, frames, sizes, ends, chs, raw_iy=True, xs_heap=True,
                idx_mode=True)
    arrs, _static, key = build_replay_arrays(tr)
    mode = mode48000()
    F, N, CC = len(tr.fsz), int(tr.fsz[0]), tr.CC
    FC = 64
    n_steps = (F + FC - 1) // FC
    Fpad = n_steps * FC
    TA, gA, TB1, gB1 = serving.postfilter_params_arrays(
        tr.sb, tr.pfp, tr.pfg, tr.pft)

    def chunked(vals, fill, tail=()):
        out = np.full((Fpad,) + tail, fill, np.asarray(vals).dtype)
        out[:F] = vals
        return out.reshape((n_steps, FC) + tail)

    msk = np.zeros(Fpad, np.float32)
    msk[:F] = np.asarray(tr.sb) != 0
    B_short = int(tr.sb.max()) if len(tr.sb) else 1
    T1m, T1p, _ = imdct_ops.celt_synthesis_matrices_paired(
        2 * N, mode.overlap, 1)
    T8m, T8p, _ = imdct_ops.celt_synthesis_matrices_paired(
        2 * mode.shortMdctSize, mode.overlap, max(B_short, 1))
    K = 2
    synth = {
        "msk": msk.reshape(n_steps, FC),
        "TA": chunked(TA, 15), "gA": chunked(gA, 0.0, (3,)),
        "TB1": chunked(TB1, 15), "gB1": chunked(gB1, 0.0, (3,)),
        "fade": serving._fade_pattern(N, mode.overlap,
                                      mode.shortMdctSize),
        "T1m": T1m, "T1p": T1p, "T8m": T8m, "T8p": T8p,
    }
    arrsK = {k: np.broadcast_to(v[None], (K,) + v.shape).copy()
             for k, v in arrs.items()}
    for k in ("msk", "TA", "gA", "TB1", "gB1"):
        synth[k] = np.broadcast_to(
            synth[k][None], (K,) + synth[k].shape).copy()
    base_args = (key, K, F, N, CC, n_steps, FC, mode.overlap,
                 mode.shortMdctSize)
    full_default = serving.make_opus_stream_program_batched(*base_args)
    acc_default = np.asarray(full_default(arrsK, synth))
    variants = (dict(with_synth=False),
                dict(with_comb=False, with_deemph=False),
                dict(with_deemph=False),
                dict())
    outs = []
    for flags in variants:
        fn = serving.make_opus_stream_program_batched(
            *base_args, **flags)
        out = np.asarray(fn(arrsK, synth))
        assert out.shape == (K, CC)
        assert np.isfinite(out).all()
        outs.append(out)
    np.testing.assert_array_equal(outs[-1], acc_default)
