"""Batched multi-stream synthesis equals per-stream synthesis."""

import struct
import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


def _load_infos():
    from libnyquist_tpu.formats.opus import celt
    from libnyquist_tpu.formats.opus.packet import parse_packet

    raw = (GOLDEN / "opus_packets.bin").read_bytes()
    pos = 4
    ch, sr, n_packets, frame = struct.unpack_from("<4i", raw, pos)
    pos += 16
    pkts = []
    for _ in range(n_packets):
        (ln,) = struct.unpack_from("<i", raw, pos)
        pos += 4
        pkts.append(raw[pos : pos + ln])
        pos += ln
    st = celt.CeltDecoderState(channels=ch)
    infos = []
    for p in pkts:
        pkt = parse_packet(p)
        for fr in pkt.frames:
            infos.append(
                celt.celt_decode_frame_to_freq(st, fr, pkt.frame_size)
            )
    return infos, ch


def test_batched_streams_match_single():
    from libnyquist_tpu.runtime import opus_pipeline, serving

    infos, ch = _load_infos()
    if not infos:
        pytest.skip("no packet fixture")
    # three streams: full, full, and a truncated one (exercises padding)
    streams = [infos, infos, infos[: max(1, len(infos) // 2)]]
    batched = serving.synthesize_streams(streams, ch)
    for s, got in zip(streams, batched):
        ref = opus_pipeline.synthesize_stream(list(s), ch)
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-6


def test_batched_signature_mismatch_raises():
    from libnyquist_tpu.runtime import serving

    infos, ch = _load_infos()
    a = list(infos[:4])
    b = list(infos[:4])
    b[1] = dict(b[1], LM=b[1]["LM"] - 1 if b[1]["LM"] else b[1]["LM"] + 1)
    with pytest.raises(ValueError):
        serving.synthesize_streams([a, b], ch)


def test_mp3_stream_synthesis_matmul():
    """Whole-stream MP3 synthesis as a 3-tap matmul FIR over granules
    matches the sequential reference filterbank (tests/mp3_ref.py
    minimp3 mirror)."""
    from libnyquist_tpu.ops import mp3_synth as M

    from . import mp3_ref as R

    rng = np.random.default_rng(1)
    G = 6
    grbufs = rng.standard_normal((G, 2, 576)).astype(np.float32) * 0.2
    batch = M.synth_granules_stream(grbufs, 18, 1)
    qmf = np.zeros(960, np.float32)
    ref = np.concatenate(
        [R.synth_granule(qmf, grbufs[g].copy(), 18, 1) for g in range(G)],
        axis=0,
    )
    assert batch.shape == ref.shape
    assert np.abs(batch - ref).max() < 1e-4


def test_mp3_imdct_matmul_matches_mirror():
    """The kind-masked IMDCT matmul formulation (A1/B1/A2 maps from
    data/mp3_maps.npz) matches the sequential minimp3-mirror hybrid
    IMDCT across block types, mixed blocks, and the overlap chain."""
    from libnyquist_tpu.ops import mp3_synth as M

    from . import mp3_ref as R

    rng = np.random.default_rng(5)
    G, C = 7, 2
    X = (rng.standard_normal((G, C, 576)) * 0.3).astype(np.float32)
    cases = [(0, 0), (2, 0), (2, 2), (3, 0), (1, 0), (2, 4), (0, 0)]
    kinds = np.stack([
        np.stack([M.band_kinds(bt, nl) for _ in range(C)])
        for bt, nl in cases
    ])
    ov = np.zeros((C, 288))
    ref = np.empty_like(X)
    for g, (bt, nl) in enumerate(cases):
        for c in range(C):
            buf = X[g, c].astype(np.float64).copy()
            R.imdct_gr_vec(buf, ov[c], bt, nl)
            R.change_sign(buf)
            ref[g, c] = buf
    got = M.imdct_granules_stream(X, kinds)
    assert np.abs(got - ref).max() < 1e-5
    # streaming step chain gives the same result
    ovs = np.zeros((C, 32, 9), np.float32)
    outs = []
    for g in range(G):
        o, ovs = M.imdct_stream_step(X[g], kinds[g], ovs)
        outs.append(o)
    assert np.abs(np.stack(outs) - ref).max() < 1e-5


def test_vorbis_stream_synthesis_batched():
    """synthesize_vorbis_streams must match the scalar file-loop lapping
    for uniform long blocks (formats/vorbis.py decode loop semantics)."""
    import numpy as np

    from libnyquist_tpu.formats.vorbis import imdct_apply, vorbis_window
    from libnyquist_tpu.runtime import serving

    rng = np.random.default_rng(7)
    R, F, n = 3, 6, 256
    n2 = n // 2
    specs = rng.standard_normal((R, F, n2)).astype(np.float32)

    # scalar reference: per packet imdct + window + emit from center
    w = np.empty(n)
    w[:n2] = vorbis_window(n2)
    w[n2:] = vorbis_window(n2)[::-1]
    ref = []
    for r in range(R):
        cache = None
        outs = []
        for f in range(F):
            td = imdct_apply(specs[r, f][None], n)[0] * w
            if cache is not None:
                outs.append(cache + td[:n2])
            cache = td[n2:]
        ref.append(np.concatenate(outs))
    ref = np.stack(ref)

    for dev in (False, True):
        got = np.asarray(serving.synthesize_vorbis_streams(
            specs, n, use_device=dev))
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1)


def test_mpc_stream_synthesis_batched():
    """synthesize_mpc_streams must match the host _synth_stream per row."""
    import numpy as np

    from libnyquist_tpu.formats.musepack import _synth_stream
    from libnyquist_tpu.runtime import serving

    rng = np.random.default_rng(8)
    R, T = 3, 72
    ys = (rng.standard_normal((R, T, 32)) * 0.1).astype(np.float32)
    ref = np.stack([
        _synth_stream(ys[r].astype(np.float64)).reshape(-1) for r in range(R)
    ])
    for dev in (False, True):
        got = np.asarray(serving.synthesize_mpc_streams(ys, use_device=dev))
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() < 1e-4 * max(np.abs(ref).max(), 1)


def test_vorbis_mixed_block_serving_matches_loader():
    """The gather-based mixed-blocksize serving path must reproduce the
    scalar loader's pcm on a real fixture (all 6 .ogg fixtures mix 256
    and 2048 blocks)."""
    import pathlib

    import numpy as np

    from libnyquist_tpu.audio_data import AudioData
    from libnyquist_tpu.formats import ogg, vorbis
    from libnyquist_tpu.runtime import serving

    path = pathlib.Path("/root/reference/test_data/ad_hoc/LR_Stereo.ogg")
    if not path.exists():
        import pytest

        pytest.skip("reference fixture missing")
    data = path.read_bytes()
    audio = AudioData()
    vorbis.decode_vorbis_buffer(data, audio)
    ref = np.asarray(audio.samples).reshape(-1, audio.channel_count)

    streams = ogg.demux(data)
    st = ogg.first_stream_matching(streams, b"\x01vorbis")
    staged, bss, channels, rate, end_gran = vorbis._decode_stream_packets(
        st, return_entropy=True)
    meta = [(n, bf, lp, ln) for (_s, n, bf, lp, ln, _nz) in staged]
    plan = serving.vorbis_lap_plan(meta, bss)
    F = len(staged)
    nmax2 = plan["nmax"] // 2
    specs = np.zeros((channels, F, nmax2), np.float32)
    for f, (s, n, *_r) in enumerate(staged):
        for c in range(channels):
            specs[c, f, : n // 2] = s[c]
    for dev in (False, True):
        out = np.asarray(serving.synthesize_vorbis_streams_mixed(
            specs, plan, use_device=dev))           # [ch, out_len]
        pcm = out.T[: int(end_gran)] if end_gran >= 0 else out.T
        assert pcm.shape == ref.shape
        err = np.abs(pcm - ref).max()
        assert err < 1e-4, err
