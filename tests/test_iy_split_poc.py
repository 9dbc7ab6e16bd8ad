"""Proof-of-concept for DESIGN_iy_split.md, verification step 1
(leaf subcase).

Records the (iy, N, K, spread, B, gain) trace of every PVQ leaf during
a real Python-path decode, then replays the leaf value plane BATCHED
and PADDED by (N, K, spread, B) group — the exact formulation the
device scan would use — and requires bit-exact equality with the
decoder's in-place leaf outputs.  This validates the two riskiest
claims of the design: (a) the float plane is fully reconstructible
from an integer trace, and (b) vectorizing across the leaf axis with
matched per-element op order loses nothing.
"""

import pathlib

import numpy as np

import libnyquist_tpu  # noqa: F401  (registry side effects)
from libnyquist_tpu.formats import ogg as oggmod
from libnyquist_tpu.formats.opus import celt as C


def _rot1_batched(X, length, stride, c, s):
    """_exp_rotation1 across a [G, length] batch, identical per-element
    op order to the scalar kernel (celt.py:849)."""
    for i in range(length - stride):
        x1 = X[:, i].copy()
        x2 = X[:, i + stride].copy()
        X[:, i + stride] = c * x2 + s * x1
        X[:, i] = c * x1 - s * x2
    for i in range(length - 2 * stride - 1, -1, -1):
        x1 = X[:, i].copy()
        x2 = X[:, i + stride].copy()
        X[:, i + stride] = c * x2 + s * x1
        X[:, i] = c * x1 - s * x2


def _exp_rotation_batched(X, length, direction, stride, K, spread):
    """exp_rotation (celt.py:862) across a [G, length] batch."""
    import math

    assert direction < 0
    if 2 * K >= length or spread == C.SPREAD_NONE:
        return
    factor = C.SPREAD_FACTOR[spread - 1]
    gain = 1.0 * length / (length + factor * K)
    theta = 0.5 * gain * gain
    c = math.cos(0.5 * math.pi * theta)
    s = math.cos(0.5 * math.pi * (1.0 - theta))
    stride2 = 0
    if length >= 8 * stride:
        stride2 = 1
        while (stride2 * stride2 + stride2) * stride + (stride >> 2) \
                < length:
            stride2 += 1
    length //= stride
    for i in range(stride):
        seg = X[:, i * length : (i + 1) * length]
        if stride2:
            _rot1_batched(seg, length, stride2, s, c)
        _rot1_batched(seg, length, 1, c, s)


def test_leaf_trace_replay_bit_exact(test_data_dir, monkeypatch):
    monkeypatch.setenv("LIBNYQUIST_NO_NATIVE_CELT", "1")

    iys = []
    traces = []
    orig_dp = C.decode_pulses
    orig_aq = C.alg_unquant

    def rec_dp(N, K, dec):
        iy = orig_dp(N, K, dec)
        iys.append(np.array(iy, np.int64))
        return iy

    def rec_aq(X, N, K, spread, B, dec, gain):
        cm = orig_aq(X, N, K, spread, B, dec, gain)
        traces.append((N, K, spread, B, float(gain), iys[-1],
                       np.array([float(X[j]) for j in range(N)])))
        return cm

    monkeypatch.setattr(C, "decode_pulses", rec_dp)
    monkeypatch.setattr(C, "alg_unquant", rec_aq)

    data = (test_data_dir / "short.opus").read_bytes()
    stream = list(oggmod.demux(data).values())[0]
    pkts = [p.data for p in stream.packets
            if not p.data.startswith((b"OpusHead", b"OpusTags"))]
    st = C.CeltDecoderState(channels=2)
    for p in pkts[:24]:
        C.celt_decode_frame(st, p[1:], 960)

    assert len(traces) > 100

    groups = {}
    for t in traces:
        groups.setdefault(t[:4], []).append(t)
    assert len(groups) > 5  # multiple (N, K, spread, B) shapes seen

    checked = 0
    for (N, K, spread, B), items in groups.items():
        iy = np.stack([t[5] for t in items]).astype(np.float64)
        gains = np.array([t[4] for t in items])
        ref = np.stack([t[6] for t in items])
        Ryy = (iy * iy).sum(axis=1)
        g = gains / np.sqrt(Ryy)
        Xb = g[:, None] * iy
        _exp_rotation_batched(Xb, N, -1, B, K, spread)
        assert np.array_equal(Xb, ref), (N, K, spread, B)
        checked += len(items)
    assert checked == len(traces)


def test_hadamard_interleave_is_static_gather():
    """The band-level (de)interleave used for short blocks
    (celt.py:1033, upstream bands.c deinterleave_hadamard) is a pure
    permutation of the band — on device it lowers to one precomputed
    static gather per (N0, stride, hadamard) shape."""
    rng = np.random.default_rng(3)
    for stride in sorted(C.ORDERY_TABLE):
        for N0 in (4, 8, 15, 24):
            for hadamard in (0, 1):
                N = N0 * stride
                x = rng.standard_normal(N)
                ref = x.copy()
                C._deinterleave_hadamard(ref, N0, stride, hadamard)
                # precompute the gather: where each output slot reads
                eye = np.arange(N, dtype=np.float64)
                probe = eye.copy()
                C._deinterleave_hadamard(probe, N0, stride, hadamard)
                perm = probe.astype(np.int64)
                assert np.array_equal(x[perm], ref)
                # interleave is its inverse permutation
                back = ref.copy()
                C._interleave_hadamard(back, N0, stride, hadamard)
                assert np.array_equal(back, x)


def test_stereo_merge_batched_replay(test_data_dir, monkeypatch):
    """_stereo_merge (celt.py:1529, upstream bands.c stereo_merge)
    replayed batched across all merges of a real decode, bit-exact —
    the stereo step of the device scan."""
    monkeypatch.setenv("LIBNYQUIST_NO_NATIVE_CELT", "1")

    calls = []
    orig = C._stereo_merge

    def rec(X, Y, mid, N):
        xb, yb = np.array(X[:N], np.float64), np.array(Y[:N], np.float64)
        orig(X, Y, mid, N)
        calls.append((N, float(mid), xb, yb,
                      np.array(X[:N], np.float64),
                      np.array(Y[:N], np.float64)))

    monkeypatch.setattr(C, "_stereo_merge", rec)

    data = (test_data_dir / "short.opus").read_bytes()
    stream = list(oggmod.demux(data).values())[0]
    pkts = [p.data for p in stream.packets
            if not p.data.startswith((b"OpusHead", b"OpusTags"))]
    st = C.CeltDecoderState(channels=2)
    for p in pkts[:48]:
        C.celt_decode_frame(st, p[1:], 960)
    assert len(calls) > 50

    import math
    groups = {}
    for cl in calls:
        groups.setdefault(cl[0], []).append(cl)
    for N, items in groups.items():
        X = np.stack([it[2] for it in items])
        Y = np.stack([it[3] for it in items])
        mid = np.array([it[1] for it in items])
        refX = np.stack([it[4] for it in items])
        refY = np.stack([it[5] for it in items])
        # NOTE (design finding): the two energy reductions must keep
        # the scalar path's accumulation order — einsum's SIMD order
        # differs from BLAS ddot in the last bit, which flips the
        # gains.  The device scan must pin its reduction order the
        # same way (or tolerate 1-ulp gain differences).
        xp = np.array([float(np.dot(Y[i], X[i]))
                       for i in range(len(items))]) * mid
        side = np.array([float(np.dot(Y[i], Y[i]))
                         for i in range(len(items))])
        El = mid * mid + side - 2 * xp
        Er = mid * mid + side + 2 * xp
        passthru = (Er < 6e-4) | (El < 6e-4)
        lg = 1.0 / np.sqrt(np.where(passthru, 1.0, El))
        rg = 1.0 / np.sqrt(np.where(passthru, 1.0, Er))
        L = mid[:, None] * X
        outX = np.where(passthru[:, None], X, lg[:, None] * (L - Y))
        outY = np.where(passthru[:, None], X, rg[:, None] * (L + Y))
        assert np.array_equal(outX, refX), N
        assert np.array_equal(outY, refY), N
