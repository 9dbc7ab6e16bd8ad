"""iy-split: host integer trace of the CELT PVQ value plane + replay.

DESIGN_iy_split.md: the native host decode (celt_bands.c) can run
bits-only — range decode, allocation, cwrsi — and emit an integer trace;
the float value plane (leaf scaling, spreading rotations, haar merges,
fold fills, stereo merge, anti-collapse, denormalise) is replayed from
the trace, on device (TPU) in production or in float64 NumPy for
validation (this module's replay_numpy is the reference replayer the
JAX path is tested against).

Reference spec: third_party/opus/celt/bands.c:653 quant_all_bands
(value plane), vq.c/cwrs.c; the host half here is
native/celt_bands.c celt_decode_stream_trace.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .celt import ORDERY_TABLE, CeltDecoderState
from .celt_tables import mode48000

EPSILON = 1e-15
LF_PVQ, LF_FOLD, LF_NOISE, LF_N1, LF_PVQ_IDX = 0, 1, 2, 4, 5
SPREAD_NONE = 0
SPREAD_FACTOR = (15, 10, 5)
LCG_A = np.uint32(1664525)
LCG_B = np.uint32(1013904223)


@dataclass
class CeltTrace:
    """Replay trace for a run of CELT frames (one homogeneous stream)."""
    # leaf stream
    lf_frame: np.ndarray
    lf_band: np.ndarray
    lf_call: np.ndarray
    lf_type: np.ndarray
    lf_off: np.ndarray
    lf_len: np.ndarray
    lf_k: np.ndarray
    lf_stride: np.ndarray
    lf_gain: np.ndarray
    lf_seed: np.ndarray
    lf_iy_off: np.ndarray
    iy_heap: np.ndarray
    # dense per (frame, band)
    bd_mode: np.ndarray      # [F, nb]
    bd_eff_lb: np.ndarray
    bd_tf: np.ndarray
    bd_imid: np.ndarray
    bd_iside: np.ndarray
    bd_itheta: np.ndarray
    bd_inv: np.ndarray
    bd_sign: np.ndarray
    bd_cflag: np.ndarray
    # anti-collapse records
    ac_frame: np.ndarray
    ac_band: np.ndarray
    ac_c: np.ndarray
    ac_k: np.ndarray
    ac_seed: np.ndarray
    ac_r: np.ndarray
    # frame records
    fr_misc: np.ndarray      # [F, 6]: spread, intensity, avg_band,
    #                          anti_collapse_on, codedBands, dual
    fr_gains: np.ndarray     # [F, 2, nb] float32 denormalise gains
    fsz: np.ndarray
    ends: np.ndarray
    chs: np.ndarray
    sb: np.ndarray           # shortBlocks per frame
    sil: np.ndarray
    pfp: np.ndarray
    pfg: np.ndarray
    pft: np.ndarray
    xs: np.ndarray           # [F, 2, nmax] f32 dense leaf plane: finished
    #                          values (raw_iy=False) or raw iy integers
    CC: int
    CCout: int
    start: int
    raw_iy: bool = False     # xs holds raw iy; lf_gain holds final g;
    #                          rotation+scale replayed on device
    xs_heap: bool = False    # xs is a dummy: values live in iy_heap
    #                          (decode order); the device scatter
    #                          pre-pass rebuilds the dense plane
    idx_mode: bool = False   # B<=1 PVQ leaves are LF_PVQ_IDX: lf_seed
    #                          = codeword index, lf_gain = PRE gain;
    #                          device cwrsi expands them
    rot_leaf: np.ndarray | None = None  # marker -> leaf id for PRE-
    #                          gain markers (-1 = rot_g already final)
    # native-emitted rotation sub-segment markers (raw_iy traces;
    # None -> assemble with celt_replay._rotation_markers, the Python
    # spec of the same plane)
    rot_rows: np.ndarray | None = None
    rot_cols: np.ndarray | None = None
    rot_pk: np.ndarray | None = None
    rot_th: np.ndarray | None = None
    rot_g: np.ndarray | None = None
    rot_sigmas: tuple = ()


def celt_trace_stream_arrays(
    st: CeltDecoderState, payload, offs, lens, fsz, enda, cha,
    with_heap: bool = True, raw_iy: bool = False, xs_heap: bool = False,
    idx_mode: bool = False,
):
    """Whole-stream bits-only decode emitting the iy-split trace
    (native celt_decode_stream_trace).  Returns a CeltTrace, or None
    when the native library is unavailable.

    raw_iy=True: the xs plane holds raw iy integers (as f32) and
    lf_gain holds the final per-leaf gain g = gain/sqrt(Ryy); the
    spreading rotation + scale run on device (celt_replay.rotate_plane)
    instead of in the host emitter — the last host float-plane work.

    xs_heap=True (implies raw_iy): skip the dense xs plane entirely —
    values (iy ints + N1 signs) land in the compact int16 heap in
    decode order and the device scatter pre-pass rebuilds the dense
    plane (celt_replay heap_spec).  Removes the host's last O(F*nmax)
    memory plane: emission becomes sequential heap writes.

    idx_mode=True (implies xs_heap): B<=1 PVQ leaves (every leaf of
    long frames — their collapse mask is identically 1, so values
    cannot steer decode control flow) skip host cwrsi entirely: the
    leaf carries the codeword index (lf_seed) + pre gain (lf_gain) and
    the device cwrsi kernel expands index -> iy and computes
    g = gain*rsqrt(Ryy).  The host value walk drops to the transient
    frames (~3% of a typical music stream)."""
    import ctypes

    from .celt import _ec_ptrs, _mode_ptrs, _native_celt

    L = _native_celt()
    if L is None or not hasattr(L, "celt_decode_stream_trace"):
        return None
    if st.downsample != 1:
        return None
    mode = mode48000()
    nb = mode.nbEBands
    n = len(offs)
    if n == 0:
        return None
    fsz = np.ascontiguousarray(fsz, np.int32)
    enda = np.ascontiguousarray(enda, np.int32)
    cha = np.ascontiguousarray(cha, np.int32)
    offs = np.ascontiguousarray(offs, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    CC = st.channels
    CCout = max(CC, int(cha.max()))
    mp = _mode_ptrs(mode)
    i64p, i32p, f64p = _ec_ptrs()
    f32p = ctypes.POINTER(ctypes.c_float)
    i8p = ctypes.POINTER(ctypes.c_int8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    i16p = ctypes.POINTER(ctypes.c_int16)

    if xs_heap and not raw_iy:
        raise ValueError("xs_heap requires raw_iy")
    if idx_mode and not xs_heap:
        raise ValueError("idx_mode requires xs_heap")
    lf_cap = 96 * n + 1024
    rot_cap = 128 * n + 1024 if raw_iy else 0
    # exact upper bound (disjoint leaves); 0 disables heap emission
    # (the heap feeds the float64 validation replayer, and in xs_heap
    # mode is the production value plane itself)
    iy_cap = 2 * 960 * n + 64 if (with_heap or xs_heap) else 0
    ac_cap = 8 * n + 1024
    while True:
        lf = {
            "frame": np.empty(lf_cap, np.int32),
            "band": np.empty(lf_cap, np.int8),
            "call": np.empty(lf_cap, np.int8),
            "type": np.empty(lf_cap, np.int8),
            "off": np.empty(lf_cap, np.int16),
            "len": np.empty(lf_cap, np.int16),
            "k": np.empty(lf_cap, np.int32),
            "stride": np.empty(lf_cap, np.int16),
            "gain": np.empty(lf_cap, np.float64),
            "seed": np.empty(lf_cap, np.uint32),
            "iy_off": np.empty(lf_cap, np.int64),
        }
        iy_heap = np.empty(max(iy_cap, 1), np.int16)
        bd = {
            "mode": np.zeros((n, nb), np.uint8),
            "eff_lb": np.full((n, nb), -1, np.int32),
            "tf": np.zeros((n, nb), np.int8),
            "imid": np.zeros((n, nb), np.int16),
            "iside": np.zeros((n, nb), np.int16),
            "itheta": np.zeros((n, nb), np.int16),
            "inv": np.zeros((n, nb), np.int8),
            "sign": np.zeros((n, nb), np.int8),
            "cflag": np.zeros((n, nb), np.int8),
        }
        ac = {
            "frame": np.empty(ac_cap, np.int32),
            "band": np.empty(ac_cap, np.int8),
            "c": np.empty(ac_cap, np.int8),
            "k": np.empty(ac_cap, np.int8),
            "seed": np.empty(ac_cap, np.uint32),
            "r": np.empty(ac_cap, np.float32),
        }
        fr_misc = np.zeros((n, 6), np.int32)
        fr_gains = np.zeros((n, 2, nb), np.float32)
        nmax = int(fsz.max())
        # xs_heap mode: no dense plane is written (or allocated)
        xs = (np.zeros((1, 2, 1), np.float32) if xs_heap
              else np.zeros((n, 2, nmax), np.float32))
        sb = np.zeros(n, np.int32)
        pfp = np.zeros(n, np.int32)
        pfg = np.zeros(n, np.float64)
        pft = np.zeros(n, np.int32)
        sil = np.zeros(n, np.int32)
        # state snapshot: a capacity retry must not double-apply updates
        old = np.ascontiguousarray(st.oldEBands, np.float64).copy()
        ole = np.ascontiguousarray(st.oldLogE, np.float64).copy()
        ole2 = np.ascontiguousarray(st.oldLogE2, np.float64).copy()
        bg = np.ascontiguousarray(st.backgroundLogE, np.float64).copy()
        rng = np.array([st.rng], np.int64)
        rot = {
            "rows": np.empty(max(rot_cap, 1), np.int32),
            "cols": np.empty(max(rot_cap, 1), np.int32),
            "pk": np.empty(max(rot_cap, 1), np.int32),
            "th": np.empty(max(rot_cap, 1), np.float32),
            "g": np.empty(max(rot_cap, 1), np.float32),
            "leaf": np.empty(max(rot_cap if idx_mode else 0, 1),
                             np.int32),
        }
        tcaps = np.array(
            [lf_cap, iy_cap, ac_cap, 0, 0, 0,
             (1 if raw_iy else 0) | (2 if xs_heap else 0)
             | (4 if idx_mode else 0),
             rot_cap, 0, 0],
            np.int64)

        rc = L.celt_decode_stream_trace(
            payload, offs.ctypes.data_as(i64p), lens.ctypes.data_as(i64p),
            fsz.ctypes.data_as(i32p), enda.ctypes.data_as(i32p),
            cha.ctypes.data_as(i32p), n,
            mp["eb_p"], nb, mp["ln_p"], mp["ci_p"], mp["cb"], mp["ccaps"],
            mp["av"], int(mode.nbAllocVectors), mp["em_p"], mp["pmf_p"],
            int(mode.shortMdctSize), int(mode.effEBands),
            old.ctypes.data_as(f64p), ole.ctypes.data_as(f64p),
            ole2.ctypes.data_as(f64p), bg.ctypes.data_as(f64p),
            rng.ctypes.data_as(i64p),
            int(CC), int(CCout), int(st.downsample), int(st.start),
            sb.ctypes.data_as(i32p), pfp.ctypes.data_as(i32p),
            pfg.ctypes.data_as(f64p), pft.ctypes.data_as(i32p),
            sil.ctypes.data_as(i32p),
            tcaps.ctypes.data_as(i64p),
            lf["frame"].ctypes.data_as(i32p),
            lf["band"].ctypes.data_as(i8p),
            lf["call"].ctypes.data_as(i8p),
            lf["type"].ctypes.data_as(i8p),
            lf["off"].ctypes.data_as(i16p), lf["len"].ctypes.data_as(i16p),
            lf["k"].ctypes.data_as(i32p), lf["stride"].ctypes.data_as(i16p),
            lf["gain"].ctypes.data_as(f64p),
            lf["seed"].ctypes.data_as(u32p),
            lf["iy_off"].ctypes.data_as(i64p),
            iy_heap.ctypes.data_as(i16p),
            bd["mode"].ctypes.data_as(u8p),
            bd["eff_lb"].ctypes.data_as(i32p),
            bd["tf"].ctypes.data_as(i8p),
            bd["imid"].ctypes.data_as(i16p),
            bd["iside"].ctypes.data_as(i16p),
            bd["itheta"].ctypes.data_as(i16p),
            bd["inv"].ctypes.data_as(i8p), bd["sign"].ctypes.data_as(i8p),
            bd["cflag"].ctypes.data_as(i8p),
            ac["frame"].ctypes.data_as(i32p),
            ac["band"].ctypes.data_as(i8p), ac["c"].ctypes.data_as(i8p),
            ac["k"].ctypes.data_as(i8p), ac["seed"].ctypes.data_as(u32p),
            ac["r"].ctypes.data_as(f32p),
            fr_misc.ctypes.data_as(i32p), fr_gains.ctypes.data_as(f32p),
            xs.ctypes.data_as(f32p), nmax,
            rot["rows"].ctypes.data_as(i32p),
            rot["cols"].ctypes.data_as(i32p),
            rot["pk"].ctypes.data_as(i32p),
            rot["th"].ctypes.data_as(f32p),
            rot["g"].ctypes.data_as(f32p),
            rot["leaf"].ctypes.data_as(i32p),
        )
        if rc == -2:
            lf_cap *= 4
            ac_cap *= 4
            if raw_iy:
                rot_cap *= 4
            continue
        if rc != 0:
            raise ValueError(
                f"celt_decode_stream_trace failed at frame {rc - 1}")
        break

    # commit decoder state
    st.oldEBands[:, :] = old
    st.oldLogE[:] = ole
    st.oldLogE2[:] = ole2
    st.backgroundLogE[:] = bg
    st.rng = int(rng[0])

    nl = int(tcaps[3])
    niy = int(tcaps[4])
    nac = int(tcaps[5])
    nrot = int(tcaps[7]) if raw_iy else 0
    smask = int(tcaps[8]) if raw_iy else 0
    rot_kw = {}
    if raw_iy:
        rot_kw = dict(
            rot_rows=rot["rows"][:nrot], rot_cols=rot["cols"][:nrot],
            rot_pk=rot["pk"][:nrot], rot_th=rot["th"][:nrot],
            rot_g=rot["g"][:nrot],
            rot_leaf=rot["leaf"][:nrot] if idx_mode else None,
            rot_sigmas=tuple(s for s in range(1, 16)
                             if smask & (1 << s)),
        )
    return CeltTrace(
        lf_frame=lf["frame"][:nl], lf_band=lf["band"][:nl],
        lf_call=lf["call"][:nl], lf_type=lf["type"][:nl],
        lf_off=lf["off"][:nl], lf_len=lf["len"][:nl], lf_k=lf["k"][:nl],
        lf_stride=lf["stride"][:nl], lf_gain=lf["gain"][:nl],
        lf_seed=lf["seed"][:nl], lf_iy_off=lf["iy_off"][:nl],
        iy_heap=iy_heap[:niy],
        bd_mode=bd["mode"], bd_eff_lb=bd["eff_lb"], bd_tf=bd["tf"],
        bd_imid=bd["imid"], bd_iside=bd["iside"], bd_itheta=bd["itheta"],
        bd_inv=bd["inv"], bd_sign=bd["sign"], bd_cflag=bd["cflag"],
        ac_frame=ac["frame"][:nac], ac_band=ac["band"][:nac],
        ac_c=ac["c"][:nac], ac_k=ac["k"][:nac], ac_seed=ac["seed"][:nac],
        ac_r=ac["r"][:nac],
        fr_misc=fr_misc, fr_gains=fr_gains,
        fsz=fsz, ends=enda, chs=cha, sb=sb, sil=sil,
        pfp=pfp, pfg=pfg, pft=pft, xs=xs,
        CC=CC, CCout=CCout, start=int(st.start), raw_iy=bool(raw_iy),
        xs_heap=bool(xs_heap), idx_mode=bool(idx_mode),
        **rot_kw,
    )


# --------------------- transform chain machinery ---------------------

def _chain(N, B, tf_change, structural=False):
    """The lowband pre-transform and X resynthesis step lists of
    quant_band (celt_bands.c:quant_band; upstream bands.c:1026-1117) for
    one (band size N, frame B, tf_change).  Steps:
      ('haar', n0, stride)          haar1 butterfly
      ('perm', perm_array)          static gather X = X[perm]
    or with structural=True (for the device path, which lowers the
    hadamard (de)interleave to reshapes/transposes instead of gathers):
      ('deint'|'int', N0, stride, had)
    """
    longBlocks = B == 1
    N_B = N // B
    recombine = tf_change if tf_change > 0 else 0
    pre = []
    for k in range(recombine):
        pre.append(("haar", N >> k, 1 << k))
    B2 = B >> recombine
    N_B <<= recombine
    time_divide = 0
    tfc = tf_change
    while (N_B & 1) == 0 and tfc < 0:
        pre.append(("haar", N_B, B2))
        B2 <<= 1
        N_B >>= 1
        time_divide += 1
        tfc += 1
    B0 = B2
    N_B0 = N_B
    if B0 > 1:
        if structural:
            pre.append(("deint", N_B >> recombine, B0 << recombine,
                        longBlocks))
        else:
            pre.append(("perm",
                        _deint_perm(N_B >> recombine, B0 << recombine,
                                    longBlocks)))
    post = []
    if B0 > 1:
        if structural:
            post.append(("int", N_B >> recombine, B0 << recombine,
                         longBlocks))
        else:
            post.append(("perm",
                         _int_perm(N_B >> recombine, B0 << recombine,
                                   longBlocks)))
    N_B = N_B0
    for k in range(time_divide):
        B2 >>= 1
        N_B <<= 1
        post.append(("haar", N_B, B2))
    for k in range(recombine):
        post.append(("haar", N >> k, 1 << k))
    return pre, post


def _deint_perm(N0, stride, had):
    """deinterleave_hadamard as a static gather (POC-proven)."""
    if stride <= 1 or N0 * stride == 0:
        return None
    ordy = ORDERY_TABLE[stride] if had else list(range(stride))
    perm = np.empty(N0 * stride, np.int64)
    ii = np.arange(stride)
    jj = np.arange(N0)
    dst = (np.asarray(ordy)[:, None] * N0 + jj[None, :]).reshape(-1)
    src = (jj[None, :] * stride + ii[:, None]).reshape(-1)
    perm[dst] = src
    return perm


def _int_perm(N0, stride, had):
    p = _deint_perm(N0, stride, had)
    return None if p is None else np.argsort(p)


def _haar_batch(X, n0, stride):
    """haar1 across a [G, L] batch (same op order as the scalar C)."""
    h = n0 >> 1
    L = stride * 2 * h
    if h <= 0 or L <= 0 or L > X.shape[1]:
        return
    s = np.sqrt(np.float64(0.5))
    v = X[:, :L].reshape(X.shape[0], h, 2, stride)
    a = s * v[:, :, 0]
    b = s * v[:, :, 1]
    X[:, :L] = np.stack([a + b, a - b], axis=2).reshape(X.shape[0], L)


def _apply_chain(X, steps):
    for step in steps:
        if step[0] == "haar":
            _haar_batch(X, step[1], step[2])
        else:
            perm = step[1]
            if perm is not None:
                X[:, : len(perm)] = X[:, perm]


def _rot1_batched(X, length, stride, c, s):
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


def exp_rotation_batched(X, length, stride, K, spread):
    """exp_rotation(dir=-1) across a [G, length] batch (vq.c:77)."""
    import math

    if 2 * K >= length or spread == SPREAD_NONE:
        return
    factor = SPREAD_FACTOR[spread - 1]
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


def rotation_matrix(length, stride, K, spread):
    """exp_rotation as its [length, length] linear operator (probe)."""
    eye = np.eye(length, dtype=np.float64)
    exp_rotation_batched(eye, length, stride, K, spread)
    return eye  # rot(x) == x @ M (row j = rot(e_j))


def _lcg_tables(nmax):
    """A_e, B_e with lcg^e(s) = A_e * s + B_e (mod 2^32), e in [0, nmax].
    uint64 so products with 32-bit seeds never overflow."""
    A = np.empty(nmax + 1, np.uint64)
    Bc = np.empty(nmax + 1, np.uint64)
    a, b = 1664525, 1013904223
    Ai, Bi = 1, 0
    for e in range(nmax + 1):
        A[e] = Ai
        Bc[e] = Bi
        Ai = (a * Ai) % (1 << 32)
        Bi = (a * Bi + b) % (1 << 32)
    return A, Bc


def _lcg_eval(A, Bc, e, seed):
    """lcg^e(seed) as uint32 (vectorized, wraparound-exact)."""
    x = (A[e] * seed.astype(np.uint64) + Bc[e]) & np.uint64(0xFFFFFFFF)
    return x.astype(np.uint32)


def _expand(lens):
    """Per-position (segment-local j, segment id) for ragged segments."""
    total = int(lens.sum())
    seg_id = np.repeat(np.arange(len(lens)), lens)
    starts = np.cumsum(lens) - lens
    j = np.arange(total) - np.repeat(starts, lens)
    return j, seg_id


# ------------------------- NumPy replayer ---------------------------

def slice_trace(tr: CeltTrace, idx: np.ndarray) -> CeltTrace:
    """Frame-subset view of a trace (frames are independent in the float
    plane — the norm fold buffer never crosses frames), with leaf and
    anti-collapse frame indices renumbered."""
    import dataclasses

    remap = np.full(len(tr.fsz), -1, np.int64)
    remap[idx] = np.arange(len(idx))
    lf_sel = np.isin(tr.lf_frame, idx)
    ac_sel = np.isin(tr.ac_frame, idx)
    kw = {}
    for f in dataclasses.fields(tr):
        v = getattr(tr, f.name)
        if f.name.startswith("lf_"):
            v = v[lf_sel]
            if f.name == "lf_frame":
                v = remap[v].astype(np.int32)
        elif f.name.startswith("ac_"):
            v = v[ac_sel]
            if f.name == "ac_frame":
                v = remap[v].astype(np.int32)
        elif f.name in ("bd_mode", "bd_eff_lb", "bd_tf", "bd_imid",
                        "bd_iside", "bd_itheta", "bd_inv", "bd_sign",
                        "bd_cflag", "fr_misc", "fr_gains", "fsz", "ends",
                        "chs", "sb", "sil", "pfp", "pfg", "pft", "xs"):
            v = v[idx]
        kw[f.name] = v
    return CeltTrace(**kw)


def _materialize_idx_leaves(tr: CeltTrace) -> CeltTrace:
    """Validation helper: expand LF_PVQ_IDX leaves (device-cwrsi mode)
    into ordinary heap-backed LF_PVQ leaves via the Python cwrsi spec,
    so replay_numpy can treat idx traces uniformly.  O(values) Python
    loop — validation corpora only."""
    import dataclasses

    from .celt import cwrsi as cwrsi_spec

    ii = np.nonzero(tr.lf_type == LF_PVQ_IDX)[0]
    if not len(ii):
        return tr
    heaps = [tr.iy_heap]
    off = len(tr.iy_heap)
    lf_iy_off = tr.lf_iy_off.copy()
    lf_type = tr.lf_type.copy()
    lf_gain = tr.lf_gain.copy()
    for j in ii:
        iy = np.asarray(
            cwrsi_spec(int(tr.lf_len[j]), int(tr.lf_k[j]),
                       int(tr.lf_seed[j])), np.int16)
        heaps.append(iy)
        lf_iy_off[j] = off
        off += len(iy)
        lf_type[j] = LF_PVQ
        ryy = float((iy.astype(np.int64) ** 2).sum())
        lf_gain[j] = tr.lf_gain[j] / np.sqrt(ryy)
    return dataclasses.replace(
        tr, iy_heap=np.concatenate(heaps), lf_iy_off=lf_iy_off,
        lf_type=lf_type, lf_gain=lf_gain, idx_mode=False)


def replay_numpy(tr: CeltTrace) -> np.ndarray:
    """Float64 reference replay of the trace: returns freq
    [F, CCout, nmax] float32, matching celt_decode_stream's freq_out to
    f64 rounding (the JAX f32 device replay is validated against this
    and against the full native decode).  Mixed frame sizes are split
    into homogeneous LM buckets (frames are independent in the float
    plane)."""
    if tr.idx_mode:
        tr = _materialize_idx_leaves(tr)
    if len(np.unique(tr.fsz)) > 1:
        F = len(tr.fsz)
        nmax = int(tr.fsz.max())
        out = np.zeros((F, tr.CCout, nmax), np.float32)
        for sz in np.unique(tr.fsz):
            idx = np.nonzero(tr.fsz == sz)[0]
            sub = slice_trace(tr, idx)
            sub.xs = np.ascontiguousarray(sub.xs[:, :, :sz])
            rep = replay_numpy(sub)
            out[idx, :, : rep.shape[2]] = rep
        return out
    mode = mode48000()
    nb = mode.nbEBands
    eB = np.asarray(mode.eBands, np.int64)
    F = len(tr.fsz)
    nmax = int(tr.fsz.max())
    assert (tr.fsz == nmax).all(), "replay bucket must share a frame size"
    LM = int(np.log2(nmax // mode.shortMdctSize))
    M = 1 << LM
    start = tr.start
    norm_offset = M * int(eB[start])
    norm_len = M * int(eB[nb - 1]) - norm_offset
    band_off = (M * eB).astype(np.int64)
    A, Bc = _lcg_tables(int(nmax) + 1)

    spread_f = tr.fr_misc[:, 0]
    avg_band_f = tr.fr_misc[:, 2]
    B_f = np.where(tr.sb > 0, tr.sb, 1).astype(np.int64)
    ends = tr.ends.astype(np.int64)

    # ---- PVQ leaf value plane (band-independent, POC-validated) ----
    is_pvq = tr.lf_type == LF_PVQ
    val_heap = np.zeros(len(tr.iy_heap), np.float64)
    pvq_idx = np.nonzero(is_pvq)[0]
    if len(pvq_idx):
        keys = np.stack([
            tr.lf_len[pvq_idx].astype(np.int64),
            tr.lf_k[pvq_idx].astype(np.int64),
            tr.lf_stride[pvq_idx].astype(np.int64),
            spread_f[tr.lf_frame[pvq_idx]].astype(np.int64),
        ], axis=1)
        uk, inv_k = np.unique(keys, axis=0, return_inverse=True)
        for g, (ln, K, strd, spr) in enumerate(map(tuple, uk)):
            sel = pvq_idx[inv_k == g]
            ln = int(ln)
            src = tr.lf_iy_off[sel][:, None] + np.arange(ln)[None, :]
            iy = tr.iy_heap[src].astype(np.float64)
            Ryy = (iy * iy).sum(axis=1)
            # raw-iy traces carry the final g = gain/sqrt(Ryy) directly
            gains = (tr.lf_gain[sel] if tr.raw_iy
                     else tr.lf_gain[sel] / np.sqrt(Ryy))
            X = gains[:, None] * iy
            exp_rotation_batched(X, ln, int(strd), int(K), int(spr))
            val_heap.reshape(-1)[src.reshape(-1)] = X.reshape(-1)

    # group leaves by band for the scan
    leaf_by_band = [np.nonzero(tr.lf_band == i)[0] for i in range(nb)]

    norm = np.zeros((F, 2, max(norm_len, 1)), np.float64)
    spec = np.zeros((F, 2, nmax), np.float64)
    frames_idx = np.arange(F)

    for i in range(start, nb):
        N = int(band_off[i + 1] - band_off[i])
        off = int(band_off[i])
        mode_b = tr.bd_mode[:, i]
        active = mode_b > 0
        if not active.any():
            continue

        # dual->intensity averaging event (band loop head)
        avg_sel = avg_band_f == i
        if avg_sel.any():
            upto = off - norm_offset
            if upto > 0:
                norm[avg_sel, 0, :upto] = 0.5 * (
                    norm[avg_sel, 0, :upto] + norm[avg_sel, 1, :upto])

        # ---- transformed lowband (fold source) ----
        eff = tr.bd_eff_lb[:, i].astype(np.int64)
        has_lb = eff >= 0
        idx = np.clip(eff, 0, max(norm_len - N, 0))[:, None] \
            + np.arange(N)[None, :]
        lb = np.take_along_axis(norm, idx[:, None, :].repeat(2, 1), axis=2)
        lb[~has_lb] = 0.0

        # per-frame chain class
        tf_b = tr.bd_tf[:, i].astype(np.int64)
        cls = np.stack([B_f, tf_b], axis=1)
        ucls, cls_inv = np.unique(cls, axis=0, return_inverse=True)
        chains = [_chain(N, int(b), int(t)) for b, t in map(tuple, ucls)]
        for g, (pre, _post) in enumerate(chains):
            sel = cls_inv == g
            if pre and sel.any():
                seg = lb[sel].reshape(-1, N)
                _apply_chain(seg, pre)
                lb[sel] = seg.reshape(-1, 2, N)

        # ---- assemble X0 (pre-resynthesis band buffer) ----
        X0 = np.zeros((F, 2, N), np.float64)
        li = leaf_by_band[i]
        if len(li):
            types = tr.lf_type[li]
            # PVQ leaves: gather the precomputed value plane
            p = li[types == LF_PVQ]
            if len(p):
                lens_ = tr.lf_len[p].astype(np.int64)
                j, seg = _expand(lens_)
                rows = tr.lf_frame[p][seg]
                calls = tr.lf_call[p][seg].astype(np.int64)
                cols = tr.lf_off[p].astype(np.int64)[seg] + j
                src = tr.lf_iy_off[p][seg] + j
                X0[rows, calls, cols] = val_heap[src]
            # N1 sign leaves
            p = li[types == LF_N1]
            if len(p):
                X0[tr.lf_frame[p], tr.lf_call[p].astype(np.int64),
                   tr.lf_off[p].astype(np.int64)] = \
                    tr.lf_k[p].astype(np.float64)
            # fold + noise leaves
            for t in (LF_FOLD, LF_NOISE):
                p = li[types == t]
                if not len(p):
                    continue
                lens_ = tr.lf_len[p].astype(np.int64)
                j, seg = _expand(lens_)
                rows = tr.lf_frame[p][seg]
                calls = tr.lf_call[p][seg].astype(np.int64)
                cols = tr.lf_off[p].astype(np.int64)[seg] + j
                seeds = _lcg_eval(A, Bc, j + 1, tr.lf_seed[p][seg])
                if t == LF_FOLD:
                    tmp = np.where(seeds & np.uint32(0x8000),
                                   1.0 / 256, -1.0 / 256)
                    v = lb[rows, calls, cols] + tmp
                else:
                    v = (seeds.view(np.int32) >> 20).astype(np.float64)
                starts = np.cumsum(lens_) - lens_
                E = EPSILON + np.add.reduceat(v * v, starts)
                gseg = (tr.lf_gain[p] / np.sqrt(E))[seg]
                X0[rows, calls, cols] = v * gseg

        # ---- resynthesis transforms ----
        Xr = X0
        for g, (_pre, post) in enumerate(chains):
            sel = cls_inv == g
            if post and sel.any():
                seg = Xr[sel].reshape(-1, N)
                _apply_chain(seg, post)
                Xr[sel] = seg.reshape(-1, 2, N)

        # ---- lowband_out -> norm ----
        lbout = active & (i < ends - 1)
        if lbout.any() and off - norm_offset >= 0 \
                and off - norm_offset + N <= norm_len:
            sq = np.sqrt(np.float64(N))
            dst = slice(off - norm_offset, off - norm_offset + N)
            cfl = tr.bd_cflag[:, i].astype(np.int64)
            src0 = np.where((mode_b == 3)[:, None],
                            np.take_along_axis(
                                Xr, cfl[:, None, None], 1)[:, 0],
                            Xr[:, 0])
            w = lbout[:, None]
            norm[:, 0, dst] = np.where(w, sq * src0, norm[:, 0, dst])
            wd = (lbout & (mode_b == 4))[:, None]
            norm[:, 1, dst] = np.where(wd, sq * Xr[:, 1], norm[:, 1, dst])

        # ---- stereo finalization ----
        Xf = Xr.copy()
        m2 = mode_b == 2
        if m2.any():
            mid = tr.bd_imid[:, i].astype(np.float64) / 32768.0
            X_, Y_ = Xr[:, 0], Xr[:, 1]
            xp = (Y_ * X_).sum(axis=1) * mid
            side_e = (Y_ * Y_).sum(axis=1)
            El = mid * mid + side_e - 2 * xp
            Er = mid * mid + side_e + 2 * xp
            passthru = (Er < 6e-4) | (El < 6e-4)
            lg = 1.0 / np.sqrt(np.where(passthru, 1.0, El))
            rg = 1.0 / np.sqrt(np.where(passthru, 1.0, Er))
            Lm = mid[:, None] * X_
            mX = np.where(passthru[:, None], X_, lg[:, None] * (Lm - Y_))
            mY = np.where(passthru[:, None], X_, rg[:, None] * (Lm + Y_))
            Xf[m2, 0] = mX[m2]
            Xf[m2, 1] = mY[m2]
        m3 = mode_b == 3
        if m3.any():
            mid = tr.bd_imid[:, i].astype(np.float64) / 32768.0
            side = tr.bd_iside[:, i].astype(np.float64) / 32768.0
            sgn = tr.bd_sign[:, i].astype(np.float64)
            cfl = tr.bd_cflag[:, i].astype(np.int64)
            a = np.take_along_axis(Xr, cfl[:, None, None].repeat(N, 2),
                                   1)[:, 0]
            der = np.stack([-sgn * a[:, 1], sgn * a[:, 0]], axis=1)
            Xv = np.where((cfl == 1)[:, None], der, a)
            Yv = np.where((cfl == 1)[:, None], a, der)
            Xf[m3, 0] = (mid[:, None] * Xv - side[:, None] * Yv)[m3]
            Xf[m3, 1] = (mid[:, None] * Xv + side[:, None] * Yv)[m3]
        invsel = tr.bd_inv[:, i] != 0
        if invsel.any():
            Xf[invsel, 1] = -Xf[invsel, 1]

        spec[:, :, off : off + N] = np.where(active[:, None, None], Xf, 0.0)

    # ---- anti-collapse (bands.c anti_collapse, decode side) ----
    if len(tr.ac_frame):
        renorm_keys = set()
        for t in range(len(tr.ac_frame)):
            f = int(tr.ac_frame[t])
            b = int(tr.ac_band[t])
            c = int(tr.ac_c[t])
            k = int(tr.ac_k[t])
            N0 = int(eB[b + 1] - eB[b])
            seed = tr.ac_seed[t]
            r = np.float64(tr.ac_r[t])
            jj = np.arange(N0)
            seeds = _lcg_eval(A, Bc, jj + 1,
                              np.full(N0, seed, np.uint32))
            vals = np.where(seeds & np.uint32(0x8000), r, -r)
            spec[f, c, int(band_off[b]) + (jj << LM) + k] = vals
            renorm_keys.add((f, b, c))
        for f, b, c in renorm_keys:
            sl = spec[f, c, int(band_off[b]) : int(band_off[b + 1])]
            g = 1.0 / np.sqrt(EPSILON + (sl * sl).sum())
            sl *= g

    # ---- denormalise + channel mixes (denormalise_c analog) ----
    sizes_b = np.diff(band_off[: nb + 1])
    band_of_pos = np.repeat(np.arange(nb), sizes_b)
    if len(band_of_pos) < nmax:   # spectrum above eBands[nb] is zero
        band_of_pos = np.pad(band_of_pos, (0, nmax - len(band_of_pos)))
    band_of_pos = band_of_pos[:nmax]
    gains = tr.fr_gains.astype(np.float64)       # [F, 2, nb]
    g_pos = gains[:, :, band_of_pos]             # [F, 2, nmax]
    freq = spec * g_pos
    freq[tr.sil != 0] = 0.0
    Cf = tr.chs
    if tr.CCout == 2:
        dup = (tr.CC == 2) & (Cf == 1) & (tr.sil == 0)
        freq[dup, 1] = freq[dup, 0]
    if tr.CC == 1:
        mixd = (Cf == 2) & (tr.sil == 0)
        freq[mixd, 0] = 0.5 * (freq[mixd, 0] + freq[mixd, 1])
    return freq[:, : tr.CCout].astype(np.float32)
