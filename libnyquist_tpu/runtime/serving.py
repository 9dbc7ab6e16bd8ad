"""Multi-stream serving: batched TPU synthesis across concurrent streams.

The reference decodes one stream at a time (one MDCT per CUDA call);
this framework's serving path batches the dense half of MANY streams
into single device programs — the batch axis is [stream x channel],
exactly how bench.py measures per-chip throughput. Host entropy decode
stays per-stream (embarrassingly parallel across CPU cores in a real
deployment).

Streams are batchable when their frame signatures — the per-frame
(LM, shortBlocks) sequence — match (same encoder settings and duration
bucket, the common fleet case). Shorter streams are padded with inert
frames (zero spectra, zero postfilter gains) and trimmed after
synthesis. Non-conforming or non-CELT streams fall back to the scalar
loader.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..formats.opus.celt import COMBFILTER_MINPERIOD
from ..formats.opus.celt_tables import mode48000
from ..ops import comb as comb_ops
from ..ops import imdct as imdct_ops
from ..ops import scan_iir
from .batching import bucket_size
from .jaxcfg import serving_jit
from .opus_pipeline import (
    CELT_SIG_SCALE,
    SynthState,
    postfilter_frame_params,
)


def _signature(infos) -> tuple:
    return tuple((i["LM"], i["shortBlocks"]) for i in infos)


def synthesize_streams(
    infos_per_stream: List[List[dict]], channels: int
) -> List[np.ndarray]:
    """Batched synthesize_stream over streams with equal frame signatures.

    Args:
      infos_per_stream: per stream, the frame dicts from
        celt_decode_frame_to_freq. Shorter streams are padded with inert
        frames up to the longest; all real frames at the same index must
        share (LM, shortBlocks).
    Returns: per stream, [S_stream, channels] float32 PCM.
    """
    import jax.numpy as jnp

    mode = mode48000()
    n_streams = len(infos_per_stream)
    lengths = [len(s) for s in infos_per_stream]
    F_max = max(lengths)
    ref = max(infos_per_stream, key=len)

    # pad shorter streams with inert frames matching the reference frame
    padded = []
    for s in infos_per_stream:
        if len(s) < F_max:
            pads = [
                dict(r, freq=np.zeros_like(r["freq"]),
                     postfilter_pitch=COMBFILTER_MINPERIOD,
                     postfilter_gain=0.0, postfilter_tapset=0)
                for r in ref[len(s):]
            ]
            s = list(s) + pads
        padded.append(s)
    sig = _signature(ref)
    for s in padded:
        if _signature(s) != sig:
            raise ValueError("frame signatures differ; cannot batch")

    rows = n_streams * channels
    states = [SynthState(channels=channels) for _ in range(n_streams)]
    fparams = [postfilter_frame_params(s) for s in padded]

    outs = [[] for _ in range(n_streams)]
    i = 0
    while i < F_max:
        j = i
        key = sig[i]
        while j < F_max and sig[j] == key:
            j += 1
        seg = slice(i, j)
        _synth_segment_batch(padded, fparams, states, seg, channels,
                             mode, outs, jnp)
        i = j
    results = []
    for k, o in enumerate(outs):
        full = np.concatenate(o, axis=0)
        real = sum(fr["N"] for fr in infos_per_stream[k])
        results.append(full[:real])
    return results


def _synth_segment_batch(padded, fparams, states, seg, CC, mode, outs, jnp):
    infos0 = padded[0][seg]
    LM = infos0[0]["LM"]
    shortBlocks = infos0[0]["shortBlocks"]
    N = infos0[0]["N"]
    F = len(infos0)
    n_streams = len(padded)
    rows = n_streams * CC

    if shortBlocks:
        B = shortBlocks
        Nmdct = 2 * mode.shortMdctSize
    else:
        B = 1
        Nmdct = (2 * mode.shortMdctSize) << LM

    Fb = bucket_size(F, 8)
    S = F * N

    spectra = np.zeros((rows, Fb, N), np.float32)
    for k, s in enumerate(padded):
        for f, info in enumerate(s[seg]):
            spectra[k * CC : (k + 1) * CC, f] = info["freq"]

    # One device program for the whole [streams x channels] batch.
    tails = np.zeros((rows, mode.overlap), np.float32)
    for k in range(n_streams):
        for c in range(CC):
            t = states[k].imdct_tail[c]
            if t is not None:
                tails[k * CC + c] = np.asarray(t)
    raw_dev, all_tails = imdct_ops.celt_imdct_rows(
        jnp.asarray(spectra), Nmdct, mode.overlap, B=B,
        tails=jnp.asarray(tails),
    )
    raw = np.asarray(raw_dev)[:, :S]
    carry = np.asarray(all_tails[:, F - 1])  # after the last REAL frame
    for k in range(n_streams):
        for c in range(CC):
            states[k].imdct_tail[c] = carry[k * CC + c]

    pad_param = dict(T0a=15, T1a=15, g0a=[0.0] * 3, g1a=[0.0] * 3,
                     T0b=15, T1b=15, g0b=[0.0] * 3, g1b=[0.0] * 3,
                     frame_size=N, LM=LM)
    n_chunks = None
    T0 = T1 = g0 = g1 = fade = None
    for k in range(n_streams):
        chunk = comb_ops.build_chunk_params(
            list(fparams[k][seg]) + [pad_param] * (Fb - F), N,
            mode.window, mode.shortMdctSize,
        )
        if n_chunks is None:
            n_chunks = chunk["T0"].shape[0]
            T0 = np.zeros((rows, n_chunks), np.int32)
            T1 = np.zeros((rows, n_chunks), np.int32)
            g0 = np.zeros((rows, n_chunks, 3), np.float32)
            g1 = np.zeros((rows, n_chunks, 3), np.float32)
            fade = np.zeros((rows, n_chunks, comb_ops.CHUNK), np.float32)
        sl = slice(k * CC, (k + 1) * CC)
        T0[sl] = chunk["T0"]
        T1[sl] = chunk["T1"]
        g0[sl] = chunk["gains0"]
        g1[sl] = chunk["gains1"]
        fade[sl] = chunk["fade"]

    hist = np.concatenate([st.comb_hist for st in states], axis=0)
    y, _ = comb_ops.comb_filter(
        jnp.pad(jnp.asarray(raw), ((0, 0), (0, (Fb - F) * N))),
        jnp.asarray(hist), jnp.asarray(T0), jnp.asarray(T1),
        jnp.asarray(g0), jnp.asarray(g1), jnp.asarray(fade),
    )
    y = np.asarray(y)[:, :S]
    joined = np.concatenate([hist, y], axis=1)[:, -comb_ops.HIST :]
    for k in range(n_streams):
        states[k].comb_hist = joined[k * CC : (k + 1) * CC].astype(
            np.float32)

    mem = np.concatenate([st.deemph_mem for st in states])
    padn = (-S) % scan_iir.BLOCK
    out, _ = scan_iir.deemphasis(
        jnp.pad(jnp.asarray(y), ((0, 0), (0, padn))), jnp.asarray(mem)
    )
    out = np.asarray(out)[:, :S]
    for k in range(n_streams):
        states[k].deemph_mem = out[k * CC : (k + 1) * CC, S - 1].astype(
            np.float32)

    scale = np.float32(1.0 / CELT_SIG_SCALE)
    for k in range(n_streams):
        blk = out[k * CC : (k + 1) * CC].T * scale   # [S, CC]
        outs[k].append(blk.astype(np.float32))


# ----------------------------------------------------------------------
# Unified chunked serving: ONE compiled program for mixed long/transient
# frames. The long-block and short-block synthesis matrices have the same
# shape [N2, N2(+ov)], so a per-frame 0/1 mask selects between them with
# two extra masked matmuls instead of per-segment dispatch (the segmented
# path above issues one device call per (LM, shortBlocks) run — ~500
# dispatches for a 3.7-minute file; this path issues F/F_CHUNK).
# ----------------------------------------------------------------------

import functools as _functools

import jax
import jax.numpy as jnp

from ..formats.opus.celt_tables import COMB_GAINS as _COMB_GAINS

F_CHUNK = 512  # frames per device step (~10.2s of 20ms frames)


def postfilter_params_arrays(short_blocks, pf_pitch, pf_gain, pf_tapset):
    """Vectorized postfilter state machine for LM>0 streams.

    For LM != 0 frames the decoder collapses the two-frame-old state to
    the previous frame's (celt_decoder_clean.c:669-685), so the segment-A
    (first shortMdctSize samples) params are simply the previous frame's
    signaled values and segment B crossfades previous -> current.
    Returns per-frame arrays (TA, gA[3], TB1, gB1[3]) where segment A uses
    (T0=T1=TA, g0=g1=gA) and segment B uses (T0=TA, T1=TB1, g0=gA, g1=gB1).
    """
    n = len(pf_pitch)
    gains_tbl = np.asarray(_COMB_GAINS, np.float32)          # [tapsets, 3]
    T_cur = np.maximum(np.asarray(pf_pitch, np.int32), COMBFILTER_MINPERIOD)
    g_cur = gains_tbl[np.asarray(pf_tapset, np.int64)] * np.asarray(
        pf_gain, np.float32)[:, None]
    TA = np.concatenate([[COMBFILTER_MINPERIOD], T_cur[:-1]]).astype(np.int32)
    gA = np.concatenate([np.zeros((1, 3), np.float32), g_cur[:-1]])
    return TA, gA, T_cur, g_cur


@_functools.lru_cache(maxsize=None)
def _fade_pattern(N, overlap, short_mdct):
    """Per-frame crossfade pattern [chunks_per_frame, CHUNK]: w^2 ramp in
    the first `overlap` samples of each comb segment, 1.0 after — the
    same for every frame, so built once and tiled on device."""
    mode = mode48000()
    w2 = (mode.window * mode.window).astype(np.float32)
    cpf = N // comb_ops.CHUNK
    fade = np.ones((cpf, comb_ops.CHUNK), np.float32)
    for k in range(cpf):
        pos = k * comb_ops.CHUNK
        seg = 0 if pos < short_mdct else short_mdct
        for j in range(comb_ops.CHUNK):
            r = pos - seg + j
            if r < overlap:
                fade[k, j] = w2[r]
    return fade


def unified_step_body(spec, mask_s, TA, gA, TB1, gB1, fade_pat,
                      T1m, T1p, T8m, T8p, tails, hist, mem,
                      overlap, short_mdct):
    """One serving step: [rows, F, N] spectra -> [rows, F*N] PCM.

    spec is the chunk's denormalised spectra; mask_s [F] selects the
    short-block matrix per frame. Comb params arrive per FRAME (tiny) and
    are expanded to per-chunk shape on device.  Plain traceable function
    so callers (bench, serving) can fuse it into their own jitted steps.
    """
    R, F, N = spec.shape
    hp = jax.lax.Precision.HIGHEST
    mL = (1.0 - mask_s)[None, :, None]
    mS = mask_s[None, :, None]

    specL = spec * mL
    specS = spec * mS
    flatL = specL.reshape(-1, N)
    flatS = specS.reshape(-1, N)
    main = (jnp.dot(flatL, T1m, preferred_element_type=jnp.float32,
                    precision=hp)
            + jnp.dot(flatS, T8m, preferred_element_type=jnp.float32,
                      precision=hp))
    prevL = jnp.concatenate(
        [jnp.zeros((R, 1, N), jnp.float32), specL[:, :-1]], axis=1
    ).reshape(-1, N)
    prevS = jnp.concatenate(
        [jnp.zeros((R, 1, N), jnp.float32), specS[:, :-1]], axis=1
    ).reshape(-1, N)
    shifted = (jnp.dot(prevL, T1p, preferred_element_type=jnp.float32,
                       precision=hp)
               + jnp.dot(prevS, T8p, preferred_element_type=jnp.float32,
                         precision=hp))
    raw = (main + shifted).reshape(R, F, N)
    raw = raw.at[:, 0, :overlap].add(tails)
    new_tails = (
        jnp.dot(specL[:, -1], T1p[:, :overlap],
                preferred_element_type=jnp.float32, precision=hp)
        + jnp.dot(specS[:, -1], T8p[:, :overlap],
                  preferred_element_type=jnp.float32, precision=hp))

    # Expand per-frame comb params to per-chunk [rows, F*cpf, ...].
    cpf = N // comb_ops.CHUNK
    seg_a = jnp.arange(cpf) * comb_ops.CHUNK < short_mdct   # [cpf]
    T0 = jnp.broadcast_to(TA[:, None], (F, cpf))            # both segs old=TA
    T1 = jnp.where(seg_a[None, :], TA[:, None], TB1[:, None])
    g0 = jnp.broadcast_to(gA[:, None, :], (F, cpf, 3))
    g1 = jnp.where(seg_a[None, :, None], gA[:, None, :], gB1[:, None, :])
    fade = jnp.broadcast_to(fade_pat[None], (F, cpf, comb_ops.CHUNK))
    nch = F * cpf
    T0 = jnp.broadcast_to(T0.reshape(1, nch), (R, nch))
    T1 = jnp.broadcast_to(T1.reshape(1, nch), (R, nch))
    g0 = jnp.broadcast_to(g0.reshape(1, nch, 3), (R, nch, 3))
    g1 = jnp.broadcast_to(g1.reshape(1, nch, 3), (R, nch, 3))
    fade = jnp.broadcast_to(
        fade.reshape(1, nch, comb_ops.CHUNK), (R, nch, comb_ops.CHUNK))

    S = F * N
    y, new_hist = comb_ops.comb_filter(
        raw.reshape(R, S), hist, T0, T1, g0, g1, fade)
    pad = (-S) % scan_iir.BLOCK
    out, new_mem = scan_iir.deemphasis(
        jnp.pad(y, ((0, 0), (0, pad))), mem)
    pcm = out[:, :S] * (1.0 / CELT_SIG_SCALE)
    return pcm, new_tails, new_hist, new_mem


_unified_step = _functools.partial(
    jax.jit, static_argnames=("overlap", "short_mdct"))(unified_step_body)


def synthesize_streams_unified(
    freq, short_blocks, pf_pitch, pf_gain, pf_tapset, channels,
    f_chunk: int = F_CHUNK, fetch=True, frame_sizes=None,
):
    """Whole-stream device synthesis without segmentation.

    Args:
      freq: [F, CC, N] float32 denormalised spectra (the native stream
        decoder's raw output layout), one stream.
      short_blocks / pf_*: per-frame arrays from the native decoder.
    Returns [S, CC] float32 PCM (when fetch=True).
    Requires every frame to share N (fixed frame size) and LM > 0.
    """
    import jax.numpy as jnp

    mode = mode48000()
    F, CC, N = freq.shape
    B_short = int(max(short_blocks)) if len(short_blocks) else 0
    LM = (N // mode.shortMdctSize).bit_length() - 1
    if LM == 0:
        raise ValueError("unified path requires LM > 0")
    if frame_sizes is not None and not (np.asarray(frame_sizes) == N).all():
        raise ValueError("unified path requires a fixed frame size")
    NmdctL = (2 * mode.shortMdctSize) << LM
    T1m, T1p, _ = imdct_ops.celt_synthesis_matrices_paired(
        NmdctL, mode.overlap, 1)
    if B_short:
        T8m, T8p, _ = imdct_ops.celt_synthesis_matrices_paired(
            2 * mode.shortMdctSize, mode.overlap, B_short)
    else:
        T8m, T8p = np.zeros_like(T1m), np.zeros_like(T1p)

    TA, gA, TB1, gB1 = postfilter_params_arrays(
        short_blocks, pf_pitch, pf_gain, pf_tapset)
    fade_pat = _fade_pattern(N, mode.overlap, mode.shortMdctSize)

    R = CC
    tails = jnp.zeros((R, mode.overlap), jnp.float32)
    hist = jnp.zeros((R, comb_ops.HIST), jnp.float32)
    mem = jnp.zeros((R,), jnp.float32)
    T1m_d, T1p_d = jnp.asarray(T1m), jnp.asarray(T1p)
    T8m_d, T8p_d = jnp.asarray(T8m), jnp.asarray(T8p)
    fade_d = jnp.asarray(fade_pat)

    outs = []
    for f0 in range(0, F, f_chunk):
        f1 = min(f0 + f_chunk, F)
        Fc = f1 - f0
        pad = f_chunk - Fc
        spec = np.transpose(freq[f0:f1], (1, 0, 2))          # [CC, Fc, N]
        if pad:
            spec = np.concatenate(
                [spec, np.zeros((CC, pad, N), np.float32)], axis=1)
        ms = np.zeros(f_chunk, np.float32)
        ms[:Fc] = (np.asarray(short_blocks[f0:f1]) != 0)
        TAc = np.full(f_chunk, COMBFILTER_MINPERIOD, np.int32)
        TAc[:Fc] = TA[f0:f1]
        gAc = np.zeros((f_chunk, 3), np.float32)
        gAc[:Fc] = gA[f0:f1]
        TB1c = np.full(f_chunk, COMBFILTER_MINPERIOD, np.int32)
        TB1c[:Fc] = TB1[f0:f1]
        gB1c = np.zeros((f_chunk, 3), np.float32)
        gB1c[:Fc] = gB1[f0:f1]
        pcm, tails, hist, mem = _unified_step(
            jnp.asarray(spec), jnp.asarray(ms), jnp.asarray(TAc),
            jnp.asarray(gAc), jnp.asarray(TB1c), jnp.asarray(gB1c),
            fade_d, T1m_d, T1p_d, T8m_d, T8p_d, tails, hist, mem,
            mode.overlap, mode.shortMdctSize,
        )
        outs.append(pcm[:, : Fc * N])
    if not fetch:
        return outs
    full = np.concatenate([np.asarray(o) for o in outs], axis=1)
    return full.T.astype(np.float32)


# --------------------------------------------------------------------------
# Vorbis serving: batched IMDCT + window + lapping over streams x packets
# (reference: libvorbis/src/mdct.c:397 mdct_backward, block.c lapping)
# --------------------------------------------------------------------------
def synthesize_vorbis_streams(specs: np.ndarray, n: int, use_device=True):
    """Batched uniform-blocksize Vorbis synthesis.

    Args:
      specs: [R, F, n//2] float — per-packet spectra (floor curve x
        residue, after coupling) for R stream-channels with the SAME
        blocksize n on every packet (the common all-long-blocks case;
        mixed-block streams stay on the scalar path).
    Returns: [R, (F-1) * n//2] pcm — Vorbis emits from the second
      packet (the first primes the lap cache).

    One [R*F, n2] @ [n2, n] matmul (MXU) plus two shifted windowed adds:
    the same no-carry overlap-add shape as the CELT path.
    """
    from ..formats.vorbis import imdct_matrix, vorbis_window

    R, F, n2 = specs.shape
    assert n2 * 2 == n
    M = imdct_matrix(n).astype(np.float32)        # [n, n2]
    wfull = np.empty(n, np.float32)
    wfull[:n2] = vorbis_window(n2)
    wfull[n2:] = vorbis_window(n2)[::-1]

    if use_device:
        import jax.numpy as jnp

        td = jnp.einsum(
            "rfk,nk->rfn", jnp.asarray(specs, jnp.float32), jnp.asarray(M),
            precision="highest",
        )
        tw = td * jnp.asarray(wfull)
        out = tw[:, :-1, n2:] + tw[:, 1:, :n2]
        return out.reshape(R, -1)
    td = specs.reshape(R * F, n2) @ M.T
    tw = (td.reshape(R, F, n) * wfull)
    out = tw[:, :-1, n2:] + tw[:, 1:, :n2]
    return out.reshape(R, -1)


# --------------------------------------------------------------------------
# Musepack serving: batched 32-band synthesis over streams
# (reference: musepack/libmpcdec/synth_filter.c:356)
# --------------------------------------------------------------------------
def synthesize_mpc_streams(ys: np.ndarray, use_device=True):
    """Batched whole-stream MPC synthesis, zero initial V state.

    Args:
      ys: [R, T, 32] requantized subband rows (T = 36 * n_frames) for R
        stream-channels.
    Returns: [R, T * 32] pcm.

    Matches formats/musepack._synth_stream row-for-row: one
    [R*T, 32] @ [32, 64] matmul plus a 16-tap sliding combine whose tap
    columns are fixed slices (no gathers on the MXU path).
    """
    from ..formats.musepack import _M_SYNTH, _T

    R, T, _ = ys.shape
    M = np.asarray(_M_SYNTH, np.float32)          # [64, 32]
    di = np.asarray(_T["Di"], np.float32)         # [32, 16]

    if use_device:
        import jax.numpy as jnp

        blocks = jnp.einsum(
            "rtk,nk->rtn", jnp.asarray(ys, jnp.float32), jnp.asarray(M),
            precision="highest",
        )
        bpad = jnp.concatenate(
            [jnp.zeros((R, 15, 64), blocks.dtype), blocks], axis=1)
        a = bpad[:, :, :32]
        b = bpad[:, :, 32:64]
        out = jnp.zeros((R, T, 32), jnp.float32)
        for j in range(0, 16, 2):
            out = out + a[:, 15 - j : 15 - j + T] * di[:, j]
            out = out + b[:, 14 - j : 14 - j + T] * di[:, j + 1]
        return out.reshape(R, -1)
    blocks = ys.reshape(R * T, 32).astype(np.float32) @ M.T
    bpad = np.concatenate(
        [np.zeros((R, 15, 64), np.float32), blocks.reshape(R, T, 64)],
        axis=1)
    a = bpad[:, :, :32]
    b = bpad[:, :, 32:64]
    out = np.zeros((R, T, 32), np.float32)
    for j in range(0, 16, 2):
        out += a[:, 15 - j : 15 - j + T] * di[:, j]
        out += b[:, 14 - j : 14 - j + T] * di[:, j + 1]
    return out.reshape(R, -1)


def vorbis_lap_plan(frames_meta, blocksizes):
    """Precompute the static lapping structure for a mixed-blocksize
    Vorbis packet sequence (the serving signature).

    Args:
      frames_meta: per packet (n, blockflag, long_prev, long_next).
      blocksizes: (bs0, bs1).
    Returns dict with:
      W [F, nmax]    — per-packet lap window, zero-padded,
      idx_prev/idx_cur [out_len] — gather indices into the flattened
        windowed time-domain tensor [F * nmax] (each output sample sums
        at most one previous-packet tail and one current-packet head
        contribution; -1 = no contribution, masked),
      out_len, nmax.
    """
    from ..formats.vorbis import _lap_window

    F = len(frames_meta)
    ns = [m[0] for m in frames_meta]
    nmax = max(ns) if ns else 0
    W = np.zeros((F, nmax), np.float32)
    for f, (n, bf, lp, ln) in enumerate(frames_meta):
        W[f, :n] = _lap_window(n, blocksizes, bf, lp, ln)

    # replay the emission logic of the scalar loop with indices
    out_len = 0
    prev_n = 0
    spans_prev = []   # (dst, frame, src, length): prev packet's tail
    spans_cur = []    # current packet's head
    for f, n in enumerate(ns):
        n2 = n // 2
        if f > 0:
            L = prev_n // 4 + n // 4
            m = min(prev_n // 2, L)
            spans_prev.append((out_len, f - 1, prev_n // 2, m))
            o = prev_n // 4 - n // 4
            s0 = max(o, 0)
            ss = s0 - o
            length = min(L - s0, n2 - ss)
            if length > 0:
                spans_cur.append((out_len + s0, f, ss, length))
            out_len += L
        prev_n = n

    idx_prev = np.full(out_len, -1, np.int64)
    idx_cur = np.full(out_len, -1, np.int64)
    for dst, f, src, ln in spans_prev:
        idx_prev[dst : dst + ln] = f * nmax + src + np.arange(ln)
    for dst, f, src, ln in spans_cur:
        idx_cur[dst : dst + ln] = f * nmax + src + np.arange(ln)
    return dict(W=W, idx_prev=idx_prev, idx_cur=idx_cur,
                out_len=out_len, nmax=nmax, ns=ns)


def synthesize_vorbis_streams_mixed(specs_padded, plan, use_device=True):
    """Batched mixed-blocksize Vorbis synthesis over R stream-channels.

    Args:
      specs_padded: [R, F, nmax//2] spectra zero-padded per packet.
      plan: vorbis_lap_plan output (the shared signature).
    Returns [R, out_len] pcm.

    IMDCT runs as one matmul per distinct blocksize; the mixed-size
    overlap-add collapses to two masked gathers with static indices —
    no per-packet control flow on device.
    """
    from ..formats.vorbis import imdct_matrix

    R, F, nmax2 = specs_padded.shape
    nmax = plan["nmax"]
    ns = np.asarray(plan["ns"])
    W = plan["W"]
    xp_is_jax = use_device
    if xp_is_jax:
        import jax.numpy as jnp
        xp = jnp
        specs = jnp.asarray(specs_padded, jnp.float32)
    else:
        xp = np
        specs = specs_padded.astype(np.float32)

    tw = xp.zeros((R, F, nmax), xp.float32)
    for n in sorted(set(plan["ns"])):
        sel = np.nonzero(ns == n)[0]
        M = imdct_matrix(n).astype(np.float32)       # [n, n2]
        sub = specs[:, sel, : n // 2]
        td = xp.einsum("rfk,nk->rfn", sub, xp.asarray(M),
                       precision="highest") if xp_is_jax else np.einsum(
                           "rfk,nk->rfn", sub, M)
        if xp_is_jax:
            tw = tw.at[:, sel, :n].set(td)
        else:
            tw[:, sel, :n] = td
    tw = tw * xp.asarray(W)
    flat = tw.reshape(R, F * nmax)
    ip = xp.asarray(np.maximum(plan["idx_prev"], 0))
    ic = xp.asarray(np.maximum(plan["idx_cur"], 0))
    mp_ = xp.asarray((plan["idx_prev"] >= 0).astype(np.float32))
    mc = xp.asarray((plan["idx_cur"] >= 0).astype(np.float32))
    out = flat[:, ip] * mp_ + flat[:, ic] * mc
    return out


def make_opus_stream_program(replay_key, F, N, CC, n_steps, f_chunk,
                             overlap, short_mdct):
    """ONE jitted program per Opus stream for the iy-split serving path:
    PVQ-plane replay (ops/celt_replay.py) + the full batched synthesis
    (IMDCT matmuls + TDAC + comb + deemphasis) as a lax.scan over
    F_CHUNK chunks, returning the final states and the per-row PCM sum
    (the reference Main.cpp:146 checksum form).

    Fusing both halves into a single executable matters on real
    deployments and doubly so on this rig: alternating two large
    programs per stream leaves the runtime reloading/defragmenting per
    dispatch (measured: a ~2.7s fixed tax per replay call after the
    step program runs; fused: sub-ms dispatch).
    """
    import jax
    import jax.numpy as jnp

    from ..ops.celt_replay import _replay_builder

    replay = _replay_builder(replay_key)
    Fpad = n_steps * f_chunk

    def fn(arrs, synth):
        rf = replay(arrs)                         # [CCout*F, N]
        spec = rf.reshape(-1, F, rf.shape[-1])[:CC]
        spec = jnp.pad(spec, ((0, 0), (0, Fpad - F), (0, 0)))
        spec = spec.reshape(CC, n_steps, f_chunk, N).transpose(1, 0, 2, 3)

        def body(carry, xs):
            tails, hist, mem, acc = carry
            sp, msk, TA, gA, TB1, gB1 = xs
            pcm, tails, hist, mem = unified_step_body(
                sp, msk, TA, gA, TB1, gB1, synth["fade"],
                synth["T1m"], synth["T1p"], synth["T8m"], synth["T8p"],
                tails, hist, mem, overlap, short_mdct)
            acc = acc + jnp.sum(pcm, axis=1)
            return (tails, hist, mem, acc), jnp.float32(0)

        from ..ops import comb as comb_ops

        init = (jnp.zeros((CC, overlap), jnp.float32),
                jnp.zeros((CC, comb_ops.HIST), jnp.float32),
                jnp.zeros((CC,), jnp.float32),
                jnp.zeros((CC,), jnp.float32))
        xs = (spec, synth["msk"], synth["TA"], synth["gA"],
              synth["TB1"], synth["gB1"])
        (tails, hist, mem, acc), _ = jax.lax.scan(body, init, xs)
        return acc

    return serving_jit(fn)


def make_opus_stream_program_batched(replay_key, K, F, N, CC, n_steps,
                                     f_chunk, overlap, short_mdct, *,
                                     with_synth=True, with_comb=True,
                                     with_deemph=True):
    """K-stream batched fused program (replay + synthesis) — the
    serving shape: one executable decodes a whole batch, so the comb /
    deemphasis scans and the small replay ops amortize across K*CC rows
    instead of running once per stream (a single-stream program keeps
    the chip <2% busy between its sequential scan steps; measured
    0.59 s/stream solo vs ~0.1 s/stream in an 8-batch).

    arrs leaves carry a leading K axis (one host trace per stream; same
    static structure — runtime/batching.py-style shape bucketing applies
    across streams).  synth comb params (TA/gA/TB1/gB1/msk) are [K, ...]
    per-stream.  Returns acc [K, CC] per-row PCM sums (Main.cpp:146).
    """
    from ..ops.celt_replay import _replay_builder

    replay = _replay_builder(replay_key)
    Fpad = n_steps * f_chunk
    R = K * CC

    def fn(arrs, synth):
        # The replay is strictly 2-D with channel-major rows end to end
        # ([CCout*F, N], see ops/celt_replay._replay_builder): any CC=2
        # axis invites a channel-minor layout — CC on the 128-lane
        # tile, a 64x-padded 44 GB copy at K=8 (measured OOM).
        # Channel extraction is a contiguous row-block slice.
        def replay_chans(a):
            fq = replay(a)                         # [CCout*F, N]
            return tuple(fq[c * F : (c + 1) * F] for c in range(CC))

        chans = jax.vmap(replay_chans)(arrs)       # CC x [K, F, N]
        spec = jnp.concatenate(chans, axis=0)      # [R, F, N] (c*K+k)
        if not with_synth:
            # replay-only variant (bench stage split): a full
            # reduction keeps every replay op live, output stays tiny
            return jnp.sum(spec, axis=(1, 2)).reshape(CC, K).T
        spec = jnp.pad(spec, ((0, 0), (0, Fpad - F), (0, 0)))

        def expand_rows(x):                        # [K, ...] -> rows
            return jnp.tile(x, (CC,) + (1,) * (x.ndim - 1))

        def body(carry, step):
            tails, hist, mem, acc = carry
            lo = step * f_chunk
            sp = jax.lax.dynamic_slice_in_dim(spec, lo, f_chunk, axis=1)

            def param(name):
                v = jax.lax.dynamic_index_in_dim(
                    synth[name], step, axis=1, keepdims=False)
                return expand_rows(v)              # [R, f_chunk(, 3)]

            pcm, tails, hist, mem = unified_step_row_body(
                sp, param("msk"), param("TA"), param("gA"),
                param("TB1"), param("gB1"), synth["fade"],
                synth["T1m"], synth["T1p"], synth["T8m"], synth["T8p"],
                tails, hist, mem, overlap, short_mdct,
                with_comb=with_comb, with_deemph=with_deemph)
            acc = acc + jnp.sum(pcm, axis=1)
            return (tails, hist, mem, acc), jnp.float32(0)

        from ..ops import comb as comb_ops

        init = (jnp.zeros((R, overlap), jnp.float32),
                jnp.zeros((R, comb_ops.HIST), jnp.float32),
                jnp.zeros((R,), jnp.float32),
                jnp.zeros((R,), jnp.float32))
        (tails, hist, mem, acc), _ = jax.lax.scan(
            body, init, jnp.arange(n_steps, dtype=jnp.int32))
        # rows are ordered channel-major (c*K + k)
        return acc.reshape(CC, K).T

    return serving_jit(fn)


def unified_step_row_body(spec, mask_s, TA, gA, TB1, gB1, fade_pat,
                          T1m, T1p, T8m, T8p, tails, hist, mem,
                          overlap, short_mdct, *, with_comb=True,
                          with_deemph=True):
    """unified_step_body with PER-ROW comb params and short-block mask
    (multi-stream batches: each row may come from a different stream).

    mask_s/TA/TB1: [R, F]; gA/gB1: [R, F, 3].

    with_comb / with_deemph are STATIC stage switches for the bench's
    device stage split (bench.py _opus_stage_split): disabling a stage
    removes it from the compiled program so cumulative variants
    isolate per-stage cost by subtraction (the reference's per-stage
    cudaEvent discipline, mdct_cuda_b8.cu:430-464).  Serving always
    runs with both on.
    """
    R, F, N = spec.shape
    hp = jax.lax.Precision.HIGHEST
    mL = (1.0 - mask_s)[:, :, None]
    mS = mask_s[:, :, None]

    specL = spec * mL
    specS = spec * mS
    flatL = specL.reshape(-1, N)
    flatS = specS.reshape(-1, N)
    main = (jnp.dot(flatL, T1m, preferred_element_type=jnp.float32,
                    precision=hp)
            + jnp.dot(flatS, T8m, preferred_element_type=jnp.float32,
                      precision=hp))
    prevL = jnp.concatenate(
        [jnp.zeros((R, 1, N), jnp.float32), specL[:, :-1]], axis=1
    ).reshape(-1, N)
    prevS = jnp.concatenate(
        [jnp.zeros((R, 1, N), jnp.float32), specS[:, :-1]], axis=1
    ).reshape(-1, N)
    shifted = (jnp.dot(prevL, T1p, preferred_element_type=jnp.float32,
                       precision=hp)
               + jnp.dot(prevS, T8p, preferred_element_type=jnp.float32,
                         precision=hp))
    raw = (main + shifted).reshape(R, F, N)
    raw = raw.at[:, 0, :overlap].add(tails)
    new_tails = (
        jnp.dot(specL[:, -1], T1p[:, :overlap],
                preferred_element_type=jnp.float32, precision=hp)
        + jnp.dot(specS[:, -1], T8p[:, :overlap],
                  preferred_element_type=jnp.float32, precision=hp))

    cpf = N // comb_ops.CHUNK
    seg_a = jnp.arange(cpf) * comb_ops.CHUNK < short_mdct   # [cpf]
    T0 = jnp.broadcast_to(TA[:, :, None], (R, F, cpf))
    T1 = jnp.where(seg_a[None, None, :], TA[:, :, None], TB1[:, :, None])
    g0 = jnp.broadcast_to(gA[:, :, None, :], (R, F, cpf, 3))
    g1 = jnp.where(seg_a[None, None, :, None], gA[:, :, None, :],
                   gB1[:, :, None, :])
    nch = F * cpf
    fade = jnp.broadcast_to(fade_pat[None], (F, cpf, comb_ops.CHUNK))
    fade = jnp.broadcast_to(
        fade.reshape(1, nch, comb_ops.CHUNK), (R, nch, comb_ops.CHUNK))

    S = F * N
    if with_comb:
        y, new_hist = comb_ops.comb_filter(
            raw.reshape(R, S), hist, T0.reshape(R, nch),
            T1.reshape(R, nch), g0.reshape(R, nch, 3),
            g1.reshape(R, nch, 3), fade)
    else:
        y, new_hist = raw.reshape(R, S), hist
    if with_deemph:
        pad = (-S) % scan_iir.BLOCK
        out, new_mem = scan_iir.deemphasis(
            jnp.pad(y, ((0, 0), (0, pad))), mem)
    else:
        out, new_mem = y, mem
    pcm = out[:, :S] * (1.0 / CELT_SIG_SCALE)
    return pcm, new_tails, new_hist, new_mem
