"""Batched TPU synthesis pipeline for CELT/Opus streams.

The host half (formats/opus/celt.py) entropy-decodes packets into
denormalised spectra + postfilter parameters; this module runs the dense
half on TPU, whole-stream-at-a-time instead of the reference's
frame-at-a-time device calls (reference crosses the PCIe boundary per MDCT
call — cuda/mdct_cuda.cu:505-556; SURVEY.md §6 identifies that as the
bottleneck):

  [F, N2] spectra --MXU matmul--> frame contributions --shifted add-->
  raw synthesis --comb (Pallas kernel on TPU / scan on CPU)-->
  postfiltered --deemph (Toeplitz matmul + carry)--> PCM in [-1, 1]

Streams are batched along a leading axis; multi-chip scaling shards that
axis (pure data parallel, no collectives — parallel/mesh.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from ..formats.opus.celt import COMB_GAINS, COMBFILTER_MINPERIOD
from ..formats.opus.celt_tables import mode48000
from ..ops import comb as comb_ops
from ..ops import imdct as imdct_ops
from ..ops import scan_iir
from .batching import bucket_size

CELT_SIG_SCALE = 32768.0


def postfilter_frame_params(infos: List[dict]) -> List[dict]:
    """Replay the decoder's postfilter state machine
    (reference: celt_decoder_clean.c:652-685) over a frame sequence,
    yielding per frame the parameters of the two comb_filter calls."""
    period = period_old = 0
    gain = gain_old = 0.0
    tapset = tapset_old = 0
    out = []
    for info in infos:
        LM = info["LM"]
        p = max(period, COMBFILTER_MINPERIOD)
        p_old = max(period_old, COMBFILTER_MINPERIOD)
        g = [x * gain for x in COMB_GAINS[tapset]]
        g_old = [x * gain_old for x in COMB_GAINS[tapset_old]]
        pitch_new = max(info["postfilter_pitch"], COMBFILTER_MINPERIOD)
        g_new = [
            x * info["postfilter_gain"]
            for x in COMB_GAINS[info["postfilter_tapset"]]
        ]
        out.append(
            dict(
                T0a=p_old, T1a=p, g0a=g_old, g1a=g,
                T0b=p, T1b=pitch_new, g0b=g, g1b=g_new,
                frame_size=info["N"], LM=LM,
            )
        )
        # state rollover
        period_old, gain_old, tapset_old = period, gain, tapset
        period = info["postfilter_pitch"]
        gain = info["postfilter_gain"]
        tapset = info["postfilter_tapset"]
        if LM != 0:
            period_old, gain_old, tapset_old = period, gain, tapset
    return out


@dataclass
class SynthState:
    """Per-stream carried state across pipeline segments."""
    channels: int
    imdct_tail: list = None          # per channel [overlap]
    comb_hist: np.ndarray = None     # [C, HIST]
    deemph_mem: np.ndarray = None    # [C]

    def __post_init__(self):
        mode = mode48000()
        if self.imdct_tail is None:
            self.imdct_tail = [None] * self.channels
        if self.comb_hist is None:
            self.comb_hist = np.zeros(
                (self.channels, comb_ops.HIST), np.float32
            )
        if self.deemph_mem is None:
            self.deemph_mem = np.zeros(self.channels, np.float32)


def synthesize_segment(
    infos: List[dict], state: SynthState, fparams: List[dict]
) -> np.ndarray:
    """Synthesize a run of equal-(LM, shortBlocks) frames on TPU.

    Args:
      infos: frame dicts from celt_decode_frame_to_freq, all with the same
        (LM, shortBlocks) bucket.
      fparams: per-frame postfilter params for these frames, produced by
        postfilter_frame_params over the WHOLE stream (the postfilter
        state machine spans segment boundaries).
    Returns: [S, channels] float32 PCM in [-1, 1].
    """
    import jax.numpy as jnp

    mode = mode48000()
    overlap = mode.overlap
    CC = state.channels
    LM = infos[0]["LM"]
    shortBlocks = infos[0]["shortBlocks"]
    N = infos[0]["N"]
    F = len(infos)

    if shortBlocks:
        B = shortBlocks
        Nmdct = 2 * mode.shortMdctSize
    else:
        B = 1
        Nmdct = (2 * mode.shortMdctSize) << LM

    # Bucket the frame count so arbitrary segment lengths reuse a small
    # set of compiled programs (padding frames: zero spectra, zero gains).
    Fb = bucket_size(F, 8)
    S = F * N

    # IMDCT + overlap-add, per channel (batched over frames on the MXU).
    spectra = np.zeros((Fb, CC, N), np.float32)
    spectra[:F] = np.stack([info["freq"] for info in infos])
    raw = np.zeros((CC, S), np.float32)
    for c in range(CC):
        tail = state.imdct_tail[c]
        pcm, new_tail = imdct_ops.celt_imdct_batch_padded(
            jnp.asarray(spectra[:, c, :]), F, Nmdct, overlap,
            B=B, init_tail=tail,
        )
        raw[c] = np.asarray(pcm)[:S]
        state.imdct_tail[c] = new_tail

    # Postfilter (padding frames: T=15, gains 0 -> pass-through).
    pad_param = dict(T0a=15, T1a=15, g0a=[0.0] * 3, g1a=[0.0] * 3,
                     T0b=15, T1b=15, g0b=[0.0] * 3, g1b=[0.0] * 3,
                     frame_size=N, LM=LM)
    chunk = comb_ops.build_chunk_params(
        list(fparams) + [pad_param] * (Fb - F), N, mode.window,
        mode.shortMdctSize,
    )
    n_chunks = chunk["T0"].shape[0]
    y, _ = comb_ops.comb_filter(
        jnp.pad(jnp.asarray(raw), ((0, 0), (0, (Fb - F) * N))),
        jnp.asarray(state.comb_hist),
        jnp.broadcast_to(jnp.asarray(chunk["T0"]), (CC, n_chunks)),
        jnp.broadcast_to(jnp.asarray(chunk["T1"]), (CC, n_chunks)),
        jnp.broadcast_to(jnp.asarray(chunk["gains0"]), (CC, n_chunks, 3)),
        jnp.broadcast_to(jnp.asarray(chunk["gains1"]), (CC, n_chunks, 3)),
        jnp.broadcast_to(jnp.asarray(chunk["fade"]),
                         (CC, n_chunks, comb_ops.CHUNK)),
    )
    y = np.asarray(y)[:, :S]
    # Comb history after the REAL frames (host-side, cheap).
    joined = np.concatenate([state.comb_hist, y], axis=1)
    state.comb_hist = joined[:, -comb_ops.HIST:].astype(np.float32)

    # Deemphasis (pad to the block size then trim).
    Lb = scan_iir.BLOCK
    pad = (-S) % Lb
    yp = jnp.pad(jnp.asarray(y), ((0, 0), (0, pad)))
    out, mem = scan_iir.deemphasis(yp, jnp.asarray(state.deemph_mem))
    out = np.asarray(out)[:, :S]
    # The carry must reflect the last REAL sample, not the padding.
    state.deemph_mem = out[:, S - 1].astype(np.float32)

    return (out.T * np.float32(1.0 / CELT_SIG_SCALE)).astype(np.float32)


def synthesize_stream_host(infos: List[dict], channels: int) -> np.ndarray:
    """Whole-stream CELT synthesis on the host (NumPy/BLAS): the same
    paired-matrix IMDCT + overlap-add as the TPU pipeline, then the
    vectorized host comb postfilter and blocked-Toeplitz deemphasis.

    Default route for full-file loads of CELT-only streams: one GEMM per
    segment instead of a per-frame FFT + Python loop
    (celt_synthesize_host stays as the per-frame oracle).
    Returns [S, channels] float64 PCM in [-1, 1].
    """
    from ..formats.opus.celt import (
        COMBFILTER_MINPERIOD, VERY_SMALL, _deemph_toeplitz, comb_filter,
    )
    from ..ops.imdct import celt_synthesis_matrix

    mode = mode48000()
    ov = mode.overlap
    C = channels
    S = sum(info["N"] for info in infos)
    HIST = 1032                                           # > max T + 2

    # 1) batched IMDCT + overlap-add, written straight into the comb
    # history buffer (float32 like the reference's float build).
    # Uniform frame size (the usual case): ONE GEMM per (LM,
    # shortBlocks) kind over ALL its frames, wherever they sit in the
    # stream, then one vectorized tail add — transient-heavy streams
    # otherwise shatter into thousands of tiny per-segment GEMMs.
    buf = np.zeros((C, HIST + S), np.float32)
    Ns = {info["N"] for info in infos}
    if len(Ns) == 1:
        N = infos[0]["N"]
        F = len(infos)
        bufv = buf[:, HIST:].reshape(C, F, N)
        tails_all = np.zeros((C, F, ov), np.float32)
        kinds = {}
        for k, info in enumerate(infos):
            kinds.setdefault(
                (info["LM"], info["shortBlocks"]), []).append(k)
        for (LM, shortBlocks), sel in kinds.items():
            B = shortBlocks if shortBlocks else 1
            Nmdct = (2 * mode.shortMdctSize if shortBlocks
                     else (2 * mode.shortMdctSize) << LM)
            M = celt_synthesis_matrix(Nmdct, ov, B)       # [N, N+ov] f32
            sel_a = np.asarray(sel)
            for c in range(C):
                spec = np.stack(
                    [infos[k]["freq"][c] for k in sel]
                ).astype(np.float32, copy=False)
                cont = spec @ M                           # [Fk, N+ov]
                bufv[c][sel_a] = cont[:, :N]
                tails_all[c][sel_a] = cont[:, N:]
        # frame f's TDAC tail folds into frame f+1's head (stream order)
        for c in range(C):
            bufv[c][1:, :, ][:, :ov] += tails_all[c][:-1]
    else:
        tails = np.zeros((C, ov), np.float32)
        i = 0
        off0 = HIST
        while i < len(infos):
            key = (infos[i]["LM"], infos[i]["shortBlocks"])
            j = i
            while j < len(infos) and (infos[j]["LM"],
                                      infos[j]["shortBlocks"]) == key:
                j += 1
            LM, shortBlocks = key
            N = infos[i]["N"]
            B = shortBlocks if shortBlocks else 1
            Nmdct = (2 * mode.shortMdctSize if shortBlocks
                     else (2 * mode.shortMdctSize) << LM)
            M = celt_synthesis_matrix(Nmdct, ov, B)       # [N, N+ov] f32
            F = j - i
            spec = np.empty((F, N), np.float32)
            for c in range(C):
                for k in range(F):
                    spec[k] = infos[i + k]["freq"][c]
                cont = spec @ M                           # [F, N+ov]
                main = cont[:, :N]
                main[1:, :ov] += cont[:-1, N:]            # intra-segment
                main[0, :ov] += tails[c]
                buf[c, off0 : off0 + F * N] = main.reshape(-1)
                tails[c] = cont[-1, N:]
            off0 += F * N
            i = j

    # 2) comb postfilter: replay the decoder's state machine per frame
    # over the history-backed buffer (celt_decoder_clean.c:652-685).
    # Native whole-channel driver when available (one C call instead of
    # two Python calls per frame per channel).
    n0 = mode.shortMdctSize
    if _native_comb_stream(buf, HIST, infos, C, mode):
        pass
    else:
        _python_comb_state_machine(buf, HIST, infos, C, mode, n0)

    # 3) deemphasis.  Native: the exact O(n) scalar recurrence of the
    # reference (celt_decoder_clean.c:189 deemphasis).  Fallback:
    # blocked Toeplitz as ONE f32 GEMM per channel plus a vectorized
    # carry fixup (the recursive part of the carry is weighted
    # coef^(BLK+1) ~ 1e-68 — underflow — so the fixup is one rank-1
    # add).
    coef0 = mode.preemph[0]
    y = buf[:, HIST:]
    pcm = np.zeros((S, C))
    from .native import lib as _native_lib

    L = _native_lib()
    if L is not None and hasattr(L, "celt_deemph_stream_host"):
        import ctypes

        f32p = ctypes.POINTER(ctypes.c_float)
        for c in range(C):
            x = np.ascontiguousarray(y[c], np.float32)
            L.celt_deemph_stream_host(
                x.ctypes.data_as(f32p), S, np.float32(coef0),
                np.float32(0.0),
            )
            pcm[:, c] = x
        return pcm * (1.0 / CELT_SIG_SCALE)
    BLK = 960
    L, powers = _deemph_toeplitz(coef0, BLK)
    L32 = L.astype(np.float32)
    p32 = powers.astype(np.float32)
    pad = (-S) % BLK
    for c in range(C):
        x = np.concatenate(
            [y[c], np.zeros(pad, np.float32)]
        ).astype(np.float32) + np.float32(VERY_SMALL)
        blocks = x.reshape(-1, BLK) @ L32.T
        m = np.concatenate(
            [[np.float32(0.0)], np.float32(coef0) * blocks[:-1, BLK - 1]]
        )
        blocks += m[:, None] * p32[None]
        pcm[:, c] = blocks.reshape(-1)[:S]
    return pcm * (1.0 / CELT_SIG_SCALE)


def _native_comb_stream(buf, HIST, infos, C, mode) -> bool:
    from .native import lib

    L = lib()
    if L is None or not hasattr(L, "celt_comb_stream_host"):
        return False
    import ctypes

    from ..formats.opus.celt import COMB_GAINS

    F = len(infos)
    Ns = np.asarray([i["N"] for i in infos], np.int32)
    LMs = np.asarray([i["LM"] for i in infos], np.int32)
    pitch = np.asarray([i["postfilter_pitch"] for i in infos], np.int32)
    gains = np.asarray([i["postfilter_gain"] for i in infos], np.float64)
    tapsets = np.asarray(
        [i["postfilter_tapset"] for i in infos], np.int32)
    w2 = np.ascontiguousarray(
        np.asarray(mode.window, np.float64) ** 2)
    cg = np.ascontiguousarray(np.asarray(COMB_GAINS, np.float64))
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    i32p = ctypes.POINTER(ctypes.c_int32)
    for c in range(C):
        row = buf[c]
        assert row.flags["C_CONTIGUOUS"] and row.dtype == np.float32
        L.celt_comb_stream_host(
            row.ctypes.data_as(f32p), HIST, F,
            Ns.ctypes.data_as(i32p), LMs.ctypes.data_as(i32p),
            pitch.ctypes.data_as(i32p), gains.ctypes.data_as(f64p),
            tapsets.ctypes.data_as(i32p),
            w2.ctypes.data_as(f64p), int(mode.overlap),
            int(mode.shortMdctSize), cg.ctypes.data_as(f64p),
        )
    return True


def _python_comb_state_machine(buf, HIST, infos, C, mode, n0):
    from ..formats.opus.celt import COMBFILTER_MINPERIOD, comb_filter

    period = period_old = 0
    gain = gain_old = 0.0
    tapset = tapset_old = 0
    off = HIST
    ov = mode.overlap
    for info in infos:
        N = info["N"]
        LM = info["LM"]
        T_old = max(period, COMBFILTER_MINPERIOD)
        T_old2 = max(period_old, COMBFILTER_MINPERIOD)
        for c in range(C):
            comb_filter(buf[c], buf[c], off, T_old2, T_old, n0,
                        gain_old, gain, tapset_old, tapset,
                        mode.window, ov)
            if LM != 0:
                comb_filter(
                    buf[c], buf[c], off + n0, T_old,
                    max(info["postfilter_pitch"], COMBFILTER_MINPERIOD),
                    N - n0, gain, info["postfilter_gain"],
                    tapset, info["postfilter_tapset"], mode.window, ov,
                )
        period_old, gain_old, tapset_old = period, gain, tapset
        period = info["postfilter_pitch"]
        gain = info["postfilter_gain"]
        tapset = info["postfilter_tapset"]
        if LM != 0:
            period_old, gain_old, tapset_old = period, gain, tapset
        off += N


def synthesize_stream(infos: List[dict], channels: int) -> np.ndarray:
    """Full-stream TPU synthesis: segments by (LM, shortBlocks) bucket."""
    state = SynthState(channels=channels)
    fparams = postfilter_frame_params(infos)  # whole-stream state machine
    outs = []
    i = 0
    while i < len(infos):
        j = i
        key = (infos[i]["LM"], infos[i]["shortBlocks"])
        while j < len(infos) and (infos[j]["LM"], infos[j]["shortBlocks"]) == key:
            j += 1
        outs.append(synthesize_segment(infos[i:j], state, fparams[i:j]))
        i = j
    return np.concatenate(outs, axis=0)
