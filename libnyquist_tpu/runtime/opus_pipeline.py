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
