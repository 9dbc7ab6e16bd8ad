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
