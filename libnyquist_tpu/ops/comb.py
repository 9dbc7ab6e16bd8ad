"""CELT pitch postfilter as a batched chunked scan on TPU.

The reference applies the comb filter in place over the decode buffer
(reference: celt/celt.c:114-172): y[i] = x[i] + taps(y[i-T-2 .. i-T+2])
with per-frame pitch lag T in [15, 1024] — a true IIR across the stream.
Since T >= COMBFILTER_MINPERIOD (15), any 12-sample chunk only reads
samples strictly before the chunk, so the stream decodes as a scan over
12-sample chunks, fully vectorized over the [stream * channel] batch axis.
Throughput comes from the batch axis (multi-stream serving), exactly like
the reference gets parallelism from its channel axis (SURVEY.md §2.6).

Per-frame parameters arrive as small per-chunk coefficient arrays built on
host (8 scalars per frame); the squared-window crossfade (celt.c:155-158)
is folded into per-chunk old/new gain weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 12
MAXPERIOD = 1024
HIST = MAXPERIOD + 2  # history needed before the first sample


def build_chunk_params(frame_params, frame_size: int, window: np.ndarray,
                       short_mdct_size: int = 120):
    """Host-side: per-frame postfilter params -> per-chunk tap arrays.

    Args:
      frame_params: list over frames of dicts with keys
        T0a, T1a, g0a[3], g1a[3]  (segment A: first shortMdctSize samples:
          old->current params crossfade)
        T0b, T1b, g0b[3], g1b[3]  (segment B: rest of frame: current->new)
        — matching the two comb_filter calls in celt_decoder_clean.c:652-668.
      window: CELT window (length = overlap).
    Returns dict of np arrays, each [n_chunks_total, ...]:
      T0, T1 (int32), gains0 [.,3], gains1 [.,3], fade [., CHUNK] in [0,1].
    """
    overlap = len(window)
    w2 = (window * window).astype(np.float32)
    n_frames = len(frame_params)
    chunks_per_frame = frame_size // CHUNK
    total = n_frames * chunks_per_frame
    T0 = np.zeros(total, np.int32)
    T1 = np.zeros(total, np.int32)
    g0 = np.zeros((total, 3), np.float32)
    g1 = np.zeros((total, 3), np.float32)
    fade = np.zeros((total, CHUNK), np.float32)
    for f, p in enumerate(frame_params):
        for k in range(chunks_per_frame):
            pos = k * CHUNK  # within frame
            idx = f * chunks_per_frame + k
            if pos < short_mdct_size:
                seg_start = 0
                T0[idx], T1[idx] = p["T0a"], p["T1a"]
                g0[idx], g1[idx] = p["g0a"], p["g1a"]
            else:
                seg_start = short_mdct_size
                T0[idx], T1[idx] = p["T0b"], p["T1b"]
                g0[idx], g1[idx] = p["g0b"], p["g1b"]
            rel = pos - seg_start
            # crossfade factor per sample: w2 within the first `overlap`
            # samples of the segment, then 1.0 (new params only).
            f_vals = np.ones(CHUNK, np.float32)
            for j in range(CHUNK):
                r = rel + j
                if r < overlap:
                    f_vals[j] = w2[r]
            fade[idx] = f_vals
    return dict(T0=T0, T1=T1, gains0=g0, gains1=g1, fade=fade)


@jax.jit
def comb_filter_stream(x: jax.Array, hist: jax.Array, T0, T1, gains0,
                       gains1, fade):
    """Apply the postfilter over a segment of frames.

    Args:
      x: [B, S] unfiltered synthesis (S = n_chunks * CHUNK).
      hist: [B, HIST] previous *filtered* output.
      T0, T1: [B, n_chunks] int32 lags (>= 15; use 15 when gain is 0).
      gains0, gains1: [B, n_chunks, 3] tap gains (old / new params).
      fade: [B, n_chunks, CHUNK] crossfade weight of the new params.
    Returns (y [B, S], new_hist [B, HIST]).
    """
    B, S = x.shape
    n_chunks = S // CHUNK
    # Ring history carry: the filter never reads further back than
    # HIST = MAXPERIOD + 2 samples, so the scan carry is a fixed [B, HIST]
    # window (O(S·HIST) traffic, not O(S²) like carrying the full buffer).
    xc = x.reshape(B, n_chunks, CHUNK).transpose(1, 0, 2)        # [n,B,c]
    fadec = fade.transpose(1, 0, 2)                              # [n,B,c]
    g0c = gains0.transpose(1, 0, 2)
    g1c = gains1.transpose(1, 0, 2)
    T0c = T0.T                                                   # [n,B]
    T1c = T1.T

    win_offs = jnp.arange(CHUNK + 4)

    def tap_mix(w, g):
        # w: [B, CHUNK+4] contiguous window centered on the lag reads.
        return (
            g[:, 0:1] * w[:, 2 : 2 + CHUNK]
            + g[:, 1:2] * (w[:, 1 : 1 + CHUNK] + w[:, 3 : 3 + CHUNK])
            + g[:, 2:3] * (w[:, 0:CHUNK] + w[:, 4 : 4 + CHUNK])
        )

    def step(h, inputs):
        xk, f, g0k, g1k, t0k, t1k = inputs
        # Single fused gather for BOTH tap sets: two 16-wide contiguous
        # windows h[HIST - T - 2 + (0..15)] (T >= 15 keeps every read
        # strictly before the chunk, so h alone suffices).
        idx = jnp.concatenate(
            [
                (HIST - t0k - 2)[:, None] + win_offs[None, :],
                (HIST - t1k - 2)[:, None] + win_offs[None, :],
            ],
            axis=1,
        )
        w = jnp.take_along_axis(h, idx, axis=1)     # [B, 2*(CHUNK+4)]
        old = tap_mix(w[:, : CHUNK + 4], g0k)
        new = tap_mix(w[:, CHUNK + 4 :], g1k)
        yk = xk + (1.0 - f) * old + f * new
        h = jnp.concatenate([h[:, CHUNK:], yk], axis=1)
        return h, yk

    new_hist, ys = jax.lax.scan(
        step, hist, (xc, fadec, g0c, g1c, T0c, T1c), unroll=8
    )
    y = ys.transpose(1, 0, 2).reshape(B, S)
    return y, new_hist


def comb_filter(x, hist, T0, T1, gains0, gains1, fade):
    """Backend dispatch: Pallas kernel on TPU (15x the scan — history
    stays in VMEM), lax.scan elsewhere (CPU tests, virtual meshes)."""
    if jax.default_backend() not in ("cpu", "interpreter"):
        from . import comb_pallas

        return comb_pallas.comb_filter_stream_pallas(
            x, hist, T0, T1, gains0, gains1, fade
        )
    return comb_filter_stream(x, hist, T0, T1, gains0, gains1, fade)
