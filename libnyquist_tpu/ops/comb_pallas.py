"""CELT pitch postfilter as a Pallas TPU kernel.

Same math as ops/comb.py comb_filter_stream (reference: celt/celt.c
comb_filter, 5-tap IIR at per-stream pitch lag T in [15, 1024] with
squared-window crossfade), but the sequential chunk recursion runs
entirely in VMEM instead of an XLA scan whose per-step gathers round-trip
HBM. Layout is [time, batch] so the filtered-history window reads are
slices along sublanes.

The per-stream lag makes the window read a per-lane gather, which the
VPU only supports within one vreg (8 sublanes). So the lookup is split:

  coarse — accumulate the three 8-aligned history groups covering each
    lane's window with a compare-masked sum over the *active lag range*
    (a dynamic fori_loop over [min_lag, max_lag] groups, prefetched per
    chunk: homogeneous batches cost ~3 iterations, fully heterogeneous
    ones ~130 — still all in VMEM);
  fine — rotate each 8-row group per-lane with the native sublane
    gather (jnp.take_along_axis on one vreg) and select across group
    boundaries.

History is carried across time-blocks in a persistent VMEM scratch
(grid iterations are sequential on a TPU core), so the whole filter
touches HBM only for x in / y out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 12
WIN = CHUNK + 4            # window rows read per lag (taps -2..+2)
KHIST = 1032               # kernel history rows (>= MAXPERIOD + 2, 8-aligned)
NB_CHUNKS = 128            # chunks per grid block
BLOCK = NB_CHUNKS * CHUNK  # 1536 samples per grid block
_REL0 = KHIST - 2          # rel = _REL0 - t  (window start within hwin)


def _comb_kernel(tmin_ref, tmax_ref,                      # scalar prefetch
                 x_ref, t0_ref, t1_ref, g0_ref, g1_ref, fade_ref, hist_ref,
                 y_ref, hbuf):
    blk = pl.program_id(0)
    B = x_ref.shape[1]

    @pl.when(blk == 0)
    def _init():
        hbuf[0:KHIST, :] = hist_ref[...]

    def window(base, t, k):
        """Gather w[j, b] = hbuf[base + rel[b] + j, b], j in [0, WIN)."""
        rel = (_REL0 - t)[None, :]                  # [1, B]
        a = rel >> 3                                # group index
        f = rel & 7                                 # within-group offset
        glo = (_REL0 - tmax_ref[k]) >> 3
        ghi = ((_REL0 - tmin_ref[k]) >> 3) + 3   # window spans groups A..A+2

        def body(g, acc):
            grp = hbuf[pl.ds(base + g * 8, 8), :]   # [8, B]
            d = g - a                               # [1, B]
            return tuple(
                acc[u] + grp * (d == u).astype(jnp.float32)
                for u in range(3)
            )

        zero = jnp.zeros((8, B), jnp.float32)
        w24_0, w24_1, w24_2 = jax.lax.fori_loop(
            glo, ghi, body, (zero, zero, zero))
        w24 = jnp.concatenate([w24_0, w24_1, w24_2], axis=0)

        # per-lane rotate each 8-row group by f (native sublane gather)
        idx = (jax.lax.broadcasted_iota(jnp.int32, (8, B), 0) + f) & 7
        rot0 = jnp.take_along_axis(w24[0:8, :], idx, axis=0)
        rot1 = jnp.take_along_axis(w24[8:16, :], idx, axis=0)
        rot2 = jnp.take_along_axis(w24[16:24, :], idx, axis=0)
        v = jax.lax.broadcasted_iota(jnp.int32, (8, B), 0)
        lowsel = (f + v) < 8
        w_lo = jnp.where(lowsel, rot0, rot1)        # rows 0..7  = w24[f+v]
        w_hi = jnp.where(lowsel, rot1, rot2)        # rows 8..15 = w24[f+8+v]
        return jnp.concatenate([w_lo, w_hi], axis=0)  # [16, B]

    def tap_mix(w, g):
        # w: [WIN, B]; g: [3, B] tap gains
        return (g[0:1, :] * w[2 : 2 + CHUNK, :]
                + g[1:2, :] * (w[1 : 1 + CHUNK, :] + w[3 : 3 + CHUNK, :])
                + g[2:3, :] * (w[0:CHUNK, :] + w[4 : 4 + CHUNK, :]))

    def chunk_body(k, _):
        pos = KHIST + k * CHUNK
        base = pos - KHIST                          # hwin start row
        kk = blk * NB_CHUNKS + k
        w0 = window(base, t0_ref[k, :], kk)
        w1 = window(base, t1_ref[k, :], kk)
        old = tap_mix(w0, g0_ref[k])
        new = tap_mix(w1, g1_ref[k])
        f = fade_ref[k]                             # [CHUNK, B]
        yk = x_ref[pl.ds(k * CHUNK, CHUNK), :] + (1.0 - f) * old + f * new
        y_ref[pl.ds(k * CHUNK, CHUNK), :] = yk
        hbuf[pl.ds(pos, CHUNK), :] = yk
        return 0

    jax.lax.fori_loop(0, NB_CHUNKS, chunk_body, 0)
    # slide the history window for the next block (disjoint: BLOCK > KHIST)
    hbuf[0:KHIST, :] = hbuf[pl.ds(BLOCK, KHIST), :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def comb_filter_stream_pallas(x, hist, T0, T1, gains0, gains1, fade,
                              interpret=False):
    """Drop-in for ops.comb.comb_filter_stream on TPU.

    Args (same convention as comb_filter_stream):
      x: [B, S], hist: [B, 1026], T0/T1: [B, n_chunks] int32,
      gains0/gains1: [B, n_chunks, 3], fade: [B, n_chunks, CHUNK].
    Returns (y [B, S], new_hist [B, 1026]).
    """
    B, S = x.shape
    n_chunks = S // CHUNK
    hist_len = hist.shape[1]

    # pad time to BLOCK multiple (pad chunks use T=15, gains 0 -> y = x = 0)
    n_blocks = max(1, -(-n_chunks // NB_CHUNKS))
    cp = n_blocks * NB_CHUNKS
    pad_c = cp - n_chunks

    def padc(a, fill=0):
        if pad_c == 0:
            return a
        return jnp.pad(a, [(0, 0), (0, pad_c)] + [(0, 0)] * (a.ndim - 2),
                       constant_values=fill)

    t0 = padc(T0, 15).T                                   # [cp, B]
    t1 = padc(T1, 15).T
    g0 = padc(gains0).transpose(1, 2, 0)                  # [cp, 3, B]
    g1 = padc(gains1).transpose(1, 2, 0)
    fd = padc(fade).transpose(1, 2, 0)                    # [cp, CHUNK, B]
    xt = jnp.pad(x, ((0, 0), (0, cp * CHUNK - S))).T      # [Sp, B]
    h = jnp.pad(hist, ((0, 0), (KHIST - hist_len, 0))).T  # [KHIST, B]

    tmin = jnp.min(t0, axis=1).astype(jnp.int32)          # [cp]
    tmax = jnp.max(t0, axis=1).astype(jnp.int32)
    tmin = jnp.minimum(tmin, jnp.min(t1, axis=1))
    tmax = jnp.maximum(tmax, jnp.max(t1, axis=1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK, B), lambda i, *_: (i, 0)),          # x
            pl.BlockSpec((NB_CHUNKS, B), lambda i, *_: (i, 0)),      # t0
            pl.BlockSpec((NB_CHUNKS, B), lambda i, *_: (i, 0)),      # t1
            pl.BlockSpec((NB_CHUNKS, 3, B), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((NB_CHUNKS, 3, B), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((NB_CHUNKS, CHUNK, B),
                         lambda i, *_: (i, 0, 0)),                   # fade
            pl.BlockSpec((KHIST, B), lambda i, *_: (0, 0)),          # hist
        ],
        out_specs=pl.BlockSpec((BLOCK, B), lambda i, *_: (i, 0)),
        scratch_shapes=[pltpu.VMEM((KHIST + BLOCK, B), jnp.float32)],
    )
    y = pl.pallas_call(
        _comb_kernel,
        out_shape=jax.ShapeDtypeStruct((cp * CHUNK, B), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tmin, tmax, xt, t0, t1, g0, g1, fd, h)

    y = y.T[:, :S]
    new_hist = jnp.concatenate([hist, y], axis=1)[:, -hist_len:]
    return y, new_hist
