"""Batched sample-rate conversion on TPU.

The reference ships only documented-low-quality linear and 4-point
Hermite resamplers (reference: include/libnyquist/Common.h:220-261
linear_resample / hermite_resample, kept here for API parity). The
BASELINE requires a proper batched polyphase SRC, which the reference
lacks — this module adds one, designed for the MXU:

A rational ratio L/M (48k->44.1k = 147/160) is one windowed-sinc
lowpass at the upsampled rate, decomposed into L phases. Every cycle of
L output samples reads one contiguous span of M + K input samples, so
the whole resampler is a single dense [L, M+K-1] weight matrix applied
as a strided convolution — one conv/matmul over [batch, cycles], no
per-sample control flow. Weights are cached per (L, M, taps, beta).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.jaxcfg import ensure_jax_cache

ensure_jax_cache()


def _kaiser(n: int, beta: float) -> np.ndarray:
    return np.kaiser(n, beta)


@functools.lru_cache(maxsize=32)
def polyphase_weights(L: int, M: int, taps_per_phase: int = 24,
                      beta: float = 8.6):
    """Design the per-cycle weight matrix W [L, M + K - 1].

    y[c*L + p] = sum_j W[p, j] * x[c*M - K + 1 + j]   (K = taps per phase)

    Returns (W, K, delay_out). The prototype length scales with
    max(L, M): an anti-alias filter for decimation needs taps
    proportional to M regardless of the phase count.
    """
    N = -(-taps_per_phase * max(L, M) // L) * L
    K = N // L
    # prototype lowpass at the upsampled rate fs*L: cutoff at the
    # narrower of the two Nyquists. Center the sinc on an INTEGER
    # number of output periods (multiple of M in upsampled units) so
    # trimming whole output samples compensates the group delay exactly
    # — a fractional residual shows up as frequency-proportional phase
    # error and wrecks high-band SNR.
    cutoff = min(1.0 / L, 1.0 / M)
    delay_out = int(round((N - 1) / 2.0 / M))
    c0 = delay_out * M
    n = np.arange(N, dtype=np.float64) - c0
    T = (N - 1) / 2.0
    wx = np.clip(1.0 - (n / T) ** 2, 0.0, None)
    win = np.i0(beta * np.sqrt(wx)) / np.i0(beta)
    win[np.abs(n) > T] = 0.0
    h = L * cutoff * np.sinc(cutoff * n) * win

    W = np.zeros((L, M + K - 1), np.float64)
    for p in range(L):
        r = (p * M) % L
        d = (p * M) // L
        hp = h[r::L]                       # phase-r subfilter, K taps
        for q in range(len(hp)):
            W[p, d - q + K - 1] = hp[q]
    return W.astype(np.float32), K, delay_out


@functools.partial(jax.jit, static_argnames=("L", "M", "taps_per_phase",
                                             "beta"))
def _resample_poly(x, L: int, M: int, taps_per_phase: int, beta: float):
    W, K, _ = polyphase_weights(L, M, taps_per_phase, beta)
    B, S = x.shape
    n_cycles = -(-S // M)                  # ceil: cover the whole input
    # window j index runs over [c*M - K + 1, c*M + M - 1]
    pad_l = K - 1
    pad_r = n_cycles * M + (M - 1) - (S - 1)
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r)))
    # strided conv: out channels = the L phases, stride M
    out = jax.lax.conv_general_dilated(
        xp[:, None, :],                                  # [B, 1, Sp]
        jnp.asarray(W)[:, None, :],                      # [L, 1, M+K-1]
        window_strides=(M,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )                                                    # [B, L, n_cycles]
    nc = out.shape[2]
    return out.transpose(0, 2, 1).reshape(B, nc * L)


def resample(x, sr_in: int, sr_out: int, taps_per_phase: int = 24,
             beta: float = 8.6):
    """Batched polyphase resample [B, S] (or [S]) from sr_in to sr_out.

    Returns round(S * sr_out / sr_in) samples per stream, group-delay
    compensated. Lossless passthrough when the rates match.
    """
    squeeze = False
    x = jnp.asarray(x, jnp.float32)
    if x.ndim == 1:
        x = x[None, :]
        squeeze = True
    if sr_in == sr_out:
        return x[0] if squeeze else x
    g = math.gcd(sr_in, sr_out)
    L, M = sr_out // g, sr_in // g
    S = x.shape[1]
    y = _resample_poly(x, L, M, taps_per_phase, beta)
    # the filter's group delay is an exact multiple of the output period
    # by construction; trim it from the front
    _, _, delay_out = polyphase_weights(L, M, taps_per_phase, beta)
    n_out = int(round(S * L / M))
    y = y[:, delay_out : delay_out + n_out]
    if y.shape[1] < n_out:  # extremely short inputs
        y = jnp.pad(y, ((0, 0), (0, n_out - y.shape[1])))
    return y[0] if squeeze else y


# --- reference-parity naive resamplers (Common.h:220-261) ---

def linear_resample(x, n_out: int):
    """Linear interpolation resample to n_out samples (Common.h:220-235)."""
    x = jnp.asarray(x, jnp.float32)
    n_in = x.shape[-1]
    ratio = n_in / n_out
    pos = jnp.arange(n_out) * ratio
    i0 = jnp.clip(pos.astype(jnp.int32), 0, n_in - 1)
    i1 = jnp.clip(i0 + 1, 0, n_in - 1)
    frac = pos - i0
    return x[..., i0] * (1.0 - frac) + x[..., i1] * frac


def hermite_resample(x, n_out: int):
    """4-point cubic Hermite resample (Common.h:247-261)."""
    x = jnp.asarray(x, jnp.float32)
    n_in = x.shape[-1]
    ratio = n_in / n_out
    pos = jnp.arange(n_out) * ratio
    i1 = jnp.clip(pos.astype(jnp.int32), 0, n_in - 1)
    t = pos - i1
    i0 = jnp.clip(i1 - 1, 0, n_in - 1)
    i2 = jnp.clip(i1 + 1, 0, n_in - 1)
    i3 = jnp.clip(i1 + 2, 0, n_in - 1)
    xm1, x0, x1, x2 = x[..., i0], x[..., i1], x[..., i2], x[..., i3]
    c = (x1 - xm1) * 0.5
    v = x0 - x1
    w = c + v
    a = w + v + (x2 - x0) * 0.5
    b_neg = w + a
    return ((((a * t) - b_neg) * t + c) * t + x0)
