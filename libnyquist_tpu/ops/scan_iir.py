"""Low-order IIR filters as block-parallel TPU ops.

CELT deemphasis is a 1-pole IIR carried across every sample (reference:
celt_decoder_clean.c:189-256 — `m = coef0*tmp` per sample), the classic
sequential bottleneck. TPU-native formulation: split the stream into
blocks of L samples; within a block the recurrence is a lower-triangular
Toeplitz matmul y = T @ x (MXU); the block-to-block carry recurrence has
ratio coef^L ~ 1e-9, so it collapses to one shifted multiply-add (terms
from two blocks back are below float32 resolution). No sequential
sample loop, no scan.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

BLOCK = 128


@functools.lru_cache(maxsize=None)
def _toeplitz(coef: float, block: int) -> np.ndarray:
    """Lower-triangular T with T[i, j] = coef^(i-j) for i >= j."""
    i = np.arange(block)
    d = i[:, None] - i[None, :]
    T = np.where(d >= 0, np.power(float(coef), np.maximum(d, 0)), 0.0)
    return T.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("coef",))
def deemphasis(x: jax.Array, mem: jax.Array, coef: float = 0.85000610351562500):
    """y[n] = x[n] + coef * y[n-1], batched.

    Args:
      x: [B, S] input (S padded to a multiple of BLOCK by the caller).
      mem: [B] carry (previous stream sample's y).
    Returns (y [B, S], new_mem [B]).
    """
    B, S = x.shape
    nblk = S // BLOCK
    xb = x.reshape(B, nblk, BLOCK)
    T = jnp.asarray(_toeplitz(coef, BLOCK))
    # Within-block solution with zero carry (MXU).
    y0 = jnp.dot(
        xb.reshape(B * nblk, BLOCK), T.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(B, nblk, BLOCK)
    # Block carries: c_n = coef^L * c_{n-1} + y0_last[n]. The recurrence
    # ratio coef^128 ~ 9e-10 makes contributions from two blocks back
    # (~1e-18 relative) vanish below float32 resolution, so the exact
    # log-depth scan reduces to a single shifted multiply-add.
    last = y0[:, :, -1]                           # [B, nblk]
    decay = jnp.float32(coef) ** BLOCK
    shifted = jnp.concatenate([mem[:, None], last[:, :-1]], axis=1)
    carries = last + decay * shifted              # c_n (incl. block n)
    prev_carry = jnp.concatenate(
        [mem[:, None], carries[:, :-1]], axis=1
    )                                             # c_{n-1} per block
    # Add carried tail: y[n, i] = y0[n, i] + coef^(i+1) * c_{n-1}
    powers = jnp.float32(coef) ** jnp.arange(1, BLOCK + 1, dtype=jnp.float32)
    y = y0 + prev_carry[:, :, None] * powers[None, None, :]
    return y.reshape(B, S), carries[:, -1]
