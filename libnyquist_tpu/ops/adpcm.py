"""IMA-ADPCM decode as fully parallel associative scans on TPU.

The reference decodes IMA-ADPCM with a serial per-nibble predictor loop
(reference: src/WavDecoder.cpp:75-134, decode_nibble + decode_ima_adpcm).
That loop looks inherently sequential, but both of its carried states are
parallelizable:

  * The step index evolves as  s' = clip(s + index_table[nibble], 0, 88) —
    a composition of "add-then-clip" maps. Such maps form a closed family
    f(s) = clip(s + a, lo, hi) under composition, so the whole sequence is
    one `jax.lax.associative_scan` (log-depth instead of linear).
  * The reference's predictor update uses C `int16_t` wraparound
    (WavDecoder.cpp:87 `p += diff` wraps mod 2^16; the subsequent clamp at
    :92 is a no-op after the wrap). Modular addition is associative, so the
    predictor is a plain cumulative sum taken mod 2^16.

Each ADPCM block is independent (it carries its own predictor/step header),
so decode is batched over [blocks * channels, nibbles] with zero sequential
carry anywhere — the exact opposite of the reference's triple-nested loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.jaxcfg import ensure_jax_cache

ensure_jax_cache()

# Standard IMA tables (spec constants; reference: WavDecoder.cpp:40-72).
IMA_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8], np.int32
)
IMA_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
        4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
        11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
        27086, 29794, 32767,
    ],
    np.int32,
)


def _compose_clip(left, right):
    """Compose f(s)=clip(s+a, lo, hi) maps: right-after-left.

    With elements (a1,lo1,hi1) then (a2,lo2,hi2):
      g(f(s)) = clip(s + a1+a2, clip(lo1+a2, lo2, hi2), clip(hi1+a2, lo2, hi2))
    """
    a1, lo1, hi1 = left
    a2, lo2, hi2 = right
    a = a1 + a2
    lo = jnp.clip(lo1 + a2, lo2, hi2)
    hi = jnp.clip(hi1 + a2, lo2, hi2)
    return a, lo, hi


@jax.jit
def decode_ima_nibbles(
    nibbles: jax.Array, init_predictor: jax.Array, init_step: jax.Array
) -> jax.Array:
    """Decode batched nibble sequences to int16 PCM (as int32 values).

    Args:
      nibbles: [B, S] int32 in [0, 15], S nibbles per block-channel.
      init_predictor: [B] int32 initial predictor (header bytes 0-1).
      init_step: [B] int32 initial step index (header byte 2).
    Returns:
      [B, S] int32 samples (int16 range, reference wraparound semantics).
    """
    deltas = jnp.take(jnp.asarray(IMA_INDEX_TABLE), nibbles)
    lo = jnp.zeros_like(deltas)
    hi = jnp.full_like(deltas, 88)
    a, slo, shi = jax.lax.associative_scan(
        _compose_clip, (deltas, lo, hi), axis=1
    )
    # Step index *used* by sample n is the state before applying nibble n:
    # prepend the initial step, drop the last scanned state.
    s_after = jnp.clip(init_step[:, None] + a, slo, shi)
    s_used = jnp.concatenate([init_step[:, None], s_after[:, :-1]], axis=1)

    step = jnp.take(jnp.asarray(IMA_STEP_TABLE), s_used)
    diff = (
        (step >> 3)
        + jnp.where(nibbles & 4, step, 0)
        + jnp.where(nibbles & 2, step >> 1, 0)
        + jnp.where(nibbles & 1, step >> 2, 0)
    )
    diff = jnp.where(nibbles & 8, -diff, diff)

    # Predictor: modular int16 cumulative sum (reference wrap semantics).
    psum = init_predictor[:, None] + jnp.cumsum(diff, axis=1)
    wrapped = ((psum + 0x8000) & 0xFFFF) - 0x8000
    return wrapped


@jax.jit
def decode_ima4_nibbles(
    nibbles: jax.Array, init_predictor: jax.Array, init_step: jax.Array
) -> jax.Array:
    """Apple 'ima4' variant (AIFF-C / CAF packets): same IMA tables, but
    the predictor saturates at the int16 rails instead of wrapping.

    Saturation is still an associative clip-compose scan — the same
    closed family f(p)=clip(p+d, lo, hi) used for the step index above —
    so the decode stays fully parallel (log-depth) on TPU.
    """
    deltas = jnp.take(jnp.asarray(IMA_INDEX_TABLE), nibbles)
    lo = jnp.zeros_like(deltas)
    hi = jnp.full_like(deltas, 88)
    a, slo, shi = jax.lax.associative_scan(
        _compose_clip, (deltas, lo, hi), axis=1
    )
    s_after = jnp.clip(init_step[:, None] + a, slo, shi)
    s_used = jnp.concatenate([init_step[:, None], s_after[:, :-1]], axis=1)

    step = jnp.take(jnp.asarray(IMA_STEP_TABLE), s_used)
    diff = (
        (step >> 3)
        + jnp.where(nibbles & 4, step, 0)
        + jnp.where(nibbles & 2, step >> 1, 0)
        + jnp.where(nibbles & 1, step >> 2, 0)
    )
    diff = jnp.where(nibbles & 8, -diff, diff)

    plo = jnp.full_like(diff, -32768)
    phi = jnp.full_like(diff, 32767)
    pa, pslo, pshi = jax.lax.associative_scan(
        _compose_clip, (diff, plo, phi), axis=1
    )
    return jnp.clip(init_predictor[:, None] + pa, pslo, pshi)


def unpack_ima4_packets(data: np.ndarray, channels: int):
    """Split Apple ima4 payload into per-packet nibble rows.

    Packet layout (AIFF-C 'ima4' / CAF ima4): per channel a 34-byte
    packet — 2-byte big-endian header (bits 15..7 = predictor's top 9
    bits, bits 6..0 = step index) then 32 bytes = 64 nibbles, low nibble
    first. Packets for the channels of one 64-frame group are adjacent.

    Returns (nibbles [n_packets, 64], predictors, steps) host arrays,
    where row order is group-major then channel.
    """
    n_packets = data.size // 34
    pk = data[: n_packets * 34].reshape(n_packets, 34)
    hdr = (pk[:, 0].astype(np.int32) << 8) | pk[:, 1].astype(np.int32)
    predictors = np.int32(np.int16(hdr & 0xFF80))
    steps = np.minimum(hdr & 0x7F, 88).astype(np.int32)
    payload = pk[:, 2:]
    nibbles = np.empty((n_packets, 64), np.int32)
    nibbles[:, 0::2] = payload & 0xF
    nibbles[:, 1::2] = payload >> 4
    return nibbles, predictors, steps


def decode_ima4(
    data: np.ndarray, channels: int, total_samples: int
) -> jax.Array:
    """Apple ima4 payload -> interleaved float32 truncated to total_samples."""
    from ..runtime.batching import bucket_size

    nibbles, preds, steps = unpack_ima4_packets(data, channels)
    n_groups = nibbles.shape[0] // channels
    target_rows = bucket_size(max(n_groups, 1), 16) * channels
    pad_rows = target_rows - nibbles.shape[0]
    if pad_rows:
        nibbles = np.pad(nibbles, ((0, pad_rows), (0, 0)))
        preds = np.pad(preds, (0, pad_rows))
        steps = np.pad(steps, (0, pad_rows))
    decoded = decode_ima4_nibbles(
        jnp.asarray(nibbles), jnp.asarray(preds), jnp.asarray(steps)
    )
    inter = _finalize(decoded, channels)
    return inter[:total_samples]


def unpack_ima_blocks(
    data: np.ndarray, block_size: int, channels: int
):
    """Split raw ADPCM payload into per-(block, channel) nibble sequences.

    Block layout (reference: WavDecoder.cpp:104-130): per channel a 4-byte
    header (predictor lo, predictor hi, step index, reserved==0), then the
    payload as interleaved 4-byte words per channel; each byte holds two
    samples, low nibble first.

    Returns (nibbles [n_blocks*channels, S], predictors, steps) host arrays.
    """
    n_blocks = data.size // block_size
    blocks = data[: n_blocks * block_size].reshape(n_blocks, block_size)
    hdr = blocks[:, : 4 * channels].reshape(n_blocks, channels, 4)
    predictors = (
        hdr[:, :, 0].astype(np.int32)
        | (hdr[:, :, 1].astype(np.int32) << 8)
    )
    predictors = ((predictors + 0x8000) & 0xFFFF) - 0x8000
    steps = hdr[:, :, 2].astype(np.int32)
    if np.any(hdr[:, :, 3] != 0):
        raise ValueError("adpcm decode error")  # reference WavDecoder.cpp:113

    payload = blocks[:, 4 * channels :]
    words_per_row = payload.shape[1] // (4 * channels)
    # [n_blocks, words, channel, 4 bytes]
    words = payload[:, : words_per_row * 4 * channels].reshape(
        n_blocks, words_per_row, channels, 4
    )
    per_chan = np.transpose(words, (0, 2, 1, 3)).reshape(
        n_blocks * channels, words_per_row * 4
    )
    lo = per_chan & 0xF
    hi_n = per_chan >> 4
    nibbles = np.empty(
        (per_chan.shape[0], per_chan.shape[1] * 2), dtype=np.int32
    )
    nibbles[:, 0::2] = lo
    nibbles[:, 1::2] = hi_n
    return nibbles, predictors.reshape(-1), steps.reshape(-1)


@functools.partial(jax.jit, static_argnames=("channels",))
def _finalize(decoded: jax.Array, channels: int) -> jax.Array:
    """[n_blocks*channels, S] int32 -> interleaved float32 [-1,1]."""
    nb_c, s = decoded.shape
    n_blocks = nb_c // channels
    d = decoded.reshape(n_blocks, channels, s)
    inter = jnp.transpose(d, (0, 2, 1)).reshape(-1)
    return inter.astype(jnp.float32) * jnp.float32(1.0 / 32767.0)


def decode_ima_adpcm(
    data: np.ndarray, block_size: int, channels: int, total_samples: int
) -> jax.Array:
    """Full IMA-ADPCM payload -> interleaved float32, truncated to
    total_samples (= fact-chunk length * channels, reference
    WavDecoder.cpp:297)."""
    from ..runtime.batching import bucket_size

    nibbles, preds, steps = unpack_ima_blocks(data, block_size, channels)
    # Bucket the *block* count so differing file lengths reuse the same
    # compiled program; padding is whole blocks (multiples of `channels`
    # rows) so deinterleaving stays aligned.
    n_blocks = nibbles.shape[0] // channels
    target_rows = bucket_size(n_blocks, 16) * channels
    pad_rows = target_rows - nibbles.shape[0]
    if pad_rows:
        nibbles = np.pad(nibbles, ((0, pad_rows), (0, 0)))
        preds = np.pad(preds, (0, pad_rows))
        steps = np.pad(steps, (0, pad_rows))
    decoded = decode_ima_nibbles(
        jnp.asarray(nibbles), jnp.asarray(preds), jnp.asarray(steps)
    )
    inter = _finalize(decoded, channels)
    return inter[:total_samples]
