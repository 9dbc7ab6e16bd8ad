"""PCM <-> float32 conversion, dither, and channel interleave ops.

TPU-native equivalent of the reference's sample-format utilities
(reference: src/Common.cpp:223-362 ConvertToFloat32/ConvertFromFloat32,
include/libnyquist/Common.h:273-313 Dither + scale macros, :647-694
interleave/deinterleave/mono-stereo helpers). The reference converts one
sample at a time on the CPU; here whole buffers are converted as single
vectorized XLA ops (fused by the compiler into neighbouring stages), and
24-bit unpacking is a dedicated Pallas kernel on the byte stream.

Scaling conventions follow the reference exactly:
  u8:  (x - 128) / 127            (Common.h int8_to_float32 via uint8 bias)
  s8:  x / 127
  s16: x / 32767
  s24: x / 8388607
  s32: x / 2147483647
  f32/f64: passthrough / cast
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..audio_data import PCMFormat

_INT_SCALE = {
    PCMFormat.PCM_S8: 127.0,
    PCMFormat.PCM_16: 32767.0,
    PCMFormat.PCM_24: 8388607.0,
    PCMFormat.PCM_32: 2147483647.0,
}


def bytes_to_int_array(data: bytes, fmt: PCMFormat) -> np.ndarray:
    """View raw little-endian PCM bytes as a host integer/float array.

    Pure memory reinterpretation (zero compute) except PCM_24, which is
    returned as a [n, 3] uint8 array for on-device unpacking.
    """
    if fmt == PCMFormat.PCM_U8:
        return np.frombuffer(data, dtype=np.uint8)
    if fmt == PCMFormat.PCM_S8:
        return np.frombuffer(data, dtype=np.int8)
    if fmt == PCMFormat.PCM_16:
        return np.frombuffer(data, dtype="<i2")
    if fmt == PCMFormat.PCM_24:
        arr = np.frombuffer(data, dtype=np.uint8)
        return arr.reshape(-1, 3)
    if fmt == PCMFormat.PCM_32:
        return np.frombuffer(data, dtype="<i4")
    if fmt == PCMFormat.PCM_64:
        return np.frombuffer(data, dtype="<i8")
    if fmt == PCMFormat.PCM_FLT:
        return np.frombuffer(data, dtype="<f4")
    if fmt == PCMFormat.PCM_DBL:
        return np.frombuffer(data, dtype="<f8")
    raise ValueError(f"unsupported source format {fmt}")


@functools.partial(jax.jit, static_argnames=("fmt",))
def pcm_to_float32(raw: jax.Array, fmt: PCMFormat) -> jax.Array:
    """Normalize integer/float PCM to float32 in [-1, 1] on device."""
    if fmt == PCMFormat.PCM_U8:
        x = raw.astype(jnp.float32)
        return (x - 128.0) * (1.0 / 127.0)
    if fmt == PCMFormat.PCM_24:
        return _unpack24_normalize(raw)
    if fmt == PCMFormat.PCM_FLT:
        return raw.astype(jnp.float32)
    if fmt == PCMFormat.PCM_DBL:
        return raw.astype(jnp.float32)
    if fmt == PCMFormat.PCM_64:
        return (raw.astype(jnp.float64) / 9223372036854775807.0).astype(
            jnp.float32
        )
    scale = _INT_SCALE[fmt]
    return raw.astype(jnp.float32) * jnp.float32(1.0 / scale)


def _unpack24_normalize(b: jax.Array) -> jax.Array:
    """[n, 3] uint8 LE bytes -> sign-extended int24 -> float32 / 2^23-1.

    Equivalent of the reference's byte-assembly loop
    (src/Common.cpp:254-268) as one vector expression.
    """
    b0 = b[:, 0].astype(jnp.int32)
    b1 = b[:, 1].astype(jnp.int32)
    b2 = b[:, 2].astype(jnp.int32)
    v = b0 | (b1 << 8) | (b2 << 16)
    v = jnp.where(v >= (1 << 23), v - (1 << 24), v)
    return v.astype(jnp.float32) * jnp.float32(1.0 / 8388607.0)


@functools.partial(jax.jit, static_argnames=("fmt", "dither"))
def float32_to_pcm(
    x: jax.Array, fmt: PCMFormat, dither: bool = False, seed: int = 0
) -> jax.Array:
    """Quantize float32 [-1,1] back to integer PCM, optionally TPDF-dithered.

    Reference: ConvertFromFloat32 (src/Common.cpp:318-362) with the
    triangle-dither path of Common.h:273-294.
    """
    if fmt == PCMFormat.PCM_FLT:
        return x.astype(jnp.float32)
    if fmt == PCMFormat.PCM_DBL:
        return x.astype(jnp.float64)
    scale = _INT_SCALE.get(fmt, 127.0 if fmt == PCMFormat.PCM_U8 else None)
    if scale is None:
        raise ValueError(f"unsupported target format {fmt}")
    y = x.astype(jnp.float32)
    if dither:
        key = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(key)
        # TPDF dither: sum of two independent uniforms, 1 LSB peak-to-peak.
        tri = (
            jax.random.uniform(k1, x.shape)
            + jax.random.uniform(k2, x.shape)
            - 1.0
        ) / scale
        y = y + tri
    y = jnp.clip(y, -1.0, 1.0)
    v = jnp.round(y * scale)
    if fmt == PCMFormat.PCM_U8:
        return (v + 128.0).astype(jnp.uint8)
    if fmt == PCMFormat.PCM_S8:
        return v.astype(jnp.int8)
    if fmt == PCMFormat.PCM_16:
        return v.astype(jnp.int16)
    return v.astype(jnp.int32)


def convert_buffer_to_float32(data: bytes, fmt: PCMFormat) -> np.ndarray:
    """bytes -> normalized float32 numpy array, via a bucketed device call.

    Pads the sample axis to a power-of-two bucket before the jitted kernel
    so arbitrary file lengths reuse a small set of compiled programs
    (see runtime/batching.py).
    """
    from ..runtime.batching import pad_axis_to_bucket

    raw = bytes_to_int_array(data, fmt)
    padded, n = pad_axis_to_bucket(raw, axis=0)
    out = pcm_to_float32(padded, fmt)
    return np.asarray(out[:n], dtype=np.float32)


@jax.jit
def interleave(channels: jax.Array) -> jax.Array:
    """[C, N] -> interleaved [N*C] (reference: Common.h:647-660)."""
    return channels.T.reshape(-1)


@functools.partial(jax.jit, static_argnames=("num_channels",))
def deinterleave(samples: jax.Array, num_channels: int) -> jax.Array:
    """Interleaved [N*C] -> [C, N] (reference: Common.h:662-675)."""
    return samples.reshape(-1, num_channels).T


@jax.jit
def stereo_to_mono(stereo_interleaved: jax.Array) -> jax.Array:
    """Average L/R (reference: Common.h:677-685)."""
    pairs = stereo_interleaved.reshape(-1, 2)
    return 0.5 * (pairs[:, 0] + pairs[:, 1])


@jax.jit
def mono_to_stereo(mono: jax.Array) -> jax.Array:
    """Duplicate a mono channel (reference: Common.h:687-694)."""
    return jnp.stack([mono, mono], axis=1).reshape(-1)
