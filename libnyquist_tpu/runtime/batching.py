"""Shape bucketing: keep XLA compile counts bounded.

Everything under jit is traced once per input shape. Audio buffers have
arbitrary lengths, so naive per-file kernel calls would recompile for every
file. All host->device entry points in this framework therefore pad to a
bucketed size (next power of two above a floor) and slice the result back.
This is the TPU analog of the reference's per-size CUDA state cache
(reference: cuda/mdct_cuda.cu:558-584 keys persistent device buffers by the
(N, shift, stride, overlap) size signature).
"""

from __future__ import annotations

import numpy as np

MIN_BUCKET = 4096


def bucket_size(n: int, minimum: int = MIN_BUCKET) -> int:
    """Smallest power of two >= max(n, minimum)."""
    b = max(int(minimum), 1)
    n = max(int(n), 1)
    while b < n:
        b <<= 1
    return b


def pad_axis_to_bucket(arr: np.ndarray, axis: int = 0, minimum: int = MIN_BUCKET):
    """Zero-pad `arr` along `axis` to its bucket size.

    Returns (padded_array, original_length).
    """
    n = arr.shape[axis]
    b = bucket_size(n, minimum)
    if b == n:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, b - n)
    return np.pad(arr, pad), n
