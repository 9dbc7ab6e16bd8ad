"""CELT-layout inverse MDCT as a single MXU matmul per frame batch.

The reference computes the backward MDCT in four serial stages — twiddle
pre-rotation, N/4 complex IFFT, post-rotation/deshuffle, TDAC window mirror
(reference: third_party/opus/celt/mdct.c:269-379; CUDA split of the same
pipeline in cuda/mdct_cuda.cu). All four stages are *linear* in the input
spectrum, and the TDAC mirror is additionally linear in the previous
frame's tail. The TPU-native design therefore folds the entire pipeline
into one precomputed synthesis matrix per (N, shift) mode:

    T : spectrum[N2]  ->  contribution[N2 + overlap]

where contribution[:N2] is the frame's finished output over its own region
(previous-tail term excluded) and contribution[N2:] is the windowed tail it
donates to the next frame's region. Decoding a whole stream is then

    batched matmul [frames, N2] @ T  (MXU)   +   shifted add  (VPU)

with zero sequential carry — the overlap-add "recurrence" disappears
because superposition holds. Short transient frames (B=8 interleaved
sub-MDCTs, reference celt_decoder_clean.c:285-301) fold the intra-frame
overlap-add into the matrix as well, so every packet type is exactly one
matmul row regardless of block switching.

Accuracy: matrices are built in float64 from a NumPy port of the reference
algorithm (including its small-angle sine≈x rotation trick, mdct.c:292)
then cast to float32; max abs error vs the C implementation is validated
against golden vectors in tests/test_imdct.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.jaxcfg import ensure_jax_cache

ensure_jax_cache()


def celt_window(overlap: int) -> np.ndarray:
    """CELT's power-of-sine window (verified against the mode table to 3e-8;
    see tests/golden/mdct/celt_window.bin)."""
    i = np.arange(overlap, dtype=np.float64)
    return np.sin(0.5 * np.pi * np.sin(0.5 * np.pi * (i + 0.5) / overlap) ** 2)


def celt_imdct_reference(
    x: np.ndarray, N: int, overlap: int, prev_tail: np.ndarray | None = None
) -> np.ndarray:
    """NumPy port of clt_mdct_backward (reference mdct.c:269-379).

    Args:
      x: [..., N2] de-strided spectrum (caller handles any stride).
      N: transform size (l->n >> shift).
      overlap: window overlap length.
      prev_tail: optional [..., overlap//2] pre-existing buffer head
        (the previous frame's raw tail), i.e. out[0:overlap/2] before
        the call in the reference's in-place formulation.
    Returns:
      out: [..., N2 + overlap] buffer after the call; entries beyond
      N2 + overlap//2 are zero (the reference never writes them).
    Vectorized over leading batch dims; float64 for matrix building.
    """
    N2, N4 = N // 2, N // 4
    batch = x.shape[:-1]
    t = np.cos(2 * np.pi * np.arange(N4 + 1, dtype=np.float64) / N)
    sine = 2 * np.pi * 0.125 / N  # small-angle sin substitute (mdct.c:292)

    # Pre-rotation (mdct.c:295-313): even indices ascending vs odd
    # descending, rotated by the twiddles then nudged by `sine`.
    x = x.astype(np.float64)
    xe = x[..., 0::2]                       # x[2i]
    xo = x[..., ::-1][..., 0::2]            # x[N2-1-2i]
    ti = t[:N4]
    tn = t[N4:0:-1]                         # t[N4 - i]
    yr = -xo * ti + xe * tn
    yi = -xo * tn - xe * ti
    fr = yr - yi * sine
    fi = yi + yr * sine

    # Unnormalized inverse N/4 complex FFT (kiss_fft convention: no 1/N).
    z = np.fft.ifft(fr + 1j * fi, axis=-1) * N4
    zr, zi = z.real, z.imag

    # Post-rotation + deshuffle (mdct.c:320-359). For pair i:
    #   u = re*t[i] - im*t[N4-i];  v = im*t[i] + re*t[N4-i]
    #   buf[2i] = -(u - v*sine);   buf[2(N4-1-i)+1] = v + u*sine
    u = zr * ti - zi * tn
    v = zi * ti + zr * tn
    even = -(u - v * sine)
    odd = (v + u * sine)[..., ::-1]
    buf = np.zeros(batch + (N2,), dtype=np.float64)
    buf[..., 0::2] = even
    buf[..., 1::2] = odd

    # TDAC window mirror (mdct.c:361-377), linear in (prev_tail, buf).
    w = celt_window(overlap)
    half = overlap // 2
    out = np.zeros(batch + (N2 + overlap,), dtype=np.float64)
    out[..., half : half + N2] = buf
    fresh_head = buf[..., :half]            # out[ov/2 : ov) pre-mirror
    pre = (
        prev_tail.astype(np.float64)
        if prev_tail is not None
        else np.zeros(batch + (half,), dtype=np.float64)
    )
    # out[i]      = w[ov-1-i]*pre[i] - w[i]*fresh[ov-1-i]   (i < ov/2)
    # out[ov-1-i] = w[i]*pre[i]      + w[ov-1-i]*fresh[ov-1-i]
    wi = w[:half]
    wr = w[overlap - 1 : half - 1 : -1]     # w[ov-1-i]
    fresh_rev = fresh_head[..., ::-1]       # fresh[ov-1-i] = buf[ov/2-1-i]
    out[..., :half] = wr * pre - wi * fresh_rev
    out[..., half:overlap] = (wi * pre + wr * fresh_rev)[..., ::-1]
    return out


@functools.lru_cache(maxsize=None)
def celt_synthesis_matrix(
    N: int, overlap: int, B: int = 1
) -> np.ndarray:
    """Build the fused synthesis matrix T [B*N2, B*N2 + overlap] (float32).

    Column k of the frame's contribution = IMDCT of the unit spectrum.
    For B > 1 (transient frames: B interleaved short MDCTs laid out at
    N2-sample offsets, reference celt_decoder_clean.c:291-301) the B
    sub-block matrices and their intra-frame overlap-adds are folded into
    one matrix over the interleaved spectrum layout X[b + B*k].
    """
    N2 = N // 2
    half = overlap // 2
    # Single-block basis: [N2 inputs, N2 + overlap outputs].
    eye = np.eye(N2, dtype=np.float64)
    base = celt_imdct_reference(eye, N, overlap)          # [N2, N2+ov]
    # base[:, N2 : N2+ov/2] holds the frame's raw post-rotate tail — the
    # values the *next* frame's TDAC mirror consumes as its `pre` input and
    # mixes as:
    #   next_out[i]      += w[ov-1-i] * pre[i]        (i < ov/2)
    #   next_out[ov-1-i] += w[i]      * pre[i]
    # Fold those static weights into this frame's columns so streaming
    # becomes a plain shifted add (superposition over frames).
    w = celt_window(overlap)
    T = np.zeros((N2, N2 + overlap), dtype=np.float64)
    T[:, :N2] = base[:, :N2]
    raw_tail = base[:, N2 : N2 + half]                    # pre values
    wi = w[:half]
    wr = w[overlap - 1 : half - 1 : -1]
    T[:, N2 : N2 + half] = raw_tail * wr
    T[:, N2 + half : N2 + overlap] = (raw_tail * wi)[:, ::-1]

    if B == 1:
        return T.astype(np.float32)

    # Interleaved transient layout: sub-block b reads X[b::B], writes at
    # offset b*N2. Total frame region B*N2, tail overlap beyond it.
    total = B * N2
    TB = np.zeros((total, total + overlap), dtype=np.float64)
    for b in range(B):
        rows = slice(None)  # spectrum indices b::B
        TB[b::B, b * N2 : b * N2 + N2 + overlap] += T
    return TB.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("n2", "overlap"))
def _synthesize(spectra, matrix, init_tail, n2, overlap):
    # Precision.HIGHEST: full f32 accumulation on the MXU (default TPU
    # matmul precision is bf16-grade, ~3 decimal digits — far outside the
    # <1e-4 decode accuracy target).
    c = jnp.dot(
        spectra,
        matrix,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [F, n2 + ov]
    main = c[:, :n2]
    tails = jnp.concatenate([init_tail[None, :], c[:, n2:]], axis=0)
    # Add frame f's tail to the head of frame f+1's region. All per-frame
    # carry-out tails are returned so callers running padded (bucketed)
    # batches can pick the tail after the last REAL frame.
    pad = jnp.zeros((tails.shape[0] - 1, n2 - overlap), jnp.float32)
    shifted = jnp.concatenate([tails[:-1], pad], axis=1)
    out = (main + shifted).reshape(-1)
    return out, tails


def celt_imdct_batch(
    spectra: jax.Array,
    N: int,
    overlap: int,
    B: int = 1,
    init_tail: jax.Array | None = None,
):
    """Batched fused IMDCT + TDAC overlap-add for one (N, B) bucket.

    Args:
      spectra: [F, B * N//2] frame spectra (CELT interleaved layout for B>1).
      init_tail: [overlap] carry from the previous batch (zeros at stream
        start — CELT's decode buffer starts zeroed).
    Returns:
      (pcm [F * B * N//2], next_tail [overlap])
    """
    n2 = B * (N // 2)
    if overlap > n2:
        raise ValueError("overlap must be <= frame region")
    M = jnp.asarray(celt_synthesis_matrix(N, overlap, B))
    if init_tail is None:
        init_tail = jnp.zeros((overlap,), jnp.float32)
    out, tails = _synthesize(
        spectra.astype(jnp.float32), M, init_tail, n2, overlap
    )
    return out, tails[-1]


@functools.lru_cache(maxsize=None)
def celt_synthesis_matrices_paired(N: int, overlap: int, B: int = 1):
    """Split the fused synthesis matrix for layout-free overlap-add.

    Returns (T_main [N2, N2], T_tailpad [N2, N2], T_tail [N2, overlap])
    such that a frame's finished output over its own region is

        out[f] = spec[f] @ T_main + spec[f-1] @ T_tailpad

    (T_tailpad is the tail-contribution columns zero-padded to a full
    frame) — two aligned MXU matmuls, no output slicing/relayout. The
    carry for a following batch is spec[last] @ T_tail.
    """
    n2 = B * (N // 2)
    T = celt_synthesis_matrix(N, overlap, B)
    T_main = np.ascontiguousarray(T[:, :n2])
    T_tail = np.ascontiguousarray(T[:, n2:])
    T_tailpad = np.zeros((n2, n2), np.float32)
    T_tailpad[:, :overlap] = T_tail
    return T_main, T_tailpad, T_tail


@functools.partial(jax.jit, static_argnames=("overlap",))
def _synthesize_rows(spectra, Tm, Tp, tails, overlap):
    """[R, F, n2] spectra + per-row carry tails -> [R, F*n2] PCM + all
    per-frame tails [R, F, overlap] (callers pick the carry after the last
    real frame). One MXU program for the whole serving batch."""
    R, F, n2 = spectra.shape
    hp = jax.lax.Precision.HIGHEST
    flat = spectra.reshape(-1, n2)
    main = jnp.dot(flat, Tm, preferred_element_type=jnp.float32,
                   precision=hp)
    prev = jnp.concatenate(
        [jnp.zeros((R, 1, n2), jnp.float32), spectra[:, :-1]], axis=1
    ).reshape(-1, n2)
    shifted = jnp.dot(prev, Tp, preferred_element_type=jnp.float32,
                      precision=hp)
    out = (main + shifted).reshape(R, F, n2)
    out = out.at[:, 0, :overlap].add(tails)
    all_tails = jnp.einsum(
        "rfn,nk->rfk", spectra, Tp[:, :overlap],
        preferred_element_type=jnp.float32, precision=hp,
    )
    return out.reshape(R, F * n2), all_tails


def celt_imdct_rows(
    spectra: jax.Array,
    N: int,
    overlap: int,
    B: int = 1,
    tails: jax.Array | None = None,
):
    """Rows-batched fused IMDCT + TDAC overlap-add for one (N, B) bucket.

    Args:
      spectra: [R, F, B*N//2] — R = streams x channels (the serving axis).
      tails: [R, overlap] carry from the previous segment (zeros at start).
    Returns: (pcm [R, F * B*N//2], per-frame tails [R, F, overlap]).
    """
    n2 = B * (N // 2)
    Tm, Tp, _ = celt_synthesis_matrices_paired(N, overlap, B)
    if tails is None:
        tails = jnp.zeros((spectra.shape[0], overlap), jnp.float32)
    return _synthesize_rows(
        spectra.astype(jnp.float32), jnp.asarray(Tm), jnp.asarray(Tp),
        tails, overlap,
    )


def celt_imdct_batch_padded(
    spectra: jax.Array,
    n_real: int,
    N: int,
    overlap: int,
    B: int = 1,
    init_tail: jax.Array | None = None,
):
    """Like celt_imdct_batch but for zero-padded frame batches: returns the
    carry tail after frame `n_real` (padding frames contribute nothing to
    the real region since their spectra are zero)."""
    n2 = B * (N // 2)
    M = jnp.asarray(celt_synthesis_matrix(N, overlap, B))
    if init_tail is None:
        init_tail = jnp.zeros((overlap,), jnp.float32)
    out, tails = _synthesize(
        spectra.astype(jnp.float32), M, init_tail, n2, overlap
    )
    return out, tails[n_real]
