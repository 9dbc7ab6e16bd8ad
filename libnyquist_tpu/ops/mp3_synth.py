"""MP3 synthesis filterbank as linear maps: IMDCT + QMF as pure matmuls.

The reference decodes MP3 with serial per-granule butterflies
(reference: third_party/minimp3/minimp3.h — L3_imdct_gr :1184 hybrid
IMDCT-36/12 with overlap state, mp3d_DCT_II :1264 + mp3d_synth :1466
windowed polyphase with qmf_state carry). Every one of those stages is
*linear* in its inputs, so this module ships them as matrices
(data/mp3_maps.npz, probed from the spec-mirroring oracle in
tests/mp3_ref.py by tools/gen_mp3_maps.py) and the decode becomes a
handful of MXU-friendly matmuls over the whole granule axis:

  * hybrid IMDCT: per band-kind k in {long/normal, long/stop, short}
    out18 = A1_k @ x18 + B1_k @ ov9_prev,  ov9 = A2_k @ x18
    — the new overlap depends only on the current granule (verified at
    probe time), so there is NO recurrence: the full stream is two
    batched matmuls plus a shifted add, not a scan.
  * polyphase QMF: out_slice[s] = sum_{i=0..15} Q_i @ band_slice[s-i]
    (Q: 16 32x32 maps). Granule-level maps (A, BC, BDC) are assembled
    from Q blocks analytically, so a whole segment synthesizes as a
    3-tap matmul FIR over granules.

State (mdct overlap, qmf history) is explicit, which is what makes the
batch formulation and the streaming step equivalent (SURVEY.md §5
checkpoint/resume analog).
"""

from __future__ import annotations

import functools
import pathlib

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parents[1]
_DATA = _HERE / "data" / "mp3_tables.npz"
_MAPS = _HERE / "data" / "mp3_maps.npz"

# band kinds for the hybrid IMDCT
KIND_LONG = 0       # long block, normal window (g_mdct_window[0])
KIND_LONG_W1 = 1    # long block, block_type==3 window (g_mdct_window[1])
KIND_SHORT = 2      # three short IMDCT-12 lanes


@functools.lru_cache(maxsize=1)
def T() -> dict:
    return dict(np.load(_DATA))


@functools.lru_cache(maxsize=1)
def M() -> dict:
    """Probed linear maps: imdct A1 [3,18,18], B1 [3,18,9], A2 [3,9,18];
    qmf Q [16,32,32]."""
    return dict(np.load(_MAPS))


@functools.lru_cache(maxsize=1)
def _sign_mask() -> np.ndarray:
    """(-1)^(b*t parity) applied post-IMDCT: odd time samples of odd
    bands flip (the reference's L3_change_sign, minimp3.h:1655)."""
    b = np.arange(32)[:, None]
    t = np.arange(18)[None, :]
    return np.where((b & 1) & (t & 1), -1.0, 1.0).astype(np.float32)


def band_kinds(block_type: int, n_long_bands: int) -> np.ndarray:
    """Per-band IMDCT kind row [32] for one granule-channel
    (reference: L3_imdct_gr dispatch, minimp3.h:1184-1200)."""
    kinds = np.empty(32, np.int8)
    if block_type == 2:
        kinds[:] = KIND_SHORT
    else:
        kinds[:] = KIND_LONG_W1 if block_type == 3 else KIND_LONG
    kinds[:n_long_bands] = KIND_LONG
    return kinds


def imdct_granules_stream(X: np.ndarray, kinds: np.ndarray,
                          ov0: np.ndarray = None) -> np.ndarray:
    """Hybrid IMDCT over a whole stream of granules, zero overlap start.

    Args:
      X: [G, C, 576] frequency-domain granule planes (post antialias).
      kinds: [G, C, 32] int8 band kinds (band_kinds rows).
      ov0: optional [C, 32, 9] initial overlap (default silence).
    Returns [G, C, 576] time-domain band slices (synth input layout).
    """
    m = M()
    A1, B1, A2 = m["A1"], m["B1"], m["A2"]
    G, C = X.shape[:2]
    Xr = X.reshape(G, C, 32, 18)
    out = np.zeros((G, C, 32, 18), np.float32)
    ov = np.zeros((G, C, 32, 9), np.float32)
    for k in range(3):
        mask = (kinds == k)[..., None]
        if not mask.any():
            continue
        out += np.where(mask, Xr @ A1[k].T, 0.0)
        ov += np.where(mask, Xr @ A2[k].T, 0.0)
    ovprev = np.empty_like(ov)
    ovprev[0] = 0.0 if ov0 is None else ov0
    ovprev[1:] = ov[:-1]
    for k in range(3):
        mask = (kinds == k)[..., None]
        if mask.any():
            out += np.where(mask, ovprev @ B1[k].T, 0.0)
    out *= _sign_mask()
    return out.reshape(G, C, 576)


def imdct_stream_step(x: np.ndarray, kinds: np.ndarray, ov: np.ndarray):
    """One-granule streaming form of imdct_granules_stream.

    Args:
      x: [C, 576]; kinds: [C, 32]; ov: [C, 32, 9] carried overlap.
    Returns (out [C, 576], ov' [C, 32, 9]).
    """
    out = imdct_granules_stream(x[None], kinds[None], ov0=ov)
    m = M()
    A2 = m["A2"]
    xr = x.reshape(-1, 32, 18)
    ov_new = np.zeros((x.shape[0], 32, 9), np.float32)
    for k in range(3):
        mask = (kinds == k)[..., None]
        if mask.any():
            ov_new += np.where(mask, xr @ A2[k].T, 0.0)
    return out[0], ov_new


@functools.lru_cache(maxsize=8)
def granule_maps(nbands: int, nch: int):
    """Assemble (A, BC, BDC) granule-FIR synthesis maps from the probed
    per-slice QMF maps Q (no runtime probing; pure block placement).

    out[(s*32+j)*nch+c] = sum_{i=0..15} Q_i[j,:] @ slice_{s-i} of ch c,
    where slice t of channel c lives at input index c*576 + b*18 + t.
    Slices with s-i < 0 come from the previous granule (BC) or the one
    before it (BDC).
    """
    Q = M()["Q"]  # [16, 32, 32] maps band-slice -> pcm-slice
    d_in = 576 * nch
    n_out = 32 * nbands * nch
    A = np.zeros((n_out, d_in), np.float32)
    BC = np.zeros((n_out, d_in), np.float32)
    BDC = np.zeros((n_out, d_in), np.float32)
    for s in range(nbands):
        for i in range(16):
            t = s - i
            if t >= 0:
                dst = A
            elif t + nbands >= 0:
                dst, t = BC, t + nbands
            else:
                dst, t = BDC, t + 2 * nbands
            if t >= nbands:
                continue
            for c in range(nch):
                rows = (np.arange(32) * nch + c) + s * 32 * nch
                cols = c * 576 + np.arange(32) * 18 + t
                dst[np.ix_(rows, cols)] += Q[i]
    return A, BC, BDC


def synth_granules_stream(grbufs: np.ndarray, nbands: int, nch: int,
                          use_jax: bool = False) -> np.ndarray:
    """Synthesize all granules of a stream at once (silence-start qmf).

    Args:
      grbufs: [G, 2, 576] post-IMDCT granule buffers. Mono uses plane 0.
    Returns [G * 32 * nbands, nch] float PCM in [-1, 1].
    """
    A, BC, BDC = granule_maps(nbands, nch)
    G = grbufs.shape[0]
    d_in = 576 * nch
    X = np.ascontiguousarray(
        grbufs.reshape(G, -1)[:, :d_in], dtype=np.float32
    )
    if use_jax:
        import jax.numpy as jnp

        Xj = jnp.asarray(X)
        out = Xj @ jnp.asarray(A).T
        out = out.at[1:].add(Xj[:-1] @ jnp.asarray(BC).T)
        out = out.at[2:].add(Xj[:-2] @ jnp.asarray(BDC).T)
        out = np.asarray(out)
    else:
        out = X @ A.T
        if G > 1:
            out[1:] += X[:-1] @ BC.T
        if G > 2:
            out[2:] += X[:-2] @ BDC.T
    return out.reshape(G * 32 * nbands, nch)


@functools.lru_cache(maxsize=4)
def _device_maps(nch: int):
    """Device copies of the IMDCT + QMF maps for the jitted path."""
    import jax.numpy as jnp

    m = M()
    A, BC, BDC = granule_maps(18, nch)
    return (jnp.asarray(m["A1"]), jnp.asarray(m["B1"]),
            jnp.asarray(m["A2"]), jnp.asarray(np.float32(_sign_mask())),
            jnp.asarray(A.T), jnp.asarray(BC.T), jnp.asarray(BDC.T))


def make_mp3_device_synth(nch: int):
    """Return a jittable fn(X [S,G,C,576] f32, kinds [S,G,C,32] int8)
    -> PCM [S, G*576, nch]: the full Layer-III dense half — hybrid IMDCT
    (kind-masked matmuls + shifted overlap-add) and QMF polyphase (3-tap
    matmul FIR) — as one fused TPU program. Batched over S streams."""
    import jax
    import jax.numpy as jnp

    A1, B1, A2, sign, At, BCt, BDCt = _device_maps(nch)
    d_in = 576 * nch
    # full f32 MXU accumulation: default TPU matmul precision is
    # bf16-grade, outside the <1e-4 decode accuracy contract
    hp = jax.lax.Precision.HIGHEST

    def mm(a, b):
        return jnp.matmul(a, b, precision=hp,
                          preferred_element_type=jnp.float32)

    def fn(X, kinds):
        S, G, C = X.shape[:3]
        Xr = X.reshape(S, G, C, 32, 18)
        out = jnp.zeros_like(Xr)
        ov = jnp.zeros(Xr.shape[:-1] + (9,), jnp.float32)
        for k in range(3):
            mask = (kinds == k)[..., None]
            out = out + jnp.where(mask, mm(Xr, A1[k].T), 0.0)
            ov = ov + jnp.where(mask, mm(Xr, A2[k].T), 0.0)
        ovprev = jnp.concatenate(
            [jnp.zeros_like(ov[:, :1]), ov[:, :-1]], axis=1)
        for k in range(3):
            mask = (kinds == k)[..., None]
            out = out + jnp.where(mask, mm(ovprev, B1[k].T), 0.0)
        out = out * sign
        Y = out.reshape(S, G, C * 576)[..., :d_in]
        pcm = mm(Y, At)
        pcm = pcm.at[:, 1:].add(mm(Y[:, :-1], BCt))
        pcm = pcm.at[:, 2:].add(mm(Y[:, :-2], BDCt))
        return pcm.reshape(S, G * 576, nch)

    return fn


def synth_stream_step(grbuf: np.ndarray, prev1: np.ndarray,
                      prev2: np.ndarray, nbands: int, nch: int):
    """Streaming one-granule synthesis: the same 3-tap matmul FIR with
    the two previous granule buffers as explicit state."""
    A, BC, BDC = granule_maps(nbands, nch)
    d_in = 576 * nch
    x = grbuf.reshape(-1)[:d_in].astype(np.float32)
    out = A @ x
    if prev1 is not None:
        out += BC @ prev1.reshape(-1)[:d_in].astype(np.float32)
    if prev2 is not None:
        out += BDC @ prev2.reshape(-1)[:d_in].astype(np.float32)
    return out.reshape(32 * nbands, nch)


