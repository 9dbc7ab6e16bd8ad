"""minimp3 synthesis-math MIRROR — reference oracle for tests/tools only.

PROVENANCE: these functions are a line-for-line Python transliteration of
minimp3's synthesis decomposition (reference: third_party/minimp3/minimp3.h
— L3_dct3_9 :1037, L3_imdct36 :1077, L3_imdct12 :1143, L3_imdct_gr :1184,
mp3d_DCT_II :1264, mp3d_synth :1466, mp3d_synth_granule :1619). They are
NOT product code: the shipped decoder (libnyquist_tpu/ops/mp3_synth.py)
uses probed linear maps (data/mp3_maps.npz, generated from this mirror by
tools/gen_mp3_maps.py) — the butterfly ordering below is minimp3's and is
kept only so tests can check the product's matmul formulation against the
reference implementation bit-for-bit, the same role the reference's CPU
decoder plays for its CUDA path (SURVEY.md §4).
"""

from __future__ import annotations

import functools

import numpy as np

from libnyquist_tpu.ops.mp3_synth import T

def dct3_9(y):
    s0, s2, s4, s6, s8 = y[0], y[2], y[4], y[6], y[8]
    t0 = s0 + s6 * 0.5
    s0 -= s6
    t4 = (s4 + s2) * 0.93969262
    t2 = (s8 + s2) * 0.76604444
    s6 = (s4 - s8) * 0.17364818
    s4 += s8 - s2
    s2 = s0 - s4 * 0.5
    y[4] = s4 + s0
    s8 = t0 - t2 + s6
    s0 = t0 - t4 + t2
    s4 = t0 + t4 - s6
    s1, s3, s5, s7 = y[1], y[3], y[5], y[7]
    s3 *= 0.86602540
    t0 = (s5 + s1) * 0.98480775
    t4 = (s5 - s7) * 0.34202014
    t2 = (s1 + s7) * 0.64278761
    s1 = (s1 - s5 - s7) * 0.86602540
    s5 = t0 - s3 - t2
    s7 = t4 - s3 - t0
    s3 = t4 + s3 - t2
    y[0] = s4 - s7
    y[1] = s2 + s1
    y[2] = s0 - s3
    y[3] = s8 + s5
    y[5] = s8 - s5
    y[6] = s0 + s3
    y[7] = s2 - s1
    y[8] = s4 + s7


def imdct36(grbuf, off, overlap, ooff, window, nbands):
    t = T()
    g_twid9 = t["g_twid9"]
    for j in range(nbands):
        g = grbuf[off + 18 * j : off + 18 * j + 18]
        ov = overlap[ooff + 9 * j : ooff + 9 * j + 9]
        co = np.zeros(9)
        si = np.zeros(9)
        co[0] = -g[0]
        si[0] = g[17]
        for i in range(4):
            si[8 - 2 * i] = g[4 * i + 1] - g[4 * i + 2]
            co[1 + 2 * i] = g[4 * i + 1] + g[4 * i + 2]
            si[7 - 2 * i] = g[4 * i + 4] - g[4 * i + 3]
            co[2 + 2 * i] = -(g[4 * i + 3] + g[4 * i + 4])
        dct3_9(co)
        dct3_9(si)
        si[1::2] = -si[1::2]
        for i in range(9):
            ovl = ov[i]
            s = co[i] * g_twid9[9 + i] + si[i] * g_twid9[i]
            ov[i] = co[i] * g_twid9[i] - si[i] * g_twid9[9 + i]
            g[i] = ovl * window[i] - s * window[9 + i]
            g[17 - i] = ovl * window[9 + i] + s * window[i]


def idct3(x0, x1, x2):
    m1 = x1 * 0.86602540
    a1 = x0 - x2 * 0.5
    return np.array([a1 + m1, x0 + x2, a1 - m1])


def imdct12(x, dst, dstoff, overlap, ooff):
    # x is the stride-3 slice tmp[o::3]; C's x[3k] becomes x[k].
    t = T()
    g_twid3 = t["g_twid3"]
    co = idct3(-x[0], x[2] + x[1], x[4] + x[3])
    si = idct3(x[5], x[4] - x[3], x[2] - x[1])
    si[1] = -si[1]
    for i in range(3):
        ovl = overlap[ooff + i]
        s = co[i] * g_twid3[3 + i] + si[i] * g_twid3[i]
        overlap[ooff + i] = co[i] * g_twid3[i] - si[i] * g_twid3[3 + i]
        dst[dstoff + i] = ovl * g_twid3[2 - i] - s * g_twid3[5 - i]
        dst[dstoff + 5 - i] = ovl * g_twid3[5 - i] + s * g_twid3[2 - i]


def imdct_short(grbuf, off, overlap, ooff, nbands):
    for b in range(nbands):
        go = off + 18 * b
        oo = ooff + 9 * b
        tmp = grbuf[go : go + 18].copy()
        grbuf[go : go + 6] = overlap[oo : oo + 6]
        imdct12(tmp[0::3], grbuf, go + 6, overlap, oo + 6)
        imdct12(tmp[1::3], grbuf, go + 12, overlap, oo + 6)
        imdct12(tmp[2::3], overlap, oo, overlap, oo + 6)


def imdct_gr(grbuf, overlap, block_type, n_long_bands):
    t = T()
    g_mdct_window = t["g_mdct_window"]
    off, ooff = 0, 0
    if n_long_bands:
        imdct36(grbuf, 0, overlap, 0, g_mdct_window[0], n_long_bands)
        off = 18 * n_long_bands
        ooff = 9 * n_long_bands
    if block_type == 2:  # SHORT_BLOCK_TYPE
        imdct_short(grbuf, off, overlap, ooff, 32 - n_long_bands)
    else:
        imdct36(
            grbuf, off, overlap, ooff,
            g_mdct_window[1 if block_type == 3 else 0], 32 - n_long_bands,
        )


def change_sign(grbuf):
    for b in range(1, 32, 2):
        grbuf[18 * b + 1 : 18 * b + 18 : 2] *= -1


def dct_ii(grbuf, n):
    """In-place 32-point DCT over the band axis for n time slices
    (reference: mp3d_DCT_II generic branch)."""
    t = T()
    g_sec = t["g_sec"]
    for k in range(n):
        tt = np.zeros((4, 8))
        y = lambda idx: grbuf[idx * 18 + k]
        for i in range(8):
            x0 = y(i)
            x1 = y(15 - i)
            x2 = y(16 + i)
            x3 = y(31 - i)
            t0 = x0 + x3
            t1 = x1 + x2
            t2 = (x1 - x2) * g_sec[3 * i + 0]
            t3 = (x0 - x3) * g_sec[3 * i + 1]
            tt[0][i] = t0 + t1
            tt[1][i] = (t0 - t1) * g_sec[3 * i + 2]
            tt[2][i] = t3 + t2
            tt[3][i] = (t3 - t2) * g_sec[3 * i + 2]
        for x in tt:
            x0, x1, x2, x3, x4, x5, x6, x7 = x
            xt = x0 - x7; x0 += x7
            x7 = x1 - x6; x1 += x6
            x6 = x2 - x5; x2 += x5
            x5 = x3 - x4; x3 += x4
            x4 = x0 - x3; x0 += x3
            x3 = x1 - x2; x1 += x2
            x[0] = x0 + x1
            x[4] = (x0 - x1) * 0.70710677
            x5 = x5 + x6
            x6 = (x6 + x7) * 0.70710677
            x7 = x7 + xt
            x3 = (x3 + x4) * 0.70710677
            x5 -= x7 * 0.198912367
            x7 += x5 * 0.382683432
            x5 -= x7 * 0.198912367
            x0 = xt - x6; xt += x6
            x[1] = (xt + x7) * 0.50979561
            x[2] = (x4 + x3) * 0.54119611
            x[3] = (x0 - x5) * 0.60134488
            x[5] = (x0 + x5) * 0.89997619
            x[6] = (x4 - x3) * 1.30656302
            x[7] = (xt - x7) * 2.56291556
        yv = np.zeros(32)
        pos = 0
        for i in range(7):
            yv[pos + 0] = tt[0][i]
            yv[pos + 1] = tt[2][i] + tt[3][i] + tt[3][i + 1]
            yv[pos + 2] = tt[1][i] + tt[1][i + 1]
            yv[pos + 3] = tt[2][i + 1] + tt[3][i] + tt[3][i + 1]
            pos += 4
        yv[pos + 0] = tt[0][7]
        yv[pos + 1] = tt[2][7] + tt[3][7]
        yv[pos + 2] = tt[1][7]
        yv[pos + 3] = tt[3][7]
        grbuf[k::18][:32] = yv


def synth_pair(pcm, pcm_off, nch, z, zoff):
    a = (z[zoff + 14 * 64] - z[zoff]) * 29
    a += (z[zoff + 1 * 64] + z[zoff + 13 * 64]) * 213
    a += (z[zoff + 12 * 64] - z[zoff + 2 * 64]) * 459
    a += (z[zoff + 3 * 64] + z[zoff + 11 * 64]) * 2037
    a += (z[zoff + 10 * 64] - z[zoff + 4 * 64]) * 5153
    a += (z[zoff + 5 * 64] + z[zoff + 9 * 64]) * 6574
    a += (z[zoff + 8 * 64] - z[zoff + 6 * 64]) * 37489
    a += z[zoff + 7 * 64] * 75038
    pcm[pcm_off] = a
    zoff += 2
    a = z[zoff + 14 * 64] * 104
    a += z[zoff + 12 * 64] * 1567
    a += z[zoff + 10 * 64] * 9727
    a += z[zoff + 8 * 64] * 64019
    a += z[zoff + 6 * 64] * -9975
    a += z[zoff + 4 * 64] * -45
    a += z[zoff + 2 * 64] * 146
    a += z[zoff + 0 * 64] * -5
    pcm[pcm_off + 16 * nch] = a


def synth(xl, xl_off, pcm, pcm_off, nch, lins, lins_off):
    """One pair of bands -> 64 output samples per channel pair
    (reference: mp3d_synth generic branch)."""
    t = T()
    g_win = t["g_win"]
    xr_off = xl_off + 576 * (nch - 1)
    dstl = pcm_off
    dstr = pcm_off + (nch - 1)

    zlin_off = lins_off + 15 * 64
    lins[zlin_off + 4 * 15] = xl[xl_off + 18 * 16]
    lins[zlin_off + 4 * 15 + 1] = xl[xr_off + 18 * 16]
    lins[zlin_off + 4 * 15 + 2] = xl[xl_off]
    lins[zlin_off + 4 * 15 + 3] = xl[xr_off]
    lins[zlin_off + 4 * 31] = xl[xl_off + 1 + 18 * 16]
    lins[zlin_off + 4 * 31 + 1] = xl[xr_off + 1 + 18 * 16]
    lins[zlin_off + 4 * 31 + 2] = xl[xl_off + 1]
    lins[zlin_off + 4 * 31 + 3] = xl[xr_off + 1]

    synth_pair(pcm, dstr, nch, lins, lins_off + 4 * 15 + 1)
    synth_pair(
        pcm, dstr + 32 * nch, nch, lins, lins_off + 4 * 15 + 64 + 1
    )
    synth_pair(pcm, dstl, nch, lins, lins_off + 4 * 15)
    synth_pair(pcm, dstl + 32 * nch, nch, lins, lins_off + 4 * 15 + 64)

    wpos = 0
    for i in range(14, -1, -1):
        a = np.zeros(4)
        b = np.zeros(4)
        lins[zlin_off + 4 * i] = xl[xl_off + 18 * (31 - i)]
        lins[zlin_off + 4 * i + 1] = xl[xr_off + 18 * (31 - i)]
        lins[zlin_off + 4 * i + 2] = xl[xl_off + 1 + 18 * (31 - i)]
        lins[zlin_off + 4 * i + 3] = xl[xr_off + 1 + 18 * (31 - i)]
        lins[zlin_off + 4 * (i + 16)] = xl[xl_off + 1 + 18 * (1 + i)]
        lins[zlin_off + 4 * (i + 16) + 1] = xl[xr_off + 1 + 18 * (1 + i)]
        lins[zlin_off + 4 * (i - 16) + 2] = xl[xl_off + 18 * (1 + i)]
        lins[zlin_off + 4 * (i - 16) + 3] = xl[xr_off + 18 * (1 + i)]

        for kk, mode in enumerate((0, 2, 1, 2, 1, 2, 1, 2)):
            w0 = g_win[wpos]
            w1 = g_win[wpos + 1]
            wpos += 2
            vz = zlin_off + 4 * i - kk * 64
            vy = zlin_off + 4 * i - (15 - kk) * 64
            zv = lins[vz : vz + 4]
            yv = lins[vy : vy + 4]
            if mode == 0:
                b = zv * w1 + yv * w0
                a = zv * w0 - yv * w1
            elif mode == 1:
                b = b + zv * w1 + yv * w0
                a = a + zv * w0 - yv * w1
            else:
                b = b + zv * w1 + yv * w0
                a = a + yv * w1 - zv * w0
        pcm[dstr + (15 - i) * nch] = a[1]
        pcm[dstr + (17 + i) * nch] = b[1]
        pcm[dstl + (15 - i) * nch] = a[0]
        pcm[dstl + (17 + i) * nch] = b[0]
        pcm[dstr + (47 - i) * nch] = a[3]
        pcm[dstr + (49 + i) * nch] = b[3]
        pcm[dstl + (47 - i) * nch] = a[2]
        pcm[dstl + (49 + i) * nch] = b[2]


def synth_granule(qmf_state, grbuf, nbands, nch):
    """Full granule synthesis -> [32 * nbands, nch] float PCM in [-1, 1]
    (reference: mp3d_synth_granule; nbands = 18 for L3, 12 for L1/L2)."""
    flat = grbuf.reshape(-1)  # [2, 576] -> [1152]
    for ch in range(nch):
        dct_ii_vec(flat[576 * ch :], nbands)
    lins = np.zeros(15 * 64 + nbands * 64 + 64 * 2, np.float32)
    lins[: 15 * 64] = qmf_state
    pcm = np.zeros(576 * 2, np.float32)
    for i in range(0, nbands, 2):
        synth_vec(flat, i, pcm, 32 * nch * i, nch, lins, i * 64)
    if nch == 1:
        for i in range(0, 15 * 64, 2):
            qmf_state[i] = lins[nbands * 64 + i]
    else:
        qmf_state[:] = lins[nbands * 64 : nbands * 64 + 15 * 64]
    n_out = 32 * nbands
    out = pcm[: n_out * nch].reshape(n_out, nch) * np.float32(1.0 / 32768.0)
    return out


# ---------------------------------------------------------------------------
# Vectorized variants (same math, band/slice/column axes as arrays).
# The scalar forms above are kept as references for tests.
# ---------------------------------------------------------------------------

def _dct3_9v(y):
    """dct3_9 over the last axis of y [..., 9], functional."""
    s0, s2, s4, s6, s8 = y[..., 0], y[..., 2], y[..., 4], y[..., 6], y[..., 8]
    t0 = s0 + s6 * 0.5
    s0 = s0 - s6
    t4 = (s4 + s2) * 0.93969262
    t2 = (s8 + s2) * 0.76604444
    s6 = (s4 - s8) * 0.17364818
    s4 = s4 + s8 - s2
    s2 = s0 - s4 * 0.5
    y4 = s4 + s0
    s8 = t0 - t2 + s6
    s0 = t0 - t4 + t2
    s4 = t0 + t4 - s6
    s1, s3, s5, s7 = y[..., 1], y[..., 3], y[..., 5], y[..., 7]
    s3 = s3 * 0.86602540
    t0 = (s5 + s1) * 0.98480775
    t4 = (s5 - s7) * 0.34202014
    t2 = (s1 + s7) * 0.64278761
    s1 = (s1 - s5 - s7) * 0.86602540
    s5 = t0 - s3 - t2
    s7 = t4 - s3 - t0
    s3 = t4 + s3 - t2
    return np.stack(
        [s4 - s7, s2 + s1, s0 - s3, s8 + s5, y4, s8 - s5, s0 + s3,
         s2 - s1, s4 + s7], axis=-1,
    )


def imdct36_vec(grbuf, off, overlap, ooff, window, nbands):
    """imdct36 vectorized over bands (same results as imdct36)."""
    if nbands <= 0:
        return
    t = T()
    tw = t["g_twid9"]
    g = grbuf[off : off + 18 * nbands].reshape(nbands, 18)
    ov = overlap[ooff : ooff + 9 * nbands].reshape(nbands, 9)
    co = np.empty((nbands, 9), g.dtype)
    si = np.empty((nbands, 9), g.dtype)
    co[:, 0] = -g[:, 0]
    si[:, 0] = g[:, 17]
    i4 = np.arange(4)
    si[:, 8 - 2 * i4] = g[:, 4 * i4 + 1] - g[:, 4 * i4 + 2]
    co[:, 1 + 2 * i4] = g[:, 4 * i4 + 1] + g[:, 4 * i4 + 2]
    si[:, 7 - 2 * i4] = g[:, 4 * i4 + 4] - g[:, 4 * i4 + 3]
    co[:, 2 + 2 * i4] = -(g[:, 4 * i4 + 3] + g[:, 4 * i4 + 4])
    co = _dct3_9v(co)
    si = _dct3_9v(si)
    si[:, 1::2] = -si[:, 1::2]
    ovl = ov.copy()
    s = co * tw[9:18] + si * tw[:9]
    ov[:, :] = co * tw[:9] - si * tw[9:18]
    g[:, :9] = ovl * window[:9] - s * window[9:18]
    g[:, 9:18] = (ovl * window[9:18] + s * window[:9])[:, ::-1]


def imdct_short_vec(grbuf, off, overlap, ooff, nbands):
    """imdct_short vectorized over bands (three idct3 lanes at once)."""
    if nbands <= 0:
        return
    t = T()
    tw = t["g_twid3"]
    g = grbuf[off : off + 18 * nbands].reshape(nbands, 18)
    ov = overlap[ooff : ooff + 9 * nbands].reshape(nbands, 9)
    tmp = g.copy()
    g[:, 0:6] = ov[:, 0:6]

    def idct3v(x0, x1, x2):
        m1 = x1 * 0.86602540
        a1 = x0 - x2 * 0.5
        return np.stack([a1 + m1, x0 + x2, a1 - m1], axis=-1)

    outs = []
    for lane in range(3):
        x = tmp[:, lane::3]                       # [n, 6]
        co = idct3v(-x[:, 0], x[:, 2] + x[:, 1], x[:, 4] + x[:, 3])
        si = idct3v(x[:, 5], x[:, 4] - x[:, 3], x[:, 2] - x[:, 1])
        si[:, 1] = -si[:, 1]
        ovl = ov[:, 6:9].copy()
        s = co * tw[3:6] + si * tw[:3]
        ov[:, 6:9] = co * tw[:3] - si * tw[3:6]
        d0 = ovl * tw[2::-1] - s * tw[5:2:-1]
        d1 = (ovl * tw[5:2:-1] + s * tw[2::-1])[:, ::-1]
        outs.append((d0, d1))
        if lane == 0:
            g[:, 6:9], g[:, 9:12] = d0, d1
        elif lane == 1:
            g[:, 12:15], g[:, 15:18] = d0, d1
        else:
            ov[:, 0:3], ov[:, 3:6] = d0, d1


def imdct_gr_vec(grbuf, overlap, block_type, n_long_bands):
    t = T()
    w = t["g_mdct_window"]
    if n_long_bands:
        imdct36_vec(grbuf, 0, overlap, 0, w[0], n_long_bands)
    off, ooff = 18 * n_long_bands, 9 * n_long_bands
    if block_type == 2:
        imdct_short_vec(grbuf, off, overlap, ooff, 32 - n_long_bands)
    else:
        imdct36_vec(grbuf, off, overlap, ooff,
                    w[1 if block_type == 3 else 0], 32 - n_long_bands)


def dct_ii_vec(grbuf, n):
    """dct_ii vectorized over the n time slices."""
    t = T()
    g_sec = t["g_sec"]
    k = np.arange(n)
    x = grbuf[: 32 * 18].reshape(32, 18)[:, :n]   # [band, k]
    i8 = np.arange(8)
    x0 = x[i8]                 # [8, n]
    x1 = x[15 - i8]
    x2 = x[16 + i8]
    x3 = x[31 - i8]
    t0 = x0 + x3
    t1 = x1 + x2
    t2 = (x1 - x2) * g_sec[3 * i8 + 0][:, None]
    t3 = (x0 - x3) * g_sec[3 * i8 + 1][:, None]
    sec2 = g_sec[3 * i8 + 2][:, None]
    tt = [t0 + t1, (t0 - t1) * sec2, t3 + t2, (t3 - t2) * sec2]
    res = []
    for xr in tt:
        x0, x1, x2, x3, x4, x5, x6, x7 = (xr[j] for j in range(8))
        xt = x0 - x7; x0 = x0 + x7
        x7 = x1 - x6; x1 = x1 + x6
        x6 = x2 - x5; x2 = x2 + x5
        x5 = x3 - x4; x3 = x3 + x4
        x4 = x0 - x3; x0 = x0 + x3
        x3 = x1 - x2; x1 = x1 + x2
        o0 = x0 + x1
        o4 = (x0 - x1) * 0.70710677
        x5 = x5 + x6
        x6 = (x6 + x7) * 0.70710677
        x7 = x7 + xt
        x3 = (x3 + x4) * 0.70710677
        x5 = x5 - x7 * 0.198912367
        x7 = x7 + x5 * 0.382683432
        x5 = x5 - x7 * 0.198912367
        x0 = xt - x6; xt = xt + x6
        res.append(np.stack([
            o0, (xt + x7) * 0.50979561, (x4 + x3) * 0.54119611,
            (x0 - x5) * 0.60134488, o4, (x0 + x5) * 0.89997619,
            (x4 - x3) * 1.30656302, (xt - x7) * 2.56291556,
        ]))
    t0v, t1v, t2v, t3v = res  # each [8 rows reordered: see below]
    # rows of res correspond to indices 0..7 of tt[x] in scalar code order:
    # [0]=x[0], [1]=x[1]... mapping: scalar wrote x[0],x[4],x[1],x[2],x[3],
    # x[5],x[6],x[7] -> res stack order is [0,1,2,3,4,5,6,7] with x[4] at
    # stack pos 4 etc. (o0->x[0], o4->x[4]); stack order above is
    # [x0_, x1_, x2_, x3_, x4_, x5_, x6_, x7_] matching scalar x[0..7].
    yv = np.zeros((32, n))
    for i in range(7):
        yv[4 * i + 0] = t0v[i]
        yv[4 * i + 1] = t2v[i] + t3v[i] + t3v[i + 1]
        yv[4 * i + 2] = t1v[i] + t1v[i + 1]
        yv[4 * i + 3] = t2v[i + 1] + t3v[i] + t3v[i + 1]
    yv[28] = t0v[7]
    yv[29] = t2v[7] + t3v[7]
    yv[30] = t1v[7]
    yv[31] = t3v[7]
    grbuf[: 32 * 18].reshape(32, 18)[:, :n] = yv


_SYNTH_MODES = np.array([0, 2, 1, 2, 1, 2, 1, 2])
_SYNTH_SIGN = np.where(_SYNTH_MODES == 2, -1.0, 1.0)


def synth_vec(xl, xl_off, pcm, pcm_off, nch, lins, lins_off):
    """synth vectorized over the 15 z-columns (identical results)."""
    t = T()
    g_win = t["g_win"]
    xr_off = xl_off + 576 * (nch - 1)
    dstl = pcm_off
    dstr = pcm_off + (nch - 1)
    zlin = lins_off + 15 * 64

    # pos-15 entries (pre-loop writes)
    lins[zlin + 60] = xl[xl_off + 18 * 16]
    lins[zlin + 61] = xl[xr_off + 18 * 16]
    lins[zlin + 62] = xl[xl_off]
    lins[zlin + 63] = xl[xr_off]
    lins[zlin + 124] = xl[xl_off + 1 + 18 * 16]
    lins[zlin + 125] = xl[xr_off + 1 + 18 * 16]
    lins[zlin + 126] = xl[xl_off + 1]
    lins[zlin + 127] = xl[xr_off + 1]

    synth_pair(pcm, dstr, nch, lins, lins_off + 60 + 1)
    synth_pair(pcm, dstr + 32 * nch, nch, lins, lins_off + 60 + 64 + 1)
    synth_pair(pcm, dstl, nch, lins, lins_off + 60)
    synth_pair(pcm, dstl + 32 * nch, nch, lins, lins_off + 60 + 64)

    i = np.arange(14, -1, -1)
    # column writes (all independent of the reads below at same column)
    lins[zlin + 4 * i] = xl[xl_off + 18 * (31 - i)]
    lins[zlin + 4 * i + 1] = xl[xr_off + 18 * (31 - i)]
    lins[zlin + 4 * i + 2] = xl[xl_off + 1 + 18 * (31 - i)]
    lins[zlin + 4 * i + 3] = xl[xr_off + 1 + 18 * (31 - i)]
    lins[zlin + 4 * (i + 16)] = xl[xl_off + 1 + 18 * (1 + i)]
    lins[zlin + 4 * (i + 16) + 1] = xl[xr_off + 1 + 18 * (1 + i)]
    lins[zlin + 4 * (i - 16) + 2] = xl[xl_off + 18 * (1 + i)]
    lins[zlin + 4 * (i - 16) + 3] = xl[xr_off + 18 * (1 + i)]

    kk = np.arange(8)
    # g_win index: wpos advances 2 per kk continuously over the i loop
    # (i descending), so wpos(i, kk) = (14 - i)*16 + 2*kk
    wpos = (14 - i[:, None]) * 16 + 2 * kk[None, :]
    w0 = g_win[wpos]                      # [15, 8]
    w1 = g_win[wpos + 1]
    base = zlin + 4 * i                   # [15]
    c = np.arange(4)
    vz_idx = (base[:, None, None] - (kk * 64)[None, :, None]
              + c[None, None, :])         # [15, 8, 4]
    vy_idx = (base[:, None, None] - ((15 - kk) * 64)[None, :, None]
              + c[None, None, :])
    zv = lins[vz_idx]
    yv = lins[vy_idx]
    b = np.einsum("ikc,ik->ic", zv, w1) + np.einsum("ikc,ik->ic", yv, w0)
    a = (np.einsum("ikc,ik->ic", zv, w0 * _SYNTH_SIGN)
         - np.einsum("ikc,ik->ic", yv, w1 * _SYNTH_SIGN))

    pcm[dstr + (15 - i) * nch] = a[:, 1]
    pcm[dstr + (17 + i) * nch] = b[:, 1]
    pcm[dstl + (15 - i) * nch] = a[:, 0]
    pcm[dstl + (17 + i) * nch] = b[:, 0]
    pcm[dstr + (47 - i) * nch] = a[:, 3]
    pcm[dstr + (49 + i) * nch] = b[:, 3]
    pcm[dstl + (47 - i) * nch] = a[:, 2]
    pcm[dstl + (49 + i) * nch] = b[:, 2]


# ---------------------------------------------------------------------------
# Whole-stream synthesis as a 3-tap matmul FIR over granules.
#
# synth_granule is linear in (grbuf, qmf_state):
#   out_g   = A x_g + B q_g
#   q_{g+1} = C x_g + D q_g
# and D is nilpotent (D^2 = 0): the qmf window holds 15 z-blocks while a
# granule produces nbands/2 >= 6 of them, so two granules flush it for
# nbands=18 (verified numerically at probe time). Hence for a stream
# started from silence:
#   out_g = A x_g + (BC) x_{g-1} + (BDC) x_{g-2}
# -- three batched matmuls over all granules, no sequential state. This
# is the same trick as the CELT paired-matmul overlap-add, and it runs
# on BLAS host-side or the MXU for TPU serving.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=4)
def granule_maps(nbands: int, nch: int):
    """Probe (A, BC, BDC) for synth_granule with this (nbands, nch).

    Probing runs synth_granule ~2100 times, so the result is cached in
    a test-local cache dir (NOT the product package tree, which may be
    installed read-only) and loaded on later runs."""
    import pathlib

    cdir = pathlib.Path(__file__).resolve().parent / ".cache"
    try:
        cdir.mkdir(exist_ok=True)
    except Exception:
        import tempfile

        cdir = pathlib.Path(tempfile.gettempdir())
    cache = cdir / f"mp3maps_{nbands}_{nch}.npz"
    if cache.exists():
        try:
            z = np.load(cache)
            return (z["A"], z["BC"], z["BDC"])
        except Exception:
            pass
    A, BC, BDC = _probe_granule_maps(nbands, nch)
    try:
        tmp = cache.with_suffix(f".{id(cache)}.tmp")
        with open(tmp, "wb") as f:
            np.savez(f, A=A, BC=BC, BDC=BDC)
        tmp.replace(cache)
    except Exception:
        pass
    return A, BC, BDC


def _probe_granule_maps(nbands: int, nch: int):
    d_in = 576 * nch
    d_q = 15 * 64
    n_out = 32 * nbands * nch

    def run(grflat, qmf):
        g = np.zeros((2, 576), np.float32)
        g.reshape(-1)[:d_in] = grflat
        q = qmf.astype(np.float32).copy()
        out = synth_granule(q, g, nbands, nch)
        return out.reshape(-1), q

    A = np.zeros((n_out, d_in), np.float32)
    C = np.zeros((d_q, d_in), np.float32)
    z_q = np.zeros(d_q, np.float32)
    for i in range(d_in):
        e = np.zeros(d_in, np.float32)
        e[i] = 1.0
        out, q = run(e, z_q)
        A[:, i] = out
        C[:, i] = q
    B = np.zeros((n_out, d_q), np.float32)
    D = np.zeros((d_q, d_q), np.float32)
    z_x = np.zeros(d_in, np.float32)
    for j in range(d_q):
        e = np.zeros(d_q, np.float32)
        e[j] = 1.0
        out, q = run(z_x, e)
        B[:, j] = out
        D[:, j] = q
    # Nilpotency on the observable path: the mono qmf copy leaves odd
    # entries untouched (identity in D), but the output never reads
    # them, so check B D^2 C rather than D^2 itself.
    assert np.abs(B @ (D @ (D @ C))).max() == 0.0, \
        "granule state influence extends past 2 granules"
    return A, B @ C, B @ (D @ C)

