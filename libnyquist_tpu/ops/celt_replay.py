"""Device replay of the CELT PVQ value plane (the iy-split, DESIGN_iy_split.md).

The host emits an integer trace (formats/opus/iy_split.py); this module
replays the float plane on TPU as one jitted program per trace
structure:

  1. a 21-step unrolled band loop: transformed-lowband fetch (windowed
     slice-gather from the norm carry), fold/noise fills (LCG jumps as
     affine uint32 maps), haar/hadamard chains as STATIC
     reshape/transpose butterflies computed per (B, tf) class and
     class-selected per frame (bands.c quant_all_bands resynthesis),
     norm write (static slice), stereo merge / N=2 butterfly /
     inversion;
  2. anti-collapse noise injection + band renormalise (bands.c:284);
  3. denormalise by band gains (static broadcast-concat) + channel
     mixes (bands.c:192 denormalise_bands).

The spreading rotation (vq.c exp_rotation) runs on the HOST tracer in
double precision (native/celt_bands.c emit_leaf): on TPU the per-leaf
rotation decomposes into ~0.5M windowed gather+matmul+scatter rows and
measured 1.59s/stream (scatter-bound at ~2.5M rows/s); as host scalar
code over the same ~6M samples it is ~0.07s/stream.

Validated against the float64 NumPy replayer (iy_split.replay_numpy)
and the full native decode; see tests/test_iy_split.py.
"""

from __future__ import annotations

import functools

import numpy as np

from ..formats.opus.celt import ORDERY_TABLE
from ..formats.opus.celt_tables import mode48000
from ..formats.opus.iy_split import (
    EPSILON, LF_FOLD, LF_NOISE, CeltTrace, _chain, _lcg_tables,
)

_LCG_CACHE: dict = {}


def _bucket(n, lo=8):
    b = lo
    while b < n:
        b *= 2
    return b


def build_replay_arrays(tr: CeltTrace):
    """Host assembly: trace -> device-ready arrays + a static structure
    spec (hashable) that keys the compiled replay program.  All work
    here is vectorized NumPy on 1-D leaf arrays; the per-sample float
    plane never touches the host."""
    mode = mode48000()
    nb = mode.nbEBands
    eB = np.asarray(mode.eBands, np.int64)[: nb + 1]
    F = len(tr.fsz)
    nmax = int(tr.fsz.max())
    assert (tr.fsz == nmax).all(), "bucket must share a frame size"
    LM = int(np.log2(nmax // mode.shortMdctSize))
    start = tr.start
    band_off = ((1 << LM) * eB).astype(np.int64)

    arrs = {"xs": tr.xs.reshape(-1)}

    # ---- per-band chain classes + fills ----
    B_f = np.where(tr.sb > 0, tr.sb, 1).astype(np.int64)
    lcg = _LCG_CACHE.get(nmax)
    if lcg is None:
        A64, B64 = _lcg_tables(nmax + 1)
        lcg = (A64.astype(np.uint32), B64.astype(np.uint32))
        _LCG_CACHE[nmax] = lcg
    arrs["lcg_a"], arrs["lcg_b"] = lcg
    band_spec = []
    fills_idx = np.nonzero(
        (tr.lf_type == LF_FOLD) | (tr.lf_type == LF_NOISE))[0]
    fills_band = tr.lf_band[fills_idx]
    bkey_all = (B_f * 16)[:, None] + (tr.bd_tf.astype(np.int64) + 8)
    for i in range(start, nb):
        N = int(band_off[i + 1] - band_off[i])
        fkey = bkey_all[:, i]
        present = np.bincount(fkey, minlength=256).astype(bool)
        ukeys = np.nonzero(present)[0]
        classes = tuple((int(k) // 16, int(k) % 16 - 8) for k in ukeys)
        rank = np.zeros(256, np.int32)
        rank[ukeys] = np.arange(len(ukeys), dtype=np.int32)
        pre = f"b{i}"
        arrs[pre + "_cls"] = rank[fkey]
        li = fills_idx[fills_band == i]
        ni = len(li)
        ni_pad = _bucket(ni) if ni else 0
        if ni:
            def pad(v, fill=0, dt=None):
                out = np.full(ni_pad, fill, dt or v.dtype)
                out[:ni] = v
                return out
            arrs[pre + "_ff"] = pad(tr.lf_frame[li]).astype(np.int32)
            arrs[pre + "_fc"] = pad(tr.lf_call[li]).astype(np.int32)
            arrs[pre + "_fo"] = pad(tr.lf_off[li]).astype(np.int32)
            arrs[pre + "_fl"] = pad(tr.lf_len[li]).astype(np.int32)
            arrs[pre + "_fg"] = pad(tr.lf_gain[li].astype(np.float32))
            arrs[pre + "_fs"] = pad(tr.lf_seed[li])
            arrs[pre + "_ft"] = pad(
                (tr.lf_type[li] == LF_FOLD).astype(np.int32))
        band_spec.append((i, N, ni_pad, classes))

    # ---- band-level records ----
    arrs["eff_lb"] = tr.bd_eff_lb.astype(np.int32)
    arrs["mode_b"] = tr.bd_mode.astype(np.int32)
    arrs["imid"] = tr.bd_imid.astype(np.float32) * np.float32(1 / 32768)
    arrs["iside"] = tr.bd_iside.astype(np.float32) * np.float32(1 / 32768)
    arrs["inv"] = tr.bd_inv.astype(np.int32)
    arrs["sign"] = tr.bd_sign.astype(np.float32)
    arrs["cflag"] = tr.bd_cflag.astype(np.int32)
    arrs["avg_band"] = tr.fr_misc[:, 2].astype(np.int32)
    arrs["ends"] = tr.ends.astype(np.int32)
    arrs["gains"] = tr.fr_gains.astype(np.float32)
    arrs["sil"] = (tr.sil != 0)
    arrs["dup"] = ((tr.CC == 2) & (tr.chs == 1) & (tr.sil == 0))
    arrs["mixd"] = ((tr.CC == 1) & (tr.chs == 2) & (tr.sil == 0))

    # ---- anti-collapse ----
    nac = len(tr.ac_frame)
    nac_pad = _bucket(nac) if nac else 0
    if nac:
        N0s = np.diff(eB)[tr.ac_band.astype(np.int64)].astype(np.int32)
        arrs["ac_f"] = np.zeros(nac_pad, np.int32)
        arrs["ac_f"][:nac] = tr.ac_frame
        arrs["ac_base"] = np.full(nac_pad, 0, np.int32)
        arrs["ac_base"][:nac] = (
            band_off[tr.ac_band.astype(np.int64)]
            + tr.ac_k.astype(np.int64)).astype(np.int32)
        arrs["ac_c"] = np.zeros(nac_pad, np.int32)
        arrs["ac_c"][:nac] = tr.ac_c
        arrs["ac_n0"] = np.zeros(nac_pad, np.int32)
        arrs["ac_n0"][:nac] = N0s
        arrs["ac_seed"] = np.zeros(nac_pad, np.uint32)
        arrs["ac_seed"][:nac] = tr.ac_seed
        arrs["ac_r"] = np.zeros(nac_pad, np.float32)
        arrs["ac_r"][:nac] = tr.ac_r
        gkey = (tr.ac_frame.astype(np.int64) * 64
                + tr.ac_band.astype(np.int64) * 2 + tr.ac_c)
        ug = np.unique(gkey)
        nren = len(ug)
        nren_pad = _bucket(nren)
        rb = ((ug // 2) % 32).astype(np.int64)
        arrs["ren_f"] = np.zeros(nren_pad, np.int32)
        arrs["ren_f"][:nren] = (ug // 64).astype(np.int32)
        arrs["ren_c"] = np.zeros(nren_pad, np.int32)
        arrs["ren_c"][:nren] = (ug % 2).astype(np.int32)
        arrs["ren_base"] = np.zeros(nren_pad, np.int32)
        arrs["ren_base"][:nren] = band_off[rb].astype(np.int32)
        arrs["ren_n"] = np.zeros(nren_pad, np.int32)
        arrs["ren_n"][:nren] = ((eB[rb + 1] - eB[rb]) << LM).astype(
            np.int32)
        arrs["ren_on"] = np.zeros(nren_pad, bool)
        arrs["ren_on"][:nren] = True
    else:
        nren_pad = 0

    static_key = (F, nmax, LM, start, tr.CC, tr.CCout,
                  tuple(band_spec), nac_pad, nren_pad)
    return arrs, None, static_key


def _apply_chain_static(jnp, x, steps, ord_table):
    """Apply a quant_band haar/hadamard chain with STATIC ops only:
    haar1 -> reshape butterflies, (de)interleave_hadamard -> transpose
    plus a small static row reorder.  x is [..., N]."""
    Fb = x.shape[:-1]
    N = x.shape[-1]
    s = np.float32(np.sqrt(np.float64(0.5)))
    for step in steps:
        kind = step[0]
        if kind == "haar":
            _, n0, stride = step
            h = n0 >> 1
            L = stride * 2 * h
            if h <= 0 or L <= 0 or L > N:
                continue
            v = x[..., :L].reshape(Fb + (h, 2, stride))
            a = s * v[..., 0, :]
            b = s * v[..., 1, :]
            out = jnp.stack([a + b, a - b], axis=-2).reshape(Fb + (L,))
            x = out if L == N else jnp.concatenate([out, x[..., L:]], -1)
        else:
            _, N0, stride, had = step
            L = N0 * stride
            if L <= 0 or stride <= 1 or L > N:
                continue
            seg = x[..., :L]
            if kind == "deint":
                # out[o*N0+j] = in[j*stride+i], o = ordery[i] (or i)
                t = seg.reshape(Fb + (N0, stride))
                t = jnp.swapaxes(t, -1, -2)        # [stride, N0]
                if had:
                    t = jnp.take(t, jnp.asarray(
                        _deint_rows(ord_table, stride)), axis=-2)
                out = t.reshape(Fb + (L,))
            else:  # "int"
                t = seg.reshape(Fb + (stride, N0))
                if had:
                    t = jnp.take(t, jnp.asarray(
                        np.asarray(ord_table[stride], np.int32)), axis=-2)
                t = jnp.swapaxes(t, -1, -2)
                out = t.reshape(Fb + (L,))
            x = out if L == N else jnp.concatenate([out, x[..., L:]], -1)
    return x


def _deint_rows(ord_table, stride):
    """Row order for the deinterleave output: out_row[k] = t_row[i]
    with ordery[i] == k."""
    ordy = np.asarray(ord_table[stride], np.int64)
    inv = np.empty_like(ordy)
    inv[ordy] = np.arange(stride)
    return inv.astype(np.int32)


@functools.lru_cache(maxsize=64)
def _replay_builder(static_key):
    """Build the (unjitted) replay function for one trace structure —
    composable into larger programs (e.g. the fused replay+synthesis
    stream program in runtime/serving.py)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    (F, nmax, LM, start, CC, CCout, band_spec, nac_pad,
     nren_pad) = static_key
    mode = mode48000()
    nb = mode.nbEBands
    eB = np.asarray(mode.eBands, np.int64)[: nb + 1]
    band_off = ((1 << LM) * eB).astype(np.int64)
    norm_offset = int(band_off[start])
    norm_len = max(int(band_off[nb - 1]) - norm_offset, 1)

    # static chain step lists per band per class
    chain_sets = {}
    for (i, N, ni_pad, classes) in band_spec:
        chain_sets[i] = [
            _chain(N, int(b), int(t), structural=True) for b, t in classes
        ]

    def replay(arrs):
        A = arrs["lcg_a"]
        Bc = arrs["lcg_b"]
        X_all = arrs["xs"].reshape(F, 2, nmax)

        norm = jnp.zeros((F, 2, norm_len), jnp.float32)
        spec_parts = []
        if start > 0:
            spec_parts.append(jnp.zeros((F, 2, int(band_off[start])),
                                        jnp.float32))

        for (i, N, ni_pad, classes) in band_spec:
            off = int(band_off[i])
            pre = f"b{i}"
            mode_b = arrs["mode_b"][:, i]
            active = mode_b > 0
            cls_id = arrs[pre + "_cls"]
            chains = chain_sets[i]
            any_pre = any(c[0] for c in chains)
            any_post = any(c[1] for c in chains)

            # dual->intensity averaging
            upto = off - norm_offset
            if upto > 0:
                avg = (arrs["avg_band"] == i)[:, None]
                head = norm[:, :, :upto]
                mixed = 0.5 * (head[:, 0] + head[:, 1])
                norm = norm.at[:, 0, :upto].set(
                    jnp.where(avg, mixed, head[:, 0]))

            # lowband fetch (windowed slice-gather) + pre chain
            eff = arrs["eff_lb"][:, i]
            has_lb = eff >= 0
            offs_c = jnp.clip(eff, 0, max(norm_len - N, 0))
            lb = jax.vmap(
                lambda nrm, o: lax.dynamic_slice(nrm, (0, o), (2, N))
            )(norm, offs_c)
            lb = jnp.where(has_lb[:, None, None], lb, 0.0)
            if any_pre:
                variants = [
                    _apply_chain_static(jnp, lb, pre_steps, ORDERY_TABLE)
                    for pre_steps, _post in chains
                ]
                lb = variants[0]
                for c in range(1, len(variants)):
                    lb = jnp.where((cls_id == c)[:, None, None],
                                   variants[c], lb)

            X0 = X_all[:, :, off : off + N]
            # fold/noise fills
            if ni_pad:
                ff = arrs[pre + "_ff"]
                fc = arrs[pre + "_fc"]
                fo = arrs[pre + "_fo"]
                fl = arrs[pre + "_fl"]
                fg = arrs[pre + "_fg"]
                fs = arrs[pre + "_fs"]
                ft = arrs[pre + "_ft"]
                jj = jnp.arange(N)[None, :]
                m = jj < fl[:, None]
                seeds = (A[jj + 1] * fs[:, None] + Bc[jj + 1])
                cols = fo[:, None] + jj
                lbv = lb[ff[:, None], fc[:, None], jnp.where(m, cols, 0)]
                sign = jnp.where(
                    (seeds & jnp.uint32(0x8000)) != 0,
                    jnp.float32(1.0 / 256), jnp.float32(-1.0 / 256))
                nval = (seeds.astype(jnp.int32) >> 20).astype(jnp.float32)
                v = jnp.where(ft[:, None] == 1, lbv + sign, nval)
                v = jnp.where(m, v, 0.0)
                E = jnp.float32(EPSILON) + jnp.sum(v * v, axis=1)
                v = v * (fg / jnp.sqrt(E))[:, None]
                X0 = X0.at[ff[:, None], fc[:, None],
                           jnp.where(m, cols, N)].set(v, mode="drop")

            # post chain (static per class, frame-selected)
            if any_post:
                variants = [
                    _apply_chain_static(jnp, X0, post_steps, ORDERY_TABLE)
                    for _pre, post_steps in chains
                ]
                X0 = variants[0]
                for c in range(1, len(variants)):
                    X0 = jnp.where((cls_id == c)[:, None, None],
                                   variants[c], X0)

            # norm write (pre-merge, X-call / decoded-slot values)
            lbout = active & (i < arrs["ends"] - 1)
            if off - norm_offset >= 0 \
                    and off - norm_offset + N <= norm_len:
                sq = jnp.float32(np.sqrt(np.float64(N)))
                cfl = arrs["cflag"][:, i]
                src0 = jnp.where(
                    (mode_b == 3)[:, None],
                    jnp.where((cfl == 1)[:, None], X0[:, 1], X0[:, 0]),
                    X0[:, 0])
                dst = slice(off - norm_offset, off - norm_offset + N)
                norm = norm.at[:, 0, dst].set(
                    jnp.where(lbout[:, None], sq * src0, norm[:, 0, dst]))
                wd = lbout & (mode_b == 4)
                norm = norm.at[:, 1, dst].set(
                    jnp.where(wd[:, None], sq * X0[:, 1],
                              norm[:, 1, dst]))

            # stereo finalization
            Xf0, Xf1 = X0[:, 0], X0[:, 1]
            mid = arrs["imid"][:, i]
            side = arrs["iside"][:, i]
            m2 = mode_b == 2
            xp = jnp.sum(Xf1 * Xf0, axis=1) * mid
            se = jnp.sum(Xf1 * Xf1, axis=1)
            El = mid * mid + se - 2 * xp
            Er = mid * mid + se + 2 * xp
            passthru = (Er < 6e-4) | (El < 6e-4)
            lg = 1.0 / jnp.sqrt(jnp.where(passthru, 1.0, El))
            rg = 1.0 / jnp.sqrt(jnp.where(passthru, 1.0, Er))
            Lm = mid[:, None] * Xf0
            mX = jnp.where(passthru[:, None], Xf0,
                           lg[:, None] * (Lm - Xf1))
            mY = jnp.where(passthru[:, None], Xf0,
                           rg[:, None] * (Lm + Xf1))
            if N == 2:
                m3 = mode_b == 3
                cfl = arrs["cflag"][:, i]
                sgn = arrs["sign"][:, i]
                a = jnp.where((cfl == 1)[:, None], X0[:, 1], X0[:, 0])
                der = jnp.stack([-sgn * a[:, 1], sgn * a[:, 0]], axis=1)
                Xv = jnp.where((cfl == 1)[:, None], der, a)
                Yv = jnp.where((cfl == 1)[:, None], a, der)
                bX = mid[:, None] * Xv - side[:, None] * Yv
                bY = mid[:, None] * Xv + side[:, None] * Yv
                Xf0 = jnp.where(m3[:, None], bX, Xf0)
                Xf1 = jnp.where(m3[:, None], bY, Xf1)
            Xf0 = jnp.where(m2[:, None], mX, Xf0)
            Xf1 = jnp.where(m2[:, None], mY, Xf1)
            invs = (arrs["inv"][:, i] != 0)[:, None]
            Xf1 = jnp.where(invs, -Xf1, Xf1)
            spec_parts.append(jnp.where(
                active[:, None, None], jnp.stack([Xf0, Xf1], 1), 0.0))

        spec = jnp.concatenate(spec_parts, axis=2)
        tail = nmax - spec.shape[2]
        if tail > 0:
            spec = jnp.concatenate(
                [spec, jnp.zeros((F, 2, tail), jnp.float32)], axis=2)

        # ---- anti-collapse ----
        if nac_pad:
            n0max = 22
            jj = jnp.arange(n0max)[None, :]
            m = jj < arrs["ac_n0"][:, None]
            seeds = (A[jj + 1] * arrs["ac_seed"][:, None] + Bc[jj + 1])
            vals = jnp.where((seeds & jnp.uint32(0x8000)) != 0,
                             arrs["ac_r"][:, None],
                             -arrs["ac_r"][:, None])
            cols = arrs["ac_base"][:, None] + (jj << LM)
            spec = spec.at[arrs["ac_f"][:, None],
                           arrs["ac_c"][:, None],
                           jnp.where(m, cols, nmax)].set(
                vals, mode="drop")
            rmax = 176
            jj = jnp.arange(rmax)[None, :]
            m = jj < arrs["ren_n"][:, None]
            cols = arrs["ren_base"][:, None] + jj
            seg = spec[arrs["ren_f"][:, None], arrs["ren_c"][:, None],
                       jnp.where(m, cols, 0)]
            seg = jnp.where(m, seg, 0.0)
            g = 1.0 / jnp.sqrt(jnp.float32(EPSILON)
                               + jnp.sum(seg * seg, axis=1))
            g = jnp.where(arrs["ren_on"], g, 1.0)
            seg = seg * g[:, None]
            spec = spec.at[arrs["ren_f"][:, None],
                           arrs["ren_c"][:, None],
                           jnp.where(m, cols, nmax)].set(
                seg, mode="drop")

        # ---- denormalise (static broadcast-concat) + mixes ----
        g_parts = [jnp.zeros((F, 2, int(band_off[start])), jnp.float32)] \
            if start > 0 else []
        for i in range(start, nb):
            w = int(band_off[i + 1] - band_off[i])
            g_parts.append(jnp.broadcast_to(
                arrs["gains"][:, :, i : i + 1], (F, 2, w)))
        gtail = nmax - int(band_off[nb])
        if gtail > 0:
            g_parts.append(jnp.zeros((F, 2, gtail), jnp.float32))
        g_pos = jnp.concatenate(g_parts, axis=2)
        freq = spec * g_pos
        freq = jnp.where(arrs["sil"][:, None, None], 0.0, freq)
        if CCout == 2:
            freq = freq.at[:, 1].set(
                jnp.where(arrs["dup"][:, None], freq[:, 0], freq[:, 1]))
        if CC == 1:
            freq = freq.at[:, 0].set(
                jnp.where(arrs["mixd"][:, None],
                          0.5 * (freq[:, 0] + freq[:, 1]), freq[:, 0]))
        return freq[:, :CCout]

    return replay


@functools.lru_cache(maxsize=64)
def _compiled_replay(static_key):
    """Jitted replay program for one trace structure."""
    import jax

    return jax.jit(_replay_builder(static_key))


def replay_device(tr: CeltTrace):
    """Full device replay: trace -> freq [F, CCout, nmax] (jnp array)."""
    arrs, _static, static_key = build_replay_arrays(tr)
    fn = _compiled_replay(static_key)
    return fn(arrs)
