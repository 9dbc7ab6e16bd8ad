"""Device replay of the CELT PVQ value plane (the iy-split, DESIGN_iy_split.md).

The host emits an integer trace (formats/opus/iy_split.py); this module
replays the float plane on TPU as one jitted program per trace
structure:

  1. spreading rotations: per-length buckets of gathered leaf segments
     x one [len, len] rotation matrix per (len, K, stride, spread)
     class (vq.c exp_rotation folded into a linear operator — the
     sequential Givens chain is data-independent, so it compiles to an
     MXU matmul over the class's leaves);
  2. a 21-step unrolled band loop: transformed-lowband fetch (dynamic
     gather from the norm carry), fold/noise fills (LCG jumps as affine
     uint32 maps), 2-tap chain steps (haar butterflies + hadamard
     permutations, class-selected per frame), norm write (static
     slice), stereo merge / N=2 butterfly / inversion (bands.c
     quant_all_bands resynthesis);
  3. anti-collapse noise injection + band renormalise (bands.c:284);
  4. denormalise by band gains + channel mixes (bands.c:192
     denormalise_bands).

Validated against the float64 NumPy replayer (iy_split.replay_numpy)
and the full native decode; see tests/test_iy_split.py.
"""

from __future__ import annotations

import functools

import numpy as np

from ..formats.opus.celt_tables import mode48000
from ..formats.opus.iy_split import (
    EPSILON, LF_FOLD, LF_N1, LF_NOISE, LF_PVQ, CeltTrace, _chain,
    _lcg_tables, rotation_matrix,
)

_ROT_MATRIX_CACHE: dict = {}
_CHAIN_STEP_CACHE: dict = {}


def _bucket(n, lo=8):
    b = lo
    while b < n:
        b *= 2
    return b


def _rot_matrix(length, stride, K, spread):
    key = (length, stride, K, spread)
    m = _ROT_MATRIX_CACHE.get(key)
    if m is None:
        m = rotation_matrix(length, stride, K, spread).astype(np.float32)
        _ROT_MATRIX_CACHE[key] = m
    return m


def _chain_steps(N, classes):
    """2-tap step tensors for a band: for each (B, tf) class, the pre
    (lowband) and post (resynthesis) chains as gather-pair ops:
        out[p] = c1[p] * x[i1[p]] + c2[p] * x[i2[p]]
    padded to a common depth with identity steps."""
    key = (N, tuple(classes))
    got = _CHAIN_STEP_CACHE.get(key)
    if got is not None:
        return got
    pres, posts = [], []
    for B, tf in classes:
        pre, post = _chain(N, B, tf)
        pres.append(pre)
        posts.append(post)

    def build(step_lists):
        D = max((len(sl) for sl in step_lists), default=0)
        ncls = len(step_lists)
        i1 = np.tile(np.arange(N, dtype=np.int32), (ncls, D, 1))
        i2 = i1.copy()
        c1 = np.ones((ncls, D, N), np.float32)
        c2 = np.zeros((ncls, D, N), np.float32)
        s = np.float32(np.sqrt(np.float64(0.5)))
        for ci, sl in enumerate(step_lists):
            for d, step in enumerate(sl):
                if step[0] == "haar":
                    _, n0, stride = step
                    h = n0 >> 1
                    if h <= 0:
                        continue
                    jj = np.arange(h)
                    for lane in range(stride):
                        a = stride * 2 * jj + lane
                        b = stride * (2 * jj + 1) + lane
                        i1[ci, d, a] = a
                        i2[ci, d, a] = b
                        c1[ci, d, a] = s
                        c2[ci, d, a] = s
                        i1[ci, d, b] = a
                        i2[ci, d, b] = b
                        c1[ci, d, b] = s
                        c2[ci, d, b] = -s
                else:
                    perm = step[1]
                    if perm is None:
                        continue
                    L = len(perm)
                    i1[ci, d, :L] = perm
                    i2[ci, d, :L] = perm
                    c1[ci, d, :L] = 1.0
                    c2[ci, d, :L] = 0.0
        return i1, i2, c1, c2, D

    out = (build(pres), build(posts))
    _CHAIN_STEP_CACHE[key] = out
    return out


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
    M = 1 << LM
    start = tr.start
    band_off = (M * eB).astype(np.int64)
    norm_offset = int(band_off[start])
    norm_len = int(band_off[nb - 1]) - norm_offset
    flat_n = F * 2 * nmax

    arrs = {"xs": tr.xs.reshape(-1)}
    static = {"F": F, "nmax": nmax, "LM": LM, "start": start,
              "CC": tr.CC, "CCout": tr.CCout, "norm_len": norm_len,
              "norm_offset": norm_offset}

    # ---- rotation buckets ----
    # len-major key packing: one argsort groups leaves first by length
    # (one device bucket per length), then by (spread, stride, K) class.
    spread_f = tr.fr_misc[:, 0].astype(np.int64)
    pvq = tr.lf_type == LF_PVQ
    ln_ = tr.lf_len.astype(np.int64)
    K_ = tr.lf_k.astype(np.int64)
    st_ = tr.lf_stride.astype(np.int64)
    sp_ = spread_f[tr.lf_frame]
    rot = pvq & (2 * K_ < ln_) & (sp_ != 0)
    ridx = np.nonzero(rot)[0]
    rot_spec = []
    if len(ridx):
        key = ((ln_[ridx] << 40) | (sp_[ridx] << 36) | (st_[ridx] << 30)
               | (K_[ridx] << 10))
        order = np.argsort(key, kind="stable")
        ridx = ridx[order]
        key = key[order]
        li_all = ridx
        base_all = ((tr.lf_frame[li_all].astype(np.int64) * 2
                     + tr.lf_call[li_all]) * nmax
                    + band_off[tr.lf_band[li_all].astype(np.int64)]
                    + tr.lf_off[li_all])
        # class boundaries in the sorted key stream
        newcls = np.empty(len(key), bool)
        newcls[0] = True
        np.not_equal(key[1:], key[:-1], out=newcls[1:])
        cls_of = np.cumsum(newcls) - 1           # global class id
        cstart = np.nonzero(newcls)[0]
        ckey = key[cstart]
        clen = (ckey >> 40).astype(np.int64)
        # length-bucket boundaries
        for length in np.unique(clen):
            csel = np.nonzero(clen == length)[0]
            c0, c1 = csel[0], csel[-1]
            l0 = cstart[c0]
            l1 = cstart[c1 + 1] if c1 + 1 < len(cstart) else len(key)
            mats = np.stack([
                _rot_matrix(int(length),
                            int((ckey[c] >> 30) & 63),
                            int((ckey[c] >> 10) & ((1 << 20) - 1)),
                            int((ckey[c] >> 36) & 15))
                for c in csel
            ])
            n_l = l1 - l0
            n_pad = _bucket(n_l)
            src = np.full((n_pad, int(length)), flat_n, np.int32)
            src[:n_l] = (base_all[l0:l1, None]
                         + np.arange(length)[None, :]).astype(np.int32)
            cls_pad = np.zeros(n_pad, np.int32)
            cls_pad[:n_l] = cls_of[l0:l1] - c0
            bname = f"rot{int(length)}"
            arrs[bname + "_src"] = src
            arrs[bname + "_cls"] = cls_pad
            arrs[bname + "_mats"] = mats
            rot_spec.append((int(length), n_pad, len(csel)))
    static["rot"] = tuple(rot_spec)

    # ---- per-band chain classes + fills ----
    B_f = np.where(tr.sb > 0, tr.sb, 1).astype(np.int64)
    A64, B64 = _lcg_tables(nmax + 1)
    arrs["lcg_a"] = A64.astype(np.uint32)
    arrs["lcg_b"] = B64.astype(np.uint32)
    band_spec = []
    fills = (tr.lf_type == LF_FOLD) | (tr.lf_type == LF_NOISE)
    bkey_all = (B_f * 16)[:, None] + (tr.bd_tf.astype(np.int64) + 8)
    for i in range(start, nb):
        N = int(band_off[i + 1] - band_off[i])
        fkey = bkey_all[:, i]
        present = np.bincount(fkey, minlength=256).astype(bool)
        ukeys = np.nonzero(present)[0]
        classes = tuple((int(k) // 16, int(k) % 16 - 8) for k in ukeys)
        (p_i1, p_i2, p_c1, p_c2, Dp), (q_i1, q_i2, q_c1, q_c2, Dq) = \
            _chain_steps(N, classes)
        # class id per frame via a 256-entry rank LUT (no sorting)
        rank = np.zeros(256, np.int32)
        rank[ukeys] = np.arange(len(ukeys), dtype=np.int32)
        cls_id = rank[fkey]
        pre = f"b{i}"
        if Dp:
            arrs[pre + "_pi1"] = p_i1
            arrs[pre + "_pi2"] = p_i2
            arrs[pre + "_pc1"] = p_c1
            arrs[pre + "_pc2"] = p_c2
        if Dq:
            arrs[pre + "_qi1"] = q_i1
            arrs[pre + "_qi2"] = q_i2
            arrs[pre + "_qc1"] = q_c1
            arrs[pre + "_qc2"] = q_c2
        arrs[pre + "_cls"] = cls_id
        # fill leaves of this band
        li = np.nonzero(fills & (tr.lf_band == i))[0]
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
            arrs[pre + "_fg"] = pad(
                tr.lf_gain[li].astype(np.float32))
            arrs[pre + "_fs"] = pad(tr.lf_seed[li])
            arrs[pre + "_ft"] = pad(
                (tr.lf_type[li] == LF_FOLD).astype(np.int32))
        band_spec.append((i, N, Dp, Dq, len(classes), ni_pad))
    static["bands"] = tuple(band_spec)

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
    static["nac"] = nac_pad
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
        # renorm groups: unique (frame, band, c)
        gkey = (tr.ac_frame.astype(np.int64) * 64
                + tr.ac_band.astype(np.int64) * 2 + tr.ac_c)
        ug = np.unique(gkey)
        nren = len(ug)
        nren_pad = _bucket(nren)
        static["nren"] = nren_pad
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
        static["nren"] = 0

    # static position->band map for denormalise
    bop = np.repeat(np.arange(nb), np.diff(band_off[: nb + 1]))
    if len(bop) < nmax:
        bop = np.pad(bop, (0, nmax - len(bop)))
    arrs["band_of_pos"] = bop[:nmax].astype(np.int32)

    static_key = (static["F"], static["nmax"], static["LM"],
                  static["start"], static["CC"], static["CCout"],
                  static["rot"], static["bands"], static["nac"],
                  static["nren"])
    return arrs, static, static_key


@functools.lru_cache(maxsize=64)
def _compiled_replay(static_key):
    """Build + jit the replay program for one trace structure."""
    import jax
    import jax.numpy as jnp

    (F, nmax, LM, start, CC, CCout, rot_spec, band_spec, nac_pad,
     nren_pad) = static_key
    mode = mode48000()
    nb = mode.nbEBands
    eB = np.asarray(mode.eBands, np.int64)[: nb + 1]
    M = 1 << LM
    band_off = (M * eB).astype(np.int64)
    norm_offset = int(band_off[start])
    norm_len = max(int(band_off[nb - 1]) - norm_offset, 1)
    flat_n = F * 2 * nmax

    def chain_apply(x, cls_id, i1, i2, c1, c2, D):
        # x [F, 2, N]; tables [ncls, D, N]
        for d in range(D):
            g1 = i1[cls_id, d][:, None, :]
            g2 = i2[cls_id, d][:, None, :]
            a = jnp.take_along_axis(x, jnp.broadcast_to(g1, x.shape), 2)
            b = jnp.take_along_axis(x, jnp.broadcast_to(g2, x.shape), 2)
            x = (c1[cls_id, d][:, None, :] * a
                 + c2[cls_id, d][:, None, :] * b)
        return x

    def replay(arrs):
        xs = arrs["xs"]
        # pad one scratch slot for rotation padding lanes
        flat = jnp.concatenate([xs, jnp.zeros(1, jnp.float32)])
        A = arrs["lcg_a"]
        Bc = arrs["lcg_b"]

        # ---- 1. spreading rotations (grouped MXU matmuls) ----
        for length, n_pad, ncls in rot_spec:
            src = arrs[f"rot{length}_src"]
            cls = arrs[f"rot{length}_cls"]
            mats = arrs[f"rot{length}_mats"]
            CH = 4096
            if n_pad > CH:
                def rot_chunk(ops):
                    s_, c_ = ops
                    seg = flat[s_]
                    return jnp.einsum(
                        "lj,lji->li", seg, mats[c_],
                        preferred_element_type=jnp.float32)
                nch = n_pad // CH
                segs = jax.lax.map(
                    rot_chunk,
                    (src.reshape(nch, CH, length),
                     cls.reshape(nch, CH)))
                flat = flat.at[src.reshape(-1)].set(
                    segs.reshape(-1), mode="drop")
            else:
                seg = flat[src]
                segr = jnp.einsum("lj,lji->li", seg, mats[cls],
                                  preferred_element_type=jnp.float32)
                flat = flat.at[src.reshape(-1)].set(
                    segr.reshape(-1), mode="drop")
        X_all = flat[:flat_n].reshape(F, 2, nmax)

        norm = jnp.zeros((F, 2, norm_len), jnp.float32)
        spec_parts = []
        if start > 0:
            spec_parts.append(jnp.zeros((F, 2, int(band_off[start])),
                                        jnp.float32))

        for (i, N, Dp, Dq, ncls, ni_pad) in band_spec:
            off = int(band_off[i])
            pre = f"b{i}"
            mode_b = arrs["mode_b"][:, i]
            active = mode_b > 0
            cls_id = arrs[pre + "_cls"]

            # dual->intensity averaging
            upto = off - norm_offset
            if upto > 0:
                avg = (arrs["avg_band"] == i)[:, None]
                head = norm[:, :, :upto]
                mixed = 0.5 * (head[:, 0] + head[:, 1])
                norm = norm.at[:, 0, :upto].set(
                    jnp.where(avg, mixed, head[:, 0]))

            # lowband fetch + pre chain
            eff = arrs["eff_lb"][:, i]
            has_lb = eff >= 0
            idx = (jnp.clip(eff, 0, max(norm_len - N, 0))[:, None]
                   + jnp.arange(N)[None, :])
            lb = jnp.take_along_axis(
                norm, jnp.broadcast_to(idx[:, None, :], (F, 2, N)), 2)
            lb = jnp.where(has_lb[:, None, None], lb, 0.0)
            if Dp:
                lb = chain_apply(lb, cls_id, arrs[pre + "_pi1"],
                                 arrs[pre + "_pi2"], arrs[pre + "_pc1"],
                                 arrs[pre + "_pc2"], Dp)

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

            # post chain
            if Dq:
                X0 = chain_apply(X0, cls_id, arrs[pre + "_qi1"],
                                 arrs[pre + "_qi2"], arrs[pre + "_qc1"],
                                 arrs[pre + "_qc2"], Dq)

            # norm write (pre-merge, X-call / decoded-slot values)
            lbout = active & (i < arrs["ends"] - 1)
            if off - norm_offset >= 0 \
                    and off - norm_offset + N <= norm_len:
                sq = jnp.float32(np.sqrt(np.float64(N)))
                cfl = arrs["cflag"][:, i]
                src0 = jnp.where(
                    (mode_b == 3)[:, None],
                    jnp.take_along_axis(
                        X0, jnp.broadcast_to(
                            cfl[:, None, None], (F, 1, N)), 1)[:, 0],
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
                a = jnp.take_along_axis(
                    X0, jnp.broadcast_to(cfl[:, None, None], (F, 1, N)),
                    1)[:, 0]
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
            seeds = (A[jj + 1] * arrs["ac_seed"][:, None]
                     + Bc[jj + 1])
            vals = jnp.where((seeds & jnp.uint32(0x8000)) != 0,
                             arrs["ac_r"][:, None],
                             -arrs["ac_r"][:, None])
            cols = arrs["ac_base"][:, None] + (jj << LM)
            spec = spec.at[arrs["ac_f"][:, None],
                           arrs["ac_c"][:, None],
                           jnp.where(m, cols, nmax)].set(
                vals, mode="drop")
            # renormalise affected bands
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

        # ---- denormalise + mixes ----
        g_pos = arrs["gains"][:, :, arrs["band_of_pos"]]
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

    return jax.jit(replay)


def replay_device(tr: CeltTrace):
    """Full device replay: trace -> freq [F, CCout, nmax] (jnp array)."""
    arrs, _static, static_key = build_replay_arrays(tr)
    fn = _compiled_replay(static_key)
    return fn(arrs)
