"""CELT spreading rotation (vq.c exp_rotation, decode direction) as a
single Pallas TPU kernel over the whole raw-iy leaf plane.

The XLA formulation (celt_replay._build_rotation_pass scan path) lowers
to ~4000 small slice/concat/pad ops per replay — dispatch-overhead
bound (~140 ms/stream measured).  This kernel runs the identical math
as ONE pass over the plane:

  1. fill-forward of the sub-segment markers (pk/theta/gain) along the
     position axis — a sequential sweep in VMEM, not a log-depth scan;
  2. every sigma2 sweep and the lag-1 sweep of exp_rotation1 replayed
     in the scalar op order, vectorized across the frame*channel lanes
     (each lag-sigma chain is sequential in position, but all 22k rows
     advance together);
  3. the per-leaf gain scale.

Layout is [W, R] (position-major): position slicing lands on sublanes,
rows (frame*2+call) on lanes.  Each grid block holds the full 800-col
plane strip for LANES_BLK rows in VMEM; HBM is touched once in, once
out.  Per-sigma sweeps are restricted to the static column range where
a band is wide enough to host a sigma2 of that size (segment length
>= sigma^2 - sigma, and segments never span bands).

Validated against the scan path and the native host rotation
(tests/test_iy_split.py raw-iy cases); the scan path remains the
CPU/virtual-mesh fallback.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES_BLK = 128  # [W=800, 128] f32 blocks: 5 I/O blocks (double-
#                  buffered) + 6 scratch planes ~ 8.6 MB VMEM; 256 OOMs
#                  the 16 MB scoped budget (measured 17.2 MB)


def _sigma_lo_col(sigma, band_off):
    """First column of the first band wide enough for sigma2=sigma:
    a sub-segment needs len > ((sigma-1)^2 + (sigma-1)) * stride, and
    segments never span bands."""
    need = (sigma - 1) * (sigma - 1) + (sigma - 1) + 1
    for i in range(len(band_off) - 1):
        if band_off[i + 1] - band_off[i] >= need:
            return int(band_off[i])
    return int(band_off[-1])


def _rot_kernel(sigmas, lo_cols, W,
                x_ref, pk_ref, th_ref, g_ref, y_ref,
                buf, kf, cs_c, cs_s, gm, lg):
    """One block: x/pk/th/g [W, B] in VMEM -> y [W, B]."""
    B = x_ref.shape[1]

    # ---- 1. fill-forward of the markers (sequential in position) ----
    buf[...] = x_ref[...]
    kf[0, :] = pk_ref[0, :]
    cs_c[0, :] = th_ref[0, :]
    gm[0, :] = g_ref[0, :]

    def fill(i, _):
        m = pk_ref[i, :] >= 0
        kf[i, :] = jnp.where(m, pk_ref[i, :], kf[i - 1, :])
        cs_c[i, :] = jnp.where(m, th_ref[i, :], cs_c[i - 1, :])
        gm[i, :] = jnp.where(m, g_ref[i, :], gm[i - 1, :])
        return 0

    jax.lax.fori_loop(1, W, fill, 0)

    # ---- 2. derived planes: validity, keys, coefs ----
    pos = jax.lax.broadcasted_iota(jnp.int32, (W, B), 0)
    kfv = kf[...]
    valid = (kfv >= 0) & ((pos - (kfv >> 13)) < ((kfv >> 4) & 0x1FF))
    kf[...] = jnp.where(valid, kfv, -1 - pos)
    lg[...] = jnp.where(valid, kfv & 15, 0)
    th = cs_c[...]
    rot_on = valid & (th > 0)
    hp = jnp.float32(np.pi * 0.5)
    cs_c[...] = jnp.where(rot_on, jnp.cos(hp * th), 1.0)
    cs_s[...] = jnp.where(rot_on, jnp.sin(hp * th), 0.0)
    gm[...] = jnp.where(valid, gm[...], 1.0)

    # ---- 3. sweeps (exp_rotation1 scalar op order, rows = chains) ----
    for sg, lo in zip(sigmas + (1,), lo_cols + (0,)):
        if sg == 1:
            def _cc(i):
                return cs_c[i, :]
            def _ss(i):
                return cs_s[i, :]
            def sel(lv):
                return lv > 0
        else:
            # swapped coefs for the sigma2 sweep (vq.c:100)
            def _cc(i):
                return cs_s[i, :]
            def _ss(i):
                return cs_c[i, :]
            def sel(lv, _sg=sg):
                return lv == (1 + _sg)

        def fwd(i, _, _sg=sg, _sel=sel, _c=_cc, _s=_ss):
            op = (kf[i, :] == kf[i + _sg, :]) & _sel(lg[i, :])
            x1 = buf[i, :]
            x2 = buf[i + _sg, :]
            cc = _c(i)
            ss = _s(i)
            buf[i + _sg, :] = jnp.where(op, cc * x2 + ss * x1, x2)
            buf[i, :] = jnp.where(op, cc * x1 - ss * x2, x1)
            return 0

        def bwd(k, _, _sg=sg, _sel=sel, _c=_cc, _s=_ss, _lo=lo):
            i = (W - 2 * _sg - 1) - k
            op = (kf[i, :] == kf[i + 2 * _sg, :]) & _sel(lg[i, :])
            x1 = buf[i, :]
            x2 = buf[i + _sg, :]
            cc = _c(i)
            ss = _s(i)
            buf[i + _sg, :] = jnp.where(op, cc * x2 + ss * x1, x2)
            buf[i, :] = jnp.where(op, cc * x1 - ss * x2, x1)
            return 0

        jax.lax.fori_loop(lo, W - sg, fwd, 0)
        jax.lax.fori_loop(0, W - 2 * sg - lo, bwd, 0)

    # ---- 4. per-leaf gain ----
    y_ref[...] = buf[...] * gm[...]


@functools.partial(
    jax.jit, static_argnames=("sigmas", "band_off_t", "interpret"))
def rotate_plane_pallas(xT, pkT, thT, gT, sigmas, band_off_t,
                        interpret=False):
    """xT/pkT/thT/gT: [W, R] position-major planes (R = F*2 rows);
    returns the rotated, gain-scaled plane [W, R]."""
    W, R = xT.shape
    band_off = list(band_off_t)
    lo_cols = tuple(_sigma_lo_col(sg, band_off) for sg in sigmas)
    Rp = -(-R // LANES_BLK) * LANES_BLK
    if Rp != R:
        padc = ((0, 0), (0, Rp - R))
        xT = jnp.pad(xT, padc)
        pkT = jnp.pad(pkT, padc, constant_values=-1)
        thT = jnp.pad(thT, padc)
        gT = jnp.pad(gT, padc)
    kern = functools.partial(_rot_kernel, tuple(sigmas), lo_cols, W)
    blk = lambda b: (0, b)
    out = pl.pallas_call(
        kern,
        grid=(Rp // LANES_BLK,),
        in_specs=[pl.BlockSpec((W, LANES_BLK), blk) for _ in range(4)],
        out_specs=pl.BlockSpec((W, LANES_BLK), blk),
        out_shape=jax.ShapeDtypeStruct((W, Rp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((W, LANES_BLK), jnp.float32),   # buf
            pltpu.VMEM((W, LANES_BLK), jnp.int32),     # filled keys
            pltpu.VMEM((W, LANES_BLK), jnp.float32),   # cos / theta
            pltpu.VMEM((W, LANES_BLK), jnp.float32),   # sin
            pltpu.VMEM((W, LANES_BLK), jnp.float32),   # gains
            pltpu.VMEM((W, LANES_BLK), jnp.int32),     # lags
        ],
        interpret=interpret,
    )(xT, pkT, thT, gT)
    return out[:, :R]
