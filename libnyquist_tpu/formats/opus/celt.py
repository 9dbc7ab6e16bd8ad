"""CELT decoder (host side): entropy decoding through denormalised spectra.

Re-implementation of the CELT decode path for the 48 kHz static mode
(reference: third_party/opus/celt/celt_decoder_clean.c:353-724 and its
callees in quant_bands.c, rate.c, bands.c, vq.c, cwrs.c, laplace.c).

Architecture split (SURVEY.md §7): everything here is byte-serial, branchy
integer work — range decoding, bit allocation, PVQ index decoding — which
stays on the host CPU. The outputs are per-frame dense tensors
(denormalised MDCT spectra + postfilter parameters) that feed the batched
TPU synthesis ops (ops/imdct.py etc.). A NumPy reference synthesis is
included for oracle tests.

All bit-allocation decisions are pure integer arithmetic and match the
reference exactly (they must — the range decoder state depends on them);
floating-point only affects sample values, where float64 here vs the
reference's float32 keeps us well inside the 1e-4 accuracy target.
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import numpy as np

from .celt_tables import (
    COMB_GAINS,
    LOG2_FRAC_TABLE,
    SPREAD_ICDF,
    TAPSET_ICDF,
    TRIM_ICDF,
    mode48000,
)
from .range_coder import BITRES, RangeDecoder, ilog

# Constants (reference: celt/celt.h, celt/rate.h, celt/bands.h)
DECODE_BUFFER_SIZE = 2048
COMBFILTER_MAXPERIOD = 1024
COMBFILTER_MINPERIOD = 15
MAX_FINE_BITS = 8
FINE_OFFSET = 21
QTHETA_OFFSET = 4
QTHETA_OFFSET_TWOPHASE = 16
LOG_MAX_PSEUDO = 6
SPREAD_NONE, SPREAD_LIGHT, SPREAD_NORMAL, SPREAD_AGGRESSIVE = 0, 1, 2, 3
ALLOC_STEPS = 6
EPSILON = 1e-15
VERY_SMALL = 1e-30
CELT_SIG_SCALE = 32768.0

SMALL_ENERGY_ICDF = [2, 1, 0]
TF_SELECT_TABLE = [
    [0, -1, 0, -1, 0, -1, 0, -1],
    [0, -1, 0, -2, 1, 0, 1, -1],
    [0, -2, 0, -3, 2, 0, 1, -1],
    [0, -2, 0, -3, 3, 0, 1, -1],
]
BIT_INTERLEAVE_TABLE = [0, 1, 1, 1, 2, 3, 3, 3, 2, 3, 3, 3, 2, 3, 3, 3]
BIT_DEINTERLEAVE_TABLE = [
    0x00, 0x03, 0x0C, 0x0F, 0x30, 0x33, 0x3C, 0x3F,
    0xC0, 0xC3, 0xCC, 0xCF, 0xF0, 0xF3, 0xFC, 0xFF,
]
ORDERY_TABLE = {
    2: [1, 0],
    4: [3, 0, 2, 1],
    8: [7, 0, 4, 3, 6, 1, 5, 2],
    16: [15, 0, 8, 7, 12, 3, 11, 4, 14, 1, 9, 6, 13, 2, 10, 5],
}


def cdiv(a: int, b: int) -> int:
    """C-style integer division (truncation toward zero). Python's //
    floors, which differs for negative operands — and the reference's
    allocation math divides negative ints in several places."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def celt_lcg_rand(seed: int) -> int:
    return (1664525 * seed + 1013904223) & 0xFFFFFFFF


def _frac_mul16(a: int, b: int) -> int:
    return (16384 + _i16(a) * _i16(b)) >> 15


def _i16(x: int) -> int:
    x &= 0xFFFF
    return x - 0x10000 if x >= 0x8000 else x


def bitexact_cos(x: int) -> int:
    """Bit-exact cos approximation (reference: bands.c:68-78)."""
    tmp = (4096 + x * x) >> 13
    x2 = tmp
    x2 = (32767 - x2) + _frac_mul16(
        x2, -7651 + _frac_mul16(x2, 8277 + _frac_mul16(-626, x2))
    )
    return 1 + x2


def bitexact_log2tan(isin: int, icos: int) -> int:
    lc = ilog(icos)
    ls = ilog(isin)
    icos <<= 15 - lc
    isin <<= 15 - ls
    return (
        (ls - lc) * (1 << 11)
        + _frac_mul16(isin, _frac_mul16(isin, -2597) + 7932)
        - _frac_mul16(icos, _frac_mul16(icos, -2597) + 7932)
    )


# --------------------------------------------------------------------------
# Laplace decoder (reference: celt/laplace.c)
# --------------------------------------------------------------------------
LAPLACE_LOG_MINP = 0
LAPLACE_MINP = 1 << LAPLACE_LOG_MINP
LAPLACE_NMIN = 16


def _laplace_get_freq1(fs0: int, decay: int) -> int:
    ft = 32768 - LAPLACE_MINP * (2 * LAPLACE_NMIN) - fs0
    return (ft * (16384 - decay)) >> 15


def laplace_decode(dec: RangeDecoder, fs: int, decay: int) -> int:
    val = 0
    fm = dec.decode_bin(15)
    fl = 0
    if fm >= fs:
        val += 1
        fl = fs
        fs = _laplace_get_freq1(fs, decay) + LAPLACE_MINP
        while fs > LAPLACE_MINP and fm >= fl + 2 * fs:
            fs *= 2
            fl += fs
            fs = ((fs - 2 * LAPLACE_MINP) * decay) >> 15
            fs += LAPLACE_MINP
            val += 1
        if fs <= LAPLACE_MINP:
            di = (fm - fl) >> (LAPLACE_LOG_MINP + 1)
            val += di
            fl += 2 * di * LAPLACE_MINP
        if fm < fl + fs:
            val = -val
        else:
            fl += fs
    dec.update(fl, min(fl + fs, 32768), 32768)
    return val


# --------------------------------------------------------------------------
# Energy envelope (reference: celt/quant_bands.c)
# --------------------------------------------------------------------------
PRED_COEF = [29440 / 32768.0, 26112 / 32768.0, 21248 / 32768.0, 16384 / 32768.0]
BETA_COEF = [30147 / 32768.0, 22282 / 32768.0, 12124 / 32768.0, 6554 / 32768.0]
BETA_INTRA = 4915 / 32768.0


def _native_celt():
    """The native CELT hot-loop library, or None (env-gated fallback)."""
    import os

    if os.environ.get("LIBNYQUIST_NO_NATIVE_CELT"):
        return None
    from ...runtime import native

    L = native.lib()
    if L is None or not hasattr(L, "celt_coarse_energy"):
        return None
    return L


def _ec_pack(dec):
    return np.array(
        [dec.offs, dec.end_offs, dec.end_window, dec.nend_bits,
         dec.nbits_total, dec.rng, dec.rem, dec.val, dec.ext, dec.error],
        np.int64,
    )


def _ec_unpack(dec, ec):
    (dec.offs, dec.end_offs, dec.end_window, dec.nend_bits,
     dec.nbits_total, dec.rng, dec.rem, dec.val, dec.ext,
     dec.error) = ec.tolist()


_I64P = None
_I32P = None
_F64P = None


def _ec_ptrs():
    global _I64P, _I32P, _F64P
    if _I64P is None:
        import ctypes

        _I64P = ctypes.POINTER(ctypes.c_int64)
        _I32P = ctypes.POINTER(ctypes.c_int32)
        _F64P = ctypes.POINTER(ctypes.c_double)
    return _I64P, _I32P, _F64P


_MODE_PTRS = {}


def _mode_ptrs(mode):
    """Per-mode ctypes pointers to the static tables (built once; the
    arrays are kept alive in the cache entry)."""
    p = _MODE_PTRS.get(id(mode))
    if p is not None:
        return p
    import ctypes

    i16p = ctypes.POINTER(ctypes.c_int16)
    _, i32p, _ = _ec_ptrs()
    eb = np.ascontiguousarray(mode.eBands, np.int16)
    ln = np.ascontiguousarray(mode.logN, np.int16)
    ci = np.ascontiguousarray(mode.cache_index, np.int16)
    cb = np.ascontiguousarray(mode.cache_bits, np.uint8).tobytes()
    av = np.ascontiguousarray(mode.allocVectors, np.uint8).tobytes()
    pm = np.ascontiguousarray(mode.e_prob_model, np.int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    ccaps = np.ascontiguousarray(mode.cache_caps, np.uint8).tobytes()
    em = np.ascontiguousarray(mode.eMeans, np.float64)
    pmf = np.ascontiguousarray(pm.reshape(-1), np.int32)
    p = dict(
        eb=eb, ln=ln, ci=ci, cb=cb, av=av, pm=pm, ccaps=ccaps, em=em,
        pmf=pmf,
        eb_p=eb.ctypes.data_as(i16p),
        ln_p=ln.ctypes.data_as(i16p),
        ci_p=ci.ctypes.data_as(i16p),
        em_p=em.ctypes.data_as(f64p),
        pmf_p=pmf.ctypes.data_as(i32p),
        pm_p=[[pm[lm, it].ctypes.data_as(i32p) for it in range(2)]
              for lm in range(pm.shape[0])],
    )
    _MODE_PTRS[id(mode)] = p
    return p


def unquant_coarse_energy(mode, start, end, oldEBands, intra, dec, C, LM):
    prob_model = mode.e_prob_model[LM][1 if intra else 0]
    L = _native_celt()
    if L is not None and isinstance(dec.buf, bytes):
        i64p, i32p, f64p = _ec_ptrs()
        ec = _ec_pack(dec)
        pm_p = _mode_ptrs(mode)["pm_p"][LM][1 if intra else 0]
        eb = np.ascontiguousarray(oldEBands, np.float64)
        L.celt_coarse_energy(
            dec.buf, dec.storage, ec.ctypes.data_as(i64p),
            pm_p, int(start), int(end),
            eb.ctypes.data_as(f64p), eb.shape[1], int(bool(intra)),
            int(C), int(LM),
        )
        oldEBands[:, :] = eb
        _ec_unpack(dec, ec)
        return
    if intra:
        coef, beta = 0.0, BETA_INTRA
    else:
        coef, beta = PRED_COEF[LM], BETA_COEF[LM]
    prev = [0.0, 0.0]
    budget = dec.storage * 8
    for i in range(start, end):
        for c in range(C):
            tell = dec.tell()
            if budget - tell >= 15:
                pi = 2 * min(i, 20)
                qi = laplace_decode(
                    dec, int(prob_model[pi]) << 7, int(prob_model[pi + 1]) << 6
                )
            elif budget - tell >= 2:
                qi = dec.dec_icdf(SMALL_ENERGY_ICDF, 2)
                qi = (qi >> 1) ^ -(qi & 1)
            elif budget - tell >= 1:
                qi = -dec.dec_bit_logp(1)
            else:
                qi = -1
            q = float(qi)
            oldEBands[c, i] = max(-9.0, oldEBands[c, i])
            tmp = coef * oldEBands[c, i] + prev[c] + q
            oldEBands[c, i] = tmp
            prev[c] = prev[c] + q - beta * q


def unquant_fine_energy(mode, start, end, oldEBands, fine_quant, dec, C):
    L = _native_celt()
    if L is not None and isinstance(dec.buf, bytes):
        i64p, i32p, f64p = _ec_ptrs()
        ec = _ec_pack(dec)
        fq = np.ascontiguousarray(fine_quant, np.int32)
        eb = np.ascontiguousarray(oldEBands, np.float64)
        L.celt_fine_energy(
            dec.buf, dec.storage, ec.ctypes.data_as(i64p),
            fq.ctypes.data_as(i32p), eb.ctypes.data_as(f64p), eb.shape[1],
            int(start), int(end), int(C),
        )
        oldEBands[:, :] = eb
        _ec_unpack(dec, ec)
        return
    for i in range(start, end):
        if fine_quant[i] <= 0:
            continue
        for c in range(C):
            q2 = dec.dec_bits(fine_quant[i])
            offset = (q2 + 0.5) * (1 << (14 - fine_quant[i])) / 16384.0 - 0.5
            oldEBands[c, i] += offset


def unquant_energy_finalise(
    mode, start, end, oldEBands, fine_quant, fine_priority, bits_left, dec, C
):
    L = _native_celt()
    if L is not None and isinstance(dec.buf, bytes):
        i64p, i32p, f64p = _ec_ptrs()
        ec = _ec_pack(dec)
        fq = np.ascontiguousarray(fine_quant, np.int32)
        fp = np.ascontiguousarray(fine_priority, np.int32)
        eb = np.ascontiguousarray(oldEBands, np.float64)
        L.celt_energy_finalise(
            dec.buf, dec.storage, ec.ctypes.data_as(i64p),
            fq.ctypes.data_as(i32p), fp.ctypes.data_as(i32p),
            int(bits_left), eb.ctypes.data_as(f64p), eb.shape[1],
            int(start), int(end), int(C),
        )
        oldEBands[:, :] = eb
        _ec_unpack(dec, ec)
        return
    for prio in range(2):
        i = start
        while i < end and bits_left >= C:
            if fine_quant[i] >= MAX_FINE_BITS or fine_priority[i] != prio:
                i += 1
                continue
            for c in range(C):
                q2 = dec.dec_bits(1)
                offset = (q2 - 0.5) * (1 << (14 - fine_quant[i] - 1)) / 16384.0
                oldEBands[c, i] += offset
                bits_left -= 1
            i += 1


# --------------------------------------------------------------------------
# tf_decode (reference: celt_decoder_clean.c:314-351)
# --------------------------------------------------------------------------
def tf_decode(start, end, isTransient, tf_res, LM, dec):
    L = _native_celt()
    if L is not None and isinstance(dec.buf, bytes):
        i64p, i32p, _ = _ec_ptrs()
        ec = _ec_pack(dec)
        tf = np.zeros(len(tf_res), np.int32)
        tf[:] = tf_res
        L.celt_tf_decode(
            dec.buf, dec.storage, ec.ctypes.data_as(i64p),
            int(start), int(end), int(isTransient),
            tf.ctypes.data_as(i32p), int(LM),
        )
        tf_res[:] = [int(v) for v in tf]
        _ec_unpack(dec, ec)
        return
    budget = dec.storage * 8
    tell = dec.tell()
    logp = 2 if isTransient else 4
    tf_select_rsv = 1 if (LM > 0 and tell + logp + 1 <= budget) else 0
    budget -= tf_select_rsv
    tf_changed = curr = 0
    for i in range(start, end):
        if tell + logp <= budget:
            curr ^= dec.dec_bit_logp(logp)
            tell = dec.tell()
            tf_changed |= curr
        tf_res[i] = curr
        logp = 4 if isTransient else 5
    tf_select = 0
    base = 4 * (1 if isTransient else 0)
    if tf_select_rsv and (
        TF_SELECT_TABLE[LM][base + 0 + tf_changed]
        != TF_SELECT_TABLE[LM][base + 2 + tf_changed]
    ):
        tf_select = dec.dec_bit_logp(1)
    for i in range(start, end):
        tf_res[i] = TF_SELECT_TABLE[LM][base + 2 * tf_select + tf_res[i]]


# --------------------------------------------------------------------------
# Allocation (reference: celt/rate.c)
# --------------------------------------------------------------------------
def get_pulses(i: int) -> int:
    return i if i < 8 else (8 + (i & 7)) << ((i >> 3) - 1)


def _band_cache(mode, band, LM):
    idx = mode.cache_index[(LM + 1) * mode.nbEBands + band]
    return mode.cache_bits[idx:]


def bits2pulses(mode, band, LM, bits):
    cache = _band_cache(mode, band, LM)
    lo, hi = 0, int(cache[0])
    bits -= 1
    for _ in range(LOG_MAX_PSEUDO):
        mid = (lo + hi + 1) >> 1
        if int(cache[mid]) >= bits:
            hi = mid
        else:
            lo = mid
    if bits - (-1 if lo == 0 else int(cache[lo])) <= int(cache[hi]) - bits:
        return lo
    return hi


def pulses2bits(mode, band, LM, pulses):
    cache = _band_cache(mode, band, LM)
    return 0 if pulses == 0 else int(cache[pulses]) + 1


_CAPS_CACHE = {}
_CAPS_NP = {}


def init_caps(mode, LM, C):
    """Per-band allocation caps; deterministic in (mode, LM, C), so cached
    (callers treat the result as read-only)."""
    key = (id(mode), LM, C)
    cap = _CAPS_CACHE.get(key)
    if cap is not None:
        return cap
    cap = [0] * mode.nbEBands
    for i in range(mode.nbEBands):
        N = (mode.eBands[i + 1] - mode.eBands[i]) << LM
        cap[i] = (
            int(mode.cache_caps[mode.nbEBands * (2 * LM + C - 1) + i]) + 64
        ) * C * N >> 2
    _CAPS_CACHE[key] = cap
    _CAPS_NP[id(cap)] = np.ascontiguousarray(cap, np.int32)
    return cap


def _caps_np(cap):
    a = _CAPS_NP.get(id(cap))
    return a if a is not None else np.ascontiguousarray(cap, np.int32)


def _interp_bits2pulses(
    mode, start, end, skip_start, bits1, bits2, thresh, cap, total, skip_rsv,
    intensity_rsv, dual_stereo_rsv, C, LM, dec,
    encode=False, chosen_intensity=0, chosen_dual=0,
):
    eBands = mode.eBands
    alloc_floor = C << BITRES
    stereo = 1 if C > 1 else 0
    logM = LM << BITRES
    bits = [0] * mode.nbEBands
    ebits = [0] * mode.nbEBands
    fine_priority = [0] * mode.nbEBands

    lo, hi = 0, 1 << ALLOC_STEPS
    for _ in range(ALLOC_STEPS):
        mid = (lo + hi) >> 1
        psum, done = 0, False
        for j in range(end - 1, start - 1, -1):
            tmp = bits1[j] + ((mid * bits2[j]) >> ALLOC_STEPS)
            if tmp >= thresh[j] or done:
                done = True
                psum += min(tmp, cap[j])
            elif tmp >= alloc_floor:
                psum += alloc_floor
        if psum > total:
            hi = mid
        else:
            lo = mid
    psum, done = 0, False
    for j in range(end - 1, start - 1, -1):
        tmp = bits1[j] + ((lo * bits2[j]) >> ALLOC_STEPS)
        if tmp < thresh[j] and not done:
            tmp = alloc_floor if tmp >= alloc_floor else 0
        else:
            done = True
        tmp = min(tmp, cap[j])
        bits[j] = tmp
        psum += tmp

    codedBands = end
    while True:
        j = codedBands - 1
        if j <= skip_start:
            total += skip_rsv
            break
        left = total - psum
        percoeff = cdiv(left, int(eBands[codedBands] - eBands[start]))
        left -= (eBands[codedBands] - eBands[start]) * percoeff
        rem = max(left - (eBands[j] - eBands[start]), 0)
        band_width = int(eBands[codedBands] - eBands[j])
        band_bits = bits[j] + percoeff * band_width + rem
        if band_bits >= max(thresh[j], alloc_floor + (1 << BITRES)):
            if encode:
                # encoder choice: never skip bands (spec-valid)
                dec.enc_bit_logp(1, 1)
                break
            if dec.dec_bit_logp(1):
                break
            psum += 1 << BITRES
            band_bits -= 1 << BITRES
        psum -= bits[j] + intensity_rsv
        if intensity_rsv > 0:
            intensity_rsv = LOG2_FRAC_TABLE[j - start]
        psum += intensity_rsv
        if band_bits >= alloc_floor:
            psum += alloc_floor
            bits[j] = alloc_floor
        else:
            bits[j] = 0
        codedBands -= 1

    if intensity_rsv > 0:
        if encode:
            intensity = min(chosen_intensity, codedBands)
            dec.enc_uint(intensity - start, codedBands + 1 - start)
        else:
            intensity = start + dec.dec_uint(codedBands + 1 - start)
    else:
        intensity = 0
    if intensity <= start:
        total += dual_stereo_rsv
        dual_stereo_rsv = 0
    if dual_stereo_rsv > 0:
        if encode:
            dual_stereo = chosen_dual
            dec.enc_bit_logp(dual_stereo, 1)
        else:
            dual_stereo = dec.dec_bit_logp(1)
    else:
        dual_stereo = 0

    left = total - psum
    percoeff = cdiv(left, int(eBands[codedBands] - eBands[start]))
    left -= (eBands[codedBands] - eBands[start]) * percoeff
    for j in range(start, codedBands):
        bits[j] += percoeff * (eBands[j + 1] - eBands[j])
    for j in range(start, codedBands):
        tmp = min(left, int(eBands[j + 1] - eBands[j]))
        bits[j] += tmp
        left -= tmp

    balance = 0
    j = start
    for j in range(start, codedBands):
        N0 = int(eBands[j + 1] - eBands[j])
        N = N0 << LM
        bit = bits[j] + balance
        if N > 1:
            excess = max(bit - cap[j], 0)
            bits[j] = bit - excess
            den = C * N + (
                1 if (C == 2 and N > 2 and not dual_stereo and j < intensity)
                else 0
            )
            NClogN = den * (int(mode.logN[j]) + logM)
            offset = (NClogN >> 1) - den * FINE_OFFSET
            if N == 2:
                offset += den << BITRES >> 2
            if bits[j] + offset < (den * 2) << BITRES:
                offset += NClogN >> 2
            elif bits[j] + offset < (den * 3) << BITRES:
                offset += NClogN >> 3
            ebits[j] = max(
                0, cdiv(bits[j] + offset + (den << (BITRES - 1)),
                        den << BITRES)
            )
            if C * ebits[j] > (bits[j] >> BITRES):
                ebits[j] = bits[j] >> stereo >> BITRES
            ebits[j] = min(ebits[j], MAX_FINE_BITS)
            fine_priority[j] = int(
                ebits[j] * (den << BITRES) >= bits[j] + offset
            )
            bits[j] -= C * ebits[j] << BITRES
        else:
            excess = max(0, bit - (C << BITRES))
            bits[j] = bit - excess
            ebits[j] = 0
            fine_priority[j] = 1
        if excess > 0:
            extra_fine = min(excess >> (stereo + BITRES),
                             MAX_FINE_BITS - ebits[j])
            ebits[j] += extra_fine
            extra_bits = extra_fine * C << BITRES
            fine_priority[j] = int(extra_bits >= excess - balance)
            excess -= extra_bits
        balance = excess

    for j in range(codedBands, end):
        ebits[j] = bits[j] >> stereo >> BITRES
        bits[j] = 0
        fine_priority[j] = int(ebits[j] < 1)
    return codedBands, balance, bits, ebits, fine_priority, intensity, dual_stereo



def _compute_allocation_native(mode, start, end, offsets, cap, alloc_trim,
                               total, C, LM, dec):
    """Decode-side dispatch to native/celt_bands.c
    celt_compute_allocation; None -> Python fallback."""
    import os

    if os.environ.get("LIBNYQUIST_NO_NATIVE_CELT"):
        return None
    from ...runtime import native

    L = native.lib()
    if L is None or not hasattr(L, "celt_compute_allocation"):
        return None
    import ctypes

    nb = mode.nbEBands
    ec = np.array(
        [dec.offs, dec.end_offs, dec.end_window, dec.nend_bits,
         dec.nbits_total, dec.rng, dec.rem, dec.val, dec.ext, dec.error],
        np.int64,
    )
    mp = _mode_ptrs(mode)
    capa = _caps_np(cap)
    offa = np.ascontiguousarray(offsets, np.int32)
    pulses = np.zeros(nb, np.int32)
    ebits = np.zeros(nb, np.int32)
    fprio = np.zeros(nb, np.int32)
    res = np.zeros(4, np.int32)

    def ip(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    L.celt_compute_allocation(
        dec.buf, dec.storage,
        ec.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        mp["eb_p"], nb,
        mp["ln_p"],
        mp["av"], int(mode.nbAllocVectors),
        ip(capa), ip(offa),
        int(start), int(end), int(alloc_trim), int(total), int(C), int(LM),
        ip(pulses), ip(ebits), ip(fprio), ip(res),
    )
    (dec.offs, dec.end_offs, dec.end_window, dec.nend_bits,
     dec.nbits_total, dec.rng, dec.rem, dec.val, dec.ext,
     dec.error) = ec.tolist()
    return (int(res[0]), int(res[3]), pulses.tolist(), ebits.tolist(),
            fprio.tolist(), int(res[1]), int(res[2]))


def compute_allocation(
    mode, start, end, offsets, cap, alloc_trim, total, C, LM, dec,
    encode=False, chosen_intensity=0, chosen_dual=0,
):
    if not encode:
        r = _compute_allocation_native(
            mode, start, end, offsets, cap, alloc_trim, total, C, LM, dec
        )
        if r is not None:
            return r
    eBands = mode.eBands
    total = max(total, 0)
    length = mode.nbEBands
    skip_start = start
    skip_rsv = (1 << BITRES) if total >= (1 << BITRES) else 0
    total -= skip_rsv
    intensity_rsv = dual_stereo_rsv = 0
    if C == 2:
        intensity_rsv = LOG2_FRAC_TABLE[end - start]
        if intensity_rsv > total:
            intensity_rsv = 0
        else:
            total -= intensity_rsv
            dual_stereo_rsv = (1 << BITRES) if total >= (1 << BITRES) else 0
            total -= dual_stereo_rsv

    thresh = [0] * length
    trim_offset = [0] * length
    bits1 = [0] * length
    bits2 = [0] * length
    for j in range(start, end):
        thresh[j] = max(
            C << BITRES,
            (3 * (eBands[j + 1] - eBands[j]) << LM << BITRES) >> 4,
        )
        trim_offset[j] = (
            C * (eBands[j + 1] - eBands[j])
            * (alloc_trim - 5 - LM) * (end - j - 1)
            * (1 << (LM + BITRES))
        ) >> 6
        if (eBands[j + 1] - eBands[j]) << LM == 1:
            trim_offset[j] -= C << BITRES

    lo, hi = 1, mode.nbAllocVectors - 1
    while lo <= hi:
        done = False
        psum = 0
        mid = (lo + hi) >> 1
        for j in range(end - 1, start - 1, -1):
            N = int(eBands[j + 1] - eBands[j])
            bitsj = C * N * int(mode.allocVectors[mid, j]) << LM >> 2
            if bitsj > 0:
                bitsj = max(0, bitsj + trim_offset[j])
            bitsj += offsets[j]
            if bitsj >= thresh[j] or done:
                done = True
                psum += min(bitsj, cap[j])
            elif bitsj >= C << BITRES:
                psum += C << BITRES
        if psum > total:
            hi = mid - 1
        else:
            lo = mid + 1
    hi = lo
    lo -= 1
    for j in range(start, end):
        N = int(eBands[j + 1] - eBands[j])
        bits1j = C * N * int(mode.allocVectors[lo, j]) << LM >> 2
        bits2j = (
            cap[j] if hi >= mode.nbAllocVectors
            else C * N * int(mode.allocVectors[hi, j]) << LM >> 2
        )
        if bits1j > 0:
            bits1j = max(0, bits1j + trim_offset[j])
        if bits2j > 0:
            bits2j = max(0, bits2j + trim_offset[j])
        if lo > 0:
            bits1j += offsets[j]
        bits2j += offsets[j]
        if offsets[j] > 0:
            skip_start = j
        bits2j = max(0, bits2j - bits1j)
        bits1[j] = bits1j
        bits2[j] = bits2j
    return _interp_bits2pulses(
        mode, start, end, skip_start, bits1, bits2, thresh, cap, total,
        skip_rsv, intensity_rsv, dual_stereo_rsv, C, LM, dec,
        encode=encode, chosen_intensity=chosen_intensity,
        chosen_dual=chosen_dual,
    )


# --------------------------------------------------------------------------
# PVQ codeword decoding (reference: celt/cwrs.c). Python bignums make the
# U(N,K) combinatorics trivial compared to the reference's u32 row tables.
# --------------------------------------------------------------------------
_U_CACHE: dict = {}


def pvq_u(n: int, k: int) -> int:
    """U(N,K): PVQ codewords of size N, K pulses, first pulse positive-ish."""
    if n < 0 or k < 0:
        return 0
    a, b = (n, k) if n <= k else (k, n)
    key = (a, b)
    v = _U_CACHE.get(key)
    if v is not None:
        return v
    # Base cases per the reference table (cwrs.c CELT_PVQ_U_DATA rows
    # N=0: 1,0,0,...  N=1: 1,1,1,...): U(0,0)=1, U(0,K>0)=0, U(N>0,0)=0.
    if n == 0 and k == 0:
        v = 1
    elif n == 0 or k == 0:
        v = 0
    else:
        v = pvq_u(n - 1, k) + pvq_u(n, k - 1) + pvq_u(n - 1, k - 1)
    _U_CACHE[key] = v
    return v


def pvq_v(n: int, k: int) -> int:
    return pvq_u(n, k) + pvq_u(n, k + 1)


def cwrsi(n: int, k: int, i: int):
    """Index -> pulse vector (reference: cwrs.c cwrsi)."""
    y = []
    while n > 2:
        if k >= n:
            p = pvq_u(n, k + 1)
            s = 1 if i >= p else 0
            if s:
                i -= p
            k0 = k
            q = pvq_u(n, n)
            if q > i:
                k = n
                while True:
                    k -= 1
                    p = pvq_u(k, n)
                    if p <= i:
                        break
            else:
                p = pvq_u(n, k)
                while p > i:
                    k -= 1
                    p = pvq_u(n, k)
            i -= p
            val = k0 - k
            y.append(-val if s else val)
        else:
            p = pvq_u(k, n)
            q = pvq_u(k + 1, n)
            if p <= i < q:
                i -= p
                y.append(0)
            else:
                s = 1 if i >= q else 0
                if s:
                    i -= q
                k0 = k
                while True:
                    k -= 1
                    p = pvq_u(k, n)
                    if p <= i:
                        break
                i -= p
                val = k0 - k
                y.append(-val if s else val)
        n -= 1
    # n == 2
    p = 2 * k + 1
    s = 1 if i >= p else 0
    if s:
        i -= p
    k0 = k
    k = (i + 1) >> 1
    if k:
        i -= 2 * k - 1
    val = k0 - k
    y.append(-val if s else val)
    # n == 1
    s = 1 if i > 0 else 0
    y.append(-k if s else k)
    return y


def decode_pulses(n: int, k: int, dec: RangeDecoder):
    return cwrsi(n, k, dec.dec_uint(pvq_v(n, k)))


# --------------------------------------------------------------------------
# VQ: spreading rotation + PVQ shape decode (reference: celt/vq.c)
# --------------------------------------------------------------------------
SPREAD_FACTOR = [15, 10, 5]


def _exp_rotation1(X, length, stride, c, s):
    for i in range(length - stride):
        x1 = X[i]
        x2 = X[i + stride]
        X[i + stride] = c * x2 + s * x1
        X[i] = c * x1 - s * x2
    for i in range(length - 2 * stride - 1, -1, -1):
        x1 = X[i]
        x2 = X[i + stride]
        X[i + stride] = c * x2 + s * x1
        X[i] = c * x1 - s * x2


def exp_rotation(X, length, direction, stride, K, spread):
    if 2 * K >= length or spread == SPREAD_NONE:
        return
    factor = SPREAD_FACTOR[spread - 1]
    gain = 1.0 * length / (length + factor * K)
    theta = 0.5 * gain * gain
    c = math.cos(0.5 * math.pi * theta)
    s = math.cos(0.5 * math.pi * (1.0 - theta))
    stride2 = 0
    if length >= 8 * stride:
        stride2 = 1
        while (stride2 * stride2 + stride2) * stride + (stride >> 2) < length:
            stride2 += 1
    length //= stride
    for i in range(stride):
        seg = X[i * length : (i + 1) * length]
        if direction < 0:
            if stride2:
                _exp_rotation1(seg, length, stride2, s, c)
            _exp_rotation1(seg, length, 1, c, s)
        else:
            _exp_rotation1(seg, length, 1, c, -s)
            if stride2:
                _exp_rotation1(seg, length, stride2, s, -c)


def extract_collapse_mask(iy, N, B):
    if B <= 1:
        return 1
    N0 = N // B
    mask = 0
    for i in range(B):
        sub = 0
        for j in range(N0):
            sub |= iy[i * N0 + j]
        mask |= (1 if sub != 0 else 0) << i
    return mask


def alg_unquant(X, N, K, spread, B, dec, gain):
    iy = decode_pulses(N, K, dec)
    Ryy = float(sum(v * v for v in iy))
    g = gain / math.sqrt(Ryy)
    for j in range(N):
        X[j] = g * iy[j]
    exp_rotation(X, N, -1, B, K, spread)
    return extract_collapse_mask(iy, N, B)


def icwrs(n: int, y) -> int:
    """Pulse vector -> index (reference: cwrs.c icwrs)."""
    j = n - 1
    i = 1 if y[j] < 0 else 0
    k = abs(int(y[j]))
    while j > 0:
        j -= 1
        i += pvq_u(n - j, k)
        k += abs(int(y[j]))
        if y[j] < 0:
            i += pvq_u(n - j, k + 1)
    return i


def encode_pulses(iy, n: int, k: int, enc) -> None:
    enc.enc_uint(icwrs(n, iy), pvq_v(n, k))


def op_pvq_search(X, K: int, N: int):
    """Greedy K-pulse PVQ search (reference: vq.c op_pvq_search).

    Returns (iy, yy). Any |y|_1 = K vector is decodable; the search only
    affects quality."""
    signs = [1 if X[j] >= 0 else -1 for j in range(N)]
    ax = [abs(float(X[j])) for j in range(N)]
    total = sum(ax)
    iy = [0] * N
    if total <= 1e-15:
        iy = [K] + [0] * (N - 1)
        return iy, float(K * K)
    # projection first pass
    pulses_left = K
    if K > (N >> 1):
        rcp = (K - 1) / total
        for j in range(N):
            iy[j] = int(ax[j] * rcp)
        pulses_left = K - sum(iy)
    xy = sum(ax[j] * iy[j] for j in range(N))
    yy = float(sum(v * v for v in iy))
    while pulses_left > 0:
        best = -1
        best_num = -1.0
        best_den = 0.0
        for j in range(N):
            num = (xy + ax[j]) * (xy + ax[j])
            den = yy + 2.0 * iy[j] + 1.0
            if best < 0 or num * best_den > best_num * den:
                best = j
                best_num = num
                best_den = den
        xy += ax[best]
        yy += 2.0 * iy[best] + 1.0
        iy[best] += 1
        pulses_left -= 1
    out = [signs[j] * iy[j] for j in range(N)]
    return out, float(sum(v * v for v in out))


def alg_quant(X, N, K, spread, B, enc, gain):
    """PVQ quantize + encode + resynthesize (reference: vq.c alg_quant)."""
    exp_rotation(X, N, 1, B, K, spread)
    iy, yy = op_pvq_search(X, K, N)
    encode_pulses(iy, N, K, enc)
    g = gain / math.sqrt(yy)
    for j in range(N):
        X[j] = g * iy[j]
    exp_rotation(X, N, -1, B, K, spread)
    return extract_collapse_mask(iy, N, B)


def laplace_encode(enc, value: int, fs: int, decay: int) -> int:
    """Dual of laplace_decode (reference: laplace.c ec_laplace_encode).
    Returns the (possibly saturated) value actually encoded."""
    fl = 0
    val = int(value)
    if val:
        s = -1 if val < 0 else 0
        val = (val + s) ^ s
        fl = fs
        fs = _laplace_get_freq1(fs, decay)
        i = 1
        while fs > 0 and i < val:
            fs *= 2
            fl += fs + 2 * LAPLACE_MINP
            fs = (fs * decay) >> 15
            i += 1
        if not fs:
            ndi_max = (32768 - fl + LAPLACE_MINP - 1) >> LAPLACE_LOG_MINP
            ndi_max = (ndi_max - s) >> 1
            di = min(val - i, ndi_max - 1)
            fl += (2 * di + 1 + s) * LAPLACE_MINP
            fs = min(LAPLACE_MINP, 32768 - fl)
            value = (i + di + s) ^ s
        else:
            fs += LAPLACE_MINP
            fl += fs & ~s
    enc.encode_bin(fl, fl + fs, 15)
    return int(value)


def renormalise_vector(X, N, gain):
    E = EPSILON + float(np.sum(X[:N] * X[:N]))
    g = gain / math.sqrt(E)
    X[:N] *= g


# --------------------------------------------------------------------------
# Band decoding (reference: celt/bands.c quant_* functions)
# --------------------------------------------------------------------------
def _haar1(X, n0, stride):
    n0 >>= 1
    s = math.sqrt(0.5)
    for i in range(stride):
        for j in range(n0):
            a = stride * 2 * j + i
            b = stride * (2 * j + 1) + i
            t1 = s * X[a]
            t2 = s * X[b]
            X[a] = t1 + t2
            X[b] = t1 - t2


def _deinterleave_hadamard(X, N0, stride, hadamard):
    N = N0 * stride
    tmp = np.empty(N, dtype=X.dtype)
    if hadamard:
        ordery = ORDERY_TABLE[stride]
        for i in range(stride):
            for j in range(N0):
                tmp[ordery[i] * N0 + j] = X[j * stride + i]
    else:
        for i in range(stride):
            for j in range(N0):
                tmp[i * N0 + j] = X[j * stride + i]
    X[:N] = tmp


def _interleave_hadamard(X, N0, stride, hadamard):
    N = N0 * stride
    tmp = np.empty(N, dtype=X.dtype)
    if hadamard:
        ordery = ORDERY_TABLE[stride]
        for i in range(stride):
            for j in range(N0):
                tmp[j * stride + i] = X[ordery[i] * N0 + j]
    else:
        for i in range(stride):
            for j in range(N0):
                tmp[j * stride + i] = X[i * N0 + j]
    X[:N] = tmp


def compute_qn(N, b, offset, pulse_cap, stereo):
    exp2_table8 = [16384, 17866, 19483, 21247, 23170, 25267, 27554, 30048]
    N2 = 2 * N - 1
    if stereo and N == 2:
        N2 -= 1
    qb = min(b - pulse_cap - (4 << BITRES), cdiv(b + N2 * offset, N2))
    qb = min(8 << BITRES, qb)
    if qb < (1 << BITRES >> 1):
        qn = 1
    else:
        qn = exp2_table8[qb & 0x7] >> (14 - (qb >> BITRES))
        qn = ((qn + 1) >> 1) << 1
    return qn


@dataclass
class BandCtx:
    mode: object
    i: int = 0
    intensity: int = 0
    spread: int = 0
    tf_change: int = 0
    dec: RangeDecoder = None   # RangeDecoder (decode) or RangeEncoder
    remaining_bits: int = 0
    seed: int = 0
    encode: int = 0
    bandE: object = None        # [C, nbEBands] band energies (encode side)
    disable_inv: int = 1


@dataclass
class SplitCtx:
    inv: int = 0
    imid: int = 0
    iside: int = 0
    delta: int = 0
    itheta: int = 0
    qalloc: int = 0


def _stereo_split(X, Y, N):
    s = math.sqrt(0.5)
    for j in range(N):
        l = s * X[j]
        r = s * Y[j]
        X[j] = l + r
        Y[j] = r - l


def _intensity_stereo(mode, X, Y, bandE, bandID, N):
    left = float(bandE[0][bandID])
    right = float(bandE[1][bandID])
    norm = EPSILON + math.sqrt(EPSILON + left * left + right * right)
    a1 = left / norm
    a2 = right / norm
    for j in range(N):
        X[j] = a1 * X[j] + a2 * Y[j]


def compute_theta(ctx: BandCtx, X, Y, N, b, B, B0, LM, stereo, fill):
    """Returns (sctx, b, fill)."""
    dec = ctx.dec
    mode = ctx.mode
    i = ctx.i
    sctx = SplitCtx()
    pulse_cap = int(mode.logN[i]) + LM * (1 << BITRES)
    offset = (pulse_cap >> 1) - (
        QTHETA_OFFSET_TWOPHASE if (stereo and N == 2) else QTHETA_OFFSET
    )
    qn = compute_qn(N, b, offset, pulse_cap, stereo)
    if stereo and i >= ctx.intensity:
        qn = 1
    itheta = 0
    inv = 0
    if ctx.encode:
        # stereo_itheta (vq.c): mid/side angle for stereo, half/half for
        # a mono split
        if stereo:
            m = 0.5 * (X[:N] + Y[:N])
            sd = 0.5 * (X[:N] - Y[:N])
            emid = 1e-15 + float(np.dot(m, m))
            eside = 1e-15 + float(np.dot(sd, sd))
        else:
            emid = 1e-15 + float(np.dot(X[:N], X[:N]))
            eside = 1e-15 + float(np.dot(Y[:N], Y[:N]))
        itheta = int(math.floor(0.5 + 16384 * 0.63662 * math.atan2(
            math.sqrt(eside), math.sqrt(emid))))
    tell = dec.tell_frac()
    if qn != 1:
        if ctx.encode:
            itheta = (itheta * qn + 8192) >> 14
        if stereo and N > 2:
            p0 = 3
            x0 = qn // 2
            ft = p0 * (x0 + 1) + x0
            if ctx.encode:
                x = itheta
                dec.encode(
                    p0 * x if x <= x0 else (x - 1 - x0) + (x0 + 1) * p0,
                    p0 * (x + 1) if x <= x0 else (x - x0) + (x0 + 1) * p0,
                    ft,
                )
            else:
                fs = dec.decode(ft)
                if fs < (x0 + 1) * p0:
                    x = fs // p0
                else:
                    x = x0 + 1 + (fs - (x0 + 1) * p0)
                dec.update(
                    p0 * x if x <= x0 else (x - 1 - x0) + (x0 + 1) * p0,
                    p0 * (x + 1) if x <= x0 else (x - x0) + (x0 + 1) * p0,
                    ft,
                )
            itheta = x
        elif B0 > 1 or stereo:
            if ctx.encode:
                dec.enc_uint(itheta, qn + 1)
            else:
                itheta = dec.dec_uint(qn + 1)
        else:
            ft = ((qn >> 1) + 1) * ((qn >> 1) + 1)
            if ctx.encode:
                if itheta <= (qn >> 1):
                    fs = itheta + 1
                    fl = itheta * (itheta + 1) >> 1
                else:
                    fs = qn + 1 - itheta
                    fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1)
                dec.encode(fl, fl + fs, ft)
            else:
                fm = dec.decode(ft)
                if fm < ((qn >> 1) * ((qn >> 1) + 1) >> 1):
                    itheta = (math.isqrt(8 * fm + 1) - 1) >> 1
                    fs = itheta + 1
                    fl = itheta * (itheta + 1) >> 1
                else:
                    itheta = (2 * (qn + 1)
                              - math.isqrt(8 * (ft - fm - 1) + 1)) >> 1
                    fs = qn + 1 - itheta
                    fl = ft - ((qn + 1 - itheta) * (qn + 2 - itheta) >> 1)
                dec.update(fl, fl + fs, ft)
        itheta = itheta * 16384 // qn
        if ctx.encode and stereo:
            if itheta == 0:
                _intensity_stereo(ctx.mode, X, Y, ctx.bandE, i, N)
            else:
                _stereo_split(X, Y, N)
    elif stereo:
        if ctx.encode:
            inv = 1 if (itheta > 8192 and not ctx.disable_inv) else 0
            if inv:
                Y[:N] = -Y[:N]
            _intensity_stereo(ctx.mode, X, Y, ctx.bandE, i, N)
        if b > 2 << BITRES and ctx.remaining_bits > 2 << BITRES:
            if ctx.encode:
                dec.enc_bit_logp(inv, 2)
            else:
                inv = dec.dec_bit_logp(2)
        else:
            inv = 0
        itheta = 0
    qalloc = dec.tell_frac() - tell
    b -= qalloc

    if itheta == 0:
        imid, iside = 32767, 0
        fill &= (1 << B) - 1
        delta = -16384
    elif itheta == 16384:
        imid, iside = 0, 32767
        fill &= ((1 << B) - 1) << B
        delta = 16384
    else:
        imid = bitexact_cos(itheta)
        iside = bitexact_cos(16384 - itheta)
        delta = _frac_mul16((N - 1) << 7, bitexact_log2tan(iside, imid))

    sctx.inv = inv
    sctx.imid = imid
    sctx.iside = iside
    sctx.delta = delta
    sctx.itheta = itheta
    sctx.qalloc = qalloc
    return sctx, b, fill


def quant_band_n1(ctx: BandCtx, X, Y, b, lowband_out):
    dec = ctx.dec
    stereo = Y is not None
    for x in ([X, Y] if stereo else [X]):
        sign = 0
        if ctx.remaining_bits >= 1 << BITRES:
            if ctx.encode:
                sign = 1 if x[0] < 0 else 0
                dec.enc_bits(sign, 1)
            else:
                sign = dec.dec_bits(1)
            ctx.remaining_bits -= 1 << BITRES
            b -= 1 << BITRES
        x[0] = -1.0 if sign else 1.0
    if lowband_out is not None:
        lowband_out[0] = X[0]
    return 1


def quant_partition(ctx: BandCtx, X, N, b, B, lowband, LM, gain, fill):
    mode = ctx.mode
    i = ctx.i
    dec = ctx.dec
    B0 = B
    cache = _band_cache(mode, i, LM)
    if LM != -1 and b > int(cache[int(cache[0])]) + 12 and N > 2:
        N >>= 1
        Y = X[N:]
        LM -= 1
        if B == 1:
            fill = (fill & 1) | (fill << 1)
        B = (B + 1) >> 1
        sctx, b, fill = compute_theta(ctx, X, Y, N, b, B, B0, LM, 0, fill)
        imid, iside = sctx.imid, sctx.iside
        delta, itheta, qalloc = sctx.delta, sctx.itheta, sctx.qalloc
        mid = imid / 32768.0
        side = iside / 32768.0
        if B0 > 1 and (itheta & 0x3FFF):
            if itheta > 8192:
                delta -= delta >> (4 - LM)
            else:
                delta = min(0, delta + (N << BITRES >> (5 - LM)))
        mbits = max(0, min(b, cdiv(b - delta, 2)))
        sbits = b - mbits
        ctx.remaining_bits -= qalloc
        next_lowband2 = lowband[N:] if lowband is not None else None
        rebalance = ctx.remaining_bits
        if mbits >= sbits:
            cm = quant_partition(
                ctx, X, N, mbits, B, lowband, LM, gain * mid, fill
            )
            rebalance = mbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 0:
                sbits += rebalance - (3 << BITRES)
            cm |= quant_partition(
                ctx, Y, N, sbits, B, next_lowband2, LM, gain * side,
                fill >> B,
            ) << (B0 >> 1)
        else:
            cm = quant_partition(
                ctx, Y, N, sbits, B, next_lowband2, LM, gain * side,
                fill >> B,
            ) << (B0 >> 1)
            rebalance = sbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 16384:
                mbits += rebalance - (3 << BITRES)
            cm |= quant_partition(
                ctx, X, N, mbits, B, lowband, LM, gain * mid, fill
            )
    else:
        q = bits2pulses(mode, i, LM, b)
        curr_bits = pulses2bits(mode, i, LM, q)
        ctx.remaining_bits -= curr_bits
        while ctx.remaining_bits < 0 and q > 0:
            ctx.remaining_bits += curr_bits
            q -= 1
            curr_bits = pulses2bits(mode, i, LM, q)
            ctx.remaining_bits -= curr_bits
        if q != 0:
            K = get_pulses(q)
            if ctx.encode:
                cm = alg_quant(X, N, K, ctx.spread, B, dec, gain)
            else:
                cm = alg_unquant(X, N, K, ctx.spread, B, dec, gain)
        else:
            cm_mask = (1 << B) - 1
            fill &= cm_mask
            if not fill:
                X[:N] = 0.0
                cm = 0
            else:
                if lowband is None:
                    for j in range(N):
                        ctx.seed = celt_lcg_rand(ctx.seed)
                        v = ctx.seed
                        X[j] = float(
                            np.int32(np.uint32(v)).item() >> 20
                        )
                    cm = cm_mask
                else:
                    for j in range(N):
                        ctx.seed = celt_lcg_rand(ctx.seed)
                        tmp = 1.0 / 256
                        tmp = tmp if (ctx.seed & 0x8000) else -tmp
                        X[j] = lowband[j] + tmp
                    cm = fill
                renormalise_vector(X, N, gain)
    return cm


def quant_band(
    ctx: BandCtx, X, N, b, B, lowband, LM, lowband_out, gain,
    lowband_scratch, fill,
):
    N0 = N
    N_B = N
    B0 = B
    time_divide = 0
    recombine = 0
    longBlocks = B0 == 1
    tf_change = ctx.tf_change

    N_B //= B

    if N == 1:
        return quant_band_n1(ctx, X, None, b, lowband_out)

    if tf_change > 0:
        recombine = tf_change
    if lowband_scratch is not None and lowband is not None and (
        recombine or ((N_B & 1) == 0 and tf_change < 0) or B0 > 1
    ):
        lowband_scratch[:N] = lowband[:N]
        lowband = lowband_scratch

    fill = int(fill)
    for k in range(recombine):
        if ctx.encode:
            _haar1(X, N >> k, 1 << k)
        if lowband is not None:
            _haar1(lowband, N >> k, 1 << k)
        fill = (
            BIT_INTERLEAVE_TABLE[fill & 0xF]
            | BIT_INTERLEAVE_TABLE[fill >> 4] << 2
        )
    B >>= recombine
    N_B <<= recombine

    while (N_B & 1) == 0 and tf_change < 0:
        if ctx.encode:
            _haar1(X, N_B, B)
        if lowband is not None:
            _haar1(lowband, N_B, B)
        fill |= fill << B
        B <<= 1
        N_B >>= 1
        time_divide += 1
        tf_change += 1
    B0 = B
    N_B0 = N_B

    if B0 > 1 and lowband is not None:
        _deinterleave_hadamard(
            lowband, N_B >> recombine, B0 << recombine, longBlocks
        )
    if B0 > 1 and ctx.encode:
        _deinterleave_hadamard(
            X, N_B >> recombine, B0 << recombine, longBlocks
        )

    cm = quant_partition(ctx, X, N, b, B, lowband, LM, gain, fill)

    # Resynthesis (decoder always resynthesizes; the encoder does too,
    # so the norm folding buffers match the decoder's).
    if B0 > 1:
        _interleave_hadamard(X, N_B >> recombine, B0 << recombine, longBlocks)
    N_B = N_B0
    B = B0
    for _ in range(time_divide):
        B >>= 1
        N_B <<= 1
        cm |= cm >> B
        _haar1(X, N_B, B)
    for k in range(recombine):
        cm = BIT_DEINTERLEAVE_TABLE[cm]
        _haar1(X, N0 >> k, 1 << k)
    B <<= recombine

    if lowband_out is not None:
        n = math.sqrt(N0)
        for j in range(N0):
            lowband_out[j] = n * X[j]
    cm &= (1 << B) - 1
    return cm


def quant_band_stereo(
    ctx: BandCtx, X, Y, N, b, B, lowband, LM, lowband_out,
    lowband_scratch, fill,
):
    dec = ctx.dec
    if N == 1:
        return quant_band_n1(ctx, X, Y, b, lowband_out)
    orig_fill = fill
    sctx, b, fill = compute_theta(ctx, X, Y, N, b, B, B, LM, 1, fill)
    inv = sctx.inv
    imid, iside = sctx.imid, sctx.iside
    delta, itheta, qalloc = sctx.delta, sctx.itheta, sctx.qalloc
    mid = imid / 32768.0
    side = iside / 32768.0

    if N == 2:
        mbits = b
        sbits = 0
        if itheta != 0 and itheta != 16384:
            sbits = 1 << BITRES
        mbits -= sbits
        c = 1 if itheta > 8192 else 0
        ctx.remaining_bits -= qalloc + sbits
        x2 = Y if c else X
        y2 = X if c else Y
        sign = 0
        if sbits:
            if ctx.encode:
                sign = 1 if (x2[0] * y2[1] - x2[1] * y2[0]) < 0 else 0
                dec.enc_bits(sign, 1)
            else:
                sign = dec.dec_bits(1)
        sign = 1 - 2 * sign
        cm = quant_band(
            ctx, x2, N, mbits, B, lowband, LM, lowband_out, 1.0,
            lowband_scratch, orig_fill,
        )
        y2[0] = -sign * x2[1]
        y2[1] = sign * x2[0]
        X[0] *= mid
        X[1] *= mid
        Y[0] *= side
        Y[1] *= side
        tmp = X[0]
        X[0] = tmp - Y[0]
        Y[0] = tmp + Y[0]
        tmp = X[1]
        X[1] = tmp - Y[1]
        Y[1] = tmp + Y[1]
    else:
        mbits = max(0, min(b, cdiv(b - delta, 2)))
        sbits = b - mbits
        ctx.remaining_bits -= qalloc
        rebalance = ctx.remaining_bits
        if mbits >= sbits:
            cm = quant_band(
                ctx, X, N, mbits, B, lowband, LM, lowband_out, 1.0,
                lowband_scratch, fill,
            )
            rebalance = mbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 0:
                sbits += rebalance - (3 << BITRES)
            cm |= quant_band(
                ctx, Y, N, sbits, B, None, LM, None, side, None, fill >> B
            )
        else:
            cm = quant_band(
                ctx, Y, N, sbits, B, None, LM, None, side, None, fill >> B
            )
            rebalance = sbits - (rebalance - ctx.remaining_bits)
            if rebalance > 3 << BITRES and itheta != 16384:
                mbits += rebalance - (3 << BITRES)
            cm |= quant_band(
                ctx, X, N, mbits, B, lowband, LM, lowband_out, 1.0,
                lowband_scratch, fill,
            )

    if N != 2:
        _stereo_merge(X, Y, mid, N)
    if inv:
        Y[:N] = -Y[:N]
    return cm


def _stereo_merge(X, Y, mid, N):
    xp = float(np.dot(Y[:N], X[:N]))
    side = float(np.dot(Y[:N], Y[:N]))
    xp *= mid
    mid2 = mid
    El = mid2 * mid2 + side - 2 * xp
    Er = mid2 * mid2 + side + 2 * xp
    if Er < 6e-4 or El < 6e-4:
        Y[:N] = X[:N]
        return
    lgain = 1.0 / math.sqrt(El)
    rgain = 1.0 / math.sqrt(Er)
    for j in range(N):
        l = mid * X[j]
        r = Y[j]
        X[j] = lgain * (l - r)
        Y[j] = rgain * (l + r)



def _quant_all_bands_native(mode, start, end, X_, Y_, collapse_masks, pulses,
                            shortBlocks, spread, dual_stereo, intensity,
                            tf_res, total_bits, balance, dec, LM,
                            codedBands, seed):
    """Dispatch decode to the native band loop (native/celt_bands.c), a C
    translation of the Python below. Returns the new seed, or None if the
    native library is unavailable (pure-Python fallback runs instead)."""
    import os

    if os.environ.get("LIBNYQUIST_NO_NATIVE_CELT"):
        return None
    from ...runtime import native

    L = native.lib()
    if L is None or not hasattr(L, "celt_bands_decode"):
        return None
    import ctypes

    M = 1 << LM
    C = 2 if Y_ is not None else 1
    N_full = M * int(mode.eBands[mode.nbEBands])
    X = np.zeros(C * N_full, np.float64)
    X[:N_full] = X_[:N_full]
    if C == 2:
        X[N_full:] = Y_[:N_full]
    masks = np.zeros(C * mode.nbEBands, np.uint8)
    masks[: len(collapse_masks)] = collapse_masks
    ec = np.array(
        [dec.offs, dec.end_offs, dec.end_window, dec.nend_bits,
         dec.nbits_total, dec.rng, dec.rem, dec.val, dec.ext, dec.error],
        np.int64,
    )
    mp = _mode_ptrs(mode)
    tf = np.ascontiguousarray(tf_res, np.int32)
    pl = np.ascontiguousarray(pulses, np.int32)
    new_seed = L.celt_bands_decode(
        dec.buf, dec.storage,
        ec.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        mp["eb_p"], mode.nbEBands,
        mp["ln_p"],
        mp["ci_p"], mp["cb"],
        int(start), int(end), int(shortBlocks), int(spread),
        int(dual_stereo), int(intensity),
        tf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        int(total_bits), int(balance),
        pl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), int(LM),
        int(codedBands), int(seed) & 0xFFFFFFFF, C,
        X.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        masks.ctypes.data_as(ctypes.c_char_p),
    )
    X_[:N_full] = X[:N_full]
    if C == 2:
        Y_[:N_full] = X[N_full:]
    for i in range(C * mode.nbEBands):
        collapse_masks[i] = int(masks[i])
    (dec.offs, dec.end_offs, dec.end_window, dec.nend_bits,
     dec.nbits_total, dec.rng, dec.rem, dec.val, dec.ext,
     dec.error) = ec.tolist()
    return int(new_seed) & 0xFFFFFFFF


def quant_all_bands(
    mode, start, end, X_, Y_, collapse_masks, pulses, shortBlocks, spread,
    dual_stereo, intensity, tf_res, total_bits, balance, dec, LM,
    codedBands, seed, encode=0, bandE=None,
):
    eBands = mode.eBands
    M = 1 << LM
    B = M if shortBlocks else 1
    C = 2 if Y_ is not None else 1
    norm_offset = M * int(eBands[start])
    norm_len = M * int(eBands[mode.nbEBands - 1]) - norm_offset
    norm = np.zeros(norm_len, dtype=np.float64)
    norm2 = np.zeros(norm_len, dtype=np.float64) if C == 2 else norm
    scratch = np.zeros(M * int(eBands[mode.nbEBands]), dtype=np.float64)

    if not encode:
        native_seed = _quant_all_bands_native(
            mode, start, end, X_, Y_, collapse_masks, pulses, shortBlocks,
            spread, dual_stereo, intensity, tf_res, total_bits, balance,
            dec, LM, codedBands, seed,
        )
        if native_seed is not None:
            return native_seed

    lowband_offset = 0
    update_lowband = True
    ctx = BandCtx(mode=mode, intensity=intensity, spread=spread, dec=dec,
                  seed=seed, encode=encode, bandE=bandE)

    for i in range(start, end):
        ctx.i = i
        last = i == end - 1
        X = X_[M * int(eBands[i]):]
        Y = Y_[M * int(eBands[i]):] if Y_ is not None else None
        N = M * int(eBands[i + 1]) - M * int(eBands[i])
        tell = dec.tell_frac()

        if i != start:
            balance -= tell
        remaining_bits = total_bits - tell - 1
        ctx.remaining_bits = remaining_bits
        if i <= codedBands - 1:
            curr_balance = cdiv(balance, min(3, codedBands - i))
            b = max(0, min(16383, min(remaining_bits + 1,
                                      pulses[i] + curr_balance)))
        else:
            b = 0

        if (M * int(eBands[i]) - N >= M * int(eBands[start])
                and (update_lowband or lowband_offset == 0)):
            lowband_offset = i

        tf_change = tf_res[i]
        ctx.tf_change = tf_change
        lowband_scratch = scratch
        if i == end - 1:
            lowband_scratch = None

        effective_lowband = -1
        if lowband_offset != 0 and (
            spread != SPREAD_AGGRESSIVE or B > 1 or tf_change < 0
        ):
            effective_lowband = max(
                0, M * int(eBands[lowband_offset]) - norm_offset - N
            )
            fold_start = lowband_offset
            while M * int(eBands[fold_start - 1]) > (
                effective_lowband + norm_offset
            ):
                fold_start -= 1
            fold_start -= 1
            fold_end = lowband_offset - 1
            while True:
                fold_end += 1
                if M * int(eBands[fold_end]) >= (
                    effective_lowband + norm_offset + N
                ):
                    break
            x_cm = y_cm = 0
            for fold_i in range(fold_start, fold_end):
                x_cm |= collapse_masks[fold_i * C + 0]
                y_cm |= collapse_masks[fold_i * C + C - 1]
        else:
            x_cm = y_cm = (1 << B) - 1

        if dual_stereo and i == intensity:
            dual_stereo = 0
            for j in range(M * int(eBands[i]) - norm_offset):
                norm[j] = 0.5 * (norm[j] + norm2[j])

        if dual_stereo:
            x_cm = quant_band(
                ctx, X, N, b // 2, B,
                norm[effective_lowband:] if effective_lowband != -1 else None,
                LM,
                None if last else norm[M * int(eBands[i]) - norm_offset:],
                1.0, lowband_scratch, x_cm,
            )
            y_cm = quant_band(
                ctx, Y, N, b // 2, B,
                norm2[effective_lowband:] if effective_lowband != -1 else None,
                LM,
                None if last else norm2[M * int(eBands[i]) - norm_offset:],
                1.0, lowband_scratch, y_cm,
            )
        else:
            if Y is not None:
                x_cm = quant_band_stereo(
                    ctx, X, Y, N, b, B,
                    norm[effective_lowband:]
                    if effective_lowband != -1 else None,
                    LM,
                    None if last else norm[M * int(eBands[i]) - norm_offset:],
                    lowband_scratch, x_cm | y_cm,
                )
            else:
                x_cm = quant_band(
                    ctx, X, N, b, B,
                    norm[effective_lowband:]
                    if effective_lowband != -1 else None,
                    LM,
                    None if last else norm[M * int(eBands[i]) - norm_offset:],
                    1.0, lowband_scratch, x_cm | y_cm,
                )
            y_cm = x_cm
        collapse_masks[i * C + 0] = x_cm & 0xFF
        collapse_masks[i * C + C - 1] = y_cm & 0xFF
        balance += pulses[i] + tell
        update_lowband = b > (N << BITRES)

    return ctx.seed


# --------------------------------------------------------------------------
# anti-collapse + denormalise (reference: bands.c:258-351, 192-256)
# --------------------------------------------------------------------------
def anti_collapse(
    mode, X_, collapse_masks, LM, C, size, start, end, logE, prev1logE,
    prev2logE, pulses, seed,
):
    for i in range(start, end):
        N0 = int(mode.eBands[i + 1] - mode.eBands[i])
        depth = (1 + pulses[i]) // (N0 << LM)
        thresh = 0.5 * math.pow(2.0, -0.125 * depth)
        sqrt_1 = 1.0 / math.sqrt(N0 << LM)
        for c in range(C):
            prev1 = prev1logE[c * mode.nbEBands + i]
            prev2 = prev2logE[c * mode.nbEBands + i]
            if C == 1:
                prev1 = max(prev1, prev1logE[mode.nbEBands + i])
                prev2 = max(prev2, prev2logE[mode.nbEBands + i])
            Ediff = max(0.0, logE[c * mode.nbEBands + i] - min(prev1, prev2))
            r = 2.0 * math.pow(2.0, -Ediff)
            if LM == 3:
                r *= 1.41421356
            r = min(thresh, r)
            r = r * sqrt_1
            X = X_[c * size + (int(mode.eBands[i]) << LM):]
            renormalize = False
            for k in range(1 << LM):
                if not (collapse_masks[i * C + c] & (1 << k)):
                    for j in range(N0):
                        seed = celt_lcg_rand(seed)
                        X[(j << LM) + k] = r if (seed & 0x8000) else -r
                    renormalize = True
            if renormalize:
                renormalise_vector(X, N0 << LM, 1.0)
    return seed


def denormalise_bands(mode, X, freq, bandLogE_row, start, end, M):
    """One channel: X [N] unit bands -> freq [N] scaled spectra
    (vectorized: per-band gains expanded with np.repeat)."""
    N = M * mode.shortMdctSize
    eb = np.asarray(mode.eBands[start : end + 1], np.int64) * M
    lg = (np.asarray(bandLogE_row[start:end], np.float64)
          + np.asarray(mode.eMeans[start:end], np.float64))
    g = np.exp(0.6931471805599453094 * lg)
    freq[: eb[0]] = 0.0
    freq[eb[0] : eb[-1]] = X[eb[0] : eb[-1]] * np.repeat(g, np.diff(eb))
    freq[eb[-1] : N] = 0.0


# --------------------------------------------------------------------------
# Decoder state + frame decode
# --------------------------------------------------------------------------
@dataclass
class CeltDecoderState:
    channels: int
    stream_channels: int = 0
    start: int = 0
    end: int = 0
    downsample: int = 1
    rng: int = 0
    # energy memories [2, nbEBands]
    oldEBands: np.ndarray = None
    oldLogE: np.ndarray = None
    oldLogE2: np.ndarray = None
    backgroundLogE: np.ndarray = None
    # postfilter
    postfilter_period: int = 0
    postfilter_gain: float = 0.0
    postfilter_tapset: int = 0
    postfilter_period_old: int = 0
    postfilter_gain_old: float = 0.0
    postfilter_tapset_old: int = 0
    preemph_memD: np.ndarray = None
    # decode history per channel (DECODE_BUFFER_SIZE + overlap)
    decode_mem: np.ndarray = None
    # pitch-PLC carry (celt_decoder.c: last_pitch_index + lpc block)
    last_pitch_index: int = 0
    plc_lpc: np.ndarray = None

    def __post_init__(self):
        mode = mode48000()
        nb = mode.nbEBands
        if self.stream_channels == 0:
            self.stream_channels = self.channels
        self.end = mode.effEBands
        self.oldEBands = np.zeros((2, nb))
        self.oldLogE = np.full(2 * nb, -28.0)
        self.oldLogE2 = np.full(2 * nb, -28.0)
        self.backgroundLogE = np.zeros(2 * nb)
        self.preemph_memD = np.zeros(2)
        self.decode_mem = np.zeros(
            (self.channels, DECODE_BUFFER_SIZE + mode.overlap)
        )


# --- PLC pitch analysis helpers (float semantics of upstream
# celt/pitch.c and celt/celt_lpc.c; used only on packet loss) ---------

PLC_PITCH_LAG_MAX = 720           # celt_decoder.c:346
PLC_PITCH_LAG_MIN = 100           # celt_decoder.c:349
LPC_ORDER = 24
MAX_PERIOD = 1024


def _plc_autocorr(x: np.ndarray, window, overlap: int,
                  lag: int) -> np.ndarray:
    """_celt_autocorr (celt_lpc.c): edge-windowed autocorrelation."""
    xx = x.astype(np.float64, copy=True)
    n = len(xx)
    if overlap:
        xx[:overlap] *= window[:overlap]
        xx[n - overlap:] *= window[:overlap][::-1]
    return np.array([np.dot(xx[k:], xx[: n - k]) for k in range(lag + 1)])


def _plc_lpc(ac: np.ndarray, p: int) -> np.ndarray:
    """_celt_lpc (celt_lpc.c): Levinson-Durbin with 30 dB early exit."""
    lpc = np.zeros(p)
    error = ac[0]
    if ac[0] != 0:
        for i in range(p):
            rr = float(np.dot(lpc[:i], ac[i:0:-1])) + ac[i + 1]
            r = -rr / error
            lpc[i] = r
            jj = np.arange((i + 1) >> 1)
            tmp1 = lpc[jj].copy()
            tmp2 = lpc[i - 1 - jj].copy()
            lpc[jj] = tmp1 + r * tmp2
            lpc[i - 1 - jj] = tmp2 + r * tmp1
            error -= r * r * error
            if error < 0.001 * ac[0]:
                break
    return lpc


def _plc_fir(x: np.ndarray, num: np.ndarray, mem: np.ndarray) -> np.ndarray:
    """celt_fir (celt_lpc.c): y[i] = x[i] + sum_j num[j]*x[i-1-j]."""
    full = np.concatenate([mem[::-1], x])
    ord_ = len(num)
    conv = np.convolve(full, num)
    return x + conv[ord_ - 1 : ord_ - 1 + len(x)]


def _plc_iir(x: np.ndarray, den: np.ndarray, mem: np.ndarray) -> np.ndarray:
    """celt_iir (celt_lpc.c): y[i] = x[i] - sum_j den[j]*y[i-1-j]."""
    ord_ = len(den)
    y = np.empty(len(x) + ord_)
    y[:ord_] = mem[::-1]
    rden = den[::-1]
    for i in range(len(x)):
        y[ord_ + i] = x[i] - np.dot(rden, y[i : i + ord_])
    return y[ord_:]


def _plc_pitch_downsample(chans: np.ndarray) -> np.ndarray:
    """pitch_downsample (pitch.c:147): 2x low-pass decimation summed
    over channels, then 4th-order LPC whitening via a 5-tap FIR."""
    n = chans.shape[1]
    lp = np.zeros(n >> 1)
    for x in chans:
        lp[1:] += 0.25 * (x[1 : n - 1 : 2] + x[3:n:2]) + 0.5 * x[2:n:2]
        lp[0] += 0.25 * x[1] + 0.5 * x[0]
    ac = _plc_autocorr(lp, None, 0, 4)
    ac[0] *= 1.0001
    for i in range(1, 5):
        ac[i] -= ac[i] * (0.008 * i) * (0.008 * i)
    lpc = _plc_lpc(ac, 4)
    tmp = 1.0
    for i in range(4):
        tmp *= 0.9
        lpc[i] *= tmp
    c1 = 0.8
    lpc2 = np.array([lpc[0] + 0.8, lpc[1] + c1 * lpc[0],
                     lpc[2] + c1 * lpc[1], lpc[3] + c1 * lpc[2],
                     c1 * lpc[3]])
    return _plc_fir(lp, lpc2, np.zeros(5))


def _plc_find_best_pitch(xcorr, y, len_, max_pitch):
    """find_best_pitch (pitch.c:45), float normalization."""
    best_num = [-1.0, -1.0]
    best_den = [0.0, 0.0]
    best_pitch = [0, 1]
    Syy = 1.0 + float(np.dot(y[:len_], y[:len_]))
    for i in range(max_pitch):
        if xcorr[i] > 0:
            x16 = xcorr[i] * 1e-12
            num = x16 * x16
            if num * best_den[1] > best_num[1] * Syy:
                if num * best_den[0] > best_num[0] * Syy:
                    best_num[1], best_den[1] = best_num[0], best_den[0]
                    best_pitch[1] = best_pitch[0]
                    best_num[0], best_den[0] = num, Syy
                    best_pitch[0] = i
                else:
                    best_num[1], best_den[1] = num, Syy
                    best_pitch[1] = i
        Syy += y[i + len_] * y[i + len_] - y[i] * y[i]
        Syy = max(1.0, Syy)
    return best_pitch


def _plc_pitch_search(x_lp: np.ndarray, y: np.ndarray, len_: int,
                      max_pitch: int) -> int:
    """pitch_search (pitch.c:296): 4x coarse, 2x refine, pseudo-interp."""
    lag = len_ + max_pitch
    x4 = x_lp[: (len_ >> 1) : 2][: len_ >> 2]
    y4 = y[: (lag >> 1) : 2][: lag >> 2]
    # coarse: xcorr[i] = sum_j x4[j] * y4[i+j]
    xc = np.correlate(y4, x4, "full")[len(x4) - 1 :][: max_pitch >> 2]
    best = _plc_find_best_pitch(xc, y4, len_ >> 2, max_pitch >> 2)
    xcorr = np.zeros(max_pitch >> 1)
    for i in range(max_pitch >> 1):
        if abs(i - 2 * best[0]) > 2 and abs(i - 2 * best[1]) > 2:
            continue
        xcorr[i] = max(-1.0, float(
            np.dot(x_lp[: len_ >> 1], y[i : i + (len_ >> 1)])))
    best = _plc_find_best_pitch(xcorr, y, len_ >> 1, max_pitch >> 1)
    offset = 0
    b0 = best[0]
    if 0 < b0 < (max_pitch >> 1) - 1:
        a, b, c = xcorr[b0 - 1], xcorr[b0], xcorr[b0 + 1]
        if (c - a) > 0.7 * (b - a):
            offset = 1
        elif (a - c) > 0.7 * (b - c):
            offset = -1
    return 2 * b0 - offset


def celt_decode_lost(st: CeltDecoderState, frame_size: int,
                     loss_count: int) -> "np.ndarray":
    """Packet-loss concealment (reference: celt_decoder_clean.c has PLC
    stripped; upstream celt_decoder.c:351 celt_decode_lost).

    Noise branch (loss_count >= 5 or start != 0): band shapes are
    refreshed with pseudo-random unit-norm noise scaled by the last
    band energies, decayed toward the tracked background floor, then
    synthesized through the normal IMDCT/overlap path.

    Pitch branch (otherwise): LPC analysis over the decode history,
    periodic extrapolation of the excitation at the detected pitch with
    energy-decay tracking, re-synthesis through 1/A(z), an energy
    explosion clamp, and a simulated TDAC fold so the splice into the
    next real frame stays clickless (celt_decoder.c:465-678)."""
    if loss_count < 5 and st.start == 0:
        return _celt_decode_lost_pitch(st, frame_size, loss_count)
    mode = mode48000()
    LM = -1
    for lm in range(mode.maxLM + 1):
        if mode.shortMdctSize << lm == frame_size:
            LM = lm
            break
    if LM < 0:
        raise ValueError(f"bad frame size {frame_size}")
    M = 1 << LM
    N = M * mode.shortMdctSize
    CC = st.channels
    eBands = mode.eBands
    effEnd = min(st.end, mode.effEBands)

    # energy decay toward the background floor (celt_decoder.c:447-456)
    decay = 1.5 if loss_count == 0 else 0.5
    bg = st.backgroundLogE.reshape(2, -1)
    for c in range(2):
        st.oldEBands[c, st.start:st.end] = np.maximum(
            bg[c, st.start:st.end],
            st.oldEBands[c, st.start:st.end] - decay,
        )

    seed = st.rng
    freq = np.zeros((CC, N))
    X = np.zeros(N)
    for c in range(CC):
        for i in range(st.start, effEnd):
            lo, hi = M * int(eBands[i]), M * int(eBands[i + 1])
            blen = hi - lo
            vals = np.empty(blen)
            for j in range(blen):
                seed = celt_lcg_rand(seed)
                s32 = seed - 0x100000000 if seed >= 0x80000000 else seed
                vals[j] = float(s32 >> 20)
            nrm = np.sqrt(np.sum(vals * vals))
            X[lo:hi] = vals / nrm if nrm > 0 else 0.0
        denormalise_bands(mode, X, freq[c], st.oldEBands[c],
                          st.start, effEnd, M)
    st.rng = seed

    info = dict(
        N=N, CC=CC, LM=LM, shortBlocks=0, freq=freq,
        postfilter_pitch=st.postfilter_period,
        postfilter_gain=st.postfilter_gain,
        postfilter_tapset=st.postfilter_tapset,
    )
    return celt_synthesize_host(st, info)


def _celt_decode_lost_pitch(st: CeltDecoderState, frame_size: int,
                            loss_count: int) -> "np.ndarray":
    """Pitch-based PLC (upstream celt_decoder.c:465-678): see
    celt_decode_lost."""
    mode = mode48000()
    N = frame_size
    CC = st.channels
    overlap = mode.overlap
    window = mode.window
    DB = DECODE_BUFFER_SIZE

    if loss_count == 0:
        lp = _plc_pitch_downsample(st.decode_mem[:, :DB])
        pitch = _plc_pitch_search(
            lp[PLC_PITCH_LAG_MAX >> 1 :], lp, DB - PLC_PITCH_LAG_MAX,
            PLC_PITCH_LAG_MAX - PLC_PITCH_LAG_MIN,
        )
        pitch_index = PLC_PITCH_LAG_MAX - pitch
        st.last_pitch_index = pitch_index
        fade = 1.0
    else:
        pitch_index = st.last_pitch_index
        fade = 0.8
    pitch_index = max(1, pitch_index)

    if st.plc_lpc is None:
        st.plc_lpc = np.zeros((CC, LPC_ORDER))
    for c in range(CC):
        buf = st.decode_mem[c]
        exc = buf[DB - MAX_PERIOD : DB].copy()

        if loss_count == 0:
            ac = _plc_autocorr(exc, window, overlap, LPC_ORDER)
            ac[0] *= 1.0001                       # -40 dB noise floor
            for i in range(1, LPC_ORDER + 1):
                ac[i] -= ac[i] * (0.008 * i) * (0.008 * i)  # lag window
            st.plc_lpc[c] = _plc_lpc(ac, LPC_ORDER)
        lpc = st.plc_lpc[c]

        exc_length = min(2 * pitch_index, MAX_PERIOD)
        lpc_mem = buf[DB - exc_length - 1 - np.arange(LPC_ORDER)].copy()
        exc[MAX_PERIOD - exc_length :] = _plc_fir(
            exc[MAX_PERIOD - exc_length :], lpc, lpc_mem)

        # Decay estimate over the last two half-periods of excitation.
        dl = exc_length >> 1
        e_new = exc[MAX_PERIOD - dl :]
        e_old = exc[MAX_PERIOD - 2 * dl : MAX_PERIOD - dl]
        E1 = 1.0 + float(np.dot(e_new, e_new))
        E2 = 1.0 + float(np.dot(e_old, e_old))
        E1 = min(E1, E2)
        decay = math.sqrt(E1 / E2)  # float build: SHR32 is a no-op

        # Slide history left one frame (OPUS_MOVE, celt_decoder.c:580).
        buf[: DB - N] = buf[N:DB]

        # Periodic extrapolation with per-period decay.
        eoff = MAX_PERIOD - pitch_index
        elen = N + overlap
        idx = np.arange(elen)
        j = idx % pitch_index
        att = fade * decay ** (1.0 + idx // pitch_index)
        buf[DB - N : DB - N + elen] = att * exc[eoff + j]
        src = buf[DB - MAX_PERIOD - N + eoff + j]
        S1 = float(np.dot(src, src))

        # Re-synthesize through 1/A(z) for signal-domain continuity.
        lpc_mem2 = buf[DB - N - 1 - np.arange(LPC_ORDER)].copy()
        seg = _plc_iir(buf[DB - N : DB - N + elen], lpc, lpc_mem2)
        buf[DB - N : DB - N + elen] = seg

        # Energy explosion clamp (celt_decoder.c:630-659).
        S2 = float(np.dot(seg, seg))
        if not (S1 > 0.2 * S2):
            buf[DB - N : DB - N + elen] = 0.0
        elif S1 < S2:
            ratio = math.sqrt((S1 + 1.0) / (S2 + 1.0))
            g = 1.0 - window * (1.0 - ratio)
            buf[DB - N : DB - N + overlap] *= g
            buf[DB - N + overlap : DB - N + elen] *= ratio

        # Pre-filter the overlap so the decoder's post-filter re-apply
        # on the next real frame cancels (celt_decoder.c:663-668).
        T = max(st.postfilter_period, COMBFILTER_MINPERIOD)
        g0 = st.postfilter_gain
        hist = T + 2
        scratch = buf[DB - hist : DB + overlap].copy()
        if g0 != 0.0:
            comb_filter(scratch, scratch, hist, T, T, overlap,
                        -g0, -g0, st.postfilter_tapset,
                        st.postfilter_tapset, window, 0)
        etmp = scratch[hist : hist + overlap]

        # Simulated TDAC fold over the first half of the overlap.
        half = overlap // 2
        i = np.arange(half)
        buf[DB : DB + half] = (window[i] * etmp[overlap - 1 - i]
                               + window[overlap - 1 - i] * etmp[i])

    # Deemphasis of the concealed frame (same tail as the decode path).
    coef0 = mode.preemph[0]
    L, powers = _deemph_toeplitz(coef0, N)
    pcm = np.zeros((N, CC))
    for c in range(CC):
        m = st.preemph_memD[c]
        y = L @ (st.decode_mem[c, DB - N : DB] + VERY_SMALL) + powers * m
        st.preemph_memD[c] = coef0 * y[N - 1]
        pcm[:, c] = y * (1.0 / CELT_SIG_SCALE)
    return pcm


def celt_decode_frame(
    st: CeltDecoderState, data: bytes, frame_size: int,
    dec: RangeDecoder = None, accum_pcm=None,
):
    """Decode one CELT frame into time-domain float PCM [-1,1].

    Mirrors celt_decode_with_ec (reference: celt_decoder_clean.c:353-724):
    full host-side synthesis (NumPy IMDCT) used as the correctness oracle;
    the production path extracts the denormalised spectra for batched TPU
    synthesis instead (see decode_frame_to_freq).

    Returns pcm [frame_size, CC] float64.
    """
    freq_info = celt_decode_frame_to_freq(st, data, frame_size, dec)
    return celt_synthesize_host(st, freq_info)


def celt_decode_frame_to_freq(
    st: CeltDecoderState, data: bytes, frame_size: int,
    dec: RangeDecoder = None,
):
    """Entropy-decode one frame to denormalised spectra + synthesis params.

    This is the host/TPU boundary: everything after this call is dense,
    batched math (IMDCT, overlap-add, comb filter, deemphasis).
    """
    mode = mode48000()
    nbEBands = mode.nbEBands
    eBands = mode.eBands
    overlap = mode.overlap
    CC = st.channels
    C = st.stream_channels

    LM = -1
    for lm in range(mode.maxLM + 1):
        if mode.shortMdctSize << lm == frame_size:
            LM = lm
            break
    if LM < 0:
        raise ValueError(f"bad frame size {frame_size}")
    M = 1 << LM
    N = M * mode.shortMdctSize

    if dec is None:
        dec = RangeDecoder(data)
    length = len(data)

    effEnd = min(st.end, mode.effEBands)
    oldBandE = st.oldEBands

    if C == 1:
        oldBandE[0, :] = np.maximum(oldBandE[0, :], oldBandE[1, :])

    total_bits = length * 8
    tell = dec.tell()
    if tell >= total_bits:
        silence = 1
    elif tell == 1:
        silence = dec.dec_bit_logp(15)
    else:
        silence = 0
    if silence:
        tell = length * 8
        dec.nbits_total += tell - dec.tell()

    postfilter_gain = 0.0
    postfilter_pitch = 0
    postfilter_tapset = 0
    if st.start == 0 and tell + 16 <= total_bits:
        if dec.dec_bit_logp(1):
            octave = dec.dec_uint(6)
            postfilter_pitch = (16 << octave) + dec.dec_bits(4 + octave) - 1
            qg = dec.dec_bits(3)
            if dec.tell() + 2 <= total_bits:
                postfilter_tapset = dec.dec_icdf(TAPSET_ICDF, 2)
            postfilter_gain = 0.09375 * (qg + 1)
        tell = dec.tell()

    if LM > 0 and tell + 3 <= total_bits:
        isTransient = dec.dec_bit_logp(3)
        tell = dec.tell()
    else:
        isTransient = 0
    shortBlocks = M if isTransient else 0

    intra_ener = dec.dec_bit_logp(3) if tell + 3 <= total_bits else 0
    unquant_coarse_energy(
        mode, st.start, st.end, oldBandE, intra_ener, dec, C, LM
    )

    tf_res = [0] * nbEBands
    tf_decode(st.start, st.end, isTransient, tf_res, LM, dec)

    tell = dec.tell()
    spread_decision = SPREAD_NORMAL
    if tell + 4 <= total_bits:
        spread_decision = dec.dec_icdf(SPREAD_ICDF, 5)

    cap = init_caps(mode, LM, C)
    offsets = [0] * nbEBands
    total_bits <<= BITRES
    L = _native_celt()
    if (L is not None and isinstance(dec.buf, bytes)
            and hasattr(L, "celt_dynalloc")):
        i64p, i32p, _ = _ec_ptrs()
        ec = _ec_pack(dec)
        capa = _caps_np(cap)
        offa = np.zeros(nbEBands, np.int32)
        trim = np.zeros(1, np.int32)
        total_bits = int(L.celt_dynalloc(
            dec.buf, dec.storage, ec.ctypes.data_as(i64p),
            _mode_ptrs(mode)["eb_p"], st.start, st.end, int(C), int(LM),
            capa.ctypes.data_as(i32p), int(total_bits),
            offa.ctypes.data_as(i32p), trim.ctypes.data_as(i32p),
        ))
        offsets = [int(v) for v in offa]
        alloc_trim = int(trim[0])
        _ec_unpack(dec, ec)
    else:
        dynalloc_logp = 6
        tell = dec.tell_frac()
        for i in range(st.start, st.end):
            width = C * (int(eBands[i + 1]) - int(eBands[i])) << LM
            quanta = min(width << BITRES, max(6 << BITRES, width))
            dynalloc_loop_logp = dynalloc_logp
            boost = 0
            while (
                tell + (dynalloc_loop_logp << BITRES) < total_bits
                and boost < cap[i]
            ):
                flag = dec.dec_bit_logp(dynalloc_loop_logp)
                tell = dec.tell_frac()
                if not flag:
                    break
                boost += quanta
                total_bits -= quanta
                dynalloc_loop_logp = 1
            offsets[i] = boost
            if boost > 0:
                dynalloc_logp = max(2, dynalloc_logp - 1)

        alloc_trim = (
            dec.dec_icdf(TRIM_ICDF, 7)
            if tell + (6 << BITRES) <= total_bits
            else 5
        )

    bits = (length * 8 << BITRES) - dec.tell_frac() - 1
    anti_collapse_rsv = (
        (1 << BITRES)
        if (isTransient and LM >= 2 and bits >= ((LM + 2) << BITRES))
        else 0
    )
    bits -= anti_collapse_rsv

    (codedBands, balance, pulses, fine_quant, fine_priority,
     intensity, dual_stereo) = compute_allocation(
        mode, st.start, st.end, offsets, cap, alloc_trim, bits, C, LM, dec
    )

    unquant_fine_energy(
        mode, st.start, st.end, oldBandE, fine_quant, dec, C
    )

    collapse_masks = [0] * (C * nbEBands)
    X = np.zeros(C * N, dtype=np.float64)
    Xv = X[:N]
    Yv = X[N:] if C == 2 else None
    st.rng = quant_all_bands(
        mode, st.start, st.end, Xv, Yv, collapse_masks, pulses,
        shortBlocks, spread_decision, dual_stereo, intensity, tf_res,
        length * (8 << BITRES) - anti_collapse_rsv, balance, dec, LM,
        codedBands, st.rng,
    )

    anti_collapse_on = 0
    if anti_collapse_rsv > 0:
        anti_collapse_on = dec.dec_bits(1)

    unquant_energy_finalise(
        mode, st.start, st.end, oldBandE, fine_quant, fine_priority,
        length * 8 - dec.tell(), dec, C,
    )

    if anti_collapse_on:
        st.rng = anti_collapse(
            mode, X, collapse_masks, LM, C, N, st.start, st.end,
            oldBandE.reshape(-1), st.oldLogE, st.oldLogE2, pulses, st.rng,
        )

    freq = np.zeros((max(CC, C), N), dtype=np.float64)
    if silence:
        oldBandE[:, :] = -28.0
    else:
        for c in range(C):
            denormalise_bands(
                mode, X[c * N:(c + 1) * N], freq[c], oldBandE[c],
                st.start, effEnd, M,
            )

    for c in range(C):
        bound = M * int(eBands[effEnd])
        if st.downsample != 1:
            bound = min(bound, N // st.downsample)
        freq[c, bound:] = 0.0

    if CC == 2 and C == 1:
        freq[1, :] = freq[0, :]
    if CC == 1 and C == 2:
        freq[0, :] = 0.5 * (freq[0, :] + freq[1, :])

    # Energy-memory rollover (reference: celt_decoder_clean.c:685-720)
    if C == 1:
        oldBandE[1, :] = oldBandE[0, :]
    flatE = oldBandE.reshape(-1)
    if not isTransient:
        st.oldLogE2[:] = st.oldLogE
        st.oldLogE[:] = flatE
        st.backgroundLogE[:] = np.minimum(
            st.backgroundLogE + M * 0.001, flatE
        )
    else:
        st.oldLogE[:] = np.minimum(st.oldLogE, flatE)
    for c in range(2):
        flatE_c = oldBandE[c]
        flatE_c[: st.start] = 0.0
        flatE_c[st.end:] = 0.0
        st.oldLogE[c * nbEBands: c * nbEBands + st.start] = -28.0
        st.oldLogE2[c * nbEBands: c * nbEBands + st.start] = -28.0
        st.oldLogE[c * nbEBands + st.end: (c + 1) * nbEBands] = -28.0
        st.oldLogE2[c * nbEBands + st.end: (c + 1) * nbEBands] = -28.0
    st.rng = dec.rng

    return {
        "freq": freq,
        "N": N,
        "LM": LM,
        "C": C,
        "CC": CC,
        "shortBlocks": shortBlocks,
        "postfilter_pitch": postfilter_pitch,
        "postfilter_gain": postfilter_gain,
        "postfilter_tapset": postfilter_tapset,
        "silence": silence,
    }


def celt_decode_stream_native(
    st: CeltDecoderState, frames, frame_sizes, ends, stream_chs,
):
    """Whole-stream entropy decode: ONE native call for every frame
    (native/celt_bands.c celt_decode_stream, mirroring the per-frame
    orchestration of celt_decode_frame_to_freq /
    celt_decoder_clean.c:353-724).  Returns the list of info dicts, or
    None when the native library is unavailable (callers fall back to
    the per-frame Python path).
    """
    raw = celt_decode_stream_raw(st, frames, frame_sizes, ends, stream_chs)
    if raw is None:
        return None
    return _raw_to_infos(st, raw)


def _raw_to_infos(st: CeltDecoderState, raw):
    """Wrap the array-form stream decode into per-frame info dicts (the
    synthesize_stream* input format)."""
    freq, fsz, cha, sb, pfp, pfg, pft, sil = raw
    mode = mode48000()
    CC = st.channels
    infos = []
    for i in range(len(fsz)):
        N = int(fsz[i])
        C = int(cha[i])
        LM = (N // mode.shortMdctSize).bit_length() - 1
        infos.append({
            "freq": freq[i, : max(CC, C), :N],
            "N": N,
            "LM": LM,
            "C": C,
            "CC": CC,
            "shortBlocks": int(sb[i]),
            "postfilter_pitch": int(pfp[i]),
            "postfilter_gain": float(pfg[i]),
            "postfilter_tapset": int(pft[i]),
            "silence": int(sil[i]),
        })
    return infos


def celt_scan_ogg_native(data: bytes):
    """Native one-pass Ogg demux + Opus TOC split (native/ogg_opus.c):
    returns (payload, offs, lens, fsz, ends, chs, info) numpy arrays for
    the first CELT-only Opus stream, or None when the native library is
    unavailable or the stream needs the general Python path (SILK/hybrid
    packets, multistream mapping, no Opus stream).

    info: [channels, preskip, input_rate, gain_q8, mapping_family,
    serial, n_packets, last_granule_lo31]."""
    L = _native_celt()
    if L is None or not hasattr(L, "ogg_opus_celt_scan"):
        return None
    import ctypes

    i64p, i32p, _ = _ec_ptrs()
    n = len(data)
    payload = np.empty(n, np.uint8)
    # worst case: one frame per ~2 payload bytes is far below n/2 for
    # real streams; 1 + n // 8 frames covers 20 ms frames of >= 8 bytes
    # with big margin, and the scan errors out (-2) rather than overruns.
    cap = 4096 + n // 4
    offs = np.empty(cap, np.int64)
    lens = np.empty(cap, np.int64)
    fsz = np.empty(cap, np.int32)
    ends = np.empty(cap, np.int32)
    chs = np.empty(cap, np.int32)
    info = np.zeros(8, np.int32)
    rc = L.ogg_opus_celt_scan(
        data, n,
        payload.ctypes.data_as(ctypes.c_char_p), n,
        offs.ctypes.data_as(i64p), lens.ctypes.data_as(i64p),
        fsz.ctypes.data_as(i32p), ends.ctypes.data_as(i32p),
        chs.ctypes.data_as(i32p), cap, info.ctypes.data_as(i32p),
    )
    if rc < 0:
        if rc in (-1, -4):
            return None  # not a plain CELT Opus stream: general path
        raise ValueError(f"ogg_opus_celt_scan failed: {rc}")
    k = int(rc)
    return (payload, offs[:k], lens[:k], fsz[:k], ends[:k], chs[:k], info)


def celt_decode_ogg_raw(st: CeltDecoderState, data: bytes):
    """Whole-file fast path: native Ogg scan + native whole-stream CELT
    decode, no per-packet Python.  Returns the celt_decode_stream_raw
    tuple plus the scan info array, or None (caller falls back)."""
    scan = celt_scan_ogg_native(data)
    if scan is None:
        return None
    payload, offs, lens, fsz, ends, chs, info = scan
    if st.channels != int(info[0]):
        raise ValueError("decoder channels != OpusHead channels")
    import ctypes

    pay_p = payload.ctypes.data_as(ctypes.c_char_p)
    out = _celt_decode_stream_arrays(st, pay_p, offs, lens, fsz, ends, chs)
    del pay_p  # payload kept alive by this frame for the call's duration
    if out is None:
        return None
    return out + (info,)


def _celt_decode_stream_arrays(
    st: CeltDecoderState, payload, offs, lens, fsz, enda, cha,
):
    """Array-form core of celt_decode_stream_raw (no Python frame list)."""
    L = _native_celt()
    if L is None or not hasattr(L, "celt_decode_stream"):
        return None
    import ctypes

    mode = mode48000()
    nb = mode.nbEBands
    n = len(offs)
    if n == 0:
        return []
    fsz = np.ascontiguousarray(fsz, np.int32)
    enda = np.ascontiguousarray(enda, np.int32)
    cha = np.ascontiguousarray(cha, np.int32)
    offs = np.ascontiguousarray(offs, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    CC = st.channels
    CCout = max(CC, int(cha.max()))
    nmax = int(fsz.max())
    freq = np.zeros((n, CCout, nmax), np.float32)
    sb = np.zeros(n, np.int32)
    pfp = np.zeros(n, np.int32)
    pfg = np.zeros(n, np.float64)
    pft = np.zeros(n, np.int32)
    sil = np.zeros(n, np.int32)
    old = np.ascontiguousarray(st.oldEBands, np.float64)
    ole = np.ascontiguousarray(st.oldLogE, np.float64)
    ole2 = np.ascontiguousarray(st.oldLogE2, np.float64)
    bg = np.ascontiguousarray(st.backgroundLogE, np.float64)
    rng = np.array([st.rng], np.int64)
    mp = _mode_ptrs(mode)
    i64p, i32p, f64p = _ec_ptrs()
    f32p = ctypes.POINTER(ctypes.c_float)

    rc = L.celt_decode_stream(
        payload, offs.ctypes.data_as(i64p), lens.ctypes.data_as(i64p),
        fsz.ctypes.data_as(i32p), enda.ctypes.data_as(i32p),
        cha.ctypes.data_as(i32p), n,
        mp["eb_p"], nb, mp["ln_p"], mp["ci_p"], mp["cb"], mp["ccaps"],
        mp["av"], int(mode.nbAllocVectors), mp["em_p"], mp["pmf_p"],
        int(mode.shortMdctSize), int(mode.effEBands),
        old.ctypes.data_as(f64p), ole.ctypes.data_as(f64p),
        ole2.ctypes.data_as(f64p), bg.ctypes.data_as(f64p),
        rng.ctypes.data_as(i64p),
        int(CC), int(CCout), int(st.downsample), int(st.start),
        nmax, freq.ctypes.data_as(f32p),
        sb.ctypes.data_as(i32p), pfp.ctypes.data_as(i32p),
        pfg.ctypes.data_as(f64p), pft.ctypes.data_as(i32p),
        sil.ctypes.data_as(i32p),
    )
    if rc != 0:
        raise ValueError(f"celt_decode_stream failed at frame {rc - 1}")
    st.oldEBands[:, :] = old
    st.oldLogE[:] = ole
    st.oldLogE2[:] = ole2
    st.backgroundLogE[:] = bg
    st.rng = int(rng[0])
    return freq, fsz, cha, sb, pfp, pfg, pft, sil


def celt_decode_stream_raw(
    st: CeltDecoderState, frames, frame_sizes, ends, stream_chs,
):
    """celt_decode_stream_native without the per-frame dict layer: returns
    (freq [n, CCout, nmax] float32, frame_sizes, stream_chs, short_blocks,
    pf_pitch, pf_gain, pf_tapset, silence) arrays, or None when the
    native library is unavailable.  The array form feeds the batched
    serving path with zero reshuffling."""
    L = _native_celt()
    if L is None or not hasattr(L, "celt_decode_stream"):
        return None
    n = len(frames)
    if n == 0:
        return []
    payload = b"".join(frames)
    lens = np.fromiter((len(fr) for fr in frames), np.int64, n)
    offs = np.concatenate(([0], np.cumsum(lens[:-1])))
    return _celt_decode_stream_arrays(
        st, payload, offs, lens, frame_sizes, ends, stream_chs)


def comb_filter(y, x, off, T0, T1, N, g0, g1, tapset0, tapset1, window,
                overlap):
    """In-place pitch postfilter (reference: celt/celt.c:114-172).

    x/y are the same decode-history array; `off` is the start index of the
    N-sample region being filtered (reads reach back off - T - 2).
    Vectorized in chunks of min(T0, T1) - 2 samples: the lag keeps every
    read strictly before the chunk, so chunks are data-parallel.
    """
    if g0 == 0.0 and g1 == 0.0:
        return
    g00 = g0 * COMB_GAINS[tapset0][0]
    g01 = g0 * COMB_GAINS[tapset0][1]
    g02 = g0 * COMB_GAINS[tapset0][2]
    g10 = g1 * COMB_GAINS[tapset1][0]
    g11 = g1 * COMB_GAINS[tapset1][1]
    g12 = g1 * COMB_GAINS[tapset1][2]

    w2 = window * window
    i = 0
    if not (g0 == g1 and T0 == T1 and tapset0 == tapset1):
        ov = min(overlap, N)
        step = max(1, min(T0, T1) - 2)
        while i < ov:
            n = min(step, ov - i)
            j = off + i
            f = w2[i : i + n]
            a0 = x[j - T0 : j - T0 + n]
            a1 = x[j - T0 + 1 : j - T0 + 1 + n] + x[j - T0 - 1 : j - T0 - 1 + n]
            a2 = x[j - T0 + 2 : j - T0 + 2 + n] + x[j - T0 - 2 : j - T0 - 2 + n]
            b0 = x[j - T1 : j - T1 + n]
            b1 = x[j - T1 + 1 : j - T1 + 1 + n] + x[j - T1 - 1 : j - T1 - 1 + n]
            b2 = x[j - T1 + 2 : j - T1 + 2 + n] + x[j - T1 - 2 : j - T1 - 2 + n]
            y[j : j + n] = (
                x[j : j + n]
                + (1 - f) * (g00 * a0 + g01 * a1 + g02 * a2)
                + f * (g10 * b0 + g11 * b1 + g12 * b2)
            )
            i += n
        if g1 == 0.0:
            return
    # Constant-parameter tail (comb_filter_const)
    step = max(1, T1 - 2)
    while i < N:
        n = min(step, N - i)
        j = off + i
        b0 = x[j - T1 : j - T1 + n]
        b1 = x[j - T1 + 1 : j - T1 + 1 + n] + x[j - T1 - 1 : j - T1 - 1 + n]
        b2 = x[j - T1 + 2 : j - T1 + 2 + n] + x[j - T1 - 2 : j - T1 - 2 + n]
        y[j : j + n] = x[j : j + n] + g10 * b0 + g11 * b1 + g12 * b2
        i += n



@functools.lru_cache(maxsize=8)
def _deemph_toeplitz(coef: float, n: int):
    i = np.arange(n)
    d = i[:, None] - i[None, :]
    L = np.where(d >= 0, np.power(coef, np.maximum(d, 0.0)), 0.0)
    # the carried m is already coef*y_prev, so it enters y[0]
    # with unit weight: m-term coefficient for y[j] is coef^j
    powers = np.power(coef, i.astype(np.float64))
    # coef^d underflows to float32 DENORMALS past d ~ 540 (0.85^540 ~
    # 1e-38), and denormal operands run the GEMM ~10x slower; those
    # entries are far below float32 resolution of any partial sum, so
    # flush them to exact zeros.
    L[L < 1e-30] = 0.0
    powers = np.where(powers < 1e-30, 0.0, powers)
    return L, powers


def celt_synthesize_host(st: CeltDecoderState, info) -> np.ndarray:
    """Host (NumPy) synthesis: IMDCT + TDAC + postfilter + deemphasis.

    Used as the oracle; the TPU path implements the same math batched.
    """
    from ...ops.imdct import celt_imdct_reference

    mode = mode48000()
    overlap = mode.overlap
    N = info["N"]
    CC = info["CC"]
    LM = info["LM"]
    shortBlocks = info["shortBlocks"]
    freq = info["freq"]

    out = np.zeros((CC, N))
    for c in range(CC):
        buf = st.decode_mem[c]
        # Slide history (reference: OPUS_MOVE, celt_decoder_clean.c:625)
        buf[: DECODE_BUFFER_SIZE - N + overlap // 2] = buf[
            N: DECODE_BUFFER_SIZE + overlap // 2
        ]
        pos = DECODE_BUFFER_SIZE - N
        if shortBlocks:
            B = shortBlocks
            n_short = mode.shortMdctSize
            Nmdct = 2 * n_short  # l->n >> maxLM = 240
            for b in range(B):
                spec = freq[c, b::B][: n_short]
                res = celt_imdct_reference(
                    spec, Nmdct, overlap,
                    prev_tail=buf[pos + n_short * b:
                                  pos + n_short * b + overlap // 2].copy(),
                )
                buf[pos + n_short * b:
                    pos + n_short * b + n_short + overlap] = res
        else:
            Nmdct = (2 * mode.shortMdctSize) << LM
            spec = freq[c, :N]
            res = celt_imdct_reference(
                spec, Nmdct, overlap, prev_tail=buf[pos: pos + overlap // 2].copy()
            )
            buf[pos: pos + N + overlap] = res

        # Postfilter (reference: celt_decoder_clean.c:652-668)
        T_old = max(st.postfilter_period, COMBFILTER_MINPERIOD)
        T_old2 = max(st.postfilter_period_old, COMBFILTER_MINPERIOD)
        comb_filter(
            buf, buf, pos, T_old2, T_old, mode.shortMdctSize,
            st.postfilter_gain_old, st.postfilter_gain,
            st.postfilter_tapset_old, st.postfilter_tapset,
            mode.window, overlap,
        )
        if LM != 0:
            comb_filter(
                buf, buf, pos + mode.shortMdctSize, T_old,
                info["postfilter_pitch"], N - mode.shortMdctSize,
                st.postfilter_gain, info["postfilter_gain"],
                st.postfilter_tapset, info["postfilter_tapset"],
                mode.window, overlap,
            )
        out[c] = buf[pos: pos + N]

    st.postfilter_period_old = st.postfilter_period
    st.postfilter_gain_old = st.postfilter_gain
    st.postfilter_tapset_old = st.postfilter_tapset
    st.postfilter_period = info["postfilter_pitch"]
    st.postfilter_gain = info["postfilter_gain"]
    st.postfilter_tapset = info["postfilter_tapset"]
    if LM != 0:
        st.postfilter_period_old = st.postfilter_period
        st.postfilter_gain_old = st.postfilter_gain
        st.postfilter_tapset_old = st.postfilter_tapset

    # Deemphasis (reference: celt_decoder_clean.c deemphasis :189-256)
    # y[j] = x[j] + VERY_SMALL + coef*y[j-1]: solved as a lower-triangular
    # Toeplitz matmul (coef^(i-j)) plus the carried-in memory term.
    coef0 = mode.preemph[0]
    L, powers = _deemph_toeplitz(coef0, N)
    pcm = np.zeros((N, CC))
    for c in range(CC):
        m = st.preemph_memD[c]
        y = L @ (out[c] + VERY_SMALL) + powers * m
        st.preemph_memD[c] = coef0 * y[N - 1]
        pcm[:, c] = y * (1.0 / CELT_SIG_SCALE)
    return pcm
