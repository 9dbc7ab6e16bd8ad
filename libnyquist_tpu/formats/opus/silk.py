"""SILK decoder (host side): full fixed-point decode to 48 kHz int16.

Re-implementation of the SILK decode path (RFC 6716 §4.2; reference:
third_party/opus/silk/ dec_API.c:80-360, decode_frame.c, decode_indices.c,
decode_parameters.c, decode_core.c, decode_pulses.c, shell_coder.c,
code_signs.c, gain_quant.c, NLSF_decode.c, NLSF2A.c, NLSF_stabilize.c,
NLSF_unpack.c, NLSF_VQ_weights_laroia.c, decode_pitch.c, stereo_*.c,
resampler*.c, Inlines.h, macros.h).

SILK is specified in integer arithmetic, so this implementation is
bit-exact with the reference by construction (Python ints with explicit
int32 wrap points mirroring the C macros). It is branchy, serial, host
work by design (SURVEY.md §7); the LPC synthesis recurrences are candidate
TPU scans in a later optimization round.

Scope: intact-stream decode. Like the reference fork (which stripped CELT
PLC), packet-loss concealment and DTX comfort noise generation are not
reproduced — PLC/CNG state updates for intact frames have no effect on
intact output (PLC.c silk_PLC with lost=0 only updates state; CNG.c adds
signal only when lossCnt != 0).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ...errors import DecodeError
from . import silk_tables as ST
from .range_coder import RangeDecoder
from .silk_tables import (
    CODE_CONDITIONALLY,
    CODE_INDEPENDENTLY,
    CODE_INDEPENDENTLY_NO_LTP_SCALING,
    LTP_ORDER,
    MAX_LPC_ORDER,
    MAX_NB_SUBFR,
    SHELL_FRAME,
    TYPE_NO_VOICE_ACTIVITY,
    TYPE_VOICED,
)

# --------------------------------------------------------------------------
# Fixed-point helpers (reference: silk/macros.h, SigProc_FIX.h, Inlines.h)
# --------------------------------------------------------------------------
I32_MIN, I32_MAX = -(1 << 31), (1 << 31) - 1


def i32(x: int) -> int:
    x &= 0xFFFFFFFF
    return x - 0x100000000 if x >= 0x80000000 else x


def i16(x: int) -> int:
    x &= 0xFFFF
    return x - 0x10000 if x >= 0x8000 else x


def sat16(x: int) -> int:
    return -32768 if x < -32768 else (32767 if x > 32767 else x)


def smulwb(a: int, b: int) -> int:
    return (a * i16(b)) >> 16


def smlawb(a: int, b: int, c: int) -> int:
    return a + ((b * i16(c)) >> 16)


def smulbb(a: int, b: int) -> int:
    return i16(a) * i16(b)


def smlabb(a: int, b: int, c: int) -> int:
    return a + i16(b) * i16(c)


def smulwt(a: int, b: int) -> int:
    return (a >> 16) * (b >> 16) + (((a & 0xFFFF) * (b >> 16)) >> 16)


def smmul(a: int, b: int) -> int:
    return i32((a * b) >> 32)


def rshift_round(a: int, shift: int) -> int:
    if shift == 1:
        return (a >> 1) + (a & 1)
    return ((a >> (shift - 1)) + 1) >> 1


def smulww(a: int, b: int) -> int:
    # silk_MLA(silk_SMULWB(a, b), a, silk_RSHIFT_ROUND(b, 16))
    return i32(smulwb(a, b) + i32(a * rshift_round(b, 16)))


def smlaww(a: int, b: int, c: int) -> int:
    return i32(smlawb(a, b, c) + i32(b * rshift_round(c, 16)))


def clz32(x: int) -> int:
    x &= 0xFFFFFFFF
    return 32 - x.bit_length()


def cdiv(a: int, b: int) -> int:
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def limit(x, lo, hi):
    return lo if x < lo else (hi if x > hi else x)


def lshift_sat32(a: int, shift: int) -> int:
    v = a << shift
    return limit(v, I32_MIN, I32_MAX)


def div32_varq(a32: int, b32: int, qres: int) -> int:
    a_headrm = clz32(abs(a32)) - 1
    a_nrm = i32(a32 << a_headrm)
    b_headrm = clz32(abs(b32)) - 1
    b_nrm = i32(b32 << b_headrm)
    b_inv = cdiv(I32_MAX >> 2, b_nrm >> 16)
    result = smulwb(a_nrm, b_inv)
    a_nrm = i32(a_nrm - i32(smmul(b_nrm, result) << 3))
    result = smlawb(result, a_nrm, b_inv)
    lshift = 29 + a_headrm - b_headrm - qres
    if lshift < 0:
        return lshift_sat32(result, -lshift)
    if lshift < 32:
        return result >> lshift
    return 0


def inverse32_varq(b32: int, qres: int) -> int:
    b_headrm = clz32(abs(b32)) - 1
    b_nrm = i32(b32 << b_headrm)
    b_inv = cdiv(I32_MAX >> 2, b_nrm >> 16)
    result = i32(b_inv << 16)
    err_q32 = i32(((1 << 29) - smulwb(b_nrm, b_inv)) << 3)
    result = smlaww(result, err_q32, b_inv)
    lshift = 61 - b_headrm - qres
    if lshift <= 0:
        return lshift_sat32(result, -lshift)
    if lshift < 32:
        return result >> lshift
    return 0


def silk_log2lin(in_log_q7: int) -> int:
    if in_log_q7 < 0:
        return 0
    if in_log_q7 >= 3967:
        return I32_MAX
    out = 1 << (in_log_q7 >> 7)
    frac_q7 = in_log_q7 & 0x7F
    adj = smlawb(frac_q7, smulbb(frac_q7, 128 - frac_q7), -174)
    if in_log_q7 < 2048:
        out = out + ((out * adj) >> 7)
    else:
        out = i32(out + (out >> 7) * adj)
    return out


def sqrt_approx(x: int) -> int:
    if x <= 0:
        return 0
    # silk_CLZ_FRAC: lz = CLZ32, frac = 7 middle bits below the leading one
    lz = clz32(x)
    frac_q7 = (x >> max(0, 24 - lz)) & 0x7F
    y = 32768 if (lz & 1) else 46214
    y >>= lz >> 1
    y = smlawb(y, y, smulbb(213, frac_q7))
    return y


def silk_rand(seed: int) -> int:
    return i32(907633515 + i32(seed * 196314165))


# --------------------------------------------------------------------------
# Gains (reference: gain_quant.c silk_gains_dequant)
# --------------------------------------------------------------------------
def gains_dequant(ind, prev_ind: int, conditional: bool, nb_subfr: int):
    gains = [0] * nb_subfr
    for k in range(nb_subfr):
        if k == 0 and not conditional:
            prev_ind = max(ind[k], prev_ind - 16)
        else:
            ind_tmp = ind[k] + ST.MIN_DELTA_GAIN_QUANT
            dsst = 2 * ST.MAX_DELTA_GAIN_QUANT - ST.N_LEVELS_QGAIN + prev_ind
            if ind_tmp > dsst:
                prev_ind += (ind_tmp << 1) - dsst
            else:
                prev_ind += ind_tmp
        prev_ind = limit(prev_ind, 0, ST.N_LEVELS_QGAIN - 1)
        gains[k] = silk_log2lin(
            min(smulwb(ST.GAIN_INV_SCALE_Q16, prev_ind) + ST.GAIN_OFFSET,
                3967)
        )
    return gains, prev_ind


# --------------------------------------------------------------------------
# NLSF (reference: NLSF_unpack.c, NLSF_decode.c, NLSF_stabilize.c,
# NLSF_VQ_weights_laroia.c, NLSF2A.c, bwexpander_32.c, LPC_inv_pred_gain.c)
# --------------------------------------------------------------------------
def nlsf_unpack(cb, cb1_index: int):
    ec_ix = [0] * cb.order
    pred_q8 = [0] * cb.order
    row = cb.ec_sel[cb1_index]
    for i in range(0, cb.order, 2):
        entry = int(row[i // 2])
        ec_ix[i] = ((entry >> 1) & 7) * (2 * ST.NLSF_QUANT_MAX_AMPLITUDE + 1)
        pred_q8[i] = int(cb.pred_Q8[i + (entry & 1) * (cb.order - 1)])
        ec_ix[i + 1] = ((entry >> 5) & 7) * (
            2 * ST.NLSF_QUANT_MAX_AMPLITUDE + 1
        )
        pred_q8[i + 1] = int(
            cb.pred_Q8[i + ((entry >> 4) & 1) * (cb.order - 1) + 1]
        )
    return ec_ix, pred_q8


def nlsf_residual_dequant(indices, pred_q8, quant_step_q16, order):
    x_q10 = [0] * order
    out_q10 = 0
    for i in range(order - 1, -1, -1):
        pred_q10 = (out_q10 * i16(pred_q8[i])) >> 8
        out_q10 = indices[i] << 10
        if out_q10 > 0:
            out_q10 = i16(out_q10 - ST.NLSF_QUANT_LEVEL_ADJ_Q10)
        elif out_q10 < 0:
            out_q10 = i16(out_q10 + ST.NLSF_QUANT_LEVEL_ADJ_Q10)
        out_q10 = smlawb(pred_q10, out_q10, quant_step_q16)
        x_q10[i] = out_q10
    return x_q10


def nlsf_vq_weights_laroia(nlsf_q15, order):
    w = [0] * order
    tmp1 = max(nlsf_q15[0], 1)
    tmp1 = cdiv(1 << (15 + ST.NLSF_W_Q), tmp1)
    tmp2 = max(nlsf_q15[1] - nlsf_q15[0], 1)
    tmp2 = cdiv(1 << (15 + ST.NLSF_W_Q), tmp2)
    w[0] = min(tmp1 + tmp2, 32767)
    for k in range(1, order - 1, 2):
        tmp1 = max(nlsf_q15[k + 1] - nlsf_q15[k], 1)
        tmp1 = cdiv(1 << (15 + ST.NLSF_W_Q), tmp1)
        w[k] = min(tmp1 + tmp2, 32767)
        tmp2 = max(nlsf_q15[k + 2] - nlsf_q15[k + 1], 1)
        tmp2 = cdiv(1 << (15 + ST.NLSF_W_Q), tmp2)
        w[k + 1] = min(tmp1 + tmp2, 32767)
    tmp1 = max((1 << 15) - nlsf_q15[order - 1], 1)
    tmp1 = cdiv(1 << (15 + ST.NLSF_W_Q), tmp1)
    w[order - 1] = min(tmp1 + tmp2, 32767)
    return w


def nlsf_stabilize(nlsf, delta_min, L):
    for _ in range(20):  # MAX_LOOPS
        min_diff = nlsf[0] - int(delta_min[0])
        I = 0
        for i in range(1, L):
            diff = nlsf[i] - (nlsf[i - 1] + int(delta_min[i]))
            if diff < min_diff:
                min_diff = diff
                I = i
        diff = (1 << 15) - (nlsf[L - 1] + int(delta_min[L]))
        if diff < min_diff:
            min_diff = diff
            I = L
        if min_diff >= 0:
            return
        if I == 0:
            nlsf[0] = int(delta_min[0])
        elif I == L:
            nlsf[L - 1] = (1 << 15) - int(delta_min[L])
        else:
            min_center = 0
            for k in range(I):
                min_center += int(delta_min[k])
            min_center += int(delta_min[I]) >> 1
            max_center = 1 << 15
            for k in range(L, I, -1):
                max_center -= int(delta_min[k])
            max_center -= int(delta_min[I]) >> 1
            center = limit(
                rshift_round(nlsf[I - 1] + nlsf[I], 1), min_center, max_center
            )
            nlsf[I - 1] = center - (int(delta_min[I]) >> 1)
            nlsf[I] = nlsf[I - 1] + int(delta_min[I])
    # Fallback: sort and force deltas
    nlsf[:L] = sorted(nlsf[:L])
    for i in range(1, L):
        nlsf[i] = max(nlsf[i], nlsf[i - 1] + int(delta_min[i]))
    for i in range(L - 1, -1, -1):
        hi = ((1 << 15) - int(delta_min[L])) if i == L - 1 else (
            nlsf[i + 1] - int(delta_min[i + 1])
        )
        nlsf[i] = min(nlsf[i], hi)


def nlsf_decode(indices, cb):
    order = cb.order
    nlsf = [int(cb.CB1_NLSF_Q8[indices[0]][i]) << 7 for i in range(order)]
    ec_ix, pred_q8 = nlsf_unpack(cb, indices[0])
    res_q10 = nlsf_residual_dequant(
        indices[1:], pred_q8, cb.quantStepSize_Q16, order
    )
    w = nlsf_vq_weights_laroia(nlsf, order)
    for i in range(order):
        w_q9 = sqrt_approx(w[i] << (18 - ST.NLSF_W_Q))
        v = nlsf[i] + cdiv(res_q10[i] << 14, w_q9)
        nlsf[i] = limit(v, 0, 32767)
    nlsf_stabilize(nlsf, cb.deltaMin_Q15, order)
    return nlsf


_ORDERING16 = [0, 15, 8, 7, 4, 11, 12, 3, 2, 13, 10, 5, 6, 9, 14, 1]
_ORDERING10 = [0, 9, 6, 3, 4, 5, 8, 1, 2, 7]
QA_NLSF2A = 16
QA_INVPRED = 24
A_LIMIT_Q24 = int(0.99975 * (1 << 24) + 0.5)


def _nlsf2a_find_poly(clsf, dd):
    out = [0] * (dd + 1)
    out[0] = 1 << QA_NLSF2A
    out[1] = -clsf[0]
    # Caller passes the de-interleaved even/odd cos-LSF sequence, so the
    # reference's cLSF[2*k] stride-2 access becomes clsf[k].
    for k in range(1, dd):
        ftmp = clsf[k]
        out[k + 1] = i32(
            i32(out[k - 1] << 1)
            - int(_rshift_round64(ftmp * out[k], QA_NLSF2A))
        )
        for n in range(k, 1, -1):
            out[n] = i32(
                out[n] + out[n - 2]
                - int(_rshift_round64(ftmp * out[n - 1], QA_NLSF2A))
            )
        out[1] -= ftmp
    return out


def _rshift_round64(a: int, shift: int) -> int:
    if shift == 1:
        return (a >> 1) + (a & 1)
    return ((a >> (shift - 1)) + 1) >> 1


def bwexpander_32(ar, d, chirp_q16):
    chirp_minus_one = chirp_q16 - 65536
    for i in range(d - 1):
        ar[i] = smulww(chirp_q16, ar[i])
        chirp_q16 += rshift_round(i32(chirp_q16 * chirp_minus_one), 16)
    ar[d - 1] = smulww(chirp_q16, ar[d - 1])


def lpc_inverse_pred_gain(a_q12, order):
    dc_resp = sum(a_q12[:order])
    if dc_resp >= 4096:
        return 0
    anew = [a << (QA_INVPRED - 12) for a in a_q12[:order]]
    inv_gain_q30 = 1 << 30
    for k in range(order - 1, 0, -1):
        if anew[k] > A_LIMIT_Q24 or anew[k] < -A_LIMIT_Q24:
            return 0
        rc_q31 = i32(-(anew[k] << (31 - QA_INVPRED)))
        rc_mult1_q30 = (1 << 30) - smmul(rc_q31, rc_q31)
        mult2q = 32 - clz32(abs(rc_mult1_q30))
        rc_mult2 = inverse32_varq(rc_mult1_q30, mult2q + 30)
        inv_gain_q30 = i32(smmul(inv_gain_q30, rc_mult1_q30) << 2)
        aold = anew[:]
        for n in range(k):
            tmp = i32(
                aold[n] - _mul32_frac_q(aold[k - n - 1], rc_q31, 31)
            )
            anew[n] = _mul32_frac_q(tmp, rc_mult2, mult2q)
    if anew[0] > A_LIMIT_Q24 or anew[0] < -A_LIMIT_Q24:
        return 0
    rc_q31 = i32(-(anew[0] << (31 - QA_INVPRED)))
    rc_mult1_q30 = (1 << 30) - smmul(rc_q31, rc_q31)
    inv_gain_q30 = i32(smmul(inv_gain_q30, rc_mult1_q30) << 2)
    return inv_gain_q30


def _mul32_frac_q(a: int, b: int, q: int) -> int:
    return i32(_rshift_round64(a * b, q))


def nlsf2a(nlsf_q15, d):
    t = ST.tables()
    cos_tab = t["LSFCosTab_FIX_Q12"]
    ordering = _ORDERING16 if d == 16 else _ORDERING10
    clsf = [0] * d
    for k in range(d):
        f_int = nlsf_q15[k] >> 8
        f_frac = nlsf_q15[k] - (f_int << 8)
        cos_val = int(cos_tab[f_int])
        delta = int(cos_tab[f_int + 1]) - cos_val
        clsf[ordering[k]] = rshift_round(
            (cos_val << 8) + delta * f_frac, 20 - QA_NLSF2A
        )
    dd = d >> 1
    P = _nlsf2a_find_poly(clsf[0::2], dd)
    Q = _nlsf2a_find_poly(clsf[1::2], dd)
    a32_qa1 = [0] * d
    for k in range(dd):
        ptmp = P[k + 1] + P[k]
        qtmp = Q[k + 1] - Q[k]
        a32_qa1[k] = i32(-qtmp - ptmp)
        a32_qa1[d - k - 1] = i32(qtmp - ptmp)
    for i in range(10):
        maxabs = 0
        idx = 0
        for k in range(d):
            absval = abs(a32_qa1[k])
            if absval > maxabs:
                maxabs = absval
                idx = k
        maxabs = rshift_round(maxabs, QA_NLSF2A + 1 - 12)
        if maxabs > 32767:
            maxabs = min(maxabs, 163838)
            sc_q16 = int(0.999 * 65536 + 0.5) - cdiv(
                (maxabs - 32767) << 14, (i32(maxabs * (idx + 1))) >> 2
            )
            bwexpander_32(a32_qa1, d, sc_q16)
        else:
            break
    if i == 9 and maxabs > 32767:
        a_q12 = [
            sat16(rshift_round(a, QA_NLSF2A + 1 - 12)) for a in a32_qa1
        ]
        a32_qa1 = [a << (QA_NLSF2A + 1 - 12) for a in a_q12]
    else:
        a_q12 = [rshift_round(a, QA_NLSF2A + 1 - 12) for a in a32_qa1]
    for it in range(16):  # MAX_LPC_STABILIZE_ITERATIONS
        if lpc_inverse_pred_gain(a_q12, d) < int((1 << 30) / 1e4):
            bwexpander_32(a32_qa1, d, 65536 - (2 << it))
            a_q12 = [rshift_round(a, QA_NLSF2A + 1 - 12) for a in a32_qa1]
        else:
            break
    return a_q12


# --------------------------------------------------------------------------
# Pulses (reference: decode_pulses.c, shell_coder.c, code_signs.c)
# --------------------------------------------------------------------------
def _shell_tables():
    t = ST.tables()
    return (
        t["shell_code_table0"], t["shell_code_table1"],
        t["shell_code_table2"], t["shell_code_table3"],
        t["shell_code_table_offsets"],
    )


def _decode_split(dec, p, table, offsets):
    if p > 0:
        c1 = dec.dec_icdf(table[int(offsets[p]):], 8)
        return c1, p - c1
    return 0, 0


def shell_decoder(dec, pulses4):
    t0, t1, t2, t3, offs = _shell_tables()
    p3 = _decode_split(dec, pulses4, t3, offs)
    p2_0 = _decode_split(dec, p3[0], t2, offs)
    p1_0 = _decode_split(dec, p2_0[0], t1, offs)
    out = [0] * 16
    out[0], out[1] = _decode_split(dec, p1_0[0], t0, offs)
    out[2], out[3] = _decode_split(dec, p1_0[1], t0, offs)
    p1_1 = _decode_split(dec, p2_0[1], t1, offs)
    out[4], out[5] = _decode_split(dec, p1_1[0], t0, offs)
    out[6], out[7] = _decode_split(dec, p1_1[1], t0, offs)
    p2_1 = _decode_split(dec, p3[1], t2, offs)
    p1_2 = _decode_split(dec, p2_1[0], t1, offs)
    out[8], out[9] = _decode_split(dec, p1_2[0], t0, offs)
    out[10], out[11] = _decode_split(dec, p1_2[1], t0, offs)
    p1_3 = _decode_split(dec, p2_1[1], t1, offs)
    out[12], out[13] = _decode_split(dec, p1_3[0], t0, offs)
    out[14], out[15] = _decode_split(dec, p1_3[1], t0, offs)
    return out


def decode_pulses(dec, signal_type, quant_offset_type, frame_length):
    t = ST.tables()
    rate_level = dec.dec_icdf(t["rate_levels_iCDF"][signal_type >> 1], 8)
    iter_ = frame_length >> 4
    if iter_ * SHELL_FRAME < frame_length:
        iter_ += 1
    sum_pulses = [0] * iter_
    nlshifts = [0] * iter_
    cdf = t["pulses_per_block_iCDF"][rate_level]
    for i in range(iter_):
        sum_pulses[i] = dec.dec_icdf(cdf, 8)
        while sum_pulses[i] == ST.MAX_PULSES + 1:
            nlshifts[i] += 1
            off = 1 if nlshifts[i] == 10 else 0
            sum_pulses[i] = dec.dec_icdf(
                t["pulses_per_block_iCDF"][ST.N_RATE_LEVELS - 1][off:], 8
            )
    pulses = [0] * (iter_ * SHELL_FRAME)
    for i in range(iter_):
        if sum_pulses[i] > 0:
            pulses[i * SHELL_FRAME:(i + 1) * SHELL_FRAME] = shell_decoder(
                dec, sum_pulses[i]
            )
    lsb_icdf = t["lsb_iCDF"]
    for i in range(iter_):
        if nlshifts[i] > 0:
            nls = nlshifts[i]
            for k in range(SHELL_FRAME):
                abs_q = pulses[i * SHELL_FRAME + k]
                for _ in range(nls):
                    abs_q = (abs_q << 1) + dec.dec_icdf(lsb_icdf, 8)
                pulses[i * SHELL_FRAME + k] = abs_q
            sum_pulses[i] |= nls << 5
    # Signs (code_signs.c silk_decode_signs)
    sign_icdf_base = t["sign_iCDF"]
    i0 = 7 * (quant_offset_type + (signal_type << 1))
    nblocks = (frame_length + SHELL_FRAME // 2) >> 4
    for i in range(nblocks):
        p = sum_pulses[i]
        if p > 0:
            icdf0 = int(sign_icdf_base[i0 + min(p & 0x1F, 6)])
            icdf = [icdf0, 0]
            for j in range(SHELL_FRAME):
                q = pulses[i * SHELL_FRAME + j]
                if q > 0:
                    # silk_dec_map(a) = 2*a - 1
                    pulses[i * SHELL_FRAME + j] = q * (
                        2 * dec.dec_icdf(icdf, 8) - 1
                    )
    return pulses[:frame_length] + pulses[frame_length:]


# --------------------------------------------------------------------------
# Pitch lags (reference: decode_pitch.c)
# --------------------------------------------------------------------------
def decode_pitch(lag_index, contour_index, fs_khz, nb_subfr):
    t = ST.tables()
    if fs_khz == 8:
        if nb_subfr == MAX_NB_SUBFR:
            cb = t["CB_lags_stage2"].reshape(4, 11)
        else:
            cb = t["CB_lags_stage2_10ms"].reshape(2, 3)
    else:
        if nb_subfr == MAX_NB_SUBFR:
            cb = t["CB_lags_stage3"].reshape(4, 34)
        else:
            cb = t["CB_lags_stage3_10ms"].reshape(2, 12)
    min_lag = ST.PITCH_EST_MIN_LAG_MS * fs_khz
    max_lag = ST.PITCH_EST_MAX_LAG_MS * fs_khz
    lag = min_lag + lag_index
    return [
        limit(lag + int(cb[k][contour_index]), min_lag, max_lag)
        for k in range(nb_subfr)
    ]


# --------------------------------------------------------------------------
# Resampler (reference: resampler.c, resampler_private_up2_HQ.c,
# resampler_private_IIR_FIR.c, resampler_rom.c)
# --------------------------------------------------------------------------
class Resampler:
    """SILK decoder-side resampler: 8/12/16 kHz -> 48 kHz (2x allpass IIR
    upsample + 12-phase FIR fractional interpolation), or pass-through."""

    def __init__(self, fs_in_hz: int, fs_out_hz: int):
        t = ST.tables()
        self.fs_in_khz = fs_in_hz // 1000
        self.fs_out_khz = fs_out_hz // 1000
        rate_ids = {8000: 0, 12000: 1, 16000: 2, 24000: 3, 48000: 4}
        self.input_delay = ST.DELAY_MATRIX_DEC[rate_ids[fs_in_hz]][
            rate_ids[fs_out_hz]
        ]
        self.batch_size = self.fs_in_khz * 10  # RESAMPLER_MAX_BATCH_SIZE_MS
        self.mode = "copy"
        up2x = 0
        if fs_out_hz > fs_in_hz:
            if fs_out_hz == 2 * fs_in_hz:
                self.mode = "up2hq"
            else:
                self.mode = "iir_fir"
                up2x = 1
        elif fs_out_hz < fs_in_hz:
            raise DecodeError("decoder never downsamples")
        self.inv_ratio_q16 = ((fs_in_hz << (14 + up2x)) // fs_out_hz) << 2
        while smulww(self.inv_ratio_q16, fs_out_hz) < (fs_in_hz << up2x):
            self.inv_ratio_q16 += 1
        self.delay_buf = [0] * 48  # >= fs_in_khz
        self.sIIR = [0] * 6
        self.sFIR = [0] * 8  # RESAMPLER_ORDER_FIR_12
        self.hq0 = [int(v) for v in t["resampler_up2_hq_0"]]
        self.hq1 = [int(v) for v in t["resampler_up2_hq_1"]]
        self.frac_fir = t["resampler_frac_FIR_12"].reshape(12, 4).astype(int)

    def _up2_hq(self, x):
        S = self.sIIR
        hq0, hq1 = self.hq0, self.hq1
        out = [0] * (2 * len(x))
        for k, v in enumerate(x):
            in32 = v << 10
            Y = in32 - S[0]
            X = smulwb(Y, hq0[0])
            o1 = S[0] + X
            S[0] = in32 + X
            Y = o1 - S[1]
            X = smulwb(Y, hq0[1])
            o2 = S[1] + X
            S[1] = o1 + X
            Y = o2 - S[2]
            X = smlawb(Y, Y, hq0[2])
            o1f = S[2] + X
            S[2] = o2 + X
            out[2 * k] = sat16(rshift_round(o1f, 10))
            Y = in32 - S[3]
            X = smulwb(Y, hq1[0])
            o1 = S[3] + X
            S[3] = in32 + X
            Y = o1 - S[4]
            X = smulwb(Y, hq1[1])
            o2 = S[4] + X
            S[4] = o1 + X
            Y = o2 - S[5]
            X = smlawb(Y, Y, hq1[2])
            o1f = S[5] + X
            S[5] = o2 + X
            out[2 * k + 1] = sat16(rshift_round(o1f, 10))
        return out

    def _iir_fir(self, x):
        out = []
        buf = list(self.sFIR)
        pos = 0
        n = len(x)
        inc = self.inv_ratio_q16
        ff = self.frac_fir
        while True:
            n_in = min(n - pos, self.batch_size)
            up = self._up2_hq(x[pos:pos + n_in])
            buf = buf[:8] + up
            max_index_q16 = n_in << 17
            index_q16 = 0
            while index_q16 < max_index_q16:
                table_index = smulwb(index_q16 & 0xFFFF, 12)
                b = index_q16 >> 16
                r = buf[b] * int(ff[table_index][0])
                r += buf[b + 1] * int(ff[table_index][1])
                r += buf[b + 2] * int(ff[table_index][2])
                r += buf[b + 3] * int(ff[table_index][3])
                r += buf[b + 4] * int(ff[11 - table_index][3])
                r += buf[b + 5] * int(ff[11 - table_index][2])
                r += buf[b + 6] * int(ff[11 - table_index][1])
                r += buf[b + 7] * int(ff[11 - table_index][0])
                out.append(sat16(rshift_round(r, 15)))
                index_q16 += inc
            pos += n_in
            if pos >= n:
                break
            buf = buf[n_in * 2:n_in * 2 + 8]
        self.sFIR = buf[n_in * 2:n_in * 2 + 8]
        return out

    def process(self, x):
        """Mirror silk_resampler's 1 ms delay buffering."""
        fs_in = self.fs_in_khz
        n_samples = fs_in - self.input_delay
        n = len(x)
        # First 1 ms comes through the delay buffer; the last input_delay
        # samples are saved for the next call (reference: resampler.c
        # silk_resampler buffering).
        first = self.delay_buf[: self.input_delay] + list(x[:n_samples])
        rest = list(x[n_samples : n_samples + (n - fs_in)])
        if self.mode == "copy":
            out = first + rest
        elif self.mode == "up2hq":
            out = self._up2_hq(first) + self._up2_hq(rest)
        else:
            out = self._iir_fir(first) + self._iir_fir(rest)
        self.delay_buf[: self.input_delay] = list(x[n - self.input_delay:])
        return out


# --------------------------------------------------------------------------
# Channel decoder state
# --------------------------------------------------------------------------
@dataclass
class Indices:
    signalType: int = 0
    quantOffsetType: int = 0
    GainsIndices: list = field(default_factory=lambda: [0] * 4)
    NLSFIndices: list = field(default_factory=lambda: [0] * 17)
    NLSFInterpCoef_Q2: int = 4
    lagIndex: int = 0
    contourIndex: int = 0
    PERIndex: int = 0
    LTPIndex: list = field(default_factory=lambda: [0] * 4)
    LTP_scaleIndex: int = 0
    Seed: int = 0


class ChannelState:
    def __init__(self):
        self.nFramesDecoded = 0
        self.nFramesPerPacket = 0
        self.nb_subfr = 0
        self.fs_kHz = 0
        self.fs_API_hz = 0
        self.frame_length = 0
        self.subfr_length = 0
        self.ltp_mem_length = 0
        self.LPC_order = 0
        self.nlsf_cb = None
        self.pitch_contour_icdf = None
        self.pitch_lag_low_bits_icdf = None
        self.VAD_flags = [0] * 3
        self.LBRR_flag = 0
        self.LBRR_flags = [0] * 3
        self.indices = Indices()
        self.prevNLSF_Q15 = [0] * MAX_LPC_ORDER
        self.LastGainIndex = 10
        self.prev_gain_Q16 = 1 << 16
        self.first_frame_after_reset = 1
        self.lagPrev = 100
        self.ec_prevSignalType = 0
        self.ec_prevLagIndex = 0
        self.prevSignalType = TYPE_NO_VOICE_ACTIVITY
        self.outBuf = [0] * (960 + 2 * 80)   # frame + 2 subfr @16k worst
        self.sLPC_Q14_buf = [0] * MAX_LPC_ORDER
        self.exc_Q14 = [0] * 320
        self.resampler: Optional[Resampler] = None
        self.lossCnt = 0

    def set_fs(self, fs_khz: int, fs_api_hz: int):
        t = ST.tables()
        self.subfr_length = ST.SUB_FRAME_LENGTH_MS * fs_khz
        frame_length = self.nb_subfr * self.subfr_length
        if self.fs_kHz != fs_khz or self.fs_API_hz != fs_api_hz:
            self.resampler = Resampler(fs_khz * 1000, fs_api_hz)
            self.fs_API_hz = fs_api_hz
        if self.fs_kHz != fs_khz or frame_length != self.frame_length:
            if fs_khz == 8:
                self.pitch_contour_icdf = (
                    t["pitch_contour_NB_iCDF"]
                    if self.nb_subfr == MAX_NB_SUBFR
                    else t["pitch_contour_10ms_NB_iCDF"]
                )
            else:
                self.pitch_contour_icdf = (
                    t["pitch_contour_iCDF"]
                    if self.nb_subfr == MAX_NB_SUBFR
                    else t["pitch_contour_10ms_iCDF"]
                )
            if self.fs_kHz != fs_khz:
                self.ltp_mem_length = ST.LTP_MEM_LENGTH_MS * fs_khz
                if fs_khz in (8, 12):
                    self.LPC_order = ST.MIN_LPC_ORDER
                    from .silk_tables import nlsf_cb_nb_mb
                    self.nlsf_cb = nlsf_cb_nb_mb()
                else:
                    self.LPC_order = MAX_LPC_ORDER
                    from .silk_tables import nlsf_cb_wb
                    self.nlsf_cb = nlsf_cb_wb()
                if fs_khz == 16:
                    self.pitch_lag_low_bits_icdf = t["uniform8_iCDF"]
                elif fs_khz == 12:
                    self.pitch_lag_low_bits_icdf = t["uniform6_iCDF"]
                else:
                    self.pitch_lag_low_bits_icdf = t["uniform4_iCDF"]
                self.first_frame_after_reset = 1
                self.lagPrev = 100
                self.LastGainIndex = 10
                self.prevSignalType = TYPE_NO_VOICE_ACTIVITY
                self.outBuf = [0] * len(self.outBuf)
                self.sLPC_Q14_buf = [0] * MAX_LPC_ORDER
            self.fs_kHz = fs_khz
            self.frame_length = frame_length


def decode_indices(st: ChannelState, dec, frame_index, decode_lbrr,
                   cond_coding):
    t = ST.tables()
    ind = st.indices = Indices()
    if decode_lbrr or st.VAD_flags[frame_index]:
        ix = dec.dec_icdf(t["type_offset_VAD_iCDF"], 8) + 2
    else:
        ix = dec.dec_icdf(t["type_offset_no_VAD_iCDF"], 8)
    ind.signalType = ix >> 1
    ind.quantOffsetType = ix & 1

    if cond_coding == CODE_CONDITIONALLY:
        ind.GainsIndices[0] = dec.dec_icdf(t["delta_gain_iCDF"], 8)
    else:
        ind.GainsIndices[0] = dec.dec_icdf(
            t["gain_iCDF"][ind.signalType], 8
        ) << 3
        ind.GainsIndices[0] += dec.dec_icdf(t["uniform8_iCDF"], 8)
    for i in range(1, st.nb_subfr):
        ind.GainsIndices[i] = dec.dec_icdf(t["delta_gain_iCDF"], 8)

    cb = st.nlsf_cb
    ind.NLSFIndices[0] = dec.dec_icdf(
        cb.CB1_iCDF[ind.signalType >> 1], 8
    )
    ec_ix, _pred = nlsf_unpack(cb, ind.NLSFIndices[0])
    for i in range(cb.order):
        ix = dec.dec_icdf(cb.ec_iCDF.reshape(-1)[ec_ix[i]:], 8)
        if ix == 0:
            ix -= dec.dec_icdf(t["NLSF_EXT_iCDF"], 8)
        elif ix == 2 * ST.NLSF_QUANT_MAX_AMPLITUDE:
            ix += dec.dec_icdf(t["NLSF_EXT_iCDF"], 8)
        ind.NLSFIndices[i + 1] = ix - ST.NLSF_QUANT_MAX_AMPLITUDE

    if st.nb_subfr == MAX_NB_SUBFR:
        ind.NLSFInterpCoef_Q2 = dec.dec_icdf(t["NLSF_interp_iCDF"], 8)
    else:
        ind.NLSFInterpCoef_Q2 = 4

    if ind.signalType == TYPE_VOICED:
        decode_absolute = True
        if cond_coding == CODE_CONDITIONALLY and \
                st.ec_prevSignalType == TYPE_VOICED:
            delta = dec.dec_icdf(t["pitch_delta_iCDF"], 8)
            if delta > 0:
                ind.lagIndex = st.ec_prevLagIndex + (delta - 9)
                decode_absolute = False
        if decode_absolute:
            ind.lagIndex = dec.dec_icdf(t["pitch_lag_iCDF"], 8) * (
                st.fs_kHz >> 1
            )
            ind.lagIndex += dec.dec_icdf(st.pitch_lag_low_bits_icdf, 8)
        st.ec_prevLagIndex = ind.lagIndex
        ind.contourIndex = dec.dec_icdf(st.pitch_contour_icdf, 8)
        ind.PERIndex = dec.dec_icdf(t["LTP_per_index_iCDF"], 8)
        for k in range(st.nb_subfr):
            ind.LTPIndex[k] = dec.dec_icdf(
                t[f"LTP_gain_iCDF_{ind.PERIndex}"], 8
            )
        if cond_coding == CODE_INDEPENDENTLY:
            ind.LTP_scaleIndex = dec.dec_icdf(t["LTPscale_iCDF"], 8)
        else:
            ind.LTP_scaleIndex = 0
    st.ec_prevSignalType = ind.signalType
    ind.Seed = dec.dec_icdf(t["uniform4_iCDF"], 8)


def decode_parameters(st: ChannelState, cond_coding):
    t = ST.tables()
    ind = st.indices
    gains, st.LastGainIndex = gains_dequant(
        ind.GainsIndices, st.LastGainIndex,
        cond_coding == CODE_CONDITIONALLY, st.nb_subfr,
    )
    nlsf = nlsf_decode(ind.NLSFIndices, st.nlsf_cb)
    pred1 = nlsf2a(nlsf, st.LPC_order)
    if st.first_frame_after_reset:
        ind.NLSFInterpCoef_Q2 = 4
    if ind.NLSFInterpCoef_Q2 < 4:
        nlsf0 = [
            st.prevNLSF_Q15[i]
            + ((ind.NLSFInterpCoef_Q2 * (nlsf[i] - st.prevNLSF_Q15[i])) >> 2)
            for i in range(st.LPC_order)
        ]
        pred0 = nlsf2a(nlsf0, st.LPC_order)
    else:
        pred0 = list(pred1)
    st.prevNLSF_Q15[: st.LPC_order] = nlsf

    pitchL = [0] * st.nb_subfr
    ltp_coef_q14 = [0] * (LTP_ORDER * st.nb_subfr)
    ltp_scale_q14 = 0
    if ind.signalType == TYPE_VOICED:
        pitchL = decode_pitch(
            ind.lagIndex, ind.contourIndex, st.fs_kHz, st.nb_subfr
        )
        cbk = t[f"LTP_vq_Q7_{ind.PERIndex}"]
        sz = cbk.shape[0]
        for k in range(st.nb_subfr):
            for i in range(LTP_ORDER):
                ltp_coef_q14[k * LTP_ORDER + i] = (
                    int(cbk[ind.LTPIndex[k]][i]) << 7
                )
        ltp_scale_q14 = int(t["LTPScales_table_Q14"][ind.LTP_scaleIndex])
    return dict(
        gains=gains, pred0=pred0, pred1=pred1, pitchL=pitchL,
        ltp_coef=ltp_coef_q14, ltp_scale=ltp_scale_q14,
    )


def lpc_analysis_filter(x, B, length, d):
    """Whitening filter (reference: LPC_analysis_filter.c:76-103):
    out = SAT16(ROUND((in << 12) - sum(in[-1-j] * B[j]), 12))."""
    out = [0] * length
    for ix in range(d, length):
        s = smulbb(x[ix - 1], B[0])
        for j in range(1, d):
            s = i32(s + smulbb(x[ix - 1 - j], B[j]))
        v = i32((x[ix] << 12) - s)
        out[ix] = sat16(rshift_round(v, 12))
    return out


def decode_core(st: ChannelState, params, pulses):
    ind = st.indices
    t = ST.tables()
    offset_q10 = int(
        t["Quantization_Offsets_Q10"][ind.signalType >> 1][
            ind.quantOffsetType
        ]
    )
    nlsf_interp_flag = 1 if ind.NLSFInterpCoef_Q2 < 4 else 0

    rand_seed = ind.Seed
    exc_q14 = [0] * st.frame_length
    for i in range(st.frame_length):
        rand_seed = silk_rand(rand_seed)
        v = pulses[i] << 14
        if v > 0:
            v -= ST.QUANT_LEVEL_ADJUST_Q10 << 4
        elif v < 0:
            v += ST.QUANT_LEVEL_ADJUST_Q10 << 4
        v += offset_q10 << 4
        if rand_seed < 0:
            v = -v
        exc_q14[i] = v
        rand_seed = i32(rand_seed + pulses[i])
    st.exc_Q14 = exc_q14

    sLPC = list(st.sLPC_Q14_buf) + [0] * st.subfr_length
    sLTP = [0] * st.ltp_mem_length
    sLTP_Q15 = [0] * (st.ltp_mem_length + st.frame_length)
    xq = [0] * st.frame_length
    sLTP_buf_idx = st.ltp_mem_length
    lag = 0
    for k in range(st.nb_subfr):
        A_Q12 = params["pred0"] if (k >> 1) == 0 else params["pred1"]
        B_Q14 = params["ltp_coef"][k * LTP_ORDER:(k + 1) * LTP_ORDER]
        signal_type = ind.signalType
        gain_q10 = params["gains"][k] >> 6
        inv_gain_q31 = inverse32_varq(params["gains"][k], 47)
        if params["gains"][k] != st.prev_gain_Q16:
            gain_adj_q16 = div32_varq(st.prev_gain_Q16, params["gains"][k], 16)
            for i in range(MAX_LPC_ORDER):
                sLPC[i] = smulww(gain_adj_q16, sLPC[i])
        else:
            gain_adj_q16 = 1 << 16
        st.prev_gain_Q16 = params["gains"][k]

        if signal_type == TYPE_VOICED:
            lag = params["pitchL"][k]
            if k == 0 or (k == 2 and nlsf_interp_flag):
                start_idx = (
                    st.ltp_mem_length - lag - st.LPC_order - LTP_ORDER // 2
                )
                if k == 2:
                    st.outBuf[st.ltp_mem_length:
                              st.ltp_mem_length + 2 * st.subfr_length] = (
                        xq[:2 * st.subfr_length]
                    )
                filt = lpc_analysis_filter(
                    st.outBuf[start_idx + k * st.subfr_length:
                              start_idx + k * st.subfr_length
                              + (st.ltp_mem_length - start_idx)],
                    A_Q12, st.ltp_mem_length - start_idx, st.LPC_order,
                )
                sLTP[start_idx:st.ltp_mem_length] = filt
                if k == 0:
                    inv_gain_q31 = i32(
                        smulwb(inv_gain_q31, params["ltp_scale"]) << 2
                    )
                for i in range(lag + LTP_ORDER // 2):
                    sLTP_Q15[sLTP_buf_idx - i - 1] = smulwb(
                        inv_gain_q31, sLTP[st.ltp_mem_length - i - 1]
                    )
            else:
                if gain_adj_q16 != 1 << 16:
                    for i in range(lag + LTP_ORDER // 2):
                        sLTP_Q15[sLTP_buf_idx - i - 1] = smulww(
                            gain_adj_q16, sLTP_Q15[sLTP_buf_idx - i - 1]
                        )

        if signal_type == TYPE_VOICED:
            pred_base = sLTP_buf_idx - lag + LTP_ORDER // 2
            res_q14 = [0] * st.subfr_length
            for i in range(st.subfr_length):
                p = pred_base + i
                # C int32 addition wraps on overflow at every SMLAWB step
                # (hot signals rely on this; see silk_SMLAWB in macros.h).
                ltp_pred = 2
                ltp_pred = i32(smlawb(ltp_pred, sLTP_Q15[p], B_Q14[0]))
                ltp_pred = i32(smlawb(ltp_pred, sLTP_Q15[p - 1], B_Q14[1]))
                ltp_pred = i32(smlawb(ltp_pred, sLTP_Q15[p - 2], B_Q14[2]))
                ltp_pred = i32(smlawb(ltp_pred, sLTP_Q15[p - 3], B_Q14[3]))
                ltp_pred = i32(smlawb(ltp_pred, sLTP_Q15[p - 4], B_Q14[4]))
                res = i32(exc_q14[k * st.subfr_length + i]
                          + i32(ltp_pred << 1))
                res_q14[i] = res
                sLTP_Q15[sLTP_buf_idx] = i32(res << 1)
                sLTP_buf_idx += 1
        else:
            res_q14 = exc_q14[k * st.subfr_length:(k + 1) * st.subfr_length]

        d = st.LPC_order
        for i in range(st.subfr_length):
            pos = MAX_LPC_ORDER + i
            lpc_pred = d >> 1
            for j in range(d):
                lpc_pred = i32(smlawb(lpc_pred, sLPC[pos - 1 - j], A_Q12[j]))
            v = i32(res_q14[i] + i32(i32(lpc_pred) << 4))
            sLPC[pos] = v
            xq[k * st.subfr_length + i] = sat16(
                rshift_round(smulww(v, gain_q10), 8)
            )
        sLPC = sLPC[st.subfr_length:st.subfr_length + MAX_LPC_ORDER] + [
            0
        ] * st.subfr_length

    st.sLPC_Q14_buf = sLPC[:MAX_LPC_ORDER]
    return xq


def decode_frame(st: ChannelState, dec, cond_coding):
    decode_indices(st, dec, st.nFramesDecoded, 0, cond_coding)
    pulses = decode_pulses(
        dec, st.indices.signalType, st.indices.quantOffsetType,
        st.frame_length,
    )
    params = decode_parameters(st, cond_coding)
    xq = decode_core(st, params, pulses)
    st.lossCnt = 0
    st.prevSignalType = st.indices.signalType
    st.first_frame_after_reset = 0
    # Update output buffer (decode_frame.c:  memmove + memcpy)
    mv = st.ltp_mem_length - st.frame_length
    st.outBuf[:mv] = st.outBuf[st.frame_length:st.ltp_mem_length]
    st.outBuf[mv:mv + st.frame_length] = xq
    st.lagPrev = params["pitchL"][st.nb_subfr - 1]
    return xq


# --------------------------------------------------------------------------
# Stereo (reference: stereo_decode_pred.c, stereo_MS_to_LR.c)
# --------------------------------------------------------------------------
def stereo_decode_pred(dec):
    t = ST.tables()
    n = dec.dec_icdf(t["stereo_pred_joint_iCDF"], 8)
    ix = [[0, 0, 0], [0, 0, 0]]
    ix[0][2] = n // 5
    ix[1][2] = n - 5 * ix[0][2]
    for ch in range(2):
        ix[ch][0] = dec.dec_icdf(t["uniform3_iCDF"], 8)
        ix[ch][1] = dec.dec_icdf(t["uniform5_iCDF"], 8)
    pred = [0, 0]
    quant = t["stereo_pred_quant_Q13"]
    for ch in range(2):
        ix[ch][0] += 3 * ix[ch][2]
        low = int(quant[ix[ch][0]])
        step = smulwb(int(quant[ix[ch][0] + 1]) - low,
                      int(0.5 / 5 * 65536 + 0.5))  # STEREO_QUANT_SUB_STEPS=5
        pred[ch] = smlabb(low, step, 2 * ix[ch][1] + 1)
    pred[0] -= pred[1]
    return pred


def stereo_ms_to_lr(state, x1, x2, pred_q13, fs_khz, frame_length):
    """In-place MS->LR; x1/x2 have 2 history samples prepended."""
    x1[:2] = state["sMid"]
    x2[:2] = state["sSide"]
    state["sMid"] = list(x1[frame_length:frame_length + 2])
    state["sSide"] = list(x2[frame_length:frame_length + 2])
    pred0 = state["pred_prev_Q13"][0]
    pred1 = state["pred_prev_Q13"][1]
    denom_q16 = (1 << 16) // (ST.STEREO_INTERP_LEN_MS * fs_khz)
    delta0 = rshift_round(
        smulbb(pred_q13[0] - state["pred_prev_Q13"][0], denom_q16), 16
    )
    delta1 = rshift_round(
        smulbb(pred_q13[1] - state["pred_prev_Q13"][1], denom_q16), 16
    )
    interp_len = ST.STEREO_INTERP_LEN_MS * fs_khz
    for n in range(interp_len):
        pred0 += delta0
        pred1 += delta1
        s = ((x1[n] + x1[n + 2] + 2 * x1[n + 1]) << 9)
        s = smlawb(i32(x2[n + 1] << 8), s, pred0)
        s = smlawb(s, i32(x1[n + 1] << 11), pred1)
        x2[n + 1] = sat16(rshift_round(s, 8))
    pred0 = pred_q13[0]
    pred1 = pred_q13[1]
    for n in range(interp_len, frame_length):
        s = ((x1[n] + x1[n + 2] + 2 * x1[n + 1]) << 9)
        s = smlawb(i32(x2[n + 1] << 8), s, pred0)
        s = smlawb(s, i32(x1[n + 1] << 11), pred1)
        x2[n + 1] = sat16(rshift_round(s, 8))
    state["pred_prev_Q13"] = list(pred_q13)
    for n in range(frame_length):
        ssum = x1[n + 1] + x2[n + 1]
        diff = x1[n + 1] - x2[n + 1]
        x1[n + 1] = sat16(ssum)
        x2[n + 1] = sat16(diff)


# --------------------------------------------------------------------------
# Top-level decoder (reference: dec_API.c silk_Decode)
# --------------------------------------------------------------------------
class SilkDecoder:
    def __init__(self, channels: int):
        self.nChannelsAPI = channels
        self.nChannelsInternal = 0
        self.channel_state = [ChannelState(), ChannelState()]
        self.stereo = dict(
            pred_prev_Q13=[0, 0], sMid=[0, 0], sSide=[0, 0]
        )
        self.prev_decode_only_middle = 0

    def decode(self, dec: RangeDecoder, n_channels_internal, internal_rate,
               payload_ms, total_ms, fec=False):
        """Decode all SILK frames of one Opus frame; returns float array
        [samples@48k, nChannelsAPI] scaled like int16 (caller divides by
        32768, matching opus_decoder_clean.c:519).

        fec=True decodes the packet's LBRR frame instead (the
        low-bitrate re-encode of the PREVIOUS frame — dec_API.c
        lostFlag=FLAG_DECODE_LBRR): used to recover a lost packet from
        the one after it."""
        out_chunks = []
        remaining_ms = payload_ms
        first = True
        while remaining_ms > 0:
            chunk_ms = 20 if payload_ms >= 20 else payload_ms
            out = self._decode_one(
                dec, n_channels_internal, internal_rate,
                payload_ms, first, fec=fec,
            )
            out_chunks.append(out)
            remaining_ms -= chunk_ms
            first = False
            if fec:
                break               # one LBRR frame per recovery call
        return np.concatenate(out_chunks, axis=0)

    def _decode_one(self, dec, n_channels_internal, internal_rate,
                    payload_ms, new_packet, fec=False):
        cs = self.channel_state
        ms_pred_q13 = [0, 0]
        decode_only_middle = 0

        if new_packet:
            for n in range(n_channels_internal):
                cs[n].nFramesDecoded = 0
        if n_channels_internal > self.nChannelsInternal:
            cs[1] = ChannelState()

        if cs[0].nFramesDecoded == 0:
            for n in range(n_channels_internal):
                if payload_ms in (0, 10):
                    cs[n].nFramesPerPacket = 1
                    cs[n].nb_subfr = 2
                elif payload_ms == 20:
                    cs[n].nFramesPerPacket = 1
                    cs[n].nb_subfr = 4
                elif payload_ms == 40:
                    cs[n].nFramesPerPacket = 2
                    cs[n].nb_subfr = 4
                elif payload_ms == 60:
                    cs[n].nFramesPerPacket = 3
                    cs[n].nb_subfr = 4
                else:
                    raise DecodeError("invalid SILK payload size")
                fs_khz = (internal_rate >> 10) + 1
                cs[n].set_fs(fs_khz, 48000)

        if (self.nChannelsAPI == 2 and n_channels_internal == 2
                and (self.nChannelsAPI_prev() == 1
                     or self.nChannelsInternal == 1)):
            self.stereo["pred_prev_Q13"] = [0, 0]
            self.stereo["sSide"] = [0, 0]
            cs[1].resampler = _copy_resampler(cs[0].resampler)
        self.nChannelsInternal = n_channels_internal

        t = ST.tables()
        if cs[0].nFramesDecoded == 0:
            for n in range(n_channels_internal):
                for i in range(cs[n].nFramesPerPacket):
                    cs[n].VAD_flags[i] = dec.dec_bit_logp(1)
                cs[n].LBRR_flag = dec.dec_bit_logp(1)
            for n in range(n_channels_internal):
                cs[n].LBRR_flags = [0] * 3
                if cs[n].LBRR_flag:
                    if cs[n].nFramesPerPacket == 1:
                        cs[n].LBRR_flags[0] = 1
                    else:
                        key = (
                            "LBRR_flags_2_iCDF"
                            if cs[n].nFramesPerPacket == 2
                            else "LBRR_flags_3_iCDF"
                        )
                        sym = dec.dec_icdf(t[key], 8) + 1
                        for i in range(cs[n].nFramesPerPacket):
                            cs[n].LBRR_flags[i] = (sym >> i) & 1
            # LBRR data: skipped on the normal path; on an FEC
            # recovery call the first LBRR frame is decoded fully
            # (dec_API.c FLAG_DECODE_LBRR) and returned below
            fec_xq = [None, None]
            fec_pred_q13 = [0, 0]
            for i in range(cs[0].nFramesPerPacket):
                for n in range(n_channels_internal):
                    if cs[n].LBRR_flags[i]:
                        if n_channels_internal == 2 and n == 0:
                            pred = stereo_decode_pred(dec)
                            if i == 0:
                                fec_pred_q13 = pred
                            if cs[1].LBRR_flags[i] == 0:
                                dec.dec_icdf(
                                    t["stereo_only_code_mid_iCDF"], 8
                                )
                        cond = (
                            CODE_CONDITIONALLY
                            if (i > 0 and cs[n].LBRR_flags[i - 1])
                            else CODE_INDEPENDENTLY
                        )
                        decode_indices(st=cs[n], dec=dec, frame_index=i,
                                       decode_lbrr=1, cond_coding=cond)
                        pulses = decode_pulses(
                            dec, cs[n].indices.signalType,
                            cs[n].indices.quantOffsetType,
                            cs[n].frame_length,
                        )
                        if fec and i == 0 and fec_xq[n] is None:
                            params = decode_parameters(cs[n], cond)
                            fec_xq[n] = decode_core(cs[n], params,
                                                    pulses)
                            cs[n].lossCnt = 0
                            cs[n].prevSignalType = \
                                cs[n].indices.signalType
                            cs[n].first_frame_after_reset = 0
                            mv = (cs[n].ltp_mem_length
                                  - cs[n].frame_length)
                            cs[n].outBuf[:mv] = cs[n].outBuf[
                                cs[n].frame_length:cs[n].ltp_mem_length]
                            cs[n].outBuf[mv:mv + cs[n].frame_length] = \
                                fec_xq[n]
                            cs[n].lagPrev = params["pitchL"][
                                cs[n].nb_subfr - 1]
            if fec:
                if fec_xq[0] is None:
                    raise DecodeError("packet carries no LBRR data")
                frame_len = cs[0].frame_length
                n_out = frame_len * 48 // cs[0].fs_kHz
                result = np.zeros((n_out, self.nChannelsAPI))
                if (self.nChannelsAPI == 2 and n_channels_internal == 2
                        and fec_xq[1] is not None):
                    samples1 = [[0] * (frame_len + 2) for _ in range(2)]
                    samples1[0][2:2 + frame_len] = fec_xq[0]
                    samples1[1][2:2 + frame_len] = fec_xq[1]
                    stereo_ms_to_lr(self.stereo, samples1[0],
                                    samples1[1], fec_pred_q13,
                                    cs[0].fs_kHz, frame_len)
                    for n in range(2):
                        res = cs[n].resampler.process(
                            samples1[n][1:1 + frame_len])
                        result[:, n] = res[:n_out]
                        cs[n].nFramesDecoded += 1
                    return result
                # mono: mirror the regular path's one-sample sMid
                # delay (samples1[0][1:1+frame_len], 2-sample carry)
                xq = fec_xq[0]
                seq = [self.stereo["sMid"][1]] + list(xq[:-1])
                self.stereo["sMid"] = [
                    xq[frame_len - 2], xq[frame_len - 1]]
                res = cs[0].resampler.process(seq)
                for c in range(self.nChannelsAPI):
                    result[:, c] = res[:n_out]
                cs[0].nFramesDecoded += 1
                return result

        if n_channels_internal == 2:
            ms_pred_q13 = stereo_decode_pred(dec)
            if cs[1].VAD_flags[cs[0].nFramesDecoded] == 0:
                decode_only_middle = dec.dec_icdf(
                    t["stereo_only_code_mid_iCDF"], 8
                )
            else:
                decode_only_middle = 0

        if (n_channels_internal == 2 and decode_only_middle == 0
                and self.prev_decode_only_middle == 1):
            cs[1].outBuf = [0] * len(cs[1].outBuf)
            cs[1].sLPC_Q14_buf = [0] * MAX_LPC_ORDER
            cs[1].lagPrev = 100
            cs[1].LastGainIndex = 10
            cs[1].prevSignalType = TYPE_NO_VOICE_ACTIVITY
            cs[1].first_frame_after_reset = 1

        has_side = not decode_only_middle
        frame_len = cs[0].frame_length
        samples1 = [[0] * (frame_len + 2) for _ in range(2)]
        for n in range(n_channels_internal):
            if n == 0 or has_side:
                fi = cs[0].nFramesDecoded - n
                if fi <= 0:
                    cond = CODE_INDEPENDENTLY
                elif n > 0 and self.prev_decode_only_middle:
                    cond = CODE_INDEPENDENTLY_NO_LTP_SCALING
                else:
                    cond = CODE_CONDITIONALLY
                xq = decode_frame(cs[n], dec, cond)
                samples1[n][2:2 + frame_len] = xq
            cs[n].nFramesDecoded += 1

        if self.nChannelsAPI == 2 and n_channels_internal == 2:
            stereo_ms_to_lr(
                self.stereo, samples1[0], samples1[1], ms_pred_q13,
                cs[0].fs_kHz, frame_len,
            )
        else:
            samples1[0][0:2] = self.stereo["sMid"]
            self.stereo["sMid"] = list(
                samples1[0][frame_len:frame_len + 2]
            )

        n_out = frame_len * 48 // cs[0].fs_kHz
        result = np.zeros((n_out, self.nChannelsAPI))
        for n in range(min(self.nChannelsAPI, n_channels_internal)):
            res = cs[n].resampler.process(samples1[n][1:1 + frame_len])
            result[:, n] = res[:n_out]
        if self.nChannelsAPI == 2 and n_channels_internal == 1:
            result[:, 1] = result[:, 0]
        self.prev_decode_only_middle = decode_only_middle
        return result

    def nChannelsAPI_prev(self):
        return self.nChannelsAPI


def _copy_resampler(r: Resampler) -> Resampler:
    return copy.deepcopy(r)


# --------------------------------------------------------------------------
# Native decoder (native/silk_dec.c): same bit-exact fixed-point decode,
# state held behind an opaque C handle; only the range-coder state crosses
# the boundary (10 int64s, the celt.py _ec_pack layout). The pure-Python
# SilkDecoder above remains the fallback and the spec.
# --------------------------------------------------------------------------

_NATIVE = None          # (lib, keepalive-dict) once initialised
_NATIVE_TRIED = False
_NATIVE_LOCK = None


def _native_lock():
    global _NATIVE_LOCK
    if _NATIVE_LOCK is None:
        import threading

        _NATIVE_LOCK = threading.Lock()
    return _NATIVE_LOCK

# Table order contracts with native/silk_dec.c (enum TU8_* / T32_*).
_U8_TABLES = [
    "type_offset_VAD_iCDF", "type_offset_no_VAD_iCDF", "gain_iCDF",
    "delta_gain_iCDF", "uniform3_iCDF", "uniform4_iCDF", "uniform5_iCDF",
    "uniform6_iCDF", "uniform8_iCDF", "NLSF_interp_iCDF", "NLSF_EXT_iCDF",
    "pitch_delta_iCDF", "pitch_lag_iCDF", "pitch_contour_iCDF",
    "pitch_contour_10ms_iCDF", "pitch_contour_NB_iCDF",
    "pitch_contour_10ms_NB_iCDF", "LTP_per_index_iCDF",
    "LTP_gain_iCDF_0", "LTP_gain_iCDF_1", "LTP_gain_iCDF_2",
    "LTPscale_iCDF", "LBRR_flags_2_iCDF", "LBRR_flags_3_iCDF",
    "rate_levels_iCDF", "pulses_per_block_iCDF", "lsb_iCDF", "sign_iCDF",
    "shell_code_table0", "shell_code_table1", "shell_code_table2",
    "shell_code_table3", "stereo_pred_joint_iCDF",
    "stereo_only_code_mid_iCDF",
]
_I32_TABLES = [
    "LTPScales_table_Q14", "LTP_vq_Q7_0", "LTP_vq_Q7_1", "LTP_vq_Q7_2",
    "CB_lags_stage2", "CB_lags_stage2_10ms", "CB_lags_stage3",
    "CB_lags_stage3_10ms", "Quantization_Offsets_Q10",
    "stereo_pred_quant_Q13", "LSFCosTab_FIX_Q12",
]


def _native_silk():
    """Load the native library and hand it the normative tables once
    (locked: silk_set_tables writes C globals, and concurrent serving
    threads must not race the one-time setup)."""
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    with _native_lock():
        return _native_silk_locked()


def _native_silk_locked():
    global _NATIVE, _NATIVE_TRIED
    if _NATIVE_TRIED:
        return _NATIVE
    _NATIVE_TRIED = True
    import os

    if os.environ.get("LIBNYQUIST_NO_NATIVE_SILK"):
        return None
    from ...runtime.native import lib
    from .silk_tables import nlsf_cb_nb_mb, nlsf_cb_wb

    L = lib()
    if L is None or not hasattr(L, "silk_decode"):
        return None
    import ctypes

    t = ST.tables()
    u8_parts = [np.ascontiguousarray(t[n], np.uint8).ravel()
                for n in _U8_TABLES]
    for cb in (nlsf_cb_wb(), nlsf_cb_nb_mb()):
        u8_parts.append(np.ascontiguousarray(cb.CB1_iCDF, np.uint8).ravel())
        u8_parts.append(np.ascontiguousarray(cb.ec_iCDF, np.uint8).ravel())
    i32_parts = [np.ascontiguousarray(t[n], np.int32).ravel()
                 for n in _I32_TABLES]
    for cb in (nlsf_cb_wb(), nlsf_cb_nb_mb()):
        i32_parts.append(np.array(
            [cb.nVectors, cb.order, cb.quantStepSize_Q16,
             cb.invQuantStepSize_Q6], np.int32))
        i32_parts.append(
            np.ascontiguousarray(cb.CB1_NLSF_Q8, np.int32).ravel())
        i32_parts.append(np.ascontiguousarray(cb.pred_Q8, np.int32).ravel())
        i32_parts.append(np.ascontiguousarray(cb.ec_sel, np.int32).ravel())
        i32_parts.append(
            np.ascontiguousarray(cb.deltaMin_Q15, np.int32).ravel())
    i32_parts.append(
        np.ascontiguousarray(t["shell_code_table_offsets"], np.int32))
    i32_parts.append(np.ascontiguousarray(t["resampler_up2_hq_0"], np.int32))
    i32_parts.append(np.ascontiguousarray(t["resampler_up2_hq_1"], np.int32))
    i32_parts.append(
        np.ascontiguousarray(t["resampler_frac_FIR_12"], np.int32).ravel())

    u8_offs, o = [], 0
    for p in u8_parts:
        u8_offs.append(o)
        o += p.size
    u8_blob = np.concatenate(u8_parts).astype(np.uint8)
    i32_offs, o = [], 0
    for p in i32_parts:
        i32_offs.append(o)
        o += p.size
    i32_blob = np.concatenate(i32_parts).astype(np.int32)
    u8_offs = np.array(u8_offs, np.int64)
    i32_offs = np.array(i32_offs, np.int64)

    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    L.silk_set_tables(
        u8_blob.ctypes.data_as(ctypes.c_char_p),
        u8_offs.ctypes.data_as(i64p), len(u8_parts),
        i32_blob.ctypes.data_as(i32p),
        i32_offs.ctypes.data_as(i64p), len(i32_parts),
    )
    # The C side keeps raw pointers: the blobs must outlive the library.
    _NATIVE = (L, dict(u8=u8_blob, i32=i32_blob,
                       u8o=u8_offs, i32o=i32_offs))
    return _NATIVE


class NativeSilkDecoder:
    """ctypes front for native/silk_dec.c with the SilkDecoder API."""

    def __init__(self, channels: int):
        native = _native_silk()
        if native is None:
            raise RuntimeError("native SILK unavailable")
        self._L = native[0]
        self.nChannelsAPI = channels
        self._h = self._L.silk_create(channels)
        if not self._h:
            raise MemoryError("silk_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            try:
                self._L.silk_free(h)
            except Exception:
                pass
            self._h = None

    def decode(self, dec: RangeDecoder, n_channels_internal, internal_rate,
               payload_ms, total_ms):
        import ctypes

        ch = self.nChannelsAPI
        n_expected = payload_ms * 48
        out = np.zeros(n_expected * ch, np.int16)
        ec = np.array(
            [dec.offs, dec.end_offs, dec.end_window, dec.nend_bits,
             dec.nbits_total, dec.rng, dec.rem, dec.val, dec.ext,
             dec.error], np.int64)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i16p = ctypes.POINTER(ctypes.c_int16)
        n = self._L.silk_decode(
            self._h, dec.buf, dec.storage, ec.ctypes.data_as(i64p),
            int(n_channels_internal), int(internal_rate), int(payload_ms),
            out.ctypes.data_as(i16p),
        )
        if n < 0:
            raise DecodeError("native SILK decode failed")
        (dec.offs, dec.end_offs, dec.end_window, dec.nend_bits,
         dec.nbits_total, dec.rng, dec.rem, dec.val, dec.ext,
         dec.error) = ec.tolist()
        return out[: n * ch].reshape(n, ch).astype(np.float64)

    def conceal(self, n_channels_internal, internal_rate, payload_ms,
                total_ms):
        """Packet-loss concealment for one lost SILK packet duration
        (reference silk/PLC.c + CNG.c via native silk_decode_lost);
        caller passes the last good packet's configuration."""
        import ctypes

        ch = self.nChannelsAPI
        n_expected = payload_ms * 48
        out = np.zeros(n_expected * ch, np.int16)
        i16p = ctypes.POINTER(ctypes.c_int16)
        n = self._L.silk_decode_lost(
            self._h, int(n_channels_internal), int(internal_rate),
            int(payload_ms), out.ctypes.data_as(i16p),
        )
        if n < 0:
            raise DecodeError("native SILK conceal failed")
        return out[: n * ch].reshape(n, ch).astype(np.float64)


def make_silk_decoder(channels: int):
    """Native decoder when available, pure-Python fallback otherwise."""
    if _native_silk() is not None:
        return NativeSilkDecoder(channels)
    return SilkDecoder(channels)
