"""SILK encoder: mono wideband speech -> SILK-only Opus packets.

Original encoder built against this package's own bit-exact SILK
decoder spec (formats/opus/silk.py) rather than ported from the
reference encoder (reference: third_party/opus/silk/enc_API.c and the
float/ pipeline).  The bitstream contract is the decoder's symbol
sequence (silk.py decode_indices / decode_pulses, RFC 6716 §4.2); the
parameter SEARCH is original:

  * LPC analysis: Hann-windowed autocorrelation + Levinson-Durbin per
    20 ms frame (order 16), bandwidth-expanded; A(z) -> NLSF via
    numpy root-finding on the P/Q sum/difference polynomials (the
    reference's A2NLSF.c fixed-point bisection is not needed host-side
    — only the DEQUANTIZED filter must match the decoder, and that is
    reproduced with the decoder's own nlsf_decode/nlsf2a).
  * NLSF quantization: exact search over all 32 stage-1 codebook
    vectors; per-coefficient backward-recursive residual quantization
    mirroring silk.py nlsf_residual_dequant (same prediction, step and
    level-adjust constants), scored by Laroia-weighted error on the
    fully dequantized result.
  * Gains: per-subframe closed search over the decoder's exact
    gains_dequant recursion (absolute + delta index forms).
  * Excitation: closed-loop predictive quantization — each sample is
    quantized against the decoder's reconstruction (LPC synthesis of
    the DEQUANTIZED excitation), replicating the decoder's dither/sign
    LCG chain, quantization offset and level adjust, with the
    per-shell-block pulse budget (MAX_PULSES) enforced in-loop.
    Frames are coded as unvoiced (no LTP) — the reference's pitch
    analysis / LTP quantization is a quality refinement on top of this
    valid bitstream surface.
  * Entropy coding: the package range encoder (range_coder.py), same
    iCDF tables the decoder reads (silk_tables.py).

Frames are 20 ms WB (TOC config 9), one frame per packet, VAD active,
no LBRR.  Output validated by round-trip through this package's
decoder AND the reference's own libopus build (tests/test_encoders.py).
"""

from __future__ import annotations

import numpy as np

from . import silk as S
from . import silk_tables as ST
from .range_coder import RangeEncoder

LPC_ORDER = 16
FS_KHZ = 16
FRAME_MS = 20
SUBFR = 4
SUBFR_LEN = 5 * FS_KHZ          # 80 samples @16 kHz
FRAME_LEN = SUBFR * SUBFR_LEN   # 320
TYPE_UNVOICED = 1


# ----------------------------------------------------------------------
# LPC analysis
# ----------------------------------------------------------------------

def _levinson(r):
    """Levinson-Durbin: autocorrelation -> predictor coeffs p with
    x[n] ~= sum_j p[j] x[n-1-j]."""
    d = len(r) - 1
    a = np.zeros(d)
    e = r[0]
    for i in range(d):
        acc = r[i + 1] - np.dot(a[:i], r[i:0:-1][:i])
        k = acc / e if e > 1e-12 else 0.0
        k = float(np.clip(k, -0.999, 0.999))
        a[:i], a[i] = a[:i] - k * a[:i][::-1], k
        e *= (1.0 - k * k)
        if e < 1e-12:
            break
    return a


def _a2nlsf_q15(a):
    """Predictor -> line spectral frequencies (Q15 of w/pi).

    P(z) = A(z) + z^-(d+1) A(1/z), Q(z) = A(z) - z^-(d+1) A(1/z) with
    A(z) = 1 - sum p_j z^-j; their roots interleave on the unit circle
    (reference: silk/A2NLSF.c — implemented here with numpy roots)."""
    d = len(a)
    A = np.concatenate([[1.0], -a])             # A(z) coeffs, z^0..z^-d
    P = np.concatenate([A, [0.0]]) + np.concatenate([[0.0], A[::-1]])
    Q = np.concatenate([A, [0.0]]) - np.concatenate([[0.0], A[::-1]])
    ws = []
    for poly in (P, Q):
        r = np.roots(poly)
        ang = np.angle(r[np.abs(np.abs(r) - 1.0) < 0.1])
        ang = ang[(ang > 1e-4) & (ang < np.pi - 1e-4)]
        ws.append(np.sort(np.unique(np.round(ang, 9))))
    lsf = np.sort(np.concatenate(ws))[:d]
    if len(lsf) < d:        # degenerate frame: spread evenly
        lsf = (np.arange(1, d + 1) / (d + 1)) * np.pi
    q15 = np.clip((lsf / np.pi) * 32768.0, 1, 32766).astype(np.int64)
    return q15.tolist()


# ----------------------------------------------------------------------
# Quantizer searches (exact inverses of the decoder recursions)
# ----------------------------------------------------------------------

def _gain_table_q16():
    t = []
    for pi in range(ST.N_LEVELS_QGAIN):
        t.append(S.silk_log2lin(
            min(S.smulwb(ST.GAIN_INV_SCALE_Q16, pi) + ST.GAIN_OFFSET,
                3967)))
    return np.asarray(t, np.int64)


_GAINS_Q16 = None


def _quant_gains(targets_q16, prev_ind, conditional):
    """Choose GainsIndices so the decoder's gains_dequant lands nearest
    each per-subframe target gain (log-domain distance)."""
    global _GAINS_Q16
    if _GAINS_Q16 is None:
        _GAINS_Q16 = _gain_table_q16()
    tbl = _GAINS_Q16
    inds = []
    pi = prev_ind
    lt = np.log2(np.maximum(tbl, 1))
    n_delta = len(ST.tables()["delta_gain_iCDF"]) - 1
    for k, tgt in enumerate(targets_q16):
        want = float(np.log2(max(tgt, 1)))
        if k == 0 and not conditional:
            d = int(np.argmin(np.abs(lt - want)))
            ind = d
            pi = max(ind, pi - 16)
        else:
            best, ind = None, 0
            for cand in range(n_delta + 1):
                ind_tmp = cand + ST.MIN_DELTA_GAIN_QUANT
                dsst = (2 * ST.MAX_DELTA_GAIN_QUANT
                        - ST.N_LEVELS_QGAIN + pi)
                npi = pi + ((ind_tmp << 1) - dsst
                            if ind_tmp > dsst else ind_tmp)
                npi = S.limit(npi, 0, ST.N_LEVELS_QGAIN - 1)
                err = abs(float(lt[npi]) - want)
                # bias toward small deltas (cheaper symbols)
                err += 0.01 * abs(cand - 4)
                if best is None or err < best:
                    best, ind, keep = err, cand, npi
            pi = keep
        pi = S.limit(pi, 0, ST.N_LEVELS_QGAIN - 1)
        inds.append(ind)
    gains, last = S.gains_dequant(inds, prev_ind, conditional, SUBFR)
    return inds, gains, last


def _quant_nlsf(nlsf_q15, cb, signal_type):
    """Stage-1 + residual NLSF quantization, mirrored on the decoder's
    nlsf_residual_dequant recursion; returns (indices, dequantized
    nlsf)."""
    order = cb.order
    target = np.asarray(nlsf_q15, np.int64)
    w_t = np.asarray(S.nlsf_vq_weights_laroia(target.tolist(), order),
                     np.float64)
    step_q16 = cb.quantStepSize_Q16
    best = None
    cb1_nlsf = np.asarray(cb.CB1_NLSF_Q8, np.int64)
    # rank stage-1 candidates by weighted base distance, search top 8
    base_all = cb1_nlsf.astype(np.int64) << 7
    d = ((base_all - target[None, :]) ** 2 * w_t[None, :]).sum(axis=1)
    for cb1 in np.argsort(d)[:8]:
        cb1 = int(cb1)
        base = base_all[cb1]
        ec_ix, pred_q8 = S.nlsf_unpack(cb, cb1)
        w = S.nlsf_vq_weights_laroia(base.tolist(), order)
        wq9 = [S.sqrt_approx(w[i] << (18 - ST.NLSF_W_Q))
               for i in range(order)]
        res_des = [
            int(round((int(target[i] - base[i]) * wq9[i]) / (1 << 14)))
            for i in range(order)
        ]
        idxs = [0] * order
        out_next = 0
        for i in range(order - 1, -1, -1):
            pred_q10 = (out_next * S.i16(pred_q8[i])) >> 8
            lvl = ((res_des[i] - pred_q10) << 16) // max(step_q16, 1)
            cand0 = int(round(lvl / 1024.0))
            cbest, obest, ebest = 0, pred_q10, abs(res_des[i] - pred_q10)
            for c in {cand0 - 1, cand0, cand0 + 1, 0}:
                c = S.limit(c, -ST.NLSF_QUANT_MAX_AMPLITUDE - 4,
                            ST.NLSF_QUANT_MAX_AMPLITUDE + 4)
                o = c << 10
                if o > 0:
                    o = S.i16(o - ST.NLSF_QUANT_LEVEL_ADJ_Q10)
                elif o < 0:
                    o = S.i16(o + ST.NLSF_QUANT_LEVEL_ADJ_Q10)
                o = S.smlawb(pred_q10, o, step_q16)
                e = abs(res_des[i] - o)
                if e < ebest:
                    cbest, obest, ebest = c, o, e
            idxs[i] = cbest
            out_next = obest
        indices = [cb1] + idxs
        deq = S.nlsf_decode(indices, cb)
        err = float((((np.asarray(deq) - target) ** 2) * w_t).sum())
        if best is None or err < best[0]:
            best = (err, indices, deq)
    return best[1], best[2]


# ----------------------------------------------------------------------
# Entropy coding (mirror of silk.py decode_indices / decode_pulses)
# ----------------------------------------------------------------------

def _enc_split(enc, c1, p, table, offsets):
    if p > 0:
        enc.enc_icdf(c1, table[int(offsets[p]):], 8)


def _shell_encoder(enc, q):
    t0, t1, t2, t3, offs = S._shell_tables()

    def s(lo, n):
        return int(np.sum(np.abs(q[lo:lo + n])))

    _enc_split(enc, s(0, 8), s(0, 16), t3, offs)
    _enc_split(enc, s(0, 4), s(0, 8), t2, offs)
    _enc_split(enc, s(0, 2), s(0, 4), t1, offs)
    _enc_split(enc, s(0, 1), s(0, 2), t0, offs)
    _enc_split(enc, s(2, 1), s(2, 2), t0, offs)
    _enc_split(enc, s(4, 2), s(4, 4), t1, offs)
    _enc_split(enc, s(4, 1), s(4, 2), t0, offs)
    _enc_split(enc, s(6, 1), s(6, 2), t0, offs)
    _enc_split(enc, s(8, 4), s(8, 8), t2, offs)
    _enc_split(enc, s(8, 2), s(8, 4), t1, offs)
    _enc_split(enc, s(8, 1), s(8, 2), t0, offs)
    _enc_split(enc, s(10, 1), s(10, 2), t0, offs)
    _enc_split(enc, s(12, 2), s(12, 4), t1, offs)
    _enc_split(enc, s(12, 1), s(12, 2), t0, offs)
    _enc_split(enc, s(14, 1), s(14, 2), t0, offs)


def _icdf_bits(icdf, sym):
    hi = 256 if sym == 0 else int(icdf[sym - 1])
    lo = int(icdf[sym])
    p = max(hi - lo, 1)
    return -np.log2(p / 256.0)


def _encode_pulses(enc, pulses, signal_type, quant_offset_type):
    t = ST.tables()
    q = np.asarray(pulses, np.int64)
    nblk = FRAME_LEN // ST.SHELL_FRAME
    sums = [int(np.abs(q[i * 16:(i + 1) * 16]).sum())
            for i in range(nblk)]
    assert max(sums) <= ST.MAX_PULSES, "pulse budget exceeded"
    # rate level: cheapest total symbol cost (enc_API RATE_LEVEL search)
    costs = []
    for rl in range(ST.N_RATE_LEVELS - 1):
        cdf = t["pulses_per_block_iCDF"][rl]
        costs.append(sum(_icdf_bits(cdf, sp) for sp in sums))
    rl = int(np.argmin(costs))
    enc.enc_icdf(rl, t["rate_levels_iCDF"][signal_type >> 1], 8)
    cdf = t["pulses_per_block_iCDF"][rl]
    for sp in sums:
        enc.enc_icdf(sp, cdf, 8)
    for i in range(nblk):
        if sums[i] > 0:
            _shell_encoder(enc, q[i * 16:(i + 1) * 16])
    # signs
    sign_base = t["sign_iCDF"]
    i0 = 7 * (quant_offset_type + (signal_type << 1))
    for i in range(nblk):
        if sums[i] > 0:
            icdf0 = int(sign_base[i0 + min(sums[i] & 0x1F, 6)])
            icdf = np.asarray([icdf0, 0], np.uint8)
            for j in range(16):
                v = int(q[i * 16 + j])
                if v != 0:
                    enc.enc_icdf(1 if v > 0 else 0, icdf, 8)


# ----------------------------------------------------------------------
# Frame encoder
# ----------------------------------------------------------------------

class SilkEncoderState:
    def __init__(self):
        self.last_gain_index = 10
        self.x_hist = np.zeros(LPC_ORDER)       # input history (int16 dom)
        self.xq_hist = np.zeros(LPC_ORDER)      # reconstruction history
        self.first = True


def _encode_frame(enc: RangeEncoder, st: SilkEncoderState, x):
    """One 20 ms mono WB frame (320 samples, int16 domain floats)."""
    t = ST.tables()
    cb = ST.nlsf_cb_wb()
    signal_type = TYPE_UNVOICED
    quant_offset_type = 0

    # signal type + offset (VAD-active)
    ix = (signal_type << 1) + quant_offset_type
    enc.enc_icdf(ix - 2, t["type_offset_VAD_iCDF"], 8)

    # ---- LPC analysis on the windowed frame ----
    xw = x * np.hanning(FRAME_LEN)
    r = np.correlate(xw, xw, "full")[FRAME_LEN - 1:FRAME_LEN + LPC_ORDER]
    r = r * (1.0 + 1e-4 * np.arange(LPC_ORDER + 1) ** 2)  # lag window
    r[0] *= 1.0 + 1e-3
    r[0] += 1e-2
    a = _levinson(r)
    a *= 0.994 ** (np.arange(LPC_ORDER) + 1)    # bandwidth expansion
    nlsf_tgt = _a2nlsf_q15(a)

    # ---- gains (quantized before NLSF in the bitstream) ----
    aq_probe = np.asarray(a)
    hist = np.concatenate([st.x_hist, x])
    e = np.empty(FRAME_LEN)
    for n in range(FRAME_LEN):
        e[n] = x[n] - np.dot(aq_probe,
                             hist[n + LPC_ORDER - 1::-1][:LPC_ORDER])
    # One frame per packet means every frame is CODE_INDEPENDENTLY in
    # the decoder (nFramesDecoded resets per packet): gains use the
    # absolute form, with LastGainIndex still carried across packets.
    tg = []
    for k in range(SUBFR):
        seg = e[k * SUBFR_LEN:(k + 1) * SUBFR_LEN]
        rms = float(np.sqrt(np.mean(seg ** 2)) + 1.0)
        tg.append(int(min(rms * 1.7 * 65536.0, 2.0 ** 38)))
    g_inds, gains_q16, st.last_gain_index = _quant_gains(
        tg, st.last_gain_index, conditional=False)
    enc.enc_icdf(g_inds[0] >> 3, t["gain_iCDF"][signal_type], 8)
    enc.enc_icdf(g_inds[0] & 7, t["uniform8_iCDF"], 8)
    for k in range(1, SUBFR):
        enc.enc_icdf(g_inds[k], t["delta_gain_iCDF"], 8)

    # ---- NLSF quantization + coding ----
    nlsf_idx, nlsf_deq = _quant_nlsf(nlsf_tgt, cb, signal_type)
    enc.enc_icdf(nlsf_idx[0], cb.CB1_iCDF[signal_type >> 1], 8)
    ec_ix, _pred = S.nlsf_unpack(cb, nlsf_idx[0])
    for i in range(cb.order):
        c = nlsf_idx[i + 1]
        sym = c + ST.NLSF_QUANT_MAX_AMPLITUDE
        tbl = cb.ec_iCDF.reshape(-1)[ec_ix[i]:]
        if c <= -ST.NLSF_QUANT_MAX_AMPLITUDE:
            enc.enc_icdf(0, tbl, 8)
            enc.enc_icdf(-ST.NLSF_QUANT_MAX_AMPLITUDE - c,
                         t["NLSF_EXT_iCDF"], 8)
        elif c >= ST.NLSF_QUANT_MAX_AMPLITUDE:
            enc.enc_icdf(2 * ST.NLSF_QUANT_MAX_AMPLITUDE, tbl, 8)
            enc.enc_icdf(c - ST.NLSF_QUANT_MAX_AMPLITUDE,
                         t["NLSF_EXT_iCDF"], 8)
        else:
            enc.enc_icdf(sym, tbl, 8)
    # 20 ms frame: NLSF interpolation coef (4 = no interpolation)
    enc.enc_icdf(4, t["NLSF_interp_iCDF"], 8)

    # (unvoiced: no pitch/LTP block)
    seed = 0
    enc.enc_icdf(seed, t["uniform4_iCDF"], 8)

    # ---- closed-loop excitation quantization ----
    aq = np.asarray(S.nlsf2a(list(nlsf_deq), LPC_ORDER), np.float64)
    aqf = aq / 4096.0
    offset_q10 = int(t["Quantization_Offsets_Q10"][signal_type >> 1][
        quant_offset_type])
    adj16 = ST.QUANT_LEVEL_ADJUST_Q10 << 4
    off16 = offset_q10 << 4
    pulses = np.zeros(FRAME_LEN, np.int64)
    xq = np.empty(FRAME_LEN)
    hist_q = np.concatenate([st.xq_hist, np.zeros(FRAME_LEN)])
    rand_seed = seed
    budget = 0
    for n in range(FRAME_LEN):
        k = n // SUBFR_LEN
        gain = gains_q16[k] / 65536.0
        if n % ST.SHELL_FRAME == 0:
            budget = ST.MAX_PULSES
        pred = float(np.dot(aqf, hist_q[n + LPC_ORDER - 1::-1]
                            [:LPC_ORDER]))
        resid = x[n] - pred
        vt = resid / max(gain, 1e-9) * 16384.0   # desired exc_Q14
        rand_seed = S.silk_rand(rand_seed)
        flip = rand_seed < 0
        want = -vt if flip else vt
        p0 = int(round((want - off16) / 16384.0))
        best_p, best_err = 0, None
        for p in {p0 - 1, p0, p0 + 1, 0}:
            p = int(np.clip(p, -budget, budget))
            v = p << 14
            if v > 0:
                v -= adj16
            elif v < 0:
                v += adj16
            v += off16
            if flip:
                v = -v
            err = abs(v - vt)
            if best_err is None or err < best_err:
                best_p, best_err, best_v = p, err, v
        pulses[n] = best_p
        budget -= abs(best_p)
        rand_seed = S.i32(rand_seed + best_p)
        xq[n] = pred + best_v / 16384.0 * gain
        hist_q[n + LPC_ORDER] = xq[n]

    _encode_pulses(enc, pulses, signal_type, quant_offset_type)

    st.x_hist = x[-LPC_ORDER:].copy()
    st.xq_hist = hist_q[-LPC_ORDER:].copy()
    st.first = False


def encode_ogg_opus_silk(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode mono float32 [-1, 1] PCM as SILK-only WB Ogg Opus
    (TOC config 9: 20 ms wideband, one frame per packet)."""
    from ..ogg import write_page  # noqa: F401  (via celt_encoder wrap)
    from .celt_encoder import PRESKIP, ogg_opus_wrap
    from ...ops.src import resample

    x = np.asarray(samples, np.float64).reshape(-1)
    S48 = (len(x) if sample_rate == 48000
           else int(round(len(x) * 48000 / sample_rate)))
    if sample_rate != 16000:
        x = np.asarray(resample(x.astype(np.float32), sample_rate,
                                16000), np.float64)
    # preskip priming (PRESKIP is in 48 kHz samples)
    lead = np.zeros(PRESKIP // 3)
    x = np.concatenate([lead, x]) * 32767.0
    F = -(-len(x) // FRAME_LEN)
    x = np.concatenate([x, np.zeros(F * FRAME_LEN - len(x))])

    st = SilkEncoderState()
    packets = []
    toc = (9 << 3) | 0   # config 9 = SILK WB 20 ms, mono, code 0
    for k in range(F):
        enc = RangeEncoder(1275)
        enc.enc_bit_logp(1, 1)          # VAD flag: active
        enc.enc_bit_logp(0, 1)          # LBRR flag
        _encode_frame(enc, st, x[k * FRAME_LEN:(k + 1) * FRAME_LEN])
        nbytes = ((enc.tell() + 7) >> 3) + 1   # VBR: shrink to used
        enc.enc_shrink(max(nbytes, enc.offs + enc.end_offs, 2))
        packets.append(bytes([toc]) + enc.done())
    return ogg_opus_wrap(packets, 1, S48, 960, PRESKIP)
