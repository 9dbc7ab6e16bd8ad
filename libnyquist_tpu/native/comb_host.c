/* Whole-stream CELT comb postfilter for the host synthesis path.
 *
 * C translation of OUR Python comb_filter + its per-frame state
 * machine (formats/opus/celt.py comb_filter,
 * runtime/opus_pipeline.synthesize_stream_host step 2; reference:
 * third_party/opus/celt/celt.c:114-172 comb_filter and
 * celt_decoder_clean.c:652-685 state rollover).  One call filters a
 * whole channel in place; the Python loop (two calls per frame per
 * channel) stays as the fallback and spec.
 *
 * In-place scalar filtering reads the already-filtered history, which
 * is exactly the reference semantics (and equals the Python chunked
 * formulation: chunk length min(T)-2 keeps every read before the
 * chunk).
 */
#include <stdint.h>

#define COMB_MINPERIOD 15

static void comb_one(float *x, int64_t off, int T0, int T1, int64_t N,
                     double g0, double g1, int tapset0, int tapset1,
                     const double *w2, int overlap,
                     const double *comb_gains /* [3][3] */)
{
    double g00, g01, g02, g10, g11, g12;
    int64_t i = 0, j;
    if (g0 == 0.0 && g1 == 0.0) return;
    g00 = g0 * comb_gains[tapset0 * 3 + 0];
    g01 = g0 * comb_gains[tapset0 * 3 + 1];
    g02 = g0 * comb_gains[tapset0 * 3 + 2];
    g10 = g1 * comb_gains[tapset1 * 3 + 0];
    g11 = g1 * comb_gains[tapset1 * 3 + 1];
    g12 = g1 * comb_gains[tapset1 * 3 + 2];

    if (!(g0 == g1 && T0 == T1 && tapset0 == tapset1)) {
        int64_t ov = overlap < N ? overlap : N;
        for (i = 0; i < ov; i++) {
            double f = w2[i];
            j = off + i;
            {
                /* crossfade region in double like the Python
                   (float64 window promotes the expression) */
                double a0 = x[j - T0];
                double a1 = (double)x[j - T0 + 1] + x[j - T0 - 1];
                double a2 = (double)x[j - T0 + 2] + x[j - T0 - 2];
                double b0 = x[j - T1];
                double b1 = (double)x[j - T1 + 1] + x[j - T1 - 1];
                double b2 = (double)x[j - T1 + 2] + x[j - T1 - 2];
                x[j] = (float)(
                    x[j]
                    + (1.0 - f) * (g00 * a0 + g01 * a1 + g02 * a2)
                    + f * (g10 * b0 + g11 * b1 + g12 * b2));
            }
        }
        if (g1 == 0.0) return;
    }
    /* constant-parameter tail: float32 arithmetic like the Python */
    {
        float fg0 = (float)g10, fg1 = (float)g11, fg2 = (float)g12;
        for (; i < N; i++) {
            float b0, b1, b2;
            j = off + i;
            b0 = x[j - T1];
            b1 = x[j - T1 + 1] + x[j - T1 - 1];
            b2 = x[j - T1 + 2] + x[j - T1 - 2];
            x[j] = x[j] + fg0 * b0 + fg1 * b1 + fg2 * b2;
        }
    }
}

/* Per-frame comb state machine over one channel's whole stream.
 * buf: [hist + sum(Ns)] float32, frames starting at `hist`.
 * Ns/LMs/pitch/gain/tapset: per-frame parameters.
 * w2: window*window [overlap] float64; comb_gains [3][3] float64. */
void celt_comb_stream_host(
    float *buf, int64_t hist, int64_t nframes,
    const int32_t *Ns, const int32_t *LMs,
    const int32_t *pitch, const double *gain, const int32_t *tapset,
    const double *w2, int overlap, int n0,
    const double *comb_gains)
{
    int period = 0, period_old = 0;
    double g = 0.0, g_old = 0.0;
    int ts = 0, ts_old = 0;
    int64_t off = hist, f;
    for (f = 0; f < nframes; f++) {
        int64_t N = Ns[f];
        int LM = LMs[f];
        int T_old = period > COMB_MINPERIOD ? period : COMB_MINPERIOD;
        int T_old2 = period_old > COMB_MINPERIOD ? period_old
                                                 : COMB_MINPERIOD;
        comb_one(buf, off, T_old2, T_old, n0, g_old, g, ts_old, ts,
                 w2, overlap, comb_gains);
        if (LM != 0) {
            int T1 = pitch[f] > COMB_MINPERIOD ? pitch[f]
                                               : COMB_MINPERIOD;
            comb_one(buf, off + n0, T_old, T1, N - n0, g, gain[f],
                     ts, tapset[f], w2, overlap, comb_gains);
        }
        period_old = period;
        g_old = g;
        ts_old = ts;
        period = pitch[f];
        g = gain[f];
        ts = tapset[f];
        if (LM != 0) {
            period_old = period;
            g_old = g;
            ts_old = ts;
        }
        off += N;
    }
}

/* Whole-stream deemphasis: the exact 1-pole recurrence of the
   reference (celt_decoder_clean.c:189-256 deemphasis — float build:
   tmp = x[j] + m + VERY_SMALL; m = coef0*tmp), applied in place over
   a full channel.  O(n) scalar replaces the blocked-Toeplitz GEMM
   (O(n*BLK)) on the host path; returns the final carry m. */
float celt_deemph_stream_host(float *y, int64_t n, float coef, float m0)
{
    float m = m0;
    for (int64_t i = 0; i < n; i++) {
        float t = y[i] + 1e-30f + m;
        y[i] = t;
        m = coef * t;
    }
    return m;
}
