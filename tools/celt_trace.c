/* Stage-by-stage CELT decode tracer using the reference's exported
 * internals. Reads CELT-only Opus packets (code-0) from a file of
 * [int32 len][bytes] records, replays celt_decode_with_ec's decode stages
 * (celt_decoder_clean.c:353-611) and dumps every intermediate so the
 * Python re-implementation can be diffed stage by stage.
 * Debug tooling only.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include "opus_custom.h"
#include "modes.h"
#include "entdec.h"
#include "entcode.h"
#include "rate.h"

extern void unquant_coarse_energy(const CELTMode *m, int start, int end,
    float *oldEBands, int intra, ec_dec *dec, int C, int LM);
extern void unquant_fine_energy(const CELTMode *m, int start, int end,
    float *oldEBands, int *fine_quant, ec_dec *dec, int C);
extern void unquant_energy_finalise(const CELTMode *m, int start, int end,
    float *oldEBands, int *fine_quant, int *fine_priority, int bits_left,
    ec_dec *dec, int C);
extern void quant_all_bands(int encode, const CELTMode *m, int start, int end,
    float *X_, float *Y_, unsigned char *collapse_masks, const float *bandE,
    int *pulses, int shortBlocks, int spread, int dual_stereo, int intensity,
    int *tf_res, opus_int32 total_bits, opus_int32 balance, ec_ctx *ec,
    int LM, int codedBands, opus_uint32 *seed);
extern void anti_collapse(const CELTMode *m, float *X_,
    unsigned char *collapse_masks, int LM, int C, int size, int start,
    int end, float *logE, float *prev1logE, float *prev2logE, int *pulses,
    opus_uint32 seed);
extern void denormalise_bands(const CELTMode *m, const float *X, float *freq,
    const float *bandLogE, int start, int end, int C, int M);
extern void init_caps(const CELTMode *m, int *cap, int LM, int C);
extern int ec_laplace_decode(ec_dec *dec, unsigned fs, int decay);




/* tf_select_table, tapset/spread/trim icdfs come from the lib */

static void tf_decode_local(int start, int end, int isTransient, int *tf_res,
                            int LM, ec_dec *dec) {
    int i, curr, tf_select;
    int tf_select_rsv, tf_changed, logp;
    opus_uint32 budget, tell;
    budget = dec->storage * 8;
    tell = ec_tell(dec);
    logp = isTransient ? 2 : 4;
    tf_select_rsv = LM > 0 && tell + logp + 1 <= budget;
    budget -= tf_select_rsv;
    tf_changed = curr = 0;
    for (i = start; i < end; i++) {
        if (tell + logp <= budget) {
            curr ^= ec_dec_bit_logp(dec, logp);
            tell = ec_tell(dec);
            tf_changed |= curr;
        }
        tf_res[i] = curr;
        logp = isTransient ? 4 : 5;
    }
    tf_select = 0;
    if (tf_select_rsv &&
        tf_select_table[LM][4 * isTransient + 0 + tf_changed] !=
        tf_select_table[LM][4 * isTransient + 2 + tf_changed])
        tf_select = ec_dec_bit_logp(dec, 1);
    for (i = start; i < end; i++)
        tf_res[i] = tf_select_table[LM][4 * isTransient + 2 * tf_select + tf_res[i]];
}

static FILE *g_out;
static void dumpf(const char *tag, const float *v, int n) {
    int taglen = (int)strlen(tag);
    fwrite(&taglen, 4, 1, g_out); fwrite(tag, 1, taglen, g_out);
    fwrite(&n, 4, 1, g_out); fwrite(v, 4, n, g_out);
}
static void dumpi(const char *tag, const int *v, int n) {
    int taglen = (int)strlen(tag);
    fwrite(&taglen, 4, 1, g_out); fwrite(tag, 1, taglen, g_out);
    int nn = -n;  /* negative marks int payload */
    fwrite(&nn, 4, 1, g_out); fwrite(v, 4, n, g_out);
}

int main(int argc, char **argv) {
    if (argc != 4) {
        fprintf(stderr, "usage: %s packets.bin trace.bin channels\n", argv[0]);
        return 2;
    }
    int C = atoi(argv[3]);
    int err = 0;
    const CELTMode *mode = opus_custom_mode_create(48000, 960, &err);
    const int nbEBands = mode->nbEBands;
    const opus_int16 *eBands = mode->eBands;

    float oldBandE[2 * 21] = {0};
    float oldLogE[2 * 21], oldLogE2[2 * 21];
    for (int i = 0; i < 42; i++) oldLogE[i] = oldLogE2[i] = -28.0f;
    opus_uint32 rng = 0;
    int start = 0, end = 21;

    FILE *fin = fopen(argv[1], "rb");
    g_out = fopen(argv[2], "wb");
    int pkt_idx = 0;
    for (;;) {
        int plen;
        if (fread(&plen, 4, 1, fin) != 1) break;
        unsigned char *pkt = malloc(plen);
        fread(pkt, 1, plen, fin);
        /* CELT-only code-0 packet: TOC + one frame */
        int toc = pkt[0];
        if (!(toc & 0x80)) { fprintf(stderr, "not celt\n"); return 1; }
        int LM = (toc >> 3) & 0x3;
        int M = 1 << LM;
        int N = M * mode->shortMdctSize;
        unsigned char *data = pkt + 1;
        int len = plen - 1;

        ec_dec dec;
        ec_dec_init(&dec, data, len);
        int total_bits = len * 8;
        int tell = ec_tell(&dec);
        int silence = 0;
        if (tell >= total_bits) silence = 1;
        else if (tell == 1) silence = ec_dec_bit_logp(&dec, 15);
        if (silence) {
            tell = len * 8;
            dec.nbits_total += tell - ec_tell(&dec);
        }
        int pf_pitch = 0, pf_tapset = 0;
        float pf_gain = 0;
        if (start == 0 && tell + 16 <= total_bits) {
            if (ec_dec_bit_logp(&dec, 1)) {
                int octave = ec_dec_uint(&dec, 6);
                pf_pitch = (16 << octave) + ec_dec_bits(&dec, 4 + octave) - 1;
                int qg = ec_dec_bits(&dec, 3);
                if (ec_tell(&dec) + 2 <= total_bits)
                    pf_tapset = ec_dec_icdf(&dec, tapset_icdf, 2);
                pf_gain = .09375f * (qg + 1);
            }
            tell = ec_tell(&dec);
        }
        int isTransient = 0;
        if (LM > 0 && tell + 3 <= total_bits) {
            isTransient = ec_dec_bit_logp(&dec, 3);
            tell = ec_tell(&dec);
        }
        int shortBlocks = isTransient ? M : 0;
        int intra_ener = (tell + 3 <= total_bits) ? ec_dec_bit_logp(&dec, 3) : 0;
        if (C == 1)
            for (int i = 0; i < nbEBands; i++)
                oldBandE[i] = oldBandE[i] > oldBandE[nbEBands + i]
                    ? oldBandE[i] : oldBandE[nbEBands + i];
        unquant_coarse_energy(mode, start, end, oldBandE, intra_ener,
                              &dec, C, LM);
        dumpf("coarseE", oldBandE, 2 * nbEBands);

        int tf_res[21];
        tf_decode_local(start, end, isTransient, tf_res, LM, &dec);
        dumpi("tf_res", tf_res, nbEBands);

        tell = ec_tell(&dec);
        int spread = 2;
        if (tell + 4 <= total_bits)
            spread = ec_dec_icdf(&dec, spread_icdf, 5);

        int cap[21];
        init_caps(mode, cap, LM, C);
        int offsets[21];
        int dynalloc_logp = 6;
        opus_int32 total_bits_q3 = total_bits << BITRES;
        opus_int32 tellq = ec_tell_frac(&dec);
        for (int i = start; i < end; i++) {
            int width = C * (eBands[i + 1] - eBands[i]) << LM;
            /* quanta = IMIN(width<<BITRES, IMAX(6<<BITRES, width)) */
            int mx = (6 << BITRES) > width ? (6 << BITRES) : width;
            int quanta = (width << BITRES) < mx ? (width << BITRES) : mx;
            int dll = dynalloc_logp, boost = 0;
            while (tellq + (dll << BITRES) < total_bits_q3 && boost < cap[i]) {
                int flag = ec_dec_bit_logp(&dec, dll);
                tellq = ec_tell_frac(&dec);
                if (!flag) break;
                boost += quanta;
                total_bits_q3 -= quanta;
                dll = 1;
            }
            offsets[i] = boost;
            if (boost > 0)
                dynalloc_logp = dynalloc_logp - 1 > 2 ? dynalloc_logp - 1 : 2;
        }
        dumpi("offsets", offsets, nbEBands);

        int alloc_trim = 5;
        if (tellq + (6 << BITRES) <= total_bits_q3)
            alloc_trim = ec_dec_icdf(&dec, trim_icdf, 7);

        opus_int32 bits = ((opus_int32)len * 8 << BITRES)
            - ec_tell_frac(&dec) - 1;
        int anti_collapse_rsv =
            (isTransient && LM >= 2 && bits >= ((LM + 2) << BITRES))
            ? (1 << BITRES) : 0;
        bits -= anti_collapse_rsv;

        int pulses[21], fine_quant[21], fine_priority[21];
        int intensity = 0, dual_stereo = 0;
        opus_int32 balance;
        int codedBands = compute_allocation(mode, start, end, offsets, cap,
            alloc_trim, &intensity, &dual_stereo, bits, &balance, pulses,
            fine_quant, fine_priority, C, LM, &dec, 0, 0, 0);
        dumpi("pulses", pulses, nbEBands);
        dumpi("fine_quant", fine_quant, nbEBands);
        {
            int misc[6] = {codedBands, intensity, dual_stereo,
                           (int)balance, alloc_trim, spread};
            dumpi("alloc_misc", misc, 6);
        }

        unquant_fine_energy(mode, start, end, oldBandE, fine_quant, &dec, C);
        dumpf("fineE", oldBandE, 2 * nbEBands);

        unsigned char collapse_masks[2 * 21];
        float *X = malloc(sizeof(float) * C * N);
        quant_all_bands(0, mode, start, end, X, C == 2 ? X + N : NULL,
            collapse_masks, NULL, pulses, shortBlocks, spread, dual_stereo,
            intensity, tf_res, len * (8 << BITRES) - anti_collapse_rsv,
            balance, &dec, LM, codedBands, &rng);
        dumpf("X", X, C * N);

        int anti_collapse_on = 0;
        if (anti_collapse_rsv > 0)
            anti_collapse_on = ec_dec_bits(&dec, 1);
        unquant_energy_finalise(mode, start, end, oldBandE, fine_quant,
            fine_priority, len * 8 - ec_tell(&dec), &dec, C);
        dumpf("finalE", oldBandE, 2 * nbEBands);

        if (anti_collapse_on)
            anti_collapse(mode, X, collapse_masks, LM, C, N, start, end,
                oldBandE, oldLogE, oldLogE2, pulses, rng);
        dumpf("Xac", X, C * N);

        float *freq = malloc(sizeof(float) * C * N);
        if (silence) {
            for (int i = 0; i < 2 * nbEBands; i++) oldBandE[i] = -28.0f;
            memset(freq, 0, sizeof(float) * C * N);
        } else {
            denormalise_bands(mode, X, freq, oldBandE, start, end, C, M);
        }
        dumpf("freq", freq, C * N);

        if (C == 1)
            for (int i = 0; i < nbEBands; i++)
                oldBandE[nbEBands + i] = oldBandE[i];
        if (!isTransient) {
            memcpy(oldLogE2, oldLogE, sizeof(oldLogE));
            memcpy(oldLogE, oldBandE, sizeof(oldLogE));
        } else {
            for (int i = 0; i < 2 * nbEBands; i++)
                oldLogE[i] = oldLogE[i] < oldBandE[i] ? oldLogE[i] : oldBandE[i];
        }
        rng = dec.rng;
        free(X); free(freq); free(pkt);
        pkt_idx++;
        if (pkt_idx >= 8) break;
    }
    fclose(g_out);
    fprintf(stderr, "traced %d packets\n", pkt_idx);
    return 0;
}
