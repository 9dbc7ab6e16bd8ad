/* Stereo SILK stage tracer: replays dec_API.c's stereo mid/side flow with
 * exported internals, dumping per-frame mid-channel internals.
 * Debug tooling only. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "main.h"
#include "structs.h"
#include "entdec.h"

static FILE *g_out;
static void dumpi(const char *tag, const int *v, int n) {
    int tl = (int)strlen(tag);
    fwrite(&tl, 4, 1, g_out); fwrite(tag, 1, tl, g_out);
    fwrite(&n, 4, 1, g_out);
    fwrite(v, 4, n, g_out);
}
static void dump16(const char *tag, const opus_int16 *v, int n) {
    int *tmp = malloc(4 * n);
    for (int i = 0; i < n; i++) tmp[i] = v[i];
    dumpi(tag, tmp, n);
    free(tmp);
}

int main(int argc, char **argv) {
    if (argc != 3) { fprintf(stderr, "usage: %s pkts trace\n", argv[0]); return 2; }
    FILE *fin = fopen(argv[1], "rb");
    g_out = fopen(argv[2], "wb");

    silk_decoder_state st[2];
    silk_init_decoder(&st[0]);
    silk_init_decoder(&st[1]);
    stereo_dec_state stereo;
    memset(&stereo, 0, sizeof(stereo));
    int prev_mid_only = 0;
    int pkt_idx = 0;
    for (;;) {
        int plen;
        if (fread(&plen, 4, 1, fin) != 1) break;
        unsigned char *pkt = malloc(plen);
        fread(pkt, 1, plen, fin);
        ec_dec dec;
        ec_dec_init(&dec, pkt + 1, plen - 1);

        for (int n = 0; n < 2; n++) {
            st[n].nFramesDecoded = 0;
            st[n].nFramesPerPacket = 1;
            st[n].nb_subfr = 4;
            silk_decoder_set_fs(&st[n], 16, 48000);
        }
        for (int n = 0; n < 2; n++) {
            st[n].VAD_flags[0] = ec_dec_bit_logp(&dec, 1);
            st[n].LBRR_flag = ec_dec_bit_logp(&dec, 1);
            memset(st[n].LBRR_flags, 0, sizeof(st[n].LBRR_flags));
            if (st[n].LBRR_flag) st[n].LBRR_flags[0] = 1;
        }
        /* Skip LBRR */
        for (int n = 0; n < 2; n++) {
            if (st[n].LBRR_flags[0]) {
                opus_int pulses_l[336];
                opus_int32 ms[2];
                if (n == 0) {
                    silk_stereo_decode_pred(&dec, ms);
                    if (st[1].LBRR_flags[0] == 0) {
                        opus_int dm;
                        silk_stereo_decode_mid_only(&dec, &dm);
                    }
                }
                silk_decode_indices(&st[n], &dec, 0, 1, CODE_INDEPENDENTLY);
                silk_decode_pulses(&dec, pulses_l, st[n].indices.signalType,
                                   st[n].indices.quantOffsetType, st[n].frame_length);
            }
        }
        opus_int32 ms_pred[2] = {0, 0};
        int mid_only = 0;
        silk_stereo_decode_pred(&dec, ms_pred);
        if (st[1].VAD_flags[0] == 0) {
            silk_stereo_decode_mid_only(&dec, &mid_only);
        }
        if (mid_only == 0 && prev_mid_only == 1) {
            memset(st[1].outBuf, 0, sizeof(st[1].outBuf));
            memset(st[1].sLPC_Q14_buf, 0, sizeof(st[1].sLPC_Q14_buf));
            st[1].lagPrev = 100;
            st[1].LastGainIndex = 10;
            st[1].prevSignalType = TYPE_NO_VOICE_ACTIVITY;
            st[1].first_frame_after_reset = 1;
        }
        int hdr[6] = {st[0].VAD_flags[0], st[1].VAD_flags[0], mid_only,
                      ms_pred[0], ms_pred[1], ec_tell(&dec)};
        dumpi("hdr", hdr, 6);

        opus_int16 x1[322], x2[322];
        memset(x1, 0, sizeof(x1));
        memset(x2, 0, sizeof(x2));
        for (int n = 0; n < 2; n++) {
            opus_int16 *dst = n ? x2 : x1;
            if (n == 0 || !mid_only) {
                int cond;
                if (0 >= st[0].nFramesDecoded - n) cond = CODE_INDEPENDENTLY;
                else if (n > 0 && prev_mid_only) cond = CODE_INDEPENDENTLY_NO_LTP_SCALING;
                else cond = CODE_CONDITIONALLY;
                silk_decode_indices(&st[n], &dec, 0, 0, cond);
                opus_int pulses[336];
                silk_decode_pulses(&dec, pulses, st[n].indices.signalType,
                                   st[n].indices.quantOffsetType, st[n].frame_length);
                silk_decoder_control ctrl;
                ctrl.LTP_scale_Q14 = 0;
                silk_decode_parameters(&st[n], &ctrl, cond);
                if (n == 0) {
                    dumpi("gains", (int*)ctrl.Gains_Q16, 4);
                    dumpi("pitchL", (int*)ctrl.pitchL, 4);
                    dump16("A1", ctrl.PredCoef_Q12[1], st[n].LPC_order);
                    dump16("LTPC", ctrl.LTPCoef_Q14, 20);
                    { int v[3] = {ctrl.LTP_scale_Q14, st[n].indices.signalType,
                                  st[n].indices.NLSFInterpCoef_Q2};
                      dumpi("misc", v, 3); }
                }
                silk_decode_core(&st[n], &ctrl, &dst[2], pulses);
                st[n].lossCnt = 0;
                st[n].prevSignalType = st[n].indices.signalType;
                st[n].first_frame_after_reset = 0;
                int mv = st[n].ltp_mem_length - st[n].frame_length;
                memmove(st[n].outBuf, &st[n].outBuf[st[n].frame_length],
                        mv * sizeof(opus_int16));
                memcpy(&st[n].outBuf[mv], &dst[2],
                       st[n].frame_length * sizeof(opus_int16));
                st[n].lagPrev = ctrl.pitchL[st[n].nb_subfr - 1];
            }
            st[n].nFramesDecoded++;
        }
        dump16("mid_xq", &x1[2], st[0].frame_length);
        silk_stereo_MS_to_LR(&stereo, x1, x2, ms_pred, 16, st[0].frame_length);
        dump16("left", &x1[1], st[0].frame_length);
        dump16("right", &x2[1], st[0].frame_length);
        prev_mid_only = mid_only;
        free(pkt);
        if (++pkt_idx >= 78) break;
    }
    fprintf(stderr, "traced %d\n", pkt_idx);
    return 0;
}
