/* SILK decode stage tracer using the reference's exported internals.
 * Reads SILK-only Opus packets ([int32 len][bytes]), replays silk_Decode's
 * per-frame path for mono streams, dumping indices/pulses/gains/NLSF/
 * coefficients/xq so the Python port can be diffed stage by stage.
 * Debug tooling only.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#define USE_ALLOCA
#define OPUS_BUILD
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
    if (argc != 3) { fprintf(stderr, "usage: %s pkts.bin trace.bin\n", argv[0]); return 2; }
    FILE *fin = fopen(argv[1], "rb");
    g_out = fopen(argv[2], "wb");

    silk_decoder_state st;
    silk_init_decoder(&st);
    int pkt_idx = 0;
    for (;;) {
        int plen;
        if (fread(&plen, 4, 1, fin) != 1) break;
        unsigned char *pkt = malloc(plen);
        fread(pkt, 1, plen, fin);
        /* SILK-only mono 20ms WB: TOC config 8..11; frame data after TOC */
        unsigned char *data = pkt + 1;
        int len = plen - 1;
        ec_dec dec;
        ec_dec_init(&dec, data, len);

        st.nFramesDecoded = 0;
        st.nFramesPerPacket = 1;
        st.nb_subfr = 4;
        silk_decoder_set_fs(&st, 16, 48000);

        /* VAD + LBRR flags (dec_API.c:172-177) */
        st.VAD_flags[0] = ec_dec_bit_logp(&dec, 1);
        st.LBRR_flag = ec_dec_bit_logp(&dec, 1);
        memset(st.LBRR_flags, 0, sizeof(st.LBRR_flags));
        if (st.LBRR_flag) st.LBRR_flags[0] = 1;
        if (st.LBRR_flags[0]) {
            opus_int pulses_lbrr[320];
            silk_decode_indices(&st, &dec, 0, 1, CODE_INDEPENDENTLY);
            silk_decode_pulses(&dec, pulses_lbrr, st.indices.signalType,
                               st.indices.quantOffsetType, st.frame_length);
        }
        int hdr[4] = { st.VAD_flags[0], st.LBRR_flag, ec_tell(&dec), 0 };
        dumpi("hdr", hdr, 4);

        silk_decode_indices(&st, &dec, 0, 0, CODE_INDEPENDENTLY);
        {
            int idx[32];
            idx[0] = st.indices.signalType;
            idx[1] = st.indices.quantOffsetType;
            idx[2] = st.indices.NLSFInterpCoef_Q2;
            idx[3] = st.indices.lagIndex;
            idx[4] = st.indices.contourIndex;
            idx[5] = st.indices.PERIndex;
            idx[6] = st.indices.LTP_scaleIndex;
            idx[7] = st.indices.Seed;
            for (int i = 0; i < 4; i++) idx[8 + i] = st.indices.GainsIndices[i];
            for (int i = 0; i < 17; i++) idx[12 + i] = st.indices.NLSFIndices[i];
            idx[29] = st.indices.LTPIndex[0];
            idx[30] = st.indices.LTPIndex[3];
            idx[31] = ec_tell(&dec);
            dumpi("indices", idx, 32);
        }
        opus_int pulses[336];
        silk_decode_pulses(&dec, pulses, st.indices.signalType,
                           st.indices.quantOffsetType, st.frame_length);
        dumpi("pulses", (int*)pulses, st.frame_length);

        silk_decoder_control ctrl;
        ctrl.LTP_scale_Q14 = 0;
        silk_decode_parameters(&st, &ctrl, CODE_INDEPENDENTLY);
        dumpi("gains", (int*)ctrl.Gains_Q16, 4);
        dump16("A0_Q12", ctrl.PredCoef_Q12[0], st.LPC_order);
        dump16("A1_Q12", ctrl.PredCoef_Q12[1], st.LPC_order);
        dumpi("pitchL", (int*)ctrl.pitchL, 4);
        dump16("LTP_Q14", ctrl.LTPCoef_Q14, 20);
        { int v[1] = { ctrl.LTP_scale_Q14 }; dumpi("ltp_scale", v, 1); }

        opus_int16 xq[320];
        silk_decode_core(&st, &ctrl, xq, pulses);
        dump16("xq", xq, st.frame_length);

        /* frame bookkeeping like silk_decode_frame */
        st.lossCnt = 0;
        st.prevSignalType = st.indices.signalType;
        st.first_frame_after_reset = 0;
        {
            int mv = st.ltp_mem_length - st.frame_length;
            memmove(st.outBuf, &st.outBuf[st.frame_length], mv * sizeof(opus_int16));
            memcpy(&st.outBuf[mv], xq, st.frame_length * sizeof(opus_int16));
        }
        st.lagPrev = ctrl.pitchL[st.nb_subfr - 1];

        free(pkt);
        if (++pkt_idx >= 6) break;
    }
    fclose(g_out);
    fprintf(stderr, "traced %d packets\n", pkt_idx);
    return 0;
}
