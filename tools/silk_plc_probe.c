/* SILK PLC state probe: drive the REFERENCE silk_Decode directly on one
 * golden SILK case with a drop-1-in-7 loss pattern and dump the decoder
 * state after every packet.  Used to pinpoint state divergence in the
 * rebuild's PLC port (native/silk_dec.c) — test tooling only, not part
 * of the shipped framework.
 *
 * Build (from repo root):
 *   cc -O2 tools/silk_plc_probe.c \
 *      -I/root/reference/third_party/opus/silk \
 *      -I/root/reference/third_party/opus/celt \
 *      -I/root/reference/third_party/opus/libopus/include \
 *      -DUSE_ALLOCA -DOPUS_BUILD \
 *      /tmp/refbuild/lib/liblibnyquist.a -lm -o /tmp/silk_probe
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "main.h"
#include "API.h"
#include "entdec.h"

/* must match dec_API.c's private silk_decoder super-struct */
typedef struct {
    silk_decoder_state channel_state[DECODER_NUM_CHANNELS];
    stereo_dec_state sStereo;
    opus_int nChannelsAPI;
    opus_int nChannelsInternal;
    opus_int prev_decode_only_middle;
} silk_decoder_mirror;

static void dump_state(FILE *o, silk_decoder_mirror *d, int pk)
{
    silk_decoder_state *c = &d->channel_state[0];
    int i;
    fprintf(o, "pkt %d prev_gain %d LastGainIndex %d lagPrev %d "
               "lossCnt %d prevSignalType %d ffar %d\n",
            pk, c->prev_gain_Q16, c->LastGainIndex, c->lagPrev,
            c->lossCnt, c->prevSignalType, c->first_frame_after_reset);
    fprintf(o, "  sLPC:");
    for (i = 0; i < MAX_LPC_ORDER; i++)
        fprintf(o, " %d", c->sLPC_Q14_buf[i]);
    fprintf(o, "\n  outBuf_tail:");
    for (i = 0; i < 16; i++)
        fprintf(o, " %d", c->outBuf[c->ltp_mem_length - 16 + i]);
    fprintf(o, "\n  outBuf_head:");
    for (i = 0; i < 16; i++) fprintf(o, " %d", c->outBuf[i]);
    fprintf(o, "\n  prevNLSF:");
    for (i = 0; i < MAX_LPC_ORDER; i++)
        fprintf(o, " %d", c->prevNLSF_Q15[i]);
    fprintf(o, "\n  ecprev: %d %d sigtype %d qoff %d seed %d",
            c->ec_prevSignalType, c->ec_prevLagIndex,
            c->indices.signalType, c->indices.quantOffsetType,
            c->indices.Seed);
    fprintf(o, "\n  ind: interp %d gains %d %d %d %d nlsf %d %d %d %d %d",
            c->indices.NLSFInterpCoef_Q2, c->indices.GainsIndices[0],
            c->indices.GainsIndices[1], c->indices.GainsIndices[2],
            c->indices.GainsIndices[3], c->indices.NLSFIndices[0],
            c->indices.NLSFIndices[1], c->indices.NLSFIndices[2],
            c->indices.NLSFIndices[3], c->indices.NLSFIndices[4]);
    fprintf(o, "\n  exc_head:");
    for (i = 0; i < 8; i++) fprintf(o, " %d", c->exc_Q14[i]);
    fprintf(o, "\n  plc: pitchL_Q8 %d randScale %d rand_seed %d "
               "conc %d/%d ltpscale %d gains %d %d lfl %d\n",
            c->sPLC.pitchL_Q8, c->sPLC.randScale_Q14, c->sPLC.rand_seed,
            c->sPLC.conc_energy, c->sPLC.conc_energy_shift,
            c->sPLC.prevLTP_scale_Q14, c->sPLC.prevGain_Q16[0],
            c->sPLC.prevGain_Q16[1], c->sPLC.last_frame_lost);
    fprintf(o, "  plc LTP:");
    for (i = 0; i < LTP_ORDER; i++)
        fprintf(o, " %d", c->sPLC.LTPCoef_Q14[i]);
    fprintf(o, " prevLPC:");
    for (i = 0; i < MAX_LPC_ORDER; i++)
        fprintf(o, " %d", c->sPLC.prevLPC_Q12[i]);
    fprintf(o, "\n  cng: gain %d seed %d\n",
            c->sCNG.CNG_smth_Gain_Q16, c->sCNG.rand_seed);
}

int main(int argc, char **argv)
{
    int want_case = argc > 1 ? atoi(argv[1]) : 8;
    FILE *f = fopen("tests/golden/opus_packets.bin", "rb");
    if (!f) { perror("packets"); return 1; }
    int n_cases;
    fread(&n_cases, 4, 1, f);
    for (int ci = 0; ci < n_cases; ci++) {
        int ch, sr, n_packets, frame;
        fread(&ch, 4, 1, f); fread(&sr, 4, 1, f);
        fread(&n_packets, 4, 1, f); fread(&frame, 4, 1, f);
        unsigned char **pkts = malloc(n_packets * sizeof(*pkts));
        int *lens = malloc(n_packets * sizeof(int));
        for (int i = 0; i < n_packets; i++) {
            fread(&lens[i], 4, 1, f);
            pkts[i] = malloc(lens[i]);
            fread(pkts[i], 1, lens[i], f);
        }
        long long ns;
        fread(&ns, 8, 1, f);
        fseek(f, ns * 4, SEEK_CUR);
        if (ci != want_case) continue;

        int toc = pkts[0][0];
        int config = toc >> 3;
        int rate = config < 4 ? 8000 : (config < 8 ? 12000 : 16000);
        printf("case %d ch %d frame %d toc %d rate %d\n",
               ci, ch, frame, toc, rate);

        int sz = 0;
        silk_Get_Decoder_Size(&sz);
        void *dec = malloc(sz);
        silk_InitDecoder(dec);
        silk_DecControlStruct ctl;
        memset(&ctl, 0, sizeof(ctl));
        ctl.API_sampleRate = 48000;
        ctl.nChannelsAPI = ch;
        ctl.nChannelsInternal = ch;
        ctl.payloadSize_ms = 20;
        ctl.internalSampleRate = rate;

        opus_int16 out[5760 * 2];
        opus_int32 n_out = 0;
        long long csum = 0;
        for (int i = 0; i < n_packets && i < 16; i++) {
            int lost = (i % 7) == 6;
            if (lost) {
                silk_Decode(dec, &ctl, 1, 1, NULL, out, &n_out);
            } else {
                ec_dec rd;
                ec_dec_init(&rd, pkts[i] + 1, lens[i] - 1);
                silk_Decode(dec, &ctl, 0, 1, &rd, out, &n_out);
            }
            csum = 0;
            for (int k = 0; k < n_out * ch; k++) csum += out[k];
            printf("== pkt %d lost %d n_out %d sum %lld out[0..7]:",
                   i, lost, n_out, csum);
            for (int k = 0; k < 8; k++) printf(" %d", out[k]);
            printf("\n");
            dump_state(stdout, (silk_decoder_mirror *)dec, i);
        }
    }
    return 0;
}
