/* Golden-vector generator for the CELT inverse MDCT.
 *
 * Links against the reference build's static lib and calls
 * clt_mdct_backward (reference: third_party/opus/celt/mdct.c:269) on random
 * spectra for every (shift, stride) configuration the CELT decoder uses
 * (reference: celt_decoder_clean.c:263-311), dumping input/output pairs
 * that the TPU implementation's tests compare against.
 *
 * Output binary layout per case, written to one file per case:
 *   int32 N (l->n >> shift), int32 overlap, int32 stride, int32 n_frames
 *   float in[n_frames][N/2 * stride]   (full strided input buffer)
 *   float out[n_frames][N/2 + overlap] (output buffer; first overlap/2
 *                                       samples pre-seeded with the
 *                                       previous random tail to exercise
 *                                       the TDAC mix, rest zeroed)
 * NOT part of the shipped framework; test-vector tooling only.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* Reference headers (behavioral spec; used read-only). */
#include "opus_custom.h"
#include "modes.h"
#include "mdct.h"

static float frand(unsigned *seed) {
    *seed = *seed * 1664525u + 1013904223u;
    return ((*seed >> 8) & 0xFFFFFF) / (float)0x800000 - 1.0f;
}

int main(int argc, char **argv) {
    if (argc != 2) { fprintf(stderr, "usage: %s outdir\n", argv[0]); return 2; }
    const char *outdir = argv[1];
    int err = 0;
    const CELTMode *mode = opus_custom_mode_create(48000, 960, &err);
    if (!mode || err) { fprintf(stderr, "mode create failed\n"); return 1; }
    const int overlap = mode->overlap;              /* 120 */
    const int n_frames = 4;
    unsigned seed = 12345;

    /* Dump the mode window so the rebuild can verify its closed-form
       window formula matches the static table
       (reference: celt/static_modes_float.h window data). */
    {
        char path[512];
        snprintf(path, sizeof path, "%s/celt_window.bin", outdir);
        FILE *f = fopen(path, "wb");
        fwrite(&overlap, 4, 1, f);
        fwrite(mode->window, sizeof(float), overlap, f);
        fclose(f);
    }

    /* Cases: long blocks shift 0..3 stride 1, and short-block stride 8
       at shift 3 (B=8 interleave, celt_decoder_clean.c:291-301). */
    struct { int shift; int stride; } cases[] = {
        {0, 1}, {1, 1}, {2, 1}, {3, 1}, {3, 8},
    };
    for (unsigned c = 0; c < sizeof(cases) / sizeof(cases[0]); c++) {
        int shift = cases[c].shift, stride = cases[c].stride;
        int N = mode->mdct.n >> shift;   /* 1920 >> shift */
        int N2 = N >> 1;
        int in_len = N2 * stride;
        int out_len = N2 + overlap;
        char path[512];
        snprintf(path, sizeof path, "%s/mdct_shift%d_stride%d.bin",
                 outdir, shift, stride);
        FILE *f = fopen(path, "wb");
        if (!f) { perror("fopen"); return 1; }
        fwrite(&N, 4, 1, f); fwrite(&overlap, 4, 1, f);
        fwrite(&stride, 4, 1, f); fwrite(&n_frames, 4, 1, f);

        float *in = malloc(sizeof(float) * in_len);
        float *out = malloc(sizeof(float) * out_len);
        for (int fr = 0; fr < n_frames; fr++) {
            for (int i = 0; i < in_len; i++) in[i] = frand(&seed);
            memset(out, 0, sizeof(float) * out_len);
            for (int i = 0; i < overlap / 2; i++) out[i] = frand(&seed);
            fwrite(in, sizeof(float), in_len, f);
            /* record the pre-seeded tail inside the out buffer by writing
               input first; out written after the call below */
            float *saved = malloc(sizeof(float) * out_len);
            memcpy(saved, out, sizeof(float) * out_len);
            clt_mdct_backward(&mode->mdct, in, out, mode->window,
                              overlap, shift, stride);
            fwrite(saved, sizeof(float), out_len, f);   /* pre-state */
            fwrite(out, sizeof(float), out_len, f);     /* post-state */
            free(saved);
        }
        free(in); free(out);
        fclose(f);
        fprintf(stderr, "wrote %s (N=%d)\n", path, N);
    }
    return 0;
}
