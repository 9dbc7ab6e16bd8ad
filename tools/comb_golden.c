/* Golden generator for the CELT pitch postfilter (comb_filter, celt.c:114).
 * Runs the reference comb_filter on random history buffers for several
 * (T0, T1, g0, g1, tapset) combinations, in-place like the decoder does.
 * Output: for each case, the full buffer before and after.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "opus_custom.h"
#include "modes.h"

extern void comb_filter(float *y, float *x, int T0, int T1, int N,
                        float g0, float g1, int tapset0, int tapset1,
                        const float *window, int overlap);

static unsigned rstate = 777;
static float frand(void) {
    rstate = rstate * 1664525u + 1013904223u;
    return ((rstate >> 8) & 0xFFFFFF) / (float)0x800000 - 1.0f;
}

int main(int argc, char **argv) {
    if (argc != 2) return 2;
    int err = 0;
    const CELTMode *mode = opus_custom_mode_create(48000, 960, &err);
    const int HIST = 1200;
    struct { int T0, T1, N, ts0, ts1; float g0, g1; } cases[] = {
        {15, 15, 120, 0, 0, 0.0f, 0.46875f},
        {40, 40, 120, 0, 0, 0.46875f, 0.5625f},
        {40, 80, 120, 0, 1, 0.5625f, 0.65625f},
        {200, 40, 960, 1, 2, 0.65625f, 0.46875f},
        {15, 1024, 960, 2, 0, 0.9375f, 0.9375f},
        {17, 17, 480, 0, 0, 0.28125f, 0.28125f},
        {40, 40, 240, 1, 1, 0.0f, 0.0f},
    };
    int n_cases = (int)(sizeof(cases)/sizeof(cases[0]));
    FILE *f = fopen(argv[1], "wb");
    fwrite(&n_cases, 4, 1, f);
    for (int c = 0; c < n_cases; c++) {
        int N = cases[c].N;
        int total = HIST + N;
        float *buf = malloc(sizeof(float) * total);
        for (int i = 0; i < total; i++) buf[i] = frand();
        fwrite(&cases[c].T0, 4, 1, f); fwrite(&cases[c].T1, 4, 1, f);
        fwrite(&N, 4, 1, f);
        fwrite(&cases[c].ts0, 4, 1, f); fwrite(&cases[c].ts1, 4, 1, f);
        fwrite(&cases[c].g0, 4, 1, f); fwrite(&cases[c].g1, 4, 1, f);
        fwrite(&total, 4, 1, f);
        fwrite(buf, 4, total, f);
        comb_filter(buf + HIST, buf + HIST, cases[c].T0, cases[c].T1, N,
                    cases[c].g0, cases[c].g1, cases[c].ts0, cases[c].ts1,
                    mode->window, mode->overlap);
        fwrite(buf, 4, total, f);
        free(buf);
    }
    fclose(f);
    fprintf(stderr, "wrote %s\n", argv[1]);
    return 0;
}
