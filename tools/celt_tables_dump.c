/* Dumps the CELT 48 kHz mode's normative constant tables to binary files
 * consumed by libnyquist_tpu/formats/opus/celt_tables.py. These are codec
 * spec constants (RFC 6716), extracted as *data* from the reference build
 * rather than transcribed by hand:
 *   - mode layout: eBands, allocVectors, logN, caps, PVQ bit cache
 *     (reference: celt/static_modes_float.h via opus_custom_mode_create)
 *   - energy coding: eMeans + Laplace probability models
 *     (reference: celt/quant_bands.c:44-69)
 * Format: each table written as  name\n dtype\n ndims\n dims...\n rawbytes
 * in a single file. Tooling only; not part of the shipped framework.
 */
#include <stdio.h>
#include <string.h>
#include "opus_custom.h"
#include "modes.h"

/* e_prob_model / eMeans are file-static in quant_bands.c; re-extract them
   by including the probability model header values through the public
   decode path is impossible, so declare the two non-static ones: */
extern const float eMeans[25];   /* non-static in float builds */

static FILE *g_out;

static void dump(const char *name, const char *dtype, const void *data,
                 int ndims, const int *dims, size_t elem_size) {
    size_t total = 1;
    fprintf(g_out, "%s\n%s\n%d\n", name, dtype, ndims);
    for (int i = 0; i < ndims; i++) {
        fprintf(g_out, "%d\n", dims[i]);
        total *= (size_t)dims[i];
    }
    fwrite(data, elem_size, total, g_out);
    fprintf(g_out, "\n");
}

/* The 42-entry-per-(LM, intra) coarse-energy Laplace probability model.
   File-static in the reference (quant_bands.c), so regenerated here from
   the RFC 6716 / libopus normative values by decoding them out of the
   static mode... they are not in the mode. Instead: include the reference
   table translation unit directly so we read the authoritative values. */
#define static_except_tables static
#include "quant_bands_tables_only.h"

int main(int argc, char **argv) {
    if (argc != 2) { fprintf(stderr, "usage: %s out.tbl\n", argv[0]); return 2; }
    int err = 0;
    const CELTMode *m = opus_custom_mode_create(48000, 960, &err);
    if (!m || err) return 1;
    g_out = fopen(argv[1], "wb");
    if (!g_out) return 1;

    int d1[1], d2[2], d3[3];

    int ints[8] = {m->Fs, m->overlap, m->nbEBands, m->effEBands,
                   m->maxLM, m->nbShortMdcts, m->shortMdctSize,
                   m->nbAllocVectors};
    d1[0] = 8; dump("scalars", "i4", ints, 1, d1, 4);
    d1[0] = 4; dump("preemph", "f4", m->preemph, 1, d1, 4);
    d1[0] = m->nbEBands + 2; dump("eBands", "i2", m->eBands, 1, d1, 2);
    d2[0] = m->nbAllocVectors; d2[1] = m->nbEBands;
    dump("allocVectors", "u1", m->allocVectors, 2, d2, 1);
    d1[0] = m->nbEBands; dump("logN", "i2", m->logN, 1, d1, 2);
    d1[0] = m->overlap; dump("window", "f4", m->window, 1, d1, 4);
    /* PulseCache: size, index[(maxLM+2)*nbEBands], bits[size],
       caps[nbEBands*2*(maxLM+1)] (modes.h PulseCache). */
    d1[0] = 1; dump("cache_size", "i4", &m->cache.size, 1, d1, 4);
    d1[0] = (m->maxLM + 2) * m->nbEBands;
    dump("cache_index", "i2", m->cache.index, 1, d1, 2);
    d1[0] = m->cache.size; dump("cache_bits", "u1", m->cache.bits, 1, d1, 1);
    d1[0] = m->nbEBands * 2 * (m->maxLM + 1);
    dump("cache_caps", "u1", m->cache.caps, 1, d1, 1);

    d1[0] = 25; dump("eMeans", "f4", eMeans, 1, d1, 4);
    d3[0] = 4; d3[1] = 2; d3[2] = 42;
    dump("e_prob_model", "u1", e_prob_model_copy, 3, d3, 1);
    fclose(g_out);
    fprintf(stderr, "wrote %s\n", argv[1]);
    return 0;
}
