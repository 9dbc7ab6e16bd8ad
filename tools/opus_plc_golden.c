/* PLC golden generator: decode the golden packet corpus with the
 * reference opus_decode_float, dropping chosen packets (NULL decode =
 * reference PLC: CELT celt_decode_lost, SILK silk/PLC.c+CNG.c).  The
 * rebuild's concealment is compared against this output.  Test tooling
 * only; not part of the shipped framework.
 *
 * Reads tests/golden/opus_packets.bin (see opus_packets_golden.c for
 * the layout) and writes, for selected cases:
 *   int32 case_index, channels, n_packets, frame_size
 *   per packet: uint8 lost
 *   int64 n_samples, float pcm[n_samples]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "opus.h"

int main(int argc, char **argv) {
    FILE *f = fopen("tests/golden/opus_packets.bin", "rb");
    if (!f) { perror("packets"); return 1; }
    FILE *out = fopen(argc > 1 ? argv[1]
                               : "tests/golden/opus_plc.bin", "wb");
    int n_cases;
    fread(&n_cases, 4, 1, f);
    int n_out_cases = 0;
    long n_out_pos;
    fwrite(&n_out_cases, 4, 1, out);
    n_out_pos = 0;
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
        fseek(f, ns * 4, SEEK_CUR);  /* skip clean pcm */

        int err = 0;
        OpusDecoder *dec = opus_decoder_create(48000, ch, &err);
        float *pcm = malloc(sizeof(float) * (size_t)frame * ch);
        unsigned char *lost = malloc(n_packets);
        /* The fork strips PLC from its clean CELT decoder, so NULL
           decode only works on pure-SILK cases: probe first. */
        {
            int ok = opus_decode_float(dec, pkts[0], lens[0], pcm,
                                       frame, 0) >= 0
                  && opus_decode_float(dec, NULL, 0, pcm, frame, 0) >= 0;
            opus_decoder_destroy(dec);
            dec = opus_decoder_create(48000, ch, &err);
            if (!ok) {
                opus_decoder_destroy(dec);
                for (int i = 0; i < n_packets; i++) free(pkts[i]);
                free(pkts); free(lens); free(pcm); free(lost);
                continue;
            }
        }
        fwrite(&ci, 4, 1, out); fwrite(&ch, 4, 1, out);
        fwrite(&n_packets, 4, 1, out); fwrite(&frame, 4, 1, out);
        long long total = 0;
        long total_pos = ftell(out) + n_packets;
        for (int i = 0; i < n_packets; i++)
            lost[i] = (i >= 6 && (i % 7) == 6);  /* drop 1 in 7 */
        fwrite(lost, 1, n_packets, out);
        fwrite(&total, 8, 1, out);
        for (int i = 0; i < n_packets; i++) {
            int n = lost[i]
                ? opus_decode_float(dec, NULL, 0, pcm, frame, 0)
                : opus_decode_float(dec, pkts[i], lens[i], pcm, frame, 0);
            if (n < 0) { fprintf(stderr, "case %d pkt %d err %d\n",
                                 ci, i, n); return 1; }  /* probed ok */
            fwrite(pcm, sizeof(float), (size_t)n * ch, out);
            total += (long long)n * ch;
        }
        long end = ftell(out);
        fseek(out, total_pos, SEEK_SET);
        fwrite(&total, 8, 1, out);
        fseek(out, end, SEEK_SET);
        opus_decoder_destroy(dec);
        for (int i = 0; i < n_packets; i++) free(pkts[i]);
        free(pkts); free(lens); free(pcm); free(lost);
        n_out_cases++;
    }
    fseek(out, n_out_pos, SEEK_SET);
    fwrite(&n_out_cases, 4, 1, out);
    fclose(out); fclose(f);
    fprintf(stderr, "wrote %d PLC cases\n", n_out_cases);
    return 0;
}
