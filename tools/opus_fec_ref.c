/* In-band FEC probe against the REFERENCE build's libopus.
 *
 * Reads a packet dump (u32 n, then per packet u32 len + bytes),
 * decodes the sequence with opus_decode, drops packet L, recovers it
 * from packet L+1 with decode_fec=1, and writes two f32 frames:
 * the clean decode of frame L and the FEC-recovered frame.
 *
 * Build:
 *   gcc -O2 -I /root/reference/third_party/opus/libopus/include \
 *       tools/opus_fec_ref.c /tmp/refbuild/lib/liblibnyquist.a -lm \
 *       -o /tmp/opus_fec_ref
 *
 * Usage: opus_fec_ref packets.bin LOST out.f32 [channels]
 */
#include <opus.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static unsigned read_u32(FILE *f) {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) { fprintf(stderr, "truncated\n"); exit(1); }
    return b[0] | (b[1] << 8) | ((unsigned)b[2] << 16) | ((unsigned)b[3] << 24);
}

int main(int argc, char **argv) {
    if (argc < 4) { fprintf(stderr, "usage: %s pkts.bin LOST out.f32 [ch]\n", argv[0]); return 1; }
    int chans = argc > 4 ? atoi(argv[4]) : 1;
    FILE *f = fopen(argv[1], "rb");
    if (!f) { perror("open"); return 1; }
    unsigned n = read_u32(f);
    int lost = atoi(argv[2]);
    unsigned char **pk = malloc(n * sizeof(*pk));
    int *ln = malloc(n * sizeof(*ln));
    for (unsigned i = 0; i < n; i++) {
        ln[i] = (int)read_u32(f);
        pk[i] = malloc(ln[i] ? ln[i] : 1);
        if (ln[i] && fread(pk[i], 1, ln[i], f) != (size_t)ln[i]) { fprintf(stderr, "truncated\n"); return 1; }
    }
    fclose(f);

    int err = 0;
    float *pcm = malloc(sizeof(float) * 5760 * 2);
    /* clean pass: capture frame `lost` */
    OpusDecoder *d1 = opus_decoder_create(48000, chans, &err);
    if (err) { fprintf(stderr, "create: %d\n", err); return 1; }
    float *clean = NULL; int clean_n = 0;
    for (unsigned i = 0; i < n; i++) {
        int got = opus_decode_float(d1, pk[i], ln[i], pcm, 5760, 0);
        if (got < 0) { fprintf(stderr, "clean decode %u: %d\n", i, got); return 1; }
        if ((int)i == lost) {
            clean_n = got;
            clean = malloc(sizeof(float) * got * chans);
            memcpy(clean, pcm, sizeof(float) * got * chans);
        }
    }
    /* lossy pass: drop `lost`, recover via FEC from the next packet */
    OpusDecoder *d2 = opus_decoder_create(48000, chans, &err);
    float *rec = NULL; int rec_n = 0;
    for (unsigned i = 0; i < n; i++) {
        if ((int)i == lost) continue;
        if ((int)i == lost + 1) {
            int got = opus_decode_float(d2, pk[i], ln[i], pcm, 960, 1);
            if (got < 0) { fprintf(stderr, "fec decode: %d\n", got); return 1; }
            rec_n = got;
            rec = malloc(sizeof(float) * got * chans);
            memcpy(rec, pcm, sizeof(float) * got * chans);
        }
        int got = opus_decode_float(d2, pk[i], ln[i], pcm, 5760, 0);
        if (got < 0) { fprintf(stderr, "decode %u: %d\n", i, got); return 1; }
    }
    if (!clean || !rec) { fprintf(stderr, "missing frames\n"); return 1; }
    FILE *o = fopen(argv[3], "wb");
    unsigned cn = (unsigned)clean_n, rn = (unsigned)rec_n;
    fwrite(&cn, 4, 1, o);
    fwrite(clean, sizeof(float), (size_t)clean_n * chans, o);
    fwrite(&rn, 4, 1, o);
    fwrite(rec, sizeof(float), (size_t)rec_n * chans, o);
    fclose(o);
    return 0;
}
