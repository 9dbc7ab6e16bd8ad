/* Packet-level Opus golden generator.
 *
 * Encodes deterministic test signals with the reference libopus encoder
 * (compiled into the reference static lib) under a range of configurations
 * (CELT-only / SILK / hybrid, mono/stereo, several frame sizes), then
 * decodes with the reference opus_decode_float, dumping packets + decoded
 * float PCM. The TPU rebuild's Opus decoder is verified packet-for-packet
 * against these. Test tooling only; not part of the shipped framework.
 *
 * File format:
 *   int32 n_cases
 *   per case:
 *     int32 channels, sample_rate(48000), n_packets, frame_size
 *     per packet: int32 len, bytes[len]
 *     int64 n_samples (total interleaved), float pcm[n_samples]
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <math.h>
#include "opus.h"
/* private force-mode ctl (opus_private.h) */
#define MODE_SILK_ONLY 1000
#define MODE_HYBRID 1001
#define MODE_CELT_ONLY 1002
#define OPUS_SET_FORCE_MODE_REQUEST 11002
#define OPUS_SET_FORCE_MODE(x) OPUS_SET_FORCE_MODE_REQUEST, __opus_check_int(x)

#define FS 48000

static unsigned rstate = 424242;
static float frand(void) {
    rstate = rstate * 1664525u + 1013904223u;
    return ((rstate >> 8) & 0xFFFFFF) / (float)0x800000 - 1.0f;
}

/* A deterministic "music-like" signal: mixture of drifting sines + noise
   bursts, exercises transients (short blocks) and steady tones. */
static void gen_signal(float *buf, int n, int ch, int kind) {
    double ph1 = 0, ph2 = 0, ph3 = 0;
    for (int i = 0; i < n; i++) {
        double t = (double)i / FS;
        double f1 = 220 + 100 * sin(2 * M_PI * 0.5 * t);
        double f2 = 1200 + 400 * sin(2 * M_PI * 0.13 * t);
        double f3 = 6000;
        ph1 += 2 * M_PI * f1 / FS;
        ph2 += 2 * M_PI * f2 / FS;
        ph3 += 2 * M_PI * f3 / FS;
        float v = 0.3f * sinf(ph1) + 0.2f * sinf(ph2) + 0.1f * sinf(ph3);
        if (kind == 1) {           /* add transient bursts */
            if ((i / 480) % 7 == 3) v += 0.5f * frand();
        } else if (kind == 2) {    /* speech-ish: low band + noise */
            v = 0.4f * sinf(ph1) + 0.15f * frand();
        }
        for (int c = 0; c < ch; c++)
            buf[i * ch + c] = v * (c ? 0.8f : 1.0f);
    }
}

int main(int argc, char **argv) {
    if (argc != 2) { fprintf(stderr, "usage: %s out.bin\n", argv[0]); return 2; }
    FILE *f = fopen(argv[1], "wb");

    struct {
        int ch; int app; int frame; int kind; int bitrate; int force_mode;
    } cases[] = {
        /* CELT-only (forced), stereo + mono, all frame sizes */
        {2, OPUS_APPLICATION_AUDIO,       960, 0, 128000, MODE_CELT_ONLY},
        {2, OPUS_APPLICATION_AUDIO,       960, 1,  96000, MODE_CELT_ONLY},
        {1, OPUS_APPLICATION_AUDIO,       960, 0,  64000, MODE_CELT_ONLY},
        {2, OPUS_APPLICATION_AUDIO,       480, 1,  96000, MODE_CELT_ONLY},
        {2, OPUS_APPLICATION_AUDIO,       240, 0,  96000, MODE_CELT_ONLY},
        {2, OPUS_APPLICATION_AUDIO,       120, 0, 128000, MODE_CELT_ONLY},
        {2, OPUS_APPLICATION_AUDIO,      1920, 1,  96000, MODE_CELT_ONLY},
        {2, OPUS_APPLICATION_AUDIO,      2880, 0,  96000, MODE_CELT_ONLY},
        /* SILK-only */
        {1, OPUS_APPLICATION_VOIP,        960, 2,  24000, MODE_SILK_ONLY},
        {2, OPUS_APPLICATION_VOIP,        960, 2,  32000, MODE_SILK_ONLY},
        {1, OPUS_APPLICATION_VOIP,       1920, 2,  16000, MODE_SILK_ONLY},
        /* Hybrid */
        {1, OPUS_APPLICATION_AUDIO,       960, 2,  40000, MODE_HYBRID},
        {2, OPUS_APPLICATION_AUDIO,       960, 0,  48000, MODE_HYBRID},
        /* Auto (lets the encoder switch modes) */
        {2, OPUS_APPLICATION_AUDIO,       960, 1,  64000, 0},
        /* extended (round 2): 10/60 ms SILK payloads + 10 ms hybrid —
           exercises nb_subfr=2 and multi-frame SILK packet groups */
        {1, OPUS_APPLICATION_VOIP,        480, 2,  24000, MODE_SILK_ONLY},
        {2, OPUS_APPLICATION_VOIP,       2880, 2,  24000, MODE_SILK_ONLY},
        {1, OPUS_APPLICATION_VOIP,       2880, 2,  16000, MODE_SILK_ONLY},
        {1, OPUS_APPLICATION_AUDIO,      480, 0,  40000, MODE_HYBRID},
    };
    int n_cases = (int)(sizeof(cases) / sizeof(cases[0]));
    fwrite(&n_cases, 4, 1, f);

    for (int ci = 0; ci < n_cases; ci++) {
        int ch = cases[ci].ch;
        int frame = cases[ci].frame;
        int err;
        OpusEncoder *enc = opus_encoder_create(FS, ch, cases[ci].app, &err);
        OpusDecoder *dec = opus_decoder_create(FS, ch, &err);
        opus_encoder_ctl(enc, OPUS_SET_BITRATE(cases[ci].bitrate));
        opus_encoder_ctl(enc, OPUS_SET_COMPLEXITY(10));
        if (cases[ci].force_mode)
            opus_encoder_ctl(enc, OPUS_SET_FORCE_MODE(cases[ci].force_mode));
        if (cases[ci].force_mode == MODE_SILK_ONLY)
            /* pin a SILK-codable bandwidth: small frames at these rates
               otherwise drift to SWB and the encoder emits hybrid */
            opus_encoder_ctl(enc,
                OPUS_SET_MAX_BANDWIDTH(OPUS_BANDWIDTH_WIDEBAND));

        const double seconds = 2.0;
        int total = (int)(FS * seconds);
        total = (total / frame) * frame;
        int n_packets = total / frame;
        float *sig = malloc(sizeof(float) * total * ch);
        rstate = 424242 + ci;
        gen_signal(sig, total, ch, cases[ci].kind);

        fwrite(&ch, 4, 1, f);
        int sr = FS; fwrite(&sr, 4, 1, f);
        fwrite(&n_packets, 4, 1, f);
        fwrite(&frame, 4, 1, f);

        float *out = malloc(sizeof(float) * total * ch);
        long long out_pos = 0;
        unsigned char packet[4000];
        float *decbuf = malloc(sizeof(float) * frame * ch);
        for (int p = 0; p < n_packets; p++) {
            int len = opus_encode_float(enc, sig + p * frame * ch, frame,
                                        packet, sizeof(packet));
            if (len < 0) { fprintf(stderr, "encode err %d\n", len); return 1; }
            fwrite(&len, 4, 1, f);
            fwrite(packet, 1, len, f);
            int got = opus_decode_float(dec, packet, len, decbuf, frame, 0);
            if (got < 0) { fprintf(stderr, "decode err %d\n", got); return 1; }
            memcpy(out + out_pos, decbuf, sizeof(float) * got * ch);
            out_pos += (long long)got * ch;
        }
        fwrite(&out_pos, 8, 1, f);
        fwrite(out, sizeof(float), out_pos, f);
        free(sig); free(out); free(decbuf);
        opus_encoder_destroy(enc);
        opus_decoder_destroy(dec);
        fprintf(stderr, "case %d: ch=%d frame=%d packets=%d\n",
                ci, ch, frame, n_packets);
    }
    fclose(f);
    return 0;
}
