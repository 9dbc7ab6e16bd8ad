/* Reference-encoder rate-distortion probe: encode raw float32 PCM with
 * the REFERENCE build's libopus (CELT mode), decode it back with the
 * same libopus, print achieved bitrate + SNR.  Used by
 * tools/opus_rd_compare.py to put our encoder's numbers next to the
 * reference encoder's at matched bitrates (VERDICT r2 weak #9).
 *
 * Build:
 *   gcc -O2 -I /root/reference/third_party/opus/libopus/include \
 *       tools/opus_rd_ref.c /tmp/refbuild/lib/liblibnyquist.a -lm \
 *       -o /tmp/opus_rd_ref
 * Run:
 *   /tmp/opus_rd_ref in.f32 channels bitrate_bps frame_ms10
 * (in.f32 = interleaved float32 @48 kHz; frame_ms10 = frame size in
 * tenths of ms: 25/50/100/200.)  Prints: bytes snr_db
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "opus.h"

int main (int argc, char **argv)
{
    if (argc < 5) {
        fprintf (stderr, "usage: %s in.f32 ch bitrate frame_ms10 [v]\n",
                 argv [0]);
        return 2;
    }
    const char *path = argv [1];
    int ch = atoi (argv [2]);
    int bitrate = atoi (argv [3]);
    int ms10 = atoi (argv [4]);
    int frame = 48000 * ms10 / 10000;
    int voip = argc > 5 && argv [5][0] == 'v';   /* SILK WB speech mode */

    FILE *f = fopen (path, "rb");
    if (!f) { perror (path); return 1; }
    fseek (f, 0, SEEK_END);
    long fbytes = ftell (f);
    fseek (f, 0, SEEK_SET);
    long n = fbytes / 4 / ch;
    float *pcm = malloc (fbytes);
    if (fread (pcm, 4, (size_t) n * ch, f) != (size_t) n * ch)
        return 1;
    fclose (f);

    int err = 0;
    OpusEncoder *enc = opus_encoder_create (
        48000, ch, voip ? OPUS_APPLICATION_VOIP : OPUS_APPLICATION_AUDIO,
        &err);
    if (err) { fprintf (stderr, "enc create %d\n", err); return 1; }
    opus_encoder_ctl (enc, OPUS_SET_BITRATE (bitrate));
    opus_encoder_ctl (enc, OPUS_SET_COMPLEXITY (10));
    /* CELT mode: the music signal hint plus sub-10 ms frames force the
     * CELT-only path; at 20 ms the hint still selects CELT for music */
    if (voip) {
        opus_encoder_ctl (enc, OPUS_SET_SIGNAL (OPUS_SIGNAL_VOICE));
        opus_encoder_ctl (enc, OPUS_SET_MAX_BANDWIDTH (OPUS_BANDWIDTH_WIDEBAND));
    } else
        opus_encoder_ctl (enc, OPUS_SET_SIGNAL (OPUS_SIGNAL_MUSIC));
    opus_encoder_ctl (enc, OPUS_SET_VBR (1));
    opus_encoder_ctl (enc, OPUS_SET_VBR_CONSTRAINT (1));

    OpusDecoder *dec = opus_decoder_create (48000, ch, &err);
    if (err) { fprintf (stderr, "dec create %d\n", err); return 1; }

    long nframes = n / frame;           /* drop the tail remainder */
    unsigned char packet [4000];
    float *out = malloc (sizeof (float) * (size_t) frame * ch);
    double se = 0, ss = 0;
    long total_bytes = 0;
    /* account the decoder's pre-skip by comparing against a delayed
     * reference: libopus reports lookahead via OPUS_GET_LOOKAHEAD */
    opus_int32 skip = 0;
    opus_encoder_ctl (enc, OPUS_GET_LOOKAHEAD (&skip));

    long produced = 0;
    for (long k = 0; k < nframes; k++) {
        int bytes = opus_encode_float (enc, pcm + (size_t) k * frame * ch,
                                       frame, packet, sizeof (packet));
        if (bytes < 0) { fprintf (stderr, "encode %d\n", bytes); return 1; }
        total_bytes += bytes;
        int got = opus_decode_float (dec, packet, bytes, out, frame, 0);
        if (got != frame) { fprintf (stderr, "decode %d\n", got); return 1; }
        for (int i = 0; i < got * ch; i++) {
            long src = produced + i - (long) skip * ch;
            if (src >= 0 && src < n * ch) {
                double r = pcm [src], d = out [i] - r;
                ss += r * r;
                se += d * d;
            }
        }
        produced += (long) got * ch;
    }
    double snr = 10.0 * log10 (ss / (se > 0 ? se : 1e-30));
    printf ("%ld %.2f\n", total_bytes, snr);
    return 0;
}
