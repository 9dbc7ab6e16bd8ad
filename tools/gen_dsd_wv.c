/* Synthesize WavPack DSD fixtures + goldens with the REFERENCE wavpack
 * library (built standalone with -DENABLE_DSD; the reference's own
 * CMake never defines it, so this exercises a surface the reference
 * ships in source but does not compile).
 *
 * Generates three .wv files from a 2nd-order delta-sigma modulated
 * sine at DSD64 (2.8224 MHz bits / 352.8 kHz bytes):
 *   dsd_fast.wv   stereo, default config      -> mode 1 (value table)
 *   dsd_high.wv   stereo, CONFIG_HIGH_FLAG    -> mode 3 (bit-adaptive)
 *   dsd_raw.wv    mono, white-noise bits      -> mode 0 (stored bytes)
 * and decodes each back twice with the reference decoder:
 *   <name>.native.raw  OPEN_DSD_NATIVE  (DSD bytes, u8, interleaved)
 *   <name>.pcm.raw     OPEN_DSD_AS_PCM  (24-bit ints, i32, interleaved)
 * Raw header: u32 magic 'NQRD', u32 channels, u32 rate, u64 count,
 * then payload.
 *
 * Build (from repo root):
 *   gcc -O2 -DENABLE_DSD -I /root/reference/third_party/wavpack/include \
 *       tools/gen_dsd_wv.c /root/reference/third_party/wavpack/src/*.c \
 *       -lm -o /tmp/gen_dsd_wv
 * Run:  /tmp/gen_dsd_wv <outdir>
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "wavpack.h"

#define BYTE_RATE 352800            /* DSD64: bytes per second per ch */
#define SECONDS 0.2
#define NBYTES ((int)(BYTE_RATE * SECONDS))   /* per channel */

static int write_blocks (void *id, void *data, int32_t bcount)
{
    return fwrite (data, 1, bcount, (FILE *) id) == (size_t) bcount;
}

/* 2nd-order delta-sigma modulator: 1 kHz (+2 kHz on R) sine -> DSD
 * bytes, MSB-first (QMODE_DSD_MSB_FIRST). */
static void synth_dsd (unsigned char *out, int nbytes, double freq,
                       int seed)
{
    double s1 = 0, s2 = 0;
    int i, b;

    for (i = 0; i < nbytes; ++i) {
        unsigned char byte = 0;

        for (b = 0; b < 8; ++b) {
            long n = (long) i * 8 + b;
            double x = 0.4 * sin (2.0 * M_PI * freq * n / (BYTE_RATE * 8.0));
            double y = (s2 >= 0) ? 1.0 : -1.0;

            s1 += x - y;
            s2 += s1 - y;
            byte = (byte << 1) | (y > 0);
        }
        out [i] = byte;
    }
    (void) seed;
}

static void synth_noise (unsigned char *out, int nbytes, unsigned seed)
{
    int i;
    for (i = 0; i < nbytes; ++i) {
        seed = seed * 1664525u + 1013904223u;
        out [i] = seed >> 24;
    }
}

static int encode (const char *path, const unsigned char *l,
                   const unsigned char *r, int nbytes, int high)
{
    WavpackConfig config;
    FILE *f = fopen (path, "wb");
    WavpackContext *wpc = WavpackOpenFileOutput (write_blocks, f, NULL);
    int32_t *buf;
    int i, nch = r ? 2 : 1;

    memset (&config, 0, sizeof (config));
    config.bytes_per_sample = 1;
    config.bits_per_sample = 8;
    config.channel_mask = nch == 2 ? 3 : 4;
    config.num_channels = nch;
    config.sample_rate = BYTE_RATE;
    config.qmode = QMODE_DSD_MSB_FIRST;
    if (high)
        config.flags |= CONFIG_HIGH_FLAG;

    if (!WavpackSetConfiguration64 (wpc, &config, nbytes, NULL)) {
        fprintf (stderr, "config: %s\n", WavpackGetErrorMessage (wpc));
        return 1;
    }
    if (!WavpackPackInit (wpc)) {
        fprintf (stderr, "init: %s\n", WavpackGetErrorMessage (wpc));
        return 1;
    }

    buf = malloc (sizeof (int32_t) * nbytes * nch);
    for (i = 0; i < nbytes; ++i) {
        buf [i * nch] = l [i];
        if (r)
            buf [i * nch + 1] = r [i];
    }
    if (!WavpackPackSamples (wpc, buf, nbytes) ||
        !WavpackFlushSamples (wpc)) {
        fprintf (stderr, "pack: %s\n", WavpackGetErrorMessage (wpc));
        return 1;
    }
    WavpackCloseFile (wpc);
    fclose (f);
    free (buf);
    return 0;
}

static int dump (const char *wvpath, const char *outpath, int flags,
                 int as_pcm)
{
    char error [80];
    WavpackContext *wpc = WavpackOpenFileInput (wvpath, error, flags, 0);
    FILE *f;
    uint32_t magic = 0x4452514e;    /* 'NQRD' */
    uint32_t ch, rate;
    uint64_t count = 0;
    int32_t *buf;
    long npos;

    if (!wpc) {
        fprintf (stderr, "open %s: %s\n", wvpath, error);
        return 1;
    }
    ch = WavpackGetNumChannels (wpc);
    rate = WavpackGetSampleRate (wpc);
    f = fopen (outpath, "wb");
    fwrite (&magic, 4, 1, f);
    fwrite (&ch, 4, 1, f);
    fwrite (&rate, 4, 1, f);
    npos = ftell (f);
    fwrite (&count, 8, 1, f);

    buf = malloc (sizeof (int32_t) * 4096 * ch);
    while (1) {
        uint32_t got = WavpackUnpackSamples (wpc, buf, 4096);
        uint32_t i;

        if (!got)
            break;
        if (as_pcm)
            fwrite (buf, 4, got * ch, f);
        else
            for (i = 0; i < got * ch; ++i) {
                unsigned char b = (unsigned char) buf [i];
                fwrite (&b, 1, 1, f);
            }
        count += (uint64_t) got * ch;
    }
    fseek (f, npos, SEEK_SET);
    fwrite (&count, 8, 1, f);
    fclose (f);
    free (buf);
    fprintf (stderr, "%s: %llu values, %u ch, %u Hz\n", outpath,
             (unsigned long long) count, ch, rate);
    WavpackCloseFile (wpc);
    return 0;
}

int main (int argc, char **argv)
{
    const char *dir = argc > 1 ? argv [1] : ".";
    unsigned char *l = malloc (NBYTES), *r = malloc (NBYTES);
    char wv [512], raw [512];
    static const char *names [] = { "dsd_fast", "dsd_high", "dsd_raw" };
    int i;

    for (i = 0; i < 3; ++i) {
        int rc;

        if (i < 2) {
            synth_dsd (l, NBYTES, 1000.0, 0);
            synth_dsd (r, NBYTES, 2000.0, 1);
        }
        else
            synth_noise (l, NBYTES, 0xDEADBEEF);

        snprintf (wv, sizeof (wv), "%s/%s.wv", dir, names [i]);
        rc = encode (wv, l, i < 2 ? r : NULL, NBYTES, i == 1);
        if (rc)
            return rc;

        snprintf (raw, sizeof (raw), "%s/%s.native.raw", dir, names [i]);
        if (dump (wv, raw, OPEN_DSD_NATIVE, 0))
            return 1;
        snprintf (raw, sizeof (raw), "%s/%s.pcm.raw", dir, names [i]);
        if (dump (wv, raw, OPEN_DSD_AS_PCM, 1))
            return 1;
    }
    free (l);
    free (r);
    return 0;
}
