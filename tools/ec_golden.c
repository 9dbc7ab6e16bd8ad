/* Golden-vector generator for the range decoder.
 *
 * Runs a deterministic pseudo-random script of ec_dec_* operations from the
 * reference implementation (third_party/opus/celt/entdec.c) over a random
 * buffer and dumps every returned value + tell()/tell_frac() checkpoints,
 * so the Python RangeDecoder can be verified op-for-op.
 * Test tooling only; not part of the shipped framework.
 */
#include <stdio.h>
#include <stdlib.h>
#include "entdec.h"
#include "entcode.h"

static unsigned rstate = 98765;
static unsigned prand(unsigned mod) {
    rstate = rstate * 1664525u + 1013904223u;
    return (rstate >> 10) % mod;
}

int main(int argc, char **argv) {
    if (argc != 2) { fprintf(stderr, "usage: %s out.bin\n", argv[0]); return 2; }
    enum { BUFLEN = 256, NOPS = 400 };
    unsigned char buf[BUFLEN];
    for (int i = 0; i < BUFLEN; i++) buf[i] = (unsigned char)prand(256);

    static const unsigned char icdf_a[] = {200, 150, 100, 50, 20, 5, 0};
    static const unsigned char icdf_b[] = {128, 64, 32, 16, 8, 4, 2, 1, 0};

    FILE *f = fopen(argv[1], "wb");
    fwrite(buf, 1, BUFLEN, f);

    ec_dec dec;
    ec_dec_init(&dec, buf, BUFLEN);
    for (int i = 0; i < NOPS; i++) {
        unsigned op = prand(6);
        unsigned v = 0;
        switch (op) {
        case 0: {            /* decode/update with random ft */
            unsigned ft = 2 + prand(1000);
            unsigned fs = ec_decode(&dec, ft);
            /* pick the bucket [fs, fs+1) like a uniform code */
            ec_dec_update(&dec, fs, fs + 1, ft);
            v = fs;
        } break;
        case 1: v = (unsigned)ec_dec_bit_logp(&dec, 1 + prand(14)); break;
        case 2: v = (unsigned)ec_dec_icdf(&dec, icdf_a, 8); break;
        case 3: v = (unsigned)ec_dec_icdf(&dec, icdf_b, 8); break;
        case 4: v = ec_dec_uint(&dec, 2 + prand(100000)); break;
        case 5: v = ec_dec_bits(&dec, 1 + prand(24)); break;
        }
        unsigned tf = ec_tell_frac(&dec);
        fwrite(&op, 4, 1, f);
        fwrite(&v, 4, 1, f);
        fwrite(&tf, 4, 1, f);
    }
    fclose(f);
    fprintf(stderr, "wrote %s\n", argv[1]);
    return 0;
}
