/* Cross-check tool: drive the reference opus_repacketizer over the
   golden packet corpus and print each merged/padded packet as hex. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <opus.h>

static unsigned char pkts[64][4096];
static int lens[64];

int main(void) {
    FILE *f = fopen("tests/golden/opus_packets.bin", "rb");
    if (!f) { perror("open"); return 1; }
    unsigned char hdr[20];
    fread(hdr, 1, 20, f);
    int n_packets; memcpy(&n_packets, hdr + 12, 4);
    int n = 0;
    for (; n < 24 && n < 64; n++) {
        int ln; if (fread(&ln, 4, 1, f) != 1) break;
        lens[n] = ln; fread(pkts[n], 1, ln, f);
    }
    fclose(f);
    OpusRepacketizer *rp = opus_repacketizer_create();
    unsigned char out[16384];
    /* merge groups of 3 consecutive CELT packets */
    for (int g = 0; g + 3 <= 12; g += 3) {
        opus_repacketizer_init(rp);
        for (int i = 0; i < 3; i++) {
            int r = opus_repacketizer_cat(rp, pkts[g + i], lens[g + i]);
            if (r != OPUS_OK) { printf("caterr %d\n", r); return 1; }
        }
        int r = opus_repacketizer_out(rp, out, sizeof out);
        if (r < 0) { printf("outerr %d\n", r); return 1; }
        printf("merge%d ", g);
        for (int i = 0; i < r; i++) printf("%02x", out[i]);
        printf("\n");
    }
    /* pad packet 0 to +37 bytes, then unpad */
    memcpy(out, pkts[0], lens[0]);
    int r = opus_packet_pad(out, lens[0], lens[0] + 37);
    if (r != OPUS_OK) { printf("paderr %d\n", r); return 1; }
    printf("pad0 ");
    for (int i = 0; i < lens[0] + 37; i++) printf("%02x", out[i]);
    printf("\n");
    r = opus_packet_unpad(out, lens[0] + 37);
    if (r < 0) { printf("unpaderr %d\n", r); return 1; }
    printf("unpad0 ");
    for (int i = 0; i < r; i++) printf("%02x", out[i]);
    printf("\n");
    /* range output: frames 1..3 of a 3-packet merge */
    opus_repacketizer_init(rp);
    for (int i = 0; i < 3; i++) opus_repacketizer_cat(rp, pkts[i], lens[i]);
    r = opus_repacketizer_out_range(rp, 1, 3, out, sizeof out);
    if (r < 0) { printf("rangeerr %d\n", r); return 1; }
    printf("range13 ");
    for (int i = 0; i < r; i++) printf("%02x", out[i]);
    printf("\n");
    return 0;
}
