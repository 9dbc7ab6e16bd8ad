/* Decode a raw packet sequence with stock libopus and dump f32 PCM.
   Input: u32 channels, u32 n_packets, then per packet u32 len + bytes.
   len==0: next u32 is a PLC frame size in samples (opus_decode NULL). */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include "opus.h"
int main(int argc, char **argv) {
  if (argc != 3) return 2;
  FILE *f = fopen(argv[1], "rb");
  uint32_t ch, np;
  fread(&ch, 4, 1, f); fread(&np, 4, 1, f);
  int err;
  OpusDecoder *d = opus_decoder_create(48000, (int)ch, &err);
  FILE *o = fopen(argv[2], "wb");
  float *pcm = malloc(sizeof(float) * 5760 * ch);
  unsigned char buf[2048];
  for (uint32_t k = 0; k < np; k++) {
    uint32_t len; fread(&len, 4, 1, f);
    int n;
    if (len == 0) {
      uint32_t fs; fread(&fs, 4, 1, f);
      n = opus_decode_float(d, NULL, 0, pcm, (int)fs, 0);
    } else {
      fread(buf, 1, len, f);
      n = opus_decode_float(d, buf, (int)len, pcm, 5760, 0);
    }
    if (n < 0) { fprintf(stderr, "pkt %u: err %d\n", k, n); return 1; }
    fwrite(pcm, sizeof(float), (size_t)n * ch, o);
  }
  fclose(o);
  return 0;
}
