/* NQOR dumper via stock opusfile (same output layout as
   tools/oracle_dump.cpp): decodes an .opus file to interleaved f32. */
#include <stdio.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>
#include "opusfile.h"
int main(int argc, char **argv) {
  if (argc != 3) { fprintf(stderr, "usage: %s in.opus out.raw\n", argv[0]); return 2; }
  int err = 0;
  OggOpusFile *f = op_open_file(argv[1], &err);
  if (!f) { fprintf(stderr, "op_open_file err=%d\n", err); return 1; }
  int ch = op_channel_count(f, -1);
  FILE *o = fopen(argv[2], "wb");
  uint32_t magic = 0x524F514EU; /* 'NQOR' */
  uint32_t ch32 = (uint32_t)ch, sr = 48000;
  uint64_t count = 0;
  fwrite(&magic, 4, 1, o); fwrite(&ch32, 4, 1, o); fwrite(&sr, 4, 1, o);
  fwrite(&count, 8, 1, o);
  float buf[5760 * 8];
  for (;;) {
    int n = op_read_float(f, buf, 5760 * ch, NULL);
    if (n <= 0) break;
    fwrite(buf, sizeof(float), (size_t)n * ch, o);
    count += (uint64_t)n * ch;
  }
  fseek(o, 12, SEEK_SET);
  fwrite(&count, 8, 1, o);
  fclose(o);
  op_free(f);
  fprintf(stderr, "wrote %llu samples, %d ch\n", (unsigned long long)count, ch);
  return 0;
}
