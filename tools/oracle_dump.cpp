// Oracle generator: decodes an audio file with the REFERENCE library
// (libnyquist at /root/reference, built out-of-tree) and dumps the decoded
// interleaved float32 samples to a raw file, preceded by a tiny header.
// Used only to produce golden test vectors for the TPU rebuild's tests;
// this tool is NOT part of the shipped framework.
//
// Header layout (little-endian):
//   uint32 magic 'NQOR'
//   uint32 channels
//   uint32 sampleRate
//   uint64 sampleCount (total interleaved floats)
// followed by sampleCount float32 samples.
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include "libnyquist/Decoders.h"

int main(int argc, char** argv) {
    if (argc != 3) {
        fprintf(stderr, "usage: %s <input-audio> <output-raw>\n", argv[0]);
        return 2;
    }
    nqr::NyquistIO io;
    std::shared_ptr<nqr::AudioData> data = std::make_shared<nqr::AudioData>();
    try {
        io.Load(data.get(), std::string(argv[1]));
    } catch (const std::exception& e) {
        fprintf(stderr, "decode failed: %s\n", e.what());
        return 1;
    }
    FILE* f = fopen(argv[2], "wb");
    if (!f) { perror("fopen"); return 1; }
    uint32_t magic = 0x524f514e; // 'NQOR'
    uint32_t ch = (uint32_t)data->channelCount;
    uint32_t sr = (uint32_t)data->sampleRate;
    uint64_t n = (uint64_t)data->samples.size();
    fwrite(&magic, 4, 1, f);
    fwrite(&ch, 4, 1, f);
    fwrite(&sr, 4, 1, f);
    fwrite(&n, 8, 1, f);
    fwrite(data->samples.data(), sizeof(float), data->samples.size(), f);
    fclose(f);
    fprintf(stderr, "wrote %llu samples, %u ch, %u Hz\n",
            (unsigned long long)n, ch, sr);
    return 0;
}
