/* Native host-side hot loops for the branchy bitstream half.
 *
 * The TPU runs the dense math; these are the byte-serial decoders that
 * bound multi-stream throughput on the host (SURVEY.md §7 "host decode
 * throughput"). Built as a plain shared library and bound via ctypes
 * (no pybind11 in the image). Python fallbacks exist for every function.
 *
 * Contents:
 *   flac_rice_decode   — Rice/unary residual reader (stream_decoder.c
 *                        read_residual_partitioned_rice_ semantics)
 *   flac_lpc_restore   — integer LPC synthesis (lpc.c FLAC__lpc_restore_signal)
 *   flac_fixed_restore — fixed predictors order 0-4 (fixed.c)
 */
#include <stdint.h>
#include <string.h>

typedef struct {
    const uint8_t *buf;
    uint64_t pos;    /* bit position */
    uint64_t limit;  /* total bits */
} bitreader;

static inline uint32_t br_read(bitreader *br, int n) {
    uint32_t v = 0;
    /* MSB-first read of n bits (n <= 32) */
    while (n > 0) {
        uint64_t byte = br->pos >> 3;
        int off = br->pos & 7;
        int take = 8 - off;
        if (take > n) take = n;
        uint8_t b = br->buf[byte];
        uint8_t chunk = (uint8_t)((b << off) & 0xFF) >> (8 - take);
        v = (v << take) | chunk;
        br->pos += take;
        n -= take;
    }
    return v;
}

static inline uint32_t br_read_unary(bitreader *br) {
    uint32_t q = 0;
    for (;;) {
        uint64_t byte = br->pos >> 3;
        int off = br->pos & 7;
        uint8_t b = (uint8_t)(br->buf[byte] << off);
        if (b) {
            int lead = 0;
            while (!(b & 0x80)) { b <<= 1; lead++; }
            q += lead;
            br->pos += lead + 1;
            return q;
        }
        q += 8 - off;
        br->pos += 8 - off;
        if (br->pos >= br->limit) return q;  /* corrupt stream guard */
    }
}

/* Decode `n` Rice(k) residuals starting at bit `pos`; k==-1 means escape
   (verbatim `esc_bits`-bit signed values). Returns new bit position. */
uint64_t flac_rice_decode(const uint8_t *buf, uint64_t nbits, uint64_t pos,
                          int32_t *out, int64_t n, int k, int esc_bits) {
    bitreader br = { buf, pos, nbits };
    if (k < 0) {
        for (int64_t i = 0; i < n; i++) {
            uint32_t v = esc_bits ? br_read(&br, esc_bits) : 0;
            /* sign extend */
            int32_t s = (int32_t)(v << (32 - esc_bits)) >> (32 - esc_bits);
            out[i] = esc_bits ? s : 0;
        }
        return br.pos;
    }
    for (int64_t i = 0; i < n; i++) {
        uint32_t q = br_read_unary(&br);
        uint32_t bits = k ? br_read(&br, k) : 0;
        uint32_t u = (q << k) | bits;
        out[i] = (int32_t)(u >> 1) ^ -(int32_t)(u & 1);
    }
    return br.pos;
}

/* FLAC integer LPC synthesis: data[i] = residual[i] +
   (sum coef[j]*data[i-j-1]) >> shift, 64-bit accumulator
   (lpc.c FLAC__lpc_restore_signal_wide semantics — exact for all bps). */
void flac_lpc_restore(const int32_t *residual, int64_t n, const int32_t *coef,
                      int order, int shift, int32_t *data) {
    for (int64_t i = 0; i < n; i++) {
        int64_t sum = 0;
        for (int j = 0; j < order; j++)
            sum += (int64_t)coef[j] * data[i - j - 1];
        data[i] = residual[i] + (int32_t)(sum >> shift);
    }
}

void flac_fixed_restore(const int32_t *residual, int64_t n, int order,
                        int32_t *data) {
    switch (order) {
    case 0:
        memcpy(data, residual, (size_t)n * 4);
        break;
    case 1:
        for (int64_t i = 0; i < n; i++)
            data[i] = residual[i] + data[i - 1];
        break;
    case 2:
        for (int64_t i = 0; i < n; i++)
            data[i] = residual[i] + 2 * data[i - 1] - data[i - 2];
        break;
    case 3:
        for (int64_t i = 0; i < n; i++)
            data[i] = residual[i] + 3 * data[i - 1] - 3 * data[i - 2]
                      + data[i - 3];
        break;
    case 4:
        for (int64_t i = 0; i < n; i++)
            data[i] = residual[i] + 4 * data[i - 1] - 6 * data[i - 2]
                      + 4 * data[i - 3] - data[i - 4];
        break;
    }
}
