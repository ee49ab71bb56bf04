/* Native host-side helpers for the engine hot loops.
 *
 * Parity note: the reference binds the xxhash C library for prefix-cache
 * block hashing (lightvllm/engine/block_manager.py:64-81 uses xxhash.xxh64)
 * and runs per-token Python loops for slot-mapping prep
 * (engine/model_runner.py:335-364). Here both are native C, loaded via
 * ctypes (no pybind11 in this image). xxhash64 is implemented from the
 * public algorithm specification.
 *
 * Build: cc -O3 -shared -fPIC lv_native.c -o lv_native.so (see __init__.py).
 */

#include <stdint.h>
#include <stddef.h>

#define P1 0x9E3779B185EBCA87ULL
#define P2 0xC2B2AE3D27D4EB4FULL
#define P3 0x165667B19E3779F9ULL
#define P4 0x85EBCA77C2B2AE63ULL
#define P5 0x27D4EB2F165667C5ULL

static inline uint64_t rotl64(uint64_t x, int r) {
    return (x << r) | (x >> (64 - r));
}

static inline uint64_t round64(uint64_t acc, uint64_t input) {
    acc += input * P2;
    acc = rotl64(acc, 31);
    acc *= P1;
    return acc;
}

static inline uint64_t merge_round(uint64_t acc, uint64_t val) {
    val = round64(0, val);
    acc ^= val;
    acc = acc * P1 + P4;
    return acc;
}

static inline uint64_t read64(const uint8_t* p) {
    uint64_t v;
    __builtin_memcpy(&v, p, 8);
    return v; /* little-endian hosts only (x86-64 / aarch64) */
}

static inline uint64_t read32(const uint8_t* p) {
    uint32_t v;
    __builtin_memcpy(&v, p, 4);
    return (uint64_t)v;
}

/* xxhash64 over an arbitrary byte buffer. */
uint64_t lv_xxh64(const uint8_t* input, size_t len, uint64_t seed) {
    const uint8_t* p = input;
    const uint8_t* end = input + len;
    uint64_t h;

    if (len >= 32) {
        const uint8_t* limit = end - 32;
        uint64_t v1 = seed + P1 + P2;
        uint64_t v2 = seed + P2;
        uint64_t v3 = seed + 0;
        uint64_t v4 = seed - P1;
        do {
            v1 = round64(v1, read64(p)); p += 8;
            v2 = round64(v2, read64(p)); p += 8;
            v3 = round64(v3, read64(p)); p += 8;
            v4 = round64(v4, read64(p)); p += 8;
        } while (p <= limit);
        h = rotl64(v1, 1) + rotl64(v2, 7) + rotl64(v3, 12) + rotl64(v4, 18);
        h = merge_round(h, v1);
        h = merge_round(h, v2);
        h = merge_round(h, v3);
        h = merge_round(h, v4);
    } else {
        h = seed + P5;
    }
    h += (uint64_t)len;
    while (p + 8 <= end) {
        h ^= round64(0, read64(p));
        h = rotl64(h, 27) * P1 + P4;
        p += 8;
    }
    if (p + 4 <= end) {
        h ^= read32(p) * P1;
        h = rotl64(h, 23) * P2 + P3;
        p += 4;
    }
    while (p < end) {
        h ^= (*p) * P5;
        h = rotl64(h, 11) * P1;
        p++;
    }
    h ^= h >> 33;
    h *= P2;
    h ^= h >> 29;
    h *= P3;
    h ^= h >> 32;
    return h;
}

/* Chained block hash: H(prefix_hash-or-sentinel || token_ids as i64le).
 * tokens is int64 little-endian; has_prefix selects whether prefix mixes in
 * (as an 8-byte seed prefix, matching the Python fallback's byte layout). */
uint64_t lv_block_hash(const int64_t* tokens, size_t n_tokens,
                       uint64_t prefix, int has_prefix) {
    /* Hash prefix bytes and token bytes as one logical stream by seeding
     * with the prefix hash (cheaper than concatenating buffers; chaining
     * strength is equivalent). */
    uint64_t seed = has_prefix ? prefix : 0x5bd1e995ULL;
    return lv_xxh64((const uint8_t*)tokens, n_tokens * 8, seed);
}

/* Paged-KV slot mapping: out[j] = bt[(start+j)/bs]*bs + (start+j)%bs for
 * j in [0, n). */
void lv_fill_slots(const int32_t* block_table, int32_t bs, int64_t start,
                   int64_t n, int32_t* out) {
    int64_t pos = start;
    int64_t blk = pos / bs;
    int32_t off = (int32_t)(pos % bs);
    int32_t base = block_table[blk] * bs;
    for (int64_t j = 0; j < n; j++) {
        out[j] = base + off;
        /* Only refresh the base when another iteration remains: if the last
         * written slot ends exactly on a block boundary, blk+1 is past the
         * end of block_table (heap over-read / UB). */
        if (++off == bs && j + 1 < n) {
            off = 0;
            blk++;
            base = block_table[blk] * bs;
        }
    }
}

