/* Canonical MurmurHash3 implementations (x64_128 and x86_32), written from
 * the public algorithm specification (Austin Appleby, public domain).
 *
 * Used as an independent cross-check of the NumPy/JAX implementations in
 * mhap_tpu (tests/test_murmur3.py), and as a fast host-side hasher for
 * golden generation.  Compiled to a shared library by native/Makefile and
 * loaded via ctypes.
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>

static inline uint64_t rotl64(uint64_t x, int8_t r) {
  return (x << r) | (x >> (64 - r));
}
static inline uint32_t rotl32(uint32_t x, int8_t r) {
  return (x << r) | (x >> (32 - r));
}

static inline uint64_t getblock64(const uint8_t *p, size_t i) {
  uint64_t v;
  memcpy(&v, p + i * 8, 8); /* little-endian host assumed (x86/ARM LE) */
  return v;
}
static inline uint32_t getblock32(const uint8_t *p, size_t i) {
  uint32_t v;
  memcpy(&v, p + i * 4, 4);
  return v;
}

static inline uint64_t fmix64(uint64_t k) {
  k ^= k >> 33;
  k *= 0xff51afd7ed558ccdULL;
  k ^= k >> 33;
  k *= 0xc4ceb9fe1a85ec53ULL;
  k ^= k >> 33;
  return k;
}
static inline uint32_t fmix32(uint32_t h) {
  h ^= h >> 16;
  h *= 0x85ebca6b;
  h ^= h >> 13;
  h *= 0xc2b2ae35;
  h ^= h >> 16;
  return h;
}

void murmur3_x64_128(const void *key, int len, uint32_t seed, void *out) {
  const uint8_t *data = (const uint8_t *)key;
  const int nblocks = len / 16;

  /* guava Murmur3_128Hasher(int seed): long h1 = seed (sign-extended) */
  uint64_t h1 = (uint64_t)(int64_t)(int32_t)seed;
  uint64_t h2 = (uint64_t)(int64_t)(int32_t)seed;

  const uint64_t c1 = 0x87c37b91114253d5ULL;
  const uint64_t c2 = 0x4cf5ad432745937fULL;

  for (int i = 0; i < nblocks; i++) {
    uint64_t k1 = getblock64(data, i * 2 + 0);
    uint64_t k2 = getblock64(data, i * 2 + 1);

    k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
    h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729;
    k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
    h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5;
  }

  const uint8_t *tail = data + nblocks * 16;
  uint64_t k1 = 0, k2 = 0;
  switch (len & 15) {
    case 15: k2 ^= ((uint64_t)tail[14]) << 48; /* fallthrough */
    case 14: k2 ^= ((uint64_t)tail[13]) << 40; /* fallthrough */
    case 13: k2 ^= ((uint64_t)tail[12]) << 32; /* fallthrough */
    case 12: k2 ^= ((uint64_t)tail[11]) << 24; /* fallthrough */
    case 11: k2 ^= ((uint64_t)tail[10]) << 16; /* fallthrough */
    case 10: k2 ^= ((uint64_t)tail[9]) << 8;   /* fallthrough */
    case 9:  k2 ^= ((uint64_t)tail[8]) << 0;
             k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2;
             /* fallthrough */
    case 8:  k1 ^= ((uint64_t)tail[7]) << 56; /* fallthrough */
    case 7:  k1 ^= ((uint64_t)tail[6]) << 48; /* fallthrough */
    case 6:  k1 ^= ((uint64_t)tail[5]) << 40; /* fallthrough */
    case 5:  k1 ^= ((uint64_t)tail[4]) << 32; /* fallthrough */
    case 4:  k1 ^= ((uint64_t)tail[3]) << 24; /* fallthrough */
    case 3:  k1 ^= ((uint64_t)tail[2]) << 16; /* fallthrough */
    case 2:  k1 ^= ((uint64_t)tail[1]) << 8;  /* fallthrough */
    case 1:  k1 ^= ((uint64_t)tail[0]) << 0;
             k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1;
  }

  h1 ^= (uint64_t)len;
  h2 ^= (uint64_t)len;
  h1 += h2;
  h2 += h1;
  h1 = fmix64(h1);
  h2 = fmix64(h2);
  h1 += h2;
  h2 += h1;

  ((uint64_t *)out)[0] = h1;
  ((uint64_t *)out)[1] = h2;
}

uint32_t murmur3_x86_32(const void *key, int len, uint32_t seed) {
  const uint8_t *data = (const uint8_t *)key;
  const int nblocks = len / 4;
  uint32_t h1 = seed;
  const uint32_t c1 = 0xcc9e2d51;
  const uint32_t c2 = 0x1b873593;

  for (int i = 0; i < nblocks; i++) {
    uint32_t k1 = getblock32(data, i);
    k1 *= c1; k1 = rotl32(k1, 15); k1 *= c2;
    h1 ^= k1; h1 = rotl32(h1, 13); h1 = h1 * 5 + 0xe6546b64;
  }

  const uint8_t *tail = data + nblocks * 4;
  uint32_t k1 = 0;
  switch (len & 3) {
    case 3: k1 ^= ((uint32_t)tail[2]) << 16; /* fallthrough */
    case 2: k1 ^= ((uint32_t)tail[1]) << 8;  /* fallthrough */
    case 1: k1 ^= ((uint32_t)tail[0]);
            k1 *= c1; k1 = rotl32(k1, 15); k1 *= c2; h1 ^= k1;
  }

  h1 ^= (uint32_t)len;
  return fmix32(h1);
}

/* Batched helpers: hash each k-mer window of an ASCII sequence exactly the
 * way the reference hashes Java substring chars (UTF-16LE expansion).
 * seq: ASCII bytes [len]; out: n = len-k+1 results. */

void mhap_kmer_hashes_128(const uint8_t *seq, int len, int k, uint32_t seed,
                          uint64_t *out_h1) {
  int n = len - k + 1;
  /* stack buffer for the UTF-16LE expansion of one k-mer (k <= 512) */
  uint8_t buf[1024];
  uint64_t h[2];
  for (int i = 0; i < n; i++) {
    for (int j = 0; j < k; j++) {
      buf[2 * j] = seq[i + j];
      buf[2 * j + 1] = 0;
    }
    murmur3_x64_128(buf, 2 * k, seed, h);
    out_h1[i] = h[0];
  }
}

void mhap_kmer_hashes_32(const uint8_t *seq, int len, int k, uint32_t seed,
                         uint32_t *out) {
  int n = len - k + 1;
  uint8_t buf[1024];
  for (int i = 0; i < n; i++) {
    for (int j = 0; j < k; j++) {
      buf[2 * j] = seq[i + j];
      buf[2 * j + 1] = 0;
    }
    out[i] = murmur3_x86_32(buf, 2 * k, seed);
  }
}
