// Hasher zoo for the TPU-native zpaqfranz rebuild.
//
// The reference ships a dozen hashers (reference README.md:96-105 lists
// SHA-1, MD5, XXH3, BLAKE3, SHA-2/3-256, WHIRLPOOL, HIGHWAY 64/128/256,
// wyhash, Nilsimsa, ZETA; man/zpaqfranz.pod:195-202 enumerates each
// implementation's origin).  These are clean-room re-implementations from
// the public algorithm specifications — no reference code is used (the
// reference's hasher implementations live only in the missing
// zpaqfranz.cpp blob anyway, SURVEY.md §0).
//
// Validation strategy (tests/test_hashes.py):
//   - MD5 / SHA-3-256: cross-checked against Python hashlib.
//   - XXH3-64 / XXH3-128 / XXH64: cross-checked against the python-xxhash
//     bindings of the canonical library.
//   - BLAKE3 / WHIRLPOOL: checked against the published empty-input test
//     vectors plus structural self-tests (streaming == one-shot).
//   - HighwayHash / wyhash: portable implementations per the published
//     algorithm; self-consistency tested.
//
// All functions are one-shot over a contiguous buffer: the archiver reads
// whole fragments/files into memory before hashing (same model as the
// reference's chunked hashers, CHANGELOG.md:73-76).

#include <cstdint>
#include <cstring>
#include <cstdlib>

typedef uint8_t  u8;
typedef uint32_t u32;
typedef uint64_t u64;

static inline u32 rotl32(u32 x, int r) { return (x << r) | (x >> (32 - r)); }
static inline u32 rotr32(u32 x, int r) { return (x >> r) | (x << (32 - r)); }
static inline u64 rotl64(u64 x, int r) { return (x << r) | (x >> (64 - r)); }
static inline u64 rotr64(u64 x, int r) { return (x >> r) | (x << (64 - r)); }
static inline u32 le32(const u8* p) {
  return (u32)p[0] | ((u32)p[1] << 8) | ((u32)p[2] << 16) | ((u32)p[3] << 24);
}
static inline u64 le64(const u8* p) {
  return (u64)le32(p) | ((u64)le32(p + 4) << 32);
}
static inline void put_le32(u8* p, u32 v) {
  p[0] = (u8)v; p[1] = (u8)(v >> 8); p[2] = (u8)(v >> 16); p[3] = (u8)(v >> 24);
}
static inline void put_le64(u8* p, u64 v) {
  put_le32(p, (u32)v); put_le32(p + 4, (u32)(v >> 32));
}
static inline void put_be64(u8* p, u64 v) {
  for (int i = 7; i >= 0; --i) { p[i] = (u8)v; v >>= 8; }
}

// ---------------------------------------------------------------------------
// MD5 (RFC 1321)
// ---------------------------------------------------------------------------

static const u32 MD5_K[64] = {
  0xd76aa478,0xe8c7b756,0x242070db,0xc1bdceee,0xf57c0faf,0x4787c62a,
  0xa8304613,0xfd469501,0x698098d8,0x8b44f7af,0xffff5bb1,0x895cd7be,
  0x6b901122,0xfd987193,0xa679438e,0x49b40821,0xf61e2562,0xc040b340,
  0x265e5a51,0xe9b6c7aa,0xd62f105d,0x02441453,0xd8a1e681,0xe7d3fbc8,
  0x21e1cde6,0xc33707d6,0xf4d50d87,0x455a14ed,0xa9e3e905,0xfcefa3f8,
  0x676f02d9,0x8d2a4c8a,0xfffa3942,0x8771f681,0x6d9d6122,0xfde5380c,
  0xa4beea44,0x4bdecfa9,0xf6bb4b60,0xbebfbc70,0x289b7ec6,0xeaa127fa,
  0xd4ef3085,0x04881d05,0xd9d4d039,0xe6db99e5,0x1fa27cf8,0xc4ac5665,
  0xf4292244,0x432aff97,0xab9423a7,0xfc93a039,0x655b59c3,0x8f0ccc92,
  0xffeff47d,0x85845dd1,0x6fa87e4f,0xfe2ce6e0,0xa3014314,0x4e0811a1,
  0xf7537e82,0xbd3af235,0x2ad7d2bb,0xeb86d391};
static const int MD5_S[64] = {
  7,12,17,22,7,12,17,22,7,12,17,22,7,12,17,22,
  5, 9,14,20,5, 9,14,20,5, 9,14,20,5, 9,14,20,
  4,11,16,23,4,11,16,23,4,11,16,23,4,11,16,23,
  6,10,15,21,6,10,15,21,6,10,15,21,6,10,15,21};

static void md5_block(u32 h[4], const u8* p) {
  u32 a = h[0], b = h[1], c = h[2], d = h[3], m[16];
  for (int i = 0; i < 16; ++i) m[i] = le32(p + 4 * i);
  for (int i = 0; i < 64; ++i) {
    u32 f; int g;
    if (i < 16)      { f = (b & c) | (~b & d);  g = i; }
    else if (i < 32) { f = (d & b) | (~d & c);  g = (5 * i + 1) & 15; }
    else if (i < 48) { f = b ^ c ^ d;           g = (3 * i + 5) & 15; }
    else             { f = c ^ (b | ~d);        g = (7 * i) & 15; }
    u32 tmp = d; d = c; c = b;
    b = b + rotl32(a + f + MD5_K[i] + m[g], MD5_S[i]);
    a = tmp;
  }
  h[0] += a; h[1] += b; h[2] += c; h[3] += d;
}

extern "C" void tz_md5(const u8* data, size_t n, u8* out16) {
  u32 h[4] = {0x67452301, 0xefcdab89, 0x98badcfe, 0x10325476};
  size_t i = 0;
  for (; i + 64 <= n; i += 64) md5_block(h, data + i);
  u8 tail[128];
  size_t r = n - i;
  memcpy(tail, data + i, r);
  tail[r++] = 0x80;
  size_t pad = (r <= 56) ? 64 : 128;
  memset(tail + r, 0, pad - r);
  put_le64(tail + pad - 8, (u64)n * 8);
  md5_block(h, tail);
  if (pad == 128) md5_block(h, tail + 64);
  for (int k = 0; k < 4; ++k) put_le32(out16 + 4 * k, h[k]);
}

// ---------------------------------------------------------------------------
// SHA-3-256 (FIPS 202, Keccak-f[1600], rate 136)
// ---------------------------------------------------------------------------

static const u64 KECCAK_RC[24] = {
  0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
  0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
  0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
  0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
  0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
  0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
  0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
  0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL};
static const int KECCAK_ROT[25] = {
   0,  1, 62, 28, 27,
  36, 44,  6, 55, 20,
   3, 10, 43, 25, 39,
  41, 45, 15, 21,  8,
  18,  2, 61, 56, 14};

static void keccak_f(u64 s[25]) {
  for (int round = 0; round < 24; ++round) {
    u64 c[5], d[5];
    for (int x = 0; x < 5; ++x)
      c[x] = s[x] ^ s[x + 5] ^ s[x + 10] ^ s[x + 15] ^ s[x + 20];
    for (int x = 0; x < 5; ++x) {
      d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
      for (int y = 0; y < 5; ++y) s[x + 5 * y] ^= d[x];
    }
    u64 b[25];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        b[y + 5 * ((2 * x + 3 * y) % 5)] = rotl64(s[x + 5 * y],
                                                  KECCAK_ROT[x + 5 * y]);
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y)
        s[x + 5 * y] = b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] &
                                        b[(x + 2) % 5 + 5 * y]);
    s[0] ^= KECCAK_RC[round];
  }
}

extern "C" void tz_sha3_256(const u8* data, size_t n, u8* out32) {
  const size_t rate = 136;
  u64 s[25] = {0};
  size_t i = 0;
  while (n - i >= rate) {
    for (size_t k = 0; k < rate / 8; ++k) s[k] ^= le64(data + i + 8 * k);
    keccak_f(s);
    i += rate;
  }
  u8 last[136] = {0};
  memcpy(last, data + i, n - i);
  last[n - i] ^= 0x06;               // SHA-3 domain pad
  last[rate - 1] ^= 0x80;
  for (size_t k = 0; k < rate / 8; ++k) s[k] ^= le64(last + 8 * k);
  keccak_f(s);
  for (int k = 0; k < 4; ++k) put_le64(out32 + 8 * k, s[k]);
}

// ---------------------------------------------------------------------------
// BLAKE3 (256-bit output; official spec, portable single-threaded tree)
// ---------------------------------------------------------------------------

static const u32 B3_IV[8] = {
  0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
  0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19};
static const u8 B3_PERM[16] = {2,6,3,10,7,0,4,13,1,11,12,5,9,14,15,8};
enum { B3_CHUNK_START = 1, B3_CHUNK_END = 2, B3_PARENT = 4, B3_ROOT = 8 };

static inline void b3_g(u32* st, int a, int b, int c, int d, u32 mx, u32 my) {
  st[a] = st[a] + st[b] + mx;
  st[d] = rotr32(st[d] ^ st[a], 16);
  st[c] = st[c] + st[d];
  st[b] = rotr32(st[b] ^ st[c], 12);
  st[a] = st[a] + st[b] + my;
  st[d] = rotr32(st[d] ^ st[a], 8);
  st[c] = st[c] + st[d];
  st[b] = rotr32(st[b] ^ st[c], 7);
}

// compress: returns the 8-word chaining value in out[0..7]
static void b3_compress(const u32 cv[8], const u32 m_in[16], u64 counter,
                        u32 block_len, u32 flags, u32 out[8]) {
  u32 st[16], m[16];
  memcpy(m, m_in, sizeof(m));
  for (int i = 0; i < 8; ++i) st[i] = cv[i];
  st[8] = B3_IV[0]; st[9] = B3_IV[1]; st[10] = B3_IV[2]; st[11] = B3_IV[3];
  st[12] = (u32)counter; st[13] = (u32)(counter >> 32);
  st[14] = block_len; st[15] = flags;
  for (int round = 0; round < 7; ++round) {
    b3_g(st, 0, 4,  8, 12, m[0],  m[1]);
    b3_g(st, 1, 5,  9, 13, m[2],  m[3]);
    b3_g(st, 2, 6, 10, 14, m[4],  m[5]);
    b3_g(st, 3, 7, 11, 15, m[6],  m[7]);
    b3_g(st, 0, 5, 10, 15, m[8],  m[9]);
    b3_g(st, 1, 6, 11, 12, m[10], m[11]);
    b3_g(st, 2, 7,  8, 13, m[12], m[13]);
    b3_g(st, 3, 4,  9, 14, m[14], m[15]);
    if (round < 6) {
      u32 nm[16];
      for (int i = 0; i < 16; ++i) nm[i] = m[B3_PERM[i]];
      memcpy(m, nm, sizeof(m));
    }
  }
  for (int i = 0; i < 8; ++i) out[i] = st[i] ^ st[i + 8];
}

// hash one ≤1024-byte chunk to its chaining value
static void b3_chunk_cv(const u8* p, size_t n, u64 chunk_idx, u32 is_root,
                        u32 cv_out[8]) {
  u32 cv[8];
  memcpy(cv, B3_IV, sizeof(cv));
  size_t nblocks = (n + 63) / 64;
  if (nblocks == 0) nblocks = 1;
  for (size_t b = 0; b < nblocks; ++b) {
    u8 blk[64] = {0};
    size_t off = b * 64;
    size_t len = (off < n) ? ((n - off < 64) ? n - off : 64) : 0;
    memcpy(blk, p + off, len);
    u32 m[16];
    for (int i = 0; i < 16; ++i) m[i] = le32(blk + 4 * i);
    u32 flags = 0;
    if (b == 0) flags |= B3_CHUNK_START;
    if (b == nblocks - 1) flags |= B3_CHUNK_END | is_root;
    b3_compress(cv, m, chunk_idx, (u32)len, flags, cv);
  }
  memcpy(cv_out, cv, 32);
}

static void b3_parent(const u32 l[8], const u32 r[8], u32 flags, u32 out[8]) {
  u32 m[16];
  memcpy(m, l, 32);
  memcpy(m + 8, r, 32);
  b3_compress(B3_IV, m, 0, 64, B3_PARENT | flags, out);
}

#ifdef __AVX2__
// 8 independent full chunks compressed in lockstep: each __m256i holds one
// state word across the 8 chunks (lane-transposed).  The tree hash is
// natively parallel at chunk granularity (SURVEY component 11); this is the
// AVX2 equivalent of the reference's blake3 hash_many asm, written from the
// BLAKE3 spec against the scalar path above (cross-checked in test_hashes).
#include <immintrin.h>

static inline __m256i b3v_rot16(__m256i x) {
  const __m256i t = _mm256_setr_epi8(
      2, 3, 0, 1, 6, 7, 4, 5, 10, 11, 8, 9, 14, 15, 12, 13,
      2, 3, 0, 1, 6, 7, 4, 5, 10, 11, 8, 9, 14, 15, 12, 13);
  return _mm256_shuffle_epi8(x, t);
}
static inline __m256i b3v_rot8(__m256i x) {
  const __m256i t = _mm256_setr_epi8(
      1, 2, 3, 0, 5, 6, 7, 4, 9, 10, 11, 8, 13, 14, 15, 12,
      1, 2, 3, 0, 5, 6, 7, 4, 9, 10, 11, 8, 13, 14, 15, 12);
  return _mm256_shuffle_epi8(x, t);
}
static inline __m256i b3v_rot12(__m256i x) {
  return _mm256_or_si256(_mm256_srli_epi32(x, 12), _mm256_slli_epi32(x, 20));
}
static inline __m256i b3v_rot7(__m256i x) {
  return _mm256_or_si256(_mm256_srli_epi32(x, 7), _mm256_slli_epi32(x, 25));
}

#define B3V_G(a, b, c, d, mx, my)                         \
  do {                                                    \
    va = _mm256_add_epi32(_mm256_add_epi32(va, vb), mx);  \
    vd = b3v_rot16(_mm256_xor_si256(vd, va));             \
    vc = _mm256_add_epi32(vc, vd);                        \
    vb = b3v_rot12(_mm256_xor_si256(vb, vc));             \
    va = _mm256_add_epi32(_mm256_add_epi32(va, vb), my);  \
    vd = b3v_rot8(_mm256_xor_si256(vd, va));              \
    vc = _mm256_add_epi32(vc, vd);                        \
    vb = b3v_rot7(_mm256_xor_si256(vb, vc));              \
  } while (0)

// transpose 8 rows of 8 u32 (row L = 32 bytes at src + L*stride) into
// out[0..7], out[w] = word w across the 8 rows
static inline void b3v_transpose8(const u8* src, size_t stride,
                                  __m256i out[8]) {
  __m256i r0 = _mm256_loadu_si256((const __m256i*)(src + 0 * stride));
  __m256i r1 = _mm256_loadu_si256((const __m256i*)(src + 1 * stride));
  __m256i r2 = _mm256_loadu_si256((const __m256i*)(src + 2 * stride));
  __m256i r3 = _mm256_loadu_si256((const __m256i*)(src + 3 * stride));
  __m256i r4 = _mm256_loadu_si256((const __m256i*)(src + 4 * stride));
  __m256i r5 = _mm256_loadu_si256((const __m256i*)(src + 5 * stride));
  __m256i r6 = _mm256_loadu_si256((const __m256i*)(src + 6 * stride));
  __m256i r7 = _mm256_loadu_si256((const __m256i*)(src + 7 * stride));
  __m256i t0 = _mm256_unpacklo_epi32(r0, r1);
  __m256i t1 = _mm256_unpackhi_epi32(r0, r1);
  __m256i t2 = _mm256_unpacklo_epi32(r2, r3);
  __m256i t3 = _mm256_unpackhi_epi32(r2, r3);
  __m256i t4 = _mm256_unpacklo_epi32(r4, r5);
  __m256i t5 = _mm256_unpackhi_epi32(r4, r5);
  __m256i t6 = _mm256_unpacklo_epi32(r6, r7);
  __m256i t7 = _mm256_unpackhi_epi32(r6, r7);
  __m256i u0 = _mm256_unpacklo_epi64(t0, t2);
  __m256i u1 = _mm256_unpackhi_epi64(t0, t2);
  __m256i u2 = _mm256_unpacklo_epi64(t1, t3);
  __m256i u3 = _mm256_unpackhi_epi64(t1, t3);
  __m256i u4 = _mm256_unpacklo_epi64(t4, t6);
  __m256i u5 = _mm256_unpackhi_epi64(t4, t6);
  __m256i u6 = _mm256_unpacklo_epi64(t5, t7);
  __m256i u7 = _mm256_unpackhi_epi64(t5, t7);
  out[0] = _mm256_permute2x128_si256(u0, u4, 0x20);
  out[1] = _mm256_permute2x128_si256(u1, u5, 0x20);
  out[2] = _mm256_permute2x128_si256(u2, u6, 0x20);
  out[3] = _mm256_permute2x128_si256(u3, u7, 0x20);
  out[4] = _mm256_permute2x128_si256(u0, u4, 0x31);
  out[5] = _mm256_permute2x128_si256(u1, u5, 0x31);
  out[6] = _mm256_permute2x128_si256(u2, u6, 0x31);
  out[7] = _mm256_permute2x128_si256(u3, u7, 0x31);
}

// 8 consecutive FULL 1024-byte chunks -> 8 chaining values
static void b3_chunks8_avx2(const u8* p, u64 first, u32 cvs[8][8]) {
  __m256i cv[8];
  for (int i = 0; i < 8; ++i) cv[i] = _mm256_set1_epi32((int)B3_IV[i]);
  __m256i t0 = _mm256_setr_epi32(
      (int)(u32)(first + 0), (int)(u32)(first + 1), (int)(u32)(first + 2),
      (int)(u32)(first + 3), (int)(u32)(first + 4), (int)(u32)(first + 5),
      (int)(u32)(first + 6), (int)(u32)(first + 7));
  __m256i t1 = _mm256_setr_epi32(
      (int)(u32)((first + 0) >> 32), (int)(u32)((first + 1) >> 32),
      (int)(u32)((first + 2) >> 32), (int)(u32)((first + 3) >> 32),
      (int)(u32)((first + 4) >> 32), (int)(u32)((first + 5) >> 32),
      (int)(u32)((first + 6) >> 32), (int)(u32)((first + 7) >> 32));
  for (int b = 0; b < 16; ++b) {
    __m256i m[16];
    b3v_transpose8(p + b * 64, 1024, m);
    b3v_transpose8(p + b * 64 + 32, 1024, m + 8);
    u32 flags = (b == 0 ? B3_CHUNK_START : 0)
                | (b == 15 ? B3_CHUNK_END : 0);
    __m256i s[16];
    for (int i = 0; i < 8; ++i) s[i] = cv[i];
    s[8] = _mm256_set1_epi32((int)B3_IV[0]);
    s[9] = _mm256_set1_epi32((int)B3_IV[1]);
    s[10] = _mm256_set1_epi32((int)B3_IV[2]);
    s[11] = _mm256_set1_epi32((int)B3_IV[3]);
    s[12] = t0;
    s[13] = t1;
    s[14] = _mm256_set1_epi32(64);
    s[15] = _mm256_set1_epi32((int)flags);
    int sched[16];
    for (int i = 0; i < 16; ++i) sched[i] = i;
    for (int round = 0; round < 7; ++round) {
      {
        __m256i va = s[0], vb = s[4], vc = s[8], vd = s[12];
        B3V_G(0, 4, 8, 12, m[sched[0]], m[sched[1]]);
        s[0] = va; s[4] = vb; s[8] = vc; s[12] = vd;
      }
      {
        __m256i va = s[1], vb = s[5], vc = s[9], vd = s[13];
        B3V_G(1, 5, 9, 13, m[sched[2]], m[sched[3]]);
        s[1] = va; s[5] = vb; s[9] = vc; s[13] = vd;
      }
      {
        __m256i va = s[2], vb = s[6], vc = s[10], vd = s[14];
        B3V_G(2, 6, 10, 14, m[sched[4]], m[sched[5]]);
        s[2] = va; s[6] = vb; s[10] = vc; s[14] = vd;
      }
      {
        __m256i va = s[3], vb = s[7], vc = s[11], vd = s[15];
        B3V_G(3, 7, 11, 15, m[sched[6]], m[sched[7]]);
        s[3] = va; s[7] = vb; s[11] = vc; s[15] = vd;
      }
      {
        __m256i va = s[0], vb = s[5], vc = s[10], vd = s[15];
        B3V_G(0, 5, 10, 15, m[sched[8]], m[sched[9]]);
        s[0] = va; s[5] = vb; s[10] = vc; s[15] = vd;
      }
      {
        __m256i va = s[1], vb = s[6], vc = s[11], vd = s[12];
        B3V_G(1, 6, 11, 12, m[sched[10]], m[sched[11]]);
        s[1] = va; s[6] = vb; s[11] = vc; s[12] = vd;
      }
      {
        __m256i va = s[2], vb = s[7], vc = s[8], vd = s[13];
        B3V_G(2, 7, 8, 13, m[sched[12]], m[sched[13]]);
        s[2] = va; s[7] = vb; s[8] = vc; s[13] = vd;
      }
      {
        __m256i va = s[3], vb = s[4], vc = s[9], vd = s[14];
        B3V_G(3, 4, 9, 14, m[sched[14]], m[sched[15]]);
        s[3] = va; s[4] = vb; s[9] = vc; s[14] = vd;
      }
      if (round < 6) {
        int ns[16];
        for (int i = 0; i < 16; ++i) ns[i] = sched[B3_PERM[i]];
        memcpy(sched, ns, sizeof(sched));
      }
    }
    for (int i = 0; i < 8; ++i)
      cv[i] = _mm256_xor_si256(s[i], s[i + 8]);
  }
  u32 tmp[8][8];
  for (int i = 0; i < 8; ++i)
    _mm256_storeu_si256((__m256i*)tmp[i], cv[i]);
  for (int lane = 0; lane < 8; ++lane)
    for (int w = 0; w < 8; ++w) cvs[lane][w] = tmp[w][lane];
}
#endif  // __AVX2__

extern "C" void tz_blake3(const u8* data, size_t n, u8* out32) {
  u32 cv[8];
  if (n <= 1024) {
    b3_chunk_cv(data, n, 0, B3_ROOT, cv);
  } else {
    // binary tree via a CV stack: non-final chunks merge on chunk-count
    // trailing zeros; the final chunk folds the whole stack, with ROOT on
    // the very last parent (the reference model's finalization order)
    u32 stack[54][8];
    int sp = 0;
    u64 nchunks = (n + 1023) / 1024;

    // push one non-final chunk CV (merge on chunk-count trailing zeros)
    auto push_cv = [&](u32 ccv[8], u64 c) {
      u64 total = c + 1;
      while ((total & 1) == 0) {
        u32 merged[8];
        b3_parent(stack[sp - 1], ccv, 0, merged);
        memcpy(ccv, merged, 32);
        --sp;
        total >>= 1;
      }
      memcpy(stack[sp++], ccv, 32);
    };

    u64 c = 0;
#ifdef __AVX2__
    while (c + 8 < nchunks) {           // 8 full chunks, none of them final
      u32 cvs[8][8];
      b3_chunks8_avx2(data + (size_t)c * 1024, c, cvs);
      for (int k = 0; k < 8; ++k) push_cv(cvs[k], c + k);
      c += 8;
    }
#endif
    for (; c < nchunks; ++c) {
      size_t off = (size_t)c * 1024;
      size_t len = (n - off < 1024) ? n - off : 1024;
      u32 ccv[8];
      b3_chunk_cv(data + off, len, c, 0, ccv);
      if (c + 1 < nchunks) {
        push_cv(ccv, c);
      } else {
        while (sp > 0) {
          u32 flags = (sp == 1) ? B3_ROOT : 0;
          u32 merged[8];
          b3_parent(stack[sp - 1], ccv, flags, merged);
          memcpy(ccv, merged, 32);
          --sp;
        }
        memcpy(cv, ccv, 32);
      }
    }
  }
  for (int i = 0; i < 8; ++i) put_le32(out32 + 4 * i, cv[i]);
}

// ---------------------------------------------------------------------------
// XXH3 64/128 (xxHash v0.8 algorithm; default secret; seed 0 paths use the
// canonical kSecret below — cross-validated against python-xxhash)
// ---------------------------------------------------------------------------

static const u8 XXH3_SECRET[192] = {
  0xb8,0xfe,0x6c,0x39,0x23,0xa4,0x4b,0xbe,0x7c,0x01,0x81,0x2c,0xf7,0x21,0xad,0x1c,
  0xde,0xd4,0x6d,0xe9,0x83,0x90,0x97,0xdb,0x72,0x40,0xa4,0xa4,0xb7,0xb3,0x67,0x1f,
  0xcb,0x79,0xe6,0x4e,0xcc,0xc0,0xe5,0x78,0x82,0x5a,0xd0,0x7d,0xcc,0xff,0x72,0x21,
  0xb8,0x08,0x46,0x74,0xf7,0x43,0x24,0x8e,0xe0,0x35,0x90,0xe6,0x81,0x3a,0x26,0x4c,
  0x3c,0x28,0x52,0xbb,0x91,0xc3,0x00,0xcb,0x88,0xd0,0x65,0x8b,0x1b,0x53,0x2e,0xa3,
  0x71,0x64,0x48,0x97,0xa2,0x0d,0xf9,0x4e,0x38,0x19,0xef,0x46,0xa9,0xde,0xac,0xd8,
  0xa8,0xfa,0x76,0x3f,0xe3,0x9c,0x34,0x3f,0xf9,0xdc,0xbb,0xc7,0xc7,0x0b,0x4f,0x1d,
  0x8a,0x51,0xe0,0x4b,0xcd,0xb4,0x59,0x31,0xc8,0x9f,0x7e,0xc9,0xd9,0x78,0x73,0x64,
  0xea,0xc5,0xac,0x83,0x34,0xd3,0xeb,0xc3,0xc5,0x81,0xa0,0xff,0xfa,0x13,0x63,0xeb,
  0x17,0x0d,0xdd,0x51,0xb7,0xf0,0xda,0x49,0xd3,0x16,0x55,0x26,0x29,0xd4,0x68,0x9e,
  0x2b,0x16,0xbe,0x58,0x7d,0x47,0xa1,0xfc,0x8f,0xf8,0xb8,0xd1,0x7a,0xd0,0x31,0xce,
  0x45,0xcb,0x3a,0x8f,0x95,0x16,0x04,0x28,0xaf,0xd7,0xfb,0xca,0xbb,0x4b,0x40,0x7e};

static const u64 PRIME32_1 = 0x9E3779B1ULL;
static const u64 PRIME32_2 = 0x85EBCA77ULL;
static const u64 PRIME32_3 = 0xC2B2AE3DULL;
static const u64 PRIME64_1 = 0x9E3779B185EBCA87ULL;
static const u64 PRIME64_2 = 0xC2B2AE3D27D4EB4FULL;
static const u64 PRIME64_3 = 0x165667B19E3779F9ULL;
static const u64 PRIME64_4 = 0x85EBCA77C2B2AE63ULL;
static const u64 PRIME64_5 = 0x27D4EB2F165667C5ULL;
static const u64 PRIME_MX1 = 0x165667919E3779F9ULL;
static const u64 PRIME_MX2 = 0x9FB21C651E98DF25ULL;

struct u128 { u64 lo, hi; };

static inline u128 mul64to128(u64 a, u64 b) {
  unsigned __int128 p = (unsigned __int128)a * b;
  return {(u64)p, (u64)(p >> 64)};
}
static inline u64 mul128_fold64(u64 a, u64 b) {
  u128 p = mul64to128(a, b);
  return p.lo ^ p.hi;
}
static inline u64 xxh64_avalanche(u64 h) {
  h ^= h >> 33; h *= PRIME64_2;
  h ^= h >> 29; h *= PRIME64_3;
  h ^= h >> 32;
  return h;
}
static inline u64 xxh3_avalanche(u64 h) {
  h ^= h >> 37; h *= PRIME_MX1; h ^= h >> 32;
  return h;
}
static inline u64 xxh3_rrmxmx(u64 h, u64 len) {
  h ^= rotl64(h, 49) ^ rotl64(h, 24);
  h *= PRIME_MX2;
  h ^= (h >> 35) + len;
  h *= PRIME_MX2;
  return h ^ (h >> 28);
}

static u64 xxh3_mix16(const u8* p, const u8* sec, u64 seed) {
  u64 lo = le64(p)     ^ (le64(sec)     + seed);
  u64 hi = le64(p + 8) ^ (le64(sec + 8) - seed);
  return mul128_fold64(lo, hi);
}

// 0-16 byte paths (seed 0, default secret)
static u64 xxh3_64_0to16(const u8* p, size_t len, u64 seed) {
  const u8* sec = XXH3_SECRET;
  if (len > 8) {
    u64 bitflipl = (le64(sec + 24) ^ le64(sec + 32)) + seed;
    u64 bitfliph = (le64(sec + 40) ^ le64(sec + 48)) - seed;
    u64 input_lo = le64(p) ^ bitflipl;
    u64 input_hi = le64(p + len - 8) ^ bitfliph;
    u64 acc = len + (input_lo >> 56) * 0x100000000ULL  // byteswap term
            ;
    // canonical: acc = len + swap64(input_lo) + input_hi + fold(lo,hi)
    acc = len + __builtin_bswap64(input_lo) + input_hi +
          mul128_fold64(input_lo, input_hi);
    return xxh3_avalanche(acc);
  }
  if (len >= 4) {
    u64 s = seed ^ ((u64)__builtin_bswap32((u32)seed) << 32);
    u64 input1 = le32(p);
    u64 input2 = le32(p + len - 4);
    u64 bitflip = (le64(sec + 8) ^ le64(sec + 16)) - s;
    u64 keyed = (input2 + ((u64)input1 << 32)) ^ bitflip;
    return xxh3_rrmxmx(keyed, len);
  }
  if (len > 0) {
    u8 c1 = p[0], c2 = p[len >> 1], c3 = p[len - 1];
    u32 combined = ((u32)c1 << 16) | ((u32)c2 << 24) |
                   ((u32)c3) | ((u32)len << 8);
    u64 bitflip = ((u64)le32(sec) ^ le32(sec + 4)) + seed;
    return xxh64_avalanche((u64)combined ^ bitflip);
  }
  return xxh64_avalanche(seed ^ le64(sec + 56) ^ le64(sec + 64));
}

static u64 xxh3_64_17to128(const u8* p, size_t len, u64 seed) {
  const u8* sec = XXH3_SECRET;
  u64 acc = len * PRIME64_1;
  if (len > 32) {
    if (len > 64) {
      if (len > 96) {
        acc += xxh3_mix16(p + 48, sec + 96, seed);
        acc += xxh3_mix16(p + len - 64, sec + 112, seed);
      }
      acc += xxh3_mix16(p + 32, sec + 64, seed);
      acc += xxh3_mix16(p + len - 48, sec + 80, seed);
    }
    acc += xxh3_mix16(p + 16, sec + 32, seed);
    acc += xxh3_mix16(p + len - 32, sec + 48, seed);
  }
  acc += xxh3_mix16(p, sec, seed);
  acc += xxh3_mix16(p + len - 16, sec + 16, seed);
  return xxh3_avalanche(acc);
}

static u64 xxh3_64_129to240(const u8* p, size_t len, u64 seed) {
  const u8* sec = XXH3_SECRET;
  u64 acc = len * PRIME64_1;
  int nb = (int)(len / 16);
  for (int i = 0; i < 8; ++i) acc += xxh3_mix16(p + 16 * i, sec + 16 * i, seed);
  acc = xxh3_avalanche(acc);
  for (int i = 8; i < nb; ++i)
    acc += xxh3_mix16(p + 16 * i, sec + 16 * (i - 8) + 3, seed);
  acc += xxh3_mix16(p + len - 16, sec + 136 - 17, seed);
  return xxh3_avalanche(acc);
}

// long-input accumulator core (shared by 64 and 128)
static void xxh3_hash_long(const u8* p, size_t len, u64 acc[8]) {
  static const u64 INIT[8] = {PRIME32_3, PRIME64_1, PRIME64_2, PRIME64_3,
                              PRIME64_4, PRIME32_2, PRIME64_5, PRIME32_1};
  memcpy(acc, INIT, sizeof(INIT));
  const u8* sec = XXH3_SECRET;
  const size_t secret_len = 192;
  const size_t stripes_per_block = (secret_len - 64) / 8;      // 16
  const size_t block_len = 64 * stripes_per_block;             // 1024
  size_t nb_blocks = (len - 1) / block_len;
  for (size_t b = 0; b < nb_blocks; ++b) {
    for (size_t s = 0; s < stripes_per_block; ++s) {
      const u8* in = p + b * block_len + s * 64;
      const u8* ks = sec + s * 8;
      for (int i = 0; i < 8; ++i) {
        u64 data_val = le64(in + 8 * i);
        u64 data_key = data_val ^ le64(ks + 8 * i);
        acc[i ^ 1] += data_val;
        acc[i] += (data_key & 0xffffffff) * (data_key >> 32);
      }
    }
    // scramble
    for (int i = 0; i < 8; ++i) {
      acc[i] ^= acc[i] >> 47;
      acc[i] ^= le64(sec + secret_len - 64 + 8 * i);
      acc[i] *= PRIME32_1;
    }
  }
  // last (partial) block
  size_t nb_stripes = ((len - 1) - block_len * nb_blocks) / 64;
  for (size_t s = 0; s < nb_stripes; ++s) {
    const u8* in = p + nb_blocks * block_len + s * 64;
    const u8* ks = sec + s * 8;
    for (int i = 0; i < 8; ++i) {
      u64 data_val = le64(in + 8 * i);
      u64 data_key = data_val ^ le64(ks + 8 * i);
      acc[i ^ 1] += data_val;
      acc[i] += (data_key & 0xffffffff) * (data_key >> 32);
    }
  }
  // last stripe (the final 64 bytes of input)
  {
    const u8* in = p + len - 64;
    const u8* ks = sec + secret_len - 64 - 7;
    for (int i = 0; i < 8; ++i) {
      u64 data_val = le64(in + 8 * i);
      u64 data_key = data_val ^ le64(ks + 8 * i);
      acc[i ^ 1] += data_val;
      acc[i] += (data_key & 0xffffffff) * (data_key >> 32);
    }
  }
}

static u64 xxh3_mix2accs(const u64* acc, const u8* sec) {
  return mul128_fold64(acc[0] ^ le64(sec), acc[1] ^ le64(sec + 8));
}
static u64 xxh3_merge_accs(const u64 acc[8], const u8* sec, u64 start) {
  u64 r = start;
  for (int i = 0; i < 4; ++i) r += xxh3_mix2accs(acc + 2 * i, sec + 16 * i);
  return xxh3_avalanche(r);
}

extern "C" u64 tz_xxh3_64(const u8* p, size_t len) {
  if (len <= 16)  return xxh3_64_0to16(p, len, 0);
  if (len <= 128) return xxh3_64_17to128(p, len, 0);
  if (len <= 240) return xxh3_64_129to240(p, len, 0);
  u64 acc[8];
  xxh3_hash_long(p, len, acc);
  return xxh3_merge_accs(acc, XXH3_SECRET + 11, len * PRIME64_1);
}

// --- 128-bit variants ---

static u128 xxh3_128_0to16(const u8* p, size_t len, u64 seed) {
  const u8* sec = XXH3_SECRET;
  if (len > 8) {
    u64 bitflipl = (le64(sec + 32) ^ le64(sec + 40)) - seed;
    u64 bitfliph = (le64(sec + 48) ^ le64(sec + 56)) + seed;
    u64 input_lo = le64(p);
    u64 input_hi = le64(p + len - 8);
    u128 m = mul64to128(input_lo ^ input_hi ^ bitflipl, PRIME64_1);
    m.lo += (u64)(len - 1) << 54;
    input_hi ^= bitfliph;
    m.hi += input_hi + (u64)(u32)input_hi * (PRIME32_2 - 1);
    m.lo ^= __builtin_bswap64(m.hi);
    u128 h = mul64to128(m.lo, PRIME64_2);
    h.hi += m.hi * PRIME64_2;
    h.lo = xxh3_avalanche(h.lo);
    h.hi = xxh3_avalanche(h.hi);
    return h;
  }
  if (len >= 4) {
    u64 s = seed ^ ((u64)__builtin_bswap32((u32)seed) << 32);
    u32 input_lo = le32(p);
    u32 input_hi = le32(p + len - 4);
    u64 input_64 = input_lo + ((u64)input_hi << 32);
    u64 bitflip = (le64(sec + 16) ^ le64(sec + 24)) + s;
    u64 keyed = input_64 ^ bitflip;
    u128 m = mul64to128(keyed, PRIME64_1 + (len << 2));
    m.hi += m.lo << 1;
    m.lo ^= m.hi >> 3;
    m.lo ^= m.lo >> 35;
    m.lo *= PRIME_MX2;
    m.lo ^= m.lo >> 28;
    m.hi = xxh3_avalanche(m.hi);
    return m;
  }
  if (len > 0) {
    u8 c1 = p[0], c2 = p[len >> 1], c3 = p[len - 1];
    u32 combinedl = ((u32)c1 << 16) | ((u32)c2 << 24) |
                    ((u32)c3) | ((u32)len << 8);
    u32 combinedh = rotl32(__builtin_bswap32(combinedl), 13);
    u64 bitflipl = ((u64)le32(sec) ^ le32(sec + 4)) + seed;
    u64 bitfliph = ((u64)le32(sec + 8) ^ le32(sec + 12)) - seed;
    u64 keyed_lo = (u64)combinedl ^ bitflipl;
    u64 keyed_hi = (u64)combinedh ^ bitfliph;
    return {xxh64_avalanche(keyed_lo), xxh64_avalanche(keyed_hi)};
  }
  u64 bitflipl = le64(sec + 64) ^ le64(sec + 72);
  u64 bitfliph = le64(sec + 80) ^ le64(sec + 88);
  return {xxh64_avalanche(seed ^ bitflipl), xxh64_avalanche(seed ^ bitfliph)};
}

static u128 xxh3_mix32(u128 acc, const u8* p1, const u8* p2, const u8* sec,
                       u64 seed) {
  acc.lo += xxh3_mix16(p1, sec, seed);
  acc.lo ^= le64(p2) + le64(p2 + 8);
  acc.hi += xxh3_mix16(p2, sec + 16, seed);
  acc.hi ^= le64(p1) + le64(p1 + 8);
  return acc;
}

static u128 xxh3_128_17to128(const u8* p, size_t len, u64 seed) {
  const u8* sec = XXH3_SECRET;
  u128 acc = {len * PRIME64_1, 0};
  if (len > 32) {
    if (len > 64) {
      if (len > 96)
        acc = xxh3_mix32(acc, p + 48, p + len - 64, sec + 96, seed);
      acc = xxh3_mix32(acc, p + 32, p + len - 48, sec + 64, seed);
    }
    acc = xxh3_mix32(acc, p + 16, p + len - 32, sec + 32, seed);
  }
  acc = xxh3_mix32(acc, p, p + len - 16, sec, seed);
  u64 lo = acc.lo + acc.hi;
  u64 hi = acc.lo * PRIME64_1 + acc.hi * PRIME64_4 +
           (len - seed) * PRIME64_2;
  return {xxh3_avalanche(lo), (u64)0 - xxh3_avalanche(hi)};
}

static u128 xxh3_128_129to240(const u8* p, size_t len, u64 seed) {
  const u8* sec = XXH3_SECRET;
  u128 acc = {len * PRIME64_1, 0};
  int nb = (int)(len / 32);
  for (int i = 0; i < 4; ++i)
    acc = xxh3_mix32(acc, p + 32 * i, p + 32 * i + 16, sec + 32 * i, seed);
  acc.lo = xxh3_avalanche(acc.lo);
  acc.hi = xxh3_avalanche(acc.hi);
  for (int i = 4; i < nb; ++i)
    acc = xxh3_mix32(acc, p + 32 * i, p + 32 * i + 16,
                     sec + 3 + 32 * (i - 4), seed);
  // last 32 bytes: mix32 with inputs reversed, secret offset 136-17-16,
  // seed negated (canonical MIDSIZE_LASTOFFSET handling)
  acc = xxh3_mix32(acc, p + len - 16, p + len - 32, sec + 136 - 17 - 16,
                   (u64)0 - seed);
  u64 lo = acc.lo + acc.hi;
  u64 hi = acc.lo * PRIME64_1 + acc.hi * PRIME64_4 +
           (len - seed) * PRIME64_2;
  return {xxh3_avalanche(lo), (u64)0 - xxh3_avalanche(hi)};
}

extern "C" void tz_xxh3_128(const u8* p, size_t len, u8* out16) {
  u128 h;
  if (len <= 16)       h = xxh3_128_0to16(p, len, 0);
  else if (len <= 128) h = xxh3_128_17to128(p, len, 0);
  else if (len <= 240) h = xxh3_128_129to240(p, len, 0);
  else {
    u64 acc[8];
    xxh3_hash_long(p, len, acc);
    h.lo = xxh3_merge_accs(acc, XXH3_SECRET + 11, len * PRIME64_1);
    h.hi = xxh3_merge_accs(acc, XXH3_SECRET + 192 - 64 - 11,
                           ~(len * PRIME64_2));
  }
  // canonical big-endian representation: hi first
  put_be64(out16, h.hi);
  put_be64(out16 + 8, h.lo);
}

// ---------------------------------------------------------------------------
// wyhash (final version 4; public-domain algorithm by Wang Yi)
// ---------------------------------------------------------------------------

static const u64 WYP[4] = {0x2d358dccaa6c78a5ULL, 0x8bb84b93962eacc9ULL,
                           0x4b33a62ed433d4a3ULL, 0x4d5a2da51de1aa47ULL};

static inline u64 wymix(u64 a, u64 b) {
  u128 p = mul64to128(a, b);
  return p.lo ^ p.hi;
}
static inline u64 wyr8(const u8* p) { return le64(p); }
static inline u64 wyr4(const u8* p) { return le32(p); }
static inline u64 wyr3(const u8* p, size_t k) {
  return ((u64)p[0] << 16) | ((u64)p[k >> 1] << 8) | p[k - 1];
}

extern "C" u64 tz_wyhash(const u8* p, size_t len, u64 seed) {
  seed ^= wymix(seed ^ WYP[0], WYP[1]);
  u64 a, b;
  if (len <= 16) {
    if (len >= 4) {
      a = (wyr4(p) << 32) | wyr4(p + ((len >> 3) << 2));
      b = (wyr4(p + len - 4) << 32) | wyr4(p + len - 4 - ((len >> 3) << 2));
    } else if (len > 0) {
      a = wyr3(p, len);
      b = 0;
    } else {
      a = b = 0;
    }
  } else {
    size_t i = len;
    if (i > 48) {
      u64 s1 = seed, s2 = seed;
      do {
        seed = wymix(wyr8(p) ^ WYP[1], wyr8(p + 8) ^ seed);
        s1 = wymix(wyr8(p + 16) ^ WYP[2], wyr8(p + 24) ^ s1);
        s2 = wymix(wyr8(p + 32) ^ WYP[3], wyr8(p + 40) ^ s2);
        p += 48; i -= 48;
      } while (i > 48);
      seed ^= s1 ^ s2;
    }
    while (i > 16) { seed = wymix(wyr8(p) ^ WYP[1], wyr8(p + 8) ^ seed);
                     i -= 16; p += 16; }
    a = wyr8(p + i - 16);
    b = wyr8(p + i - 8);
  }
  a ^= WYP[1]; b ^= seed;
  u128 m = mul64to128(a, b);
  a = m.lo; b = m.hi;
  return wymix(a ^ WYP[0] ^ len, b ^ WYP[1]);
}

// ---------------------------------------------------------------------------
// WHIRLPOOL (ISO/IEC 10118-3 final version; 512-bit, 10 rounds)
// S-box built from the spec's E / E^-1 / R mini-boxes; circulant MDS row
// (1,1,4,1,8,5,2,9) over GF(2^8) mod x^8+x^4+x^3+x^2+1 (0x11D).
// ---------------------------------------------------------------------------

static u64 WP_T[8][256];
static u8  WP_S[256];
static bool wp_ready = false;

static inline u8 gf_mul(u8 a, u8 b) {
  u32 r = 0, aa = a;
  for (int i = 0; i < 8; ++i) {
    if (b & (1 << i)) r ^= aa << i;
  }
  // reduce mod 0x11D
  for (int i = 15; i >= 8; --i)
    if (r & (1u << i)) r ^= 0x11Du << (i - 8);
  return (u8)r;
}

static void wp_init() {
  if (wp_ready) return;
  static const u8 E[16]  = {0x1,0xB,0x9,0xC,0xD,0x6,0xF,0x3,
                            0xE,0x8,0x7,0x4,0xA,0x2,0x5,0x0};
  static const u8 R[16]  = {0x7,0xC,0xB,0xD,0xE,0x4,0x9,0xF,
                            0x6,0x3,0x8,0xA,0x2,0x5,0x1,0x0};
  u8 Einv[16];
  for (int i = 0; i < 16; ++i) Einv[E[i]] = (u8)i;
  for (int x = 0; x < 256; ++x) {
    u8 hi = E[x >> 4], lo = Einv[x & 15];
    u8 r = R[hi ^ lo];
    WP_S[x] = (u8)((E[hi ^ r] << 4) | Einv[lo ^ r]);
  }
  static const u8 C[8] = {1, 1, 4, 1, 8, 5, 2, 9};
  for (int t = 0; t < 8; ++t)
    for (int x = 0; x < 256; ++x) {
      u64 v = 0;
      for (int c = 0; c < 8; ++c)
        v |= (u64)gf_mul(WP_S[x], C[(c - t + 8) & 7]) << (56 - 8 * c);
      WP_T[t][x] = v;
    }
  wp_ready = true;
}

static void wp_block(u64 H[8], const u8* p) {
  wp_init();
  u64 K[8], st[8], L[8];
  u64 block[8];
  for (int i = 0; i < 8; ++i) {
    u64 v = 0;
    for (int j = 0; j < 8; ++j) v = (v << 8) | p[8 * i + j];
    block[i] = v;
    K[i] = H[i];
    st[i] = block[i] ^ K[i];
  }
  for (int r = 1; r <= 10; ++r) {
    // key schedule round
    for (int i = 0; i < 8; ++i) {
      u64 v = 0;
      for (int t = 0; t < 8; ++t)
        v ^= WP_T[t][(u8)(K[(i - t + 8) & 7] >> (56 - 8 * t))];
      L[i] = v;
    }
    // round constant: bytes S[8(r-1)] .. S[8(r-1)+7] into row 0
    u64 rc = 0;
    for (int j = 0; j < 8; ++j)
      rc = (rc << 8) | WP_S[8 * (r - 1) + j];
    L[0] ^= rc;
    memcpy(K, L, sizeof(K));
    // state round
    for (int i = 0; i < 8; ++i) {
      u64 v = 0;
      for (int t = 0; t < 8; ++t)
        v ^= WP_T[t][(u8)(st[(i - t + 8) & 7] >> (56 - 8 * t))];
      L[i] = v ^ K[i];
    }
    memcpy(st, L, sizeof(st));
  }
  for (int i = 0; i < 8; ++i) H[i] ^= st[i] ^ block[i];  // Miyaguchi-Preneel
}

extern "C" void tz_whirlpool(const u8* data, size_t n, u8* out64) {
  u64 H[8] = {0};
  size_t i = 0;
  for (; i + 64 <= n; i += 64) wp_block(H, data + i);
  u8 tail[128];
  size_t r = n - i;
  memcpy(tail, data + i, r);
  tail[r++] = 0x80;
  size_t pad = (r <= 32) ? 64 : 128;
  memset(tail + r, 0, pad - r);
  // length in bits as a 256-bit big-endian integer (top bytes stay zero)
  put_be64(tail + pad - 8, (u64)n * 8);
  wp_block(H, tail);
  if (pad == 128) wp_block(H, tail + 64);
  for (int k = 0; k < 8; ++k) put_be64(out64 + 8 * k, H[k]);
}

// ---------------------------------------------------------------------------
// HighwayHash 64/128/256 (Google; portable lane formulation)
// ---------------------------------------------------------------------------

struct HH {
  u64 v0[4], v1[4], mul0[4], mul1[4];
};

static void hh_reset(HH& s, const u64 key[4]) {
  static const u64 init0[4] = {0xdbe6d5d5fe4cce2fULL, 0xa4093822299f31d0ULL,
                               0x13198a2e03707344ULL, 0x243f6a8885a308d3ULL};
  static const u64 init1[4] = {0x3bd39e10cb0ef593ULL, 0xc0acf169b5f18a8cULL,
                               0xbe5466cf34e90c6cULL, 0x452821e638d01377ULL};
  for (int i = 0; i < 4; ++i) {
    s.mul0[i] = init0[i];
    s.mul1[i] = init1[i];
    s.v0[i] = init0[i] ^ key[i];
    s.v1[i] = init1[i] ^ ((key[i] >> 32) | (key[i] << 32));
  }
}

static inline void hh_zipper(const u64 v[4], u64 out[4]) {
  // ZipperMergeAndAdd byte shuffle of each 128-bit half
  auto zip = [](u64 v1, u64 v0, u64& a, u64& b) {
    a = (((v0 & 0xff000000ULL) | (v1 & 0xff00000000ULL)) >> 24) |
        (((v0 & 0xff0000000000ULL) | (v1 & 0xff000000000000ULL)) >> 16) |
        (v0 & 0xff0000ULL) | ((v0 & 0xff00ULL) << 32) |
        ((v1 & 0xff00000000000000ULL) >> 8) | (v0 << 56);
    b = (((v1 & 0xff000000ULL) | (v0 & 0xff00000000ULL)) >> 24) |
        (v1 & 0xff0000ULL) | ((v1 & 0xff0000000000ULL) >> 16) |
        ((v1 & 0xff00ULL) << 24) | ((v0 & 0xff000000000000ULL) >> 8) |
        ((v1 & 0xffULL) << 48) | (v0 & 0xff00000000000000ULL);
  };
  zip(v[1], v[0], out[0], out[1]);
  zip(v[3], v[2], out[2], out[3]);
}

static void hh_update(HH& s, const u64 lanes[4]) {
  for (int i = 0; i < 4; ++i) {
    s.v1[i] += s.mul0[i] + lanes[i];
    s.mul0[i] ^= (s.v1[i] & 0xffffffffULL) * (s.v0[i] >> 32);
    s.v0[i] += s.mul1[i];
    s.mul1[i] ^= (s.v0[i] & 0xffffffffULL) * (s.v1[i] >> 32);
  }
  u64 z[4];
  hh_zipper(s.v1, z);
  for (int i = 0; i < 4; ++i) s.v0[i] += z[i];
  hh_zipper(s.v0, z);
  for (int i = 0; i < 4; ++i) s.v1[i] += z[i];
}

static void hh_update_packet(HH& s, const u8* p) {
  u64 lanes[4] = {le64(p), le64(p + 8), le64(p + 16), le64(p + 24)};
  hh_update(s, lanes);
}

static inline u64 hh_rot32by(u64 count, u64 lanes) {
  u32 half0 = (u32)lanes, half1 = (u32)(lanes >> 32);
  return ((u64)((half0 << count) | (half0 >> (32 - count)))) |
         ((u64)((half1 << count) | (half1 >> (32 - count))) << 32);
}

static void hh_update_remainder(HH& s, const u8* p, size_t size_mod32) {
  u64 size_mod4 = size_mod32 & 3;
  const u8* remainder = p + (size_mod32 & ~3ULL);
  for (int i = 0; i < 4; ++i) s.v0[i] += ((u64)size_mod32 << 32) + size_mod32;
  for (int i = 0; i < 4; ++i) {
    u64 r = (size_mod32 == 0) ? 0 : hh_rot32by(size_mod32 & 31, s.v1[i]);
    s.v1[i] = r;
  }
  u8 packet[32] = {0};
  memcpy(packet, p, size_mod32 & ~3ULL);
  if (size_mod32 & 16) {
    for (u64 i = 0; i < 4; ++i)
      packet[28 + i] = remainder[i + size_mod4 - 4];
  } else if (size_mod4) {
    packet[16] = remainder[0];
    packet[17] = remainder[size_mod4 >> 1];
    packet[18] = remainder[size_mod4 - 1];
  }
  hh_update_packet(s, packet);
}

static void hh_permute_and_update(HH& s) {
  u64 lanes[4] = {
    (s.v0[2] >> 32) | (s.v0[2] << 32),
    (s.v0[3] >> 32) | (s.v0[3] << 32),
    (s.v0[0] >> 32) | (s.v0[0] << 32),
    (s.v0[1] >> 32) | (s.v0[1] << 32)};
  hh_update(s, lanes);
}

static void hh_process(HH& s, const u8* data, size_t n) {
  size_t i = 0;
  for (; i + 32 <= n; i += 32) hh_update_packet(s, data + i);
  if (n & 31) hh_update_remainder(s, data + i, n & 31);
}

extern "C" u64 tz_highway64(const u8* data, size_t n, const u64 key[4]) {
  HH s;
  hh_reset(s, key);
  hh_process(s, data, n);
  for (int i = 0; i < 4; ++i) hh_permute_and_update(s);
  return s.v0[0] + s.v1[0] + s.mul0[0] + s.mul1[0];
}

static inline void hh_modular_reduction(u64 a3_unmasked, u64 a2, u64 a1,
                                        u64 a0, u64& m1, u64& m0) {
  u64 a3 = a3_unmasked & 0x3FFFFFFFFFFFFFFFULL;
  m1 = a1 ^ ((a3 << 1) | (a2 >> 63)) ^ ((a3 << 2) | (a2 >> 62));
  m0 = a0 ^ (a2 << 1) ^ (a2 << 2);
}

extern "C" void tz_highway128(const u8* data, size_t n, const u64 key[4],
                              u8* out16) {
  HH s;
  hh_reset(s, key);
  hh_process(s, data, n);
  for (int i = 0; i < 6; ++i) hh_permute_and_update(s);
  put_le64(out16,     s.v0[0] + s.mul0[0] + s.v1[2] + s.mul1[2]);
  put_le64(out16 + 8, s.v0[1] + s.mul0[1] + s.v1[3] + s.mul1[3]);
}

extern "C" void tz_highway256(const u8* data, size_t n, const u64 key[4],
                              u8* out32) {
  HH s;
  hh_reset(s, key);
  hh_process(s, data, n);
  for (int i = 0; i < 10; ++i) hh_permute_and_update(s);
  u64 m0, m1;
  hh_modular_reduction(s.v1[1] + s.mul1[1], s.v1[0] + s.mul1[0],
                       s.v0[1] + s.mul0[1], s.v0[0] + s.mul0[0], m1, m0);
  put_le64(out32, m0); put_le64(out32 + 8, m1);
  hh_modular_reduction(s.v1[3] + s.mul1[3], s.v1[2] + s.mul1[2],
                       s.v0[3] + s.mul0[3], s.v0[2] + s.mul0[2], m1, m0);
  put_le64(out32 + 16, m0); put_le64(out32 + 24, m1);
}

// ---------------------------------------------------------------------------
// SHA-256 one-shot (FIPS 180-4) — native counterpart for batch hashing and
// key stretching; cross-checked against hashlib.
// ---------------------------------------------------------------------------

static const u32 SHA256_K[64] = {
  0x428a2f98,0x71374491,0xb5c0fbcf,0xe9b5dba5,0x3956c25b,0x59f111f1,
  0x923f82a4,0xab1c5ed5,0xd807aa98,0x12835b01,0x243185be,0x550c7dc3,
  0x72be5d74,0x80deb1fe,0x9bdc06a7,0xc19bf174,0xe49b69c1,0xefbe4786,
  0x0fc19dc6,0x240ca1cc,0x2de92c6f,0x4a7484aa,0x5cb0a9dc,0x76f988da,
  0x983e5152,0xa831c66d,0xb00327c8,0xbf597fc7,0xc6e00bf3,0xd5a79147,
  0x06ca6351,0x14292967,0x27b70a85,0x2e1b2138,0x4d2c6dfc,0x53380d13,
  0x650a7354,0x766a0abb,0x81c2c92e,0x92722c85,0xa2bfe8a1,0xa81a664b,
  0xc24b8b70,0xc76c51a3,0xd192e819,0xd6990624,0xf40e3585,0x106aa070,
  0x19a4c116,0x1e376c08,0x2748774c,0x34b0bcb5,0x391c0cb3,0x4ed8aa4a,
  0x5b9cca4f,0x682e6ff3,0x748f82ee,0x78a5636f,0x84c87814,0x8cc70208,
  0x90befffa,0xa4506ceb,0xbef9a3f7,0xc67178f2};

#include <immintrin.h>

// x86 SHA-NI block function (runtime-dispatched; same hardware path the
// reference offers via -DHWSHA2). Canonical two-lane state layout:
// STATE0 = {C,D,G,H}, STATE1 = {A,B,E,F} after the loading shuffles.
__attribute__((target("sha,sse4.1,ssse3")))
static void sha256_blocks_ni(u32 h[8], const u8* p, size_t nblocks) {
  const __m128i MASK = _mm_set_epi64x(0x0c0d0e0f08090a0bULL,
                                      0x0405060700010203ULL);
  static const u32 K[64] = {
    0x428a2f98,0x71374491,0xb5c0fbcf,0xe9b5dba5,0x3956c25b,0x59f111f1,
    0x923f82a4,0xab1c5ed5,0xd807aa98,0x12835b01,0x243185be,0x550c7dc3,
    0x72be5d74,0x80deb1fe,0x9bdc06a7,0xc19bf174,0xe49b69c1,0xefbe4786,
    0x0fc19dc6,0x240ca1cc,0x2de92c6f,0x4a7484aa,0x5cb0a9dc,0x76f988da,
    0x983e5152,0xa831c66d,0xb00327c8,0xbf597fc7,0xc6e00bf3,0xd5a79147,
    0x06ca6351,0x14292967,0x27b70a85,0x2e1b2138,0x4d2c6dfc,0x53380d13,
    0x650a7354,0x766a0abb,0x81c2c92e,0x92722c85,0xa2bfe8a1,0xa81a664b,
    0xc24b8b70,0xc76c51a3,0xd192e819,0xd6990624,0xf40e3585,0x106aa070,
    0x19a4c116,0x1e376c08,0x2748774c,0x34b0bcb5,0x391c0cb3,0x4ed8aa4a,
    0x5b9cca4f,0x682e6ff3,0x748f82ee,0x78a5636f,0x84c87814,0x8cc70208,
    0x90befffa,0xa4506ceb,0xbef9a3f7,0xc67178f2};
  __m128i TMP = _mm_loadu_si128((const __m128i*)&h[0]);    // A B C D
  __m128i S1  = _mm_loadu_si128((const __m128i*)&h[4]);    // E F G H
  TMP = _mm_shuffle_epi32(TMP, 0xB1);                       // B A D C
  S1  = _mm_shuffle_epi32(S1, 0x1B);                        // H G F E
  __m128i S0 = _mm_alignr_epi8(TMP, S1, 8);                 // C D G H
  S1 = _mm_blend_epi16(S1, TMP, 0xF0);                      // A B E F
  while (nblocks--) {
    const __m128i SV0 = S0, SV1 = S1;
    __m128i MSG[4];
    for (int j = 0; j < 4; ++j)
      MSG[j] = _mm_shuffle_epi8(
          _mm_loadu_si128((const __m128i*)(p + 16 * j)), MASK);
    for (int i = 0; i < 16; ++i) {
      __m128i m = _mm_add_epi32(MSG[i & 3],
                                _mm_loadu_si128((const __m128i*)&K[4 * i]));
      S1 = _mm_sha256rnds2_epu32(S1, S0, m);
      if (i >= 3 && i <= 14) {
        __m128i t = _mm_alignr_epi8(MSG[i & 3], MSG[(i + 3) & 3], 4);
        MSG[(i + 1) & 3] = _mm_add_epi32(MSG[(i + 1) & 3], t);
        MSG[(i + 1) & 3] = _mm_sha256msg2_epu32(MSG[(i + 1) & 3],
                                                MSG[i & 3]);
      }
      m = _mm_shuffle_epi32(m, 0x0E);
      S0 = _mm_sha256rnds2_epu32(S0, S1, m);
      if (i >= 1 && i <= 12)
        MSG[(i + 3) & 3] = _mm_sha256msg1_epu32(MSG[(i + 3) & 3],
                                                MSG[i & 3]);
    }
    S0 = _mm_add_epi32(S0, SV0);
    S1 = _mm_add_epi32(S1, SV1);
    p += 64;
  }
  TMP = _mm_shuffle_epi32(S0, 0x1B);                        // H G D C -> ...
  S1 = _mm_shuffle_epi32(S1, 0xB1);
  S0 = _mm_blend_epi16(TMP, S1, 0xF0);
  S1 = _mm_alignr_epi8(S1, TMP, 8);
  _mm_storeu_si128((__m128i*)&h[0], S0);
  _mm_storeu_si128((__m128i*)&h[4], S1);
}

static const bool g_sha256_ni = __builtin_cpu_supports("sha");

static void sha256_block(u32 h[8], const u8* p) {
  u32 w[64];
  for (int i = 0; i < 16; ++i)
    w[i] = ((u32)p[4*i] << 24) | ((u32)p[4*i+1] << 16) |
           ((u32)p[4*i+2] << 8) | p[4*i+3];
  for (int i = 16; i < 64; ++i) {
    u32 s0 = rotr32(w[i-15], 7) ^ rotr32(w[i-15], 18) ^ (w[i-15] >> 3);
    u32 s1 = rotr32(w[i-2], 17) ^ rotr32(w[i-2], 19) ^ (w[i-2] >> 10);
    w[i] = w[i-16] + s0 + w[i-7] + s1;
  }
  u32 a=h[0],b=h[1],c=h[2],d=h[3],e=h[4],f=h[5],g=h[6],hh=h[7];
  for (int i = 0; i < 64; ++i) {
    u32 S1 = rotr32(e,6) ^ rotr32(e,11) ^ rotr32(e,25);
    u32 ch = (e & f) ^ (~e & g);
    u32 t1 = hh + S1 + ch + SHA256_K[i] + w[i];
    u32 S0 = rotr32(a,2) ^ rotr32(a,13) ^ rotr32(a,22);
    u32 maj = (a & b) ^ (a & c) ^ (b & c);
    u32 t2 = S0 + maj;
    hh=g; g=f; f=e; e=d+t1; d=c; c=b; b=a; a=t1+t2;
  }
  h[0]+=a; h[1]+=b; h[2]+=c; h[3]+=d; h[4]+=e; h[5]+=f; h[6]+=g; h[7]+=hh;
}

extern "C" void tz_sha256(const u8* data, size_t n, u8* out32) {
  u32 h[8] = {0x6a09e667,0xbb67ae85,0x3c6ef372,0xa54ff53a,
              0x510e527f,0x9b05688c,0x1f83d9ab,0x5be0cd19};
  size_t i = 0;
  if (n >= 64 && g_sha256_ni) {
    size_t nb = n / 64;
    sha256_blocks_ni(h, data, nb);
    i = nb * 64;
  }
  for (; i + 64 <= n; i += 64) sha256_block(h, data + i);
  u8 tail[128];
  size_t r = n - i;
  memcpy(tail, data + i, r);
  tail[r++] = 0x80;
  size_t pad = (r <= 56) ? 64 : 128;
  memset(tail + r, 0, pad - r);
  put_be64(tail + pad - 8, (u64)n * 8);
  sha256_block(h, tail);
  if (pad == 128) sha256_block(h, tail + 64);
  for (int k = 0; k < 8; ++k) {
    out32[4*k] = (u8)(h[k] >> 24); out32[4*k+1] = (u8)(h[k] >> 16);
    out32[4*k+2] = (u8)(h[k] >> 8); out32[4*k+3] = (u8)h[k];
  }
}

// ---------------------------------------------------------------------------
// Nilsimsa: 256-bit locality-sensitive trigram hash (reference lists it in
// its hasher zoo, man/zpaqfranz.pod:195-202; the implementation lived in the
// missing zpaqfranz.cpp). Clean-room per the public algorithm: accumulate
// tran3-mixed trigram counts over a 5-byte sliding window, emit one bit per
// bucket (count above the expected mean). The substitution table below is
// the canonical public "TRAN53" constant shared by every interoperable
// nilsimsa implementation (original nilsimsa-0.2.x, Digest::Nilsimsa,
// py-nilsimsa) — it is algorithm data, so digests match upstream tools.
// ---------------------------------------------------------------------------
static const u8 nil_tran[256] = {
  0x02, 0xD6, 0x9E, 0x6F, 0xF9, 0x1D, 0x04, 0xAB, 0xD0, 0x22, 0x16, 0x1F,
  0xD8, 0x73, 0xA1, 0xAC, 0x3B, 0x70, 0x62, 0x96, 0x1E, 0x6E, 0x8F, 0x39,
  0x9D, 0x05, 0x14, 0x4A, 0xA6, 0xBE, 0xAE, 0x0E, 0xCF, 0xB9, 0x9C, 0x9A,
  0xC7, 0x68, 0x13, 0xE1, 0x2D, 0xA4, 0xEB, 0x51, 0x8D, 0x64, 0x6B, 0x50,
  0x23, 0x80, 0x03, 0x41, 0xEC, 0xBB, 0x71, 0xCC, 0x7A, 0x86, 0x7F, 0x98,
  0xF2, 0x36, 0x5E, 0xEE, 0x8E, 0xCE, 0x4F, 0xB8, 0x32, 0xB6, 0x5F, 0x59,
  0xDC, 0x1B, 0x31, 0x4C, 0x7B, 0xF0, 0x63, 0x01, 0x6C, 0xBA, 0x07, 0xE8,
  0x12, 0x77, 0x49, 0x3C, 0xDA, 0x46, 0xFE, 0x2F, 0x79, 0x1C, 0x9B, 0x30,
  0xE3, 0x00, 0x06, 0x7E, 0x2E, 0x0F, 0x38, 0x33, 0x21, 0xAD, 0xA5, 0x54,
  0xCA, 0xA7, 0x29, 0xFC, 0x5A, 0x47, 0x69, 0x7D, 0xC5, 0x95, 0xB5, 0xF4,
  0x0B, 0x90, 0xA3, 0x81, 0x6D, 0x25, 0x55, 0x35, 0xF5, 0x75, 0x74, 0x0A,
  0x26, 0xBF, 0x19, 0x5C, 0x1A, 0xC6, 0xFF, 0x99, 0x5D, 0x84, 0xAA, 0x66,
  0x3E, 0xAF, 0x78, 0xB3, 0x20, 0x43, 0xC1, 0xED, 0x24, 0xEA, 0xE6, 0x3F,
  0x18, 0xF3, 0xA0, 0x42, 0x57, 0x08, 0x53, 0x60, 0xC3, 0xC0, 0x83, 0x40,
  0x82, 0xD7, 0x09, 0xBD, 0x44, 0x2A, 0x67, 0xA8, 0x93, 0xE0, 0xC2, 0x56,
  0x9F, 0xD9, 0xDD, 0x85, 0x15, 0xB4, 0x8A, 0x27, 0x28, 0x92, 0x76, 0xDE,
  0xEF, 0xF8, 0xB2, 0xB7, 0xC9, 0x3D, 0x45, 0x94, 0x4B, 0x11, 0x0D, 0x65,
  0xD5, 0x34, 0x8B, 0x91, 0x0C, 0xFA, 0x87, 0xE9, 0x7C, 0x5B, 0xB1, 0x4D,
  0xE5, 0xD4, 0xCB, 0x10, 0xA2, 0x17, 0x89, 0xBC, 0xDB, 0xB0, 0xE2, 0x97,
  0x88, 0x52, 0xF7, 0x48, 0xD3, 0x61, 0x2C, 0x3A, 0x2B, 0xD1, 0x8C, 0xFB,
  0xF1, 0xCD, 0xE4, 0x6A, 0xE7, 0xA9, 0xFD, 0xC4, 0x37, 0xC8, 0xD2, 0xF6,
  0xDF, 0x58, 0x72, 0x4E,
};

static inline u8 nil_tran3(u8 a, u8 b, u8 c, int n) {
  return (u8)(((nil_tran[(a + n) & 255] ^ (u8)(nil_tran[b] * (n + n + 1)))
               + nil_tran[(u8)(c ^ nil_tran[n])]) & 255);
}

extern "C" void tz_nilsimsa(const u8* data, size_t n, u8* out32) {
  u32 acc[256] = {0};
  int w0 = -1, w1 = -1, w2 = -1, w3 = -1;   // previous 4 bytes
  u64 count = 0;
  for (size_t i = 0; i < n; ++i) {
    u8 ch = data[i];
    ++count;
    if (w1 >= 0) ++acc[nil_tran3(ch, (u8)w0, (u8)w1, 0)];
    if (w2 >= 0) {
      ++acc[nil_tran3(ch, (u8)w0, (u8)w2, 1)];
      ++acc[nil_tran3(ch, (u8)w1, (u8)w2, 2)];
    }
    if (w3 >= 0) {
      ++acc[nil_tran3(ch, (u8)w0, (u8)w3, 3)];
      ++acc[nil_tran3(ch, (u8)w1, (u8)w3, 4)];
      ++acc[nil_tran3(ch, (u8)w2, (u8)w3, 5)];
      ++acc[nil_tran3((u8)w3, (u8)w0, ch, 6)];
      ++acc[nil_tran3((u8)w3, (u8)w2, ch, 7)];
    }
    w3 = w2; w2 = w1; w1 = w0; w0 = ch;
  }
  u64 total = 0;
  if (count == 3) total = 1;
  else if (count == 4) total = 4;
  else if (count > 4) total = 8 * count - 28;
  u64 threshold = total / 256;
  memset(out32, 0, 32);
  for (int i = 0; i < 256; ++i)
    if (acc[i] > threshold) out32[31 - (i >> 3)] |= (u8)(1 << (i & 7));
}
