// tzpaq: native host engine implementation.
//
// Clean-room ZPAQ Level-2 codec (spec: http://mattmahoney.net/zpaq/, public
// domain). Behavior mirrors the validated Python oracle in
// zpaqfranz_tpu/{zpaql/vm.py, models/predictor.py, codec/container.py,
// codec/writer.py}; reference line cites point at /root/reference/ZSFX/
// libzpaq.cpp for the semantics each piece must honor.

#include "tzpaq.h"

#include <algorithm>
#include <utility>
#include <mutex>
#include <cassert>
#include <cstdlib>
#include <fcntl.h>
#include <unistd.h>
#ifdef __linux__
#include <sys/mman.h>
#endif

namespace tzpaq {

Tables g_tab;

// Tables are installed from Python (models/tables.py) rather than rebuilt
// here so there is exactly one source of truth for the format constants.
extern "C" void tz_install_tables(const u8* sns, const u32* cminit,
                                  const u16* squasht, const int16_t* stretcht,
                                  const i32* dt, const i32* dt2k) {
  memcpy(g_tab.sns, sns, 1024);
  memcpy(g_tab.cminit, cminit, 256 * 4);
  memcpy(g_tab.squasht, squasht, 4096 * 2);
  memcpy(g_tab.stretcht, stretcht, 32768 * 2);
  memcpy(g_tab.dt, dt, 1024 * 4);
  memcpy(g_tab.dt2k, dt2k, 256 * 4);
  g_tab.ready = true;
}

// ---- SHA-1 (FIPS 180-1, clean-room; fragment checksums) -------------------
// Two block functions: portable scalar and an x86 SHA-NI path dispatched at
// runtime (the reference ships the analogous -DHWSHA2 hardware option,
// man/zpaqfranz.pod:148-156). Fragment hashing is the add pipeline's
// hottest host stage, so the ~8x NI speedup is end-to-end visible.
#include <immintrin.h>

void SHA1::init() {
  len = 0;
  h[0] = 0x67452301; h[1] = 0xEFCDAB89; h[2] = 0x98BADCFE;
  h[3] = 0x10325476; h[4] = 0xC3D2E1F0;
}

static inline u32 rol(u32 x, int k) { return (x << k) | (x >> (32 - k)); }

__attribute__((target("sha,sse4.1,ssse3")))
static void sha1_blocks_ni(u32 h[5], const u8* p, size_t nblocks) {
  const __m128i MASK = _mm_set_epi64x(0x0001020304050607ULL,
                                      0x08090a0b0c0d0e0fULL);
  __m128i ABCD = _mm_loadu_si128((const __m128i*)h);
  ABCD = _mm_shuffle_epi32(ABCD, 0x1B);
  __m128i E0 = _mm_set_epi32((int)h[4], 0, 0, 0);
  while (nblocks--) {
    const __m128i ABCD_SAVE = ABCD;
    const __m128i E0_SAVE = E0;
    __m128i MSG[4];
    for (int j = 0; j < 4; ++j)
      MSG[j] = _mm_shuffle_epi8(
          _mm_loadu_si128((const __m128i*)(p + 16 * j)), MASK);
    __m128i E = _mm_setzero_si128();
#pragma GCC unroll 20
    for (int i = 0; i < 20; ++i) {
      __m128i cur = MSG[i & 3];
      __m128i e_in = (i == 0) ? _mm_add_epi32(E0, cur)
                              : _mm_sha1nexte_epu32(E, cur);
      __m128i prev = ABCD;
      switch (i / 5) {            // immediate must be a constant
        case 0: ABCD = _mm_sha1rnds4_epu32(ABCD, e_in, 0); break;
        case 1: ABCD = _mm_sha1rnds4_epu32(ABCD, e_in, 1); break;
        case 2: ABCD = _mm_sha1rnds4_epu32(ABCD, e_in, 2); break;
        default: ABCD = _mm_sha1rnds4_epu32(ABCD, e_in, 3); break;
      }
      E = prev;
      if (i < 16) {
        __m128i t = _mm_sha1msg1_epu32(MSG[i & 3], MSG[(i + 1) & 3]);
        t = _mm_xor_si128(t, MSG[(i + 2) & 3]);
        MSG[i & 3] = _mm_sha1msg2_epu32(t, MSG[(i + 3) & 3]);
      }
    }
    E0 = _mm_sha1nexte_epu32(E, E0_SAVE);
    ABCD = _mm_add_epi32(ABCD, ABCD_SAVE);
    p += 64;
  }
  ABCD = _mm_shuffle_epi32(ABCD, 0x1B);
  _mm_storeu_si128((__m128i*)h, ABCD);
  h[4] = (u32)_mm_extract_epi32(E0, 3);
}

// Two independent streams interleaved in one loop: sha1rnds4 is latency-
// bound (the 80-round chain is strictly serial), so a second stream's
// rounds fill the pipeline bubbles for ~1.6-1.9x combined throughput.
// Used by the fragment digester, where consecutive CDC fragments are
// independent hash jobs.
__attribute__((target("sha,sse4.1,ssse3")))
static void sha1_blocks_ni_x2(u32 ha[5], const u8* pa,
                              u32 hb[5], const u8* pb, size_t nblocks) {
  const __m128i MASK = _mm_set_epi64x(0x0001020304050607ULL,
                                      0x08090a0b0c0d0e0fULL);
  __m128i A_ABCD = _mm_shuffle_epi32(_mm_loadu_si128((const __m128i*)ha),
                                     0x1B);
  __m128i B_ABCD = _mm_shuffle_epi32(_mm_loadu_si128((const __m128i*)hb),
                                     0x1B);
  __m128i A_E0 = _mm_set_epi32((int)ha[4], 0, 0, 0);
  __m128i B_E0 = _mm_set_epi32((int)hb[4], 0, 0, 0);
  while (nblocks--) {
    const __m128i A_SAVE = A_ABCD, B_SAVE = B_ABCD;
    const __m128i A_E0S = A_E0, B_E0S = B_E0;
    __m128i AM[4], BM[4];
    for (int j = 0; j < 4; ++j) {
      AM[j] = _mm_shuffle_epi8(
          _mm_loadu_si128((const __m128i*)(pa + 16 * j)), MASK);
      BM[j] = _mm_shuffle_epi8(
          _mm_loadu_si128((const __m128i*)(pb + 16 * j)), MASK);
    }
    __m128i AE = _mm_setzero_si128(), BE = _mm_setzero_si128();
#pragma GCC unroll 20
    for (int i = 0; i < 20; ++i) {
      __m128i a_cur = AM[i & 3], b_cur = BM[i & 3];
      __m128i a_in = (i == 0) ? _mm_add_epi32(A_E0, a_cur)
                              : _mm_sha1nexte_epu32(AE, a_cur);
      __m128i b_in = (i == 0) ? _mm_add_epi32(B_E0, b_cur)
                              : _mm_sha1nexte_epu32(BE, b_cur);
      __m128i a_prev = A_ABCD, b_prev = B_ABCD;
      switch (i / 5) {
        case 0:
          A_ABCD = _mm_sha1rnds4_epu32(A_ABCD, a_in, 0);
          B_ABCD = _mm_sha1rnds4_epu32(B_ABCD, b_in, 0);
          break;
        case 1:
          A_ABCD = _mm_sha1rnds4_epu32(A_ABCD, a_in, 1);
          B_ABCD = _mm_sha1rnds4_epu32(B_ABCD, b_in, 1);
          break;
        case 2:
          A_ABCD = _mm_sha1rnds4_epu32(A_ABCD, a_in, 2);
          B_ABCD = _mm_sha1rnds4_epu32(B_ABCD, b_in, 2);
          break;
        default:
          A_ABCD = _mm_sha1rnds4_epu32(A_ABCD, a_in, 3);
          B_ABCD = _mm_sha1rnds4_epu32(B_ABCD, b_in, 3);
          break;
      }
      AE = a_prev;
      BE = b_prev;
      if (i < 16) {
        __m128i t = _mm_sha1msg1_epu32(AM[i & 3], AM[(i + 1) & 3]);
        t = _mm_xor_si128(t, AM[(i + 2) & 3]);
        AM[i & 3] = _mm_sha1msg2_epu32(t, AM[(i + 3) & 3]);
        __m128i u = _mm_sha1msg1_epu32(BM[i & 3], BM[(i + 1) & 3]);
        u = _mm_xor_si128(u, BM[(i + 2) & 3]);
        BM[i & 3] = _mm_sha1msg2_epu32(u, BM[(i + 3) & 3]);
      }
    }
    A_E0 = _mm_sha1nexte_epu32(AE, A_E0S);
    B_E0 = _mm_sha1nexte_epu32(BE, B_E0S);
    A_ABCD = _mm_add_epi32(A_ABCD, A_SAVE);
    B_ABCD = _mm_add_epi32(B_ABCD, B_SAVE);
    pa += 64;
    pb += 64;
  }
  _mm_storeu_si128((__m128i*)ha, _mm_shuffle_epi32(A_ABCD, 0x1B));
  _mm_storeu_si128((__m128i*)hb, _mm_shuffle_epi32(B_ABCD, 0x1B));
  ha[4] = (u32)_mm_extract_epi32(A_E0, 3);
  hb[4] = (u32)_mm_extract_epi32(B_E0, 3);
}

static const bool g_has_shani = __builtin_cpu_supports("sha");

// Hash two whole independent buffers, interleaving their block loops on
// SHA-NI machines; tails and padding go through the scalar path.
static void sha1_pair(const u8* p1, size_t n1, u8* out1,
                      const u8* p2, size_t n2, u8* out2) {
  SHA1 s1, s2;
  if (g_has_shani) {
    size_t b = (n1 / 64 < n2 / 64) ? n1 / 64 : n2 / 64;
    if (b) {
      sha1_blocks_ni_x2(s1.h, p1, s2.h, p2, b);
      s1.len = s2.len = b * 64;
    }
    s1.update(p1 + b * 64, n1 - b * 64);
    s2.update(p2 + b * 64, n2 - b * 64);
  } else {
    s1.update(p1, n1);
    s2.update(p2, n2);
  }
  s1.final(out1);
  s2.final(out2);
}

void SHA1::block(const u8* p) {
  u32 w[80];
  for (int i = 0; i < 16; ++i)
    w[i] = (u32(p[i * 4]) << 24) | (u32(p[i * 4 + 1]) << 16)
         | (u32(p[i * 4 + 2]) << 8) | p[i * 4 + 3];
  for (int i = 16; i < 80; ++i)
    w[i] = rol(w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16], 1);
  u32 a = h[0], b = h[1], c = h[2], d = h[3], e = h[4];
  for (int i = 0; i < 80; ++i) {
    u32 f, k;
    if (i < 20)      f = (b & c) | (~b & d),        k = 0x5A827999;
    else if (i < 40) f = b ^ c ^ d,                 k = 0x6ED9EBA1;
    else if (i < 60) f = (b & c) | (b & d) | (c & d), k = 0x8F1BBCDC;
    else             f = b ^ c ^ d,                 k = 0xCA62C1D6;
    u32 t = rol(a, 5) + f + e + k + w[i];
    e = d; d = c; c = rol(b, 30); b = a; a = t;
  }
  h[0] += a; h[1] += b; h[2] += c; h[3] += d; h[4] += e;
}

void SHA1::update(const u8* p, size_t n) {
  size_t fill = len % 64;
  len += n;
  if (fill) {
    size_t take = 64 - fill < n ? 64 - fill : n;
    memcpy(buf + fill, p, take);
    p += take; n -= take; fill += take;
    if (fill == 64) block(buf);
    else return;
  }
  if (n >= 64 && g_has_shani) {
    size_t nb = n / 64;
    sha1_blocks_ni(h, p, nb);
    p += nb * 64; n -= nb * 64;
  }
  while (n >= 64) { block(p); p += 64; n -= 64; }
  if (n) memcpy(buf, p, n);
}

void SHA1::final(u8* out20) {
  u64 bits = len * 8;
  u8 pad = 0x80;
  update(&pad, 1);
  u8 z = 0;
  while (len % 64 != 56) update(&z, 1);
  u8 lb[8];
  for (int i = 0; i < 8; ++i) lb[i] = u8(bits >> (56 - 8 * i));
  update(lb, 8);
  for (int i = 0; i < 5; ++i) {
    out20[i * 4] = u8(h[i] >> 24); out20[i * 4 + 1] = u8(h[i] >> 16);
    out20[i * 4 + 2] = u8(h[i] >> 8); out20[i * 4 + 3] = u8(h[i]);
  }
  init();
}

// ---- ZPAQL VM (reference semantics: libzpaq.cpp:1033-1254) ----------------
// Known standard-level HCOMP programs (registered from Python with the
// exact generated bytecode): matched by byte equality, executed by a
// hand-specialized native context update — the host analog of the device
// side's trace-time bytecode specializer (ops/hcomp_fast.py). ~15-35% of
// CM decode time is the per-byte interpreted HCOMP walk.
namespace {
struct KnownHcomp {
  std::vector<u8> code;
  int kind;
};
std::vector<KnownHcomp> g_known_hcomps;
}  // namespace

void register_hcomp(const u8* code, size_t len, int kind) {
  KnownHcomp k;
  k.code.assign(code, code + len);
  k.kind = kind;
  g_known_hcomps.push_back(k);
}

void VM::init(const u8* prog, size_t proglen, int hbits, int mbits) {
  code.assign(prog, prog + proglen);
  h.assign(size_t(1) << hbits, 0);
  m.assign(size_t(1) << mbits, 0);
  r.assign(256, 0);
  hmask = u32((size_t(1) << hbits) - 1);
  mmask = u32((size_t(1) << mbits) - 1);
  a = b = c = d = 0; f = 0;
  fast_hcomp = 0;
  // the native bodies use raw H indices up to 21 (the interpreter masks
  // with hmask): only engage when H is big enough that masking is the
  // identity for those indices — an exotic header could pair the same
  // bytecode with a tiny hh, where the interpreter's aliasing semantics
  // must win
  if (h.size() > 21)
    for (const KnownHcomp& k : g_known_hcomps)
      if (k.code == code) { fast_hcomp = k.kind; break; }
}

// Exact native transcriptions of the three generated level HCOMPs (see
// codec/methods.py; disassembly in the round-5 build log). Every
// register/H/M side effect matches the interpreter bit-for-bit — the
// bytecode-equality guard guarantees these bodies correspond.
void VM::run_fast(u32 input) {
  u32* H = h.data();
  u8* M = m.data();
  const u32 hm = hmask, mm = mmask;
  a = input;
  // shared preamble: c--; *c=a; a+=255; d=a; *d=c
  c = c - 1;
  M[c & mm] = u8(a);
  u32 byte = a & 255;
  a += 255;
  d = a;
  H[d & hm] = c;
  if (fast_hcomp == 3) {
    // d=0 *d=0; d=0 b=c a=*d d++ hash *d=a
    H[0] = 0;
    b = c;
    d = 1;
    a = (0 + M[b & mm] + 512) * 773;
    H[1] = a;
    return;
  }
  if (fast_hcomp == 4) {
    H[0] = 0;                                   // d=0 *d=0
    b = c;                                      // d=0 b=c a=*d(0)
    a = (0 + M[b & mm] + 512) * 773; H[1] = a;  // d++ hash ; b++ *d=a
    a = (a + M[(c + 1) & mm] + 512) * 773; H[2] = a;
    a = (a + M[(c + 2) & mm] + 512) * 773; H[3] = a;
    a = (a + M[(c + 3) & mm] + 512) * 773; H[4] = a;
    a = (a + M[(c + 4) & mm] + 512) * 773;      // d=5: hash, b++, hash
    a = (a + M[(c + 5) & mm] + 512) * 773; H[5] = a;
    H[6] = H[6] * 24 + M[c & mm] + 1;           // MATCH rolling context
    f = ((((byte & 223) - 65) & 255) < 26);     // letter-class test
    if (f) H[7] = H[7] * 20 + M[c & mm] + 1;    // word context extend
    else H[7] = 0;
    // branch join: d=7 b=c a=*d d++ hash *d=a  (a is overwritten by hash)
    b = c;
    a = (H[7] + M[c & mm] + 512) * 773;
    H[8] = a;
    d = 10;
    H[10] = 0;
    a = u32(byte) << 8;                          // a=0 a<<=8 a+=*b a<<=8
    H[10] = a;
    return;
  }
  // fast_hcomp == 5
  {
    u32 t = ((byte & 223) - 65) & 255;          // letter-class test first
    f = (t < 26);
    if (f) H[0] = H[0] * 20 + M[c & mm] + 1;
    else H[0] = 0;
    b = c;
    a = (H[0] + M[c & mm] + 512) * 773; H[1] = a;   // word ISSE head
    H[2] = 0;
    H[3] = 0;
    a = (0 + M[c & mm] + 512) * 773; H[4] = a;      // order-1..8 chain
    a = (a + M[(c + 1) & mm] + 512) * 773; H[5] = a;
    a = (a + M[(c + 2) & mm] + 512) * 773; H[6] = a;
    a = (a + M[(c + 3) & mm] + 512) * 773; H[7] = a;
    a = (a + M[(c + 4) & mm] + 512) * 773; H[8] = a;
    a = (a + M[(c + 5) & mm] + 512) * 773; H[9] = a;
    a = (a + M[(c + 6) & mm] + 512) * 773;
    a = (a + M[(c + 7) & mm] + 512) * 773; H[10] = a;
    H[11] = H[11] * 24 + M[c & mm] + 1;             // MATCH rolling
    u32 x = (0 + (c & 1) + 512) * 773;              // periodic contexts
    x = (x + M[(c + 1) & mm] + 512) * 773;
    H[12] = x;
    a = (x + M[c & mm] + 512) * 773; H[13] = a;
    x = (0 + (c % 3) + 512) * 773;
    x = (x + M[(c + 2) & mm] + 512) * 773;
    H[14] = x;
    a = (x + M[c & mm] + 512) * 773; H[15] = a;
    x = (0 + (c & 3) + 512) * 773;
    x = (x + M[(c + 3) & mm] + 512) * 773;
    H[16] = x;
    a = (x + M[c & mm] + 512) * 773; H[17] = a;
    H[19] = u32(byte) << 8;                          // MIX selects
    a = ((u32(byte) << 8) + M[(c + 1) & mm]);
    a = (a >> 5) << 8;
    H[21] = a;
    b = c + 1;
    d = 21;
    return;
  }
}

void VM::run(u32 input) {
  if (fast_hcomp) { run_fast(input); return; }
  a = input;
  size_t pc = 0;
  const size_t n = code.size();
  for (;;) {
    if (pc >= n) throw format_error("ZPAQL pc out of range");
    int op = code[pc++];
    switch (op) {
      case 56: return;                                   // HALT
      case 0: throw format_error("ZPAQL ERROR instruction");
      case 255: {                                        // LJ
        pc = code[pc] + 256 * code[pc + 1];
        if (pc >= n) throw format_error("LJ out of range");
        continue;
      }
      case 39: pc += f ? ((code[pc] + 128) & 255) - 127 : 1; continue;  // JT
      case 47: pc += f ? 1 : ((code[pc] + 128) & 255) - 127; continue;  // JF
      case 63: pc += ((code[pc] + 128) & 255) - 127; continue;          // JMP
      case 55: r[code[pc]] = a; ++pc; continue;          // R=A n
      case 57: if (out) out->put(a & 255); continue;     // OUT
      case 59: a = (a + m[b & mmask] + 512) * 773; continue;       // HASH
      case 60: h[d & hmask] = (h[d & hmask] + a + 512) * 773; continue;  // HASHD
      default: break;
    }
    auto get = [&](int s, u32 imm) -> u32 {
      switch (s) {
        case 0: return a; case 1: return b; case 2: return c; case 3: return d;
        case 4: return m[b & mmask]; case 5: return m[c & mmask];
        case 6: return h[d & hmask]; default: return imm;
      }
    };
    auto set = [&](int dd, u32 v) {
      switch (dd) {
        case 0: a = v; break; case 1: b = v; break;
        case 2: c = v; break; case 3: d = v; break;
        case 4: m[b & mmask] = u8(v); break;
        case 5: m[c & mmask] = u8(v); break;
        case 6: h[d & hmask] = v; break;
      }
    };
    if (op < 64) {                       // unary group 00dddxxx
      int ddd = op >> 3, xxx = op & 7;
      switch (xxx) {
        case 0: {                        // swap with A
          u32 v = get(ddd, 0);
          if (ddd == 4 || ddd == 5) {
            set(ddd, a);
            a = (a & ~0xFFu) | (v & 0xFF);
          } else {
            set(ddd, a);
            a = v;
          }
          break;
        }
        case 1: set(ddd, get(ddd, 0) + 1); break;
        case 2: set(ddd, get(ddd, 0) - 1); break;
        case 3: set(ddd, ~get(ddd, 0)); break;
        case 4: set(ddd, 0); break;
        case 7: set(ddd, r[code[pc]]); ++pc; break;
        default: throw format_error("bad ZPAQL opcode");
      }
    } else if (op < 128) {               // assignment 01dddsss
      int ddd = (op >> 3) & 7, sss = op & 7;
      u32 imm = 0;
      if (sss == 7) imm = code[pc++];
      if (ddd == 7) throw format_error("bad ZPAQL opcode");
      set(ddd, get(sss, imm));
    } else {                             // binary 1xxxxsss into A
      int xxxx = (op >> 3) & 15, sss = op & 7;
      u32 imm = 0;
      if (sss == 7) imm = code[pc++];
      u32 v = get(sss, imm);
      switch (xxxx) {
        case 0: a += v; break;   case 1: a -= v; break;
        case 2: a *= v; break;
        case 3: a = v ? a / v : 0; break;
        case 4: a = v ? a % v : 0; break;
        case 5: a &= v; break;   case 6: a &= ~v; break;
        case 7: a |= v; break;   case 8: a ^= v; break;
        case 9: a <<= (v & 31); break;
        case 10: a >>= (v & 31); break;
        case 11: f = (a == v); break;
        case 12: f = (a < v); break;
        case 13: f = (a > v); break;
        default: throw format_error("bad ZPAQL opcode");
      }
    }
  }
}

// ---- header parse (libzpaq.cpp:879-921 layout) ----------------------------
static const int COMPSIZE[10] = {0, 2, 3, 2, 3, 4, 6, 6, 3, 5};

size_t Header::parse(const u8* data, size_t lenav) {
  if (lenav < 7) throw format_error("truncated header");
  size_t p = 0;
  size_t hsize = data[0] + 256 * data[1];
  p = 2;
  size_t end = p + hsize;
  if (end > lenav) throw format_error("truncated header body");
  hh = data[p]; hm = data[p + 1]; ph = data[p + 2]; pm = data[p + 3];
  int nc = data[p + 4];
  p += 5;
  comps.clear();
  for (int i = 0; i < nc; ++i) {
    int t = data[p];
    if (t < 1 || t > 9) throw format_error("invalid component type");
    comps.emplace_back(data + p, data + p + COMPSIZE[t]);
    p += COMPSIZE[t];
  }
  if (data[p] != 0) throw format_error("missing COMP end");
  ++p;
  hcomp.assign(data + p, data + end - 1);
  if (data[end - 1] != 0) throw format_error("missing HCOMP end");
  return end;
}

// ---- Predictor (libzpaq.cpp:1715-2080) ------------------------------------
enum { NONE, CONS, CM, ICM, MATCH, AVG, MIX2, MIX, ISSE, SSE };

static void select_chain(Predictor& pr);   // defined after the chain templates

void Predictor::init(const Header& hd) {
  if (!g_tab.ready) throw format_error("tables not installed");
  hdr = hd;
  z.init(hd.hcomp.data(), hd.hcomp.size(), hd.hh, hd.hm);
  c8 = 1; hmap4 = 1;
  memset(p, 0, sizeof(p));
  memset(h, 0, sizeof(h));
  for (int i = 0; i < hd.n(); ++i) {
    Comp& cr = comp[i];
    cr = Comp();
    const std::vector<u8>& cp = hd.comps[i];
    switch (cp[0]) {
      case CONS: p[i] = (cp[1] - 128) * 4; break;
      case CM:
        if (cp[1] > 32) throw format_error("max size for CM is 32");
        cr.cm.assign(size_t(1) << cp[1], 0x80000000u);
        cr.limit = cp[2] * 4;
        break;
      case ICM:
        if (cp[1] > 26) throw format_error("max size for ICM is 26");
        cr.limit = 1023;
        cr.cm.assign(g_tab.cminit, g_tab.cminit + 256);
        cr.ht.assign(size_t(64) << cp[1], 0);
        break;
      case MATCH:
        cr.cm.assign(size_t(1) << cp[1], 0);
        cr.ht.assign(size_t(1) << cp[2], 0);
        cr.ht[0] = 1;
        break;
      case AVG:
        if (cp[1] >= i || cp[2] >= i) throw format_error("AVG input >= i");
        break;
      case MIX2:
        if (cp[2] >= i || cp[3] >= i) throw format_error("MIX2 input >= i");
        cr.c = size_t(1) << cp[1];
        cr.a16.assign(size_t(1) << cp[1], 32768);
        break;
      case MIX: {
        int mm = cp[3];
        if (cp[2] >= i || mm < 1 || mm > i - cp[2])
          throw format_error("bad MIX inputs");
        cr.c = size_t(1) << cp[1];
        cr.cm.assign(size_t(mm) << cp[1], 65536 / mm);
        break;
      }
      case ISSE:
        if (cp[2] >= i) throw format_error("ISSE input >= i");
        cr.ht.assign(size_t(64) << cp[1], 0);
        cr.cm.resize(512);
        for (int j = 0; j < 256; ++j) {
          cr.cm[j * 2] = 1 << 15;
          cr.cm[j * 2 + 1] =
              u32(clamp512k(stretch(int(g_tab.cminit[j] >> 8)) * 1024));
        }
        break;
      case SSE:
        if (cp[2] >= i) throw format_error("SSE input >= i");
        if (cp[3] > cp[4] * 4) throw format_error("SSE start > limit*4");
        cr.cm.resize(size_t(32) << cp[1]);
        cr.limit = cp[4] * 4;
        for (size_t j = 0; j < cr.cm.size(); ++j)
          cr.cm[j] = (u32(squash(int(j & 31) * 64 - 992)) << 17) | cp[3];
        break;
      default: throw format_error("unknown component type");
    }
    cr.type = cp[0];
    cr.p1 = cp.size() > 1 ? cp[1] : 0;
    cr.p2 = cp.size() > 2 ? cp[2] : 0;
    cr.p3 = cp.size() > 3 ? cp[3] : 0;
    cr.p4 = cp.size() > 4 ? cp[4] : 0;
    cr.p5 = cp.size() > 5 ? cp[5] : 0;
    cr.cmmask = cr.cm.empty() ? 0 : u32(cr.cm.size() - 1);
    cr.htmask = cr.ht.empty() ? 0 : u32(cr.ht.size() - 1);
  }
  // select a specialized chain when the type sequence matches a standard
  // level (declared below; C++ name lookup for the function-pointer
  // assignment only needs the declaration)
  pred_fn = nullptr;
  upd_fn = nullptr;
  dec_byte_fn = nullptr;
  enc_byte_fn = nullptr;
  select_chain(*this);
}

size_t Predictor::find(std::vector<u8>& ht, int sizebits, u32 cxt) {
  // 16-byte rows, 3-way probe, LRU-ish replace (libzpaq.cpp:2060-2080)
  int chk = (cxt >> sizebits) & 255;
  size_t h0 = (cxt * 16) & (ht.size() - 16);
  if (ht[h0] == chk) return h0;
  size_t h1 = h0 ^ 16;
  if (ht[h1] == chk) return h1;
  size_t h2 = h0 ^ 32;
  if (ht[h2] == chk) return h2;
  size_t hx;
  if (ht[h0 + 1] <= ht[h1 + 1] && ht[h0 + 1] <= ht[h2 + 1]) hx = h0;
  else if (ht[h1 + 1] < ht[h2 + 1]) hx = h1;
  else hx = h2;
  memset(&ht[hx], 0, 16);
  ht[hx] = u8(chk);
  return hx;
}

int Predictor::predict_generic() {
  int n = hdr.n();
  for (int i = 0; i < n; ++i) {
    Comp& cr = comp[i];
    switch (cr.type) {
      case CONS: break;
      case CM:
        cr.cxt = (h[i] ^ u32(hmap4)) & cr.cmmask;
        p[i] = stretch(int(cr.cm[cr.cxt] >> 17));
        break;
      case ICM:
        if (c8 == 1 || (c8 & 0xf0) == 16)
          cr.c = find(cr.ht, cr.p1 + 2, h[i] + 16 * u32(c8));
        cr.cxt = cr.ht[cr.c + (hmap4 & 15)];
        p[i] = stretch(int(cr.cm[cr.cxt]) >> 8);
        break;
      case MATCH:
        if (cr.a == 0) p[i] = 0;
        else {
          cr.c = (cr.ht[(cr.limit - cr.b) & cr.htmask] >>
                  (7 - cr.cxt)) & 1;
          p[i] = stretch((g_tab.dt2k[cr.a] * (int(cr.c) * -2 + 1)) & 32767);
        }
        break;
      case AVG:
        p[i] = (p[cr.p1] * cr.p3 + p[cr.p2] * (256 - cr.p3)) >> 8;
        break;
      case MIX2: {
        cr.cxt = (h[i] + (c8 & cr.p5)) & (cr.c - 1);
        int w = cr.a16[cr.cxt];
        p[i] = (w * p[cr.p2] + (65536 - w) * p[cr.p3]) >> 16;
        break;
      }
      case MIX: {
        int mm = cr.p3;
        cr.cxt = ((h[i] + (c8 & cr.p5)) & (cr.c - 1)) * mm;
        const i32* wt = (const i32*)&cr.cm[cr.cxt];
        int sum = 0;
        for (int j = 0; j < mm; ++j) sum += (wt[j] >> 8) * p[cr.p2 + j];
        p[i] = clamp2k(sum >> 8);
        break;
      }
      case ISSE: {
        if (c8 == 1 || (c8 & 0xf0) == 16)
          cr.c = find(cr.ht, cr.p1 + 2, h[i] + 16 * u32(c8));
        cr.cxt = cr.ht[cr.c + (hmap4 & 15)];
        const i32* wt = (const i32*)&cr.cm[cr.cxt * 2];
        p[i] = clamp2k((wt[0] * p[cr.p2] + wt[1] * 64) >> 16);
        break;
      }
      case SSE: {
        cr.cxt = (h[i] + u32(c8)) * 32;
        int pq = p[cr.p2] + 992;
        if (pq < 0) pq = 0;
        if (pq > 1983) pq = 1983;
        int wt = pq & 63;
        pq >>= 6;
        cr.cxt += u32(pq);
        p[i] = stretch(((int(cr.cm[cr.cxt & cr.cmmask] >> 10) * (64 - wt) +
                         int(cr.cm[(cr.cxt + 1) & cr.cmmask] >> 10) * wt)
                        >> 13));
        cr.cxt += u32(wt >> 5);
        break;
      }
      default: throw format_error("component not implemented");
    }
  }
  return squash(p[n - 1]);
}

void Predictor::train(Comp& cr, int y) {
  u32& slot = cr.cm[cr.cxt & cr.cmmask];
  u32 pn = slot;
  u32 count = pn & 0x3ff;
  int error = y * 32767 - int(pn >> 17);
  pn += u32(error * g_tab.dt[count]) & u32(-1024);
  pn += count < cr.limit;
  slot = pn;
}

void Predictor::update_generic(int y) {
  int n = hdr.n();
  for (int i = 0; i < n; ++i) {
    Comp& cr = comp[i];
    switch (cr.type) {
      case CM: train(cr, y); break;
      case ICM: {
        size_t idx = cr.c + (hmap4 & 15);
        cr.ht[idx] = g_tab.sns[cr.ht[idx] * 4 + y];
        u32& pn = cr.cm[cr.cxt];
        pn += u32((y * 32767 - int(pn >> 8)) >> 2);
        break;
      }
      case MATCH: {
        size_t mask = cr.htmask;
        if (int(cr.c) != y) cr.a = 0;
        cr.ht[cr.limit & mask] = u8(cr.ht[cr.limit & mask] * 2 + y);
        if (++cr.cxt == 8) {
          cr.cxt = 0;
          cr.limit = (cr.limit + 1) & mask;
          if (cr.a == 0) {
            cr.b = (cr.limit - cr.cm[h[i] & cr.cmmask]);
            if (cr.b & mask)
              while (cr.a < 255 &&
                     cr.ht[(cr.limit - cr.a - 1) & mask] ==
                         cr.ht[(cr.limit - cr.a - cr.b - 1) & mask])
                ++cr.a;
          } else if (cr.a < 255) ++cr.a;
          cr.cm[h[i] & cr.cmmask] = u32(cr.limit);
        }
        break;
      }
      case MIX2: {
        int err = ((y * 32767 - squash(p[i])) * cr.p4) >> 5;
        int w = cr.a16[cr.cxt] + ((err * (p[cr.p2] - p[cr.p3]) + (1 << 12))
                                  >> 13);
        if (w < 0) w = 0;
        if (w > 65535) w = 65535;
        cr.a16[cr.cxt] = u16(w);
        break;
      }
      case MIX: {
        int mm = cr.p3;
        int err = ((y * 32767 - squash(p[i])) * cr.p4) >> 4;
        i32* wt = (i32*)&cr.cm[cr.cxt];
        for (int j = 0; j < mm; ++j)
          wt[j] = clamp512k(wt[j] + ((err * p[cr.p2 + j] + (1 << 12)) >> 13));
        break;
      }
      case ISSE: {
        int err = y * 32767 - squash(p[i]);
        i32* wt = (i32*)&cr.cm[cr.cxt * 2];
        wt[0] = clamp512k(wt[0] + ((err * p[cr.p2] + (1 << 12)) >> 13));
        wt[1] = clamp512k(wt[1] + ((err + 16) >> 5));
        cr.ht[cr.c + (hmap4 & 15)] = g_tab.sns[cr.cxt * 4 + y];
        break;
      }
      case SSE: train(cr, y); break;
      default: break;
    }
  }
  update_tail(y);
}

void Predictor::update_tail(int y) {
  int n = hdr.n();
  c8 += c8 + y;
  if (c8 >= 256) {
    z.run(u32(c8 - 256));
    hmap4 = 1;
    c8 = 1;
    for (int i = 0; i < n; ++i) h[i] = z.h[i & z.hmask];
  } else if (c8 >= 16 && c8 < 32) {
    hmap4 = (hmap4 & 0xf) << 5 | (y << 4) | 1;
  } else {
    hmap4 = (hmap4 & 0x1f0) | (((hmap4 & 0xf) * 2 + y) & 0xf);
  }
}

// ---- specialized component chains -----------------------------------------
// Portable analog of the reference's predictor JIT (assemble_p,
// libzpaq.cpp:3489-4263): the three standard level chains (-m3/-m4/-m5 at
// any block size — the type sequence is block-size-invariant) are
// instantiated as templates so the compiler unrolls the component walk and
// inlines every case body; per-bit there is no switch, no loop counter
// test, and cross-component scheduling is visible to the optimizer.
// Exotic configs (ZPAQL .cfg methods) keep the generic loop.

namespace {

// Per-bit hot state passed by value/registers through the chain: stores to
// component tables (cr.cm/cr.ht live inside pr.comp[]) would otherwise
// force the compiler to reload pr.c8/pr.hmap4/pr.p[] after every update
// (potential aliasing through Predictor&) — the exact reloads the
// reference's JIT avoids by pinning them in registers.
struct BitCtx {
  int c8, hmap4;
  const u32* h;
  int* p;            // local per-bit prediction array (register-allocated)
};

template <int T>
inline void predict_one(Predictor& pr, Comp& cr, int i, BitCtx& cx);

template <>
inline void predict_one<CONS>(Predictor&, Comp&, int, BitCtx&) {}

template <>
inline void predict_one<CM>(Predictor& pr, Comp& cr, int i, BitCtx& cx) {
  cr.cxt = (cx.h[i] ^ u32(cx.hmap4)) & cr.cmmask;
  cx.p[i] = stretch(int(cr.cm[cr.cxt] >> 17));
}

template <>
inline void predict_one<ICM>(Predictor& pr, Comp& cr, int i, BitCtx& cx) {
  if (cx.c8 == 1 || (cx.c8 & 0xf0) == 16)
    cr.c = pr.find(cr.ht, cr.p1 + 2, cx.h[i] + 16 * u32(cx.c8));
  cr.cxt = cr.ht[cr.c + (cx.hmap4 & 15)];
  cx.p[i] = stretch(int(cr.cm[cr.cxt]) >> 8);
}

template <>
inline void predict_one<MATCH>(Predictor& pr, Comp& cr, int i, BitCtx& cx) {
  if (cr.a == 0) cx.p[i] = 0;
  else {
    cr.c = (cr.ht[(cr.limit - cr.b) & cr.htmask] >> (7 - cr.cxt)) & 1;
    cx.p[i] = stretch((g_tab.dt2k[cr.a] * (int(cr.c) * -2 + 1)) & 32767);
  }
}

template <>
inline void predict_one<AVG>(Predictor& pr, Comp& cr, int i, BitCtx& cx) {
  cx.p[i] = (cx.p[cr.p1] * cr.p3 + cx.p[cr.p2] * (256 - cr.p3)) >> 8;
}

template <>
inline void predict_one<MIX2>(Predictor& pr, Comp& cr, int i, BitCtx& cx) {
  cr.cxt = (cx.h[i] + (cx.c8 & cr.p5)) & (cr.c - 1);
  int w = cr.a16[cr.cxt];
  cx.p[i] = (w * cx.p[cr.p2] + (65536 - w) * cx.p[cr.p3]) >> 16;
}

// MIX is encoded in chain type lists as MIX | (m << 8): the input count m
// becomes a compile-time constant so the per-bit dot product fully unrolls
// (and vectorizes) instead of looping on a runtime count
template <int T>
inline void predict_one_mix(Predictor& pr, Comp& cr, int i, BitCtx& cx) {
  constexpr int mm = T >> 8;
  cr.cxt = ((cx.h[i] + (cx.c8 & cr.p5)) & (cr.c - 1)) * mm;
  const i32* wt = (const i32*)&cr.cm[cr.cxt];
  int sum = 0;
  for (int j = 0; j < mm; ++j) sum += (wt[j] >> 8) * cx.p[cr.p2 + j];
  cx.p[i] = clamp2k(sum >> 8);
}

template <>
inline void predict_one<ISSE>(Predictor& pr, Comp& cr, int i, BitCtx& cx) {
  if (cx.c8 == 1 || (cx.c8 & 0xf0) == 16)
    cr.c = pr.find(cr.ht, cr.p1 + 2, cx.h[i] + 16 * u32(cx.c8));
  cr.cxt = cr.ht[cr.c + (cx.hmap4 & 15)];
  const i32* wt = (const i32*)&cr.cm[cr.cxt * 2];
  cx.p[i] = clamp2k((wt[0] * cx.p[cr.p2] + wt[1] * 64) >> 16);
}

template <>
inline void predict_one<SSE>(Predictor& pr, Comp& cr, int i, BitCtx& cx) {
  cr.cxt = (cx.h[i] + u32(cx.c8)) * 32;
  int pq = cx.p[cr.p2] + 992;
  if (pq < 0) pq = 0;
  if (pq > 1983) pq = 1983;
  int wt = pq & 63;
  pq >>= 6;
  cr.cxt += u32(pq);
  cx.p[i] = stretch(((int(cr.cm[cr.cxt & cr.cmmask] >> 10) * (64 - wt) +
                      int(cr.cm[(cr.cxt + 1) & cr.cmmask] >> 10) * wt)
                     >> 13));
  cr.cxt += u32(wt >> 5);
}

template <int T>
inline void update_one(Predictor& pr, Comp& cr, int i, int y, BitCtx& cx);

template <>
inline void update_one<CONS>(Predictor&, Comp&, int, int, BitCtx&) {}

template <>
inline void update_one<AVG>(Predictor&, Comp&, int, int, BitCtx&) {}

template <>
inline void update_one<CM>(Predictor& pr, Comp& cr, int, int y, BitCtx&) {
  pr.train(cr, y);
}

template <>
inline void update_one<ICM>(Predictor& pr, Comp& cr, int, int y, BitCtx& cx) {
  size_t idx = cr.c + (cx.hmap4 & 15);
  cr.ht[idx] = g_tab.sns[cr.ht[idx] * 4 + y];
  u32& pn = cr.cm[cr.cxt];
  pn += u32((y * 32767 - int(pn >> 8)) >> 2);
}

template <>
inline void update_one<MATCH>(Predictor& pr, Comp& cr, int i, int y,
                              BitCtx& cx) {
  size_t mask = cr.htmask;
  if (int(cr.c) != y) cr.a = 0;
  cr.ht[cr.limit & mask] = u8(cr.ht[cr.limit & mask] * 2 + y);
  if (++cr.cxt == 8) {
    cr.cxt = 0;
    cr.limit = (cr.limit + 1) & mask;
    if (cr.a == 0) {
      cr.b = (cr.limit - cr.cm[cx.h[i] & cr.cmmask]);
      if (cr.b & mask)
        while (cr.a < 255 &&
               cr.ht[(cr.limit - cr.a - 1) & mask] ==
                   cr.ht[(cr.limit - cr.a - cr.b - 1) & mask])
          ++cr.a;
    } else if (cr.a < 255) ++cr.a;
    cr.cm[cx.h[i] & cr.cmmask] = u32(cr.limit);
  }
}

template <>
inline void update_one<MIX2>(Predictor& pr, Comp& cr, int i, int y,
                             BitCtx& cx) {
  int err = ((y * 32767 - squash(cx.p[i])) * cr.p4) >> 5;
  int w = cr.a16[cr.cxt] + ((err * (cx.p[cr.p2] - cx.p[cr.p3]) + (1 << 12))
                            >> 13);
  if (w < 0) w = 0;
  if (w > 65535) w = 65535;
  cr.a16[cr.cxt] = u16(w);
}

template <int T>
inline void update_one_mix(Predictor& pr, Comp& cr, int i, int y,
                           BitCtx& cx) {
  constexpr int mm = T >> 8;
  int err = ((y * 32767 - squash(cx.p[i])) * cr.p4) >> 4;
  i32* wt = (i32*)&cr.cm[cr.cxt];
  for (int j = 0; j < mm; ++j)
    wt[j] = clamp512k(wt[j] + ((err * cx.p[cr.p2 + j] + (1 << 12)) >> 13));
}

template <>
inline void update_one<ISSE>(Predictor& pr, Comp& cr, int i, int y,
                             BitCtx& cx) {
  int err = y * 32767 - squash(cx.p[i]);
  i32* wt = (i32*)&cr.cm[cr.cxt * 2];
  wt[0] = clamp512k(wt[0] + ((err * cx.p[cr.p2] + (1 << 12)) >> 13));
  wt[1] = clamp512k(wt[1] + ((err + 16) >> 5));
  cr.ht[cr.c + (cx.hmap4 & 15)] = g_tab.sns[cr.cxt * 4 + y];
}

template <>
inline void update_one<SSE>(Predictor& pr, Comp& cr, int, int y, BitCtx&) {
  pr.train(cr, y);
}

template <int T>
inline void predict_any(Predictor& pr, Comp& cr, int i, BitCtx& cx) {
  if constexpr ((T & 255) == MIX) predict_one_mix<T>(pr, cr, i, cx);
  else predict_one<T>(pr, cr, i, cx);
}

template <int T>
inline void update_any(Predictor& pr, Comp& cr, int i, int y, BitCtx& cx) {
  if constexpr ((T & 255) == MIX) update_one_mix<T>(pr, cr, i, y, cx);
  else update_one<T>(pr, cr, i, y, cx);
}

// At a nibble boundary every ICM/ISSE re-probes its hash table (find) —
// with 8 hash components at -m4/-m5 that is 8 SERIALIZED cache misses per
// nibble, which dominates the bit loop on big tables. Prefetch every
// probe's 64-byte block (it contains all three candidates h0/h0^16/h0^32)
// BEFORE the first find() so the misses overlap. The reference JIT wins
// partly by the same effect (its straight-line code lets the OoO window
// reach the next component's load earlier).
template <int T>
inline void prefetch_one(Predictor& pr, Comp& cr, int i) {
  if constexpr ((T & 255) == ICM || (T & 255) == ISSE) {
    u32 cxt = pr.h[i] + 16 * u32(pr.c8);
    size_t h0 = (size_t(cxt) * 16) & (cr.ht.size() - 16);
    const u8* base = &cr.ht[h0 & ~size_t(63)];
    __builtin_prefetch(base);
    __builtin_prefetch(base + 63);   // block may straddle two lines
  } else if constexpr ((T & 255) == MATCH) {
    __builtin_prefetch(&cr.cm[pr.h[i] & cr.cmmask]);
  }
}

template <int... Ts>
struct ChainOps {
  static const int NC = int(sizeof...(Ts));
  template <std::size_t... Is>
  static int predict_impl(Predictor& pr, std::index_sequence<Is...>) {
    if (pr.c8 == 1 || (pr.c8 & 0xf0) == 16)
      (prefetch_one<Ts>(pr, pr.comp[Is], int(Is)), ...);
    int pl[NC];
    BitCtx cx{pr.c8, pr.hmap4, pr.h, pl};
    (predict_any<Ts>(pr, pr.comp[Is], int(Is), cx), ...);
    // publish for update's error terms (one sequential store burst)
    for (int i = 0; i < NC; ++i) pr.p[i] = pl[i];
    return squash(pl[NC - 1]);
  }
  template <std::size_t... Is>
  static void update_impl(Predictor& pr, int y, std::index_sequence<Is...>) {
    int pl[NC];
    for (int i = 0; i < NC; ++i) pl[i] = pr.p[i];
    BitCtx cx{pr.c8, pr.hmap4, pr.h, pl};
    (update_any<Ts>(pr, pr.comp[Is], int(Is), y, cx), ...);
    pr.update_tail(y);
  }
  static int predict(Predictor& pr) {
    return predict_impl(pr, std::make_index_sequence<sizeof...(Ts)>{});
  }
  static void update(Predictor& pr, int y) {
    update_impl(pr, y, std::make_index_sequence<sizeof...(Ts)>{});
  }
};

// the three standard chains (codec/methods.py make_model; type sequences
// AND MIX input counts are block-size-invariant, so one instantiation
// serves -mN at every .N1). MIX entries carry m in the high bits.
constexpr int MIXm(int m) { return MIX | (m << 8); }
using ChainM3 = ChainOps<ICM, ISSE>;
using ChainM4 = ChainOps<ICM, ISSE, ISSE, ISSE, ISSE, ISSE, MATCH, ICM,
                         ISSE, MIXm(9), MIXm(10), MIX2, SSE, MIX2>;
using ChainM5 = ChainOps<ICM, ISSE, CM, ICM, ISSE, ISSE, ISSE, ISSE, ISSE,
                         ISSE, ISSE, MATCH, ICM, ISSE, ICM, ISSE, ICM, ISSE,
                         MIXm(18), MIXm(19), MIX2, SSE, MIX2>;

// Fused per-byte coder loops: predict + arithmetic-code + update of every
// bit inlined into one function per chain — no per-bit indirect calls, and
// the optimizer schedules across the three phases (the reference's
// assemble_p emits exactly this shape).
template <typename Chain>
int decode_byte_fused(Predictor& pr, Decoder& dec) {
  int c = 1;
  while (c < 256) {
    int p = Chain::predict(pr) * 2 + 1;
    c += c + dec.decode(p);
    Chain::update(pr, c & 1);
  }
  return c - 256;
}

template <typename Chain>
void encode_byte_fused(Predictor& pr, Encoder& enc, int c) {
  for (int i = 7; i >= 0; --i) {
    int p = Chain::predict(pr) * 2 + 1;
    int y = (c >> i) & 1;
    enc.encode(y, p);
    Chain::update(pr, y);
  }
}

struct ChainEntry {
  std::vector<int> types;     // base type | (m << 8) for MIX
  int (*predict)(Predictor&);
  void (*update)(Predictor&, int);
  int (*dec_byte)(Predictor&, Decoder&);
  void (*enc_byte)(Predictor&, Encoder&, int);
};

template <typename Chain>
ChainEntry make_entry(std::vector<int> types) {
  return {std::move(types), &Chain::predict, &Chain::update,
          &decode_byte_fused<Chain>, &encode_byte_fused<Chain>};
}

const std::vector<ChainEntry>& chain_registry() {
  static const std::vector<ChainEntry> reg = {
      make_entry<ChainM3>({ICM, ISSE}),
      make_entry<ChainM4>({ICM, ISSE, ISSE, ISSE, ISSE, ISSE, MATCH, ICM,
                           ISSE, MIXm(9), MIXm(10), MIX2, SSE, MIX2}),
      make_entry<ChainM5>({ICM, ISSE, CM, ICM, ISSE, ISSE, ISSE, ISSE,
                           ISSE, ISSE, ISSE, MATCH, ICM, ISSE, ICM, ISSE,
                           ICM, ISSE, MIXm(18), MIXm(19), MIX2, SSE,
                           MIX2}),
  };
  return reg;
}

}  // namespace

static void select_chain(Predictor& pr) {
  int n = pr.hdr.n();
  for (const ChainEntry& e : chain_registry()) {
    if (int(e.types.size()) != n) continue;
    bool ok = true;
    for (int i = 0; i < n; ++i) {
      int want = e.types[i];
      const std::vector<u8>& cp = pr.hdr.comps[i];
      if (cp[0] != (want & 255)) { ok = false; break; }
      // MIX input count is baked into the template — must match exactly
      if (cp[0] == MIX && int(cp[3]) != (want >> 8)) { ok = false; break; }
    }
    if (ok) {
      pr.pred_fn = e.predict;
      pr.upd_fn = e.update;
      pr.dec_byte_fn = e.dec_byte;
      pr.enc_byte_fn = e.enc_byte;
      return;
    }
  }
}

// ---- arithmetic decoder (libzpaq.cpp:2082-2173) ---------------------------
void Decoder::init_block(const Header& hd) {
  pr.init(hd);
  init_segment();
}

void Decoder::init_segment() {
  low = 1; high = 0xFFFFFFFFu; curr = 0;
}

int Decoder::decode(int p) {
  if (curr < low || curr > high) throw format_error("archive corrupted");
  u32 mid = low + u32((u64(high - low) * u32(p)) >> 16);
  int y;
  if (curr <= mid) { y = 1; high = mid; }
  else { y = 0; low = mid + 1; }
  while ((high ^ low) < 0x1000000u) {
    high = (high << 8) | 255;
    low <<= 8;
    low += (low == 0);
    int c = get();
    if (c < 0) throw format_error("unexpected end of file");
    curr = (curr << 8) | u32(c);
  }
  return y;
}

int Decoder::decompress() {
  if (pr.is_modeled()) {
    if (curr == 0)
      for (int i = 0; i < 4; ++i) curr = (curr << 8) | u32(get() & 255);
    if (decode(0)) {
      if (curr != 0) throw format_error("decoding end of stream");
      return -1;
    }
    if (pr.dec_byte_fn) return pr.dec_byte_fn(pr, *this);
    int c = 1;
    while (c < 256) {
      int p = pr.predict() * 2 + 1;
      c += c + decode(p);
      pr.update(c & 1);
    }
    return c - 256;
  }
  if (curr == 0) {
    for (int i = 0; i < 4; ++i) curr = (curr << 8) | u32(get() & 255);
    if (curr == 0) return -1;
  }
  --curr;
  return get();
}

size_t Decoder::read_unmodeled(u8* dst, size_t maxn) {
  size_t got = 0;
  while (got < maxn) {
    if (curr == 0) {
      for (int i = 0; i < 4; ++i) curr = (curr << 8) | u32(get() & 255);
      if (curr == 0) break;             // EOS (decompress() returns -1 here)
    }
    size_t take = maxn - got < curr ? maxn - got : curr;
    size_t r = bin->read(dst + got, take);
    got += r;
    curr -= u32(r);
    if (r < take) throw format_error("unexpected end of file");
  }
  return got;
}

// ---- postprocessor (libzpaq.cpp:2175-2233) --------------------------------

namespace {
struct KnownPcomp {
  std::vector<u8> code;   // trailing 0 stripped
  int kind, p1, p2;
};
std::vector<KnownPcomp> g_known_pcomps;
}  // namespace

void register_pcomp(const u8* code, size_t len, int kind, int p1, int p2) {
  while (len && code[len - 1] == 0) --len;
  for (auto& k : g_known_pcomps)
    if (k.code.size() == len && memcmp(k.code.data(), code, len) == 0)
      return;
  g_known_pcomps.push_back({std::vector<u8>(code, code + len),
                            kind, p1, p2});
}

void PostProc::init(int ph_, int pm_, Sink* out_) {
  state = hsize = 0;
  ph = ph_; pm = pm_;
  out = out_;
  pcomp.clear();
  fast_kind = 0;
  fbuf.clear();
}

void PostProc::write(int c) {
  switch (state) {
    case 0:
      if (c < 0) throw format_error("unexpected EOS");
      state = c + 1;
      if (state > 2) throw format_error("unknown post processing type");
      break;
    case 1:
      if (c >= 0 && out) out->put(c);
      break;
    case 2:
      if (c < 0) throw format_error("unexpected EOS");
      hsize = c;
      state = 3;
      break;
    case 3: {
      if (c < 0) throw format_error("unexpected EOS");
      hsize += c * 256;
      if (hsize < 1) throw format_error("empty PCOMP");
      pcomp.clear();
      state = 4;
      break;
    }
    case 4:
      if (c < 0) throw format_error("unexpected EOS");
      pcomp.push_back(u8(c));
      if ((int)pcomp.size() == hsize) {
        size_t codelen = pcomp.size();
        if (codelen && pcomp[codelen - 1] == 0) --codelen;
        fast_kind = FAST_NONE;
        for (auto& k : g_known_pcomps) {
          if (k.code.size() == codelen
              && memcmp(k.code.data(), pcomp.data(), codelen) == 0) {
            fast_kind = k.kind;
            fast_p1 = k.p1;
            fast_p2 = k.p2;
            break;
          }
        }
        if (fast_kind == FAST_NONE) {
          vm.init(pcomp.data(), codelen, ph, pm);
          vm.out = out;
        }
        state = 5;
      }
      break;
    case 5:
      if (fast_kind != FAST_NONE) {
        if (c >= 0) {
          fbuf.push_back(u8(c));
        } else {
          apply_fast();
          fbuf.clear();
        }
      } else {
        vm.run(c >= 0 ? u32(c) : 0xFFFFFFFFu);
      }
      break;
  }
}

// byte-aligned LZ77 inverse (stream format libzpaq.cpp:6211-6222)
static void ilz77_byte(const u8* in, size_t n, int min_match, Sink* out) {
  size_t i = 0;
  std::vector<u8>& v = out->v;
  size_t base = v.size();
  while (i < n) {
    u8 c = in[i++];
    if (c < 64) {                       // literal run of (c&63)+1
      size_t len = size_t(c) + 1;
      if (i + len > n) len = n - i;
      v.insert(v.end(), in + i, in + i + len);
      i += len;
    } else {
      int nb = (c >> 6) + 1;            // 2..4 offset bytes, big endian
      size_t off = 0;
      for (int j = 0; j < nb && i < n; ++j) off = (off << 8) | in[i++];
      size_t len = size_t(c & 63) + min_match;
      size_t start = v.size() - off - 1;
      if (start + base > v.size() + base) break;   // corrupt: stop
      for (size_t j = 0; j < len; ++j) v.push_back(v[start + j]);
    }
  }
}

// BWT inverse: the exact algorithm the stored pcomp runs
// (codec/methods.py bwt_pcomp_source; stream per libzpaq.cpp:6317-6327:
// B[0..n] = last column with the sentinel row's byte replaced by 255 at
// row idx, then idx as 4 LSB-first bytes), executed at memory speed.
static void ibwt(const u8* in, size_t total, Sink* out) {
  if (total < 5) { return; }
  size_t n = total - 5;                 // original length
  size_t rows = n + 1;                  // column rows 0..n
  u32 idx = u32(in[n + 1]) | (u32(in[n + 2]) << 8)
          | (u32(in[n + 3]) << 16) | (u32(in[n + 4]) << 24);
  if (idx > n) throw format_error("bad BWT index");
  if (n == 0) return;
  // count occurrences, skipping the sentinel row
  u32 base[256] = {0};
  for (size_t b = 0; b < rows; ++b)
    if (b != idx) ++base[in[b]];
  // exclusive prefix sums offset by 1 (sentinel = sorted row 0)
  u32 acc = 1;
  for (int ch = 0; ch < 256; ++ch) {
    u32 c = base[ch];
    base[ch] = acc;
    acc += c;
  }
  // psi: successor permutation — psi[base[B[b]]++] = b
  std::vector<u32> psi(rows);
  for (size_t b = 0; b < rows; ++b) {
    if (b == idx) continue;
    psi[base[in[b]]++] = u32(b);
  }
  // walk n rows from idx, emitting the column byte at each step
  std::vector<u8>& v = out->v;
  size_t start = v.size();
  v.resize(start + n);
  u32 r = idx;
  for (size_t k = 0; k < n; ++k) {
    r = psi[r];
    v[start + k] = in[r];
  }
}

extern "C" size_t tz_lz77p_decode(const u8* in, size_t n, int rb,
                                  u8* out, size_t cap);

void PostProc::apply_fast() {
  size_t start = out->v.size();
  switch (fast_kind) {
    case FAST_LZ77P: {
      // packed stream: size via a dry call, then decode into the sink
      size_t need = tz_lz77p_decode(fbuf.data(), fbuf.size(), fast_p1,
                                    nullptr, 0);
      out->v.resize(start + need);
      tz_lz77p_decode(fbuf.data(), fbuf.size(), fast_p1,
                      out->v.data() + start, need);
      break;
    }
    case FAST_LZ77B:
      ilz77_byte(fbuf.data(), fbuf.size(), fast_p1, out);
      break;
    case FAST_BWT:
      ibwt(fbuf.data(), fbuf.size(), out);
      break;
    case FAST_E8E9:
      out->v.insert(out->v.end(), fbuf.begin(), fbuf.end());
      break;
    default:
      throw format_error("unknown fast pcomp kind");
  }
  // composite transforms (N2=5/6/7): E8E9 was applied BEFORE LZ77/BWT on
  // encode, so its inverse runs over the transform's output
  if (fast_p2 || fast_kind == FAST_E8E9)
    inverse_e8e9(out->v.data() + start, i64(out->v.size() - start));
}

// ---- preprocessors --------------------------------------------------------
// E8E9: x86 CALL/JMP rel->abs, scanned backward (libzpaq.cpp:6117-6126).
void e8e9(u8* buf, i64 n) {
  for (i64 i = n - 5; i >= 0; --i) {
    if ((buf[i] & 0xFE) == 0xE8 && (buf[i + 4] == 0 || buf[i + 4] == 0xFF)) {
      u32 a = (buf[i + 1] | (u32(buf[i + 2]) << 8) | (u32(buf[i + 3]) << 16))
              + u32(i);
      buf[i + 1] = u8(a);
      buf[i + 2] = u8(a >> 8);
      buf[i + 3] = u8(a >> 16);
    }
  }
}

void inverse_e8e9(u8* buf, i64 n) {
  for (i64 i = 0; i + 4 < n; ++i) {
    if ((buf[i] & 0xFE) == 0xE8 && (buf[i + 4] == 0 || buf[i + 4] == 0xFF)) {
      u32 a = (buf[i + 1] | (u32(buf[i + 2]) << 8) | (u32(buf[i + 3]) << 16))
              - u32(i);
      buf[i + 1] = u8(a);
      buf[i + 2] = u8(a >> 8);
      buf[i + 3] = u8(a >> 16);
    }
  }
}

// ---- encoder --------------------------------------------------------------
void Encoder::init_block(const Header& hd) {
  pr.init(hd);
  init_segment();
}

void Encoder::init_segment() {
  low = 1; high = 0xFFFFFFFFu;
  ubuf.clear();
}

void Encoder::encode(int y, int p) {
  u32 mid = low + u32((u64(high - low) * u32(p)) >> 16);
  if (y) high = mid; else low = mid + 1;
  while ((high ^ low) < 0x1000000u) {
    out->put(int(high >> 24));
    high = (high << 8) | 255;
    low <<= 8;
    low += (low == 0);
  }
}

void Encoder::flush_unmodeled() {
  if (!ubuf.empty()) {
    size_t n = ubuf.size();
    out->put(int(n >> 24) & 255);
    out->put(int(n >> 16) & 255);
    out->put(int(n >> 8) & 255);
    out->put(int(n) & 255);
    out->write(ubuf.data(), n);
    ubuf.clear();
  }
}

void Encoder::compress(int c) {
  if (pr.is_modeled()) {
    if (c < 0) encode(1, 0);
    else {
      encode(0, 0);
      if (pr.enc_byte_fn) { pr.enc_byte_fn(pr, *this, c); return; }
      for (int i = 7; i >= 0; --i) {
        int p = pr.predict() * 2 + 1;
        int y = (c >> i) & 1;
        encode(y, p);
        pr.update(y);
      }
    }
  } else {
    if (c < 0) flush_unmodeled();
    else {
      ubuf.push_back(u8(c));
      if (ubuf.size() >= (1u << 16)) flush_unmodeled();
    }
  }
}

// Bulk input: byte-identical to feeding compress() in a loop, but store
// (unmodeled) blocks move via memcpy-sized inserts instead of a per-byte
// call chain (~10x on the add pipeline's store/LZ77-coded blocks).
void Encoder::compress_bulk(const u8* p, size_t n) {
  if (pr.is_modeled()) {
    for (size_t i = 0; i < n; ++i) compress(int(p[i]));
    return;
  }
  while (n) {
    if (ubuf.empty() && n >= (size_t(1) << 16)) {
      // full 64 KiB chunk: emit straight from the caller's buffer (same
      // bytes flush_unmodeled() would produce, one copy fewer)
      out->put(0); out->put(1); out->put(0); out->put(0);
      out->write(p, size_t(1) << 16);
      p += size_t(1) << 16;
      n -= size_t(1) << 16;
      continue;
    }
    size_t room = (size_t(1) << 16) - ubuf.size();
    size_t take = n < room ? n : room;
    ubuf.insert(ubuf.end(), p, p + take);
    p += take;
    n -= take;
    if (ubuf.size() >= (1u << 16)) flush_unmodeled();
  }
}

// ---- archive sources and the buffered reader ------------------------------
// (AES core lives in the C-ABI section below; forward-declare the entry.)
extern "C" void tz_aes_ctr(const u8* key, int keylen, const u8* salt8,
                           u8* buf, size_t n, u64 offset);

FileSource::~FileSource() {
  for (auto& p : parts)
    if (p.fd >= 0) ::close(p.fd);
}

std::string FileSource::open(const char* const* paths, int nparts,
                             const u8* key32) {
  total = 0;
  for (int i = 0; i < nparts; ++i) {
    int fd = ::open(paths[i], O_RDONLY);
    if (fd < 0) return std::string("cannot open ") + paths[i];
    off_t sz = ::lseek(fd, 0, SEEK_END);
    if (sz < 0) { ::close(fd); return std::string("cannot stat ") + paths[i]; }
    parts.push_back({fd, (u64)sz});
  }
  enc = key32 != nullptr;
  skip = 0;
  if (enc) {
    memcpy(key, key32, 32);
    if (parts.empty() || parts[0].size < 32)
      return "archive too short for salt header";
    u8 salt[32];
    if (::pread(parts[0].fd, salt, 32, 0) != 32) return "cannot read salt";
    memcpy(iv8, salt, 8);
    skip = 32;
  }
  cum.clear();
  u64 at = 0;
  for (auto& p : parts) { cum.push_back(at); at += p.size; }
  total = at >= skip ? at - skip : 0;
  return "";
}

size_t FileSource::pread(u64 pos, u8* dst, size_t n) {
  // pos is logical plaintext space; on-disk offset shifts past the salt
  if (pos >= total) return 0;
  if (pos + n > total) n = (size_t)(total - pos);
  u64 disk = pos + skip;
  size_t got = 0;
  while (got < n) {
    // part containing disk offset
    size_t pi = 0;
    while (pi + 1 < parts.size() && cum[pi + 1] <= disk) ++pi;
    u64 in_part = disk - cum[pi];
    u64 avail = parts[pi].size - in_part;
    size_t take = (size_t)std::min<u64>(n - got, avail);
    if (take == 0) break;
    ssize_t r = ::pread(parts[pi].fd, dst + got, take, (off_t)in_part);
    if (r <= 0) break;
    got += (size_t)r;
    disk += (u64)r;
    if ((size_t)r < take) break;
  }
  if (enc && got)
    tz_aes_ctr(key, 32, iv8, dst, got, pos + skip);
  return got;
}

int BufIn::refill() {
  if (!src) return -1;
  wbase = pos;
  wlen = src->pread(pos, win.data(), win.size());
  if (wlen == 0) return -1;
  return win[(size_t)(pos++ - wbase)];
}

size_t BufIn::read(u8* dst, size_t n) {
  if (mem) {
    if (pos >= memn) return 0;
    size_t take = (size_t)std::min<u64>(n, memn - pos);
    memcpy(dst, mem + pos, take);
    pos += take;
    return take;
  }
  size_t got = 0;
  // drain the window first, then read the tail straight from the source
  if (pos >= wbase && pos < wbase + wlen) {
    size_t take = std::min(n, (size_t)(wbase + wlen - pos));
    memcpy(dst, win.data() + (size_t)(pos - wbase), take);
    pos += take;
    got = take;
  }
  if (got < n && src) {
    size_t r = src->pread(pos, dst + got, n - got);
    pos += r;
    got += r;
  }
  return got;
}

}  // namespace tzpaq

// ===========================================================================
// C ABI
// ===========================================================================

using namespace tzpaq;

namespace {

// 13-byte locator tag (matches codec/container.py TAG)
const u8 TAG[13] = {0x37, 0x6B, 0x53, 0x74, 0xA0, 0x31, 0x83, 0xD3,
                    0x8C, 0xB2, 0x28, 0xB0, 0xD3};

struct Segment {
  std::string filename, comment;
  std::vector<u8> data;
  bool has_sha1 = false;
  u8 sha1[20];
  u64 offset = 0;              // archive offset of the segment start byte
};

struct Stream {
  BufIn in;                    // buffered cursor over the source
  MemSource msrc;              // when opened over bytes
  FileSource* fsrc = nullptr;  // when opened over files (owned)
  std::vector<u8> keep;        // tzs_open copy-mode buffer (if any)
  std::string err;
  std::vector<Segment> segs;   // segments of the last decoded block
  Header hdr;
  u64 block_offset = 0;

  ~Stream() { delete fsrc; }
  int get() { return in.get(); }
};

// scan for the next block via the 4 rolling hashes
// (libzpaq.cpp:2239-2266 semantics; constants match container.py find_block)
bool find_block(Stream& s, Header& hd) {
  u32 h1 = 0x3D49B113, h2 = 0x29EB7F93, h3 = 0x2614BE13, h4 = 0x3828EB13;
  for (;;) {
    int c = s.get();
    if (c < 0) return false;
    h1 = h1 * 12 + c;
    h2 = h2 * 20 + c;
    h3 = h3 * 28 + c;
    h4 = h4 * 44 + c;
    if (h1 == 0xB16B88F1 && h2 == 0xFF5376F1 && h3 == 0x72AC5BF1 &&
        h4 == 0x2F909AF1)
      break;
  }
  int level = s.get();
  if (level != 1 && level != 2) throw format_error("unsupported ZPAQ level");
  if (s.get() != 1) throw format_error("unsupported ZPAQL type");
  // header = hsize[2] + hsize bytes; read it through the cursor so
  // file-backed sources never need the whole archive mapped
  int lo = s.get(), hi = s.get();
  if (lo < 0 || hi < 0) throw format_error("truncated header");
  size_t hsize = (size_t)lo + 256 * (size_t)hi;
  std::vector<u8> hbuf(2 + hsize);
  hbuf[0] = (u8)lo; hbuf[1] = (u8)hi;
  if (s.in.read(hbuf.data() + 2, hsize) != hsize)
    throw format_error("truncated header body");
  hd.parse(hbuf.data(), hbuf.size());
  return true;
}

// read segment filename; returns false at end of block (255)
bool read_filename(Stream& s, std::string& name) {
  int c = s.get();
  if (c == 255) return false;
  if (c != 1) throw format_error("missing segment or end of block");
  name.clear();
  for (;;) {
    c = s.get();
    if (c < 0) throw format_error("unexpected EOF");
    if (c == 0) return true;
    name.push_back(char(c));
  }
}

void read_comment(Stream& s, std::string& comment) {
  comment.clear();
  for (;;) {
    int c = s.get();
    if (c < 0) throw format_error("unexpected EOF");
    if (c == 0) break;
    comment.push_back(char(c));
  }
  if (s.get() != 0) throw format_error("missing reserved byte");
}

}  // namespace

extern "C" {

void* tzs_open(const u8* data, size_t n) {
  Stream* s = new Stream();
  s->msrc.p = data; s->msrc.n = n;
  s->in.use_mem(data, n);
  return s;
}

// File-backed (multipart, optionally encrypted) archive stream: the
// InputArchive equivalent (zsfx.cpp:401-568). Memory is O(window), not
// O(archive); key32 = stretched AES-256 key (scrypt runs in Python).
// Returns NULL on open failure (tzs_open_error() has the message).
static std::string g_open_err;
const char* tzs_open_error() { return g_open_err.c_str(); }

void* tzs_open_paths(const char* const* paths, int nparts, const u8* key32) {
  FileSource* f = new FileSource();
  std::string err = f->open(paths, nparts, key32);
  if (!err.empty()) {
    g_open_err = err;
    delete f;
    return nullptr;
  }
  Stream* s = new Stream();
  s->fsrc = f;
  s->in.use_src(f);
  return s;
}

u64 tzs_size(void* h) { return ((Stream*)h)->in.size(); }

// Register a known PCOMP program for the native fast inverse (see
// PostProc fast path in tzpaq.h): kind 1 = packed LZ77 (p1 = rb),
// 2 = byte LZ77 (p1 = min match), 3 = BWT, 4 = E8E9; p2 = composite E8E9.
void tz_register_pcomp(const u8* code, size_t len, int kind, int p1,
                       int p2) {
  register_pcomp(code, len, kind, p1, p2);
}

// Register a known standard-level HCOMP bytecode (kind 3/4/5) for the
// native specialized context update (VM::run_fast).
void tz_register_hcomp(const u8* code, size_t len, int kind) {
  register_hcomp(code, len, kind);
}

// raw (already-decrypted) archive bytes at an absolute logical offset —
// the device decode path uses this to fetch a block's coded byte range
size_t tzs_read_raw(void* h, u64 pos, u8* dst, size_t n) {
  Stream& s = *(Stream*)h;
  u64 save = s.in.tell();
  s.in.seek(pos);
  size_t got = s.in.read(dst, n);
  s.in.seek(save);
  return got;
}

void tzs_close(void* h) { delete (Stream*)h; }

const char* tzs_error(void* h) { return ((Stream*)h)->err.c_str(); }

// Find + fully decode the next block (all segments).
// Returns number of segments, 0 at end of archive, -1 on error.
long tzs_read_block(void* hv) {
  Stream& s = *(Stream*)hv;
  s.segs.clear();
  try {
    s.block_offset = s.in.tell();
    if (!find_block(s, s.hdr)) return 0;
    Decoder dec;
    PostProc pp;
    Sink sink;
    bool first = true;
    std::string name, comment;
    while (read_filename(s, name)) {
      read_comment(s, comment);
      dec.bin = &s.in;           // decoder advances the shared cursor
      if (first) {
        dec.init_block(s.hdr);
        pp.init(s.hdr.ph, s.hdr.pm, &sink);
        first = false;
      } else {
        dec.init_segment();
      }
      Segment seg;
      seg.filename = name;
      seg.comment = comment;
      seg.offset = s.in.tell();
      size_t start = sink.size();
      if (!dec.pr.is_modeled()) {
        // unmodeled stream: per-byte calls only until the postprocessor
        // reaches steady state (selector + optional pcomp load), then the
        // 4-byte-length-prefixed chunks copy in bulk — store blocks and
        // the LZ77 stream feed run at memcpy speed instead of two virtual
        // calls per byte
        int c;
        while (pp.state != 1 && !(pp.state == 5 && pp.fast_kind != 0)
               && (c = dec.decompress()) != -1)
          pp.write(c);
        if (pp.state == 1 || (pp.state == 5 && pp.fast_kind != 0)) {
          std::vector<u8>& dst = pp.state == 1 ? sink.v : pp.fbuf;
          u8 tmp[1 << 16];
          for (;;) {
            size_t got = dec.read_unmodeled(tmp, sizeof tmp);
            if (got) dst.insert(dst.end(), tmp, tmp + got);
            if (got < sizeof tmp) break;
          }
          pp.write(-1);
        } else {
          pp.write(-1);
        }
      } else {
        for (;;) {
          int c = dec.decompress();
          pp.write(c);
          if (c == -1) break;
        }
      }
      int c = s.get();
      if (c == 253) {
        seg.has_sha1 = true;
        for (int i = 0; i < 20; ++i) seg.sha1[i] = u8(s.get() & 255);
      } else if (c != 254) {
        throw format_error("missing end of segment marker");
      }
      seg.data.assign(sink.v.begin() + start, sink.v.end());
      s.segs.push_back(std::move(seg));
      name.clear(); comment.clear();
    }
    return (long)s.segs.size();
  } catch (const std::exception& e) {
    s.err = e.what();
    return -1;
  }
}

// Decode the block at the current cursor and SHA-1 the concatenated output
// over consecutive spans, entirely native: the verify ('t') hot path moves
// zero decoded bytes across the ctypes boundary (the decode->join->hash
// round trip through Python cost two 16 MB copies per block under the GIL).
// ends[] are cumulative span end offsets; digests_out receives nspans*20
// bytes.  Returns decoded byte count, -1 on error (message via tzs_error),
// -2 if the decoded stream is shorter than ends[nspans-1].
extern "C" void tz_sha1_many(const u8* data, const u32* ends, size_t count,
                             u8* out);

long tzs_verify_block(void* hv, const u32* ends, size_t nspans,
                      u8* digests_out) {
  Stream& s = *(Stream*)hv;
  try {
    s.block_offset = s.in.tell();
    if (!find_block(s, s.hdr)) { s.err = "no block"; return -1; }
    Decoder dec;
    PostProc pp;
    Sink sink;
    bool first = true;
    std::string name, comment;
    while (read_filename(s, name)) {
      read_comment(s, comment);
      dec.bin = &s.in;
      if (first) {
        dec.init_block(s.hdr);
        pp.init(s.hdr.ph, s.hdr.pm, &sink);
        first = false;
      } else {
        dec.init_segment();
      }
      if (!dec.pr.is_modeled()) {
        int c;
        while (pp.state != 1 && !(pp.state == 5 && pp.fast_kind != 0)
               && (c = dec.decompress()) != -1)
          pp.write(c);
        if (pp.state == 1 || (pp.state == 5 && pp.fast_kind != 0)) {
          std::vector<u8>& dst = pp.state == 1 ? sink.v : pp.fbuf;
          u8 tmp[1 << 16];
          for (;;) {
            size_t got = dec.read_unmodeled(tmp, sizeof tmp);
            if (got) dst.insert(dst.end(), tmp, tmp + got);
            if (got < sizeof tmp) break;
          }
          pp.write(-1);
        } else {
          pp.write(-1);
        }
      } else {
        for (;;) {
          int c = dec.decompress();
          pp.write(c);
          if (c == -1) break;
        }
      }
      int c = s.get();
      if (c == 253) {
        for (int i = 0; i < 20; ++i) s.get();
      } else if (c != 254) {
        throw format_error("missing end of segment marker");
      }
      name.clear(); comment.clear();
    }
    if (nspans && ends[nspans - 1] > sink.v.size()) return -2;
    if (nspans) tz_sha1_many(sink.v.data(), ends, nspans, digests_out);
    return (long)sink.v.size();
  } catch (const std::exception& e) {
    s.err = e.what();
    return -1;
  }
}

size_t tzs_seg_count(void* h) { return ((Stream*)h)->segs.size(); }
const char* tzs_seg_filename(void* h, size_t i) {
  return ((Stream*)h)->segs[i].filename.c_str();
}
const char* tzs_seg_comment(void* h, size_t i) {
  return ((Stream*)h)->segs[i].comment.c_str();
}
const u8* tzs_seg_data(void* h, size_t i) {
  return ((Stream*)h)->segs[i].data.data();
}
size_t tzs_seg_size(void* h, size_t i) {
  return ((Stream*)h)->segs[i].data.size();
}
int tzs_seg_sha1(void* h, size_t i, u8* out20) {
  Segment& s = ((Stream*)h)->segs[i];
  if (!s.has_sha1) return 0;
  memcpy(out20, s.sha1, 20);
  return 1;
}
u64 tzs_tell(void* h) { return ((Stream*)h)->in.tell(); }
void tzs_seek(void* h, u64 pos) { ((Stream*)h)->in.seek(pos); }

// One-call block compressor. header = serialized model header (hsize..),
// ppblob = "psize[2] pcomp 0" or NULL, data fed through the coder after the
// postprocessor selector. sha1 = checksum of the ORIGINAL data or NULL.
// Returns bytes written, or -(needed) if out_cap is too small, -1 on error.
long tzc_compress_block(const u8* header, size_t header_len,
                        const u8* ppblob, size_t ppblob_len,
                        const u8* data, size_t n,
                        const char* filename, const char* comment,
                        const u8* sha1, int write_tag,
                        u8* out, size_t out_cap) {
  try {
    Header hd;
    hd.parse(header, header_len);
    Sink sink;
    sink.v.reserve(n + n / 256 + header_len + ppblob_len + 128);
    if (write_tag) sink.write(TAG, 13);
    sink.put('z'); sink.put('P'); sink.put('Q');
    sink.put(hd.n() > 0 ? 1 : 2); sink.put(1);
    sink.write(header, header_len);
    sink.put(1);
    for (const char* p = filename; *p; ++p) sink.put(*p);
    sink.put(0);
    for (const char* p = comment; *p; ++p) sink.put(*p);
    sink.put(0); sink.put(0);
    Encoder enc;
    enc.out = &sink;
    enc.init_block(hd);
    if (ppblob && ppblob_len) {
      enc.compress(1);
      for (size_t i = 0; i < ppblob_len; ++i) enc.compress(ppblob[i]);
    } else {
      enc.compress(0);
    }
    enc.compress_bulk(data, n);
    enc.compress(-1);
    sink.put(0); sink.put(0); sink.put(0); sink.put(0);
    if (sha1) {
      sink.put(253);
      sink.write(sha1, 20);
    } else {
      sink.put(254);
    }
    sink.put(255);  // end of block
    if (sink.size() > out_cap) return -(long)sink.size();
    memcpy(out, sink.v.data(), sink.size());
    return (long)sink.size();
  } catch (const std::exception&) {
    return -1;
  }
}

// Run a PCOMP program over a decoded (pre-postprocessing) stream that
// already contains the postprocessor selector prefix (0=PASS or
// 1+psize+code), as produced by the device CM decoder. Returns output
// bytes written (or -(needed) if cap too small, -1 on error).
long tz_postprocess(int ph, int pm, const u8* data, size_t n,
                    u8* out, size_t cap) {
  try {
    Sink sink;
    PostProc pp;
    pp.init(ph, pm, &sink);
    for (size_t i = 0; i < n; ++i) pp.write(data[i]);
    pp.write(-1);
    if (sink.size() > cap) return -(long)sink.size();
    memcpy(out, sink.v.data(), sink.size());
    return (long)sink.size();
  } catch (const std::exception&) {
    return -1;
  }
}

void tz_sha1(const u8* data, size_t n, u8* out20) {
  SHA1 s;
  s.init();
  s.update(data, n);
  s.final(out20);
}

// SHA-1 of `count` consecutive spans of one buffer (span i =
// [ends[i-1], ends[i])), pairing spans through the two-stream SHA-NI
// loop — the verify/extract fragment-check hot path.
void tz_sha1_many(const u8* data, const u32* ends, size_t count, u8* out) {
  size_t start = 0, i = 0;
  for (; i + 1 < count; i += 2) {
    size_t mid = ends[i];
    sha1_pair(data + start, mid - start, out + i * 20,
              data + mid, ends[i + 1] - mid, out + (i + 1) * 20);
    start = ends[i + 1];
  }
  if (i < count) {
    SHA1 s;
    s.update(data + start, ends[i] - start);
    s.final(out + i * 20);
  }
}

void tz_e8e9(u8* buf, i64 n) { e8e9(buf, n); }
void tz_inverse_e8e9(u8* buf, i64 n) { inverse_e8e9(buf, n); }

// ---- AES-128/192/256 CTR (FIPS-197, clean-room byte-oriented
// implementation; encrypt-only — CTR needs no decryption rounds).
// Keystream block layout matches the reference archive format
// (libzpaq.cpp:545-556): counter block = salt[0..7] MSB-first || i>>32 || i
// where i = byte_offset/16, XORed into the data at the right alignment.
static u8 aes_sbox[256];
static bool aes_ready = false;

static void aes_init_tables() {
  // generate the S-box from the field inverse + affine transform
  u8 pow_[256], log_[256];
  u8 x = 1;
  for (int i = 0; i < 255; ++i) {
    pow_[i] = x;
    log_[x] = u8(i);
    x = u8(x ^ (x << 1) ^ ((x & 0x80) ? 0x1B : 0));   // multiply by 3
  }
  pow_[255] = pow_[0];
  for (int i = 0; i < 256; ++i) {
    u8 inv = i ? pow_[255 - log_[i]] : 0;
    u8 s = inv;
    u8 r = inv;
    for (int k = 0; k < 4; ++k) {
      r = u8((r << 1) | (r >> 7));
      s ^= r;
    }
    aes_sbox[i] = u8(s ^ 0x63);
  }
  aes_ready = true;
}

struct AESCTR {
  u32 rk[60];
  int rounds;
  u8 iv[8];

  static u32 sub_word(u32 w) {
    return (u32(aes_sbox[(w >> 24) & 255]) << 24)
         | (u32(aes_sbox[(w >> 16) & 255]) << 16)
         | (u32(aes_sbox[(w >> 8) & 255]) << 8)
         | aes_sbox[w & 255];
  }

  void set_key(const u8* key, int keylen, const u8* salt8) {
    if (!aes_ready) aes_init_tables();
    memcpy(iv, salt8, 8);
    int nk = keylen / 4;
    rounds = nk + 6;
    for (int i = 0; i < nk; ++i)
      rk[i] = (u32(key[4 * i]) << 24) | (u32(key[4 * i + 1]) << 16)
            | (u32(key[4 * i + 2]) << 8) | key[4 * i + 3];
    u32 rcon = 1;
    for (int i = nk; i < 4 * (rounds + 1); ++i) {
      u32 t = rk[i - 1];
      if (i % nk == 0) {
        t = sub_word((t << 8) | (t >> 24)) ^ (rcon << 24);
        rcon = u8((rcon << 1) ^ ((rcon & 0x80) ? 0x1B : 0));
      } else if (nk > 6 && i % nk == 4) {
        t = sub_word(t);
      }
      rk[i] = rk[i - nk] ^ t;
    }
  }

  static u8 xtime(u8 v) { return u8((v << 1) ^ ((v & 0x80) ? 0x1B : 0)); }

  void encrypt_block(const u32 in[4], u8 out[16]) const {
    u8 st[16];
    for (int c = 0; c < 4; ++c)
      for (int r = 0; r < 4; ++r)
        st[4 * c + r] = u8(in[c] >> (24 - 8 * r)) ^ u8(rk[c] >> (24 - 8 * r));
    for (int round = 1; round <= rounds; ++round) {
      u8 t[16];
      // SubBytes + ShiftRows
      for (int c = 0; c < 4; ++c)
        for (int r = 0; r < 4; ++r)
          t[4 * c + r] = aes_sbox[st[4 * ((c + r) & 3) + r]];
      if (round < rounds) {              // MixColumns
        for (int c = 0; c < 4; ++c) {
          u8 a0 = t[4 * c], a1 = t[4 * c + 1], a2 = t[4 * c + 2],
             a3 = t[4 * c + 3];
          st[4 * c] = u8(xtime(a0) ^ (xtime(a1) ^ a1) ^ a2 ^ a3);
          st[4 * c + 1] = u8(a0 ^ xtime(a1) ^ (xtime(a2) ^ a2) ^ a3);
          st[4 * c + 2] = u8(a0 ^ a1 ^ xtime(a2) ^ (xtime(a3) ^ a3));
          st[4 * c + 3] = u8((xtime(a0) ^ a0) ^ a1 ^ a2 ^ xtime(a3));
        }
      } else {
        memcpy(st, t, 16);
      }
      const u32* rkr = rk + 4 * round;
      for (int c = 0; c < 4; ++c)
        for (int r = 0; r < 4; ++r)
          st[4 * c + r] ^= u8(rkr[c] >> (24 - 8 * r));
    }
    for (int c = 0; c < 4; ++c)
      for (int r = 0; r < 4; ++r)
        out[4 * c + r] = st[4 * c + r];
  }

  void crypt(u8* buf, size_t n, u64 offset) const {
    u32 iv0 = (u32(iv[0]) << 24) | (u32(iv[1]) << 16) | (u32(iv[2]) << 8)
            | iv[3];
    u32 iv1 = (u32(iv[4]) << 24) | (u32(iv[5]) << 16) | (u32(iv[6]) << 8)
            | iv[7];
    for (u64 i = offset / 16; i <= (offset + n) / 16; ++i) {
      u32 blk[4] = {iv0, iv1, u32(i >> 32), u32(i)};
      u8 ks[16];
      encrypt_block(blk, ks);
      for (int j = 0; j < 16; ++j) {
        i64 k = i64(i * 16 - offset) + j;
        if (k >= 0 && k < i64(n)) buf[k] ^= ks[j];
      }
    }
  }
};

extern "C" void tz_aes_ctr(const u8* key, int keylen, const u8* salt8,
                           u8* buf, size_t n, u64 offset) {
  AESCTR a;
  a.set_key(key, keylen, salt8);
  a.crypt(buf, n, offset);
}

// raw single-block encrypt for FIPS-197 test vectors
extern "C" void tz_aes_block(const u8* key, int keylen, const u8* in16,
                             u8* out16) {
  AESCTR a;
  u8 z[8] = {0};
  a.set_key(key, keylen, z);
  u32 blk[4];
  for (int c = 0; c < 4; ++c)
    blk[c] = (u32(in16[4 * c]) << 24) | (u32(in16[4 * c + 1]) << 16)
           | (u32(in16[4 * c + 2]) << 8) | in16[4 * c + 3];
  a.encrypt_block(blk, out16);
}

}  // extern "C" — paused: the suffix-array code below needs C++ linkage

// ---- suffix array (SA-IS, clean-room implementation of the standard
// induced-sorting algorithm) + BWT forward transform -----------------------
namespace {

template <typename T>
static void sais_core(const T* s, i32* sa, i32 n, i32 K, std::vector<i32>& bkt) {
  if (n == 0) return;
  if (n == 1) { sa[0] = 0; return; }
  std::vector<u8> stype(n, 0);                 // 1 = S-type (byte-wide:
  stype[n - 1] = 1;                            // vector<bool> bit ops cost
  for (i32 i = n - 2; i >= 0; --i)             // ~2x in the induce loops)
    stype[i] = s[i] < s[i + 1] || (s[i] == s[i + 1] && stype[i + 1]);
  auto is_lms = [&](i32 i) { return i > 0 && stype[i] && !stype[i - 1]; };
  // histogram once per level; bucket_ends is then O(K) per call instead of
  // re-scanning all n symbols (it is called 6x per level)
  std::vector<i32> counts(size_t(K) + 1, 0);
  for (i32 i = 0; i < n; ++i) ++counts[s[i]];
  auto bucket_ends = [&](bool tail) {
    bkt.assign(K + 1, 0);
    i32 sum = 0;
    for (i32 c = 0; c <= K; ++c) {
      sum += counts[c];
      bkt[c] = tail ? sum : sum - counts[c];
    }
  };
  auto induce = [&](const std::vector<i32>& lms) {
    std::fill(sa, sa + n, -1);
    bucket_ends(true);
    for (i32 k = i32(lms.size()) - 1; k >= 0; --k)
      sa[--bkt[s[lms[k]]]] = lms[k];
    bucket_ends(false);
    for (i32 i = 0; i < n; ++i) {
      i32 j = sa[i] - 1;
      if (j >= 0 && !stype[j]) sa[bkt[s[j]]++] = j;
    }
    bucket_ends(true);
    for (i32 i = n - 1; i >= 0; --i) {
      i32 j = sa[i] - 1;
      if (j >= 0 && stype[j]) sa[--bkt[s[j]]] = j;
    }
  };
  std::vector<i32> lms;
  for (i32 i = 1; i < n; ++i)
    if (is_lms(i)) lms.push_back(i);
  induce(lms);
  // name LMS substrings in sorted order
  i32 nlms = i32(lms.size());
  if (nlms > 0) {
    std::vector<i32> sorted_lms;
    sorted_lms.reserve(nlms);
    for (i32 i = 0; i < n; ++i)
      if (is_lms(sa[i])) sorted_lms.push_back(sa[i]);
    std::vector<i32> name(n, -1);
    i32 cur = 0;
    name[sorted_lms[0]] = 0;
    for (i32 k = 1; k < nlms; ++k) {
      i32 a = sorted_lms[k - 1], b = sorted_lms[k];
      bool diff = false;
      for (i32 d = 0;; ++d) {
        if (a + d >= n || b + d >= n
            || s[a + d] != s[b + d] || stype[a + d] != stype[b + d]) {
          diff = true; break;
        }
        if (d > 0 && (is_lms(a + d) || is_lms(b + d))) {
          diff = !(is_lms(a + d) && is_lms(b + d));
          break;
        }
      }
      if (diff) ++cur;
      name[sorted_lms[k]] = cur;
    }
    if (cur + 1 < nlms) {               // names not unique: recurse
      std::vector<i32> s1(nlms);
      i32 j = 0;
      for (i32 i = 0; i < n; ++i)
        if (name[i] >= 0) s1[j++] = name[i];
      std::vector<i32> sa1(nlms);
      sais_core(s1.data(), sa1.data(), nlms, cur, bkt);
      std::vector<i32> ordered(nlms);
      for (i32 k = 0; k < nlms; ++k) ordered[k] = lms[sa1[k]];
      induce(ordered);
    } else {
      induce(sorted_lms);
    }
  }
}

}  // namespace

// sais_core requires s[n-1] to be a unique smallest sentinel (the standard
// SA-IS invariant, maintained recursively by LMS naming). The public entry
// appends an explicit 0 sentinel with the alphabet shifted up by one.
static void sais_u8(const u8* s, i32* sa, i32 n) {
  // u16 shifted copy (s[i]+1, sentinel 0): 255+1 does not fit u8, and the
  // previous i32 copy cost 4x the memory traffic of the top-level pass
  std::vector<u16> t(size_t(n) + 1);
  for (i32 i = 0; i < n; ++i) t[i] = u16(s[i]) + 1;
  t[n] = 0;
  std::vector<i32> sa2(size_t(n) + 1);
  std::vector<i32> bkt;
  sais_core(t.data(), sa2.data(), n + 1, 256, bkt);
  for (i32 i = 0; i < n; ++i) sa[i] = sa2[i + 1];
}

// BWT in the reference stream layout (libzpaq.cpp:6317-6327 fill level 3):
// out[0] = in[n-1]; out[i] = in[sa[i-1]-1] or 255 at the sentinel row; then
// the sentinel row index as 4 LSB-first bytes. Output length n+5.
extern "C" size_t tz_bwt_encode(const u8* in, size_t n, u8* out, size_t cap) {
  if (cap < n + 5) return n + 5;
  std::vector<i32> sa(n);
  sais_u8(in, sa.data(), i32(n));
  u32 idx = 0;
  out[0] = n ? in[n - 1] : 255;
  for (size_t i = 1; i <= n; ++i) {
    if (sa[i - 1] == 0) { idx = u32(i); out[i] = 255; }
    else out[i] = in[sa[i - 1] - 1];
  }
  for (int k = 0; k < 4; ++k) out[n + 1 + k] = u8(idx >> (8 * k));
  return n + 5;
}

extern "C" {  // resume C ABI

// LZ77 encoder for both reference stream formats (libzpaq.cpp:6211-6222):
//
// fmt=2, byte-aligned ("level 2"):
//   00xxxxxx                      x+1 (1..64) literal bytes follow
//   yyxxxxxx off[y+1] (y=1..3)    match length x+minMatch, offset bytes
//                                 MSB-first, encoded offset = off-1
//
// fmt=1, bit-packed ("level 1", the -m1 fast path): variable-length codes
// packed LSB-first into bytes (libzpaq.cpp putb, 6172-6180):
//   00,gamma(lit),L[lit*8]        literal run (interleaved Elias gamma:
//                                 leading 1 implied, each further bit
//                                 preceded by a 1 flag, terminated by 0)
//   mm,mmm,gamma(len>>2),len&3,r[rb],q[lo]
//                                 match: lo = 8*mm+mmm-8 (0..23), encoded
//                                 offset off' = off + (1<<rb) - 1 written
//                                 as low rb bits (r) then off'>>rb in lo
//                                 bits with an implied leading 1 (q)
//
// Match finding: greedy hash-chain search over 4-byte contexts with a
// documented-compatible score (len*8 - lg(dist) - small constants). The
// format is exact (the stored PCOMP program must invert it); the parse is
// our own and only affects ratio.
static int ilog2(u32 x) {
  int r = 0;
  while (x > 1) { x >>= 1; ++r; }
  return r;
}

// floor(log2(x)) + 1, the reference's lg() (libzpaq.cpp:6233-6243)
static int lg32(u32 x) { return x ? ilog2(x) + 1 : 0; }

static size_t lz77_core(const u8* in, size_t n, int fmt, int min_match,
                        int depth_log, int hash_bits, int rb,
                        u8* out, size_t cap) {
  if (fmt == 1 && min_match < 4) min_match = 4;  // format needs len >= 4
  // Match finder: K-way bucketed hash table, one u64 per candidate =
  // (first 4 bytes as a tag << 32 | position). Tags make failed probes
  // touch ONLY the row's 1-2 cache lines, never the input: scattered
  // in[cand] reads are the dominant cost on TLB-hostile hosts (this
  // sandboxed VM swings 18 vs 1700 MB/s purely on input page state).
  // Unlike per-position chains (4 B x input, re-faulted every call),
  // the table is a few MB and cache-resident.
  const int K = depth_log <= 1 ? 2 : (depth_log >= 4 ? 16 : 1 << depth_log);
  int hb = hash_bits - depth_log;            // keep table ~= chain depth
  if (hb < 12) hb = 12;
  if (hb > 17) hb = 17;                      // cap table at 16*8*2^17 = 16 MB
  const u32 rows = u32(1) << hb;
  static thread_local u64* tab = nullptr;    // rows*K (tag,pos) entries
  static thread_local size_t tab_cap = 0;
  if (tab_cap < size_t(rows) * K) {
    free(tab);
    tab = nullptr;
    tab_cap = 0;
    size_t want = size_t(rows) * K;
    // 2 MiB alignment is a hugepage optimization only; fall back to plain
    // malloc if the platform rejects it or is out of aligned memory.
    tab = (u64*)aligned_alloc(2u << 20, (want * 8 + (2u << 20) - 1)
                                        & ~size_t((2u << 20) - 1));
    if (tab) {
#ifdef __linux__
      madvise(tab, want * 8, MADV_HUGEPAGE);
#endif
    } else {
      tab = (u64*)malloc(want * 8);
    }
    if (!tab) {
      // OOM: emit a format-valid all-literals stream so the caller's
      // store-vs-LZ size test kicks in. fmt=2: runs of <=64 bytes with a
      // len-1 header. fmt=1: one gamma-coded literal run, bit-packed.
      size_t w = 0;
      if (fmt == 2) {
        for (size_t i0 = 0; i0 < n;) {
          size_t l1 = n - i0 > 64 ? 64 : n - i0;
          if (w < cap) out[w] = u8(l1 - 1);
          ++w;
          for (size_t j = 0; j < l1; ++j, ++w)
            if (w < cap) out[w] = in[i0 + j];
          i0 += l1;
        }
      } else if (n) {
        u64 bits = 0;
        int nb = 0;
        auto pb = [&](u32 x, int k) {
          bits |= u64(x & ((1u << k) - 1)) << nb;
          nb += k;
          while (nb > 7) {
            if (w < cap) out[w] = u8(bits);
            ++w; bits >>= 8; nb -= 8;
          }
        };
        pb(0, 2);
        int ll = lg32(u32(n)) - 1;
        while (--ll >= 0) { pb(1, 1); pb((u32(n) >> ll) & 1, 1); }
        pb(0, 1);
        for (size_t j = 0; j < n; ++j) pb(in[j], 8);
        if (nb > 0) { if (w < cap) out[w] = u8(bits); ++w; }
      }
      return w;
    }
    tab_cap = want;
  }
  // pos field 0xFFFFFFFF = empty (input blocks are < 4 GiB by format)
  memset(tab, 0xFF, size_t(rows) * K * 8);
  size_t w = 0;                 // write pos
  auto put = [&](u8 c) { if (w < cap) out[w] = c; ++w; };
  // fmt=1 bit packer (reference putb semantics: LSB-first within bytes)
  u64 bbits = 0;
  int bnb = 0;
  auto putb = [&](u32 x, int k) {
    bbits |= u64(k >= 32 ? x : (x & ((1u << k) - 1))) << bnb;
    bnb += k;
    while (bnb > 7) { put(u8(bbits)); bbits >>= 8; bnb -= 8; }
  };
  auto read4 = [&](size_t i) -> u32 {
    u32 x; memcpy(&x, in + i, 4); return x;
  };
  auto hash4v = [&](u32 x) -> u32 { return (x * 2654435761u) >> (32 - hb); };
  size_t i = 0, lit_start = 0;
  auto flush_literals = [&](size_t upto) {
    size_t lit = upto - lit_start;
    if (fmt == 1) {
      // 00, interleaved gamma of lit, then lit raw bytes (reference
      // write_literal level 1, libzpaq.cpp:6466-6478)
      if (lit >= 1) {
        putb(0, 2);
        int ll = lg32(u32(lit)) - 1;
        while (--ll >= 0) { putb(1, 1); putb((u32(lit) >> ll) & 1, 1); }
        putb(0, 1);
        for (size_t j = upto - lit; j < upto; ++j) putb(in[j], 8);
      }
    } else {
      while (lit > 0) {
        size_t l1 = lit > 64 ? 64 : lit;
        put(u8(l1 - 1));
        for (size_t j = upto - lit; j < upto - lit + l1; ++j) put(in[j]);
        lit -= l1;
      }
    }
    lit_start = upto;
  };
  auto emit_match = [&](size_t len, size_t off) {
    if (fmt == 1) {
      // mm,mmm,gamma(len>>2),len&3,r,q (reference write_match level 1,
      // libzpaq.cpp:6494-6516); len >= 4 guaranteed by min_match
      int ll = lg32(u32(len)) - 1;
      off += (size_t(1) << rb) - 1;
      int lo = lg32(u32(off)) - 1 - rb;
      putb(u32(lo + 8) >> 3, 2);            // mm
      putb(u32(lo) & 7, 3);                 // mmm
      while (--ll >= 2) { putb(1, 1); putb((u32(len) >> ll) & 1, 1); }
      putb(0, 1);
      putb(u32(len) & 3, 2);                // ll
      putb(u32(off), rb);                   // r (low rb bits)
      putb(u32(off >> rb), lo);             // q (implied leading 1)
      return;
    }
    --off;
    while (len > 0) {
      size_t mm = size_t(min_match);
      size_t len1 = len > mm * 2 + 63 ? mm + 63
                  : len > mm + 63 ? len - mm : len;
      if (off < (1u << 16)) {
        put(u8(64 + len1 - mm)); put(u8(off >> 8)); put(u8(off));
      } else if (off < (1u << 24)) {
        put(u8(128 + len1 - mm)); put(u8(off >> 16)); put(u8(off >> 8));
        put(u8(off));
      } else {
        put(u8(192 + len1 - mm)); put(u8(off >> 24)); put(u8(off >> 16));
        put(u8(off >> 8)); put(u8(off));
      }
      len -= len1;
    }
  };
  // word-wide match extension (little-endian load + ctz on the xor)
  auto match_len = [&](size_t cand, size_t pos) -> size_t {
    size_t lim = n - pos;
    if (lim > 65536) lim = 65536;   // ~reference maxMatch (BUFSIZE*3)
    size_t l = 0;
    while (l + 8 <= lim) {
      uint64_t a, b;
      memcpy(&a, in + cand + l, 8);
      memcpy(&b, in + pos + l, 8);
      uint64_t x = a ^ b;
      if (x) return l + (__builtin_ctzll(x) >> 3);
      l += 8;
    }
    while (l < lim && in[cand + l] == in[pos + l]) ++l;
    return l;
  };
  auto insert = [&](size_t pos) {
    u32 v4 = read4(pos);
    u64* row = &tab[size_t(hash4v(v4)) * K];
    // round-robin slot keyed off the position itself: cheap, and spreads
    // repeated hashes across the bucket so recent AND older offsets survive
    row[(pos >> 1) & (K - 1)] = (u64(v4) << 32) | u32(pos);
  };
  while (i < n) {
    size_t blen = 0, boff = 0;
    int bscore = 0;
    if (i + 4 <= n) {
      u32 first4 = read4(i);
      u64* row = &tab[size_t(hash4v(first4)) * K];
      for (int k = 0; k < K; ++k) {
        u64 e = row[k];
        u32 p = u32(e);
        if (u32(e >> 32) != first4 || size_t(p) >= i) continue;
        size_t cand = p;
        {
          size_t l = match_len(cand, i);
          size_t off = i - cand;
          // fmt=1 cannot code offsets >= 2^(24+rb) (lo caps at 23,
          // libzpaq.cpp:6505); such candidates only appear if the caller
          // passes an rb smaller than the block size calls for
          if (fmt == 1
              && off > (size_t(1) << (24 + rb)) - (size_t(1) << rb))
            continue;
          // fmt=2 pays 1-2 extra offset bytes at 64K/16M (reference gating
          // libzpaq.cpp:6417); fmt=1 costs scale smoothly with lg(off),
          // which the score already charges
          int extra = fmt == 2
              ? (off >= (1u << 16)) + (off >= (1u << 24)) : 0;
          if (l >= size_t(min_match + extra)) {
            int score = int(l) * 8 - ilog2(u32(off)) - 11
                        - 2 * (i > lit_start);
            if (score > bscore) { bscore = score; blen = l; boff = off; }
          }
        }
        if (blen >= 1024) break;   // good enough; stop probing
      }
    }
    if (blen) {
      flush_literals(i);
      emit_match(blen, boff);
      size_t stop = i + blen;
      // sparse insertion inside long matches: O(len) insertions add
      // nothing for dedup-style data but dominate runtime
      size_t istep = blen > 64 ? blen / 32 : 1;
      for (size_t j = i; j + 4 <= n && j < stop; j += istep) insert(j);
      i = stop;
      lit_start = i;
    } else {
      if (i + 4 <= n) insert(i);
      // skip-ahead acceleration: grow the stride while no matches are
      // found (incompressible regions), LZ4-style. The stride must never
      // reset mid-run: on hash tables saturated by earlier (unrelated)
      // data, every probe is ~`depth` cache misses, so random payloads
      // would otherwise crawl at single-digit MB/s. Within a skipped
      // span, resync on CONTENT-DEFINED anchors (~1/64 positions by the
      // hash's top bits): two copies of the same data pick the same
      // anchor positions regardless of stride phase, so long-range
      // duplicates after an incompressible stretch are still found
      // (blind striding almost never lands on an inserted offset).
      size_t run = i - lit_start;
      size_t stride = 1 + (run >> 6);
      if (stride > 1 && i + 5 <= n) {
        size_t lim = i + stride;
        if (lim + 4 > n) lim = n - 4;
        // anchor hash MUST be decorrelated from the row hash (different
        // multiplier): with the same one, every anchor lands in the same
        // 1/64 of rows and they evict each other
        size_t j = i + 1;
        for (; j < lim; ++j)
          if ((read4(j) * 2246822519u) >> 26 == 0) break;  // 1/64 anchor
        i = j;
      } else {
        i += stride;
      }
    }
  }
  if (lit_start < n) flush_literals(n);
  if (fmt == 1 && bnb > 0) put(u8(bbits));   // reference flush(): pad final
  return w;   // bytes needed; caller re-calls with a bigger cap if > cap
}

// Scored LZ77 parse for the high-ratio settings: secondary context order
// (N4) searched first, lookahead (N7) that lets the first bytes of a match
// be coded as literals, and a suffix-array search mode (N6 == N1+21).
// Algorithm per the documented semantics (libzpaq.h:154-175) and the
// reference parse (libzpaq.cpp:6330-6448): candidates are scored
// 8*(match bytes) - lg(offset) - literal-break penalties, the best
// positive score wins, SA candidates decay 5/8 per lookahead step.
// Stream formats are identical to lz77_core (fmt 1 packed / 2 byte).
static size_t lz77_scored_core(const u8* in, size_t n, int fmt,
                               int min_match, int min_match2, int lookahead,
                               int depth_log, int hash_bits, int use_sa,
                               int rb, u8* out, size_t cap) {
  if (fmt == 1 && min_match < 4) min_match = 4;
  if (min_match < 1) min_match = 1;
  const size_t max_match = size_t(1) << 16;
  // ---- emitters (same stream formats as lz77_core) ----
  size_t w = 0;
  auto put = [&](u8 c) { if (w < cap) out[w] = c; ++w; };
  u64 bbits = 0;
  int bnb = 0;
  auto putb = [&](u32 x, int k) {
    bbits |= u64(k >= 32 ? x : (x & ((1u << k) - 1))) << bnb;
    bnb += k;
    while (bnb > 7) { put(u8(bbits)); bbits >>= 8; bnb -= 8; }
  };
  size_t lit_start = 0;
  auto flush_literals = [&](size_t upto) {
    size_t lit = upto - lit_start;
    if (fmt == 1) {
      if (lit >= 1) {
        putb(0, 2);
        int ll = lg32(u32(lit)) - 1;
        while (--ll >= 0) { putb(1, 1); putb((u32(lit) >> ll) & 1, 1); }
        putb(0, 1);
        for (size_t j = upto - lit; j < upto; ++j) putb(in[j], 8);
      }
    } else {
      while (lit > 0) {
        size_t l1 = lit > 64 ? 64 : lit;
        put(u8(l1 - 1));
        for (size_t j = upto - lit; j < upto - lit + l1; ++j) put(in[j]);
        lit -= l1;
      }
    }
    lit_start = upto;
  };
  auto emit_match = [&](size_t len, size_t off) {
    if (fmt == 1) {
      int ll = lg32(u32(len)) - 1;
      off += (size_t(1) << rb) - 1;
      int lo = lg32(u32(off)) - 1 - rb;
      putb(u32(lo + 8) >> 3, 2);
      putb(u32(lo) & 7, 3);
      while (--ll >= 2) { putb(1, 1); putb((u32(len) >> ll) & 1, 1); }
      putb(0, 1);
      putb(u32(len) & 3, 2);
      putb(u32(off), rb);
      putb(u32(off >> rb), lo);
      return;
    }
    --off;
    while (len > 0) {
      size_t mm = size_t(min_match);
      size_t len1 = len > mm * 2 + 63 ? mm + 63
                  : len > mm + 63 ? len - mm : len;
      if (off < (1u << 16)) {
        put(u8(64 + len1 - mm)); put(u8(off >> 8)); put(u8(off));
      } else if (off < (1u << 24)) {
        put(u8(128 + len1 - mm)); put(u8(off >> 16)); put(u8(off >> 8));
        put(u8(off));
      } else {
        put(u8(192 + len1 - mm)); put(u8(off >> 24)); put(u8(off >> 16));
        put(u8(off >> 8)); put(u8(off));
      }
      len -= len1;
    }
  };
  auto fwd_len = [&](size_t p, size_t i, size_t from) -> size_t {
    size_t lim = n - i;
    if (lim > max_match) lim = max_match;
    size_t l = from;
    while (l + 8 <= lim) {
      uint64_t a, b;
      memcpy(&a, in + p + l, 8);
      memcpy(&b, in + i + l, 8);
      uint64_t x = a ^ b;
      if (x) return l + (__builtin_ctzll(x) >> 3);
      l += 8;
    }
    while (l < lim && in[p + l] == in[i + l]) ++l;
    return l;
  };
  const int bucket = depth_log > 0 ? (1 << depth_log) : 1;
  size_t i = 0;
  size_t lit = 0;  // pending literal count (scoring cares if nonzero)

  if (use_sa == 2) {
    // ---- chain mode: head/prev linked candidate lists, newest-first ----
    // The -m2-class finder: candidate quality approaches the suffix-array
    // mode (chains enumerate ALL prior positions with the same 4-byte
    // prefix, closest first — exactly the order the score prefers) at
    // hash-table build cost instead of an O(n log n) suffix sort. The
    // reference reaches its -m2 speed with divsufsort (libzpaq.cpp:6304);
    // ours replaces the sort with chains — stream format is identical,
    // boundaries are an encoder choice.
    int hb = hash_bits;
    if (hb < 15) hb = 15;
    if (hb > 27) hb = 27;
    // head tables are 4<<hb bytes each regardless of input size: clamp to
    // ~2 slots per position so small blocks do not pay 64 MB of memset
    while (hb > 15 && (size_t(1) << hb) > 2 * n) --hb;
    const int depth = depth_log > 0 ? (1 << depth_log) : 32;
    static thread_local u32* chead = nullptr;
    static thread_local u32* cprev = nullptr;
    static thread_local size_t chead_cap = 0, cprev_cap = 0;
    const size_t want_head = size_t(1) << hb;
    if (chead_cap < want_head) {
      free(chead);
      chead = (u32*)malloc(want_head * 4);
      chead_cap = chead ? want_head : 0;
    }
    if (cprev_cap < n) {
      free(cprev);
      cprev = (u32*)malloc(n * 4);
      cprev_cap = cprev ? n : 0;
    }
    if (!chead_cap || !cprev_cap) {      // OOM: all-literals stays valid
      flush_literals(n);
      if (fmt == 1 && bnb > 0) put(u8(bbits));
      return w;
    }
    // second chain over 12-byte prefixes: on word-structured text the
    // 4-byte chains saturate with short-prefix hits and `depth` probes
    // never reach the long match; 12 bytes of shared prefix thins each
    // bucket to candidates that all extend far, so a few probes find
    // SA-class matches
    static thread_local u32* chead12 = nullptr;
    static thread_local u32* cprev12 = nullptr;
    static thread_local size_t chead12_cap = 0, cprev12_cap = 0;
    if (chead12_cap < want_head) {
      free(chead12);
      chead12 = (u32*)malloc(want_head * 4);
      chead12_cap = chead12 ? want_head : 0;
    }
    if (cprev12_cap < n) {
      free(cprev12);
      cprev12 = (u32*)malloc(n * 4);
      cprev12_cap = cprev12 ? n : 0;
    }
    if (!chead12_cap || !cprev12_cap) {
      flush_literals(n);
      if (fmt == 1 && bnb > 0) put(u8(bbits));
      return w;
    }
    memset(chead, 0xFF, want_head * 4);  // 0xFFFFFFFF = empty (>= any i)
    memset(chead12, 0xFF, want_head * 4);
    auto h4 = [&](size_t p) {
      u32 v;
      memcpy(&v, in + p, 4);
      return (v * 2654435761u) >> (32 - hb);
    };
    auto h12 = [&](size_t p) {
      u64 a, b;
      memcpy(&a, in + p, 8);
      memcpy(&b, in + p + 4, 8);       // bytes 4..11
      return u32(((a * 0x9E3779B97F4A7C15ULL)
                  ^ (b * 0xC2B2AE3D27D4EB4FULL)) >> (64 - hb));
    };
    auto cinsert = [&](size_t p) {
      u32 h = h4(p);
      cprev[p] = chead[h];
      chead[h] = u32(p);
      if (p + 12 <= n) {
        u32 g = h12(p);
        cprev12[p] = chead12[g];
        chead12[g] = u32(p);
      }
    };
    const size_t maxoff = fmt == 1
        ? (size_t(1) << (24 + rb)) - (size_t(1) << rb) : ~size_t(0);
    auto probe = [&](size_t at, size_t& blen, size_t& bp) -> int {
      int bscore = 0;
      blen = 0;
      bp = 0;
      if (at + 4 > n) return 0;
      if (at + 12 <= n) {
        u32 p = chead12[h12(at)];
        for (int k = 0; k < depth; ++k) {
          if (p == 0xFFFFFFFFu || size_t(p) >= at) break;
          if (at - p > maxoff) break;
          if (blen == 0 || (at + blen < n && in[p + blen] == in[at + blen])) {
            size_t l = fwd_len(p, at, 0);
            int score = int(l) * 8 - lg32(u32(at - p)) - 2 * (lit > 0) - 11;
            if (l >= size_t(min_match) && score > bscore) {
              bscore = score; blen = l; bp = p;
              if (blen >= 1024) break;
            }
          }
          p = cprev12[p];
        }
        // a 24+ byte match from the long-prefix chain is near-certainly
        // the parse winner; the h4 chain could only trade distance
        // (r5: threshold 64 -> 24 measured size-neutral on the golden
        // corpus while skipping ~30% of h4 probe work on text)
        if (blen >= 24) return bscore;
      }
      u32 p = chead[h4(at)];
      for (int k = 0; k < depth; ++k) {
        if (p == 0xFFFFFFFFu || size_t(p) >= at) break;
        if (at - p > maxoff) break;      // chains are newest-first: done
        // extend-best reject: to beat blen the candidate must match at
        // byte blen too (p+blen < at+blen <= n; when at+blen == n nothing
        // can beat blen, so the bounds check doubles as the early-out)
        if (blen == 0 || (at + blen < n && in[p + blen] == in[at + blen])) {
          size_t l = fwd_len(p, at, 0);
          int score = int(l) * 8 - lg32(u32(at - p)) - 2 * (lit > 0) - 11;
          if (l >= size_t(min_match) && score > bscore) {
            bscore = score; blen = l; bp = p;
            if (blen >= 1024) break;     // good enough; stop probing
          }
        }
        p = cprev[p];
      }
      return bscore;
    };
    while (i < n) {
      size_t blen, bp;
      int bscore = probe(i, blen, bp);
      // one-step lazy parse: if deferring the match one byte buys a
      // better-scoring one (8 = the cost of the literal it spends), code
      // this position as a literal instead (the reference's lookahead
      // analog for the hash finders; the SA mode scores lookahead
      // explicitly with its 5/8 decay). Only short matches are worth the
      // second probe: >=32 the defer can't pay for its literal (measured
      // size delta < 0.05%, probe count -25%).
      if (bscore > 0 && blen < 32 && i + 1 < n) {
        size_t blen1, bp1;
        int bscore1 = probe(i + 1, blen1, bp1);
        if (bscore1 > bscore + 8) {
          if (i + 4 <= n) cinsert(i);
          ++i;
          ++lit;
          continue;
        }
        // fall through: emit the match at i
      }
      size_t off = i - bp;
      int extra = fmt == 2
          ? (off >= (1u << 16)) + (off >= (1u << 24)) : 0;
      if (blen >= size_t(min_match + extra) && bscore > 0) {
        flush_literals(i);
        emit_match(blen, off);
        size_t stop = i + blen;
        // insert the full match body up to a cap, then go sparse: chains
        // need dense coverage for row-structured data (CSV-like), but
        // O(len) insertions on dedup-style multi-MB matches buy nothing
        size_t dense = blen > 512 ? 512 : blen;
        for (size_t j = i; j + 4 <= n && j < i + dense; ++j) cinsert(j);
        size_t istep = blen > 64 ? blen / 32 : 1;
        for (size_t j = i + dense; j + 4 <= n && j < stop; j += istep)
          cinsert(j);
        i = stop;
        lit_start = i;
        lit = 0;
      } else {
        if (i + 4 <= n) cinsert(i);
        // literal-run skip-ahead with content-defined resync anchors
        // (identical scheme to lz77_core: stride grows over unmatched
        // runs; anchors keep long-range duplicates discoverable)
        size_t run = i - lit_start;
        size_t stride = 1 + (run >> 6);
        if (stride > 1 && i + 5 <= n) {
          size_t limp = i + stride;
          if (limp + 4 > n) limp = n - 4;
          size_t j = i + 1;
          for (; j < limp; ++j) {
            u32 v;
            memcpy(&v, in + j, 4);
            if ((v * 2246822519u) >> 26 == 0) break;   // 1/64 anchor
          }
          lit += j - i;
          i = j;
        } else {
          i += stride;
          lit += stride;
        }
      }
    }
  } else if (use_sa) {
    // ---- suffix-array mode: exact longest/closest candidates ----
    static thread_local i32* sa_buf = nullptr;
    static thread_local u32* isa_buf = nullptr;
    static thread_local size_t sa_cap = 0;
    if (sa_cap < n) {
      free(sa_buf); free(isa_buf);
      sa_buf = (i32*)malloc(n * 4);
      isa_buf = (u32*)malloc(n * 4);
      sa_cap = (sa_buf && isa_buf) ? n : 0;
      if (!sa_cap) {  // OOM: all-literals fallback keeps the stream valid
        flush_literals(0);
        lit_start = 0;
        flush_literals(n);
        if (fmt == 1 && bnb > 0) put(u8(bbits));
        return w;
      }
    }
    if (n) sais_u8(in, sa_buf, (i32)n);
    for (size_t j = 0; j < n; ++j) isa_buf[sa_buf[j]] = (u32)j;
    while (i < n) {
      size_t blen = 0, bp = 0, blit = 0;
      int bscore = 0;
      for (int h = 0; h <= lookahead && i + h < n; ++h) {
        size_t q = isa_buf[i + h];
        for (int dir = -1; dir <= 1; dir += 2) {
          for (int k = 1; k <= bucket; ++k) {
            i64 qq = i64(q) + i64(dir) * k;
            if (qq < 0 || qq >= i64(n)) break;
            i64 ps = i64(sa_buf[qq]) - h;
            if (ps < 0 || size_t(ps) >= i) continue;
            size_t p = size_t(ps);
            size_t l = fwd_len(p, i, h);
            size_t l1 = h;
            while (l1 > 0 && in[p + l1 - 1] == in[i + l1 - 1]) --l1;
            int score = int(l - l1) * 8 - lg32(u32(i - p))
                        - 4 * (lit == 0 && l1 > 0) - 11;
            for (int a = 0; a < h; ++a) score = score * 5 / 8;
            if (score > bscore) { blen = l; bp = p; blit = l1;
                                  bscore = score; }
            if (l < blen || l < size_t(min_match) || l > 255) break;
          }
        }
        if (bscore <= 0 || blen < size_t(min_match)) break;
      }
      size_t off = i - bp;
      int extra = fmt == 2
          ? (off >= (1u << 16)) + (off >= (1u << 24)) : 0;
      bool off_ok = fmt != 1
          || off <= (size_t(1) << (24 + rb)) - (size_t(1) << rb);
      if (off > 0 && bscore > 0 && off_ok
          && blen - blit >= size_t(min_match + extra)) {
        flush_literals(i + blit);
        emit_match(blen - blit, off);
        i += blen;
        lit_start = i;
        lit = 0;
      } else {
        ++i;
        ++lit;
      }
    }
  } else {
    // ---- hash mode with secondary context + lookahead ----
    // Contiguous tagged buckets: each hash row is `bucket` consecutive u32
    // slots (entry = pos<<8 | content tag byte), so a whole bucket probe
    // touches 1-4 cache lines instead of `bucket` scattered lines, and the
    // tag rejects non-matches without touching the window. The rolling
    // order-N context hashes keep the reference's recurrence shape
    // (libzpaq.cpp:6436-6443) — which positions collide is a quality knob,
    // not a format property.
    int hb = hash_bits;
    if (hb < 12) hb = 12;
    if (hb > 27) hb = 27;
    int dl = 0;
    while ((1 << dl) < bucket && dl < 6) ++dl;   // slots/row, max 64
    const u32 B = u32(1) << dl;
    const u32 rows_mask = (u32(1) << (hb - dl)) - 1;
    const int tagoff = min_match >= 4 ? 3 : min_match - 1;
    // entry = pos << ts | tag: shrink the tag for big blocks so the
    // position always fits (ts=0 disables tagging past 256 MiB)
    const int ts = n <= (size_t(1) << 24) ? 8
                 : n <= (size_t(1) << 28) ? 4 : 0;
    const u32 tmask = (u32(1) << ts) - 1;
    static thread_local u32* ht1 = nullptr;
    static thread_local u32* ht2 = nullptr;
    static thread_local size_t ht_cap = 0;
    size_t want = size_t(1) << hb;
    if (ht_cap < want) {
      free(ht1); free(ht2);
      ht1 = (u32*)malloc(want * 4);
      ht2 = (u32*)malloc(want * 4);
      ht_cap = (ht1 && ht2) ? want : 0;
      if (!ht_cap) {
        flush_literals(n);
        if (fmt == 1 && bnb > 0) put(u8(bbits));
        return w;
      }
    }
    // 0xFFFFFFFF = empty: decodes to p=0xFFFFFF which can never pass p<i
    memset(ht1, 0xFF, want * 4);
    if (min_match2) memset(ht2, 0xFF, want * 4);
    const int shift1 = min_match > 0 ? (hb - 1) / min_match + 1 : 1;
    const int shift2 = min_match2 > 0 ? (hb - 1) / min_match2 + 1 : 0;
    u32 h1 = 0, h2 = 0;
    const int mmboth = (min_match > min_match2 + lookahead
                        ? min_match : min_match2 + lookahead) + 4;
    while (i < n) {
      size_t blen = size_t(min_match) - 1, bp = 0, blit = 0;
      int bscore = 0;
      bool found = false;
      const u32 want_tag = (i + tagoff < n ? in[i + tagoff] : 0) & tmask;
      if (min_match2 > 0) {
        const u32* row = ht2 + (size_t(h2 & rows_mask) << dl);
        for (u32 k = 0; k < B; ++k) {
          u32 e = row[k];
          if ((e & tmask) != want_tag) continue;
          size_t p = e >> ts;
          if (p >= i) continue;
          // cheap reject: the byte that would extend the current best
          if (i + blen >= n || in[p + blen - 1] != in[i + blen - 1])
            continue;
          size_t l = fwd_len(p, i, size_t(lookahead));
          if (l >= size_t(min_match2 + lookahead)) {
            size_t l1 = size_t(lookahead);
            while (l1 > 0 && in[p + l1 - 1] == in[i + l1 - 1]) --l1;
            int score = int(l - l1) * 8 - lg32(u32(i - p))
                        - 8 * (lit == 0 && l1 > 0) - 11;
            if (score > bscore) { blen = l; bp = p; blit = l1;
                                  bscore = score; found = true; }
          }
          if (blen >= 128) break;
        }
      }
      if (!min_match2 || blen < size_t(min_match2)) {
        const u32* row = ht1 + (size_t(h1 & rows_mask) << dl);
        for (u32 k = 0; k < B; ++k) {
          u32 e = row[k];
          if ((e & tmask) != want_tag) continue;
          size_t p = e >> ts;
          if (p >= i) continue;
          if (i + blen >= n || in[p + blen - 1] != in[i + blen - 1])
            continue;
          size_t l = fwd_len(p, i, 0);
          int score = int(l) * 8 - lg32(u32(i - p)) - 2 * (lit > 0) - 11;
          if (score > bscore) { blen = l; bp = p; blit = 0;
                                bscore = score; found = true; }
          if (blen >= 128) break;
        }
      }
      size_t off = i - bp;
      int extra = fmt == 2
          ? (off >= (1u << 16)) + (off >= (1u << 24)) : 0;
      bool off_ok = fmt != 1
          || off <= (size_t(1) << (24 + rb)) - (size_t(1) << rb);
      size_t adv;
      bool matched = found && off > 0 && bscore > 0 && off_ok
          && blen - blit >= size_t(min_match + extra);
      if (matched) {
        flush_literals(i + blit);
        emit_match(blen - blit, off);
        adv = blen;
        lit = 0;
      } else {
        adv = 1;
        ++lit;
      }
      // insert every covered position and roll the context hashes
      // (the reference's while(blen--) maintenance loop)
      for (size_t j = 0; j < adv; ++j, ++i) {
        if (i + mmboth < n) {
          u32 slot = u32((i * 1234547u) >> 19) & (B - 1);
          u32 e = (u32(i) << ts) | (in[i + tagoff] & tmask);
          if (min_match2) {
            ht2[(size_t(h2 & rows_mask) << dl) + slot] = e;
            h2 = ((h2 * 9) << shift2)
                 + (u32(in[i + min_match2 + lookahead]) + 1) * 23456789u;
          }
          ht1[(size_t(h1 & rows_mask) << dl) + slot] = e;
          h1 = ((h1 * 5) << shift1)
               + (u32(in[i + min_match]) + 1) * 123456791u;
        }
      }
      if (matched) lit_start = i;
    }
  }
  if (lit_start < n) flush_literals(n);
  if (fmt == 1 && bnb > 0) put(u8(bbits));
  return w;
}

size_t tz_lz77_parse(const u8* in, size_t n, int fmt, int min_match,
                     int min_match2, int lookahead, int depth_log,
                     int hash_bits, int use_sa, int rb,
                     u8* out, size_t cap) {
  return lz77_scored_core(in, n, fmt, min_match, min_match2, lookahead,
                          depth_log, hash_bits, use_sa, rb, out, cap);
}

size_t tz_lz77_encode(const u8* in, size_t n, int min_match, int depth_log,
                      int hash_bits, u8* out, size_t cap) {
  return lz77_core(in, n, 2, min_match, depth_log, hash_bits, 0, out, cap);
}

// Packed (bit-level) LZ77, the reference's N2=1 stream. rb = extra low
// offset bits = max(0, log2(blocksize) - 24) (libzpaq.cpp:6284).
size_t tz_lz77p_encode(const u8* in, size_t n, int min_match, int depth_log,
                       int hash_bits, int rb, u8* out, size_t cap) {
  return lz77_core(in, n, 1, min_match, depth_log, hash_bits, rb, out, cap);
}

// Native inverse of the packed LZ77 stream (the decode-side truth is the
// stored ZPAQL pcomp; this twin exists as the recognized-pcomp fast path
// and as the encoder's test oracle). Trailing pad bits (at most 7 zero
// bits, reference flush()) can never complete a code, so any short read
// terminates cleanly.
size_t tz_lz77p_decode(const u8* in, size_t n, int rb, u8* out, size_t cap) {
  const size_t total = n * 8;
  size_t bitpos = 0, w = 0;
  // 64-bit accumulator bit reader (the callers bound every read with
  // bitpos checks against total, so past-the-end refills feed zeros that
  // are never interpreted)
  size_t pos = 0;
  u64 acc = 0;
  int nbits = 0;
  auto getb = [&](int k) -> u32 {
    while (nbits < k) {
      acc |= u64(pos < n ? in[pos++] : 0) << nbits;
      nbits += 8;
    }
    u32 x = u32(acc & ((u64(1) << k) - 1));
    acc >>= k;
    nbits -= k;
    bitpos += k;
    return x;
  };
  for (;;) {
    if (bitpos + 2 > total) break;
    u32 mm = getb(2);
    u32 lo = 0;
    if (mm) {
      if (bitpos + 3 > total) break;
      lo = mm * 8 + getb(3) - 8;
    }
    u32 v = 1;  // interleaved gamma with implied leading 1
    for (;;) {
      if (bitpos >= total) return w;
      if (!getb(1)) break;
      if (bitpos >= total) return w;
      v = (v << 1) | getb(1);
    }
    if (mm == 0) {                      // literal run of v bytes
      if (bitpos + size_t(v) * 8 > total) return w;
      if (!out) {                       // sizing pass: skip the payload
        size_t k = size_t(v) * 8;
        bitpos += k;
        if (size_t(nbits) >= k) {
          acc >>= k;
          nbits -= int(k);
        } else {
          k -= nbits;
          acc = 0;
          nbits = 0;
          pos += k >> 3;
          if (k & 7) {                  // partial byte: refill and shift
            acc = u64(pos < n ? in[pos++] : 0) >> (k & 7);
            nbits = 8 - int(k & 7);
          }
        }
        w += v;
      } else if (w + v <= cap) {        // common case: unchecked 4-at-a-time
        u32 j = 0;
        for (; j + 4 <= v; j += 4, w += 4) {
          u32 x = getb(32);
          out[w] = u8(x);
          out[w + 1] = u8(x >> 8);
          out[w + 2] = u8(x >> 16);
          out[w + 3] = u8(x >> 24);
        }
        for (; j < v; ++j, ++w) out[w] = u8(getb(8));
      } else {
        for (u32 j = 0; j < v; ++j) {
          u8 c = u8(getb(8));
          if (w < cap) out[w] = c;
          ++w;
        }
      }
    } else {                            // match
      if (bitpos + 2 + rb + lo > total) return w;
      u32 len = (v << 2) | getb(2);
      u32 r = rb ? getb(rb) : 0;
      u32 q = (1u << lo) | (lo ? getb(lo) : 0);
      size_t off = ((size_t(q) << rb) | r) - ((size_t(1) << rb) - 1);
      if (off > w) return w;            // corrupt stream; stop
      if (!out) {
        w += len;
      } else if (w + len <= cap) {
        const u8* src = out + (w - off);
        u8* dst = out + w;
        w += len;
        if (off >= 8) {                 // word copies (8 B may over-read
          u32 j = 0;                    //  src but stays < dst: in-bounds)
          for (; j + 8 <= len; j += 8)
            memcpy(dst + j, src + j, 8);
          for (; j < len; ++j) dst[j] = src[j];
        } else {
          for (u32 j = 0; j < len; ++j) dst[j] = src[j];
        }
      } else {
        for (u32 j = 0; j < len; ++j, ++w)
          if (w < cap) out[w] = w >= off ? out[w - off] : 0;
      }
    }
  }
  return w;
}

// Content-defined chunking: gear rolling hash with FastCDC-style
// normalized masks (reference behavior described in SURVEY.md section 2.6
// component 35; exact boundaries are an implementation choice — only
// round-trip matters, not boundary parity). The gear recurrence
// h = (h<<1) + G[c] is branch-free (~5x the order-1-predictive scan this
// replaced) and its 64-byte effective window gives the same shift-resistant
// boundaries. Normalization: a stricter mask before the mean size and a
// looser one after pulls fragment sizes toward the mean (FastCDC NC=2).
// mean_bits: mean fragment = 2^mean_bits bytes; min = mean/16, max = mean*8.
// Writes fragment END offsets (exclusive); returns count (<= cap).
static u64 gear_tab[256];
static std::once_flag gear_once;   // concurrent first calls from GIL-released
static void gear_init() {          // pool workers must not race the table fill
  u64 x = 0x2545F4914F6CDD1DULL;       // fixed seed: boundaries are format-
  for (int i = 0; i < 256; ++i) {      // stable across builds and hosts
    x += 0x9E3779B97F4A7C15ULL;        // splitmix64
    u64 z = x;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    gear_tab[i] = z ^ (z >> 31);
  }
}

// k set bits spread over the gear hash's upper half (newest bytes live in
// the low bits; the upper bits mix the whole 64-byte window)
static inline u64 gear_mask(int k) {
  u64 m = 0;
  for (int i = 0; i < k; ++i) m |= 1ULL << (63 - (i * 53) % 48);
  return m;
}

size_t tz_cdc(const u8* data, size_t n, int mean_bits,
              u32* ends, size_t cap) {
  std::call_once(gear_once, gear_init);
  if (mean_bits < 6) mean_bits = 6;
  const size_t mean = size_t(1) << mean_bits;
  const size_t minfrag = mean / 16;
  const size_t maxfrag = mean * 8 + 4096;
  // hit probability 2^-k per tested byte; with ~mean bytes tested per
  // fragment the strict/loose pair brackets the target mean
  const u64 mask_s = gear_mask(mean_bits + 2);
  const u64 mask_l = gear_mask(mean_bits - 2);
  size_t start = 0, count = 0;
  while (start < n) {
    size_t rem = n - start;
    if (rem <= minfrag) {
      if (count < cap) ends[count++] = u32(n);
      break;
    }
    size_t lim = rem < maxfrag ? rem : maxfrag;
    // warm the 64-byte window just before the first testable position so
    // boundaries depend only on local content (shift-resistant dedup)
    size_t i = minfrag > 64 ? minfrag - 64 : 0;
    u64 h = 0;
    const u8* p = data + start;
    for (; i < minfrag; ++i) h = (h << 1) + gear_tab[p[i]];
    size_t mid = mean < lim ? mean : lim;
    size_t cut = 0;
    for (; i < mid; ++i) {
      h = (h << 1) + gear_tab[p[i]];
      if (!(h & mask_s)) { cut = i + 1; break; }
    }
    if (!cut)
      for (; i < lim; ++i) {
        h = (h << 1) + gear_tab[p[i]];
        if (!(h & mask_l)) { cut = i + 1; break; }
      }
    if (!cut) cut = lim;
    start += cut;
    if (count < cap) ends[count++] = u32(start);
    else break;
  }
  return count;
}

// XXH64 (public xxHash algorithm specification, clean-room).
u64 tz_xxh64(const u8* p, size_t len, u64 seed) {
  const u64 P1 = 0x9E3779B185EBCA87ULL, P2 = 0xC2B2AE3D27D4EB4FULL,
            P3 = 0x165667B19E3779F9ULL, P4 = 0x85EBCA77C2B2AE63ULL,
            P5 = 0x27D4EB2F165667C5ULL;
  auto rotl = [](u64 x, int r) { return (x << r) | (x >> (64 - r)); };
  auto rd64 = [](const u8* q) {
    u64 v; memcpy(&v, q, 8); return v;        // little-endian hosts
  };
  auto rd32 = [](const u8* q) {
    u32 v; memcpy(&v, q, 4); return u64(v);
  };
  const u8* end = p + len;
  u64 h;
  if (len >= 32) {
    u64 v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed, v4 = seed - P1;
    const u8* limit = end - 32;
    do {
      v1 = rotl(v1 + rd64(p) * P2, 31) * P1; p += 8;
      v2 = rotl(v2 + rd64(p) * P2, 31) * P1; p += 8;
      v3 = rotl(v3 + rd64(p) * P2, 31) * P1; p += 8;
      v4 = rotl(v4 + rd64(p) * P2, 31) * P1; p += 8;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
    auto merge = [&](u64 v) {
      h = (h ^ (rotl(v * P2, 31) * P1)) * P1 + P4;
    };
    merge(v1); merge(v2); merge(v3); merge(v4);
  } else {
    h = seed + P5;
  }
  h += u64(len);
  while (p + 8 <= end) {
    h = rotl(h ^ (rotl(rd64(p) * P2, 31) * P1), 27) * P1 + P4;
    p += 8;
  }
  if (p + 4 <= end) {
    h = rotl(h ^ (rd32(p) * P1), 23) * P2 + P3;
    p += 4;
  }
  while (p < end) {
    h = rotl(h ^ (*p * P5), 11) * P1;
    ++p;
  }
  h ^= h >> 33; h *= P2; h ^= h >> 29; h *= P3; h ^= h >> 32;
  return h;
}

// CRC-32 (IEEE 802.3, reflected), table-driven.
static u32 crc_table[16][256];
static std::once_flag crc_once;

static void crc_init() {
  for (u32 i = 0; i < 256; ++i) {
    u32 c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[0][i] = c;
  }
  for (int t = 1; t < 16; ++t)
    for (u32 i = 0; i < 256; ++i)
      crc_table[t][i] = crc_table[0][crc_table[t - 1][i] & 0xFF]
                        ^ (crc_table[t - 1][i] >> 8);
}

// PCLMUL carry-less folding for the same reflected CRC-32 (Intel folding
// constants x^(4*128+32)/x^(4*128-32)/x^(128+32)/x^(128-32) mod P; the
// scheme folds 64 input bytes per iteration into 4 xmm accumulators).
// The folded 16-byte state is congruent to the consumed prefix mod P, so
// the finish is just the table CRC over those 16 state bytes — no Barrett
// constants needed. Correctness is pinned by an init self-test against the
// slice-16 path; on mismatch (or no PCLMUL) the table path runs alone.
static u32 crc32_slice16(u32 crc, const u8* data, size_t n);

__attribute__((target("pclmul,sse4.1")))
static u32 crc32_clmul(u32 crc, const u8* data, size_t n) {
  // caller guarantees n >= 64 and crc already in core (inverted) form
  const __m128i K64 = _mm_set_epi64x(0x00000001c6e41596LL,
                                     0x0000000154442bd4LL);
  const __m128i K16 = _mm_set_epi64x(0x00000000ccaa009eLL,
                                     0x00000001751997d0LL);
  __m128i x0 = _mm_loadu_si128((const __m128i*)data);
  __m128i x1 = _mm_loadu_si128((const __m128i*)(data + 16));
  __m128i x2 = _mm_loadu_si128((const __m128i*)(data + 32));
  __m128i x3 = _mm_loadu_si128((const __m128i*)(data + 48));
  x0 = _mm_xor_si128(x0, _mm_cvtsi32_si128((int)crc));  // reflected: low end
  data += 64; n -= 64;
  while (n >= 64) {
#define TZ_FOLD(x, q)                                                     \
    x = _mm_xor_si128(_mm_xor_si128(_mm_clmulepi64_si128(x, K64, 0x00),   \
                                    _mm_clmulepi64_si128(x, K64, 0x11)),  \
                      _mm_loadu_si128((const __m128i*)(q)))
    TZ_FOLD(x0, data); TZ_FOLD(x1, data + 16);
    TZ_FOLD(x2, data + 32); TZ_FOLD(x3, data + 48);
#undef TZ_FOLD
    data += 64; n -= 64;
  }
  __m128i acc = _mm_xor_si128(
      _mm_xor_si128(_mm_clmulepi64_si128(x0, K16, 0x00),
                    _mm_clmulepi64_si128(x0, K16, 0x11)), x1);
  acc = _mm_xor_si128(_mm_xor_si128(_mm_clmulepi64_si128(acc, K16, 0x00),
                                    _mm_clmulepi64_si128(acc, K16, 0x11)),
                      x2);
  acc = _mm_xor_si128(_mm_xor_si128(_mm_clmulepi64_si128(acc, K16, 0x00),
                                    _mm_clmulepi64_si128(acc, K16, 0x11)),
                      x3);
  while (n >= 16) {
    acc = _mm_xor_si128(_mm_xor_si128(_mm_clmulepi64_si128(acc, K16, 0x00),
                                      _mm_clmulepi64_si128(acc, K16, 0x11)),
                        _mm_loadu_si128((const __m128i*)data));
    data += 16; n -= 16;
  }
  u8 state[16];
  _mm_storeu_si128((__m128i*)state, acc);
  // the incoming core was already folded into the stream front, so the
  // finishing table walk starts from core 0
  crc = crc32_slice16(0, state, 16);
  return crc32_slice16(crc, data, n);
}

static int g_crc_clmul = 0;    // set once under crc_once (data-race-free:
                               // readers observe the release in call_once)

static void crc_probe_clmul() {
  crc_init();
  if (__builtin_cpu_supports("pclmul") && __builtin_cpu_supports("sse4.1")) {
    u8 probe[257];
    for (int i = 0; i < 257; ++i) probe[i] = u8(i * 73 + 11);
    g_crc_clmul = crc32_clmul(0xFFFFFFFFu, probe, 257)
                  == crc32_slice16(0xFFFFFFFFu, probe, 257);
  }
}

// IEEE 802.3 reflected CRC-32, slice-by-16 (byte-at-a-time is ~0.4 GB/s and
// sits on the add/verify hot path; the 16-lane table walk reaches >2 GB/s,
// the PCLMUL fold >10 GB/s)
u32 tz_crc32(u32 crc, const u8* data, size_t n) {
  std::call_once(crc_once, crc_probe_clmul);
  crc = ~crc;
  if (g_crc_clmul && n >= 64)
    return ~crc32_clmul(crc, data, n);
  return ~crc32_slice16(crc, data, n);
}

static u32 crc32_slice16(u32 crc, const u8* data, size_t n) {
  while (n >= 16) {
    u32 a, b, c, d;
    memcpy(&a, data, 4); memcpy(&b, data + 4, 4);
    memcpy(&c, data + 8, 4); memcpy(&d, data + 12, 4);
    a ^= crc;
    crc = crc_table[15][a & 0xFF] ^ crc_table[14][(a >> 8) & 0xFF]
        ^ crc_table[13][(a >> 16) & 0xFF] ^ crc_table[12][a >> 24]
        ^ crc_table[11][b & 0xFF] ^ crc_table[10][(b >> 8) & 0xFF]
        ^ crc_table[9][(b >> 16) & 0xFF] ^ crc_table[8][b >> 24]
        ^ crc_table[7][c & 0xFF] ^ crc_table[6][(c >> 8) & 0xFF]
        ^ crc_table[5][(c >> 16) & 0xFF] ^ crc_table[4][c >> 24]
        ^ crc_table[3][d & 0xFF] ^ crc_table[2][(d >> 8) & 0xFF]
        ^ crc_table[1][(d >> 16) & 0xFF] ^ crc_table[0][d >> 24];
    data += 16;
    n -= 16;
  }
  for (size_t i = 0; i < n; ++i)
    crc = crc_table[0][(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc;   // core (non-inverted) form; tz_crc32 applies the ~
}

// One-pass file digest for the add pipeline: CDC boundaries + SHA-1 per
// fragment + whole-file CRC-32/XXH64, all in one GIL-released call (the
// Python-side version made thousands of per-fragment ctypes calls and
// sliced a copy of every fragment). Returns fragment count (<= cap).
// ends: u32[cap] fragment END offsets; sha1s: u8[cap*20].
size_t tz_digest_file(const u8* data, size_t n, int mean_bits,
                      u32* ends, size_t cap, u8* sha1s,
                      u32* crc_out, u64* xxh_out) {
  size_t count = tz_cdc(data, n, mean_bits, ends, cap);
  // consecutive fragments are independent hash jobs: pair them through the
  // two-stream SHA-NI loop (sha1rnds4 is latency-bound; ~1.7x combined)
  size_t start = 0, i = 0;
  for (; i + 1 < count; i += 2) {
    size_t mid = ends[i];
    sha1_pair(data + start, mid - start, sha1s + i * 20,
              data + mid, ends[i + 1] - mid, sha1s + (i + 1) * 20);
    start = ends[i + 1];
  }
  if (i < count) {
    SHA1 s;
    s.update(data + start, ends[i] - start);
    s.final(sha1s + i * 20);
  }
  *crc_out = tz_crc32(0, data, n);
  *xxh_out = tz_xxh64(data, n, 0);
  return count;
}

}  // extern "C"
