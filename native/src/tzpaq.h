// tzpaq: native host engine for the zpaqfranz_tpu framework.
//
// Clean-room implementation of the ZPAQ Level-2 codec semantics
// (spec: http://mattmahoney.net/zpaq/, public domain; behavioral reference
// cited per function from /root/reference/ZSFX/libzpaq.{h,cpp}).
// This engine is the host-side correctness oracle and fast path; the TPU
// path lives in JAX/Pallas on the Python side and must match it bit-exactly.
#pragma once

#include <cstdint>
#include <cstddef>
#include <cstring>
#include <string>
#include <vector>
#include <stdexcept>

namespace tzpaq {

using u8 = uint8_t;
using u16 = uint16_t;
using u32 = uint32_t;
using u64 = uint64_t;
using i32 = int32_t;
using i64 = int64_t;

struct format_error : std::runtime_error {
  explicit format_error(const std::string& m) : std::runtime_error(m) {}
};

// ---- shared model tables (built once, checksum-verified) ----
struct Tables {
  u8 sns[1024];        // bit-history automaton (installed from Python)
  u32 cminit[256];     // initial ICM probabilities per state
  u16 squasht[4096];
  int16_t stretcht[32768];
  i32 dt[1024];
  i32 dt2k[256];
  bool ready = false;
};
extern Tables g_tab;

// ---- streaming SHA-1 (FIPS 180-1; fragment/segment checksums) ----
struct SHA1 {
  u32 h[5];
  u64 len = 0;
  u8 buf[64];
  SHA1() { init(); }
  void init();
  void update(const u8* p, size_t n);
  void final(u8* out20);
  void block(const u8* p);
};

inline int squash(int x) { return g_tab.squasht[x + 2048]; }
inline int stretch(int p) { return g_tab.stretcht[p]; }
inline int clamp2k(int x) { return x < -2048 ? -2048 : x > 2047 ? 2047 : x; }
inline int clamp512k(int x) {
  return x < -(1 << 19) ? -(1 << 19) : x >= (1 << 19) ? (1 << 19) - 1 : x;
}

// ---- growable output sink ----
struct Sink {
  std::vector<u8> v;
  inline void put(int c) { v.push_back((u8)c); }
  inline void write(const u8* p, size_t n) { v.insert(v.end(), p, p + n); }
  size_t size() const { return v.size(); }
};

// ---- ZPAQL virtual machine ----
// Semantics: ZPAQ L2 spec; reference interpreter libzpaq.cpp:1033-1254.
struct VM {
  std::vector<u8> code;   // HCOMP or PCOMP bytecode (no trailing 0 needed)
  std::vector<u32> h;
  std::vector<u8> m;
  std::vector<u32> r;
  u32 a = 0, b = 0, c = 0, d = 0;
  int f = 0;
  u32 hmask = 0, mmask = 0;
  Sink* out = nullptr;    // OUT destination (PCOMP)
  // recognized standard-level HCOMP program (3/4/5) -> native context
  // update instead of the per-instruction interpreter; 0 = interpret.
  // Matched by bytecode equality at init (register_hcomp).
  int fast_hcomp = 0;

  void init(const u8* prog, size_t proglen, int hbits, int mbits);
  void run(u32 input);
  void run_fast(u32 input);
};
void register_hcomp(const u8* code, size_t len, int kind);

// ---- model description parsed from a serialized block header ----
struct Header {
  int hh = 0, hm = 0, ph = 0, pm = 0;
  std::vector<std::vector<u8>> comps;
  std::vector<u8> hcomp;
  // parse "hsize[2] hh hm ph pm n comp.. 0 hcomp.. 0"; returns bytes used
  size_t parse(const u8* data, size_t len);
  int n() const { return (int)comps.size(); }
};

// ---- Predictor: the 9 ZPAQ components ----
// Semantics: libzpaq.cpp:1715-2080 (init/predict0/update0/find).
struct Comp {
  size_t limit = 0, cxt = 0, a = 0, b = 0, c = 0;
  std::vector<u32> cm;
  std::vector<u8> ht;
  std::vector<u16> a16;
  // cached per-bit-loop descriptor (filled by Predictor::init): component
  // arg bytes and table masks, so predict/update never chase the
  // vector<vector<u8>> header or reload vector sizes in the hot loop
  u8 type = 0, p1 = 0, p2 = 0, p3 = 0, p4 = 0, p5 = 0;
  u32 cmmask = 0, htmask = 0;
};

struct Decoder;
struct Encoder;

struct Predictor {
  Header hdr;
  VM z;
  int c8 = 1, hmap4 = 1;
  int p[256];
  u32 h[256];
  Comp comp[256];
  // specialized chain entry points (template-instantiated for the three
  // standard level chains at init; null = generic switch loop). This is
  // the portable analog of the reference's per-model x86 codegen
  // (assemble_p, libzpaq.cpp:3489-4263): the compiler unrolls and inlines
  // the fixed component walk instead of a runtime switch per component.
  int (*pred_fn)(Predictor&) = nullptr;
  void (*upd_fn)(Predictor&, int) = nullptr;
  // fused per-byte coder loops (predict/decode-or-encode/update inlined
  // together, no per-bit indirect calls — proportionally biggest for the
  // short -m3 chain)
  int (*dec_byte_fn)(Predictor&, Decoder&) = nullptr;
  void (*enc_byte_fn)(Predictor&, Encoder&, int) = nullptr;

  void init(const Header& hd);
  bool is_modeled() const { return hdr.n() > 0; }
  int predict() { return pred_fn ? pred_fn(*this) : predict_generic(); }
  void update(int y) {
    if (upd_fn) upd_fn(*this, y);
    else update_generic(y);
  }
  int predict_generic();
  void update_generic(int y);
  void update_tail(int y);   // c8/hmap4/z.run byte bookkeeping
  size_t find(std::vector<u8>& ht, int sizebits, u32 cxt);
  void train(Comp& cr, int y);
};

// ---- archive byte sources --------------------------------------------
// The reference reads archives through InputArchive (zsfx.cpp:401-568):
// seek-based, multipart-aware, AES-CTR-decrypting at the absolute file
// offset. Source is that abstraction: a contiguous logical PLAINTEXT
// space (the 32-byte salt header excluded) served by pread.
struct Source {
  virtual ~Source() {}
  virtual u64 size() const = 0;
  virtual size_t pread(u64 pos, u8* dst, size_t n) = 0;
};

struct MemSource : Source {
  const u8* p = nullptr;
  u64 n = 0;
  u64 size() const override { return n; }
  size_t pread(u64 pos, u8* dst, size_t want) override {
    if (pos >= n) return 0;
    size_t take = (size_t)((pos + want > n) ? n - pos : want);
    memcpy(dst, p + pos, take);
    return take;
  }
};

// Multipart file-backed source with optional AES-256-CTR decrypt keyed by
// the absolute on-disk offset (keystream counter = offset/16, matching
// zsfx.cpp:455-465); memory stays O(1) regardless of archive size.
struct FileSource : Source {
  struct Part { int fd; u64 size; };
  std::vector<Part> parts;
  std::vector<u64> cum;       // cumulative logical start of each part
  u64 total = 0;              // logical (post-salt) byte count
  u64 skip = 0;               // 32 when encrypted (salt header in part 1)
  bool enc = false;
  u8 key[32];
  u8 iv8[8];

  ~FileSource() override;
  // opens parts; if key32 != null, reads the salt from part 1.
  // returns empty string on success, error text otherwise.
  std::string open(const char* const* paths, int nparts, const u8* key32);
  u64 size() const override { return total; }
  size_t pread(u64 pos, u8* dst, size_t n) override;
};

// Buffered reader over a Source: the byte cursor every parser and the
// arithmetic decoder pull from. In-memory sources keep the raw-pointer
// fast path (zero copy, zero refills).
struct BufIn {
  Source* src = nullptr;
  const u8* mem = nullptr;    // fast path (MemSource)
  u64 memn = 0;
  std::vector<u8> win;
  u64 wbase = 0;              // logical offset of win[0]
  size_t wlen = 0;
  u64 pos = 0;                // logical cursor
  static const size_t WIN = 1 << 20;

  void use_mem(const u8* p, u64 n) { mem = p; memn = n; src = nullptr; }
  void use_src(Source* s) { src = s; mem = nullptr; win.resize(WIN); wlen = 0; }
  u64 size() const { return mem ? memn : (src ? src->size() : 0); }
  int get() {
    if (mem) return pos < memn ? mem[pos++] : -1;
    if (pos >= wbase && pos < wbase + wlen) return win[(size_t)(pos++ - wbase)];
    return refill();
  }
  int refill();                           // slow path: fetch next window
  size_t read(u8* dst, size_t n);         // bulk read at cursor
  void seek(u64 p) { pos = p; }
  u64 tell() const { return pos; }
};

// ---- arithmetic decoder over a buffered source ----
// Semantics: libzpaq.cpp:2082-2173.
struct Decoder {
  BufIn* bin = nullptr;
  u32 low = 1, high = 0xFFFFFFFFu, curr = 0;
  Predictor pr;

  void init_block(const Header& hd);  // predictor init, once per block
  void init_segment();                // coder state reset, per segment
  int decompress();                   // one byte or -1 at EOS
  // bulk copy of the unmodeled (4-byte-length-prefixed) stream; returns
  // bytes written, < maxn only at EOS
  size_t read_unmodeled(u8* dst, size_t maxn);
  int get() { return bin->get(); }
  int decode(int p);                  // public: fused chain loops call it
};

// ---- postprocessor ----
// Known-pcomp fast path: the stored PCOMP programs our encoder emits
// (LZ77 packed/byte, BWT, E8E9, and their composites) are recognized by
// bytecode equality and inverted by native C++ transforms instead of the
// per-byte ZPAQL VM — the reference's "-m1 decodes as fast as it encodes"
// property (libzpaq.h:100-103) comes from exactly this kind of fast
// inverse. Unknown programs fall back to the VM (format truth).
enum FastKind { FAST_NONE = 0, FAST_LZ77P = 1, FAST_LZ77B = 2,
                FAST_BWT = 3, FAST_E8E9 = 4 };
void register_pcomp(const u8* code, size_t len, int kind, int p1, int p2);

struct PostProc {
  int state = 0, hsize = 0, ph = 0, pm = 0;
  std::vector<u8> pcomp;
  VM vm;
  Sink* out = nullptr;
  int fast_kind = 0, fast_p1 = 0, fast_p2 = 0;
  std::vector<u8> fbuf;   // buffered segment stream when fast path active
  void init(int ph_, int pm_, Sink* out_);
  void write(int c);
  void apply_fast();      // invert fbuf into out at segment end
};

// ---- arithmetic encoder ----
struct Encoder {
  Sink* out = nullptr;
  u32 low = 1, high = 0xFFFFFFFFu;
  Predictor pr;
  std::vector<u8> ubuf;  // unmodeled buffer

  void init_block(const Header& hd);
  void init_segment();
  void compress(int c);   // c = 0..255 or -1 at end of segment
  void compress_bulk(const u8* p, size_t n);  // byte-identical fast path
  void encode(int y, int p);
  void flush_unmodeled();
};

// ---- preprocessors ----
void e8e9(u8* buf, i64 n);          // libzpaq.cpp:6117-6126 semantics
void inverse_e8e9(u8* buf, i64 n);  // decode-side inverse of e8e9
// LZ77/BWT encode; args as LZBuffer (libzpaq.cpp:6128-6311):
// args[0]=log2 bufsize MB, args[1]=level(1,2,3)+4*e8e9, args[2]=minMatch,
// args[3]=minMatch2, args[4]=log bucket, args[5]=log ht size (or args[0]+21
// for suffix-array search), args[6]=lookahead.

}  // namespace tzpaq
