// Self-extracting archive stub (the reference's SFX mechanism rebuilt for
// POSIX: ZSFX/zsfx.cpp embeds a mini-Jidac in a Windows PE stub; this is
// the ELF equivalent, compiled on demand by `cli sfx`).
//
// Layout: [this executable][archive bytes][16-byte magic][u64 LE payload
// offset]. The stub locates the trailer at EOF, parses the embedded
// journaling archive with the tzpaq engine (c/h/i block model per
// ZSFX/zsfx.cpp:1283-1627), and extracts every live file into the current
// directory (or argv[1]). Encrypted archives are not supported by the
// stub (no scrypt); build the SFX from a decrypted archive.
//
// Format tables are compiled in via sfx_tables.inc, generated from
// models/tables.py at build time (one source of truth, checksum-verified).

#include "tzpaq.h"

#include <cstdio>
#include <cstring>
#include <map>
#include <string>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

using namespace tzpaq;

#include "sfx_tables.inc"   // defines sfx_install_tables()

extern "C" {
void* tzs_open(const u8* data, size_t n);
void tzs_close(void* h);
long tzs_read_block(void* h);
size_t tzs_seg_count(void* h);
const char* tzs_seg_filename(void* h, size_t i);
const char* tzs_seg_comment(void* h, size_t i);
const u8* tzs_seg_data(void* h, size_t i);
size_t tzs_seg_size(void* h, size_t i);
u64 tzs_tell(void* h);
void tzs_seek(void* h, u64 pos);
}

static const char SFX_MAGIC[17] = "zpaqfranzTPUsfx\x01";  // 16 bytes + NUL

struct FileEntry {
  long long date = 0;
  std::vector<unsigned> ptr;
};

static bool parse_jdc(const char* name, char* type, long long* num) {
  if (strlen(name) != 28 || strncmp(name, "jDC", 3) != 0) return false;
  *type = name[17];
  *num = atoll(name + 18);
  return strchr("cdhi", *type) != nullptr;
}

static void mkdirs(const std::string& path) {
  for (size_t i = 1; i < path.size(); ++i)
    if (path[i] == '/') {
      std::string dir = path.substr(0, i);
      mkdir(dir.c_str(), 0755);
    }
}

int main(int argc, char** argv) {
  sfx_install_tables();
  const char* to = argc > 1 ? argv[1] : ".";

  // read own executable
  char self[4096];
  ssize_t sn = readlink("/proc/self/exe", self, sizeof self - 1);
  const char* me = sn > 0 ? (self[sn] = 0, self) : argv[0];
  FILE* f = fopen(me, "rb");
  if (!f) { fprintf(stderr, "sfx: cannot open %s\n", me); return 2; }
  fseek(f, 0, SEEK_END);
  long fsize = ftell(f);
  if (fsize < 24) { fprintf(stderr, "sfx: no payload\n"); return 2; }
  char trailer[24];
  fseek(f, fsize - 24, SEEK_SET);
  if (fread(trailer, 1, 24, f) != 24
      || memcmp(trailer, SFX_MAGIC, 16) != 0) {
    fprintf(stderr, "sfx: payload trailer missing\n");
    fclose(f);
    return 2;
  }
  u64 off = 0;
  memcpy(&off, trailer + 16, 8);
  size_t n = size_t(fsize - 24) - size_t(off);
  std::vector<u8> arc(n);
  fseek(f, long(off), SEEK_SET);
  if (fread(arc.data(), 1, n, f) != n) {
    fprintf(stderr, "sfx: short read\n");
    fclose(f);
    return 2;
  }
  fclose(f);

  // mini-jidac: decode every block; build ht/dt; d-block bytes kept by
  // first fragment id (zsfx.cpp:1463-1541 block layouts)
  void* s = tzs_open(arc.data(), arc.size());
  std::vector<long long> frag_size{-1};               // 1-based
  std::map<long long, std::vector<u8>> dblocks;       // first frag -> bytes
  std::map<long long, long long> dstart;              // first frag of block
  std::map<std::string, FileEntry> dt;
  for (;;) {
    long nseg = tzs_read_block(s);
    if (nseg == 0) break;
    if (nseg < 0) {  // damaged block: skip (zsfx.cpp:1596-1602)
      continue;
    }
    for (long i = 0; i < nseg; ++i) {
      const char* name = tzs_seg_filename(s, i);
      const u8* data = tzs_seg_data(s, i);
      size_t sz = tzs_seg_size(s, i);
      char type;
      long long num;
      if (!parse_jdc(name, &type, &num)) {
        // streaming segment: write as-is
        std::string p = std::string(to) + "/" +
            (name[0] ? name : "stream.out");
        mkdirs(p);
        FILE* o = fopen(p.c_str(), i ? "ab" : "wb");
        if (o) { fwrite(data, 1, sz, o); fclose(o); }
        continue;
      }
      if (type == 'd') {
        dblocks[num] = std::vector<u8>(data, data + sz);
      } else if (type == 'h') {
        if (sz < 4) continue;
        size_t cnt = (sz - 4) / 24;
        for (size_t k = 0; k < cnt; ++k) {
          long long id = num + (long long)k;
          while ((long long)frag_size.size() <= id) frag_size.push_back(-1);
          u32 usize;
          memcpy(&usize, data + 4 + k * 24 + 20, 4);
          frag_size[id] = usize;
          dstart[id] = num;
        }
      } else if (type == 'i') {
        size_t p = 0;
        while (p + 9 <= sz) {
          long long date;
          memcpy(&date, data + p, 8);
          p += 8;
          const char* fn = (const char*)data + p;
          size_t fl = strnlen(fn, sz - p);
          std::string fname(fn, fl);
          p += fl + 1;
          FileEntry fe;
          fe.date = date;
          if (date) {
            if (p + 4 > sz) break;
            u32 na;
            memcpy(&na, data + p, 4);
            p += 4 + na;
            if (p + 4 > sz) break;
            u32 ni;
            memcpy(&ni, data + p, 4);
            p += 4;
            for (u32 k = 0; k < ni && p + 4 <= sz; ++k, p += 4) {
              u32 id;
              memcpy(&id, data + p, 4);
              fe.ptr.push_back(id);
            }
          }
          dt[fname] = fe;
        }
      }
      // 'c' blocks carry only the skip size; the stub decodes everything
    }
  }
  tzs_close(s);

  // fragment id -> (block bytes, offset): offsets accumulate per block
  std::map<long long, size_t> frag_off;
  for (auto& kv : dstart) {
    long long id = kv.first, first = kv.second;
    size_t off2 = 0;
    for (long long j = first; j < id; ++j)
      off2 += size_t(frag_size[j] < 0 ? 0 : frag_size[j]);
    frag_off[id] = off2;
  }

  int files = 0, errors = 0;
  for (auto& kv : dt) {
    if (!kv.second.date) continue;           // deleted
    std::string p = std::string(to) + "/" + kv.first;
    mkdirs(p);
    FILE* o = fopen(p.c_str(), "wb");
    if (!o) { ++errors; continue; }
    for (unsigned id : kv.second.ptr) {
      auto bi = dstart.find(id);
      if (bi == dstart.end() || frag_size[id] < 0) { ++errors; break; }
      auto& blk = dblocks[bi->second];
      size_t o2 = frag_off[id];
      size_t len = size_t(frag_size[id]);
      if (o2 + len > blk.size()) { ++errors; break; }
      fwrite(blk.data() + o2, 1, len, o);
    }
    fclose(o);
    ++files;
  }
  fprintf(stderr, "sfx: %d files extracted, %d errors\n", files, errors);
  return errors ? 1 : 0;
}
