"""Head-to-head decode benchmark: our native engine vs the reference's
own libzpaq (x86-JIT predictor) on identical blocks, identical hardware.

The ZSFX snapshot ships the reference's decode side in full
(/root/reference/ZSFX/libzpaq.cpp, incl. the assemble/assemble_p JITs);
its only platform dependency is VirtualAlloc/VirtualFree for RWX pages,
shimmed here with mmap.  The encode side is absent from the snapshot
(SURVEY.md section 0), so decode — the JIT'd hot path the round-3/4
"reference is ~2x" concession was about — is what can be measured
directly.

Build products are cached under ``workdir``; returns a dict of results.
"""

from __future__ import annotations

import os
import subprocess
import time
from typing import Dict, Optional

_REF = "/root/reference/ZSFX"

_SHIM = r"""
#pragma once
#include <sys/mman.h>
#include <stddef.h>
#define MEM_RESERVE 0x2000
#define MEM_COMMIT 0x1000
#define MEM_RELEASE 0x8000
#define PAGE_EXECUTE_READWRITE 0x40
static inline void* VirtualAlloc(void* addr, size_t size, unsigned flags,
                                 unsigned prot) {
  void* p = mmap(0, size, PROT_READ | PROT_WRITE | PROT_EXEC,
                 MAP_PRIVATE | MAP_ANONYMOUS, -1, 0);
  return p == MAP_FAILED ? 0 : p;
}
static inline int VirtualFree(void* p, size_t size, unsigned freetype) {
  return 1;  /* benchmark process is short-lived; leak is fine */
}
"""

_DRIVER = r"""
#include "libzpaq.h"
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <vector>

void libzpaq::error(const char* msg) {
  fprintf(stderr, "libzpaq error: %s\n", msg);
  exit(1);
}
struct MemReader : public libzpaq::Reader {
  const unsigned char* p; size_t n, i;
  MemReader(const unsigned char* p_, size_t n_) : p(p_), n(n_), i(0) {}
  int get() { return i < n ? p[i++] : -1; }
  int read(char* buf, int bn) {
    int take = (int)((size_t)bn < n - i ? (size_t)bn : n - i);
    memcpy(buf, p + i, take); i += take; return take;
  }
};
struct CountWriter : public libzpaq::Writer {
  size_t n = 0;
  void put(int c) { ++n; }
  void write(const char* buf, int bn) { n += bn; }
};
int main(int argc, char** argv) {
  if (argc < 2) return 2;
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END); long fn = ftell(f); fseek(f, 0, SEEK_SET);
  std::vector<unsigned char> data(fn);
  if (fread(data.data(), 1, fn, f) != (size_t)fn) return 2;
  fclose(f);
  int reps = argc > 2 ? atoi(argv[2]) : 3;
  double best = 1e18; size_t out_n = 0;
  for (int r = 0; r < reps; ++r) {
    MemReader in(data.data(), data.size());
    CountWriter out;
    struct timespec t0, t1;
    clock_gettime(CLOCK_MONOTONIC, &t0);
    libzpaq::decompress(&in, &out);
    clock_gettime(CLOCK_MONOTONIC, &t1);
    double dt = (t1.tv_sec - t0.tv_sec) + (t1.tv_nsec - t0.tv_nsec) * 1e-9;
    if (dt < best) best = dt;
    out_n = out.n;
  }
  printf("%zu %.6f\n", out_n, best);
  return 0;
}
"""


def build_ref_decoder(workdir: str) -> Optional[str]:
    """Compile the reference decoder driver; returns binary path or None."""
    if not os.path.exists(os.path.join(_REF, "libzpaq.cpp")):
        return None
    os.makedirs(workdir, exist_ok=True)
    binp = os.path.join(workdir, "refdec")
    src = os.path.join(workdir, "refdec.cpp")
    if os.path.exists(binp):
        return binp
    with open(os.path.join(workdir, "windows.h"), "w") as f:
        f.write(_SHIM)
    with open(src, "w") as f:
        f.write(_DRIVER)
    r = subprocess.run(
        ["g++", "-O3", "-march=x86-64-v3", "-I", workdir, "-I", _REF,
         "-o", binp, src, os.path.join(_REF, "libzpaq.cpp"), "-lpthread"],
        capture_output=True, text=True, timeout=300)
    return binp if r.returncode == 0 else None


def compare_levels(data: bytes, levels=("3", "4", "5"),
                   workdir: str = "/tmp/zpaq_refdec",
                   reps: int = 2) -> Dict:
    """Encode `data` at each level with OUR encoder, decode the identical
    block with both engines, return {level: {ours_MBps, ref_MBps}}."""
    from zpaqfranz_tpu import native
    from zpaqfranz_tpu.codec.methods import make_model
    from zpaqfranz_tpu.parallel.engine import prepare_payload

    binp = build_ref_decoder(workdir)
    out: Dict = {}
    if binp is None:
        return {"skipped": "reference source or toolchain unavailable"}
    n = len(data)
    for level in levels:
        model, pre = make_model(level)
        payload, st = prepare_payload(pre, data)
        if st or model is None:
            continue
        blk = native.compress_block(model, payload, b"f", b"c")
        p = os.path.join(workdir, f"blk_m{level}.zpaq")
        with open(p, "wb") as f:
            f.write(blk)
        best = 1e18
        for _ in range(reps):
            t0 = time.time()
            segs = native.decompress_stream(blk)
            best = min(best, time.time() - t0)
        assert b"".join(s.data for s in segs[0]) == data
        row = {"ours_MBps": round(n / best / 1e6, 2)}
        try:
            r = subprocess.run([binp, p, str(reps)], capture_output=True,
                               text=True, timeout=600)
            nb, dt = r.stdout.split()
            row["ref_MBps"] = round(int(nb) / float(dt) / 1e6, 2)
            row["ours_vs_ref"] = round(row["ours_MBps"] / row["ref_MBps"], 3)
        except Exception as e:  # noqa: BLE001
            row["ref_error"] = f"{type(e).__name__}: {e}"[:120]
        out[level] = row
    return out


if __name__ == "__main__":
    import json
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    data = bench._level_corpus(2 << 20)
    print(json.dumps(compare_levels(data), indent=1))
