"""Shape/data bisect for the m4 arena TPU-worker crash.

Full m4 chain at L8/BS1024 (friendly data) is OK; L64/BS4096 (word-mix
corpus) crashed.  This probes one (prefix, L, BS, corpus, chunk) point per
run, each in its own subprocess, waiting for chip readiness first.

Usage: python experiments/tpu_bisect.py <prefix> <L> <BS> <corpus> [chunk]
  corpus: fox | mix | rand
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys, time
sys.path.insert(0, %r)
import numpy as np
import jax, jax.numpy as jnp
from zpaqfranz_tpu.codec.methods import make_model
from zpaqfranz_tpu.ops.codec_arena import ArenaEncoder
from zpaqfranz_tpu.parallel.engine import _enable_compile_cache
_enable_compile_cache()
k, L, BS, corpus, chunk = (int(sys.argv[1]), int(sys.argv[2]),
                           int(sys.argv[3]), sys.argv[4], int(sys.argv[5]))
model, _ = make_model("4.0")
if k < len(model.comps):
    model.comps = model.comps[:k]
n = L * BS
if corpus == "fox":
    data = (b"the quick brown fox jumps over the lazy dog " * (n // 44 + 1))[:n]
elif corpus == "mix":
    rng = np.random.default_rng(5)
    words = [b"the ", b"of ", b"compression ", b"model ", b"context ",
             b"archive ", b"fragment ", b"entropy ", b"suffix ", b"mix "]
    data = b"".join(words[rng.integers(0, len(words))]
                    for _ in range(n // 4))[:n]
else:
    rng = np.random.default_rng(7)
    data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
payloads = [b"\x00" + data[i*BS:(i+1)*BS][:BS-1] for i in range(L)]
arr = np.zeros((L, BS), np.uint8)
lens = np.zeros(L, np.int32)
for i, p in enumerate(payloads):
    arr[i, :len(p)] = np.frombuffer(p, np.uint8)
    lens[i] = len(p)
enc = ArenaEncoder(model, out_cap=BS + BS // 2 + 64)
run = jax.jit(lambda st, d, n, j0: enc.run(st, d, n, j0, chunk),
              donate_argnums=(0,))
st = jax.jit(lambda L=L: enc.init_state(L))()
dj, nj = jnp.asarray(arr), jnp.asarray(lens)
for j0 in range(0, BS + 1, chunk):
    st = run(st, dj, nj, jnp.int32(j0))
cnt = np.asarray(st["cnt"])
print("OKOK", list(cnt[:4]))
"""

PING = r"""
import jax, jax.numpy as jnp
print("PONG", float(jnp.ones(8).sum()))
"""


def chip_ready(timeout=150):
    try:
        r = subprocess.run([sys.executable, "-c", PING],
                           capture_output=True, text=True, timeout=timeout)
        return "PONG" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    k, L, BS = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    corpus = sys.argv[4]
    chunk = int(sys.argv[5]) if len(sys.argv) > 5 else 256
    key = f"k{k}_L{L}_BS{BS}_{corpus}_c{chunk}"
    t0 = time.time()
    while not chip_ready():
        if time.time() - t0 > 1800:
            print(f"{key}: SKIP chip never ready", flush=True)
            return
        print(f"chip not ready, waiting... ({time.time()-t0:.0f}s)",
              flush=True)
        time.sleep(30)
    try:
        r = subprocess.run(
            [sys.executable, "-c", CHILD % REPO, str(k), str(L), str(BS),
             corpus, str(chunk)],
            capture_output=True, text=True, timeout=420)
        ok = "OKOK" in r.stdout
        tail = "" if ok else (r.stdout + r.stderr)[-250:]
    except subprocess.TimeoutExpired:
        ok, tail = False, "TIMEOUT (hung)"
    print(f"{key}: {'OK' if ok else 'CRASH/FAIL'} {tail[:200]}", flush=True)
    try:
        with open("/tmp/tpu_bisect.json") as f:
            results = json.load(f)
    except Exception:  # noqa: BLE001
        results = {}
    results[key] = {"ok": ok, **({"tail": tail} if tail else {})}
    with open("/tmp/tpu_bisect.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
