"""Bisect which m4 component crashes the TPU worker.

Runs the arena encoder on truncated prefixes of the "4.0" component chain,
each in its own subprocess (a worker crash poisons the TPU client AND takes
the tunnel down for minutes), 8 lanes x 1 KB.  Between stages, waits for
the chip to answer a trivial op before proceeding.

Usage: python experiments/tpu_bisect.py [prefix...]
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
k = int(sys.argv[1])
model, _ = make_model("4.0")
if k < len(model.comps):
    model.comps = model.comps[:k]
L, BS = 8, 1024
data = (b"the quick brown fox jumps over the lazy dog " * 1000)[:L*BS]
payloads = [b"\x00" + data[i*BS:(i+1)*BS][:BS-1] for i in range(L)]
arr = np.zeros((L, BS), np.uint8)
lens = np.zeros(L, np.int32)
for i, p in enumerate(payloads):
    arr[i, :len(p)] = np.frombuffer(p, np.uint8)
    lens[i] = len(p)
enc = ArenaEncoder(model, out_cap=BS + 512)
run = jax.jit(lambda st, d, n, j0: enc.run(st, d, n, j0, 256),
              donate_argnums=(0,))
st = jax.jit(lambda: enc.init_state(L))()
for j0 in range(0, BS + 1, 256):
    st = run(st, jnp.asarray(arr), jnp.asarray(lens), jnp.int32(j0))
cnt = np.asarray(st["cnt"])
print("OKOK", [c[0] for c in model.comps], list(cnt[:4]))
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
    prefixes = [int(a) for a in sys.argv[1:]] or [13, 10, 8, 9, 12, 14]
    results = {}
    for k in prefixes:
        t0 = time.time()
        while not chip_ready():
            if time.time() - t0 > 1500:
                results[k] = {"skipped": "chip never became ready"}
                break
            print(f"chip not ready, waiting... ({time.time()-t0:.0f}s)",
                  flush=True)
            time.sleep(30)
        else:
            try:
                r = subprocess.run(
                    [sys.executable, "-c", CHILD % REPO, str(k)],
                    capture_output=True, text=True, timeout=300)
                ok = "OKOK" in r.stdout
                tail = "" if ok else (r.stdout + r.stderr)[-250:]
            except subprocess.TimeoutExpired:
                ok, tail = False, "TIMEOUT (hung)"
            results[k] = {"ok": ok, **({"tail": tail} if tail else {})}
            print(f"prefix {k}: {'OK' if ok else 'CRASH/FAIL'} {tail[:150]}",
                  flush=True)
        with open("/tmp/tpu_bisect.json", "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
