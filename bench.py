"""Benchmark: batched context-mixing encode throughput per chip.

Measures the framework's hot path — L independent ZPAQ streams encoded in
lockstep on one chip (8x fused predict/range-code/update per byte plus the
batched HCOMP) — and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

Baseline anchor: the reference is single-host, one OS thread per block
(SURVEY.md section 2.8); its context-mixing levels encode at roughly
0.5-2 MB/s/thread (libzpaq CM is symmetric encode/decode; the reference
publishes no formal numbers — BASELINE.md). We anchor vs_baseline at an
8-thread desktop running the mid CM profile: 8 x 1.5 = 12 MB/s.
"""

from __future__ import annotations

import json
import time

import numpy as np

_BASELINE_MBPS = 12.0

_HCOMP = """
hcomp
  c++ *c=a b=c a=0
  d= 1 hash *d=a
  b-- d++ hash *d=a
  b-- d++ hash *d=a
  b-- d++ hash *d=a
  b-- d++ hash *d=a
  b-- d++ hash b-- hash *d=a
  d++ a=*c a<<= 8 *d=a
  halt
post 0 end
"""

# mid-profile component chain, tables sized ~20 MB/lane so a 64-lane batch
# stays well inside HBM together with the scan's double buffers
_CFG = """
comp 3 3 0 0 8
  0 icm 5
  1 isse 13 0
  2 isse 15 1
  3 isse 16 2
  4 isse 16 3
  5 isse 17 4
  6 match 20 20
  7 mix 16 0 7 24 255
""" + _HCOMP

# scaled-down tables for the CPU smoke fallback (same component chain)
_CFG_SMALL = """
comp 3 3 0 0 8
  0 icm 5
  1 isse 10 0
  2 isse 11 1
  3 isse 12 2
  4 isse 12 3
  5 isse 12 4
  6 match 14 16
  7 mix 16 0 7 24 255
""" + _HCOMP


def _synthetic_lanes(n_lanes: int, n_bytes: int) -> np.ndarray:
    """Mixed text-like + binary payloads, one per lane."""
    rng = np.random.default_rng(7)
    words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over ",
             b"lazy ", b"dog ", b"zpaq ", b"tpu "]
    out = np.zeros((n_lanes, n_bytes), np.uint8)
    for i in range(n_lanes):
        buf = bytearray()
        while len(buf) < n_bytes:
            if rng.random() < 0.85:
                buf += words[rng.integers(len(words))]
            else:
                buf += bytes(rng.integers(0, 256, 8, dtype=np.uint8))
        out[i] = np.frombuffer(bytes(buf[:n_bytes]), np.uint8)
    return out


def main() -> None:
    import jax
    import jax.numpy as jnp
    from zpaqfranz_tpu.zpaql.compiler import compile_config
    from zpaqfranz_tpu.ops.coder_batched import BatchedEncoder

    platform = jax.devices()[0].platform
    # sized so compile+run fits the driver budget; TPU gets the full load
    if platform == "cpu":
        n_lanes, n_bytes, cfg = 8, 192, _CFG_SMALL
    else:
        n_lanes, n_bytes, cfg = 64, 2048, _CFG  # ~1.3 GB of model tables

    model, _ = compile_config(cfg)
    enc = BatchedEncoder(model, out_cap=n_bytes + 1 + 64)
    raw = _synthetic_lanes(n_lanes, n_bytes)
    # lanes carry the PASS postprocessor selector + payload
    data = np.zeros((n_lanes, n_bytes + 1), np.uint8)
    data[:, 1:] = raw
    data_j = jnp.asarray(data)
    lengths = jnp.full((n_lanes,), n_bytes + 1, jnp.int32)

    encode = jax.jit(enc.encode)
    t0 = time.time()
    st = encode(data_j, lengths)
    jax.block_until_ready(st)
    compile_s = time.time() - t0

    t0 = time.time()
    st = encode(data_j, lengths)
    jax.block_until_ready(st)
    run_s = time.time() - t0

    total_mb = n_lanes * (n_bytes + 1) / 1e6
    mbps = total_mb / run_s
    ratio = float(np.asarray(st["enc"].cnt).sum()) / (n_lanes * n_bytes)
    print(json.dumps({
        "metric": "cm_encode_MBps_per_chip",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / _BASELINE_MBPS, 4),
        "detail": {
            "platform": platform, "lanes": n_lanes, "bytes_per_lane": n_bytes,
            "compile_s": round(compile_s, 1), "run_s": round(run_s, 3),
            "compressed_ratio": round(ratio, 4),
            "baseline_anchor_MBps": _BASELINE_MBPS,
        },
    }))


if __name__ == "__main__":
    main()
