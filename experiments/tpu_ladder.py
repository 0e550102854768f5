"""Resilient TPU codec ladder probe (round-5 debugging harness).

Runs the arena codec on the real chip starting tiny and scaling up,
appending every stage's result to a JSON file AS IT HAPPENS so a later
crash cannot erase earlier evidence.  Each stage prints XLA's static
memory analysis before executing.

Usage:  python experiments/tpu_ladder.py [out.json]
"""

from __future__ import annotations

import json
import sys
import time
import traceback

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_ladder.json"
RESULTS: dict = {}


def save(key, val):
    RESULTS[key] = val
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"--- {key}: {json.dumps(val)[:300]}", flush=True)


def corpus(n):
    import numpy as np
    rng = np.random.default_rng(5)
    words = [b"the ", b"of ", b"compression ", b"model ", b"context ",
             b"archive ", b"fragment ", b"entropy ", b"suffix ", b"mix "]
    text = b"".join(words[rng.integers(0, len(words))]
                    for _ in range(n // 4))
    return text[:n]


def stage(method, L, BS, chunk=512):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from zpaqfranz_tpu.codec.methods import make_model
    from zpaqfranz_tpu.ops.codec_arena import ArenaDecoder, ArenaEncoder, _Layout

    model, _ = make_model(method)
    lay = _Layout(model)
    data = corpus(L * BS)
    payloads = [b"\x00" + data[i * BS:(i + 1) * BS][: BS - 1]
                for i in range(L)]
    maxlen = BS
    cap = BS + BS // 2 + 64
    arr = np.zeros((L, maxlen), np.uint8)
    lens = np.zeros(L, np.int32)
    for i, p in enumerate(payloads):
        arr[i, : len(p)] = np.frombuffer(p, np.uint8)
        lens[i] = len(p)

    info = {"method": method, "lanes": L, "block_bytes": BS,
            "arena_GB": round((lay.s8 + 4 * lay.s32) * L / 1e9, 3)}

    enc = ArenaEncoder(model, out_cap=cap)
    init_e = jax.jit(lambda L=L: enc.init_state(L))
    run_e = jax.jit(lambda st, d, n, j0: enc.run(st, d, n, j0, chunk),
                    donate_argnums=(0,))

    # static memory analysis BEFORE executing
    t0 = time.time()
    st_shape = jax.eval_shape(init_e)
    lowered = run_e.lower(st_shape, jax.ShapeDtypeStruct(arr.shape, arr.dtype),
                          jax.ShapeDtypeStruct(lens.shape, lens.dtype),
                          jax.ShapeDtypeStruct((), jnp.int32))
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    info["enc_compile_s"] = round(time.time() - t0, 1)
    try:
        info["enc_peak_GB"] = round(
            (ma.temp_size_in_bytes + ma.argument_size_in_bytes
             + ma.output_size_in_bytes) / 1e9, 3)
        info["enc_temp_GB"] = round(ma.temp_size_in_bytes / 1e9, 3)
    except Exception:
        info["enc_mem"] = str(ma)[:200]
    save(f"{method}_L{L}_BS{BS}_meta", info)

    dj = jnp.asarray(arr)
    nj = jnp.asarray(lens)
    st = init_e()
    t0 = time.time()
    for j0 in range(0, maxlen + 1, chunk):
        st = compiled(st, dj, nj, jnp.int32(j0))
    out = np.asarray(st["out"])
    cnt = np.asarray(st["cnt"])
    jax.block_until_ready(cnt)
    enc_s = time.time() - t0
    coded = [bytes(out[i, : cnt[i]]) for i in range(L)]
    tot = sum(len(p) for p in payloads)
    info["encode_MBps"] = round(tot / enc_s / 1e6, 3)

    # decode
    maxcode = max(len(c) for c in coded)
    dlen = max(8, 1 << (maxcode - 1).bit_length())
    darr = np.zeros((L, dlen), np.uint8)
    for i, c in enumerate(coded):
        darr[i, : len(c)] = np.frombuffer(c, np.uint8)
    dec = ArenaDecoder(model)
    init_d = jax.jit(dec.init_state)
    run_d = jax.jit(lambda st, d: dec.run(st, d, chunk),
                    donate_argnums=(0,))
    ddj = jnp.asarray(darr)
    t0 = time.time()
    std = init_d(ddj)
    pieces = []
    done = 0
    while done < maxlen + 8:
        std, outs = run_d(std, ddj)
        pieces.append(np.asarray(outs))
        done += chunk
        if not np.asarray(std["active"]).any():
            break
    dec_s = time.time() - t0
    allout = np.concatenate(pieces, axis=1)
    lengths = np.asarray(std["len"])
    back = [bytes(allout[i, : int(lengths[i])]) for i in range(L)]
    assert back == payloads, "round-trip mismatch"
    info["decode_MBps"] = round(tot / dec_s / 1e6, 3)
    info["ok"] = True
    save(f"{method}_L{L}_BS{BS}", info)


def main():
    import jax
    from zpaqfranz_tpu.parallel.engine import _enable_compile_cache
    _enable_compile_cache()
    save("backend", jax.default_backend())
    ladder = [
        ("3", 8, 4096),
        ("3", 64, 4096),
        ("4.0", 64, 4096),
        ("4.0", 256, 16384),
    ]
    for method, L, BS in ladder:
        try:
            stage(method, L, BS)
        except Exception as e:
            save(f"{method}_L{L}_BS{BS}_error",
                 {"error": f"{type(e).__name__}: {e}"[:500],
                  "tb": traceback.format_exc()[-800:]})


if __name__ == "__main__":
    main()
