"""On-chip microbenchmark of the arena codec's op classes at real shapes.

Round-5 finding: the "3" arena codec measures ~12.5 us per byte PER LANE
on the v5e (should be ~flat per byte-step across lanes per the round-3
mb_access.py numbers this engine was designed around).  This measures each
op class the per-bit loop issues, at the real (L, S) shapes, each inside a
jitted fori_loop of K dependent iterations so per-dispatch overhead
amortizes out.

Usage: python experiments/mb_arena_ops.py [L] [K]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    S8 = 133120          # "3" u8 arena (ICM 2k + ISSE 128k)
    S32 = 768
    LUTN = 37888
    print(f"backend={jax.default_backend()} L={L} K={K}", flush=True)

    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(0, 255, (L, S8), np.uint8))
    a32 = jnp.asarray(rng.integers(0, 2**31, (L, S32)).astype(np.uint32))
    lut = jnp.asarray(rng.integers(0, 32767, LUTN).astype(np.int32))

    def bench(name, fn, carry):
        f = jax.jit(lambda c: jax.lax.fori_loop(0, K, fn, c))
        r = f(carry)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, r)
        t0 = time.time()
        r = f(carry)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready")
            else x, r)
        dt = (time.time() - t0) / K
        print(f"{name:34s} {dt*1e6:9.2f} us/iter", flush=True)

    lanes = jnp.arange(L)

    # 1. u8 arena gather, 128 cols (nibble probe class)
    def g8(i, c):
        idx = (c[:, :128].astype(jnp.int32) + i) % (S8 - 1)
        v = jnp.take_along_axis(a8, idx, axis=1, mode="promise_in_bounds")
        return c + v.astype(jnp.uint32).sum(axis=1, keepdims=True)

    carry = jnp.zeros((L, 128), jnp.uint32)
    bench("u8 gather 128 cols", g8, carry)

    # 2. u32 arena gather, 4 cols
    def g32(i, c):
        idx = (c[:, :4].astype(jnp.int32) + i) % (S32 - 1)
        v = jnp.take_along_axis(a32, idx, axis=1, mode="promise_in_bounds")
        return c + v.sum(axis=1, keepdims=True)

    carry = jnp.zeros((L, 4), jnp.uint32)
    bench("u32 gather 4 cols", g32, carry)

    # 3. LUT gather (1D table), 6 cols
    def gl(i, c):
        idx = (c[:, :6].astype(jnp.int32) + i) % (LUTN - 1)
        v = lut.at[idx].get(mode="promise_in_bounds")
        return c + v.astype(jnp.uint32).sum(axis=1, keepdims=True)

    carry = jnp.zeros((L, 6), jnp.uint32)
    bench("LUT gather 6 cols", gl, carry)

    # 4. u32 arena scatter, 4 cols
    def s32f(i, c):
        a, acc = c
        idx = ((acc[:, :4].astype(jnp.int32) + i) % (S32 - 1))
        vals = acc[:, :4] + jnp.uint32(i)
        a = a.at[lanes[:, None], idx].set(vals, mode="promise_in_bounds",
                                          unique_indices=True)
        return a, acc + a[:, :4]

    bench("u32 scatter 4 cols", s32f, (a32, jnp.zeros((L, 4), jnp.uint32)))

    # 5. u8 arena scatter, 33 cols (row writeback class)
    def s8f(i, c):
        a, acc = c
        idx = ((acc[:, :33].astype(jnp.int32) + i * 16) % (S8 - 1))
        vals = (acc[:, :33] + jnp.uint32(i)).astype(jnp.uint8)
        a = a.at[lanes[:, None], idx].set(vals, mode="promise_in_bounds",
                                          unique_indices=True)
        return a, acc + a[:, :33].astype(jnp.uint32)

    bench("u8 scatter 33 cols", s8f, (a8, jnp.zeros((L, 33), jnp.uint32)))

    # 6. elementwise mixing-chain stand-in (~60 VPU ops on (L,))
    def ew(i, c):
        x = c
        for _ in range(20):
            x = (x * jnp.uint32(773) + jnp.uint32(512)) ^ (x >> 3)
        return x

    bench("elementwise x20 (L,)", ew, jnp.zeros(L, jnp.uint32))

    # 7. one-hot row read (L,16)
    row = jnp.asarray(rng.integers(0, 255, (L, 16), np.uint8))

    def rr(i, c):
        cols = jax.lax.broadcasted_iota(jnp.int32, row.shape, 1)
        m = cols == (c % 16).astype(jnp.int32)[:, None]
        return c + jnp.sum(jnp.where(m, row, 0).astype(jnp.uint32), axis=1)

    bench("one-hot row read (L,16)", rr, jnp.zeros(L, jnp.uint32))

    # 8. fori_loop(8) nesting overhead: trivial inner loop per iter
    def nest(i, c):
        return jax.lax.fori_loop(0, 8, lambda j, x: x + jnp.uint32(1), c)

    bench("nested fori(8) trivial", nest, jnp.zeros(L, jnp.uint32))

    # 9. lax.cond overhead at (L,) scale
    def cnd(i, c):
        return jax.lax.cond((i % 4) == 0, lambda x: x + jnp.uint32(1),
                            lambda x: x, c)

    bench("lax.cond trivial", cnd, jnp.zeros(L, jnp.uint32))


if __name__ == "__main__":
    main()
