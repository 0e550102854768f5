"""Validate the arena-gather design: per-op latency vs lane count and
multi-index gathers/scatters (one op fetching k slots per lane)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 256


def timeit(fn, *args, reps=5):
    out = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e9


for L in [128, 512, 1024, 2048]:
    for S, k in [(1 << 18, 1), (1 << 18, 16), (1 << 22, 16), (1 << 18, 64)]:
        tab = jnp.zeros((L, S), jnp.uint32)
        base = (jnp.arange(L, dtype=jnp.int32)[:, None] * 977 +
                jnp.arange(k, dtype=jnp.int32)[None, :] * (S // k)) % S

        @jax.jit
        def g(tab, base):
            def body(acc, i):
                idx = (base + i * 7919) % S
                v = jnp.take_along_axis(tab, idx, axis=1)
                return acc + jnp.sum(v, axis=1), None
            acc, _ = jax.lax.scan(body, jnp.zeros(L, jnp.uint32),
                                  jnp.arange(ITERS, dtype=jnp.int32))
            return acc

        ns = timeit(g, tab, base)
        print(f"gather  L={L:5d} S=2^{int(np.log2(S))} k={k:3d}: {ns:8.1f} ns/op")

        @jax.jit
        def s(tab, base):
            lanes = jnp.arange(tab.shape[0])
            def body(tab, i):
                idx = (base + i * 7919) % S
                tab = tab.at[lanes[:, None], idx].set(jnp.uint32(1))
                return tab, None
            tab, _ = jax.lax.scan(body, tab, jnp.arange(ITERS, dtype=jnp.int32))
            return tab

        ns = timeit(s, tab, base)
        print(f"scatter L={L:5d} S=2^{int(np.log2(S))} k={k:3d}: {ns:8.1f} ns/op")

# dependent gather->math->scatter chain, the real per-bit shape
for L in [512, 1024]:
    S = 1 << 18
    k = 16
    tab = jnp.zeros((L, S), jnp.uint32)
    base = (jnp.arange(L, dtype=jnp.int32)[:, None] * 977 +
            jnp.arange(k, dtype=jnp.int32)[None, :] * (S // k)) % S

    @jax.jit
    def chain(tab, base):
        lanes = jnp.arange(L)
        def body(carry, i):
            tab, acc = carry
            idx = (base + (i + acc[0]).astype(jnp.int32) * 7919) % S
            v = jnp.take_along_axis(tab, idx, axis=1)
            v2 = v * 3 + 1
            tab = tab.at[lanes[:, None], idx].set(v2)
            return (tab, acc + jnp.sum(v2, axis=1) % 3), None
        (tab, acc), _ = jax.lax.scan(
            body, (tab, jnp.zeros(L, jnp.uint32)),
            jnp.arange(ITERS, dtype=jnp.int32))
        return acc

    ns = timeit(chain, tab, base)
    print(f"dep chain g+s L={L} k={k}: {ns:8.1f} ns per (gather+scatter)")
