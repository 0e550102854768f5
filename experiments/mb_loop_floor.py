"""Is there a fixed per-iteration cost for XLA loops on this platform?

Measures jit(fori_loop(0, K, trivial)) wall time vs K, plus scan and a
flat unrolled body, to separate per-iteration sync cost from dispatch.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    L = 256
    print("backend", jax.default_backend(), flush=True)
    c0 = jnp.zeros(L, jnp.uint32)

    def body(i, c):
        return c + jnp.uint32(1)

    for K in (64, 512, 4096):
        f = jax.jit(lambda c, K=K: jax.lax.fori_loop(0, K, body, c))
        f(c0).block_until_ready()
        t0 = time.time()
        f(c0).block_until_ready()
        dt = time.time() - t0
        print(f"fori K={K:5d}: total {dt*1e3:8.2f} ms  "
              f"{dt/K*1e6:8.2f} us/iter", flush=True)

    def sbody(c, x):
        return c + jnp.uint32(1), None

    for K in (64, 512, 4096):
        f = jax.jit(lambda c, K=K: jax.lax.scan(sbody, c, None, length=K)[0])
        f(c0).block_until_ready()
        t0 = time.time()
        f(c0).block_until_ready()
        dt = time.time() - t0
        print(f"scan K={K:5d}: total {dt*1e3:8.2f} ms  "
              f"{dt/K*1e6:8.2f} us/iter", flush=True)

    # unrolled flat body: same op count, no loop construct
    def unrolled(c):
        for _ in range(512):
            c = c + jnp.uint32(1)
        return c

    f = jax.jit(unrolled)
    f(c0).block_until_ready()
    t0 = time.time()
    f(c0).block_until_ready()
    dt = time.time() - t0
    print(f"unrolled 512 adds: total {dt*1e3:8.2f} ms  "
          f"{dt/512*1e6:8.2f} us/op", flush=True)

    # one big elementwise op for reference
    big = jnp.zeros((1 << 22,), jnp.float32)
    f = jax.jit(lambda x: x * 1.5 + 2.0)
    f(big).block_until_ready()
    t0 = time.time()
    for _ in range(10):
        big = f(big)
    big.block_until_ready()
    print(f"big elementwise (4M f32) x10: {(time.time()-t0)/10*1e6:8.2f} "
          f"us/dispatch", flush=True)


if __name__ == "__main__":
    main()
