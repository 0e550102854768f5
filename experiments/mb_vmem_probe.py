"""Pallas-VMEM per-lane dynamic-slice probe cost with DEPENDENT indices.

The fused-kernel design's linchpin: per nibble, each lane reads a 16-byte
row at a data-dependent offset from its own (S,) table slice in VMEM and
writes it back.  Measures ns per lane-probe for the real "3"-chain shapes,
with the next index derived from the read (true dependency chain).

Usage: python experiments/mb_vmem_probe.py [L] [ITERS]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    SW = 32768            # ISSE ht as u32 words: 131072 B / 4
    W = 4                 # 16-byte row = 4 words
    print(f"backend={jax.default_backend()} L={L} ITERS={ITERS}", flush=True)

    # --- per-lane dynamic-slice RW over (L, SW) i32 in VMEM --------------
    def kernel(tab_ref, out_ref):
        def outer(it, acc):
            def lane(l, acc2):
                idx = (acc2 * 741103597 + l + it) % (SW - W)
                row = tab_ref[l, pl.ds(idx, W)]
                tab_ref[l, pl.ds(idx, W)] = row + 1
                return (acc2 + row[0]) % (1 << 20)
            return jax.lax.fori_loop(0, L, lane, acc)
        acc = jax.lax.fori_loop(0, ITERS, outer, jnp.int32(0))
        out_ref[0, 0] = acc

    @jax.jit
    def run(tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(tab)

    tab = jnp.zeros((L, SW), jnp.int32)
    try:
        r = run(tab)
        jax.block_until_ready(r)
        t0 = time.time()
        r = run(tab)
        jax.block_until_ready(r)
        dt = time.time() - t0
        per_lane = dt / ITERS / L * 1e9
        print(f"vmem lane-RW 16B row: {per_lane:8.1f} ns/lane-probe "
              f"({dt/ITERS*1e6:.2f} us per {L}-lane probe round)", flush=True)
    except Exception as e:
        print(f"vmem lane-RW FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # --- in-kernel one-hot LUT over (4096,) VMEM, (L,) queries -----------
    def kernel2(lut_ref, out_ref):
        def outer(it, acc):
            idx = (acc + it) % 4096          # (L,) dependent
            m = (jax.lax.broadcasted_iota(jnp.int32, (L, 4096), 1)
                 == idx[:, None])
            lutv = lut_ref[:]
            v = jnp.sum(jnp.where(m, lutv[None, :], 0), axis=1)
            return (acc + v) % (1 << 20)
        acc = jax.lax.fori_loop(0, ITERS * 8, outer,
                                jax.lax.broadcasted_iota(jnp.int32, (L,), 0))
        out_ref[0, :] = acc

    @jax.jit
    def run2(lut):
        return pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lut)

    lut = jnp.arange(4096, dtype=jnp.int32)
    try:
        r = run2(lut)
        jax.block_until_ready(r)
        t0 = time.time()
        r = run2(lut)
        jax.block_until_ready(r)
        dt = time.time() - t0
        print(f"vmem one-hot 4096 LUT: {dt/(ITERS*8)*1e6:8.2f} us/query-round "
              f"(all {L} lanes)", flush=True)
    except Exception as e:
        print(f"vmem one-hot FAIL {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
