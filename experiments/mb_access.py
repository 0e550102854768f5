"""Microbenchmarks: per-lane dynamic table access mechanisms on TPU.

Decides the architecture of the fused Pallas codec kernel (VERDICT r3 #1).
The CM hot loop is per-lane random table access; this measures every
candidate mechanism on the real chip:

  A. in-Pallas VMEM gather: take_along_axis(table (S,L), idx (1,L), axis=0)
  B. in-Pallas one-hot gather (iota-compare + masked sum)
  C. in-Pallas select-pass write (iota-compare + where) = "scatter"
  D. in-Pallas per-lane fori_loop dynamic-slice row read/write
  E. in-Pallas per-lane HBM->VMEM DMA (row stage)
  F. XLA-level take_along_axis / .at[].set on (L, S)

Each kernel runs ITERS dependent iterations internally so per-call overhead
amortizes; reported number is ns per iteration (all lanes).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 128          # lanes
ITERS = 256      # dependent iterations inside kernel


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e9  # ns per iter


def report(name, ns):
    print(f"{name:55s} {ns:10.1f} ns/iter  ({ns/L:6.2f} ns/lane)")


# ---------------------------------------------------------------- A: vmem gather
def mk_gather_kernel(S, dtype):
    def kernel(tab_ref, idx_ref, out_ref):
        def body(i, acc):
            idx = (idx_ref[0, :] + acc.astype(jnp.int32)) % S
            row = jnp.take_along_axis(tab_ref[:, :], idx[None, :], axis=0)[0]
            return acc + row.astype(jnp.int32)
        acc = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((L,), jnp.int32))
        out_ref[0, :] = acc

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    return run


def bench_A():
    for S, dt in [(256, jnp.uint8), (2048, jnp.uint8), (8192, jnp.uint8),
                  (512, jnp.int32), (8192, jnp.int32)]:
        tab = jnp.arange(S * L, dtype=jnp.int32).reshape(S, L).astype(dt)
        idx = jnp.arange(L, dtype=jnp.int32)[None, :] % S
        try:
            run = mk_gather_kernel(S, dt)
            ns = timeit(run, tab, idx)
            report(f"A vmem take_along_axis S={S} {dt.__name__}", ns)
        except Exception as e:
            print(f"A vmem take_along_axis S={S} {dt.__name__}: FAIL "
                  f"{type(e).__name__}: {str(e)[:200]}")


# ---------------------------------------------------------------- B: one-hot gather
def mk_onehot_kernel(S, dtype):
    def kernel(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:, :].astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
        def body(i, acc):
            idx = (idx_ref[0, :] + acc) % S
            m = rows == idx[None, :]
            row = jnp.sum(jnp.where(m, tab, 0), axis=0)
            return acc + row
        acc = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((L,), jnp.int32))
        out_ref[0, :] = acc

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    return run


def bench_B():
    for S, dt in [(256, jnp.uint8), (2048, jnp.uint8), (512, jnp.int32)]:
        tab = jnp.arange(S * L, dtype=jnp.int32).reshape(S, L).astype(dt)
        idx = jnp.arange(L, dtype=jnp.int32)[None, :] % S
        try:
            run = mk_onehot_kernel(S, dt)
            ns = timeit(run, tab, idx)
            report(f"B onehot gather S={S} {dt.__name__}", ns)
        except Exception as e:
            print(f"B onehot gather S={S} {dt.__name__}: FAIL "
                  f"{type(e).__name__}: {str(e)[:200]}")


# ---------------------------------------------------------------- C: select-pass write
def mk_selwrite_kernel(S, dtype):
    def kernel(tab_ref, idx_ref, out_ref):
        rows = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)
        def body(i, carry):
            idx = (idx_ref[0, :] + i) % S
            m = rows == idx[None, :]
            tab_ref[:, :] = jnp.where(
                m, (carry[None, :] & 0xFF).astype(tab_ref.dtype), tab_ref[:, :])
            return carry + 1
        acc = jax.lax.fori_loop(0, ITERS, body, jnp.zeros((L,), jnp.int32))
        out_ref[0, :] = acc + tab_ref[0, :].astype(jnp.int32)

    @jax.jit
    def run(tab, idx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(tab, idx)
    return run


def bench_C():
    for S, dt in [(256, jnp.uint8), (2048, jnp.uint8), (8192, jnp.uint8),
                  (512, jnp.int32)]:
        tab = jnp.zeros((S, L), dt)
        idx = jnp.arange(L, dtype=jnp.int32)[None, :] % S
        try:
            run = mk_selwrite_kernel(S, dt)
            ns = timeit(run, tab, idx)
            report(f"C select-pass write S={S} {dt.__name__}", ns)
        except Exception as e:
            print(f"C select-pass write S={S} {dt.__name__}: FAIL "
                  f"{type(e).__name__}: {str(e)[:200]}")


# ------------------------------------------------- D: per-lane dynamic slice loop
def mk_lane_loop_kernel(S, W):
    # table (L, S) u8; per lane read a W-wide row at idx[l] and write it back+1
    def kernel(idx_ref, tab_ref, out_ref):
        def outer(it, acc):
            def lane_body(l, acc2):
                idx = idx_ref[l, 0]
                row = tab_ref[l, pl.ds(idx, W)]
                tab_ref[l, pl.ds(idx, W)] = row + jnp.uint8(1)
                return acc2 + row[0].astype(jnp.int32)
            return jax.lax.fori_loop(0, L, lane_body, acc)
        acc = jax.lax.fori_loop(0, ITERS // 8, outer, jnp.int32(0))
        out_ref[0, 0] = acc

    @jax.jit
    def run(idx, tab):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(idx, tab)
    return run


def bench_D():
    for S, W in [(2048, 16), (131072, 16)]:
        tab = jnp.zeros((L, S), jnp.uint8)
        idx = (jnp.arange(L, dtype=jnp.int32)[:, None] * 16) % S
        try:
            run = mk_lane_loop_kernel(S, W)
            ns = timeit(run, idx, tab) * 8 / L  # per outer-iter per lane... report raw
            report(f"D lane-loop RW row S={S} W={W} (ns per lane-rw)", ns)
        except Exception as e:
            print(f"D lane-loop RW S={S}: FAIL {type(e).__name__}: {str(e)[:300]}")


# ------------------------------------------------- E: per-lane HBM DMA stage
def mk_dma_kernel(S, W):
    def kernel(idx_ref, hbm_ref, out_ref):
        def body(scratch, sem):
            def outer(it, acc):
                def lane_body(l, acc2):
                    idx = idx_ref[l, 0]
                    cp = pltpu.make_async_copy(
                        hbm_ref.at[l, pl.ds(idx, W)],
                        scratch.at[l, :], sem)
                    cp.start()
                    cp.wait()
                    return acc2 + scratch[l, 0].astype(jnp.int32)
                return jax.lax.fori_loop(0, L, lane_body, acc)
            acc = jax.lax.fori_loop(0, ITERS // 8, outer, jnp.int32(0))
            out_ref[0, 0] = acc
        pl.run_scoped(body,
                      scratch=pltpu.VMEM((L, W), jnp.uint8),
                      sem=pltpu.SemaphoreType.DMA(()))

    @jax.jit
    def run(idx, hbm):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(idx, hbm)
    return run


def bench_E():
    for S, W in [(1 << 20, 64)]:
        hbm = jnp.zeros((L, S), jnp.uint8)
        idx = (jnp.arange(L, dtype=jnp.int32)[:, None] * 4096) % S
        try:
            run = mk_dma_kernel(S, W)
            ns = timeit(run, idx, hbm) * 8 / L
            report(f"E per-lane HBM DMA W={W} (ns per lane-dma)", ns)
        except Exception as e:
            print(f"E per-lane DMA: FAIL {type(e).__name__}: {str(e)[:300]}")


# ------------------------------------------------- F: XLA gather / scatter
def bench_F():
    for S in [1 << 14, 1 << 18]:
        tab = jnp.zeros((L, S), jnp.uint32)
        idx0 = jnp.arange(L, dtype=jnp.int32)

        @jax.jit
        def g(tab, idx0):
            def body(acc, i):
                idx = (idx0 + i) % S
                v = jnp.take_along_axis(tab, idx[:, None], axis=1)[:, 0]
                return acc + v, None
            acc, _ = jax.lax.scan(body, jnp.zeros(L, jnp.uint32),
                                  jnp.arange(ITERS, dtype=jnp.int32))
            return acc

        ns = timeit(g, tab, idx0)
        report(f"F xla take_along_axis (L,{S}) u32", ns)

        @jax.jit
        def s(tab, idx0):
            lanes = jnp.arange(L)
            def body(tab, i):
                idx = (idx0 + i) % S
                tab = tab.at[lanes, idx].set(jnp.uint32(1))
                return tab, None
            tab, _ = jax.lax.scan(body, tab, jnp.arange(ITERS, dtype=jnp.int32))
            return tab

        ns = timeit(s, tab, idx0)
        report(f"F xla scatter .at.set (L,{S}) u32", ns)


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}, L={L}, ITERS={ITERS}")
    bench_A()
    bench_B()
    bench_C()
    bench_D()
    bench_E()
    bench_F()
