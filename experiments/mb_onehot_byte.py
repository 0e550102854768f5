"""Simulate one decoded byte of the "3" chain with the one-hot op mix.

Round-5 finding: XLA:TPU serializes data-dependent take_along_axis at
~60ns x L x cols, making the arena engine ~3.2 ms/byte-step at L=256.
This prototypes the replacement op mix with TRUE dependent addresses:

  - hash-table probe: one-hot 64-byte-block select over (L, nblk, 64)
  - small u32 tables (cm/weights): one-hot read + where-write
  - LUTs: one-hot matvec
  - everything else elementwise

and measures a full simulated byte step (8 bit phases + 2 probes) per
iteration, so the number is directly comparable to the measured
3.2 ms/byte-step.

Usage: python experiments/mb_onehot_byte.py [L] [K]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    NBLK = 2048          # ISSE ht: 131072 B = 2048 x 64B blocks
    print(f"backend={jax.default_backend()} L={L} K={K}", flush=True)

    rng = np.random.default_rng(0)
    ht = jnp.asarray(rng.integers(0, 255, (L, NBLK, 64), np.uint8))
    cm_icm = jnp.asarray(rng.integers(0, 2**22, (L, 256)).astype(np.uint32))
    wt_isse = jnp.asarray(rng.integers(0, 2**20, (L, 512)).astype(np.uint32))
    stretch = jnp.asarray(rng.integers(-2047, 2047, 32768).astype(np.int32))
    squash = jnp.asarray(rng.integers(0, 32767, 4096).astype(np.int32))
    sns = jnp.asarray(rng.integers(0, 255, 1024).astype(np.int32))

    I32, U32, U8 = jnp.int32, jnp.uint32, jnp.uint8

    def onehot_read_rows(tab3, blk_idx):
        """(L, NBLK, 64) select one 64B block per lane: one-hot masked sum."""
        blocks = jax.lax.broadcasted_iota(I32, (L, NBLK), 1)
        m = (blocks == blk_idx[:, None])[..., None]
        return jnp.sum(jnp.where(m, tab3, 0).astype(U32), axis=1)  # (L,64)

    def onehot_write_rows(tab3, blk_idx, row64):
        blocks = jax.lax.broadcasted_iota(I32, (L, NBLK), 1)
        m = (blocks == blk_idx[:, None])[..., None]
        return jnp.where(m, row64[:, None, :].astype(U8), tab3)

    def onehot_read_small(tab, idx):
        """(L, S) u32 read one col per lane."""
        S = tab.shape[1]
        cols = jax.lax.broadcasted_iota(I32, (L, S), 1)
        m = cols == idx[:, None]
        return jnp.sum(jnp.where(m, tab, 0), axis=1)

    def onehot_write_small(tab, idx, val):
        S = tab.shape[1]
        cols = jax.lax.broadcasted_iota(I32, (L, S), 1)
        m = cols == idx[:, None]
        return jnp.where(m, val[:, None], tab)

    def lut1d(lut, idx):
        """shared 1D LUT, per-lane idx: one-hot matvec."""
        S = lut.shape[0]
        m = (jax.lax.broadcasted_iota(I32, (L, S), 1) == idx[:, None])
        return jnp.sum(jnp.where(m, lut[None, :], 0), axis=1)

    def byte_step(carry, _):
        ht, cm, wt, x = carry
        # --- 2 nibble probes (ICM + ISSE share the pattern; model 2 comps)
        rows = []
        for c in range(2):
            blk = ((x * np.uint32(2654435761 + c)) >> 21).astype(I32) % NBLK
            rows.append(onehot_read_rows(ht, blk))
        # --- 8 bit phases
        for bit in range(8):
            st0 = rows[0][:, bit % 16]          # staged row byte (elementwise)
            st1 = rows[1][:, (bit + 3) % 16]
            p_icm = lut1d(stretch, (onehot_read_small(cm, st0.astype(I32)
                                                      % 256) >> 8).astype(I32)
                          % 32768)
            w0 = onehot_read_small(wt, (st1.astype(I32) * 2) % 512)
            w1 = onehot_read_small(wt, (st1.astype(I32) * 2 + 1) % 512)
            p_isse = jnp.clip(((w0.astype(I32) * p_icm
                                + w1.astype(I32) * 64) >> 16), -2047, 2047)
            pf = lut1d(squash, (p_isse + 2048) % 4096)
            y = (pf ^ x.astype(I32)) & 1       # stand-in for the range coder
            # updates: 1 cm write + 2 wt writes + row nibble update
            cm = onehot_write_small(cm, st0.astype(I32) % 256,
                                    (pf + y).astype(U32))
            wt = onehot_write_small(wt, (st1.astype(I32) * 2) % 512,
                                    (w0 + y.astype(U32)))
            wt = onehot_write_small(wt, (st1.astype(I32) * 2 + 1) % 512,
                                    (w1 + 1))
            ns = lut1d(sns, (st0.astype(I32) * 4 + y) % 1024)
            rows[0] = rows[0].at[:, bit % 16].set(ns.astype(U32))
            x = x * 2 + y.astype(U32)
        # --- nibble writebacks (2 comps)
        for c in range(2):
            blk = ((x * np.uint32(2654435761 + c)) >> 21).astype(I32) % NBLK
            ht = onehot_write_rows(ht, blk, rows[c] & 255)
        return (ht, cm, wt, x), None

    f = jax.jit(lambda c: jax.lax.scan(byte_step, c, None, length=K)[0])
    carry = (ht, cm_icm, wt_isse, jnp.arange(L, dtype=U32))
    r = f(carry)
    jax.block_until_ready(r)
    t0 = time.time()
    r = f(carry)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / K
    print(f"one-hot byte step: {dt*1e6:9.1f} us/byte-step "
          f"(current engine: ~3200; aggregate {L/dt/1e6:.2f} MB/s at L={L})",
          flush=True)


if __name__ == "__main__":
    main()
