"""Batched binary arithmetic coder: L independent ZPAQ streams per step.

Vectorized mirror of the scalar oracle (``codec.container.Decoder`` /
``codec.writer.Encoder``; behavioral reference
/root/reference/ZSFX/libzpaq.cpp:2082-2173).  Each lane carries its own
(low, high, curr) range state and a cursor into its private byte stream; the
range split uses the 32-bit split-product identity

    (hl * p) >> 16  ==  (hl >> 16) * p + ((hl & 0xFFFF) * p >> 16)

so no 64-bit arithmetic is needed on TPU.  Renormalization consumes at most
4 bytes per bit and is unrolled as 4 predicated vector steps.

The byte loops are ``lax.scan``s over the *maximum* stream length; lanes that
hit end-of-stream (or their own shorter length) are frozen by masking the
whole state tree.  One scan step = 1 EOS bit + 8 (predict, code, update)
bit-phases + 1 batched HCOMP run — the whole decode/encode hot path is a
single fused XLA computation.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..zpaql.header import Model
from .predictor_batched import BatchedPredictor

U32, U8, I32 = jnp.uint32, jnp.uint8, jnp.int32


def _tree_where(mask: jax.Array, new, old):
    """Select new/old per lane across a whole state pytree."""
    def sel(n, o):
        m = mask.reshape((-1,) + (1,) * (n.ndim - 1))
        return jnp.where(m, n, o)
    return jax.tree_util.tree_map(sel, new, old)


def _range_split(low, high, p):
    """mid = low + ((high-low) * p) >> 16 without 64-bit math."""
    hl = high - low
    return low + (hl >> 16) * p + (((hl & np.uint32(0xFFFF)) * p) >> 16)


class DecState(NamedTuple):
    low: jax.Array    # (L,) u32
    high: jax.Array   # (L,) u32
    curr: jax.Array   # (L,) u32
    pos: jax.Array    # (L,) i32 cursor into data


def _read_byte(data: jax.Array, pos: jax.Array) -> jax.Array:
    """data (L, N) u8, pos (L,) -> (L,) u32; out-of-range reads 0."""
    idx = jnp.clip(pos, 0, data.shape[1] - 1)
    b = jnp.take_along_axis(data, idx[:, None], axis=1)[:, 0]
    return jnp.where(pos < data.shape[1], b, 0).astype(U32)


def _renorm_dec(ds: DecState, data: jax.Array, active=None) -> DecState:
    low, high, curr, pos = ds
    for _ in range(4):
        go = (high ^ low) < np.uint32(1 << 24)
        if active is not None:
            go = go & active
        byte = _read_byte(data, pos)
        high = jnp.where(go, (high << 8) | 255, high)
        low2 = low << 8
        low2 = low2 + (low2 == 0).astype(U32)
        low = jnp.where(go, low2, low)
        curr = jnp.where(go, (curr << 8) | byte, curr)
        pos = pos + go.astype(I32)
    return DecState(low, high, curr, pos)


def _decode_bit(ds: DecState, p: jax.Array, data: jax.Array, active=None
                ) -> Tuple[jax.Array, DecState]:
    """Decode one bit per lane at probability p (L,) u32 of a 1.
    Inactive lanes keep their range state and consume no input."""
    mid = _range_split(ds.low, ds.high, p)
    y = ds.curr <= mid
    high = jnp.where(y, mid, ds.high)
    low = jnp.where(y, ds.low, mid + 1)
    if active is not None:
        high = jnp.where(active, high, ds.high)
        low = jnp.where(active, low, ds.low)
    ds = _renorm_dec(DecState(low, high, ds.curr, ds.pos), data, active)
    return y, ds


class BatchedDecoder:
    """Decodes L modeled segment streams in lockstep on device.

    ``data`` is (L, N) u8: each lane's arithmetic-coded payload (the bytes
    after the segment header, including the 4 preloaded bytes).  Outputs the
    decoded (pre-postprocessing) bytes, (L, max_out) u8, plus per-lane
    decoded lengths.
    """

    def __init__(self, model: Model, max_hcomp_steps: int | None = None):
        if model.n == 0:
            raise ValueError("store-mode blocks decode on the host path")
        self.model = model
        self.pred = BatchedPredictor(model, max_hcomp_steps)

    def init_state(self, data: jax.Array) -> Dict:
        L = data.shape[0]
        pos = jnp.zeros(L, I32)
        curr = jnp.zeros(L, U32)
        ds = DecState(jnp.ones(L, U32), jnp.full(L, 0xFFFFFFFF, U32), curr, pos)
        # preload 4 bytes into curr (reference Decoder::decompress init)
        for _ in range(4):
            byte = _read_byte(data, ds.pos)
            ds = DecState(ds.low, ds.high, (ds.curr << 8) | byte, ds.pos + 1)
        return {"pred": self.pred.init_state(L), "dec": ds,
                "active": jnp.ones(L, bool)}

    def decode_byte(self, st: Dict, data: jax.Array) -> Tuple[Dict, jax.Array]:
        """One lockstep byte across lanes; returns (state, byte|-1 per lane).

        Frozen/EOS lanes never touch their model tables (dropped scatters)
        or consume input — no whole-state merges, so the per-byte cost is
        O(active work), not O(model size)."""
        ds = st["dec"]
        ps = st["pred"]
        active = st["active"]
        L = active.shape[0]
        # EOS bit at p=0
        eos, ds = _decode_bit(ds, jnp.zeros(L, U32), data, active)
        live = active & ~eos
        c = jnp.ones(L, U32)
        for phase in range(8):
            p_final, p, ps = self.pred.predict(ps, phase, live)
            p2 = (p_final.astype(U32) * 2 + 1)
            y, ds = _decode_bit(ds, p2, data, live)
            c = c * 2 + y.astype(U32)
            ps = self.pred.update(ps, p, y, phase, live)
        byte = (c - 256).astype(I32)
        out = jnp.where(live, byte, -1)
        return {"pred": ps, "dec": ds, "active": live}, out

    def decode(self, data: jax.Array, max_bytes: int
               ) -> Tuple[jax.Array, jax.Array, Dict]:
        """Decode up to max_bytes per lane. Returns (out (L, max_bytes) u8,
        lengths (L,) i32, final state)."""
        st = self.init_state(data)

        def step(st, _):
            st, out = self.decode_byte(st, data)
            return st, out

        st, outs = jax.lax.scan(step, st, None, length=max_bytes)
        outs = outs.T  # (L, max_bytes)
        lengths = jnp.sum(outs >= 0, axis=1).astype(I32)
        return jnp.maximum(outs, 0).astype(U8), lengths, st


class EncState(NamedTuple):
    low: jax.Array    # (L,) u32
    high: jax.Array   # (L,) u32
    out: jax.Array    # (L, cap) u8
    cnt: jax.Array    # (L,) i32 bytes emitted


def _emit(es: EncState, byte: jax.Array, go: jax.Array) -> EncState:
    # vectorized single-slot write on TPU (scatters serialize on the scalar
    # core; one iota-compare pass over the output buffer is far cheaper);
    # native scatter elsewhere — see predictor_batched._use_where
    from .predictor_batched import _use_where
    L, cap = es.out.shape
    if _use_where(cap, L):
        cols = jnp.broadcast_to(jnp.arange(cap, dtype=I32)[None, :], (L, cap))
        m = (cols == es.cnt[:, None]) & go[:, None]
        out = jnp.where(m, byte.astype(U8)[:, None], es.out)
    else:
        lanes = jnp.arange(L)
        idx = jnp.where(go & (es.cnt < cap), es.cnt, cap)
        out = es.out.at[lanes, idx].set(byte.astype(U8), mode="drop")
    return EncState(es.low, es.high, out, es.cnt + go.astype(I32))


def _encode_bit(es: EncState, y: jax.Array, p: jax.Array,
                active=None) -> EncState:
    """Encode one bit per lane; inactive lanes keep range state and emit
    nothing (masked emission, no state merges)."""
    mid = _range_split(es.low, es.high, p)
    high = jnp.where(y, mid, es.high)
    low = jnp.where(y, es.low, mid + 1)
    if active is not None:
        high = jnp.where(active, high, es.high)
        low = jnp.where(active, low, es.low)
    es = EncState(low, high, es.out, es.cnt)
    for _ in range(4):
        go = (es.high ^ es.low) < np.uint32(1 << 24)
        if active is not None:
            go = go & active
        es = _emit(es, (es.high >> 24) & 255, go)
        high = jnp.where(go, (es.high << 8) | 255, es.high)
        low2 = es.low << 8
        low2 = low2 + (low2 == 0).astype(U32)
        low = jnp.where(go, low2, es.low)
        es = EncState(low, high, es.out, es.cnt)
    return es


class BatchedEncoder:
    """Encodes L byte streams (same model) in lockstep on device.

    ``data`` (L, N) u8 with per-lane lengths (L,); lane j encodes its first
    lengths[j] bytes then its EOS bit.  Output is per-lane coded bytes.
    The first bytes of each stream must already include the postprocessor
    selector (0 for PASS / 1 + psize + pcomp) exactly as the scalar
    BlockWriter codes them — the caller prepends those.
    """

    def __init__(self, model: Model, out_cap: int,
                 max_hcomp_steps: int | None = None):
        if model.n == 0:
            raise ValueError("store-mode blocks encode on the host path")
        self.model = model
        self.out_cap = out_cap
        self.pred = BatchedPredictor(model, max_hcomp_steps)

    def init_state(self, n_lanes: int) -> Dict:
        L = n_lanes
        es = EncState(jnp.ones(L, U32), jnp.full(L, 0xFFFFFFFF, U32),
                      jnp.zeros((L, self.out_cap), U8), jnp.zeros(L, I32))
        return {"pred": self.pred.init_state(L), "enc": es}

    def encode_byte(self, st: Dict, byte: jax.Array, is_data: jax.Array,
                    is_eos: jax.Array) -> Dict:
        """One lockstep byte: lanes with is_data encode byte, lanes with
        is_eos encode the end marker, others are frozen (masked scatters —
        no whole-state merges)."""
        es, ps = st["enc"], st["pred"]
        L = byte.shape[0]
        zero = jnp.zeros(L, U32)
        # leading bit: 1 = EOS, 0 = byte follows (both at p=0)
        es = _encode_bit(es, is_eos, zero, is_data | is_eos)
        c = byte.astype(U32)
        for phase in range(8):
            p_final, p, ps = self.pred.predict(ps, phase, is_data)
            p2 = (p_final.astype(U32) * 2 + 1)
            y = (c >> (7 - phase)) & 1
            yb = y.astype(bool)
            es = _encode_bit(es, yb, p2, is_data)
            ps = self.pred.update(ps, p, yb, phase, is_data)
        return {"pred": ps, "enc": es}

    def encode(self, data: jax.Array, lengths: jax.Array) -> Dict:
        """Encode all lanes; scan of max(len)+1 steps. Returns final state
        (coded bytes in state['enc'].out / .cnt)."""
        st = self.init_state(data.shape[0])
        n_steps = data.shape[1] + 1

        def step(st, j):
            byte = _read_byte(data, jnp.full(data.shape[0], j, I32))
            is_data = j < lengths
            is_eos = j == lengths
            return self.encode_byte(st, byte, is_data, is_eos), None

        st, _ = jax.lax.scan(step, st, jnp.arange(n_steps))
        return st
