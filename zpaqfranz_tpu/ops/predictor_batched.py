"""Batched ZPAQ predictor: L independent streams per step, pure JAX.

The nine component types (CONST, CM, ICM, MATCH, AVG, MIX2, MIX, ISSE, SSE)
with the exact integer semantics of the scalar oracle
(``models.predictor.Predictor``; behavioral reference
/root/reference/ZSFX/libzpaq.cpp:1715-2080), vmapped by construction: every
per-stream scalar becomes an (L,) vector, every per-stream table an (L, size)
array, and the component chain — static per model — is unrolled at trace time
into straight-line vector code.

Key structural trick: streams are processed in *byte lockstep* (all lanes are
always at the same bit position of their current byte), so the partial-byte
counter ``c8`` has the same magnitude in every lane. All branches on c8
(ICM/ISSE hash-table re-probe at nibble starts, the hmap4 nibble update, the
HCOMP run at byte end) are therefore static per bit phase 0..7 — no per-lane
control flow in the hot path.

State layout: a flat dict pytree keyed 'c8','hmap4','h','vm', plus per
component i 'cxt{i}','a{i}','b{i}','c{i}','lim{i}' scalars-per-lane and
'cm{i}'/'ht{i}'/'a16{i}' tables. Scannable and shardable (lane axis 0).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import tables as T
from ..zpaql.header import Model
from .vm_batched import BatchedVM, VMState, init_vm_state

U32, U8, I32, I16 = jnp.uint32, jnp.uint8, jnp.int32, jnp.int16

# LUT host constants; converted lazily so importing this module never
# initializes a JAX backend (the env may pin JAX_PLATFORMS before we run).
_NP_SQUASHT = T.SQUASHT.astype(np.int32)
_NP_STRETCHT = T.STRETCHT.astype(np.int32)


class _LUTProxy:
    """Indexable view that materializes the LUT as a traced constant at each
    use site (never caches jnp arrays, so no backend init at import and no
    tracer leakage across jit scopes)."""

    def __init__(self, np_arr):
        self._np = np_arr

    def __getitem__(self, idx):
        return jnp.asarray(self._np)[idx]

    def __jax_array__(self):
        return jnp.asarray(self._np)


_SQUASHT = _LUTProxy(_NP_SQUASHT)
_STRETCHT = _LUTProxy(_NP_STRETCHT)
_DT = _LUTProxy(T.DT)
_DT2K = _LUTProxy(T.DT2K)
_SNS = _LUTProxy(T.SNS)
_CMINIT = _LUTProxy(T.CMINIT)


def _gather(tab: jax.Array, idx: jax.Array) -> jax.Array:
    """tab (L, S), idx (L,) -> (L,) gather along axis 1."""
    return jnp.take_along_axis(tab, idx.astype(I32)[:, None], axis=1)[:, 0]


def _midx(idx: jax.Array, active, size: int) -> jax.Array:
    """Scatter index masked by lane activity: inactive lanes get an
    out-of-range index and mode='drop' skips the write. This keeps frozen
    lanes' tables untouched WITHOUT whole-table select copies (the O(table)
    per-byte cost that killed the first TPU runs)."""
    idx = idx.astype(I32)
    if active is None:
        return idx
    return jnp.where(active, idx, jnp.int32(size))


# TPU scatter strategy. XLA:TPU lowers per-lane scatters to a serialized
# scalar-core loop (~0.1 us per lane PER OP measured on v5e), which made the
# original per-bit update path ~1000x slower than the VPU math around it.
# Gathers, by contrast, use the fast vector path. So for tables up to
# _WHERE_MAX elements per lane we write via a full-row vectorized select
# (iota compare + where): one VPU/HBM pass over (L, S), independent of how
# many lanes hit which rows. Beyond that, the serialized scatter wins again
# (the pass cost grows with S); big-table models pay it, TPU-profile models
# (all tables <= _WHERE_MAX) run entirely scatter-free.
#
# On CPU the opposite holds (native scatters are cheap, full-table passes
# are not), so the strategy is backend-dependent at trace time;
# ZPAQFRANZ_SCATTER=where|at overrides (tests cover both paths).
_WHERE_MAX = 1 << 15
# total-work budget: a where-pass touches L*S elements per op, so at high
# lane counts even small tables lose to the serialized scatter (measured
# on v5e: L=1024 with 32K tables went 10x slower via where-passes)
_WHERE_BUDGET = 1 << 21


def _use_where(S: int, L: int = 64) -> bool:
    import os
    mode = os.environ.get("ZPAQFRANZ_SCATTER", "auto")
    if mode == "at":
        return False
    if mode == "where":
        return S <= _WHERE_MAX
    return (jax.default_backend() == "tpu" and S <= _WHERE_MAX
            and L * S <= _WHERE_BUDGET)


def _scatter1(tab: jax.Array, idx: jax.Array, val: jax.Array, active
              ) -> jax.Array:
    """Write val[l] at tab[l, idx[l]] for active lanes."""
    L, S = tab.shape
    if _use_where(S, L):
        cols = jax.lax.broadcasted_iota(I32, (L, S), 1)
        m = cols == idx.astype(I32)[:, None]
        if active is not None:
            m = m & active[:, None]
        return jnp.where(m, val.astype(tab.dtype)[:, None], tab)
    lanes = jnp.arange(L)
    return tab.at[lanes, _midx(idx, active, S)].set(
        val.astype(tab.dtype), mode="drop")


def _scatter_pair(tab: jax.Array, idx2: jax.Array, v0: jax.Array,
                  v1: jax.Array, active) -> jax.Array:
    """Write v0 at tab[l, 2*k] and v1 at tab[l, 2*k+1] where idx2 = 2*k
    (the ISSE weight-pair layout) in a single table pass."""
    L, S = tab.shape
    if _use_where(S, L):
        cols = jax.lax.broadcasted_iota(I32, (L, S), 1)
        mrow = (cols >> 1) == (idx2.astype(I32) >> 1)[:, None]
        if active is not None:
            mrow = mrow & active[:, None]
        v = jnp.where((cols & 1) == 0, v0.astype(tab.dtype)[:, None],
                      v1.astype(tab.dtype)[:, None])
        return jnp.where(mrow, v, tab)
    lanes = jnp.arange(L)
    tab = tab.at[lanes, _midx(idx2, active, S)].set(
        v0.astype(tab.dtype), mode="drop")
    return tab.at[lanes, _midx(idx2 + 1, active, S)].set(
        v1.astype(tab.dtype), mode="drop")


def _scatter_row(tab: jax.Array, base: jax.Array, row: jax.Array, active
                 ) -> jax.Array:
    """Write a contiguous W-wide row at tab[l, base[l]:base[l]+W]; base must
    be W-aligned. Single pass via a (L, S/W, W) reshape when small."""
    L, S = tab.shape
    W = row.shape[1]
    if _use_where(S, L) and S % W == 0:
        t3 = tab.reshape(L, S // W, W)
        rows = jax.lax.broadcasted_iota(I32, (L, S // W), 1)
        m = rows == (base.astype(I32) // W)[:, None]
        if active is not None:
            m = m & active[:, None]
        t3 = jnp.where(m[:, :, None], row.astype(tab.dtype)[:, None, :], t3)
        return t3.reshape(L, S)
    lanes = jnp.arange(L)
    cols = base.astype(I32)[:, None] + jnp.arange(W)[None, :]
    if active is not None:
        cols = jnp.where(active[:, None], cols, jnp.int32(S))
    return tab.at[lanes[:, None], cols].set(
        row.astype(tab.dtype), mode="drop")


def _sel(active, new, old):
    """Per-lane scalar merge; identity when no mask."""
    if active is None:
        return new
    m = active.reshape((-1,) + (1,) * (new.ndim - 1))
    return jnp.where(m, new, old)


def _clamp2k(x):
    return jnp.clip(x, -2048, 2047)


def _clamp512k(x):
    return jnp.clip(x, -(1 << 19), (1 << 19) - 1)


def _find(ht: jax.Array, sizebits: int, cxt: jax.Array, mask: jax.Array
          ) -> Tuple[jax.Array, jax.Array]:
    """Batched ICM/ISSE hash-table probe (reference libzpaq.cpp:2060-2080).

    ht (L, S) u8, cxt (L,) u32, mask (L,) bool: lanes where the probe runs.
    Returns (new_ht, row_index (L,) i32); non-masked lanes leave ht unchanged
    and their returned index is unspecified (caller selects the old one).
    """
    L, S = ht.shape
    lanes = jnp.arange(L)
    chk = ((cxt >> sizebits) & 255).astype(U8)
    h0 = ((cxt * 16) & np.uint32(S - 16)).astype(I32)
    h1 = h0 ^ 16
    h2 = h0 ^ 32
    c0, c1, c2 = _gather(ht, h0), _gather(ht, h1), _gather(ht, h2)
    p0, p1, p2 = _gather(ht, h0 + 1), _gather(ht, h1 + 1), _gather(ht, h2 + 1)
    m0, m1, m2 = c0 == chk, c1 == chk, c2 == chk
    hit = jnp.where(m0, h0, jnp.where(m1, h1, h2))
    any_match = m0 | m1 | m2
    # LRU-ish replacement: lowest count, ties prefer h0 then h1
    rep = jnp.where((p0 <= p1) & (p0 <= p2), h0, jnp.where(p1 < p2, h1, h2))
    idx = jnp.where(any_match, hit, rep)
    # on replacement: zero the 16-byte row, then set its checksum byte
    need_clear = mask & ~any_match
    fresh = jnp.concatenate(
        [chk[:, None], jnp.zeros((L, 15), U8)], axis=1)
    new_ht = _scatter_row(ht, idx, fresh, need_clear)
    return new_ht, idx


class BatchedPredictor:
    """Builds init/predict/update over L lanes for one model (static COMP)."""

    def __init__(self, model: Model, max_hcomp_steps: int | None = None):
        self.model = model
        self.n = model.n
        self.comps: List[tuple] = [tuple(c) for c in model.comps]
        if self.n:
            self.vm = BatchedVM(model.hcomp, model.hh, model.hm,
                                max_steps=max_hcomp_steps)
        # h indices are read through the hmask (oracle predictor.py:258)
        self.hmask = (1 << model.hh) - 1

    # ------------------------------------------------------------------
    def init_state(self, n_lanes: int) -> Dict[str, jax.Array]:
        L = n_lanes
        st: Dict[str, jax.Array] = {
            "c8": jnp.ones(L, U32),
            "hmap4": jnp.ones(L, U32),
            "h": jnp.zeros((L, max(self.n, 1)), U32),
            "vm": init_vm_state(L, self.model.hh, self.model.hm),
        }
        for i, cp in enumerate(self.comps):
            t = cp[0]
            # underscore-separated keys: f"c{i}" at i=8 collided with the
            # partial-byte counter "c8", silently zeroing it every predict
            # for any model with >= 9 components (m4/m5) — device streams
            # round-tripped but were not format-identical to the host engine
            for k in ("cxt", "a", "b", "c", "lim"):
                st[f"{k}_{i}"] = jnp.zeros(L, U32)
            if t == T.CM:
                st[f"cm{i}"] = jnp.full((L, 1 << cp[1]), 0x80000000, U32)
            elif t == T.ICM:
                st[f"cm{i}"] = jnp.broadcast_to(_CMINIT, (L, 256)) + 0
                st[f"ht{i}"] = jnp.zeros((L, 64 << cp[1]), U8)
            elif t == T.MATCH:
                st[f"cm{i}"] = jnp.zeros((L, 1 << cp[1]), U32)
                st[f"ht{i}"] = jnp.zeros((L, 1 << cp[2]), U8).at[:, 0].set(1)
            elif t == T.MIX2:
                st[f"a16{i}"] = jnp.full((L, 1 << cp[1]), 32768, I32)
            elif t == T.MIX:
                m = cp[3]
                st[f"cm{i}"] = jnp.full((L, m << cp[1]), 65536 // m, I32)
            elif t == T.ISSE:
                st[f"ht{i}"] = jnp.zeros((L, 64 << cp[1]), U8)
                wt = np.zeros(512, np.int32)
                wt[0::2] = 1 << 15
                wt[1::2] = np.clip(
                    T.STRETCHT[(T.CMINIT >> 8).astype(np.int64)].astype(np.int64)
                    * 1024, -(1 << 19), (1 << 19) - 1).astype(np.int32)
                st[f"cm{i}"] = jnp.broadcast_to(jnp.asarray(wt), (L, 512)) + 0
            elif t == T.SSE:
                # row[k] = (squash((k%32)*64 - 992) << 17) | start
                base = np.array(
                    [(np.uint32(T.SQUASHT[j * 64 - 992 + 2048]) << 17)
                     | np.uint32(cp[3]) for j in range(32)], np.uint32)
                row = jnp.tile(jnp.asarray(base), (32 << cp[1]) // 32)
                st[f"cm{i}"] = jnp.broadcast_to(row, (L, 32 << cp[1])) + 0
        return st

    # ------------------------------------------------------------------
    def predict(self, st: Dict[str, jax.Array], phase: int, active=None
                ) -> Tuple[jax.Array, List[jax.Array], Dict[str, jax.Array]]:
        """One prediction step at static bit phase 0..7.

        Returns (p_final (L,) i32 in 0..32767, per-component stretched
        predictions, updated state — ICM/ISSE probes and MATCH bit selection
        mutate per-component scalars/tables exactly like the reference).
        ``active`` (L,) bool freezes inactive lanes (their state, including
        hash-table probe side effects, is left untouched).
        """
        st = dict(st)
        L = st["c8"].shape[0]
        amask = active if active is not None else jnp.ones(L, bool)
        c8, hmap4 = st["c8"], st["hmap4"]
        p: List[jax.Array] = [jnp.zeros(L, I32) for _ in range(self.n)]
        new_probe = phase in (0, 4)  # c8==1 or 16<=c8<32: static per phase
        for i, cp in enumerate(self.comps):
            t = cp[0]
            hi = st["h"][:, i]
            if t == T.CONS:
                p[i] = jnp.full(L, (cp[1] - 128) * 4, I32)
            elif t == T.CM:
                size = 1 << cp[1]
                cxt = (hi ^ hmap4) & np.uint32(size - 1)
                st[f"cxt_{i}"] = _sel(active, cxt, st[f"cxt_{i}"])
                p[i] = _STRETCHT[(_gather(st[f"cm{i}"], cxt) >> 17).astype(I32)]
            elif t == T.ICM:
                if new_probe:
                    ht, idx = _find(st[f"ht{i}"], cp[1] + 2, hi + 16 * c8,
                                    amask)
                    st[f"ht{i}"] = ht
                    st[f"c_{i}"] = _sel(active, idx.astype(U32), st[f"c_{i}"])
                cxt = _gather(st[f"ht{i}"],
                              st[f"c_{i}"] + (hmap4 & 15)).astype(U32)
                st[f"cxt_{i}"] = _sel(active, cxt, st[f"cxt_{i}"])
                p[i] = _STRETCHT[(_gather(st[f"cm{i}"], cxt) >> 8).astype(I32)]
            elif t == T.MATCH:
                ht = st[f"ht{i}"]
                mask = np.uint32(ht.shape[1] - 1)
                a = st[f"a_{i}"]
                byte = _gather(ht, (st[f"lim_{i}"] - st[f"b_{i}"]) & mask)
                cbit = ((byte.astype(U32) >> (np.uint32(7 - phase))) & 1)
                st[f"c_{i}"] = _sel(active,
                                   jnp.where(a == 0, st[f"c_{i}"], cbit),
                                   st[f"c_{i}"])
                sign = cbit.astype(I32) * -2 + 1
                pm = (_DT2K[a.astype(I32)] * sign) & 32767
                p[i] = jnp.where(a == 0, 0, _STRETCHT[pm])
            elif t == T.AVG:
                p[i] = (p[cp[1]] * cp[3] + p[cp[2]] * (256 - cp[3])) >> 8
            elif t == T.MIX2:
                size = 1 << cp[1]
                cxt = ((hi + (c8 & np.uint32(cp[5]))) & np.uint32(size - 1))
                st[f"cxt_{i}"] = _sel(active, cxt, st[f"cxt_{i}"])
                w = _gather(st[f"a16{i}"], cxt)
                p[i] = (w * p[cp[2]] + (65536 - w) * p[cp[3]]) >> 16
            elif t == T.MIX:
                m = cp[3]
                size = 1 << cp[1]
                cxt = ((hi + (c8 & np.uint32(cp[5])))
                       & np.uint32(size - 1)) * np.uint32(m)
                st[f"cxt_{i}"] = _sel(active, cxt, st[f"cxt_{i}"])
                rows = st[f"cm{i}"]
                cols = cxt.astype(I32)[:, None] + jnp.arange(m)[None, :]
                wt = jnp.take_along_axis(rows, cols, axis=1)      # (L, m)
                pin = jnp.stack([p[cp[2] + j] for j in range(m)], axis=1)
                s = jnp.sum((wt >> 8) * pin, axis=1)
                p[i] = _clamp2k(s >> 8)
            elif t == T.ISSE:
                if new_probe:
                    ht, idx = _find(st[f"ht{i}"], cp[1] + 2, hi + 16 * c8,
                                    amask)
                    st[f"ht{i}"] = ht
                    st[f"c_{i}"] = _sel(active, idx.astype(U32), st[f"c_{i}"])
                cxt = _gather(st[f"ht{i}"],
                              st[f"c_{i}"] + (hmap4 & 15)).astype(U32)
                st[f"cxt_{i}"] = _sel(active, cxt, st[f"cxt_{i}"])
                wt = st[f"cm{i}"]
                w0 = _gather(wt, cxt * 2)
                w1 = _gather(wt, cxt * 2 + 1)
                p[i] = _clamp2k((w0 * p[cp[2]] + w1 * 64) >> 16)
            elif t == T.SSE:
                size = 32 << cp[1]
                cxt = (hi + c8) * 32
                pq = jnp.clip(p[cp[2]] + 992, 0, 1983)
                wt = pq & 63
                cxt = cxt + (pq >> 6).astype(U32)
                v0 = (_gather(st[f"cm{i}"], cxt & np.uint32(size - 1))
                      >> 10).astype(I32)
                v1 = (_gather(st[f"cm{i}"], (cxt + 1) & np.uint32(size - 1))
                      >> 10).astype(I32)
                p[i] = _STRETCHT[(v0 * (64 - wt) + v1 * wt) >> 13]
                st[f"cxt_{i}"] = _sel(active, cxt + (wt >> 5).astype(U32),
                                     st[f"cxt_{i}"])
            else:
                raise ValueError(f"unknown component type {t}")
        p_final = _SQUASHT[p[self.n - 1] + 2048]
        return p_final, p, st

    # ------------------------------------------------------------------
    def _train(self, st, i, size_bits, limit, y, active):
        """CM/SSE table training (reference libzpaq.h:1151-1157)."""
        cm = st[f"cm{i}"]
        size = cm.shape[1]
        idx = st[f"cxt_{i}"] & np.uint32(size - 1)
        pn = _gather(cm, idx)
        count = (pn & 1023).astype(I32)
        error = y.astype(I32) * 32767 - (pn >> 17).astype(I32)
        delta = ((error * _DT[count]) & -1024).astype(U32)
        pn2 = pn + delta + (count < limit).astype(U32)
        st[f"cm{i}"] = _scatter1(cm, idx, pn2, active)

    def update(self, st: Dict[str, jax.Array], p: List[jax.Array],
               y: jax.Array, phase: int, active=None
               ) -> Dict[str, jax.Array]:
        """Train all components on bit y (L,), then advance c8/hmap4/HCOMP.
        Inactive lanes (``active`` False) are left fully untouched via
        dropped scatters and per-lane scalar merges."""
        st = dict(st)
        L = y.shape[0]
        lanes = jnp.arange(L)
        hmap4 = st["hmap4"]
        yi = y.astype(I32)
        yu = y.astype(U32)
        for i, cp in enumerate(self.comps):
            t = cp[0]
            if t == T.CM:
                self._train(st, i, cp[1], cp[2] * 4, y, active)
            elif t == T.ICM:
                ht = st[f"ht{i}"]
                idx = (st[f"c_{i}"] + (hmap4 & 15)).astype(I32)
                old = _gather(ht, idx)
                st[f"ht{i}"] = _scatter1(
                    ht, idx, _SNS[old.astype(I32) * 4 + yi], active)
                cm = st[f"cm{i}"]
                cxt = st[f"cxt_{i}"].astype(I32)
                pn = _gather(cm, cxt)
                delta = ((yi * 32767 - (pn >> 8).astype(I32)) >> 2).astype(U32)
                st[f"cm{i}"] = _scatter1(cm, cxt, pn + delta, active)
            elif t == T.MATCH:
                ht, cm = st[f"ht{i}"], st[f"cm{i}"]
                mask = np.uint32(ht.shape[1] - 1)
                cmmask = np.uint32(cm.shape[1] - 1)
                a = st[f"a_{i}"]
                a = jnp.where(st[f"c_{i}"] != yu, jnp.zeros_like(a), a)
                pos = st[f"lim_{i}"]
                widx = (pos & mask).astype(I32)
                old = _gather(ht, widx).astype(U32)
                st[f"ht{i}"] = _scatter1(
                    ht, widx, ((old * 2 + yu) & 255), active)
                ht = st[f"ht{i}"]
                if phase == 7:  # byte boundary (cxt would reach 8)
                    pos1 = (pos + 1) & mask
                    hidx = (st["h"][:, i] & cmmask).astype(I32)
                    b_new = pos1 - _gather(cm, hidx)
                    b = jnp.where(a == 0, b_new, st[f"b_{i}"])
                    need_scan = (a == 0) & ((b_new & mask) != 0)
                    if active is not None:
                        need_scan = need_scan & active

                    # Match extension: the reference walks byte-at-a-time
                    # (while a<255 && ht(pos-a-1)==ht(pos-a-b-1) ++a,
                    # libzpaq.cpp:2002-2007). A per-byte while_loop cost up
                    # to 255 serial gather rounds in lockstep across lanes
                    # (one long-match lane stalled every lane); instead,
                    # compare W-byte rows and add the common-prefix run per
                    # round — <= ceil(255/W) rounds, same final length.
                    W = 64
                    offs = jnp.arange(W, dtype=U32)

                    def scan_cond(carry):
                        _, act = carry
                        return jnp.any(act)

                    def scan_body(carry):
                        a_, act = carry
                        i1 = ((pos1[:, None] - a_[:, None] - 1
                               - offs[None, :]) & mask).astype(I32)
                        i2 = ((pos1[:, None] - a_[:, None] - b[:, None] - 1
                               - offs[None, :]) & mask).astype(I32)
                        eq = (jnp.take_along_axis(ht, i1, axis=1)
                              == jnp.take_along_axis(ht, i2, axis=1))
                        run = jnp.where(jnp.all(eq, axis=1), W,
                                        jnp.argmin(eq, axis=1).astype(U32))
                        grow = jnp.minimum(run, 255 - a_)
                        a_n = a_ + jnp.where(act, grow, 0)
                        act2 = act & (run >= W) & (a_n < 255)
                        return a_n, act2

                    a_scan, _ = jax.lax.while_loop(
                        scan_cond, scan_body,
                        (jnp.zeros_like(a), need_scan))
                    a = jnp.where(a == 0,
                                  jnp.where(need_scan, a_scan,
                                            jnp.zeros_like(a)),
                                  jnp.minimum(a + 1, 255))
                    st[f"cm{i}"] = _scatter1(cm, hidx, pos1, active)
                    st[f"b_{i}"] = _sel(active, b, st[f"b_{i}"])
                    st[f"lim_{i}"] = _sel(active, pos1, st[f"lim_{i}"])
                    st[f"cxt_{i}"] = _sel(active, jnp.zeros_like(pos1),
                                         st[f"cxt_{i}"])
                else:
                    st[f"cxt_{i}"] = _sel(active, st[f"cxt_{i}"] + 1,
                                         st[f"cxt_{i}"])
                st[f"a_{i}"] = _sel(active, a, st[f"a_{i}"])
            elif t == T.MIX2:
                err = ((yi * 32767 - _SQUASHT[p[i] + 2048]) * cp[4]) >> 5
                a16 = st[f"a16{i}"]
                cxt = st[f"cxt_{i}"].astype(I32)
                w = _gather(a16, cxt)
                w = w + ((err * (p[cp[2]] - p[cp[3]]) + (1 << 12)) >> 13)
                st[f"a16{i}"] = _scatter1(
                    a16, cxt, jnp.clip(w, 0, 65535), active)
            elif t == T.MIX:
                m = cp[3]
                err = ((yi * 32767 - _SQUASHT[p[i] + 2048]) * cp[4]) >> 4
                cm = st[f"cm{i}"]
                cols = st[f"cxt_{i}"].astype(I32)[:, None] + jnp.arange(m)[None, :]
                wt = jnp.take_along_axis(cm, cols, axis=1)
                pin = jnp.stack([p[cp[2] + j] for j in range(m)], axis=1)
                wt2 = _clamp512k(wt + ((err[:, None] * pin + (1 << 12)) >> 13))
                st[f"cm{i}"] = _scatter_row(
                    cm, st[f"cxt_{i}"].astype(I32), wt2, active)
            elif t == T.ISSE:
                err = yi * 32767 - _SQUASHT[p[i] + 2048]
                cm = st[f"cm{i}"]
                cxt = st[f"cxt_{i}"].astype(I32)
                w0 = _gather(cm, cxt * 2)
                w1 = _gather(cm, cxt * 2 + 1)
                w0n = _clamp512k(w0 + ((err * p[cp[2]] + (1 << 12)) >> 13))
                w1n = _clamp512k(w1 + ((err + 16) >> 5))
                st[f"cm{i}"] = _scatter_pair(cm, cxt * 2, w0n, w1n, active)
                ht = st[f"ht{i}"]
                idx = (st[f"c_{i}"] + (hmap4 & 15)).astype(I32)
                st[f"ht{i}"] = _scatter1(ht, idx, _SNS[cxt * 4 + yi], active)
            elif t == T.SSE:
                self._train(st, i, cp[1], cp[4] * 4, y, active)
        # ---- advance partial-byte state (static branch per phase)
        c8 = st["c8"] * 2 + yu
        if phase == 7:
            byte = (c8 - 256).astype(U32)
            vm = self.vm.run(st["vm"], byte, active=active)
            st["vm"] = vm
            st["c8"] = _sel(active, jnp.ones(L, U32), st["c8"])
            st["hmap4"] = _sel(active, jnp.ones(L, U32), st["hmap4"])
            cols = np.array([i & self.hmask for i in range(max(self.n, 1))])
            st["h"] = _sel(active, vm.h[:, cols], st["h"])
        else:
            st["c8"] = _sel(active, c8, st["c8"])
            if phase == 3:  # c8 lands in 16..31
                st["hmap4"] = _sel(active, (hmap4 & 15) << 5 | yu << 4 | 1,
                                   st["hmap4"])
            else:
                st["hmap4"] = _sel(
                    active,
                    (hmap4 & np.uint32(0x1F0)) | (((hmap4 & 15) * 2 + yu) & 15),
                    st["hmap4"])
        return st
