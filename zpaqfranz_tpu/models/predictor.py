"""Scalar reference Predictor (host oracle).

Implements the nine ZPAQ L2 component types (CONST, CM, ICM, MATCH, AVG,
MIX2, MIX, ISSE, SSE) with the exact integer semantics of the spec
(reference: /root/reference/ZSFX/libzpaq.cpp:1715-2080).  One instance models
one stream.  This is the slow oracle used by tests; the batched JAX path and
the native C++ engine are the fast implementations and must match it bit for
bit.
"""

from __future__ import annotations

import numpy as np

from .tables import (
    CONS, CM, ICM, MATCH, AVG, MIX2, MIX, ISSE, SSE,
    COMPSIZE, SNS, CMINIT, SQUASHT, STRETCHT, DT, DT2K,
    squash, stretch,
)
from ..zpaql.header import Model
from ..zpaql.vm import VM

M32 = 0xFFFFFFFF


def clamp2k(x: int) -> int:
    return -2048 if x < -2048 else 2047 if x > 2047 else x


def clamp512k(x: int) -> int:
    lo, hi = -(1 << 19), (1 << 19) - 1
    return lo if x < lo else hi if x > hi else x


class _Comp:
    __slots__ = ("limit", "cxt", "a", "b", "c", "cm", "ht", "a16")

    def __init__(self):
        self.limit = self.cxt = self.a = self.b = self.c = 0
        self.cm = None   # np.uint32
        self.ht = None   # np.uint8
        self.a16 = None  # np.uint16


class Predictor:
    def __init__(self, model: Model):
        self.model = model
        self.z = VM.for_hcomp(model)
        self.c8 = 1
        self.hmap4 = 1
        n = model.n
        self.n = n
        self.p = [0] * 256
        self.h = [0] * 256
        self.comp = [_Comp() for _ in range(n)]
        for i, cp in enumerate(model.comps):
            cr = self.comp[i]
            t = cp[0]
            if t == CONS:
                self.p[i] = (cp[1] - 128) * 4
            elif t == CM:
                if cp[1] > 32:
                    raise ValueError("max size for CM is 32")
                cr.cm = np.full(1 << cp[1], 0x80000000, dtype=np.uint32)
                cr.limit = cp[2] * 4
            elif t == ICM:
                if cp[1] > 26:
                    raise ValueError("max size for ICM is 26")
                cr.limit = 1023
                cr.cm = CMINIT.copy()
                cr.ht = np.zeros(64 << cp[1], dtype=np.uint8)
            elif t == MATCH:
                cr.cm = np.zeros(1 << cp[1], dtype=np.uint32)  # hash -> pos
                cr.ht = np.zeros(1 << cp[2], dtype=np.uint8)   # history buffer
                cr.ht[0] = 1
            elif t == AVG:
                if cp[1] >= i or cp[2] >= i:
                    raise ValueError("AVG input >= i")
            elif t == MIX2:
                if cp[2] >= i or cp[3] >= i:
                    raise ValueError("MIX2 input >= i")
                cr.c = 1 << cp[1]
                cr.a16 = np.full(1 << cp[1], 32768, dtype=np.uint16)
            elif t == MIX:
                m = cp[3]
                if cp[2] >= i or m < 1 or m > i - cp[2]:
                    raise ValueError("bad MIX inputs")
                cr.c = 1 << cp[1]
                cr.cm = np.full(m << cp[1], 65536 // m, dtype=np.uint32)
            elif t == ISSE:
                if cp[2] >= i:
                    raise ValueError("ISSE input >= i")
                cr.ht = np.zeros(64 << cp[1], dtype=np.uint8)
                cr.cm = np.zeros(512, dtype=np.uint32)
                for j in range(256):
                    cr.cm[j * 2] = 1 << 15
                    cr.cm[j * 2 + 1] = clamp512k(stretch(int(CMINIT[j]) >> 8) * 1024) & M32
            elif t == SSE:
                if cp[2] >= i:
                    raise ValueError("SSE input >= i")
                if cp[3] > cp[4] * 4:
                    raise ValueError("SSE start > limit*4")
                cr.cm = np.empty(32 << cp[1], dtype=np.uint32)
                cr.limit = cp[4] * 4
                for j in range(32):
                    cr.cm[j :: 32] = (squash(j * 64 - 992) << 17) | cp[3]
            else:
                raise ValueError(f"unknown component type {t}")

    def is_modeled(self) -> bool:
        return self.n > 0

    # -- hash table probe (ICM/ISSE): 16-byte rows, 3-way, LRU-ish ------
    @staticmethod
    def _find(ht: np.ndarray, sizebits: int, cxt: int) -> int:
        chk = (cxt >> sizebits) & 255
        h0 = (cxt * 16) & (ht.size - 16)
        if ht[h0] == chk:
            return h0
        h1 = h0 ^ 16
        if ht[h1] == chk:
            return h1
        h2 = h0 ^ 32
        if ht[h2] == chk:
            return h2
        if ht[h0 + 1] <= ht[h1 + 1] and ht[h0 + 1] <= ht[h2 + 1]:
            hx = h0
        elif ht[h1 + 1] < ht[h2 + 1]:
            hx = h1
        else:
            hx = h2
        ht[hx : hx + 16] = 0
        ht[hx] = chk
        return hx

    def predict(self) -> int:
        """Probability of a 1 for the next bit, 0..4095 scaled to 0..32767/8."""
        p, h, c8, hmap4 = self.p, self.h, self.c8, self.hmap4
        for i, cp in enumerate(self.model.comps):
            cr = self.comp[i]
            t = cp[0]
            if t == CONS:
                pass
            elif t == CM:
                cr.cxt = (h[i] ^ hmap4) & (cr.cm.size - 1)
                p[i] = int(STRETCHT[int(cr.cm[cr.cxt]) >> 17])
            elif t == ICM:
                if c8 == 1 or (c8 & 0xF0) == 16:
                    cr.c = self._find(cr.ht, cp[1] + 2, (h[i] + 16 * c8) & M32)
                cr.cxt = int(cr.ht[cr.c + (hmap4 & 15)])
                p[i] = int(STRETCHT[int(cr.cm[cr.cxt]) >> 8])
            elif t == MATCH:
                if cr.a == 0:
                    p[i] = 0
                else:
                    cr.c = (int(cr.ht[(cr.limit - cr.b) & (cr.ht.size - 1)]) >> (7 - cr.cxt)) & 1
                    p[i] = int(STRETCHT[(int(DT2K[cr.a]) * (cr.c * -2 + 1)) & 32767])
            elif t == AVG:
                p[i] = (p[cp[1]] * cp[3] + p[cp[2]] * (256 - cp[3])) >> 8
            elif t == MIX2:
                cr.cxt = (h[i] + (c8 & cp[5])) & (cr.c - 1)
                w = int(cr.a16[cr.cxt])
                p[i] = (w * p[cp[2]] + (65536 - w) * p[cp[3]]) >> 16
            elif t == MIX:
                m = cp[3]
                cr.cxt = ((h[i] + (c8 & cp[5])) & (cr.c - 1)) * m
                wt = cr.cm[cr.cxt : cr.cxt + m].view(np.int32)
                s = 0
                for j in range(m):
                    s += (int(wt[j]) >> 8) * p[cp[2] + j]
                p[i] = clamp2k(s >> 8)
            elif t == ISSE:
                if c8 == 1 or (c8 & 0xF0) == 16:
                    cr.c = self._find(cr.ht, cp[1] + 2, (h[i] + 16 * c8) & M32)
                cr.cxt = int(cr.ht[cr.c + (hmap4 & 15)])
                wt = cr.cm[cr.cxt * 2 : cr.cxt * 2 + 2].view(np.int32)
                p[i] = clamp2k((int(wt[0]) * p[cp[2]] + int(wt[1]) * 64) >> 16)
            elif t == SSE:
                cr.cxt = ((h[i] + c8) * 32) & M32
                pq = p[cp[2]] + 992
                pq = 0 if pq < 0 else 1983 if pq > 1983 else pq
                wt = pq & 63
                pq >>= 6
                cr.cxt = (cr.cxt + pq) & M32
                size = cr.cm.size
                v0 = int(cr.cm[cr.cxt & (size - 1)]) >> 10
                v1 = int(cr.cm[(cr.cxt + 1) & (size - 1)]) >> 10
                p[i] = int(STRETCHT[(v0 * (64 - wt) + v1 * wt) >> 13])
                cr.cxt = (cr.cxt + (wt >> 5)) & M32
            else:
                raise ValueError(f"component {t} not implemented")
        return int(SQUASHT[p[self.n - 1] + 2048])

    def _train(self, cr: _Comp, y: int) -> None:
        idx = cr.cxt & (cr.cm.size - 1)
        pn = int(cr.cm[idx])
        count = pn & 0x3FF
        error = y * 32767 - (pn >> 17)
        pn = (pn + ((error * int(DT[count])) & -1024) + (1 if count < cr.limit else 0)) & M32
        cr.cm[idx] = pn

    def update(self, y: int) -> None:
        p, h, c8, hmap4 = self.p, self.h, self.c8, self.hmap4
        for i, cp in enumerate(self.model.comps):
            cr = self.comp[i]
            t = cp[0]
            if t == CM:
                self._train(cr, y)
            elif t == ICM:
                idx = cr.c + (hmap4 & 15)
                cr.ht[idx] = SNS[int(cr.ht[idx]) * 4 + y]
                pn = int(cr.cm[cr.cxt])
                cr.cm[cr.cxt] = (pn + ((y * 32767 - (pn >> 8)) >> 2)) & M32
            elif t == MATCH:
                mask = cr.ht.size - 1
                if cr.c != y:
                    cr.a = 0  # mismatch: stop predicting
                cr.ht[cr.limit & mask] = (int(cr.ht[cr.limit & mask]) * 2 + y) & 255
                cr.cxt += 1
                if cr.cxt == 8:
                    cr.cxt = 0
                    cr.limit = (cr.limit + 1) & mask
                    if cr.a == 0:  # look for a match
                        cr.b = (cr.limit - int(cr.cm[h[i] & (cr.cm.size - 1)])) & M32
                        if cr.b & mask:
                            while (cr.a < 255
                                   and cr.ht[(cr.limit - cr.a - 1) & mask]
                                   == cr.ht[(cr.limit - cr.a - cr.b - 1) & mask]):
                                cr.a += 1
                    elif cr.a < 255:
                        cr.a += 1
                    cr.cm[h[i] & (cr.cm.size - 1)] = cr.limit
            elif t == MIX2:
                err = ((y * 32767 - squash(p[i])) * cp[4]) >> 5
                w = int(cr.a16[cr.cxt]) + ((err * (p[cp[2]] - p[cp[3]]) + (1 << 12)) >> 13)
                cr.a16[cr.cxt] = 0 if w < 0 else 65535 if w > 65535 else w
            elif t == MIX:
                m = cp[3]
                err = ((y * 32767 - squash(p[i])) * cp[4]) >> 4
                wt = cr.cm[cr.cxt : cr.cxt + m].view(np.int32)
                for j in range(m):
                    wt[j] = clamp512k(int(wt[j]) + ((err * p[cp[2] + j] + (1 << 12)) >> 13))
            elif t == ISSE:
                err = y * 32767 - squash(p[i])
                wt = cr.cm[cr.cxt * 2 : cr.cxt * 2 + 2].view(np.int32)
                wt[0] = clamp512k(int(wt[0]) + ((err * p[cp[2]] + (1 << 12)) >> 13))
                wt[1] = clamp512k(int(wt[1]) + ((err + 16) >> 5))
                cr.ht[cr.c + (hmap4 & 15)] = SNS[cr.cxt * 4 + y]
            elif t == SSE:
                self._train(cr, y)
        # advance partial-byte state; run HCOMP on whole bytes
        c8 += c8 + y
        if c8 >= 256:
            self.z.run(c8 - 256)
            hmap4 = 1
            c8 = 1
            for i in range(self.n):
                self.h[i] = int(self.z.h[i & self.z.hmask])
        elif 16 <= c8 < 32:
            hmap4 = (hmap4 & 0xF) << 5 | y << 4 | 1
        else:
            hmap4 = (hmap4 & 0x1F0) | (((hmap4 & 0xF) * 2 + y) & 0xF)
        self.c8, self.hmap4 = c8, hmap4
