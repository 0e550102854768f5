"""HCOMP bytecode -> straight-line elementwise JAX (trace-time specializer).

The per-byte context computation of every standard model (and of any config
our method compiler emits) is a pure function of a short window of recent
bytes, the position counter C, and the per-component context registers H[i].
Interpreting that bytecode with the SIMT VM (``vm_batched``) costs ~8 memory
ops (gathers + table passes) per *instruction*; on TPU each such op is ~300 ns
regardless of lane count, so a 100-instruction HCOMP dominated the whole
codec step.  This module instead *specializes the bytecode at JAX trace
time*: registers become symbolic per-lane vectors, M reads become reads of a
rolling byte window kept as a dense (L, W) array, H becomes dense (L, n)
columns, and structured if/else (JF/JT + forward JMP, what our compiler emits
for the word models) becomes predicated selects.  The result is pure
elementwise VPU code with ZERO gathers/scatters per byte.

Supported shape (bail -> caller falls back to the SIMT VM, so coverage is an
optimization, never a correctness question):

  - the standard history preamble  c-- *c=a a+=255 d=a *d=c
    (rotating buffer push + last-position table write; the write lands at
    H[byte+255] >= 255 which no component can read back since n <= 254,
    so it is dropped);
  - M reads only at c+k for small constant k (the rolling window);
  - H reads/writes only at compile-time-constant D (component contexts);
  - forward structured branches; no loops, no R registers, no OUT, no LJ.

Behavioral reference for the instruction semantics:
/root/reference/ZSFX/libzpaq.cpp:1033-1254 (ZPAQL::execute); the SIMT twin
is ops/vm_batched.py, against which bit-exactness is tested.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..zpaql.header import Model

U32, U8, I32 = jnp.uint32, jnp.uint8, jnp.int32

# the standard preamble (see module docstring): c-- *c=a a+= 255 d=a *d=c
_PREAMBLE = bytes([18, 104, 135, 255, 88, 114])

_WINDOW = 32          # rolling window width (max c+k offset supported)


class _Bail(Exception):
    pass


class _Ptr:
    """Pointer value c + off (B or C register tracking the history window)."""

    __slots__ = ("off",)

    def __init__(self, off: int):
        self.off = off


class _Poison:
    """Stale register (value from a previous run); any use bails."""

    __slots__ = ("why",)

    def __init__(self, why: str):
        self.why = why


class _Interp:
    """One symbolic execution of the bytecode (runs at JAX trace time)."""

    def __init__(self, code: bytes, n: int, win, c_vec, h_cols, a0):
        self.code = code
        self.n = n
        self.win = win            # (L, W) u8 — already includes this byte
        self.c = c_vec            # (L,) u32 — already decremented
        self.h = list(h_cols)     # n × (L,) u32
        # regs after the preamble: A = byte + 255, D = per-lane (poisoned
        # until reassigned), B/F stale from the previous run
        self.A = a0
        self.B: object = _Poison("stale B")
        self.D: object = _Poison("per-lane D after preamble")
        self.F: object = _Poison("stale F")

    # ---- value helpers --------------------------------------------------
    def _vec(self, v) -> jax.Array:
        if isinstance(v, _Poison):
            raise _Bail(v.why)
        if isinstance(v, _Ptr):
            return self.c + np.uint32(v.off)
        if isinstance(v, int):
            return jnp.full(self.win.shape[0], np.uint32(v), U32)
        return v

    def _deref_ptr(self, p) -> jax.Array:
        """M[p] for p = c + k  ->  window column k."""
        if not isinstance(p, _Ptr):
            raise _Bail("M access at non-window address")
        if not (0 <= p.off < self.win.shape[1]):
            raise _Bail(f"window offset {p.off} out of range")
        return self.win[:, p.off].astype(U32)

    def _h_col(self, d) -> int:
        if not isinstance(d, int):
            raise _Bail("H access at non-constant D")
        if not (0 <= d < self.n):
            raise _Bail(f"H index {d} outside components")
        return d

    # sss operand value (op & 7); 7 = immediate
    def _src(self, sss: int, arg: int) -> jax.Array:
        if sss == 0:
            return self._vec(self.A)
        if sss == 1:
            return self._vec(self.B)
        if sss == 2:
            return self._vec(self.c)
        if sss == 3:
            return self._vec(self.D)
        if sss == 4:
            return self._deref_ptr(self.B)
        if sss == 5:
            return self._deref_ptr(_Ptr(0))     # *C: window head
        if sss == 6:
            return self.h[self._h_col(self.D)]
        return jnp.full(self.win.shape[0], np.uint32(arg), U32)

    def _get_dst(self, ddd: int) -> jax.Array:
        return self._src(ddd, 0)

    def _set_dst(self, ddd: int, val) -> None:
        if ddd == 0:
            self.A = val
        elif ddd == 1:
            self.B = val
        elif ddd == 2:
            raise _Bail("write to C")
        elif ddd == 3:
            self.D = val
        elif ddd in (4, 5):
            raise _Bail("M write outside preamble")
        elif ddd == 6:
            self.h[self._h_col(self.D)] = self._vec(val) & np.uint32(0xFFFFFFFF)
        else:
            raise _Bail("bad destination")

    # ---- execution ------------------------------------------------------
    def run(self, pc: int, end: int) -> None:
        code = self.code
        while pc < min(end, len(code)):
            op = code[pc]
            arg = code[pc + 1] if pc + 1 < len(code) else 0
            sss, ddd = op & 7, (op >> 3) & 7

            if op == 56:                       # HALT
                if end < len(code):
                    raise _Bail("halt inside a branch arm")
                return
            if op == 0 or op in (57, 255):     # ERROR / OUT / LJ
                raise _Bail(f"opcode {op}")
            if op in (7, 15, 23, 31, 55):      # R registers
                raise _Bail("R register use")
            if op == 59:                       # HASH: a=(a+*b+512)*773
                self.A = ((self._vec(self.A) + self._deref_ptr(self.B)
                           + np.uint32(512)) * np.uint32(773))
                pc += 1
                continue
            if op == 60:                       # HASHD: *d=(*d+a+512)*773
                d = self._h_col(self.D)
                self.h[d] = ((self.h[d] + self._vec(self.A)
                              + np.uint32(512)) * np.uint32(773))
                pc += 1
                continue
            if op in (39, 47, 63):             # JT / JF / JMP
                pc = self._branch(op, arg, pc, end)
                continue
            if op < 56 and (op & 7) < 5:       # unary ops on ddd
                self._unary(ddd, sss)
                pc += 1
                continue
            if 64 <= op < 120:                 # assignment ddd = sss
                if ddd == 1 and sss == 2:      # b=c: keep pointerness
                    self.B = _Ptr(0)
                elif sss == 7:
                    self._set_dst(ddd, int(arg))
                else:
                    self._set_dst(ddd, self._src(sss, arg))
                pc += 2 if sss == 7 else 1
                continue
            if 128 <= op < 240:                # binary ALU / comparisons
                self._binary((op >> 3) & 15, self._src(sss, arg))
                pc += 2 if sss == 7 else 1
                continue
            raise _Bail(f"unsupported opcode {op}")
        if end >= len(code):
            raise _Bail("ran off code end")

    def _unary(self, ddd: int, xxx: int) -> None:
        if xxx == 0:                           # swap with A
            raise _Bail("swap")
        if xxx == 4:                           # =0
            self._set_dst(ddd, 0)
            return
        if ddd == 1 and isinstance(self.B, _Ptr):   # b++ / b-- keep pointer
            if xxx == 1:
                self.B = _Ptr(self.B.off + 1)
                return
            if xxx == 2:
                self.B = _Ptr(self.B.off - 1)
                return
        if ddd == 3 and isinstance(self.D, int):    # d++ / d-- stay constant
            if xxx == 1:
                self.D = self.D + 1
                return
            if xxx == 2:
                self.D = self.D - 1
                return
        cur = self._get_dst(ddd)
        if xxx == 1:
            self._set_dst(ddd, cur + np.uint32(1))
        elif xxx == 2:
            self._set_dst(ddd, cur - np.uint32(1))
        elif xxx == 3:
            self._set_dst(ddd, ~cur)
        else:
            raise _Bail("bad unary")

    def _binary(self, xxxx: int, src: jax.Array) -> None:
        a = self._vec(self.A)
        if xxxx == 0:
            self.A = a + src
        elif xxxx == 1:
            self.A = a - src
        elif xxxx == 2:
            self.A = a * src
        elif xxxx == 3:
            safe = jnp.where(src == 0, np.uint32(1), src)
            self.A = jnp.where(src == 0, np.uint32(0), a // safe)
        elif xxxx == 4:
            safe = jnp.where(src == 0, np.uint32(1), src)
            self.A = jnp.where(src == 0, np.uint32(0), a % safe)
        elif xxxx == 5:
            self.A = a & src
        elif xxxx == 6:
            self.A = a & ~src
        elif xxxx == 7:
            self.A = a | src
        elif xxxx == 8:
            self.A = a ^ src
        elif xxxx == 9:
            self.A = a << (src & np.uint32(31))
        elif xxxx == 10:
            self.A = a >> (src & np.uint32(31))
        elif xxxx == 11:
            self.F = a == src
        elif xxxx == 12:
            self.F = a < src
        elif xxxx == 13:
            self.F = a > src
        else:
            raise _Bail("bad binary")

    def _branch(self, op: int, arg: int, pc: int, end: int) -> int:
        rel = ((arg + 128) & 255) - 127
        if op == 63:                           # unconditional JMP
            tgt = pc + 1 + rel
            if tgt <= pc:
                raise _Bail("backward jump")
            return tgt
        if rel <= 0:
            raise _Bail("backward conditional jump")
        taken_tgt = pc + 1 + rel
        cond = self._vec(self.F).astype(bool)
        # JT: jump when F; JF: jump when !F.  Layout produced by structured
        # compilers: fall-through arm [pc+2, taken_tgt) possibly ending in
        # 'jmp join' (else present); taken arm [taken_tgt, join).
        fall_end = taken_tgt
        join = taken_tgt
        # walk instruction starts to find the last one before taken_tgt
        j = pc + 2
        last_start = None
        while j < taken_tgt:
            last_start = j
            o = self.code[j]
            j += 3 if o == 255 else (2 if (o & 7) == 7 else 1)
        if j != taken_tgt:
            raise _Bail("branch arm not instruction-aligned")
        if last_start is not None and self.code[last_start] == 63:
            r2 = ((self.code[last_start + 1] + 128) & 255) - 127
            t2 = last_start + 1 + r2
            if t2 > taken_tgt:
                fall_end = last_start
                join = t2

        snap = (self.A, self.B, self.D, self.F, list(self.h))
        self.run(pc + 2, fall_end)             # fall-through arm
        fall = (self.A, self.B, self.D, self.F, list(self.h))
        self.A, self.B, self.D, self.F, self.h = snap[0], snap[1], snap[2], \
            snap[3], list(snap[4])
        self.run(taken_tgt, join)              # taken arm
        take = (self.A, self.B, self.D, self.F, list(self.h))

        # merge: 'taken' wins where the branch fired
        fire = cond if op == 39 else ~cond

        def merge(tv, fv):
            if tv is fv:
                return tv
            if isinstance(tv, int) and isinstance(fv, int) and tv == fv:
                return tv
            if isinstance(tv, _Ptr) and isinstance(fv, _Ptr) \
                    and tv.off == fv.off:
                return tv
            if isinstance(tv, (_Poison, _Ptr)) or isinstance(
                    fv, (_Poison, _Ptr)):
                return _Poison("divergent pointer/poison")
            return jnp.where(fire, self._vec(tv), self._vec(fv))

        self.A = merge(take[0], fall[0])
        self.B = merge(take[1], fall[1])
        self.D = merge(take[2], fall[2])
        self.F = merge(take[3], fall[3])
        self.h = [merge(t, f) for t, f in zip(take[4], fall[4])]
        return join


class FastHcomp:
    """Specialized per-byte context updater for one model.

    State dict (all leading dim L): 'win' (L, W) u8 rolling history
    (win[:, 0] = current byte), 'hn' (L, n) u32 component contexts,
    'cc' (L,) u32 the C position counter.
    """

    def __init__(self, model: Model):
        if model.n == 0 or not model.hcomp.startswith(_PREAMBLE):
            raise _Bail("no components / nonstandard preamble")
        self.model = model
        self.n = model.n
        # validate once with abstract inputs (cheap trace on numpy-like
        # zeros via jax.eval_shape would still trace; do a tiny concrete
        # run lazily in try_compile instead)

    def init_state(self, L: int) -> Dict[str, jax.Array]:
        return {
            "win": jnp.zeros((L, _WINDOW), U8),
            "hn": jnp.zeros((L, max(self.n, 1)), U32),
            "cc": jnp.zeros(L, U32),
        }

    def run(self, st: Dict[str, jax.Array], byte: jax.Array
            ) -> Dict[str, jax.Array]:
        """Advance contexts with the next byte (L,) u32 per lane."""
        byte = byte.astype(U32)
        win = jnp.concatenate(
            [byte.astype(U8)[:, None], st["win"][:, :-1]], axis=1)
        cc = st["cc"] - np.uint32(1)
        h_cols = [st["hn"][:, i] for i in range(self.n)]
        it = _Interp(self.model.hcomp, self.n, win, cc, h_cols,
                     byte + np.uint32(255))
        it.run(len(_PREAMBLE), len(self.model.hcomp))
        hn = jnp.stack([it._vec(h) for h in it.h], axis=1)
        return {"win": win, "hn": hn, "cc": cc}


def try_compile(model: Model) -> Optional[FastHcomp]:
    """Build a FastHcomp for the model, or None if the bytecode uses
    features outside the specializable subset (caller falls back to the
    SIMT VM — a coverage choice, never a correctness one)."""
    try:
        fh = FastHcomp(model)
        # dry-run the specializer once on 1-lane abstract values so any
        # _Bail fires here, not inside the caller's jit
        jax.eval_shape(lambda s, b: fh.run(s, b),
                       jax.eval_shape(lambda: fh.init_state(1)),
                       jax.ShapeDtypeStruct((1,), U32))
        return fh
    except _Bail:
        return None
    except Exception:
        return None
