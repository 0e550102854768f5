"""Batched (SIMT-style) ZPAQL virtual machine in JAX.

Runs one HCOMP program over L independent lanes (streams) at once, with the
exact unsigned-32-bit semantics of the scalar oracle (``zpaql.vm.VM``;
behavioral reference /root/reference/ZSFX/libzpaq.cpp:1033-1254).  All lanes
execute the same bytecode but diverge in data and control flow: each lane
carries its own program counter and a halted flag, and every VM step executes
the per-lane opcode via vectorized selects (no scalar branching), exactly the
SIMT trick GPUs use for divergent warps — here mapped onto the TPU VPU.

Intended for HCOMP context computation only (runs once per decoded byte); the
per-bit predict/update hot path lives in ``predictor_batched``.  OUT is not
supported here (HCOMP never emits bytes; PCOMP postprocessing is handled by
dedicated inverse-transform kernels or the host VM).

Design notes
------------
- The bytecode is tiny (< 64 KiB, typically < 100 B) and static per model, so
  it is closed over as a device constant; per-lane opcode fetch is a gather.
- A step executes all semantic classes at once and selects the result:
  source select (8-way), unary/assign/binary ALU, masked scatters for the
  *B/*C/*D and R destinations, and jump resolution. ~60 VPU ops per step.
- The loop is a ``lax.while_loop`` that ends when every lane halted or a
  static step bound is hit (runaway guard; sets ``err`` instead of raising,
  since we cannot raise inside jit).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
U8 = jnp.uint8
I32 = jnp.int32


class VMState(NamedTuple):
    """Per-lane ZPAQL machine state (all leading dim L)."""

    a: jax.Array    # (L,) u32
    b: jax.Array    # (L,) u32
    c: jax.Array    # (L,) u32
    d: jax.Array    # (L,) u32
    f: jax.Array    # (L,) bool
    r: jax.Array    # (L, 256) u32
    h: jax.Array    # (L, 2^hbits) u32
    m: jax.Array    # (L, 2^mbits) u8
    err: jax.Array  # (L,) bool — ERROR opcode hit or step bound exceeded


def init_vm_state(n_lanes: int, hbits: int, mbits: int) -> VMState:
    L = n_lanes
    return VMState(
        a=jnp.zeros(L, U32), b=jnp.zeros(L, U32), c=jnp.zeros(L, U32),
        d=jnp.zeros(L, U32), f=jnp.zeros(L, bool),
        r=jnp.zeros((L, 256), U32),
        h=jnp.zeros((L, 1 << hbits), U32),
        m=jnp.zeros((L, 1 << mbits), U8),
        err=jnp.zeros(L, bool),
    )


def _op_lengths(code: bytes) -> np.ndarray:
    """Instruction length (1/2/3) for every opcode value."""
    lens = np.ones(256, np.int32)
    for op in range(256):
        if op == 255:
            lens[op] = 3
        elif (op & 7) == 7:
            lens[op] = 2
    return lens


class BatchedVM:
    """Compiled vectorized runner for one HCOMP program.

    ``run(state, a_in)`` executes the program once per lane with A=a_in[lane]
    and returns the new state.  Pure function of (state, a_in): safe under jit.
    """

    def __init__(self, code: bytes, hbits: int, mbits: int,
                 max_steps: int | None = None):
        self.code = bytes(code)
        self.hbits, self.mbits = hbits, mbits
        self.hmask = np.uint32((1 << hbits) - 1)
        self.mmask = np.uint32((1 << mbits) - 1)
        # Padded so op/arg/arg2 gathers at the end are in range; pad byte 0
        # is the ERROR opcode, so running off the end sets err.
        self._code_arr = jnp.asarray(
            np.frombuffer(self.code + b"\x00\x00\x00", dtype=np.uint8))
        self._lens = jnp.asarray(_op_lengths(self.code))
        # Step bound: straight-line programs need len(code) steps; loops in
        # the standard configs iterate over at most a word/match length.
        self.max_steps = max_steps if max_steps is not None else (
            4 * len(self.code) + 64)

    # -- one vectorized VM step over all lanes ---------------------------
    def _step(self, carry):
        st, pc, halted, steps = carry
        L = st.a.shape[0]
        lanes = jnp.arange(L)
        code = self._code_arr
        op = code[jnp.clip(pc, 0, code.shape[0] - 3)].astype(I32)
        arg = code[jnp.clip(pc + 1, 0, code.shape[0] - 1)].astype(U32)
        arg2 = code[jnp.clip(pc + 2, 0, code.shape[0] - 1)].astype(U32)

        a, b, c, d, f = st.a, st.b, st.c, st.d, st.f
        mb_idx = (b & self.mmask).astype(jnp.int32)
        mc_idx = (c & self.mmask).astype(jnp.int32)
        hd_idx = (d & self.hmask).astype(jnp.int32)
        mb = jnp.take_along_axis(st.m, mb_idx[:, None], axis=1)[:, 0].astype(U32)
        mc = jnp.take_along_axis(st.m, mc_idx[:, None], axis=1)[:, 0].astype(U32)
        hd = jnp.take_along_axis(st.h, hd_idx[:, None], axis=1)[:, 0]

        sss = op & 7
        ddd = (op >> 3) & 7
        # source operand (sss==7 -> immediate)
        src = jax.lax.select_n(sss, a, b, c, d, mb, mc, hd, arg)
        # current destination value (ddd==7 unused by unary writers)
        dval = jax.lax.select_n(jnp.minimum(ddd, 6), a, b, c, d, mb, mc, hd)
        rval = jnp.take_along_axis(st.r, arg.astype(jnp.int32)[:, None],
                                   axis=1)[:, 0]

        is_unary = (op > 0) & (op < 64) & (ddd < 7) & (sss < 5)
        is_ddd_eq_r = (op < 64) & (ddd < 4) & (sss == 7)        # ddd = R n
        is_assign = (op >= 64) & (op < 120)
        is_binary = (op >= 128) & (op < 240)
        is_cmp = (op >= 216) & (op < 240)                        # ==, <, >
        is_jt = op == 39
        is_jf = op == 47
        is_req_a = op == 55        # R=A n
        is_halt = op == 56
        is_out = op == 57
        is_hash = op == 59
        is_hashd = op == 60
        is_jmp = op == 63
        is_lj = op == 255
        is_error = (op == 0) | (
            ~(is_unary | is_ddd_eq_r | is_assign | is_binary | is_jt | is_jf
              | is_req_a | is_halt | is_out | is_hash | is_hashd | is_jmp
              | is_lj))

        # ---- unary results (xxx = sss in 0..4, or 7 handled separately)
        u_res = jax.lax.select_n(
            jnp.minimum(sss, 4),
            a,                # xxx=0 swap: dest <- A
            dval + 1,         # ++
            dval - 1,         # --
            ~dval,            # !
            jnp.zeros_like(a),  # =0
        )
        # swap also writes A: for *B/*C dests only the low byte of A changes
        swap_a_byte = (a & jnp.uint32(0xFFFFFF00)) | (dval & 255)
        swap_new_a = jnp.where((ddd == 4) | (ddd == 5), swap_a_byte, dval)

        # ---- binary ALU into A
        xxxx = (op >> 3) & 15
        shift = src & 31
        safe = jnp.where(src == 0, jnp.uint32(1), src)
        alu = jax.lax.select_n(
            jnp.clip(xxxx, 0, 10),
            a + src, a - src, a * src,
            jnp.where(src == 0, jnp.uint32(0), a // safe),
            jnp.where(src == 0, jnp.uint32(0), a % safe),
            a & src, a & ~src, a | src, a ^ src,
            a << shift, a >> shift,
        )
        cmp_kind = jnp.clip(xxxx - 11, 0, 2)  # 0: ==, 1: <, 2: >
        cmp_res = jax.lax.select_n(cmp_kind, a == src, a < src, a > src)

        # ---- value & target routing
        # value written to the ddd target (unary/assign/ddd=R)
        tgt_val = jnp.where(is_assign, src,
                            jnp.where(is_ddd_eq_r, rval, u_res))
        writes_tgt = is_unary | is_assign | is_ddd_eq_r
        # register writes
        def reg_new(reg, which):
            w = writes_tgt & (ddd == which)
            return jnp.where(w, tgt_val, reg)
        new_b = reg_new(b, 1)
        new_c = reg_new(c, 2)
        new_d = reg_new(d, 3)
        new_a = jnp.where(writes_tgt & (ddd == 0), tgt_val, a)
        new_a = jnp.where(is_unary & (sss == 0), swap_new_a, new_a)
        new_a = jnp.where(is_binary & ~is_cmp, alu, new_a)
        new_a = jnp.where(is_hash, (a + mb + 512) * 773, new_a)
        new_f = jnp.where(is_cmp, cmp_res, f)

        active = ~halted
        # ---- memory writes: vectorized full-row selects on TPU (scatters
        # serialize on the scalar core; M/H/R are small, so an iota-compare
        # write is one fast VPU pass), native scatters elsewhere — see
        # predictor_batched._use_where for the strategy rationale
        from .predictor_batched import _use_where

        def where_write(tab, idx, val, wmask):
            L2, S2 = tab.shape
            if _use_where(S2):
                cols = jax.lax.broadcasted_iota(I32, (L2, S2), 1)
                m = (cols == idx.astype(I32)[:, None]) & wmask[:, None]
                return jnp.where(m, val.astype(tab.dtype)[:, None], tab)
            sidx = jnp.where(wmask, idx.astype(I32), jnp.int32(S2))
            return tab.at[jnp.arange(L2), sidx].set(
                val.astype(tab.dtype), mode="drop")

        wm = active & writes_tgt & ((ddd == 4) | (ddd == 5))
        m_idx = jnp.where(ddd == 4, mb_idx, mc_idx)
        new_m = where_write(st.m, m_idx, tgt_val & 255, wm)
        wh = active & ((writes_tgt & (ddd == 6)) | is_hashd)
        h_val = jnp.where(is_hashd, (hd + a + 512) * 773, tgt_val)
        new_h = where_write(st.h, hd_idx, h_val, wh)
        wr = active & is_req_a
        new_r = where_write(st.r, arg.astype(jnp.int32), a, wr)

        # ---- program counter
        nlen = self._lens[op]
        rel = (((arg + 128) & 255).astype(I32) - 127)
        taken = (is_jt & f) | (is_jf & ~f) | is_jmp
        pc_next = pc + nlen
        pc_next = jnp.where(taken, pc + 1 + rel, pc_next)
        pc_next = jnp.where((is_jt & ~f) | (is_jf & f), pc + 2, pc_next)
        pc_next = jnp.where(is_lj, (arg + 256 * arg2).astype(I32), pc_next)

        new_halted = halted | (active & (is_halt | is_error))
        new_err = st.err | (active & is_error)

        # freeze halted lanes
        def keep(new, old):
            mask = active.reshape((-1,) + (1,) * (new.ndim - 1))
            return jnp.where(mask, new, old)

        st2 = VMState(
            a=keep(new_a, a), b=keep(new_b, b), c=keep(new_c, c),
            d=keep(new_d, d), f=keep(new_f, f),
            r=new_r, h=new_h, m=new_m, err=new_err)
        pc2 = jnp.where(active, pc_next, pc)
        return st2, pc2, new_halted, steps + 1

    def run(self, st: VMState, a_in: jax.Array, active=None) -> VMState:
        """Execute the program once per lane with A = a_in (u32).

        Lanes where ``active`` is False start halted: their whole machine
        state is left untouched (the step function freezes halted lanes)."""
        L = st.a.shape[0]
        if active is None:
            st = st._replace(a=a_in.astype(U32))
            halted = jnp.zeros(L, bool)
        else:
            st = st._replace(a=jnp.where(active, a_in.astype(U32), st.a))
            halted = ~active
        pc = jnp.zeros(L, I32)
        steps = jnp.int32(0)

        def cond(carry):
            _, _, h, s = carry
            return (~jnp.all(h)) & (s < self.max_steps)

        st, pc, halted, steps = jax.lax.while_loop(
            cond, self._step, (st, pc, halted, steps))
        # lanes still running at the bound are flagged as errors
        st = st._replace(err=st.err | ~halted)
        return st
