"""Reference ZPAQL virtual machine (host oracle).

Executes HCOMP/PCOMP bytecode with the exact unsigned-32-bit semantics of the
ZPAQ L2 spec (reference interpreter: /root/reference/ZSFX/libzpaq.cpp:1033-1254).
This is the slow, obviously-correct implementation used for tests and as the
oracle for the JAX/C++ fast paths.  All arithmetic is mod 2^32; division and
modulo by zero yield zero; shifts use the low 5 bits of the count.

State: registers A,B,C,D (u32), flag F, R[256] (u32), M (2^mbits bytes),
H (2^hbits u32).  ``run(x)`` executes the program with A=x; the OUT
instruction appends to ``self.out``.
"""

from __future__ import annotations

import numpy as np

from .header import Model

M32 = 0xFFFFFFFF


class ZPAQLRuntimeError(RuntimeError):
    pass


class VM:
    def __init__(self, code: bytes, hbits: int, mbits: int):
        if hbits > 32 or mbits > 32:
            raise ZPAQLRuntimeError("H or M too big")
        self.code = bytes(code)
        self.h = np.zeros(1 << hbits, dtype=np.uint32)
        self.m = np.zeros(1 << mbits, dtype=np.uint8)
        self.r = np.zeros(256, dtype=np.uint32)
        self.hmask = (1 << hbits) - 1
        self.mmask = (1 << mbits) - 1
        self.a = self.b = self.c = self.d = 0
        self.f = 0
        self.out = bytearray()

    @classmethod
    def for_hcomp(cls, model: Model) -> "VM":
        return cls(model.hcomp, model.hh, model.hm)

    @classmethod
    def for_pcomp(cls, model: Model) -> "VM":
        if model.pcomp is None:
            raise ZPAQLRuntimeError("model has no PCOMP")
        return cls(model.pcomp, model.ph, model.pm)

    # -- source/dest accessors; index 0..6 = a b c d *b *c *d ------------
    def _get(self, s: int, imm: int) -> int:
        if s == 0:
            return self.a
        if s == 1:
            return self.b
        if s == 2:
            return self.c
        if s == 3:
            return self.d
        if s == 4:
            return int(self.m[self.b & self.mmask])
        if s == 5:
            return int(self.m[self.c & self.mmask])
        if s == 6:
            return int(self.h[self.d & self.hmask])
        return imm

    def _set(self, d: int, v: int) -> None:
        v &= M32
        if d == 0:
            self.a = v
        elif d == 1:
            self.b = v
        elif d == 2:
            self.c = v
        elif d == 3:
            self.d = v
        elif d == 4:
            self.m[self.b & self.mmask] = v & 255
        elif d == 5:
            self.m[self.c & self.mmask] = v & 255
        elif d == 6:
            self.h[self.d & self.hmask] = v

    def run(self, input_: int) -> None:
        self.a = input_ & M32
        pc = 0
        code = self.code
        n = len(code)
        while True:
            if pc >= n:
                raise ZPAQLRuntimeError("pc out of range")
            op = code[pc]
            pc += 1
            if op == 56:  # HALT
                return
            if op == 0:
                raise ZPAQLRuntimeError("ZPAQL ERROR instruction")
            if op == 255:  # LJ absolute
                pc = code[pc] + 256 * code[pc + 1]
                if pc >= n:
                    raise ZPAQLRuntimeError("LJ out of range")
                continue
            if op == 39:  # JT
                pc = pc + (((code[pc] + 128) & 255) - 127) if self.f else pc + 1
                continue
            if op == 47:  # JF
                pc = pc + 1 if self.f else pc + (((code[pc] + 128) & 255) - 127)
                continue
            if op == 63:  # JMP
                pc += ((code[pc] + 128) & 255) - 127
                continue
            if op == 55:  # R=A n
                self.r[code[pc]] = self.a
                pc += 1
                continue
            if op == 57:  # OUT
                self.out.append(self.a & 255)
                continue
            if op == 59:  # HASH: a = (a + *b + 512) * 773
                self.a = ((self.a + int(self.m[self.b & self.mmask]) + 512) * 773) & M32
                continue
            if op == 60:  # HASHD: *d = (*d + a + 512) * 773
                hd = self.d & self.hmask
                self.h[hd] = ((int(self.h[hd]) + self.a + 512) * 773) & M32
                continue
            if op < 64:  # unary group 00dddxxx
                ddd, xxx = op >> 3, op & 7
                if xxx == 0:  # swap with A (partial for byte memory)
                    v = self._get(ddd, 0)
                    if ddd in (4, 5):
                        self._set(ddd, self.a)
                        self.a = (self.a & ~0xFF) | (v & 0xFF)
                    else:
                        self._set(ddd, self.a)
                        self.a = v
                elif xxx == 1:
                    self._set(ddd, self._get(ddd, 0) + 1)
                elif xxx == 2:
                    self._set(ddd, self._get(ddd, 0) - 1)
                elif xxx == 3:
                    self._set(ddd, ~self._get(ddd, 0))
                elif xxx == 4:
                    self._set(ddd, 0)
                elif xxx == 7:  # ddd = R n
                    self._set(ddd, int(self.r[code[pc]]))
                    pc += 1
                else:
                    raise ZPAQLRuntimeError(f"bad opcode {op}")
                continue
            if op < 128:  # assignment 01dddsss
                ddd, sss = (op >> 3) & 7, op & 7
                imm = 0
                if sss == 7:
                    imm = code[pc]
                    pc += 1
                self._set(ddd, self._get(sss, imm))
                continue
            # binary group 1xxxxsss into A
            xxxx, sss = (op >> 3) & 15, op & 7
            imm = 0
            if sss == 7:
                imm = code[pc]
                pc += 1
            v = self._get(sss, imm)
            a = self.a
            if xxxx == 0:
                a = a + v
            elif xxxx == 1:
                a = a - v
            elif xxxx == 2:
                a = a * v
            elif xxxx == 3:
                a = a // v if v else 0
            elif xxxx == 4:
                a = a % v if v else 0
            elif xxxx == 5:
                a = a & v
            elif xxxx == 6:
                a = a & ~v
            elif xxxx == 7:
                a = a | v
            elif xxxx == 8:
                a = a ^ v
            elif xxxx == 9:
                a = a << (v & 31)
            elif xxxx == 10:
                a = (a & M32) >> (v & 31)
            elif xxxx == 11:
                self.f = 1 if a == v else 0
                continue
            elif xxxx == 12:
                self.f = 1 if a < v else 0
                continue
            elif xxxx == 13:
                self.f = 1 if a > v else 0
                continue
            else:
                raise ZPAQLRuntimeError(f"bad opcode {op}")
            self.a = a & M32
