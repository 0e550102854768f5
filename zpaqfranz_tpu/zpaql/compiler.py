"""ZPAQL config-language compiler: source text -> Model bytecode.

Implements the config grammar of the ZPAQ L2 spec (documented at
/root/reference/ZSFX/libzpaq.h:475-716, reference implementation
libzpaq.cpp:2430-2706):

    COMP hh hm ph pm n
      i comptype args...   (i = 0..n-1)
    HCOMP
      zpaql...
    [POST 0 END  |  PCOMP cmd... ; zpaql... END  |  END]

Structured IF/IFNOT/ELSE/ENDIF and DO/WHILE/UNTIL/FOREVER lower to JT/JF/JMP
(or LJ for long ranges) with byte-identical encoding to the reference, so the
emitted bytecode can be stored in interoperable archives.  ``$1``..``$9``
(optionally ``$N+M``) substitute numeric arguments.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

from .opcodes import OPCODELIST, PSEUDO, OP_JT, OP_JF, OP_JMP, OP_LJ
from .header import Model
from ..models.tables import COMPNAME, COMPSIZE

_TOKENLIST = OPCODELIST + PSEUDO
_POST, _PCOMP, _END = (256 + PSEUDO.index(t) for t in ("post", "pcomp", "end"))
_IF, _IFNOT, _ELSE, _ENDIF = (256 + PSEUDO.index(t) for t in ("if", "ifnot", "else", "endif"))
_DO, _WHILE, _UNTIL, _FOREVER = (256 + PSEUDO.index(t) for t in ("do", "while", "until", "forever"))
_IFL, _IFNOTL, _ELSEL = (256 + PSEUDO.index(t) for t in ("ifl", "ifnotl", "elsel"))


class ZPAQLError(ValueError):
    pass


def _tokenize(src: str) -> List[str]:
    """Split into tokens, dropping (nested (comments))."""
    toks = []
    depth = 0
    cur = []
    for ch in src:
        if ch == "(":
            depth += 1
            if depth == 1 and cur:
                toks.append("".join(cur))
                cur = []
            continue
        if depth > 0:
            if ch == ")":
                depth -= 1
            continue
        if ch.isspace():
            if cur:
                toks.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        toks.append("".join(cur))
    return toks


class _Parser:
    def __init__(self, tokens: List[str], args):
        self.toks = tokens
        self.pos = 0
        self.args = list(args or [0] * 9) + [0] * 9

    def next(self) -> str:
        if self.pos >= len(self.toks):
            raise ZPAQLError("unexpected end of config")
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def number(self, low: int, high: int) -> int:
        t = self.next()
        m = re.match(r"^\$([1-9])(?:\+(\d+))?$", t)
        if m:
            r = self.args[int(m.group(1)) - 1] + int(m.group(2) or 0)
        else:
            m = re.match(r"^-?\d+", t)
            if not m:
                raise ZPAQLError(f"expected a number, got {t!r}")
            r = int(m.group(0))
        if r < low:
            raise ZPAQLError(f"number {r} too low (min {low}) at {t!r}")
        if r > high:
            raise ZPAQLError(f"number {r} too high (max {high}) at {t!r}")
        return r

    def expect(self, word: str) -> None:
        t = self.next()
        if t.lower() != word:
            raise ZPAQLError(f"expected {word!r}, got {t!r}")

    def token_index(self) -> int:
        """Opcode byte (0..255) or 256+pseudo index."""
        t = self.next().lower()
        for i, name in enumerate(_TOKENLIST):
            if name and name == t:
                return i
        raise ZPAQLError(f"unexpected token {t!r}")


def _compile_body(p: _Parser) -> Tuple[bytes, int]:
    """Compile one HCOMP/PCOMP body; return (code-without-trailing-0, end token)."""
    code = bytearray()
    if_stack: List[int] = []
    do_stack: List[int] = []
    while True:
        op = p.token_index()
        if op in (_POST, _PCOMP, _END):
            if if_stack or do_stack:
                raise ZPAQLError(
                    "unbalanced IF/DO: %d open IF, %d open DO at body end"
                    % (len(if_stack), len(do_stack)))
            return bytes(code), op
        operand = operand2 = None
        if op == _IF:
            op, operand = OP_JF, 0
            if_stack.append(len(code) + 1)
        elif op == _IFNOT:
            op, operand = OP_JT, 0
            if_stack.append(len(code) + 1)
        elif op in (_IFL, _IFNOTL):
            code += bytes([OP_JT if op == _IFL else OP_JF, 3])
            op, operand, operand2 = OP_LJ, 0, 0
            if_stack.append(len(code) + 1)
        elif op in (_ELSE, _ELSEL):
            op, operand = (OP_JMP, 0) if op == _ELSE else (OP_LJ, 0)
            operand2 = 0 if op == OP_LJ else None
            a = if_stack.pop()
            if code[a - 1] != OP_LJ:
                j = len(code) - a + 1 + (op == OP_LJ)
                if j > 127:
                    raise ZPAQLError("IF too big, use IFL/IFNOTL")
                code[a] = j
            else:
                j = len(code) + 2 + (op == OP_LJ)
                code[a] = j & 255
                code[a + 1] = (j >> 8) & 255
            if_stack.append(len(code) + 1)
        elif op == _ENDIF:
            a = if_stack.pop()
            j = len(code) - a - 1
            if code[a - 1] != OP_LJ:
                if j > 127:
                    raise ZPAQLError("IF too big, use IFL/IFNOTL/ELSEL")
                code[a] = j
            else:
                j = len(code)
                code[a] = j & 255
                code[a + 1] = (j >> 8) & 255
            continue
        elif op == _DO:
            do_stack.append(len(code))
            continue
        elif op in (_WHILE, _UNTIL, _FOREVER):
            a = do_stack.pop()
            j = a - len(code) - 2
            if j >= -127:
                op = {_WHILE: OP_JT, _UNTIL: OP_JF, _FOREVER: OP_JMP}[op]
                operand = j & 255
            else:
                if op == _WHILE:
                    code += bytes([OP_JF, 3])
                elif op == _UNTIL:
                    code += bytes([OP_JT, 3])
                op, operand, operand2 = OP_LJ, a & 255, (a >> 8) & 255
        elif (op & 7) == 7:  # needs numeric operand
            if op == OP_LJ:
                operand = p.number(0, 65535)
                operand2 = operand >> 8
                operand &= 255
            elif op in (OP_JT, OP_JF, OP_JMP):
                operand = p.number(-128, 127) & 255
            else:
                operand = p.number(0, 255)
        if op <= 255:
            code.append(op)
        if operand is not None:
            code.append(operand)
        if operand2 is not None:
            code.append(operand2)
        if len(code) > 65000:
            raise ZPAQLError("program too big")


def compile_config(src: str, args=None) -> Tuple[Model, str]:
    """Compile ZPAQL config text.  Returns (Model, pcomp_command_string)."""
    p = _Parser(_tokenize(src), args)
    p.expect("comp")
    hh = p.number(0, 255)
    hm = p.number(0, 255)
    ph = p.number(0, 255)
    pm = p.number(0, 255)
    n = p.number(0, 255)
    comps = []
    for i in range(n):
        idx = p.number(i, i)
        t = p.next().lower()
        if t not in COMPNAME or t == "":
            raise ZPAQLError(f"unknown component {t!r}")
        ctype = COMPNAME.index(t)
        cbytes = [ctype] + [p.number(0, 255) for _ in range(COMPSIZE[ctype] - 1)]
        comps.append(bytes(cbytes))
    p.expect("hcomp")
    hcomp, op = _compile_body(p)
    model = Model(hh, hm, ph, pm, comps, hcomp)
    pcomp_cmd = ""
    if op == _POST:
        p.number(0, 0)
        p.expect("end")
    elif op == _PCOMP:
        # consume the preprocessor command up to ';' (may be absent/empty)
        cmd_parts = []
        while True:
            t = p.next()
            if t == ";":
                break
            if t.endswith(";"):
                cmd_parts.append(t[:-1])
                break
            cmd_parts.append(t)
        pcomp_cmd = " ".join(cmd_parts)
        pcomp, op = _compile_body(p)
        if op != _END:
            raise ZPAQLError("expected END after PCOMP")
        model.pcomp = pcomp
    elif op != _END:
        raise ZPAQLError("expected END, POST 0 END, or PCOMP")
    return model, pcomp_cmd
