"""ZPAQ block-header model description (COMP + HCOMP [+ PCOMP]).

Serialized layout inside an archive block (ZPAQ L2 spec; reference reader:
/root/reference/ZSFX/libzpaq.cpp:879-921):

    hsize[2 LE] hh hm ph pm n  comp[0] ... comp[n-1]  0  hcomp...  0

where hsize counts every byte after the two hsize bytes.  The PCOMP program,
when present, is *not* in the block header: it is compressed at the start of
the first segment as ``1 psize[2 LE] pcomp... 0`` (the trailing 0 is included
in psize); see PostProcessor, libzpaq.cpp:2187-2233.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from ..models.tables import COMPSIZE


@dataclass
class Model:
    """A ZPAQ context-model description: sizes, component list, HCOMP code."""

    hh: int = 0          # log2 size of H (context output array) for HCOMP
    hm: int = 0          # log2 size of M (byte history) for HCOMP
    ph: int = 0          # log2 size of H for PCOMP
    pm: int = 0          # log2 size of M for PCOMP
    comps: List[bytes] = field(default_factory=list)  # one entry per component
    hcomp: bytes = b""   # HCOMP bytecode, no trailing 0
    pcomp: Optional[bytes] = None  # PCOMP bytecode, no trailing 0

    @property
    def n(self) -> int:
        return len(self.comps)

    def comp_block(self) -> bytes:
        """hh hm ph pm n comp... 0 — the COMP section body."""
        out = bytearray([self.hh, self.hm, self.ph, self.pm, self.n])
        for c in self.comps:
            if COMPSIZE[c[0]] != len(c):
                raise ValueError(f"component {c!r} has wrong length")
            out += c
        out.append(0)
        return bytes(out)

    def header_bytes(self) -> bytes:
        """Full serialized block header: hsize[2] + COMP + HCOMP."""
        body = self.comp_block() + self.hcomp + b"\x00"
        hsize = len(body)
        if hsize > 65535:
            raise ValueError("model too big")
        return bytes([hsize & 255, hsize >> 8]) + body

    def pcomp_bytes(self) -> Optional[bytes]:
        """psize[2] + pcomp + 0, the blob embedded in the first segment."""
        if self.pcomp is None:
            return None
        blob = self.pcomp + b"\x00"
        return bytes([len(blob) & 255, len(blob) >> 8]) + blob

    def memory(self) -> int:
        """Decode memory in bytes — the reference ZPAQL::memory() model
        (libzpaq.cpp:978-998): per component CM 4*2^s; ICM 64*2^(s+2)+1024;
        MATCH 4*2^s+2^b; MIX 4*2^s*m; MIX2 2*2^s; ISSE 64*2^(s+2)+2048;
        SSE 128*2^s; plus the H/M arrays of both programs."""
        mem = (4 << self.hh) + (1 << self.hm) + (4 << self.ph) \
            + (1 << self.pm)
        for c in self.comps:
            t = c[0]
            if t == 2:                      # CM s limit
                mem += 4 << c[1]
            elif t == 3:                    # ICM s
                mem += (64 << (c[1] + 2)) + 1024
            elif t == 4:                    # MATCH s b
                mem += (4 << c[1]) + (1 << c[2])
            elif t == 6:                    # MIX2 s ...
                mem += 2 << c[1]
            elif t == 7:                    # MIX s j m ...
                mem += (4 << c[1]) * c[3]
            elif t == 8:                    # ISSE s j
                mem += (64 << (c[1] + 2)) + 2048
            elif t == 9:                    # SSE s ...
                mem += 128 << c[1]
        return mem

    @staticmethod
    def parse(data: bytes, offset: int = 0) -> Tuple["Model", int]:
        """Parse a serialized header, return (model, bytes consumed)."""
        if len(data) - offset < 7:
            raise ValueError("truncated header")
        p = offset
        hsize = data[p] + 256 * data[p + 1]
        p += 2
        end = p + hsize
        if end > len(data):
            raise ValueError("truncated header body")
        hh, hm, ph, pm, n = data[p : p + 5]
        p += 5
        comps = []
        for _ in range(n):
            t = data[p]
            size = COMPSIZE[t] if t < 10 else 0
            if size < 1:
                raise ValueError(f"invalid component type {t}")
            comps.append(bytes(data[p : p + size]))
            p += size
        if data[p] != 0:
            raise ValueError("missing COMP end")
        p += 1
        hcomp = bytes(data[p : end - 1])
        if data[end - 1] != 0:
            raise ValueError("missing HCOMP end")
        return Model(hh, hm, ph, pm, comps, hcomp), end - offset
