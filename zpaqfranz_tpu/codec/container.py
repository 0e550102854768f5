"""ZPAQ block/segment container: scalar decoder path (host oracle).

Stream grammar (ZPAQ L2 spec; reference: /root/reference/ZSFX/libzpaq.cpp
Decoder 2082-2173, PostProcessor 2175-2233, Decompresser 2235-2381):

  archive   := (locator_tag? block)*
  block     := "zPQ" level(1|2) 1 header segment* 255
  header    := hsize[2 LE] hh hm ph pm n comp... 0 hcomp... 0
  segment   := 1 filename 0 comment 0 0 data (254 | 253 sha1[20])
  data      := arithmetic-coded bit stream if n>0, else
               (count[4 BE] bytes...)* 0[4]; both end with 4 zero bytes.

The first decoded bytes of the first segment select postprocessing:
0 = PASS, 1 psize[2 LE] pcomp = run a PCOMP program over decoded bytes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Callable

from ..zpaql.header import Model
from ..zpaql.vm import VM
from ..models.predictor import Predictor

# 13-byte locator tag; findBlock matches the rolling hash of these plus "zPQ".
# (libzpaq writeTag; constant bytes verified against reference archives.)
TAG = bytes([0x37, 0x6B, 0x53, 0x74, 0xA0, 0x31, 0x83, 0xD3, 0x8C, 0xB2, 0x28, 0xB0, 0xD3])


class FormatError(ValueError):
    pass


class ByteReader:
    """Sequential reader over a bytes-like object."""

    def __init__(self, data, pos: int = 0):
        self.data = memoryview(data)
        self.pos = pos

    def get(self) -> int:
        if self.pos >= len(self.data):
            return -1
        c = self.data[self.pos]
        self.pos += 1
        return c

    def eof(self) -> bool:
        return self.pos >= len(self.data)


class Decoder:
    """Carry-less binary arithmetic decoder over one segment stream."""

    def __init__(self, pr: Predictor, reader: ByteReader):
        self.pr = pr
        self.r = reader
        if pr.is_modeled():
            self.low, self.high, self.curr = 1, 0xFFFFFFFF, 0
        else:
            self.low = self.high = self.curr = 0

    def _decode(self, p: int) -> int:
        low, high, curr = self.low, self.high, self.curr
        if curr < low or curr > high:
            raise FormatError("archive corrupted")
        mid = low + (((high - low) * p) >> 16)
        if curr <= mid:
            y, high = 1, mid
        else:
            y, low = 0, mid + 1
        while (high ^ low) < 0x1000000:
            high = ((high << 8) | 255) & 0xFFFFFFFF
            low = (low << 8) & 0xFFFFFFFF
            low += low == 0
            c = self.r.get()
            if c < 0:
                raise FormatError("unexpected end of file")
            curr = ((curr << 8) | c) & 0xFFFFFFFF
        self.low, self.high, self.curr = low, high, curr
        return y

    def decompress(self) -> int:
        """Decode one byte, or -1 at end of segment."""
        if self.pr.is_modeled():
            if self.curr == 0:  # segment initialization: preload 4 bytes
                for _ in range(4):
                    self.curr = ((self.curr << 8) | (self.r.get() & 255)) & 0xFFFFFFFF
            if self._decode(0):
                if self.curr != 0:
                    raise FormatError("decoding end of stream")
                return -1
            pr = self.pr
            c = 1
            while c < 256:
                p = pr.predict() * 2 + 1
                c += c + self._decode(p)
                pr.update(c & 1)
            return c - 256
        else:
            if self.curr == 0:
                for _ in range(4):
                    self.curr = ((self.curr << 8) | (self.r.get() & 255)) & 0xFFFFFFFF
                if self.curr == 0:
                    return -1
            self.curr -= 1
            return self.r.get()

    def skip(self) -> int:
        """Skip remaining segment data; return the byte after it."""
        c = -1
        if self.pr.is_modeled():
            while self.curr == 0:
                c = self.r.get()
                self.curr = c & 0xFFFFFFFF if c >= 0 else 0
                if c < 0:
                    return -1
            while self.curr:
                c = self.r.get()
                if c < 0:
                    return -1
                self.curr = ((self.curr << 8) | c) & 0xFFFFFFFF
            while True:
                c = self.r.get()
                if c != 0:
                    return c
        else:
            if self.curr == 0:
                for _ in range(4):
                    c = self.r.get()
                    if c < 0:
                        return -1
                    self.curr = ((self.curr << 8) | c) & 0xFFFFFFFF
            while self.curr > 0:
                while self.curr > 0:
                    self.curr -= 1
                    if self.r.get() < 0:
                        raise FormatError("skipped to EOF")
                self.curr = 0
                for _ in range(4):
                    c = self.r.get()
                    if c < 0:
                        return -1
                    self.curr = ((self.curr << 8) | c) & 0xFFFFFFFF
            if c >= 0:
                c = self.r.get()
            return c


class PostProcessor:
    """5-state postprocessor: PASS or a PCOMP program over decoded bytes."""

    def __init__(self, ph: int, pm: int, out: bytearray):
        self.state = 0
        self.hsize = 0
        self.ph, self.pm = ph, pm
        self.out = out
        self.vm: Optional[VM] = None
        self._pcomp = bytearray()

    def write(self, c: int) -> int:
        if self.state == 0:
            if c < 0:
                raise FormatError("unexpected EOS")
            self.state = c + 1
            if self.state > 2:
                raise FormatError("unknown post processing type")
        elif self.state == 1:  # PASS
            if c >= 0:
                self.out.append(c)
        elif self.state == 2:
            if c < 0:
                raise FormatError("unexpected EOS")
            self.hsize = c
            self.state = 3
        elif self.state == 3:
            if c < 0:
                raise FormatError("unexpected EOS")
            self.hsize += c * 256
            if self.hsize < 1:
                raise FormatError("empty PCOMP")
            self._pcomp = bytearray()
            self.state = 4
        elif self.state == 4:
            if c < 0:
                raise FormatError("unexpected EOS")
            self._pcomp.append(c)
            if len(self._pcomp) == self.hsize:
                # stored blob includes the trailing 0 terminator
                code = bytes(self._pcomp[:-1]) if self._pcomp[-1] == 0 else bytes(self._pcomp)
                self.vm = VM(code, self.ph, self.pm)
                self.vm.out = self.out
                self.state = 5
        elif self.state == 5:
            self.vm.run(c & 0xFFFFFFFF if c >= 0 else 0xFFFFFFFF)
        return self.state

    def pcomp_code(self) -> Optional[bytes]:
        return bytes(self._pcomp) if self._pcomp else None


@dataclass
class Segment:
    filename: bytes
    comment: bytes
    data: bytes = b""
    sha1: Optional[bytes] = None  # stored 20-byte checksum, if any


@dataclass
class BlockResult:
    model: Model
    segments: List[Segment] = field(default_factory=list)
    offset: int = 0  # archive offset where the block header tag scan matched


def find_block(r: ByteReader) -> Optional[Model]:
    """Scan for the next block start; parse and return its model header.

    Matches either an immediate "zPQ" level 1 marker or the 13-byte locator
    tag via the reference's 4 rolling hashes (libzpaq.cpp:2239-2266).
    """
    h1, h2, h3, h4 = 0x3D49B113, 0x29EB7F93, 0x2614BE13, 0x3828EB13
    while True:
        c = r.get()
        if c < 0:
            return None
        h1 = (h1 * 12 + c) & 0xFFFFFFFF
        h2 = (h2 * 20 + c) & 0xFFFFFFFF
        h3 = (h3 * 28 + c) & 0xFFFFFFFF
        h4 = (h4 * 44 + c) & 0xFFFFFFFF
        if h1 == 0xB16B88F1 and h2 == 0xFF5376F1 and h3 == 0x72AC5BF1 and h4 == 0x2F909AF1:
            break
    level = r.get()
    if level not in (1, 2):
        raise FormatError("unsupported ZPAQ level")
    if r.get() != 1:
        raise FormatError("unsupported ZPAQL type")
    start = r.pos
    model, used = Model.parse(bytes(r.data[start : start + 65540 if start + 65540 < len(r.data) else len(r.data)]))
    r.pos = start + used
    if level == 1 and model.n == 0:
        raise FormatError("ZPAQ level 1 requires at least 1 component")
    return model


def read_filename(r: ByteReader) -> Optional[bytes]:
    """Return next segment's filename, or None at end of block."""
    c = r.get()
    if c == 255:
        return None
    if c != 1:
        raise FormatError("missing segment or end of block")
    name = bytearray()
    while True:
        c = r.get()
        if c < 0:
            raise FormatError("unexpected EOF")
        if c == 0:
            return bytes(name)
        name.append(c)


def read_comment(r: ByteReader) -> bytes:
    comment = bytearray()
    while True:
        c = r.get()
        if c < 0:
            raise FormatError("unexpected EOF")
        if c == 0:
            break
        comment.append(c)
    if r.get() != 0:
        raise FormatError("missing reserved byte")
    return bytes(comment)


def read_segment_end(r: ByteReader, dec: Decoder, skipped: bool) -> Optional[bytes]:
    """Read the segment trailer; return the stored SHA-1 or None."""
    c = dec.skip() if skipped else r.get()
    if c == 254:
        return None
    if c == 253:
        return bytes(r.get() & 255 for _ in range(20))
    raise FormatError("missing end of segment marker")


def decompress_block(r: ByteReader, model: Model, max_bytes: int = -1,
                     progress: Optional[Callable[[int], None]] = None) -> BlockResult:
    """Decode all segments of one block starting right after its header."""
    result = BlockResult(model=model)
    out = bytearray()
    pr: Optional[Predictor] = None
    dec: Optional[Decoder] = None
    pp: Optional[PostProcessor] = None
    while True:
        name = read_filename(r)
        if name is None:
            break
        comment = read_comment(r)
        if dec is None:  # first segment: init model state for the block
            pr = Predictor(model)
            dec = Decoder(pr, r)
            pp = PostProcessor(model.ph, model.pm, out)
        start = len(out)
        skipped = False
        while True:
            c = dec.decompress()
            pp.write(c)
            if c == -1:
                break
            if progress and len(out) % 65536 == 0:
                progress(len(out))
            if 0 <= max_bytes <= len(out):
                skipped = True
                break
        sha1 = read_segment_end(r, dec, skipped)
        result.segments.append(Segment(name, comment, bytes(out[start:]), sha1))
        if skipped:
            break
    return result


def decompress_stream(data, limit_blocks: int = -1) -> List[BlockResult]:
    """Decode every block in an archive byte stream (oracle path)."""
    r = ByteReader(data)
    blocks = []
    while True:
        try:
            model = find_block(r)
        except FormatError:
            break
        if model is None or (0 <= limit_blocks <= len(blocks)):
            break
        blocks.append(decompress_block(r, model))
    return blocks
