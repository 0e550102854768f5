"""Jidac journaling-archive data model and index reader.

Data model and single-pass ``read_archive`` mirroring the reference
(/root/reference/ZSFX/zsfx.cpp:640-698 structures, 1283-1627 read_archive):

- every journaling block is a normal ZPAQ block whose segment filename is
  ``jDC<YYYYMMDDHHMMSS><t><NNNNNNNNNN>`` (28 chars, t in {c,d,h,i}) and whose
  comment ends with ``" jDC\\x01"``;
- **c** transaction header: 8-byte LE csize of the following d blocks (jump
  target for index-only scans; negative = incomplete transaction, rolled
  back on read);
- **d** fragment data (decoded only on extract);
- **h** fragment table: bsize[4] then (sha1[20] usize[4])* with fragment IDs
  ascending from the filename number;
- **i** file index: per file ``0[8] name 0`` (deletion) or
  ``date[8] name 0 na[4] attr[na] ni[4] ptr[ni][4]``.

Decoding uses the native engine (fast scalar path); d blocks are skipped via
the c block's csize jump, which is why listing is O(index), not O(archive).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from .. import native


class ArchiveError(ValueError):
    pass


@dataclass
class HT:
    """Fragment entry: content hash + uncompressed size."""

    sha1: bytes = b"\x00" * 20
    usize: int = -1


@dataclass
class DT:
    """File entry: date (decimal YYYYMMDDHHMMSS UT, 0 = deleted), size,
    attributes, and the ordered fragment-ID list.

    ``attr_raw`` preserves every stored attribute byte; the franz extension
    appends b"fz" + crc32[4 LE] + xxh64[8 LE] after the base attributes
    (readers that only use the low 8 attr bytes skip it, keeping archives
    reference-compatible — SURVEY.md section 2.6 component 40)."""

    date: int = 0
    size: int = 0
    attr: int = 0
    attr_raw: bytes = b""
    ptr: List[int] = field(default_factory=list)

    def _franz(self):
        """Parse either FRANZBLOCK form -> (crc32, alt_hash) or None.

        Binary dialect: b"fz" + crc32[4 LE] + xxh64[8 LE] after the base
        attrs. Text form (classic FRANZOFFSET=50 layout): attrs are
        8 base bytes + 40 hex chars of the alt hash + NUL + 8 hex chars
        of CRC-32 + NUL."""
        import struct
        a = self.attr_raw
        i = a.find(b"fz")
        if i >= 0 and len(a) >= i + 14:
            return (struct.unpack("<I", a[i + 2:i + 6])[0],
                    struct.unpack("<Q", a[i + 6:i + 14])[0])
        if len(a) >= 58 and a[48:49] == b"\x00" and a[57:58] == b"\x00":
            try:
                return int(a[49:57], 16), int(a[8:48], 16) & ((1 << 64) - 1)
            except ValueError:
                return None
        return None

    @property
    def crc32(self):
        f = self._franz()
        return f[0] if f else None

    @property
    def xxh64(self):
        f = self._franz()
        return f[1] if f else None


@dataclass
class Block:
    """One d block: archive offset, first fragment ID, fragment count."""

    start: int          # first fragment ID
    offset: int         # archive offset (locator tag position)
    bsize: int = 0      # compressed size
    frags: int = 0
    usize: int = 0      # total uncompressed fragment bytes


@dataclass
class VER:
    """One version (transaction): date, offsets, update/delete counts."""

    date: int = 0
    lastdate: int = 0
    offset: int = 0
    data_offset: int = 0
    csize: int = 0
    firstFragment: int = 0
    updates: int = 0
    deletes: int = 0


@dataclass
class Jidac:
    """In-memory archive index."""

    ht: List[HT] = field(default_factory=lambda: [HT()])   # 1-based
    dt: Dict[str, DT] = field(default_factory=dict)
    block: List[Block] = field(default_factory=list)
    ver: List[VER] = field(default_factory=lambda: [VER()])
    csize: int = 0            # end of indexed data
    errors: int = 0
    first_error: int = -1     # offset of the first damaged block (or -1)
    is_index: bool = False    # detached index (no d blocks present)
    incomplete: bool = False  # trailing transaction truncated -> ignored
                              # (reference zsfx.cpp:1437)

    def file_size(self, name: str) -> int:
        d = self.dt.get(name)
        if d is None:
            return -1
        total = 0
        for j in d.ptr:
            if 0 < j < len(self.ht):
                u = self.ht[j].usize
                if u < 0:
                    return -1
                total += u
        return total


def _parse_jdc_name(name: bytes):
    """jDC<date14><type1><num10> -> (date, type, num) or None."""
    if len(name) != 28 or not name.startswith(b"jDC"):
        return None
    try:
        date = int(name[3:17])
        num = int(name[18:28])
    except ValueError:
        return None
    t = chr(name[17])
    if t not in "cdhi" or not (19000000000000 <= date < 30000000000000):
        return None
    return date, t, num


# Detached-index head. The reference reuses the "7kSt" start-tag magic for
# multipart/index heads (zsfx.cpp:1323-1332) — but those are the first four
# bytes of the 13-byte block locator tag on EVERY tagged archive, so an
# index needs a longer discriminator: 12 bytes that cannot collide with a
# locator tag (whose bytes 4..7 are fixed \xa01\x83\xd3). Body = the
# archive's transactions with every d block omitted (c/h/i only), so
# list/sync/dedup work without the data bytes.
INDEX_MAGIC = b"7kStIdxTPU\x01\x00"
INDEX_HEADER_LEN = 12


def is_index(data: bytes) -> bool:
    return data[:INDEX_HEADER_LEN] == INDEX_MAGIC


def read_archive(data: bytes, until: Optional[int] = None,
                 collect_errors: bool = False) -> Jidac:
    """Single pass over in-memory archive bytes building the Jidac index.

    ``until``: version count (small int) or date (YYYYMMDDHHMMSS) to roll
    back to, as the reference's -until (zsfx.cpp:1438-1443).

    Accepts both full archives and detached indexes (INDEX_MAGIC head);
    for an index the c-block csize jump is accounted but not seeked, since
    the d blocks are not present in the file.
    """
    index_mode = is_index(data)
    if index_mode:
        data = data[INDEX_HEADER_LEN:]
    return _read_archive_stream(native.NativeStream(data), until, index_mode)


def read_archive_src(src, until: Optional[int] = None) -> Jidac:
    """Streaming index scan over an ArchiveSource: memory is O(index) —
    d blocks are skipped via the c-block csize jump and file windows are
    bounded (reference: ~400 B/file enumeration, CHANGELOG.md:763-765)."""
    stream = src.stream()
    return _read_archive_stream(stream, until, src.is_index)


def _read_archive_stream(stream, until: Optional[int],
                         index_mode: bool) -> Jidac:
    jd = Jidac()
    jd.is_index = index_mode
    # streaming-format bookkeeping is ARCHIVE-scoped: an unnamed segment
    # (any block) continues the last named file (reference lastfile +
    # `first`, zsfx.cpp:1378-1380, 1568-1576)
    streaming_first = True
    last_stream_file = ""
    block_offset = stream.tell()
    data_offset = 0
    done = False
    try:
        while not done:
            block_offset = stream.tell()
            try:
                segs = stream.read_block()
            except native.NativeError:
                # Per-block error isolation (reference skip-and-continue,
                # zsfx.cpp:1596-1602): the native reader already consumed
                # the damaged block's tag, so the next read_block re-syncs
                # at the following locator tag. Only the bad block is lost.
                jd.errors += 1
                if jd.first_error < 0:
                    jd.first_error = block_offset
                if stream.tell() <= block_offset:
                    break            # no forward progress: stop, not spin
                continue
            if segs is None:
                break
            try:
                for seg in segs:
                    meta = _parse_jdc_name(seg.filename)
                    is_jdc = seg.comment.endswith(b" jDC\x01") and meta
                    if is_jdc:
                        fdate, t, num = meta
                        if t == "c":
                            if len(seg.data) < 8:
                                raise ArchiveError("c block too small")
                            data_offset = stream.tell()
                            jmp = struct.unpack("<q", seg.data[:8])[0]
                            rollback = jmp < 0
                            if until is not None:
                                if until < 19000000000000:
                                    rollback |= len(jd.ver) > until
                                else:
                                    rollback |= until < fdate
                            if rollback:
                                done = True
                                break
                            # truncated mid-transaction: the d-block jump
                            # lands past EOF -> the h/i blocks cannot
                            # exist. Ignore the transaction like the
                            # reference ("Incomplete transaction ignored",
                            # zsfx.cpp:1437) but FLAG it so t/l can warn
                            # and exit 1 instead of "0 blocks: all OK".
                            # (not in index mode: a detached index keeps
                            # the c blocks but intentionally omits the d
                            # data the csize jump refers to)
                            try:
                                total = stream.size()
                            except Exception:  # noqa: BLE001
                                total = None
                            if not index_mode and jmp > 0 \
                                    and total is not None \
                                    and data_offset + jmp > total:
                                jd.incomplete = True
                                done = True
                                break
                            v = VER(date=fdate, lastdate=fdate,
                                    offset=block_offset, data_offset=data_offset,
                                    csize=jmp, firstFragment=len(jd.ht))
                            jd.ver.append(v)
                            if jmp:
                                if not index_mode:
                                    stream.seek(data_offset + jmp)
                            break  # c blocks have one segment
                        elif t == "h":
                            v = jd.ver[-1]
                            if fdate > v.lastdate:
                                v.lastdate = fdate
                            body = seg.data
                            if len(body) % 24 != 4:
                                raise ArchiveError("bad h block size")
                            n = (len(body) - 4) // 24
                            bsize = struct.unpack("<I", body[:4])[0]
                            blk = Block(start=num, offset=data_offset,
                                        bsize=bsize, frags=n)
                            for i in range(n):
                                off = 4 + i * 24
                                sha1 = body[off:off + 20]
                                usize = struct.unpack(
                                    "<I", body[off + 20:off + 24])[0]
                                while len(jd.ht) <= num + i:
                                    jd.ht.append(HT())
                                jd.ht[num + i] = HT(sha1, usize)
                                blk.usize += usize
                            jd.block.append(blk)
                            data_offset += bsize
                        elif t == "i":
                            v = jd.ver[-1]
                            if fdate > v.lastdate:
                                v.lastdate = fdate
                            body = seg.data
                            p = 0
                            while p + 9 <= len(body):
                                date = struct.unpack("<q", body[p:p + 8])[0]
                                p += 8
                                end = body.index(0, p)
                                fn = body[p:end].decode("utf-8", "replace")
                                fn = fn.replace("\\", "/")
                                p = end + 1
                                dtr = DT(date=date)
                                if date:
                                    v.updates += 1
                                    na = struct.unpack("<I", body[p:p + 4])[0]
                                    p += 4
                                    attr = 0
                                    for i in range(na):
                                        if i < 8:
                                            attr |= body[p + i] << (i * 8)
                                    dtr.attr_raw = bytes(body[p:p + na])
                                    p += na
                                    dtr.attr = attr
                                    ni = struct.unpack("<I", body[p:p + 4])[0]
                                    p += 4
                                    dtr.ptr = list(struct.unpack(
                                        f"<{ni}I", body[p:p + 4 * ni]))
                                    p += 4 * ni
                                else:
                                    v.deletes += 1
                                jd.dt[fn] = dtr
                        else:  # 'd' reached directly: tolerated, ignored
                            pass
                    else:
                        # streaming (non-jidac) block: one HT entry per
                        # segment; a continuation segment (empty filename)
                        # belongs to the LAST named file (reference
                        # lastfile, zsfx.cpp:1378-1380 + 1568)
                        if len(jd.ver) == 1:
                            jd.ver.append(VER(offset=block_offset, csize=-1,
                                              firstFragment=len(jd.ht)))
                        if seg.filename:
                            last_stream_file = (
                                seg.filename.decode("utf-8", "replace")
                                .replace("\\", "/"))
                        fn = last_stream_file or "(untitled)"
                        dtr = jd.dt.setdefault(fn, DT())
                        if seg.filename or streaming_first:
                            # streaming comment convention:
                            # "<size> <YYYYMMDDHHMMSS>[ attr]"
                            sdate = 0
                            toks = bytes(seg.comment or b"").split()
                            if len(toks) >= 2 and toks[1].isdigit() \
                                    and len(toks[1]) == 14:
                                sdate = int(toks[1])
                            dtr.date = sdate or jd.ver[-1].date or 1
                            dtr.ptr = []
                            jd.ver[-1].updates += 1
                        dtr.ptr.append(len(jd.ht))
                        if not jd.block or jd.block[-1].offset != block_offset:
                            jd.block.append(Block(start=len(jd.ht),
                                                  offset=block_offset))
                        jd.block[-1].frags += 1
                        jd.block[-1].usize += len(seg.data)
                        jd.ht.append(HT(seg.sha1 or b"\x00" * 20, len(seg.data)))
                        jd.ht[-1].usize = len(seg.data)
                    streaming_first = False
            except (ArchiveError, ValueError, IndexError,
                    struct.error) as _e:
                # damaged segment body: isolate to this block and move
                # on (reference per-block catch, zsfx.cpp:1596-1602)
                jd.errors += 1
                if jd.first_error < 0:
                    jd.first_error = block_offset
                continue
        jd.csize = block_offset
    finally:
        stream.close()
    # compute file sizes
    for d in jd.dt.values():
        d.size = 0
        for j in d.ptr:
            if 0 < j < len(jd.ht) and d.size >= 0:
                u = jd.ht[j].usize
                d.size = -1 if u < 0 else d.size + u
    return jd


def fragment_to_block(jd: Jidac, frag: int) -> Optional[Block]:
    """Binary search the block containing fragment ID ``frag``
    (zsfx.cpp:2100-2131 semantics)."""
    lo, hi = 0, len(jd.block)
    while lo < hi:
        mid = (lo + hi) // 2
        b = jd.block[mid]
        if b.start + b.frags <= frag:
            lo = mid + 1
        elif b.start > frag:
            hi = mid
        else:
            return b
    return None
