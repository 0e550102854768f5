"""Jidac add: scan, fragment, dedup, compress, append one transaction.

The write path of the journaling archiver (reference behavior reconstructed
from the format written by read_archive/zsfx.cpp:1283-1627 and the add()
call stack in SURVEY.md section 3.1):

  scan filesystem -> diff against the index (date+size) -> CDC fragmenting
  (native rolling hash) -> SHA-1 dedup -> pack new fragments into d blocks
  -> compress blocks -> append  c + d... + h... + i...  as one transaction.

Block compression runs through the native engine by default; the batched
TPU encoder takes over when multiple blocks are ready (lanes = blocks).
Every emitted block is a standard ZPAQ block, so reference zpaqfranz can
list/extract our archives.
"""

from __future__ import annotations

import datetime
import os
import pathlib
import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

from .. import native
from ..codec.methods import make_model
from ..zpaql.header import Model
from .index import DT, HT, Jidac, read_archive


class AddError(RuntimeError):
    pass


def expand_parts(spec: str) -> Tuple[List[str], "object"]:
    """Multipart archive spec ('*' or '?' wildcards) -> (existing parts in
    order, namer(n) for new parts). Reference semantics: subpart
    (zsfx.cpp:413-421): wildcards are replaced by the part number, padded
    to the wildcard width."""
    import glob
    import re
    m = re.search(r"[*?]+", spec)
    if not m:
        return ([spec] if pathlib.Path(spec).exists() else []), None
    width = len(m.group(0))
    existing = sorted(glob.glob(spec))

    def namer(n: int) -> str:
        num = str(n).zfill(max(width, 1))
        return spec[:m.start()] + num + spec[m.end():]

    return existing, namer


def now_date() -> int:
    """Current UTC time as decimal YYYYMMDDHHMMSS."""
    t = datetime.datetime.now(datetime.timezone.utc)
    return (t.year * 10**10 + t.month * 10**8 + t.day * 10**6
            + t.hour * 10**4 + t.minute * 100 + t.second)


def unix_to_date(ts: float) -> int:
    t = datetime.datetime.fromtimestamp(ts, datetime.timezone.utc)
    return (t.year * 10**10 + t.month * 10**8 + t.day * 10**6
            + t.hour * 10**4 + t.minute * 100 + t.second)


def _file_attr(st: os.stat_result) -> int:
    """'u' + low 16 mode bits, the reference's unix attr encoding."""
    return ord("u") | ((st.st_mode & 0xFFFF) << 8)


def scan_files(paths: Sequence[str]) -> Dict[str, Tuple[int, int, int]]:
    """Recursive scan -> {relative name: (date, size, attr)}."""
    out: Dict[str, Tuple[int, int, int]] = {}
    for p in paths:
        root = pathlib.Path(p)
        if root.is_file():
            st = root.stat()
            out[str(root).replace("\\", "/").lstrip("./")] = (
                unix_to_date(st.st_mtime), st.st_size, _file_attr(st))
        elif root.is_dir():
            for dirpath, dirnames, filenames in os.walk(root):
                dirnames.sort()
                for fn in sorted(filenames):
                    full = pathlib.Path(dirpath) / fn
                    try:
                        st = full.stat()
                    except OSError:
                        continue
                    name = str(full).replace("\\", "/").lstrip("./")
                    out[name] = (unix_to_date(st.st_mtime), st.st_size,
                                 _file_attr(st))
    return out


def _jdc_name(date: int, typ: str, num: int) -> bytes:
    return b"jDC" + f"{date:014d}{typ}{num:010d}".encode()


@dataclass
class _Job:
    """One d block to compress: fragment IDs + concatenated bytes."""

    first_frag: int
    frags: List[Tuple[bytes, int]]   # (sha1, usize) per fragment
    data: bytearray


_STORE_MODEL = Model(hh=0, hm=0)


def _compress_d_block(model: Optional[Model], pre, job: _Job,
                      date: int) -> bytes:
    """Host-path d-block compression: the same prepare_payload decision
    as the device lanes (parallel/engine.py), coded by the native engine."""
    from ..parallel.engine import prepare_payload
    comment = b"%d jDC\x01" % len(job.data)
    name = _jdc_name(date, "d", job.first_frag)
    raw = bytes(job.data)
    payload, store = prepare_payload(pre, raw)
    if store:
        return native.compress_block(_STORE_MODEL, raw, name, comment)
    if model is None:
        model = _STORE_MODEL
    return native.compress_block(model, payload, name, comment)


def add(archive: str, files: Sequence[str], method: str = "1",
        fragment_bits: int = 16, threads: int = 0,
        date: Optional[int] = None, summary: bool = False,
        key: Optional[str] = None,
        use_device: bool = False,
        index_path: Optional[str] = None,
        chunk: int = 0,
        notrim: bool = False,
        tmp: bool = False) -> Tuple[int, int, int]:
    """Append one transaction. Returns (files added, frags added, bytes).

    index_path: also append the transaction's c/h/i blocks (no d data) to
    a detached index file (reference -index, CHANGELOG.md:687-717) so
    list/sync/dedup work without reading the archive back.
    chunk: with a multipart spec, cap each written part at this many
    bytes (reference -chunk fixed-size parts, CHANGELOG.md:922-927).
    notrim: keep a trailing incomplete transaction instead of truncating
    it before appending (reference default auto-trim, CHANGELOG.md:360-376).
    tmp: create new files as <name>.tmp then rename into place
    (reference -tmp write-then-rename, CHANGELOG.md:357-359; appends to an
    existing archive stay in-place — crash safety there comes from the
    transactional format + auto-trim)."""
    from ..codec import crypto
    parts, part_namer = expand_parts(archive)
    multipart = part_namer is not None
    existing = b"".join(pathlib.Path(p).read_bytes() for p in parts)
    path = pathlib.Path(parts[-1]) if parts else pathlib.Path(
        part_namer(1) if multipart else archive)
    salt = None
    plain = existing
    if key is not None:
        if existing:
            salt = existing[:crypto.SALT_LEN]
            plain = crypto.decrypt_archive(existing, key)
        else:
            salt = crypto.new_salt()
            plain = b""
    trimmed = 0
    if plain:
        jd = read_archive(plain)
        if not notrim and not multipart:
            # Auto-trim of a trailing bad transaction (reference default,
            # CHANGELOG.md:360-376). Three damage shapes:
            #  - trailing non-block garbage: csize stops short of the end
            #  - truncated/garbled tail blocks: the error consumed the
            #    rest of the stream; cut at the first error IF everything
            #    before it is clean (mid-archive damage is NOT trimmed —
            #    skip-and-continue already read past it)
            #  - a half-written transaction (c/d/h landed, i did not):
            #    drop the dangling version entirely
            cut = min(jd.csize, len(plain))
            if jd.errors and 0 <= jd.first_error < cut:
                probe = read_archive(plain[:jd.first_error])
                if probe.errors == 0 and probe.csize == jd.first_error:
                    cut, jd = jd.first_error, probe
            while (len(jd.ver) > 1 and jd.ver[-1].csize >= 0
                   and jd.ver[-1].updates == 0 and jd.ver[-1].deletes == 0):
                cut = jd.ver[-1].offset
                jd = read_archive(plain[:cut])
            if cut < len(plain):
                trimmed = len(plain) - cut
                plain = plain[:cut]
    elif index_path and pathlib.Path(index_path).exists():
        # remote-archive mode: dedup against the detached index alone
        jd = read_archive(pathlib.Path(index_path).read_bytes())
    else:
        jd = Jidac()

    model, pre = make_model(method)   # raises for not-yet-supported methods
    block_cap = min(1 << pre.block_bits, 1 << 24)  # >= threads jobs in flight

    ext = scan_files(files)
    date = date or now_date()
    if jd.ver[-1].date >= date:
        date = jd.ver[-1].date + 1   # version dates must ascend

    # dedup table over existing fragments
    dedup: Dict[bytes, int] = {}
    for i, h in enumerate(jd.ht):
        if i and h.sha1 != b"\x00" * 20:
            dedup[h.sha1] = i

    changed: List[str] = []
    deleted: List[str] = []
    for name, (fdate, fsize, fattr) in sorted(ext.items()):
        d = jd.dt.get(name)
        if d is None or d.date != fdate or d.size != fsize:
            changed.append(name)
    for name, d in sorted(jd.dt.items()):
        if d.date and name not in ext and _under_any(name, files):
            deleted.append(name)
    if not changed and not deleted:
        return 0, 0, 0

    next_frag = len(jd.ht)
    jobs: List[_Job] = []
    cur = _Job(first_frag=next_frag, frags=[], data=bytearray())
    file_ptrs: Dict[str, List[int]] = {}
    new_ht: List[HT] = []

    # per-file CDC + hashing runs in a thread pool (the native calls
    # release the GIL); the dedup/fragment-ID assignment stays serial in
    # file order so IDs are deterministic (SURVEY.md section 7 hard part 6)
    import concurrent.futures as _fut
    hash_threads = threads or min(16, (os.cpu_count() or 4))

    def _digest_file(name: str):
        data = pathlib.Path(name).read_bytes()
        frags, crc, xxh = native.digest_file(data, fragment_bits)
        return data, (crc, xxh), frags

    file_sums: Dict[str, Tuple[int, int]] = {}
    # compression overlaps the digest scan: each d-block job is submitted
    # the moment it fills (the reference's add() gets the same overlap
    # from its per-block worker threads, SURVEY.md section 2.8)
    cx_threads = threads or max(2, min(8, (os.cpu_count() or 4)))
    cx = _fut.ThreadPoolExecutor(max_workers=cx_threads)
    d_futs: List["_fut.Future"] = []
    pipeline_host = not (use_device and model is not None and model.n > 0)
    try:
        with _fut.ThreadPoolExecutor(max_workers=hash_threads) as hx:
            for name, (data, sums, frags) in zip(
                    changed, hx.map(_digest_file, changed)):
                file_sums[name] = sums
                ptrs: List[int] = []
                for sha, start, end in frags:
                    fid = dedup.get(sha)
                    if fid is None:
                        fid = next_frag
                        next_frag += 1
                        dedup[sha] = fid
                        new_ht.append(HT(sha, end - start))
                        cur.frags.append((sha, end - start))
                        cur.data += data[start:end]
                        if len(cur.data) >= block_cap:
                            jobs.append(cur)
                            if pipeline_host:
                                d_futs.append(cx.submit(
                                    _compress_d_block, model, pre, cur,
                                    date))
                            cur = _Job(first_frag=next_frag, frags=[],
                                       data=bytearray())
                    ptrs.append(fid)
                file_ptrs[name] = ptrs
        if cur.frags:
            jobs.append(cur)
            if pipeline_host:
                d_futs.append(cx.submit(_compress_d_block, model, pre, cur,
                                        date))

        # ---- compress d blocks: device lanes or pipelined host threads ----
        if not pipeline_host:
            from ..parallel.engine import encode_jidac_blocks
            d_blocks = encode_jidac_blocks(model, pre, jobs, date, _jdc_name)
        else:
            d_blocks = [f.result() for f in d_futs]
    finally:
        cx.shutdown(wait=False)

    # ---- assemble the transaction ----
    out = bytearray()
    ix = bytearray()          # detached-index copy: c/h/i, no d blocks
    csize = sum(len(b) for b in d_blocks)
    cbody = struct.pack("<q", csize)
    cname = _jdc_name(date, "c", next_frag - len(new_ht))
    store = Model(hh=0, hm=0)
    cblk = native.compress_block(
        store, cbody, cname, b"%d jDC\x01" % len(cbody))
    out += cblk
    ix += cblk
    for b in d_blocks:
        out += b
    for job, dblk in zip(jobs, d_blocks):
        body = bytearray(struct.pack("<I", len(dblk)))
        for sha, usize in job.frags:
            body += sha + struct.pack("<I", usize)
        hname = _jdc_name(date, "h", job.first_frag)
        hblk = native.compress_block(
            store, bytes(body), hname, b"%d jDC\x01" % len(body))
        out += hblk
        ix += hblk
    ibody = bytearray()
    for name in deleted:
        ibody += struct.pack("<q", 0) + name.encode() + b"\x00"
    for name in changed:
        fdate, fsize, fattr = ext[name]
        ibody += struct.pack("<q", fdate) + name.encode() + b"\x00"
        crc, xxh = file_sums[name]
        franz = b"fz" + struct.pack("<I", crc) + struct.pack("<Q", xxh)
        attr_bytes = bytes([fattr & 255, (fattr >> 8) & 255,
                            (fattr >> 16) & 255]) + franz
        ibody += struct.pack("<I", len(attr_bytes)) + attr_bytes
        ptrs = file_ptrs[name]
        ibody += struct.pack("<I", len(ptrs))
        ibody += struct.pack(f"<{len(ptrs)}I", *ptrs)
    iname = _jdc_name(date, "i", next_frag - len(new_ht))
    iblk = native.compress_block(
        store, bytes(ibody), iname, b"%d jDC\x01" % len(ibody))
    out += iblk
    ix += iblk

    # on-disk append offset: past the salt header, minus any trimmed tail
    disk_end = len(existing) - trimmed
    if key is not None:
        if not existing:
            payload = salt + crypto.encrypt_append(bytes(out), key, salt,
                                                   crypto.SALT_LEN)
        else:
            payload = crypto.encrypt_append(bytes(out), key, salt, disk_end)
    else:
        payload = bytes(out)
    if multipart:
        # one new part per transaction (reference: parts are rsync-friendly
        # append units; `m`/consolidate merges them); -chunk caps each
        # part's size, continuing the numbering mid-transaction
        pieces = ([payload[i:i + chunk] for i in range(0, len(payload),
                                                       chunk)]
                  if chunk else [payload])
        for k, piece in enumerate(pieces):
            with open(part_namer(len(parts) + 1 + k), "wb") as f:
                f.write(piece)
    elif not path.exists():
        if tmp:
            tpath = path.with_name(path.name + ".tmp")
            tpath.write_bytes(payload)
            tpath.replace(path)
        else:
            path.write_bytes(payload)
    else:
        with open(path, "r+b") as f:
            if trimmed:
                f.truncate(disk_end)
            f.seek(0, 2)
            f.write(payload)
    if index_path:
        from .index import INDEX_MAGIC, INDEX_HEADER_LEN
        ipath = pathlib.Path(index_path)
        if not ipath.exists():
            ipath.write_bytes(INDEX_MAGIC)
        with open(ipath, "ab") as f:
            f.write(bytes(ix))
    return len(changed), len(new_ht), len(out)


def _under_any(name: str, roots: Sequence[str]) -> bool:
    for r in roots:
        rr = str(r).replace("\\", "/").lstrip("./").rstrip("/")
        if name == rr or name.startswith(rr + "/"):
            return True
    return False
