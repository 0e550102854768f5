"""Jidac extract: decode d blocks, verify fragments, write files.

Mirrors the reference extract loop (/root/reference/ZSFX/zsfx.cpp:1647-2281):
label selected files, map fragments to blocks, decode each needed block,
verify every fragment's SHA-1 before writing, then merge consecutive
fragments into file writes and set dates/permissions last.

Blocks decode independently (format guarantee, libzpaq.h:57-59), so the
block loop runs on a thread pool — ctypes releases the GIL during native
decode, giving real block-level parallelism on the host path. (The TPU path
batches many blocks as decoder lanes instead; see ops/coder_batched.py.)
"""

from __future__ import annotations

import concurrent.futures
import os
import pathlib
from typing import Dict, List, Optional, Sequence, Tuple

from .. import native
from .archive_io import ArchiveSource, as_source
from .index import Block, Jidac, fragment_to_block


class ExtractError(RuntimeError):
    pass


def _decode_block(src, blk: Block) -> bytes:
    """Decode one d block to its concatenated fragment bytes.

    ``src``: bytes or ArchiveSource. Each call opens its own cursor, so the
    thread pool decodes blocks concurrently with O(block) memory each
    (reference decompressThread keeps a per-thread InputArchive handle,
    zsfx.cpp:1741)."""
    with as_source(src).stream() as s:
        s.seek(blk.offset)
        segs = s.read_block()
    if not segs:
        raise ExtractError(f"block at {blk.offset} not found")
    out = b"".join(seg.data for seg in segs)
    if len(out) < blk.usize:
        raise ExtractError(
            f"block at {blk.offset}: {len(out)} < {blk.usize} bytes")
    return out


def _check_fragments(jd: Jidac, blk: Block, out: bytes) -> None:
    """Verify the block's fragment SHA-1s in one native batched call
    (two-stream SHA-NI over consecutive spans; no per-fragment slicing)."""
    from .. import native
    ends: List[int] = []
    q = 0
    for j in range(blk.start, blk.start + blk.frags):
        q += jd.ht[j].usize
        ends.append(q)
    if q > len(out):
        raise ExtractError(f"block at {blk.offset}: decoded short "
                           f"({len(out)} < {q})")
    digests = native.sha1_spans(out, ends)
    for k, j in enumerate(range(blk.start, blk.start + blk.frags)):
        want = jd.ht[j].sha1
        if want != b"\x00" * 20 and digests[k * 20:(k + 1) * 20] != want:
            raise ExtractError(f"fragment {j}: checksum failed")


def _verify_fragments(jd: Jidac, blk: Block, out: bytes) -> Dict[int, bytes]:
    """Split decoded block bytes into fragments, checking SHA-1s."""
    _check_fragments(jd, blk, out)
    frags: Dict[int, bytes] = {}
    q = 0
    for j in range(blk.start, blk.start + blk.frags):
        usize = jd.ht[j].usize
        frags[j] = out[q:q + usize]
        q += usize
    return frags


def _date_to_unix(date: int) -> float:
    """Decimal YYYYMMDDHHMMSS UT -> unix seconds."""
    import calendar
    s = f"{date:014d}"
    t = (int(s[0:4]), int(s[4:6]), int(s[6:8]),
         int(s[8:10]), int(s[10:12]), int(s[12:14]), 0, 0, 0)
    return calendar.timegm(t)


def select_files(jd: Jidac, patterns: Sequence[str]) -> List[str]:
    """Wildcard selection with the reference's * and ? semantics
    (zsfx.cpp:606-626 ispath)."""
    import fnmatch
    names = [n for n, d in jd.dt.items() if d.date]
    if not patterns:
        return sorted(names)
    out = []
    for n in names:
        for p in patterns:
            if fnmatch.fnmatchcase(n, p) or n == p or n.startswith(p.rstrip("/") + "/"):
                out.append(n)
                break
    return sorted(out)


def extract(data, jd: Jidac, to_dir: str,
            patterns: Sequence[str] = (), threads: int = 0,
            dry_run: bool = False, use_device: Optional[bool] = None,
            progress=None, rename=None) -> Tuple[int, int]:
    """Extract selected files under ``to_dir``. Returns (files, bytes).

    ``data``: archive bytes or a streaming ArchiveSource.
    ``use_device``: decode modeled blocks as batched lanes on the JAX
    device (TPU) instead of host threads (parallel/engine.py). True/False
    force; None = auto per device_policy (calibration-gated).
    ``rename``: optional name->name mapping applied to output paths (the
    reference's -find/-replace substitution, CHANGELOG.md v60 t/x)."""
    data = as_source(data)
    names = select_files(jd, patterns)
    needed_blocks: Dict[int, Block] = {}
    for n in names:
        for frag in jd.dt[n].ptr:
            b = fragment_to_block(jd, frag)
            if b is None:
                raise ExtractError(f"{n}: fragment {frag} not in any block")
            needed_blocks[b.offset] = b
    if dry_run:
        return len(names), sum(jd.dt[n].size for n in names)

    blocks = list(needed_blocks.values())
    frag_bytes: Dict[int, bytes] = {}
    threads = threads or min(32, (os.cpu_count() or 4))

    est = sum(b.usize for b in blocks)
    from ..device_policy import deadline_for, resolve, run_with_deadline
    use_device = resolve(use_device, "codec", est)
    if use_device:
        # a dead/hung/SLOW tunnel chip must never fail an extract: device
        # errors AND wall-clock deadline expiry (the observed hang mode
        # raises nothing) fall back to the host pool — same bytes either way
        try:
            from ..parallel.engine import decode_jidac_blocks
            decoded = run_with_deadline(
                lambda: decode_jidac_blocks(data, jd, blocks),
                deadline_for(est), "extract decode")
            for blk in blocks:
                frag_bytes.update(
                    _verify_fragments(jd, blk, decoded[blk.offset]))
        except Exception as e:  # noqa: BLE001 — host re-derives and re-raises
            # genuine corruption too: the host decode is the ground truth
            # and reproduces the same ExtractError if the data is bad
            import sys
            print(f"zpaqfranz-tpu: device decode unavailable "
                  f"({type(e).__name__}); falling back to host", file=sys.stderr)
            use_device = False
            frag_bytes.clear()
    if not use_device:
        def work(blk: Block) -> Dict[int, bytes]:
            return _verify_fragments(jd, blk, _decode_block(data, blk))

        total_u = sum(b.usize for b in blocks) or 1
        done_u = 0
        with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as ex:
            for blk, result in zip(blocks, ex.map(work, blocks)):
                frag_bytes.update(result)
                done_u += blk.usize
                if progress is not None:
                    progress(done_u, total_u)

    root = pathlib.Path(to_dir)
    total = 0
    for n in names:
        d = jd.dt[n]
        out_name = rename(n) if rename else n
        path = root / out_name.lstrip("/")
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            for frag in d.ptr:
                piece = frag_bytes.get(frag)
                if piece is None:
                    raise ExtractError(f"{n}: fragment {frag} missing")
                f.write(piece)
                total += len(piece)
        if d.date > 19000000000000:
            ts = _date_to_unix(d.date)
            os.utime(path, (ts, ts))
        if d.attr and (d.attr & 255) == ord("u"):
            mode = (d.attr >> 8) & 0o7777
            if mode:
                os.chmod(path, mode)
    return len(names), total


def verify_archive(data, jd: Jidac, threads: int = 0,
                   use_device: Optional[bool] = None) -> Tuple[int, int]:
    """Integrity test: decode every block, verify every fragment SHA-1
    (the reference 't' command's phase 1). Returns (blocks, fragments).

    use_device batches all fragment hashes through the lane-parallel
    SHA-1 kernel (ops/hash_batched.py) instead of hashing on host
    threads — the TPU mapping of the reference's multithreaded CRC/SHA
    rebuild (reference CHANGELOG.md:73-76). None = auto (calibration-gated
    per device_policy); forced or auto, the call runs under a wall-clock
    deadline with host fallback."""
    data = as_source(data)
    threads = threads or min(32, (os.cpu_count() or 4))
    est = sum(b.usize for b in jd.block)
    from ..device_policy import deadline_for, resolve, run_with_deadline
    if resolve(use_device, "hash", est):
        try:
            return run_with_deadline(
                lambda: _verify_archive_device(data, jd, threads),
                deadline_for(est), "device verify")
        except Exception as e:  # noqa: BLE001 — dead chip; host re-derives
            import sys
            print(f"zpaqfranz-tpu: device verify unavailable "
                  f"({type(e).__name__}); falling back to host",
                  file=sys.stderr)
    nfrag = 0

    def work(blk: Block) -> int:
        # fully-native decode+hash: one GIL-released call per block, no
        # decoded bytes cross ctypes (the decode -> join -> hash round
        # trip through Python cost two block-sized copies per block)
        ends: List[int] = []
        q = 0
        for j in range(blk.start, blk.start + blk.frags):
            q += jd.ht[j].usize
            ends.append(q)
        with data.stream() as s:
            s.seek(blk.offset)
            _, digests = s.verify_block(ends)
        for k, j in enumerate(range(blk.start, blk.start + blk.frags)):
            want = jd.ht[j].sha1
            if want != b"\x00" * 20 \
                    and digests[k * 20:(k + 1) * 20] != want:
                raise ExtractError(f"fragment {j}: checksum failed")
        return blk.frags

    with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as ex:
        for n in ex.map(work, jd.block):
            nfrag += n
    return len(jd.block), nfrag


def _verify_archive_device(data, jd: Jidac,
                           threads: int) -> Tuple[int, int]:
    """Decode blocks on host threads, verify fragment SHA-1s on device.

    Fragments are sorted by length and hashed in fixed-size lane batches
    so padding waste stays bounded and the kernel recompiles only per
    distinct (lanes, padded-length) bucket."""
    from ..ops import hash_batched as hb

    pieces: List[Tuple[int, bytes]] = []   # (fragment id, bytes)

    def work(blk: Block) -> List[Tuple[int, bytes]]:
        out = _decode_block(data, blk)
        res, q = [], 0
        for j in range(blk.start, blk.start + blk.frags):
            usize = jd.ht[j].usize
            piece = out[q:q + usize]
            if len(piece) != usize:
                raise ExtractError(f"fragment {j}: incomplete")
            res.append((j, piece))
            q += usize
        return res

    with concurrent.futures.ThreadPoolExecutor(max_workers=threads) as ex:
        for res in ex.map(work, jd.block):
            pieces.extend(res)

    pieces = [(j, p) for j, p in pieces if jd.ht[j].sha1 != b"\x00" * 20]
    from ..ops import hash_pallas as hpal
    if hpal.available():
        # Pallas kernel: 1024 lanes per tile step, VPU-bound
        digests = hpal.sha1_pallas([p for _, p in pieces])
        for (j, _), dig in zip(pieces, digests):
            if dig != jd.ht[j].sha1:
                raise ExtractError(f"fragment {j}: checksum failed")
        return len(jd.block), len(pieces)
    pieces.sort(key=lambda t: len(t[1]))
    BATCH = 256
    for i in range(0, len(pieces), BATCH):
        batch = pieces[i:i + BATCH]
        lanes, lens = hb.pad_lanes([p for _, p in batch])
        # pad lane count so bucket shapes repeat (fewer recompiles)
        digests = hb.digest_bytes(hb.sha1_lanes(lanes, lens))
        for (j, _), dig in zip(batch, digests):
            if dig != jd.ht[j].sha1:
                raise ExtractError(f"fragment {j}: checksum failed")
    return len(jd.block), len(pieces)
