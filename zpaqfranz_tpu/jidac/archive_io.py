"""Archive byte sources: file-backed streaming access with O(1) memory.

The reference never loads an archive into RAM: InputArchive is seek-based,
multipart-aware, and AES-CTR-decrypts at the absolute file offset
(/root/reference/ZSFX/zsfx.cpp:401-568, 455-465); enumeration memory is
~400 B/file (CHANGELOG.md:763-765). ``ArchiveSource`` is that abstraction
for this framework: every consumer (index scan, extract, verify, device
decode) pulls bytes through it, so TB-scale archives list and extract in
O(index) + O(window) memory.

Backed either by in-memory bytes (tests, small archives, legacy callers) or
by the native file source (native/src/tzpaq.cpp FileSource: pread across
parts + CTR keystream at offset).
"""

from __future__ import annotations

import glob
import pathlib
from typing import List, Optional, Sequence

from .. import native

# detached-index head (see index.INDEX_MAGIC; re-declared here to avoid a
# circular import)
_INDEX_MAGIC = b"7kStIdxTPU\x01\x00"
_INDEX_HEADER_LEN = 12


class ArchiveSource:
    """One archive (single file, multipart set, or in-memory bytes),
    optionally encrypted; hands out independent NativeStream cursors."""

    def __init__(self, data: Optional[bytes] = None,
                 paths: Optional[Sequence[str]] = None,
                 key32: Optional[bytes] = None,
                 is_index: bool = False):
        self.data = data
        self.paths = list(paths) if paths else None
        self.key32 = key32
        self.is_index = is_index
        if self.data is None and not self.paths:
            raise ValueError("ArchiveSource needs data or paths")

    # -- constructors --------------------------------------------------------
    @classmethod
    def from_bytes(cls, data: bytes) -> "ArchiveSource":
        return cls(data=data, is_index=data[:_INDEX_HEADER_LEN]
                   == _INDEX_MAGIC)

    @classmethod
    def from_spec(cls, spec: str, key: Optional[str] = None,
                  check_magic: bool = True) -> "ArchiveSource":
        """Open an archive path or multipart wildcard spec for reading.

        ``key``: password; the salt comes from the head of part 1 and the
        scrypt stretch runs once here (reference stretchKey,
        libzpaq.cpp:666-668)."""
        if "*" in spec or "?" in spec:
            paths = sorted(glob.glob(spec))
            if not paths:
                raise FileNotFoundError(spec)
        else:
            if not pathlib.Path(spec).exists():
                raise FileNotFoundError(spec)
            paths = [spec]
        key32 = None
        if key is not None:
            from ..codec import crypto
            with open(paths[0], "rb") as f:
                salt = f.read(crypto.SALT_LEN)
            if len(salt) < crypto.SALT_LEN:
                raise ValueError("archive too short for salt header")
            key32 = crypto.stretch_key(key, salt)
        src = cls(paths=paths, key32=key32)
        head = src.read_range(0, _INDEX_HEADER_LEN)
        src.is_index = head == _INDEX_MAGIC
        if check_magic and not src.is_index:
            ok = (head[:4] == b"7kSt"
                  or (head[:3] == b"zPQ" and len(head) > 3 and head[3] >= 1))
            if not ok:
                raise ValueError(
                    "password incorrect (bad archive magic)" if key
                    else "not a zpaq archive (or encrypted: use -key "
                    "PASSWORD)")
        return src

    # -- access --------------------------------------------------------------
    def stream(self) -> "native.NativeStream":
        """A fresh cursor (thread-safe: each caller gets its own)."""
        if self.data is not None:
            data = self.data
            if self.is_index:
                data = data[_INDEX_HEADER_LEN:]
            return native.NativeStream(data)
        s = native.NativeStream.open_paths(self.paths, self.key32)
        if self.is_index:
            s.seek(_INDEX_HEADER_LEN)
        return s

    def size(self) -> int:
        """Logical plaintext byte count (salt and index head excluded)."""
        base = _INDEX_HEADER_LEN if self.is_index else 0
        if self.data is not None:
            return len(self.data) - base
        with native.NativeStream.open_paths(self.paths, self.key32) as s:
            return s.size() - base

    def read_range(self, offset: int, n: int) -> bytes:
        """Decrypted archive bytes [offset, offset+n). Offsets are the ones
        read_archive records (d-block fetches on full archives; detached
        indexes carry no d blocks, so their 12-byte head never matters
        here)."""
        if self.data is not None:
            base = _INDEX_HEADER_LEN if self.is_index else 0
            return self.data[base + offset: base + offset + n]
        with native.NativeStream.open_paths(self.paths, self.key32) as s:
            return s.read_raw(offset, n)

    def bytes(self) -> bytes:
        """Whole plaintext archive (legacy consumers: trim/crop rewrite,
        merge). File mode reads it all — callers that can stream should."""
        if self.data is not None:
            return self.data
        with native.NativeStream.open_paths(self.paths, self.key32) as s:
            return s.read_raw(0, s.size())


def as_source(x) -> ArchiveSource:
    """Coerce bytes | ArchiveSource -> ArchiveSource."""
    if isinstance(x, ArchiveSource):
        return x
    return ArchiveSource.from_bytes(bytes(x))
