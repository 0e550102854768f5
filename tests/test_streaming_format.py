"""Streaming-format (`s` method) archive WRITES (VERDICT r3 missing #3).

The journaling format is backward-compatible with zpaq 7.15 streaming
blocks (reference read side zsfx.cpp:1550-1587): one block per file chunk,
filename in the first segment, per-segment SHA-1, usize unknown until
decode. add() with an s-method now emits true streaming blocks; these
tests pin the round trip through our own reader/extractor, listing, and
multi-block (continuation-segment) files."""

import os
import pathlib

import pytest

from zpaqfranz_tpu.jidac.add import add
from zpaqfranz_tpu.jidac.extract import extract, select_files, verify_archive
from zpaqfranz_tpu.jidac.index import read_archive

_DATE = 20260102030405


def _tree(root, spec):
    root.mkdir(parents=True, exist_ok=True)
    for name, data in spec.items():
        p = root / name
        p.write_bytes(data)
        os.utime(p, (1_700_000_000, 1_700_000_000))


def test_streaming_round_trip(tmp_path):
    os.chdir(tmp_path)
    spec = {
        "a.txt": b"streaming format " * 999,
        "b.bin": bytes(range(256)) * 100,
        "empty": b"",
    }
    _tree(tmp_path / "t", spec)
    n, nblocks, nbytes = add("s.zpaq", ["t"], method="s4.0")
    assert n == 3 and nblocks == 3 and nbytes > 0
    raw = (tmp_path / "s.zpaq").read_bytes()
    jd = read_archive(raw)
    names = select_files(jd, [])
    assert names == ["t/a.txt", "t/b.bin", "t/empty"]
    for nm in names:
        assert jd.dt[nm].date == 20231114221320  # from the comment date
    extract(raw, jd, "out", use_device=False)
    for name, data in spec.items():
        assert (tmp_path / "out" / "t" / name).read_bytes() == data
    verify_archive(raw, jd, use_device=False)


def test_streaming_multiblock_file(tmp_path):
    """Files larger than the block cap continue in unnamed segments that
    must reattach to the last named file (reference lastfile semantics)."""
    os.chdir(tmp_path)
    big = (b"0123456789abcdef" * 4096) * 20       # 1.25 MB
    _tree(tmp_path / "t", {"big.bin": big})
    # s0.x -> block_bits = 20 -> 1 MiB blocks -> 2 blocks
    add("s.zpaq", ["t"], method="s0.0")
    raw = (tmp_path / "s.zpaq").read_bytes()
    jd = read_archive(raw)
    d = jd.dt["t/big.bin"]
    assert len(d.ptr) == 2 and len(jd.block) == 2
    extract(raw, jd, "out", use_device=False)
    assert (tmp_path / "out" / "t" / "big.bin").read_bytes() == big


def test_streaming_modeled_blocks(tmp_path):
    """s-methods with a component graph arithmetic-code each block."""
    os.chdir(tmp_path)
    data = b"the quick brown fox jumps over the lazy dog " * 2000
    _tree(tmp_path / "t", {"m.txt": data})
    add("s.zpaq", ["t"], method="s4.0ci1")
    plain = add.__self__ if False else None  # noqa: F841
    raw = (tmp_path / "s.zpaq").read_bytes()
    assert len(raw) < len(data) // 2          # actually modeled
    jd = read_archive(raw)
    extract(raw, jd, "out", use_device=False)
    assert (tmp_path / "out" / "t" / "m.txt").read_bytes() == data
