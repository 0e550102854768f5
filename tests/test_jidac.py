"""Jidac layer end-to-end: golden archive, add/extract round-trip, dedup."""

import hashlib
import os
import pathlib
import struct

import pytest

from zpaqfranz_tpu.jidac.index import read_archive, fragment_to_block
from zpaqfranz_tpu.jidac.add import add
from zpaqfranz_tpu.jidac.extract import extract, select_files, verify_archive


@pytest.fixture()
def tree(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_bytes(b"hello world " * 400)
    (src / "b.bin").write_bytes(bytes(range(256)) * 40)
    (src / "sub" / "c.txt").write_bytes(b"fox " * 800)
    (src / "empty").write_bytes(b"")
    return src


def test_golden_index(golden_bytes):
    jd = read_archive(golden_bytes)
    files = [n for n, d in jd.dt.items() if d.date]
    assert len(files) == 256
    assert all(len(n) == 64 for n in files)
    assert all(jd.dt[n].size == 37000 for n in files)
    assert len(jd.ver) >= 2
    # every fragment maps to a block
    for d in jd.dt.values():
        for f in d.ptr:
            assert fragment_to_block(jd, f) is not None


def test_golden_until_rollback(golden_bytes):
    jd = read_archive(golden_bytes, until=0)
    assert len(jd.ver) == 1          # rolled back before the first version
    assert not jd.dt


def test_add_extract_roundtrip(tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t.zpaq"
    n, frags, nbytes = add(str(arc), ["src"], method="0")
    assert n == 4 and nbytes > 0
    data = arc.read_bytes()
    jd = read_archive(data)
    assert select_files(jd, []) == sorted(
        str(p.relative_to(tmp_path)) for p in tree.rglob("*") if p.is_file())
    out = tmp_path / "out"
    nfiles, total = extract(data, jd, str(out))
    assert nfiles == 4
    for p in tree.rglob("*"):
        if p.is_file():
            rel = p.relative_to(tmp_path)
            assert (out / rel).read_bytes() == p.read_bytes(), rel


def test_incremental_dedup(tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t.zpaq"
    add(str(arc), ["src"], method="0")
    size1 = arc.stat().st_size
    # identical content: nothing to add
    n, frags, nbytes = add(str(arc), ["src"], method="0")
    assert (n, frags, nbytes) == (0, 0, 0)
    # append to one file: only the changed file re-added, dedup keeps rest
    with open(tree / "a.txt", "ab") as f:
        f.write(b"delta")
    n, frags, nbytes = add(str(arc), ["src"], method="0")
    assert n == 1
    data = arc.read_bytes()
    jd = read_archive(data)
    assert len(jd.ver) == 3
    out = tmp_path / "out2"
    extract(data, jd, str(out))
    assert (out / "src" / "a.txt").read_bytes() == (
        tree / "a.txt").read_bytes()
    # rollback to version 1 sees the old content
    jd1 = read_archive(data, until=1)
    out1 = tmp_path / "out1"
    extract(data, jd1, str(out1))
    assert (out1 / "src" / "a.txt").read_bytes() == b"hello world " * 400


def test_deletion_recorded(tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t.zpaq"
    add(str(arc), ["src"], method="0")
    (tree / "b.bin").unlink()
    n, frags, nbytes = add(str(arc), ["src"], method="0")
    jd = read_archive(arc.read_bytes())
    assert jd.dt["src/b.bin"].date == 0       # marked deleted
    assert "src/b.bin" not in select_files(jd, [])


def test_cm_method_archive(tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t4.zpaq"
    add(str(arc), ["src"], method="4")
    data = arc.read_bytes()
    jd = read_archive(data)
    nblocks, nfrags = verify_archive(data, jd)
    assert nblocks >= 1 and nfrags >= 3   # the empty file has no fragments
    out = tmp_path / "out"
    extract(data, jd, str(out))
    for p in tree.rglob("*"):
        if p.is_file():
            rel = p.relative_to(tmp_path)
            assert (out / rel).read_bytes() == p.read_bytes(), rel
    # CM should compress the text well below store size
    assert arc.stat().st_size < sum(
        p.stat().st_size for p in tree.rglob("*") if p.is_file())


def test_corrupt_block_isolated(tree, tmp_path, monkeypatch):
    """A flipped byte inside a d block fails that block's checksum but the
    index still reads (per-block error isolation, zsfx.cpp:1596-1602)."""
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t.zpaq"
    add(str(arc), ["src"], method="0")
    data = bytearray(arc.read_bytes())
    jd = read_archive(bytes(data))
    blk = jd.block[0]
    data[blk.offset + 200] ^= 0xFF   # corrupt fragment data
    jd2 = read_archive(bytes(data))  # index still parses
    assert len(jd2.dt) == len(jd.dt)
    with pytest.raises(Exception):
        verify_archive(bytes(data), jd2)


def test_detached_index_and_chunked_parts(tmp_path, monkeypatch):
    """-index keeps a d-block-free index usable for list/sync/dedup;
    -chunk splits multipart output into fixed-size pieces."""
    import glob
    from zpaqfranz_tpu.cli import main
    from zpaqfranz_tpu.jidac.index import read_archive, is_index
    monkeypatch.chdir(tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.bin").write_bytes(os.urandom(30000))
    (src / "b.txt").write_bytes(b"text " * 2000)

    assert main(["a", "arc", "src", "-index", "arc_idx.zpaq"]) == 0
    idx_data = (tmp_path / "arc_idx.zpaq").read_bytes()
    assert is_index(idx_data)
    jd_full = read_archive((tmp_path / "arc.zpaq").read_bytes())
    jd_idx = read_archive(idx_data)
    assert jd_idx.is_index
    assert sorted(jd_idx.dt) == sorted(jd_full.dt)
    assert len(jd_idx.ht) == len(jd_full.ht)
    # index is listable through the CLI
    assert main(["l", "arc_idx"]) == 0

    # second transaction dedups against the index alone (remote-archive
    # mode: archive bytes not reread)
    (src / "c.txt").write_bytes(b"text " * 2000)   # duplicate content
    from zpaqfranz_tpu.jidac.add import add
    n_before = len(jd_idx.ht)
    add(str(tmp_path / "arc2.zpaq"), ["src"], index_path="arc_idx.zpaq")
    jd2 = read_archive((tmp_path / "arc_idx.zpaq").read_bytes())
    assert len(jd2.ht) == n_before  # all fragments were already indexed

    # chunked multipart: parts capped at 4 KiB
    assert main(["a", "parts_????.zpaq", "src", "-chunk", "4k"]) == 0
    parts = sorted(glob.glob(str(tmp_path / "parts_*.zpaq")))
    assert len(parts) > 1
    assert all(os.path.getsize(p) <= 4096 for p in parts)
    assert main(["x", "parts_????.zpaq", "-to", "outp"]) == 0
    assert (tmp_path / "outp" / "src" / "a.bin").read_bytes() == \
        (src / "a.bin").read_bytes()


def test_autotrim_truncated_tail(tree, tmp_path, monkeypatch):
    """A crash-truncated final transaction is trimmed off on the next add
    (reference default auto-trim, CHANGELOG.md:360-376)."""
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t.zpaq"
    add(str(arc), ["src"], method="0")
    clean = arc.read_bytes()
    (tree / "a.txt").write_bytes(b"changed " * 500)
    add(str(arc), ["src"], method="0")
    data = arc.read_bytes()
    jd = read_archive(data)
    assert len(jd.ver) == 3
    # simulate a crash partway through writing transaction 2
    arc.write_bytes(data[: jd.ver[2].offset + 60])
    (tree / "new.txt").write_bytes(b"third version")
    add(str(arc), ["src"], method="0")
    out = read_archive(arc.read_bytes())
    assert out.errors == 0                       # tail damage gone
    assert len(out.ver) == 3                     # v1 + the new transaction
    res = tmp_path / "res"
    extract(arc.read_bytes(), out, str(res))
    assert (res / "src" / "new.txt").read_bytes() == b"third version"
    assert (res / "src" / "a.txt").read_bytes() == b"changed " * 500
    # sanity: version 1 content survived the trim byte-for-byte
    assert arc.read_bytes()[: len(clean)] == clean


def test_autotrim_garbage_tail(tree, tmp_path, monkeypatch):
    """Trailing non-block garbage is cut before appending."""
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t.zpaq"
    add(str(arc), ["src"], method="0")
    good = arc.stat().st_size
    with open(arc, "ab") as f:
        f.write(b"\xde\xad\xbe\xef" * 16)
    (tree / "d.txt").write_bytes(b"more")
    add(str(arc), ["src"], method="0")
    jd = read_archive(arc.read_bytes())
    assert jd.errors == 0 and len(jd.ver) == 3
    assert jd.ver[2].offset == good              # appended at the clean end


def test_notrim_keeps_tail(tree, tmp_path, monkeypatch):
    """-notrim appends after the damaged tail; skip-and-continue still
    finds the new transaction behind it."""
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t.zpaq"
    add(str(arc), ["src"], method="0")
    good = arc.stat().st_size
    with open(arc, "ab") as f:
        f.write(b"junkjunkjunk")
    (tree / "d.txt").write_bytes(b"more")
    add(str(arc), ["src"], method="0", notrim=True)
    assert arc.read_bytes()[good:good + 12] == b"junkjunkjunk"
    jd = read_archive(arc.read_bytes())
    assert len(jd.ver) == 3                      # re-synced past the junk
    assert "src/d.txt" in jd.dt


def test_mid_archive_damage_not_trimmed(tree, tmp_path, monkeypatch):
    """Damage inside an old transaction must NOT trigger auto-trim (that
    would destroy the good versions after it)."""
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t.zpaq"
    add(str(arc), ["src"], method="0")
    (tree / "e.txt").write_bytes(b"second txn " * 100)
    add(str(arc), ["src"], method="0")
    data = bytearray(arc.read_bytes())
    jd = read_archive(bytes(data))
    size = len(data)
    # corrupt the locator tag of version 1's first block so the whole
    # block is unreadable (not just a failed checksum)
    data[jd.ver[1].offset + 2] ^= 0xFF
    arc.write_bytes(bytes(data))
    (tree / "f.txt").write_bytes(b"third txn")
    add(str(arc), ["src"], method="0")
    out = arc.read_bytes()
    assert len(out) > size                       # appended, nothing cut
    jd2 = read_archive(out)
    assert "src/f.txt" in jd2.dt and "src/e.txt" in jd2.dt


def test_tmp_write_rename(tree, tmp_path, monkeypatch):
    """-tmp creates new archives as <name>.tmp then renames into place."""
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t.zpaq"
    add(str(arc), ["src"], method="0", tmp=True)
    assert arc.exists() and not (tmp_path / "t.zpaq.tmp").exists()
    jd = read_archive(arc.read_bytes())
    assert len(jd.ver) == 2


def test_add_verify_during_encode(tmp_path):
    """setVerify analog: -verify inverts every transformed block through
    its stored pcomp during compression (libzpaq.h:513-531 semantics)."""
    import os
    os.chdir(tmp_path)
    (tmp_path / "t").mkdir()
    (tmp_path / "t" / "a.txt").write_bytes(b"invertible content " * 5000)
    from zpaqfranz_tpu.jidac.add import add
    n, frags, nbytes = add("v.zpaq", ["t"], method="1", verify=True,
                           date=20260102030405)
    assert n == 1 and nbytes > 0
    from zpaqfranz_tpu.jidac.index import read_archive
    jd = read_archive((tmp_path / "v.zpaq").read_bytes())
    assert len(jd.block) >= 1


def test_715_pure_zpaq_attrs(tmp_path):
    """-715 writes pure-zpaq attr bytes: no franz checksum record
    (reference CHANGELOG.md:484)."""
    import os
    os.chdir(tmp_path)
    (tmp_path / "t").mkdir()
    (tmp_path / "t" / "a.txt").write_bytes(b"pure zpaq " * 1000)
    from zpaqfranz_tpu.jidac.add import add
    from zpaqfranz_tpu.jidac.index import read_archive
    add("f.zpaq", ["t"], method="1", date=20260102030405)
    add("p.zpaq", ["t"], method="1", date=20260102030405, franz="715")
    jf = read_archive((tmp_path / "f.zpaq").read_bytes())
    jp = read_archive((tmp_path / "p.zpaq").read_bytes())
    df, dp = jf.dt["t/a.txt"], jp.dt["t/a.txt"]
    assert df.crc32 is not None and df.xxh64 is not None
    assert dp.crc32 is None and b"fz" not in dp.attr_raw
    assert len(dp.attr_raw) == 3      # the base unix attr bytes alone


def test_add_resume_journal(tmp_path, monkeypatch):
    """Block-granular encode resume: an interrupted add leaves a journal of
    completed d blocks; the rerun reuses them (no recompression) and
    produces the same archive bytes as an uninterrupted add."""
    import os
    import pathlib
    import pytest
    from zpaqfranz_tpu.jidac import add as jadd

    os.chdir(tmp_path)
    (tmp_path / "t").mkdir()
    for i in range(3):
        (tmp_path / "t" / f"f{i}.txt").write_bytes(
            (b"resumable %d " % i) * 40000)
        os.utime(tmp_path / "t" / f"f{i}.txt",
                 (1_700_000_000 + i, 1_700_000_000 + i))
    date = 20260102030405

    # uninterrupted run for the reference bytes
    jadd.add("ref.zpaq", ["t"], method="1", date=date)
    ref = (tmp_path / "ref.zpaq").read_bytes()

    # interrupted run: crash at commit, after compression
    def boom(*a, **k):
        raise RuntimeError("simulated crash before commit")
    monkeypatch.setattr(jadd, "commit_transaction_stream", boom)
    with pytest.raises(RuntimeError):
        jadd.add("r.zpaq", ["t"], method="1", date=date, resume=True)
    monkeypatch.undo()
    journal = tmp_path / "r.zpaq.resume"
    assert journal.exists() and journal.stat().st_size > 100
    assert not (tmp_path / "r.zpaq").exists()   # archive untouched

    # rerun: every block must come from the journal
    calls = []
    real = jadd._compress_d_block

    def counting(*a, **k):
        calls.append(1)
        return real(*a, **k)
    monkeypatch.setattr(jadd, "_compress_d_block", counting)
    jadd.add("r.zpaq", ["t"], method="1", date=date, resume=True)
    assert calls == []                          # all blocks reused
    assert not journal.exists()                 # cleaned after commit
    assert (tmp_path / "r.zpaq").read_bytes() == ref


def test_franz_text_form_round_trip(tmp_path):
    """Classic TEXT FRANZBLOCK (FORMAT.md form 2): 8 base attr bytes +
    40-hex alt hash + NUL + 8-hex CRC-32 + NUL (= FRANZOFFSET 50). The
    reader must recover the same sums it does from the binary dialect."""
    import os
    from zpaqfranz_tpu import native
    from zpaqfranz_tpu.jidac.add import add
    from zpaqfranz_tpu.jidac.index import read_archive

    os.chdir(tmp_path)
    (tmp_path / "t").mkdir()
    data = b"franz text form " * 1000
    (tmp_path / "t" / "f.bin").write_bytes(data)
    add("a.zpaq", ["t"], method="1", date=20260102030405, franz="text")
    jd = read_archive((tmp_path / "a.zpaq").read_bytes())
    d = jd.dt["t/f.bin"]
    assert len(d.attr_raw) == 58            # 8 base + 50 franz
    assert d.attr_raw[48] == 0 and d.attr_raw[57] == 0
    assert d.crc32 == native.crc32(data)
    assert d.xxh64 == native.xxh64(data)

    # binary dialect on the same content agrees
    add("b.zpaq", ["t"], method="1", date=20260102030405)
    jd2 = read_archive((tmp_path / "b.zpaq").read_bytes())
    d2 = jd2.dt["t/f.bin"]
    assert (d2.crc32, d2.xxh64) == (d.crc32, d.xxh64)
