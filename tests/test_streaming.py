"""Streaming archive I/O: O(index) memory, decrypt-at-offset, multipart.

The reference never loads archives into RAM (InputArchive seek model,
zsfx.cpp:401-568; ~400 B/file enumeration, CHANGELOG.md:763-765). These
tests pin that property for the file-backed ArchiveSource path: listing and
extracting a large archive must not materialize it, and encrypted/multipart
sources must read byte-identically to the in-memory path."""

import os
import pathlib
import resource
import subprocess
import sys

import pytest

from zpaqfranz_tpu.jidac.add import add
from zpaqfranz_tpu.jidac.archive_io import ArchiveSource
from zpaqfranz_tpu.jidac.index import read_archive, read_archive_src

_DATE = 20260102030405


def _tree(root: pathlib.Path, per_file=1 << 20, nfiles=4, seed=7):
    import numpy as np
    rng = np.random.default_rng(seed)
    root.mkdir(parents=True, exist_ok=True)
    for i in range(nfiles):
        (root / f"f{i}.bin").write_bytes(
            rng.integers(0, 256, per_file, dtype=np.uint8).tobytes())
        os.utime(root / f"f{i}.bin", (1_700_000_000 + i, 1_700_000_000 + i))


def test_file_source_matches_bytes_source(tmp_path):
    os.chdir(tmp_path)
    _tree(tmp_path / "corpus", per_file=1 << 18)
    add("a.zpaq", ["corpus"], method="1", date=_DATE)
    raw = (tmp_path / "a.zpaq").read_bytes()
    jd_mem = read_archive(raw)
    src = ArchiveSource.from_spec("a.zpaq")
    jd_file = read_archive_src(src)
    assert sorted(jd_mem.dt) == sorted(jd_file.dt)
    assert len(jd_mem.ht) == len(jd_file.ht)
    assert [b.offset for b in jd_mem.block] == [b.offset for b in jd_file.block]
    # ranged reads line up with the raw bytes
    for blk in jd_file.block:
        assert src.read_range(blk.offset, blk.bsize) == \
            raw[blk.offset:blk.offset + blk.bsize]
    assert src.size() == len(raw)


def test_encrypted_file_source_decrypts_at_offset(tmp_path):
    os.chdir(tmp_path)
    _tree(tmp_path / "corpus", per_file=1 << 18)
    add("plain.zpaq", ["corpus"], method="1", date=_DATE)
    add("enc.zpaq", ["corpus"], method="1", date=_DATE, key="secret")
    # two transactions so CTR offsets continue mid-file
    p = tmp_path / "corpus" / "f0.bin"
    p.write_bytes(p.read_bytes() + b"tail")
    os.utime(p, (1_700_000_100, 1_700_000_100))
    add("plain.zpaq", ["corpus"], method="1", date=_DATE + 50)
    add("enc.zpaq", ["corpus"], method="1", date=_DATE + 50, key="secret")

    plain = (tmp_path / "plain.zpaq").read_bytes()
    src = ArchiveSource.from_spec("enc.zpaq", key="secret")
    assert src.size() == len(plain)
    assert src.read_range(0, len(plain)) == plain
    # unaligned mid-archive window (CTR counter must re-key at the offset)
    off = len(plain) // 3 + 5
    assert src.read_range(off, 77777) == plain[off:off + 77777]
    jd = read_archive_src(src)
    assert sorted(jd.dt) == sorted(read_archive(plain).dt)

    with pytest.raises(ValueError):
        ArchiveSource.from_spec("enc.zpaq", key="wrong")


def test_multipart_file_source(tmp_path):
    os.chdir(tmp_path)
    _tree(tmp_path / "corpus", per_file=1 << 17)
    add("part_??.zpaq", ["corpus"], method="1", date=_DATE)
    p = tmp_path / "corpus" / "f1.bin"
    p.write_bytes(p.read_bytes() + b"more")
    os.utime(p, (1_700_000_100, 1_700_000_100))
    add("part_??.zpaq", ["corpus"], method="1", date=_DATE + 50)
    parts = sorted(tmp_path.glob("part_*.zpaq"))
    assert len(parts) == 2
    raw = b"".join(q.read_bytes() for q in parts)
    src = ArchiveSource.from_spec("part_??.zpaq")
    assert src.size() == len(raw)
    # window spanning the part boundary
    cut = parts[0].stat().st_size
    assert src.read_range(cut - 100, 200) == raw[cut - 100:cut + 100]
    jd = read_archive_src(src)
    assert sorted(jd.dt) == sorted(read_archive(raw).dt)


def test_streaming_extract_round_trip(tmp_path):
    """extract() through a file source: bytes equal the inputs."""
    os.chdir(tmp_path)
    _tree(tmp_path / "corpus", per_file=1 << 18, nfiles=3)
    add("a.zpaq", ["corpus"], method="1", date=_DATE)
    from zpaqfranz_tpu.jidac.extract import extract
    src = ArchiveSource.from_spec("a.zpaq")
    jd = read_archive_src(src)
    extract(src, jd, "out")
    for p in (tmp_path / "corpus").iterdir():
        assert (tmp_path / "out" / "corpus" / p.name).read_bytes() == \
            p.read_bytes()


@pytest.mark.slow
def test_list_memory_is_o_index(tmp_path):
    """Listing a large archive in a fresh process must cost far less RSS
    than the archive size (reference: listing is O(index), SURVEY.md §3.3).
    """
    os.chdir(tmp_path)
    _tree(tmp_path / "corpus", per_file=24 << 20, nfiles=8, seed=3)  # 192 MB
    add("big.zpaq", ["corpus"], method="0", date=_DATE)
    arc_mb = (tmp_path / "big.zpaq").stat().st_size / (1 << 20)
    assert arc_mb > 150
    # ru_maxrss is useless here (Linux accounts the pre-exec parent's peak
    # into the child), so instead the child CAPS its address space after
    # imports: the 1 MB-window scan fits in the 100 MB headroom, while any
    # whole-archive materialization (190 MB) would MemoryError.
    code = (
        "import resource\n"
        "from zpaqfranz_tpu.jidac.archive_io import ArchiveSource\n"
        "from zpaqfranz_tpu.jidac.index import read_archive_src\n"
        "vmsize = 0\n"
        "for line in open('/proc/self/status'):\n"
        "    if line.startswith('VmSize'):\n"
        "        vmsize = int(line.split()[1]) * 1024\n"
        "cap = vmsize + (100 << 20)\n"
        "resource.setrlimit(resource.RLIMIT_AS, (cap, cap))\n"
        "src = ArchiveSource.from_spec('big.zpaq')\n"
        "jd = read_archive_src(src)\n"
        "assert sum(1 for d in jd.dt.values() if d.date) == 8\n"
        "print('ok')\n"
    )
    env = dict(os.environ)
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    # PYTHONPATH pinned to the repo alone: site hooks (e.g. TPU plugin
    # preloaders) would blow the cap on their own
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], cwd=tmp_path, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "ok"


@pytest.mark.slow
def test_bounded_ram_add_1gb(tmp_path):
    """A >=1 GB add must run in O(jobs-in-flight) memory, not O(archive):
    compressed d blocks spill to a sidecar file as jobs finish and the
    commit streams c + spill + h + i to the archive in chunks
    (jidac.add DBlockSpill / stream_transaction — the reference appends
    per job thread as blocks complete, libzpaq.h:57-59).

    The child asserts its own peak RSS (VmHWM — the kernel's high-water
    resident mark, immune to parent-process accounting) stays under
    300 MB. An RLIMIT_AS cap would over-count here: glibc per-thread
    arenas and the native encoder's thread-local tables reserve ~2x more
    address space than they ever touch."""
    os.chdir(tmp_path)
    # 32 x 32 MB of unique random data: incompressible, so the adaptive
    # store path keeps the transaction ~input-sized (worst case for RAM)
    _tree(tmp_path / "corpus", per_file=32 << 20, nfiles=32, seed=9)
    code = (
        "from zpaqfranz_tpu import native\n"
        "native.ensure_built()\n"
        "from zpaqfranz_tpu.jidac.add import add\n"
        "n, frags, nbytes = add('big.zpaq', ['corpus'], method='1',\n"
        "                       threads=2, date=20260102030405)\n"
        "assert n == 32 and nbytes > (1000 << 20), (n, nbytes)\n"
        "hwm = 0\n"
        "for line in open('/proc/self/status'):\n"
        "    if line.startswith('VmHWM'):\n"
        "        hwm = int(line.split()[1]) * 1024\n"
        "assert 0 < hwm < (300 << 20), f'peak RSS {hwm>>20} MB'\n"
        "print('ok')\n"
    )
    env = dict(os.environ)
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-c", code], cwd=tmp_path, env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip() == "ok"
    arc = tmp_path / "big.zpaq"
    assert arc.stat().st_size > (1000 << 20)
    assert not (tmp_path / "big.zpaq.spill").exists()
    # the archive must still read back correctly
    src = ArchiveSource.from_spec("big.zpaq")
    jd = read_archive_src(src)
    assert sum(1 for d in jd.dt.values() if d.date) == 32
