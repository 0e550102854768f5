"""Device (batched-lane) jidac path vs the host-native path."""

import random

import pytest

from zpaqfranz_tpu.jidac.add import add
from zpaqfranz_tpu.jidac.extract import extract
from zpaqfranz_tpu.jidac.index import read_archive

# small CM method so CPU-mesh compiles stay fast; several files so the
# archive holds multiple fragments in one model group
_METHOD = "x4.0ci1"


@pytest.fixture()
def tree(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rng = random.Random(3)
    (src / "a.txt").write_bytes(b"hello device world " * 80)
    (src / "b.txt").write_bytes(b"the quick brown fox " * 60)
    (src / "r.bin").write_bytes(bytes(rng.randrange(256) for _ in range(900)))
    return src


def test_device_extract_matches_host(tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "t.zpaq"
    add(str(arc), ["src"], method=_METHOD)
    data = arc.read_bytes()
    jd = read_archive(data)
    out_host = tmp_path / "host"
    out_dev = tmp_path / "dev"
    extract(data, jd, str(out_host), use_device=False)
    extract(data, jd, str(out_dev), use_device=True)
    for p in tree.rglob("*"):
        rel = p.relative_to(tmp_path)
        assert (out_dev / rel).read_bytes() == (out_host / rel).read_bytes()


def test_device_encode_roundtrips(tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "d.zpaq"
    n, frags, nbytes = add(str(arc), ["src"], method=_METHOD, use_device=True)
    assert n == 3
    data = arc.read_bytes()
    jd = read_archive(data)          # host native reads the device-made blocks
    out = tmp_path / "out"
    extract(data, jd, str(out), use_device=False)
    for p in tree.rglob("*"):
        rel = p.relative_to(tmp_path)
        assert (out / rel).read_bytes() == p.read_bytes()


def test_device_encode_lz77_pcomp(tree, tmp_path, monkeypatch):
    """Device coding of a PCOMP method: selector+blob ride the coded stream."""
    monkeypatch.chdir(tmp_path)
    arc = tmp_path / "z.zpaq"
    add(str(arc), ["src"], method="x4.2.6.0.3.20ci1", use_device=True)
    data = arc.read_bytes()
    jd = read_archive(data)
    out = tmp_path / "out"
    extract(data, jd, str(out), use_device=True)
    for p in tree.rglob("*"):
        rel = p.relative_to(tmp_path)
        assert (out / rel).read_bytes() == p.read_bytes()


def test_device_add_bytes_equal_host_add(tree, tmp_path, monkeypatch):
    """Determinism across engines: the device-encoded archive must be
    byte-identical to the host-native one (same date pinned) — the analog
    of the reference's JIT-vs-interpreter equivalence invariant
    (SURVEY.md section 4 item 2)."""
    from zpaqfranz_tpu.jidac.add import add as _add
    monkeypatch.chdir(tmp_path)
    a1 = tmp_path / "host.zpaq"
    a2 = tmp_path / "dev.zpaq"
    _add(str(a1), ["src"], method=_METHOD, date=20260101120000)
    _add(str(a2), ["src"], method=_METHOD, date=20260101120000,
         use_device=True)
    assert a1.read_bytes() == a2.read_bytes()


def test_device_adaptive_store_matches_host(tmp_path, monkeypatch):
    """Adaptive store parity: an incompressible block takes the raw store
    path on BOTH engines, so device and host adds of the same tree stay
    byte-identical (VERDICT r1 weak #2 — the old device path LZ77'd
    unconditionally and produced bigger archives for random data)."""
    import os as _os
    monkeypatch.chdir(tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    rng = random.Random(7)
    (src / "rand.bin").write_bytes(
        bytes(rng.randrange(256) for _ in range(130000)))
    (src / "text.txt").write_bytes(b"compressible words here " * 4000)
    meth = "x4.2.6.0.3.20ci1"      # byte-LZ77 transform + small CM
    a1 = tmp_path / "host.zpaq"
    a2 = tmp_path / "dev.zpaq"
    add(str(a1), ["src"], method=meth, date=20260101120000)
    add(str(a2), ["src"], method=meth, date=20260101120000,
        use_device=True)
    assert a1.read_bytes() == a2.read_bytes()
    # and the random data was actually stored, not inflated
    assert a1.stat().st_size < 140000 + 8000
    data = a2.read_bytes()
    jd = read_archive(data)
    out = tmp_path / "out"
    extract(data, jd, str(out), use_device=False)
    for p in src.rglob("*"):
        rel = p.relative_to(tmp_path)
        assert (out / rel).read_bytes() == p.read_bytes()
