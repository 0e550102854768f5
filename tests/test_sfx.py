"""SFX builder: compiled self-extracting executables round-trip.

The ELF analog of the reference's PE stub mechanism
(ZSFX/zsfx.cpp:2494-2612): native engine + mini-jidac compiled on demand,
archive appended behind a magic trailer."""

import os
import pathlib
import shutil
import subprocess

import pytest

from zpaqfranz_tpu.jidac.add import add
from zpaqfranz_tpu.jidac.sfx import build_sfx

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="needs g++")


def test_sfx_round_trip(tmp_path):
    os.chdir(tmp_path)
    (tmp_path / "tree").mkdir()
    (tmp_path / "tree" / "a.txt").write_bytes(b"self extracting " * 2000)
    (tmp_path / "tree" / "b.bin").write_bytes(bytes(range(256)) * 300)
    add("s.zpaq", ["tree"], method="1", date=20260102030405)
    n = build_sfx((tmp_path / "s.zpaq").read_bytes(), "s.sfx")
    assert n > 100000 and os.access("s.sfx", os.X_OK)
    (tmp_path / "out").mkdir()
    r = subprocess.run(["./s.sfx", "out"], capture_output=True,
                       timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    for p in (tmp_path / "tree").iterdir():
        assert (tmp_path / "out" / "tree" / p.name).read_bytes() == \
            p.read_bytes()


def test_sfx_multi_version(tmp_path):
    """The stub must apply versions in order: latest content wins and
    deletions hide files."""
    os.chdir(tmp_path)
    (tmp_path / "tree").mkdir()
    p1 = tmp_path / "tree" / "keep.txt"
    p2 = tmp_path / "tree" / "gone.txt"
    p1.write_bytes(b"version one " * 500)
    p2.write_bytes(b"to be deleted " * 100)
    add("m.zpaq", ["tree"], method="1", date=20260102030405)
    p1.write_bytes(b"version TWO " * 700)
    os.utime(p1, (1_700_000_100, 1_700_000_100))
    p2.unlink()
    add("m.zpaq", ["tree"], method="1", date=20260102030505)
    build_sfx((tmp_path / "m.zpaq").read_bytes(), "m.sfx")
    (tmp_path / "out").mkdir()
    r = subprocess.run(["./m.sfx", "out"], capture_output=True, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    assert (tmp_path / "out" / "tree" / "keep.txt").read_bytes() == \
        b"version TWO " * 700
    assert not (tmp_path / "out" / "tree" / "gone.txt").exists()
