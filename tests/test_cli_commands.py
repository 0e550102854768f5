"""Host-utility CLI commands (reference man/zpaqfranz.pod:75-122)."""

import os
import pathlib

import pytest

from zpaqfranz_tpu.cli import main


@pytest.fixture
def tree(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_bytes(b"alpha " * 100)
    (src / "b.txt").write_bytes(b"beta " * 200)
    (src / "sub" / "c.bin").write_bytes(os.urandom(5000))
    (src / "sub" / "dup.bin").write_bytes(b"alpha " * 100)
    return tmp_path


def _mk_archive(tree, name="arc", extra=()):
    assert main(["a", name, "src"] + list(extra)) == 0
    return tree / (name + ".zpaq")


def test_dump_shows_block_map(tree, capsys):
    _mk_archive(tree)
    assert main(["dump", "arc"]) == 0
    out = capsys.readouterr().out
    assert "1 versions" in out and "d-block" in out


def test_password_roundtrip(tree, capsys):
    arc = _mk_archive(tree)
    plain = arc.read_bytes()
    assert main(["password", "arc", "s3cret"]) == 0
    assert arc.read_bytes() != plain
    # listing with the key works; without it fails
    assert main(["l", "arc", "-key", "s3cret"]) == 0
    assert main(["l", "arc"]) == 2
    # decrypt back
    assert main(["password", "arc", "", "-key", "s3cret"]) == 0
    assert main(["l", "arc"]) == 0


def test_1on1_and_comparehex(tree, capsys):
    a = tree / "x1.bin"
    b = tree / "x2.bin"
    a.write_bytes(b"same-prefix-DIFFER-a")
    b.write_bytes(b"same-prefix-DIFFER-b")
    assert main(["1on1", str(a), str(b)]) == 1
    out = capsys.readouterr().out
    assert "differ at offset 19" in out
    assert main(["comparehex", str(a), str(b)]) == 1
    assert "<>" in capsys.readouterr().out
    b.write_bytes(a.read_bytes())
    assert main(["1on1", str(a), str(b)]) == 0


def test_count_and_dirsize(tree, capsys):
    assert main(["count", "src"]) == 0
    out = capsys.readouterr().out
    assert "4 files" in out and "1 dirs" in out
    assert main(["s", "src"]) == 0
    assert "4 files" in capsys.readouterr().out


def test_collision_finds_duplicates(tree, capsys):
    assert main(["collision", "src"]) == 0
    out = capsys.readouterr().out
    assert "1 duplicate groups" in out
    assert "a.txt" in out and "dup.bin" in out


def test_isopen(tree, capsys):
    _mk_archive(tree)
    assert main(["isopen", "arc"]) == 0
    assert "not locked" in capsys.readouterr().out


def test_utf_lists_and_fixes(tree, capsys):
    weird = tree / "src" / "naïve.txt"
    weird.write_bytes(b"x")
    assert main(["utf", "src"]) == 0
    assert "1 suspect" in capsys.readouterr().out
    assert main(["utf", "src", "-fix"]) == 0
    assert not weird.exists()
    assert (tree / "src" / "na_ve.txt").exists()


def test_cp_resumable(tree, capsys):
    src = tree / "big.bin"
    src.write_bytes(os.urandom(10000))
    dst = tree / "copy.bin"
    # simulate a partial copy, then resume
    dst.write_bytes(src.read_bytes()[:4000])
    assert main(["cp", str(src), str(dst)]) == 0
    assert dst.read_bytes() == src.read_bytes()
    out = capsys.readouterr().out
    assert "resumed at 4,000" in out
    assert main(["cp", str(src), str(dst)]) == 0
    assert "already complete" in capsys.readouterr().out


def test_robocopy_mirror_and_kill(tree, capsys):
    assert main(["r", "src", "mirror"]) == 0
    assert (tree / "mirror" / "sub" / "c.bin").read_bytes() == \
        (tree / "src" / "sub" / "c.bin").read_bytes()
    stray = tree / "mirror" / "stray.txt"
    stray.write_bytes(b"x")
    assert main(["r", "src", "mirror", "-kill"]) == 0
    assert not stray.exists()


def test_zero_and_rd_require_kill(tree, capsys):
    empty = tree / "src" / "emptydir"
    empty.mkdir()
    assert main(["z", "src"]) == 0
    assert empty.exists()           # dry run by default
    assert main(["z", "src", "-kill"]) == 0
    assert not empty.exists()
    victim = tree / "victim"
    victim.mkdir()
    (victim / "f").write_bytes(b"x")
    assert main(["rd", str(victim)]) == 0
    assert victim.exists()          # dry run
    assert main(["rd", str(victim), "-kill"]) == 0
    assert not victim.exists()


def test_sync_reports_changes(tree, capsys):
    _mk_archive(tree)
    assert main(["sync", "arc", "src"]) == 0     # no changes
    (tree / "src" / "new.txt").write_bytes(b"n")
    (tree / "src" / "a.txt").write_bytes(b"CHANGED" * 50)
    os.remove(tree / "src" / "b.txt")
    rc = main(["sync", "arc", "src"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "+ src/new.txt" in out
    assert "# src/a.txt" in out
    assert "- src/b.txt" in out
    assert "1 new, 1 changed, 1 deleted" in out


def test_sfx_and_zfs_are_explicit_gaps(tree, capsys):
    assert main(["sfx", "arc"]) == 2
    assert main(["zfslist", "tank"]) == 2


def test_autotest_all_quick(tree, capsys):
    """The extended self-test (autotest -all): expected-failure cases
    (corrupt d block, garbage input, wrong password) must be DETECTED and
    the round-trips must pass; -quick skips the 256-file golden extract."""
    assert main(["autotest", "-quick", "-all"]) == 0
    out = capsys.readouterr().out
    assert "autotest: PASS" in out
    assert out.count("expected-failure=detected") == 3
    assert "|STAT| autotest op=extract-streaming" in out
