"""zfs-family commands against a shim `zfs` (ZPAQ_ZFS_CMD override).

The shim models the subset of zfs this integration uses: snapshot /
list -t snapshot / send (full + incremental) / receive / destroy, with
datasets as directories of a fake pool. Backup must store (incremental)
send streams in the archive; restore must replay them in order."""

import os
import pathlib
import stat
import subprocess
import sys

import pytest

from zpaqfranz_tpu.jidac import zfs as jzfs

_SHIM = r'''#!/usr/bin/env python3
"""Fake zfs: datasets live under $FAKE_POOL; snapshots are tar-like dir
copies; send emits 'SNAPDATA<name>\n' + a tar of the snapshot dir; receive
unpacks the newest stream into the target dataset dir."""
import io, os, pathlib, shutil, sys, tarfile

POOL = pathlib.Path(os.environ["FAKE_POOL"])

def snap_dir(name):
    ds, snap = name.split("@", 1)
    return POOL / ".snaps" / ds.replace("/", "_") / snap

def main():
    cmd = sys.argv[1]
    if cmd == "snapshot":
        name = sys.argv[2]
        ds = name.split("@", 1)[0]
        d = snap_dir(name)
        d.parent.mkdir(parents=True, exist_ok=True)
        shutil.copytree(POOL / ds, d)
        (d.parent / "ORDER").open("a").write(name + "\n")
        return 0
    if cmd == "list":
        ds = sys.argv[-1]
        order = POOL / ".snaps" / ds.replace("/", "_") / "ORDER"
        if order.exists():
            sys.stdout.write(order.read_text())
        return 0
    if cmd == "send":
        if sys.argv[2] == "-i":
            base, name = sys.argv[3], sys.argv[4]
            header = f"INCR {base} {name}\n"
        else:
            name = sys.argv[2]
            header = f"FULL {name}\n"
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as t:
            t.add(snap_dir(name), arcname="snap")
        sys.stdout.buffer.write(header.encode() + buf.getvalue())
        return 0
    if cmd == "receive":
        target = sys.argv[-1]
        data = sys.stdin.buffer.read()
        nl = data.index(b"\n")
        body = data[nl + 1:]
        out = POOL / target
        if out.exists():
            shutil.rmtree(out)
        with tarfile.open(fileobj=io.BytesIO(body)) as t:
            t.extractall(POOL / ".rx")
        shutil.move(str(POOL / ".rx" / "snap"), str(out))
        return 0
    if cmd == "destroy":
        name = sys.argv[2]
        d = snap_dir(name)
        if d.exists():
            shutil.rmtree(d)
        order = d.parent / "ORDER"
        if order.exists():
            lines = [l for l in order.read_text().splitlines()
                     if l != name]
            order.write_text("".join(l + "\n" for l in lines))
        return 0
    return 1

sys.exit(main())
'''


@pytest.fixture
def fake_zfs(tmp_path, monkeypatch):
    pool = tmp_path / "pool"
    (pool / "tank" / "data").mkdir(parents=True)
    shim = tmp_path / "zfs"
    shim.write_text(_SHIM)
    shim.chmod(shim.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("ZPAQ_ZFS_CMD", str(shim))
    monkeypatch.setenv("FAKE_POOL", str(pool))
    monkeypatch.chdir(tmp_path)
    return pool


def test_zfs_backup_restore_roundtrip(fake_zfs):
    ds = "tank/data"
    (fake_zfs / ds / "a.txt").write_bytes(b"zfs dataset content " * 500)
    snap, nbytes = jzfs.zfs_backup("z.zpaq", ds)
    assert snap.endswith("@zpaqfranz00000000") and nbytes > 0

    # mutate + incremental second backup
    (fake_zfs / ds / "b.txt").write_bytes(b"second generation " * 300)
    snap2, _ = jzfs.zfs_backup("z.zpaq", ds)
    assert snap2.endswith("@zpaqfranz00000001")
    assert len(jzfs.our_snapshots(ds)) == 2

    # restore into a fresh dataset: replays all streams in order; the fake
    # receive applies the newest full snapshot state
    n = jzfs.zfs_restore("z.zpaq", ds, to="tank/restored")
    assert n == 2
    restored = fake_zfs / "tank" / "restored"
    assert (restored / "a.txt").read_bytes() == b"zfs dataset content " * 500
    assert (restored / "b.txt").read_bytes() == b"second generation " * 300


def test_zfs_purge(fake_zfs):
    ds = "tank/data"
    (fake_zfs / ds / "x").write_bytes(b"1")
    jzfs.zfs_backup("z.zpaq", ds)
    (fake_zfs / ds / "y").write_bytes(b"2")
    jzfs.zfs_backup("z.zpaq", ds)
    assert len(jzfs.our_snapshots(ds)) == 2
    victims = jzfs.zfs_purge(ds, keep=1)
    assert len(victims) == 1
    assert len(jzfs.our_snapshots(ds)) == 1


def test_zfs_cli_commands(fake_zfs):
    ds = "tank/data"
    (fake_zfs / ds / "a.txt").write_bytes(b"via the CLI " * 100)
    env = dict(os.environ)
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-m", "zpaqfranz_tpu.cli",
                        "zfsbackup", "z.zpaq", ds], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, "-m", "zpaqfranz_tpu.cli",
                        "zfslist", ds], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0 and "zpaqfranz00000000" in r.stdout


def test_zfs_missing_binary(tmp_path, monkeypatch):
    monkeypatch.delenv("ZPAQ_ZFS_CMD", raising=False)
    monkeypatch.setenv("PATH", str(tmp_path))   # no zfs anywhere
    with pytest.raises(jzfs.ZfsError):
        jzfs.zfs_cmd()
