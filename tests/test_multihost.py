"""Multi-host distributed add: host-count invariance of archive bytes.

The determinism gate from SURVEY.md section 7 (hard part 6) and BASELINE.md:
the archive produced by N cooperating hosts (hash-sharded dedup, replayed
fragment-ID assignment, ordered gather to the writer) must be byte-identical
to the single-process jidac.add.add() of the same tree."""

import os
import pathlib
import socket
import subprocess
import sys
import threading

import pytest

from zpaqfranz_tpu.jidac.add import add
from zpaqfranz_tpu.parallel.multihost import TcpComm, dist_add

_DATE = 20260102030405


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _corpus(root: pathlib.Path) -> None:
    (root / "sub").mkdir(parents=True)
    (root / "a.txt").write_bytes(b"alpha beta gamma " * 4000)
    (root / "b.bin").write_bytes(bytes(range(256)) * 999)
    (root / "sub" / "dup.bin").write_bytes(bytes(range(256)) * 999)  # dedup
    (root / "sub" / "c.txt").write_bytes(b"delta epsilon " * 7000)
    os.utime(root / "a.txt", (1_700_000_000, 1_700_000_000))
    os.utime(root / "b.bin", (1_700_000_001, 1_700_000_001))
    os.utime(root / "sub" / "dup.bin", (1_700_000_002, 1_700_000_002))
    os.utime(root / "sub" / "c.txt", (1_700_000_003, 1_700_000_003))


def _run_world(world: int, tmp: pathlib.Path, archive: str,
               date: int) -> None:
    port = _free_port()
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for r in range(world):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "zpaqfranz_tpu.parallel.multihost",
             "--rank", str(r), "--world", str(world),
             "--coordinator", f"127.0.0.1:{port}",
             "--method", "1", "--date", str(date), archive, "corpus"],
            cwd=tmp, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, err.decode()


def test_dist_add_world1_matches_serial(tmp_path):
    _corpus(tmp_path / "corpus")
    os.chdir(tmp_path)
    add("serial.zpaq", ["corpus"], method="1", date=_DATE)
    comm = TcpComm(0, 1, "127.0.0.1:0")
    dist_add(comm, "dist.zpaq", ["corpus"], method="1", date=_DATE)
    assert (tmp_path / "dist.zpaq").read_bytes() == \
        (tmp_path / "serial.zpaq").read_bytes()


@pytest.mark.parametrize("world", [2, 3])
def test_dist_add_matches_serial(tmp_path, world):
    _corpus(tmp_path / "corpus")
    os.chdir(tmp_path)
    add("serial.zpaq", ["corpus"], method="1", date=_DATE)
    _run_world(world, tmp_path, "dist.zpaq", _DATE)
    assert (tmp_path / "dist.zpaq").read_bytes() == \
        (tmp_path / "serial.zpaq").read_bytes()


def test_dist_add_incremental_matches_serial(tmp_path):
    """Second transaction (modified tree, dedup against v1) must also be
    host-count invariant."""
    _corpus(tmp_path / "corpus")
    os.chdir(tmp_path)
    add("serial.zpaq", ["corpus"], method="1", date=_DATE)
    _run_world(2, tmp_path, "dist.zpaq", _DATE)

    p = tmp_path / "corpus" / "a.txt"
    p.write_bytes(p.read_bytes() + b"incremental tail")
    os.utime(p, (1_700_000_100, 1_700_000_100))
    (tmp_path / "corpus" / "new.txt").write_bytes(b"brand new " * 500)
    os.utime(tmp_path / "corpus" / "new.txt",
             (1_700_000_101, 1_700_000_101))

    add("serial.zpaq", ["corpus"], method="1", date=_DATE + 100)
    _run_world(2, tmp_path, "dist.zpaq", _DATE + 100)
    assert (tmp_path / "dist.zpaq").read_bytes() == \
        (tmp_path / "serial.zpaq").read_bytes()


def test_tcp_comm_collectives(tmp_path):
    """broadcast/allgather/alltoall/gather over real sockets, in-process."""
    port = _free_port()
    world = 3
    results = {}

    def worker(rank):
        comm = TcpComm(rank, world, f"127.0.0.1:{port}")
        try:
            assert comm.broadcast("hello" if rank == 0 else None) == "hello"
            ag = comm.allgather(rank * 10)
            assert ag == [0, 10, 20]
            a2a = comm.alltoall([f"{rank}->{d}" for d in range(world)])
            assert a2a == [f"{s}->{rank}" for s in range(world)]
            g = comm.gather(rank + 1)
            if rank == 0:
                assert g == [1, 2, 3]
            else:
                assert g is None
            results[rank] = True
        finally:
            comm.close()

    ts = [threading.Thread(target=worker, args=(r,)) for r in range(world)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    assert results == {0: True, 1: True, 2: True}


def test_scaling_report(tmp_path):
    """The scaling harness runs, archives byte-match across world sizes,
    and reports MB/s + efficiency (the BASELINE.md scaling-report shape)."""
    from zpaqfranz_tpu.parallel.multihost import scaling_report
    _corpus(tmp_path / "corpus")
    os.chdir(tmp_path)
    rep = scaling_report(str(tmp_path / "corpus"), worlds=(1, 2))
    assert set(rep) == {1, 2}
    assert rep[1]["MBps"] > 0 and rep[2]["MBps"] > 0
    assert "efficiency_vs_1" in rep[2]


def test_dist_add_encrypted_matches_serial(tmp_path):
    """Encrypted archives must also be host-count invariant (rank 0 owns
    the salt; plaintext transaction bytes are deterministic)."""
    _corpus(tmp_path / "corpus")
    os.chdir(tmp_path)
    add("serial.zpaq", ["corpus"], method="1", date=_DATE, key="pw")
    comm = TcpComm(0, 1, "127.0.0.1:0")
    dist_add(comm, "dist.zpaq", ["corpus"], method="1", date=_DATE,
             key="pw")
    # salts are random, so ciphertexts differ; the decrypted transactions
    # must match
    from zpaqfranz_tpu.codec import crypto
    ps = crypto.decrypt_archive((tmp_path / "serial.zpaq").read_bytes(), "pw")
    pd = crypto.decrypt_archive((tmp_path / "dist.zpaq").read_bytes(), "pw")
    assert ps == pd
