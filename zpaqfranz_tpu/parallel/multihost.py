"""Multi-host distributed add: hash-sharded dedup + ordered gather.

The reference is single-process; its multi-machine story is "rsync the
append-only archive" (reference README.md:301-313). This module is the
TPU-native replacement (SURVEY.md section 2.8 "Distributed communication
backend"): a (hosts x chips) deployment where

 - every host digests a shard of the changed-file list (CDC + SHA-1 run
   native and local; input files come from shared storage, the reference's
   own fileserver deployment model);
 - the EXISTING archive's dedup table is sharded by hash prefix across
   hosts, and an all-to-all exchange answers "is this fragment already
   stored?" queries (the DCN-bound step — index metadata, not data);
 - fragments that survive dedup are allgathered as compact descriptors in
   global file order, and every host REPLAYS the same deterministic
   assignment (jidac.add.FragmentPlanner), so fragment IDs, d-block
   packing, and therefore archive bytes are host-count invariant
   (SURVEY.md section 7 hard part 6: "hosts propose fragments in file
   order, prefix-sum ID assignment");
 - each host compresses the d-blocks it owns (round-robin by job index;
   device lanes within a host via parallel/engine.py), and an ordered
   gather returns the compressed blocks to host 0, the single writer
   (the cross-host analog of the reference's write mutex, zsfx.cpp:1711);
 - host 0 appends the c + d... + h... + i transaction.

Communication backends:
 - ``TcpComm``: a coordinator-routed message layer (host 0 listens; ranks
   connect). The archiver's cross-host traffic is control metadata and
   compressed bytes — host-side payloads, not device tensors — so a plain
   socket layer is the right transport off-pod and in tests.
 - ``JaxComm``: the same interface over jax.distributed + allgather
   collectives for pod deployments where DCN rides the JAX runtime
   (process_allgather); requires jax.distributed.initialize().

Determinism gate (tests/test_multihost.py): archive bytes at world=1, 2, 4
are identical to the single-process jidac.add.add() output.
"""

from __future__ import annotations

import io
import os
import pickle
import socket
import struct
import time
from typing import Dict, List, Optional, Sequence, Tuple

from ..jidac import add as jadd
from ..jidac.index import Jidac


# ---------------------------------------------------------------------------
# Communication backends
# ---------------------------------------------------------------------------

class CommError(RuntimeError):
    pass


def _send_msg(sock: socket.socket, obj) -> None:
    blob = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
    sock.sendall(struct.pack("<Q", len(blob)) + blob)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = io.BytesIO()
    got = 0
    while got < n:
        chunk = sock.recv(min(1 << 20, n - got))
        if not chunk:
            raise CommError("peer closed")
        buf.write(chunk)
        got += len(chunk)
    return buf.getvalue()


def _recv_msg(sock: socket.socket):
    (n,) = struct.unpack("<Q", _recv_exact(sock, 8))
    return pickle.loads(_recv_exact(sock, n))


class TcpComm:
    """Coordinator-routed collectives: rank 0 listens, ranks 1..W-1 connect.

    All collectives route through rank 0 (world sizes here are hosts, not
    chips — single digits to low tens; the payloads are index metadata and
    compressed blocks)."""

    def __init__(self, rank: int, world: int, coordinator: str,
                 timeout: float = 120.0):
        self.rank = rank
        self.world = world
        host, port_s = coordinator.rsplit(":", 1)
        port = int(port_s)
        self._peers: Dict[int, socket.socket] = {}
        if world == 1:
            return
        if rank == 0:
            srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            srv.bind((host, port))
            srv.listen(world)
            srv.settimeout(timeout)
            for _ in range(world - 1):
                conn, _addr = srv.accept()
                conn.settimeout(timeout)
                r = _recv_msg(conn)
                self._peers[r] = conn
            srv.close()
        else:
            deadline = time.time() + timeout
            while True:
                try:
                    s = socket.create_connection((host, port), timeout=5.0)
                    break
                except OSError:
                    if time.time() > deadline:
                        raise CommError("coordinator unreachable")
                    time.sleep(0.05)
            s.settimeout(timeout)
            _send_msg(s, rank)
            self._peers[0] = s

    def close(self) -> None:
        for s in self._peers.values():
            try:
                s.close()
            except OSError:
                pass
        self._peers.clear()

    # -- collectives --------------------------------------------------------
    def broadcast(self, obj=None):
        """Rank 0's obj to everyone."""
        if self.world == 1:
            return obj
        if self.rank == 0:
            for r in range(1, self.world):
                _send_msg(self._peers[r], obj)
            return obj
        return _recv_msg(self._peers[0])

    def gather(self, obj) -> Optional[List]:
        """Everyone's obj to rank 0 (returns list indexed by rank; None on
        other ranks)."""
        if self.world == 1:
            return [obj]
        if self.rank == 0:
            out = [None] * self.world
            out[0] = obj
            for r in range(1, self.world):
                out[r] = _recv_msg(self._peers[r])
            return out
        _send_msg(self._peers[0], obj)
        return None

    def allgather(self, obj) -> List:
        got = self.gather(obj)
        return self.broadcast(got)

    def alltoall(self, per_dst: List) -> List:
        """per_dst[r] goes to rank r; returns [from rank 0, from 1, ...]."""
        if self.world == 1:
            return [per_dst[0]]
        rows = self.gather(per_dst)          # rank0: rows[src][dst]
        if self.rank == 0:
            cols = [[rows[src][dst] for src in range(self.world)]
                    for dst in range(self.world)]
            for r in range(1, self.world):
                _send_msg(self._peers[r], cols[r])
            return cols[0]
        return _recv_msg(self._peers[0])

    def barrier(self) -> None:
        self.allgather(None)


class JaxComm:
    """The same collective surface over jax.distributed (pod deployments).

    Requires jax.distributed.initialize() to have run; uses
    multihost_utils.process_allgather over DCN. Payloads are pickled to
    uint8 tensors — the exchanged data is index metadata (small) and
    compressed block bytes (the ordered gather)."""

    def __init__(self):
        import jax
        self.rank = jax.process_index()
        self.world = jax.process_count()

    def allgather(self, obj) -> List:
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental import multihost_utils as mh
        blob = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
        n = np.array([blob.size], dtype=np.int64)
        sizes = np.asarray(mh.process_allgather(jnp.asarray(n)))
        cap = int(sizes.max())
        pad = np.zeros(cap, np.uint8)
        pad[: blob.size] = blob
        rows = np.asarray(mh.process_allgather(jnp.asarray(pad)))
        return [pickle.loads(rows[r, : int(sizes[r, 0])].tobytes())
                for r in range(self.world)]

    def broadcast(self, obj=None):
        return self.allgather(obj if self.rank == 0 else None)[0]

    def gather(self, obj) -> Optional[List]:
        rows = self.allgather(obj)
        return rows if self.rank == 0 else None

    def alltoall(self, per_dst: List) -> List:
        rows = self.allgather(per_dst)
        return [rows[src][self.rank] for src in range(self.world)]

    def barrier(self) -> None:
        self.allgather(None)

    def close(self) -> None:
        pass


def init_jax_distributed(coordinator: str, world: int, rank: int,
                         local_chips: Optional[int] = None) -> "JaxComm":
    """Bring up jax.distributed for a (hosts x chips) pod and return the
    collective layer. On TPU pods the mesh axes then span
    (dcn=hosts, ici=local chips); dist.default_mesh() builds per-host
    lane shards on top."""
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=world, process_id=rank,
                               local_device_ids=(list(range(local_chips))
                                                 if local_chips else None))
    return JaxComm()


# ---------------------------------------------------------------------------
# The distributed add pipeline
# ---------------------------------------------------------------------------

def _hash_owner(sha: bytes, world: int) -> int:
    return sha[0] % world


def dist_add(comm, archive: str, files: Sequence[str], method: str = "1",
             fragment_bits: int = 16, date: Optional[int] = None,
             key: Optional[str] = None, use_device: bool = False,
             franz: str = "xxhash64") -> Tuple[int, int, int]:
    """Distributed append of one transaction; archive bytes are identical
    to the single-process jidac.add.add() of the same tree.

    Requires shared storage for the input files (every rank can open them);
    only rank 0 touches the archive. Returns (files, frags, bytes) on rank
    0 and zeros elsewhere."""
    from .. import native
    from ..codec.methods import make_model

    rank, world = comm.rank, comm.world

    # ---- stage 0 (rank 0): open archive, diff, broadcast the plan --------
    if rank == 0:
        ctx = jadd.open_for_append(archive, key=key)
        jd = ctx.jd
        ext = jadd.scan_files(files)
        date = jadd.pick_date(jd, date)
        changed, deleted = jadd.diff_index(jd, ext, files)
        old = jadd.old_dedup_table(jd)
        # hash-sharded old-index shards: owner r receives {sha -> id}
        shards: List[Dict[bytes, int]] = [dict() for _ in range(world)]
        for sha, fid in old.items():
            shards[_hash_owner(sha, world)][sha] = fid
        plan = {"date": date, "changed": changed, "deleted": deleted,
                "ext": ext, "next_frag": len(jd.ht)}
    else:
        ctx = jd = ext = None
        shards = None
        plan = None
    plan = comm.broadcast(plan)
    my_shard: Dict[bytes, int] = comm.alltoall(
        shards if rank == 0 else [None] * world)[0] or {}
    changed: List[str] = plan["changed"]
    date = plan["date"]
    if not changed and not plan["deleted"]:
        return (0, 0, 0)

    model, pre = make_model(method)
    block_cap = min(1 << pre.block_bits, 1 << 24)

    # ---- stage 1: digest my shard of the changed files --------------------
    # contiguous round-robin by file index keeps per-host IO local-ish and
    # the order reconstruction trivial
    mine = [(i, name) for i, name in enumerate(changed) if i % world == rank]
    my_digests: Dict[int, Tuple[Tuple[int, int], List[Tuple[bytes, int, int]]]] = {}
    for i, name in mine:
        import pathlib
        data = pathlib.Path(name).read_bytes()
        frags, crc, xxh = native.digest_file(data, fragment_bits)
        my_digests[i] = ((crc, xxh), [(sha, start, end)
                                      for sha, start, end in frags])

    # ---- stage 2: hash-sharded dedup queries against the OLD index --------
    # (all-to-all: each rank asks the owner of each hash; answers come back
    # as {sha: old_id}. This is what scales to a 15M-fragment index — only
    # 1/world of the old table lives on each host.)
    queries: List[List[bytes]] = [[] for _ in range(world)]
    for i, (_sums, frags) in my_digests.items():
        for sha, _s, _e in frags:
            queries[_hash_owner(sha, world)].append(sha)
    incoming = comm.alltoall(queries)
    answers = [{sha: my_shard[sha] for sha in q if sha in my_shard}
               for q in incoming]
    replies = comm.alltoall(answers)
    old_ids: Dict[bytes, int] = {}
    for rep in replies:
        old_ids.update(rep)

    # ---- stage 3: allgather descriptors, replay assignment everywhere -----
    rows = comm.allgather(
        [(i, my_digests[i][0], my_digests[i][1]) for i, _ in mine])
    per_file: Dict[int, Tuple[Tuple[int, int], List[Tuple[bytes, int, int]]]] = {}
    all_old_ids: Dict[bytes, int] = dict(old_ids)
    for row in rows:
        for i, sums, frags in row:
            per_file[i] = (sums, frags)
    # old-id answers were only fetched for local queries; allgather the
    # merged map so the replay sees every known fragment
    for m in comm.allgather(old_ids):
        all_old_ids.update(m)

    planner = jadd.FragmentPlanner(dict(all_old_ids), plan["next_frag"],
                                   block_cap, keep_bytes=False)
    jobs: List[jadd._Job] = []
    file_sums: Dict[str, Tuple[int, int]] = {}
    for i, name in enumerate(changed):
        sums, frags = per_file[i]
        file_sums[name] = sums
        jobs.extend(planner.add_file(name, frags, None))
    tail = planner.finish()
    if tail is not None:
        jobs.append(tail)

    # ---- stage 4: compress my jobs (round-robin by job index) -------------
    my_blocks: Dict[int, bytes] = {}
    my_jobs = [(k, job) for k, job in enumerate(jobs) if k % world == rank]
    if use_device and model is not None and model.n > 0 and my_jobs:
        from .engine import encode_jidac_blocks
        mats = []
        for _k, job in my_jobs:
            job = jadd._Job(first_frag=job.first_frag, frags=job.frags,
                            data=bytearray(jadd.job_bytes(job)))
            mats.append(job)
        blocks = encode_jidac_blocks(model, pre, mats, date, jadd._jdc_name)
        for (k, _job), blk in zip(my_jobs, blocks):
            my_blocks[k] = blk
    else:
        for k, job in my_jobs:
            job = jadd._Job(first_frag=job.first_frag, frags=job.frags,
                            data=bytearray(jadd.job_bytes(job)))
            my_blocks[k] = jadd._compress_d_block(model, pre, job, date)

    # ---- stage 5: ordered gather to the writer host ------------------------
    gathered = comm.gather(my_blocks)
    if rank != 0:
        return (0, 0, 0)
    d_blocks: List[bytes] = [b""] * len(jobs)
    for m in gathered:
        for k, blk in m.items():
            d_blocks[k] = blk

    out, ix = jadd.build_transaction(
        date, jobs, d_blocks, changed, plan["deleted"], plan["ext"],
        file_sums, planner.file_ptrs, planner.first_frag, franz=franz)
    jadd.commit_transaction(ctx, out, ix)
    return len(changed), len(planner.new_ht), len(out)


# ---------------------------------------------------------------------------
# Scaling harness (BASELINE.md north star: GB/s at 1 host vs N hosts)
# ---------------------------------------------------------------------------

def scaling_report(corpus: str, worlds: Sequence[int] = (1, 2),
                   method: str = "1", port: int = 0) -> dict:
    """Time dist_add over the corpus at each world size; returns
    {world: {'seconds': s, 'MBps': r, 'efficiency_vs_1': e}}.

    Spawns one process per host rank (all local here — the harness shape;
    real multi-host runs point --coordinator at host 0). Archive bytes are
    asserted identical across world sizes."""
    import pathlib
    import socket
    import subprocess
    import sys
    import tempfile
    import time as _t

    corpus_path = pathlib.Path(corpus).resolve()
    nbytes = sum(p.stat().st_size
                 for p in corpus_path.rglob("*") if p.is_file())
    out: dict = {}
    ref_bytes = None
    date = 20260102030405
    for world in worlds:
        with tempfile.TemporaryDirectory() as td:
            arc = str(pathlib.Path(td) / "s.zpaq")
            if port == 0:
                s = socket.socket()
                s.bind(("127.0.0.1", 0))
                p = s.getsockname()[1]
                s.close()
            else:
                p = port
            env = dict(os.environ)
            pkg_root = str(pathlib.Path(__file__).resolve().parents[2])
            env["PYTHONPATH"] = (pkg_root + os.pathsep
                                 + env.get("PYTHONPATH", ""))
            t0 = _t.time()
            procs = [subprocess.Popen(
                [sys.executable, "-m", "zpaqfranz_tpu.parallel.multihost",
                 "--rank", str(r), "--world", str(world),
                 "--coordinator", f"127.0.0.1:{p}",
                 "--method", method, "--date", str(date), arc,
                 corpus_path.name],
                cwd=corpus_path.parent, env=env,
                stdout=subprocess.DEVNULL, stderr=subprocess.PIPE)
                for r in range(world)]
            for pr in procs:
                _o, err = pr.communicate(timeout=3600)
                if pr.returncode != 0:
                    raise RuntimeError(err.decode()[-2000:])
            dt = _t.time() - t0
            blob = pathlib.Path(arc).read_bytes()
            if ref_bytes is None:
                ref_bytes = blob
            elif blob != ref_bytes:
                raise RuntimeError(f"world={world}: archive bytes diverged")
            out[world] = {"seconds": round(dt, 2),
                          "MBps": round(nbytes / dt / 1e6, 2)}
    base = out[worlds[0]]["MBps"]
    for world in worlds:
        out[world]["efficiency_vs_1"] = round(
            out[world]["MBps"] / (base * world / worlds[0]), 3)
    return out


# ---------------------------------------------------------------------------
# Worker entry point (one process per host)
# ---------------------------------------------------------------------------

def _main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse
    ap = argparse.ArgumentParser(
        prog="zpaqfranz_tpu.parallel.multihost",
        description="distributed add worker (one process per host)")
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--world", type=int, required=True)
    ap.add_argument("--coordinator", required=True,
                    help="host:port of rank 0's listener")
    ap.add_argument("--method", default="1")
    ap.add_argument("--date", type=int, default=None)
    ap.add_argument("--key", default=None)
    ap.add_argument("--device", action="store_true")
    ap.add_argument("--jax-dist", action="store_true",
                    help="use jax.distributed collectives instead of TCP")
    ap.add_argument("archive")
    ap.add_argument("files", nargs="+")
    a = ap.parse_args(argv)
    if a.jax_dist:
        comm = init_jax_distributed(a.coordinator, a.world, a.rank)
    else:
        comm = TcpComm(a.rank, a.world, a.coordinator)
    try:
        nfiles, nfrags, nbytes = dist_add(
            comm, a.archive, a.files, method=a.method, date=a.date,
            key=a.key, use_device=a.device)
        if comm.rank == 0:
            print(f"{nfiles} +files, {nfrags} +frags, {nbytes} bytes")
    finally:
        comm.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(_main())
