"""Arena engine through the PRODUCT block paths on real data (VERDICT r4 #7).

Round-4 gap: the arena<->host interop tests stopped at 100-byte payloads;
nothing exercised encode_jidac_blocks/decode_jidac_blocks (the code the TPU
product path runs) with the arena engine over megabyte-scale real data.

These tests run the golden fixture's reference-shuffled text (≥1 MB) through
the full jidac add pipeline twice — host engine vs arena device engine (CPU
backend; the engine is backend-agnostic jax) — and require archive-BYTE
identity, then decode back through the device block path and require
content identity.  Method "3" (BWT + ICM/ISSE, the chain proven on silicon)
keeps CPU runtime in CI bounds; the 100-byte-payload tests in
test_codec_arena.py keep per-bit parity coverage for the m4/m5 chains.
"""

import hashlib
import os

import pytest

from zpaqfranz_tpu.jidac.add import add
from zpaqfranz_tpu.jidac.extract import extract
from zpaqfranz_tpu.jidac.index import read_archive


@pytest.fixture(scope="module")
def source_tree(golden_bytes, tmp_path_factory):
    """≥1 MB of real (reference-made) file data: 32 golden files."""
    td = tmp_path_factory.mktemp("arena_src")
    jd = read_archive(golden_bytes)
    extract(golden_bytes, jd, str(td), use_device=False)
    files = sorted(p for p in td.rglob("*") if p.is_file())[:32]
    keep = {p.name for p in files}
    for p in td.rglob("*"):
        if p.is_file() and p.name not in keep:
            p.unlink()
    total = sum(p.stat().st_size for p in files)
    assert total >= (1 << 20), f"corpus too small: {total}"
    return td, total


@pytest.mark.slow
def test_arena_add_byte_identical_to_host(source_tree, tmp_path, monkeypatch):
    td, total = source_tree
    monkeypatch.chdir(td.parent)
    rel = td.name
    date = 20260101010101
    host_arc = tmp_path / "host.zpaq"
    dev_arc = tmp_path / "dev.zpaq"
    monkeypatch.setenv("ZPAQFRANZ_DEVICE_ENGINE", "arena")
    add(str(host_arc), [rel], method="3", date=date, use_device=False)
    add(str(dev_arc), [rel], method="3", date=date, use_device=True)
    hb = host_arc.read_bytes()
    db = dev_arc.read_bytes()
    assert len(hb) == len(db) and hb == db, (
        f"arena add diverged from host add ({len(db)} vs {len(hb)} bytes)")

    # decode back through the device block path and verify content
    jd = read_archive(db)
    out = tmp_path / "back"
    nfiles, nbytes = extract(db, jd, str(out), use_device=True)
    assert nbytes >= total
    for p in (out / rel).rglob("*"):
        if p.is_file():
            assert hashlib.sha256(
                p.read_bytes()).hexdigest().upper() == p.name.upper()
