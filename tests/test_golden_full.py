"""Full golden-archive extraction + ratio parity, in the default test run.

Round-3 gap (VERDICT.md weak #6/#7): the complete 256-file extraction of
the reference's own fixture lived only in `cli autotest`, which CI never
ran, and ratio parity on the real corpus had no standing test. Both gates
now run under pytest:

  1. host-path extract of /root/reference/AUTOTEST/sha256.zpaq, verifying
     every file's contents against its name (names ARE the SHA-256 of the
     contents — AUTOTEST/README.txt:24-41), i.e. a self-contained
     bit-exactness proof for the whole -m5 decode stack;
  2. re-archiving those files at -m5 must not exceed the reference's own
     158,239-byte output (BASELINE.md "our archives <= reference size").

The native engine decodes the -m5 d blocks; the run costs ~30-60 s, which
is why it gets its own module (fail-fast ordering keeps it near the end).
"""

import hashlib
import pathlib

import pytest

from zpaqfranz_tpu.jidac.add import add
from zpaqfranz_tpu.jidac.extract import extract
from zpaqfranz_tpu.jidac.index import read_archive

GOLDEN = pathlib.Path("/root/reference/AUTOTEST/sha256.zpaq")


@pytest.fixture(scope="module")
def extracted_tree(golden_bytes, tmp_path_factory):
    td = tmp_path_factory.mktemp("golden_files")
    jd = read_archive(golden_bytes)
    nfiles, nbytes = extract(golden_bytes, jd, str(td), use_device=False)
    return td, nfiles, nbytes


def test_full_extract_all_sha256_names(extracted_tree):
    td, nfiles, nbytes = extracted_tree
    files = [p for p in td.rglob("*") if p.is_file()]
    assert nfiles == len(files) == 256
    for p in files:
        want = p.name.lower()
        got = hashlib.sha256(p.read_bytes()).hexdigest()
        assert got == want, f"{p.name}: decoded contents hash {got}"


def test_rearchive_m5_not_larger_than_reference(extracted_tree, tmp_path,
                                                monkeypatch):
    td, _, _ = extracted_tree
    ref_size = GOLDEN.stat().st_size
    arc = tmp_path / "ours.zpaq"
    monkeypatch.chdir(td)
    add(str(arc), ["."], method="5")
    ours = arc.stat().st_size
    assert ours <= ref_size, (
        f"ratio parity regression: ours {ours} > reference {ref_size}")
