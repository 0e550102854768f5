"""Byte-aligned LZ77 transform + ZPAQL PCOMP inverse round-trips."""

import random

import pytest

from zpaqfranz_tpu import native
from zpaqfranz_tpu.codec.container import decompress_stream
from zpaqfranz_tpu.codec.methods import make_model
from zpaqfranz_tpu.codec.writer import compress_block


def _payloads():
    rng = random.Random(11)
    return [
        b"",
        b"a",
        b"abcabcabcabc" * 100,
        b"the quick brown fox jumps over the lazy dog. " * 200,
        bytes(rng.randrange(256) for _ in range(10000)),          # random
        bytes(5000),                                               # zeros
        b"x" * 70000,                                              # long match
        (b"0123456789" * 40 + bytes(rng.randrange(256)
                                    for _ in range(97))) * 30,     # mixed
    ]


@pytest.mark.parametrize("method", ["1", "2"], ids=["m1", "m2"])
def test_lz77_block_roundtrip(method):
    model, pre = make_model(method)
    assert pre.transform == 2
    for data in _payloads():
        lz = native.lz77_encode(data, min_match=max(1, pre.min_match),
                                depth_log=max(1, pre.depth_log),
                                hash_bits=20)
        arc = native.compress_block(model, lz, b"f", b"c")
        # native decode
        segs = native.decompress_stream(bytes(arc))[0]
        assert segs[0].data == data, f"native: {len(segs[0].data)} vs {len(data)}"
    # oracle decode cross-check on one mid-size payload
    data = _payloads()[3]
    lz = native.lz77_encode(data, min_match=max(1, pre.min_match))
    arc = native.compress_block(model, lz, b"f", b"c")
    seg = decompress_stream(bytes(arc))[0].segments[0]
    assert seg.data == data


def test_lz77_compresses_text():
    data = b"the quick brown fox jumps over the lazy dog. " * 500
    lz = native.lz77_encode(data)
    assert len(lz) < len(data) // 4


def test_lz77_random_expands_little():
    rng = random.Random(5)
    data = bytes(rng.randrange(256) for _ in range(50000))
    lz = native.lz77_encode(data)
    assert len(lz) < len(data) * 1.04


def test_m1_jidac_roundtrip(tmp_path, monkeypatch):
    from zpaqfranz_tpu.jidac.add import add
    from zpaqfranz_tpu.jidac.index import read_archive
    from zpaqfranz_tpu.jidac.extract import extract
    monkeypatch.chdir(tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    (src / "t.txt").write_bytes(b"lorem ipsum dolor sit amet " * 300)
    rng = random.Random(2)
    (src / "r.bin").write_bytes(bytes(rng.randrange(256) for _ in range(9000)))
    add(str(tmp_path / "a.zpaq"), ["src"], method="1")
    data = (tmp_path / "a.zpaq").read_bytes()
    jd = read_archive(data)
    out = tmp_path / "out"
    extract(data, jd, str(out))
    assert (out / "src" / "t.txt").read_bytes() == (src / "t.txt").read_bytes()
    assert (out / "src" / "r.bin").read_bytes() == (src / "r.bin").read_bytes()
    # LZ77 beats store on the text
    assert (tmp_path / "a.zpaq").stat().st_size < 9000 + 8100 + 2000
