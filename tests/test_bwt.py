"""BWT transform (SA-IS) + ZPAQL inverse postprocessor round-trips."""

import random

import pytest

from zpaqfranz_tpu import native
from zpaqfranz_tpu.codec.container import decompress_stream
from zpaqfranz_tpu.codec.methods import make_model


def _cases():
    rng = random.Random(13)
    return [
        b"",
        b"q",
        b"banana" * 100,
        b"mississippi" * 37,
        bytes(rng.randrange(256) for _ in range(8000)),
        bytes(2000),                       # all zeros (degenerate suffixes)
        b"ab" * 3000,                      # periodic
        bytes(rng.randrange(3) for _ in range(20000)),  # tiny alphabet
    ]


def test_bwt_stream_format():
    data = b"banana"
    s = native.bwt_encode(data)
    assert len(s) == len(data) + 5
    idx = int.from_bytes(s[-4:], "little")
    assert 1 <= idx <= len(data)
    assert s[idx] == 255                   # sentinel row marker


@pytest.mark.parametrize("i", range(8))
def test_m3_block_roundtrip(i):
    data = _cases()[i]
    model, pre = make_model("3")
    assert pre.transform == 3
    arc = native.compress_block(model, native.bwt_encode(data), b"f", b"c")
    segs = native.decompress_stream(bytes(arc))[0]
    assert segs[0].data == data


def test_m3_compresses_text():
    data = open("/root/reference/CHANGELOG.md", "rb").read()[:60000]
    model, _ = make_model("3")
    arc = native.compress_block(model, native.bwt_encode(data), b"f", b"c")
    assert len(arc) < len(data) // 2


def test_m3_oracle_decode():
    data = b"abracadabra" * 60
    model, _ = make_model("3")
    arc = native.compress_block(model, native.bwt_encode(data), b"f", b"c")
    seg = decompress_stream(bytes(arc))[0].segments[0]
    assert seg.data == data


def test_m3_jidac_roundtrip(tmp_path, monkeypatch):
    from zpaqfranz_tpu.jidac.add import add
    from zpaqfranz_tpu.jidac.index import read_archive
    from zpaqfranz_tpu.jidac.extract import extract
    monkeypatch.chdir(tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    (src / "t.txt").write_bytes(b"to be or not to be " * 500)
    add(str(tmp_path / "a.zpaq"), ["src"], method="3")
    data = (tmp_path / "a.zpaq").read_bytes()
    jd = read_archive(data)
    out = tmp_path / "out"
    extract(data, jd, str(out))
    assert (out / "src" / "t.txt").read_bytes() == (src / "t.txt").read_bytes()
