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


@pytest.mark.parametrize("method,transform", [
    ("1", 1), ("2", 1),                    # levels 1/2 = packed LZ77
    ("x4.2.6.0.3.22", 2),                  # byte-aligned LZ77
], ids=["m1", "m2", "x4.2"])
def test_lz77_block_roundtrip(method, transform):
    from zpaqfranz_tpu.parallel.engine import prepare_payload
    model, pre = make_model(method)
    assert pre.transform == transform
    for data in _payloads():
        lz, store = prepare_payload(pre, data)
        if store:
            continue                       # adaptive store: no pcomp to test
        arc = native.compress_block(model, lz, b"f", b"c")
        # native decode
        segs = native.decompress_stream(bytes(arc))[0]
        assert segs[0].data == data, f"native: {len(segs[0].data)} vs {len(data)}"
    # oracle decode cross-check on one mid-size payload
    data = _payloads()[3]
    lz, store = prepare_payload(pre, data)
    assert not store
    arc = native.compress_block(model, lz, b"f", b"c")
    seg = decompress_stream(bytes(arc))[0].segments[0]
    assert seg.data == data


def test_lz77p_native_roundtrip():
    """Packed-format native encoder vs native decoder twin, all rb values."""
    for rb in (0, 2, 7):
        for data in _payloads():
            lz = native.lz77p_encode(data, min_match=4, depth_log=3,
                                     hash_bits=20, rb=rb)
            assert native.lz77p_decode(lz, rb) == data


def test_lz77p_long_range_dup():
    """Content-defined resync: duplicates after incompressible data are
    found regardless of offset (the blind-stride matcher missed them)."""
    rng = random.Random(6)
    half = bytes(rng.randrange(256) for _ in range(1 << 20))
    data = half + half
    lz = native.lz77p_encode(data, min_match=4, depth_log=3, hash_bits=22)
    assert len(lz) < len(data) * 0.55
    assert native.lz77p_decode(lz, 0) == data


def _exe_like(n, seed):
    rng = random.Random(seed)
    out = bytearray()
    words = [b"\x55\x48\x89\xe5", b"\x90\x90", b"\x48\x8b\x45\xf8", b"\xc3"]
    while len(out) < n:
        r = rng.random()
        if r < 0.15:    # CALL/JMP rel32 with small displacement
            disp = rng.randrange(-(1 << 15), 1 << 15)
            out += bytes([0xE8 if rng.random() < .5 else 0xE9])
            out += disp.to_bytes(4, "little", signed=True)
        elif r < 0.3:
            out += bytes(rng.randrange(256) for _ in range(rng.randrange(1, 8)))
        else:
            out += words[rng.randrange(len(words))]
    return bytes(out[:n])


@pytest.mark.parametrize("method", ["x4.5.5.0.3.22", "x4.6.6.0.3.22",
                                    "x4.7ci1", "x4.4"],
                         ids=["packed+e8e9", "byte+e8e9", "bwt+e8e9",
                              "e8e9-only"])
def test_composite_e8e9_roundtrip(method):
    """N2=4..7: E8E9 before LZ77/BWT; the pcomp chains the inverse stage."""
    from zpaqfranz_tpu.parallel.engine import prepare_payload
    model, pre = make_model(method)
    assert pre.e8e9
    for data in (_exe_like(60000, 9), b"plain text data " * 1000,
                 _exe_like(333, 1)):
        payload, store = prepare_payload(pre, data)
        assert not store
        arc = native.compress_block(model, payload, b"f", b"c")
        segs = native.decompress_stream(bytes(arc))[0]
        assert segs[0].data == data, f"{method}: {len(segs[0].data)} vs {len(data)}"


def test_composite_e8e9_oracle_crosscheck():
    """Python oracle VM agrees with the native VM on one composite case."""
    from zpaqfranz_tpu.parallel.engine import prepare_payload
    model, pre = make_model("x4.5.5.0.3.22")
    data = _exe_like(2500, 11)
    payload, store = prepare_payload(pre, data)
    assert not store
    arc = native.compress_block(model, payload, b"f", b"c")
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
