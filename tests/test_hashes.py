"""Hasher zoo validation (reference README.md:96-105; SURVEY.md §2.7 #42).

Wire-format checks:
- MD5 / SHA-256 / SHA-3-256: vs Python hashlib.
- XXH64 / XXH3-64 / XXH3-128: vs the canonical python-xxhash bindings.
- BLAKE3: official test vectors (input = bytes(i % 251)).
- WHIRLPOOL: official ISO test vectors.
- HighwayHash64: official test vectors (sequential key).
- wyhash: structural self-tests (no canonical oracle in this environment).
"""

import hashlib
import os

import pytest

from zpaqfranz_tpu import native as n

LENGTHS = [0, 1, 3, 4, 8, 9, 16, 17, 31, 32, 63, 64, 65, 100, 128, 129,
           240, 241, 500, 1024, 1025, 3000, 4096, 10000, 100000]


def _data(ln, seed=0):
    rng = __import__("random").Random(seed * 1000003 + ln)
    return bytes(rng.randrange(256) for _ in range(min(ln, 300))) * (
        1 if ln <= 300 else 0) or os.urandom(ln)


@pytest.mark.parametrize("ln", LENGTHS)
def test_md5_sha256_sha3_vs_hashlib(ln):
    v = os.urandom(ln)
    assert n.md5(v) == hashlib.md5(v).digest()
    assert n.sha256(v) == hashlib.sha256(v).digest()
    assert n.sha3_256(v) == hashlib.sha3_256(v).digest()


@pytest.mark.parametrize("ln", LENGTHS)
def test_xxh_family_vs_canonical(ln):
    xxhash = pytest.importorskip("xxhash")
    v = os.urandom(ln)
    assert n.xxh64(v) == xxhash.xxh64_intdigest(v)
    assert n.xxh3_64(v) == xxhash.xxh3_64_intdigest(v)
    assert n.xxh3_128(v) == xxhash.xxh3_128(v).digest()


def test_blake3_official_vectors():
    # BLAKE3 repo test_vectors.json, input bytes are (i % 251)
    assert n.blake3(b"").hex() == (
        "af1349b9f5f9a1a6a0404dea36dcc9499bcb25c9adc112b7cc9a93cae41f3262")
    assert n.blake3(bytes(i % 251 for i in range(1))).hex() == (
        "2d3adedff11b61f14c886e35afa036736dcd87a74d27b5c1510225d0f592e213")


def test_blake3_official_vectors_long():
    # BLAKE3 repo test_vectors.json lengths that exercise the 8-way SIMD
    # chunk path (31 and 100 chunks; >9 chunks activates b3_chunks8_avx2)
    assert n.blake3(bytes(i % 251 for i in range(31744))).hex() == (
        "62b6960e1a44bcc1eb1a611a8d6235b6b4b78f32e7abc4fb4c6cdcce94895c47")
    assert n.blake3(bytes(i % 251 for i in range(102400))).hex() == (
        "bc3e3d41a1146b069abffad3c0d44860cf664390afce4d9661f7902e7943e085")


def test_blake3_tree_shapes():
    # chunk-boundary shapes exercise the CV-stack merge (1, 2, 3, 4, 5 chunks
    # plus ragged tails); results must be stable and length-sensitive
    seen = set()
    for ln in (1023, 1024, 1025, 2048, 2049, 3072, 3073, 4096, 4097, 5120):
        d = bytes(i % 251 for i in range(ln))
        h = n.blake3(d)
        assert len(h) == 32 and h not in seen
        seen.add(h)
        assert n.blake3(d) == h


def test_whirlpool_official_vectors():
    # ISO/IEC 10118-3 final-version vectors
    assert n.whirlpool(b"").hex().upper() == (
        "19FA61D75522A4669B44E39C1D2E1726C530232130D407F89AFEE0964997F7A7"
        "3E83BE698B288FEBCF88E3E03C4F0757EA8964E59B63D93708B138CC42A66EB3")
    assert n.whirlpool(b"abc").hex().upper() == (
        "4E2448A4C6F486BB16B6562C73B4020BF3043E3A731BCE721AE1B303D97E6D4C"
        "7181EEBDB6C57E277D0E34957114CBD6C797FC9D95D8B582D225292076D4EEF5")


def test_highway64_official_vectors():
    key = (0x0706050403020100, 0x0F0E0D0C0B0A0908,
           0x1716151413121110, 0x1F1E1D1C1B1A1918)
    expected = [0x907A56DE22C26E53, 0x7EAB43AAC7CDDD78, 0xB8D0569AB0B53D62,
                0x5C6BEFAB8A463D80, 0xF205A46893007EDA, 0x2B8A1668E4A94541,
                0xBD4CCC325BEFCA6F, 0x4D02AE1738F59482]
    for ln, want in enumerate(expected):
        assert n.highway64(bytes(range(ln)), key) == want


def test_highway_wider_digests_consistent():
    key = (1, 2, 3, 4)
    for ln in (0, 5, 31, 32, 33, 100, 1000):
        d = os.urandom(ln)
        h128 = n.highway128(d, key)
        h256 = n.highway256(d, key)
        assert len(h128) == 16 and len(h256) == 32
        assert n.highway128(d, key) == h128
        assert n.highway256(d, key) == h256
    assert n.highway128(b"x", (1, 2, 3, 4)) != n.highway128(b"x", (5, 6, 7, 8))


def test_wyhash_structural():
    a = n.wyhash(b"hello")
    assert a == n.wyhash(b"hello")
    assert a != n.wyhash(b"hellp")
    assert n.wyhash(b"hello", seed=1) != a
    for ln in (0, 1, 3, 4, 16, 17, 48, 49, 100, 1000):
        assert isinstance(n.wyhash(os.urandom(ln)), int)


def test_cli_sum_algorithms(tmp_path, capsys):
    from zpaqfranz_tpu.cli import main
    f = tmp_path / "f.bin"
    f.write_bytes(b"payload-123")
    for algo, want in [
        ("sha1", hashlib.sha1(b"payload-123").hexdigest().upper()),
        ("sha256", hashlib.sha256(b"payload-123").hexdigest().upper()),
        ("md5", hashlib.md5(b"payload-123").hexdigest().upper()),
        ("sha3", n.sha3_256(b"payload-123").hex().upper()),
        ("blake3", n.blake3(b"payload-123").hex().upper()),
        ("xxh3", n.xxh3_128(b"payload-123").hex().upper()),
        ("whirlpool", n.whirlpool(b"payload-123").hex().upper()),
    ]:
        assert main(["sum", str(f), f"-{algo}"]) == 0
        out = capsys.readouterr().out
        assert want in out, (algo, out)
