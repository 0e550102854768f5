"""Batched device hash kernels vs host oracles (hashlib / native CRC)."""

import hashlib
import os

import numpy as np
import pytest

from zpaqfranz_tpu import native
from zpaqfranz_tpu.ops import hash_batched as hb


def _mixed_lanes():
    rng = __import__("random").Random(42)
    chunks = [b"", b"a", b"abc", bytes(range(256)),
              os.urandom(55), os.urandom(56), os.urandom(63),
              os.urandom(64), os.urandom(65), os.urandom(119),
              os.urandom(120), os.urandom(1000), os.urandom(4096),
              bytes(rng.randrange(256) for _ in range(777))]
    return chunks


def test_sha1_lanes_match_hashlib():
    chunks = _mixed_lanes()
    data, lens = hb.pad_lanes(chunks)
    got = hb.digest_bytes(hb.sha1_lanes(data, lens))
    for c, g in zip(chunks, got):
        assert g == hashlib.sha1(c).digest(), len(c)


def test_sha256_lanes_match_hashlib():
    chunks = _mixed_lanes()
    data, lens = hb.pad_lanes(chunks)
    got = hb.digest_bytes(hb.sha256_lanes(data, lens))
    for c, g in zip(chunks, got):
        assert g == hashlib.sha256(c).digest(), len(c)


def test_crc32_lanes_match_native():
    chunks = _mixed_lanes()
    data, lens = hb.pad_lanes(chunks)
    got = np.asarray(hb.crc32_lanes(data, lens))
    for c, g in zip(chunks, got):
        assert int(g) == native.crc32(c), len(c)


def test_lanes_are_independent():
    # same payload in two lanes must give identical digests regardless of
    # what other lanes contain
    a = os.urandom(200)
    data, lens = hb.pad_lanes([a, os.urandom(500), a])
    d = hb.digest_bytes(hb.sha1_lanes(data, lens))
    assert d[0] == d[2] == hashlib.sha1(a).digest()
