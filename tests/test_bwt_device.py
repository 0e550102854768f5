"""Device (prefix-doubling) BWT vs the native SA-IS engine.

The two must agree byte-for-byte: the suffix array of a string with an
implicit unique sentinel is unique, and the stream layout is fixed by the
inverse-BWT ZPAQL postprocessor (native/src/tzpaq.cpp tz_bwt_encode)."""

import numpy as np
import pytest

from zpaqfranz_tpu import native
from zpaqfranz_tpu.pre.bwt_device import (bwt_encode_device,
                                          suffix_array_device)


@pytest.mark.parametrize("data", [
    b"", b"a", b"banana", b"abracadabra", b"aaaaaaaa",
    bytes(range(256)), b"mississippi" * 10,
])
def test_bwt_matches_native(data):
    assert bwt_encode_device(data) == native.bwt_encode(data)


def test_bwt_random_and_repetitive():
    rng = np.random.default_rng(11)
    rnd = rng.integers(0, 256, 4096, dtype=np.uint8).tobytes()
    rep = (b"the quick brown fox " * 300)[:4000]
    for data in (rnd, rep, rnd + rep):
        assert bwt_encode_device(data) == native.bwt_encode(data)


def test_suffix_array_is_sorted():
    data = b"mississippi"
    sa = suffix_array_device(data)
    suf = [data[i:] for i in sa]
    assert suf == sorted(suf)
    assert sorted(sa.tolist()) == list(range(len(data)))


def test_bwt_roundtrips_through_postprocessor():
    # device-produced stream must invert through the same PCOMP path the
    # archive uses (host postprocessor oracle)
    data = (b"compressible text with patterns " * 50)[:1500]
    stream = bwt_encode_device(data)
    inv = native.bwt_decode(stream) if hasattr(native, "bwt_decode") else None
    if inv is not None:
        assert inv == data
