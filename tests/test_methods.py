"""Method-string compiler vs the golden archive's embedded -m5 model.

The d block of /root/reference/AUTOTEST/sha256.zpaq carries the reference
makeConfig's output for -m5 (23 components, 170-byte HCOMP). Our generator
must reproduce that model byte-for-byte — COMP entries and HCOMP bytecode —
when given the same method and block size.
"""

import pytest

from zpaqfranz_tpu.codec.container import (
    ByteReader, Decoder, PostProcessor, find_block, read_comment,
    read_filename, read_segment_end,
)
from zpaqfranz_tpu.codec.methods import level_method, make_model, parse_method
from zpaqfranz_tpu.models.predictor import Predictor


@pytest.fixture(scope="module")
def golden_m5_model(golden_bytes):
    r = ByteReader(golden_bytes)
    model = find_block(r)
    read_filename(r)
    read_comment(r)
    pr = Predictor(model)
    dec = Decoder(pr, r)
    pp = PostProcessor(model.ph, model.pm, bytearray())
    while True:
        c = dec.decompress()
        pp.write(c)
        if c == -1:
            break
    read_segment_end(r, dec, False)
    assert read_filename(r) is None
    return find_block(r)  # the d block's model


def test_parse_method():
    cmds = parse_method("x4.3ci1")
    assert cmds[0] == ("x", [4, 3])
    assert cmds[1] == ("c", [])
    assert cmds[2] == ("i", [1])
    cmds = parse_method("x6.0ci1.1.1.1.2aw2mm16tst")
    assert [c[0] for c in cmds] == list("xciawmmtst")
    assert cmds[3][1] == []          # a
    assert cmds[6][1] == [16]        # m16


def test_store_method():
    model, pre = make_model("x4.0")
    assert model is None
    assert pre.transform == 0 and not pre.e8e9


def test_level_presets_compile():
    for lvl in (4, 5):
        model, pre = make_model(str(lvl))
        assert model is not None and model.n > 0
        assert pre.transform == 0


def test_m5_matches_golden_model(golden_m5_model):
    ref = golden_m5_model
    ours, pre = make_model(level_method(5, block_arg=4))
    assert ours.n == ref.n == 23
    for i, (a, b) in enumerate(zip(ours.comps, ref.comps)):
        assert a == b, f"component {i}: ours {list(a)} vs reference {list(b)}"
    assert (ours.hh, ours.hm) == (ref.hh, ref.hm)
    assert ours.hcomp == ref.hcomp, (
        "HCOMP differs: ours %d bytes vs reference %d" %
        (len(ours.hcomp), len(ref.hcomp)))


def test_m4_roundtrips():
    import hashlib
    from zpaqfranz_tpu.codec.writer import compress_block
    from zpaqfranz_tpu.codec.container import decompress_stream
    model, _ = make_model("4")
    data = (b"the quick brown fox jumps over the lazy dog. " * 40)
    arc = compress_block(data, model)
    blocks = decompress_stream(bytes(arc))
    seg, = blocks[0].segments
    assert seg.data == data
    assert seg.sha1 == hashlib.sha1(data).digest()
    assert len(arc) < len(data) // 2
