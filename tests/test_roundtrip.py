"""Encode → decode round-trip tests for the scalar oracle codec."""

import hashlib
import os
import random

import pytest

from zpaqfranz_tpu.codec.container import (
    ByteReader, decompress_stream, find_block,
)
from zpaqfranz_tpu.codec.writer import compress_block
from zpaqfranz_tpu.zpaql.compiler import compile_config
from zpaqfranz_tpu.zpaql.header import Model

# mid-level context-mixing config in the public ZPAQL config language
# (structure follows the spec examples, /root/reference/ZSFX/libzpaq.h:594-683).
MID_CFG = """
comp 3 3 0 0 8 (hh hm ph pm n)
  0 icm 5
  1 isse 13 0
  2 isse 17 1
  3 isse 18 2
  4 isse 18 3
  5 isse 19 4
  6 match 22 24
  7 mix 16 0 7 24 255
hcomp
  c++ *c=a b=c a=0 (save byte in rotating buffer M[c])
  d= 1 hash *d=a (order 1 context hash -> H[1])
  b-- d++ hash *d=a (order 2)
  b-- d++ hash *d=a (order 3)
  b-- d++ hash *d=a (order 4)
  b-- d++ hash *d=a (order 5)
  b-- d++ hash b-- hash *d=a (order 7 for match)
  d++ a=*c a<<= 8 *d=a (order 1 select mix weights)
  halt
post 0 end
"""


def _mixed_payload(n=20000, seed=7):
    rng = random.Random(seed)
    parts = [
        b"the quick brown fox jumps over the lazy dog. " * (n // 200),
        bytes(rng.randrange(256) for _ in range(n // 10)),
        bytes(n // 10),  # zeros
    ]
    return b"".join(parts)[:n]


def _roundtrip(data, model):
    arc = compress_block(data, model)
    blocks = decompress_stream(bytes(arc))
    assert len(blocks) == 1
    seg, = blocks[0].segments
    assert seg.data == data
    assert seg.sha1 == hashlib.sha1(data).digest()
    return arc


def test_store_roundtrip():
    data = _mixed_payload(5000)
    model = Model(hh=0, hm=0)  # n=0: unmodeled passthrough
    arc = _roundtrip(data, model)
    assert len(arc) > len(data)  # store adds framing


def test_store_empty_segment():
    _roundtrip(b"", Model(hh=0, hm=0))


def test_cm_order0_roundtrip():
    model, _ = compile_config(
        "comp 0 0 0 0 1  0 cm 16 12  hcomp halt post 0 end")
    data = b"abracadabra " * 400
    arc = _roundtrip(data, model)
    assert len(arc) < len(data)  # order-0 CM compresses repeated text


def test_mid_roundtrip_compresses():
    model, _ = compile_config(MID_CFG)
    data = _mixed_payload(30000)
    arc = _roundtrip(data, model)
    assert len(arc) < len(data) * 0.8


def test_multi_segment_block():
    from zpaqfranz_tpu.codec.writer import BlockWriter
    from zpaqfranz_tpu.codec.container import decompress_block
    model, _ = compile_config(
        "comp 1 0 0 0 1  0 cm 12 7  hcomp a<<= 8 *d=a halt post 0 end")
    out = bytearray()
    w = BlockWriter(out, model)
    w.write_tag()
    w.start_block()
    for i, payload in enumerate([b"first segment ", b"second " * 100, b""]):
        w.start_segment(b"seg%d" % i, b"c%d" % i)
        w.compress_checked(payload)
        w.end_segment()
    w.end_block()
    r = ByteReader(bytes(out))
    model2 = find_block(r)
    assert model2.header_bytes() == model.header_bytes()
    res = decompress_block(r, model2)
    assert [s.data for s in res.segments] == [b"first segment ", b"second " * 100, b""]
    assert [s.filename for s in res.segments] == [b"seg0", b"seg1", b"seg2"]
