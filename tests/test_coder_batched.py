"""Batched device coder vs the scalar oracle: bit-exact equivalence."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from zpaqfranz_tpu.codec.container import ByteReader, find_block, read_filename, read_comment
from zpaqfranz_tpu.codec.writer import Encoder as ScalarEncoder, compress_block
from zpaqfranz_tpu.models.predictor import Predictor
from zpaqfranz_tpu.ops.coder_batched import BatchedDecoder, BatchedEncoder
from zpaqfranz_tpu.zpaql.compiler import compile_config

CM_CFG = "comp 1 0 0 0 1  0 cm 12 7  hcomp a<<= 8 *d=a halt post 0 end"

MID8_CFG = """
comp 2 2 0 0 4
  0 icm 5
  1 isse 12 0
  2 match 14 16
  3 mix 8 0 3 24 255
hcomp
  c++ *c=a b=c a=0
  d= 1 hash *d=a
  b-- d++ hash *d=a
  d++ a=*c a<<= 8 *d=a
  halt
post 0 end
"""


def _payloads():
    rng = np.random.default_rng(42)
    return [
        b"abracadabra " * 40,
        bytes(rng.integers(0, 256, 300, dtype=np.uint8)),
        b"the quick brown fox " * 25,
        bytes(200),
    ]


def _coded_streams(payloads, model):
    """Scalar-compress each payload; return the raw coded data bytes."""
    streams = []
    for pl in payloads:
        arc = bytes(compress_block(pl, model))
        r = ByteReader(arc)
        find_block(r)
        read_filename(r)
        read_comment(r)
        streams.append(arc[r.pos:])  # coded data + trailer (extra is unread)
    return streams


def _pad2d(streams):
    n = max(len(s) for s in streams)
    arr = np.zeros((len(streams), n), np.uint8)
    for i, s in enumerate(streams):
        arr[i, : len(s)] = np.frombuffer(s, np.uint8)
    return jnp.asarray(arr)


@pytest.mark.parametrize("cfg", [CM_CFG, MID8_CFG], ids=["cm", "mid8"])
def test_batched_decode_matches_oracle(cfg):
    model, _ = compile_config(cfg)
    payloads = _payloads()
    data = _pad2d(_coded_streams(payloads, model))
    dec = BatchedDecoder(model)
    max_bytes = max(len(p) for p in payloads) + 1  # +1 for the PASS marker
    out, lengths, _ = jax.jit(
        lambda d: dec.decode(d, max_bytes))(data)
    out = np.asarray(out)
    lengths = np.asarray(lengths)
    for i, pl in enumerate(payloads):
        assert lengths[i] == len(pl) + 1, f"lane {i} length"
        got = bytes(out[i, : lengths[i]])
        assert got[0] == 0, "postprocessor selector must be PASS"
        assert got[1:] == pl, f"lane {i} decoded bytes differ"


# encode reuses the predictor (equivalence covered by the decode tests);
# the encoder-specific range/emit/EOS logic is model-independent, so one
# config keeps suite compile time in check.
@pytest.mark.parametrize("cfg", [CM_CFG], ids=["cm"])
def test_batched_encode_matches_oracle(cfg):
    model, _ = compile_config(cfg)
    payloads = _payloads()
    # scalar-oracle coded bytes for each stream (pp marker + payload + EOS)
    expected = []
    for pl in payloads:
        out = bytearray()
        enc = ScalarEncoder(Predictor(model), out)
        enc.compress(0)  # PASS selector
        for b in pl:
            enc.compress(b)
        enc.compress(-1)
        expected.append(bytes(out))
    # batched: lanes carry \x00 + payload
    streams = [b"\x00" + pl for pl in payloads]
    data = _pad2d(streams)
    lengths = jnp.asarray([len(s) for s in streams], jnp.int32)
    benc = BatchedEncoder(model, out_cap=data.shape[1] + 64)
    st = jax.jit(benc.encode)(data, lengths)
    out = np.asarray(st["enc"].out)
    cnt = np.asarray(st["enc"].cnt)
    for i, exp in enumerate(expected):
        got = bytes(out[i, : cnt[i]])
        assert got == exp, (
            f"lane {i}: {len(got)} coded bytes vs {len(exp)} expected")
