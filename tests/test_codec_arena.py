"""Arena codec bit-exactness: oracle per-bit parity + host-engine interop.

Three gates, strongest-first:

  1. per-component, per-bit prediction parity with the scalar oracle
     (models/predictor.py, itself validated against the reference golden
     archive) on a synthetic model containing EVERY component type;
  2. decode interop: the arena decoder must reproduce the HOST NATIVE
     engine's coded streams for the real level models (the archive format
     ground truth, cf. reference libzpaq.cpp:1846-2173);
  3. encode interop: the arena encoder must emit byte-identical coded
     streams to the host native engine — host adds and device adds of the
     same tree must produce the same archive bytes.

Levels 0-2 have no context model (store / LZ77-only, n=0) and run on the
host path by design, so the CM parity matrix is levels 3/4/5 (4/5 at the
1 MB-block size so CPU CI compiles in seconds, same component structure).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zpaqfranz_tpu import native
from zpaqfranz_tpu.codec.container import (ByteReader, find_block,
                                           read_comment, read_filename)
from zpaqfranz_tpu.codec.methods import make_model
from zpaqfranz_tpu.models.predictor import Predictor
from zpaqfranz_tpu.ops.codec_arena import ArenaCoder, ArenaDecoder, \
    ArenaEncoder
from zpaqfranz_tpu.zpaql.compiler import compile_config

U32 = jnp.uint32

PAYLOAD = (b"abcabcabc the CAT sat on the mat; it sat and sat. 123\n" * 2)[:100]

ALL_COMPONENTS_CFG = """
comp 9 16 0 0 10
  0 const 160
  1 cm 9 4
  2 icm 5
  3 isse 5 2
  4 match 8 8
  5 avg 3 4 128
  6 mix2 4 5 1 24 255
  7 mix 4 0 6 24 255
  8 sse 5 7 32 255
  9 mix2 4 8 7 24 255
hcomp
  c-- *c=a a+= 255 d=a *d=c
  d= 1 *d=0 b=c a=*b hashd
  d= 2 *d=0 a=*b hashd
  d= 3 b=c a=*d d++ hash *d=a
  d= 4 a=*d a*= 24 a+=*c a++ *d=a
  d= 6 *d=0 b=c a=*b hashd
  d= 7 *d=0 a=c a&= 3 hashd
  d= 8 *d=0 a=*b hashd
  d= 9 *d=0
  halt
post 0 end
"""


def _native_coded(model, payload):
    """Host-native coded segment bytes (selector included) + framing tail."""
    framed = native.compress_block(model, payload, b"t", b"c")
    r = ByteReader(framed, 0)
    find_block(r)
    read_filename(r)
    read_comment(r)
    return bytes(r.data[r.pos:])


def test_every_component_type_matches_oracle_per_bit():
    model, _ = compile_config(ALL_COMPONENTS_CFG)
    data = np.frombuffer(b"abcabcabcab.abcabcab", np.uint8)
    bits = ((data[:, None] >> (7 - np.arange(8))[None, :]) & 1).astype(
        np.uint32)

    pr = Predictor(model)
    oracle = []
    for bi in range(len(data)):
        for phase in range(8):
            pf = pr.predict()
            oracle.append([pr.p[i] for i in range(model.n)] + [pf])
            pr.update(int(bits[bi, phase]))
    oracle = np.array(oracle).reshape(len(data), 8, model.n + 1)

    core = ArenaCoder(model, unroll=True)

    @jax.jit
    def run(bits):
        ast = core.init_state(1)

        def step(ast, bvec):
            core.debug_p = []
            pfs = []

            def coder_step(cst, phase, p_final):
                pfs.append(p_final)
                return jnp.full(1, bvec[phase], U32), cst

            ast, _, _ = core.byte_step(ast, coder_step, None)
            tr = jnp.stack(core.debug_p, 0)
            return ast, jnp.concatenate(
                [tr, jnp.stack(pfs, 0).astype(jnp.int32)[:, :, None]], 2)

        return jax.lax.scan(step, ast, jnp.asarray(bits))[1]

    arena = np.asarray(run(bits))[:, :, 0, :]
    np.testing.assert_array_equal(oracle, arena)


def _stream_prefix(model):
    """Postprocessor selector the host writer codes before the payload."""
    blob = model.pcomp_bytes()
    return (b"\x01" + blob) if blob else b"\x00"


@pytest.mark.parametrize("method", ["3", "4.0"])
def test_arena_interop_with_host_engine(method):
    model, _ = make_model(method)
    coded = _native_coded(model, PAYLOAD)
    want = _stream_prefix(model) + PAYLOAD

    # decode the host-coded stream (2 lanes: stream + its copy, exercising
    # the lane axis)
    dd = np.broadcast_to(np.frombuffer(coded, np.uint8), (2, len(coded)))
    out, lens, _ = jax.jit(
        lambda d: ArenaDecoder(model).decode(d, len(want) + 8)
    )(jnp.asarray(dd))
    out, lens = np.asarray(out), np.asarray(lens)
    for lane in range(2):
        assert bytes(out[lane, : lens[lane]]) == want

    # encode must match the host stream byte-for-byte (the 6-byte delta is
    # the segment framing tail 0,0,0,0 + 254 + 255 the host writer appends)
    st = jax.jit(ArenaEncoder(model, out_cap=4 * len(want)).encode)(
        jnp.asarray(np.frombuffer(want, np.uint8)[None, :]),
        jnp.asarray(np.array([len(want)], np.int32)))
    cnt = int(np.asarray(st["cnt"])[0])
    enc = bytes(np.asarray(st["out"])[0, :cnt])
    assert enc == coded[:cnt]
    assert len(coded) - cnt == 6


def test_arena_interop_m5():
    model, _ = make_model("5.0")
    coded = _native_coded(model, PAYLOAD)
    want = _stream_prefix(model) + PAYLOAD
    dd = np.frombuffer(coded, np.uint8)[None, :]
    out, lens, _ = jax.jit(
        lambda d: ArenaDecoder(model).decode(d, len(want) + 8)
    )(jnp.asarray(dd))
    assert bytes(np.asarray(out)[0, : int(np.asarray(lens)[0])]) == want
    st = jax.jit(ArenaEncoder(model, out_cap=4 * len(want)).encode)(
        jnp.asarray(np.frombuffer(want, np.uint8)[None, :]),
        jnp.asarray(np.array([len(want)], np.int32)))
    cnt = int(np.asarray(st["cnt"])[0])
    assert bytes(np.asarray(st["out"])[0, :cnt]) == coded[:cnt]
    assert len(coded) - cnt == 6


def test_arena_mixed_lane_lengths_roundtrip():
    """Lanes freeze at different lengths; frozen-lane garbage must never
    corrupt live lanes (the no-masking design contract)."""
    model, _ = make_model("3")
    rng = np.random.default_rng(3)
    L, N = 4, 90
    data = rng.integers(0, 256, (L, N)).astype(np.uint8)
    data[1, :] = 65
    lengths = np.array([N, 11, 60, 1], np.int32)
    payloads = [b"\x00" + bytes(data[i, : lengths[i]]) for i in range(L)]
    plens = np.array([len(p) for p in payloads], np.int32)
    pdata = np.zeros((L, max(plens)), np.uint8)
    for i, p in enumerate(payloads):
        pdata[i, : len(p)] = np.frombuffer(p, np.uint8)

    st = jax.jit(ArenaEncoder(model, out_cap=2 * N + 64).encode)(
        jnp.asarray(pdata), jnp.asarray(plens))
    outs = np.asarray(st["out"])
    cnts = np.asarray(st["cnt"])
    streams = [bytes(outs[i, : cnts[i]]) for i in range(L)]
    dd = np.zeros((L, max(len(s) for s in streams)), np.uint8)
    for i, s in enumerate(streams):
        dd[i, : len(s)] = np.frombuffer(s, np.uint8)
    out, lens, _ = jax.jit(
        lambda d: ArenaDecoder(model).decode(d, N + 8))(jnp.asarray(dd))
    out, lens = np.asarray(out), np.asarray(lens)
    for i in range(L):
        assert lens[i] == plens[i]
        assert bytes(out[i, : lens[i]]) == payloads[i]
