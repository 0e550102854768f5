"""The two table-write strategies (serialized scatter vs vectorized
where-pass) must be bit-identical; TPU uses the where-pass for small
tables (see ops.predictor_batched._use_where)."""

import numpy as np
import pytest

import jax.numpy as jnp

from zpaqfranz_tpu.ops import predictor_batched as pb


@pytest.fixture
def force(monkeypatch):
    def _force(mode):
        monkeypatch.setenv("ZPAQFRANZ_SCATTER", mode)
    return _force


def _mk(L=8, S=64, dtype=np.uint32):
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.integers(0, 250, (L, S)).astype(dtype))
    idx = jnp.asarray(rng.integers(0, S, (L,)).astype(np.int32))
    val = jnp.asarray(rng.integers(0, 250, (L,)).astype(dtype))
    active = jnp.asarray(rng.integers(0, 2, (L,)).astype(bool))
    return tab, idx, val, active


def test_scatter1_modes_agree(force):
    tab, idx, val, active = _mk()
    force("at")
    a = np.asarray(pb._scatter1(tab, idx, val, active))
    force("where")
    b = np.asarray(pb._scatter1(tab, idx, val, active))
    assert (a == b).all()
    # inactive lanes untouched, active lanes updated
    for l in range(tab.shape[0]):
        want = np.asarray(tab[l]).copy()
        if active[l]:
            want[int(idx[l])] = int(val[l])
        assert (a[l] == want).all()


def test_scatter_pair_modes_agree(force):
    tab, idx, v0, active = _mk(S=64)
    idx2 = (idx // 2) * 2
    v1 = v0 + 1
    force("at")
    a = np.asarray(pb._scatter_pair(tab, idx2, v0, v1, active))
    force("where")
    b = np.asarray(pb._scatter_pair(tab, idx2, v0, v1, active))
    assert (a == b).all()
    l = int(np.argmax(np.asarray(active)))
    if active[l]:
        assert a[l, int(idx2[l])] == int(v0[l])
        assert a[l, int(idx2[l]) + 1] == int(v1[l])


@pytest.mark.parametrize("W", [4, 7, 16])
def test_scatter_row_modes_agree(force, W):
    L, S = 8, 16 * W
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.integers(0, 250, (L, S)).astype(np.uint32))
    base = jnp.asarray((rng.integers(0, S // W, (L,)) * W).astype(np.int32))
    row = jnp.asarray(rng.integers(0, 250, (L, W)).astype(np.uint32))
    active = jnp.asarray(rng.integers(0, 2, (L,)).astype(bool))
    force("at")
    a = np.asarray(pb._scatter_row(tab, base, row, active))
    force("where")
    b = np.asarray(pb._scatter_row(tab, base, row, active))
    assert (a == b).all()
    for l in range(L):
        want = np.asarray(tab[l]).copy()
        if active[l]:
            want[int(base[l]):int(base[l]) + W] = np.asarray(row[l])
        assert (a[l] == want).all()


def test_batched_encode_where_mode_matches_at(force):
    """A short end-to-end encode must emit identical bytes under both
    strategies (the TPU path's correctness anchor)."""
    from zpaqfranz_tpu.zpaql.compiler import compile_config
    from zpaqfranz_tpu.ops.coder_batched import BatchedEncoder
    import jax

    CFG = """
comp 1 1 0 0 2
  0 icm 3
  1 isse 4 0
hcomp
  c++ *c=a b=c a=0
  d= 0 hash *d=a
  d++ hash *d=a
  halt
post 0 end
"""
    model, _ = compile_config(CFG)
    rng = np.random.default_rng(3)
    L, N = 4, 24
    data = np.zeros((L, N + 1), np.uint8)
    data[:, 1:] = rng.integers(0, 256, (L, N))
    outs = {}
    for mode in ("at", "where"):
        force(mode)
        enc = BatchedEncoder(model, out_cap=64)
        st = jax.jit(enc.encode)(jnp.asarray(data),
                                 jnp.full((L,), N + 1, jnp.int32))
        out = np.asarray(st["enc"].out)
        cnt = np.asarray(st["enc"].cnt)
        outs[mode] = [bytes(out[i, :cnt[i]]) for i in range(L)]
        jax.clear_caches()   # strategy is baked in at trace time
    assert outs["at"] == outs["where"]
