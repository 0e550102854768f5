"""hcomp_fast specializer vs the SIMT VM: bit-exact H trajectories.

The specializer (ops/hcomp_fast.py) turns HCOMP bytecode into straight-line
elementwise JAX at trace time; the SIMT VM (ops/vm_batched.py) is the
validated generic interpreter.  Both must produce identical per-byte context
arrays H[0..n-1] for the standard level models — including the word-model
if/else (level 4/5) which the specializer compiles to predicated selects.
Reference semantics: /root/reference/ZSFX/libzpaq.cpp:1033-1254.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zpaqfranz_tpu.codec.methods import make_model
from zpaqfranz_tpu.ops.hcomp_fast import try_compile
from zpaqfranz_tpu.ops.vm_batched import BatchedVM, init_vm_state

U32 = jnp.uint32


def _run_pair(model, data):
    L = data.shape[0]
    fh = try_compile(model)
    assert fh is not None, "specializer bailed on a standard model"
    vm = BatchedVM(model.hcomp, model.hh, model.hm)

    @jax.jit
    def run_vm(data):
        vst = init_vm_state(L, model.hh, model.hm)

        def step(vst, b):
            vst = vm.run(vst, b)
            return vst, vst.h[:, : model.n]

        return jax.lax.scan(step, vst, data.T)[1]

    @jax.jit
    def run_fh(data):
        fst = fh.init_state(L)

        def step(fst, b):
            fst = fh.run(fst, b)
            return fst, fst["hn"]

        return jax.lax.scan(step, fst, data.T)[1]

    hv = np.asarray(run_vm(jnp.asarray(data, dtype=np.uint32)))
    hf = np.asarray(run_fh(jnp.asarray(data, dtype=np.uint32)))
    np.testing.assert_array_equal(hv, hf)


@pytest.mark.parametrize("level", ["3", "4", "5"])
def test_specializer_matches_vm(level):
    model, _ = make_model(level)
    rng = np.random.default_rng(7)
    L, N = 4, 160
    data = rng.integers(0, 256, (L, N)).astype(np.uint32)
    # text lane exercises the word-model branch both ways
    data[1] = np.frombuffer(
        (b"The quick brown fox JUMPS over 123 lazy dogs?! " * 4)[:N],
        np.uint8)
    # constant lane (long word) keeps the word hash rolling
    data[2, :] = ord("Q")
    _run_pair(model, data)


def test_specializer_bails_on_loops():
    """A backward jump (do/until) must fall back to the VM, not miscompile."""
    from zpaqfranz_tpu.zpaql.compiler import compile_config

    cfg = """
comp 9 16 0 0 1
  0 icm 5
hcomp
  c-- *c=a a+= 255 d=a *d=c
  a= 3 do a-- a> 0 while
  d= 0 *d=0
  halt
post 0 end
"""
    model, _ = compile_config(cfg)
    assert try_compile(model) is None
