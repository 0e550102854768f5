"""Batched SIMT ZPAQL VM vs the scalar oracle VM."""

import numpy as np
import pytest

from zpaqfranz_tpu.zpaql.compiler import compile_config
from zpaqfranz_tpu.zpaql.vm import VM
from zpaqfranz_tpu.ops.vm_batched import BatchedVM, init_vm_state

MID_CFG = """
comp 3 3 0 0 8
  0 icm 5
  1 isse 13 0
  2 isse 17 1
  3 isse 18 2
  4 isse 18 3
  5 isse 19 4
  6 match 22 24
  7 mix 16 0 7 24 255
hcomp
  c++ *c=a b=c a=0
  d= 1 hash *d=a
  b-- d++ hash *d=a
  b-- d++ hash *d=a
  b-- d++ hash *d=a
  b-- d++ hash *d=a
  b-- d++ hash b-- hash *d=a
  d++ a=*c a<<= 8 *d=a
  halt
post 0 end
"""

# exercises jumps, loops, R registers, division, swaps, comparisons
LOOPY_CFG = """
comp 2 2 0 0 1
  0 cm 12 7
hcomp
  r=a 0
  b=0 c=0
  do
    a=r 0 a%= 7 *b=a
    a=b a+= 1 b=a
    a< 3 while
  a=r 0 a> 100 if
    a/= 3 d= 0 *d=a
  else
    a*= 5 d= 1 *d=a
  endif
  b=0 a=*b b<>a
  halt
post 0 end
"""


def _run_pair(cfg, inputs):
    import jax
    import jax.numpy as jnp
    model, _ = compile_config(cfg)
    L = len(inputs)
    bvm = BatchedVM(model.hcomp, model.hh, model.hm)
    bst = init_vm_state(L, model.hh, model.hm)
    oracles = [VM.for_hcomp(model) for _ in range(L)]
    run = jax.jit(bvm.run)
    for step_inputs in inputs_T(inputs):
        bst = run(bst, jnp.asarray(step_inputs, jnp.uint32))
        for vm, x in zip(oracles, step_inputs):
            vm.run(int(x))
    assert not bool(np.asarray(bst.err).any()), "batched VM flagged an error"
    for lane, vm in enumerate(oracles):
        np.testing.assert_array_equal(np.asarray(bst.h[lane]), vm.h,
                                      err_msg=f"H mismatch lane {lane}")
        np.testing.assert_array_equal(np.asarray(bst.m[lane]), vm.m,
                                      err_msg=f"M mismatch lane {lane}")
        np.testing.assert_array_equal(np.asarray(bst.r[lane]), vm.r)
        for reg in "abcd":
            assert int(getattr(bst, reg)[lane]) == getattr(vm, reg), (
                f"reg {reg} lane {lane}")


def inputs_T(inputs):
    """[(lane0 seq), (lane1 seq), ...] -> per-step tuples."""
    return list(zip(*inputs))


def test_mid_hcomp_matches_oracle():
    rng = np.random.default_rng(1)
    inputs = [tuple(int(x) for x in rng.integers(0, 256, 40)) for _ in range(5)]
    _run_pair(MID_CFG, inputs)


def test_loopy_program_matches_oracle():
    rng = np.random.default_rng(2)
    inputs = [tuple(int(x) for x in rng.integers(0, 256, 30)) for _ in range(6)]
    _run_pair(LOOPY_CFG, inputs)


def test_divergent_lanes():
    # lanes take different branches / loop counts in the same step
    inputs = [(0,), (255,), (101,), (7,), (3,), (200,)]
    _run_pair(LOOPY_CFG, inputs)
