from zpaqfranz_tpu.zpaql.compiler import compile_config
from zpaqfranz_tpu.zpaql.header import Model
from zpaqfranz_tpu.zpaql.vm import VM

# The "min.cfg" example from the ZPAQ spec (libzpaq.h:482-493): an order-2
# ICM followed by an order-4 ISSE.
MIN_CFG = """
(min.cfg - equivalent to level 1)
comp 1 2 0 0 2 (hh hm ph pm n)
  0 icm 16    (order 2 indirect context model using 4 MB memory)
  1 isse 19 0 (order 4 indirect secondary symbol estimator, 32 MB)
hcomp (context computation, input is last modeled byte in A)
  *b=a a=0 (save in rotating buffer M pointed to by B)
  d=0 hash b-- hash *d=a (put order 2 context hash in H[0] pointed by D)
  d++ b-- hash b-- hash *d=a (put order 4 context in H[1])
  halt
end
"""


def test_compile_min_cfg():
    model, cmd = compile_config(MIN_CFG)
    assert model.n == 2
    assert model.comps[0] == bytes([3, 16])        # icm 16
    assert model.comps[1] == bytes([8, 19, 0])     # isse 19 0
    assert model.hh == 1 and model.hm == 2
    assert model.pcomp is None
    # round-trip through serialization
    blob = model.header_bytes()
    back, used = Model.parse(blob)
    assert used == len(blob)
    assert back.comps == model.comps
    assert back.hcomp == model.hcomp


def test_vm_hcomp_contexts():
    model, _ = compile_config(MIN_CFG)
    vm = VM.for_hcomp(model)
    for byte in b"abcd":
        vm.run(byte)
    # M is a rotating 4-byte buffer of the last bytes; B decrements from 0
    assert sorted(vm.m.tolist()) == sorted(b"abcd")
    # H holds the two context hashes; both must be nonzero after 4 bytes
    assert int(vm.h[0]) != 0 and int(vm.h[1]) != 0


def test_structured_control_flow():
    src = """
    comp 0 0 0 0 0
    hcomp
      a> 255 if a=0 else a++ endif
      b=0
      do a++ a< 10 while
      halt
    end
    """
    model, _ = compile_config(src)
    vm = VM.for_hcomp(model)
    vm.run(3)  # a=3 -> not >255 -> a++ -> 4, then loop to 10
    assert vm.a == 10
    vm2 = VM.for_hcomp(model)
    vm2.run(0xFFFFFFFF)  # >255 -> a=0, then loop to 10
    assert vm2.a == 10


def test_long_jumps():
    # force an IFL with a body > 127 bytes
    body = "a++ " * 100
    src = f"comp 0 0 0 0 0 hcomp a> 5 ifl {body} endif halt end"
    model, _ = compile_config(src)
    vm = VM.for_hcomp(model)
    vm.run(6)
    assert vm.a == 106
    vm2 = VM.for_hcomp(model)
    vm2.run(5)
    assert vm2.a == 5
