"""ZPAQL config files as CLI methods (reference power-user config language,
libzpaq.h:475-716): ``-method path.cfg,arg1,...`` compiles the config with
$1..$9 substitution and uses it as the block model."""

import os
import pathlib

import pytest

from zpaqfranz_tpu import native
from zpaqfranz_tpu.codec.methods import MethodError, make_model

_CFG = """
comp 2 2 0 0 2
  0 icm $1+16
  1 isse 19 0
hcomp
  *b=a b++ (save byte in M)
  a=0 d= 0 hash *d=a
  d= 1 b-- hash b-- hash *d=a
  halt
end
"""


def test_config_method_roundtrip(tmp_path):
    os.chdir(tmp_path)
    pathlib.Path("o1.cfg").write_text(_CFG)
    model, pre = make_model("o1.cfg,2")
    assert model.n == 2
    data = b"config file methods round trip " * 2000
    blk = native.compress_block(model, data, b"f", b"c")
    segs = native.decompress_stream(blk)
    assert b"".join(s.data for s in segs[0]) == data


def test_config_method_through_jidac(tmp_path):
    os.chdir(tmp_path)
    pathlib.Path("o1.cfg").write_text(_CFG)
    (tmp_path / "tree").mkdir()
    data = b"jidac with a config-file method " * 2000
    (tmp_path / "tree" / "x.txt").write_bytes(data)
    from zpaqfranz_tpu.jidac.add import add
    from zpaqfranz_tpu.jidac.extract import extract
    from zpaqfranz_tpu.jidac.index import read_archive
    add("c.zpaq", ["tree"], method="o1.cfg,2", date=20260102030405)
    raw = (tmp_path / "c.zpaq").read_bytes()
    jd = read_archive(raw)
    extract(raw, jd, "out")
    assert (tmp_path / "out" / "tree" / "x.txt").read_bytes() == data


def test_config_with_external_pcomp_refused(tmp_path):
    os.chdir(tmp_path)
    pathlib.Path("ext.cfg").write_text("""
comp 0 0 0 0 1
  0 cm 11 4
hcomp
  halt
pcomp ./mypre c ;
  a> 255 if halt endif out halt
end
""")
    with pytest.raises(MethodError):
        make_model("ext.cfg")


def test_non_config_methods_unaffected(tmp_path):
    os.chdir(tmp_path)
    model, pre = make_model("1")
    assert pre.transform == 1
    with pytest.raises(MethodError):
        make_model("missing_file.cfg")
