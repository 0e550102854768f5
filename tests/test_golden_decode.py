"""Decode checks against the reference golden archive (AUTOTEST/sha256.zpaq).

The golden fixture is a jidac journaling archive made by the reference with
-m5 (256 files whose names are the SHA-256 of their contents).  Decoding it
bit-exactly validates the whole decode stack: container framing, ZPAQL VM,
all predictor components, and the arithmetic decoder.

The scalar oracle is slow, so here we decode only the c block fully plus a
prefix of the -m5 d block; the native engine test decodes everything.
"""

import hashlib

import pytest

from zpaqfranz_tpu.codec.container import (
    ByteReader, Decoder, PostProcessor, find_block, read_comment, read_filename,
)
from zpaqfranz_tpu.models.predictor import Predictor


def _next_block(r):
    m = find_block(r)
    assert m is not None
    name = read_filename(r)
    comment = read_comment(r)
    return m, name, comment


def test_c_block(golden_bytes):
    r = ByteReader(golden_bytes)
    model, name, comment = _next_block(r)
    assert name.startswith(b"jDC") and name[17:18] == b"c"
    assert comment.endswith(b" jDC\x01")
    assert model.n == 0  # store mode
    pr = Predictor(model)
    dec = Decoder(pr, r)
    out = bytearray()
    pp = PostProcessor(model.ph, model.pm, out)
    while True:
        c = dec.decompress()
        pp.write(c)
        if c == -1:
            break
    assert len(out) == 8
    csize = int.from_bytes(bytes(out), "little")
    assert 0 < csize < len(golden_bytes)


def test_d_block_prefix(golden_bytes):
    r = ByteReader(golden_bytes)
    _next_block(r)  # skip c block header...
    # ... and its stored data: decode it (9 bytes) to advance the stream
    m0, = [None]
    r2 = ByteReader(golden_bytes)
    model, name, comment = _next_block(r2)
    pr = Predictor(model)
    dec = Decoder(pr, r2)
    pp = PostProcessor(model.ph, model.pm, bytearray())
    while True:
        c = dec.decompress()
        pp.write(c)
        if c == -1:
            break
    from zpaqfranz_tpu.codec.container import read_segment_end
    read_segment_end(r2, dec, False)
    assert read_filename(r2) is None  # end of c block
    # now the d block: full -m5 context-mixing model
    model, name, comment = _next_block(r2)
    assert name[17:18] == b"d"
    assert model.n == 23  # the -m5 component chain
    pr = Predictor(model)
    dec = Decoder(pr, r2)
    out = bytearray()
    pp = PostProcessor(model.ph, model.pm, out)
    for _ in range(201):
        c = dec.decompress()
        pp.write(c)
        assert c != -1
    # 200 decoded bytes of the first fragment (after the 1-byte PASS marker).
    # Pin them: if any component's integer math drifts, this changes.
    assert len(out) == 200
    assert hashlib.sha256(bytes(out)).hexdigest() == (
        _D_PREFIX_SHA256
    )


# sha256 of the first 200 postprocessed bytes of the first d block, computed
# once with this oracle and cross-checked against the native engine's decode
# of the complete archive (fragment hashes verify the full content).
_D_PREFIX_SHA256 = None  # filled in below


def _compute_expected():
    return "64562ffce758a06ce99b8416e19256b02af7f27ef33bb2cb06c65ea2525318a5"


_D_PREFIX_SHA256 = _compute_expected()


def test_reference_zsfx_archives_decode():
    """The reference repo's own zsfx stub archives (made by zpaq/zpaqfranz,
    -m2-class methods with E8E9 on PE executables) must decode, and their
    stored segment SHA-1s must verify."""
    import hashlib
    import pathlib
    from zpaqfranz_tpu import native
    for name, want in (("zsfx.zpaq", 321024), ("zsfx32.zpaq", 223744)):
        p = pathlib.Path("/root/reference/ZSFX") / name
        if not p.exists():
            import pytest
            pytest.skip("reference snapshot not available")
        blocks = native.decompress_stream(p.read_bytes())
        total = 0
        for b in blocks:
            for s in b:
                total += len(s.data)
                if s.sha1:
                    assert hashlib.sha1(s.data).digest() == s.sha1
        assert total == want
