"""Mesh-sharded coding: device-count invariance of archive bytes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from zpaqfranz_tpu.codec.methods import make_model
from zpaqfranz_tpu.parallel.dist import (
    decode_streams_sharded, default_mesh, encode_streams_sharded)
from zpaqfranz_tpu.parallel.engine import device_coder

_METHOD = "x4.0ci1"


def _payloads():
    return [b"\x00" + (b"shard me over the mesh %d " % i) * 30
            for i in range(6)]


def test_mesh_has_8_cpu_devices():
    assert len(jax.devices()) == 8


def test_sharded_encode_matches_single_device():
    """The BASELINE determinism gate: same coded bytes regardless of the
    number of devices the lanes are sharded over."""
    model, _ = make_model(_METHOD)
    payloads = _payloads()
    single = device_coder().encode_streams(model, payloads)
    mesh = default_mesh(8)
    sharded = encode_streams_sharded(model, payloads, mesh)
    assert sharded == single


def test_sharded_decode_roundtrip():
    model, _ = make_model(_METHOD)
    payloads = _payloads()
    coded = device_coder().encode_streams(model, payloads)
    mesh = default_mesh(8)
    decoded = decode_streams_sharded(
        model, coded, max(len(p) for p in payloads) + 8, mesh)
    for d, p in zip(decoded, payloads):
        assert d == p
