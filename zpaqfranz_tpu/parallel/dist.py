"""Multi-chip/multi-host distribution: lanes over the device mesh.

The archiver's scaling model (SURVEY.md section 2.8): blocks are the unit of
parallelism — lanes of the batched coder shard over the mesh's 'dp' axis
(data parallel over blocks), with the big per-lane model tables optionally
sharding their size axis over 'tp'. Encode/decode inner loops are
collective-free by construction (block independence is a format guarantee,
reference libzpaq.h:57-59); the only cross-device movement is the initial
scatter of lane data and the final gather of coded bytes — the TPU analog of
the reference's single write-mutex ordered gather (zsfx.cpp:1711).

Determinism gate (BASELINE.md): the archive bytes must not depend on the
device count. ``test_dist.py`` pins sharded output == single-device output.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..zpaql.header import Model


def default_mesh(n_devices: Optional[int] = None):
    """Build a (dp, tp) mesh over the available devices."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.array(devs[:n])
    if n >= 4 and n % 2 == 0:
        shape = (n // 2, 2)
    else:
        shape = (n, 1)
    return Mesh(devs.reshape(shape), ("dp", "tp"))


def shard_state_spec(mesh, x):
    """PartitionSpec for one state leaf: lanes over dp; large table size
    axes additionally over tp."""
    from jax.sharding import PartitionSpec as P

    dp, tp = mesh.shape["dp"], mesh.shape["tp"]
    if x.ndim == 0 or x.shape[0] % dp != 0:
        return P()
    if x.ndim >= 2 and x.shape[1] >= 4096 and x.shape[1] % tp == 0:
        return P("dp", "tp")
    return P("dp")


def encode_streams_sharded(model: Model, payloads: Sequence[bytes],
                           mesh=None) -> List[bytes]:
    """Batched encode with lanes sharded over the mesh.

    Produces byte-identical output to the single-device path (the coder is
    deterministic integer math; sharding only partitions the lane axis)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .engine import _bucket, _engine_name

    mesh = mesh or default_mesh()
    dp = mesh.shape["dp"]
    L = max(_bucket(len(payloads)), dp)
    if L % dp:
        L = ((L + dp - 1) // dp) * dp
    maxlen = _bucket(max(len(p) for p in payloads) + 1)
    data = np.zeros((L, maxlen), np.uint8)
    lengths = np.zeros(L, np.int32)
    for i, p in enumerate(payloads):
        data[i, : len(p)] = np.frombuffer(p, np.uint8)
        lengths[i] = len(p)
    cap = maxlen + maxlen // 2 + 64
    if _engine_name() == "batched":
        from ..ops.coder_batched import BatchedEncoder
        enc = BatchedEncoder(model, out_cap=cap)
        run = lambda d, n: (lambda st: (st["enc"].out, st["enc"].cnt)
                            )(enc.encode(d, n))
    else:
        from ..ops.codec_arena import ArenaEncoder
        enc = ArenaEncoder(model, out_cap=cap)
        run = lambda d, n: (lambda st: (st["out"], st["cnt"])
                            )(enc.encode(d, n))

    data_j = jax.device_put(jnp.asarray(data),
                            NamedSharding(mesh, P("dp", None)))
    len_j = jax.device_put(jnp.asarray(lengths), NamedSharding(mesh, P("dp")))

    with mesh:
        out, cnt = jax.jit(run)(data_j, len_j)
    out = np.asarray(out)
    cnt = np.asarray(cnt)
    return [bytes(out[i, : cnt[i]]) for i in range(len(payloads))]


def decode_streams_sharded(model: Model, streams: Sequence[bytes],
                           max_out: int, mesh=None) -> List[bytes]:
    """Batched decode with lanes sharded over the mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .engine import _bucket, _engine_name

    mesh = mesh or default_mesh()
    dp = mesh.shape["dp"]
    L = max(_bucket(len(streams)), dp)
    if L % dp:
        L = ((L + dp - 1) // dp) * dp
    maxlen = _bucket(max(len(s) for s in streams))
    data = np.zeros((L, maxlen), np.uint8)
    for i, s in enumerate(streams):
        data[i, : len(s)] = np.frombuffer(s, np.uint8)
    if _engine_name() == "batched":
        from ..ops.coder_batched import BatchedDecoder
        dec = BatchedDecoder(model)
    else:
        from ..ops.codec_arena import ArenaDecoder
        dec = ArenaDecoder(model)
    data_j = jax.device_put(jnp.asarray(data),
                            NamedSharding(mesh, P("dp", None)))
    with mesh:
        out, lengths, _ = jax.jit(
            lambda d: dec.decode(d, _bucket(max_out)))(data_j)
    out = np.asarray(out)
    lengths = np.asarray(lengths)
    return [bytes(out[i, : int(lengths[i])]) for i in range(len(streams))]


def decode_streams_sharded_chunked(model: Model, streams: Sequence[bytes],
                                   max_out: int, mesh=None,
                                   chunk: int = 64) -> List[bytes]:
    """Chunked sharded decode: the SAME init_state/run interface the TPU
    product path drives (engine.py decode_streams 'chunked' branch —
    bounded device programs with host early-stop), with lanes sharded over
    the mesh.  Exists so the multichip dry run exercises the code path the
    product actually uses on silicon, not just the whole-scan variant
    (VERDICT r4 #10)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from .engine import _bucket
    from ..ops.codec_arena import ArenaDecoder

    mesh = mesh or default_mesh()
    dp = mesh.shape["dp"]
    L = max(_bucket(len(streams)), dp)
    if L % dp:
        L = ((L + dp - 1) // dp) * dp
    maxlen = _bucket(max(len(s) for s in streams))
    data = np.zeros((L, maxlen), np.uint8)
    for i, s in enumerate(streams):
        data[i, : len(s)] = np.frombuffer(s, np.uint8)
    dec = ArenaDecoder(model)
    data_j = jax.device_put(jnp.asarray(data),
                            NamedSharding(mesh, P("dp", None)))
    with mesh:
        st = jax.jit(dec.init_state)(data_j)
        run = jax.jit(lambda st, d: dec.run(st, d, chunk),
                      donate_argnums=(0,))
        pieces = []
        done = 0
        while done < max_out:
            st, outs = run(st, data_j)
            pieces.append(np.asarray(outs))
            done += chunk
            if not np.asarray(st["active"]).any():
                break
        lengths = np.asarray(st["len"])
    out = np.concatenate(pieces, axis=1)
    return [bytes(out[i, : int(lengths[i])]) for i in range(len(streams))]
