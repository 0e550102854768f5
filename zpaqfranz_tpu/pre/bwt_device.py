"""Device BWT: prefix-doubling suffix sort in pure JAX (TPU-native -m3).

The reference builds its BWT with divsufsort on the host
(/root/reference/ZSFX/libzpaq.cpp:4334-6111, invoked from LZBuffer at
libzpaq.cpp:6304); our host engine uses a clean-room SA-IS
(native/src/tzpaq.cpp sais_u8). This module is the TPU-side alternative
(SURVEY.md section 7 hard part 4): prefix doubling — log2(n) rounds of a
two-key sort over (rank[i], rank[i+k]) — maps onto XLA's sort primitive
with no data-dependent shapes, so the whole suffix sort jits into one
compiled program per input size.

The emitted stream is byte-identical to the host engine's
``tz_bwt_encode`` (the suffix array of a string with distinct implicit
sentinel is unique):

    out[0]       = in[n-1]                (the sentinel's BWT char)
    out[1..n]    = in[sa[i]-1], 255 at the sa[i]==0 row
    out[n+1..+4] = little-endian index of the sentinel row

which is exactly what the inverse-BWT ZPAQL postprocessor expects.
"""

from __future__ import annotations

import numpy as np

__all__ = ["suffix_array_device", "bwt_encode_device"]


def _rounds(n: int) -> int:
    r, k = 0, 1
    while k < n:
        k *= 2
        r += 1
    return r


def _build_sa(n: int):
    import jax
    import jax.numpy as jnp

    def sa_fn(data):
        # rank 0..255 from bytes; suffixes of the string followed by an
        # implicit sentinel smaller than every byte (rank -1 when the
        # second key runs off the end)
        rank = data.astype(jnp.int32)
        idx = jnp.arange(n, dtype=jnp.int32)

        def round_fn(carry, k):
            rank, done = carry
            key2 = jnp.where(idx + k < n,
                             jnp.roll(rank, -k).astype(jnp.int32), -1)
            # two-key sort as two stable single-key sorts (LSD radix
            # style) — avoids 64-bit composites, which TPU jax disables
            o1 = jnp.argsort(key2, stable=True)
            o2 = jnp.argsort(rank[o1], stable=True)
            order = o1[o2]
            r_s = rank[order]
            k_s = key2[order]
            diff = ((r_s[1:] != r_s[:-1]) | (k_s[1:] != k_s[:-1]))
            newr = jnp.cumsum(
                jnp.concatenate([jnp.zeros(1, jnp.int32),
                                 diff.astype(jnp.int32)]))
            rank = jnp.zeros(n, jnp.int32).at[order].set(newr)
            done = newr[-1] == n - 1
            return (rank, done), None

        ks = 1 << np.arange(_rounds(n), dtype=np.int32)
        (rank, _), _ = jax.lax.scan(round_fn, (rank, jnp.array(False)),
                                    jnp.asarray(ks))
        # rank is now the inverse suffix array
        sa = jnp.zeros(n, jnp.int32).at[rank].set(idx)
        return sa

    return sa_fn


def _build_bwt(n: int):
    import jax
    import jax.numpy as jnp
    sa_fn = _build_sa(n)

    def bwt_fn(data):
        sa = sa_fn(data)
        prev = jnp.where(sa == 0, jnp.uint8(255), data[(sa - 1) % n])
        first = data[n - 1] if n else jnp.uint8(255)
        idx = jnp.argmax(sa == 0) + 1       # 1-based sentinel row
        return first, prev, idx.astype(jnp.uint32)

    return jax.jit(bwt_fn)


_CACHE: dict = {}


def suffix_array_device(data: bytes) -> np.ndarray:
    """Suffix array of ``data`` (implicit unique smallest sentinel)."""
    import jax
    n = len(data)
    if n == 0:
        return np.zeros(0, np.int32)
    fn = _CACHE.get(("sa", n))
    if fn is None:
        fn = jax.jit(_build_sa(n))
        _CACHE[("sa", n)] = fn
    arr = jax.device_put(np.frombuffer(data, np.uint8))
    return np.asarray(jax.block_until_ready(fn(arr)))


def bwt_encode_device(data: bytes) -> bytes:
    """BWT stream (n+5 bytes), byte-identical to native.bwt_encode."""
    import jax
    n = len(data)
    if n == 0:
        return b"\xff" + b"\x00" * 4
    fn = _CACHE.get(("bwt", n))
    if fn is None:
        fn = _build_bwt(n)
        _CACHE[("bwt", n)] = fn
    arr = jax.device_put(np.frombuffer(data, np.uint8))
    first, prev, idx = jax.block_until_ready(fn(arr))
    out = bytearray(n + 5)
    out[0] = int(first)
    out[1:n + 1] = np.asarray(prev).tobytes()
    out[n + 1:] = int(idx).to_bytes(4, "little")
    return bytes(out)
