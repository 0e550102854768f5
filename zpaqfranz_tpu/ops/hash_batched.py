"""Batched device hash kernels: SHA-1 / SHA-256 / CRC-32 over lanes.

The reference verifies every fragment's SHA-1 during extract
(reference ZSFX/zsfx.cpp:1812-1834) and rebuilds per-file CRC-32 during
`t` (reference CHANGELOG.md:73-76, multithreaded on the host). Here the
same work is data-parallel on device: L independent byte streams
(fragments/files) are hashed in lockstep — a `lax.scan` over 64-byte
blocks with a `vmap` over lanes. All arithmetic is uint32 (TPU-native);
lanes shorter than the longest one are masked out per block, so one
compiled kernel serves any mix of lengths.

Layout: `data` is (L, N) uint8 with N a multiple of 64 (caller pads with
zeros), `lengths` is (L,) int32 true byte counts. Padding/length
encoding (the 0x80 byte + 64-bit bit count) is applied *inside* the
kernel so callers never pre-pad semantically — only physically.

SHA-1 compression follows FIPS 180-1 (same formulas as the scalar
native engine, native/src/hashes.cpp and tzpaq.cpp); SHA-256 follows
FIPS 180-4; CRC-32 is the reflected 0xEDB88320 polynomial processed
4 bits per step via a 16-entry table (gathers stay tiny on device).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sha1_lanes", "sha256_lanes", "crc32_lanes", "pad_lanes"]


def pad_lanes(chunks, block: int = 64):
    """Pack a list of byte strings into (L, N) uint8 + (L,) lengths.

    N = longest length rounded up to `block` plus one extra block (room
    for the in-kernel 0x80/bit-count padding when a lane's tail block is
    nearly full).
    """
    L = len(chunks)
    maxlen = max((len(c) for c in chunks), default=0)
    n = ((maxlen + 8) // block + 1) * block
    out = np.zeros((L, n), np.uint8)
    lens = np.zeros((L,), np.int32)
    for i, c in enumerate(chunks):
        out[i, :len(c)] = np.frombuffer(bytes(c), np.uint8)
        lens[i] = len(c)
    return out, lens


def _message_words(block_u8: jnp.ndarray) -> jnp.ndarray:
    """(..., 64) uint8 -> (..., 16) uint32 big-endian words."""
    b = block_u8.astype(jnp.uint32).reshape(*block_u8.shape[:-1], 16, 4)
    return (b[..., 0] << 24) | (b[..., 1] << 16) | (b[..., 2] << 8) | b[..., 3]


def _apply_padding(block: jnp.ndarray, blk_idx: jnp.ndarray,
                   length: jnp.ndarray) -> jnp.ndarray:
    """Insert the 0x80 marker and 64-bit big-endian bit length into the
    lane's byte stream as FIPS padding requires, vectorized per block.

    block: (64,) uint8 raw bytes of this 64-byte window;
    blk_idx: scalar int32 index of the window; length: scalar int32.
    """
    off = blk_idx * 64 + jnp.arange(64, dtype=jnp.int32)
    data_mask = off < length
    b = jnp.where(data_mask, block, jnp.uint8(0))
    b = jnp.where(off == length, jnp.uint8(0x80), b)
    # bit count goes in the final 8 bytes of the last padded block; lanes
    # are < 512 MiB so the count fits in 32 bits (top 4 bytes stay zero)
    total_blocks = (length + 8) // 64 + 1          # same rule as pad_lanes
    bitlen = length.astype(jnp.uint32) * 8
    last_off = total_blocks * 64 - 8
    byte_pos = off - last_off                       # 0..7 within the count
    lo4 = byte_pos - 4                              # 0..3 within bitlen
    shift = jnp.clip(24 - lo4 * 8, 0, 24).astype(jnp.uint32)
    count_byte = jnp.where((lo4 >= 0) & (lo4 < 4),
                           (bitlen >> shift) & jnp.uint32(0xFF),
                           jnp.uint32(0)).astype(jnp.uint8)
    b = jnp.where((byte_pos >= 0) & (byte_pos < 8), count_byte, b)
    return b


def _sha1_compress(h, w16):
    """One FIPS 180-1 compression: h (5,) uint32, w16 (16,) uint32."""
    def expand(i, w):
        x = w[i - 3] ^ w[i - 8] ^ w[i - 14] ^ w[i - 16]
        return w.at[i].set((x << 1) | (x >> 31))
    w = jnp.zeros((80,), jnp.uint32).at[:16].set(w16)
    w = jax.lax.fori_loop(16, 80, expand, w)

    def round_fn(t, st):
        a, b, c, d, e = st
        f = jnp.where(
            t < 20, (b & c) | (~b & d),
            jnp.where(t < 40, b ^ c ^ d,
                      jnp.where(t < 60, (b & c) | (b & d) | (c & d),
                                b ^ c ^ d)))
        k = jnp.where(
            t < 20, jnp.uint32(0x5A827999),
            jnp.where(t < 40, jnp.uint32(0x6ED9EBA1),
                      jnp.where(t < 60, jnp.uint32(0x8F1BBCDC),
                                jnp.uint32(0xCA62C1D6))))
        tmp = ((a << 5) | (a >> 27)) + f + e + k + w[t]
        return (tmp, a, (b << 30) | (b >> 2), c, d)

    a, b, c, d, e = jax.lax.fori_loop(0, 80, round_fn, tuple(h))
    return jnp.stack([h[0] + a, h[1] + b, h[2] + c, h[3] + d, h[4] + e])


_SHA256_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)


def _rotr(x, r):
    return (x >> r) | (x << (32 - r))


def _sha256_compress(h, w16):
    k = jnp.asarray(_SHA256_K)

    def expand(i, w):
        s0 = _rotr(w[i - 15], 7) ^ _rotr(w[i - 15], 18) ^ (w[i - 15] >> 3)
        s1 = _rotr(w[i - 2], 17) ^ _rotr(w[i - 2], 19) ^ (w[i - 2] >> 10)
        return w.at[i].set(w[i - 16] + s0 + w[i - 7] + s1)
    w = jnp.zeros((64,), jnp.uint32).at[:16].set(w16)
    w = jax.lax.fori_loop(16, 64, expand, w)

    def round_fn(t, st):
        a, b, c, d, e, f, g, hh = st
        s1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = hh + s1 + ch + k[t] + w[t]
        s0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = s0 + maj
        return (t1 + t2, a, b, c, d + t1, e, f, g)

    st = jax.lax.fori_loop(0, 64, round_fn, tuple(h))
    return jnp.stack([h[i] + st[i] for i in range(8)])


def _hash_lanes(data: jnp.ndarray, lengths: jnp.ndarray, init, compress,
                out_words: int) -> jnp.ndarray:
    """Shared scan-over-blocks driver. data (L, N) u8, N % 64 == 0."""
    L, N = data.shape
    nblocks = N // 64
    blocks = data.reshape(L, nblocks, 64)
    lengths = lengths.astype(jnp.int32)

    def lane(blocks_l, length):
        total = (length + 8) // 64 + 1

        def step(h, xs):
            blk, idx = xs
            b = _apply_padding(blk, idx, length)
            h2 = compress(h, _message_words(b))
            return jnp.where(idx < total, h2, h), None

        h0 = jnp.asarray(init, jnp.uint32)
        h, _ = jax.lax.scan(
            step, h0, (blocks_l, jnp.arange(nblocks, dtype=jnp.int32)))
        return h

    return jax.vmap(lane)(blocks, lengths)


@functools.partial(jax.jit, static_argnames=())
def sha1_lanes(data: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """(L, N) u8 + (L,) lengths -> (L, 5) uint32 big-endian digest words."""
    init = np.array([0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476,
                     0xC3D2E1F0], np.uint32)
    return _hash_lanes(data, lengths, init, _sha1_compress, 5)


@functools.partial(jax.jit, static_argnames=())
def sha256_lanes(data: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """(L, N) u8 + (L,) lengths -> (L, 8) uint32 digest words."""
    init = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                     0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19],
                    np.uint32)
    return _hash_lanes(data, lengths, init, _sha256_compress, 8)


def _crc32_nibble_table() -> np.ndarray:
    poly = np.uint32(0xEDB88320)
    tab = np.zeros(16, np.uint32)
    for i in range(16):
        c = np.uint32(i)
        for _ in range(4):
            c = (c >> np.uint32(1)) ^ (poly if (c & np.uint32(1)) else
                                       np.uint32(0))
        tab[i] = c
    return tab


_CRC_TAB = _crc32_nibble_table()


@jax.jit
def crc32_lanes(data: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """(L, N) u8 + (L,) lengths -> (L,) uint32 CRC-32 (IEEE, reflected)."""
    tab = jnp.asarray(_CRC_TAB)
    L, N = data.shape
    lengths = lengths.astype(jnp.int32)

    def step(carry, xs):
        crc = carry
        byte, idx = xs                      # (L,) u8, scalar int32
        active = idx < lengths
        c = crc ^ byte.astype(jnp.uint32)
        c = (c >> 4) ^ tab[c & 15]
        c = (c >> 4) ^ tab[c & 15]
        return jnp.where(active, c, crc), None

    crc0 = jnp.full((L,), 0xFFFFFFFF, jnp.uint32)
    crc, _ = jax.lax.scan(
        step, crc0, (data.T, jnp.arange(N, dtype=jnp.int32)))
    return crc ^ jnp.uint32(0xFFFFFFFF)


def digest_bytes(words: jnp.ndarray) -> list:
    """(L, W) uint32 big-endian words -> list of byte digests."""
    arr = np.asarray(words)
    out = []
    for row in arr:
        out.append(b"".join(int(w).to_bytes(4, "big") for w in row))
    return out
