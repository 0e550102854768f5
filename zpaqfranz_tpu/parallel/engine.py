"""Device engine: jidac blocks as decoder/encoder lanes.

The TPU mapping of the reference's one-OS-thread-per-block parallelism
(SURVEY.md section 2.8): independent ZPAQ blocks become lanes of the batched
coder — grouped by model (the COMP header fixes the traced graph), padded to
shared shapes, decoded/encoded in lockstep on the device, and postprocessed
(PASS strip or PCOMP inversion) on the host via the native engine.

Also hosts the multi-chip sharding helpers: lanes shard over the mesh's
'dp' axis; the big per-lane model tables may additionally shard their size
axis over 'tp'. Used by __graft_entry__.dryrun_multichip and the dist tests.

Jitted callables are cached per (model header, lane count bucket, length
bucket) because compilation is expensive (minutes through the axon tunnel);
lane/length bucketing keeps cache hits high across uneven block sizes.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .. import native
from ..codec.container import ByteReader, find_block, read_comment, read_filename
from ..zpaql.header import Model


def _bucket(n: int) -> int:
    """Round up to a power of two (min 8) for jit-cache friendliness."""
    return max(8, 1 << math.ceil(math.log2(max(n, 1))))


def _engine_name() -> str:
    """Device engine selection: 'arena' (default — wide batched gathers,
    ~25-55 memory ops/byte for all lanes, see ops/codec_arena.py) or
    'batched' (the round-3 per-table-op engine, kept for comparison)."""
    import os
    return os.environ.get("ZPAQFRANZ_DEVICE_ENGINE", "arena")


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: codec graphs are large and the
    tunnel compile path is slow, so cache across processes/bench runs."""
    import os
    import jax
    try:
        d = os.environ.get("ZPAQFRANZ_JAX_CACHE",
                           os.path.expanduser("~/.cache/zpaqfranz_jax"))
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _model_lane_bytes(model: Model, maxlen: int, max_out: int) -> int:
    """Device bytes needed per lane (arenas + streams + stacked output)."""
    from ..ops.codec_arena import _Layout
    lay = _Layout(model)
    return lay.s8 + 4 * lay.s32 + maxlen + 2 * max_out + (1 << 17)


_DEVICE_BUDGET = 12 << 30   # leave headroom on a 16 GB chip

# Empirical per-program arena cap (round-5 bisect, experiments/
# tpu_bisect.py on the v5e): the m4 arena engine round-trips fine at
# 8 lanes (~90 MB of arena state) but the TPU worker crashes with a
# kernel fault at 64 lanes (~717 MB) and hangs at 32 (~358 MB) — far
# below HBM and XLA's own static peak estimate, i.e. a shape-dependent
# backend fault, not OOM. Small models ("3": 0.14 MB/lane) are fine at
# 1024+ lanes. Cap total arena bytes per device program and chunk the
# rest sequentially; override with ZPAQFRANZ_DEVICE_MAX_STATE.


def _max_state_bytes() -> int:
    env = os.environ.get("ZPAQFRANZ_DEVICE_MAX_STATE")
    return int(env) if env else (160 << 20)


def _chunk_steps(total: int) -> int:
    """Scan steps per device program.  Long-running XLA programs get killed
    by the tunneled chip's watchdog (~minutes), and chunking enables
    early-stop once every decode lane passed EOS; on CPU (tests, virtual
    mesh) whole-scan keeps the call count down."""
    import jax
    env = os.environ.get("ZPAQFRANZ_DEVICE_CHUNK")
    if env:
        return max(64, int(env))
    if jax.default_backend() == "tpu":
        return min(total, 512)
    return total


class DeviceCoder:
    """Lazy per-model jitted decode/encode entry points."""

    def __init__(self):
        self._decode_cache: Dict[tuple, object] = {}
        self._encode_cache: Dict[tuple, object] = {}
        _enable_compile_cache()

    def _lane_chunks(self, n: int, model: Model, maxlen: int,
                     max_out: int) -> List[Tuple[int, int]]:
        """Split n lanes into (start, count) chunks fitting device memory
        AND the empirical per-program arena-state cap (see
        _max_state_bytes: big-model lane counts above it kill the TPU
        worker even though memory fits)."""
        from ..ops.codec_arena import _Layout
        lay = _Layout(model)
        state = max(1, lay.s8 + 4 * lay.s32)
        cap = max(1, min(_DEVICE_BUDGET // _model_lane_bytes(model, maxlen,
                                                             max_out),
                         _max_state_bytes() // state))
        # floor to a power of two: lane arrays are bucket-padded UP to the
        # next pow2, so a non-pow2 cap would silently re-exceed the state
        # limit after padding
        if cap > 1:
            cap = 1 << (cap.bit_length() - 1)
        return [(s, min(cap, n - s)) for s in range(0, n, cap)]

    # ---- decode ---------------------------------------------------------
    def decode_streams(self, model: Model, streams: Sequence[bytes],
                       max_out: int) -> List[bytes]:
        """Decode coded segment payloads (post-header bytes) in lanes.

        Returns the PRE-postprocessing decoded bytes per stream, up to each
        lane's EOS (selector prefix + body); ``max_out`` bounds the decoded
        stream length per lane.
        """
        import jax
        import jax.numpy as jnp

        maxlen = _bucket(max(len(s) for s in streams))
        max_out = _bucket(max_out)
        result: List[bytes] = []
        for start, count in self._lane_chunks(len(streams), model, maxlen,
                                              max_out):
            sub = streams[start: start + count]
            L = _bucket(len(sub))
            data = np.zeros((L, maxlen), np.uint8)
            for i, s in enumerate(sub):
                data[i, : len(s)] = np.frombuffer(s, np.uint8)
            chunk = _chunk_steps(max_out)
            key = (model.header_bytes(), L, maxlen, chunk, _engine_name())
            fn = self._decode_cache.get(key)
            if fn is None:
                if _engine_name() == "batched":
                    from ..ops.coder_batched import BatchedDecoder
                    dec = BatchedDecoder(model)
                    fn = ("whole", jax.jit(
                        lambda d, n=max_out: dec.decode(d, n)[:2]))
                else:
                    from ..ops.codec_arena import ArenaDecoder
                    dec = ArenaDecoder(model)
                    fn = ("chunked",
                          jax.jit(dec.init_state),
                          jax.jit(lambda st, d: dec.run(st, d, chunk)))
                self._decode_cache[key] = fn
            dj = jnp.asarray(data)
            if fn[0] == "whole":
                out, lengths = fn[1](dj)
                out = np.asarray(out)
                lengths = np.asarray(lengths)
            else:
                # chunked scan: each device program stays short (the
                # tunneled chip kills long-running programs) and the loop
                # early-stops once every lane decoded its EOS
                _, init_fn, run_fn = fn
                st = init_fn(dj)
                pieces = []
                done = 0
                while done < max_out:
                    st, outs = run_fn(st, dj)
                    pieces.append(np.asarray(outs))
                    done += chunk
                    if not np.asarray(st["active"]).any():
                        break
                out = np.concatenate(pieces, axis=1)
                lengths = np.asarray(st["len"])
            result.extend(bytes(out[i, : int(lengths[i])])
                          for i in range(len(sub)))
        return result

    # ---- encode ---------------------------------------------------------
    def encode_streams(self, model: Model, payloads: Sequence[bytes]
                       ) -> List[bytes]:
        """Arithmetic-code payloads (selector prefix included) in lanes.
        Returns the coded byte stream per payload."""
        import jax
        import jax.numpy as jnp

        maxlen = _bucket(max(len(p) for p in payloads) + 1)
        cap = maxlen + maxlen // 2 + 64
        result: List[bytes] = []
        for start, count in self._lane_chunks(len(payloads), model, maxlen,
                                              cap):
            sub = payloads[start: start + count]
            L = _bucket(len(sub))
            data = np.zeros((L, maxlen), np.uint8)
            lengths = np.zeros(L, np.int32)
            for i, p in enumerate(sub):
                data[i, : len(p)] = np.frombuffer(p, np.uint8)
                lengths[i] = len(p)
            chunk = _chunk_steps(maxlen + 1)
            key = (model.header_bytes(), L, maxlen, chunk, _engine_name())
            fn = self._encode_cache.get(key)
            if fn is None:
                if _engine_name() == "batched":
                    from ..ops.coder_batched import BatchedEncoder
                    enc = BatchedEncoder(model, out_cap=cap)
                    fn = ("whole", jax.jit(lambda d, n: (
                        lambda st: (st["enc"].out, st["enc"].cnt)
                    )(enc.encode(d, n))))
                else:
                    from ..ops.codec_arena import ArenaEncoder
                    enc = ArenaEncoder(model, out_cap=cap)
                    fn = ("chunked",
                          jax.jit(lambda d: enc.init_state(d.shape[0])),
                          jax.jit(lambda st, d, n, j0: enc.run(
                              st, d, n, j0, chunk)))
                self._encode_cache[key] = fn
            dj = jnp.asarray(data)
            nj = jnp.asarray(lengths)
            if fn[0] == "whole":
                out, cnt = fn[1](dj, nj)
            else:
                _, init_fn, run_fn = fn
                st = init_fn(dj)
                maxn = int(lengths.max())
                for j0 in range(0, maxlen + 1, chunk):
                    if j0 > maxn:
                        break
                    st = run_fn(st, dj, nj, jnp.int32(j0))
                out, cnt = st["out"], st["cnt"]
            out = np.asarray(out)
            cnt = np.asarray(cnt)
            result.extend(bytes(out[i, : cnt[i]]) for i in range(len(sub)))
        return result


_CODER: Optional[DeviceCoder] = None


def device_coder() -> DeviceCoder:
    global _CODER
    if _CODER is None:
        _CODER = DeviceCoder()
    return _CODER


def parse_block_payload(data: bytes, offset: int
                        ) -> Tuple[Model, int, bytes]:
    """At a block's archive offset: parse header + first segment intro;
    return (model, payload_start, payload_bytes-to-end-of-archive)."""
    r = ByteReader(data, offset)
    model = find_block(r)
    if model is None:
        raise RuntimeError(f"no block at offset {offset}")
    read_filename(r)
    read_comment(r)
    return model, r.pos, bytes(r.data[r.pos:])


def decode_jidac_blocks(data, jd, blocks,
                        use_device: bool = True) -> Dict[int, bytes]:
    """Decode jidac d blocks -> {block.offset: concatenated fragment bytes}.

    ``data``: archive bytes or a streaming ArchiveSource — each block's
    coded bytes are fetched as one bounded range (bsize from the h block),
    so device decode of a TB archive never maps more than the blocks in
    flight.

    Modeled blocks sharing one model run as device lanes (the device yields
    the pre-postprocessing stream up to EOS; PASS stripping or PCOMP
    inversion runs host-native over it). Store-mode blocks use the host
    engine directly.
    """
    from ..jidac.archive_io import as_source
    src = as_source(data)
    groups: Dict[bytes, List] = {}
    host_blocks = []
    metas = {}
    for blk in blocks:
        n = blk.bsize if blk.bsize else max(0, src.size() - blk.offset)
        raw = src.read_range(blk.offset, n)
        model, start, payload = parse_block_payload(raw, 0)
        metas[blk.offset] = (model, payload)
        if use_device and model.n > 0:
            groups.setdefault(model.header_bytes(), []).append(blk)
        else:
            host_blocks.append(blk)

    out: Dict[int, bytes] = {}
    coder = device_coder()
    for hdr, blks in groups.items():
        model = metas[blks[0].offset][0]
        # group lanes by decoded-size bucket: the batched decoder scans to
        # the GROUP max, so one big block must not make every small block
        # pay its step count (mixed-size groups were worst-case wall clock)
        by_size: Dict[int, List] = {}
        for b in blks:
            by_size.setdefault(_bucket(b.usize + 8192), []).append(b)
        for max_out, sub in sorted(by_size.items()):
            streams = [metas[b.offset][1] for b in sub]
            # pre-postprocessing stream bound: BWT adds 5 bytes + the
            # embedded PCOMP blob; LZ77 output is smaller than the
            # original; PASS adds 1 — all inside the +8192 slack.
            decoded = coder.decode_streams(model, streams, max_out)
            for b, d in zip(sub, decoded):
                res = native.postprocess(model.ph, model.pm, d,
                                         out_hint=b.usize)
                if len(res) < b.usize:
                    raise RuntimeError(
                        f"block at {b.offset}: {len(res)} < {b.usize} bytes")
                out[b.offset] = res

    for blk in host_blocks:
        with native.NativeStream(data) as s:
            s.seek(blk.offset)
            segs = s.read_block()
        if not segs:
            raise RuntimeError(f"block at {blk.offset} not found")
        out[blk.offset] = b"".join(seg.data for seg in segs)
    return out


def looks_incompressible(payload: bytes) -> bool:
    """Cheap pre-test before LZ77+model: sampled order-0 entropy as the
    fast gate, then an actual LZ77 probe over a sample window. The entropy
    test alone misclassifies LZ-redundant high-entropy data (e.g. a random
    block repeated twice is 8 bits/byte order-0 but halves under LZ77 —
    ADVICE r1), so high entropy only short-circuits when the LZ probe also
    finds nothing. The reference's add() measures actual per-block
    redundancy (zpaq 7.15 behavior, SURVEY.md section 2.4 #30)."""
    n = len(payload)
    if n < 1 << 16:
        return False
    import collections
    step = max(1, n // (1 << 16))
    sample = payload[::step][:1 << 16]
    counts = collections.Counter(sample)
    if len(counts) < 256:
        return False
    m = len(sample)
    ent = -sum(c / m * math.log2(c / m) for c in counts.values())
    if ent <= 7.98:
        return False
    # High order-0 entropy: confirm with a real (cheap) LZ77 probe over a
    # contiguous window so long-range duplicates still get compressed.
    probe = payload[: 1 << 18]
    lz = native.lz77_encode(probe, min_match=8, depth_log=1, hash_bits=16)
    return len(lz) >= len(probe) - (len(probe) >> 6)


def prepare_payload(pre, payload: bytes) -> Tuple[bytes, bool]:
    """Apply the method's preprocessor (host side).

    Returns ``(bytes_to_code, store)``. ``store=True`` means the adaptive
    store decision fired: the ORIGINAL payload should be written as a raw
    store block instead of modeling the transformed stream (the reference's
    per-block redundancy test; identical on host and device paths so both
    produce the same archive bytes).

    Composite transforms (N2=5/6/7) apply E8E9 BEFORE LZ77/BWT, exactly as
    the reference LZBuffer ctor does (libzpaq.cpp:6295)."""
    if pre.transform in (1, 2):
        if looks_incompressible(payload):
            return payload, True
        src = native.e8e9_transform(payload) if pre.e8e9 else payload
        rb = max(0, pre.block_bits - 24)
        if pre.min_match2 or pre.lookahead or pre.use_sa or pre.chain:
            # high-ratio settings: scored parse with secondary context /
            # lookahead / suffix-array or chain search (reference N4/N6/N7,
            # libzpaq.h:154-175; finder 2 = dual hash chains, the level-2
            # preset)
            lz = native.lz77_parse(
                src, pre.transform,
                min_match=max(4 if pre.transform == 1 else 1,
                              pre.min_match),
                min_match2=pre.min_match2, lookahead=pre.lookahead,
                depth_log=max(1, pre.depth_log),
                hash_bits=max(12, min(pre.hash_bits or 22, 27)),
                use_sa=1 if pre.use_sa else (2 if pre.chain else 0), rb=rb)
        elif pre.transform == 1:
            lz = native.lz77p_encode(
                src, min_match=max(4, pre.min_match),
                depth_log=max(1, pre.depth_log),
                hash_bits=max(12, min(pre.hash_bits or 22, 27)),
                rb=rb)
        else:
            lz = native.lz77_encode(
                src, min_match=max(1, pre.min_match),
                depth_log=max(1, pre.depth_log),
                hash_bits=max(12, min(pre.hash_bits or 22, 27)))
        if len(lz) >= len(payload) - (len(payload) >> 6):
            # post-test: LZ77 found nothing; store beats modeling the
            # expanded literal stream
            return payload, True
        return lz, False
    if pre.transform == 3:
        src = native.e8e9_transform(payload) if pre.e8e9 else payload
        return native.bwt_encode(src), False
    if pre.transform == 0 and pre.e8e9:
        return native.e8e9_transform(payload), False
    return payload, False


def assemble_block(model: Model, coded: bytes, name: bytes, comment: bytes,
                   sha1: Optional[bytes] = None, tag: bool = True) -> bytes:
    """Wrap device-coded bytes in the standard block/segment framing
    (mirror of the native tzc_compress_block writer)."""
    from ..codec.container import TAG
    out = bytearray()
    if tag:
        out += TAG
    out += b"zPQ" + bytes([1 if model.n else 2, 1])
    out += model.header_bytes()
    out += b"\x01" + name + b"\x00" + comment + b"\x00\x00"
    out += coded
    out += b"\x00\x00\x00\x00"
    if sha1 is not None:
        out += bytes([253]) + sha1
    else:
        out += bytes([254])
    out += bytes([255])
    return bytes(out)


_STORE_MODEL = Model(hh=0, hm=0)


def encode_jidac_blocks(model: Model, pre, jobs, date: int,
                        jdc_name, verify: bool = False) -> List[bytes]:
    """Compress jidac d-block jobs as device lanes; returns framed blocks.

    Adaptive store runs per job with the same decision function as the
    host path (prepare_payload), so device adds and host adds of the same
    tree produce the same archive bytes: store-chosen jobs become raw
    store blocks (host native — no modeling work exists for them), the
    rest are arithmetic-coded as device lanes."""
    from ..jidac.add import job_bytes
    blob = model.pcomp_bytes()
    prefix = (b"\x01" + blob) if blob else b"\x00"
    out: List[Optional[bytes]] = [None] * len(jobs)
    lane_idx: List[int] = []
    payloads: List[bytes] = []
    raw_lens: List[int] = []
    for i, job in enumerate(jobs):
        raw = job_bytes(job)
        payload, store = prepare_payload(pre, raw)
        name = jdc_name(date, "d", job.first_frag)
        comment = b"%d jDC\x01" % len(raw)
        if store:
            out[i] = native.compress_block(_STORE_MODEL, raw, name, comment)
        else:
            if verify:
                from ..jidac.add import verify_payload
                verify_payload(model, pre, raw, payload, job.first_frag)
            lane_idx.append(i)
            payloads.append(prefix + payload)
            raw_lens.append(len(raw))
    if payloads:
        coded = device_coder().encode_streams(model, payloads)
        for i, c, rl in zip(lane_idx, coded, raw_lens):
            name = jdc_name(date, "d", jobs[i].first_frag)
            comment = b"%d jDC\x01" % rl
            out[i] = assemble_block(model, c, name, comment)
    return out  # type: ignore[return-value]
