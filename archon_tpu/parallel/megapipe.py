"""End-to-end sharded megablock pipeline: SA -> BWT -> entropy, on-mesh.

BASELINE config 5's shape ("block-sharded BWT + entropy pipeline"): one
megablock too large for a single chip is text-sharded over the 'sp' mesh
axis, suffix-sorted by distributed doubling (parallel.megablock), its BWT
emitted *sharded* (the prev-byte payload rides the final merge-split sort,
the sharded analog of the reference's per-block emit loop,
final/x1/ArchonX1.c:118-131), and Huffman-packed per shard with one shared
table — L never materializes on a single device.

Container format (ours; the reference has no multi-device format):

    header: magic b'ATM1' | u8 generation (0=a4-small, 1=a7-large)
            | u8 coder (0=byte, 1=var) | u16 n_shards | u64 n | u32 base
            | u32 pad (trailing filler bytes appended pre-transform so n
              divides the shard count; stripped after inverse)
    table : 256 x u32 symbol histogram of L (the Huffman build is
            deterministic, entropy/huffman.py, so the decoder rebuilds the
            exact table from the histogram — the same determinism contract
            a6's format relies on)
    shard : u32 nbits | ceil(nbits/8) payload bytes      (x n_shards)

Per-shard frames are byte-aligned independently: cross-shard bit carry
would save < 4*(ns-1) bytes total and cost a carry collective — the same
independent-frame choice the reference makes for blocks (ArchonX1.c:55-56).

Decode is host-side (the container is the recovery/interchange format):
rebuild table -> per-shard backward Huffman walk -> native inverse BWT.
"""

from __future__ import annotations

import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core.doubling import SENT_LARGE, SENT_SMALL
from ..entropy.huffman import SymbolCode, build_encoder_byte, build_encoder_var
from ..ops.bitpack import pack_codes_sized
from .megablock import AXIS, _sharded_ranks, _make_emit

MAGIC = b"ATM1"
GENERATIONS = {"a4": 0, "a7": 1}
CODERS = {"byte": 0, "var": 1}
CODER_NAMES = {v: k for k, v in CODERS.items()}


@functools.lru_cache(maxsize=32)
def _make_hist(mesh: Mesh):
    """Sharded 256-bin histogram (psum of per-shard bincounts)."""

    def hist_fn(L_shard):
        h = jnp.zeros((256,), jnp.int32).at[L_shard.astype(jnp.int32)].add(1)
        return lax.psum(h, AXIS)

    return jax.jit(
        shard_map(hist_fn, mesh=mesh, in_specs=(P(AXIS),), out_specs=P())
    )


@functools.lru_cache(maxsize=32)
def _make_pack(mesh: Mesh, max_len: int):
    """Per-shard parallel bit-pack with the shared (replicated) code table."""

    def pack_fn(L_shard, values, lengths):
        words, _ends, total = pack_codes_sized(L_shard, values, lengths, max_len)
        return words[None], total[None]

    return jax.jit(
        shard_map(
            pack_fn,
            mesh=mesh,
            in_specs=(P(AXIS), P(), P()),
            out_specs=(P(AXIS), P(AXIS)),
        )
    )


def _codes_arrays(codes: list[SymbolCode]):
    values = np.array([c.code for c in codes], np.uint32)
    lengths = np.array([c.length for c in codes], np.int32)
    return values, lengths


def encode_megablock(
    data: bytes,
    mesh: Mesh,
    generation: str = "a4",
    coder: str = "var",
) -> bytes:
    """Sharded encode of one megablock of any length: inputs that do not
    divide the shard count are padded with a deterministic non-repetitive
    filler (recorded in the header, stripped on decode — an all-zero pad
    would hand the suffix sorter a pathological tie run for free)."""
    if generation not in GENERATIONS:
        raise ValueError(f"unknown generation {generation!r}")
    if coder not in CODERS:
        raise ValueError(f"unknown coder {coder!r}")
    ns = mesh.shape[AXIS]
    arr = np.frombuffer(bytes(data), np.uint8)
    pad = (-len(arr)) % ns
    if pad:
        filler = (
            (np.arange(pad, dtype=np.uint64) * 2654435761) >> 20
        ).astype(np.uint8)
        arr = np.concatenate([arr, filler])
    n = len(arr)
    sentinel = SENT_SMALL if generation == "a4" else SENT_LARGE
    # right-to-left comparisons = forward sort of the reversed text (the
    # same convention io.blocks uses for its per-block framing, both gens)
    view = arr[::-1]

    rank, data_dev, S, n = _sharded_ranks(view, mesh, sentinel)
    L_dev, base = _make_emit(mesh, S, n)(rank, data_dev)
    base = int(base)

    hist = np.asarray(_make_hist(mesh)(L_dev))
    if coder == "var":
        codes = build_encoder_var(hist)
    else:
        codes = build_encoder_byte()
    values, lengths = _codes_arrays(codes)
    max_len = int(lengths.max()) if lengths.size else 1
    max_len = max(max_len, 1)

    words2, totals = _make_pack(mesh, max_len)(
        L_dev, jnp.asarray(values), jnp.asarray(lengths)
    )
    words2 = np.asarray(words2)
    totals = np.asarray(totals)

    out = [
        MAGIC,
        struct.pack(
            "<BBHQII", GENERATIONS[generation], CODERS[coder], ns, n, base, pad
        ),
        hist.astype(np.uint32).tobytes(),
    ]
    for s in range(ns):
        nbits = int(totals[s])
        nbytes = (nbits + 7) // 8
        out.append(struct.pack("<I", nbits))
        out.append(words2[s].tobytes()[:nbytes])
    return b"".join(out)


def decode_megablock(blob: bytes) -> bytes:
    """Host-side inverse of :func:`encode_megablock` (container recovery
    path): per-shard entropy decode, concatenate L, native inverse BWT."""
    if blob[:4] != MAGIC:
        raise ValueError("bad magic")
    gen_id, coder_id, ns, n, base, pad = struct.unpack("<BBHQII", blob[4:24])
    pos = 24
    hist = np.frombuffer(blob[pos : pos + 1024], np.uint32)
    pos += 1024
    if CODER_NAMES[coder_id] == "var":
        codes = build_encoder_var(hist)
    else:
        codes = build_encoder_byte()
    S = n // ns

    from .. import native

    if not any(c.length for c in codes):
        # single-symbol alphabet: the Huffman code is zero-length (as the
        # reference produces, huff.c single-leaf case) and the stream is
        # empty — L is just the one present symbol repeated
        sym = int(np.argmax(hist))
        L = np.full(n, sym, np.uint8)
        pos += 4 * ns  # skip the ns zero-nbits frames
    else:
        frames = []  # (nbits, stream_bytes) per shard
        for _ in range(ns):
            (nbits,) = struct.unpack("<I", blob[pos : pos + 4])
            pos += 4
            nbytes = (nbits + 7) // 8
            frames.append((nbits, np.frombuffer(blob[pos : pos + nbytes], np.uint8)))
            pos += nbytes
        if native.available():
            # native first-bits decoder (a6/src/coder.c:130-209 semantics),
            # thread-pooled per shard: bitunpack releases the GIL, so shards
            # decode on all cores — the recovery path must keep pace with
            # decode_native_mbps, not the O(n*len) python bit walk
            vals = np.array([c.code for c in codes], np.uint32)
            lens = np.array([c.length for c in codes], np.uint8)

            def unpack_one(frame):
                nbits, stream = frame
                nwords = (nbits + 31) // 32
                buf = np.zeros((nwords + 2) * 4, np.uint8)
                buf[: len(stream)] = stream
                return native.bitunpack(buf.view(np.uint32), nbits, vals, lens, S)

            if ns > 1:
                import os
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(
                    max_workers=min(ns, os.cpu_count() or 1)
                ) as ex:
                    parts = list(ex.map(unpack_one, frames))
            else:
                parts = [unpack_one(frames[0])]
        else:
            from ..entropy.coder import decode_stream

            parts = [
                decode_stream(stream, nbits, codes, S) for nbits, stream in frames
            ]
        L = np.concatenate(parts) if parts else np.zeros(0, np.uint8)

    if native.available():
        out = native.unbwt(L, base, gen_id == 1).tobytes()
    else:
        from ..core.unbwt import bwt_inverse

        rt = bwt_inverse(
            jnp.asarray(L), jnp.int32(base),
            SENT_SMALL if gen_id == 0 else SENT_LARGE,
        )
        out = np.asarray(rt).tobytes()
    return out[: n - pad] if pad else out
