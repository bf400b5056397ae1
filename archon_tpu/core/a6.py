"""JAX path for the a6 generation: entropy-recoded BWT over bit offsets.

The a6 transform sorts codeword end offsets of the bit-packed stream by
backward bit reading (golden/a6.py documents the full derivation).  Here the
reversed bit string is sorted with the same prefix-doubling core as the byte
path, seeded with 16-bit windows so the bit-level doubling starts at k=16.

Code tables come from the exact host-side Huffman/fixed builders
(entropy/huffman.py) — O(256^2) host work, negligible; everything after the
table build is jit-compiled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..entropy.huffman import (
    build_encoder_byte,
    build_encoder_fixed,
    build_encoder_var,
)
from ..ops.bitpack import pack_codes, words_to_bits
from .doubling import _dense_rank, SENT_LARGE
from .unbwt import bwt_inverse

TERMIN_BITS = 80


def _code_arrays(codes):
    vals = np.array([c.code for c in codes], np.uint32)
    lens = np.array([c.length for c in codes], np.int32)
    return jnp.asarray(vals), jnp.asarray(lens)


def build_codes(data: np.ndarray, config: str):
    freq = np.bincount(data, minlength=256)
    if config == "byte":
        return build_encoder_byte()
    if config == "fix":
        return build_encoder_fixed(freq)[0]
    if config == "var":
        return build_encoder_var(freq)
    raise ValueError(f"bad a6 config {config!r}")


@functools.partial(jax.jit, static_argnames=())
def _bit_suffix_ranks(rev_padded: jnp.ndarray):
    """Rank all suffixes of the padded reversed bit string (uint8 0/1 values,
    TERMIN ones appended; off-end sentinel large)."""
    m = rev_padded.shape[0]
    # initial rank: 16-bit windows (1-padded beyond the end, which only
    # creates ties — consistent with the sentinel-large refinement)
    ext = jnp.concatenate([rev_padded, jnp.ones((16,), jnp.uint8)])
    win = jnp.zeros((m,), jnp.int32)
    for t in range(16):
        win = (win << 1) | ext[t : m + t].astype(jnp.int32)
    rank, nuniq = _dense_rank(win)
    iota = lax.iota(jnp.int32, m)
    off_end = jnp.int32(m + 1)

    def cond(state):
        k, rank, nuniq = state
        return jnp.logical_and(nuniq < m, k < m)

    def body(state):
        k, rank, nuniq = state
        shifted = iota + k
        rank2 = jnp.where(shifted < m, rank[jnp.minimum(shifted, m - 1)], off_end)
        _, _, sorted_idx = lax.sort((rank, rank2, iota), num_keys=2)
        r_s = rank[sorted_idx]
        r2_s = rank2[sorted_idx]
        head = jnp.concatenate(
            [
                jnp.ones((1,), jnp.int32),
                ((r_s[1:] != r_s[:-1]) | (r2_s[1:] != r2_s[:-1])).astype(jnp.int32),
            ]
        )
        ranks_sorted = jnp.cumsum(head) - 1
        new_rank = jnp.zeros((m,), jnp.int32).at[sorted_idx].set(ranks_sorted)
        return k * 2, new_rank, ranks_sorted[-1] + 1

    _, rank, _ = lax.while_loop(cond, body, (jnp.int32(16), rank, nuniq))
    return rank


@jax.jit
def _a6_transform(data: jnp.ndarray, code_values: jnp.ndarray, code_lengths: jnp.ndarray):
    """Jitted a6 forward: pack, bit-sort, select codeword ends, emit."""
    n = data.shape[0]
    words, ends, total = pack_codes(data, code_values, code_lengths)
    bits = words_to_bits(words)  # static capacity; only [0, total) is real

    m_cap = bits.shape[0] + TERMIN_BITS
    # reversed stream: rev[i] = bits[total-1-i] for i < total; then TERMIN
    # ones; beyond that (static padding region) ones as well — harmless
    # because only suffixes at selected positions < total are consumed.
    iota_m = lax.iota(jnp.int32, m_cap)
    src = total - 1 - iota_m
    rev = jnp.where(
        src >= 0, bits[jnp.clip(src, 0, bits.shape[0] - 1)], jnp.uint8(1)
    )
    rank = _bit_suffix_ranks(rev)

    sel = total - ends  # reversed positions of codeword ends (all >= 0)
    key = rank[sel]
    _, order = lax.sort((key, lax.iota(jnp.int32, n)), num_keys=1)
    base = jnp.argmax(jnp.equal(sel[order], 0)).astype(jnp.int32)
    out = data[(order + 1) % n]
    return out, base


def a6_forward(data: bytes | np.ndarray, config: str = "byte"):
    """a6 transform of ``data``; returns (payload bytes array, base)."""
    arr = np.frombuffer(bytes(data), np.uint8) if not isinstance(data, np.ndarray) else data
    if len(arr) == 0:
        return np.zeros(0, np.uint8), 0
    codes = build_codes(arr, config)
    vals, lens = _code_arrays(codes)
    out, base = _a6_transform(jnp.asarray(arr), vals, lens)
    return np.asarray(out), int(base)


def a6_encode(data: bytes, config: str = "byte") -> bytes:
    """a6-format blob (u32-LE base first, then N payload bytes)."""
    out, base = a6_forward(data, config)
    return np.uint32(base).tobytes() + out.tobytes()


def a6_decode(blob: bytes, config: str = "byte") -> bytes:
    """Invert an a6 blob on device (byte/fix); var uses code-ordered buckets
    (correct inverse; the reference's -u is broken for var, see golden/a6.py)."""
    base = int(np.frombuffer(blob[:4], np.uint32)[0])
    L = np.frombuffer(blob[4:], np.uint8)
    if len(L) == 0:
        return b""
    if config in ("byte", "fix"):
        out = bwt_inverse(jnp.asarray(L), jnp.int32(base), SENT_LARGE)
        return np.asarray(out).tobytes()
    # var: rebuild the Huffman table from the payload histogram (the BWT is
    # a permutation, so frequencies match the original) and walk with
    # code-ordered bucket starts — the correct inverse the reference lacks
    # (its -u uses byte-ordered buckets; see golden/a6.py)
    from ..core.unbwt import bwt_inverse_with_starts

    codes = build_encoder_var(np.bincount(L, minlength=256))
    keys = np.array(
        [
            (codes[c].code << (32 - codes[c].length)) if codes[c].length else -1
            for c in range(256)
        ],
        np.int64,
    )
    counts = np.bincount(L, minlength=256)
    starts = np.zeros(256, np.int32)
    acc = 0
    for c in np.argsort(keys, kind="stable"):
        starts[c] = acc
        acc += int(counts[c])
    out = bwt_inverse_with_starts(
        jnp.asarray(L), jnp.int32(base), jnp.asarray(starts)
    )
    return np.asarray(out).tobytes()
