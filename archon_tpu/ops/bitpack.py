"""Vectorized bit-stream packing (JAX) — the a6 coder's hot path.

Replaces the serial bit appender of the reference (coder_encode_stream,
a6/src/coder.c:108-123) with the classic parallel formulation (SURVEY.md
section 7 layer 6): prefix-sum of code lengths gives every codeword's start
offset; each codeword contributes to at most two 32-bit words; contributions
are combined with scatter-add (bit-disjoint, so add == or).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("max_len",))
def pack_codes_sized(
    data: jnp.ndarray,
    code_values: jnp.ndarray,
    code_lengths: jnp.ndarray,
    max_len: int,
):
    """Pack each symbol's code LSB-first at increasing bit offsets, with the
    word buffer sized by the table's TRUE maximum code length (host-known
    before trace time — the Huffman build is host-side), not the 32-bit
    worst case.  The reference bounds its key domain the same way
    (rad_bits <= 24 asserted from real code widths, a6/src/bwt.c:346).

    data: (n,) uint8 symbols; code_values: (256,) uint32; code_lengths:
    (256,) int32.  Returns (words u32[W], ends i32[n], total_bits i32).
    """
    n = data.shape[0]
    lengths = code_lengths[data].astype(jnp.int32)
    codes = code_values[data].astype(jnp.uint32)
    ends = jnp.cumsum(lengths)
    total = ends[-1] if n else jnp.int32(0)
    starts = ends - lengths

    nwords = (n * max_len + 31) // 32 + 1
    w0 = (starts >> 5).astype(jnp.int32)
    sh = (starts & 31).astype(jnp.uint32)
    c0 = codes << sh
    # (codes >> 1) >> (31-sh) avoids the undefined shift-by-32 when sh == 0
    c1 = (codes >> 1) >> (jnp.uint32(31) - sh)
    words = jnp.zeros((nwords,), jnp.uint32)
    words = words.at[w0].add(c0, mode="drop")
    words = words.at[w0 + 1].add(c1, mode="drop")
    return words, ends, total


def pack_codes(data: jnp.ndarray, code_values: jnp.ndarray, code_lengths: jnp.ndarray):
    """32-bit-capacity variant of :func:`pack_codes_sized` (any legal table)."""
    return pack_codes_sized(data, code_values, code_lengths, 32)


@jax.jit
def words_to_bits(words: jnp.ndarray):
    """Expand u32 words into a uint8 0/1 array (LSB-first within each word)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (words[:, None] >> shifts[None, :]) & jnp.uint32(1)
    return bits.reshape(-1).astype(jnp.uint8)
