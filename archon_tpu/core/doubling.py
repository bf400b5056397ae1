"""Prefix-doubling suffix array construction in JAX (single device).

This is the TPU-native re-expression of the reference's GPU prefix-doubling
pipeline (gpu/Archon.boo:94-119: init -> sort -> diff -> scan -> scatter ->
jump *= 2), with two corrections over the reference kernels:

- exact tie-breaking: the reference GPU sort compares packed 4-byte keys with
  a 1-step lookahead approximation (gpu/sh/k_sort.glv:10-19); we sort exact
  (rank, next-rank) pairs so no approximation error exists.
- explicit sentinel conventions: off-end reads compare as strictly smaller
  (a4 semantics, 'small') or strictly larger (a7 semantics, 'large') than any
  real symbol, which subsumes the anchor/LSC "defense" machinery of
  a4/direct.c and final/x2 — doubling is repetition-immune by construction.

Work: O(n log n); each round is one multi-operand sort + segmented head-flag
scan + scatter, all XLA-fusable primitives.  The sort is ``jax.lax.sort`` in
this baseline; the Pallas segmented radix sort swaps in via ``sort_fn``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

SENT_SMALL = "small"
SENT_LARGE = "large"

# Extended-symbol space: real byte b -> b+1 in [1, 256]; the off-end pad is 0
# (small) or 511 (large).  Three extended symbols pack into 27 bits < int31.
_EXT_BITS = 9
_EXT_BASE = 1 << _EXT_BITS  # 512


def _dense_rank(keys: jnp.ndarray, idx_dtype=jnp.int32):
    """Rank every element by value (dense, ties share a rank).

    Returns (rank, num_unique). One sort + head-flag cumsum + scatter."""
    n = keys.shape[0]
    iota = lax.iota(idx_dtype, n)
    sorted_keys, sorted_idx = lax.sort((keys, iota), num_keys=1)
    head = jnp.concatenate(
        [jnp.ones((1,), idx_dtype), (sorted_keys[1:] != sorted_keys[:-1]).astype(idx_dtype)]
    )
    ranks_sorted = jnp.cumsum(head) - 1
    rank = jnp.zeros((n,), idx_dtype).at[sorted_idx].set(ranks_sorted)
    return rank, ranks_sorted[-1] + 1


def _initial_rank(data: jnp.ndarray, sentinel: str):
    """Order-3 initial ranks: pack 3 extended symbols per position."""
    n = data.shape[0]
    ext = data.astype(jnp.int32) + 1
    pad_val = jnp.int32(0 if sentinel == SENT_SMALL else _EXT_BASE - 1)
    pad = jnp.full((2,), pad_val, jnp.int32)
    extp = jnp.concatenate([ext, pad])
    packed = (
        extp[:n] * (_EXT_BASE * _EXT_BASE)
        + extp[1 : n + 1] * _EXT_BASE
        + extp[2 : n + 2]
    )
    return _dense_rank(packed)


@functools.partial(jax.jit, static_argnames=("sentinel", "sort_fn"))
def suffix_array(data: jnp.ndarray, sentinel: str = SENT_SMALL, sort_fn=None) -> jnp.ndarray:
    """Suffix array of a uint8 array under the given sentinel convention.

    Matches archon_tpu.golden.sa.suffix_array exactly (tested); runs fully
    on-device under jit with a while_loop over doubling rounds.
    """
    n = data.shape[0]
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    if n == 1:
        return jnp.zeros((1,), jnp.int32)

    # off-end rank sentinel for doubling rounds
    off_end = jnp.int32(-1) if sentinel == SENT_SMALL else jnp.int32(n + 1)

    rank0, nuniq0 = _initial_rank(data, sentinel)
    iota = lax.iota(jnp.int32, n)

    if sort_fn is None:
        def sort_fn(r, r2, idx):
            _, _, sorted_idx = lax.sort((r, r2, idx), num_keys=2)
            return sorted_idx

    def cond(state):
        k, rank, nuniq = state
        return jnp.logical_and(nuniq < n, k < n)

    def body(state):
        k, rank, nuniq = state
        shifted = iota + k
        rank2 = jnp.where(shifted < n, rank[jnp.minimum(shifted, n - 1)], off_end)
        sorted_idx = sort_fn(rank, rank2, iota)
        r_s = rank[sorted_idx]
        r2_s = rank2[sorted_idx]
        head = jnp.concatenate(
            [
                jnp.ones((1,), jnp.int32),
                ((r_s[1:] != r_s[:-1]) | (r2_s[1:] != r2_s[:-1])).astype(jnp.int32),
            ]
        )
        ranks_sorted = jnp.cumsum(head) - 1
        new_rank = jnp.zeros((n,), jnp.int32).at[sorted_idx].set(ranks_sorted)
        return k * 2, new_rank, ranks_sorted[-1] + 1

    _, rank, _ = lax.while_loop(cond, body, (jnp.int32(3), rank0, nuniq0))
    # rank is now a permutation: invert it to get the suffix array
    sa = jnp.zeros((n,), jnp.int32).at[rank].set(iota)
    return sa


def rank_of(sa: jnp.ndarray) -> jnp.ndarray:
    """Inverse permutation of a suffix array."""
    n = sa.shape[0]
    return jnp.zeros((n,), jnp.int32).at[sa].set(lax.iota(jnp.int32, n))


def num_doubling_rounds(n: int) -> int:
    """Upper bound on rounds executed for input length n (k: 3,6,12,... >= n)."""
    if n <= 3:
        return 1
    return 1 + math.ceil(math.log2(n / 3))
