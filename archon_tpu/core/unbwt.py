"""Inverse BWT on device: vectorized LF-table build + pointer-doubling walk.

The reference inverse (a6/src/bwt.c:459-478 ``unbwt_transform/unbwt_write``,
a7/src/archon.cpp:903-943 ``deCompute/deWrite``) builds the LF successor
table by a counting pass and then walks the chain sequentially — the one
inherently serial loop in the whole system (SURVEY.md section 3.4).  On TPU the
table build becomes a stable sort and the walk becomes pointer doubling:
log2(n) rounds of jump-table squaring, each a large gather.

The a4-vs-a7 convention difference survives into decode: the successor
counters roll the base index first (a4, a4/src/archon.c:255-257) or last
(a7, a7/src/archon.cpp:929-931); this is the ``sentinel`` argument.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax

from .doubling import SENT_LARGE, SENT_SMALL


def lf_successor(
    L: jnp.ndarray, base: jnp.ndarray, sentinel: str, starts: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Successor table P: P[i] = bucket_start[L[i]] + occ(i) with the base
    twist.  occ is computed with one stable sort instead of a serial counter
    roll.  ``starts`` overrides the bucket bases (the a6 'var' inverse needs
    Huffman-code-ordered buckets, see core/a6.py)."""
    n = L.shape[0]
    Li = L.astype(jnp.int32)
    counts = jnp.zeros((256,), jnp.int32).at[Li].add(1)
    # occ is always measured against byte-ordered slots (that is the order
    # the stable sort below produces); custom ``starts`` only relocate the
    # bucket bases in the final add
    natural = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    if starts is None:
        starts = natural

    iota = lax.iota(jnp.int32, n)
    _, sorted_idx = lax.sort((Li, iota), num_keys=1)  # stable within char
    pos_in_sorted = jnp.zeros((n,), jnp.int32).at[sorted_idx].set(iota)
    occ_natural = pos_in_sorted - natural[Li]  # occurrences before i, index order

    # base processed first (a4/'small') or last (a7/'large') instead of at
    # its natural index position: adjust occurrence counts of same-char slots.
    same = (Li == Li[base]).astype(jnp.int32)
    if sentinel == SENT_SMALL:
        # base jumps to front: everyone before it with the same char shifts +1
        adj = jnp.where((iota < base) & (same == 1), 1, 0)
        occ = occ_natural + adj
        occ = occ.at[base].set(0)
    else:
        # base jumps to the end: everyone after it with the same char shifts -1
        adj = jnp.where((iota > base) & (same == 1), -1, 0)
        occ = occ_natural + adj
        occ = occ.at[base].set(counts[Li[base]] - 1)
    return starts[Li] + occ


def pointer_walk(L: jnp.ndarray, P: jnp.ndarray, base: jnp.ndarray) -> jnp.ndarray:
    """Emit L[base], L[P[base]], ... via pointer doubling (log n rounds of
    jump-table squaring) — the parallel answer to the serial chain
    (a6/src/bwt.c:473-478)."""
    n = L.shape[0]
    rounds = max(1, math.ceil(math.log2(n))) if n > 1 else 0
    pos = jnp.zeros((n,), jnp.int32).at[0].set(base)
    filled = 1
    jump = P
    for _ in range(rounds):
        take = min(filled, n - filled)
        if take > 0:
            ext = jump[lax.dynamic_slice(pos, (0,), (filled,))][:take]
            pos = lax.dynamic_update_slice(pos, ext, (filled,))
            filled += take
        if filled < n:
            jump = jump[jump]
    return L[pos]


@functools.partial(jax.jit, static_argnames=())
def bwt_inverse_with_starts(L: jnp.ndarray, base: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    """Inverse with caller-supplied (e.g. code-ordered) bucket starts;
    base-last roll convention (the a6/a7 family)."""
    if L.shape[0] == 0:
        return jnp.zeros((0,), jnp.uint8)
    P = lf_successor(L, base, SENT_LARGE, starts)
    return pointer_walk(L, P, base)


@functools.partial(jax.jit, static_argnames=("sentinel",))
def bwt_inverse(L: jnp.ndarray, base: jnp.ndarray, sentinel: str = SENT_SMALL) -> jnp.ndarray:
    """Invert (L, base); returns the reverse of the pre-BWT string (which for
    the a4/a7 formats is the original unreversed text — see golden/sa.py).

    Pointer doubling: out_pos[t] = P^t[base].  Round r extends the known
    prefix of the walk from 2^r to 2^(r+1) positions with one gather, while
    squaring the jump table with another — 2 n log n total gather work,
    replacing the serial n-step chain (a6/src/bwt.c:473-478).
    """
    n = L.shape[0]
    if n == 0:
        return jnp.zeros((0,), jnp.uint8)
    P = lf_successor(L, base, sentinel)
    return pointer_walk(L, P, base)
