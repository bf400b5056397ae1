"""Pallas tiled bitonic merge sort vs numpy lexsort (interpret mode).

The kernel's on-hardware role is replacing ``lax.sort`` in the doubling
rounds (the measured wall, docs/PERF.md); these tests pin the semantics —
total-order multi-key compare, payload carriage, merge-path partitioning,
ragged tails — on the CPU interpreter with a small tile so the network
depth stays testable.  Hardware timing lives in the bench, not here.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from archon_tpu.ops.pallas_sort import sort_operands, sort_tiles

TILE = 128


def _check(key, iota, pays, tile=TILE):
    ops = [jnp.asarray(key), jnp.asarray(iota)] + [jnp.asarray(p) for p in pays]
    outs = sort_operands(tuple(ops), num_keys=2, tile=tile, interpret=True)
    order = np.lexsort((iota, key))
    assert np.array_equal(np.asarray(outs[0]), key[order])
    assert np.array_equal(np.asarray(outs[1]), iota[order])
    for got, p in zip(outs[2:], pays):
        assert np.array_equal(np.asarray(got), p[order])


def test_single_tile():
    rng = np.random.default_rng(0)
    key = rng.integers(0, 50, TILE).astype(np.int32)
    _check(key, np.arange(TILE, dtype=np.int32), [])


def test_one_merge_level_with_payload():
    rng = np.random.default_rng(1)
    n = 2 * TILE
    key = rng.integers(0, 9, n).astype(np.int32)  # heavy ties
    pay = rng.integers(-5000, 5000, n).astype(np.int32)
    _check(key, np.arange(n, dtype=np.int32), [pay])


def test_multiple_levels_and_ragged():
    rng = np.random.default_rng(2)
    for n in (4 * TILE, 3 * TILE + 17, 5 * TILE - 1, TILE + 1):
        key = rng.integers(0, 1 << 20, n).astype(np.int32)
        pay = rng.integers(0, 1 << 30, n).astype(np.int32)
        _check(key, np.arange(n, dtype=np.int32), [pay])


def test_all_equal_keys():
    n = 2 * TILE
    key = np.zeros(n, dtype=np.int32)
    _check(key, np.arange(n, dtype=np.int32), [])


def test_descending_input():
    n = 4 * TILE
    key = np.arange(n, dtype=np.int32)[::-1].copy()
    _check(key, np.arange(n, dtype=np.int32), [])


def test_three_keys():
    rng = np.random.default_rng(3)
    n = 2 * TILE + 100
    k0 = rng.integers(0, 4, n).astype(np.int32)
    k1 = rng.integers(0, 4, n).astype(np.int32)
    iota = np.arange(n, dtype=np.int32)
    pay = rng.integers(0, 99, n).astype(np.int32)
    outs = sort_operands(
        (jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(iota), jnp.asarray(pay)),
        num_keys=3,
        tile=TILE,
        interpret=True,
    )
    order = np.lexsort((iota, k1, k0))
    assert np.array_equal(np.asarray(outs[0]), k0[order])
    assert np.array_equal(np.asarray(outs[1]), k1[order])
    assert np.array_equal(np.asarray(outs[2]), iota[order])
    assert np.array_equal(np.asarray(outs[3]), pay[order])


def test_five_keys_quad_round_shape():
    """The quad round's drop-in shape: 4 rank keys + iota as the 5th key
    (the bitonic network is not stable, so the iota tie-breaker must be a
    key, not a payload) — the configuration scripts/measure_r3.py times."""
    rng = np.random.default_rng(5)
    n = 3 * TILE + 57
    ranks = [rng.integers(0, 6, n).astype(np.int32) for _ in range(4)]
    iota = np.arange(n, dtype=np.int32)
    outs = sort_operands(
        tuple(jnp.asarray(o) for o in (*ranks, iota)),
        num_keys=5,
        tile=TILE,
        interpret=True,
    )
    order = np.lexsort((iota, ranks[3], ranks[2], ranks[1], ranks[0]))
    for got, src in zip(outs, [*ranks, iota]):
        assert np.array_equal(np.asarray(got), src[order])


def test_sort_tiles_independent():
    rng = np.random.default_rng(4)
    n = 4 * TILE
    key = rng.integers(0, 1000, n).astype(np.int32)
    iota = np.arange(n, dtype=np.int32)
    outs = sort_tiles(
        (jnp.asarray(key), jnp.asarray(iota)), num_keys=2, tile=TILE,
        interpret=True,
    )
    k_s = np.asarray(outs[0])
    i_s = np.asarray(outs[1])
    for t in range(4):
        sl = slice(t * TILE, (t + 1) * TILE)
        order = np.lexsort((iota[sl], key[sl]))
        assert np.array_equal(k_s[sl], key[sl][order])
        assert np.array_equal(i_s[sl], iota[sl][order])
