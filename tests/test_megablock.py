"""Distributed (sharded megablock) suffix sort vs golden, on the CPU mesh."""

import numpy as np
import pytest

from archon_tpu.parallel.blocks import make_mesh
from archon_tpu.parallel.megablock import suffix_array_sharded
from archon_tpu.golden import sa as golden
from archon_tpu.utils.corpus import text_like, gauntlet_cases


@pytest.mark.parametrize("sentinel", ["small", "large"])
def test_sharded_matches_golden(sentinel):
    mesh = make_mesh({"sp": 8})
    rng = np.random.default_rng(17)
    cases = [
        np.frombuffer(text_like(4096), np.uint8),
        rng.integers(0, 4, 2048, dtype=np.uint8),
        rng.integers(0, 256, 4096, dtype=np.uint8),
        np.frombuffer(gauntlet_cases(2048)["fibonacci"], np.uint8),
        np.zeros(2048, np.uint8),  # one tie group spanning every shard
    ]
    for arr in cases:
        want = golden.suffix_array(arr, sentinel)
        got = suffix_array_sharded(arr, mesh, sentinel)
        assert got.tolist() == want.tolist(), f"{sentinel} n={len(arr)}"


def test_sharded_odd_sizes_and_two_shards():
    import jax

    mesh = make_mesh({"sp": 2}, devices=jax.devices()[:2])
    arr = np.frombuffer(text_like(1 << 10, seed=3), np.uint8)
    want = golden.suffix_array(arr, "small")
    got = suffix_array_sharded(arr, mesh, "small")
    assert got.tolist() == want.tolist()


@pytest.mark.parametrize("name", ["zeros", "fibonacci"])
def test_sharded_gauntlet_large(name):
    """VERDICT r1 item 3: shard-spanning tie groups at n >= 2^20 complete
    (the round-1 partitioner aborted here).  Exactness vs golden."""
    n = 1 << 20
    mesh = make_mesh({"sp": 8})
    if name == "zeros":
        arr = np.zeros(n, np.uint8)
    else:
        arr = np.frombuffer(gauntlet_cases(n)["fibonacci"], np.uint8)[:n]
    want = golden.suffix_array(arr, "small")
    got = suffix_array_sharded(arr, mesh, "small")
    np.testing.assert_array_equal(got, want)
