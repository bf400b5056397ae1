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
    ]
    for arr in cases:
        want = golden.suffix_array(arr, sentinel)
        got = suffix_array_sharded(arr, mesh, sentinel)
        assert got.tolist() == want.tolist(), f"{sentinel} n={len(arr)}"


def test_sharded_overflow_detected():
    mesh = make_mesh({"sp": 8})
    data = np.zeros(4096, np.uint8)  # one giant tie group
    with pytest.raises(RuntimeError, match="overflow"):
        suffix_array_sharded(data, mesh, "small")
