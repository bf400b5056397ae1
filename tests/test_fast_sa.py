"""Narrowed fast path vs golden model."""

import numpy as np
import pytest

from archon_tpu.core.fast import suffix_array_fast
from archon_tpu.golden import sa as golden
from archon_tpu.utils.corpus import gauntlet_cases


@pytest.mark.parametrize("sentinel", ["small", "large"])
def test_fast_matches_golden(sentinel):
    rng = np.random.default_rng(99)
    cases = [
        b"banana", b"mississippi", b"ab", b"a"*50 + b"b" + b"a"*50,
    ]
    for n in (256, 777):
        for _ in range(4):
            alpha = int(rng.integers(2, 200))
            cases.append(bytes(rng.integers(0, alpha, n, dtype=np.uint8)))
    cases += list(gauntlet_cases(997).values())
    for data in cases:
        arr = np.frombuffer(data, np.uint8)
        want = golden.suffix_array(arr, sentinel)
        got = suffix_array_fast(arr, sentinel)
        assert got.tolist() == want.tolist(), f"{sentinel} mismatch n={len(data)} {data[:30]!r}"
