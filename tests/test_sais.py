"""SA-IS study implementation vs golden."""

import numpy as np

from archon_tpu.ops.sais import sais
from archon_tpu.golden import sa as golden
from archon_tpu.utils.corpus import gauntlet_cases, text_like


def test_sais_matches_golden():
    rng = np.random.default_rng(3)
    cases = [b"banana", b"mississippi", b"abab", b"baa", b"cba", b"aaa", b"a", b"ab"]
    for _ in range(8):
        n = int(rng.integers(2, 600))
        a = int(rng.integers(2, 200))
        cases.append(bytes(rng.integers(0, a, n, dtype=np.uint8)))
    cases.append(text_like(3000))
    cases += [v[:700] for v in gauntlet_cases(700).values()]
    for data in cases:
        arr = np.frombuffer(data, np.uint8)
        want = golden.suffix_array(arr, "small")
        got = sais(arr)
        assert got.tolist() == want.tolist(), f"n={len(arr)} {data[:30]!r}"
