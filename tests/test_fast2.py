"""v2 measurement-tuned sorter vs golden model and v1."""

import numpy as np
import pytest

from archon_tpu.core.fast2 import bwt_forward_v2, suffix_array_fast2
from archon_tpu.golden import sa as golden
from archon_tpu.utils.corpus import gauntlet_cases, text_like


@pytest.mark.parametrize("sentinel", ["small", "large"])
def test_v2_matches_golden(sentinel):
    rng = np.random.default_rng(42)
    cases = [
        b"banana", b"mississippi", b"ab", b"ba", b"aaa",
        b"a" * 50 + b"b" + b"a" * 50,
        bytes(200),  # all zero
        text_like(5000, 1),
    ]
    for n in (256, 1333, 8192):
        for _ in range(3):
            alpha = int(rng.integers(2, 200))
            cases.append(bytes(rng.integers(0, alpha, n, dtype=np.uint8)))
    cases += list(gauntlet_cases(997).values())
    for data in cases:
        arr = np.frombuffer(data, np.uint8)
        want = golden.suffix_array(arr, sentinel)
        got = suffix_array_fast2(arr, sentinel)
        assert got.tolist() == want.tolist(), f"{sentinel} n={len(data)} {data[:30]!r}"


@pytest.mark.parametrize("sentinel", ["small", "large"])
def test_v2_bwt_matches_golden(sentinel):
    import jax.numpy as jnp

    for data in (text_like(4096, 9), b"abracadabra" * 100, bytes(64)):
        arr = np.frombuffer(bytes(data), np.uint8)
        L, base, rank = bwt_forward_v2(jnp.asarray(arr), sentinel)
        want_L, want_base = golden.bwt_forward(arr, sentinel)
        assert np.asarray(L).tolist() == want_L.tolist()
        assert int(base) == int(want_base)


@pytest.mark.parametrize("sentinel", ["small", "large"])
def test_v3_bwt_matches_golden(sentinel):
    import jax.numpy as jnp
    from archon_tpu.core.fast2 import bwt_v3

    rng = np.random.default_rng(7)
    cases = [
        b"", b"a", b"ab", b"banana", b"mississippi" * 40,
        bytes(128),                      # resolves instantly
        text_like(3000, 2),              # resolves in full rounds
        bytes(rng.integers(0, 4, 5000, dtype=np.uint8)),  # narrowed path
    ]
    cases += list(gauntlet_cases(701).values())
    for data in cases:
        arr = np.frombuffer(bytes(data), np.uint8)
        L, base = bwt_v3(jnp.asarray(arr), sentinel)
        want_L, want_base = golden.bwt_forward(arr, sentinel)
        assert np.asarray(L).tolist() == want_L.tolist(), f"{sentinel} n={len(data)}"
        assert int(base) == int(want_base), f"{sentinel} n={len(data)}"


def _planted_repeat(n, rep_len, alpha, seed):
    """Random data with one repeated block: leaves ~2*rep_len active
    suffixes tied to depth ~rep_len after the full rounds."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, alpha, n, dtype=np.uint8)
    blk = rng.integers(0, alpha, rep_len, dtype=np.uint8)
    base[1000 : 1000 + rep_len] = blk
    base[n // 2 : n // 2 + rep_len] = blk
    return base.tobytes()


@pytest.mark.parametrize("sentinel", ["small", "large"])
def test_v3_micro_tail_paths(sentinel):
    """Shapes verified (probe) to hit each emission branch of bwt_v3:
    - 100-byte repeat in 64Ki random bytes: 0 full rounds -> micro tail
      refining against the packed-trigram keys (G = p27);
    - 500-byte repeat in 32Ki binary data: 1 full round -> micro tail
      against the carried context-12 rank snapshot (G = rank);
    - 1000-byte repeat in 32Ki binary data: residue deeper than the micro
      tail's 16k context coverage -> micro runs, fails, cascade fallback."""
    import jax.numpy as jnp
    from archon_tpu.core.fast2 import bwt_v3

    cases = [
        _planted_repeat(65536, 100, 256, 11),   # micro, G = p27
        _planted_repeat(32768, 500, 2, 12),     # micro, G = rank snapshot
        _planted_repeat(32768, 1000, 2, 13),    # micro -> cascade fallback
    ]
    for data in cases:
        arr = np.frombuffer(data, np.uint8)
        L, base = bwt_v3(jnp.asarray(arr), sentinel)
        want_L, want_base = golden.bwt_forward(arr, sentinel)
        assert np.asarray(L).tolist() == want_L.tolist(), f"{sentinel} n={len(data)}"
        assert int(base) == int(want_base), f"{sentinel} n={len(data)}"


def test_v3_large_cascade_paths():
    """n > 2^20 gives three DISTINCT narrowing capacities (n/16, n/256,
    4096); heavy repetition keeps actives alive deep into the cascade."""
    import jax.numpy as jnp
    from archon_tpu.core.fast2 import bwt_v3

    n = (1 << 20) + (1 << 19)  # 1.5 Mi: caps 98304 / 6144 / 4096
    rng = np.random.default_rng(3)
    period = rng.integers(0, 4, 8192, dtype=np.uint8).tobytes()
    data = (period * (n // len(period) + 1))[:n]  # exact long periodicity
    arr = np.frombuffer(data, np.uint8)
    L, base = bwt_v3(jnp.asarray(arr), "small")
    want_L, want_base = golden.bwt_forward(arr, "small")
    assert np.asarray(L).tolist() == want_L.tolist()
    assert int(base) == int(want_base)
