"""Blocked prefix scan vs lax reference."""

import numpy as np
import jax.numpy as jnp
from jax import lax

from archon_tpu.ops.scan import blocked_cummax


def test_blocked_cummax_matches_lax():
    rng = np.random.default_rng(3)
    for shape in [(4096,), (3, 4096), (2, 1 << 15), (5, 777)]:
        x = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, shape, np.int32))
        got = blocked_cummax(x)
        want = lax.cummax(x, axis=x.ndim - 1)
        assert np.array_equal(np.asarray(got), np.asarray(want)), shape


def test_blocked_cummax_all_min():
    x = jnp.full((2, 2048), np.iinfo(np.int32).min, jnp.int32)
    got = blocked_cummax(x)
    assert np.array_equal(np.asarray(got), np.asarray(x))
