"""Pallas radix building blocks (interpret mode — CPU-safe)."""

import numpy as np
import jax.numpy as jnp

from archon_tpu.ops.pallas_radix import digit_histogram, radix_pass_reference, TILE


def test_digit_histogram_interpret():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 25, 8 * TILE, dtype=np.int32)
    for shift in (0, 8, 16):
        h = np.asarray(digit_histogram(jnp.asarray(keys), shift=shift, interpret=True))
        want = np.stack(
            [
                np.bincount((keys[i * TILE : (i + 1) * TILE] >> shift) & 255, minlength=256)
                for i in range(8)
            ]
        )
        assert (h == want).all()


def test_radix_pass_reference_is_stable_permutation():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1 << 16, 5000, dtype=np.int32)
    dst = radix_pass_reference(keys, shift=4)
    assert sorted(dst.tolist()) == list(range(5000))
    d = (keys >> 4) & 255
    out = np.empty_like(keys)
    out[dst] = keys
    od = (out >> 4) & 255
    assert (np.diff(od) >= 0).all()
