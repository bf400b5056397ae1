"""Pallas TPU kernels for the segmented radix sort (experimental seed).

The roadmap (docs/PERF.md) replaces ``lax.sort`` in the doubling rounds with
a radix sort whose passes are: tile histogram -> exclusive scan -> staged
coalesced scatter.  This module holds the first building block — the
per-tile digit histogram — written against the Pallas TPU programming model
(VPU compare-accumulate over the 256 digit bins, one grid program per tile)
and validated in interpreter mode so development doesn't pay the ~60 s
remote-compile cycle per iteration.

Not yet wired into the production sorter.

Status/findings (round 1):
- kernel semantics validated in interpreter mode (tests);
- on-hardware Mosaic compilation is blocked in this environment by two
  findings recorded for the next iteration: (a) a 256-way unrolled bin loop
  explodes compile time through the remote-compile service; (b) the
  one-hot formulation's ``reshape(TILE, 1)`` of a (16, 128) block hits
  "infer-vector-layout: unsupported shape cast" — the layout-friendly form
  needs the one-hot compare built from 2D-native slices/iota only
  (elements kept in (sublane, lane) layout, bins in the lane dimension).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

TILE = 2048  # elements per grid program (as (16, 128) sublane x lane)
NBINS = 256


TILES_PER_PROGRAM = 8  # TPU output blocks need sublane dim divisible by 8


def _hist_kernel(keys_ref, out_ref):
    # keys_ref: (TILES_PER_PROGRAM*16, 128); out_ref: (TILES_PER_PROGRAM, 256)
    import jax.lax as lax

    digit = keys_ref[:] & (NBINS - 1)
    bins = lax.broadcasted_iota(jnp.int32, (TILE, NBINS), 1)
    # one-hot broadcast-compare per sub-tile (8 small iterations instead of
    # a 256-way unrolled bin loop, which blew up compile time)
    for t in range(TILES_PER_PROGRAM):
        sub = digit[t * 16 : (t + 1) * 16, :].reshape(TILE, 1)
        onehot = (sub == bins).astype(jnp.int32)
        out_ref[t, :] = jnp.sum(onehot, axis=0)


@functools.partial(jax.jit, static_argnames=("shift", "interpret"))
def digit_histogram(keys: jnp.ndarray, shift: int = 0, interpret: bool = False):
    """Per-tile 8-bit digit histograms of ``keys`` (int32, length divisible
    by TILE*TILES_PER_PROGRAM).  Returns (num_tiles, 256) counts; their
    exclusive scan gives the global scatter cursors of a radix pass."""
    from jax.experimental import pallas as pl

    n = keys.shape[0]
    chunk = TILE * TILES_PER_PROGRAM
    assert n % chunk == 0, f"n={n} must divide {chunk}"
    num_programs = n // chunk
    num_tiles = n // TILE
    shifted = (keys >> shift).reshape(num_tiles * 16, 128)

    return pl.pallas_call(
        _hist_kernel,
        grid=(num_programs,),
        in_specs=[pl.BlockSpec((TILES_PER_PROGRAM * 16, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((TILES_PER_PROGRAM, NBINS), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((num_tiles, NBINS), jnp.int32),
        interpret=interpret,
    )(shifted)


def radix_pass_reference(keys: jnp.ndarray, shift: int = 0):
    """numpy-semantics reference of one stable radix pass (oracle for the
    kernel assembly): returns the destination slot of every element."""
    import numpy as np

    k = np.asarray(keys)
    digit = (k >> shift) & (NBINS - 1)
    order = np.argsort(digit, kind="stable")
    dst = np.empty_like(order)
    dst[order] = np.arange(len(k))
    return dst
