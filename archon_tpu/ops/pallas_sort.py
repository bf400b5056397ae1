"""Pallas TPU sort: tiled bitonic sort + merge-path bitonic merge levels.

STATUS (closed, round 4): this kernel is a documented STUDY, not a
production path.  The decision measurement (docs/PERF.md "sort-primitive
decision") found the full pipelined ``lax.sort`` at 13.9 ms for 2 operands
at 2^22 — HALF the cost of this kernel's tile stage alone (28.4 ms) —
because both are VPU-compute-bound on the compare network, XLA's schedule
is simply better, and the hypothesized HBM-streaming tax amortizes away
under pipelined dispatch.  The merge levels additionally tripped a Mosaic
lowering bug (i8->i1 trunci; fixed here) and then a TPU-worker runtime
fault — recorded, not further debugged, since even a perfect fused merge
could not recover a 2x tile-stage deficit.

WARNING: the complete ``sort_operands`` path (tile + merge levels) is
KNOWN-CRASHING on hardware — the compiled kernel faulted and restarted
the TPU worker process on the shared relay, which also kills any
concurrent remote-compile RPCs and wedges the relay for ~20 minutes.  Do
NOT run the full path on shared TPU hardware; interpret-mode tests are
the supported way to exercise it.  Kept for its proven grid/DMA/roll
idioms (the repo's on-hardware Pallas foundation); wiring into the
production sorter was removed.

Original design rationale (superseded by the measurement above):
A sort that keeps tiles resident in VMEM pays the O(log^2 T) bitonic
stages at VPU speed and touches HBM only ~log(n/T) + 1 times:

  stage A  sort T-element tiles in VMEM (bitonic network, grid over tiles)
  stage B  repeat: merge sorted runs pairwise.  Each output tile's input
           ranges are found by a merge-path binary search (tiny, jnp); the
           kernel loads those two <=T slices, masks the tails, runs one
           bitonic *merge* (log 2T stages) and writes T sorted elements.

This is the same division of labor as the reference's GPU sorter — a
compare-exchange network as the device-side hot loop (odd-even merge
network, gpu/sh/s_merge.glv + k_sort.glv, driver gpu/Archon.boo:199-227) —
re-expressed for VMEM/VPU instead of transform-feedback draws.

API: ``sort_operands((a, b, ...), num_keys)`` mirrors ``lax.sort``:
int32 operands, lexicographic order on the first ``num_keys``, all
operands permuted together.  The comparison requires a TOTAL order to be
deterministic (bitonic networks are not stable): callers must include a
unique tie-breaker (e.g. iota) as the last key — every sort in this
pipeline already carries one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

INF = 0x7FFFFFFF  # plain int: jnp scalars would be captured consts in kernels

# tile size: elements per grid program, laid out (T//128, 128) row-major.
# 2^13 keeps the unrolled network at 91 stages and the VMEM footprint of
# a 6-operand merge (2T * 6 * 4B) at 384 KiB.
LOG_T = 13
T = 1 << LOG_T


def _flat_iota(R: int):
    r = lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    c = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    return r * 128 + c


def _lex_gt(a_ops, b_ops, num_keys: int):
    """a > b lexicographically on the first num_keys operands."""
    gt = None
    eq = None
    for i in range(num_keys):
        gi = a_ops[i] > b_ops[i]
        if gt is None:
            gt, eq = gi, a_ops[i] == b_ops[i]
        else:
            gt = gt | (eq & gi)
            if i + 1 < num_keys:
                eq = eq & (a_ops[i] == b_ops[i])
    return gt


def _roll(x, shift: int, axis: int):
    """Static circular roll that lowers on Mosaic (non-negative shifts only;
    jnp.roll/lax.rev are unimplemented there) and stays jnp elsewhere."""
    from jax.experimental.pallas import tpu as pltpu

    size = x.shape[axis]
    return pltpu.roll(x, shift % size, axis)


def _shift_flat(x, d: int, down: bool):
    """Circular shift in row-major flattened order: out[i] = x[i +/- d].
    Rows move with a sublane roll; sub-128 remainders move with a lane roll
    plus a next/prev-row carry select (Mosaic has no flattened view)."""
    R = x.shape[0]
    q, rm = (d // 128) % R, d % 128
    y = _roll(x, R - q, 0) if down else _roll(x, q, 0)
    if rm == 0:
        return y
    lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    if down:
        yl = _roll(y, 128 - rm, 1)
        carry = _roll(yl, R - 1, 0)  # next row's rotated values
        return jnp.where(lane < 128 - rm, yl, carry)
    yl = _roll(y, rm, 1)
    carry = _roll(yl, 1, 0)  # previous row's rotated values
    return jnp.where(lane >= rm, yl, carry)


def _xor_stage(ops, num_keys: int, j: int, desc_mask_fn):
    """Compare-exchange of XOR-partners (i, i^j), j a power of two, over
    (R, 128) row-major operands.  Partner values arrive by roll (lane roll
    for j < 128, sublane roll otherwise — XOR pairs never cross the axis
    boundary, so the circular wrap only feeds lanes that ignore it).

    desc_mask_fn(flat_iota) -> bool array marking descending pairs, or None
    for an all-ascending stage (a materialized all-false bool constant
    lowers through an i8->i1 trunci Mosaic rejects — probed on-relay r4).
    Relies on a total order (never-equal keys): swap = (a > b) XOR desc.
    """
    R = ops[0].shape[0]
    fid = _flat_iota(R)
    if j >= 128:
        q = j // 128
        down = lambda x: _roll(x, R - q, 0)
        up = lambda x: _roll(x, q, 0)
    else:
        down = lambda x: _roll(x, 128 - j, 1)
        up = lambda x: _roll(x, j, 1)
    is_low = (fid & j) == 0
    lo_ops, hi_ops = [], []
    for x in ops:
        dn, u = down(x), up(x)
        lo_ops.append(jnp.where(is_low, x, u))
        hi_ops.append(jnp.where(is_low, dn, x))
    swap = _lex_gt(lo_ops, hi_ops, num_keys)
    if desc_mask_fn is not None:
        swap = swap ^ desc_mask_fn(fid)
    return [
        jnp.where(swap, jnp.where(is_low, h, l), x)
        for x, l, h in zip(ops, lo_ops, hi_ops)
    ]


def _bitonic_sort_stages(ops, num_keys: int, n_elems: int):
    """Full bitonic sort network over row-major (R, 128) operands."""
    k = 2
    while k <= n_elems:
        j = k // 2
        while j >= 1:
            kk = k  # capture
            ops = _xor_stage(
                ops, num_keys, j, lambda fid, kk=kk: (fid & kk) != 0
            )
            j //= 2
        k *= 2
    return ops


def _oem_merge_stages(ops, num_keys: int, n_elems: int):
    """Batcher odd-even merge of two ascending halves of ``n_elems`` total
    (no flip/reversal — lax.rev has no Mosaic lowering).  Stage 1 compares
    (i, i + n/2) for i < n/2; each later stage d compares (i, i + d) for the
    elements with bit d set (and their partners), all ascending."""
    R = ops[0].shape[0]
    fid = _flat_iota(R)
    half = n_elems // 2
    ops = _xor_stage(ops, num_keys, half, None)
    d = half // 2
    while d >= 1:
        dn = [_shift_flat(x, d, down=True) for x in ops]
        u = [_shift_flat(x, d, down=False) for x in ops]
        is_low = (fid & d) != 0
        # boolean algebra, not where-select: keep every mask a product of
        # comparisons so nothing materializes an i8 bool tile for Mosaic
        active = (is_low & (fid + d < n_elems)) | (~is_low & (fid >= d))
        lo_ops = [jnp.where(is_low, x, uu) for x, uu in zip(ops, u)]
        hi_ops = [jnp.where(is_low, dd, x) for x, dd in zip(ops, dn)]
        swap = _lex_gt(lo_ops, hi_ops, num_keys) & active
        ops = [
            jnp.where(swap, jnp.where(is_low, dd, uu), x)
            for x, dd, uu in zip(ops, dn, u)
        ]
        d //= 2
    return ops


def _lex_less_at(keys, num_keys: int, i, j):
    """keys[i] < keys[j] lexicographically (jnp, clamped gathers)."""
    hi = keys[0].shape[0] - 1
    ic = jnp.clip(i, 0, hi)
    jc = jnp.clip(j, 0, hi)
    lt = None
    eq = None
    for kk in range(num_keys):
        a = keys[kk][ic]
        b = keys[kk][jc]
        li = a < b
        if lt is None:
            lt, eq = li, a == b
        else:
            lt = lt | (eq & li)
            if kk + 1 < num_keys:
                eq = eq & (a == b)
    return lt


def _merge_partition(keys, num_keys: int, L: int, tile: int, n_pad: int):
    """Merge-path split points for one merge level (runs of L -> 2L).

    For every output tile j (diagonal d = t*tile inside its run pair) finds
    a* = number of elements the merged output[:d] takes from the pair's A
    run, by binary search on the cross condition A[a-1] < B[d-a].  Returns
    (aLo, aCnt, bLo, bCnt) int32 arrays of length n_pad//tile.  All gathers
    are clamped; beyond-data reads hit the INF guard so real elements are
    always positioned exactly.
    """
    nt = n_pad // tile
    per_pair = (2 * L) // tile
    j = jnp.arange(nt, dtype=jnp.int32)
    pair = j // per_pair
    t = j % per_pair
    base = pair * (2 * L)
    bstart = base + L
    d = t * tile
    LA = jnp.clip(n_pad - base, 0, L)
    LB = jnp.clip(n_pad - bstart, 0, L)
    lo = jnp.maximum(d - LB, 0)
    hi = jnp.minimum(d, LA)
    steps = max(1, (L + 1).bit_length())
    for _ in range(steps):
        mid = (lo + hi + 1) // 2
        take = _lex_less_at(keys, num_keys, base + mid - 1, bstart + d - mid)
        take = take & (mid > lo)
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, hi, jnp.minimum(hi, mid - 1))
        hi = jnp.maximum(hi, lo)
    a = lo
    # aHi of tile j = a* of tile j+1 (same pair), or LA at the pair end
    a_next = jnp.concatenate([a[1:], jnp.zeros((1,), jnp.int32)])
    # a tile is the last of its pair either structurally or because the
    # pair is truncated at the padded end (j == nt-1)
    last_in_pair = (t == (per_pair - 1)) | (j == nt - 1)
    a_hi = jnp.where(last_in_pair, LA, a_next)
    aLo = base + a
    aCnt = a_hi - a
    bLo = jnp.minimum(bstart + (d - a), n_pad)
    bCnt = tile - aCnt
    return aLo, aCnt, bLo, bCnt


def _extract_from(scratch, rm, R: int):
    """First R*128 elements of row-major ``scratch`` (R+1, 128) starting at
    flat offset rm in [0, 128): dynamic lane roll with next-row carry."""
    from jax.experimental.pallas import tpu as pltpu

    xl = pltpu.roll(scratch, -rm, axis=1)
    lane = lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    return jnp.where(lane < 128 - rm, xl[:R, :], xl[1 : R + 1, :])


def _merge_kernel(num_keys, n_ops, tile, *refs):
    """Merge one output tile from its two input ranges (see _merge_partition).

    refs: [aLo, aCnt, bLo, bCnt] scalar-prefetch, then n_ops HBM inputs,
    then n_ops VMEM outputs, then 2*n_ops VMEM scratch buffers, then a DMA
    semaphore array."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    aLo, aCnt, bLo, bCnt = refs[:4]
    ins = refs[4 : 4 + n_ops]
    outs = refs[4 + n_ops : 4 + 2 * n_ops]
    scratch = refs[4 + 2 * n_ops : 4 + 4 * n_ops]
    sem = refs[-1]
    R = tile // 128
    j = pl.program_id(0)

    a_lo = aLo[j]
    b_lo = bLo[j]
    rowA, rmA = a_lo // 128, a_lo % 128
    rowB, rmB = b_lo // 128, b_lo % 128
    dmas = []
    for i in range(n_ops):
        d1 = pltpu.make_async_copy(
            ins[i].at[pl.ds(rowA, R + 1), :], scratch[2 * i], sem.at[2 * i]
        )
        d2 = pltpu.make_async_copy(
            ins[i].at[pl.ds(rowB, R + 1), :], scratch[2 * i + 1], sem.at[2 * i + 1]
        )
        d1.start()
        d2.start()
        dmas.append((d1, d2))
    for d1, d2 in dmas:
        d1.wait()
        d2.wait()

    pos = _flat_iota(R)
    a_keep = pos < aCnt[j]
    b_keep = pos < bCnt[j]
    ops = []
    for i in range(n_ops):
        av = _extract_from(scratch[2 * i][:], rmA, R)
        bv = _extract_from(scratch[2 * i + 1][:], rmB, R)
        if i < num_keys:
            av = jnp.where(a_keep, av, INF)
            bv = jnp.where(b_keep, bv, INF)
        ops.append(jnp.concatenate([av, bv], axis=0))
    ops = _oem_merge_stages(ops, num_keys, 2 * tile)
    for o, v in zip(outs, ops):
        o[:] = v[:R, :]


def _merge_level(operands, num_keys: int, L: int, tile: int, n_pad: int,
                 interpret: bool = False):
    """One merge level: sorted runs of L -> sorted runs of 2L."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_ops = len(operands)
    R = tile // 128
    nt = n_pad // tile
    aLo, aCnt, bLo, bCnt = _merge_partition(
        operands[:num_keys], num_keys, L, tile, n_pad
    )
    # DMA guard: loads read up to tile+128 elements past a clamped start
    guard_rows = R + 2
    padded = [
        jnp.concatenate(
            [x.reshape(n_pad // 128, 128), jnp.full((guard_rows, 128), INF)]
        )
        for x in operands
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_ops,
        out_specs=[
            pl.BlockSpec(
                (R, 128), lambda i, *_pf: (i, 0), memory_space=pltpu.VMEM
            )
        ]
        * n_ops,
        scratch_shapes=[pltpu.VMEM((R + 1, 128), jnp.int32)] * (2 * n_ops)
        + [pltpu.SemaphoreType.DMA((2 * n_ops,))],
    )
    outs = pl.pallas_call(
        functools.partial(_merge_kernel, num_keys, n_ops, tile),
        out_shape=[jax.ShapeDtypeStruct((n_pad // 128, 128), jnp.int32)] * n_ops,
        grid_spec=grid_spec,
        interpret=interpret,
    )(aLo, aCnt, bLo, bCnt, *padded)
    return [o.reshape(n_pad) for o in outs]


@functools.partial(jax.jit, static_argnames=("num_keys", "tile", "interpret"))
def sort_operands(operands, num_keys: int = 1, tile: int = T,
                  interpret: bool = False):
    """Drop-in for ``lax.sort(operands, num_keys=num_keys)`` on 1D int32
    operands — tiled bitonic sort + merge-path merge levels, all compare
    work in VMEM.

    Requirements: every key value < 0x7FFFFFFF, and the first ``num_keys``
    operands must form a TOTAL order (include a unique tie-breaker such as
    iota as the last key) — bitonic networks are not stable."""
    n = operands[0].shape[0]
    n_pad = -(-n // tile) * tile
    ops = [
        jnp.concatenate([x, jnp.full((n_pad - n,), INF)]) if n_pad != n else x
        for x in operands
    ]
    ops = sort_tiles(ops, num_keys, tile, interpret)
    L = tile
    while L < n_pad:
        ops = _merge_level(ops, num_keys, L, tile, n_pad, interpret)
        L *= 2
    if n_pad != n:
        ops = [o[:n] for o in ops]
    return ops


def _tile_sort_kernel(num_keys, n_ops, tile, *refs):
    ins, outs = refs[:n_ops], refs[n_ops:]
    ops = [r[:] for r in ins]
    ops = _bitonic_sort_stages(ops, num_keys, tile)
    for o, v in zip(outs, ops):
        o[:] = v


@functools.partial(jax.jit, static_argnames=("num_keys", "tile", "interpret"))
def sort_tiles(operands, num_keys: int = 1, tile: int = T, interpret: bool = False):
    """Sort each contiguous ``tile``-element run of the operands
    independently.  Operands: equal-length 1D int32 arrays, length divisible
    by ``tile`` (itself a multiple of 128: every exchange in the compare
    network is a lane or sublane roll over (tile//128, 128) blocks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = operands[0].shape[0]
    assert n % tile == 0 and tile % 128 == 0, (n, tile)
    n_ops = len(operands)
    R = tile // 128
    grid = n // tile
    spec = pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_tile_sort_kernel, num_keys, n_ops, tile),
        out_shape=[jax.ShapeDtypeStruct((n // 128, 128), jnp.int32)] * n_ops,
        grid=(grid,),
        in_specs=[spec] * n_ops,
        out_specs=[spec] * n_ops,
        interpret=interpret,
    )(*[x.reshape(n // 128, 128) for x in operands])
    return [o.reshape(n) for o in outs]
