"""Sharded-megablock suffix sort: distributed prefix doubling over a mesh.

For inputs too large for one chip, the text shards across the ``sp`` mesh
axis and each doubling round runs as a distributed sort (SURVEY.md section 7
layer 8b; the all_to_all "rank merge" of BASELINE config 5):

1. shifted ranks r@k come from neighbor shards (halo/all_gather);
2. tuples (r0, r@k, r@2k, r@3k, pos) route to the shard owning their r0
   *range* with one all_to_all.  Positional ranks are sorted positions,
   hence near-uniform on [0, n): the range partitioner is balanced by
   construction — no splitter sampling needed (capacity-padded 2x for
   tie-group skew);
3. each shard sorts its received tuples locally — shard-ordered
   concatenation is the global order; boundary head flags travel by
   ppermute; global slot numbers come from an exclusive scan of per-shard
   counts;
4. new (pos, rank) pairs route back to the shard owning ``pos`` with a
   second all_to_all.

Per round: one local sort, two all_to_all, two ppermutes — all ICI
traffic.  One scalar (the surviving-tie count) reaches the host per round
for termination.  This is the scaling skeleton favored for clarity; the
driver dry-runs it on a virtual CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:  # jax >= 0.8 top-level API; experimental path kept for older jax
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core.doubling import SENT_LARGE, SENT_SMALL

AXIS = "sp"
BIG = np.int32(0x7FFFFFFF)


def _ring(nshards: int, step: int = 1):
    return [(i, (i + step) % nshards) for i in range(nshards)]


def _route(keys, values, dest, nshards: int, cap: int, valid_in=None):
    """all_to_all: element e -> shard dest[e] (elements with valid_in False
    are not sent).  Fixed per-destination capacity ``cap``; overflow is
    *counted* (not silent) so the caller can abort.  Returns (recv_keys,
    recv_values list, dropped); pads carry key=BIG / value=-1."""
    S = keys.shape[0]
    if valid_in is None:
        dest_eff = dest
    else:
        dest_eff = jnp.where(valid_in, dest, jnp.int32(nshards))
    order = jnp.argsort(dest_eff)
    dest_s = dest_eff[order]
    ks = keys[order]
    vs = [v[order] for v in values]
    counts = jnp.zeros((nshards + 1,), jnp.int32).at[dest_s].add(1)[:nshards]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1]])
    slot = lax.iota(jnp.int32, nshards * cap).reshape(nshards, cap)
    lane = slot % cap
    src = jnp.minimum(starts[:, None] + lane, S - 1)
    valid = lane < jnp.minimum(counts, cap)[:, None]
    dropped = jnp.sum(jnp.maximum(counts - cap, 0))
    send_k = jnp.where(valid, ks[src], BIG)
    send_vs = [jnp.where(valid, v[src], jnp.int32(-1)) for v in vs]
    recv_k = lax.all_to_all(send_k, AXIS, 0, 0)
    recv_vs = [lax.all_to_all(v, AXIS, 0, 0) for v in send_vs]
    return recv_k.reshape(-1), [v.reshape(-1) for v in recv_vs], dropped


def _make_round(mesh: Mesh, S: int, n: int, sentinel: str):
    """Build the jitted distributed round: (rank_shard, k) -> (rank, nactive)."""
    nshards = mesh.shape[AXIS]
    off_end = np.int32(-1) if sentinel == SENT_SMALL else np.int32(n + 1)
    # per-destination capacity: 4x the balanced average (skew slack); the
    # route reports overflow instead of corrupting
    cap = min(S, 4 * S // nshards + 64)

    def round_fn(rank_shard, k):
        shard_id = lax.axis_index(AXIS)
        iota = lax.iota(jnp.int32, S)
        pos = shard_id * S + iota

        # clarity-first shifted ranks: full all_gather (a bounded halo ring
        # replaces this at scale; volume is the whole rank array)
        rank_all = lax.all_gather(rank_shard, AXIS, tiled=True)

        def shifted(j):
            p = pos + j * k
            return jnp.where(p < n, rank_all[jnp.minimum(p, n - 1)], off_end)

        r0, r1, r2, r3 = rank_shard, shifted(1), shifted(2), shifted(3)

        dest = jnp.clip(r0 // S, 0, nshards - 1)
        rk, (g1, g2, g3, gpos), drop1 = _route(r0, (r1, r2, r3, pos), dest, nshards, cap)

        r0_s, r1_s, r2_s, r3_s, pos_s = lax.sort((rk, g1, g2, g3, gpos), num_keys=4)
        valid = r0_s != BIG
        nvalid = jnp.sum(valid.astype(jnp.int32))

        counts = lax.all_gather(nvalid, AXIS)
        base = jnp.sum(
            jnp.where(lax.iota(jnp.int32, nshards) < shard_id, counts, 0)
        )
        g_slot = base + jnp.cumsum(valid.astype(jnp.int32)) - 1

        # head flags; previous shard's last valid tuple via ppermute
        last_i = jnp.maximum(nvalid - 1, 0)
        last_tuple = jnp.stack([r0_s[last_i], r1_s[last_i], r2_s[last_i], r3_s[last_i]])
        prev = lax.ppermute(last_tuple, AXIS, _ring(nshards))
        cur = jnp.stack([r0_s, r1_s, r2_s, r3_s])
        before = jnp.concatenate([prev[:, None], cur[:, :-1]], axis=1)
        head = jnp.any(cur != before, axis=0)
        head = head.at[0].set(jnp.where(shard_id == 0, True, head[0]))
        head = head & valid

        # positional rank = global slot of group head; cross-shard carry
        local_head = lax.cummax(jnp.where(head, g_slot, -1))
        carry_in = lax.ppermute(local_head[-1:], AXIS, _ring(nshards))
        carry_in = jnp.where(shard_id == 0, jnp.int32(0), carry_in[0])
        new_rank_s = jnp.maximum(local_head, carry_in)

        # surviving ties: group size > 1.  next-slot head comes from the
        # next shard's first head flag
        nbr_first = lax.ppermute(head[:1], AXIS, _ring(nshards, -1))
        nxt_head = jnp.concatenate([head[1:], jnp.ones((1,), jnp.bool_)])
        nxt_head = nxt_head.at[-1].set(
            jnp.where(shard_id == nshards - 1, True, nbr_first[0])
        )
        active = valid & jnp.logical_not(head & nxt_head)
        nactive = lax.psum(jnp.sum(active.astype(jnp.int32)), AXIS)

        # route (pos, rank) back to pos-owner shards
        dest2 = jnp.clip(jnp.where(valid, pos_s // S, nshards - 1), 0, nshards - 1)
        key2 = jnp.where(valid, pos_s, BIG)
        rp, (rr,), drop2 = _route(key2, (new_rank_s,), dest2, nshards, cap, valid_in=valid)
        ok = rp != BIG
        local_p = jnp.where(ok, rp - shard_id * S, S)
        new_rank = jnp.zeros((S,), jnp.int32).at[local_p].set(
            jnp.where(ok, rr, 0), mode="drop"
        )
        dropped = lax.psum(drop1 + drop2, AXIS)
        return new_rank, nactive, dropped

    return jax.jit(
        shard_map(
            round_fn,
            mesh=mesh,
            in_specs=(P(AXIS), P()),
            out_specs=(P(AXIS), P(), P()),
        )
    )


def _make_init(mesh: Mesh, S: int, n: int, sentinel: str):
    """Seed positional ranks of the order-3 packed keys.

    The packing is a shard_map with a 2-symbol ppermute halo; the dense
    positional ranking of the packed keys runs as a plain jitted op over the
    sharded array — XLA SPMD inserts the collectives for the one global
    sort.  (Routing by r0 // S in the rounds needs *positional* ranks to be
    balanced, so this global normalization happens exactly once.)"""
    nshards = mesh.shape[AXIS]
    pad_val = np.int32(0 if sentinel == SENT_SMALL else 511)

    def pack_fn(data_shard):
        shard_id = lax.axis_index(AXIS)
        ext = data_shard.astype(jnp.int32) + 1
        halo = lax.ppermute(ext[:2], AXIS, _ring(nshards, -1))
        halo = jnp.where(
            shard_id == nshards - 1, jnp.full((2,), pad_val, jnp.int32), halo
        )
        extp = jnp.concatenate([ext, halo])
        return extp[:S] * (512 * 512) + extp[1 : S + 1] * 512 + extp[2 : S + 2]

    pack = shard_map(pack_fn, mesh=mesh, in_specs=(P(AXIS),), out_specs=P(AXIS))
    spec = NamedSharding(mesh, P(AXIS))

    @functools.partial(jax.jit, out_shardings=(spec, None))
    def init_fn(data):
        packed = pack(data)
        iota = lax.iota(jnp.int32, n)
        k_s, i_s = lax.sort((packed, iota), num_keys=1)
        head = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), k_s[1:] != k_s[:-1]]
        )
        pos_rank = lax.cummax(jnp.where(head, iota, 0))
        _, rank = lax.sort((i_s, pos_rank), num_keys=1)
        nxt = jnp.concatenate([head[1:], jnp.ones((1,), jnp.bool_)])
        nactive = jnp.sum(jnp.logical_not(head & nxt).astype(jnp.int32))
        return rank, nactive

    return init_fn


def suffix_array_sharded(data, mesh: Mesh, sentinel: str = SENT_SMALL) -> np.ndarray:
    """Distributed suffix array over mesh axis 'sp'.

    Skeleton limitations (documented, detected at runtime): the r0-range
    partitioner assumes no tie group outgrows a destination shard's
    capacity; a capacity overflow raises instead of silently corrupting.
    ``n`` must divide evenly by the shard count (the block container pads).
    """
    arr = np.asarray(data, np.uint8)
    n = len(arr)
    nshards = mesh.shape[AXIS]
    if n % nshards:
        raise ValueError(f"n={n} not divisible by {nshards} shards")
    S = n // nshards

    data_dev = jax.device_put(
        jnp.asarray(arr), NamedSharding(mesh, P(AXIS))
    )
    init = _make_init(mesh, S, n, sentinel)
    rnd = _make_round(mesh, S, n, sentinel)

    rank, nactive = init(data_dev)
    nactive = int(nactive)
    k = 3
    while nactive > 0 and k < n:
        rank, na, dropped = rnd(rank, jnp.int32(k))
        if int(dropped):
            raise RuntimeError(
                "megablock routing capacity overflow (tie group larger than "
                "a shard); increase shards or use the single-chip fast path"
            )
        nactive = int(na)
        k *= 4
    r = np.asarray(rank)
    sa = np.zeros(n, np.int32)
    sa[r] = np.arange(n, dtype=np.int32)
    return sa
