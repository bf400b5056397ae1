"""Offline research instruments (ports of the reference's tool/ tree).

These fed design constants back into the reference's core (SURVEY.md
section 2.2); the ports keep that feedback loop available:

- ``estimate_it_groups``   <- a5/tool/estimate/estimate.c:11-83
- ``huffman_bits_per_sym`` <- a6/tool/compress/compress.c:59-99
- ``reorder_direct_volume``<- a6/tool/reorder/reorder.c:346-359 (the IT
  variant estimators: what fraction each split strategy sorts directly)
- ``radix_direction_bench``<- tool/radix_dir/radix.c:38-87 (scan-direction
  microbenchmark; on TPU the analog is lane-vs-sublane layout choice, so
  this reports the host-side numbers for the record)
- ``route_search``         <- a5/tool/route/route.cpp (derivation-plan
  search over IT-N group dependencies, simplified exhaustive form)
"""

from __future__ import annotations

import time

import numpy as np

from ..entropy.huffman import build_encoder_var
from ..ops.itn import it_masks, it2_lucky


def estimate_it_groups(data: np.ndarray, order: int = 3) -> dict[int, float]:
    """Frequency of each IT descent-mask group (a5/tool/estimate)."""
    mask = it_masks(np.asarray(data, np.uint8), order)
    counts = np.bincount(mask, minlength=1 << order)
    return {g: float(c) / max(len(data), 1) for g, c in enumerate(counts)}


def huffman_bits_per_sym(data: np.ndarray) -> float:
    """Exact-Huffman compression estimate (a6/tool/compress)."""
    data = np.asarray(data, np.uint8)
    freq = np.bincount(data, minlength=256)
    codes = build_encoder_var(freq)
    total = sum(int(freq[i]) * codes[i].length for i in range(256))
    return total / max(len(data), 1)


def reorder_direct_volume(data: np.ndarray) -> dict[str, float]:
    """Direct-sort volume of IT split variants (a6/tool/reorder): fraction
    of suffixes each strategy must comparison-sort."""
    data = np.asarray(data, np.uint8)
    n = max(len(data), 1)
    d = data.astype(np.int16)
    nxt = np.concatenate([d[1:], [-1]])
    prev = np.concatenate([[-1], d[:-1]])
    out = {
        # IT-1: strict descents sorted directly
        "it1": float(np.sum(d > nxt)) / n,
        # IT-2 (a4's predicate): local maxima
        "it2": float(np.sum((d > nxt) & (d >= prev))) / n,
        # IT-1s: runs collapsed (a6/tool/reorder fit1s idea): strict
        # descents not preceded by an equal symbol
        "it1s": float(np.sum((d > nxt) & (d != prev))) / n,
    }
    return out


def radix_direction_bench(size: int = 1 << 15, iters: int = 512) -> dict[str, float]:
    """Counting-sort scan-direction microbenchmark (tool/radix_dir):
    ascending vs descending accumulation over a byte histogram."""
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, size, dtype=np.uint8)
    t0 = time.perf_counter()
    for _ in range(iters):
        c = np.bincount(data, minlength=256)
        np.cumsum(c)
    asc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        c = np.bincount(data, minlength=256)
        np.cumsum(c[::-1])
    desc = time.perf_counter() - t0
    return {"ascending_s": asc, "descending_s": desc}


def route_search(order: int = 3) -> list[int]:
    """Simplified derivation-plan search (a5/tool/route): order IT groups so
    that groups derivable from already-ordered ones come later; returns a
    feasible derivation order of mask groups (suffix-dependency: group g is
    derivable from the groups of its one-step extensions, i.e. mask >> 1)."""
    ngroups = 1 << order
    placed: list[int] = []
    remaining = set(range(ngroups))
    # strict-descent groups (lsb set) are sorted directly first
    direct = sorted(g for g in remaining if g & 1)
    placed += direct
    remaining -= set(direct)
    while remaining:
        progress = False
        for g in sorted(remaining):
            if (g >> 1) in placed or (g >> 1) in direct:
                placed.append(g)
                remaining.discard(g)
                progress = True
                break
        if not progress:  # fall back: place smallest (cycle through runs)
            g = min(remaining)
            placed.append(g)
            remaining.discard(g)
    return placed


def varadix_orders(data: np.ndarray, rad_pow: int = 16) -> dict[str, int | float]:
    """Variable-length radix key study (a6/tool/varadix).

    The reference compares two radix-key schemes over the dense alphabet of
    a file: exact base-``nd`` keys packing as many symbols as fit in the
    radix budget (presize.c:25-48) vs power-of-2 bit keys using
    ceil(log2(nd)) bits per symbol (2pow.c:30-41).  Returns, for a
    ``2**rad_pow`` radix budget: the dense alphabet size, the context order
    each scheme achieves, and the bucket-utilization ratio of the pow-2
    scheme (exact keys always use the budget fully).
    """
    counts = np.bincount(np.asarray(data, np.uint8).ravel(), minlength=256)
    nd = int((counts > 0).sum())
    if nd <= 1:
        return {"symbols": nd, "exact_order": 0, "pow2_order": 0, "pow2_utilization": 0.0}
    max_rad = 1 << rad_pow
    ord_exact = 0
    v = 1
    while v * nd <= max_rad:
        v *= nd
        ord_exact += 1
    bits = int(np.ceil(np.log2(nd)))
    ord_pow2 = rad_pow // bits
    util = (nd ** ord_pow2) / float(1 << (bits * ord_pow2)) if ord_pow2 else 0.0
    return {
        "symbols": nd,
        "exact_order": ord_exact,
        "pow2_order": ord_pow2,
        "pow2_utilization": util,
    }


def memory_report(n: int, impl: str = "v3") -> dict[str, float]:
    """Working-set accounting per input byte — the parity of the reference's
    memory reporters (a6 ``bwt_memory`` bwt.c:225-230, a7 ``countMemory``
    archon.cpp:855-857; design budget 5N, README.md:15).

    The v3 doubling round holds: data+prev (2×u8), the 6-operand sort's
    inputs and outputs (rank + 3 shifted ranks + iota + prev_s, i32×5+u8),
    head/cummax temporaries (~2×i32, fused by XLA), and the deferred
    inversion pair (2×i32).  XLA reuses buffers across rounds, so the
    peak is one round's live set."""
    if impl == "v3":
        i32 = 4
        live = {
            "input+prev_bytes": 2,
            "sort_operands": 5 * i32 + 1,
            "sort_outputs": 5 * i32 + 1,
            "head/rank_temps": 2 * i32,
            "inversion_pair": 2 * i32,
        }
    elif impl == "doubling":
        i32 = 4
        live = {
            "input_bytes": 1,
            "rank+shifts": 4 * i32,
            "sort_outputs": 5 * i32,
            "temps": 2 * i32,
        }
    else:
        raise ValueError(impl)
    total = sum(live.values())
    return {**{k: float(v) for k, v in live.items()},
            "bytes_per_input_byte": float(total),
            "total_bytes": float(total) * n}
