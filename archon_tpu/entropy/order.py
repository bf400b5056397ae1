"""Alphabet reordering heuristics (a6/src/order.c).

NOTE: in the committed reference these are configured via ``-o`` but never
invoked (main.c stores ``f_order`` and no call site exists; the one intended
call site is commented out in bwt_start_fixed, bwt.c:69-77), so they do not
affect any output.  They are ported for component parity and for use as an
*actually wired* option in our CLI (off by default to preserve
byte-exactness).

All operate on the digram statistics matrix R2 built by ``order_init``
(order.c:34-44): R2[a][c] counts occurrences of symbol ``a`` whose most
recent *different* predecessor was ``c`` (runs collapsed).
"""

from __future__ import annotations

import numpy as np


def order_init(data: np.ndarray) -> np.ndarray:
    """Run-collapsed digram stats (order.c:34-44)."""
    R2 = np.zeros((256, 256), np.int64)
    b = c = 0xFF
    for a in data.tolist():
        if a != b:
            c = b
            b = a
        R2[a][c] += 1
    return R2


def order_none(R2: np.ndarray, dc: np.ndarray) -> np.ndarray:
    return dc


def order_freq(R2: np.ndarray, dc: np.ndarray) -> np.ndarray:
    """Sort symbols by descending row sums (order.c:64-73)."""
    freq = R2.sum(axis=1)
    key = freq[dc]
    return dc[np.argsort(-key, kind="stable")]


def order_bubble(R2: np.ndarray, dc: np.ndarray) -> np.ndarray:
    """Freq sort, then pairwise swap relaxation (order.c:126-142)."""
    dc = order_freq(R2, dc).copy()
    nd = len(dc)
    while True:
        b0, b1 = -1, 0
        for i in range(nd - 1):
            c0, c1 = dc[i], dc[i + 1]
            cur = int(R2[c1][c0]) - int(R2[c0][c1])
            if cur > b1:
                b0, b1 = i, cur
        if b1 == 0:
            break
        dc[b0], dc[b0 + 1] = dc[b0 + 1], dc[b0]
    return dc


def order_greedy(R2: np.ndarray, dc: np.ndarray) -> np.ndarray:
    """In/out-degree greedy placement (order.c:145-190)."""
    dc = dc.copy()
    ins = R2.sum(axis=1).astype(np.int64)
    ots = R2.sum(axis=0).astype(np.int64)
    p0, p1 = 0, len(dc)
    while p0 != p1:
        best_pos, best_val = -1, 0
        for i in range(p0, p1):
            ch = dc[i]
            val = int(ots[ch] - ins[ch])
            if ins[ch] * ots[ch] == 0:
                best_pos = i
                break
            if best_pos < 0 or val > best_val:
                best_pos, best_val = i, val
        ch = dc[best_pos]
        if ots[ch]:
            p1 -= 1
            i = p1
        else:
            i = p0
            p0 += 1
        dc[best_pos] = dc[i]
        dc[i] = ch
        ins -= R2[:, ch]
        ots -= R2[ch, :]
    return dc


def order_topo(R2: np.ndarray, dc: np.ndarray) -> np.ndarray:
    """DFS topological order over freq-sorted destination lists
    (order.c:95-123); iterative DFS to avoid Python recursion limits."""
    nd = len(dc)
    dest = {}
    for ci in dc.tolist():
        key = R2[ci][dc]
        dest[ci] = dc[np.argsort(-key, kind="stable")].tolist()
    state = {}
    stack_out = []
    work = [(int(dc[0]), 0)]
    state[int(dc[0])] = 1
    while work:
        elem, j = work.pop()
        advanced = False
        lst = dest[elem]
        while j < len(lst):
            d = lst[j]
            j += 1
            if state.get(d, 0) == 0:
                work.append((elem, j))
                state[d] = 1
                work.append((d, 0))
                advanced = True
                break
        if not advanced:
            state[elem] = 2
            stack_out.append(elem)
    # reference writes post-order into stack slots bottom-up
    return np.array(stack_out[: nd], dtype=dc.dtype)


ORDER_FUNCTIONS = {
    "none": order_none,
    "freq": order_freq,
    "greedy": order_greedy,
    "topo": order_topo,
    "bubble": order_bubble,
    # 'matrix' (order.c:76-91) is flagged "not correct!" by the author and
    # dumps debug files; intentionally not ported (SURVEY.md "what NOT to port").
}
