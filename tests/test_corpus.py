"""Synthetic corpus classes (utils/corpus.py)."""

import numpy as np

from archon_tpu.utils.corpus import gauntlet_cases, markup_like, text_like


def test_text_like_prefix_stable():
    assert text_like(10000) == text_like(50000)[:10000]


def test_markup_like_prefix_stable_and_structured():
    small, big = markup_like(20000), markup_like(80000)
    assert small == big[:20000]
    # actually markup-shaped: the XML skeleton repeats many times
    assert small.count(b"<page>") > 5
    assert small.count(b"</revision>") >= 5
    assert b"[[" in small and b"&amp;" in small


def test_markup_tie_depth_profile():
    """The markup class must sit between word soup and Gauntlet pathologies:
    MORE positions tied after 3-byte context than text_like (exact skeleton
    repeats), but it still resolves without kilobyte-scale periodicity."""

    def tied_frac(data: bytes, k: int) -> float:
        a = np.frombuffer(data, np.uint8)
        n = len(a)
        view = np.lib.stride_tricks.sliding_window_view(
            np.concatenate([a, np.zeros(k, np.uint8)]), k
        )[:n]
        order = np.lexsort(view.T[::-1])
        s = view[order]
        head = np.ones(n, bool)
        head[1:] = (s[1:] != s[:-1]).any(axis=1)
        # tied = member of a >1-sized k-context group
        group = np.cumsum(head) - 1
        sizes = np.bincount(group)
        return float((sizes[group] > 1).mean())

    n = 1 << 16
    # deeper mid-k ties than word soup: at context 48 (where text_like fully
    # resolves at this size) a fifth of markup positions are still tied ...
    assert tied_frac(text_like(n), 48) < 0.02
    assert tied_frac(markup_like(n), 48) > 0.1
    # ... but unlike Gauntlet periodicity the tail is bounded: context 128
    # resolves ~everything
    assert tied_frac(markup_like(n), 128) < 0.05


def test_markup_container_roundtrip():
    from archon_tpu.io.blocks import decode_file, encode_file

    data = markup_like(1 << 16)
    blob = encode_file(data, "a4", block_size=1 << 14)
    assert decode_file(blob) == data


def test_markup_a6_var_roundtrip():
    from archon_tpu.core.a6 import a6_decode, a6_encode

    data = markup_like(1 << 14)
    blob = a6_encode(data, "var")
    assert a6_decode(blob, "var") == data


def test_gauntlet_cases_present():
    cases = gauntlet_cases(1 << 12)
    assert {"fibonacci", "period2", "zeros", "run_single"} <= set(cases)
