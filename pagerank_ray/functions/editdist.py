"""Vectorized Levenshtein (unit-cost Wagner-Fischer) over pair batches.

The DP loops run over CHARACTER POSITIONS (Lmax x Lmax iterations, ~150 for
short keys), with every cell update vectorized across the whole pair batch —
never a Python loop over pairs. Semantics match DuckDB's ``levenshtein``
(unit-cost insert/delete/substitute, case-sensitive) so fuzzy-join oracles
can recompute distances in SQL.
"""

from __future__ import annotations

import numpy as np


def _encode(names: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pad-encode strings to a (n, Lmax) int32 codepoint matrix + lengths."""
    lens = np.array([len(s) for s in names], np.int64)
    lmax = int(lens.max()) if len(lens) else 0
    enc = np.zeros((len(names), max(lmax, 1)), np.int32)
    for i, s in enumerate(names):
        if s:
            enc[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), np.int32)
    return enc, lens


def levenshtein_pairs(
    names: list[str], i_idx: np.ndarray, j_idx: np.ndarray
) -> np.ndarray:
    """Exact edit distances for the pairs (names[i], names[j]).

    DP rows are captured at each pair's own |s1| (padding cells are computed
    but never read: DP dependencies flow left-to-right / top-to-bottom, so
    cells at column <= |s2| never depend on padded columns)."""
    if len(i_idx) == 0:
        return np.zeros(0, np.int64)
    enc, lens = _encode(names)
    s1, s2 = enc[i_idx], enc[j_idx]
    l1, l2 = lens[i_idx], lens[j_idx]
    n_pairs = len(i_idx)
    l1max, l2max = int(l1.max()), int(l2.max())
    prev = np.broadcast_to(
        np.arange(l2max + 1, dtype=np.int64), (n_pairs, l2max + 1)
    ).copy()
    final = np.empty((n_pairs, l2max + 1), np.int64)
    final[l1 == 0] = prev[l1 == 0]
    for r in range(1, l1max + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = r
        c1 = s1[:, r - 1]
        for c in range(1, l2max + 1):
            cost = (c1 != s2[:, c - 1]).astype(np.int64)
            cur[:, c] = np.minimum(
                np.minimum(prev[:, c] + 1, cur[:, c - 1] + 1),
                prev[:, c - 1] + cost,
            )
        done = l1 == r
        if done.any():
            final[done] = cur[done]
        prev = cur
    return final[np.arange(n_pairs), l2]
