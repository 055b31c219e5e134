"""Vectorized Levenshtein (unit-cost Wagner-Fischer) over pair batches.

The DP loops run over SYMBOL POSITIONS (Lmax x Lmax iterations, ~150 for
short keys), with every cell update vectorized across the whole pair batch —
never a Python loop over pairs. Distances are computed over UTF-8 BYTES,
not codepoints, because DuckDB's ``levenshtein`` is byte-based (verified:
levenshtein('café','cafe') = 2 there) and fuzzy-join oracles recompute
distances in SQL — the two must agree on non-ASCII input too. Pair batches
are processed in bounded chunks so the DP working set stays O(chunk x Lmax)
regardless of how many pairs a block generates.
"""

from __future__ import annotations

import numpy as np

# pairs per DP slab: 3 int64 (chunk, Lmax+1) arrays ≈ 3*8*41*500k ≈ 0.5 GB
# at Lmax 40 — bounded per-task memory however large the caller's block is
_CHUNK = 500_000


def _encode(names: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Pad-encode strings to a (n, Lmax) uint8 UTF-8 byte matrix + lengths."""
    raw = [s.encode("utf-8") for s in names]
    lens = np.array([len(b) for b in raw], np.int64)
    lmax = int(lens.max()) if len(lens) else 0
    enc = np.zeros((len(names), max(lmax, 1)), np.uint8)
    for i, b in enumerate(raw):
        if b:
            enc[i, : len(b)] = np.frombuffer(b, np.uint8)
    return enc, lens


def levenshtein_pairs(
    names: list[str], i_idx: np.ndarray, j_idx: np.ndarray
) -> np.ndarray:
    """Exact byte-level edit distances for the pairs (names[i], names[j])."""
    if len(i_idx) == 0:
        return np.zeros(0, np.int64)
    enc, lens = _encode(names)
    out = np.empty(len(i_idx), np.int64)
    for lo in range(0, len(i_idx), _CHUNK):
        hi = min(lo + _CHUNK, len(i_idx))
        out[lo:hi] = _pairs_chunk(enc, lens, i_idx[lo:hi], j_idx[lo:hi])
    return out


def _pairs_chunk(
    enc: np.ndarray, lens: np.ndarray, i_idx: np.ndarray, j_idx: np.ndarray
) -> np.ndarray:
    """One bounded DP slab. Rows are captured at each pair's own |s1|
    (padding cells are computed but never read: DP dependencies flow
    left-to-right / top-to-bottom, so cells at column <= |s2| never depend
    on padded columns)."""
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
