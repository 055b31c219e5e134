"""Pure-NumPy reference-semantics oracles (SURVEY.md §5.2).

Dense, single-process, deliberately *different* algorithms/implementations from
the engine so agreement is meaningful:

- ``pagerank_oracle`` implements exactly the reference recurrence of
  /root/reference/kernel_bblock.cu:949-1085 / kernel_cusparse.cu:250-280
  (r⁰=1, remain = α·D/n + 1−α, L1 stop at ε=1e-6·n — kernel_acsr.cu:646).
- ``cc_oracle`` is union-find (the engine uses iterative hash-min BSP).
- ``lp_oracle`` is dense synchronous label propagation with the pinned tie rule.
- ``triangles_oracle`` is per-vertex adjacency-set intersection.

All operate on a deduplicated 0-indexed edge list (the north_rule edge table;
see SURVEY.md §2.7 on why the oracle must see the same deduped edges).
"""

from __future__ import annotations

import numpy as np


def pagerank_oracle(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    alpha: float = 0.85,
    eps_per_vertex: float = 1e-6,
    max_iters: int = 100,
    personalization: np.ndarray | None = None,
) -> tuple[np.ndarray, int, bool]:
    """Returns (ranks on mass-n scale, iterations, converged).

    personalization: optional length-n vector summing to 1 — the teleport
    weight generalization of lightSpMV/PageRank.h:313-343 (uniform 1/n ≡ the
    reference recurrence)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    out_deg = np.bincount(src, minlength=n)
    dangling = out_deg == 0
    inv = np.zeros(n, dtype=np.float64)
    inv[~dangling] = 1.0 / out_deg[~dangling]
    pers_n = np.ones(n) if personalization is None else np.asarray(personalization) * n
    r = pers_n.copy()
    eps = eps_per_vertex * n
    converged = False
    it = 0
    for it in range(1, max_iters + 1):
        d_mass = r[dangling].sum()
        remain = alpha * d_mass / n + (1.0 - alpha)
        contrib = r * inv
        acc = np.bincount(dst, weights=contrib[src], minlength=n)
        new = remain * pers_n + alpha * acc
        diff = np.abs(new - r).sum()
        r = new
        if diff <= eps:
            converged = True
            break
    return r, it, converged


def cc_oracle(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Union-find; label = min vertex id of the component."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(np.asarray(src), np.asarray(dst)):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return np.array([find(i) for i in range(n)], dtype=np.int64)


def _sym_adjacency(n: int, src: np.ndarray, dst: np.ndarray) -> list[np.ndarray]:
    a = np.concatenate([src, dst])
    b = np.concatenate([dst, src])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    adj: list[np.ndarray] = []
    split = np.searchsorted(pairs[:, 0], np.arange(n + 1))
    for v in range(n):
        adj.append(pairs[split[v] : split[v + 1], 1])
    return adj


def lp_oracle(
    n: int, src: np.ndarray, dst: np.ndarray, max_iters: int = 10
) -> tuple[np.ndarray, int]:
    """Synchronous LP on the symmetrized graph. label'(v) = most frequent
    neighbor label, ties → smallest label; no neighbors → keep. Returns
    (labels, iterations run)."""
    adj = _sym_adjacency(n, np.asarray(src), np.asarray(dst))
    labels = np.arange(n, dtype=np.int64)
    it = 0
    for it in range(1, max_iters + 1):
        new = labels.copy()
        for v in range(n):
            if len(adj[v]) == 0:
                continue
            neigh = labels[adj[v]]
            uniq, counts = np.unique(neigh, return_counts=True)
            new[v] = uniq[np.argmax(counts)]  # np.unique sorted → first max = smallest label
        if np.array_equal(new, labels):
            return labels, it
        labels = new
    return labels, it


def triangles_oracle(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Per-vertex triangle counts on the undirected simple graph (self-loops
    dropped). Adjacency-set intersection."""
    src = np.asarray(src)
    dst = np.asarray(dst)
    keep = src != dst
    adj_sets = [set() for _ in range(n)]
    for a, b in zip(src[keep], dst[keep]):
        adj_sets[int(a)].add(int(b))
        adj_sets[int(b)].add(int(a))
    counts = np.zeros(n, dtype=np.int64)
    for v in range(n):
        for w in adj_sets[v]:
            if w > v:
                common = adj_sets[v] & adj_sets[w]
                for u in common:
                    if u > w:
                        counts[v] += 1
                        counts[w] += 1
                        counts[u] += 1
    return counts
