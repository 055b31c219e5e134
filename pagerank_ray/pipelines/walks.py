"""Deterministic random-walk sampling over a CSR graph (DeepWalk/node2vec
corpus generation — Perozzi et al. KDD'14).

The walk frontier is a parameter-bounded set (one walker per seed, like a
top-k), but the GRAPH never leaves the cluster: a small actor pool loads the
CSR shards once (§2.3 T1 residency — the prompt's "shared index" case) and
each step routes only the walker positions to the actor owning that vertex
range — O(n_walks) driver traffic per step, O(n_walks · L) total, never
O(V) or O(E).

Determinism: the walker at u on step t moves to
``neighbors(u)[fmix64(walk_id · SALT + t) mod deg(u)]`` where neighbors are
the CSR's dst-sorted adjacency (build_shard_table sorts (src, dst), and the
dense id map preserves original-id order, so the rank is the ORDER BY d rank
the SQL oracle computes). Walkers on degree-0 vertices stay in place.
"""

from __future__ import annotations

import numpy as np
import ray

from pagerank_ray.functions.text import fmix64
from pagerank_ray.state.superstep import (
    _load_shard_arrays,
    assign_parts_to_workers,
)
from pagerank_ray.stages.csr import read_manifest, shard_path

SALT = np.uint64(1_000_003)


@ray.remote(num_cpus=0.5)
class _WalkShard:
    """Resident adjacency for a contiguous vertex range [lo, hi)."""

    def __init__(self, paths: list[str]):
        parts = [_load_shard_arrays(p) for p in paths]
        parts.sort(key=lambda x: x[0])
        self.lo = parts[0][0]
        self.hi = parts[-1][1]
        indptr = np.zeros(self.hi - self.lo + 1, dtype=np.int64)
        chunks = []
        base = 0
        for lo, hi, ip, dst, _w in parts:
            indptr[lo - self.lo : hi - self.lo + 1] = ip + base
            base += len(dst)
            chunks.append(dst)
        self.indptr = indptr
        self.dst = np.concatenate(chunks) if chunks else np.empty(0, np.int64)

    def step(self, cur: np.ndarray, h: np.ndarray) -> np.ndarray:
        local = cur - self.lo
        start = self.indptr[local]
        deg = self.indptr[local + 1] - start
        nxt = cur.copy()  # degree-0 walkers stay in place
        nz = deg > 0
        if nz.any():
            idx = (h[nz] % deg[nz].astype(np.uint64)).astype(np.int64)
            nxt[nz] = self.dst[start[nz] + idx]
        return nxt


def random_walks(
    csr_dir: str,
    seeds: np.ndarray,
    walk_ids: np.ndarray,
    *,
    length: int,
    n_workers: int,
) -> "np.ndarray":
    """Walk ``length`` steps from each seed; returns an int64 array of shape
    (n_walks, length + 1) — row w is the full trajectory of walk w (dense
    vertex ids). ``walk_ids`` feed the hash (original seed ids, so the SQL
    oracle reproduces the choices without the dense map)."""
    manifest = read_manifest(csr_dir)
    groups = assign_parts_to_workers(manifest, n_workers)
    actors, bounds = [], []
    for g in groups:
        paths = [shard_path(csr_dir, p) for p in g]
        actors.append(_WalkShard.remote(paths))
    # range starts for routing (cuts are global part boundaries)
    cuts = np.asarray(manifest["cuts"], dtype=np.int64)
    n_parts = manifest["n_parts"]
    part_lo = np.concatenate([[0], cuts])
    group_lo = np.array([part_lo[g[0]] for g in groups], dtype=np.int64)

    cur = np.asarray(seeds, dtype=np.int64).copy()
    wid = np.asarray(walk_ids, dtype=np.uint64)
    traj = np.empty((len(cur), length + 1), dtype=np.int64)
    traj[:, 0] = cur
    try:
        for t in range(1, length + 1):
            with np.errstate(over="ignore"):
                h = fmix64(wid * SALT + np.uint64(t))
            owner = np.searchsorted(group_lo, cur, side="right") - 1
            nxt = np.empty_like(cur)
            futs, masks = [], []
            for i, a in enumerate(actors):
                m = owner == i
                if m.any():
                    futs.append(a.step.remote(cur[m], h[m]))
                    masks.append(m)
            for m, r in zip(masks, ray.get(futs)):
                nxt[m] = r
            cur = nxt
            traj[:, t] = cur
    finally:
        # a mid-walk failure must not leak resident 0.5-CPU actors (they
        # would starve later Dataset work — see joins.pool_size rationale)
        for a in actors:
            ray.kill(a)
    return traj


# ---------------------------------------------------------------------------
# node2vec biased second-order walks (Grover & Leskovec, KDD 2016)
# ---------------------------------------------------------------------------

# pinned integer bias weights (exactly SQL-reproducible — no float alias
# tables): return to prev = W_RET, candidate adjacent to prev (distance 1,
# "stay local") = W_TRI, otherwise (distance 2, "explore") = W_OTH.
# Corresponds to node2vec p = W_TRI/W_RET, q = W_TRI/W_OTH.
W_RET = np.int64(1)
W_TRI = np.int64(4)
W_OTH = np.int64(2)
SALT2 = np.uint64(7_368_787)


@ray.remote(num_cpus=0.5)
class _BiasedWalkShard:
    """Adjacency shard for second-order steps: given each walker's current
    vertex (owned by this range) and its PREVIOUS vertex's sorted neighbor
    array (computed by the prior step's owner and carried with the walker),
    picks the bias-weighted neighbor and returns it together with the
    current vertex's neighbor array — the carry for the next step.

    The carried payload is O(deg(prev)) per walker — the walk frontier is
    parameter-bounded (like a top-k), and this on-the-fly membership test
    replaces the classic per-EDGE alias tables (O(Σ deg·deg) memory) that
    make precomputed node2vec notorious at scale."""

    def __init__(self, paths: list[str]):
        parts = [_load_shard_arrays(p) for p in paths]
        parts.sort(key=lambda x: x[0])
        self.lo = parts[0][0]
        self.hi = parts[-1][1]
        indptr = np.zeros(self.hi - self.lo + 1, dtype=np.int64)
        chunks = []
        base = 0
        for lo, hi, ip, dst, _w in parts:
            indptr[lo - self.lo : hi - self.lo + 1] = ip + base
            base += len(dst)
            chunks.append(dst)
        self.indptr = indptr
        self.dst = np.concatenate(chunks) if chunks else np.empty(0, np.int64)

    def neighbors(self, cur: np.ndarray) -> list[np.ndarray]:
        local = cur - self.lo
        return [
            self.dst[self.indptr[c] : self.indptr[c + 1]] for c in local
        ]

    def step(
        self,
        cur: np.ndarray,
        prev: np.ndarray,
        prev_nbrs: list[np.ndarray],
        h: np.ndarray,
    ) -> tuple[np.ndarray, list[np.ndarray]]:
        local = cur - self.lo
        nxt = cur.copy()
        carry: list[np.ndarray] = []
        for i in range(len(cur)):
            cand = self.dst[self.indptr[local[i]] : self.indptr[local[i] + 1]]
            if len(cand) == 0:
                carry.append(np.empty(0, np.int64))
                continue
            pn = prev_nbrs[i]
            pos = np.searchsorted(pn, cand)
            pos[pos >= len(pn)] = max(len(pn) - 1, 0)
            member = (pn[pos] == cand) if len(pn) else np.zeros(len(cand), bool)
            w = np.where(cand == prev[i], W_RET, np.where(member, W_TRI, W_OTH))
            cum = np.cumsum(w.astype(np.int64))
            r = np.int64(h[i] % np.uint64(cum[-1]))
            k = int(np.searchsorted(cum, r, side="right"))
            nxt[i] = cand[k]
            carry.append(cand)
        return nxt, carry


def node2vec_walks(
    csr_dir: str,
    seeds: np.ndarray,
    walk_ids: np.ndarray,
    *,
    length: int,
    n_workers: int,
) -> np.ndarray:
    """Second-order biased walks: step 1 is the first-order uniform-rank
    choice (same rule as ``random_walks``); steps ≥ 2 weight each candidate
    by (W_RET return / W_TRI triangle / W_OTH explore) and pick the first
    dst-sorted neighbor whose cumulative weight exceeds
    fmix64(walk·SALT2 + t) mod total."""
    manifest = read_manifest(csr_dir)
    groups = assign_parts_to_workers(manifest, n_workers)
    actors = [
        _BiasedWalkShard.remote([shard_path(csr_dir, p) for p in g]) for g in groups
    ]
    cuts = np.asarray(manifest["cuts"], dtype=np.int64)
    part_lo = np.concatenate([[0], cuts])
    group_lo = np.array([part_lo[g[0]] for g in groups], dtype=np.int64)

    cur = np.asarray(seeds, dtype=np.int64).copy()
    wid = np.asarray(walk_ids, dtype=np.uint64)
    nw = len(cur)
    traj = np.empty((nw, length + 1), dtype=np.int64)
    traj[:, 0] = cur

    def route(vals: np.ndarray):
        return np.searchsorted(group_lo, vals, side="right") - 1

    try:
        # step 1: first-order (uniform rank) + fetch the seeds' neighbor arrays
        with np.errstate(over="ignore"):
            h1 = fmix64(wid * SALT2 + np.uint64(1))
        owner = route(cur)
        nbrs: list[np.ndarray] = [None] * nw
        for i, a in enumerate(actors):
            m = np.flatnonzero(owner == i)
            if len(m):
                got = ray.get(a.neighbors.remote(cur[m]))
                for j, g in zip(m, got):
                    nbrs[j] = g
        prev = cur.copy()
        nxt = cur.copy()
        for i in range(nw):
            cand = nbrs[i]
            if len(cand):
                nxt[i] = cand[int(h1[i] % np.uint64(len(cand)))]
        cur = nxt
        traj[:, 1] = cur

        for t in range(2, length + 1):
            with np.errstate(over="ignore"):
                h = fmix64(wid * SALT2 + np.uint64(t))
            owner = route(cur)
            nxt = cur.copy()
            new_nbrs: list[np.ndarray] = [None] * nw
            futs, idxs = [], []
            for i, a in enumerate(actors):
                m = np.flatnonzero(owner == i)
                if len(m):
                    futs.append(
                        a.step.remote(cur[m], prev[m], [nbrs[j] for j in m], h[m])
                    )
                    idxs.append(m)
            for m, (nx, carry) in zip(idxs, ray.get(futs)):
                nxt[m] = nx
                for j, c in zip(m, carry):
                    new_nbrs[j] = c
            prev = cur
            cur = nxt
            nbrs = new_nbrs
            traj[:, t] = cur
    finally:
        # mid-walk failures must not leak the resident actors (cf. random_walks)
        for a in actors:
            ray.kill(a)
    return traj
