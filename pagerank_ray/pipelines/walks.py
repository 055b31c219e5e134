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
    for a in actors:
        ray.kill(a)
    return traj
