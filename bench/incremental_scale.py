"""Incremental-PageRank scale evidence (BASELINE.md §4d): warm-start vs cold.

Synthesizes the bench power-law graph ONCE per shard, splits each shard's
edge array into base (first 1-delta fraction) and full — "the last delta of
edges is today's crawl" — builds both CSR directories over the SAME vertex
universe, then measures iterations-to-L1-1e-6 for (a) a cold start on the
full graph and (b) a warm start from the converged base vector via the
range-aligned transfer_state hand-off (pipelines/pagerank.py:
pagerank_incremental mechanics, convergence-test variant).

Usage: python bench/incremental_scale.py [n_vertices n_edges delta]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pagerank_ray.stages.csr import MANIFEST_NAME, build_shard_table, shard_path

N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_000_000
M = int(float(sys.argv[2])) if len(sys.argv) > 2 else 40_000_000
DELTA = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
N_PARTS = 64
N_WORKERS = 16
SEED = 42
ROOT = "/tmp/pagerank_ray_bench/incremental"


@ray.remote
def _gen_pair_shard(base_dir, full_dir, part, lo, hi, m_part, n, seed, delta):
    rng = np.random.default_rng([seed, part])
    size = hi - lo
    n_src = max(1, int(size * 0.92))
    src_pool = rng.permutation(size)[:n_src]
    src = lo + src_pool[rng.integers(0, n_src, m_part)]
    dst = (n * rng.random(m_part) ** 3.0).astype(np.int64)
    np.minimum(dst, n - 1, out=dst)
    import pyarrow.parquet as pq

    m_base = int(m_part * (1.0 - delta))
    for d, s, t in ((base_dir, src[:m_base], dst[:m_base]), (full_dir, src, dst)):
        out = shard_path(d, part)
        if not os.path.exists(out):
            table = build_shard_table(part, s, t, lo, hi)
            pq.write_table(table, out + ".tmp")
            os.replace(out + ".tmp", out)
    return m_base, m_part


def _manifest(csr_dir, n, cuts, counts):
    man = {
        "n_vertices": int(n), "n_parts": len(counts),
        "cuts": [int(c) for c in cuts], "n_edges": int(sum(counts)),
        "edge_counts": {str(p): int(c) for p, c in enumerate(counts)},
        "generator": {"seed": SEED, "kind": "powerlaw_u3_incremental"},
    }
    with open(os.path.join(csr_dir, MANIFEST_NAME), "w") as f:
        json.dump(man, f)


def converge(eng, eps_per_vertex=1e-6, max_iters=200):
    n = eng.n
    iters, diff = 0, float("inf")
    t0 = time.perf_counter()
    while iters < max_iters and diff > eps_per_vertex * n:
        diff = eng._superstep()[0]
        eng.iteration += 1
        iters += 1
    return iters, diff, time.perf_counter() - t0


def main():
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from pagerank_ray.state.superstep import BSPEngine, MODE_PAGERANK, transfer_state

    base_dir, full_dir = os.path.join(ROOT, "base"), os.path.join(ROOT, "full")
    shutil.rmtree(ROOT, ignore_errors=True)
    os.makedirs(base_dir), os.makedirs(full_dir)
    cuts = np.linspace(0, N, N_PARTS + 1)[1:-1].astype(np.int64)
    bounds = np.concatenate([[0], cuts, [N]])
    m_per = [M // N_PARTS + (1 if p < M % N_PARTS else 0) for p in range(N_PARTS)]
    done = ray.get([
        _gen_pair_shard.remote(base_dir, full_dir, p, int(bounds[p]),
                               int(bounds[p + 1]), m_per[p], N, SEED, DELTA)
        for p in range(N_PARTS)
    ])
    _manifest(base_dir, N, cuts, [d[0] for d in done])
    _manifest(full_dir, N, cuts, [d[1] for d in done])

    # cold start on the full graph
    e_cold = BSPEngine(full_dir, n_workers=N_WORKERS, mode=MODE_PAGERANK)
    e_cold.init_state()
    cold_iters, cold_diff, cold_wall = converge(e_cold)
    e_cold.shutdown()

    # base convergence (yesterday's job, amortized) + warm restart on full
    e_base = BSPEngine(base_dir, n_workers=N_WORKERS, mode=MODE_PAGERANK)
    e_base.init_state()
    base_iters, _, base_wall = converge(e_base)
    e_full = BSPEngine(full_dir, n_workers=N_WORKERS, mode=MODE_PAGERANK)
    e_full.init_state()
    transfer_state(e_base, e_full)
    e_base.shutdown()
    warm_iters, warm_diff, warm_wall = converge(e_full)
    e_full.shutdown()

    print(json.dumps({
        "metric": "incremental_pagerank_warm_vs_cold",
        "n_vertices": N, "n_edges": int(sum(d[1] for d in done)),
        "delta_fraction": DELTA, "eps_per_vertex": 1e-6,
        "cold_iters": cold_iters, "cold_wall_sec": round(cold_wall, 2),
        "base_iters": base_iters, "base_wall_sec": round(base_wall, 2),
        "warm_iters": warm_iters, "warm_wall_sec": round(warm_wall, 2),
        "iter_speedup": round(cold_iters / max(warm_iters, 1), 2),
        "num_cpus": ncpu,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
