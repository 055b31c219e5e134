"""Matching / coarsening / coloring scale datapoints (BASELINE.md): the
DISTRIBUTED paths on a synthetic power-law graph far beyond the sf
correctness graphs (the harmonic_scale/ppr_batch_scale generator shape).

- maximal_matching with tail_cutoff=0: every handshake round runs as
  Dataset stages (grouped-argmin over the 2x-edge explode + 4 attaches).
- coarsen_by_matching on the same edges (adds the contraction pass).
- greedy_coloring with a 200k-vertex tail cutoff: the distributed JP
  rounds carry the bulk of the graph, the in-memory tail finishes the
  remnant — the exact split a 100 TB run would use.

Run: python bench/matching_scale.py [n_vertices] [n_edges]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_000_000
M = int(float(sys.argv[2])) if len(sys.argv) > 2 else 20_000_000
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def gen_block(t: pa.Table) -> pa.Table:
    from pagerank_ray.functions.text import fmix64

    ids = t.column("id").to_numpy().astype(np.uint64)
    h1 = fmix64(ids * np.uint64(2654435761) + np.uint64(21))
    h2 = fmix64(ids * np.uint64(2654435761) + np.uint64(22))
    src = (h1 % np.uint64(N)).astype(np.int64)
    u = (h2.astype(np.float64) / 2**64) ** 3
    dst = np.minimum((u * N).astype(np.int64), N - 1)
    return pa.table(
        {"src_id": pa.array(src, pa.int64()), "dst_id": pa.array(dst, pa.int64())}
    )


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pagerank_ray.pipelines.coloring import greedy_coloring
    from pagerank_ray.pipelines.matching import coarsen_by_matching, maximal_matching

    edges = (
        rd.range(M, override_num_blocks=4 * NCPU)
        .map_batches(
            lambda t: gen_block(t.rename_columns(["id"])), batch_format="pyarrow"
        )
        .materialize()
    )
    t0 = time.time()
    pairs, m_rounds = maximal_matching(edges, tail_cutoff=0, max_rounds=20)
    t_match = time.time() - t0

    t0 = time.time()
    coarse, _ = coarsen_by_matching(edges, tail_cutoff=0, max_rounds=20)
    t_coarsen = time.time() - t0

    t0 = time.time()
    colors, c_rounds = greedy_coloring(edges, tail_cutoff=200_000, max_rounds=200)
    t_color = time.time() - t0
    n_colors = int(colors["color"].max()) + 1

    print(json.dumps({
        "metric": "matching_scale",
        "n_vertices_target": N,
        "n_edges": M,
        "num_cpus": NCPU,
        "matching_sec": round(t_match, 1),
        "matching_rounds": m_rounds,
        "matched_pairs": len(pairs),
        "coarsen_sec": round(t_coarsen, 1),
        "coarse_edges": len(coarse),
        "coloring_sec": round(t_color, 1),
        "coloring_rounds": c_rounds,
        "n_colors": n_colors,
        "n_colored_vertices": len(colors),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
