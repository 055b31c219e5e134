"""Batched-PPR scale datapoint (BASELINE.md): the DISTRIBUTED path
(tail_cutoff=0) on a synthetic power-law graph far beyond the sf
correctness graphs, next to K separate single-vector runs of the SAME code
on the SAME edges — measuring the batching advantage directly (one edge
pass carrying an (n, K) state matrix vs K passes).

Graph generator: the harmonic_scale.py shape (deterministic hash-generated
blocks, src uniform, dst cubed-down power-law — hubs at low ids).

Run:  python bench/ppr_batch_scale.py [n_vertices] [n_edges] [iters]
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
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
MODS = (97, 89, 83, 101)


def gen_block(t: pa.Table) -> pa.Table:
    from pagerank_ray.functions.text import fmix64

    ids = t.column("id").to_numpy().astype(np.uint64)
    h1 = fmix64(ids * np.uint64(2654435761) + np.uint64(11))
    h2 = fmix64(ids * np.uint64(2654435761) + np.uint64(12))
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

    from pagerank_ray.pipelines.ppr_batch import ppr_batch

    edges = (
        rd.range(M, override_num_blocks=4 * NCPU)
        .map_batches(
            lambda t: gen_block(t.rename_columns(["id"])), batch_format="pyarrow"
        )
        .materialize()
    )
    t0 = time.time()
    batched = ppr_batch(edges, mods=MODS, iters=ITERS, tail_cutoff=0)
    t_batch = time.time() - t0

    t0 = time.time()
    singles = []
    for m in MODS:
        singles.append(ppr_batch(edges, mods=(m,), iters=ITERS, tail_cutoff=0))
    t_single = time.time() - t0

    # batched ≡ K independent runs (same code path, K=1)
    max_abs = 0.0
    for j, s in enumerate(singles):
        max_abs = max(max_abs, float(
            np.abs(batched[f"rank_{j}"].to_numpy() - s["rank_0"].to_numpy()).max()))

    print(json.dumps({
        "metric": "ppr_batch_scale",
        "n_vertices": N,
        "n_edges": M,
        "iters": ITERS,
        "K": len(MODS),
        "num_cpus": NCPU,
        "batched_sec": round(t_batch, 1),
        "k_singles_sec": round(t_single, 1),
        "speedup": round(t_single / t_batch, 2),
        "max_abs_diff_vs_singles": max_abs,
        "mass_per_column": round(float(batched["rank_0"].sum()), 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
