"""Flagship scale datapoint (BASELINE.md §4d): synthetic pages → extraction →
url dedup → graph build → converged PageRank, at page counts past the
object-store ceiling.

Spill-aware staging (VERDICT r4 item 8): runs with
``dedup_stage="extracted"`` — the url dedup shuffles the html-FREE extracted
table, so raw html (the dominant payload: ~8 KB/page ≫ the ~200 B/page of
link structure) streams through exactly ONE fused map stage
(synth → extract) and never enters a shuffle or a long-lived
materialization. Every phase hands off via partitioned parquet in work_dir
(build_graph), so the object store only ever holds one phase's working set.

Run:  python bench/flagship_scale.py [n_pages] [n_workers]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 4_000_000
W = int(sys.argv[2]) if len(sys.argv) > 2 else 16
# CPU budget follows the worker count instead of a hardcoded 32 so a
# larger W is never silently oversubscribed (r5 review finding)
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", max(32, 2 * W)))


def main():
    import shutil

    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pagerank_ray.pipelines.flagship import run_flagship
    from pagerank_ray.sources.pages import synth_pages_dataset

    work = f"/tmp/pagerank_ray_bench/flagship_{N}"
    shutil.rmtree(work, ignore_errors=True)
    pages = synth_pages_dataset(N, seed=42, concurrency=max(4, NCPU - 4))
    t0 = time.perf_counter()
    res, arts = run_flagship(pages, work, n_workers=W, checkpoint=False,
                             dedup_stage="extracted")
    wall = time.perf_counter() - t0
    out = {
        "metric": "flagship_scale",
        "n_pages": N,
        "n_workers": W,
        "n_vertices": arts["n_vertices"],
        "n_edges": arts["n_edges"],
        "converged": res.converged,
        "iterations": res.iterations,
        "mean_superstep_sec": round(res.mean_superstep_sec, 4),
        "edges_per_sec_superstep": int(arts["n_edges"] / res.mean_superstep_sec)
        if res.mean_superstep_sec else None,
        "wall_sec": round(wall, 1),
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
