"""SCC scale datapoint (BASELINE.md §4): FW-BW coloring over a synthetic
directed power-law graph with a web-like bowtie shape — a giant cycle-rich
core plus DAG periphery — far beyond the sf correctness graphs.

Graph (deterministic, hash-generated per block, never materialized on the
driver): n vertices; 85% of edges land src,dst in the core (first n/2 ids,
power-law dst) creating the giant SCC; 15% point periphery→core or
core→periphery (DAG edges → trivial SCCs + trims).

Run:  python bench/scc_scale.py [n_vertices] [n_edges] [n_workers]

Adversarial mode (VERDICT r4 item 5 datapoint):
      python bench/scc_scale.py --chain C K [n_workers]
builds a CHAIN of C K-cycles (cycle j = ids jK..jK+K-1, one bridge edge
jK+K-1 → jK+K). FW-BW coloring settles exactly ONE cycle per round (F = 0
everywhere, B = jK inside cycle j), so the run exercises max-depth round
recursion; per-round `secs` must TRACK the shrinking remnant (the r5
remnant compaction), not stay flat at O(n).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

CHAIN = len(sys.argv) > 1 and sys.argv[1] == "--chain"
if CHAIN:
    C = int(sys.argv[2])
    K = int(float(sys.argv[3]))
    W = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    N, M = C * K, 8 * C * K + C - 1  # 1 ham + 7 shortcuts per vertex + bridges
else:
    N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 2_000_000
    M = int(float(sys.argv[2])) if len(sys.argv) > 2 else 20_000_000
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 16


def gen_block(t: pa.Table) -> pa.Table:
    import numpy as np

    from pagerank_ray.functions.text import fmix64

    ids = t.column("id").to_numpy().astype(np.uint64)
    h1 = fmix64(ids * np.uint64(2654435761) + np.uint64(1))
    h2 = fmix64(ids * np.uint64(2654435761) + np.uint64(2))
    h3 = fmix64(ids * np.uint64(2654435761) + np.uint64(3))
    core = N // 2
    u = (h1 % np.uint64(100)).astype(np.int64)
    # power-law-ish dst inside the core: rank = floor(core * r^2.2)
    r = (h2 % np.uint64(1 << 30)).astype(np.float64) / float(1 << 30)
    dst_core = np.minimum((core * r ** 2.2).astype(np.int64), core - 1)
    src_core = (h3 % np.uint64(core)).astype(np.int64)
    src_any = (h3 % np.uint64(N)).astype(np.int64)
    dst_any = (h2 % np.uint64(N)).astype(np.int64)
    in_core = u < 85
    src = np.where(in_core, src_core, src_any)
    dst = np.where(in_core, dst_core, dst_any)
    return pa.table({"src_id": pa.array(src), "dst_id": pa.array(dst)})


def main():
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from pagerank_ray.pipelines.scc import strongly_connected_components

    if CHAIN:
        # chain of C strongly-connected K-clusters: cluster j = ids
        # jK..jK+K-1 with a Hamiltonian cycle (guarantees one SCC) plus 7
        # hash-random in-cluster shortcuts per vertex (keeps the hash-min
        # diameter O(log K)); one bridge edge jK+K-1 → jK+K per boundary.
        # FW-BW settles exactly one cluster per round → C rounds.
        def cluster_block(t: pa.Table) -> pa.Table:
            from pagerank_ray.functions.text import fmix64

            i = t.column("id").to_numpy().astype(np.int64)
            j = i // K
            base = j * K
            ham = base + (i - base + 1) % K
            srcs = [i]
            dsts = [ham]
            for tt in range(7):
                h = fmix64(i.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                           + np.uint64(tt + 1))
                srcs.append(i)
                dsts.append(base + (h % np.uint64(K)).astype(np.int64))
            return pa.table({"src_id": pa.array(np.concatenate(srcs)),
                             "dst_id": pa.array(np.concatenate(dsts))})

        bridges = pa.table({
            "src_id": pa.array((np.arange(C - 1, dtype=np.int64) + 1) * K - 1),
            "dst_id": pa.array((np.arange(C - 1, dtype=np.int64) + 1) * K),
        })
        edges = (
            rd.range(N, override_num_blocks=64)
            .map_batches(cluster_block, batch_format="pyarrow")
            .union(rd.from_arrow(bridges))
            .materialize()
        )
    else:
        edges = (
            rd.range(M, override_num_blocks=256)
            .map_batches(gen_block, batch_format="pyarrow")
            .materialize()
        )
    work = f"/tmp/pagerank_ray_bench/scc_scale_n{N}_m{M}"
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    t0 = time.perf_counter()
    res = strongly_connected_components(
        edges, N, work, n_workers=W,
        max_rounds=(C + 3) if CHAIN else 30,
    )
    wall = time.perf_counter() - t0
    # giant-SCC size: distributed label histogram (<= n_labels rows), max
    from pagerank_ray.stages.graph_build import grouped_count

    hist = grouped_count(res.result, "scc", "sz")
    giant = int(hist.max("sz"))
    n_rows = res.result.count()
    out = {
        "metric": "scc_scale",
        "n_vertices": N,
        "n_edges_generated": M,
        "n_workers": W,
        "rounds": res.rounds,
        "rows_labeled": n_rows,
        "giant_scc": giant,
        "wall_sec": round(wall, 1),
        "round_stats": res.round_stats,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
