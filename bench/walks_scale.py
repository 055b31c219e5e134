"""node2vec walker-throughput datapoint (BASELINE.md; VERDICT r4 item 2):
corpus-generation walker counts (>=100k walkers) over a synthetic power-law
CSR, exercising the batched-ragged _BiasedWalkShard.step kernel.

Run:  python bench/walks_scale.py [n_vertices] [n_edges] [n_walkers] [length] [n_workers]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(float(sys.argv[1])) if len(sys.argv) > 1 else 1_000_000
M = int(float(sys.argv[2])) if len(sys.argv) > 2 else 10_000_000
NW = int(float(sys.argv[3])) if len(sys.argv) > 3 else 200_000
L = int(sys.argv[4]) if len(sys.argv) > 4 else 8
W = int(sys.argv[5]) if len(sys.argv) > 5 else 8


def main():
    import ray

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from bench.gengraph import generate_bench_csr
    from pagerank_ray.pipelines.walks import node2vec_walks, random_walks

    csr_dir = f"/tmp/walks_bench_csr_{N}_{M}"
    t0 = time.time()
    generate_bench_csr(csr_dir, n_vertices=N, n_edges=M, n_parts=4 * W)
    t_gen = time.time() - t0

    # seeds spread over the id space; walk_ids = seed ids (oracle convention)
    seeds = np.linspace(0, N - 1, NW).astype(np.int64)
    out = {"n_vertices": N, "n_edges": M, "n_walkers": NW, "length": L,
           "n_workers": W, "gen_sec": round(t_gen, 2)}
    for name, fn in [("node2vec", node2vec_walks), ("first_order", random_walks)]:
        t0 = time.time()
        traj = fn(csr_dir, seeds, seeds.astype(np.uint64), length=L, n_workers=W)
        dt = time.time() - t0
        assert traj.shape == (NW, L + 1)
        out[f"{name}_sec"] = round(dt, 2)
        out[f"{name}_walker_steps_per_sec"] = round(NW * L / dt)
        out[f"{name}_checksum"] = int(traj.sum() % (1 << 61))
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
