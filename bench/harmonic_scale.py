"""Harmonic-centrality scale datapoint (BASELINE.md): the DISTRIBUTED
HyperBall path (tail_cutoff=0) on a synthetic power-law graph far beyond the
sf correctness graphs, next to a plain hyperball() run on the SAME edges so
the marginal cost of the in-exchange h-accumulator is measured directly.

Graph (deterministic, hash-generated per block, never materialized on the
driver): n vertices, m edges; src uniform per block range, dst power-law
(dst = h mod n cubed-down → hubs at low ids) — the same generator shape as
bench/scc_scale.py minus the bowtie split.

Run:  python bench/harmonic_scale.py [n_vertices] [n_edges] [rounds]
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
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 4
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def gen_block(t: pa.Table) -> pa.Table:
    import numpy as np

    from pagerank_ray.functions.text import fmix64

    ids = t.column("id").to_numpy().astype(np.uint64)
    h1 = fmix64(ids * np.uint64(2654435761) + np.uint64(11))
    h2 = fmix64(ids * np.uint64(2654435761) + np.uint64(12))
    src = (h1 % np.uint64(N)).astype(np.int64)
    u = (h2.astype(np.float64) / 2**64) ** 3  # power-law dst: hubs at low ids
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

    from pagerank_ray.pipelines.hyperball import harmonic_centrality, hyperball

    edges = (
        rd.range(M, override_num_blocks=4 * NCPU)
        .map_batches(
            lambda t: gen_block(t.rename_columns(["id"])), batch_format="pyarrow"
        )
        .materialize()
    )
    t0 = time.time()
    nf = hyperball(edges, rounds=ROUNDS, tail_cutoff=0)
    t_hb = time.time() - t0
    t0 = time.time()
    top = harmonic_centrality(edges, rounds=ROUNDS, k=20, tail_cutoff=0)
    t_hc = time.time() - t0
    print(json.dumps({
        "metric": "harmonic_scale",
        "n_vertices": N,
        "n_edges": M,
        "rounds": ROUNDS,
        "num_cpus": NCPU,
        "hyperball_sec": round(t_hb, 1),
        "harmonic_sec": round(t_hc, 1),
        "overhead_ratio": round(t_hc / t_hb, 3),
        "nf_last": int(nf["nf_scaled"].iloc[-1]),
        "top1_id": int(top.iloc[0]["id"]),
        "top20_in_first_decile": int((top["id"] < N // 10).sum()),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
