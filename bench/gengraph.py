"""Deterministic synthetic power-law graph, generated straight into CSR shards.

For the scaling bench (BASELINE.md §3) the interesting object is the superstep
engine, not the extractor, so edges are synthesized vectorized (numpy) rather
than via HTML. The trick that makes generation embarrassingly parallel AND
partitioned-by-construction: shard task p draws its edges' *sources* uniformly
from its own vertex range [lo_p, hi_p) (seeded [seed, p]), and destinations
power-law over the full id space (dst = ⌊n·u^3⌋ → in-degree ∝ rank^(-3/4),
hub vertices at low ids — the skew regime the reference's degree bins target,
/root/reference/kernel_acsr.cu:419-451). ~8% of each range's vertices receive
no out-edges (dangling, cf. bookmark kernel_acsr.cu:403-406).

The shard files + manifest are identical for any CPU count, so an 8-CPU and a
32-CPU run consume the SAME input (the two-cluster-size protocol requirement).
"""

from __future__ import annotations

import json
import os

import numpy as np
import ray

from pagerank_ray.stages.csr import MANIFEST_NAME, build_shard_table, shard_path


@ray.remote
def _gen_shard(csr_dir: str, part: int, lo: int, hi: int, m_part: int, n: int, seed: int) -> int:
    out = shard_path(csr_dir, part)
    if os.path.exists(out):
        return m_part
    rng = np.random.default_rng([seed, part])
    size = hi - lo
    # ~8% dangling: draw sources only from the non-dangling prefix of a seeded permutation
    n_src = max(1, int(size * 0.92))
    src_pool = rng.permutation(size)[:n_src]
    src = lo + src_pool[rng.integers(0, n_src, m_part)]
    dst = (n * rng.random(m_part) ** 3.0).astype(np.int64)
    np.minimum(dst, n - 1, out=dst)
    import pyarrow.parquet as pq

    table = build_shard_table(part, src, dst, lo, hi)
    tmp = out + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, out)
    return m_part


def generate_bench_csr(
    csr_dir: str,
    *,
    n_vertices: int,
    n_edges: int,
    n_parts: int = 64,
    seed: int = 42,
) -> dict:
    """Build (or reuse) a deterministic CSR directory for the scaling bench."""
    os.makedirs(csr_dir, exist_ok=True)
    man_path = os.path.join(csr_dir, MANIFEST_NAME)
    if os.path.exists(man_path):
        with open(man_path) as f:
            return json.load(f)
    cuts = np.linspace(0, n_vertices, n_parts + 1)[1:-1].astype(np.int64)
    bounds = np.concatenate([[0], cuts, [n_vertices]])
    m_per = [n_edges // n_parts + (1 if p < n_edges % n_parts else 0) for p in range(n_parts)]
    done = ray.get(
        [
            _gen_shard.remote(
                csr_dir, p, int(bounds[p]), int(bounds[p + 1]), m_per[p], n_vertices, seed
            )
            for p in range(n_parts)
        ]
    )
    manifest = {
        "n_vertices": int(n_vertices),
        "n_parts": int(n_parts),
        "cuts": [int(c) for c in cuts],
        "n_edges": int(sum(done)),
        "edge_counts": {str(p): int(c) for p, c in enumerate(done)},
        "generator": {"seed": seed, "kind": "powerlaw_u3", "dangling_frac": 0.08},
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, man_path)
    return manifest
