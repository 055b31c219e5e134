"""SNAP edge-list conformance I/O (reference format paths, SURVEY.md §2.1).

Reader: the reference's text format — first line ``n nnz``, then nnz lines of
1-indexed ``src dst`` pairs, decremented on read
(/root/reference/kernel_acsr.cu:364-416: reads ``n nnz`` then ``tmp_va--;
tmp_vb--``). Parallel edges and self-loops pass through exactly as the
reference reader keeps them; dedup is a separate, explicit stage (north_rule).

This is a conformance path, not a scale path — Parquet is the engine's
canonical format — so the parse is a single driver-side numpy pass.

Writer: one rank per line at fixed 6-decimal precision, vertex-id order — the
byte format all five reference backends emit (kernel_acsr.cu:812-817,
nvgraph_Pagerank.cpp:318-321), for golden diffs against reference outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def read_snap_edges(path: str) -> tuple[rd.Dataset, int]:
    """Parse the reference's 1-indexed edge-list format → (edges Dataset, n)."""
    with open(path) as f:
        header = f.readline().split()
        n, nnz = int(header[0]), int(header[1])
        pairs = np.loadtxt(f, dtype=np.int64, max_rows=nnz)
    if pairs.ndim == 1:
        pairs = pairs.reshape(1, -1)
    if len(pairs) != nnz:
        raise ValueError(f"{path}: header promised {nnz} edges, found {len(pairs)}")
    import pyarrow as pa

    table = pa.table(
        {
            "src_id": pa.array(pairs[:, 0] - 1, pa.int64()),  # 1-indexed on disk
            "dst_id": pa.array(pairs[:, 1] - 1, pa.int64()),
        }
    )
    return rd.from_arrow(table), n


def write_ranks_text(ranks: pd.DataFrame, path: str) -> None:
    """One rank per line, 6 decimals, vertex-id order (reference S3 format)."""
    df = ranks.sort_values("id")
    with open(path, "w") as f:
        for r in df["rank"]:
            f.write(f"{r:.6f}\n")
