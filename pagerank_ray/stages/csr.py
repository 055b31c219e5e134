"""CSR adjacency shards, partitioned by *source* vertex range (push model).

The reference holds one global CSC in VRAM (``destination_offsets_h`` /
``source_indices_h`` / ``weights_h``, /root/reference/kernel_acsr.cu:371-415).
The engine instead shards the adjacency by src-id range so that, each
superstep, a shard's gather reads only its own rank slice (range join by
construction — SURVEY.md §2.4 J1) and its scatter pre-aggregates contributions
per destination range before the all-to-all (the partial+final aggregate of
SURVEY.md §2.5 A1).

Weights need no storage: ``w(e) = 1/out_deg(src)`` (kernel_acsr.cu:410) is
derivable from ``diff(indptr)``; the dangling indicator (``bookmark_h``,
kernel_acsr.cu:403-406) is ``diff(indptr) == 0``.

Physical layout is resumable: one parquet file per shard under
``csr_dir/part-NNNNN.parquet`` plus a ``MANIFEST.json``; a rerun skips parts
whose file already exists.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

MANIFEST_NAME = "MANIFEST.json"


def part_of(ids: np.ndarray, cuts: np.ndarray) -> np.ndarray:
    return np.searchsorted(cuts, ids, side="right").astype(np.int32)


def part_bounds(part: int, cuts: np.ndarray, n: int) -> tuple[int, int]:
    lo = 0 if part == 0 else int(cuts[part - 1])
    hi = n if part == len(cuts) else int(cuts[part])
    return lo, hi


def _assign_part(cuts: np.ndarray):
    def fn(batch: pa.Table) -> pa.Table:
        src = batch.column("src_id").to_numpy(zero_copy_only=False)
        return batch.append_column("part", pa.array(part_of(src, cuts), pa.int32()))

    return fn


def build_shard_table(
    part: int,
    src: np.ndarray,
    dst: np.ndarray,
    lo: int,
    hi: int,
    weights: np.ndarray | None = None,
    normalize_weights: bool = True,
) -> pa.Table:
    """One CSR shard row from this part's edges. Intra-shard order fixed to
    (src, dst) for reproducible summation (SURVEY.md §4.4).

    ``weights``: optional per-edge weights. Because a part owns ALL out-edges
    of its src range, they are row-normalized HERE (w_uv / Σ_v w_uv per src)
    — the weighted generalization of the derived 1/out_deg (module doc): the
    superstep's gather then multiplies rank[src] by the stored weight instead
    of the uniform inverse degree."""
    size = hi - lo
    order = np.lexsort((dst, src))
    src_sorted = src[order] - lo
    dst_sorted = dst[order]
    counts = np.bincount(src_sorted, minlength=size)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    cols = {
        "part": pa.array([part], pa.int32()),
        "lo": pa.array([lo], pa.int64()),
        "hi": pa.array([hi], pa.int64()),
        "indptr": pa.array([indptr], pa.large_list(pa.int64())),
        "dst_ids": pa.array([dst_sorted.astype(np.int64)], pa.large_list(pa.int64())),
    }
    if weights is not None:
        w = weights[order].astype(np.float64)
        if normalize_weights:  # row-stochastic (PageRank); raw for SSSP
            nz = counts > 0
            starts = indptr[:-1][nz]
            totals = np.add.reduceat(w, starts) if len(starts) else np.array([], np.float64)
            per_edge_tot = np.repeat(totals, counts[nz])
            w = w / per_edge_tot
        cols["weights"] = pa.array([w], pa.large_list(pa.float64()))
    return pa.table(cols)


def shard_path(csr_dir: str, part: int) -> str:
    return os.path.join(csr_dir, f"part-{part:05d}.parquet")


def write_csr_shards(
    edges: rd.Dataset,
    n_vertices: int,
    cuts: np.ndarray,
    csr_dir: str,
    normalize_weights: bool = True,
) -> dict:
    """edges → per-part CSR parquet files + manifest. Shuffle #3 of the build
    (groupby part = dst-range… src-range exchange). Returns the manifest dict."""
    os.makedirs(csr_dir, exist_ok=True)
    n_parts = len(cuts) + 1
    cuts = np.asarray(cuts, dtype=np.int64)

    def write_group(df: pd.DataFrame) -> pd.DataFrame:
        part = int(df["part"].iloc[0])
        lo, hi = part_bounds(part, cuts, n_vertices)
        src = df["src_id"].to_numpy(dtype=np.int64)
        dst = df["dst_id"].to_numpy(dtype=np.int64)
        w = df["weight"].to_numpy(np.float64) if "weight" in df.columns else None
        table = build_shard_table(
            part, src, dst, lo, hi, weights=w, normalize_weights=normalize_weights
        )
        tmp = shard_path(csr_dir, part) + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, shard_path(csr_dir, part))  # atomic publish
        return pd.DataFrame(
            {"part": [part], "n_edges": [len(src)], "weighted": [w is not None]}
        )

    written = (
        edges.map_batches(_assign_part(cuts), batch_format="pyarrow")
        .groupby("part")
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()
    )
    if written.empty:  # zero-edge graph (all-dangling crawl)
        edge_counts: dict[int, int] = {}
        weighted = False
    else:
        edge_counts = dict(zip(written["part"].astype(int), written["n_edges"].astype(int)))
        weighted = bool(written["weighted"].any())
    # Parts with zero edges (all-dangling ranges) still need a shard file.
    for part in range(n_parts):
        if part not in edge_counts:
            lo, hi = part_bounds(part, cuts, n_vertices)
            empty = build_shard_table(
                part, np.array([], np.int64), np.array([], np.int64), lo, hi
            )
            tmp = shard_path(csr_dir, part) + ".tmp"
            pq.write_table(empty, tmp)
            os.replace(tmp, shard_path(csr_dir, part))
            edge_counts[part] = 0

    manifest = {
        "n_vertices": int(n_vertices),
        "n_parts": int(n_parts),
        "cuts": [int(c) for c in cuts],
        "n_edges": int(sum(edge_counts.values())),
        "edge_counts": {str(k): int(v) for k, v in sorted(edge_counts.items())},
        # build semantics, so a cached dir can never silently serve shards
        # built under the other weight normalization
        "normalize_weights": bool(normalize_weights),
        # whether any shard stores a per-edge weight column: BSPEngine uses
        # (weighted, normalize_weights) to reject mode/semantics mismatches
        "weighted": weighted,
    }
    tmp = os.path.join(csr_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(csr_dir, MANIFEST_NAME))
    return manifest


def read_manifest(csr_dir: str) -> dict:
    with open(os.path.join(csr_dir, MANIFEST_NAME)) as f:
        return json.load(f)


def symmetrize(edges: rd.Dataset) -> rd.Dataset:
    """Undirected edge set for CC/LP: both orientations of every distinct
    pair; self-loops collapse to a single (v, v).

    Shuffles only the CANONICAL (min, max) half through the pair-dedup —
    mirroring the deduped half back is shuffle-free (a map), identical to
    dedup(union(e, reverse(e))) but with half the dedup traffic (measured
    2.3× at 2M directed edges)."""

    def canon(batch: pa.Table) -> pa.Table:
        s = batch.column("src_id").to_numpy(zero_copy_only=False)
        d = batch.column("dst_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {"src_id": pa.array(np.minimum(s, d)), "dst_id": pa.array(np.maximum(s, d))}
        )

    def mirror_noself(df: pd.DataFrame) -> pd.DataFrame:
        # pandas in/out: dedup_pairs emits pandas blocks, and a union must not
        # mix block types (Ray's DelegatingBlockBuilder asserts on it)
        k = df["src_id"].to_numpy() != df["dst_id"].to_numpy()
        return pd.DataFrame(
            {"src_id": df["dst_id"].to_numpy()[k], "dst_id": df["src_id"].to_numpy()[k]}
        )

    from pagerank_ray.stages.graph_build import dedup_pairs

    und = dedup_pairs(edges.map_batches(canon, batch_format="pyarrow")).materialize()
    return und.union(und.map_batches(mirror_noself, batch_format="pandas"))
