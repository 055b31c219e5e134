"""Pure-Ray-Data PageRank — the Dataset-API formulation of the superstep.

This is the parity/reference implementation of the BSP engine's superstep
(state/superstep.py) expressed entirely with Dataset primitives, per the
north-star phrasing: each iteration is ``map_batches`` gather-scatter over the
CSR shard dataset followed by a groupby-aggregate shuffle keyed by
destination-vertex range.

Per superstep:
1. rank slices live as per-part ObjectRefs (dict broadcast via ``ray.put``);
   each CSR shard batch fetches ONLY its own part's slice (range-join by
   construction — no full-vector broadcast);
2. ``map_batches(scatter)`` over the csr_shards dataset emits one row per
   (shard, target part): pre-aggregated sparse partials;
3. ``groupby("target").map_groups(combine)`` — the dst-range-keyed shuffle —
   sums partials, applies remain + α, and emits the new rank slice rows;
4. the driver materializes the P slice rows, re-publishes refs, checks the
   L1 diff, and loops.

It is deliberately NOT the fast path: every superstep pays Dataset execution
startup plus one all-to-all; the BSP actor engine holds CSR state resident
instead (see superstep.py's module docstring for the trade-off). Tests assert
both implementations produce identical ranks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data import Dataset

from pagerank_ray.stages.csr import part_bounds, read_manifest, shard_path


def _load_shards_dataset(csr_dir: str, manifest: dict) -> Dataset:
    paths = [shard_path(csr_dir, p) for p in range(manifest["n_parts"])]
    return rd.read_parquet(paths)


def pagerank_dataset(
    csr_dir: str,
    *,
    alpha: float = 0.85,
    eps_per_vertex: float = 1e-6,
    max_iters: int = 100,
) -> tuple[Dataset, int, bool]:
    """Returns (ranks dataset (id, rank), iterations, converged)."""
    manifest = read_manifest(csr_dir)
    n = manifest["n_vertices"]
    cuts = np.asarray(manifest["cuts"], dtype=np.int64)
    n_parts = manifest["n_parts"]
    eps = eps_per_vertex * n

    shards = _load_shards_dataset(csr_dir, manifest).materialize()

    # initial state: r = 1.0 per vertex (kernel_acsr.cu:37-45), one slice per part
    slices = {}
    for part in range(n_parts):
        lo, hi = part_bounds(part, cuts, n)
        slices[part] = ray.put(np.ones(hi - lo, dtype=np.float64))

    # static per-part dangling masks (from indptr) for the D aggregate
    def dangling_mass(batch: pa.Table, ranks_ref) -> pa.Table:
        ranks_by_part = ray.get(ranks_ref)
        parts, masses = [], []
        for i in range(batch.num_rows):
            part = batch.column("part")[i].as_py()
            indptr = np.asarray(batch.column("indptr")[i].values)
            r = ray.get(ranks_by_part[part])
            dang = np.diff(indptr) == 0
            parts.append(part)
            masses.append(float(r[dang].sum()))
        return pa.table({"part": pa.array(parts, pa.int32()), "d": pa.array(masses)})

    converged = False
    iteration = 0
    while iteration < max_iters:
        ranks_ref = ray.put(slices)

        d_rows = shards.map_batches(
            lambda t, ref=ranks_ref: dangling_mass(t, ref), batch_format="pyarrow"
        ).to_pandas()
        d_total = float(d_rows["d"].sum())
        remain = alpha * d_total / n + (1.0 - alpha)

        def scatter(batch: pa.Table, ref=ranks_ref) -> pa.Table:
            ranks_by_part = ray.get(ref)
            out_target, out_idx, out_vals = [], [], []
            for i in range(batch.num_rows):
                part = batch.column("part")[i].as_py()
                lo = batch.column("lo")[i].as_py()
                indptr = np.asarray(batch.column("indptr")[i].values)
                dst = np.asarray(batch.column("dst_ids")[i].values)
                r = ray.get(ranks_by_part[part])
                out_deg = np.diff(indptr)
                inv = np.zeros(len(out_deg))
                nz = out_deg > 0
                inv[nz] = 1.0 / out_deg[nz]
                contrib = r * inv
                vals = contrib[np.repeat(np.arange(len(out_deg)), out_deg)]
                order = np.argsort(dst, kind="stable")
                dst_s, vals_s = dst[order], vals[order]
                if not len(dst_s):
                    continue
                change = np.concatenate([[True], dst_s[1:] != dst_s[:-1]])
                starts = np.flatnonzero(change)
                gd = dst_s[starts]
                sums = np.add.reduceat(vals_s, starts)
                tgt = np.searchsorted(cuts, gd, side="right")
                t_slices = np.searchsorted(tgt, np.arange(n_parts + 1))
                for q in range(n_parts):
                    s, e = t_slices[q], t_slices[q + 1]
                    if e > s:
                        q_lo, _ = part_bounds(q, cuts, n)
                        out_target.append(q)
                        out_idx.append((gd[s:e] - q_lo).astype(np.int64))
                        out_vals.append(sums[s:e])
            return pa.table(
                {
                    "target": pa.array(out_target, pa.int32()),
                    "idx": pa.array(out_idx, pa.large_list(pa.int64())),
                    "vals": pa.array(out_vals, pa.large_list(pa.float64())),
                }
            )

        def combine(df, remain=remain):
            import pandas as pd

            part = int(df["target"].iloc[0])
            lo, hi = part_bounds(part, cuts, n)
            acc = np.zeros(hi - lo, dtype=np.float64)
            for idx, vals in zip(df["idx"], df["vals"]):
                acc[np.asarray(idx, dtype=np.int64)] += np.asarray(vals)
            new = remain + alpha * acc
            return pd.DataFrame({"part": [part], "ranks": [new.tolist()]})

        new_rows = (
            shards.map_batches(scatter, batch_format="pyarrow")
            .groupby("target")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()
        )
        new_slices = {}
        diff = 0.0
        for _, row in new_rows.iterrows():
            part = int(row["part"])
            arr = np.asarray(row["ranks"], dtype=np.float64)
            old = ray.get(slices[part])
            diff += float(np.abs(arr - old).sum())
            new_slices[part] = ray.put(arr)
        # parts that received no contributions keep remain-only ranks
        for part in range(n_parts):
            if part not in new_slices:
                lo, hi = part_bounds(part, cuts, n)
                arr = np.full(hi - lo, remain, dtype=np.float64)
                old = ray.get(slices[part])
                diff += float(np.abs(arr - old).sum())
                new_slices[part] = ray.put(arr)
        slices = new_slices
        iteration += 1
        if diff <= eps:
            converged = True
            break

    tables = []
    for part in range(n_parts):
        lo, hi = part_bounds(part, cuts, n)
        tables.append(
            pa.table(
                {
                    "id": pa.array(np.arange(lo, hi, dtype=np.int64)),
                    "rank": pa.array(ray.get(slices[part])),
                }
            )
        )
    return rd.from_arrow(pa.concat_tables(tables)), iteration, converged
