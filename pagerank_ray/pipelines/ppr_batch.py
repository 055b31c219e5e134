"""Batched personalized PageRank — K teleport vectors in ONE edge pass.

Topic-sensitive / multi-seed PPR (Haveliwala, WWW 2002; Jeh & Widom's
personalized PageRank) is run in production as MANY simultaneous rank
vectors over one immutable graph. Running K independent power iterations
costs K passes over the edge set; the classic batching optimization carries
the K rank values as a (n, K) matrix so every edge is read ONCE per
superstep and the gather/shuffle payload amortizes the topology across all
K queries. The reference's kernels are strictly K = 1 (one ``pagerank_d``
array, ``kernel_acsr.cu:202``); this module is the multi-query capability a
link-graph service layer needs on top of it.

Recurrence per column j (the exact M7 recurrence of
``state/superstep.py:415-432`` and ``tabular.q_pagerank_personalized``):

    pn_j(v) = n · p_j(v),  p_j uniform over seeds {v : v % mods[j] == 0}
    r⁰_j = pn_j
    r'_j(v) = (α·D_j/n + 1−α) · pn_j(v) + α · Σ_{u→v} r_j(u)/out_deg(u)

with D_j = Σ_{dangling u} r_j(u). All K columns advance in the same pass.

Determinism / oracle parity: the float expression above is evaluated with
the IDENTICAL association as the unrolled DuckDB oracle
(``__ray_entry__._ppr_batch_sql``): ``(1.0/k_j) * n`` two-step for pn,
division-before-sum for contributions, ``(α·D/n + (1−α)) · pn + α·inc``.
Final ranks round half-away at 6 decimals (the repo rounding contract).

Scale shape (the distributed path):
- static topology: edges (src_id, dst_id; ORIGINAL ids, deduped) + an
  out-degree table, built once;
- per superstep, ONE broadcast-or-hash attach of the K contribution
  columns onto the edge set (build side is the n-row state — broadcast
  under ``joins.BROADCAST_LIMIT``, Ray-native hash join beyond), one
  per-batch pre-aggregated + bucketed grouped sum for the K inc columns,
  and O(#batches) rows of dangling-mass partials to the driver;
- state rows (id, deg, pn_0.., r_0..) never reach the driver; the final
  per-vertex frame is the query-result contract, as everywhere else.
Edge sets under ``tail_cutoff`` run all supersteps in one in-memory task
(the hyperball/coreness in-memory-tail idiom) with the identical
arithmetic — parity-tested against the distributed path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray as _ray
import ray.data as rd

from pagerank_ray.functions.text import round_half_away
from pagerank_ray.stages import joins


def _seed_pn(ids: np.ndarray, mods: tuple[int, ...], seed_counts: np.ndarray,
             n: float) -> np.ndarray:
    """(len(ids), K) matrix of pn_j = (1.0/k_j) * n on seeds, else 0 — the
    two-step rounding of q_pagerank_personalized (1/k then ·n)."""
    pn = np.zeros((len(ids), len(mods)), np.float64)
    for j, m in enumerate(mods):
        pn[ids % m == 0, j] = (1.0 / seed_counts[j]) * n
    return pn


@_ray.remote
def _ppr_tail(e_blocks: list, mods: tuple[int, ...], iters: int,
              alpha: float) -> pa.Table:
    """All supersteps in one task over dense arrays — identical arithmetic
    to the distributed path (parity-tested)."""
    et = [t for t in _ray.get(list(e_blocks)) if t.num_rows]
    s = np.concatenate(
        [t.column("src_id").to_numpy(zero_copy_only=False) for t in et]
        or [np.array([], np.int64)]
    ).astype(np.int64)
    d = np.concatenate(
        [t.column("dst_id").to_numpy(zero_copy_only=False) for t in et]
        or [np.array([], np.int64)]
    ).astype(np.int64)
    ids = np.unique(np.concatenate([s, d]))
    n_int = len(ids)
    n = float(n_int)
    si = np.searchsorted(ids, s)
    di = np.searchsorted(ids, d)
    deg = np.bincount(si, minlength=n_int).astype(np.float64)
    dangling = deg == 0.0
    # static gather order: edges sorted by destination → one reduceat/superstep
    order = np.argsort(di, kind="stable")
    si_o, di_o = si[order], di[order]
    bounds = np.flatnonzero(np.concatenate(([True], di_o[1:] != di_o[:-1])))
    dst_u = di_o[bounds]
    k_counts = np.array([(ids % m == 0).sum() for m in mods], np.float64)
    if (k_counts == 0).any():
        raise ValueError(f"empty seed set for mods={mods}")
    pn = _seed_pn(ids, mods, k_counts, n)
    r = pn.copy()
    for _ in range(iters):
        dmass = r[dangling].sum(axis=0) if dangling.any() else np.zeros(len(mods))
        contrib = r[si_o] / deg[si_o, None]
        inc = np.zeros((n_int, len(mods)), np.float64)
        inc[dst_u] = np.add.reduceat(contrib, bounds, axis=0)
        r = (alpha * dmass / n + (1.0 - alpha)) * pn + alpha * inc
    cols: dict = {"id": pa.array(ids, pa.int64())}
    for j in range(len(mods)):
        cols[f"rank_{j}"] = pa.array(round_half_away(r[:, j], 6), pa.float64())
    return pa.table(cols)


def _grouped_sum_k(ds: rd.Dataset, k: int, *, n_buckets: int = 64) -> rd.Dataset:
    """(id, c_0..c_{k-1}) occurrence rows → per-id sums: per-batch partial
    groupby-sum, hash-bucketed grouped combine (the grouped_count idiom)."""
    cols = [f"c_{j}" for j in range(k)]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("id", sort=False)[cols].sum().reset_index()

    def bucketize(t: pa.Table) -> pa.Table:
        key = t.column("id").to_numpy(zero_copy_only=False)
        mixed = (key * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(partial, batch_format="pandas")
        .map_batches(lambda t: t.select(["id", *cols]), batch_format="pyarrow")
    )


def ppr_batch(
    edges: rd.Dataset,
    *,
    mods: tuple[int, ...] = (97, 89, 83, 101),
    iters: int = 10,
    alpha: float = 0.85,
    tail_cutoff: int = 4_000_000,
) -> pd.DataFrame:
    """edges (src_id, dst_id; original ids, deduped) → per-vertex frame
    (id, rank_0..rank_{K-1}) after ``iters`` batched-PPR supersteps, ranks
    rounded half-away at 6. One edge pass per superstep for all K columns."""
    K = len(mods)
    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges <= tail_cutoff:
        tbl = _ray.get(_ppr_tail.remote(edges.to_arrow_refs(), tuple(mods), iters, alpha))
        return tbl.to_pandas()

    from pagerank_ray.stages.graph_build import distinct_values, grouped_count

    verts = distinct_values(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "id": pa.concat_arrays(
                        [
                            t.column("src_id").combine_chunks().cast(pa.int64()),
                            t.column("dst_id").combine_chunks().cast(pa.int64()),
                        ]
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        "id",
    ).materialize()
    n_int = verts.count()
    n = float(n_int)

    # global seed counts: O(#batches) rows of partials
    def seed_partial(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        return pa.table(
            {f"k_{j}": pa.array([int((ids % m == 0).sum())], pa.int64())
             for j, m in enumerate(mods)}
        )

    kp = verts.map_batches(seed_partial, batch_format="pyarrow").to_pandas()
    k_counts = np.array([kp[f"k_{j}"].sum() for j in range(K)], np.float64)
    if (k_counts == 0).any():
        raise ValueError(f"empty seed set for mods={mods}")

    out_deg = grouped_count(edges, "src_id", "deg").materialize()

    # state: (id, deg, r_0..r_{K-1}); pn is recomputed per batch from id
    # (pure function of id + the broadcast k_counts — cheaper than K more
    # stored columns on the wire)
    state = joins.attach_with_default(
        verts, out_deg, probe_col="id", build_key="src_id", build_val="deg",
        out_col="deg", default=0, build_count=out_deg.count(),
    )

    def init_state(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        pn = _seed_pn(ids, tuple(mods), k_counts, n)
        out = {"id": pa.array(ids, pa.int64()),
               "deg": t.column("deg").cast(pa.int64())}
        for j in range(K):
            out[f"r_{j}"] = pa.array(pn[:, j], pa.float64())
        return pa.table(out)

    state = state.map_batches(init_state, batch_format="pyarrow").materialize()

    for _ in range(iters):
        # dangling mass per column: O(#batches) partial rows
        def dang_partial(t: pa.Table) -> pa.Table:
            deg = t.column("deg").to_numpy(zero_copy_only=False)
            mask = deg == 0
            return pa.table(
                {f"d_{j}": pa.array(
                    [float(t.column(f"r_{j}").to_numpy(zero_copy_only=False)[mask].sum())]
                ) for j in range(K)}
            )

        dp = state.map_batches(dang_partial, batch_format="pyarrow").to_pandas()
        dmass = np.array([dp[f"d_{j}"].sum() for j in range(K)], np.float64)

        # contribution columns on the n-row state (build side of the attach)
        def to_contrib(t: pa.Table) -> pa.Table:
            deg = t.column("deg").to_numpy(zero_copy_only=False).astype(np.float64)
            nz = deg > 0
            out = {"id": t.column("id").cast(pa.int64())}
            for j in range(K):
                r = t.column(f"r_{j}").to_numpy(zero_copy_only=False)
                c = np.zeros(len(deg), np.float64)
                c[nz] = r[nz] / deg[nz]
                out[f"c_{j}"] = pa.array(c, pa.float64())
            return pa.table(out)

        contrib = state.map_batches(to_contrib, batch_format="pyarrow")

        # ONE attach of all K columns onto the edges (broadcast-or-hash)
        if n_int <= joins.BROADCAST_LIMIT:
            small = joins._collect_arrow(contrib)
            ref = _ray.put(small)

            def sort_build(table: pa.Table):
                keys = table.column("id").to_numpy(zero_copy_only=False)
                order = np.argsort(keys)
                mat = np.stack(
                    [table.column(f"c_{j}").to_numpy(zero_copy_only=False)[order]
                     for j in range(K)], axis=1)
                return keys[order], mat

            def scatter(batch: pa.Table, ref=ref) -> pa.Table:
                keys, mat = joins.broadcast_get(ref, sort_build, "ppr_contrib")
                src = batch.column("src_id").to_numpy(zero_copy_only=False)
                dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(keys, src)
                out = {"id": pa.array(dst.astype(np.int64), pa.int64())}
                for j in range(K):
                    out[f"c_{j}"] = pa.array(mat[pos, j], pa.float64())
                return pa.table(out)

            occ = edges.map_batches(scatter, batch_format="pyarrow")
        else:
            joined = edges.join(
                contrib, join_type="inner", num_partitions=64,
                on=("src_id",), right_on=("id",), right_suffix="_r",
            )

            def project(t: pa.Table) -> pa.Table:
                out = {"id": t.column("dst_id").cast(pa.int64())}
                for j in range(K):
                    out[f"c_{j}"] = t.column(f"c_{j}")
                return pa.table(out)

            occ = joined.map_batches(project, batch_format="pyarrow")

        inc = _grouped_sum_k(occ, K)

        # fold inc back into state (left: vertices with no in-edges get 0)
        upd = state
        if n_int <= joins.BROADCAST_LIMIT:
            small_i = joins._collect_arrow(inc)
            ref_i = _ray.put(small_i)

            def sort_inc(table: pa.Table):
                if table.num_rows == 0:
                    return np.array([], np.int64), np.zeros((0, K), np.float64)
                keys = table.column("id").to_numpy(zero_copy_only=False)
                order = np.argsort(keys)
                mat = np.stack(
                    [table.column(f"c_{j}").to_numpy(zero_copy_only=False)[order]
                     for j in range(K)], axis=1)
                return keys[order], mat

            def fold(batch: pa.Table, ref_i=ref_i, dmass=dmass) -> pa.Table:
                keys, mat = joins.broadcast_get(ref_i, sort_inc, "ppr_inc")
                ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
                pn = _seed_pn(ids, tuple(mods), k_counts, n)
                if len(keys):
                    pos = np.clip(np.searchsorted(keys, ids), 0, len(keys) - 1)
                    hit = keys[pos] == ids
                else:
                    pos = np.zeros(len(ids), np.int64)
                    hit = np.zeros(len(ids), bool)
                out = {"id": pa.array(ids, pa.int64()),
                       "deg": batch.column("deg").cast(pa.int64())}
                for j in range(K):
                    incj = np.where(hit, mat[pos, j] if len(keys) else 0.0, 0.0)
                    newr = (alpha * dmass[j] / n + (1.0 - alpha)) * pn[:, j] \
                        + alpha * incj
                    out[f"r_{j}"] = pa.array(newr, pa.float64())
                return pa.table(out)

            state = upd.map_batches(fold, batch_format="pyarrow").materialize()
        else:
            joined = upd.join(
                inc, join_type="left_outer", num_partitions=64,
                on=("id",), right_on=("id",), right_suffix="_r",
            )

            def fold_j(batch: pa.Table, dmass=dmass) -> pa.Table:
                ids = batch.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
                pn = _seed_pn(ids, tuple(mods), k_counts, n)
                out = {"id": pa.array(ids, pa.int64()),
                       "deg": batch.column("deg").cast(pa.int64())}
                for j in range(K):
                    cname = f"c_{j}" if f"c_{j}" in batch.column_names else f"c_{j}_r"
                    incj = np.nan_to_num(
                        batch.column(cname).to_numpy(zero_copy_only=False)
                        .astype(np.float64), nan=0.0)
                    newr = (alpha * dmass[j] / n + (1.0 - alpha)) * pn[:, j] \
                        + alpha * incj
                    out[f"r_{j}"] = pa.array(newr, pa.float64())
                return pa.table(out)

            state = joined.map_batches(fold_j, batch_format="pyarrow").materialize()

    def finalize(t: pa.Table) -> pa.Table:
        out = {"id": t.column("id").cast(pa.int64())}
        for j in range(K):
            out[f"rank_{j}"] = pa.array(
                round_half_away(
                    t.column(f"r_{j}").to_numpy(zero_copy_only=False), 6),
                pa.float64())
        return pa.table(out)

    res = state.map_batches(finalize, batch_format="pyarrow").to_pandas()
    return res.sort_values("id").reset_index(drop=True)
