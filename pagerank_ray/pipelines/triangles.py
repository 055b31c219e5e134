"""Per-vertex triangle counting — join-based batch job (SURVEY.md §2.11).

Pinned semantics: undirected simple graph (self-loops dropped); orient each
edge u→v iff (deg(u), u) < (deg(v), v); for every oriented wedge u→v, u→w with
(deg,id)-order v < w, the triangle closes iff oriented edge v→w exists. Each
triangle is found exactly once (at its lowest-order vertex); per-vertex counts
credit all three corners (matches a networkx-style ``triangles`` oracle).

Orientation by degree bounds oriented out-degree by O(√m) — the classic skew
guard for hub vertices, playing the role the reference's degree bins play for
SpMV (kernel_acsr.cu:419-451): wedge fan-out at hubs stays quadratic-free.

Wedge generation is bucket-partitioned like the builder's dedup/count stages
(graph_build.dedup_pairs): edges hash-bucket by src, ONE vectorized kernel per
bucket enumerates every source's out-neighbor pairs via ``_segment_pairs``
(repeat/cumsum index arithmetic — no per-group pandas invocation, no Python
loop over sources; the round-1 ``groupby("src").map_groups`` paid per-group
overhead ~15× the kernel cost at 2M edges).

Shuffles: degree count (groupby), two degree-attach joins (broadcast under
``joins.BROADCAST_LIMIT``, hash join beyond), the bucket groupby, and — beyond
the broadcast limit — the closing-edge hash join on the composite key (v, w).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pagerank_ray.stages import joins
from pagerank_ray.stages.graph_build import grouped_count, grouped_sum


def _canonical_undirected(batch: pa.Table) -> pa.Table:
    src = batch.column("src_id").to_numpy(zero_copy_only=False)
    dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    uniq = np.unique(np.stack([a, b], axis=1), axis=0)
    return pa.table({"a": pa.array(uniq[:, 0]), "b": pa.array(uniq[:, 1])})


def _segment_pairs(lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Global (first, second) row indices of all ordered within-segment pairs
    for contiguous segments of the given lengths. Fully vectorized:
    repeat/cumsum index arithmetic, no Python loop over segments."""
    lengths = np.asarray(lengths, dtype=np.int64)
    total = int(lengths.sum())
    offsets = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    d_of_row = np.repeat(lengths, lengths)
    local_i = np.arange(total, dtype=np.int64) - np.repeat(offsets, lengths)
    counts = d_of_row - 1 - local_i  # pairs where this row is the first element
    n_pairs = int(counts.sum())
    first = np.repeat(np.arange(total, dtype=np.int64), counts)
    cum = np.cumsum(counts) - counts
    within = np.arange(n_pairs, dtype=np.int64) - np.repeat(cum, counts)
    second = first + 1 + within
    return first, second


def _sorted_segments(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort a bucket's oriented edges by (src, dst_deg, dst); return
    (src_sorted, dst_sorted, segment_lengths per distinct src)."""
    src = df["src"].to_numpy()
    order = np.lexsort((df["dst"].to_numpy(), df["dst_deg"].to_numpy(), src))
    src = src[order]
    nb = df["dst"].to_numpy()[order]
    if not len(src):
        return src, nb, np.zeros(0, dtype=np.int64)
    starts = np.flatnonzero(np.concatenate([[True], src[1:] != src[:-1]]))
    lengths = np.diff(np.concatenate([starts, [len(src)]]))
    return src, nb, lengths


def _bucketize_src(t: pa.Table, n_buckets: int) -> pa.Table:
    k = t.column("src").to_numpy(zero_copy_only=False)
    mixed = (k * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
    return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))


def triangle_counts(
    edges: rd.Dataset,
    n_vertices: int,
    *,
    num_partitions: int = 32,
    n_buckets: int | None = None,
    return_degrees: bool = False,
) -> rd.Dataset:
    """edges (src_id, dst_id, directed, deduped) → (id, tri_count) for all
    vertices. ``return_degrees=True`` additionally returns the undirected
    simple-degree table (v, deg) the orientation already computed — callers
    composing on it (clustering coefficient) skip a second dedup shuffle."""
    # undirected simple edge set, canonical (a < b)
    from pagerank_ray.stages.graph_build import dedup_pairs

    und = edges.map_batches(_canonical_undirected, batch_format="pyarrow").map_batches(
        lambda t: pa.table({"src_id": t.column("a"), "dst_id": t.column("b")}),
        batch_format="pyarrow",
    )
    # materialized: und feeds three consumers (degrees, the degree joins, the
    # oriented edge build) and deg feeds two (count + both attach builds) — a
    # lazy chain would re-run the dedup shuffle once per consumer (measured
    # 5× the whole pipeline's cost at 2M edges)
    und = dedup_pairs(und).map_batches(
        lambda t: pa.table({"a": t.column("src_id"), "b": t.column("dst_id")}),
        batch_format="pyarrow",
    ).materialize()
    # undirected degrees
    mentions = und.map_batches(
        lambda t: pa.table(
            {"v": pa.concat_arrays([t.column("a").combine_chunks(), t.column("b").combine_chunks()])}
        ),
        batch_format="pyarrow",
    )
    deg = grouped_count(mentions, "v", "deg").materialize()
    deg_count = deg.count()
    with_da = joins.attach_column(
        und, deg, probe_col="a", build_key="v", build_val="deg", out_col="deg_a",
        build_count=deg_count, num_partitions=num_partitions,
    )
    with_db = joins.attach_column(
        with_da, deg, probe_col="b", build_key="v", build_val="deg", out_col="deg_b",
        build_count=deg_count, num_partitions=num_partitions,
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy(zero_copy_only=False)
        b = t.column("b").to_numpy(zero_copy_only=False)
        da = t.column("deg_a").to_numpy(zero_copy_only=False)
        db = t.column("deg_b").to_numpy(zero_copy_only=False)
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        dst_deg = np.where(a_first, db, da)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "dst_deg": pa.array(dst_deg.astype(np.int64), pa.int64()),
            }
        )

    oriented = with_db.map_batches(orient, batch_format="pyarrow").materialize()
    m_oriented = oriented.count()
    if n_buckets is None:
        # Size buckets so each kernel's wedge arrays stay ~O(100k) elements:
        # large fresh per-task allocations pay cold-allocator/page-fault cost
        # in Ray workers (measured 10× the steady-state numpy time at 1.6M
        # wedges/bucket — 383 core-s → 19 core-s at 2M edges going 64 → 512
        # buckets). ~4k edges/bucket keeps the working set allocator-warm and
        # cache-resident; bucket count grows with m, so the per-bucket size
        # holds at cluster scale too.
        n_buckets = int(min(8192, max(64, m_oriented // 4000)))
    bucketed = oriented.map_batches(
        lambda t: _bucketize_src(t, n_buckets), batch_format="pyarrow"
    ).groupby("bucket")

    if n_vertices < 2**31 and m_oriented <= joins.BROADCAST_LIMIT:
        # Broadcast closing-edge check: the oriented edge set encoded as sorted
        # (src<<32)|dst int64 keys is ray.put once; every bucket kernel verifies
        # membership with one vectorized searchsorted — no W-row join shuffle.
        # (Beyond BROADCAST_LIMIT edges the hash-join path below is used.)
        import ray

        enc_tab = joins._collect_arrow(oriented.select_columns(["src", "dst"]))
        enc = np.sort(
            (enc_tab.column("src").to_numpy().astype(np.int64) << 32)
            | enc_tab.column("dst").to_numpy().astype(np.int64)
        )
        ref = ray.put(enc)

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            keys = joins.broadcast_get(ref, lambda v: v, "tri-edges")
            src, nb, lengths = _sorted_segments(df)
            if not len(src):
                return pd.DataFrame(
                    {"id": pd.Series(dtype=np.int64), "cnt": pd.Series(dtype=np.int64)}
                )
            first, second = _segment_pairs(lengths)
            v, w, u = nb[first], nb[second], src[first]
            wedge_keys = (v.astype(np.int64) << 32) | w.astype(np.int64)
            pos = np.clip(np.searchsorted(keys, wedge_keys), 0, len(keys) - 1)
            hit = keys[pos] == wedge_keys
            # every closed wedge credits its three corners once each
            ids = np.concatenate([v[hit], w[hit], u[hit]])
            uid, inv = np.unique(ids, return_inverse=True)
            csum = np.bincount(inv).astype(np.int64)
            return pd.DataFrame({"id": uid, "cnt": csum})

        contribs = bucketed.map_groups(per_bucket, batch_format="pandas")
        counts = grouped_sum(contribs, "id", "cnt", "tri_count")
    else:
        def wedges_bucket(df: pd.DataFrame) -> pd.DataFrame:
            src, nb, lengths = _sorted_segments(df)
            if not len(src):
                return pd.DataFrame(
                    {"v": pd.Series(dtype=np.int64), "w": pd.Series(dtype=np.int64),
                     "u": pd.Series(dtype=np.int64)}
                )
            first, second = _segment_pairs(lengths)
            return pd.DataFrame({"v": nb[first], "w": nb[second], "u": src[first]})

        wedges = bucketed.map_groups(wedges_bucket, batch_format="pandas")
        closing = oriented.select_columns(["src", "dst"])
        tri = wedges.join(
            closing,
            join_type="inner",
            num_partitions=num_partitions,
            on=("v", "w"),
            right_on=("src", "dst"),
        )

        def corners(t: pa.Table) -> pa.Table:
            out = pa.concat_arrays(
                [
                    t.column("u").combine_chunks().cast(pa.int64()),
                    t.column("v").combine_chunks().cast(pa.int64()),
                    t.column("w").combine_chunks().cast(pa.int64()),
                ]
            )
            return pa.table({"id": out})

        counts = grouped_count(tri.map_batches(corners, batch_format="pyarrow"), "id", "tri_count")

    # left-attach onto the full vertex id range with 0 default (hash left join
    # beyond the broadcast limit). Materialized first: attach_with_default
    # counts the build side to pick its strategy — counting a lazy chain would
    # re-execute the whole wedge pipeline.
    counts = counts.materialize()
    out = joins.attach_with_default(
        rd.range(n_vertices),
        counts,
        probe_col="id",
        build_key="id",
        build_val="tri_count",
        out_col="tri_count",
        default=0,
    )
    if return_degrees:
        return out, deg
    return out
