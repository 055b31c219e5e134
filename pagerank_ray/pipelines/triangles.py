"""Per-vertex triangle counting — join-based batch job (SURVEY.md §2.11).

Pinned semantics: undirected simple graph (self-loops dropped); orient each
edge u→v iff (deg(u), u) < (deg(v), v); for every oriented wedge u→v, u→w with
(deg,id)-order v < w, the triangle closes iff oriented edge v→w exists. Each
triangle is found exactly once (at its lowest-order vertex); per-vertex counts
credit all three corners (matches a networkx-style ``triangles`` oracle).

Orientation by degree bounds oriented out-degree by O(√m) — the classic skew
guard for hub vertices, playing the role the reference's degree bins play for
SpMV (kernel_acsr.cu:419-451): wedge fan-out at hubs stays quadratic-free.

Shuffles: degree count (groupby), two degree-attach joins (broadcast under
``joins.BROADCAST_LIMIT``, hash join beyond), wedge groupby(src), and the
closing-edge hash join on the composite key (v, w).
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


def _wedges(group: pd.DataFrame) -> pd.DataFrame:
    """All out-neighbor pairs of one src, ordered by (deg, id)."""
    order = np.lexsort((group["dst"].to_numpy(), group["dst_deg"].to_numpy()))
    nb = group["dst"].to_numpy()[order]
    d = len(nb)
    if d < 2:
        return pd.DataFrame({"v": [], "w": [], "u": []}).astype(np.int64)
    i, j = np.triu_indices(d, k=1)
    u = group["src"].iloc[0]
    return pd.DataFrame({"v": nb[i], "w": nb[j], "u": np.full(len(i), u, dtype=np.int64)})


def triangle_counts(
    edges: rd.Dataset,
    n_vertices: int,
    *,
    num_partitions: int = 32,
) -> rd.Dataset:
    """edges (src_id, dst_id, directed, deduped) → (id, tri_count) for all vertices."""
    # undirected simple edge set, canonical (a < b)
    from pagerank_ray.stages.graph_build import dedup_pairs

    und = edges.map_batches(_canonical_undirected, batch_format="pyarrow").map_batches(
        lambda t: pa.table({"src_id": t.column("a"), "dst_id": t.column("b")}),
        batch_format="pyarrow",
    )
    und = dedup_pairs(und).map_batches(
        lambda t: pa.table({"a": t.column("src_id"), "b": t.column("dst_id")}),
        batch_format="pyarrow",
    )
    # undirected degrees
    mentions = und.map_batches(
        lambda t: pa.table(
            {"v": pa.concat_arrays([t.column("a").combine_chunks(), t.column("b").combine_chunks()])}
        ),
        batch_format="pyarrow",
    )
    deg = grouped_count(mentions, "v", "deg")
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

    if n_vertices < 2**31 and m_oriented <= joins.BROADCAST_LIMIT:
        # Broadcast closing-edge check: the oriented edge set encoded as sorted
        # (src<<32)|dst int64 keys is ray.put once; every wedge batch verifies
        # membership with one vectorized searchsorted — no W-row join shuffle.
        # (Beyond BROADCAST_LIMIT edges the hash-join path below is used.)
        import ray

        enc_tab = joins._collect_arrow(oriented.select_columns(["src", "dst"]))
        enc = np.sort(
            (enc_tab.column("src").to_numpy().astype(np.int64) << 32)
            | enc_tab.column("dst").to_numpy().astype(np.int64)
        )
        ref = ray.put(enc)

        def per_group(df: pd.DataFrame) -> pd.DataFrame:
            keys = joins.broadcast_get(ref, lambda v: v, "tri-edges")
            order = np.lexsort((df["dst"].to_numpy(), df["dst_deg"].to_numpy()))
            nb = df["dst"].to_numpy()[order]
            d = len(nb)
            if d < 2:
                return pd.DataFrame(
                    {"id": pd.Series(dtype=np.int64), "cnt": pd.Series(dtype=np.int64)}
                )
            i, j = np.triu_indices(d, k=1)
            wedge_keys = (nb[i].astype(np.int64) << 32) | nb[j].astype(np.int64)
            pos = np.clip(np.searchsorted(keys, wedge_keys), 0, len(keys) - 1)
            hit = keys[pos] == wedge_keys
            v_hit, w_hit = nb[i][hit], nb[j][hit]
            u = np.int64(df["src"].iloc[0])
            ids = np.concatenate([v_hit, w_hit, [u]])
            cnts = np.concatenate(
                [np.ones(len(v_hit) * 2, dtype=np.int64), [np.int64(hit.sum())]]
            )
            uid, inv = np.unique(ids, return_inverse=True)
            csum = np.bincount(inv, weights=cnts).astype(np.int64)
            return pd.DataFrame({"id": uid, "cnt": csum})

        contribs = oriented.groupby("src").map_groups(per_group, batch_format="pandas")
        counts = grouped_sum(contribs, "id", "cnt", "tri_count")
    else:
        wedges = oriented.groupby("src").map_groups(_wedges, batch_format="pandas")
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

    # left-attach onto the full vertex id range with 0 default
    return joins.attach_with_default(
        rd.range(n_vertices),
        counts,
        probe_col="id",
        build_key="id",
        build_val="tri_count",
        out_col="tri_count",
        default=0,
    )
