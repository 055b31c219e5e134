"""k-truss decomposition — iterative edge peeling by triangle support.

The k-truss (Cohen 2008) is the maximal subgraph in which every edge is
supported by at least k−2 triangles *within the subgraph*. Peeling: each
round computes per-edge support over the current edge set and drops every
edge below k−2; the fixpoint is the truss. The edge-set sibling of the
vertex k-core peel (pipelines/kcore.py), and the same fixed-unroll oracle
argument applies: peeling is idempotent at the fixpoint, so a SQL unroll of
≥ the engine's actual round count matches the converged loop exactly.

Support reuses the triangle machinery (pipelines/triangles.py): orient by
(deg, id) — oriented out-degree O(√m) bounds hub wedge fan-out — bucket by
src, enumerate wedges with the segment-pair index arithmetic, close them
against the oriented edge set (broadcast sorted-key searchsorted under
joins.BROADCAST_LIMIT, Ray-native hash join beyond). Each closed wedge
credits its THREE canonical undirected edges (encoded (a<<32)|b), partial
bincount per bucket, one grouped_sum shuffle, then a default-0 left attach
back onto the edge table so triangle-free edges peel too.

Per round: the support pipeline (degree groupby + two attach joins + bucket
groupby + one grouped_sum) over the *surviving* edges only — cost tracks the
shrinking remnant, like the SCC/kcore peels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from pagerank_ray.stages import joins
from pagerank_ray.stages.graph_build import dedup_pairs, grouped_count, grouped_sum
from pagerank_ray.pipelines.triangles import (
    _bucketize_src,
    _canonical_undirected,
    _segment_pairs,
    _sorted_segments,
)

_EMPTY_SUP = pd.DataFrame(
    {"key": pd.Series(dtype=np.int64), "cnt": pd.Series(dtype=np.int64)}
)


def _edge_keys(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Canonical (min<<32)|max encoding of undirected edges (dense ids <2^31)."""
    lo = np.minimum(a, b).astype(np.int64)
    hi = np.maximum(a, b).astype(np.int64)
    return (lo << 32) | hi


def _edge_support(
    und: rd.Dataset, m: int, *, num_partitions: int = 32
) -> rd.Dataset:
    """und: materialized canonical (a, b) simple edges, ids < 2^31.
    Returns (a, b, support) for EVERY input edge (0 when triangle-free)."""
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
    n_buckets = int(min(8192, max(64, m // 4000)))
    bucketed = oriented.map_batches(
        lambda t: _bucketize_src(t, n_buckets), batch_format="pyarrow"
    ).groupby("bucket")

    if m <= joins.BROADCAST_LIMIT:
        # broadcast closing-edge membership, as in triangle_counts
        import ray

        enc_tab = joins._collect_arrow(oriented.select_columns(["src", "dst"]))
        enc = np.sort(
            (enc_tab.column("src").to_numpy().astype(np.int64) << 32)
            | enc_tab.column("dst").to_numpy().astype(np.int64)
        )
        ref = ray.put(enc)

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            keys = joins.broadcast_get(ref, lambda v: v, "truss-edges")
            src, nb, lengths = _sorted_segments(df)
            if not len(src):
                return _EMPTY_SUP.copy()
            first, second = _segment_pairs(lengths)
            v, w, u = nb[first], nb[second], src[first]
            wedge_keys = (v.astype(np.int64) << 32) | w.astype(np.int64)
            pos = np.clip(np.searchsorted(keys, wedge_keys), 0, len(keys) - 1)
            hit = keys[pos] == wedge_keys
            v, w, u = v[hit], w[hit], u[hit]
            # each triangle supports its three undirected edges once
            ek = np.concatenate(
                [_edge_keys(u, v), _edge_keys(u, w), _edge_keys(v, w)]
            )
            uk, inv = np.unique(ek, return_inverse=True)
            return pd.DataFrame({"key": uk, "cnt": np.bincount(inv).astype(np.int64)})

        contribs = bucketed.map_groups(per_bucket, batch_format="pandas")
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
        tri = wedges.join(
            oriented.select_columns(["src", "dst"]),
            join_type="inner",
            num_partitions=num_partitions,
            on=("v", "w"),
            right_on=("src", "dst"),
        )

        def tri_edges(t: pa.Table) -> pa.Table:
            u = t.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
            v = t.column("v").to_numpy(zero_copy_only=False).astype(np.int64)
            w = t.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
            ek = np.concatenate([_edge_keys(u, v), _edge_keys(u, w), _edge_keys(v, w)])
            uk, inv = np.unique(ek, return_inverse=True)
            return pa.table(
                {"key": pa.array(uk), "cnt": pa.array(np.bincount(inv).astype(np.int64))}
            )

        contribs = tri.map_batches(tri_edges, batch_format="pyarrow")

    sup = grouped_sum(contribs, "key", "cnt", "support").materialize()

    und_keyed = und.map_batches(
        lambda t: t.append_column(
            "key",
            pa.array(
                _edge_keys(
                    t.column("a").to_numpy(zero_copy_only=False),
                    t.column("b").to_numpy(zero_copy_only=False),
                )
            ),
        ),
        batch_format="pyarrow",
    )
    out = joins.attach_with_default(
        und_keyed, sup, probe_col="key", build_key="key", build_val="support",
        out_col="support", default=0, build_count=sup.count(),
        num_partitions=num_partitions,
    )
    return out.map_batches(
        lambda t: t.drop_columns(["key"]), batch_format="pyarrow"
    )


def _peel_tail(df: pd.DataFrame, k: int) -> tuple[pd.DataFrame, int]:
    """In-memory fixpoint peel of a small remnant — identical semantics to
    the distributed rounds (supports are exact integers, so the two paths
    cannot diverge); avoids paying a Dataset round per edge on cascading
    tails where each drop unlocks exactly one more."""
    from collections import defaultdict

    a = df["a"].to_numpy(np.int64)
    b = df["b"].to_numpy(np.int64)
    thresh = k - 2
    rounds = 0
    while True:
        rounds += 1
        adj = defaultdict(set)
        for x, y in zip(a.tolist(), b.tolist()):
            adj[x].add(y)
            adj[y].add(x)
        sup = np.fromiter(
            (len(adj[x] & adj[y]) for x, y in zip(a.tolist(), b.tolist())),
            np.int64,
            len(a),
        )
        keep = sup >= thresh
        if keep.all():
            return pd.DataFrame({"a": a, "b": b, "support": sup}), rounds
        a, b = a[keep], b[keep]
        if len(a) == 0:
            empty = np.array([], np.int64)
            return pd.DataFrame({"a": empty, "b": empty, "support": empty}), rounds


def k_truss(
    edges: rd.Dataset,
    k: int,
    *,
    max_rounds: int = 12,
    tail_cutoff: int = 20_000,
    num_partitions: int = 32,
) -> tuple[rd.Dataset, int]:
    """edges (src_id, dst_id, directed, dense ids < 2^31) → the k-truss as a
    materialized Dataset (a, b, support) with the fixpoint support values,
    plus the number of support rounds run (each round = one support pass;
    the final round observes no drop). Remnants of <= tail_cutoff edges
    finish peeling in memory on the driver (result-identical — exact
    integer supports)."""
    if k < 2:
        raise ValueError("k-truss requires k >= 2")
    und = dedup_pairs(
        edges.map_batches(_canonical_undirected, batch_format="pyarrow").map_batches(
            lambda t: pa.table({"src_id": t.column("a"), "dst_id": t.column("b")}),
            batch_format="pyarrow",
        )
    ).map_batches(
        lambda t: pa.table({"a": t.column("src_id"), "b": t.column("dst_id")}),
        batch_format="pyarrow",
    ).materialize()
    m = und.count()
    thresh = k - 2
    rounds = 0
    while True:
        if m == 0:
            return (
                rd.from_arrow(
                    pa.table(
                        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "support": pa.array([], pa.int64())}
                    )
                ),
                rounds,
            )
        if m <= tail_cutoff:
            tail_df, tail_rounds = _peel_tail(und.to_pandas(), k)
            return (
                rd.from_arrow(
                    pa.table(
                        {
                            "a": pa.array(tail_df["a"].to_numpy(np.int64), pa.int64()),
                            "b": pa.array(tail_df["b"].to_numpy(np.int64), pa.int64()),
                            "support": pa.array(
                                tail_df["support"].to_numpy(np.int64), pa.int64()
                            ),
                        }
                    )
                ),
                rounds + tail_rounds,
            )
        sup = _edge_support(und, m, num_partitions=num_partitions)
        rounds += 1

        def keep(t: pa.Table) -> pa.Table:
            mask = pc.greater_equal(t.column("support"), thresh)
            return t.filter(mask)

        kept = sup.map_batches(keep, batch_format="pyarrow").materialize()
        m2 = kept.count()
        if m2 == m:
            return kept, rounds
        if rounds >= max_rounds:
            raise RuntimeError(
                f"k-truss peel did not converge in {max_rounds} rounds "
                f"({m} -> {m2} edges); raise max_rounds"
            )
        und = kept.select_columns(["a", "b"]).materialize()
        m = m2
