"""Minimum spanning forest — distributed Borůvka.

Borůvka's algorithm (1926; the textbook distributed/parallel MST scheme —
each round every component picks its minimum incident cross edge, chosen
edges contract components, components at least halve per round, O(log n)
rounds): the per-round heavy work is one O(m) scan (label attach + filter +
per-component min via the bucketed partial/merge idiom), so total work is
O(m log n) with no all-to-all beyond the component-count-sized contraction.

Determinism: edges carry a STRICT total order (w, src_id, dst_id); with a
strict total order the MSF is unique (cut property), so the result is
algorithm-independent — the DuckDB oracle replays the identical rounds
(__ray_entry__._msf_sql: per-round window-function argmin + recursive
contraction closure).

Scale shape: labels and edges stay Datasets end-to-end; per-component min
uses per-batch partial reduction then a bucketed merge (components move as
single rows, never edge lists); contraction runs over the chosen-edge graph
(≤ one edge per active component) — in one numpy task below the cutoff
(same in-memory-tail shape as scc/coreness), via the distributed MODE_MIN
fixpoint above it.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from pagerank_ray.stages import joins


@dataclass
class MSFResult:
    edges: rd.Dataset  # chosen (src_id, dst_id, w) — the forest
    labels: rd.Dataset  # (id, comp) — comp = min member id of the tree
    rounds: int
    round_stats: list[dict]


@ray.remote
def _contract_tail(pair_blocks: list) -> pa.Table:
    """Min-label closure over the chosen-edge component graph in ONE task:
    undirected pointer-jumped hash-min (relax both directions + label
    compression), O(log) passes over in-memory arrays. Input pairs are
    component labels (min member ids); output maps every mentioned component
    to the min component of its connected tree."""
    tabs = [t for t in ray.get(list(pair_blocks)) if t.num_rows]
    a = np.concatenate(
        [t.column("ca").to_numpy(zero_copy_only=False) for t in tabs]
        or [np.array([], np.int64)]
    )
    b = np.concatenate(
        [t.column("cb").to_numpy(zero_copy_only=False) for t in tabs]
        or [np.array([], np.int64)]
    )
    ids = np.unique(np.concatenate([a, b]))
    s = np.searchsorted(ids, a)
    d = np.searchsorted(ids, b)
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        while True:  # pointer-jumping compression
            nxt = np.minimum(lab, lab[lab])
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        nxt = lab.copy()
        np.minimum.at(nxt, d, lab[s])
        np.minimum.at(nxt, s, lab[d])
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    return pa.table({"comp": pa.array(ids), "newcomp": pa.array(ids[lab])})


@ray.remote
def _msf_tail(edge_blocks: list):
    """Finish the forest in ONE task once the remnant fits a worker:
    component-level Kruskal under the same strict (w, src, dst) order — the
    unique-MSF total order makes it interchangeable with further Borůvka
    rounds. Returns (chosen (src_id, dst_id, w) table, comp→final-comp
    mapping table)."""
    tabs = [t for t in ray.get(list(edge_blocks)) if t.num_rows]
    if not tabs:
        empty = pa.table({"src_id": pa.array([], pa.int64()),
                          "dst_id": pa.array([], pa.int64()),
                          "w": pa.array([], pa.int64())})
        return empty, pa.table({"comp": pa.array([], pa.int64()),
                                "newcomp": pa.array([], pa.int64())})
    src = np.concatenate([t.column("src_id").to_numpy(zero_copy_only=False) for t in tabs])
    dst = np.concatenate([t.column("dst_id").to_numpy(zero_copy_only=False) for t in tabs])
    w = np.concatenate([t.column("w").to_numpy(zero_copy_only=False) for t in tabs])
    cs = np.concatenate([t.column("cs").to_numpy(zero_copy_only=False) for t in tabs])
    cd = np.concatenate([t.column("cd").to_numpy(zero_copy_only=False) for t in tabs])
    comps = np.unique(np.concatenate([cs, cd]))
    a = np.searchsorted(comps, cs)
    b = np.searchsorted(comps, cd)
    parent = np.arange(len(comps))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    order = np.lexsort((dst, src, w))
    keep = np.zeros(len(order), bool)
    for i in order:
        ra, rb = find(a[i]), find(b[i])
        if ra != rb:
            # min-label union: dense order mirrors comp-label order
            parent[max(ra, rb)] = min(ra, rb)
            keep[i] = True
    roots = np.array([find(i) for i in range(len(comps))])
    chosen = pa.table({"src_id": pa.array(src[keep]),
                       "dst_id": pa.array(dst[keep]),
                       "w": pa.array(w[keep])})
    mapping = pa.table({"comp": pa.array(comps),
                        "newcomp": pa.array(comps[roots])})
    return chosen, mapping


def boruvka_msf(
    edges: rd.Dataset,
    n: int | None = None,
    *,
    n_buckets: int = 64,
    max_rounds: int = 40,
    contract_cutoff: int = 4_000_000,
    tail_cutoff: int = 200_000,
    n_workers: int = 4,
) -> MSFResult:
    """``edges``: undirected simple canonical pairs (src_id < dst_id, dense
    0..n-1 ids) with int64 weight column ``w``. Returns the unique minimum
    spanning forest under the strict order (w, src_id, dst_id) plus final
    component labels (comp = min member id).

    ``contract_cutoff``: chosen-edge sets at or below it contract in one
    ``_contract_tail`` task; larger sets run the distributed MODE_MIN
    fixpoint (pipelines/scc._min_labels over the symmetrized chosen graph).
    Set 0 to force the distributed path (tests do).

    ``tail_cutoff``: once the remaining simplified cross-edge set fits one
    worker, a single ``_msf_tail`` task finishes the forest with
    component-level Kruskal (interchangeable under the unique-MSF total
    order) — late Borůvka rounds choose a handful of edges but still pay
    full per-round Dataset fixed costs. Set 0 to force every round through
    the distributed path."""
    import os
    import tempfile

    from pagerank_ray.stages.graph_build import distinct_values

    # vertex universe = edge endpoints (isolated vertices are trivial
    # singleton trees); ids need not be dense — n is only a build-size hint
    # for the broadcast-or-hash attach decisions
    ep = edges.map_batches(
        lambda t: pa.table({"id": pa.concat_arrays([
            t.column("src_id").combine_chunks().cast(pa.int64()),
            t.column("dst_id").combine_chunks().cast(pa.int64()),
        ])}),
        batch_format="pyarrow",
    )
    labels = distinct_values(ep, "id").map_batches(
        lambda t: pa.table({"id": t.column("id"), "comp": t.column("id")}),
        batch_format="pyarrow",
    ).materialize()
    if n is None:
        n = labels.count()
    # invariant maintained across rounds: e carries (src_id, dst_id, w,
    # cs, cd) where cs/cd are the CURRENT (distinct) component labels of the
    # endpoints — components remap through each round's contraction mapping
    # (component-count-sized), so no per-round vertex-level attach is needed
    e = edges.map_batches(
        lambda t: pa.table({
            "src_id": t.column("src_id"), "dst_id": t.column("dst_id"),
            "w": t.column("w"),
            "cs": t.column("src_id"), "cd": t.column("dst_id"),
        }),
        batch_format="pyarrow",
    ).materialize()
    chosen_parts: list[rd.Dataset] = []
    round_stats: list[dict] = []
    rounds = 0
    while True:
        if rounds >= max_rounds:
            raise RuntimeError(
                f"Borůvka did not finish within {max_rounds} rounds"
            )
        rounds += 1
        import time as _time

        _t0 = _time.perf_counter()
        cross = e  # invariant: every row is already a cross edge
        m_cross = cross.count()
        if m_cross == 0:
            round_stats.append({"round": rounds, "m_cross": 0,
                                "secs": round(_time.perf_counter() - _t0, 2)})
            rounds -= 1  # nothing happened this round
            break

        if tail_cutoff and m_cross <= tail_cutoff:
            chosen_tab, mapping_tab = ray.get(
                _msf_tail.remote(cross.to_arrow_refs())
            )
            chosen_parts.append(rd.from_arrow(chosen_tab).materialize())
            mapping = rd.from_arrow(mapping_tab).materialize()
            relabeled = joins.attach_with_default(
                labels, mapping, probe_col="comp", build_key="comp",
                build_val="newcomp", out_col="nc", default=np.int64(-1),
                build_count=n,
            )
            labels = relabeled.map_batches(
                lambda t: pa.table({
                    "id": t.column("id"),
                    "comp": pc.if_else(
                        pc.equal(t.column("nc"), pa.scalar(-1, pa.int64())),
                        t.column("comp"), t.column("nc")),
                }),
                batch_format="pyarrow",
            ).materialize()
            round_stats.append({"round": rounds, "m_cross": int(m_cross),
                                "n_chosen": int(chosen_tab.num_rows),
                                "secs": round(_time.perf_counter() - _t0, 2),
                                "tail": True})
            break

        # per-component min incident edge under the strict (w, src, dst)
        # order: emit each cross edge under BOTH endpoint components, reduce
        # per batch, merge in component-hash buckets
        def emit(t: pa.Table) -> pa.Table:
            cols = {c: pa.concat_arrays([
                t.column(c).combine_chunks(), t.column(c).combine_chunks()
            ]) for c in ("src_id", "dst_id", "w", "cs", "cd")}
            comp = pa.concat_arrays([
                t.column("cs").combine_chunks(), t.column("cd").combine_chunks()
            ])
            return pa.table({"comp": comp, **cols})

        def partial_min(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["comp", "w", "src_id", "dst_id"], kind="mergesort")
            return df.drop_duplicates("comp", keep="first")

        def bucketize(t: pa.Table) -> pa.Table:
            comp = t.column("comp").to_numpy(zero_copy_only=False)
            h = (comp * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
            return t.append_column("bucket", pa.array(h % n_buckets, pa.int32()))

        minedge = (
            cross.map_batches(emit, batch_format="pyarrow")
            .map_batches(partial_min, batch_format="pandas")
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(partial_min, batch_format="pandas")
        )

        # distinct chosen edges (an edge may be the min of both endpoints)
        def chosen_pairs(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["src_id", "dst_id", "w", "cs", "cd"]].drop_duplicates(
                ["src_id", "dst_id"]
            )
            return out

        chosen = minedge.map_batches(
            chosen_pairs, batch_format="pandas"
        ).materialize()
        # chosen came out of ≤ n_buckets merge groups; a pair chosen by two
        # components always lands identical rows — one more global distinct
        # on the (already component-count-sized) table settles duplicates
        # across groups
        chosen_e = chosen.to_pandas().drop_duplicates(["src_id", "dst_id"]) \
            if contract_cutoff and chosen.count() <= contract_cutoff else None

        if chosen_e is not None:
            chosen_ds = rd.from_pandas(
                chosen_e[["src_id", "dst_id", "w"]].reset_index(drop=True)
            ).materialize()
            pair_tab = pa.table({
                "ca": pa.array(chosen_e["cs"].to_numpy(np.int64)),
                "cb": pa.array(chosen_e["cd"].to_numpy(np.int64)),
            })
            mapping_tab = ray.get(_contract_tail.remote([ray.put(pair_tab)]))
            mapping = rd.from_arrow(mapping_tab).materialize()
        else:
            from pagerank_ray.pipelines.scc import _min_labels
            from pagerank_ray.stages.graph_build import assign_dense_ids

            pairs = chosen.map_batches(
                lambda t: pa.table({"ca": t.column("cs"), "cb": t.column("cd")}),
                batch_format="pyarrow",
            ).materialize()
            dedup = pairs.map_batches(
                lambda df: df.drop_duplicates(), batch_format="pandas"
            )
            ep = dedup.map_batches(
                lambda t: pa.table({"id": pa.concat_arrays([
                    t.column("ca").combine_chunks(), t.column("cb").combine_chunks()
                ])}),
                batch_format="pyarrow",
            )
            from pagerank_ray.stages.graph_build import distinct_values

            ep = distinct_values(ep, "id").materialize()
            cmap, n_c = assign_dense_ids(ep, "id")
            cmap = cmap.materialize()

            def to_dense(ds, cols):
                out = ds
                for c in cols:
                    out = joins.attach_column(
                        out, cmap, probe_col=c, build_key="id", build_val="dense",
                        out_col=f"_{c}", build_count=n_c, drop_probe_col=True,
                    )
                return out

            dd = to_dense(dedup, ["ca", "cb"]).map_batches(
                lambda t: pa.table({
                    "src_id": pa.concat_arrays([
                        t.column("_ca").combine_chunks(), t.column("_cb").combine_chunks()]),
                    "dst_id": pa.concat_arrays([
                        t.column("_cb").combine_chunks(), t.column("_ca").combine_chunks()]),
                }),
                batch_format="pyarrow",
            )
            csr_dir = os.path.join(tempfile.mkdtemp(prefix="msf_"), "csr")
            lab_d = _min_labels(dd, n_c, csr_dir, n_workers)
            # dense labels back to component-id space: both columns map
            # through the order-preserving cmap (min dense ≡ min comp id)
            m1 = joins.attach_column(
                lab_d, cmap, probe_col="id", build_key="dense", build_val="id",
                out_col="comp", build_count=n_c, drop_probe_col=True,
            )
            mapping = joins.attach_column(
                m1, cmap, probe_col="label", build_key="dense", build_val="id",
                out_col="newcomp", build_count=n_c, drop_probe_col=True,
            ).map_batches(
                lambda t: t.select(["comp", "newcomp"]), batch_format="pyarrow"
            ).materialize()
            # an edge chosen by both endpoint components lands as two EXACT
            # duplicate rows (possibly in different merge buckets):
            # grouped_pair_min collapses them distributed (min of equal w = w)
            from pagerank_ray.stages.graph_build import grouped_pair_min

            chosen_ds = grouped_pair_min(
                chosen.map_batches(
                    lambda t: t.select(["src_id", "dst_id", "w"]),
                    batch_format="pyarrow"),
                "w",
            ).materialize()

        chosen_parts.append(chosen_ds)
        n_chosen = chosen_ds.count()

        # labels: comp -> contracted comp (identity where untouched)
        relabeled = joins.attach_with_default(
            labels, mapping, probe_col="comp", build_key="comp",
            build_val="newcomp", out_col="nc", default=np.int64(-1),
            build_count=n,
        )
        labels = relabeled.map_batches(
            lambda t: pa.table({
                "id": t.column("id"),
                "comp": pc.if_else(
                    pc.equal(t.column("nc"), pa.scalar(-1, pa.int64())),
                    t.column("comp"), t.column("nc")),
            }),
            batch_format="pyarrow",
        ).materialize()
        # contract + simplify (the standard Borůvka step): remap each edge's
        # endpoint components through the round's contraction mapping, drop
        # now-intra edges, and keep exactly one edge — the (w, src, dst)-min
        # — per unordered NEW-component pair. Future rounds can only ever
        # choose a pair's minimum edge, so this is lossless for the forest
        # and shrinks the edge set geometrically with the component count.
        remapped = joins.attach_with_default(
            cross, mapping, probe_col="cs", build_key="comp",
            build_val="newcomp", out_col="ncs", default=np.int64(-1),
            build_count=n,
        )
        remapped = joins.attach_with_default(
            remapped, mapping, probe_col="cd", build_key="comp",
            build_val="newcomp", out_col="ncd", default=np.int64(-1),
            build_count=n,
        )

        def pairkey(t: pa.Table) -> pa.Table:
            cs = np.where(
                t.column("ncs").to_numpy(zero_copy_only=False) == -1,
                t.column("cs").to_numpy(zero_copy_only=False),
                t.column("ncs").to_numpy(zero_copy_only=False))
            cd = np.where(
                t.column("ncd").to_numpy(zero_copy_only=False) == -1,
                t.column("cd").to_numpy(zero_copy_only=False),
                t.column("ncd").to_numpy(zero_copy_only=False))
            keep = cs != cd
            out = t.select(["src_id", "dst_id", "w"]).filter(pa.array(keep))
            out = out.append_column("cs", pa.array(np.minimum(cs, cd)[keep]))
            out = out.append_column("cd", pa.array(np.maximum(cs, cd)[keep]))
            return out

        def pair_min(df: pd.DataFrame) -> pd.DataFrame:
            df = df.sort_values(["cs", "cd", "w", "src_id", "dst_id"],
                                kind="mergesort")
            return df.drop_duplicates(["cs", "cd"], keep="first")

        def pair_bucket(t: pa.Table) -> pa.Table:
            a = t.column("cs").to_numpy(zero_copy_only=False)
            b = t.column("cd").to_numpy(zero_copy_only=False)
            h = (a * np.int64(0x9E3779B1) + b) & np.int64(0x7FFFFFFF)
            return t.append_column("bucket", pa.array(h % n_buckets, pa.int32()))

        e = (
            remapped.map_batches(pairkey, batch_format="pyarrow")
            .map_batches(pair_min, batch_format="pandas")
            .map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(pair_min, batch_format="pandas")
            .map_batches(lambda t: t.select(["src_id", "dst_id", "w", "cs", "cd"]),
                         batch_format="pyarrow")
        ).materialize()
        round_stats.append({"round": rounds, "m_cross": int(m_cross),
                            "n_chosen": int(n_chosen),
                            "secs": round(_time.perf_counter() - _t0, 2)})

    if chosen_parts:
        forest = chosen_parts[0]
        for p in chosen_parts[1:]:
            forest = forest.union(p)
        forest = forest.materialize()
    else:
        forest = rd.from_arrow(pa.table({
            "src_id": pa.array([], pa.int64()),
            "dst_id": pa.array([], pa.int64()),
            "w": pa.array([], pa.int64()),
        }))
    return MSFResult(edges=forest, labels=labels, rounds=rounds,
                     round_stats=round_stats)
