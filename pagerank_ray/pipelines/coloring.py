"""Distributed greedy graph coloring — round-synchronous Jones–Plassmann.

Jones & Plassmann, "A Parallel Graph Coloring Heuristic" (SIAM J. Sci.
Comput. 1993): give every vertex a random priority; a vertex colors itself
once every UNCOLORED neighbor has larger priority, taking the mex (minimum
excludant) of its already-colored neighbors' colors. Adjacent vertices are
never simultaneously ready (one of them has the smaller priority), so every
round extends a proper partial coloring; rounds = the depth of the priority
DAG (O(log n / log log n) expected). This is THE distributed coloring
algorithm — scheduling conflict-free update batches, register allocation,
chromatic sparsification.

Determinism / oracle parity: the priority is the repo's shared fmix64
bijection over the ORIGINAL vertex id (the deterministic-Luby convention of
``pipelines/mis.py`` — same order-preserving int64 map, same
sentinel-vs-strict-min winner rule), so DuckDB replays the identical rounds
(``__ray_entry__._coloring_sql``, fixed unroll — idempotent once every
vertex is colored, the k-core/LP/MIS oracle argument) and the per-vertex
colors hash-match.

Distribution: per round ONE bucketed grouped-MIN over the still-active
adjacency (readiness test), ONE bucketed grouped-mex over the forbidden
(vertex, color) pair set, and flag-attach filters that shrink active /
adjacency / forbidden state with the remnant — all O(active edges). The
forbidden set is maintained INCREMENTALLY (colors of newly-colored
neighbors append each round), so no round rescans colored-colored edges.
Once the active remnant fits one task, ``_jp_tail`` finishes the fixpoint
in-memory (the mis/kcore tail idiom) with the same kernels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from pagerank_ray.pipelines.mis import _SENTINEL, _grouped_min_i64, _prio_i64
from pagerank_ray.stages import joins
from pagerank_ray.stages.graph_build import dedup_pairs, distinct_values


def _mex_from_pairs(rv: np.ndarray, rc: np.ndarray):
    """Per-id mex over (id, color) pairs, fully vectorized: sort/dedup the
    pairs, rank colors within each id run, mex = first rank where the sorted
    distinct color differs from the rank (else the run length). Returns
    (ids_with_pairs, mex). Ids with NO pairs are the caller's mex-0 case."""
    if not len(rv):
        return np.array([], np.int64), np.array([], np.int64)
    order = np.lexsort((rc, rv))
    rv, rc = rv[order], rc[order]
    keep = np.concatenate(([True], (rv[1:] != rv[:-1]) | (rc[1:] != rc[:-1])))
    rv, rc = rv[keep], rc[keep]
    starts = np.flatnonzero(np.concatenate(([True], rv[1:] != rv[:-1])))
    counts = np.diff(np.append(starts, len(rv)))
    rank = np.arange(len(rv), dtype=np.int64) - np.repeat(starts, counts)
    mex = counts.astype(np.int64)
    idx = np.flatnonzero(rc != rank)
    if len(idx):
        first = np.full(len(starts), len(rv) + 1, np.int64)
        grp = np.searchsorted(starts, idx, side="right") - 1
        np.minimum.at(first, grp, idx)
        has = first <= len(rv)
        mex = np.where(has, first - starts, mex)
    return rv[starts], mex


@ray.remote
def _jp_tail(a_blocks: list, e_blocks: list, f_blocks: list, max_rounds: int):
    """Finish the JP fixpoint in ONE task once the active set is small.
    Inputs: active vertex ids, the active-subgraph adjacency (v, x both
    directions), and the accumulated forbidden (id, c) pairs from already-
    colored cross-boundary neighbors."""
    at = [t for t in ray.get(list(a_blocks)) if t.num_rows]
    et = [t for t in ray.get(list(e_blocks)) if t.num_rows]
    ft = [t for t in ray.get(list(f_blocks)) if t.num_rows]
    ids = np.sort(np.concatenate(
        [t.column("id").to_numpy(zero_copy_only=False) for t in at]
        or [np.array([], np.int64)]
    ))
    n = len(ids)
    if n == 0:
        return pa.table({"id": pa.array([], pa.int64()),
                         "color": pa.array([], pa.int64())}), 0
    s = np.concatenate(
        [t.column("v").to_numpy(zero_copy_only=False) for t in et]
        or [np.array([], np.int64)]
    )
    d = np.concatenate(
        [t.column("x").to_numpy(zero_copy_only=False) for t in et]
        or [np.array([], np.int64)]
    )
    fv = np.concatenate(
        [t.column("id").to_numpy(zero_copy_only=False) for t in ft]
        or [np.array([], np.int64)]
    )
    fc = np.concatenate(
        [t.column("c").to_numpy(zero_copy_only=False) for t in ft]
        or [np.array([], np.int64)]
    )
    si = np.searchsorted(ids, s)
    di = np.searchsorted(ids, d)
    fi = np.searchsorted(ids, fv)
    pr = _prio_i64(ids)
    color = np.full(n, np.int64(-1))
    rounds = 0
    while (color < 0).any():
        if rounds >= max_rounds:
            raise RuntimeError(f"JP tail exceeded {max_rounds} rounds")
        rounds += 1
        unc = color < 0
        mn = np.full(n, _SENTINEL, np.int64)
        mask = unc[di]
        if mask.any():
            np.minimum.at(mn, si[mask], pr[di[mask]])
        ready = unc & (pr <= mn)
        em = ready[si] & (color[di] >= 0)
        fm = ready[fi]
        pv = np.concatenate([si[em], fi[fm]])
        pcl = np.concatenate([color[di[em]], fc[fm]])
        vsel, mex = _mex_from_pairs(pv, pcl)
        newc = np.zeros(n, np.int64)
        newc[vsel] = mex
        color[ready] = newc[ready]
    return pa.table({"id": pa.array(ids, pa.int64()),
                     "color": pa.array(color, pa.int64())}), rounds


def _grouped_mex(pairs: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """(id, c) forbidden pairs → (id, mex). Pairs are globally distinct by
    construction; bucketing by id co-locates each id's full pair set, so the
    per-bucket vectorized kernel is exact."""

    def bucketize(t: pa.Table) -> pa.Table:
        k = t.column("id").to_numpy(zero_copy_only=False)
        mixed = (k * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        ids, mex = _mex_from_pairs(
            df["id"].to_numpy(np.int64), df["c"].to_numpy(np.int64)
        )
        return pd.DataFrame({"id": ids, "mex": mex})

    return (
        pairs.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
        .map_batches(lambda t: t.select(["id", "mex"]), batch_format="pyarrow")
    )


def greedy_coloring(
    edges: rd.Dataset,
    *,
    max_rounds: int = 60,
    tail_cutoff: int = 2_000_000,
) -> tuple[pd.DataFrame, int]:
    """edges (src_id, dst_id, directed) → (per-vertex (id, color) frame
    sorted by id, rounds used). Proper coloring of the undirected simple
    graph (self-loops dropped; self-loop-only vertices take color 0)."""
    from pagerank_ray.pipelines.triangles import _canonical_undirected

    und = dedup_pairs(
        edges.map_batches(_canonical_undirected, batch_format="pyarrow").map_batches(
            lambda t: pa.table({"src_id": t.column("a"), "dst_id": t.column("b")}),
            batch_format="pyarrow",
        )
    )
    adj = und.map_batches(
        lambda t: pa.table(
            {
                "v": pa.concat_arrays(
                    [t.column("src_id").combine_chunks().cast(pa.int64()),
                     t.column("dst_id").combine_chunks().cast(pa.int64())]
                ),
                "x": pa.concat_arrays(
                    [t.column("dst_id").combine_chunks().cast(pa.int64()),
                     t.column("src_id").combine_chunks().cast(pa.int64())]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    mentions = edges.map_batches(
        lambda t: pa.table(
            {"id": pa.concat_arrays(
                [t.column("src_id").combine_chunks().cast(pa.int64()),
                 t.column("dst_id").combine_chunks().cast(pa.int64())]
            )}
        ),
        batch_format="pyarrow",
    )
    active = distinct_values(mentions, "id").materialize()
    forb = rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                   "c": pa.array([], pa.int64())}))

    colored_parts: list[rd.Dataset] = []
    rounds = 0
    while True:
        n_active = active.count()
        if n_active == 0:
            break
        if n_active <= tail_cutoff:
            tbl, tail_rounds = ray.get(
                _jp_tail.remote(active.to_arrow_refs(), adj.to_arrow_refs(),
                                forb.to_arrow_refs(), max_rounds - rounds)
            )
            rounds += tail_rounds
            colored_parts.append(rd.from_arrow(tbl))
            break
        if rounds >= max_rounds:
            raise RuntimeError(f"coloring exceeded {max_rounds} distributed rounds")
        rounds += 1
        # readiness: min priority over still-ACTIVE neighbors
        nbrmin = _grouped_min_i64(
            adj.map_batches(
                lambda t: pa.table(
                    {"v": t.column("v"),
                     "px": pa.array(_prio_i64(
                         t.column("x").to_numpy(zero_copy_only=False)))}
                ),
                batch_format="pyarrow",
            ),
            "v", "px", "mn",
        )
        flagged = joins.attach_with_default(
            active.map_batches(
                lambda t: t.append_column(
                    "prio",
                    pa.array(_prio_i64(t.column("id").to_numpy(zero_copy_only=False))),
                ),
                batch_format="pyarrow",
            ),
            nbrmin, probe_col="id", build_key="v", build_val="mn",
            out_col="mn", default=int(_SENTINEL), out_type=pa.int64(),
        )
        ready = flagged.map_batches(
            lambda t: t.filter(
                pc.less_equal(t.column("prio"), t.column("mn"))
            ).select(["id"]),
            batch_format="pyarrow",
        ).materialize()
        n_ready = ready.count()
        # mex over the accumulated forbidden pairs of READY vertices
        ready_flagged = joins.attach_with_default(
            forb, ready.map_batches(
                lambda t: t.append_column("one", pa.array(np.ones(t.num_rows, np.int64))),
                batch_format="pyarrow",
            ),
            probe_col="id", build_key="id", build_val="one",
            out_col="hit", default=0, build_count=n_ready,
        )
        mex_tbl = _grouped_mex(
            ready_flagged.map_batches(
                lambda t: t.filter(pc.equal(t.column("hit"), 1))
                .select(["id", "c"]),
                batch_format="pyarrow",
            )
        ).materialize()
        newly = joins.attach_with_default(
            ready, mex_tbl, probe_col="id", build_key="id", build_val="mex",
            out_col="color", default=0, build_count=mex_tbl.count(),
        ).materialize()
        colored_parts.append(newly)
        # forbidden pairs gained this round: active edges into newly-colored
        new_pairs = joins.attach_with_default(
            adj, newly, probe_col="x", build_key="id", build_val="color",
            out_col="c", default=-1, build_count=n_ready,
        ).map_batches(
            lambda t: t.filter(pc.greater_equal(t.column("c"), 0))
            .select(["v", "c"]).rename_columns(["id", "c"]),
            batch_format="pyarrow",
        )
        ready_one = ready.map_batches(
            lambda t: t.append_column("one", pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow",
        ).materialize()

        def _drop(ds: rd.Dataset, col: str) -> rd.Dataset:
            out = joins.attach_with_default(
                ds, ready_one, probe_col=col, build_key="id", build_val="one",
                out_col="hit", default=0, build_count=n_ready,
            )
            return out.map_batches(
                lambda t: t.filter(pc.equal(t.column("hit"), 0))
                .drop_columns(["hit"]),
                batch_format="pyarrow",
            )

        active = _drop(active, "id").materialize()
        adj = _drop(_drop(adj, "v"), "x").materialize()
        # forbidden set for the surviving active remnant (distinct pairs).
        # BOUND THE BLOCK COUNT before the dedup groupby: forb is a
        # per-round union, and without the split/coalesce repartition its
        # block count grows by O(adj blocks) every round — the groupby's
        # sort shuffle then serializes O(P_in·P_out) block refs per round,
        # which wedged the driver for 40+ min at 300k-500k vertices
        # (faulthandler showed pull_based_shuffle_task_scheduler.execute
        # stuck submitting; r5 session fix)
        forb = dedup_pairs(
            _drop(forb, "id").union(_drop(new_pairs, "id")).map_batches(
                lambda t: t.rename_columns(["src_id", "dst_id"]),
                batch_format="pyarrow",
            ).repartition(64)
        ).map_batches(
            lambda t: t.rename_columns(["id", "c"]), batch_format="pyarrow"
        ).materialize()

    result = (
        colored_parts[0] if len(colored_parts) == 1
        else colored_parts[0].union(*colored_parts[1:])
    )
    df = result.to_pandas()
    df["id"] = df["id"].astype(np.int64)
    df["color"] = df["color"].astype(np.int64)
    return df.sort_values("id").reset_index(drop=True), rounds
