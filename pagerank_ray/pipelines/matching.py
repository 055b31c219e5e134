"""Distributed maximal matching — deterministic locally-minimal-edge rounds.

The "handshake" maximal-matching algorithm (Israeli & Itai 1986's local
scheme with the deterministic-priority twist of ``pipelines/mis.py``): give
every edge the priority tuple (h, a, b) where h = fmix64 of a canonical
pair hash; each round every vertex points at its best (minimum-tuple)
incident edge, an edge is matched iff BOTH endpoints point at it, and all
edges touching matched vertices drop out. A locally-minimal edge (minimum
among all edges sharing either endpoint) is always matched, so every round
removes at least the priority-minimum edge of every remaining component —
measured 4-5 rounds on the lineitem graphs, O(log E) expected in general.
Maximal matching is the classic symmetry-breaking primitive next to MIS
(vertex covers ≤ 2·OPT, graph sparsification, coarsening for multilevel
partitioners).

Determinism / oracle parity: h = fmix64((a·1000003 mod 2^64) XOR b) on the
canonical (a<b) pair — XOR instead of + so the DuckDB replay needs no
mod-2^64 addition — with exact (h, a, b) lexicographic tie-break, so the
matched edge set is unique regardless of execution order and
``__ray_entry__._matching_sql`` replays the identical rounds (fixed unroll,
idempotent once no edge survives).

Distribution: per round ONE bucketed grouped-argmin over the incident-edge
explode (2·E rows) + four broadcast-or-hash attaches (best-pair equality at
both endpoints) + flag-attach filters; state shrinks with the remnant, and
the in-memory tail (`_matching_tail`) finishes small remnants in one task.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from pagerank_ray.functions.text import fmix64
from pagerank_ray.stages import joins
from pagerank_ray.stages.graph_build import dedup_pairs, distinct_values


def _edge_prio(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(h as order-preserving int64) for canonical pairs — fmix64 of
    (a·1000003 mod 2^64) XOR b, the pair-hash the SQL oracle replays."""
    x = (a.astype(np.uint64) * np.uint64(1000003)) ^ b.astype(np.uint64)
    return (fmix64(x) ^ np.uint64(1 << 63)).view(np.int64)


def _match_round_np(A, B, h):
    """One handshake round over dense arrays: per-vertex best incident edge
    by (h, a, b); edge wins iff best at both endpoints. Returns win mask."""
    order = np.lexsort((B, A, h))
    edge_pos = np.empty(len(A), np.int64)
    edge_pos[order] = np.arange(len(A), dtype=np.int64)
    ids = np.unique(np.concatenate([A, B]))
    ai = np.searchsorted(ids, A)
    bi = np.searchsorted(ids, B)
    mnpos = np.full(len(ids), len(A), np.int64)
    np.minimum.at(mnpos, ai, edge_pos)
    np.minimum.at(mnpos, bi, edge_pos)
    return (mnpos[ai] == edge_pos) & (mnpos[bi] == edge_pos)


@ray.remote
def _matching_tail(e_blocks: list, max_rounds: int):
    """Finish the handshake fixpoint in ONE task once the remnant is small."""
    et = [t for t in ray.get(list(e_blocks)) if t.num_rows]
    A = np.concatenate(
        [t.column("a").to_numpy(zero_copy_only=False) for t in et]
        or [np.array([], np.int64)]
    )
    B = np.concatenate(
        [t.column("b").to_numpy(zero_copy_only=False) for t in et]
        or [np.array([], np.int64)]
    )
    h = _edge_prio(A, B)
    out_a, out_b = [], []
    rounds = 0
    while len(A):
        if rounds >= max_rounds:
            raise RuntimeError(f"matching tail exceeded {max_rounds} rounds")
        rounds += 1
        win = _match_round_np(A, B, h)
        out_a.append(A[win])
        out_b.append(B[win])
        mset = np.unique(np.concatenate([A[win], B[win]]))
        alive = ~np.isin(A, mset) & ~np.isin(B, mset)
        A, B, h = A[alive], B[alive], h[alive]
    a = np.concatenate(out_a) if out_a else np.array([], np.int64)
    b = np.concatenate(out_b) if out_b else np.array([], np.int64)
    order = np.lexsort((b, a))
    return pa.table({"a": pa.array(a[order], pa.int64()),
                     "b": pa.array(b[order], pa.int64())}), rounds


def _grouped_argmin_pair(exploded: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """(v, a, b, h) incident rows → per-v best edge (v, ba, bb) by the exact
    (h, a, b) lexicographic order (bucketed; each v's rows co-locate)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort(
            (df["b"].to_numpy(np.int64), df["a"].to_numpy(np.int64),
             df["h"].to_numpy(np.int64))
        )
        s = df.iloc[order]
        first = ~s["v"].duplicated()
        return s[first][["v", "a", "b", "h"]]

    def bucketize(t: pa.Table) -> pa.Table:
        k = t.column("v").to_numpy(zero_copy_only=False)
        mixed = (k * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = partial(df)
        return out.rename(columns={"a": "ba", "b": "bb"})[["v", "ba", "bb"]]

    return (
        exploded.map_batches(partial, batch_format="pandas")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
        .map_batches(lambda t: t.select(["v", "ba", "bb"]), batch_format="pyarrow")
    )


def maximal_matching(
    edges: rd.Dataset,
    *,
    max_rounds: int = 20,
    tail_cutoff: int = 2_000_000,
) -> tuple[pd.DataFrame, int]:
    """edges (src_id, dst_id, directed) → (matched canonical pairs (a, b)
    sorted, rounds). Matching is over the undirected simple graph
    (self-loops dropped); maximal: every surviving edge touches a match."""
    from pagerank_ray.pipelines.triangles import _canonical_undirected

    und = dedup_pairs(
        edges.map_batches(_canonical_undirected, batch_format="pyarrow").map_batches(
            lambda t: pa.table({"src_id": t.column("a"), "dst_id": t.column("b")}),
            batch_format="pyarrow",
        )
    )
    live = und.map_batches(
        lambda t: pa.table(
            {
                "a": t.column("src_id").cast(pa.int64()),
                "b": t.column("dst_id").cast(pa.int64()),
                "h": pa.array(_edge_prio(
                    t.column("src_id").to_numpy(zero_copy_only=False),
                    t.column("dst_id").to_numpy(zero_copy_only=False),
                )),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    parts: list[rd.Dataset] = []
    rounds = 0
    while True:
        n_live = live.count()
        if n_live == 0:
            break
        if n_live <= tail_cutoff:
            tbl, tail_rounds = ray.get(
                _matching_tail.remote(live.to_arrow_refs(), max_rounds - rounds)
            )
            rounds += tail_rounds
            parts.append(rd.from_arrow(tbl))
            break
        if rounds >= max_rounds:
            raise RuntimeError(f"matching exceeded {max_rounds} distributed rounds")
        rounds += 1
        exploded = live.map_batches(
            lambda t: pa.table(
                {
                    "v": pa.concat_arrays(
                        [t.column("a").combine_chunks(),
                         t.column("b").combine_chunks()]
                    ),
                    "a": pa.concat_arrays([t.column("a").combine_chunks()] * 2),
                    "b": pa.concat_arrays([t.column("b").combine_chunks()] * 2),
                    "h": pa.concat_arrays([t.column("h").combine_chunks()] * 2),
                }
            ),
            batch_format="pyarrow",
        )
        best = _grouped_argmin_pair(exploded).materialize()
        n_v = best.count()

        def _attach_best(ds: rd.Dataset, key: str, suffix: str) -> rd.Dataset:
            out = joins.attach_with_default(
                ds, best, probe_col=key, build_key="v", build_val="ba",
                out_col=f"ba{suffix}", default=-1, build_count=n_v,
            )
            return joins.attach_with_default(
                out, best, probe_col=key, build_key="v", build_val="bb",
                out_col=f"bb{suffix}", default=-1, build_count=n_v,
            )

        flagged = _attach_best(_attach_best(live, "a", "1"), "b", "2")
        winners = flagged.map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.and_(pc.equal(t.column("ba1"), t.column("a")),
                            pc.equal(t.column("bb1"), t.column("b"))),
                    pc.and_(pc.equal(t.column("ba2"), t.column("a")),
                            pc.equal(t.column("bb2"), t.column("b"))),
                )
            ).select(["a", "b"]),
            batch_format="pyarrow",
        ).materialize()
        parts.append(winners)
        matched = distinct_values(
            winners.map_batches(
                lambda t: pa.table(
                    {"id": pa.concat_arrays(
                        [t.column("a").combine_chunks(),
                         t.column("b").combine_chunks()]
                    )}
                ),
                batch_format="pyarrow",
            ),
            "id",
        ).map_batches(
            lambda t: t.append_column("one", pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow",
        ).materialize()
        n_matched = matched.count()

        def _drop(ds: rd.Dataset, col: str) -> rd.Dataset:
            out = joins.attach_with_default(
                ds, matched, probe_col=col, build_key="id", build_val="one",
                out_col="hit", default=0, build_count=n_matched,
            )
            return out.map_batches(
                lambda t: t.filter(pc.equal(t.column("hit"), 0))
                .drop_columns(["hit"]),
                batch_format="pyarrow",
            )

        live = _drop(_drop(live, "a"), "b").materialize()

    result = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
    df = result.to_pandas()
    df["a"] = df["a"].astype(np.int64)
    df["b"] = df["b"].astype(np.int64)
    return df.sort_values(["a", "b"]).reset_index(drop=True), rounds


def coarsen_by_matching(
    edges: rd.Dataset,
    *,
    max_rounds: int = 10,
    tail_cutoff: int = 2_000_000,
) -> tuple[pd.DataFrame, int]:
    """ONE multilevel coarsening step (the METIS/Karypis-Kumar primitive):
    contract each matched pair to its smaller endpoint (unmatched vertices
    map to themselves), weight each coarse canonical edge by the number of
    contracted simple edges, drop intra-pair self-edges. Returns (coarse
    edge frame (ca, cb, weight) sorted, matching rounds). The mapping is
    applied with a broadcast-or-hash attach over the distributed edge set —
    the matched-pair table is the n/2-row build side, never a driver loop —
    and weights are exact integer pair-counts (grouped_pair_sum)."""
    from pagerank_ray.pipelines.triangles import _canonical_undirected
    from pagerank_ray.stages.graph_build import grouped_pair_sum

    pairs, rounds = maximal_matching(
        edges, max_rounds=max_rounds, tail_cutoff=tail_cutoff
    )
    und = dedup_pairs(
        edges.map_batches(_canonical_undirected, batch_format="pyarrow").map_batches(
            lambda t: pa.table({"src_id": t.column("a"), "dst_id": t.column("b")}),
            batch_format="pyarrow",
        )
    )
    mp = rd.from_arrow(
        pa.table({"v": pa.array(pairs["b"].to_numpy(np.int64), pa.int64()),
                  "sv": pa.array(pairs["a"].to_numpy(np.int64), pa.int64())})
    )
    n_mp = len(pairs)
    mapped = joins.attach_with_default(
        joins.attach_with_default(
            und, mp, probe_col="src_id", build_key="v", build_val="sv",
            out_col="sa", default=-1, build_count=n_mp,
        ),
        mp, probe_col="dst_id", build_key="v", build_val="sv",
        out_col="sb", default=-1, build_count=n_mp,
    )

    def contract(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        sa = t.column("sa").to_numpy(zero_copy_only=False)
        sb = t.column("sb").to_numpy(zero_copy_only=False)
        ca = np.where(sa >= 0, sa, s)
        cb = np.where(sb >= 0, sb, d)
        lo = np.minimum(ca, cb)
        hi = np.maximum(ca, cb)
        keep = lo != hi
        return pa.table(
            {
                "src_id": pa.array(lo[keep], pa.int64()),
                "dst_id": pa.array(hi[keep], pa.int64()),
                "weight": pa.array(np.ones(int(keep.sum()), np.float64)),
            }
        )

    coarse = grouped_pair_sum(
        mapped.map_batches(contract, batch_format="pyarrow")
    ).to_pandas()
    coarse = coarse.rename(columns={"src_id": "ca", "dst_id": "cb"})
    coarse["weight"] = coarse["weight"].astype(np.int64)
    for c in ("ca", "cb"):
        coarse[c] = coarse[c].astype(np.int64)
    return (
        coarse.sort_values(["ca", "cb"]).reset_index(drop=True)[["ca", "cb", "weight"]],
        rounds,
    )
