"""Maximal independent set — deterministic Luby rounds (SURVEY.md §2.11 family).

Luby's algorithm (Luby 1986, SIAM J. Comput.) with a FIXED deterministic
priority instead of per-round randomness: π(v) = fmix64(v) (the repo's shared
murmur finalizer — a 64-bit bijection, so priorities are distinct). Each
round, an active vertex joins the MIS iff its priority is smaller than every
ACTIVE neighbor's; winners and their neighbors deactivate. Determinism makes
the result reproducible across any execution order AND lets DuckDB replay the
identical rounds (__ray_entry__._mis_sql, fixed unroll — idempotent at the
fixpoint, the k-core/LP oracle argument).

Winner test: the engine attaches the active-neighbor min with an int64-max
sentinel for "no active neighbor" and tests π(v) <= min — equivalent to the
oracle's strict < with a NULL escape because distinct priorities make
equality impossible against a REAL neighbor, while the sentinel/NULL case
must always win (an isolated active vertex is independent by definition).

Distribution: each round is a bucketed grouped-MIN over the active adjacency
(one shuffle of (v, π(x)) partials), one winner attach, one removed-set
distinct, and two survivor filters — all O(active edges); per-round state
shrinks with the remnant. Like k-core, once the active set fits one task the
loop finishes in-memory (`_mis_tail`): Luby rounds are O(log n) w.h.p., and
the tail avoids paying a full Dataset stage launch for microsecond rounds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from pagerank_ray.functions.text import fmix64
from pagerank_ray.stages import joins
from pagerank_ray.stages.graph_build import dedup_pairs, distinct_values

# "no active neighbor" sentinel — int64 max. Priorities live in int64 via the
# order-preserving uint64 map below, so numpy/Arrow join fills stay exact
# (a raw 2^64-1 uint64 sentinel upcasts np.where/fill_null paths to float64).
_SENTINEL = np.int64(np.iinfo(np.int64).max)


def _prio_i64(ids: np.ndarray) -> np.ndarray:
    """π(v) = fmix64(v) mapped order-preservingly into int64 (xor the sign
    bit): unsigned order is preserved exactly, so min-neighbor comparisons
    match the oracle's unsigned-h comparisons bit for bit."""
    h = fmix64(ids.astype(np.uint64)) ^ np.uint64(1 << 63)
    return h.view(np.int64)


def _luby_round_np(ids: np.ndarray, pr: np.ndarray, s: np.ndarray, d: np.ndarray):
    """One deterministic Luby round over dense-indexed arrays. ``ids``/``pr``
    are the active vertices and their priorities; ``s``/``d`` index into them
    (both directions present). Returns (winner mask, removed mask)."""
    mn = np.full(len(ids), _SENTINEL, np.int64)
    if len(s):
        np.minimum.at(mn, s, pr[d])
    win = pr <= mn
    removed = win.copy()
    if len(s):
        removed |= np.bincount(d, weights=win[s], minlength=len(ids)) > 0
    return win, removed


@ray.remote
def _mis_tail(v_blocks: list, e_blocks: list, max_rounds: int):
    """Finish the Luby fixpoint in ONE task once the active set is small."""
    vt = [t for t in ray.get(list(v_blocks)) if t.num_rows]
    et = [t for t in ray.get(list(e_blocks)) if t.num_rows]
    ids = np.concatenate(
        [t.column("id").to_numpy(zero_copy_only=False) for t in vt]
        or [np.array([], np.int64)]
    )
    src = np.concatenate(
        [t.column("v").to_numpy(zero_copy_only=False) for t in et]
        or [np.array([], np.int64)]
    )
    dst = np.concatenate(
        [t.column("x").to_numpy(zero_copy_only=False) for t in et]
        or [np.array([], np.int64)]
    )
    order = np.argsort(ids)
    ids = ids[order]
    pr = _prio_i64(ids)
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    mis: list[np.ndarray] = []
    rounds = 0
    while len(ids):
        if rounds >= max_rounds:
            raise RuntimeError(f"MIS tail exceeded {max_rounds} rounds")
        rounds += 1
        win, removed = _luby_round_np(ids, pr, s, d)
        mis.append(ids[win])
        keep_v = ~removed
        remap = np.cumsum(keep_v) - 1
        keep_e = keep_v[s] & keep_v[d]
        s, d = remap[s[keep_e]], remap[d[keep_e]]
        ids, pr = ids[keep_v], pr[keep_v]
    out = np.concatenate(mis) if mis else np.array([], np.int64)
    return pa.table({"id": pa.array(np.sort(out))}), rounds


def _grouped_min_i64(ds: rd.Dataset, key: str, val: str, out: str,
                     n_buckets: int = 64) -> rd.Dataset:
    """Bucket-partitioned MIN-by-key (grouped_count idiom; exact integer
    mins — a groupby().aggregate would route through float accumulators)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, sort=False)[val].min().reset_index(name=out)

    def bucketize(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        mixed = (k * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(key, sort=False)[out].min().reset_index()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def maximal_independent_set(
    edges: rd.Dataset,
    *,
    max_rounds: int = 40,
    tail_cutoff: int = 2_000_000,
) -> tuple[rd.Dataset, int]:
    """edges (src_id, dst_id, directed) → (sorted MIS member ids, rounds).

    The MIS is over the undirected simple graph (self-loops dropped); every
    vertex of the edge set appears in the MIS or has an MIS neighbor.
    """
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
    # vertex universe INCLUDING self-loop-only vertices (independent by
    # construction once the loop is dropped)
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

    mis_parts: list[rd.Dataset] = []
    rounds = 0
    while True:
        n_active = active.count()
        if n_active == 0:
            break
        if n_active <= tail_cutoff:
            tbl, tail_rounds = ray.get(
                _mis_tail.remote(active.to_arrow_refs(), adj.to_arrow_refs(),
                                 max_rounds - rounds)
            )
            rounds += tail_rounds
            mis_parts.append(rd.from_arrow(tbl))
            break
        if rounds >= max_rounds:
            raise RuntimeError(f"MIS exceeded {max_rounds} distributed rounds")
        rounds += 1
        nbrmin = _grouped_min_i64(
            adj.map_batches(
                lambda t: pa.table(
                    {"v": t.column("v"),
                     "px": pa.array(_prio_i64(
                         t.column("x").to_numpy(zero_copy_only=False)
                     ))}
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
        winners = flagged.map_batches(
            lambda t: t.filter(
                pa.compute.less_equal(t.column("prio"), t.column("mn"))
            ).select(["id"]),
            batch_format="pyarrow",
        ).materialize()
        mis_parts.append(winners)
        n_win = winners.count()
        # removed = winners ∪ neighbors(winners), deduped (the attach build
        # side must be key-unique: duplicates would multiply hash-join rows)
        nbr_of_win = joins.attach_with_default(
            adj, winners.map_batches(
                lambda t: t.append_column("one", pa.array(np.ones(t.num_rows, np.int64))),
                batch_format="pyarrow",
            ),
            probe_col="v", build_key="id", build_val="one",
            out_col="hit", default=0, build_count=n_win,
        )
        removed = distinct_values(
            winners.union(
                nbr_of_win.map_batches(
                    lambda t: t.filter(pa.compute.equal(t.column("hit"), 1))
                    .select(["x"]).rename_columns(["id"]),
                    batch_format="pyarrow",
                )
            ),
            "id",
        ).map_batches(
            lambda t: t.append_column("one", pa.array(np.ones(t.num_rows, np.int64))),
            batch_format="pyarrow",
        ).materialize()
        n_removed = removed.count()

        def _drop(ds: rd.Dataset, col: str) -> rd.Dataset:
            out = joins.attach_with_default(
                ds, removed, probe_col=col, build_key="id", build_val="one",
                out_col="hit", default=0, build_count=n_removed,
            )
            return out.map_batches(
                lambda t: t.filter(pa.compute.equal(t.column("hit"), 0))
                .drop_columns(["hit"]),
                batch_format="pyarrow",
            )

        active = _drop(active, "id").materialize()
        adj = _drop(_drop(adj, "v"), "x").materialize()

    result = mis_parts[0] if len(mis_parts) == 1 else mis_parts[0].union(*mis_parts[1:])
    return result, rounds
