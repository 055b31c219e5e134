"""Fingerprint SimRank (Fogaras & Rácz, "Scaling link-based similarity
search", WWW 2005): SimRank s(u, v) = E[C^τ] where τ is the FIRST MEETING
TIME of coupled random walks started at u and v. The scalable trick is the
COUPLED walk field: the step-t move is a deterministic pseudo-random
function of the CURRENT VERTEX alone — next_t(p) = neighbors(p)[h(p, t, k)
% deg(p)] — so two walkers standing on the same vertex move together
forever, and one n-row trajectory pass per step serves every pair at once.
K independent fields (seeds) average the estimate.

This mirrors the deterministic-walk convention the `random_walks` /
`node2vec_walks` operators established (dst-sorted adjacency rank, fmix64
choice), which is what lets DuckDB replay the walks exactly
(__ray_entry__._simrank_sql).

Scale shape: trajectories are an n-row distributed state advanced by ONE
broadcast-or-hash join per step against the rank-keyed edge table (key =
src·2²¹ + rank — bounds asserted loudly); only the query walkers'
positions (|Q| rows) are collected per step, and only MATCH rows (q, v, t)
leave the batches. Nothing trajectory-sized reaches the driver; the top-k
fold is a bucketed groupby. Reference analogy: the reference's kernels are
strictly single-source (kernel_acsr.cu:202) — the coupled-field batch walk
is the multi-query amortization this engine adds.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from pagerank_ray.functions.text import fmix64
from pagerank_ray.stages import joins
from pagerank_ray.stages.graph_build import grouped_count

_STEP_MUL = np.uint64(1000003)  # the walks-family step-salt convention


def _ranked_edges(sym: rd.Dataset, *, n_buckets: int = 64) -> rd.Dataset:
    """(key = src·2²¹ + rank, dst) with rank = 0-based position of dst in
    the dst-sorted adjacency of src — the join target for one walk step.
    ``simrank_fingerprints`` packs the destination's degree into the value
    (val = dst·2²¹ + deg(dst)) so each step costs ONE join, not two."""

    def bucketize(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        m = (s.astype(np.int64) * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("bkt", pa.array((m % n_buckets).astype(np.int32)))

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src_id"].to_numpy(np.int64)
        d = df["dst_id"].to_numpy(np.int64)
        if (s >= (1 << 41)).any():
            raise ValueError("src id exceeds the 2^41 key encoding")
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        newg = np.concatenate(([True], s[1:] != s[:-1]))
        gid = np.cumsum(newg) - 1
        starts = np.flatnonzero(newg)
        rank = np.arange(len(s), dtype=np.int64) - starts[gid]
        # deg = max rank + 1 must itself fit the 21-bit packed-value field
        if (rank >= (1 << 21) - 1).any():
            raise ValueError("degree exceeds the 2^21 key encoding")
        return pd.DataFrame({"key": s * (1 << 21) + rank, "dst": d})

    return (
        sym.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def simrank_fingerprints(
    sym: rd.Dataset,
    *,
    mod: int = 512,
    length: int = 5,
    n_seeds: int = 3,
    decay: float = 0.8,
    topk: int = 5,
) -> pd.DataFrame:
    """sym: symmetric distinct (src_id, dst_id), every vertex with deg ≥ 1.
    Queries = vertices with id % mod == 0. Returns per query the ``topk``
    most-similar OTHER vertices: (q, v, score, rank), score =
    round(Σ_k c_int[τ_k] / (K·10⁶), 6) with c_int[t] = round(C^t·10⁶) —
    the integer form both engines order by EXACTLY (ties → smaller v)."""
    sym = sym.materialize()
    m_edges = sym.count()
    deg = grouped_count(sym, "src_id", "deg").materialize()
    n = deg.count()
    ranked_raw = joins.attach_column(
        _ranked_edges(sym), deg, probe_col="dst", build_key="src_id",
        build_val="deg", out_col="ddeg", build_count=n,
    )

    def pack(t: pa.Table) -> pa.Table:
        d = t.column("dst").to_numpy(zero_copy_only=False)
        dd = t.column("ddeg").to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": t.column("key"), "val": pa.array(d * (1 << 21) + dd)}
        )

    ranked = ranked_raw.map_batches(pack, batch_format="pyarrow").materialize()
    c_int = {t: int(np.floor(abs(decay**t) * 1e6 + 0.5)) for t in range(1, length + 1)}

    all_matches: list[pd.DataFrame] = []
    for k in range(n_seeds):
        state = deg.map_batches(
            lambda t: pa.table(
                {"w": t.column("src_id"), "pos": t.column("src_id"),
                 "deg": t.column("deg").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize()
        for t in range(1, length + 1):
            salt = np.uint64(k * 1000 + t)

            def to_key(tb: pa.Table, _salt=salt) -> pa.Table:
                pos = tb.column("pos").to_numpy(zero_copy_only=False)
                dg = tb.column("deg").to_numpy(zero_copy_only=False)
                with np.errstate(over="ignore"):
                    x = pos.astype(np.uint64) * _STEP_MUL + _salt
                h = fmix64(x)
                idx = (h % dg.astype(np.uint64)).astype(np.int64)
                key = pos * (1 << 21) + idx
                return pa.table({"w": tb.column("w"), "key": pa.array(key)})

            moved = joins.attach_column(
                state.map_batches(to_key, batch_format="pyarrow"),
                ranked, probe_col="key", build_key="key", build_val="val",
                out_col="pv", build_count=m_edges, drop_probe_col=True,
            )

            def unpack(tb: pa.Table) -> pa.Table:
                pv = tb.column("pv").to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "w": tb.column("w"),
                        "pos": pa.array(pv >> 21),
                        "deg": pa.array(pv & ((1 << 21) - 1)),
                    }
                )

            state = moved.map_batches(unpack, batch_format="pyarrow").materialize()

            # query walkers' positions: |Q| rows of driver traffic per step
            qdf = state.map_batches(
                lambda tb: tb.filter(
                    pa.array(
                        tb.column("w").to_numpy(zero_copy_only=False) % mod == 0
                    )
                ).select(["w", "pos"]),
                batch_format="pyarrow",
            ).to_pandas().rename(columns={"w": "q"})
            if qdf.empty:
                continue
            qref = ray.put(
                (qdf["pos"].to_numpy(np.int64), qdf["q"].to_numpy(np.int64))
            )

            def emit_matches(
                df: pd.DataFrame, _t=t, _k=k, _qref=qref
            ) -> pd.DataFrame:
                qpos, qids = joins.broadcast_get(_qref, lambda x: x, "simrank_q")
                m = df[["w", "pos"]].merge(
                    pd.DataFrame({"pos": qpos, "q": qids}), on="pos"
                )
                m = m[m["w"] != m["q"]]
                return pd.DataFrame(
                    {
                        "k": np.full(len(m), _k, dtype=np.int64),
                        "q": m["q"].to_numpy(np.int64),
                        "v": m["w"].to_numpy(np.int64),
                        "t": np.full(len(m), _t, dtype=np.int64),
                    }
                )

            step_matches = state.map_batches(
                emit_matches, batch_format="pandas"
            ).to_pandas()
            # bounded: ≤ matches only; grouped/min-folded below
            all_matches.append(step_matches)

    if not all_matches:
        return pd.DataFrame(
            {"q": pd.Series(dtype=np.int64), "v": pd.Series(dtype=np.int64),
             "score": pd.Series(dtype=np.float64),
             "rank": pd.Series(dtype=np.int64)}
        )
    mt = pd.concat(all_matches, ignore_index=True)
    first = mt.groupby(["k", "q", "v"], sort=False)["t"].min().reset_index()
    first["ci"] = first["t"].map(c_int).astype(np.int64)
    sc = first.groupby(["q", "v"], sort=False)["ci"].sum().reset_index()
    sc = sc.sort_values(["q", "ci", "v"], ascending=[True, False, True])
    sc["rank"] = sc.groupby("q", sort=False).cumcount() + 1
    sc = sc[sc["rank"] <= topk].reset_index(drop=True)
    sc["score"] = np.floor(
        np.abs(sc["ci"].to_numpy(np.float64) / (n_seeds * 1e6)) * 1e6 + 0.5
    ) / 1e6
    return sc[["q", "v", "score", "rank"]].sort_values(["q", "rank"]).reset_index(
        drop=True
    )
