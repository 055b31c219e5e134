"""HyperBall / HyperANF — the approximate neighborhood function N(t) over a
graph via per-vertex HyperLogLog counters (Palmer, Gibbons & Faloutsos, ANF,
KDD 2002; Boldi, Rosa & Vigna, "HyperANF: Approximating the Neighbourhood
Function of Very Large Graphs on a Budget", WWW 2011). THE web-graph
distance-measurement algorithm (effective diameter, average distance — the
"four degrees of separation" computation), here as a Ray-Data-native
iterative pipeline.

State: one 16-register (p = 4) HLL counter per vertex, registers 6 bits
each, PACKED into two int64 lane columns (8 × 6-bit lanes per int64) so the
per-vertex state is two scalars — attach-joinable and shuffle-cheap. Each
round t: counter(v) ← lanewise-max(counter(v), counter(u) ∀ u ~ v) — the
register-max union of HLL sketches — so counter(v) after t rounds sketches
the ball of radius t around v. N(t) = Σ_v estimate(counter_t(v)).

Determinism / oracle parity (the engine convention: even APPROXIMATE
estimates hash-match the SQL oracle):
- item hash = the repo's shared fmix64 on the ORIGINAL vertex id; rho uses
  exact integer exponent extraction (32-bit-split frexp — w < 2^60 exceeds
  float53, so the split is load-bearing);
- the estimator's harmonic sum uses CLIPPED registers min(m, 48):
  Σ 2^(48−m') ≤ 16·2^48 < 2^53 is an exact integer in float64, so any
  summation order gives the same double — mirrored in SQL as an exact
  HUGEINT power-table sum cast to DOUBLE;
- the bias-corrected estimate and the small-range linear-counting branch
  (Flajolet et al. 2007) are the identical left-associated float expression
  on identical doubles both sides; per-vertex estimates are integerized
  (round-half-away at 1e-6) before the global exact-integer sum.

Scale: per round, TWO broadcast-or-hash attaches (neighbor state onto the
adjacency — build side is the n-row packed state) + ONE bucketed lanewise
grouped-max + ONE estimate reduction with O(1)-row partials. Nothing
per-vertex ever reaches the driver; rounds = O(effective diameter).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray as _ray
import ray.data as rd

from pagerank_ray.functions.text import fmix64, round_half_away
from pagerank_ray.stages import joins
from pagerank_ray.stages.graph_build import distinct_values

P = 4
M = 1 << P  # 16 registers
WBITS = 64 - P  # 60
CLIP = 48
# left-associated, mirrored verbatim in the SQL oracle:
# 0.7213/(1 + 1.079/16.0) * 256.0 * 281474976710656.0
_ALPHA16 = 0.7213 / (1 + 1.079 / 16.0)
_EST_NUM = _ALPHA16 * 256.0 * 281474976710656.0


def _floor_log2_u64(w: np.ndarray) -> np.ndarray:
    """Exact floor(log2(w)) for uint64 w > 0 via 32-bit split: each half is
    < 2^32, exactly representable in float64, so frexp's exponent is exact
    (the p≥12 HLL kernel's argument, extended past 2^52)."""
    out = np.zeros(len(w), np.int64)
    hi = (w >> np.uint64(32)).astype(np.uint64)
    use_hi = hi > 0
    if use_hi.any():
        _, e = np.frexp(hi[use_hi].astype(np.float64))
        out[use_hi] = 32 + e.astype(np.int64) - 1
    lo_only = ~use_hi
    if lo_only.any():
        lo = (w[lo_only] & np.uint64(0xFFFFFFFF)).astype(np.float64)
        _, e = np.frexp(lo)
        out[lo_only] = e.astype(np.int64) - 1
    return out


def _unpack(pk0: np.ndarray, pk1: np.ndarray) -> np.ndarray:
    """(n,) packed lane pairs → (n, 16) register matrix."""
    regs = np.empty((len(pk0), M), np.int64)
    for j in range(8):
        regs[:, j] = (pk0 >> (6 * j)) & 63
        regs[:, 8 + j] = (pk1 >> (6 * j)) & 63
    return regs


def _pack(regs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    pk0 = np.zeros(len(regs), np.int64)
    pk1 = np.zeros(len(regs), np.int64)
    for j in range(8):
        pk0 |= regs[:, j] << (6 * j)
        pk1 |= regs[:, 8 + j] << (6 * j)
    return pk0, pk1


def _init_state(ids: np.ndarray) -> pa.Table:
    """Singleton HLL counter per vertex: one register (the id's own bucket)
    set to rho(w), every other register 0."""
    h = fmix64(ids.astype(np.uint64))
    bucket = (h >> np.uint64(WBITS)).astype(np.int64)
    w = h & np.uint64((1 << WBITS) - 1)
    rho = np.full(len(w), WBITS + 1, np.int64)
    nz = w > 0
    if nz.any():
        rho[nz] = WBITS - _floor_log2_u64(w[nz])
    regs = np.zeros((len(ids), M), np.int64)
    regs[np.arange(len(ids)), bucket] = rho
    pk0, pk1 = _pack(regs)
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "pk0": pa.array(pk0, pa.int64()),
            "pk1": pa.array(pk1, pa.int64()),
        }
    )


def _lanemax_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch lanewise register max by id: unpack → 16-column groupby
    max (one C-level pass) → repack."""
    regs = _unpack(df["pk0"].to_numpy(np.int64), df["pk1"].to_numpy(np.int64))
    cols = {f"r{j}": regs[:, j] for j in range(M)}
    g = pd.DataFrame({"id": df["id"].to_numpy(np.int64), **cols})
    g = g.groupby("id", sort=False).max().reset_index()
    mx = np.stack([g[f"r{j}"].to_numpy(np.int64) for j in range(M)], axis=1)
    pk0, pk1 = _pack(mx)
    return pd.DataFrame({"id": g["id"].to_numpy(np.int64), "pk0": pk0, "pk1": pk1})


def _grouped_lanemax(ds: rd.Dataset, n_buckets: int = 64) -> rd.Dataset:
    """Bucket-partitioned lanewise max-combine (the grouped_count idiom)."""

    def bucketize(t: pa.Table) -> pa.Table:
        k = t.column("id").to_numpy(zero_copy_only=False)
        mixed = (k * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return _lanemax_partial(df)

    return (
        ds.map_batches(_lanemax_partial, batch_format="pandas")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
        .map_batches(lambda t: t.select(["id", "pk0", "pk1"]), batch_format="pyarrow")
    )


def _round_stats(state: rd.Dataset) -> tuple[int, int]:
    """(Σ integerized per-vertex estimates, Σ raw registers) — O(1)-row
    per-batch partials, exact integer sums."""

    def partial(t: pa.Table) -> pa.Table:
        regs = _unpack(
            t.column("pk0").to_numpy(zero_copy_only=False),
            t.column("pk1").to_numpy(zero_copy_only=False),
        )
        clipped = np.minimum(regs, CLIP)
        # all terms are exact powers of two; row sums stay < 2^53 → exact
        sprime = (2.0 ** (CLIP - clipped)).sum(axis=1)
        zeros = (regs == 0).sum(axis=1)
        raw = _EST_NUM / sprime
        safe_z = np.maximum(zeros, 1).astype(np.float64)
        lin = 16.0 * np.log(16.0 / safe_z)
        e = np.where((raw <= 40.0) & (zeros > 0), lin, raw)
        e_int = round_half_away(e * 1000000.0, 0).astype(np.int64)
        return pa.table(
            {
                "nf": pa.array([int(e_int.sum())], pa.int64()),
                "sregs": pa.array([int(regs.sum())], pa.int64()),
            }
        )

    parts = state.map_batches(partial, batch_format="pyarrow").to_pandas()
    return int(parts["nf"].sum()), int(parts["sregs"].sum())


def _est_int_vec(regs: np.ndarray) -> np.ndarray:
    """Per-vertex integerized HLL estimates over a dense (n, 16) register
    matrix — the SAME arithmetic as _round_stats' per-batch kernel (exact
    integer float sums, identical left-associated expression)."""
    clipped = np.minimum(regs, CLIP)
    sprime = (2.0 ** (CLIP - clipped)).sum(axis=1)
    zeros = (regs == 0).sum(axis=1)
    raw = _EST_NUM / sprime
    safe_z = np.maximum(zeros, 1).astype(np.float64)
    lin = 16.0 * np.log(16.0 / safe_z)
    e = np.where((raw <= 40.0) & (zeros > 0), lin, raw)
    return round_half_away(e * 1000000.0, 0).astype(np.int64)


def _stats_np(regs: np.ndarray) -> tuple[int, int]:
    return int(_est_int_vec(regs).sum()), int(regs.sum())


@_ray.remote
def _hyperball_tail(e_blocks: list, rounds: int) -> pa.Table:
    """All rounds in ONE task once the edge set fits (the coreness/mis/ktruss
    in-memory-tail idiom): identical register dynamics, vectorized
    np.maximum.at over the dense (n, 16) matrix — a Dataset stage launch per
    tiny round would dominate wall time at bench scales."""
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
    si = np.searchsorted(ids, s)  # ids sorted-unique → exact dense index
    di = np.searchsorted(ids, d)
    v_idx = np.concatenate([si, di])  # symmetrized adjacency
    x_idx = np.concatenate([di, si])
    init = _init_state(ids)
    regs = _unpack(
        init.column("pk0").to_numpy(zero_copy_only=False),
        init.column("pk1").to_numpy(zero_copy_only=False),
    )
    rows = [(0, *_stats_np(regs))]
    for t in range(1, rounds + 1):
        new = regs.copy()
        np.maximum.at(new, v_idx, regs[x_idx])
        regs = new
        rows.append((t, *_stats_np(regs)))
    return pa.table(
        {
            "t": pa.array([r[0] for r in rows], pa.int64()),
            "nf_scaled": pa.array([r[1] for r in rows], pa.int64()),
            "sum_registers": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def hyperball(
    edges: rd.Dataset, *, rounds: int = 8, tail_cutoff: int = 4_000_000
) -> pd.DataFrame:
    """edges (src_id, dst_id; original ids) → one row per round t = 0..rounds
    with the scaled neighborhood function N(t)·1e6 and the register mass.
    The graph is symmetrized (both directions contribute; self-loops are
    harmless under register max). Edge sets under ``tail_cutoff`` run all
    rounds in one in-memory task (identical arithmetic — parity-tested);
    larger graphs take the distributed per-round path."""
    edges = edges.materialize()
    if edges.count() <= tail_cutoff:
        tbl = _ray.get(_hyperball_tail.remote(edges.to_arrow_refs(), rounds))
        return tbl.to_pandas()
    adj = edges.map_batches(
        lambda t: pa.table(
            {
                "v": pa.concat_arrays(
                    [
                        t.column("src_id").combine_chunks().cast(pa.int64()),
                        t.column("dst_id").combine_chunks().cast(pa.int64()),
                    ]
                ),
                "x": pa.concat_arrays(
                    [
                        t.column("dst_id").combine_chunks().cast(pa.int64()),
                        t.column("src_id").combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    mentions = edges.map_batches(
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
    )
    vertices = distinct_values(mentions, "id")
    state = vertices.map_batches(
        lambda t: _init_state(t.column("id").to_numpy(zero_copy_only=False)),
        batch_format="pyarrow",
    ).materialize()
    n = state.count()

    rows = []
    nf, sregs = _round_stats(state)
    rows.append((0, nf, sregs))
    for t in range(1, rounds + 1):
        contrib = joins.attach_column(
            joins.attach_column(
                adj,
                state,
                probe_col="x",
                build_key="id",
                build_val="pk0",
                out_col="pk0",
                build_count=n,
                drop_probe_col=False,
            ),
            state,
            probe_col="x",
            build_key="id",
            build_val="pk1",
            out_col="pk1",
            build_count=n,
            drop_probe_col=True,
        ).map_batches(
            lambda t: pa.table(
                {
                    "id": t.column("v"),
                    "pk0": t.column("pk0"),
                    "pk1": t.column("pk1"),
                }
            ),
            batch_format="pyarrow",
        )
        state = _grouped_lanemax(contrib.union(state)).materialize()
        nf, sregs = _round_stats(state)
        rows.append((t, nf, sregs))
    return pd.DataFrame(
        {
            "t": pd.array([r[0] for r in rows], dtype=np.int64),
            "nf_scaled": pd.array([r[1] for r in rows], dtype=np.int64),
            "sum_registers": pd.array([r[2] for r in rows], dtype=np.int64),
        }
    )


# ---------------------------------------------------------------------------
# Harmonic centrality via HyperBall (Boldi & Vigna, "In-Core Computation of
# Geometric Centralities with HyperBall", ICDM workshops 2013): H(v) =
# Σ_{t≥1} (|B(v,t)| − |B(v,t−1)|) / t, read off the same per-vertex register
# dynamics. To keep both engines exact-integer, the 1/t weights are scaled by
# L = lcm(1..rounds): harmonic_scaled(v) = Σ_t ΔE_t(v) · (L // t) where
# E_t(v) is the integerized (·1e6) per-vertex ball estimate — every term is
# an int64 product of ints computed identically on both sides.
# ---------------------------------------------------------------------------


def _harmonic_weights(rounds: int) -> list[int]:
    import math

    lcm = math.lcm(*range(1, rounds + 1))
    return [lcm // t for t in range(1, rounds + 1)]


def _init_state_h(ids: np.ndarray) -> pa.Table:
    init = _init_state(ids)
    regs = _unpack(
        init.column("pk0").to_numpy(zero_copy_only=False),
        init.column("pk1").to_numpy(zero_copy_only=False),
    )
    return init.append_column(
        "prev_e", pa.array(_est_int_vec(regs), pa.int64())
    ).append_column("h", pa.array(np.zeros(len(ids), np.int64), pa.int64()))


def _lanemax_h_partial(df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combine for the h-carrying state: lanewise register max per
    id + SUM of (prev_e, h). Sum is the correct partial combine because
    exactly ONE state row per id exists globally and contrib rows carry 0s —
    so the per-id sum reconstructs the state row's scalars exactly."""
    regs = _unpack(df["pk0"].to_numpy(np.int64), df["pk1"].to_numpy(np.int64))
    g = pd.DataFrame(
        {
            "id": df["id"].to_numpy(np.int64),
            **{f"r{j}": regs[:, j] for j in range(M)},
            "prev_e": df["prev_e"].to_numpy(np.int64),
            "h": df["h"].to_numpy(np.int64),
        }
    )
    agg = {f"r{j}": "max" for j in range(M)}
    agg["prev_e"] = "sum"
    agg["h"] = "sum"
    g = g.groupby("id", sort=False).agg(agg).reset_index()
    mx = np.stack([g[f"r{j}"].to_numpy(np.int64) for j in range(M)], axis=1)
    pk0, pk1 = _pack(mx)
    return pd.DataFrame(
        {
            "id": g["id"].to_numpy(np.int64),
            "pk0": pk0,
            "pk1": pk1,
            "prev_e": g["prev_e"].to_numpy(np.int64),
            "h": g["h"].to_numpy(np.int64),
        }
    )


def _grouped_lanemax_h(ds: rd.Dataset, w: int, n_buckets: int = 64) -> rd.Dataset:
    """Bucketed combine + the round's harmonic update: after the per-id
    merge, fold h ← h + (E_new − E_prev)·w and roll prev_e forward."""

    def bucketize(t: pa.Table) -> pa.Table:
        key = t.column("id").to_numpy(zero_copy_only=False)
        mixed = (key * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = _lanemax_h_partial(df)
        regs = _unpack(out["pk0"].to_numpy(np.int64), out["pk1"].to_numpy(np.int64))
        e_new = _est_int_vec(regs)
        out["h"] = out["h"].to_numpy(np.int64) + (e_new - out["prev_e"].to_numpy(np.int64)) * np.int64(w)
        out["prev_e"] = e_new
        return out

    return (
        ds.map_batches(_lanemax_h_partial, batch_format="pandas")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
        .map_batches(
            lambda t: t.select(["id", "pk0", "pk1", "prev_e", "h"]),
            batch_format="pyarrow",
        )
    )


def _tail_fold(e_blocks: list, rounds: int, weights: list[int]):
    """Single-task register replay + weighted ΔE fold shared by the
    harmonic and Lin tails: returns (ids, reach, h) where reach is the
    final integerized per-vertex ball estimate and
    h = Σ_t ΔE_t · weights[t−1] (exact int64 both engines)."""
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
    if len(ids) == 0:
        z = np.array([], np.int64)
        return ids, z, z
    si = np.searchsorted(ids, s)
    di = np.searchsorted(ids, d)
    v_idx = np.concatenate([si, di])
    x_idx = np.concatenate([di, si])
    init = _init_state(ids)
    regs = _unpack(
        init.column("pk0").to_numpy(zero_copy_only=False),
        init.column("pk1").to_numpy(zero_copy_only=False),
    )
    prev = _est_int_vec(regs)
    h = np.zeros(len(ids), np.int64)
    for t in range(1, rounds + 1):
        new = regs.copy()
        np.maximum.at(new, v_idx, regs[x_idx])
        regs = new
        e = _est_int_vec(regs)
        h += (e - prev) * np.int64(weights[t - 1])
        prev = e
    return ids, prev, h


@_ray.remote
def _harmonic_tail(e_blocks: list, rounds: int, k: int) -> pa.Table:
    """All rounds in ONE task once the edge set fits (same cutoff idiom as
    _hyperball_tail): identical register dynamics + the same integer
    harmonic fold; parity-tested against the distributed path."""
    ids, _, h = _tail_fold(e_blocks, rounds, _harmonic_weights(rounds))
    order = np.lexsort((ids, -h))[: min(k, len(ids))]
    return pa.table(
        {
            "id": pa.array(ids[order], pa.int64()),
            "harmonic_scaled": pa.array(h[order], pa.int64()),
        }
    )


@_ray.remote
def _lin_tail(e_blocks: list, rounds: int, k: int) -> pa.Table:
    """Lin-closeness tail: same replay, weights = t (sum of distances
    within the radius-`rounds` ball), reach = final ball estimate."""
    ids, reach, h = _tail_fold(e_blocks, rounds, list(range(1, rounds + 1)))
    order = np.lexsort((ids, h, -reach))[: min(k, len(ids))]
    return pa.table(
        {
            "id": pa.array(ids[order], pa.int64()),
            "reach_scaled": pa.array(reach[order], pa.int64()),
            "sumdist_scaled": pa.array(h[order], pa.int64()),
        }
    )


def harmonic_centrality(
    edges: rd.Dataset,
    *,
    rounds: int = 6,
    k: int = 20,
    tail_cutoff: int = 4_000_000,
) -> pd.DataFrame:
    """edges (src_id, dst_id; original ids) → top-k vertices of the
    symmetrized graph by HyperBall harmonic centrality (scaled by 1e6·lcm;
    ties broken by ascending id). Same two-level shape as hyperball(): the
    in-memory tail under ``tail_cutoff``, else the distributed per-round
    path whose h-accumulator rides INSIDE the bucketed lanemax exchange
    (contrib rows carry zeros; sum reconstructs the unique state row), so
    the per-round cost is identical to hyperball's + two int64 columns."""
    edges = edges.materialize()
    if edges.count() <= tail_cutoff:
        tbl = _ray.get(_harmonic_tail.remote(edges.to_arrow_refs(), rounds, k))
        return tbl.to_pandas()
    state = _h_state_loop(edges, _harmonic_weights(rounds))

    def topk_partial(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -h))[: min(k, len(ids))]
        return pa.table(
            {
                "id": pa.array(ids[order], pa.int64()),
                "harmonic_scaled": pa.array(h[order], pa.int64()),
            }
        )

    cand = state.map_batches(topk_partial, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["harmonic_scaled", "id"], ascending=[False, True]
    ).head(k)
    return cand.reset_index(drop=True)


def _h_state_loop(edges: rd.Dataset, weights: list[int]) -> rd.Dataset:
    """Shared distributed register loop for the HyperBall geometric
    centralities (harmonic, Lin): symmetrize, init the h-carrying state,
    then per round one neighbor-state attach + one bucketed lanewise
    grouped-max folding h ← h + ΔE·weights[t−1]. Returns the final
    materialized state (id, pk0, pk1, prev_e, h) — prev_e is the
    integerized radius-`len(weights)` ball estimate."""
    adj = edges.map_batches(
        lambda t: pa.table(
            {
                "v": pa.concat_arrays(
                    [
                        t.column("src_id").combine_chunks().cast(pa.int64()),
                        t.column("dst_id").combine_chunks().cast(pa.int64()),
                    ]
                ),
                "x": pa.concat_arrays(
                    [
                        t.column("dst_id").combine_chunks().cast(pa.int64()),
                        t.column("src_id").combine_chunks().cast(pa.int64()),
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    mentions = edges.map_batches(
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
    )
    vertices = distinct_values(mentions, "id")
    state = vertices.map_batches(
        lambda t: _init_state_h(t.column("id").to_numpy(zero_copy_only=False)),
        batch_format="pyarrow",
    ).materialize()
    n = state.count()
    for t in range(1, len(weights) + 1):
        contrib = joins.attach_column(
            joins.attach_column(
                adj,
                state,
                probe_col="x",
                build_key="id",
                build_val="pk0",
                out_col="pk0",
                build_count=n,
                drop_probe_col=False,
            ),
            state,
            probe_col="x",
            build_key="id",
            build_val="pk1",
            out_col="pk1",
            build_count=n,
            drop_probe_col=True,
        ).map_batches(
            lambda t: pa.table(
                {
                    "id": t.column("v"),
                    "pk0": t.column("pk0"),
                    "pk1": t.column("pk1"),
                    "prev_e": pa.array(np.zeros(t.num_rows, np.int64)),
                    "h": pa.array(np.zeros(t.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        )
        state = _grouped_lanemax_h(
            contrib.union(state), weights[t - 1]
        ).materialize()
    return state


def lin_closeness(
    edges: rd.Dataset,
    *,
    rounds: int = 6,
    k: int = 20,
    tail_cutoff: int = 4_000_000,
) -> pd.DataFrame:
    """edges (src_id, dst_id; original ids) → top-k vertices of the
    symmetrized graph by Lin closeness centrality (Boldi & Vigna, "Axioms
    for Centrality", Internet Math. 2014 §3 / HyperBall ICDM-W 2013 §3:
    Lin(v) = |reachable(v)|² / Σ_u d(v,u), the closeness variant that is
    well-defined on disconnected graphs). Read off the SAME HyperBall
    register dynamics as harmonic_centrality with weights t instead of
    lcm/t: reach_scaled = final integerized ball estimate, sumdist_scaled
    = Σ_t t·ΔE_t — both exact int64 on both engines, so the result is a
    hash-matchable pair per vertex. Ordering is the exact lexicographic
    Lin order (reach DESC, sumdist ASC, id ASC): among equal-reach
    vertices Lin ranks by smaller distance sum, and cross-reach ratio
    comparison would need 128-bit division both sides — the pair output
    keeps every engine value an exact integer instead."""
    edges = edges.materialize()
    if edges.count() <= tail_cutoff:
        tbl = _ray.get(_lin_tail.remote(edges.to_arrow_refs(), rounds, k))
        return tbl.to_pandas()
    state = _h_state_loop(edges, list(range(1, rounds + 1)))

    def topk_partial(t: pa.Table) -> pa.Table:
        ids = t.column("id").to_numpy(zero_copy_only=False)
        reach = t.column("prev_e").to_numpy(zero_copy_only=False)
        h = t.column("h").to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h, -reach))[: min(k, len(ids))]
        return pa.table(
            {
                "id": pa.array(ids[order], pa.int64()),
                "reach_scaled": pa.array(reach[order], pa.int64()),
                "sumdist_scaled": pa.array(h[order], pa.int64()),
            }
        )

    cand = state.map_batches(topk_partial, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(
        ["reach_scaled", "sumdist_scaled", "id"], ascending=[False, True, True]
    ).head(k)
    return cand.reset_index(drop=True)
