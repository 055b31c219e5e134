"""Exact distributed quantiles (SURVEY.md §2.5 aggregation breadth).

Training-data pipelines constantly need p50/p95 of doc length, token count,
score distributions. Approximate sketches trade accuracy for one pass; this
operator is EXACT with the same linear interpolation as ``np.percentile`` /
DuckDB ``quantile_cont``, and still never materializes the column on the
driver: global sort → per-block row counts (the ``assign_dense_ids``
block-offset idiom) → fetch only the ≤ 2 scalar values bracketing each
target rank from the blocks that hold them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _drop_null_nan(ds: rd.Dataset, col: str) -> rd.Dataset:
    """Drop NULL (and, for float columns, NaN) rows — DuckDB quantile_cont /
    quantile_disc ignore NULLs, and Ray's sort would otherwise place them at
    one end of the sorted blocks and shift every rank (ADVICE r2)."""

    def keep(t: pa.Table) -> pa.Table:
        c = t.column(col)
        mask = pc.is_valid(c)
        if pa.types.is_floating(c.type):
            mask = pc.and_kleene(mask, pc.invert(pc.is_nan(c)))
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


@ray.remote
def _nrows(table: pa.Table) -> int:
    return table.num_rows


@ray.remote
def _value_at(table: pa.Table, local_idx: int, col: str) -> float:
    return float(table.column(col)[local_idx].as_py())


def exact_quantiles(ds: rd.Dataset, col: str, qs: list[float]) -> pd.DataFrame:
    """(q, value) rows — exact linear-interpolation quantiles of ``col``.

    One distributed sort; the driver sees only per-block counts and the
    bracketing scalars (≤ 2 per quantile). NULL/NaN rows are excluded from n
    (DuckDB quantile_cont semantics).
    """
    s = _drop_null_nan(ds.select_columns([col]), col).sort(col).materialize()
    refs = s.to_arrow_refs()
    counts = np.asarray(ray.get([_nrows.remote(r) for r in refs]), dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    n = int(offsets[-1])
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=np.float64),
                             "value": np.full(len(qs), np.nan)})

    def fetch(global_idx: int):
        blk = int(np.searchsorted(offsets, global_idx, side="right") - 1)
        return _value_at.remote(refs[blk], int(global_idx - offsets[blk]), col)

    tasks = []
    for q in qs:
        pos = q * (n - 1)
        i0, i1 = int(np.floor(pos)), int(np.ceil(pos))
        tasks.append((pos, fetch(i0), fetch(i1) if i1 != i0 else None))
    out = []
    for (pos, r0, r1), q in zip(tasks, qs):
        v0 = ray.get(r0)
        v1 = ray.get(r1) if r1 is not None else v0
        frac = pos - np.floor(pos)
        out.append((q, v0 + (v1 - v0) * frac))
    return pd.DataFrame({"q": [o[0] for o in out], "value": [o[1] for o in out]})


def exact_quantile_disc(ds: rd.Dataset, col: str, q: float) -> float:
    """DuckDB ``quantile_disc`` semantics: the ACTUAL element at sorted index
    ``max(ceil(q·n) − 1, 0)`` — no interpolation, so downstream comparisons
    against the threshold are ulp-exact on both engine and SQL sides.
    NULL/NaN rows are excluded from n (DuckDB quantile_disc semantics)."""
    s = _drop_null_nan(ds.select_columns([col]), col).sort(col).materialize()
    refs = s.to_arrow_refs()
    counts = np.asarray(ray.get([_nrows.remote(r) for r in refs]), dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    n = int(offsets[-1])
    if n == 0:
        return float("nan")
    idx = max(int(np.ceil(q * n)) - 1, 0)
    blk = int(np.searchsorted(offsets, idx, side="right") - 1)
    return float(ray.get(_value_at.remote(refs[blk], int(idx - offsets[blk]), col)))


def approx_quantiles_histogram(
    ds: rd.Dataset, col: str, qs: list[float], *, n_bins: int = 2048
) -> pd.DataFrame:
    """APPROXIMATE quantiles via an equi-width histogram sketch — the scale
    path beside ``exact_quantiles``: two streaming passes (min/max, then
    per-batch bincount), a shuffle of at most ``n_bins`` count rows (never
    the values), and a closed-form driver step. Error is bounded by one bin
    width of the value range — the right trade at 100 TB where the exact
    operator's global sort is an all-to-all of every row.

    DETERMINISTIC AND SQL-REPRODUCIBLE: bin assignment, the rank target
    ``ceil(q·n)``, and the interpolation ``mn + width·(bin + frac)`` are
    plain double arithmetic in the same evaluation order on both engines, so
    even the approximate estimates hash-match (same contract as the HLL
    sketch). Requires max > min (non-degenerate range) and no NULL/NaN.

    Returns DataFrame (q, estimate) in the given quantile order."""
    clean = _drop_null_nan(ds, col).select_columns([col])
    from ray.data.aggregate import Count, Max, Min

    stats = clean.aggregate(Min(col), Max(col), Count())
    mn = float(stats[f"min({col})"])
    mx = float(stats[f"max({col})"])
    n = int(stats["count()"])
    if not n or mx <= mn:
        raise ValueError("approx_quantiles_histogram needs a non-degenerate range")
    width = (mx - mn) / float(n_bins)

    def bincount(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(np.floor((x - mn) / width).astype(np.int64), 0, n_bins - 1)
        counts = np.bincount(b, minlength=n_bins)
        nz = np.flatnonzero(counts)
        return pa.table({"bin": pa.array(nz), "c": pa.array(counts[nz])})

    final = (
        clean.map_batches(bincount, batch_format="pyarrow")
        .groupby("bin")
        .sum("c")
        .to_pandas()
    )
    counts = np.zeros(n_bins, dtype=np.int64)
    counts[final["bin"].to_numpy(dtype=np.int64)] = final["sum(c)"].to_numpy(dtype=np.int64)
    cum = np.cumsum(counts)
    rows = []
    for q in qs:
        target = np.ceil(q * n)  # rank in 1..n (disc-style), as a double
        b = int(np.searchsorted(cum, target, side="left"))
        before = float(cum[b - 1]) if b else 0.0
        frac = (float(target) - before) / float(counts[b])
        rows.append((q, mn + width * (float(b) + frac)))
    return pd.DataFrame(rows, columns=["q", "estimate"])


def approx_quantiles_grouped(
    ds: rd.Dataset, col: str, group_col: str, qs: list[float], *, n_bins: int = 2048
) -> pd.DataFrame:
    """GROUP BY + the equi-width histogram quantile sketch — the grouped
    sibling of ``approx_quantiles_histogram`` (the HLL/grouped-HLL pattern):
    one small grouped min/max/count pass fixes each group's bin geometry
    (broadcast to the binning stage via the closure — n_groups rows), each
    batch then folds its rows into per-(group, bin) count partials with ONE
    dense bincount scatter, and the shuffle carries ≤ n_groups × n_bins
    count rows — never the values. The closed-form rank/interpolation step
    runs per group on the driver over sketch-sized state. Assumes group
    cardinality is register-scale (each group costs n_bins rows in the
    combine) and every group has a non-degenerate value range.

    Same determinism contract as the ungrouped sketch: bin assignment,
    ceil-rank targets, and the interpolation are the identical double
    expressions the SQL oracle evaluates, so even the APPROXIMATE estimates
    hash-match. Returns (group_col, q, estimate) sorted by (group, q)."""
    from ray.data.aggregate import Count, Max, Min

    clean = _drop_null_nan(ds, col).select_columns([col, group_col])
    stats = clean.groupby(group_col).aggregate(Min(col), Max(col), Count()).to_pandas()
    gvals = stats[group_col].tolist()
    mn_d = dict(zip(gvals, stats[f"min({col})"].astype(float)))
    mx_d = dict(zip(gvals, stats[f"max({col})"].astype(float)))
    n_d = dict(zip(gvals, stats["count()"].astype(int)))
    for g in gvals:
        if not n_d[g] or mx_d[g] <= mn_d[g]:
            raise ValueError(
                f"approx_quantiles_grouped: degenerate range in group {g!r}"
            )
    width_d = {g: (mx_d[g] - mn_d[g]) / float(n_bins) for g in gvals}

    def bincount(t: pa.Table) -> pa.Table:
        x = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniq = pd.factorize(t.column(group_col).to_pandas(), sort=False)
        u_mn = np.array([mn_d[g] for g in uniq], np.float64)
        u_w = np.array([width_d[g] for g in uniq], np.float64)
        b = np.clip(
            np.floor((x - u_mn[codes]) / u_w[codes]).astype(np.int64), 0, n_bins - 1
        )
        dense = np.zeros(len(uniq) * n_bins, np.int64)
        np.add.at(dense, codes.astype(np.int64) * n_bins + b, 1)
        nz = np.flatnonzero(dense)
        return pa.table(
            {
                group_col: pa.array(np.asarray(uniq, object)[nz // n_bins]),
                "bin": pa.array(nz % n_bins),
                "c": pa.array(dense[nz]),
            }
        )

    final = (
        clean.map_batches(bincount, batch_format="pyarrow")
        .groupby([group_col, "bin"])
        .sum("c")
        .to_pandas()
    )
    rows = []
    for g, sub in final.groupby(group_col, sort=True):
        counts = np.zeros(n_bins, np.int64)
        counts[sub["bin"].to_numpy(np.int64)] = sub["sum(c)"].to_numpy(np.int64)
        cum = np.cumsum(counts)
        for q in qs:
            target = np.ceil(q * n_d[g])
            b = int(np.searchsorted(cum, target, side="left"))
            before = float(cum[b - 1]) if b else 0.0
            frac = (float(target) - before) / float(counts[b])
            rows.append((g, q, mn_d[g] + width_d[g] * (float(b) + frac)))
    return pd.DataFrame(rows, columns=[group_col, "q", "estimate"])
