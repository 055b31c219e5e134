"""Temporal / streaming-shaped operators over event tables (SURVEY.md §2.9).

Operators Ray Data has no native primitive for, expressed with the
engine's standard bucketed-kernel idiom (hash-bucket groupby → ONE vectorized
kernel per bucket — graph_build.dedup_pairs style, never per-key map_groups):

- ``sessionize``: gap-based session assignment. Events bucket by
  ``hash(user)``, so every user's full history lands in exactly one bucket;
  the kernel lexsorts (user, ts, id) and derives per-user session numbers
  with one cumsum — no per-user Python.
- ``asof_join``: for every left row, the latest right row of the same key
  at-or-before the left timestamp (backward as-of). Both sides bucket by
  the SAME key hash (co-partitioning), each bucket resolved by one
  ``pd.merge_asof`` (vectorized C kernel).
- ``running_totals``: per-key cumulative sum + row rank (the
  ROWS-UNBOUNDED-PRECEDING window primitive), accumulated in exact integer
  cents so the result is order-of-summation independent.

Partitioning assumption (documented per the custom-operator contract): a
single key's rows fit one worker's heap. Skewed users/keys are bounded by
the bucket count only in aggregate — a single pathological key would need
salting by time range, which these tables don't exhibit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def _hash_bucket(vals: np.ndarray, n_buckets: int) -> np.ndarray:
    mixed = (vals.astype(np.int64) * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
    return (mixed % n_buckets).astype(np.int32)


def _cents_half_away(values: np.ndarray) -> np.ndarray:
    """value → int64 cents with DuckDB's ROUND tie rule (half away from zero).
    np.round is half-to-even and diverges at exact .005 inputs; the repo's
    uniform rounding contract (tabular._round_half_away) uses half-away."""
    arr = np.asarray(values, dtype=np.float64) * 100.0
    return (np.sign(arr) * np.floor(np.abs(arr) + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

def sessionize(
    events: rd.Dataset,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_sec: float = 1800.0,
    n_buckets: int = 64,
) -> rd.Dataset:
    """(event, user, ts) → per-event 1-based session number.

    A new session starts at a user's first event and whenever the gap to the
    previous event is STRICTLY greater than ``gap_sec``. Ordering within a
    user is (ts, event_id) — the id tie-break pins simultaneous events.
    Returns (id_col, user_col, session_num).
    """

    def bucketize(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(_hash_bucket(u, n_buckets)))

    gap_us = int(round(gap_sec * 1_000_000))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=np.int64),
                    user_col: pd.Series(dtype=np.int64),
                    "session_num": pd.Series(dtype=np.int64),
                }
            )
        users = df[user_col].to_numpy(dtype=np.int64)
        ids = df[id_col].to_numpy(dtype=np.int64)
        ts = df[ts_col].to_numpy().astype("datetime64[us]").view(np.int64)
        order = np.lexsort((ids, ts, users))
        users_s, ids_s, ts_s = users[order], ids[order], ts[order]
        first_of_user = np.concatenate([[True], users_s[1:] != users_s[:-1]])
        gap_break = np.concatenate([[False], (ts_s[1:] - ts_s[:-1]) > gap_us])
        new_session = first_of_user | gap_break
        seg = np.cumsum(new_session)  # global session counter within bucket
        # per-user 1-based numbering: subtract the counter just before the
        # user's first session (vectorized via repeat of per-user offsets)
        starts = np.flatnonzero(first_of_user)
        lengths = np.diff(np.append(starts, len(users_s)))
        base = np.repeat(seg[starts] - 1, lengths)
        return pd.DataFrame(
            {id_col: ids_s, user_col: users_s, "session_num": seg - base}
        )

    return (
        events.select_columns([id_col, user_col, ts_col])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# backward as-of join
# ---------------------------------------------------------------------------

def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    left_cols: list[str],
    right_cols: list[str],
    right_fill: dict,
    right_tiebreak: list[str] | None = None,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Backward as-of LEFT join: each left row picks the right row with the
    greatest ``right_on`` ≤ ``left_on`` among rows with matching key; left
    rows with no qualifying right row take ``right_fill[col]`` (the fill
    also pins each column's dtype — int fill → int64, float fill → float64 —
    so every bucket emits the identical schema whether or not it saw nulls).

    Among right rows tied on (key, time), the row sorting LAST by
    ``right_tiebreak`` wins (``pd.merge_asof`` keeps the last occurrence of
    an equal ``on`` value) — pass a unique column to make the pick
    deterministic. Both sides hash-bucket by key and union into one groupby, so
    each bucket's kernel sees every row of its keys; ``pd.merge_asof``
    resolves the bucket in one vectorized pass.
    """

    def tag(side: int, on: str, by: str, cols: list[str]):
        def fn(t: pa.Table) -> pa.Table:
            by_np = t.column(by).to_numpy(zero_copy_only=False)
            out = {
                "__side": pa.array(np.full(t.num_rows, side, dtype=np.int8)),
                "__key": t.column(by),
                "__t": t.column(on).cast(pa.timestamp("us")),
                "bucket": pa.array(_hash_bucket(by_np, n_buckets)),
            }
            for c in cols:
                out[c] = t.column(c)
            return pa.table(out)

        return fn

    l_tagged = left.select_columns(
        list(dict.fromkeys([left_by, left_on, *left_cols]))
    ).map_batches(tag(0, left_on, left_by, left_cols), batch_format="pyarrow")
    r_tagged = right.select_columns(
        list(dict.fromkeys([right_by, right_on, *right_cols]))
    ).map_batches(tag(1, right_on, right_by, right_cols), batch_format="pyarrow")

    # union must not mix block schemas: pad each side with the other's value
    # columns. Padding uses typed FILL VALUES, not nulls — an int64 column
    # with nulls round-trips through float64 in the pandas kernel and silently
    # loses precision past 2^53; the padded cells are never read, only the
    # dtype matters
    def pad(missing: list[str], template: dict[str, pa.DataType]):
        def fn(t: pa.Table) -> pa.Table:
            for c in missing:
                typ = template[c]
                if pa.types.is_integer(typ) or pa.types.is_boolean(typ):
                    fill = int(right_fill.get(c, 0))
                    col = pa.array(np.full(t.num_rows, fill, dtype=np.int64), type=typ)
                else:  # floats/strings keep nulls — no precision hazard
                    col = pa.nulls(t.num_rows, typ)
                t = t.append_column(c, col)
            return t

        return fn

    l_schema = dict(zip(l_tagged.schema().names, l_tagged.schema().types))
    r_schema = dict(zip(r_tagged.schema().names, r_tagged.schema().types))
    l_missing = [c for c in right_cols if c not in l_schema]
    r_missing = [c for c in left_cols if c not in r_schema]
    order_cols = ["__side", "__key", "__t", "bucket", *left_cols, *right_cols]
    both = l_tagged.map_batches(pad(l_missing, r_schema), batch_format="pyarrow").map_batches(
        lambda t: t.select(order_cols), batch_format="pyarrow"
    ).union(
        r_tagged.map_batches(pad(r_missing, l_schema), batch_format="pyarrow").map_batches(
            lambda t: t.select(order_cols), batch_format="pyarrow"
        )
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        lf = df[df["__side"] == 0]
        rf = df[df["__side"] == 1]
        lf = lf[["__key", "__t", *left_cols]].sort_values("__t", kind="mergesort")
        rf = rf[["__key", "__t", *right_cols]].sort_values(
            ["__t", *(right_tiebreak or [])], kind="mergesort"
        ).reset_index(drop=True)
        # merge on a POSITIONAL index, not the value columns: merge_asof emits
        # float64+NaN for unmatched rows, which silently corrupts int64 values
        # past 2^53 — row positions are always < 2^53, then values gather
        # exactly from the original right frame
        rpos = rf[["__key", "__t"]].copy()
        rpos["__ridx"] = np.arange(len(rf), dtype=np.int64)
        merged = pd.merge_asof(
            lf, rpos, on="__t", by="__key", direction="backward"
        )
        ridx_f = merged["__ridx"].to_numpy(dtype=np.float64)
        matched = ~np.isnan(ridx_f)
        ridx = ridx_f[matched].astype(np.int64)
        out = merged[[*left_cols]].copy()
        n = len(merged)
        for c in right_cols:
            v = right_fill[c]
            src = rf[c].to_numpy()
            if isinstance(v, bool):
                col = np.full(n, v, dtype=bool)
            elif isinstance(v, (int, np.integer)):
                col = np.full(n, int(v), dtype=np.int64)
            elif isinstance(v, (float, np.floating)):
                col = np.full(n, float(v), dtype=np.float64)
            else:
                col = np.full(n, v, dtype=object)
            if len(ridx):
                col[matched] = src[ridx]
            out[c] = col
        out[left_by] = merged["__key"].to_numpy()
        out[left_on] = merged["__t"].to_numpy()
        return out

    return (
        both.groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# per-key running (cumulative) aggregate
# ---------------------------------------------------------------------------


def running_totals(
    ds: rd.Dataset,
    *,
    key_col: str,
    order_col: str,
    id_col: str,
    value_col: str,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Per-key cumulative sum + 1-based row rank ordered by
    (order_col, id_col) — the ROWS-UNBOUNDED-PRECEDING window primitive of a
    streaming aggregation, as a co-partitioned bucketed kernel (same idiom
    as ``sessionize``: hash-bucket by key, ONE vectorized kernel per bucket).

    Values are accumulated in integer CENTS (``round(v*100)``) so the
    running sum is exact integer arithmetic — float summation order can
    never flip a rounded output, which keeps the result hash-identical to a
    SQL windowed SUM regardless of either engine's internal aggregation
    tree. Returns (id_col, key_col, order_rank, running_total)."""

    def bucketize(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(_hash_bucket(k, n_buckets)))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=np.int64),
                    key_col: pd.Series(dtype=np.int64),
                    "order_rank": pd.Series(dtype=np.int64),
                    "running_total": pd.Series(dtype=np.float64),
                }
            )
        keys = df[key_col].to_numpy(dtype=np.int64)
        ids = df[id_col].to_numpy(dtype=np.int64)
        order_vals = df[order_col].to_numpy()
        if order_vals.dtype.kind == "M":
            order_vals = order_vals.astype("datetime64[us]").view(np.int64)
        cents = _cents_half_away(df[value_col].to_numpy(dtype=np.float64))
        order = np.lexsort((ids, order_vals, keys))
        keys_s, ids_s, cents_s = keys[order], ids[order], cents[order]
        first = np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
        cs = np.cumsum(cents_s)
        starts = np.flatnonzero(first)
        lengths = np.diff(np.append(starts, len(keys_s)))
        base = np.repeat(cs[starts] - cents_s[starts], lengths)
        rank = np.arange(len(keys_s), dtype=np.int64) - np.repeat(starts, lengths) + 1
        return pd.DataFrame(
            {
                id_col: ids_s,
                key_col: keys_s,
                "order_rank": rank,
                "running_total": (cs - base) / 100.0,
            }
        )

    return (
        ds.select_columns([id_col, key_col, order_col, value_col])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
    )


def moving_average(
    ds: rd.Dataset,
    *,
    key_col: str,
    order_col: str,
    id_col: str,
    value_col: str,
    window: int = 3,
    n_buckets: int = 64,
) -> rd.Dataset:
    """Per-key trailing moving average over the last ``window`` rows ordered
    by (order_col, id_col) — the ROWS-BETWEEN-k-PRECEDING window primitive,
    same bucketed idiom as ``running_totals``. Values are summed in exact
    integer cents and divided by the actual window row count, so the float
    result is a single deterministic division on both engines (matches SQL
    ``SUM(cents) OVER w / (100.0 * COUNT(*) OVER w)`` exactly). Returns
    (id_col, key_col, moving_avg)."""

    def bucketize(t: pa.Table) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        return t.append_column("bucket", pa.array(_hash_bucket(k, n_buckets)))

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype=np.int64),
                    key_col: pd.Series(dtype=np.int64),
                    "moving_avg": pd.Series(dtype=np.float64),
                }
            )
        keys = df[key_col].to_numpy(dtype=np.int64)
        ids = df[id_col].to_numpy(dtype=np.int64)
        order_vals = df[order_col].to_numpy()
        if order_vals.dtype.kind == "M":
            order_vals = order_vals.astype("datetime64[us]").view(np.int64)
        cents = _cents_half_away(df[value_col].to_numpy(dtype=np.float64))
        order = np.lexsort((ids, order_vals, keys))
        keys_s, ids_s, cents_s = keys[order], ids[order], cents[order]
        first = np.concatenate([[True], keys_s[1:] != keys_s[:-1]])
        starts = np.flatnonzero(first)
        lengths = np.diff(np.append(starts, len(keys_s)))
        rank = np.arange(len(keys_s), dtype=np.int64) - np.repeat(starts, lengths)
        cs = np.concatenate([[0], np.cumsum(cents_s)])  # prefix sums, cs[i]=Σ<i
        lo = np.maximum(rank - (window - 1), 0) + np.repeat(starts, lengths)
        hi = np.arange(len(keys_s), dtype=np.int64) + 1
        wsum = cs[hi] - cs[lo]
        wcnt = hi - lo
        return pd.DataFrame(
            {
                id_col: ids_s,
                key_col: keys_s,
                "moving_avg": wsum / (100.0 * wcnt),
            }
        )

    return (
        ds.select_columns([id_col, key_col, order_col, value_col])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
    )
