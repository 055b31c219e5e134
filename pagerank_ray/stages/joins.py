"""Join strategies (SURVEY.md §2.4).

The reference's only joins are array gathers (``pagerank_d[source_indices_d[e]]``,
``/root/reference/kernel_acsr.cu:202``); the engine needs real relational joins
for url→id attachment. Two physical strategies:

- **broadcast**: the small side is ``ray.put`` once and probed per batch with a
  vectorized pandas ``Index.get_indexer``. Implemented as *stateless tasks*
  with a per-worker-process cache (built once per worker, reused across
  batches) rather than an actor pool: actor pools reserve CPUs for the whole
  execution, and two broadcast stages back-to-back can reserve the entire
  machine and deadlock the streaming executor (observed with 2×8 actors on 8
  CPUs). Stateless tasks are elastic; the cache gives the same
  build-once-per-worker amortization an actor would.
- **shuffle**: Ray Data's native hash-partitioned ``Dataset.join`` (both sides
  hashed into ``num_partitions`` buckets). Used when both sides are large.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

# Above this many build-side rows, fall back to a shuffle join.
BROADCAST_LIMIT = 5_000_000

# per-worker-process cache of deserialized broadcast objects (bounded)
_BCAST_CACHE: dict = {}
_BCAST_CACHE_MAX = 8


def broadcast_get(ref, build, tag: str = ""):
    """Fetch+build a broadcast value once per worker process.

    ``ref`` is an ObjectRef from ``ray.put``; ``build`` maps the raw value to
    the cached form (e.g. an index structure); ``tag`` disambiguates different
    builders over the same ref (closure identity is NOT usable as a key — the
    closure is re-deserialized per task). Bounded FIFO eviction.
    """
    key = (ref.hex(), tag)
    hit = _BCAST_CACHE.get(key)
    if hit is None:
        if len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        hit = build(ray.get(ref))
        _BCAST_CACHE[key] = hit
    return hit


def _collect_arrow(ds: rd.Dataset) -> pa.Table:
    """Materialize a (small) dataset to one driver-side Arrow table."""
    tables = ray.get(ds.to_arrow_refs())
    tables = [t for t in tables if t.num_rows]
    if not tables:
        schema = ds.schema()
        if schema is None:  # fully-empty dataset may have no schema at all
            return pa.table({})
        return pa.schema(
            [pa.field(n, t) for n, t in zip(schema.names, schema.types)]
        ).empty_table()
    return pa.concat_tables(tables).combine_chunks()


def _build_index(key_col: str, val_col: str):
    def build(table: pa.Table):
        return pd.Index(table.column(key_col).to_pandas()), table.column(val_col).to_numpy()

    return build


def attach_column(
    probe: rd.Dataset,
    build: rd.Dataset,
    *,
    probe_col: str,
    build_key: str,
    build_val: str,
    out_col: str,
    build_count: int | None = None,
    drop_probe_col: bool = False,
    num_partitions: int = 32,
    concurrency: int | None = None,  # kept for API compat; broadcast path is stateless
) -> rd.Dataset:
    """probe ⋈ build on probe[probe_col] == build[build_key], emitting build[build_val]
    as ``out_col``. Inner join semantics; broadcast when the build side is small."""
    n_build = build_count if build_count is not None else build.count()
    if n_build <= BROADCAST_LIMIT:
        small = _collect_arrow(build.select_columns([build_key, build_val]))
        ref = ray.put(small)
        builder = _build_index(build_key, build_val)

        def lookup(batch: pa.Table) -> pa.Table:
            index, values = broadcast_get(ref, builder, f"idx:{build_key}:{build_val}")
            probe_vals = batch.column(probe_col).to_pandas()
            pos = index.get_indexer(probe_vals)
            if (pos < 0).any():
                missing = probe_vals[pos < 0].iloc[0]
                raise KeyError(f"broadcast join: probe value {missing!r} not in build side")
            out = batch.append_column(out_col, pa.array(values[pos]))
            if drop_probe_col:
                out = out.drop_columns([probe_col])
            return out

        return probe.map_batches(lookup, batch_format="pyarrow")

    # Shuffle path: Ray-native hash join.
    right = build.select_columns([build_key, build_val])
    joined = probe.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=(probe_col,),
        right_on=(build_key,),
        right_suffix="_r",
    )
    val_name = build_val if build_val not in probe.columns() else build_val + "_r"
    key_name = build_key if build_key != probe_col else build_key + "_r"

    def _rename(t: pa.Table) -> pa.Table:
        drop = [c for c in (key_name,) if c in t.column_names and c != probe_col]
        if drop:
            t = t.drop_columns(drop)
        names = [out_col if c == val_name else c for c in t.column_names]
        t = t.rename_columns(names)
        if drop_probe_col and probe_col in t.column_names:
            t = t.drop_columns([probe_col])
        return t

    return joined.map_batches(_rename, batch_format="pyarrow")


def attach_with_default(
    probe: rd.Dataset,
    build: rd.Dataset,
    *,
    probe_col: str,
    build_key: str,
    build_val: str,
    out_col: str,
    default,
    out_type: pa.DataType = pa.int64(),
    build_count: int | None = None,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Left-join variant of attach_column: missing probe keys get ``default``.
    Small build sides broadcast (sorted-key searchsorted probe); beyond
    ``BROADCAST_LIMIT`` rows it falls back to a Ray-native hash left-outer
    join + fill_null — never an unbounded driver materialization."""
    n_build = build_count if build_count is not None else build.count()
    if n_build > BROADCAST_LIMIT:
        right = build.select_columns([build_key, build_val])
        joined = probe.join(
            right,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=(probe_col,),
            right_on=(build_key,),
            right_suffix="_r",
        )
        val_name = build_val if build_val not in probe.columns() else build_val + "_r"
        key_name = build_key if build_key != probe_col else build_key + "_r"

        def _fill(t: pa.Table) -> pa.Table:
            drop = [c for c in (key_name,) if c in t.column_names and c != probe_col]
            if drop:
                t = t.drop_columns(drop)
            filled = pa.compute.fill_null(t.column(val_name).cast(out_type), default)
            t = t.drop_columns([val_name]).append_column(out_col, filled)
            return t

        return joined.map_batches(_fill, batch_format="pyarrow")

    small = _collect_arrow(build.select_columns([build_key, build_val]))

    def sort_build(table: pa.Table):
        if build_key not in table.column_names:
            return np.array([], np.int64), np.array([], np.int64)
        keys = table.column(build_key).to_numpy()
        vals = table.column(build_val).to_numpy()
        order = np.argsort(keys)
        return keys[order], vals[order]

    ref = ray.put(small)

    def lookup(batch: pa.Table) -> pa.Table:
        keys, vals = broadcast_get(ref, sort_build, f"sorted:{build_key}:{build_val}")
        probe_vals = batch.column(probe_col).to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            out = np.full(len(probe_vals), default)
        else:
            pos = np.clip(np.searchsorted(keys, probe_vals), 0, len(keys) - 1)
            out = np.where(keys[pos] == probe_vals, vals[pos], default)
        return batch.append_column(out_col, pa.array(out).cast(out_type))

    return probe.map_batches(lookup, batch_format="pyarrow")


def pool_size(requested: int) -> int:
    """Clamp an actor-pool size so it can never reserve every CPU of the
    session: a pool holding all CPUs starves its own downstream stages and
    deadlocks the streaming executor (observed twice in this engine's life)."""
    total = int(ray.cluster_resources().get("CPU", 1)) if ray.is_initialized() else requested
    return max(1, min(requested, total - 1))
