"""Graph build: pages → extracted → vertices + deduplicated edge table.

SURVEY.md §3.4 Phase 1/2. Shuffle inventory (each is an all-to-all):
  #1 distinct urls   — groupby("url") with a per-batch unique pre-combine
  #2 url sort        — global sort for deterministic contiguous id assignment
  #3 edge dedup      — groupby(src_id, dst_id) with per-batch pair-dedup pre-combine
  #4 degree counts   — groupby(id) with per-batch bincount pre-combine

The url→id joins are broadcast at test scale and hash-partitioned Ray-native
joins beyond ``joins.BROADCAST_LIMIT`` (SURVEY.md §2.4 [NORTH]).

Id assignment matches the CSR contiguity requirement of the reference
(``destination_offsets_h[n+1]``, /root/reference/kernel_acsr.cu:371): ids are
dense ``0..n-1`` in globally-sorted url order, computed with a two-pass
block-offset scheme (per-block counts → driver prefix sum → vectorized add),
never a driver-side row loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from pagerank_ray.functions.extract import extract_batch
from pagerank_ray.functions.urls import normalize_url
from pagerank_ray.stages import joins


# ---------------------------------------------------------------------------
# Phase 0: page-level dedup by url (SURVEY.md §2.9 pinned streaming rule)
# ---------------------------------------------------------------------------

def dedup_pages_by_url(pages: rd.Dataset, *, n_buckets: int = 64) -> rd.Dataset:
    """One page per url: keep the snapshot with the LATEST ``warc_ts``; ties
    broken by the smallest md5(html) digest (SURVEY.md §2.9 pinned rule).

    Bucketed by url hash — the same shuffle shape as dedup_pairs — so each
    url's snapshots co-locate in exactly one vectorized kernel. At crawl scale
    this shuffles the html payloads once; the cheaper variant for re-crawled
    corpora — carry (warc_ts, digest) through extraction and dedup the
    html-free EXTRACTED table, same winner rule, lighter exchange — is
    ``extract_pages_with_provenance`` + ``dedup_extracted_by_url``
    (``build_graph(dedup_stage="extracted")``).
    """
    import hashlib

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(t.column("url").to_pandas(), index=False).to_numpy()
        return t.append_column("bucket", pa.array((h % n_buckets).astype(np.int32)))

    def pick(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["bucket"])
        if t.num_rows == 0:
            return t
        urls = np.asarray(t.column("url").to_pylist(), dtype=object)
        ts = t.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        digests = np.asarray(
            [hashlib.md5(b or b"").hexdigest() for b in t.column("html").to_pylist()],
            dtype=object,
        )
        order = np.lexsort((digests, -ts, urls))  # url asc, ts desc, digest asc
        sorted_urls = urls[order]
        first = np.concatenate([[True], sorted_urls[1:] != sorted_urls[:-1]])
        return t.take(pa.array(order[first], pa.int64()))

    return (
        pages.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pick, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Phase 1: extraction (stateless tasks)
# ---------------------------------------------------------------------------

def extract_pages(pages: rd.Dataset) -> rd.Dataset:
    """pages → EXTRACTED (url, text, out_urls); html dropped inside the batch fn."""
    return pages.map_batches(extract_batch, batch_format="pyarrow")


def extract_pages_with_provenance(pages: rd.Dataset) -> rd.Dataset:
    """pages → (url, text, out_urls, warc_ts, digest): the html payload is
    md5-digested and DROPPED inside the extraction batch fn, so the
    one-page-per-url rule can run afterwards on the html-free table
    (``dedup_extracted_by_url``) — the raw binary column never enters the
    dedup shuffle. Extraction is deterministic per (url, html), so
    extract-then-dedup picks byte-identical winners to dedup-then-extract."""
    import hashlib

    def fn(t: pa.Table) -> pa.Table:
        ex = extract_batch(t)
        digests = [hashlib.md5(b or b"").hexdigest() for b in t.column("html").to_pylist()]
        return ex.append_column("warc_ts", t.column("warc_ts")).append_column(
            "digest", pa.array(digests, pa.string())
        )

    return pages.map_batches(fn, batch_format="pyarrow")


def dedup_extracted_by_url(extracted: rd.Dataset, *, n_buckets: int = 64) -> rd.Dataset:
    """One row per url over the html-free extracted table — the identical
    pinned winner rule as ``dedup_pages_by_url`` (latest ``warc_ts``, ties →
    smallest html digest), but the bucketed exchange carries (text, out_urls,
    ts, digest) instead of raw html payloads — the cheap re-crawl variant.
    Provenance columns are dropped from the winners."""

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(t.column("url").to_pandas(), index=False).to_numpy()
        return t.append_column("bucket", pa.array((h % n_buckets).astype(np.int32)))

    def pick(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["bucket"])
        if t.num_rows == 0:
            return t.drop_columns(["warc_ts", "digest"])
        urls = np.asarray(t.column("url").to_pylist(), dtype=object)
        ts = t.column("warc_ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        digests = np.asarray(t.column("digest").to_pylist(), dtype=object)
        order = np.lexsort((digests, -ts, urls))  # url asc, ts desc, digest asc
        sorted_urls = urls[order]
        first = np.concatenate([[True], sorted_urls[1:] != sorted_urls[:-1]])
        return t.take(pa.array(order[first], pa.int64())).drop_columns(["warc_ts", "digest"])

    return (
        extracted.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pick, batch_format="pyarrow")
    )


def _normalize_batch(batch: pa.Table) -> pa.Table:
    """Normalize page url and outlink urls (vectorized list-flatten, scalar fn per url)."""
    urls = [normalize_url(u) for u in batch.column("url").to_pylist()]
    col = batch.column("out_urls").combine_chunks()
    out = []
    for chunk in (col.chunks if isinstance(col, pa.ChunkedArray) else [col]):
        flat = [normalize_url(u) for u in chunk.values.to_pylist()]
        out.append(pa.ListArray.from_arrays(chunk.offsets, pa.array(flat, pa.string())))
    cols = {c: batch.column(c) for c in batch.column_names}
    cols["url"] = pa.array(urls, pa.string())
    cols["out_urls"] = pa.chunked_array(out) if out else batch.column("out_urls")
    return pa.table(cols)


def normalize_extracted(extracted: rd.Dataset) -> rd.Dataset:
    return extracted.map_batches(_normalize_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Phase 2a: url universe → contiguous int64 ids
# ---------------------------------------------------------------------------

def _batch_unique_urls(batch: pa.Table) -> pa.Table:
    return pa.table({"url": pc.unique(batch.column("url"))})


def _batch_explode_src_dst(batch: pa.Table) -> pa.Table:
    """(url, out_urls) → flat url mentions (src urls ∪ dst urls), batch-unique."""
    col = batch.column("out_urls")
    flat = pc.list_flatten(col)
    merged = pa.concat_arrays(
        [batch.column("url").combine_chunks(), flat.combine_chunks()]
        if isinstance(flat, pa.ChunkedArray)
        else [batch.column("url").combine_chunks(), flat]
    )
    return pa.table({"url": pc.unique(merged)})


@ray.remote
def _nrows(table: pa.Table) -> int:
    return table.num_rows


@ray.remote
def _add_offset_ids(table: pa.Table, offset: int) -> pa.Table:
    if table.num_rows == 0 or "url" not in table.column_names:
        # empty blocks can carry an empty schema
        return pa.table({"id": pa.array([], pa.int64()), "url": pa.array([], pa.string())})
    ids = pa.array(offset + np.arange(table.num_rows, dtype=np.int64), pa.int64())
    return pa.table({"id": ids, "url": table.column("url")})


@ray.remote
def _add_offset_ids_named(table: pa.Table, offset: int, col: str, col_type) -> pa.Table:
    """Generic block-offset dense-id assignment: (col) → (dense, col)."""
    if table.num_rows == 0 or col not in table.column_names:
        return pa.table({"dense": pa.array([], pa.int64()), col: pa.array([], col_type)})
    ids = pa.array(offset + np.arange(table.num_rows, dtype=np.int64), pa.int64())
    return pa.table({"dense": ids, col: table.column(col)})


def distinct_values(values: rd.Dataset, col: str, *, n_buckets: int = 64) -> rd.Dataset:
    """Distinct values of ``col`` via hash-bucket groupby + per-bucket
    drop_duplicates — the low-cardinality-key shuffle idiom (see dedup_pairs
    on why not groupby(col).aggregate at high key cardinality)."""

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(t.column(col).to_pandas(), index=False).to_numpy()
        return t.append_column("bucket", pa.array((h % n_buckets).astype(np.int32)))

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df[[col]].drop_duplicates()

    return (
        values.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq, batch_format="pandas")
    )


def assign_dense_ids(values: rd.Dataset, col: str, *, n_buckets: int = 64) -> tuple[rd.Dataset, int]:
    """Distinct values of ``col`` → (dense:int64 0..n-1 in sorted order, col).

    The distributed dense-id idiom shared by url ids (assign_contiguous_ids)
    and int vertex ids (tabular._compact_ids): bucketed distinct → global sort
    → per-block counts → driver prefix-sum of ≤ n_blocks ints → vectorized
    offset add. The value universe never materializes on the driver.
    """
    sorted_vals = distinct_values(values, col, n_buckets=n_buckets).sort(col).materialize()
    refs = sorted_vals.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)])
    schema = sorted_vals.schema()
    col_type = dict(zip(schema.names, schema.types))[col]
    id_refs = [
        _add_offset_ids_named.remote(r, int(off), col, col_type)
        for r, off in zip(refs, offsets)
    ]
    return rd.from_arrow_refs(id_refs), int(offsets[-1])


def assign_contiguous_ids(extracted: rd.Dataset) -> tuple[rd.Dataset, int]:
    """Distinct ``src ∪ dst`` urls → (id:int64, url:string), ids dense 0..n-1 in
    sorted-url order. Returns (id_map dataset, n)."""
    mentions = extracted.map_batches(_batch_explode_src_dst, batch_format="pyarrow")

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(t.column("url").to_pandas(), index=False).to_numpy()
        return t.append_column("bucket", pa.array((h % 64).astype(np.int32)))

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df[["url"]].drop_duplicates()

    distinct = (
        mentions.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq, batch_format="pandas")
    )
    sorted_urls = distinct.sort("url").materialize()
    refs = sorted_urls.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)])
    id_refs = [_add_offset_ids.remote(r, int(off)) for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(id_refs), int(offsets[-1])


# ---------------------------------------------------------------------------
# Phase 2b: edge table (dedup per north_rule)
# ---------------------------------------------------------------------------

def _explode_edge_urls(batch: pa.Table) -> pa.Table:
    col = batch.column("out_urls").combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    lengths = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    src = batch.column("url").to_numpy(zero_copy_only=False)
    src_rep = np.repeat(src, lengths)
    flat = pc.list_flatten(col)
    return pa.table({"src_url": pa.array(src_rep, pa.string()), "dst_url": flat})


def _dedup_pairs_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (src_id, dst_id) dedup — the combiner before the global shuffle."""
    src = batch.column("src_id").to_numpy(zero_copy_only=False)
    dst = batch.column("dst_id").to_numpy(zero_copy_only=False)
    pairs = np.stack([src, dst], axis=1)
    uniq = np.unique(pairs, axis=0)
    return pa.table(
        {"src_id": pa.array(uniq[:, 0], pa.int64()), "dst_id": pa.array(uniq[:, 1], pa.int64())}
    )


def grouped_pair_sum(
    ds: rd.Dataset, weight_col: str = "weight", *, n_buckets: int = 64
) -> rd.Dataset:
    """Exact per-(src_id, dst_id) weight sum — the weighted sibling of
    ``dedup_pairs``: per-batch combine (np.unique pair keys + add.reduceat)
    → hash-bucket groupby → one vectorized pandas merge per bucket. The
    exchange carries one row per distinct pair per batch, never fact rows."""

    def partial(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        pairs = np.stack([src, dst], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(sums, inv, w)
        return pa.table(
            {
                "src_id": pa.array(uniq[:, 0], pa.int64()),
                "dst_id": pa.array(uniq[:, 1], pa.int64()),
                "weight": pa.array(sums),
            }
        )

    def bucketize(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        mixed = (src * np.int64(0x9E3779B1) + dst) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["src_id", "dst_id"], sort=True)["weight"].sum().reset_index()
        return out

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def grouped_pair_min(
    ds: rd.Dataset, val_col: str = "val", *, n_buckets: int = 64
) -> rd.Dataset:
    """Exact per-(src_id, dst_id) int64 MIN — the min sibling of
    ``grouped_pair_sum`` (same partial/bucket/merge shape; integer mins, no
    float accumulator). Used by first-seen/temporal-graph reductions."""

    def partial(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        pairs = np.stack([src, dst], axis=1)
        uniq, inv = np.unique(pairs, axis=0, return_inverse=True)
        mins = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, inv, v)
        return pa.table(
            {
                "src_id": pa.array(uniq[:, 0], pa.int64()),
                "dst_id": pa.array(uniq[:, 1], pa.int64()),
                val_col: pa.array(mins),
            }
        )

    def bucketize(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        mixed = (src * np.int64(0x9E3779B1) + dst) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["src_id", "dst_id"], sort=True)[val_col].min().reset_index()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def dedup_pairs(ds: rd.Dataset, *, n_buckets: int = 64) -> rd.Dataset:
    """Exact (src_id, dst_id) dedup: per-batch combine → hash-bucket groupby →
    vectorized per-bucket np.unique.

    NOT groupby(keys).aggregate(): Ray's aggregate pays per-GROUP overhead,
    measured ~15 s for 2.4M distinct pairs where this path takes ~1 s. The
    groupby key is the low-cardinality bucket; all per-key work is one
    vectorized kernel per bucket. n_buckets scales with data volume (each
    bucket must fit a worker's heap).
    """
    pre = ds.map_batches(_dedup_pairs_batch, batch_format="pyarrow")

    def bucketize(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False)
        dst = t.column("dst_id").to_numpy(zero_copy_only=False)
        mixed = (src * np.int64(0x9E3779B1) + dst) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        pairs = np.stack([df["src_id"].to_numpy(), df["dst_id"].to_numpy()], axis=1)
        u = np.unique(pairs, axis=0)
        return pd.DataFrame({"src_id": u[:, 0], "dst_id": u[:, 1]})

    return (
        pre.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(uniq, batch_format="pandas")
    )


def build_edges(
    extracted: rd.Dataset,
    id_map: rd.Dataset,
    n_vertices: int,
    *,
    num_partitions: int = 32,
) -> rd.Dataset:
    """Deduplicated (src_id, dst_id) edge table. Self-loops kept (the reference
    reader keeps them, kernel_acsr.cu:385-395); duplicates removed (north_rule)."""
    edge_urls = extracted.select_columns(["url", "out_urls"]).map_batches(
        _explode_edge_urls, batch_format="pyarrow"
    )
    with_src = joins.attach_column(
        edge_urls,
        id_map,
        probe_col="src_url",
        build_key="url",
        build_val="id",
        out_col="src_id",
        build_count=n_vertices,
        drop_probe_col=True,
        num_partitions=num_partitions,
    )
    with_both = joins.attach_column(
        with_src,
        id_map,
        probe_col="dst_url",
        build_key="url",
        build_val="id",
        out_col="dst_id",
        build_count=n_vertices,
        drop_probe_col=True,
        num_partitions=num_partitions,
    ).select_columns(["src_id", "dst_id"])
    return dedup_pairs(with_both)


# ---------------------------------------------------------------------------
# degrees, dangling, vertices table
# ---------------------------------------------------------------------------

def _partial_counts(key: str):
    def fn(batch: pa.Table) -> pa.Table:
        ids, counts = np.unique(batch.column(key).to_numpy(zero_copy_only=False), return_counts=True)
        # ids keep their native dtype (int64 vertex ids, uint64 shingle hashes)
        return pa.table({key: pa.array(ids), "_pc": pa.array(counts, pa.int64())})

    return fn


def grouped_count(ds: rd.Dataset, key: str, out_col: str, *, n_buckets: int = 64) -> rd.Dataset:
    """Two-stage count: per-batch bincount combine → hash-bucket groupby →
    vectorized per-bucket merge (SURVEY A1 idiom; see dedup_pairs on why not
    groupby(key).aggregate at high key cardinality)."""
    partial = ds.map_batches(_partial_counts(key), batch_format="pyarrow")

    def bucketize(t: pa.Table) -> pa.Table:
        # hash in uint64 (wraparound) so uint64 keys never upcast to float
        k = t.column(key).to_numpy(zero_copy_only=False).astype(np.uint64)
        mixed = (k * np.uint64(0x9E3779B1)) & np.uint64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array((mixed % np.uint64(n_buckets)).astype(np.int32)))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, sort=True)["_pc"].sum().reset_index()
        return out.rename(columns={"_pc": out_col})

    return (
        partial.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def grouped_sum(
    ds: rd.Dataset, key: str, val: str, out_col: str, *, n_buckets: int = 64
) -> rd.Dataset:
    """Bucket-partitioned sum-by-key (same rationale as grouped_count)."""

    def bucketize(t: pa.Table) -> pa.Table:
        k = t.column(key).to_numpy(zero_copy_only=False)
        if not np.issubdtype(k.dtype, np.integer):
            # a string key would make `k * int` PYTHON STRING REPETITION —
            # a silent multi-GiB hang, not an error; fail loudly instead
            raise TypeError(
                f"grouped_sum expects an integer key column, got {k.dtype!r} "
                f"for {key!r} — hash string keys into buckets explicitly"
            )
        mixed = (k * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(key, sort=True)[val].sum().reset_index()
        return out.rename(columns={val: out_col})

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def build_vertices(
    id_map: rd.Dataset, edges: rd.Dataset, n_vertices: int, *, num_partitions: int = 32
) -> rd.Dataset:
    """VERTICES table (id, url, out_deg, dangling). Reporting artifact — the hot
    path derives out-degree/dangling from CSR indptr inside shards instead
    (cf. bookmark build, kernel_acsr.cu:403-406)."""
    # materialized: attach_with_default counts the build side for strategy
    # selection; a lazy chain would be executed twice
    out_deg = grouped_count(edges, "src_id", "out_deg").materialize()
    return _left_attach_out_deg(id_map, out_deg)


def _left_attach_out_deg(id_map: rd.Dataset, out_deg: rd.Dataset) -> rd.Dataset:
    """Left join id_map ⋈ out_deg (missing → 0/dangling) via broadcast lookup."""
    with_deg = joins.attach_with_default(
        id_map,
        out_deg,
        probe_col="id",
        build_key="src_id",
        build_val="out_deg",
        out_col="out_deg",
        default=0,
    )

    def finish(batch: pa.Table) -> pa.Table:
        deg = batch.column("out_deg").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id": batch.column("id"),
                "url": batch.column("url"),
                "out_deg": batch.column("out_deg"),
                "dangling": pa.array(deg == 0),
            }
        )

    return with_deg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# partition boundaries (equal-edge cuts over the id space)
# ---------------------------------------------------------------------------

def equal_edge_cuts(
    edges: rd.Dataset,
    n_vertices: int,
    n_parts: int,
    *,
    seed: int = 0,
    sample_cap: int = 262_144,
    n_edges: int | None = None,
) -> np.ndarray:
    """P-1 ascending cut points over [0, n): part(v) = searchsorted(cuts, v, 'right').

    Equal-EDGE (not equal-vertex) boundaries — the analogue of the reference's
    workload-balanced batching (``deal_with_g1_batch``, /root/reference/for_test.h:87-108)
    — computed from a seeded sample of edge src ids (driver sees ≤ sample_cap ids).
    """
    if n_parts <= 1:
        return np.array([], dtype=np.int64)
    m = n_edges if n_edges is not None else edges.count()
    frac = min(1.0, sample_cap / max(m, 1))
    sample = edges if frac >= 1.0 else edges.random_sample(frac, seed=seed)
    chunks = [
        b.column("src_id").to_numpy(zero_copy_only=False)
        for b in sample.select_columns(["src_id"]).iter_batches(batch_format="pyarrow")
    ]
    src = np.concatenate(chunks) if chunks else np.array([], dtype=np.int64)
    uniform = np.linspace(0, n_vertices, n_parts + 1)[1:-1].astype(np.int64)
    if len(src) < n_parts * 4:
        cuts = uniform
    else:
        qs = np.quantile(src, np.linspace(0, 1, n_parts + 1)[1:-1], method="nearest")
        cuts = qs.astype(np.int64) + 1  # cut AFTER the quantile vertex
        # enforce strictly increasing within (0, n); fall back to uniform where collapsed
        cuts = np.maximum.accumulate(cuts)
        collapsed = np.concatenate([[False], np.diff(cuts) == 0])
        cuts[collapsed] = 0
        cuts = np.where(cuts == 0, uniform, cuts)
        cuts = np.clip(np.maximum.accumulate(cuts), 1, max(n_vertices - 1, 1))
        cuts = np.unique(cuts)
        if len(cuts) < n_parts - 1:  # pad with uniform points not already present
            extra = np.setdiff1d(uniform, cuts)
            cuts = np.sort(np.concatenate([cuts, extra]))[: n_parts - 1]
    return cuts.astype(np.int64)
