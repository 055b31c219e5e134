"""Driver-contract pipelines over the TPC-H-ish testdata tables.

Each function takes ``sf_dir`` and returns a Dataset / DataFrame whose column
names match the paired oracle SQL in ``__ray_entry__.py`` exactly. The graph
operators run over an edge table derived from ``lineitem``
(src=l_orderkey → dst=l_partkey), exercising the same operator inventory as
the web-graph flagship (SURVEY.md §2) in a SQL-checkable setting.

Float-valued aggregates are rounded on BOTH sides (engine and SQL) because the
driver compares value hashes: distributed summation differs from sequential
DuckDB summation in the last bits.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Count, Sum

from pagerank_ray.functions import text as textfn
from pagerank_ray.stages.graph_build import dedup_pairs, grouped_count


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# graph build operators on the lineitem-derived edge table
# ---------------------------------------------------------------------------

def lineitem_edges(sf_dir: str) -> rd.Dataset:
    """Deduplicated edge table src=l_orderkey → dst=l_partkey (north_rule §2.7)."""
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"src_id": t.column("l_orderkey"), "dst_id": t.column("l_partkey")})

    return dedup_pairs(ds.map_batches(rename, batch_format="pyarrow"))


def q_edges_dedup(sf_dir: str) -> rd.Dataset:
    return lineitem_edges(sf_dir)


def q_out_degree(sf_dir: str) -> rd.Dataset:
    return grouped_count(lineitem_edges(sf_dir), "src_id", "out_deg")


def q_in_degree_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    in_deg = grouped_count(lineitem_edges(sf_dir), "dst_id", "in_deg")
    top = in_deg.sort(["in_deg", "dst_id"], descending=[True, False]).limit(k)
    return top.to_pandas()


def q_dangling(sf_dir: str) -> rd.Dataset:
    """Vertices of the edge graph with no out-edges (the bookmark set,
    /root/reference/kernel_acsr.cu:403-406, as an anti-join)."""
    edges = lineitem_edges(sf_dir).materialize()

    def vertices(t: pa.Table) -> pa.Table:
        merged = pa.concat_arrays(
            [
                t.column("src_id").combine_chunks().cast(pa.int64()),
                t.column("dst_id").combine_chunks().cast(pa.int64()),
            ]
        )
        return pa.table({"id": pc.unique(merged)})

    verts = (
        edges.map_batches(vertices, batch_format="pyarrow")
        .groupby("id")
        .aggregate(Count(alias_name="_c"))
        .select_columns(["id"])
    )
    # broadcast semi-join: filter ids that appear as src
    import ray

    from pagerank_ray.stages import joins

    srcs = joins._collect_arrow(
        edges.map_batches(
            lambda t: pa.table({"src_id": pc.unique(t.column("src_id"))}),
            batch_format="pyarrow",
        )
        .groupby("src_id")
        .aggregate(Count(alias_name="_c"))
        .select_columns(["src_id"])
    )
    ref = ray.put(srcs)

    def keep_dangling(t: pa.Table) -> pa.Table:
        src_ids = joins.broadcast_get(
            ref, lambda table: np.sort(table.column("src_id").to_numpy()), "srcset"
        )
        ids = t.column("id").to_numpy()
        pos = np.clip(np.searchsorted(src_ids, ids), 0, max(len(src_ids) - 1, 0))
        is_src = (len(src_ids) > 0) & (src_ids[pos] == ids)
        return t.filter(pa.array(~is_src))

    return verts.map_batches(keep_dangling, batch_format="pyarrow")


def q_degree_histogram(sf_dir: str) -> pd.DataFrame:
    """log2 in-degree bins — the reference's binary_resort histogram
    (kernel_acsr.cu:419-451): bin = floor(log2(deg)) + 1."""
    in_deg = grouped_count(lineitem_edges(sf_dir), "dst_id", "in_deg")

    def binize(t: pa.Table) -> pa.Table:
        deg = t.column("in_deg").to_numpy(zero_copy_only=False).astype(np.float64)
        bins = (np.floor(np.log2(deg)) + 1).astype(np.int64)
        return pa.table({"bin": pa.array(bins)})

    out = (
        in_deg.map_batches(binize, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Count(alias_name="n_vertices"))
    )
    return out.to_pandas().sort_values("bin").reset_index(drop=True)


# ---------------------------------------------------------------------------
# iterative graph algorithms on the same edge table (rows-only checks)
# ---------------------------------------------------------------------------

def _graph_workdir(sf_dir: str, tag: str) -> str:
    base = os.path.join(tempfile.gettempdir(), "pagerank_ray_work")
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, f"{os.path.basename(os.path.normpath(sf_dir))}_{tag}")


def _compact_ids(edges: rd.Dataset) -> tuple[rd.Dataset, int, pa.Table]:
    """Map arbitrary int vertex ids to dense 0..n-1 (sorted order)."""
    import ray

    from pagerank_ray.stages import joins

    tab = joins._collect_arrow(edges)
    src = tab.column("src_id").to_numpy()
    dst = tab.column("dst_id").to_numpy()
    ids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    dense = pa.table(
        {"src_id": pa.array(s, pa.int64()), "dst_id": pa.array(d, pa.int64())}
    )
    id_map = pa.table(
        {"dense": pa.array(np.arange(len(ids)), pa.int64()), "orig": pa.array(ids, pa.int64())}
    )
    return rd.from_arrow(dense), len(ids), id_map


def q_pagerank(sf_dir: str, n_workers: int = 4) -> pd.DataFrame:
    """PageRank over the lineitem graph; returns (id, rank) on the original ids,
    rank rounded for stability. Rows-only driver check; real correctness is the
    pytest oracle suite."""
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
    from pagerank_ray.pipelines.pagerank import pagerank

    dense_edges, n, id_map = _compact_ids(lineitem_edges(sf_dir))
    work = _graph_workdir(sf_dir, "pr")
    csr = os.path.join(work, "csr")
    prepare_csr_from_edges(dense_edges, n, csr, n_parts=4 * n_workers)
    res = pagerank(csr, n_workers=n_workers, max_iters=100)
    df = res.result.to_pandas().sort_values("id").reset_index(drop=True)
    df["id"] = id_map.column("orig").to_numpy()
    df["rank"] = df["rank"].round(8)
    return df


def q_connected_components(sf_dir: str, n_workers: int = 4) -> pd.DataFrame:
    from pagerank_ray.pipelines.cc import connected_components
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges

    dense_edges, n, id_map = _compact_ids(lineitem_edges(sf_dir))
    work = _graph_workdir(sf_dir, "cc")
    csr = os.path.join(work, "csr_sym")
    prepare_csr_from_edges(dense_edges, n, csr, n_parts=4 * n_workers, symmetrize=True)
    res = connected_components(csr, n_workers=n_workers)
    df = res.result.to_pandas().sort_values("id").reset_index(drop=True)
    orig = id_map.column("orig").to_numpy()
    df["id"] = orig
    df["label"] = orig[df["label"].to_numpy()]  # component label on original ids
    return df


# ---------------------------------------------------------------------------
# relational demos (groupby/filter/join/sort/limit/window)
# ---------------------------------------------------------------------------

def q_lineitem_agg(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped aggregate (sums rounded for hash-stable compare)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def revenue(t: pa.Table) -> pa.Table:
        rev = pc.multiply(t.column("l_extendedprice"), pc.subtract(1.0, t.column("l_discount")))
        return t.append_column("revenue", rev)

    out = (
        ds.map_batches(revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("revenue", alias_name="sum_revenue"),
            Count(alias_name="n_rows"),
        )
        .to_pandas()
    )
    out["sum_qty"] = out["sum_qty"].round(2)
    out["sum_revenue"] = out["sum_revenue"].round(2)
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q_top_customers(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """orders ⋈ customer, revenue per customer, top-k (join + sort + limit)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    per_cust = orders.groupby("o_custkey").aggregate(
        Sum("o_totalprice", alias_name="total_price"), Count(alias_name="n_orders")
    )
    from pagerank_ray.stages import joins

    named = joins.attach_column(
        per_cust,
        customer,
        probe_col="o_custkey",
        build_key="c_custkey",
        build_val="c_name",
        out_col="c_name",
    )
    top = named.sort(["total_price", "o_custkey"], descending=[True, False]).limit(k)
    df = top.to_pandas()
    df["total_price"] = df["total_price"].round(2)
    return df[["o_custkey", "c_name", "total_price", "n_orders"]]


def q_events_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour window per event_type (streaming-shaped workload over
    the ordered log; SURVEY.md §2.9 note — windows as grouped aggregation)."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def bucket(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = ts // 3_600_000_000  # µs → hour bucket
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "hour_bucket": pa.array(hour, pa.int64()),
                "value": t.column("value"),
            }
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour_bucket"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values(["event_type", "hour_bucket"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# documents: text analysis + exact dedup
# ---------------------------------------------------------------------------

def q_token_counts(sf_dir: str) -> rd.Dataset:
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pandas()
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_tokens": pa.array(textfn.whitespace_token_count(texts), pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow")


def q_lang_distribution(sf_dir: str) -> pd.DataFrame:
    out = (
        _read(sf_dir, "documents", ["lang"])
        .groupby("lang")
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values("lang").reset_index(drop=True)


def q_exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """Exact text dedup: md5 partition → keep smallest doc_id (SURVEY §2.7 idiom)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def hash_batch(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "h": pa.array(textfn.md5_hex(t.column("text").to_pandas()), pa.string()),
            }
        )

    from ray.data.aggregate import Min

    out = (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_copies"))
        .to_pandas()
    )
    return out.sort_values("h").reset_index(drop=True)


# ---------------------------------------------------------------------------
# training-data ops: near-dup dedup, similarity search, quality, multimodal
# ---------------------------------------------------------------------------

def q_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH near-dup clusters over documents (rows-only check; the
    planted-duplicate pytest oracle is the correctness gate)."""
    from pagerank_ray.stages.dedup import minhash_lsh_dedup

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return minhash_lsh_dedup(docs, threshold=0.8, concurrency=4)


def q_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    from pagerank_ray.stages.dedup import simhash_near_dups

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_near_dups(docs, max_hamming=3, concurrency=4)


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    """Language-id + quality scoring + fingerprint over documents."""
    from pagerank_ray.functions.text import fingerprint64, lang_id_batch, quality_score_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = quality_score_batch(lang_id_batch(df))
        df["fingerprint"] = fingerprint64(df["text"])
        out = df[["doc_id", "pred_lang", "quality", "punct_ratio", "stop_ratio", "fingerprint"]].copy()
        out["quality"] = out["quality"].round(6)
        out["punct_ratio"] = out["punct_ratio"].round(6)
        out["stop_ratio"] = out["stop_ratio"].round(6)
        return out

    return (
        docs.map_batches(score, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _load_queries(sf_dir: str, n_queries: int = 5):
    import pyarrow.parquet as pq

    tab = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
    mask = np.asarray(tab.column("vec_id").to_numpy() < n_queries)
    ids = tab.column("vec_id").to_numpy()[mask]
    vecs = np.stack(
        [np.asarray(v, dtype=np.float64) for v, m in zip(tab.column("embedding").to_pylist(), mask) if m]
    )
    return ids, vecs


def q_knn_bruteforce(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-10 for the first 5 vectors (DuckDB list_cosine_similarity
    oracle). Deterministic tie-break (cosine desc, vec_id asc)."""
    from pagerank_ray.stages.knn import knn_bruteforce

    qids, qvecs = _load_queries(sf_dir)
    vectors = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_bruteforce(vectors, qvecs, qids, k=10)
    out["cosine"] = out["cosine"].round(6)
    return out[["query_id", "vec_id", "cosine", "rank"]]


def q_knn_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed approximate top-10 (rows-only; recall vs brute force is
    asserted in tests/test_knn_multimodal.py)."""
    from pagerank_ray.stages.knn import build_ivf, knn_ivf, train_centroids

    qids, qvecs = _load_queries(sf_dir)
    vectors = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = train_centroids(vectors, 16)
    ivf = build_ivf(vectors, cents).materialize()
    return knn_ivf(ivf, cents, qvecs, qids, k=10, nprobe=4)


def q_embedding_near_dups(sf_dir: str) -> pd.DataFrame:
    from pagerank_ray.stages.dedup import embedding_near_dups

    vectors = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return embedding_near_dups(vectors, threshold=0.95, n_planes=10, concurrency=4)


def q_multimodal_features(sf_dir: str) -> pd.DataFrame:
    """Image-feature plumbing over a deterministic synthetic media table
    (codecs are stubbed in this container; see stages/multimodal.py)."""
    import ray.data as rd2

    from pagerank_ray.stages.multimodal import image_features, synth_media

    media = rd2.from_arrow(synth_media(200))
    out = image_features(media, embed_dim=32, concurrency=4).to_pandas()
    out["embedding"] = out["embedding"].map(lambda v: [round(float(x), 6) for x in v])
    return out.sort_values("media_id").reset_index(drop=True)
