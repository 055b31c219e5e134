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
from ray.data.aggregate import Count, Max, Min, Sum

from pagerank_ray.functions import text as textfn
from pagerank_ray.stages.graph_build import dedup_pairs, grouped_count


def _read(sf_dir: str, table: str, columns=None, filter=None) -> rd.Dataset:
    """Pruned scan: ``columns`` projects at the reader; ``filter`` (a
    pyarrow.dataset expression) pushes row filtering into the parquet
    scanner itself — row groups whose statistics exclude the predicate are
    never read, and non-matching rows never enter the object store."""
    kwargs = {}
    if filter is not None:
        kwargs["filter"] = filter
    return rd.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns, **kwargs
    )


def _round_half_away(values, ndigits: int) -> np.ndarray:
    """DuckDB-ROUND tie rule; canonical impl in functions.text."""
    from pagerank_ray.functions.text import round_half_away

    return round_half_away(values, ndigits)


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
    /root/reference/kernel_acsr.cu:403-406, as an anti-join). Distincts use
    the bucketed idiom (graph_build.distinct_values) — never a per-key
    Dataset aggregate at vertex cardinality."""
    from pagerank_ray.stages.graph_build import distinct_values

    edges = lineitem_edges(sf_dir).materialize()

    def vertices(t: pa.Table) -> pa.Table:
        merged = pa.concat_arrays(
            [
                t.column("src_id").combine_chunks().cast(pa.int64()),
                t.column("dst_id").combine_chunks().cast(pa.int64()),
            ]
        )
        return pa.table({"id": pc.unique(merged)})

    verts = distinct_values(edges.map_batches(vertices, batch_format="pyarrow"), "id")
    # broadcast semi-join: filter ids that appear as src
    import ray

    from pagerank_ray.stages import joins

    srcs = joins._collect_arrow(
        distinct_values(
            edges.map_batches(
                lambda t: pa.table({"src_id": pc.unique(t.column("src_id"))}),
                batch_format="pyarrow",
            ),
            "src_id",
        )
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


_VARINT_BOUNDS = np.array([1 << (7 * k) for k in range(1, 9)], dtype=np.int64)


def q_graph_compress(sf_dir: str, n_buckets: int = 64) -> pd.DataFrame:
    """WebGraph-style successor-list compression audit (Boldi & Vigna
    2004 "The WebGraph Framework I" — gap encoding of sorted adjacency
    lists + instantaneous codes; LEB128 varint stands in for their ζ
    codes so byte counts are exact integers): each source's successors
    are sorted ascending and coded as first = dst_0 + 1 then gaps
    dst_i − dst_{i−1} (≥1 after dedup), each value costing one byte per
    started 7-bit group. Reports, per out-degree bin b = floor(log2 deg)
    (exact via ``np.frexp``, mirroring LENGTH(BIN(deg))−1 in the
    oracle): n_src, n_edges, total_bytes and
    bits_per_edge = ROUND(8·total_bytes / n_edges, 6).

    Shape: edges are hash-bucketed by src (every src lands wholly in one
    bucket) → per-bucket vectorized lexsort + reduceat fold to per-src
    (deg, bytes) → per-bucket partial per-bin rows; the driver folds
    ≤ n_buckets·64 partial rows. Nothing edge- or vertex-sized leaves
    the bucketed stage, so the plan is one shuffle of the edge table."""
    edges = lineitem_edges(sf_dir)

    def bucketize(t: pa.Table) -> pa.Table:
        src = t.column("src_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mixed = (src * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column(
            "bucket", pa.array((mixed % n_buckets).astype(np.int32))
        )

    def fold_bucket(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src_id"].to_numpy(np.int64)
        dst = df["dst_id"].to_numpy(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        first = np.concatenate(([True], src[1:] != src[:-1]))
        val = dst - np.concatenate(([0], dst[:-1]))
        val[first] = dst[first] + 1
        if (val <= 0).any():
            raise ValueError("non-positive gap: edge table is not deduplicated")
        nbytes = np.digitize(val, _VARINT_BOUNDS) + 1
        starts = np.flatnonzero(first)
        deg = np.diff(np.concatenate((starts, [len(src)])))
        per_src_bytes = np.add.reduceat(nbytes, starts)
        _, ex = np.frexp(deg)
        dbin = (ex - 1).astype(np.int64)
        agg = (
            pd.DataFrame(
                {"degree_bin": dbin, "n_src": 1, "deg": deg, "b": per_src_bytes}
            )
            .groupby("degree_bin", sort=False)
            .sum()
            .reset_index()
        )
        return pd.DataFrame(
            {
                "degree_bin": agg["degree_bin"].to_numpy(np.int64),
                "n_src": agg["n_src"].to_numpy(np.int64),
                "n_edges": agg["deg"].to_numpy(np.int64),
                "total_bytes": agg["b"].to_numpy(np.int64),
            }
        )

    parts = (
        edges.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold_bucket, batch_format="pandas")
        .to_pandas()
    )
    res = parts.groupby("degree_bin", sort=True).sum().reset_index()
    res["bits_per_edge"] = _round_half_away(
        8.0 * res["total_bytes"].to_numpy(np.float64)
        / res["n_edges"].to_numpy(np.float64),
        6,
    )
    return res[
        ["degree_bin", "n_src", "n_edges", "total_bytes", "bits_per_edge"]
    ].reset_index(drop=True)


# ---------------------------------------------------------------------------
# iterative graph algorithms on the same edge table (rows-only checks)
# ---------------------------------------------------------------------------

def _graph_workdir(sf_dir: str, tag: str, src_file: str = "lineitem.parquet") -> str:
    """Per-input scratch dir for cached artifacts. Keyed by a content
    fingerprint of the source file (abspath + mtime + size), so regenerated
    testdata with the same directory name never reuses a stale cache
    (ADVICE r1). ``src_file`` names the table the cache derives from
    (lineitem for graph artifacts, events for the source exports)."""
    import hashlib

    base = os.path.join(tempfile.gettempdir(), "pagerank_ray_work")
    os.makedirs(base, exist_ok=True)
    li = os.path.join(sf_dir, src_file)
    st = os.stat(li)
    fp = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:10]
    return os.path.join(
        base, f"{os.path.basename(os.path.normpath(sf_dir))}_{fp}_{tag}"
    )


def _compact_ids(edges: rd.Dataset) -> tuple[rd.Dataset, int, rd.Dataset]:
    """Map arbitrary int vertex ids to dense 0..n-1 (sorted order), fully
    distributed: bucketed distinct → sort → block offsets (the
    graph_build.assign_dense_ids idiom), then two broadcast/hash joins to
    rewrite the edge endpoints. The edge table never reaches the driver."""
    from pagerank_ray.stages.graph_build import assign_dense_ids

    def mentions(t: pa.Table) -> pa.Table:
        merged = pa.concat_arrays(
            [
                t.column("src_id").combine_chunks().cast(pa.int64()),
                t.column("dst_id").combine_chunks().cast(pa.int64()),
            ]
        )
        return pa.table({"orig": pc.unique(merged)})

    id_map, n = assign_dense_ids(
        edges.map_batches(mentions, batch_format="pyarrow"), "orig"
    )
    return _rewrite_endpoints(edges, id_map, n), n, id_map


def _rewrite_endpoints(edges: rd.Dataset, id_map: rd.Dataset, n: int) -> rd.Dataset:
    """Rewrite (src_id, dst_id[, weight]) onto the dense id space of
    ``id_map`` via two broadcast/hash joins."""
    from pagerank_ray.stages import joins

    dense = joins.attach_column(
        edges,
        id_map,
        probe_col="src_id",
        build_key="orig",
        build_val="dense",
        out_col="src_dense",
        build_count=n,
        drop_probe_col=True,
    )
    dense = joins.attach_column(
        dense,
        id_map,
        probe_col="dst_id",
        build_key="orig",
        build_val="dense",
        out_col="dst_dense",
        build_count=n,
        drop_probe_col=True,
    ).map_batches(
        lambda t: pa.table(
            {
                "src_id": t.column("src_dense"),
                "dst_id": t.column("dst_dense"),
                **(
                    {"weight": t.column("weight")}
                    if "weight" in t.schema.names
                    else {}
                ),
            }
        ),
        batch_format="pyarrow",
    )
    return dense


def _compact_ids_cached(
    sf_dir: str, tag: str, edges_factory, base_tag: str | None = None
) -> tuple[rd.Dataset, int, rd.Dataset]:
    """Disk-cached ``_compact_ids``: the dense edge table and id map are
    parqueted once per (input fingerprint, tag) under the shared workdir, so
    every graph query in a bench/driver session pays the distinct + sort +
    endpoint-rewrite chain once instead of per query (the r4 cold-CSR trio —
    VERDICT item 3). Clean-before-write with the meta marker last, so a torn
    attempt is rebuilt, never half-read.

    ``base_tag``: a tag whose cached id map covers the SAME vertex universe
    (e.g. the weighted lineitem graph reuses the unweighted map — identical
    (orderkey, partkey) pairs, and dense ids are sorted-by-orig so the map is
    content-deterministic either way); when present on disk, the distinct +
    sort is skipped and only the endpoint rewrite runs.

    Concurrency-safe (r5 review finding): the whole entry is built in a
    pid-unique temp directory and published with ONE atomic os.rename —
    two processes racing on the same entry each build their own copy and the
    loser reads the winner's; no interleaved write_parquet appends can ever
    sit behind a valid marker."""
    import json
    import shutil

    work = _graph_workdir(sf_dir, f"ids_{tag}")
    meta_p = os.path.join(work, "meta.json")

    def _read_cached() -> tuple[rd.Dataset, int, rd.Dataset]:
        with open(meta_p) as f:
            n_cached = json.load(f)["n"]
        return (
            rd.read_parquet(os.path.join(work, "edges")),
            n_cached,
            rd.read_parquet(os.path.join(work, "id_map")),
        )

    if os.path.exists(meta_p):
        return _read_cached()
    base_meta = (
        os.path.join(_graph_workdir(sf_dir, f"ids_{base_tag}"), "meta.json")
        if base_tag
        else None
    )
    if base_meta and os.path.exists(base_meta):
        with open(base_meta) as f:
            n = json.load(f)["n"]
        base_work = os.path.dirname(base_meta)
        id_map = rd.read_parquet(os.path.join(base_work, "id_map"))
        dense = _rewrite_endpoints(edges_factory(), id_map, n)
    else:
        dense, n, id_map = _compact_ids(edges_factory())
    build = f"{work}.build.{os.getpid()}"
    shutil.rmtree(build, ignore_errors=True)
    os.makedirs(build)
    dense.write_parquet(os.path.join(build, "edges"))
    id_map.write_parquet(os.path.join(build, "id_map"))
    with open(os.path.join(build, "meta.json"), "w") as f:
        json.dump({"n": int(n)}, f)
    try:
        os.rename(build, work)  # atomic publish
    except OSError:
        # `work` already exists: either a racer published a valid entry
        # (read it) or a torn/stale dir without meta.json sits there (e.g.
        # the pre-atomic layout) — discard it and retry the publish rather
        # than failing forever on every later call (r5 review finding)
        if os.path.exists(meta_p):
            shutil.rmtree(build, ignore_errors=True)
        else:
            shutil.rmtree(work, ignore_errors=True)
            os.rename(build, work)
    return _read_cached()


def _attach_orig(result: rd.Dataset, id_map: rd.Dataset, n: int, cols: list[str]) -> pd.DataFrame:
    """Rewrite dense-id columns of a per-vertex result back to original ids
    (broadcast/hash join per column), then collect the small result."""
    from pagerank_ray.stages import joins

    out = result
    for c in cols:
        out = joins.attach_column(
            out,
            id_map,
            probe_col=c,
            build_key="dense",
            build_val="orig",
            out_col=f"{c}_orig",
            build_count=n,
            drop_probe_col=True,
        )
    df = out.to_pandas()
    return df.rename(columns={f"{c}_orig": c for c in cols})


def _lineitem_csr(
    sf_dir: str, *, n_workers: int, symmetrize: bool, return_edges: bool = False
):
    """Shared CSR build for the lineitem graph (cached per content fingerprint).
    ``return_edges=True`` additionally returns the dense-id edge Dataset (for
    callers that derive a second CSR, e.g. q_hits's reversed graph)."""
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    work = _graph_workdir(sf_dir, "sym" if symmetrize else "fwd")
    csr = os.path.join(work, "csr")
    prepare_csr_from_edges(
        dense_edges, n, csr, n_parts=4 * n_workers, symmetrize=symmetrize
    )
    if return_edges:
        return csr, n, id_map, dense_edges
    return csr, n, id_map


def q_pagerank(sf_dir: str, n_workers: int = 4) -> pd.DataFrame:
    """Converged PageRank over the lineitem graph; returns (id, rank) on the
    original ids. Hash-checked against an unrolled iterative DuckDB oracle
    whose iteration count is recomputed independently by the pure-NumPy oracle
    on the same input (__ray_entry__._converged_pagerank_iters) — the L1 stop
    decays geometrically, so engine and oracle agree on the count."""
    from pagerank_ray.pipelines.pagerank import pagerank

    csr, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=False)
    res = pagerank(csr, n_workers=n_workers, max_iters=100)
    df = _attach_orig(res.result, id_map, n, ["id"])
    df = df.sort_values("id").reset_index(drop=True)
    df["rank"] = _round_half_away(df["rank"], 6)
    return df[["id", "rank"]]


def q_pagerank_fixed(sf_dir: str, n_workers: int = 4, iters: int = 20) -> pd.DataFrame:
    """Fixed-20-iteration PageRank (damping 0.85, dangling redistribution,
    mass-n scale r⁰=1) — hash-checked against an unrolled iterative DuckDB
    oracle (__ray_entry__._pagerank_sql) computing the same recurrence
    (SURVEY.md §3.1 / kernel_bblock.cu:949-1085 semantics)."""
    from pagerank_ray.pipelines.pagerank import pagerank

    csr, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=False)
    # eps 0 ⇒ the convergence test never fires: exactly `iters` supersteps
    res = pagerank(csr, n_workers=n_workers, max_iters=iters, eps_per_vertex=0.0)
    df = _attach_orig(res.result, id_map, n, ["id"])
    df = df.sort_values("id").reset_index(drop=True)
    df["rank"] = _round_half_away(df["rank"], 6)
    return df[["id", "rank"]]


def q_pagerank_incremental(
    sf_dir: str,
    n_workers: int = 4,
    base_iters: int = 20,
    warm_iters: int = 10,
    cutoff: str = "1997-01-01",
) -> pd.DataFrame:
    """Incremental PageRank — the daily-crawl-delta update a production link
    graph runs instead of a cold start: 20 supersteps on the pre-cutoff edge
    set (edges shipped before ``cutoff``), then 10 warm supersteps on the
    FULL edge set starting from the rounded base vector (see
    pipelines/pagerank.py:pagerank_incremental for the contraction
    argument). Both phases share one dense vertex universe (the full
    graph's); delta-only vertices are isolated/dangling in the base phase.
    Hash-checked against the two-phase unrolled DuckDB oracle
    (__ray_entry__._pagerank_incremental_sql) whose inter-phase ROUND(r, 6)
    CTE mirrors the engine's in-place worker-side rounding exactly."""
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
    from pagerank_ray.pipelines.pagerank import pagerank_incremental
    from pagerank_ray.stages import joins

    csr_full, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=False)

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_shipdate"])
    cut = np.datetime64(cutoff, "us")

    def pre_cutoff(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        f = t.filter(pc.less(t.column("l_shipdate"), pa.scalar(cut)))
        return pa.table(
            {"src_id": f.column("l_orderkey"), "dst_id": f.column("l_partkey")}
        )

    base_pairs = dedup_pairs(li.map_batches(pre_cutoff, batch_format="pyarrow"))
    base_dense = joins.attach_column(
        base_pairs, id_map, probe_col="src_id", build_key="orig",
        build_val="dense", out_col="s2", build_count=n, drop_probe_col=True,
    )
    base_dense = joins.attach_column(
        base_dense, id_map, probe_col="dst_id", build_key="orig",
        build_val="dense", out_col="d2", build_count=n, drop_probe_col=True,
    )
    base_dense = base_dense.map_batches(
        lambda t: pa.table({"src_id": t.column("s2"), "dst_id": t.column("d2")}),
        batch_format="pyarrow",
    )

    tag = "fwd_inc" + cutoff.replace("-", "")
    base_csr = os.path.join(_graph_workdir(sf_dir, tag), "csr")
    prepare_csr_from_edges(base_dense, n, base_csr, n_parts=4 * n_workers)
    res = pagerank_incremental(
        base_csr, csr_full, n_workers=n_workers,
        base_iters=base_iters, warm_iters=warm_iters,
    )
    df = _attach_orig(res.result, id_map, n, ["id"])
    df = df.sort_values("id").reset_index(drop=True)
    df["rank"] = _round_half_away(df["rank"], 6)
    return df[["id", "rank"]]


def q_pagerank_personalized(
    sf_dir: str, n_workers: int = 4, iters: int = 20, mod: int = 97
) -> pd.DataFrame:
    """Personalized PageRank (M7, lightSpMV/PageRank.h:313-318): teleport
    mass restricted to the seed set {v : orig_id % mod == 0}, uniform over
    seeds. Engine recurrence (superstep.py:415-432):
    r⁰ = n·p; r'(v) = (α·D/n + 1−α)·n·p(v) + α·Σ_{u→v} r(u)/out_deg(u).
    Fixed ``iters`` supersteps; hash-checked against the unrolled DuckDB
    oracle (__ray_entry__._pagerank_pers_sql) computing the identical
    recurrence with the seed rule expressed on original ids. The length-n
    personalization vector is built from the (already driver-collected,
    n-row) id_map — the same bounded materialization _attach_orig performs."""
    from pagerank_ray.pipelines.pagerank import pagerank

    csr, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=False)
    im = id_map.to_pandas().sort_values("dense")
    orig = im["orig"].to_numpy(np.int64)
    seeds = (orig % mod) == 0
    p = np.zeros(n, dtype=np.float64)
    p[seeds] = 1.0 / seeds.sum()
    res = pagerank(
        csr,
        n_workers=n_workers,
        max_iters=iters,
        eps_per_vertex=0.0,
        personalization=p,
    )
    df = _attach_orig(res.result, id_map, n, ["id"])
    df = df.sort_values("id").reset_index(drop=True)
    df["rank"] = _round_half_away(df["rank"], 6)
    return df[["id", "rank"]]


def _weighted_lineitem_edges(sf_dir: str) -> rd.Dataset:
    """Weighted edge table src=l_orderkey → dst=l_partkey with
    weight = Σ l_quantity per distinct pair (shared by q_pagerank_weighted
    and q_sssp_weighted — one definition of the weight rule)."""
    from pagerank_ray.stages.graph_build import grouped_pair_sum

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_id": t.column("l_orderkey"),
                "dst_id": t.column("l_partkey"),
                "weight": t.column("l_quantity").cast(pa.float64()),
            }
        )

    return grouped_pair_sum(li.map_batches(rename, batch_format="pyarrow"))


def q_pagerank_weighted(sf_dir: str, n_workers: int = 4, iters: int = 20) -> pd.DataFrame:
    """WEIGHTED PageRank — the general-SpMV capability of the reference's
    library backends (cusparse/lightSpMV csrmv with arbitrary ``weights_h``)
    rather than the derived 1/out_deg: edge weight = Σ l_quantity over the
    (order, part) lineitems, row-normalized per source at CSR build
    (csr.build_shard_table), gathered via the stored-weight path of the same
    superstep kernel. Fixed ``iters`` supersteps; hash-checked against the
    unrolled DuckDB oracle (__ray_entry__._pagerank_weighted_sql). Quantities
    are integer-valued doubles, so the per-source totals — and therefore the
    normalized weights — are bit-identical across engines and summation
    orders."""
    return _weighted_pagerank_over(
        sf_dir,
        "wli",
        "wfwd",
        lambda: _weighted_lineitem_edges(sf_dir),
        n_workers=n_workers,
        iters=iters,
        base_tag="li",
    )


def _weighted_pagerank_over(
    sf_dir: str,
    ids_tag: str,
    csr_tag: str,
    edges_factory,
    *,
    n_workers: int,
    iters: int,
    id_col: str = "id",
    base_tag: str | None = None,
) -> pd.DataFrame:
    """Shared fixed-iteration weighted-PageRank driver tail (cached dense ids
    → cached CSR → pagerank → orig-id attach → 6-decimal round) for every
    query that runs the recurrence over a derived weighted edge table
    (q_pagerank_weighted, q_host_pagerank)."""
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
    from pagerank_ray.pipelines.pagerank import pagerank

    dense, n, id_map = _compact_ids_cached(sf_dir, ids_tag, edges_factory, base_tag=base_tag)
    csr = os.path.join(_graph_workdir(sf_dir, csr_tag), "csr")
    prepare_csr_from_edges(dense, n, csr, n_parts=4 * n_workers)
    res = pagerank(csr, n_workers=n_workers, max_iters=iters, eps_per_vertex=0.0)
    df = _attach_orig(res.result, id_map, n, ["id"])
    df = df.rename(columns={"id": id_col}).sort_values(id_col).reset_index(drop=True)
    df["rank"] = _round_half_away(df["rank"], 6)
    return df[[id_col, "rank"]]


def q_connected_components(sf_dir: str, n_workers: int = 4) -> pd.DataFrame:
    """Hash-min connected components; label = min original vertex id of the
    component — hash-checked against an unrolled min-label DuckDB oracle."""
    from pagerank_ray.pipelines.cc import connected_components

    csr, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=True)
    res = connected_components(csr, n_workers=n_workers)
    df = _attach_orig(res.result, id_map, n, ["id", "label"])
    return df[["id", "label"]].sort_values("id").reset_index(drop=True)


def q_label_propagation(sf_dir: str, n_workers: int = 4, max_iters: int = 3) -> pd.DataFrame:
    """Synchronous community label propagation (most-frequent neighbor label,
    ties → smallest, fixed iteration cap — deterministic). Hash-checked
    against an unrolled sync-LP DuckDB oracle (__ray_entry__._lp_sql) with
    identical vote/tie semantics; the pinned-tie-rule pytest oracle
    (tests/test_graph_algos.py) covers the engine kernel directly. The
    3-iteration cap is deliberate: mid-propagation the driver graph still
    carries >1k distinct labels, so the value hash discriminates the
    vote/tie rules — a converged run collapses to 2 labels and would
    rubber-stamp almost any update semantics."""
    from pagerank_ray.pipelines.cc import label_propagation

    csr, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=True)
    res = label_propagation(csr, n_workers=n_workers, max_iters=max_iters)
    df = _attach_orig(res.result, id_map, n, ["id", "label"])
    return df[["id", "label"]].sort_values("id").reset_index(drop=True)


def q_hits(sf_dir: str, n_workers: int = 4, iters: int = 5) -> pd.DataFrame:
    """HITS hubs & authorities over the lineitem graph (pipelines/hits.py):
    ``iters`` full iterations of the alternating MODE_SUM supersteps on the
    forward and reversed CSRs, L1-normalized to Σ = n each half-step.
    Hash-checked against an unrolled DuckDB oracle with identical
    raw-sum-then-scale arithmetic (__ray_entry__._hits_sql)."""
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
    from pagerank_ray.pipelines.hits import hits
    from pagerank_ray.stages import joins

    csr_fwd, n, id_map, dense_edges = _lineitem_csr(
        sf_dir, n_workers=n_workers, symmetrize=False, return_edges=True
    )

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src_id": t.column("dst_id"), "dst_id": t.column("src_id")})

    csr_rev = os.path.join(_graph_workdir(sf_dir, "rev"), "csr")
    prepare_csr_from_edges(
        dense_edges.map_batches(swap, batch_format="pyarrow"),
        n,
        csr_rev,
        n_parts=4 * n_workers,
    )
    res = hits(csr_fwd, csr_rev, n_workers=n_workers, iters=iters)

    def name_auth(t: pa.Table) -> pa.Table:
        return pa.table({"id": t.column("id"), "auth": t.column("value")})

    merged = joins.attach_column(
        res.authorities.map_batches(name_auth, batch_format="pyarrow"),
        res.hubs,
        probe_col="id",
        build_key="id",
        build_val="value",
        out_col="hub",
        build_count=n,
    )
    df = _attach_orig(merged, id_map, n, ["id"])
    df = df.sort_values("id").reset_index(drop=True)
    df["auth"] = _round_half_away(df["auth"], 6)
    df["hub"] = _round_half_away(df["hub"], 6)
    return df[["id", "auth", "hub"]]


def q_bfs_levels(sf_dir: str, n_workers: int = 4, mod: int = 1009) -> pd.DataFrame:
    """Multi-source BFS levels (unweighted shortest paths) on the symmetrized
    lineitem graph from the deterministic seed set {orig id % mod == 0} —
    MODE_DIST supersteps (min-scatter of d+1) to the fixpoint; unreached
    vertices report -1. Hash-checked against a fixed-unroll DuckDB oracle
    (__ray_entry__._bfs_sql; min-plus iteration is idempotent at the
    fixpoint, and the engine asserts its depth fits the unroll)."""
    from pagerank_ray.pipelines.cc import bfs_levels

    csr, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=True)
    im = id_map.to_pandas()
    seeds = im.loc[im["orig"] % mod == 0, "dense"].to_numpy(np.int64)
    res = bfs_levels(csr, seeds, n_workers=n_workers)
    if not res.converged:
        raise RuntimeError("BFS did not reach its fixpoint within max_iters")
    if res.iterations - 1 > 10:
        raise RuntimeError(
            f"BFS depth {res.iterations - 1} exceeds the oracle's 10-round unroll"
        )
    df = _attach_orig(res.result, id_map, n, ["id"])
    inf = np.int64(1) << 62
    df["dist"] = np.where(df["dist"].to_numpy(np.int64) >= inf, -1, df["dist"]).astype(
        np.int64
    )
    return df[["id", "dist"]].sort_values("id").reset_index(drop=True)


def q_sssp_weighted(sf_dir: str, n_workers: int = 4, mod: int = 1009) -> pd.DataFrame:
    """WEIGHTED single/multi-source shortest paths (Bellman-Ford min-plus)
    on the symmetrized weighted lineitem graph: edge weight = Σ l_quantity
    per directed pair, symmetric weight = the sum over both directions
    (documented contraction rule, mirrored in SQL). MODE_DISTW supersteps
    over a RAW-weight CSR (normalize_weights=False) from the same seed rule
    as ``bfs_levels``; distances are sums of integers (exact doubles), so
    the hash compare needs no rounding. Unreached → -1."""
    from pagerank_ray.pipelines.cc import bfs_levels
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
    from pagerank_ray.stages.graph_build import grouped_pair_sum

    def make_sym() -> rd.Dataset:
        # Symmetrize with ONE shuffle (the csr.symmetrize trick for weighted
        # edges): canonicalize every lineitem row to (min, max) BEFORE the
        # pair sum — so (a,b) and (b,a) quantities merge in the same groupby
        # — then mirror the summed canonical half back shuffle-free.
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])

        def canon(t: pa.Table) -> pa.Table:
            s = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            d = t.column("l_partkey").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "src_id": pa.array(np.minimum(s, d)),
                    "dst_id": pa.array(np.maximum(s, d)),
                    "weight": t.column("l_quantity").cast(pa.float64()),
                }
            )

        half = grouped_pair_sum(li.map_batches(canon, batch_format="pyarrow")).materialize()

        def double_self(t: pa.Table) -> pa.Table:
            # a self-loop's quantity appears in BOTH directions of the oracle's
            # UNION ALL and merges to a single 2q edge — mirror that exactly
            s = t.column("src_id").to_numpy(zero_copy_only=False)
            d = t.column("dst_id").to_numpy(zero_copy_only=False)
            w = t.column("weight").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "src_id": t.column("src_id"),
                    "dst_id": t.column("dst_id"),
                    "weight": pa.array(np.where(s == d, w * 2.0, w)),
                }
            )

        def mirror_noself(t: pa.Table) -> pa.Table:
            s = t.column("src_id").to_numpy(zero_copy_only=False)
            d = t.column("dst_id").to_numpy(zero_copy_only=False)
            keep = s != d
            return pa.table(
                {
                    "src_id": pa.array(d[keep]),
                    "dst_id": pa.array(s[keep]),
                    "weight": pa.array(t.column("weight").to_numpy(zero_copy_only=False)[keep]),
                }
            )

        return half.map_batches(double_self, batch_format="pyarrow").union(
            half.map_batches(mirror_noself, batch_format="pyarrow")
        )

    dense_edges, n, id_map = _compact_ids_cached(sf_dir, "wsymli", make_sym, base_tag="li")
    csr = os.path.join(_graph_workdir(sf_dir, "wsym"), "csr")
    prepare_csr_from_edges(
        dense_edges, n, csr, n_parts=4 * n_workers, normalize_weights=False
    )
    im = id_map.to_pandas()
    seeds = im.loc[im["orig"] % mod == 0, "dense"].to_numpy(np.int64)
    res = bfs_levels(csr, seeds, n_workers=n_workers, weighted=True)
    if not res.converged:
        raise RuntimeError("weighted SSSP did not reach its fixpoint")
    if res.iterations - 1 > 16:
        raise RuntimeError(
            f"SSSP hop depth {res.iterations - 1} exceeds the oracle's 16-round unroll"
        )
    df = _attach_orig(res.result, id_map, n, ["id"])
    d = df["dist"].to_numpy(np.float64)
    df["dist"] = np.where(np.isfinite(d), d, -1.0).astype(np.int64)
    return df[["id", "dist"]].sort_values("id").reset_index(drop=True)


def q_kcore(sf_dir: str, k: int = 7) -> pd.DataFrame:
    """k-core of the (undirected, simple) lineitem graph by distributed
    iterative peeling (pipelines/kcore.py); returns the core members with
    their in-core degree. Hash-checked against a fixed-unroll DuckDB oracle
    (__ray_entry__._kcore_sql, 10 rounds — peeling is idempotent at the
    fixpoint, and the engine asserts its actual round count fits)."""
    from pagerank_ray.pipelines.kcore import k_core
    from pagerank_ray.stages.csr import symmetrize

    core, rounds = k_core(symmetrize(lineitem_edges(sf_dir)), k)
    if rounds > 10:
        raise RuntimeError(
            f"k-core peeling took {rounds} rounds; oracle unrolls 10 — "
            "raise _kcore_sql rounds to keep the fixpoint-idempotence match"
        )
    df = core.to_pandas().rename(columns={"src_id": "id"})
    df["core_deg"] = df["core_deg"].astype(np.int64)
    return df[["id", "core_deg"]].sort_values("id").reset_index(drop=True)


def q_densest_subgraph(sf_dir: str, unroll: int = 12) -> pd.DataFrame:
    """Densest-subgraph peel profile (Bahmani, Kumar & Vazirani, VLDB 2012
    2(1+ε)-approx with ε = 1/4 so the removal rule 2·deg·n ≤ 5·m is exact
    integer — pipelines/densest.py): one row per peel round with the
    surviving (n, m) and density m/n; the max-density row is the approximate
    densest subgraph. Runs over the undirected simple lineitem graph;
    hash-checked against a fixed-unroll DuckDB oracle with the identical
    integer rule (__ray_entry__._densest_sql)."""
    from pagerank_ray.pipelines.densest import densest_subgraph
    from pagerank_ray.stages.csr import symmetrize

    sym = symmetrize(lineitem_edges(sf_dir))

    def noself(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.equal(t.column("src_id"), t.column("dst_id"))))

    rows = densest_subgraph(sym.map_batches(noself, batch_format="pyarrow"))
    if len(rows) > unroll:
        raise RuntimeError(
            f"densest peel took {len(rows)} rounds; oracle unrolls {unroll}"
        )
    df = pd.DataFrame(rows, columns=["peel_round", "n_vertices", "n_edges"])
    for c in df.columns:
        df[c] = df[c].astype(np.int64)
    df["density"] = _round_half_away(
        df["n_edges"].to_numpy(np.float64) / df["n_vertices"].to_numpy(np.float64), 6
    )
    return df.sort_values("peel_round").reset_index(drop=True)


def q_triangles(sf_dir: str) -> pd.DataFrame:
    """Per-vertex triangle counts of the (undirected, simple) lineitem graph —
    hash-checked against an oriented-wedge self-join DuckDB oracle with the
    same (deg, id) orientation semantics (pipelines/triangles.py)."""
    from pagerank_ray.pipelines.triangles import triangle_counts

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    counts = triangle_counts(dense_edges, n)
    df = _attach_orig(counts, id_map, n, ["id"])
    return df[["id", "tri_count"]].sort_values("id").reset_index(drop=True)


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


def q_region_revenue(sf_dir: str, region: str = "ASIA", year: int = 1996) -> pd.DataFrame:
    """TPC-H Q5-shaped six-table join: revenue per nation where the customer
    and the supplier sit in the same nation of one region, over one order
    year. The join plan is the engine's canonical star-join strategy:

    - ``region ⋈ nation`` resolves on the driver (≤ dozens of rows — the
      only justified driver-side join in the plan);
    - dimension attaches (`customer.c_nationkey`, `supplier.s_nationkey`)
      go through ``joins.attach_with_default`` — broadcast under
      BROADCAST_LIMIT, Ray-native hash join beyond, so the plan survives a
      customer table that no longer fits one worker;
    - rows outside the region/date window are dropped BEFORE the one big
      fact-fact join (lineitem ⋈ filtered-orders on o_orderkey), so the
      widest exchange carries only the qualifying fraction;
    - revenue is summed in exact integer cents (per-row half-away rounding,
      mirrored in the oracle) so distributed summation order can never flip
      the rounded output.
    """
    from pagerank_ray.stages import joins

    nation = _read(sf_dir, "nation").to_pandas()
    regions = _read(sf_dir, "region").to_pandas()
    rkeys = set(regions.loc[regions["r_name"] == region, "r_regionkey"])
    nat = nation[nation["n_regionkey"].isin(rkeys)]
    nation_name = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    nat_keys = pa.array(np.array(sorted(nation_name), dtype=np.int64))

    import pyarrow.dataset as pds

    lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"), pa.timestamp("us"))

    # the order-year predicate runs inside the parquet scanner (row-group
    # pruning); only qualifying orders enter the object store
    orders = _read(
        sf_dir,
        "orders",
        ["o_orderkey", "o_custkey"],
        filter=(pds.field("o_orderdate") >= lo) & (pds.field("o_orderdate") < hi),
    )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t.column("c_nationkey"), value_set=nat_keys)),
        batch_format="pyarrow",
    )
    orders_n = joins.attach_with_default(
        orders,
        cust,
        probe_col="o_custkey",
        build_key="c_custkey",
        build_val="c_nationkey",
        out_col="cust_nation",
        default=-1,
    ).filter(lambda r: r["cust_nation"] >= 0)

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda t: t.filter(pc.is_in(t.column("s_nationkey"), value_set=nat_keys)),
        batch_format="pyarrow",
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def cents(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        c = _round_half_away(price * (1.0 - disc) * 100.0, 0).astype(np.int64)
        return pa.table(
            {
                "l_orderkey": t.column("l_orderkey"),
                "l_suppkey": t.column("l_suppkey"),
                "rev_cents": pa.array(c),
            }
        )

    li_s = joins.attach_with_default(
        li.map_batches(cents, batch_format="pyarrow"),
        sup,
        probe_col="l_suppkey",
        build_key="s_suppkey",
        build_val="s_nationkey",
        out_col="supp_nation",
        default=-1,
    ).filter(lambda r: r["supp_nation"] >= 0)

    # the one fact-fact exchange: lineitem rows pick up the customer nation
    # of their (already date+region filtered) order, or -1 → dropped
    li_full = joins.attach_with_default(
        li_s,
        orders_n,
        probe_col="l_orderkey",
        build_key="o_orderkey",
        build_val="cust_nation",
        out_col="cust_nation",
        default=-1,
    )

    def same_nation(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(t.column("cust_nation"), t.column("supp_nation")),
            pc.greater_equal(t.column("cust_nation"), 0),
        )
        return t.filter(mask)

    per_nation = (
        li_full.map_batches(same_nation, batch_format="pyarrow")
        .groupby("supp_nation")
        .aggregate(Sum("rev_cents", alias_name="cents"))
        .to_pandas()
    )
    per_nation["n_name"] = per_nation["supp_nation"].map(nation_name)
    per_nation["revenue"] = (per_nation["cents"].astype(np.int64) / 100.0).round(2)
    return (
        per_nation[["n_name", "revenue"]]
        .sort_values(["revenue", "n_name"], ascending=[False, True])
        .reset_index(drop=True)
    )


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


def q_events_hopping(sf_dir: str) -> pd.DataFrame:
    """Hopping (sliding) 1-hour windows with a 30-min hop per event_type —
    every event contributes to the TWO windows covering it (flat_map-style
    explode inside ``map_batches``, then the same grouped aggregation as the
    tumbling case). SQL-checked against a DuckDB UNION-ALL explode oracle."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])
    hop_us = 1_800_000_000  # 30 min; window width = 2 hops = 1 h

    def explode(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hb = ts // hop_us
        et = t.column("event_type")
        val = t.column("value")
        return pa.table(
            {
                "event_type": pa.concat_arrays([et.combine_chunks()] * 2),
                "window_start": pa.array(
                    np.concatenate([hb * hop_us, (hb - 1) * hop_us]), pa.int64()
                ),
                "value": pa.concat_arrays([val.combine_chunks()] * 2),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(4)
    return out.sort_values(["event_type", "window_start"]).reset_index(drop=True)


def q_top_orders_per_customer(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Per-group top-k (window-function op): each customer's k most expensive
    orders, rank pinned by (price desc, orderkey asc). Bucketed by customer
    hash — one vectorized lexsort+rank kernel per bucket, no per-customer
    groups. SQL-checked against a DuckDB QUALIFY row_number oracle."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])

    def bucketize(t: pa.Table) -> pa.Table:
        c = t.column("o_custkey").to_numpy(zero_copy_only=False)
        mixed = (c * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("bucket", pa.array((mixed % 64).astype(np.int32)))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        cust = df["o_custkey"].to_numpy(dtype=np.int64)
        key = df["o_orderkey"].to_numpy(dtype=np.int64)
        price = df["o_totalprice"].to_numpy(dtype=np.float64)
        order = np.lexsort((key, -price, cust))
        cust, key, price = cust[order], key[order], price[order]
        starts = np.flatnonzero(np.concatenate([[True], cust[1:] != cust[:-1]]))
        lengths = np.diff(np.append(starts, len(cust)))
        rank = np.arange(len(cust)) - np.repeat(starts, lengths) + 1
        keep = rank <= k
        return pd.DataFrame(
            {
                "o_custkey": cust[keep],
                "o_orderkey": key[keep],
                "o_totalprice": np.round(price[keep], 2),
                "rank": rank[keep].astype(np.int64),
            }
        )

    out = (
        orders.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["o_custkey", "rank"]).reset_index(drop=True)


def q_error_burst(sf_dir: str, window_sec: int = 3600) -> pd.DataFrame:
    """Interval/range join (custom operator — Ray Data has no range join):
    for every "error" event, the number of the SAME user's events (any type,
    itself included) in the following hour. Both sides co-partition by user
    hash; each bucket resolves with two vectorized ``searchsorted`` calls on
    a rank-space composite of the bucket's (user, ts)-sorted event timeline —
    no per-key loop, no all-pairs. SQL-checked against a DuckDB
    range-predicate join."""
    from pagerank_ray.stages.temporal import _hash_bucket

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    win_us = np.int64(window_sec) * 1_000_000

    def tag_ev(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "side": pa.array(np.zeros(t.num_rows, np.int8)),
                "key": pa.array(u.astype(np.int64)),
                "t_us": t.column("ts").cast(pa.int64()),
                "okey": pa.array(np.full(t.num_rows, -1, np.int64)),
                "bucket": pa.array(_hash_bucket(u, 64)),
            }
        )

    def tag_err(t: pa.Table) -> pa.Table:
        mask = pc.equal(t.column("event_type"), "error")
        t = t.filter(mask)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "side": pa.array(np.ones(t.num_rows, np.int8)),
                "key": pa.array(u.astype(np.int64)),
                "t_us": t.column("ts").cast(pa.int64()),
                "okey": t.column("event_id"),
                "bucket": pa.array(_hash_bucket(u, 64)),
            }
        )

    both = ev.map_batches(tag_ev, batch_format="pyarrow").union(
        ev.map_batches(tag_err, batch_format="pyarrow")
    )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["side"] == 0]
        o = df[df["side"] == 1]
        if not len(o):
            return pd.DataFrame(
                {"event_id": pd.Series(dtype=np.int64), "n_events": pd.Series(dtype=np.int64)}
            )
        ek = e["key"].to_numpy(dtype=np.int64)
        et = e["t_us"].to_numpy(dtype=np.int64)
        okeys = o["key"].to_numpy(dtype=np.int64)
        ot = o["t_us"].to_numpy(dtype=np.int64)
        okey_out = o["okey"].to_numpy(dtype=np.int64)
        if not len(ek):
            return pd.DataFrame(
                {"event_id": okey_out, "n_events": np.zeros(len(o), np.int64)}
            )
        order = np.lexsort((et, ek))
        ek, et = ek[order], et[order]
        # rank-space composite: densify keys within the bucket so
        # dense_key * span + (ts - t_min) fits int64, then BOTH range bounds
        # become one vectorized searchsorted — no per-order Python loop
        uk = np.unique(ek)
        t_min = et.min()
        span = int(et.max() - t_min) + int(win_us) + 2
        assert len(uk) * span < 2**62, "composite overflow; raise n_buckets"
        ce = np.searchsorted(uk, ek) * span + (et - t_min)
        od = np.searchsorted(uk, okeys)
        valid = (od < len(uk)) & (uk[np.minimum(od, len(uk) - 1)] == okeys)
        lo_q = od * span + np.clip(ot - t_min, 0, span - 1)
        hi_q = od * span + np.clip(ot + win_us - t_min, 0, span - 1)
        counts = np.searchsorted(ce, hi_q, side="left") - np.searchsorted(
            ce, lo_q, side="left"
        )
        counts[~valid] = 0
        return pd.DataFrame(
            {"event_id": okey_out, "n_events": counts.astype(np.int64)}
        )

    out = (
        both.groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("event_id").reset_index(drop=True)


def q_sessionize(sf_dir: str, gap_sec: float = 1800.0) -> pd.DataFrame:
    """Gap-based sessionization of the event log (SURVEY.md §2.9): a user's
    events split into sessions wherever the gap to the previous event exceeds
    30 min; (ts, event_id) ordering pins simultaneous events. Hash-checked
    against a DuckDB LAG/cumsum window oracle."""
    from pagerank_ray.stages.temporal import sessionize

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    out = sessionize(ds, gap_sec=gap_sec).to_pandas()
    return (
        out[["event_id", "user_id", "session_num"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def q_orders_asof(sf_dir: str) -> pd.DataFrame:
    """Backward as-of join (custom operator — Ray Data has no asof): each
    event picks the user's most recent order at-or-before the event time
    (ties on order date → max orderkey); unmatched events take (-1, 0.0).
    Hash-checked against DuckDB's native ASOF LEFT JOIN."""
    from pagerank_ray.stages.temporal import asof_join

    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = asof_join(
        ev,
        orders,
        left_on="ts",
        right_on="o_orderdate",
        left_by="user_id",
        right_by="o_custkey",
        left_cols=["event_id"],
        right_cols=["o_orderkey", "o_totalprice"],
        right_fill={"o_orderkey": -1, "o_totalprice": 0.0},
        right_tiebreak=["o_orderkey"],
    ).to_pandas()
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return (
        out[["event_id", "user_id", "o_orderkey", "o_totalprice"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def q_running_total(sf_dir: str) -> pd.DataFrame:
    """Per-customer running order total + order rank (the
    ROWS-UNBOUNDED-PRECEDING window primitive), accumulated in exact integer
    cents so the result is hash-identical to DuckDB's windowed SUM."""
    from pagerank_ray.stages.temporal import running_totals

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = running_totals(
        orders,
        key_col="o_custkey",
        order_col="o_orderdate",
        id_col="o_orderkey",
        value_col="o_totalprice",
    ).to_pandas()
    return (
        out[["o_orderkey", "o_custkey", "order_rank", "running_total"]]
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


def q_approx_distinct_parts(sf_dir: str) -> pd.DataFrame:
    """HyperLogLog estimate of COUNT(DISTINCT l_partkey) — the APPROXIMATE
    estimate itself is hash-checked against a DuckDB reimplementation of the
    sketch (__ray_entry__._hll_sql): same fmix64 hash, exact-integer rho and
    harmonic sum, identical float expression order."""
    from pagerank_ray.stages.sketch import approx_distinct

    li = _read(sf_dir, "lineitem", ["l_partkey"])
    est = approx_distinct(li, "l_partkey", p=12)
    return pd.DataFrame(
        {
            "m": np.array([4096], dtype=np.int64),
            "estimate": _round_half_away(np.array([est]), 3),
        }
    )


def q_moving_avg_events(sf_dir: str, window: int = 3) -> pd.DataFrame:
    """Per-user trailing 3-row moving average of event value (ROWS BETWEEN 2
    PRECEDING window primitive) — cents-exact sum, one deterministic division,
    so the doubles hash-match SQL without rounding."""
    from pagerank_ray.stages.temporal import moving_average

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = moving_average(
        ev, key_col="user_id", order_col="ts", id_col="event_id",
        value_col="value", window=window,
    ).to_pandas()
    return (
        out[["event_id", "user_id", "moving_avg"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def q_customers_no_recent_orders(sf_dir: str) -> pd.DataFrame:
    """ANTI-join: customers with no order since 2001-01-01. The orders side
    reduces to its distinct custkeys first (bucketed grouped_count — the
    anti-join probe never sees order rows), then customers keep rows whose
    attach_with_default sentinel survives. Broadcast under BROADCAST_LIMIT,
    Ray-native hash left-outer join beyond — same scale story as every other
    dimension attach."""
    from pagerank_ray.stages import joins

    import pyarrow.dataset as pds

    cutoff = pa.scalar(np.datetime64("2001-01-01", "us"), pa.timestamp("us"))
    # row filter pushed into the parquet scanner: non-recent orders never
    # leave storage (row-group stats prune whole groups)
    orders = _read(
        sf_dir,
        "orders",
        ["o_custkey"],
        filter=(pds.field("o_orderdate") >= cutoff),
    )
    recent_custs = grouped_count(orders, "o_custkey", "n_orders")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    tagged = joins.attach_with_default(
        cust,
        recent_custs,
        probe_col="c_custkey",
        build_key="o_custkey",
        build_val="n_orders",
        out_col="n_recent",
        default=0,
    )
    out = tagged.filter(lambda r: r["n_recent"] == 0).to_pandas()
    return (
        out[["c_custkey", "c_name"]].sort_values("c_custkey").reset_index(drop=True)
    )


def q_json_extract_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: pull the integer field ``k`` out of the
    JSON ``events.props`` column and aggregate it per event_type. The
    extraction is a single vectorized Arrow ``extract_regex`` kernel per
    batch (flat-field fast path; no per-row json.loads in the hot loop —
    a nested payload would take the same shape with a larger pattern table),
    so the scan stays zero-copy Arrow end-to-end. All-integer outputs make
    the hash compare against DuckDB's json_extract exact by construction."""
    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t.column("props"), pattern=r'"k"\s*:\s*(?P<v>-?\d+)')
        return pa.table(
            {
                "event_type": t.column("event_type"),
                "k": pc.struct_field(m, "v").cast(pa.int64()),
            }
        )

    out = (
        ds.map_batches(extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("k", alias_name="sum_k"),
            Min("k", alias_name="min_k"),
            Max("k", alias_name="max_k"),
        )
        .to_pandas()
    )
    for c in ["n_events", "sum_k", "min_k", "max_k"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


def q_nation_trade_graph(sf_dir: str) -> pd.DataFrame:
    """Quotient-graph contraction — the webgraph domain-graph analog
    (contract page→page edges to domain→domain by mapping every vertex
    through url→domain): here the distinct order→supplier edges contract
    through customer-nation (src side) and supplier-nation (dst side), and
    the contracted edge weight is the number of underlying distinct edges.
    Plan: dedup the fact pairs FIRST (bucketed, so the contraction never
    sees duplicate multi-edges), one fact-fact attach (orders→custkey via
    broadcast-or-hash), then two tiny dimension attaches; the final groupby
    runs over 2-int16-key rows only. Nation names resolve on the driver
    (≤25-row dim — the only driver-side join)."""
    from pagerank_ray.stages import joins

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nation_name = dict(zip(nation["n_nationkey"].astype(np.int64), nation["n_name"]))

    edges = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"src_id": t.column("l_orderkey"), "dst_id": t.column("l_suppkey")})

    pairs = dedup_pairs(edges.map_batches(rename, batch_format="pyarrow"))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    with_cust = joins.attach_with_default(
        pairs,
        orders,
        probe_col="src_id",
        build_key="o_orderkey",
        build_val="o_custkey",
        out_col="custkey",
        default=-1,
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    with_cn = joins.attach_with_default(
        with_cust,
        cust,
        probe_col="custkey",
        build_key="c_custkey",
        build_val="c_nationkey",
        out_col="src_nationkey",
        default=-1,
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    contracted = joins.attach_with_default(
        with_cn,
        sup,
        probe_col="dst_id",
        build_key="s_suppkey",
        build_val="s_nationkey",
        out_col="dst_nationkey",
        default=-1,
    )

    def project(t: pa.Table) -> pa.Table:
        return t.select(["src_nationkey", "dst_nationkey"])

    out = (
        contracted.map_batches(project, batch_format="pyarrow")
        .groupby(["src_nationkey", "dst_nationkey"])
        .aggregate(Count(alias_name="n_edges"))
        .to_pandas()
    )
    out["src_nation"] = out["src_nationkey"].map(nation_name)
    out["dst_nation"] = out["dst_nationkey"].map(nation_name)
    out["n_edges"] = out["n_edges"].astype(np.int64)
    return (
        out[["src_nation", "dst_nation", "n_edges"]]
        .sort_values(["src_nation", "dst_nation"])
        .reset_index(drop=True)
    )


def q_orders_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Window ranking beyond top-k: each order's PERCENT_RANK of o_totalprice
    within its o_orderpriority class — bucketed by the partition key, one
    vectorized sort + tie-aware rank kernel per group (same single-key-fits-
    worker assumption as the temporal suite; a skewed class would shard by
    range with a two-pass rank offset). (rank−1)/(n−1) is the same double
    division on both engines, so the rounded values hash-match exactly."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])

    def rank_group(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, g in df.groupby("o_orderpriority", sort=False):
            price = g["o_totalprice"].to_numpy()
            order = np.argsort(price, kind="mergesort")
            n = len(price)
            # tie-aware min-rank (PERCENT_RANK semantics): rank of the first
            # equal value in sort order
            sorted_p = price[order]
            first_idx = np.searchsorted(sorted_p, sorted_p, side="left")
            rank = np.empty(n, dtype=np.int64)
            rank[order] = first_idx
            pr = rank / (n - 1) if n > 1 else np.zeros(n)
            out.append(
                pd.DataFrame(
                    {"o_orderkey": g["o_orderkey"].to_numpy(), "pr": pr}
                )
            )
        return pd.concat(out, ignore_index=True)

    res = (
        ds.groupby("o_orderpriority")
        .map_groups(rank_group, batch_format="pandas")
        .to_pandas()
    )
    res["pr"] = _round_half_away(res["pr"].to_numpy(), 6)
    return res.sort_values("o_orderkey").reset_index(drop=True)


def q_orders_by_month(sf_dir: str) -> pd.DataFrame:
    """Date-part grouped aggregation: orders and cents-exact revenue per
    (year, month) — the temporal scalar functions (year/month extraction)
    run as vectorized Arrow kernels inside the scan, never per row."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def parts(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate")
        price = t.column("o_totalprice").to_numpy(zero_copy_only=False)
        cents = _round_half_away(price * 100.0, 0).astype(np.int64)
        return pa.table(
            {
                "y": pc.year(d),
                "m": pc.month(d),
                "cents": pa.array(cents),
            }
        )

    out = (
        ds.map_batches(parts, batch_format="pyarrow")
        .groupby(["y", "m"])
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="c"))
        .to_pandas()
    )
    out["revenue"] = (out["c"].astype(np.int64) / 100.0).round(2)
    out["y"] = out["y"].astype(np.int64)
    out["m"] = out["m"].astype(np.int64)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return (
        out[["y", "m", "n_orders", "revenue"]]
        .sort_values(["y", "m"])
        .reset_index(drop=True)
    )


def q_pivot_returnflag(sf_dir: str) -> pd.DataFrame:
    """PIVOT / wide conditional aggregation: revenue per l_returnflag split
    into one column per l_linestatus. The pivot is one vectorized per-batch
    map (conditional cents columns — no row explosion, no per-category
    pass) followed by a single 3-group Sum; summing exact integer cents
    makes the distributed combine order irrelevant to the rounded output."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_extendedprice"])

    def widen(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = _round_half_away(price * 100.0, 0).astype(np.int64)
        status = t.column("l_linestatus").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t.column("l_returnflag"),
                "rev_f_cents": pa.array(np.where(status == "F", cents, 0)),
                "rev_o_cents": pa.array(np.where(status == "O", cents, 0)),
            }
        )

    out = (
        ds.map_batches(widen, batch_format="pyarrow")
        .groupby("l_returnflag")
        .aggregate(
            Sum("rev_f_cents", alias_name="f_cents"),
            Sum("rev_o_cents", alias_name="o_cents"),
        )
        .to_pandas()
    )
    out["rev_f"] = (out["f_cents"].astype(np.int64) / 100.0).round(2)
    out["rev_o"] = (out["o_cents"].astype(np.int64) / 100.0).round(2)
    return (
        out[["l_returnflag", "rev_f", "rev_o"]]
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )


def q_parts_shipped_diff(sf_dir: str) -> pd.DataFrame:
    """Set difference (EXCEPT): parts shipped in 1995 but never in 1996.
    Both sides reduce to bucketed distinct keys FIRST (grouped_count — the
    exchange carries one row per distinct part), then the except is a
    broadcast-or-hash anti-join attach with a sentinel filter — the same
    mechanics as every other anti-join in the engine, never an all-to-all
    over fact rows."""
    import pyarrow.dataset as pds

    from pagerank_ray.stages import joins

    def year_scan(year: int) -> rd.Dataset:
        # year predicate pushed into the parquet scanner (row-group pruning)
        lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"), pa.timestamp("us"))
        hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"), pa.timestamp("us"))
        return _read(
            sf_dir,
            "lineitem",
            ["l_partkey"],
            filter=(pds.field("l_shipdate") >= lo) & (pds.field("l_shipdate") < hi),
        )

    p95 = grouped_count(year_scan(1995), "l_partkey", "n95")
    p96 = grouped_count(year_scan(1996), "l_partkey", "n96")
    tagged = joins.attach_with_default(
        p95,
        p96,
        probe_col="l_partkey",
        build_key="l_partkey",
        build_val="n96",
        out_col="in96",
        default=-1,
    )

    def survivors(t: pa.Table) -> pa.Table:
        mask = pc.equal(t.column("in96"), pa.scalar(-1, pa.int64()))
        return t.filter(mask).select(["l_partkey"])

    out = tagged.map_batches(survivors, batch_format="pyarrow").to_pandas()
    return out.sort_values("l_partkey").reset_index(drop=True)


def q_distinct_parts_by_flag(sf_dir: str) -> pd.DataFrame:
    """EXACT grouped count-distinct — the exact companion of the HLL query
    (``approx_distinct_by_flag``): dedup (flag, part) pairs first with the
    bucketed pair-dedup (the exchange carries one row per distinct pair,
    never fact rows), then a 3-group count. At 100 TB the pair-dedup is the
    honest cost of exactness; the HLL path is the constant-memory sketch
    alternative, and the driver hash-checks both."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_partkey"])

    # reuse the bucketed pair-dedup by encoding the single-char flag as its
    # byte value per batch — deterministic with NO pre-pass over the table
    def encode(t: pa.Table) -> pa.Table:
        f = (
            t.column("l_returnflag")
            .to_numpy(zero_copy_only=False)
            .astype("S1")
            .view(np.uint8)
            .astype(np.int64)
        )
        return pa.table(
            {"src_id": pa.array(f), "dst_id": t.column("l_partkey").cast(pa.int64())}
        )

    pairs = dedup_pairs(li.map_batches(encode, batch_format="pyarrow"))
    out = grouped_count(pairs, "src_id", "n_parts").to_pandas()
    out["l_returnflag"] = out["src_id"].map(lambda b: chr(int(b)))
    out["n_parts"] = out["n_parts"].astype(np.int64)
    return (
        out[["l_returnflag", "n_parts"]]
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )


def q_parts_shipped_both(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER JOIN: per part, shipment counts in 1995 and 1996, keeping
    parts that appear in EITHER year. Expressed shuffle-minimally as a union
    of tagged per-side partial counts followed by ONE groupby — the full
    outer join of two aggregates never needs a join operator at all, and the
    exchange carries only (key, n95, n96) count rows."""
    import pyarrow.dataset as pds

    def year_counts(col: str):
        def f(t: pa.Table) -> pa.Table:
            keys = t.column("l_partkey").to_numpy(zero_copy_only=False)
            uniq, counts = np.unique(keys, return_counts=True)
            zero = np.zeros(len(uniq), dtype=np.int64)
            return pa.table(
                {
                    "l_partkey": pa.array(uniq),
                    "n95": pa.array(counts if col == "n95" else zero),
                    "n96": pa.array(counts if col == "n96" else zero),
                }
            )

        return f

    def year_scan(year: int) -> rd.Dataset:
        # year predicate pushed into the parquet scanner
        lo = pa.scalar(np.datetime64(f"{year}-01-01", "us"), pa.timestamp("us"))
        hi = pa.scalar(np.datetime64(f"{year + 1}-01-01", "us"), pa.timestamp("us"))
        return _read(
            sf_dir,
            "lineitem",
            ["l_partkey"],
            filter=(pds.field("l_shipdate") >= lo) & (pds.field("l_shipdate") < hi),
        )

    a = year_scan(1995).map_batches(year_counts("n95"), batch_format="pyarrow")
    b = year_scan(1996).map_batches(year_counts("n96"), batch_format="pyarrow")
    out = (
        a.union(b)
        .groupby("l_partkey")
        .aggregate(Sum("n95", alias_name="n_1995"), Sum("n96", alias_name="n_1996"))
        .to_pandas()
    )
    out["n_1995"] = out["n_1995"].astype(np.int64)
    out["n_1996"] = out["n_1996"].astype(np.int64)
    return out.sort_values("l_partkey").reset_index(drop=True)


def q_price_stats_by_flag(sf_dir: str) -> pd.DataFrame:
    """Grouped mean + sample stddev of l_extendedprice per l_returnflag from
    EXACT integer-cent moments: per-batch (n, Σc, Σc²) partials — Σc² held in
    float64 but every addend is an exact integer, and the final closed-form
    variance is one deterministic expression mirrored verbatim in the oracle
    SQL, so the rounded outputs hash-match."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = _round_half_away(price * 100.0, 0)
        flags = (
            t.column("l_returnflag")
            .to_numpy(zero_copy_only=False)
            .astype("S1")
            .view(np.uint8)
        )
        uniq, inv = np.unique(flags, return_inverse=True)
        n = np.bincount(inv)
        s1 = np.bincount(inv, weights=cents)
        s2 = np.bincount(inv, weights=cents * cents)
        return pa.table(
            {
                "fb": pa.array(uniq.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
                "s1": pa.array(s1),
                "s2": pa.array(s2),
            }
        )

    out = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("fb")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
        )
        .to_pandas()
    )
    n = out["n"].astype(np.float64).to_numpy()
    s1 = out["s1"].to_numpy()
    s2 = out["s2"].to_numpy()
    mean = s1 / n / 100.0
    var = (s2 - s1 * s1 / n) / (n - 1.0) / 10000.0
    res = pd.DataFrame(
        {
            "l_returnflag": out["fb"].map(lambda b: chr(int(b))),
            "n_rows": out["n"].astype(np.int64),
            "avg_price": _round_half_away(mean, 4),
            "stddev_price": _round_half_away(np.sqrt(var), 4),
        }
    )
    return res.sort_values("l_returnflag").reset_index(drop=True)


def q_qty_price_corr(sf_dir: str) -> pd.DataFrame:
    """Grouped Pearson correlation of (l_quantity, l_extendedprice) per
    l_returnflag from integer-valued moments (quantities are small ints,
    prices exact cents — every ADDEND is exact; the Σc² partials can exceed
    2^53 where summation-order ulps appear, damped far below the round(6)
    grid by the ~1e19 denominators). The closed-form expression is mirrored
    verbatim (same parenthesization) in the oracle SQL."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def moments(t: pa.Table) -> pa.Table:
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        cents = _round_half_away(price * 100.0, 0)
        flags = (
            t.column("l_returnflag")
            .to_numpy(zero_copy_only=False)
            .astype("S1")
            .view(np.uint8)
        )
        uniq, inv = np.unique(flags, return_inverse=True)
        return pa.table(
            {
                "fb": pa.array(uniq.astype(np.int64)),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "sx": pa.array(np.bincount(inv, weights=qty)),
                "sy": pa.array(np.bincount(inv, weights=cents)),
                "sxx": pa.array(np.bincount(inv, weights=qty * qty)),
                "syy": pa.array(np.bincount(inv, weights=cents * cents)),
                "sxy": pa.array(np.bincount(inv, weights=qty * cents)),
            }
        )

    out = (
        ds.map_batches(moments, batch_format="pyarrow")
        .groupby("fb")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
    )
    n = out["n"].astype(np.float64).to_numpy()
    sx, sy = out["sx"].to_numpy(), out["sy"].to_numpy()
    sxx, syy, sxy = out["sxx"].to_numpy(), out["syy"].to_numpy(), out["sxy"].to_numpy()
    corr = (sxy - (sx * sy) / n) / np.sqrt(
        (sxx - (sx * sx) / n) * (syy - (sy * sy) / n)
    )
    res = pd.DataFrame(
        {
            "l_returnflag": out["fb"].map(lambda b: chr(int(b))),
            "corr_qty_price": _round_half_away(corr, 6),
        }
    )
    return res.sort_values("l_returnflag").reset_index(drop=True)


def q_approx_distinct_by_flag(sf_dir: str) -> pd.DataFrame:
    """GROUP BY + HyperLogLog: approximate distinct l_partkey per
    l_returnflag, the grouped variant of ``approx_distinct_parts`` — shuffle
    carries ≤ n_groups × 2^p register rows, and the per-group ESTIMATES are
    hash-checked against _hll_sql(group_col=...)."""
    from pagerank_ray.stages.sketch import approx_distinct_grouped

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"])
    out = approx_distinct_grouped(li, "l_partkey", "l_returnflag", p=12)
    out["m"] = out["m"].astype(np.int64)
    out["estimate"] = _round_half_away(out["estimate"].to_numpy(), 3)
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_window_active_users(sf_dir: str) -> pd.DataFrame:
    """Windowed approximate distinct — the streaming-metrics composition of
    the hopping-window explode (q_events_hopping) and the grouped HLL sketch
    (q_approx_distinct_by_flag): approximate DISTINCT user_id per hopping
    24-hour window with a 12-hour hop ("daily active users", the canonical
    sliding-window cardinality metric). Each event contributes to the TWO
    windows covering it; the shuffle then carries ≤ n_windows × 2^p register
    rows, never user ids — the shape that still works when users number in
    the billions. The deterministic fmix64/rho register replay makes even
    the APPROXIMATE estimates hash-match the SQL oracle."""
    from pagerank_ray.stages.sketch import approx_distinct_grouped

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    hop_us = 43_200_000_000  # 12 h; window width = 2 hops = 24 h

    def explode(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        hb = ts // hop_us
        uid = t.column("user_id").cast(pa.int64()).combine_chunks()
        return pa.table(
            {
                "window_start": pa.array(
                    np.concatenate([hb * hop_us, (hb - 1) * hop_us]), pa.int64()
                ),
                "user_id": pa.concat_arrays([uid] * 2),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    out = approx_distinct_grouped(exploded, "user_id", "window_start", p=12)
    out["m"] = out["m"].astype(np.int64)
    out["estimate"] = _round_half_away(out["estimate"].to_numpy(), 3)
    return out.sort_values("window_start").reset_index(drop=True)


def q_bloom_semi_join(sf_dir: str, mod: int = 7, m_bits: int = 4096) -> pd.DataFrame:
    """Bloom-filter semi-join — the classic distributed-join pre-filter as a
    first-class sketch operator (beside HLL and the histogram quantiles):
    build a 4096-bit Bloom (k=2, shared fmix64) over the part keys with
    p_partkey % mod == 0 (a deterministic, scale-independent build side),
    probe the DISTINCT lineitem part keys against
    the broadcast bitmap, and report (keys passed incl. deterministic false
    positives, lineitem rows passed, exact true keys) — the FP overhead is
    part of the output, and because the hash is SQL-reproducible the counts
    WITH false positives hash-match the DuckDB reimplementation."""
    import ray

    from pagerank_ray.stages.sketch import bloom_build, bloom_filter_keys
    from pagerank_ray.stages import joins

    def keep_build(t: pa.Table) -> pa.Table:
        keys = t.column("p_partkey").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keys % mod == 0))

    build = (
        _read(sf_dir, "part", ["p_partkey"])
        .map_batches(keep_build, batch_format="pyarrow")
        .materialize()  # one part scan feeds the sketch AND the exact check
    )
    n_build = build.count()
    bits = bloom_build(build, "p_partkey", m_bits=m_bits)

    probe_keys = grouped_count(
        _read(sf_dir, "lineitem", ["l_partkey"]), "l_partkey", "n_rows"
    ).materialize()
    passed_df = bloom_filter_keys(probe_keys, "l_partkey", bits).to_pandas()
    n_keys_passed = len(passed_df)
    n_rows_passed = int(passed_df["n_rows"].sum()) if n_keys_passed else 0

    # exact true-key count (shows the sketch's FP overhead in the output)
    tagged = joins.attach_with_default(
        probe_keys,
        build.map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.ones(t.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        probe_col="l_partkey",
        build_key="p_partkey",
        build_val="one",
        out_col="hit",
        default=0,
        build_count=n_build,
    )
    n_true = tagged.map_batches(
        lambda t: pa.table(
            {"n": pa.array([int(pc.sum(t.column("hit")).as_py() or 0)])}
        ),
        batch_format="pyarrow",
    ).to_pandas()["n"].sum()
    return pd.DataFrame(
        {
            "n_keys_passed": [np.int64(n_keys_passed)],
            "n_rows_passed": [np.int64(n_rows_passed)],
            "n_true_keys": [np.int64(n_true)],
        }
    )


def q_approx_quantiles_price(sf_dir: str) -> pd.DataFrame:
    """Histogram-sketch approximate quantiles of l_extendedprice — the scale
    path beside the exact sort-based operator; the APPROXIMATE estimates
    themselves hash-match the SQL reimplementation (identical double
    arithmetic, same contract as the HLL sketch)."""
    from pagerank_ray.stages.quantiles import approx_quantiles_histogram

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    return approx_quantiles_histogram(li, "l_extendedprice", [0.5, 0.9, 0.99], n_bins=2048)


def q_quantiles_by_flag(sf_dir: str) -> pd.DataFrame:
    """Per-group approximate quantiles (p50/p90/p99 of l_extendedprice per
    l_returnflag) via the grouped equi-width histogram sketch — the shape a
    100 TB per-partition length-distribution report needs: one small grouped
    stats pass, one ≤ n_groups × n_bins count shuffle, closed-form finish.
    APPROXIMATE estimates hash-match the SQL replay (identical doubles)."""
    from pagerank_ray.stages.quantiles import approx_quantiles_grouped

    li = _read(sf_dir, "lineitem", ["l_extendedprice", "l_returnflag"])
    out = approx_quantiles_grouped(
        li, "l_extendedprice", "l_returnflag", [0.5, 0.9, 0.99], n_bins=2048
    )
    return out.sort_values(["l_returnflag", "q"]).reset_index(drop=True)


def q_robust_price_stats(sf_dir: str) -> pd.DataFrame:
    """Robust location/scale of l_extendedprice — approximate median and MAD
    (median absolute deviation, THE outlier-resistant spread estimate corpus
    filters use) as TWO DEPENDENT histogram-sketch passes: pass 1 estimates
    the median; pass 2 sketches |x − median_est| and takes its median. Both
    passes are the deterministic equi-width sketch, and the pass-1 estimate
    feeds pass 2 as the identical double on both engines — so even this
    composed approximation hash-matches the SQL replay."""
    from pagerank_ray.stages.quantiles import approx_quantiles_histogram

    li = _read(sf_dir, "lineitem", ["l_extendedprice"])
    med = float(
        approx_quantiles_histogram(li, "l_extendedprice", [0.5], n_bins=2048)
        .iloc[0]["estimate"]
    )

    def absdev(t: pa.Table) -> pa.Table:
        x = t.column("l_extendedprice").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"dev": pa.array(np.abs(x - med), pa.float64())})

    devs = li.map_batches(absdev, batch_format="pyarrow")
    mad = float(
        approx_quantiles_histogram(devs, "dev", [0.5], n_bins=2048)
        .iloc[0]["estimate"]
    )
    n = li.count()
    return pd.DataFrame(
        {
            "n": pd.array([n], dtype=np.int64),
            "median_est": [_round_half_away(np.array([med]), 6)[0]],
            "mad_est": [_round_half_away(np.array([mad]), 6)[0]],
        }
    )


def q_doc_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact distributed quantiles (p25/p50/p75/p95) of document length —
    global sort + block-offset scalar fetch, no driver materialization.
    Hash-checked against DuckDB quantile_cont (identical linear
    interpolation)."""
    from pagerank_ray.stages.quantiles import exact_quantiles

    docs = _read(sf_dir, "documents", ["n_chars"])
    out = exact_quantiles(docs, "n_chars", [0.25, 0.5, 0.75, 0.95])
    out["value"] = out["value"].round(6)
    return out.sort_values("q").reset_index(drop=True)


def q_quality_filter(sf_dir: str, q: float = 0.25) -> pd.DataFrame:
    """Composed training-data pipeline step: score every document, compute the
    corpus p25 quality threshold (discrete quantile — an actual data value,
    so the >= comparison is ulp-exact on both sides), keep docs at or above
    it. The threshold is a broadcast scalar, the filter a vectorized
    ``map_batches`` — no driver-side corpus pass. Hash-checked against a
    DuckDB quantile_disc + filter oracle."""
    from pagerank_ray.functions.text import lang_id_batch, quality_score_batch
    from pagerank_ray.stages.quantiles import exact_quantile_disc

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = quality_score_batch(lang_id_batch(df))
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "quality": _round_half_away(df["quality"], 6)}
        )

    scored = docs.map_batches(score, batch_format="pandas").materialize()
    thr = exact_quantile_disc(scored, "quality", q)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["quality"] >= thr]

    out = scored.map_batches(keep, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """EXACT n-gram-Jaccard similarity join over documents (prefix-filter
    AllPairs — no LSH, no false negatives). Hash-checked against a DuckDB
    all-pairs shingle-list oracle computing the identical word-3-gram
    Jaccard."""
    from pagerank_ray.stages.dedup import jaccard_similarity_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return jaccard_similarity_join(docs, threshold=threshold)


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


def q_bpe_token_counts(sf_dir: str) -> rd.Dataset:
    """Per-doc subword token counts under the vendored BPE merge table —
    the real merge-rank algorithm (Sennrich 2016 training / GPT-2-order
    application), not the whitespace/regex approximation of token_counts.
    Stateful actor-pool stage: the merge table loads once per actor and the
    unique-pretoken cache persists across batches (functions/bpe.py)."""
    from pagerank_ray.functions.bpe import BPETokenCounter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        BPETokenCounter, batch_format="pyarrow", concurrency=(1, 4), batch_size=256
    )


def q_tokenizer_fertility(sf_dir: str) -> pd.DataFrame:
    """Per-language tokenizer-efficiency report — the standard tokenizer
    evaluation a multilingual training pipeline runs before committing to a
    vocabulary: fertility = BPE tokens per whitespace word and compression =
    UTF-8 bytes per BPE token, grouped by the document language. Composes
    the real merge-table BPE stage (functions/bpe.py, actor-pool with the
    unique-pretoken cache) with the mirrored whitespace-word and byte-length
    definitions; each batch pre-aggregates per-language partials (the
    combiner idiom), so the driver sees O(#batches × #langs) rows. Exact
    integer sums + one mirrored ROUND(÷, 6) per ratio."""
    from pagerank_ray.functions.bpe import BPETokenCounter

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    class _FertilityStage:
        def __init__(self):
            self.bpe = BPETokenCounter()

        def __call__(self, t: pa.Table) -> pa.Table:
            out = self.bpe(t)
            texts = t.column("text").to_pandas()
            df = pd.DataFrame(
                {
                    "lang": t.column("lang").to_pandas(),
                    "n_tokens": out.column("n_tokens").to_numpy(zero_copy_only=False),
                    "n_words": textfn.whitespace_token_count(texts),
                    "n_bytes": texts.fillna("").str.encode("utf-8").str.len()
                    .to_numpy(dtype=np.int64),
                }
            )
            g = (
                df.groupby("lang", sort=False)
                .agg(
                    n_docs=("n_tokens", "size"),
                    n_tokens=("n_tokens", "sum"),
                    n_words=("n_words", "sum"),
                    n_bytes=("n_bytes", "sum"),
                )
                .reset_index()
            )
            return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(
        _FertilityStage, batch_format="pyarrow", concurrency=(1, 4), batch_size=256
    ).to_pandas()
    agg = parts.groupby("lang", sort=True).sum().reset_index()
    tok = agg["n_tokens"].to_numpy(np.int64).astype(np.float64)
    wrd = agg["n_words"].to_numpy(np.int64).astype(np.float64)
    byt = agg["n_bytes"].to_numpy(np.int64).astype(np.float64)
    agg["fertility"] = _round_half_away(
        np.where(wrd == 0, 0.0, tok / np.where(wrd == 0, 1.0, wrd)), 6
    )
    agg["bytes_per_token"] = _round_half_away(
        np.where(tok == 0, 0.0, byt / np.where(tok == 0, 1.0, tok)), 6
    )
    for c in ("n_docs", "n_tokens", "n_words", "n_bytes"):
        agg[c] = agg[c].astype(np.int64)
    return agg.reset_index(drop=True)


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


def q_ngram_topk(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """Top-k word bigrams by corpus frequency (corpus-statistics op). Bigram
    formation is one vectorized kernel per batch — token explode + shifted
    string concat with doc-boundary mask — and each batch pre-aggregates its
    counts (the partial/combiner idiom) so the groupby shuffles one row per
    DISTINCT gram per batch, not one per occurrence. Deterministic top-k
    (count desc, gram asc). SQL-checked against a DuckDB unnest oracle.

    The merge is the bucketed-combine idiom (graph_build.dedup_pairs), NOT
    groupby("gram").aggregate(): Ray's aggregate pays per-GROUP overhead and
    gram cardinality is corpus-scale. Each gram hashes to exactly ONE bucket,
    so the global top-k is the top-k of the union of per-bucket top-ks —
    n_buckets × k candidate rows reach the driver, never the full vocabulary."""
    n_buckets = 64
    ds = _read(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), np.maximum(n_tok, 1))
        w = flat.to_numpy()
        if len(w) < 2:
            return pd.DataFrame({"gram": pd.Series(dtype=object), "cnt": pd.Series(dtype=np.int64)})
        both = valid[:-1] & valid[1:] & (doc_idx[:-1] == doc_idx[1:])
        if not both.any():
            return pd.DataFrame({"gram": pd.Series(dtype=object), "cnt": pd.Series(dtype=np.int64)})
        grams = pd.Series(w[:-1][both]).str.cat(pd.Series(w[1:][both]), sep=" ")
        vc = grams.value_counts()
        return pd.DataFrame(
            {"gram": vc.index.to_numpy(dtype=object), "cnt": vc.to_numpy(np.int64)}
        )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        # deterministic vectorized string hash (fixed pandas hash key)
        h = pd.util.hash_array(df["gram"].to_numpy(dtype=object))
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("gram", sort=False)["cnt"].sum().reset_index(name="n")
        s["n"] = s["n"].astype(np.int64)
        return s.sort_values(["n", "gram"], ascending=[False, True],
                             kind="mergesort").head(k)

    cand = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_topk, batch_format="pandas")
        .to_pandas()  # ≤ n_buckets × k rows
    )
    out = cand.sort_values(["n", "gram"], ascending=[False, True],
                           kind="mergesort").head(k)
    return out[["gram", "n"]].reset_index(drop=True)


def q_bpe_token_topk(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """Top-k BPE subword tokens by corpus frequency — the vocabulary-audit
    corpus statistic every tokenizer pipeline runs. Stateful actor partials
    (merge table + unique-pretoken encode cache once per actor), per-batch
    pre-aggregated (token, cnt) rows, then the bucketed-combine top-k idiom
    (see q_ngram_topk on why not groupby().aggregate at vocab cardinality).
    Deterministic (count desc, token asc); SQL-checked against the recursive
    merge-walk oracle's token split."""
    n_buckets = 64
    ds = _read(sf_dir, "documents", ["text"])

    class Partial:
        def __init__(self):
            import re as _re

            from pagerank_ray.functions.bpe import PRETOKEN_RE, BPETokenizer

            self.tok = BPETokenizer()
            self.pat = _re.compile(PRETOKEN_RE)
            self.enc_cache: dict[str, list[str]] = {}

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            flat = df["text"].fillna("").str.findall(self.pat).explode(ignore_index=True).dropna()
            if not len(flat):
                return pd.DataFrame({"token": pd.Series(dtype=object),
                                     "cnt": pd.Series(dtype=np.int64)})
            counts: dict[str, int] = {}
            for w, c in flat.value_counts().items():  # unique pretokens only
                toks = self.enc_cache.get(w)
                if toks is None:
                    toks = self.enc_cache[w] = self.tok.encode_word(w)
                for t in toks:  # multiplicity inside a word preserved
                    counts[t] = counts.get(t, 0) + int(c)
            return pd.DataFrame({"token": np.array(list(counts), dtype=object),
                                 "cnt": np.fromiter(counts.values(), np.int64,
                                                    count=len(counts))})

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["token"].to_numpy(dtype=object))
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def merge_topk(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("token", sort=False)["cnt"].sum().reset_index(name="n")
        s["n"] = s["n"].astype(np.int64)
        return s.sort_values(["n", "token"], ascending=[False, True],
                             kind="mergesort").head(k)

    cand = (
        ds.map_batches(Partial, batch_format="pandas", concurrency=(1, 4))
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_topk, batch_format="pandas")
        .to_pandas()  # ≤ n_buckets × k rows
    )
    out = cand.sort_values(["n", "token"], ascending=[False, True],
                           kind="mergesort").head(k)
    return out[["token", "n"]].reset_index(drop=True)


def q_betweenness(
    sf_dir: str, n_workers: int = 4, mod: int = 577, n_seeds: int = 2, unroll: int = 16
) -> pd.DataFrame:
    """Seeded betweenness centrality — Brandes' dependency accumulation
    (Brandes 2001; k-seed sampling per Bader et al. 2007) from the
    ``n_seeds`` smallest vertices with id % mod == 0 over the symmetrized
    lineitem graph. Level-synchronous and fully Dataset-expressed:

      1. per-seed BFS levels via the resident MODE_DIST engine (one pool
         for all seeds — the eccentricity path);
      2. the shortest-path DAG = edges with lev(dst) = lev(src)+1, built by
         TWO level-attach joins over the symmetric edge set, keyed by a
         composite (seed, vertex) key so EVERY seed shares each per-level
         pass (the multi-source Brandes batching);
      3. forward σ (path counts, exact integers) level by level: join the
         level-l DAG slice with the level-l σ frontier, groupby-key sum;
      4. backward δ: coeff(w) = (1+δ(w))/σ(w) once per vertex, then
         δ(v) = σ(v) · Σ_{v→w} coeff(w) per level descending — the same
         single-division-then-sum expression the SQL oracle uses.

    2·diameter shuffles over the (shrinking) DAG for ALL seeds together —
    the textbook distributed Brandes shape; no per-vertex state reaches the
    driver. n_seeds = 2 keeps the cross-seed accumulation a two-term sum
    (exactly order-independent, so engine and oracle agree bit-for-bit
    before the final ROUND). bc > 0 membership is structural (sums of
    positive terms), so the row set is float-noise-free."""
    from pagerank_ray.pipelines.cc import bfs_levels_multi
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.csr import symmetrize

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    csr = os.path.join(_graph_workdir(sf_dir, "sym"), "csr")
    prepare_csr_from_edges(dense_edges, n, csr, n_parts=4 * n_workers, symmetrize=True)
    im = id_map.to_pandas()
    cand = np.sort(im.loc[im["orig"] % mod == 0, "orig"].to_numpy(np.int64))[:n_seeds]
    dense_seeds = [int(im.loc[im["orig"] == so, "dense"].iloc[0]) for so in cand]

    if not dense_seeds:
        # no vertex satisfies the seed rule: the oracle's LIMIT over an
        # empty seed set returns no rows — agree on empty, don't crash
        return pd.DataFrame({"id": pd.Series(dtype=np.int64),
                             "bc": pd.Series(dtype=np.float64)})
    sym = symmetrize(dense_edges).materialize()
    inf = np.int64(1) << 62
    results = bfs_levels_multi(csr, [[s] for s in dense_seeds], n_workers=n_workers)

    # ---- seed-keyed level table: key = seed_idx * n + id  (fits int64) ----
    lev_parts = []
    for si, res in enumerate(results):
        if not res.converged:
            raise RuntimeError("betweenness BFS did not converge")
        lev_parts.append(
            res.result.map_batches(
                lambda t, _si=si: pa.table(
                    {
                        "key": pc.add(
                            pc.multiply(
                                t.column("id").cast(pa.int64()), np.int64(1)
                            ),
                            np.int64(_si) * np.int64(n),
                        ),
                        "dist": t.column("dist"),
                    }
                ),
                batch_format="pyarrow",
            )
        )
    levels = lev_parts[0]
    for part in lev_parts[1:]:
        levels = levels.union(part)
    levels = levels.materialize()  # (key, dist) for every (seed, vertex)

    # ---- shortest-path DAG, all seeds at once ----
    def replicate(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        ks, kd = [], []
        for si in range(len(dense_seeds)):
            off = np.int64(si) * np.int64(n)
            ks.append(s + off)
            kd.append(d + off)
        return pa.table(
            {"src_key": pa.array(np.concatenate(ks)),
             "dst_key": pa.array(np.concatenate(kd))}
        )

    el = sym.map_batches(replicate, batch_format="pyarrow")
    el = joins.attach_column(
        el, levels, probe_col="src_key", build_key="key", build_val="dist",
        out_col="lev_s", build_count=n * n_seeds,
    )
    el = joins.attach_column(
        el, levels, probe_col="dst_key", build_key="key", build_val="dist",
        out_col="lev_d", build_count=n * n_seeds,
    )
    import shutil as _sh
    import tempfile as _tf

    dag_full = el.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.less(t.column("lev_s"), int(inf)),
                pc.equal(t.column("lev_d"), pc.add(t.column("lev_s"), 1)),
            )
        ).select(["src_key", "dst_key", "lev_s"]),
        batch_format="pyarrow",
    )
    # one level-partitioned parquet write: each of the 2·diameter sweep
    # steps then READS its level slice instead of re-filtering the full DAG
    dag_dir = _tf.mkdtemp(prefix="betweenness_dag_")
    try:
        return _betweenness_sweeps(
            dag_dir, dag_full, dense_seeds, results, id_map, n, unroll
        )
    finally:
        _sh.rmtree(dag_dir, ignore_errors=True)


def _betweenness_sweeps(dag_dir, dag_full, dense_seeds, results, id_map, n, unroll):
    """σ/δ sweeps of q_betweenness (split out so the DAG scratch dir is
    removed by try/finally on EVERY exit, including the unroll guard)."""
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import grouped_sum

    dag_full.write_parquet(dag_dir, partition_cols=["lev_s"])

    def dag_level(l: int) -> rd.Dataset | None:
        d = os.path.join(dag_dir, f"lev_s={l}")
        if not (os.path.isdir(d) and any(os.scandir(d))):
            return None
        return rd.read_parquet(d, columns=["src_key", "dst_key"])
    max_lvl = int(max((r.iterations - 1) for r in results))
    if max_lvl > unroll:
        raise RuntimeError(f"BFS depth {max_lvl} exceeds the {unroll}-level oracle unroll")

    def _empty(schema: dict) -> rd.Dataset:
        return rd.from_arrow(pa.table({c: pa.array([], t) for c, t in schema.items()}))

    # ---- forward σ by level (all seeds in one pass per level) ----
    seed_keys = np.array(
        [si * n + s for si, s in enumerate(dense_seeds)], dtype=np.int64
    )
    sig_by_level: list[rd.Dataset] = [
        rd.from_arrow(pa.table({"key": pa.array(seed_keys),
                                "sigma": pa.array(np.ones(len(seed_keys), np.int64))}))
    ]
    for lvl in range(max_lvl):
        slice_l = dag_level(lvl)
        if slice_l is None:
            max_lvl = lvl
            break
        joined = joins.attach_column(
            slice_l,
            sig_by_level[lvl], probe_col="src_key", build_key="key",
            build_val="sigma", out_col="sig_s", build_count=n * len(dense_seeds),
        )
        from pagerank_ray.stages.graph_build import grouped_sum

        # bucketed combine, NOT groupby().aggregate — frontier cardinality
        # is data-dependent (the lp_modularity/ngram trap)
        nxt = (
            grouped_sum(joined, "dst_key", "sig_s", "sigma")
            .map_batches(
                lambda t: pa.table(
                    {"key": t.column("dst_key").cast(pa.int64()),
                     "sigma": t.column("sigma").cast(pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if nxt.count() == 0:
            max_lvl = lvl
            break
        sig_by_level.append(nxt)

    # ---- backward δ by descending level ----
    delta_parts: list[rd.Dataset] = []
    delta_next = _empty({"key": pa.int64(), "delta": pa.float64()})
    for l in range(max_lvl - 1, -1, -1):
        coeff = joins.attach_with_default(
            sig_by_level[l + 1], delta_next, probe_col="key", build_key="key",
            build_val="delta", out_col="delta", default=0.0,
            out_type=pa.float64(), build_count=n * len(dense_seeds),
        ).map_batches(
            lambda t: pa.table(
                {
                    "key": t.column("key"),
                    "coeff": pc.divide(
                        pc.add(t.column("delta"), 1.0),
                        t.column("sigma").cast(pa.float64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        contrib = joins.attach_column(
            dag_level(l),
            coeff, probe_col="dst_key", build_key="key",
            build_val="coeff", out_col="coeff", build_count=n * len(dense_seeds),
        )
        from pagerank_ray.stages.graph_build import grouped_sum

        summed = (
            grouped_sum(contrib, "src_key", "coeff", "csum")
            .map_batches(
                lambda t: pa.table(
                    {"key": t.column("src_key").cast(pa.int64()),
                     "csum": t.column("csum")}
                ),
                batch_format="pyarrow",
            )
        )
        delta_next = joins.attach_column(
            summed, sig_by_level[l], probe_col="key", build_key="key",
            build_val="sigma", out_col="sigma", build_count=n * len(dense_seeds),
            drop_probe_col=False,
        ).map_batches(
            lambda t: pa.table(
                {
                    "key": t.column("key"),
                    "delta": pc.multiply(
                        t.column("sigma").cast(pa.float64()), t.column("csum")
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        delta_parts.append(delta_next)

    if not delta_parts:
        return pd.DataFrame({"id": pd.Series(dtype=np.int64),
                             "bc": pd.Series(dtype=np.float64)})
    allp = delta_parts[0]
    for part in delta_parts[1:]:
        allp = allp.union(part)
    seed_key_set = set(int(k) for k in seed_keys)

    def fold(t: pa.Table) -> pa.Table:
        # drop each seed's own row, fold (seed, vertex) keys back to vertex
        k = t.column("key").to_numpy(zero_copy_only=False)
        keep = ~np.isin(k, np.fromiter(seed_key_set, np.int64, len(seed_key_set)))
        return pa.table(
            {"id": pa.array((k[keep] % np.int64(n)).astype(np.int64)),
             "delta": t.column("delta").filter(pa.array(keep))}
        )

    from pagerank_ray.stages.graph_build import grouped_sum

    bc = (
        grouped_sum(allp.map_batches(fold, batch_format="pyarrow"),
                    "id", "delta", "bc")
        .map_batches(
            lambda t: pa.table({"id": t.column("id").cast(pa.int64()),
                                "bc": t.column("bc")}),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = joins.attach_column(
        rd.from_arrow(pa.Table.from_pandas(bc, preserve_index=False)),
        id_map, probe_col="id", build_key="dense", build_val="orig",
        out_col="orig", build_count=n, drop_probe_col=True,
    ).to_pandas()
    out = out.rename(columns={"orig": "id"})
    # ROUND(4): the per-vertex coefficient sums are multi-term float sums
    # whose order is pinned on neither engine; 4 decimals leaves ~9 orders
    # of magnitude between the ulp noise and the rounding boundary (the
    # 6-decimal margin was ~1e-13 vs 5e-7 — latently flaky at 60k vertices)
    out["bc"] = _round_half_away(out["bc"].to_numpy(), 4)
    return out[["id", "bc"]].sort_values("id").reset_index(drop=True)


def q_decontaminate_docs(sf_dir: str, k: int = 3, mod: int = 50) -> pd.DataFrame:
    """Benchmark decontamination — the training-data staple: flag every
    corpus document sharing ANY word-k-gram with a holdout ("benchmark")
    set (docs with doc_id % mod == 0), reporting how many of its distinct
    shingles are contaminated. Shape: the benchmark shingle universe is the
    SMALL side — distributed distinct, then ONE broadcast (`ray.put`) of a
    sorted uint64 hash array; the corpus probes it per batch with
    searchsorted. No shuffle touches the corpus. Shingles are the
    collision-free 64-bit token-triple hashes the Jaccard join uses
    (stages/dedup.py:_token_shingles); the oracle intersects the identical
    k-gram STRINGS in SQL."""
    from pagerank_ray.stages.dedup import _hash_tokens, _shingles_from_token_hashes
    from pagerank_ray.stages.graph_build import distinct_values

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _doc_shingles(t: pa.Table, keep_bench: bool):
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        sel = (ids % mod == 0) if keep_bench else (ids % mod != 0)
        texts = t.column("text").to_pylist()
        out_ids, out_sh = [], []
        for i in np.nonzero(sel)[0]:
            sh = _shingles_from_token_hashes(_hash_tokens((texts[i] or "").split()), k)
            out_ids.append(np.full(len(sh), ids[i], np.int64))
            out_sh.append(sh)
        if not out_ids:
            return np.empty(0, np.int64), np.empty(0, np.uint64)
        return np.concatenate(out_ids), np.concatenate(out_sh)

    def bench_rows(t: pa.Table) -> pa.Table:
        _, sh = _doc_shingles(t, keep_bench=True)
        return pa.table({"g": pa.array(np.unique(sh))})

    bench = docs.map_batches(bench_rows, batch_format="pyarrow")
    gset = np.sort(
        distinct_values(bench, "g").to_pandas()["g"].to_numpy().astype(np.uint64)
    )
    import ray as _ray

    gref = _ray.put(gset)

    def probe(t: pa.Table) -> pa.Table:
        from pagerank_ray.stages import joins

        gs = joins.broadcast_get(gref, lambda v: v, "decontam-shingles")
        ids, sh = _doc_shingles(t, keep_bench=False)
        if not len(ids):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_overlap": pa.array([], pa.int64())})
        if len(gs) == 0:  # empty holdout -> nothing can be contaminated
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_overlap": pa.array([], pa.int64())})
        pos = np.searchsorted(gs, sh)
        hit = (pos < len(gs)) & (gs[np.minimum(pos, len(gs) - 1)] == sh)
        n = np.bincount(
            np.unique(ids, return_inverse=True)[1], weights=hit
        ).astype(np.int64)
        uids = np.unique(ids)
        keep = n > 0
        return pa.table({"doc_id": pa.array(uids[keep]),
                         "n_overlap": pa.array(n[keep])})

    out = docs.map_batches(probe, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_semantic_dedup_docs(sf_dir: str, threshold: float = 0.95) -> pd.DataFrame:
    """Semantic near-dup pairs over INFERRED embeddings — the full
    training-data composition: embedding-inference actor stage → exact
    blocked all-pairs cosine (a < b, cosine ≥ threshold). The oracle
    recomputes the embeddings in SQL and cross-joins, so the whole chain
    (tokenize → hash-project → normalize → pair) is value-checked."""
    from pagerank_ray.stages.dedup import embedding_similarity_pairs
    from pagerank_ray.stages.embed import embed_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    emb = embed_documents(docs).map_batches(
        lambda t: pa.table(
            {"vec_id": t.column("doc_id"), "embedding": t.column("embedding")}
        ),
        batch_format="pyarrow",
    ).materialize()
    return embedding_similarity_pairs(emb, threshold=threshold)


def q_tfidf_topk(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k terms per document by TF-IDF (idf = ln((1+N)/(1+df)) + 1,
    sklearn-smoothed) — the corpus-statistics composition: per-batch exact
    (doc, term, tf) rows (a doc's tokens never leave its batch, so NO
    shuffle builds term frequencies), document frequency as a groupby over
    those already-unique pairs, idf attached broadcast-or-hash, and a
    bucketed per-doc top-k kernel. Scores rounded half-away(6) on both
    engines so a 1-ulp libm log difference cannot flip the ranking."""
    from pagerank_ray.stages import joins

    n_buckets = 64
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()

    def tf_batch(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        doc_ids = np.repeat(df["doc_id"].to_numpy(np.int64), np.maximum(n_tok, 1))
        pairs = pd.DataFrame({"doc_id": doc_ids[valid], "term": flat.to_numpy()[valid]})
        if not len(pairs):
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype=np.int64), "term": pd.Series(dtype=object),
                 "tf": pd.Series(dtype=np.int64)}
            )
        out = pairs.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        out["tf"] = out["tf"].astype(np.int64)
        return out

    # tf is consumed twice (df-count build + probe side of the idf attach):
    # materialize once so the tokenize/explode doesn't run twice. The
    # (doc, term, tf) table is object-store-resident and spillable.
    tf = ds.map_batches(tf_batch, batch_format="pandas").materialize()

    # document frequency over the already-unique (doc, term) pairs — the
    # bucketed-combine idiom instead of a corpus-cardinality
    # groupby("term").aggregate() (see q_ngram_topk / dedup_pairs rationale)
    def term_bucket(df: pd.DataFrame) -> pd.DataFrame:
        terms = df["term"].to_numpy(dtype=object)
        h = pd.util.hash_array(terms)
        return pd.DataFrame(
            {"term": terms, "bucket": (h % np.uint64(n_buckets)).astype(np.int32)}
        )

    def df_merge(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["term"].value_counts(sort=False)
        return pd.DataFrame(
            {"term": vc.index.to_numpy(dtype=object), "df": vc.to_numpy(np.int64)}
        )

    dfreq = (
        tf.map_batches(term_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(df_merge, batch_format="pandas")
    )
    scored_ds = joins.attach_column(
        tf, dfreq, probe_col="term", build_key="term", build_val="df", out_col="df"
    )

    def score_and_bucket(df: pd.DataFrame) -> pd.DataFrame:
        idf = np.log((1.0 + n_docs) / (1.0 + df["df"].to_numpy(np.float64))) + 1.0
        out = df[["doc_id", "term"]].copy()
        out["score"] = _round_half_away(df["tf"].to_numpy(np.float64) * idf, 6)
        ids = out["doc_id"].to_numpy(np.int64)
        out["bucket"] = ((ids * np.int64(2654435761)) % np.int64(4294967296)) % 64
        return out

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True], kind="mergesort"
        )
        return df.groupby("doc_id", sort=False).head(k)[["doc_id", "term", "score"]]

    out = (
        scored_ds.map_batches(score_and_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(topk, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.sort_values(["doc_id", "score", "term"], ascending=[True, False, True],
                        kind="mergesort")
        .reset_index(drop=True)
    )


def stratified_sample(
    ds: rd.Dataset,
    *,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float,
) -> rd.Dataset:
    """Deterministic stratified Bernoulli sample as a STREAMING filter: keep
    a row iff its multiplicative hash u(id) = (id·2654435761 mod 2³²)/2³²
    falls under its stratum's rate. Embarrassingly parallel — one vectorized
    map_batches, no shuffle, no driver materialization; at corpus scale the
    output flows straight to write_parquet. (id·K stays < 2⁶³ for any
    id < 3.5e9; corpora beyond that use the same formula in uint64.)"""

    def keep(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        strata = np.asarray(t.column(stratum_col).to_pylist(), dtype=object)
        h = (ids * np.int64(2654435761)) % np.int64(4294967296)
        rate = np.full(len(ids), default_rate, dtype=np.float64)
        for key, r in rates.items():
            rate[strata == key] = r
        return t.filter(pa.array(h < rate * 4294967296.0))

    return ds.map_batches(keep, batch_format="pyarrow")


def q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified Bernoulli sample (en → 0.2, every other
    lang → 0.6). Pure int64 arithmetic reproduced verbatim in the DuckDB
    oracle — no engine-internal hash. The operator itself
    (``stratified_sample``) streams; the collect here is the query-result
    boundary (the sample IS the result the driver hash-checks)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    out = stratified_sample(
        ds, id_col="doc_id", stratum_col="lang", rates={"en": 0.2}, default_rate=0.6
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_partition_edge_cut(sf_dir: str, n_parts: int = 16) -> pd.DataFrame:
    """Partition-quality diagnostic for the default placement strategy:
    hash-partition the lineitem graph's vertices into 16 parts (the
    shuffle_shards fmix64 assignment) and report per-part vertex counts,
    internal/cut edge counts, and the global edge-cut fraction — the number
    a partitioner (or the decision to invest in one) is judged by. Two
    counter-sized passes: a bucketed grouped vertex count and per-batch
    edge partials over the simple undirected edge set; nothing per-vertex
    reaches the driver. Exact integers + one mirrored ROUND(÷, 6)."""
    from pagerank_ray.functions.text import fmix64 as _fmix
    from pagerank_ray.pipelines.triangles import _canonical_undirected
    from pagerank_ray.stages.graph_build import distinct_values

    edges = lineitem_edges(sf_dir)
    und = dedup_pairs(
        edges.map_batches(_canonical_undirected, batch_format="pyarrow").map_batches(
            lambda t: pa.table({"src_id": t.column("a"), "dst_id": t.column("b")}),
            batch_format="pyarrow",
        )
    )

    def part_of(ids: np.ndarray) -> np.ndarray:
        return (_fmix(ids.astype(np.uint64)) % np.uint64(n_parts)).astype(np.int64)

    def edge_partial(t: pa.Table) -> pa.Table:
        pa_ = part_of(t.column("src_id").to_numpy(zero_copy_only=False))
        pb_ = part_of(t.column("dst_id").to_numpy(zero_copy_only=False))
        internal = pa_ == pb_
        # internal edges count toward their part; cut edges toward BOTH
        parts = np.concatenate([pa_[internal], pa_[~internal], pb_[~internal]])
        kinds = np.concatenate(
            [np.zeros(int(internal.sum()), np.int64),
             np.ones(2 * int((~internal).sum()), np.int64)]
        )
        df = pd.DataFrame({"part": parts, "kind": kinds})
        g = df.groupby(["part", "kind"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    ec = (
        und.map_batches(edge_partial, batch_format="pyarrow")
        .groupby(["part", "kind"])
        .sum("c")
        .to_pandas()
    )
    verts = distinct_values(
        edges.map_batches(
            lambda t: pa.table(
                {"id": pa.concat_arrays(
                    [t.column("src_id").combine_chunks().cast(pa.int64()),
                     t.column("dst_id").combine_chunks().cast(pa.int64())]
                )}
            ),
            batch_format="pyarrow",
        ),
        "id",
    )

    def vert_partial(t: pa.Table) -> pa.Table:
        p = part_of(t.column("id").to_numpy(zero_copy_only=False))
        c = np.bincount(p, minlength=n_parts)
        nz = np.flatnonzero(c)
        return pa.table({"part": pa.array(nz.astype(np.int64)),
                         "c": pa.array(c[nz].astype(np.int64))})

    vc = (
        verts.map_batches(vert_partial, batch_format="pyarrow")
        .groupby("part")
        .sum("c")
        .to_pandas()
    )
    n_vert = dict(zip(vc["part"].astype(int), vc["sum(c)"].astype(int)))
    rows = []
    for p in range(n_parts):
        sub = ec[ec["part"] == p]
        internal = int(sub[sub["kind"] == 0]["sum(c)"].sum())
        cut = int(sub[sub["kind"] == 1]["sum(c)"].sum())
        rows.append((p, n_vert.get(p, 0), internal, cut))
    out = pd.DataFrame(rows, columns=["part", "n_vertices", "internal_edges",
                                      "cut_edges"])
    total_edges = int(out["internal_edges"].sum() + out["cut_edges"].sum() // 2)
    total_cut = int(out["cut_edges"].sum() // 2)
    out["cut_fraction"] = _round_half_away(
        np.full(len(out), 0.0 if total_edges == 0 else total_cut / total_edges), 6
    )
    for c in ("part", "n_vertices", "internal_edges", "cut_edges"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("part").reset_index(drop=True)


def q_shuffle_shards(sf_dir: str, n_shards: int = 16) -> pd.DataFrame:
    """Deterministic global shuffle + shard manifest — the data-ordering
    step every training run materializes: shard = fmix64(doc_id) mod
    n_shards, within-shard position = rank by (hash, doc_id). The hash IS
    the shuffle (a fixed bijection ≡ a reproducible permutation — rerunning
    the manifest on the same corpus yields byte-identical training order,
    the property epoch resumption depends on). Ranking runs per shard via
    groupby(shard).map_groups — shards co-locate and rank independently,
    so nothing global ever sorts; at 100 TB each shard's manifest writes
    straight to its own partition."""
    from pagerank_ray.functions.text import fmix64 as _fmix

    ds = _read(sf_dir, "documents", ["doc_id"])

    def hash_batch(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        h = _fmix(ids.astype(np.uint64))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shard": pa.array((h % np.uint64(n_shards)).astype(np.int64)),
                "h": pa.array((h ^ np.uint64(1 << 63)).view(np.int64)),
            }
        )

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df["doc_id"].to_numpy(np.int64),
                            df["h"].to_numpy(np.int64)))
        out = df.iloc[order][["doc_id", "shard"]].copy()
        out["pos"] = np.arange(len(out), dtype=np.int64)
        return out

    out = (
        ds.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(rank, batch_format="pandas")
        .to_pandas()
    )
    for c in ("doc_id", "shard", "pos"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pagerank_top20_profile(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Composition query: the 20 highest-ranked vertices of the 20-iteration
    PageRank joined with their out/in degrees (rank desc, id asc tie-break).
    The degree lookups filter the distributed degree tables by the broadcast
    top-k id set — only k rows ever reach the driver-side merge."""
    pr = q_pagerank_fixed(sf_dir)
    top = pr.sort_values(["rank", "id"], ascending=[False, True]).head(k).copy()
    edges = lineitem_edges(sf_dir).materialize()
    outd = grouped_count(edges, "src_id", "out_deg")
    ind = grouped_count(edges, "dst_id", "in_deg")
    ids = pa.array(top["id"].to_numpy(dtype=np.int64))
    from pagerank_ray.stages import joins

    od = joins._collect_arrow(
        outd.map_batches(
            lambda t: t.filter(pc.is_in(t.column("src_id"), value_set=ids)),
            batch_format="pyarrow",
        )
    ).to_pandas().rename(columns={"src_id": "id"})
    ig = joins._collect_arrow(
        ind.map_batches(
            lambda t: t.filter(pc.is_in(t.column("dst_id"), value_set=ids)),
            batch_format="pyarrow",
        )
    ).to_pandas().rename(columns={"dst_id": "id"})
    out = top.merge(od, on="id", how="left").merge(ig, on="id", how="left")
    out["out_deg"] = out["out_deg"].fillna(0).astype(np.int64)
    out["in_deg"] = out["in_deg"].fillna(0).astype(np.int64)
    return out[["id", "rank", "out_deg", "in_deg"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# training-data ops: near-dup dedup, similarity search, quality, multimodal
# ---------------------------------------------------------------------------

def _minhash_clusters_cached(sf_dir: str) -> rd.Dataset:
    """Disk-cached MinHash-LSH cluster table (doc_id, cluster_id, keep):
    q_minhash_dedup and q_dedup_cluster_sizes share ONE run of the most
    expensive corpus pipeline instead of each paying it (the pipeline is
    deterministic; keyed by the documents-file fingerprint, atomic
    publish — the _compact_ids_cached pattern)."""
    import shutil

    out_dir = _graph_workdir(sf_dir, "minhash_clusters", src_file="documents.parquet")
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        tmp = f"{out_dir}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        try:
            from pagerank_ray.stages.dedup import minhash_lsh_dedup

            docs = _read(sf_dir, "documents", ["doc_id", "text"])
            minhash_lsh_dedup(docs, threshold=0.8, concurrency=4).write_parquet(tmp)
            with open(os.path.join(tmp, "_DONE"), "w") as f:
                f.write("ok")
            try:
                os.rename(tmp, out_dir)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)  # racing builder lost
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
    return rd.read_parquet(out_dir, file_extensions=["parquet"])


def q_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    """MinHash-LSH near-dup clusters over documents — hash-checked against a
    DuckDB oracle reimplementing the ENTIRE pipeline (token hash, shingle
    folds, 128 permutations, band keys, candidate blocking, Jaccard verify,
    connected components) in pure SQL (__ray_entry__._minhash_sql); the
    planted-duplicate pytest oracle additionally gates recall."""
    # dedup returns a Dataset (scale contract); collect only here, at the
    # oracle-check boundary
    out = _minhash_clusters_cached(sf_dir).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup pairs — hash-checked against a DuckDB all-pairs
    oracle (__ray_entry__._simhash_sql; all-pairs ≡ the engine's 4×16-bit
    banding for Hamming ≤ 3 by pigeonhole)."""
    from pagerank_ray.stages.dedup import simhash_near_dups

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_near_dups(docs, max_hamming=3, concurrency=4)


def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    """Language-id + quality scoring over documents — hash-checked against a
    DuckDB oracle computing the identical heuristics (regex punct counts,
    stopword votes, CJK ratio, the composite clip formula)."""
    from pagerank_ray.functions.text import lang_id_batch, quality_score_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = quality_score_batch(lang_id_batch(df))
        out = df[["doc_id", "pred_lang", "quality", "punct_ratio", "stop_ratio"]].copy()
        for c in ("quality", "punct_ratio", "stop_ratio"):
            out[c] = _round_half_away(out[c], 6)
        return out

    return (
        docs.map_batches(score, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Vectorized 64-bit polynomial document fingerprints — hash-checked
    against a DuckDB oracle reimplementing the identical byte power-sum in
    HUGEINT arithmetic (__ray_entry__._fingerprint_sql); determinism and
    batch-vs-scalar equality are additionally pinned in tests/test_text_dedup.py."""
    from pagerank_ray.functions.text import fingerprint64

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "fingerprint": fingerprint64(df["text"])}
        )

    return (
        docs.map_batches(fp, batch_format="pandas")
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
    out["cosine"] = _round_half_away(out["cosine"], 6)
    return out[["query_id", "vec_id", "cosine", "rank"]]


def q_knn_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF top-10 with nprobe = nlist (every bucket probed): exercises the full
    train/assign/bucket-scan machinery and must equal exact brute force — the
    DuckDB brute-force SQL is the oracle. Approximate recall at nprobe < nlist
    is bounded in tests/test_knn_multimodal.py."""
    from pagerank_ray.stages.knn import build_ivf, knn_ivf, train_centroids

    qids, qvecs = _load_queries(sf_dir)
    vectors = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = train_centroids(vectors, 16)
    ivf = build_ivf(vectors, cents).materialize()
    out = knn_ivf(ivf, cents, qvecs, qids, k=10, nprobe=len(cents))
    out["cosine"] = _round_half_away(out["cosine"], 6)
    return out[["query_id", "vec_id", "cosine", "rank"]]


def q_embedding_near_dups(sf_dir: str, threshold: float = 0.35) -> pd.DataFrame:
    """Embedding similarity pairs (cosine ≥ threshold, a < b) via the EXACT
    blocked all-pairs path — hash-checked against a DuckDB cross-join oracle.
    The approximate hyperplane-LSH path is run on the same input and asserted
    (in-engine) to produce a subset of the exact pairs; its recall bound is
    pinned in tests/test_text_dedup.py. The synthetic embeddings table has no
    planted near-dups (max off-diagonal cosine ≈ 0.5–0.6), so the driver
    threshold 0.35 is used to make the checked result non-trivial."""
    from pagerank_ray.stages.dedup import embedding_near_dups, embedding_similarity_pairs

    vectors = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    exact = embedding_similarity_pairs(vectors, threshold=threshold)
    lsh = embedding_near_dups(vectors, threshold=threshold, n_planes=6, concurrency=4)
    exact_keys = set(zip(exact["a"], exact["b"]))
    # in-engine invariant: LSH pairs ⊆ exact pairs — tolerating pairs whose
    # cosine sits within rounding distance of the threshold (the two paths
    # normalize independently, so a boundary pair can flip by 1 ulp; ADVICE
    # r2). The strict recall/subset bound lives in tests/test_text_dedup.py.
    extra = set(zip(lsh["a"], lsh["b"])) - exact_keys
    if extra:
        cos = {(a, b): c for a, b, c in zip(lsh["a"], lsh["b"], lsh["cosine"])}
        bad = [p for p in extra if abs(cos[p] - threshold) > 1e-6]
        if bad:
            raise AssertionError(
                f"LSH near-dup pairs not a subset of exact pairs: {sorted(bad)[:5]}"
            )
    return exact


def q_embed_documents(sf_dir: str) -> rd.Dataset:
    """Embedding-INFERENCE stage (model-in-__init__ actor pool): documents →
    32-dim feature-hashing embeddings (stages/embed.py), exploded to
    (doc_id, dim, value) rows for the driver's value-hash compare. The
    projection is deterministic (the SQL-reproducible token hash), so the
    oracle recomputes identical vectors in DuckDB."""
    from pagerank_ray.stages.embed import embed_documents

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    emb = embed_documents(docs)

    def explode(t: pa.Table) -> pa.Table:
        col = t.column("embedding").combine_chunks()
        dim = col.type.list_size
        vals = col.flatten()
        n = t.num_rows
        return pa.table(
            {
                "doc_id": pa.array(
                    np.repeat(t.column("doc_id").to_numpy(zero_copy_only=False), dim)
                ),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int64), n)),
                "value": vals,
            }
        )

    return emb.map_batches(explode, batch_format="pyarrow")


def q_embedding_pca(
    sf_dir: str, iters: int = 6, scale: int = 10**4, target: int = 10**6
) -> pd.DataFrame:
    """Top principal component of the embeddings table by FIXED-POINT
    distributed power iteration — the tall-skinny linear-algebra primitive
    (corpus whitening / PCA drift checks) expressed so the oracle is
    bit-reproducible: values quantize to integers (round-half-away of
    value·scale), every matvec is an exact integer sum (order-free, so the
    distributed batch split cannot change it), and each iterate renormalizes
    by the integer division v ← sign(w)·(|w| // dv) with
    dv = max(1, max|w| // target) — no float enters until the final cosmetic
    unit-norm column, computed identically on both engines.

    One pass computes the per-dim quantized column sums S and n; each of the
    ``iters`` passes streams the table once, fusing p = Q·v and the partial
    a_b = Q_bᵀ·p_b per batch so only O(#batches × dim) integer rows reach the
    driver, which combines them as arbitrary-precision Python ints (the
    centered matvec w = n·a − S·(S·v) overflows int64 by design; per-batch
    partials stay int64-exact because |q| ≤ scale and batch_size ≤ 1024 — see
    the bound in the batch kernel). The iterate v (dim ints ≤ 2·target) is a
    closure broadcast, not a shuffle. At 10⁹ rows this is ``iters`` streaming
    scans + tiny driver reduces — the standard distributed power method."""
    ds = _read(sf_dir, "embeddings", ["embedding"])

    def quantize(t: pa.Table) -> np.ndarray:
        col = t.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.num_rows
        dim = len(flat) // max(n, 1)
        if n and len(flat) != n * dim:
            raise ValueError("ragged embedding lists")
        y = flat.reshape(n, dim) * float(scale)
        return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)

    def sums_partial(t: pa.Table) -> pa.Table:
        q = quantize(t)
        return pa.table(
            {
                "j": pa.array(np.arange(q.shape[1], dtype=np.int64)),
                "s": pa.array(q.sum(axis=0, dtype=np.int64)),
                "cnt": pa.array(
                    np.full(q.shape[1], q.shape[0], dtype=np.int64)
                ),
            }
        )

    base = ds.materialize()
    parts = base.map_batches(
        sums_partial, batch_format="pyarrow", batch_size=1024
    ).to_pandas()
    gs = parts.groupby("j")
    S = [int(x) for x in gs["s"].sum().sort_index()]
    n_rows = int(gs["cnt"].sum().iloc[0]) if len(parts) else 0
    dim = len(S)
    if n_rows == 0 or dim == 0:
        return pd.DataFrame(
            {"dim": pd.array([], dtype=np.int64),
             "v_fixed": pd.array([], dtype=np.int64),
             "component": pd.array([], dtype=np.float64)}
        )

    v = [1] * dim
    for _ in range(iters):
        varr = np.asarray(v, dtype=np.int64)  # |v| ≤ 2·target < 2^63

        def matvec_partial(t: pa.Table, varr=varr) -> pa.Table:
            # int64 bound: |q| ≤ scale·0.6, |p| ≤ dim·scale·2·target ≈ 7e11,
            # |q·p| ≤ 4e15, batch Σ ≤ 1024·4e15 ≈ 4e18 < 2^63.
            q = quantize(t)
            p = q @ varr
            return pa.table(
                {
                    "j": pa.array(np.arange(q.shape[1], dtype=np.int64)),
                    "a": pa.array(q.T @ p),
                }
            )

        ap = base.map_batches(
            matvec_partial, batch_format="pyarrow", batch_size=1024
        ).to_pandas()
        a = [int(x) for x in ap.groupby("j")["a"].sum().sort_index()]
        sv = sum(S[j] * v[j] for j in range(dim))
        w = [n_rows * a[j] - S[j] * sv for j in range(dim)]
        dv = max(1, max(abs(x) for x in w) // target)
        v = [(-((-x) // dv) if x < 0 else x // dv) for x in w]

    jm = max(range(dim), key=lambda j: (abs(v[j]), -j))
    if v[jm] < 0:
        v = [-x for x in v]
    norm = float(sum(x * x for x in v)) ** 0.5
    comp = (
        np.zeros(dim)
        if norm == 0.0
        else _round_half_away(np.asarray([float(x) for x in v]) / norm, 6)
    )
    return pd.DataFrame(
        {
            "dim": pd.array(np.arange(dim), dtype=np.int64),
            "v_fixed": pd.array([int(x) for x in v], dtype=np.int64),
            "component": comp,
        }
    )


def q_knn_ivf_embedded(sf_dir: str) -> pd.DataFrame:
    """End-to-end GPU-pipeline shape: the embedding-inference stage FEEDS the
    IVF index — embed documents, train centroids on the inferred vectors,
    bucket, probe every bucket (nprobe = nlist ⇒ exact, so the DuckDB
    brute-force-over-recomputed-embeddings SQL is the oracle)."""
    from pagerank_ray.stages.embed import embed_documents
    from pagerank_ray.stages.knn import build_ivf, knn_ivf, train_centroids

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    emb = (
        embed_documents(docs)
        .map_batches(
            lambda t: pa.table(
                {"vec_id": t.column("doc_id"), "embedding": t.column("embedding")}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    qdf = (
        emb.map_batches(
            lambda t: t.filter(pc.less(t.column("vec_id"), 5)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    qids = qdf["vec_id"].to_numpy()
    qvecs = np.stack([np.asarray(v, np.float64) for v in qdf["embedding"]])
    cents = train_centroids(emb, 8)
    ivf = build_ivf(emb, cents).materialize()
    out = knn_ivf(ivf, cents, qvecs, qids, k=10, nprobe=len(cents))
    out["cosine"] = _round_half_away(out["cosine"], 6)
    return out[["query_id", "vec_id", "cosine", "rank"]]


def q_multimodal_features(sf_dir: str) -> pd.DataFrame:
    """Image features over a deterministic synthetic media table with REAL
    payloads: PPM/BMP/PNG/GIF/QOI and baseline+progressive JPEG all decode
    with the pure-numpy codecs (resize + block-mean embedding); PPM-stream
    video and WAV audio likewise parse for real. Only arithmetic-coded JPEG,
    non-PPM video and non-WAV audio are env-stubbed — those libraries are
    not in this container (stages/multimodal.py, stages/jpeg.py)."""
    import ray.data as rd2

    from pagerank_ray.stages.multimodal import image_features, synth_media

    media = rd2.from_arrow(synth_media(200))
    out = image_features(media, embed_dim=32, concurrency=4).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    # explode to one scalar row per (media_id, dim): robust for the driver's
    # stringified value-hash (a list-typed column round-trips differently
    # through parquet/duckdb than through pandas objects)
    n, d = len(out), 32
    emb = np.stack([np.asarray(v, np.float64) for v in out["embedding"]])
    return pd.DataFrame(
        {
            "media_id": np.repeat(out["media_id"].to_numpy(), d),
            "dim": np.tile(np.arange(d, dtype=np.int64), n),
            "value": _round_half_away(emb.ravel(), 6),
            "decoded_w": np.repeat(out["decoded_w"].to_numpy(), d),
            "decoded_h": np.repeat(out["decoded_h"].to_numpy(), d),
        }
    )


# ---------------------------------------------------------------------------
# corpus-filter heuristics (Gopher rules, repetition ratios, entropy) — r4
# ---------------------------------------------------------------------------

def q_gopher_quality(sf_dir: str) -> pd.DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1 adapted to
    this corpus): word count bounds, mean-word-length band tested as the
    EXACT integer inequality (no float boundary), stopword floor. One
    vectorized pass (functions.text.gopher_stats_batch); hash-checked
    against a DuckDB oracle computing the identical integers."""
    from pagerank_ray.functions.text import gopher_stats_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        out = gopher_stats_batch(df["text"])
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
        out["mean_word_len"] = _round_half_away(out["mean_word_len"], 6)
        return out

    return (
        docs.map_batches(stats, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_repetition_stats(sf_dir: str) -> pd.DataFrame:
    """Gopher repetition ratios per document: duplicate-word fraction, top
    word fraction, top adjacent-bigram fraction — exact integer ratios
    rounded half-away to 6, hash-checked against a DuckDB unnest+window
    oracle with identical tie-free max-count semantics."""
    from pagerank_ray.functions.text import repetition_stats_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        out = repetition_stats_batch(df["text"])
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
        for c in ("dup_word_frac", "top_word_frac", "top_bigram_frac"):
            out[c] = _round_half_away(out[c], 6)
        return out

    return (
        docs.map_batches(stats, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_doc_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document unigram Shannon entropy (bits), H = log2(n) - Σc·log2(c)/n
    with that exact parenthesization mirrored in the DuckDB oracle."""
    from pagerank_ray.functions.text import entropy_batch

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def ent(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "entropy": _round_half_away(entropy_batch(df["text"]), 6),
            }
        )

    return (
        docs.map_batches(ent, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_cms_heavy_hitters(sf_dir: str, width: int = 512, k: int = 25) -> pd.DataFrame:
    """Count-Min-sketch heavy hitters (Cormode & Muthukrishnan 2005) — the
    frequency companion of the HLL/Bloom sketch family: a 2×``width`` CMS is
    built over every lineitem part key (per-batch bincount pre-aggregation,
    counter rows — never keys — shuffle), then the exact per-key counts (an
    ordinary grouped count) are annotated with their CMS point estimate from
    the broadcast counters and the top ``k`` by (estimate DESC, key) are
    reported WITH the exact count — the sketch's deterministic overestimate
    is part of the hash-checked output (__ray_entry__._cms_sql)."""
    from pagerank_ray.stages.graph_build import grouped_count
    from pagerank_ray.stages.sketch import cms_build, cms_estimate

    li = _read(sf_dir, "lineitem", ["l_partkey"])
    counters = cms_build(li, "l_partkey", width=width)

    counts = grouped_count(li, "l_partkey", "true_count")

    import ray

    ctr_ref = ray.put(counters)

    def annotate(t: pa.Table) -> pa.Table:
        ctr = ray.get(ctr_ref)
        keys = t.column("l_partkey").to_numpy(zero_copy_only=False)
        return t.append_column("cms_est", pa.array(cms_estimate(keys, ctr)))

    top = (
        counts.map_batches(annotate, batch_format="pyarrow")
        .sort(["cms_est", "l_partkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return top[["l_partkey", "cms_est", "true_count"]].reset_index(drop=True)


def q_salsa(sf_dir: str, n_workers: int = 4, iters: int = 5) -> pd.DataFrame:
    """SALSA (Lempel & Moran, WWW 2000) — the stochastic cousin of HITS: the
    alternating neighbor sums use DEGREE-NORMALIZED contributions,
    a(v) = Σ_{u→v} h(u)/out(u) and h(u) = Σ_{u→v} a(v)/in(v), i.e. the HITS
    recurrence over row-stochastic matrices both ways. Runs on the identical
    dual-CSR MODE_SUM machinery as q_hits, but both CSRs are built WEIGHTED
    with unit weights row-normalized at build (csr.build_shard_table stores
    exactly 1.0/out_deg per edge — one division, mirrored term-for-term by
    the oracle's ``x * (1.0/od)``). L1-scaled to Σ = n each half-step like
    HITS; hash-checked against the unrolled DuckDB oracle
    (__ray_entry__._salsa_sql)."""
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
    from pagerank_ray.pipelines.hits import hits
    from pagerank_ray.stages import joins

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    dense_edges = dense_edges.materialize()  # feeds both weighted CSR builds

    def unit_w(t: pa.Table) -> pa.Table:
        return t.append_column(
            "weight", pa.array(np.ones(t.num_rows, dtype=np.float64))
        )

    def swap_w(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_id": t.column("dst_id"),
                "dst_id": t.column("src_id"),
                "weight": pa.array(np.ones(t.num_rows, dtype=np.float64)),
            }
        )

    csr_fwd = os.path.join(_graph_workdir(sf_dir, "salsafwd"), "csr")
    csr_rev = os.path.join(_graph_workdir(sf_dir, "salsarev"), "csr")
    prepare_csr_from_edges(
        dense_edges.map_batches(unit_w, batch_format="pyarrow"),
        n, csr_fwd, n_parts=4 * n_workers,
    )
    prepare_csr_from_edges(
        dense_edges.map_batches(swap_w, batch_format="pyarrow"),
        n, csr_rev, n_parts=4 * n_workers,
    )
    res = hits(csr_fwd, csr_rev, n_workers=n_workers, iters=iters)

    def name_auth(t: pa.Table) -> pa.Table:
        return pa.table({"id": t.column("id"), "auth": t.column("value")})

    merged = joins.attach_column(
        res.authorities.map_batches(name_auth, batch_format="pyarrow"),
        res.hubs,
        probe_col="id",
        build_key="id",
        build_val="value",
        out_col="hub",
        build_count=n,
    )
    df = _attach_orig(merged, id_map, n, ["id"])
    df = df.sort_values("id").reset_index(drop=True)
    df["auth"] = _round_half_away(df["auth"], 6)
    df["hub"] = _round_half_away(df["hub"], 6)
    return df[["id", "auth", "hub"]]


def q_katz(
    sf_dir: str,
    n_workers: int = 4,
    iters: int = 8,
    alpha: float = 0.05,
    beta: float = 1.0,
) -> pd.DataFrame:
    """Katz centrality (Katz 1953) over the SYMMETRIZED lineitem graph:
    x⁰ = 1; x'(v) = β + α·Σ_{u~v} x(u), fixed ``iters`` rounds. The
    symmetrized graph (same shared cached CSR as q_graph_eccentricity)
    makes the recurrence non-trivial — on the raw bipartite order→part
    edges the order side would pin at β after one round. One MODE_SUM
    superstep + one O(n/W) in-place affine fold per iteration
    (pipelines/katz.py); hash-checked against the unrolled DuckDB oracle
    (__ray_entry__._katz_sql) computing the identical recurrence with the
    identical α·Σ + β fold order."""
    from pagerank_ray.pipelines.katz import katz

    csr, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=True)
    res = katz(csr, n_workers=n_workers, iters=iters, alpha=alpha, beta=beta)
    df = _attach_orig(res.result, id_map, n, ["id"])
    df = df.sort_values("id").reset_index(drop=True)
    df["katz"] = _round_half_away(df["value"].to_numpy(), 6)
    return df[["id", "katz"]]


def q_graph_eccentricity(
    sf_dir: str, n_workers: int = 4, mod: int = 577, n_seeds: int = 4, unroll: int = 16
) -> pd.DataFrame:
    """Per-seed eccentricity / effective-diameter probe (the standard
    multi-BFS diameter estimate, Palmer et al. KDD'02 family): for each of
    the ``n_seeds`` smallest vertices with id % mod == 0, one single-source
    MODE_DIST BFS over the symmetrized lineitem graph reports

      ecc        max finite distance from the seed
      n_reached  vertices at finite distance (incl. the seed)
      p90_dist   min d with cumulative reached >= CEIL(0.9 * n_reached)
                 (CEIL over the double product on both engines)

    Only the per-level distance HISTOGRAM leaves the cluster (≤ ecc rows per
    seed — never the distance vector); hash-checked against a fixed-unroll
    multi-seed min-plus DuckDB oracle (__ray_entry__._ecc_sql)."""
    from pagerank_ray.pipelines.cc import bfs_levels_multi
    from pagerank_ray.stages.graph_build import grouped_count

    csr, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=True)
    im = id_map.to_pandas()
    cand = np.sort(im.loc[im["orig"] % mod == 0, "orig"].to_numpy(np.int64))[:n_seeds]
    dense = [
        [int(im.loc[im["orig"] == so, "dense"].iloc[0])] for so in cand
    ]
    inf = np.int64(1) << 62
    results = bfs_levels_multi(csr, dense, n_workers=n_workers)
    rows = []
    for so, res in zip(cand, results):
        if not res.converged:
            raise RuntimeError("eccentricity BFS did not converge")
        if res.iterations - 1 > unroll:
            raise RuntimeError(
                f"BFS depth {res.iterations - 1} exceeds the {unroll}-round oracle unroll"
            )
        hist = grouped_count(res.result, "dist", "cnt").to_pandas()
        hist = hist[hist["dist"] < inf].sort_values("dist")
        n_reached = int(hist["cnt"].sum())
        ecc = int(hist["dist"].max())
        need = np.ceil(0.9 * float(n_reached))
        p90 = int(hist.loc[hist["cnt"].cumsum() >= need, "dist"].iloc[0])
        # closeness = (n_reached - 1) / Σ dist: both factors exact integers,
        # one double division on both engines — no rounding dependence
        sum_dist = int((hist["dist"] * hist["cnt"]).sum())
        closeness = (n_reached - 1) / sum_dist if sum_dist else 0.0
        # harmonic centrality Σ_{d>0} cnt_d / d as an EXACT rational: with
        # ecc ≤ 16 (enforced by the unroll guard) the common denominator
        # LCM(1..16) = 720720 makes the numerator an exact integer on both
        # engines — one division, no float-sum-order dependence
        hd = hist[hist["dist"] > 0]
        hnum = int((hd["cnt"] * (720720 // hd["dist"])).sum())
        harmonic = hnum / 720720.0
        rows.append((int(so), ecc, n_reached, p90, sum_dist, closeness, harmonic))
    out = pd.DataFrame(
        rows,
        columns=["seed", "ecc", "n_reached", "p90_dist", "sum_dist",
                 "closeness", "harmonic"],
    )
    for c in ("seed", "ecc", "n_reached", "p90_dist", "sum_dist"):
        out[c] = out[c].astype(np.int64)
    out["harmonic"] = _round_half_away(out["harmonic"].to_numpy(), 6)
    out["closeness"] = _round_half_away(out["closeness"].to_numpy(), 6)
    return out


def partflow_edges(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """Directed CYCLIC graph over parts: an edge a→b for every order whose
    line item with linenumber i+1 for part b directly follows the line item
    with linenumber i for part a. Co-partitioned by order bucket (one
    shuffle), pairs formed with a per-bucket self-MERGE on (orderkey,
    linenumber i ↔ i+1) — a cross product per matched key, because
    linenumbers are NOT unique within an order, so a sort+shift would pair
    arbitrary same-linenumber rows — then the standard bucketed pair dedup —
    the same shape as the
    warc-page→edges build, but producing cycles (parts recur across orders
    in different positions), which is what SCC needs."""
    from pagerank_ray.stages.graph_build import dedup_pairs

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey"])

    def bucketize(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return t.append_column("b", pa.array((ok % n_buckets).astype(np.int64)))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # linenumbers are NOT unique per order in this corpus: the pair rule
        # is the full cross product per consecutive linenumber pair (the SQL
        # self-join semantics), via one C-level self-merge per bucket
        a = df[["l_orderkey", "l_linenumber", "l_partkey"]].rename(
            columns={"l_partkey": "src_id"}
        )
        b = df[["l_orderkey", "l_linenumber", "l_partkey"]].copy()
        b["l_linenumber"] = b["l_linenumber"] - 1
        b = b.rename(columns={"l_partkey": "dst_id"})
        out = a.merge(b, on=["l_orderkey", "l_linenumber"])
        return out[["src_id", "dst_id"]]

    raw = (
        li.map_batches(bucketize, batch_format="pyarrow")
        .groupby("b")
        .map_groups(pairs, batch_format="pandas")
    )
    return dedup_pairs(raw)


def bowtie_edges(sf_dir: str, n_buckets: int = 64) -> rd.Dataset:
    """Directed part-flow variant with genuine bow-tie macro-structure: the
    raw part-flow graph is one giant SCC (everything CORE — a degenerate
    decomposition), so edges are kept only when the source line item has
    l_quantity ≤ 25 AND src_part % 3 ≤ dst_part % 3 — the mod-3 ordering
    makes most flow one-way (mod-class 0 → 1 → 2, DAG-like) while the ≤
    keeps within-class cycles (a real core), and the quantity thinning
    disconnects tendrils. All four Broder classes are populated at every
    test scale. Same co-partitioned self-merge + pair-dedup shape as
    partflow_edges."""
    from pagerank_ray.stages.graph_build import dedup_pairs

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_partkey",
                                    "l_quantity"])

    def bucketize(t: pa.Table) -> pa.Table:
        ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        return t.append_column("b", pa.array((ok % n_buckets).astype(np.int64)))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        a = df[["l_orderkey", "l_linenumber", "l_partkey", "l_quantity"]].rename(
            columns={"l_partkey": "src_id"}
        )
        b = df[["l_orderkey", "l_linenumber", "l_partkey"]].copy()
        b["l_linenumber"] = b["l_linenumber"] - 1
        b = b.rename(columns={"l_partkey": "dst_id"})
        out = a.merge(b, on=["l_orderkey", "l_linenumber"])
        keep = (out["l_quantity"].to_numpy() <= 25) & (
            out["src_id"].to_numpy() % 3 <= out["dst_id"].to_numpy() % 3
        )
        return out.loc[keep, ["src_id", "dst_id"]]

    raw = (
        li.map_batches(bucketize, batch_format="pyarrow")
        .groupby("b")
        .map_groups(pairs, batch_format="pandas")
    )
    return dedup_pairs(raw)


def q_scc(sf_dir: str, n_workers: int = 4) -> pd.DataFrame:
    """Strongly connected components (pipelines/scc.py — distributed FW-BW
    coloring, no new superstep mode) over the cyclic part-flow graph;
    scc = min original member id. Hash-checked against a DuckDB
    reachability-closure oracle (recursive CTE) on the same edges."""
    from pagerank_ray.pipelines.scc import strongly_connected_components

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "pf", lambda: partflow_edges(sf_dir)
    )
    # FRESH work dir per invocation: the round checkpoints are a resume
    # feature for long jobs, NOT a cross-run result cache — a persistent dir
    # would replay recorded labels after code changes and make warm-cache
    # benchmarks time the replay path (r4 review finding)
    work = tempfile.mkdtemp(prefix="sccq_")
    res = strongly_connected_components(
        dense_edges.materialize(), n, work, n_workers=n_workers
    )
    df = _attach_orig(res.result, id_map, n, ["id", "scc"])
    return df[["id", "scc"]].sort_values("id").reset_index(drop=True)


def q_condensation_layers(sf_dir: str, n_workers: int = 4) -> pd.DataFrame:
    """Kahn topological layers of the SCC condensation DAG (Kahn, CACM
    1962 — the dependency-scheduling primitive; the condensation of any
    directed graph is acyclic, so layers always exist): layer(c) = the
    round in which component c's remaining in-degree reaches 0, which
    equals the longest path from any source component. Output: one row per
    layer with n_components and n_vertices (sum of member counts) —
    the DAG's depth profile, ordered by layer.

    Composition, no new kernels: distributed FW-BW SCC over the thinned
    part-flow graph (``bowtie_edges`` — the raw part-flow graph is one
    giant SCC whose condensation is a single layer-0 point; the thinned
    variant has a real multi-layer DAG at every test scale, the same
    reasoning as q_bowtie) → one broadcast of the n-slot label
    array (`ray.put` once, per-worker cached via joins.broadcast_get) maps
    edge endpoints to components → `dedup_pairs` builds the distinct
    condensation edge set distributed → the Kahn peel itself runs on the
    condensation ONLY, which is bounded by the component count, not V or E
    (same bounded-remnant contract as the minhash union-find: the heavy
    passes — SCC, the endpoint rewrite, the pair dedup — are distributed;
    the peel input is the already-contracted DAG). Vectorized rounds:
    np.add.at in-degree decrements, one round per layer. Hash-checked
    against a DuckDB oracle that derives labels via the SAME reachability
    closure the SCC oracle uses and layers via a recursive longest-path
    CTE (__ray_entry__._condensation_layers_sql)."""
    import ray

    from pagerank_ray.pipelines.scc import strongly_connected_components
    from pagerank_ray.stages import joins

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "bt", lambda: bowtie_edges(sf_dir)
    )
    work = tempfile.mkdtemp(prefix="condq_")
    res = strongly_connected_components(
        dense_edges.materialize(), n, work, n_workers=n_workers
    )
    # n-row label frame on the driver: the _attach_orig bounded contract
    lab_df = res.result.to_pandas()
    lab = np.full(n, -1, dtype=np.int64)
    lab[lab_df["id"].to_numpy(np.int64)] = lab_df["scc"].to_numpy(np.int64)
    lab_ref = ray.put(lab)

    def to_comp_edges(t: pa.Table) -> pa.Table:
        la = joins.broadcast_get(lab_ref, lambda a: a, "cond_labels")
        cs = la[t.column("src_id").to_numpy(zero_copy_only=False)]
        cd = la[t.column("dst_id").to_numpy(zero_copy_only=False)]
        keep = cs != cd
        return pa.table(
            {"src_id": pa.array(cs[keep]), "dst_id": pa.array(cd[keep])}
        )

    ce = dedup_pairs(
        dense_edges.map_batches(to_comp_edges, batch_format="pyarrow")
    ).to_pandas()  # bounded by the condensation size (≤ #components²-sparse)
    if ce.empty:  # a single giant SCC condenses to one edge-free point
        ce = pd.DataFrame({"src_id": pd.Series(dtype=np.int64),
                           "dst_id": pd.Series(dtype=np.int64)})

    sizes = lab_df.groupby("scc", sort=False).size()
    comps = sizes.index.to_numpy(np.int64)
    nv = sizes.to_numpy(np.int64)
    # dense comp remap for the peel
    order = np.argsort(comps)
    comps, nv = comps[order], nv[order]
    s = np.searchsorted(comps, ce["src_id"].to_numpy(np.int64))
    d = np.searchsorted(comps, ce["dst_id"].to_numpy(np.int64))
    m = len(comps)
    indeg = np.bincount(d, minlength=m)
    layer = np.full(m, -1, dtype=np.int64)
    frontier = indeg == 0
    rnd = 0
    # CSR over condensation edges so each round touches only the frontier's
    # out-edges (total work across all rounds = O(|ce|), not rounds·|ce|)
    eo = np.argsort(s, kind="stable")
    s_sorted, d_sorted = s[eo], d[eo]
    offs = np.searchsorted(s_sorted, np.arange(m + 1))
    while frontier.any():
        layer[frontier] = rnd
        fidx = np.flatnonzero(frontier)
        starts, ends = offs[fidx], offs[fidx + 1]
        # gather the frontier's out-neighbor slices (vectorized ragged take)
        lens = ends - starts
        total = int(lens.sum())
        if total:
            base = np.repeat(starts, lens)
            within = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
            take = d_sorted[base + within]
            indeg = indeg - np.bincount(take, minlength=m)
        else:
            indeg = indeg.copy()
        indeg[fidx] = -1  # peeled — never re-enters the frontier
        frontier = indeg == 0
        rnd += 1
    if (layer < 0).any():
        raise RuntimeError("condensation peel left unpeeled components "
                           "(cycle in the condensation — SCC labels broken)")
    out = (
        pd.DataFrame({"layer": layer, "nv": nv})
        .groupby("layer", sort=True)
        .agg(n_components=("nv", "size"), n_vertices=("nv", "sum"))
        .reset_index()
    )
    out["layer"] = out["layer"].astype(np.int64)
    out["n_components"] = out["n_components"].astype(np.int64)
    out["n_vertices"] = out["n_vertices"].astype(np.int64)
    return out[["layer", "n_components", "n_vertices"]]


def q_bowtie(sf_dir: str, n_workers: int = 4) -> pd.DataFrame:
    """Bow-tie decomposition of a directed web-style graph (Broder et al.,
    WWW 2000 — THE Common-Crawl macro-structure analysis): vertices classed
    against the giant SCC as CORE=0 (the largest SCC, ties → smallest
    min-member label), IN=1 (reaches the core), OUT=2 (reached from the
    core), OTHER=3 (tendrils/tubes/disconnected). Runs over the thinned
    part-flow graph (``bowtie_edges`` — the raw part-flow graph is one
    giant SCC, a degenerate all-CORE decomposition; the thinned variant
    populates all four classes at every test scale).

    Composition, no new kernels: distributed FW-BW SCC (pipelines/scc.py) →
    one multi-source MODE_DIST BFS from the core over the forward CSR (OUT)
    and one over the reversed CSR (IN). Driver holds only n-row per-vertex
    frames (the _attach_orig bounded contract; the scale path replaces the
    driver argmax with a grouped count + limit). Hash-checked against a
    DuckDB oracle that classifies via the SAME recursive reachability
    closure the SCC oracle builds (__ray_entry__._bowtie_sql)."""
    from pagerank_ray.pipelines.cc import bfs_levels
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
    from pagerank_ray.pipelines.scc import strongly_connected_components

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "bt", lambda: bowtie_edges(sf_dir)
    )
    dense_edges = dense_edges.materialize()
    work = tempfile.mkdtemp(prefix="bowtieq_")
    res = strongly_connected_components(
        dense_edges, n, work, n_workers=n_workers
    )
    scc = res.result.to_pandas().sort_values("id").reset_index(drop=True)
    sizes = scc.groupby("scc").size().sort_index()
    core_label = int(sizes.idxmax())  # sorted index → ties pick min label
    core_ids = scc.loc[scc["scc"] == core_label, "id"].to_numpy(np.int64)

    csr_fwd = os.path.join(_graph_workdir(sf_dir, "btfwd"), "csr")
    csr_rev = os.path.join(_graph_workdir(sf_dir, "btrev"), "csr")
    prepare_csr_from_edges(dense_edges, n, csr_fwd, n_parts=4 * n_workers)

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src_id": t.column("dst_id"), "dst_id": t.column("src_id")})

    prepare_csr_from_edges(
        dense_edges.map_batches(swap, batch_format="pyarrow"),
        n, csr_rev, n_parts=4 * n_workers,
    )
    inf = np.int64(1) << 62
    out_d = (
        bfs_levels(csr_fwd, core_ids, n_workers=n_workers)
        .result.to_pandas().sort_values("id")["dist"].to_numpy(np.int64)
    )
    in_d = (
        bfs_levels(csr_rev, core_ids, n_workers=n_workers)
        .result.to_pandas().sort_values("id")["dist"].to_numpy(np.int64)
    )
    is_core = (scc["scc"] == core_label).to_numpy()
    cls = np.where(is_core, 0, np.where(in_d < inf, 1, np.where(out_d < inf, 2, 3)))
    im = id_map.to_pandas().sort_values("dense")
    out = pd.DataFrame(
        {"id": im["orig"].to_numpy(np.int64), "cls": cls.astype(np.int64)}
    )
    return out.sort_values("id").reset_index(drop=True)


def q_random_walks(
    sf_dir: str, n_workers: int = 4, mod: int = 499, length: int = 8
) -> pd.DataFrame:
    """Deterministic random-walk corpus sampling (DeepWalk, Perozzi KDD'14)
    over the symmetrized lineitem graph: one walker per seed
    {id % mod == 0}, ``length`` steps, step t moving to the fmix64-chosen
    rank of the dst-sorted adjacency (pipelines/walks.py — resident
    shard-actor adjacency, O(n_walks) driver traffic per step). Returns
    (walk_id, step, vertex) on original ids, hash-checked against an
    unrolled DuckDB oracle making the identical hash choices
    (__ray_entry__._walks_sql)."""
    from pagerank_ray.pipelines.walks import random_walks

    csr, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=True)
    im = id_map.to_pandas()
    sel = im.loc[im["orig"] % mod == 0].sort_values("orig")
    dense = sel["dense"].to_numpy(np.int64)
    orig = sel["orig"].to_numpy(np.int64)
    traj = random_walks(csr, dense, orig, length=length, n_workers=n_workers)
    orig_of = np.empty(n, np.int64)
    orig_of[im["dense"].to_numpy(np.int64)] = im["orig"].to_numpy(np.int64)
    n_walks = len(orig)
    return pd.DataFrame(
        {
            "walk_id": np.repeat(orig, length + 1),
            "step": np.tile(np.arange(length + 1, dtype=np.int64), n_walks),
            "vertex": orig_of[traj].reshape(-1),
        }
    )


def _adj_both_dirs(t: pa.Table) -> pa.Table:
    """Canonical (src_id, dst_id) pairs → adjacency rows (v, x) in both
    directions (shared by the center-bucketed wedge kernels)."""
    a = t.column("src_id").combine_chunks().cast(pa.int64())
    b = t.column("dst_id").combine_chunks().cast(pa.int64())
    return pa.table({"v": pa.concat_arrays([a, b]), "x": pa.concat_arrays([b, a])})


def _bucket_by_v(t: pa.Table, n_buckets: int) -> pa.Table:
    v = t.column("v").to_numpy(zero_copy_only=False)
    mixed = (v * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
    return t.append_column("bucket", pa.array(mixed % n_buckets, pa.int32()))


def _undirected_simple(dense_edges: rd.Dataset) -> rd.Dataset:
    """Canonical (min,max) distinct pairs, self-loops dropped — the
    undirected simple graph the triangle/clustering/assortativity metrics
    are defined on (same semantics as pipelines/triangles.py)."""
    from pagerank_ray.stages.graph_build import dedup_pairs

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        keep = s != d
        return pa.table(
            {
                "src_id": pa.array(np.minimum(s, d)[keep]),
                "dst_id": pa.array(np.maximum(s, d)[keep]),
            }
        )

    return dedup_pairs(dense_edges.map_batches(canon, batch_format="pyarrow"))


def q_clustering_coeff(sf_dir: str) -> pd.DataFrame:
    """Local clustering coefficient c(v) = 2·tri(v) / (deg(v)·(deg(v)−1))
    on the undirected simple lineitem graph (Watts-Strogatz) — composes the
    existing oriented-wedge triangle counts with a bucketed degree count;
    0 for deg < 2. Hash-checked against the triangle oracle extended with
    the identical ratio."""
    from pagerank_ray.pipelines.triangles import triangle_counts
    from pagerank_ray.stages import joins

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    dense_edges = dense_edges.materialize()
    # reuse the degree table the triangle orientation already computed — a
    # second canonical-dedup shuffle + degree count would double the two most
    # expensive stages of this query (r4 review finding)
    tri, degs = triangle_counts(dense_edges, n, return_degrees=True)
    merged = joins.attach_with_default(
        tri, degs, probe_col="id", build_key="v", build_val="deg",
        out_col="deg", default=0, build_count=n,
    )
    df = _attach_orig(merged, id_map, n, ["id"]).sort_values("id").reset_index(drop=True)
    d = df["deg"].to_numpy(np.float64)
    t = df["tri_count"].to_numpy(np.float64)
    cc = np.zeros(len(df))
    m = d >= 2
    cc[m] = (2.0 * t[m]) / (d[m] * (d[m] - 1.0))
    df["clustering"] = _round_half_away(cc, 6)
    df["deg"] = df["deg"].astype(np.int64)
    return df[["id", "deg", "tri_count", "clustering"]]


def q_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity (Newman 2002): Pearson correlation of
    (deg(u), deg(v)) over both orientations of every undirected simple edge.
    All moments are exact integer sums (< 2^53, so distributed summation
    order cannot change them); the one float expression mirrors the
    qty_price_corr parenthesization on both engines."""
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import grouped_count
    from ray.data.aggregate import Sum

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    und = _undirected_simple(dense_edges).materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.concat_arrays(
                    [
                        t.column("src_id").combine_chunks().cast(pa.int64()),
                        t.column("dst_id").combine_chunks().cast(pa.int64()),
                    ]
                )
            }
        )

    degs = grouped_count(und.map_batches(endpoints, batch_format="pyarrow"), "id", "deg")

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src_id").combine_chunks().cast(pa.int64())
        d = t.column("dst_id").combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "s": pa.concat_arrays([s, d]),
                "d": pa.concat_arrays([d, s]),
            }
        )

    es = und.map_batches(both_dirs, batch_format="pyarrow")
    es = joins.attach_column(es, degs, probe_col="s", build_key="id",
                             build_val="deg", out_col="dx", build_count=n)
    es = joins.attach_column(es, degs, probe_col="d", build_key="id",
                             build_val="deg", out_col="dy", build_count=n)

    def moments(t: pa.Table) -> pa.Table:
        x = t.column("dx").to_numpy(zero_copy_only=False).astype(np.float64)
        y = t.column("dy").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "n": pa.array([float(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
                "sxy": pa.array([(x * y).sum()]),
            }
        )

    out = (
        es.map_batches(moments, batch_format="pyarrow")
        .groupby("g")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
    )
    nn = float(out["n"].iloc[0])
    sx, sy = float(out["sx"].iloc[0]), float(out["sy"].iloc[0])
    sxx, syy, sxy = (float(out["sxx"].iloc[0]), float(out["syy"].iloc[0]),
                     float(out["sxy"].iloc[0]))
    r = (sxy - (sx * sy) / nn) / np.sqrt(
        (sxx - (sx * sx) / nn) * (syy - (sy * sy) / nn)
    )
    return pd.DataFrame(
        {"n_pairs": np.array([int(nn)], np.int64),
         "assortativity": _round_half_away(np.array([r]), 6)}
    )


def q_node2vec_walks(
    sf_dir: str, n_workers: int = 4, mod: int = 499, length: int = 6
) -> pd.DataFrame:
    """node2vec second-order biased walks (Grover & Leskovec KDD'16) over the
    symmetrized lineitem graph — pinned integer bias weights (return 1 /
    triangle 4 / explore 2, i.e. p=4, q=2 in node2vec terms) so the choice
    arithmetic is exactly SQL-reproducible; step 1 is the first-order
    uniform-rank rule. The adjacency membership test runs on the fly against
    the carried prev-neighbor array (pipelines/walks.py:_BiasedWalkShard) —
    no per-edge alias tables. Hash-checked against the unrolled DuckDB
    oracle (__ray_entry__._node2vec_sql)."""
    from pagerank_ray.pipelines.walks import node2vec_walks

    csr, n, id_map = _lineitem_csr(sf_dir, n_workers=n_workers, symmetrize=True)
    im = id_map.to_pandas()
    sel = im.loc[im["orig"] % mod == 0].sort_values("orig")
    dense = sel["dense"].to_numpy(np.int64)
    orig = sel["orig"].to_numpy(np.int64)
    traj = node2vec_walks(csr, dense, orig, length=length, n_workers=n_workers)
    orig_of = np.empty(n, np.int64)
    orig_of[im["dense"].to_numpy(np.int64)] = im["orig"].to_numpy(np.int64)
    n_walks = len(orig)
    return pd.DataFrame(
        {
            "walk_id": np.repeat(orig, length + 1),
            "step": np.tile(np.arange(length + 1, dtype=np.int64), n_walks),
            "vertex": orig_of[traj].reshape(-1),
        }
    )


def q_lp_modularity(sf_dir: str, n_workers: int = 4, lp_iters: int = 3) -> pd.DataFrame:
    """Newman modularity of the 3-iteration label-propagation communities —
    the quality metric composed on top of q_label_propagation:

        Q = A/m − B/(4·m²),  A = same-label undirected simple edges,
                             B = Σ_c (Σ_{v∈c} deg(v))²,  m = |edges|

    A, B, m are exact integers (distributed bucketed counts; B's community
    sums collect ≤ n_communities rows), so Q is two divisions and one
    subtraction — identical floats on both engines, no rounding dependence
    beyond the final ROUND 6. Self-loops are excluded from the modularity
    graph (standard definition); LP itself runs on the same symmetrized CSR
    as q_label_propagation."""
    from pagerank_ray.pipelines.cc import label_propagation
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import distinct_values, grouped_count

    csr, n, id_map, dense_edges = _lineitem_csr(
        sf_dir, n_workers=n_workers, symmetrize=True, return_edges=True
    )
    labels = label_propagation(csr, n_workers=n_workers, max_iters=lp_iters).result
    labels = labels.materialize()
    und = _undirected_simple(dense_edges).materialize()

    m_edges = und.count()
    ea = joins.attach_column(und, labels, probe_col="src_id", build_key="id",
                             build_val="label", out_col="la", build_count=n)
    ea = joins.attach_column(ea, labels, probe_col="dst_id", build_key="id",
                             build_val="label", out_col="lb", build_count=n)
    a_cnt = ea.map_batches(
        lambda t: pa.table({"one": pa.array(
            [int(pa.compute.sum(pa.compute.equal(t.column("la"), t.column("lb")).cast(pa.int8())).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow",
    ).to_pandas()["one"].sum()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {"id": pa.concat_arrays([
                t.column("src_id").combine_chunks().cast(pa.int64()),
                t.column("dst_id").combine_chunks().cast(pa.int64()),
            ])}
        )

    degs = grouped_count(und.map_batches(endpoints, batch_format="pyarrow"), "id", "deg")
    dl = joins.attach_column(degs, labels, probe_col="id", build_key="id",
                             build_val="label", out_col="label", build_count=n)
    # bucketed per-community degree sums (NOT groupby(label).sum: Ray pays
    # per-GROUP overhead at community cardinality — same rationale as
    # grouped_count / dedup_pairs; measured 25.8 s → the bucketed path below
    # on the sf0.1 headline)
    def partial_dc(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("label", sort=False)["deg"].sum().reset_index(name="dc")
        out["bkt"] = (out["label"].to_numpy(np.uint64) % np.uint64(64)).astype(np.int64)
        return out

    def merge_dc(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("label", sort=False)["dc"].sum().reset_index(name="dc")

    percomm = (
        dl.map_batches(partial_dc, batch_format="pandas")
        .groupby("bkt")
        .map_groups(merge_dc, batch_format="pandas")
        .to_pandas()
    )
    b_sum = int((percomm["dc"].astype(object) ** 2).sum())  # exact Python ints
    n_comm = distinct_values(
        labels.map_batches(lambda t: pa.table({"label": t.column("label")}),
                           batch_format="pyarrow"),
        "label",
    ).count()
    q = int(a_cnt) / m_edges - b_sum / (4.0 * m_edges * m_edges)
    return pd.DataFrame(
        {
            "n_communities": np.array([n_comm], np.int64),
            "m_edges": np.array([m_edges], np.int64),
            "modularity": _round_half_away(np.array([q]), 6),
        }
    )


# ---------------------------------------------------------------------------
# round-5 additions: PII scrub, duplicated-span stats, PMI, link prediction
# ---------------------------------------------------------------------------

def q_pii_redact(sf_dir: str) -> pd.DataFrame:
    """PII scrub over customer names (the corpus-scrubbing stage every
    training pipeline runs before tokenization): per market segment, how many
    rows, how many matches of each PII class (email / ipv4 / long digit run,
    applied in the fixed order functions/pii.py pins), the total redacted
    text length, and the lexicographically smallest redacted name.

    Shape: one vectorized compiled-regex pass per class per batch
    (functions/pii.py:redact_series), per-batch partial aggregation to one
    row per segment, then a tiny map_groups combine over ≤ a handful of
    segment groups — the corpus never shuffles, only (segments × batches)
    partial rows do. The oracle runs the identical RE2-safe patterns through
    DuckDB regexp_extract_all / regexp_replace."""
    from pagerank_ray.functions.pii import redact_series

    ds = _read(sf_dir, "customer", ["c_mktsegment", "c_name"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        red, counts = redact_series(df["c_name"])
        out = pd.DataFrame(
            {
                "c_mktsegment": df["c_mktsegment"].to_numpy(dtype=object),
                "n_rows": np.ones(len(df), np.int64),
                "n_email": counts["n_email"].to_numpy(np.int64),
                "n_ipv4": counts["n_ipv4"].to_numpy(np.int64),
                "n_id": counts["n_id"].to_numpy(np.int64),
                "red_chars": red.str.len().to_numpy(np.int64),
                "min_red": red.to_numpy(dtype=object),
            }
        )
        g = out.groupby("c_mktsegment", sort=False)
        agg = g.agg(
            n_rows=("n_rows", "sum"),
            n_email=("n_email", "sum"),
            n_ipv4=("n_ipv4", "sum"),
            n_id=("n_id", "sum"),
            red_chars=("red_chars", "sum"),
            min_red=("min_red", "min"),
        ).reset_index()
        return agg

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_mktsegment", sort=False)
        return g.agg(
            n_rows=("n_rows", "sum"),
            n_email=("n_email", "sum"),
            n_ipv4=("n_ipv4", "sum"),
            n_id=("n_id", "sum"),
            red_chars=("red_chars", "sum"),
            min_red=("min_red", "min"),
        ).reset_index()

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("c_mktsegment")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    for c in ("n_rows", "n_email", "n_ipv4", "n_id", "red_chars"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def q_dup_ngram_ratio(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Duplicated-span statistics (the Lee et al. 2022 "Deduplicating
    Training Data" diagnostic): for every document with ≥ k tokens, the
    fraction of its word-k-gram OCCURRENCES whose k-gram also appears in at
    least one OTHER document. Pipelines use this to decide whether span-level
    (vs whole-doc) dedup is worth running on a crawl slice.

    Shape: per-batch vectorized gram hashing (token explode + k shifted
    polynomial combines — the jaccard/decontaminate shingle hash with
    multiplicity kept), pre-aggregated to one row per DISTINCT (doc, gram)
    per batch (docs are row-atomic, so these rows are globally unique);
    gram-hash bucketed groupby computes per-gram doc counts AND joins them
    back to the same bucket's occurrence rows in one map_groups (every row
    of a gram lands in its one bucket — no second shuffle); per-doc partials
    then combine by doc-bucket. Nothing corpus-sized touches the driver.
    The oracle rebuilds the identical grams as STRINGS in DuckDB; ratio
    rounding is half-away on both sides (the repo rounding contract)."""
    from pagerank_ray.stages.dedup import _POLY_C, _hash_tokens

    n_buckets = 64
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), np.maximum(n_tok, 1))
        h = np.zeros(len(flat), dtype=np.uint64)
        if valid.any():
            h[valid] = _hash_tokens(flat[valid].tolist())
        n = len(h) - k + 1
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype=np.int64),
                "g": pd.Series(dtype=np.uint64),
                "cnt": pd.Series(dtype=np.int64),
            }
        )
        if n <= 0:
            return empty
        with np.errstate(over="ignore"):
            g = np.zeros(n, dtype=np.uint64)
            for j in range(k):  # k (=5) vectorized passes
                g = g * _POLY_C + h[j : j + n]
        ok = valid[:n].copy()
        for j in range(1, k):
            ok &= valid[j : j + n]
        ok &= doc_idx[:n] == doc_idx[k - 1 :]
        if not ok.any():
            return empty
        ids = df["doc_id"].to_numpy(np.int64)[doc_idx[:n][ok]]
        per = (
            pd.DataFrame({"doc_id": ids, "g": g[ok]})
            .groupby(["doc_id", "g"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        per["cnt"] = per["cnt"].astype(np.int64)
        return per

    occ = docs.map_batches(gram_rows, batch_format="pandas")

    def bucketize(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False)
        mixed = (g * np.uint64(0x9E3779B1)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "bucket", pa.array((mixed % np.uint64(n_buckets)).astype(np.int32))
        )

    def per_gram_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # rows are unique per (doc, gram) -> docs-per-gram = group size
        nd = df.groupby("g", sort=False)["doc_id"].transform("size").to_numpy(np.int64)
        cnt = df["cnt"].to_numpy(np.int64)
        part = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_grams": cnt,
                "n_dup": np.where(nd >= 2, cnt, 0).astype(np.int64),
            }
        )
        out = part.groupby("doc_id", sort=False).sum().reset_index()
        h = (out["doc_id"].to_numpy(np.int64) * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        out["dbkt"] = (h % n_buckets).astype(np.int32)
        return out

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("doc_id", sort=False)[["n_grams", "n_dup"]].sum().reset_index()
        return out

    res = (
        occ.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_gram_bucket, batch_format="pandas")
        .groupby("dbkt")
        .map_groups(per_doc, batch_format="pandas")
        .to_pandas()
    )
    res["n_grams"] = res["n_grams"].astype(np.int64)
    res["n_dup"] = res["n_dup"].astype(np.int64)
    res["dup_ratio"] = _round_half_away(
        res["n_dup"].to_numpy(np.float64) / res["n_grams"].to_numpy(np.float64), 6
    )
    return res.sort_values("doc_id").reset_index(drop=True)


def q_line_dedup(sf_dir: str, line_len: int = 8) -> pd.DataFrame:
    """C4-style line-level dedup report (Raffel et al. 2020 §2.2's
    three-sentence-span rule, applied at fixed ``line_len``-word segment
    granularity — the synthetic docs are single-line word streams, so a
    "line" is a consecutive 8-word segment, last segment possibly shorter):
    an occurrence of a line is REMOVED iff the identical line occurs
    earlier in the corpus under the total order pos = (doc_id, line_idx)
    (keep-first-global-occurrence — the deterministic version of C4's
    "keep one"). Per doc with ≥1 token: n_lines, n_removed, ROUND(6) ratio.

    Shape: per-batch vectorized segmenting (token explode; per-line
    polynomial hash of the token hashes with position weights C^(ll−1−q),
    so equal hash ≡ equal joined string modulo 64-bit collisions — the
    dup_ngram_ratio contract); one row per line OCCURRENCE with an encoded
    position pos = doc_id·2¹⁶ + line_idx (line_idx < 2¹⁶ enforced loudly);
    line-hash bucketed groupby computes each line's global min pos AND the
    per-occurrence removed flag in one map_groups (every occurrence of a
    line lands in its one bucket); per-doc partials combine by doc-bucket.
    Nothing corpus-sized touches the driver. The oracle rebuilds the lines
    as STRINGS in DuckDB (__ray_entry__._line_dedup_sql)."""
    from pagerank_ray.stages.dedup import _POLY_C, _hash_tokens

    n_buckets = 64
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    with np.errstate(over="ignore"):
        pw = np.ones(line_len, dtype=np.uint64)
        for j in range(1, line_len):
            pw[j] = pw[j - 1] * _POLY_C  # pw[e] = C^e

    def line_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        empty = pd.DataFrame(
            {
                "g": pd.Series(dtype=np.uint64),
                "doc_id": pd.Series(dtype=np.int64),
                "pos": pd.Series(dtype=np.int64),
            }
        )
        if n_tok.sum() == 0:
            return empty
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        h = np.zeros(len(flat), dtype=np.uint64)
        h[valid] = _hash_tokens(flat[valid].tolist())
        h = h[valid]
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), n_tok)
        # position of each token within its doc
        starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        p = np.arange(len(h), dtype=np.int64) - starts[doc_idx]
        li = p // line_len  # line index within doc
        q = p % line_len  # position within line
        ll = np.minimum(line_len, n_tok[doc_idx] - li * line_len)  # line length
        with np.errstate(over="ignore"):
            w = h * pw[ll - 1 - q]
        # per-(doc,line) wrapped sum — exact polynomial hash of the line
        n_lines_per_doc = (n_tok + line_len - 1) // line_len
        if (n_lines_per_doc >= (1 << 16)).any():
            raise ValueError("line_idx exceeds the 2^16 position encoding")
        key = doc_idx * (1 << 16) + li  # unique per (doc,line) within batch
        order = np.argsort(key, kind="stable")
        ks, ws = key[order], w[order]
        bounds = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        with np.errstate(over="ignore"):
            g = np.add.reduceat(ws, bounds)
        uk = ks[bounds]
        ids = df["doc_id"].to_numpy(np.int64)
        d = ids[(uk >> 16).astype(np.int64)]
        lidx = (uk & ((1 << 16) - 1)).astype(np.int64)
        return pd.DataFrame({"g": g, "doc_id": d, "pos": d * (1 << 16) + lidx})

    occ = docs.map_batches(line_rows, batch_format="pandas")

    def bucketize(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False)
        mixed = (g * np.uint64(0x9E3779B1)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "bucket", pa.array((mixed % np.uint64(n_buckets)).astype(np.int32))
        )

    def per_line_bucket(df: pd.DataFrame) -> pd.DataFrame:
        mp = df.groupby("g", sort=False)["pos"].transform("min").to_numpy(np.int64)
        removed = (df["pos"].to_numpy(np.int64) > mp).astype(np.int64)
        part = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_lines": np.ones(len(df), dtype=np.int64),
                "n_removed": removed,
            }
        )
        out = part.groupby("doc_id", sort=False).sum().reset_index()
        h = (out["doc_id"].to_numpy(np.int64) * np.int64(0x9E3779B1)) & np.int64(
            0x7FFFFFFF
        )
        out["dbkt"] = (h % n_buckets).astype(np.int32)
        return out

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("doc_id", sort=False)[["n_lines", "n_removed"]]
            .sum()
            .reset_index()
        )

    res = (
        occ.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_line_bucket, batch_format="pandas")
        .groupby("dbkt")
        .map_groups(per_doc, batch_format="pandas")
        .to_pandas()
    )
    res["n_lines"] = res["n_lines"].astype(np.int64)
    res["n_removed"] = res["n_removed"].astype(np.int64)
    res["removed_ratio"] = _round_half_away(
        res["n_removed"].to_numpy(np.float64) / res["n_lines"].to_numpy(np.float64), 6
    )
    return res[["doc_id", "n_lines", "n_removed", "removed_ratio"]].sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_boilerplate_lines(
    sf_dir: str, line_len: int = 8, min_df: int = 2,
    frac_num: int = 1, frac_den: int = 20,
) -> pd.DataFrame:
    """Frequency-based boilerplate line detection (the template-removal
    rule of C4 — Raffel et al. 2020 §2.2 "lines appearing in multiple
    pages" — and CCNet's per-snapshot paragraph-frequency dedup, Wenzek et
    al. 2020), scoped PER SOURCE the way real pipelines scope it per host:
    a ``line_len``-word segment is BOILERPLATE for source s iff its
    document frequency within s satisfies df ≥ min_df AND
    df·frac_den ≥ frac_num·n_docs(s) (default: ≥5% of the source's docs
    and at least 2, exact integer inequality — C4 removes at df ≥ 2; the
    percentage guard keeps tiny sources from flagging every repeat). Per doc with ≥1 token: n_lines, n_boiler
    (line OCCURRENCES whose segment is boilerplate), ROUND(6) ratio.

    Shape: one text pass emits one row per distinct (doc, line-hash) with
    its occurrence count (docs never split across rows, so the per-doc
    reduce is batch-local); a line-hash bucketed groupby computes each
    (source, line)'s document frequency — rows ARE distinct docs — and
    flags against the broadcast per-source doc counts; a doc-bucketed
    groupby folds Σocc / Σocc·flag. Nothing corpus-sized on the driver.
    Line hashes are the position-weighted polynomial of q_line_dedup
    (equal hash ≡ equal joined string modulo 64-bit collisions); the
    oracle rebuilds lines as STRINGS (__ray_entry__._boilerplate_sql)."""
    import ray

    from pagerank_ray.stages import joins
    from pagerank_ray.stages.dedup import _POLY_C, _hash_tokens

    n_buckets = 64
    docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

    # per-source doc counts: O(#batches) partials → tiny broadcast
    nsrc_parts = docs.map_batches(
        lambda df: df.groupby("source", sort=False)
        .size()
        .rename("c")
        .reset_index(),
        batch_format="pandas",
    ).to_pandas()
    nsrc = nsrc_parts.groupby("source", sort=True)["c"].sum()
    src_names = nsrc.index.to_numpy()
    src_counts = nsrc.to_numpy(np.int64)
    nsrc_ref = ray.put((src_names, src_counts))

    with np.errstate(over="ignore"):
        pw = np.ones(line_len, dtype=np.uint64)
        for j in range(1, line_len):
            pw[j] = pw[j - 1] * _POLY_C

    def line_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        empty = pd.DataFrame(
            {
                "g": pd.Series(dtype=np.uint64),
                "doc_id": pd.Series(dtype=np.int64),
                "source": pd.Series(dtype=object),
                "occ": pd.Series(dtype=np.int64),
            }
        )
        if n_tok.sum() == 0:
            return empty
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        h = np.zeros(len(flat), dtype=np.uint64)
        h[valid] = _hash_tokens(flat[valid].tolist())
        h = h[valid]
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), n_tok)
        starts = np.concatenate(([0], np.cumsum(n_tok)[:-1]))
        p = np.arange(len(h), dtype=np.int64) - starts[doc_idx]
        li = p // line_len
        q = p % line_len
        ll = np.minimum(line_len, n_tok[doc_idx] - li * line_len)
        with np.errstate(over="ignore"):
            w = h * pw[ll - 1 - q]
        if ((n_tok + line_len - 1) // line_len >= (1 << 16)).any():
            raise ValueError("line_idx exceeds the 2^16 position encoding")
        key = doc_idx * (1 << 16) + li
        order = np.argsort(key, kind="stable")
        ks, ws = key[order], w[order]
        bounds = np.flatnonzero(np.concatenate(([True], ks[1:] != ks[:-1])))
        with np.errstate(over="ignore"):
            g = np.add.reduceat(ws, bounds)  # per-(doc,line) polynomial hash
        d_idx = (ks[bounds] >> 16).astype(np.int64)
        # distinct (doc, line-hash) with occurrence counts — batch-local ≡
        # global because docs never split across rows
        dg = pd.DataFrame({"d": d_idx, "g": g})
        red = dg.groupby(["d", "g"], sort=False).size().rename("occ").reset_index()
        ids = df["doc_id"].to_numpy(np.int64)
        srcs = df["source"].to_numpy()
        return pd.DataFrame(
            {
                "g": red["g"].to_numpy(),
                "doc_id": ids[red["d"].to_numpy()],
                "source": srcs[red["d"].to_numpy()],
                "occ": red["occ"].to_numpy(np.int64),
            }
        )

    occ = docs.map_batches(line_rows, batch_format="pandas")

    def bucketize(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False)
        mixed = (g * np.uint64(0x9E3779B1)) & np.uint64(0x7FFFFFFF)
        return t.append_column(
            "bucket", pa.array((mixed % np.uint64(n_buckets)).astype(np.int32))
        )

    def flag_bucket(df: pd.DataFrame) -> pd.DataFrame:
        names, counts = joins.broadcast_get(nsrc_ref, lambda x: x, "boiler_nsrc")
        dfreq = (
            df.groupby(["source", "g"], sort=False)["doc_id"]
            .transform("size")
            .to_numpy(np.int64)
        )
        pos = np.searchsorted(names, df["source"].to_numpy())
        nd = counts[np.clip(pos, 0, len(counts) - 1)]
        boiler = (dfreq >= min_df) & (dfreq * frac_den >= frac_num * nd)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "occ": df["occ"].to_numpy(np.int64),
                "boil": df["occ"].to_numpy(np.int64) * boiler.astype(np.int64),
            }
        )
        agg = out.groupby("doc_id", sort=False).sum().reset_index()
        h = (agg["doc_id"].to_numpy(np.int64) * np.int64(0x9E3779B1)) & np.int64(
            0x7FFFFFFF
        )
        agg["dbkt"] = (h % n_buckets).astype(np.int32)
        return agg

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("doc_id", sort=False)[["occ", "boil"]].sum().reset_index()
        )

    res = (
        occ.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(flag_bucket, batch_format="pandas")
        .groupby("dbkt")
        .map_groups(per_doc, batch_format="pandas")
        .to_pandas()
    )
    res = res.rename(columns={"occ": "n_lines", "boil": "n_boiler"})
    res["n_lines"] = res["n_lines"].astype(np.int64)
    res["n_boiler"] = res["n_boiler"].astype(np.int64)
    res["boiler_ratio"] = _round_half_away(
        res["n_boiler"].to_numpy(np.float64) / res["n_lines"].to_numpy(np.float64),
        6,
    )
    return (
        res[["doc_id", "n_lines", "n_boiler", "boiler_ratio"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_span_dedup(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Span-level exact-substring dedup trim (the REMOVAL half of Lee et
    al. 2022 "Deduplicating Training Data Makes Language Models Better" —
    q_dup_ngram_ratio is the companion diagnostic): a word-k-gram
    occurrence is a DUPLICATE iff the identical gram occurs earlier in the
    corpus under the total order pos = (doc_id, start_idx)
    (keep-first-global-occurrence); a token is REMOVED iff it is covered
    by at least one duplicate gram span [s, s+k-1]. Overlapping duplicate
    spans merge (coverage union), so n_removed counts each token once.
    Per doc with ≥1 token: n_tokens, n_removed, ROUND(6) removed_ratio.

    Shape: one text pass emits gram-occurrence rows (doc_id, gram hash,
    start) PLUS one per-doc stat row, with pos = doc_id·2²⁰ + start
    (n_tokens < 2²⁰ enforced loudly); gram-hash bucketed groupby flags
    duplicate occurrences against the gram's global min pos in one
    map_groups (every occurrence of a gram lands in its one bucket) and
    emits ONLY the duplicates; doc-bucketed groupby merges each doc's
    duplicate starts into a coverage-union length (sorted starts:
    Σ min(k, next_start − start), last span contributes k — spans never
    cross the doc end because grams are intra-doc) and joins the stat
    rows. Nothing corpus-sized touches the driver. The oracle rebuilds
    grams as STRINGS and the coverage union as a COUNT(DISTINCT token
    position) range join (__ray_entry__._span_dedup_sql)."""
    from pagerank_ray.stages.dedup import _POLY_C, _hash_tokens

    n_buckets = 64
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def gram_and_stat_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        if (n_tok >= (1 << 20)).any():
            raise ValueError("n_tokens exceeds the 2^20 position encoding")
        has = n_tok >= 1
        # kind 0: per-doc stat rows (s carries n_tokens; g unused)
        stats = pd.DataFrame(
            {
                "g": np.zeros(int(has.sum()), dtype=np.uint64),
                "doc_id": ids[has],
                "s": n_tok[has],
                "kind": np.zeros(int(has.sum()), dtype=np.int8),
            }
        )
        if n_tok.sum() == 0:
            return stats
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), np.maximum(n_tok, 1))
        h = np.zeros(len(flat), dtype=np.uint64)
        if valid.any():
            h[valid] = _hash_tokens(flat[valid].tolist())
        n = len(h) - k + 1
        if n <= 0:
            return stats
        with np.errstate(over="ignore"):
            g = np.zeros(n, dtype=np.uint64)
            for j in range(k):  # k (=5) vectorized passes
                g = g * _POLY_C + h[j : j + n]
        ok = valid[:n].copy()
        for j in range(1, k):
            ok &= valid[j : j + n]
        ok &= doc_idx[:n] == doc_idx[k - 1 :]
        if not ok.any():
            return stats
        d_idx = doc_idx[:n][ok]
        starts = np.concatenate(([0], np.cumsum(np.maximum(n_tok, 1))[:-1]))
        s = np.flatnonzero(ok) - starts[d_idx]
        grams = pd.DataFrame(
            {
                "g": g[ok],
                "doc_id": ids[d_idx],
                "s": s,
                "kind": np.ones(len(s), dtype=np.int8),
            }
        )
        return pd.concat([stats, grams], ignore_index=True)

    occ = docs.map_batches(gram_and_stat_rows, batch_format="pandas")

    def bucketize(t: pa.Table) -> pa.Table:
        # stat rows (kind 0) route straight to their doc bucket; gram rows
        # (kind 1) bucket by gram hash for the min-pos stage
        g = t.column("g").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        gm = (g * np.uint64(0x9E3779B1)) & np.uint64(0x7FFFFFFF)
        dm = (doc.astype(np.int64) * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        bkt = np.where(
            kind == 1,
            (gm % np.uint64(n_buckets)).astype(np.int32),
            (dm % n_buckets).astype(np.int32) + np.int32(n_buckets),
        )
        return t.append_column("bucket", pa.array(bkt.astype(np.int32)))

    def dup_starts_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # stat-row buckets (>= n_buckets) pass through unchanged
        if (df["kind"].to_numpy() == 0).all():
            return df[["g", "doc_id", "s", "kind"]]
        doc = df["doc_id"].to_numpy(np.int64)
        pos = doc * (1 << 20) + df["s"].to_numpy(np.int64)
        mp = (
            pd.Series(pos)
            .groupby(df["g"].to_numpy(), sort=False)
            .transform("min")
            .to_numpy(np.int64)
        )
        dup = pos > mp
        return pd.DataFrame(
            {
                "g": np.zeros(int(dup.sum()), dtype=np.uint64),
                "doc_id": doc[dup],
                "s": df["s"].to_numpy(np.int64)[dup],
                "kind": np.full(int(dup.sum()), 2, dtype=np.int8),
            }
        )

    def rebucket_by_doc(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        dm = (doc.astype(np.int64) * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column(
            "dbkt", pa.array((dm % n_buckets).astype(np.int32))
        )

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        kind = df["kind"].to_numpy()
        is_stat = kind == 0
        stat = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64)[is_stat],
                "n_tokens": df["s"].to_numpy(np.int64)[is_stat],
            }
        )
        is_dup = kind == 2
        doc = df["doc_id"].to_numpy(np.int64)[is_dup]
        s = df["s"].to_numpy(np.int64)[is_dup]
        if len(doc):
            order = np.lexsort((s, doc))
            doc, s = doc[order], s[order]
            # coverage union of the length-k spans: sorted starts — each
            # contributes min(k, gap to next start); the doc's last span k
            last = np.concatenate((doc[1:] != doc[:-1], [True]))
            gap = np.empty(len(s), dtype=np.int64)
            gap[:-1] = s[1:] - s[:-1]
            contrib = np.where(last, k, np.minimum(gap, k))
            bounds = np.flatnonzero(np.concatenate(([True], last[:-1])))
            rem = pd.DataFrame(
                {
                    "doc_id": doc[bounds],
                    "n_removed": np.add.reduceat(contrib, bounds),
                }
            )
            out = stat.merge(rem, on="doc_id", how="left")
            out["n_removed"] = (
                out["n_removed"].fillna(0).astype(np.int64)
            )
        else:
            out = stat.assign(n_removed=np.zeros(len(stat), dtype=np.int64))
        return out

    res = (
        occ.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dup_starts_bucket, batch_format="pandas")
        .map_batches(rebucket_by_doc, batch_format="pyarrow")
        .groupby("dbkt")
        .map_groups(per_doc, batch_format="pandas")
        .to_pandas()
    )
    res["n_tokens"] = res["n_tokens"].astype(np.int64)
    res["n_removed"] = res["n_removed"].astype(np.int64)
    res["removed_ratio"] = _round_half_away(
        res["n_removed"].to_numpy(np.float64) / res["n_tokens"].to_numpy(np.float64),
        6,
    )
    return (
        res[["doc_id", "n_tokens", "n_removed", "removed_ratio"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_winnowing_fp(sf_dir: str, k: int = 4, w: int = 5) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash every
    word-k-gram, slide a w-gram window over each doc, and in every window
    select the minimum hash, ties broken to the RIGHTMOST position (the
    paper's rule — it maximizes selection overlap between neighboring
    windows). The fingerprint set is the distinct selected positions; the
    guarantee is one fingerprint per w consecutive grams, so any shared
    substring of ≥ w+k-1 tokens is always detected. Docs with fewer than w
    grams get one truncated window over all their grams (≥1 fingerprint
    per doc with ≥1 gram). Per doc with ≥1 token: n_grams, n_fp (distinct
    selected positions), n_shared (distinct fingerprint hashes also
    fingerprinted by ≥2 distinct docs — the MOSS match signal).

    Shape: one text pass per batch computes token hashes
    (stages/dedup.py:_hash_tokens — SQL-reproducible by design), the
    k-gram polynomial fold, and the FULL winnowing selection (docs never
    split across batch rows, so selection is batch-local): full windows
    via a stride view + reversed argmin (rightmost min), truncated-window
    docs via one lexsort. Only the distinct (doc, fingerprint-hash) pairs
    and the per-doc stat rows leave the batch; a gram-hash bucketed
    groupby marks hashes fingerprinted by ≥2 docs and a doc-bucketed
    groupby folds the counts — shuffles carry fingerprints (a 1/w sample
    of grams), never the corpus. The oracle recomputes the identical
    token hashes (_TOKEN_HASH_CTES), gram folds and window argmins in SQL
    (__ray_entry__._winnowing_sql)."""
    from pagerank_ray.stages.dedup import _POLY_C, _hash_tokens

    n_buckets = 64
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def fingerprint_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        has = n_tok >= 1
        ng_doc = np.maximum(n_tok - k + 1, 0)
        stats = pd.DataFrame(
            {
                "g": np.zeros(int(has.sum()), dtype=np.uint64),
                "doc_id": ids[has],
                "a": ng_doc[has],  # kind 0: a = n_grams, b = n_fp (below)
                "b": np.zeros(int(has.sum()), dtype=np.int64),
                "kind": np.zeros(int(has.sum()), dtype=np.int8),
            }
        )
        if ng_doc.sum() == 0:
            return stats
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        doc_idx = np.repeat(np.arange(len(df), dtype=np.int64), np.maximum(n_tok, 1))
        h = np.zeros(len(flat), dtype=np.uint64)
        if valid.any():
            h[valid] = _hash_tokens(flat[valid].tolist())
        n = len(h) - k + 1
        with np.errstate(over="ignore"):
            g = np.zeros(n, dtype=np.uint64)
            for j in range(k):  # k (=4) vectorized passes
                g = g * _POLY_C + h[j : j + n]
        ok = valid[:n].copy()
        for j in range(1, k):
            ok &= valid[j : j + n]
        ok &= doc_idx[:n] == doc_idx[k - 1 :]
        tok_starts = np.concatenate(([0], np.cumsum(np.maximum(n_tok, 1))[:-1]))
        # compressed gram arrays — contiguous per doc, in position order
        gpos = np.flatnonzero(ok)
        gd = doc_idx[gpos]                       # batch-local doc index
        gs = gpos - tok_starts[gd]               # in-doc gram start
        gh = g[gpos]
        m = len(gh)
        sel_d: list[np.ndarray] = []
        sel_s: list[np.ndarray] = []
        if m >= w:
            win = np.lib.stride_tricks.sliding_window_view(gh, w)
            full = gd[: m - w + 1] == gd[w - 1 :]  # window stays in one doc
            if full.any():
                ws = np.flatnonzero(full)
                # rightmost min: argmin over the REVERSED window axis
                j = np.argmin(win[ws, ::-1], axis=1)
                p = ws + (w - 1 - j)
                sel_d.append(gd[p])
                sel_s.append(gs[p])
        ngd = np.bincount(gd, minlength=len(df))
        short = (ngd >= 1) & (ngd < w)
        if short.any():
            sm = short[gd]
            d2, s2, h2 = gd[sm], gs[sm], gh[sm]
            # rightmost min per short doc: one lexsort, first row per doc
            order = np.lexsort((-s2, h2, d2))
            first = np.concatenate(([True], d2[order][1:] != d2[order][:-1]))
            sel_d.append(d2[order][first])
            sel_s.append(s2[order][first])
        if not sel_d:
            return stats
        sd = np.concatenate(sel_d)
        ss = np.concatenate(sel_s)
        # distinct selected positions per doc (windows re-select positions)
        upos = np.unique(np.stack([sd, ss], axis=1), axis=0)
        n_fp = np.bincount(upos[:, 0], minlength=len(df))
        stats["b"] = n_fp[np.flatnonzero(has)]
        # distinct (doc, fingerprint hash) pairs for the shared-hash stages
        fp_h = gh[np.searchsorted(  # gram hash at each selected (doc, s):
            gd * (1 << 40) + gs, upos[:, 0] * (1 << 40) + upos[:, 1]
        )]
        ufp = np.unique(np.stack([ids[upos[:, 0]].astype(np.uint64), fp_h], axis=1), axis=0)
        fps = pd.DataFrame(
            {
                "g": ufp[:, 1],
                "doc_id": ufp[:, 0].astype(np.int64),
                "a": np.zeros(len(ufp), dtype=np.int64),
                "b": np.zeros(len(ufp), dtype=np.int64),
                "kind": np.ones(len(ufp), dtype=np.int8),
            }
        )
        return pd.concat([stats, fps], ignore_index=True)

    occ = docs.map_batches(fingerprint_rows, batch_format="pandas")

    def bucketize(t: pa.Table) -> pa.Table:
        g = t.column("g").to_numpy(zero_copy_only=False)
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        kind = t.column("kind").to_numpy(zero_copy_only=False)
        gm = (g * np.uint64(0x9E3779B1)) & np.uint64(0x7FFFFFFF)
        dm = (doc.astype(np.int64) * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        bkt = np.where(
            kind == 1,
            (gm % np.uint64(n_buckets)).astype(np.int32),
            (dm % n_buckets).astype(np.int32) + np.int32(n_buckets),
        )
        return t.append_column("bucket", pa.array(bkt.astype(np.int32)))

    def shared_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if (df["kind"].to_numpy() == 0).all():  # stat-row bucket: pass through
            return df[["g", "doc_id", "a", "b", "kind"]]
        # rows are distinct (doc, g): per-g row count = distinct-doc count
        cnt = df.groupby("g", sort=False)["doc_id"].transform("size").to_numpy()
        shared = cnt >= 2
        out = df.loc[shared, ["g", "doc_id", "a", "b"]].copy()
        out["kind"] = np.full(int(shared.sum()), 2, dtype=np.int8)
        return out

    def rebucket_by_doc(t: pa.Table) -> pa.Table:
        doc = t.column("doc_id").to_numpy(zero_copy_only=False)
        dm = (doc.astype(np.int64) * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("dbkt", pa.array((dm % n_buckets).astype(np.int32)))

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        kind = df["kind"].to_numpy()
        is_stat = kind == 0
        stat = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64)[is_stat],
                "n_grams": df["a"].to_numpy(np.int64)[is_stat],
                "n_fp": df["b"].to_numpy(np.int64)[is_stat],
            }
        )
        sh = (
            df.loc[kind == 2]
            .groupby("doc_id", sort=False)
            .size()
            .rename("n_shared")
            .reset_index()
        )
        out = stat.merge(sh, on="doc_id", how="left")
        out["n_shared"] = out["n_shared"].fillna(0).astype(np.int64)
        return out

    res = (
        occ.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(shared_bucket, batch_format="pandas")
        .map_batches(rebucket_by_doc, batch_format="pyarrow")
        .groupby("dbkt")
        .map_groups(per_doc, batch_format="pandas")
        .to_pandas()
    )
    for c in ("n_grams", "n_fp", "n_shared"):
        res[c] = res[c].astype(np.int64)
    return (
        res[["doc_id", "n_grams", "n_fp", "n_shared"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_mixture_weights(sf_dir: str, tau: float = 0.7) -> pd.DataFrame:
    """Temperature-scaled corpus mixture weights (the multilingual-LM
    sampling rule of Lample & Conneau 2019 / mT5: q_i ∝ p_i^τ with τ < 1
    upweighting low-resource sources) per ``source``: weight_i =
    s_i / Σ_j s_j with s_i = ROUND(n_tokens_i^τ · 10⁶) as an EXACT BIGINT —
    the integer scaling makes the normalizing sum order-free (the
    powerlaw_alpha trick), leaving one float division + ROUND(6), mirrored
    verbatim in the oracle. Per-batch per-source partials (≤ n_sources rows
    each) combine on the driver — bounded by sources × batches, never
    corpus-sized."""
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        nt = df["text"].fillna("").str.split().str.len().fillna(0).astype(np.int64)
        part = pd.DataFrame(
            {
                "source": df["source"],
                "n_docs": np.ones(len(df), dtype=np.int64),
                "n_tokens": nt,
            }
        )
        return part.groupby("source", sort=False).sum().reset_index()

    agg = (
        docs.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .groupby("source", sort=False)
        .sum()
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    s = _round_half_away(
        np.power(agg["n_tokens"].to_numpy(np.float64), tau) * 1e6, 0
    ).astype(np.int64)
    tot = int(s.sum())
    agg["n_docs"] = agg["n_docs"].astype(np.int64)
    agg["n_tokens"] = agg["n_tokens"].astype(np.int64)
    agg["weight"] = _round_half_away(s.astype(np.float64) / float(tot), 6)
    return agg[["source", "n_docs", "n_tokens", "weight"]]


def q_vocab_growth(sf_dir: str) -> pd.DataFrame:
    """Heaps'-law vocabulary-growth curve: for every distinct token its
    FIRST document (min doc_id), histogrammed by that document and
    cumulatively summed in doc_id order — the V(n) curve corpus studies
    plot to size tokenizer vocabularies. Per-batch distinct (token →
    min doc) pre-aggregation, token-hash-bucketed grouped MIN, per-doc
    counts (≤ n_docs rows) cumsummed on the driver — the vocabulary
    itself never leaves the cluster unaggregated. Docs contributing no
    first-seen token produce no row (both engines)."""
    from pagerank_ray.stages.dedup import _hash_tokens

    n_buckets = 64
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_first(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        doc = np.repeat(df["doc_id"].to_numpy(np.int64), np.maximum(n_tok, 1))
        if not valid.any():
            return pd.DataFrame(
                {
                    "tok": pd.Series(dtype=object),
                    "doc_id": pd.Series(dtype=np.int64),
                    "bucket": pd.Series(dtype=np.int32),
                }
            )
        tf = pd.DataFrame({"tok": flat[valid].to_numpy(), "doc_id": doc[valid]})
        out = tf.groupby("tok", sort=False)["doc_id"].min().reset_index()
        h = _hash_tokens(out["tok"].tolist())
        mixed = (h * np.uint64(0x9E3779B1)) & np.uint64(0x7FFFFFFF)
        out["bucket"] = (mixed % np.uint64(n_buckets)).astype(np.int32)
        return out

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        fst = df.groupby("tok", sort=False)["doc_id"].min().reset_index()
        out = fst.groupby("doc_id", sort=False).size().reset_index(name="n_new")
        out["n_new"] = out["n_new"].astype(np.int64)
        return out

    parts = (
        docs.map_batches(tok_first, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()  # ≤ n_docs × n_buckets rows
    )
    res = (
        parts.groupby("doc_id", sort=False)["n_new"]
        .sum()
        .reset_index()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    res["n_new"] = res["n_new"].astype(np.int64)
    res["cum_vocab"] = res["n_new"].cumsum().astype(np.int64)
    return res[["doc_id", "n_new", "cum_vocab"]]


def q_pmi_topk(sf_dir: str, window: int = 2, min_cnt: int = 5, k: int = 30) -> pd.DataFrame:
    """Top-k token pairs by pointwise mutual information over a ±window
    skip-gram context (Church & Hanks 1990) — the collocation statistic
    corpus pipelines run to mine multi-word expressions before tokenizer
    training. PMI(a,b) = ln(P(a,b) / (P(a)·P(b))) with P(a,b) = c_ab/N_pairs
    (unordered window co-occurrences) and P(x) = c_x/N_words (unigrams).

    Shape: one vectorized explode pass per batch for unigrams and one for
    window pairs (shifted-array match like ngram_topk's bigrams), each
    pre-aggregated per batch then merged by hash-bucket groupby (one row per
    DISTINCT key per batch shuffles, never per occurrence); corpus totals are
    Dataset.sum over the merged (vocab-bounded) tables; unigram counts attach
    to surviving candidates by broadcast-or-hash join; the final PMI is one
    deterministic float64 expression mirrored verbatim in the oracle, rounded
    half-away to 6, sorted (pmi desc, a, b) distributed, LIMIT k."""
    from pagerank_ray.stages import joins

    n_buckets = 64
    ds = _read(sf_dir, "documents", ["text"])

    _exploded = _exploded_tokens  # shared tokenize-explode helper

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        w, valid, _ = _exploded(df)
        if not valid.any():
            return pd.DataFrame({"tk": pd.Series(dtype=object), "cnt": pd.Series(dtype=np.int64)})
        vc = pd.Series(w[valid]).value_counts()
        return pd.DataFrame({"tk": vc.index.to_numpy(dtype=object), "cnt": vc.to_numpy(np.int64)})

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        w, valid, doc_idx = _exploded(df)
        lo_all, hi_all = [], []
        for d in range(1, window + 1):
            if len(w) <= d:
                break
            m = valid[:-d] & valid[d:] & (doc_idx[:-d] == doc_idx[d:])
            if not m.any():
                continue
            x = pd.Series(w[:-d][m])
            y = pd.Series(w[d:][m])
            swap = x > y
            lo_all.append(x.where(~swap, y))
            hi_all.append(y.where(~swap, x))
        if not lo_all:
            return pd.DataFrame(
                {"a": pd.Series(dtype=object), "b": pd.Series(dtype=object),
                 "cnt": pd.Series(dtype=np.int64)}
            )
        pairs = pd.DataFrame({"a": pd.concat(lo_all, ignore_index=True),
                              "b": pd.concat(hi_all, ignore_index=True)})
        out = pairs.groupby(["a", "b"], sort=False).size().reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    def bucketize_on(cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_array(
                (df[cols[0]] if len(cols) == 1
                 else df[cols[0]].str.cat(df[cols[1]], sep="\x1f")).to_numpy(dtype=object)
            )
            df = df.copy()
            df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
            return df
        return fn

    def merge_on(cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(cols, sort=False)["cnt"].sum().reset_index()
            out["cnt"] = out["cnt"].astype(np.int64)
            return out
        return fn

    uni = (
        ds.map_batches(uni_partial, batch_format="pandas")
        .map_batches(bucketize_on(["tk"]), batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_on(["tk"]), batch_format="pandas")
        .materialize()
    )
    n_words = int(uni.sum("cnt"))
    pairs = (
        ds.map_batches(pair_partial, batch_format="pandas")
        .map_batches(bucketize_on(["a", "b"]), batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_on(["a", "b"]), batch_format="pandas")
        .materialize()
    )
    n_pairs = int(pairs.sum("cnt"))
    cand = pairs.map_batches(
        lambda df: df[df["cnt"] >= min_cnt], batch_format="pandas"
    )
    cand = joins.attach_column(cand, uni, probe_col="a", build_key="tk",
                               build_val="cnt", out_col="ca")
    cand = joins.attach_column(cand, uni, probe_col="b", build_key="tk",
                               build_val="cnt", out_col="cb")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cnt"].to_numpy(np.float64)
        ca = df["ca"].to_numpy(np.float64)
        cb = df["cb"].to_numpy(np.float64)
        # association order mirrored verbatim in the oracle expression
        val = np.log(((c * n_words) * n_words) / ((float(n_pairs) * ca) * cb))
        out = df[["a", "b"]].copy()
        out["n_pair"] = df["cnt"].to_numpy(np.int64)
        out["pmi"] = _round_half_away(val, 6)
        return out

    top = (
        cand.map_batches(score, batch_format="pandas")
        .sort(["pmi", "a", "b"], descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    return top.reset_index(drop=True)


def q_kn_bigrams(sf_dir: str, min_cnt: int = 3, k: int = 20) -> pd.DataFrame:
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    the Chen & Goodman 1998 interpolated form with fixed discount
    D = 0.75) — the n-gram LM estimator corpus pipelines run before
    KenLM-style filtering. For each corpus bigram (w1, w2) with
    c ≥ min_cnt:

        P_kn = max(c − D, 0) / c(w1·)
             + (D · N1+(w1·)) / c(w1·) · N1+(·w2) / N1+(··)

    where c(w1·) = Σ_w c(w1,w) , N1+(w1·) = |{w : c(w1,w) > 0}| (the
    normalizing back-off weight λ), N1+(·w2) = |{w : c(w,w2) > 0}| (the
    CONTINUATION count — KN's signature statistic: "how many contexts
    does w2 complete"), N1+(··) = total distinct bigrams. Top-k by
    (ROUND(P_kn, 6) desc, w1, w2).

    Shape: adjacent-pair partials pre-aggregate per batch (one row per
    DISTINCT bigram per batch) then merge by bigram-hash buckets — the
    pmi_topk idiom; all three marginals derive from the merged DISTINCT
    bigram table with w1-/w2-bucketed folds (vocab-bounded rows), attach
    back by broadcast-or-hash join; the float expression order is
    mirrored verbatim in the oracle. Nothing corpus-sized on the driver."""
    from pagerank_ray.stages import joins

    n_buckets = 64
    D = 0.75
    ds = _read(sf_dir, "documents", ["text"])

    def bigram_partial(df: pd.DataFrame) -> pd.DataFrame:
        w, valid, doc_idx = _exploded_tokens(df)
        empty = pd.DataFrame(
            {"w1": pd.Series(dtype=object), "w2": pd.Series(dtype=object),
             "cnt": pd.Series(dtype=np.int64)}
        )
        if len(w) < 2:
            return empty
        m = valid[:-1] & valid[1:] & (doc_idx[:-1] == doc_idx[1:])
        if not m.any():
            return empty
        pairs = pd.DataFrame({"w1": w[:-1][m], "w2": w[1:][m]})
        out = pairs.groupby(["w1", "w2"], sort=False).size().reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    def bucketize_on(cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            key = (
                df[cols[0]]
                if len(cols) == 1
                else df[cols[0]].str.cat(df[cols[1]], sep="\x1f")
            )
            h = pd.util.hash_array(key.to_numpy(dtype=object))
            df = df.copy()
            df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
            return df
        return fn

    def merge_bigrams(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["w1", "w2"], sort=False)["cnt"].sum().reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    bg = (
        ds.map_batches(bigram_partial, batch_format="pandas")
        .map_batches(bucketize_on(["w1", "w2"]), batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_bigrams, batch_format="pandas")
        .materialize()
    )
    ntot = bg.count()  # distinct bigrams = N1+(··)

    def m1_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("w1", sort=False)["cnt"]
        out = g.sum().rename("cw1").reset_index()
        out["n1w1"] = g.size().to_numpy(np.int64)
        out["cw1"] = out["cw1"].astype(np.int64)
        return out

    def m2_fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("w2", sort=False).size().rename("ncw2").reset_index()
        out["ncw2"] = out["ncw2"].astype(np.int64)
        return out

    # marginals fold over DISTINCT bigram rows (w1/w2-bucketed so each key
    # lands wholly in one group)
    m1 = (
        bg.map_batches(bucketize_on(["w1"]), batch_format="pandas")
        .groupby("bucket")
        .map_groups(m1_fold, batch_format="pandas")
        .materialize()
    )
    m2 = (
        bg.map_batches(bucketize_on(["w2"]), batch_format="pandas")
        .groupby("bucket")
        .map_groups(m2_fold, batch_format="pandas")
        .materialize()
    )
    cand = bg.map_batches(
        lambda df: df[df["cnt"] >= min_cnt], batch_format="pandas"
    )
    cand = joins.attach_column(cand, m1, probe_col="w1", build_key="w1",
                               build_val="cw1", out_col="cw1")
    cand = joins.attach_column(cand, m1, probe_col="w1", build_key="w1",
                               build_val="n1w1", out_col="n1w1")
    cand = joins.attach_column(cand, m2, probe_col="w2", build_key="w2",
                               build_val="ncw2", out_col="ncw2")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cnt"].to_numpy(np.float64)
        cw1 = df["cw1"].to_numpy(np.float64)
        n1 = df["n1w1"].to_numpy(np.float64)
        cc = df["ncw2"].to_numpy(np.float64)
        # expression order mirrored verbatim in the oracle
        val = np.maximum(c - D, 0.0) / cw1 + ((D * n1) / cw1) * (cc / float(ntot))
        out = df[["w1", "w2"]].copy()
        out["n_pair"] = df["cnt"].to_numpy(np.int64)
        out["p_kn"] = _round_half_away(val, 6)
        return out

    top = (
        cand.map_batches(score, batch_format="pandas")
        .sort(["p_kn", "w1", "w2"], descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    return top.reset_index(drop=True)


def q_textrank_keywords(
    sf_dir: str, window: int = 2, iters: int = 10, k: int = 20
) -> pd.DataFrame:
    """Corpus-level TextRank keyword extraction (Mihalcea & Tarau 2004):
    PageRank with damping d = 0.85 over the undirected word co-occurrence
    graph (±window skip-gram, self-pairs excluded, weight = co-occurrence
    count), run ``iters`` fixed rounds from the uniform start and report
    the top-k terms by final score.

    Determinism contract (the spectral_bisection all-integer recipe,
    adapted to the weighted-PageRank update): scores are int64 at scale
    10⁶, s⁰ = 10⁶; each round the per-edge mass is the exact integer
    (w_uv · s_u) // wdeg_u, per-dst sums are order-free int64, and
    s' = 150000 + (85 · Σ) // 100 — the 0.85-damped update with both
    divisions pinned to floor, so the unrolled DuckDB oracle matches
    bit-exactly. Terms never co-occurring with another term have no
    vertex (TextRank is defined on the co-occurrence graph).

    Shape: pair counts pre-aggregate per batch then merge by pair-hash
    buckets (the pmi_topk idiom). The iteration itself runs over RESIDENT
    blocks: terms integer-encode once against the sorted vocabulary
    (Heaps-law bounded — the previous shape already broadcast it per round
    via attach_column's build side, so the O(V) driver vectors here are the
    same bound), each symmetrized edge block is presorted by destination
    and parked in the object store, and every round is one wave of Ray
    tasks that read the broadcast state vector, compute the exact per-edge
    floor mass, segment-sum by destination (np.add.reduceat — exact
    int64), and return only (distinct-dst, sum) pairs. This replaces 10
    rounds × ~5 Dataset stages of string-keyed shuffles with 10 task waves
    over static blocks (the superstep-engine shape in miniature; the
    Dataset API cannot hold cross-round resident blocks without paying a
    full re-materialization per round — measured 25.7 s → ~6 s at sf0.1)."""
    n_buckets = 64
    S = 10**6
    ds = _read(sf_dir, "documents", ["text"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        w, valid, doc_idx = _exploded_tokens(df)
        lo_all, hi_all = [], []
        for d in range(1, window + 1):
            if len(w) <= d:
                break
            m = valid[:-d] & valid[d:] & (doc_idx[:-d] == doc_idx[d:])
            if m.any():
                m &= w[:-d] != w[d:]  # no self-loops
            if not m.any():
                continue
            x = pd.Series(w[:-d][m])
            y = pd.Series(w[d:][m])
            swap = x > y
            lo_all.append(x.where(~swap, y))
            hi_all.append(y.where(~swap, x))
        if not lo_all:
            return pd.DataFrame(
                {"a": pd.Series(dtype=object), "b": pd.Series(dtype=object),
                 "w": pd.Series(dtype=np.int64)}
            )
        pairs = pd.DataFrame({"a": pd.concat(lo_all, ignore_index=True),
                              "b": pd.concat(hi_all, ignore_index=True)})
        out = pairs.groupby(["a", "b"], sort=False).size().reset_index(name="w")
        out["w"] = out["w"].astype(np.int64)
        return out

    def bucketize_pair(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(
            df["a"].str.cat(df["b"], sep="\x1f").to_numpy(dtype=object)
        )
        df = df.copy()
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def merge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], sort=False)["w"].sum().reset_index()
        out["w"] = out["w"].astype(np.int64)
        return out

    pc = (
        ds.map_batches(pair_partial, batch_format="pandas")
        .map_batches(bucketize_pair, batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_pairs, batch_format="pandas")
    )
    import ray

    from pagerank_ray.stages import joins

    pcm = pc.materialize()
    # vocab = every term with ≥1 co-occurrence edge; per-block unique first
    # so driver traffic is O(blocks · V), not O(pairs)
    vocab_parts = pcm.map_batches(
        lambda df: pd.DataFrame(
            {"t": pd.Series(
                pd.unique(np.concatenate(
                    [df["a"].to_numpy(dtype=object),
                     df["b"].to_numpy(dtype=object)]
                )) if len(df) else [],
                dtype=object,
            )}
        ),
        batch_format="pandas",
    ).to_pandas()
    terms = np.unique(vocab_parts["t"].to_numpy(dtype=object))
    n_v = len(terms)
    if n_v == 0:
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             "score": pd.Series(dtype=np.int64)})
    tref = ray.put(terms)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        idx = joins.broadcast_get(
            tref, lambda a: pd.Index(a), "textrank_vocab"
        )
        a = idx.get_indexer(df["a"].to_numpy(dtype=object)).astype(np.int64)
        b = idx.get_indexer(df["b"].to_numpy(dtype=object)).astype(np.int64)
        w = df["w"].to_numpy(np.int64)
        s = np.concatenate([a, b])  # symmetrize each canonical a<b pair
        d = np.concatenate([b, a])
        ww = np.concatenate([w, w])
        order = np.argsort(d, kind="stable")  # presort by dst ONCE: reduceat
        return pd.DataFrame({"s": s[order], "d": d[order], "w": ww[order]})

    ints = pcm.map_batches(encode, batch_format="pandas").materialize()

    # weighted out-degree vector: one driver pass of per-block bincounts
    # (weights-bincount is float64 but exact — per-block count sums ≪ 2^53)
    wd = np.zeros(n_v, np.int64)
    blocks = []
    for b in ints.iter_batches(batch_format="numpy", batch_size=None):
        s_a, d_a, w_a = b["s"], b["d"], b["w"]
        if not len(s_a):
            continue
        wd += np.bincount(s_a, weights=w_a, minlength=n_v).astype(np.int64)
        blocks.append(ray.put((s_a, d_a, w_a)))
    wdref = ray.put(wd)

    @ray.remote(num_cpus=1)
    def _round(blk, sv_all, wdv):
        s_a, d_a, w_a = blk
        sv = sv_all[s_a]
        if len(sv) and sv.max() >= (1 << 40):
            raise RuntimeError("textrank: score overflow guard tripped")
        mass = (w_a * sv) // wdv[s_a]
        starts = np.flatnonzero(
            np.concatenate([[True], d_a[1:] != d_a[:-1]])
        )
        return d_a[starts], np.add.reduceat(mass, starts)

    state = np.full(n_v, S, np.int64)
    for _ in range(iters):
        sref = ray.put(state)
        agg = np.zeros(n_v, np.int64)  # missing dsts keep 0 → teleport base
        for ud, sums in ray.get(
            [_round.remote(blk, sref, wdref) for blk in blocks]
        ):
            agg[ud] += sums  # ud unique within a block (run starts)
        state = 150000 + (85 * agg) // 100

    top = (
        pd.DataFrame({"term": terms, "score": state})
        .sort_values(["score", "term"], ascending=[False, True],
                     kind="mergesort")
        .head(k)
        .reset_index(drop=True)
    )
    top["score"] = top["score"].astype(np.int64)
    return top


def q_adamic_adar(sf_dir: str, k: int = 20, max_degree: int = 64) -> pd.DataFrame:
    """Adamic-Adar link prediction (Adamic & Adar 2003) over the undirected
    simple lineitem graph: for every NON-adjacent pair (a < b) sharing at
    least one common neighbor, score = Σ_{v ∈ N(a)∩N(b)} 1/ln(deg(v)); top-k
    by (rounded score desc, a, b). Centers with deg > max_degree are skipped
    — the published hub guard (a hub's O(deg²) wedge fan-out adds ~0 signal
    at 1/ln(deg) weight); the oracle mirrors the identical cap.

    Shape: adjacency bucketed by CENTER hash so each center's full neighbor
    list is co-located (segment length IS the degree — no degree join);
    wedge pairs come from the triangles repeat/cumsum kernel
    (pipelines/triangles.py:_segment_pairs), weights vectorized per segment;
    per-pair partial sums then combine in a pair-hash bucketed groupby that
    ALSO carries the edge set as is_edge sentinel rows — the non-adjacency
    anti-join costs no extra shuffle. Per-bucket top-k → ≤ buckets×k rows
    reach the driver. Score rounded half-away to 4 (float Σ 1/ln is
    summation-order-sensitive at ~1e-15; 4 decimals absorb it — the
    betweenness contract)."""
    from pagerank_ray.pipelines.triangles import _segment_pairs

    n_buckets = 64
    # materialized: feeds adjacency AND the anti-join rows
    und = _undirected_simple(lineitem_edges(sf_dir)).materialize()

    def wedge_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.int64)
        order = np.lexsort((x, v))
        v, x = v[order], x[order]
        empty = pd.DataFrame(
            {"u": pd.Series(dtype=np.int64), "w": pd.Series(dtype=np.int64),
             "n_common": pd.Series(dtype=np.int64), "sc": pd.Series(dtype=np.float64),
             "is_edge": pd.Series(dtype=np.int64)}
        )
        if not len(v):
            return empty
        starts = np.flatnonzero(np.concatenate([[True], v[1:] != v[:-1]]))
        lengths = np.diff(np.concatenate([starts, [len(v)]]))
        keep = (lengths >= 2) & (lengths <= max_degree)
        if not keep.any():
            return empty
        xk = x[np.repeat(keep, lengths)]
        lk = lengths[keep]
        first, second = _segment_pairs(lk)
        npairs = lk * (lk - 1) // 2
        wts = np.repeat(1.0 / np.log(lk.astype(np.float64)), npairs)
        part = pd.DataFrame({"u": xk[first], "w": xk[second], "sc": wts})
        agg = part.groupby(["u", "w"], sort=False)["sc"].agg(["size", "sum"]).reset_index()
        return pd.DataFrame(
            {"u": agg["u"].to_numpy(np.int64), "w": agg["w"].to_numpy(np.int64),
             "n_common": agg["size"].to_numpy(np.int64), "sc": agg["sum"].to_numpy(np.float64),
             "is_edge": np.zeros(len(agg), np.int64)}
        )

    wedges = (
        und.map_batches(_adj_both_dirs, batch_format="pyarrow")
        .map_batches(lambda t: _bucket_by_v(t, n_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(wedge_partial, batch_format="pandas")
    )
    edge_rows = und.map_batches(
        lambda t: pa.table(
            {"u": t.column("src_id").cast(pa.int64()), "w": t.column("dst_id").cast(pa.int64()),
             "n_common": pa.array(np.zeros(t.num_rows, np.int64)),
             "sc": pa.array(np.zeros(t.num_rows, np.float64)),
             "is_edge": pa.array(np.ones(t.num_rows, np.int64))}
        ),
        batch_format="pyarrow",
    )

    def bucket_pair(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        w = t.column("w").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (u * np.uint64(0x9E3779B97F4A7C15) + w) * np.uint64(0x9E3779B1)
        return t.append_column(
            "pbkt", pa.array(((h >> np.uint64(33)) % np.uint64(n_buckets)).astype(np.int32))
        )

    def pair_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["u", "w"], sort=False)
            .agg(n_common=("n_common", "sum"), sc=("sc", "sum"), is_edge=("is_edge", "sum"))
            .reset_index()
        )
        g = g[(g["is_edge"] == 0) & (g["n_common"] > 0)].copy()
        g["aa"] = _round_half_away(g["sc"].to_numpy(np.float64), 4)
        g = g.sort_values(["aa", "u", "w"], ascending=[False, True, True], kind="mergesort")
        return g[["u", "w", "n_common", "aa"]].head(k)

    cand = (
        wedges.union(edge_rows)
        .map_batches(bucket_pair, batch_format="pyarrow")
        .groupby("pbkt")
        .map_groups(pair_merge, batch_format="pandas")
        .to_pandas()  # ≤ n_buckets × k rows
    )
    top = cand.sort_values(["aa", "u", "w"], ascending=[False, True, True],
                           kind="mergesort").head(k)
    top = top.rename(columns={"u": "a", "w": "b"})
    top["n_common"] = top["n_common"].astype(np.int64)
    return top[["a", "b", "n_common", "aa"]].reset_index(drop=True)


def q_mis(sf_dir: str, max_rounds: int = 12, tail_cutoff: int = 500) -> pd.DataFrame:
    """Maximal independent set of the undirected simple lineitem graph —
    deterministic Luby rounds (pipelines/mis.py). tail_cutoff is deliberately
    SMALL here so the distributed round path actually executes at test scale
    before the in-memory tail finishes the remnant (the result is identical
    either way — the rule is deterministic). Hash-checked against a
    fixed-unroll DuckDB oracle replaying the same fmix64 priorities."""
    from pagerank_ray.pipelines.mis import maximal_independent_set

    res, rounds = maximal_independent_set(
        lineitem_edges(sf_dir), max_rounds=max_rounds, tail_cutoff=tail_cutoff
    )
    if rounds > max_rounds:
        raise RuntimeError(
            f"MIS took {rounds} rounds; oracle unrolls {max_rounds}"
        )
    df = res.to_pandas()
    df["id"] = df["id"].astype(np.int64)
    return df.sort_values("id").reset_index(drop=True)


def q_pack_chunks(sf_dir: str, budget: int = 512) -> pd.DataFrame:
    """Sequence-packing statistics — the GPT-style pack-then-chunk batching
    rule every LM training pipeline runs: per source, documents concatenate
    in doc_id order into one token stream that is cut into fixed
    ``budget``-token chunks; report how many chunks the source fills and how
    many documents straddle a chunk boundary (the cross-document-attention /
    truncation cost of packing).

    Shape: per-batch vectorized token counting drops the text immediately
    (only (source, doc_id, n_tok) rows shuffle); source-hash bucketed groupby
    co-locates each source; ONE vectorized kernel per bucket computes the
    exclusive prefix offsets (the running_totals idiom — exact integer
    cumsum, no float) and the per-source aggregates. The oracle is the
    ROWS-UNBOUNDED-PRECEDING window mirror."""
    n_buckets = 64
    docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = (
            df["text"].fillna("").str.split().str.len().fillna(0).to_numpy(np.int64)
        )
        return pd.DataFrame(
            {
                "source": df["source"].to_numpy(dtype=object),
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tok": n_tok,
            }
        )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["source"].to_numpy(dtype=object))
        df = df.copy()
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        src = df["source"].to_numpy(dtype=object)
        ids = df["doc_id"].to_numpy(np.int64)
        ntk = df["n_tok"].to_numpy(np.int64)
        order = np.lexsort((ids, src))
        src, ntk = src[order], ntk[order]
        first = np.concatenate([[True], src[1:] != src[:-1]])
        starts = np.flatnonzero(first)
        lengths = np.diff(np.append(starts, len(src)))
        cs = np.cumsum(ntk)
        base = np.repeat(cs[starts] - ntk[starts], lengths)
        off = cs - base - ntk  # exclusive per-source prefix
        boundary = (ntk > 0) & (off // budget != (off + ntk - 1) // budget)
        total = np.add.reduceat(ntk, starts)
        n_boundary = np.add.reduceat(boundary.astype(np.int64), starts)
        return pd.DataFrame(
            {
                "source": src[starts],
                "n_docs": lengths.astype(np.int64),
                "total_tokens": total.astype(np.int64),
                "n_chunks": ((total + budget - 1) // budget).astype(np.int64),
                "n_boundary_docs": n_boundary,
            }
        )

    out = (
        docs.map_batches(counts, batch_format="pandas")
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("source").reset_index(drop=True)


def q_ktruss(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """k-truss of the (undirected, simple) lineitem graph by distributed
    edge peeling (pipelines/ktruss.py); returns the truss edges with their
    fixpoint triangle support. Hash-checked against a fixed-unroll DuckDB
    oracle (__ray_entry__._ktruss_sql, 6 rounds — peeling is idempotent at
    the fixpoint, and the engine asserts its actual round count fits)."""
    from pagerank_ray.pipelines.ktruss import k_truss

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    truss, rounds = k_truss(dense_edges, k)
    if rounds > 6:
        raise RuntimeError(
            f"k-truss peeling took {rounds} rounds; oracle unrolls 6 — "
            "raise _ktruss_sql rounds to keep the fixpoint-idempotence match"
        )
    # dense ids are sorted-by-orig (order-preserving), so canonical a<b in
    # dense space stays canonical after the rewrite back to original ids
    df = _attach_orig(truss, id_map, n, ["a", "b"])
    df["support"] = df["support"].astype(np.int64)
    return (
        df[["a", "b", "support"]]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def q_event_funnel(
    sf_dir: str, steps: tuple[str, ...] = ("view", "click", "purchase")
) -> pd.DataFrame:
    """Ordered conversion funnel over the event log: a user reaches step k+1
    at the earliest event of that type STRICTLY after their step-k time
    (step 1 = earliest event of the first type). Reports per step the users
    reached and the exact total conversion lag from the previous step in
    microseconds (int64 sums — no float rounding to drift from the oracle).

    Shape: column-pruned read, per-batch filter to the step types (only
    funnel rows shuffle), user-hash bucketed groupby, ONE vectorized kernel
    per bucket walks the steps (loop over the 3 steps, never over rows:
    sorted (user, ts) arrays + per-user firsts via change-points +
    searchsorted lookups into the previous step's frontier). Per-bucket
    partials sum in a tiny final groupby. Oracle: chained MIN/strictly-after
    CTEs in DuckDB."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    step_list = list(steps)

    def prep(t: pa.Table) -> pa.Table:
        typ = t.column("event_type")
        mask = pc.is_in(typ, value_set=pa.array(step_list))
        t = t.filter(mask)
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return pa.table(
            {
                "u": t.column("user_id"),
                "typ": t.column("event_type"),
                "ts": t.column("ts").cast(pa.int64()),
                "bucket": pa.array((mixed % n_buckets).astype(np.int32)),
            }
        )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(np.int64)
        typ = df["typ"].to_numpy(dtype=object)
        ts = df["ts"].to_numpy(np.int64)
        order = np.lexsort((ts, u))
        u, typ, ts = u[order], typ[order], ts[order]
        prev_users = prev_t = None
        out_step, out_n, out_lag = [], [], []
        for i, s in enumerate(step_list):
            mask = typ == s
            if i > 0:
                if len(prev_users) == 0:
                    out_step.append(i + 1)
                    out_n.append(0)
                    out_lag.append(0)
                    prev_users = np.array([], np.int64)
                    prev_t = np.array([], np.int64)
                    continue
                idx = np.clip(np.searchsorted(prev_users, u), 0, len(prev_users) - 1)
                reached = prev_users[idx] == u
                mask = mask & reached & (ts > prev_t[idx])
            uc, tc = u[mask], ts[mask]
            first = (
                np.concatenate([[True], uc[1:] != uc[:-1]])
                if len(uc)
                else np.zeros(0, bool)
            )
            users_k, t_k = uc[first], tc[first]
            if i == 0:
                lag = 0
            else:
                pos = np.searchsorted(prev_users, users_k)
                lag = int(np.sum(t_k - prev_t[pos]))
            out_step.append(i + 1)
            out_n.append(len(users_k))
            out_lag.append(lag)
            prev_users, prev_t = users_k, t_k
        return pd.DataFrame(
            {
                "step": np.array(out_step, np.int64),
                "n": np.array(out_n, np.int64),
                "lag": np.array(out_lag, np.int64),
            }
        )

    parts = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
        .to_pandas()
    )
    # the oracle always emits one row per step; with no funnel-type events at
    # all there are no buckets (parts is empty, possibly schema-less), so
    # reindex to the full step range with zero counts
    if len(parts) and "step" in parts.columns:
        agg = parts.groupby("step", sort=True).agg(
            n_users=("n", "sum"), sum_lag_us=("lag", "sum")
        )
    else:
        agg = pd.DataFrame(
            {"n_users": [], "sum_lag_us": []}, index=pd.Index([], name="step")
        )
    agg = agg.reindex(range(1, len(step_list) + 1), fill_value=0).reset_index()
    agg["event_type"] = [step_list[i - 1] for i in agg["step"]]
    agg = agg[["step", "event_type", "n_users", "sum_lag_us"]]
    for c in ("step", "n_users", "sum_lag_us"):
        agg[c] = agg[c].astype(np.int64)
    return agg.reset_index(drop=True)


def q_fuzzy_join_parts(
    sf_dir: str, d_max: int = 4, n_buckets: int = 32, max_block: int = 10_000
) -> pd.DataFrame:
    """Blocked fuzzy self-join (record linkage) over part names: per part,
    how many OTHER parts share its exact name (n_exact), how many carry a
    different name within edit distance ``d_max`` inside the same block
    (n_near), and the distance to the nearest differently-named part
    (min_other_dist, -1 when the block holds no other name). Blocking key =
    first space-token of the name — distances are defined within the block
    (the standard linkage-blocking contract; cross-block pairs are not
    candidates by construction).

    Shape: the kernel runs over UNIQUE names, not rows — per-batch
    value_counts collapse multiplicity first, so a billion-row table with a
    bounded name vocabulary pays a pair DP of vocabulary size, and the
    per-name results broadcast back onto parts. Per-block all-pairs
    Levenshtein is the vectorized Wagner-Fischer of functions/editdist.py
    (loops over character positions, never over pairs); blocks larger than
    ``max_block`` unique names raise loudly rather than going quadratic.
    Oracle: DuckDB ``levenshtein`` over the same unique-name blocks."""
    from pagerank_ray.functions.editdist import levenshtein_pairs
    from pagerank_ray.stages import joins

    parts = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "p_partkey": df["p_partkey"].to_numpy(np.int64),
                "nm": df["p_name"].fillna("").to_numpy(dtype=object),
            }
        )

    keyed = parts.map_batches(prep, batch_format="pandas").materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["nm"].value_counts()
        return pd.DataFrame(
            {"nm": vc.index.to_numpy(dtype=object), "c": vc.to_numpy(np.int64)}
        )

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        blk = df["nm"].astype(str).str.split(" ", n=1).str[0]
        df = df.copy()
        df["blk"] = blk.to_numpy(dtype=object)
        h = pd.util.hash_array(df["blk"].to_numpy(dtype=object))
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["blk", "nm"], sort=True)["c"].sum().reset_index()
        )
        out_nm, out_c, out_near, out_min = [], [], [], []
        for _, sub in g.groupby("blk", sort=True):
            names = sub["nm"].tolist()
            cnt = sub["c"].to_numpy(np.int64)
            u = len(names)
            if u > max_block:
                raise RuntimeError(
                    f"fuzzy-join block of {u} unique names exceeds "
                    f"max_block={max_block}; refine the blocking key"
                )
            n_near = np.zeros(u, np.int64)
            min_o = np.full(u, np.iinfo(np.int64).max, np.int64)
            if u > 1:
                i_idx, j_idx = np.triu_indices(u, k=1)
                d = levenshtein_pairs(names, i_idx, j_idx)
                near = d <= d_max  # names are unique here, so d >= 1
                np.add.at(n_near, i_idx[near], cnt[j_idx[near]])
                np.add.at(n_near, j_idx[near], cnt[i_idx[near]])
                np.minimum.at(min_o, i_idx, d)
                np.minimum.at(min_o, j_idx, d)
            min_o[min_o == np.iinfo(np.int64).max] = -1
            out_nm.extend(names)
            out_c.extend(cnt.tolist())
            out_near.extend(n_near.tolist())
            out_min.extend(min_o.tolist())
        return pd.DataFrame(
            {
                "nm": np.array(out_nm, dtype=object),
                "c": np.array(out_c, np.int64),
                "n_near": np.array(out_near, np.int64),
                "min_o": np.array(out_min, np.int64),
            }
        )

    uniq = (
        keyed.map_batches(partial, batch_format="pandas")
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
        .materialize()
    )
    u_count = uniq.count()
    out = keyed
    for col in ("c", "n_near", "min_o"):
        out = joins.attach_column(
            out, uniq, probe_col="nm", build_key="nm", build_val=col,
            out_col=col, build_count=u_count,
        )
    df = out.to_pandas()
    df["n_exact"] = (df["c"] - 1).astype(np.int64)
    df = df.rename(columns={"min_o": "min_other_dist"})
    for c in ("p_partkey", "n_near", "min_other_dist"):
        df[c] = df[c].astype(np.int64)
    return (
        df[["p_partkey", "n_exact", "n_near", "min_other_dist"]]
        .sort_values("p_partkey")
        .reset_index(drop=True)
    )


def q_coreness(sf_dir: str) -> pd.DataFrame:
    """Full k-core decomposition of the (undirected, simple) lineitem graph:
    per-vertex coreness = max k with v in the k-core, via level-wise
    distributed peeling (pipelines/coreness.py). Hash-checked against a
    fixed-grid DuckDB oracle (__ray_entry__._coreness_sql, 10 levels x 10
    rounds); coreness is canonical, and the engine asserts its measured
    (levels, per-level rounds) fit the oracle grid."""
    from pagerank_ray.pipelines.coreness import coreness
    from pagerank_ray.stages.csr import symmetrize

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )

    def noself(t: pa.Table) -> pa.Table:
        mask = pc.not_equal(t.column("src_id"), t.column("dst_id"))
        return t.filter(mask)

    simple = dense_edges.map_batches(noself, batch_format="pyarrow")
    labels, rounds_per_level = coreness(symmetrize(simple))
    if len(rounds_per_level) > 10 or (rounds_per_level and max(rounds_per_level) > 10):
        raise RuntimeError(
            f"coreness peel shape {rounds_per_level} exceeds the 10x10 oracle "
            "grid — raise _coreness_sql levels/rounds to keep the match"
        )
    df = _attach_orig(labels, id_map, n, ["id"])
    df["coreness"] = df["coreness"].astype(np.int64)
    return df[["id", "coreness"]].sort_values("id").reset_index(drop=True)


def q_copurchase_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Bipartite projection of the order→part graph onto parts: top-k part
    pairs by the number of orders that contain both (the classic
    co-occurrence / market-basket projection). Deterministic tie-break
    (n DESC, pa, pb).

    Shape: the deduped (order, part) table buckets by order; ONE vectorized
    kernel per bucket enumerates within-order part pairs with the triangles
    segment-pair index arithmetic (order sizes are bounded by basket size,
    so pair fan-out per order is small — no hub cap needed), pre-aggregates
    (pa<<32|pb)-encoded counts per bucket, and a grouped_sum + distributed
    sort/limit finish. Oracle: DISTINCT self-join pair counts in DuckDB."""
    from pagerank_ray.pipelines.triangles import _bucketize_src, _segment_pairs
    from pagerank_ray.stages.graph_build import grouped_sum

    lp = lineitem_edges(sf_dir).map_batches(
        lambda t: pa.table({"src": t.column("src_id"), "dst": t.column("dst_id")}),
        batch_format="pyarrow",
    )
    n_buckets = 256

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        o = df["src"].to_numpy(np.int64)
        p = df["dst"].to_numpy(np.int64)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        if not len(o):
            return pd.DataFrame(
                {"key": pd.Series(dtype=np.int64), "cnt": pd.Series(dtype=np.int64)}
            )
        if p.max() >= np.int64(1) << 31:
            raise RuntimeError(
                "copurchase: part ids must fit 31 bits for the pair key "
                "encoding — compact ids first (see q_ktruss)"
            )
        starts = np.flatnonzero(np.concatenate([[True], o[1:] != o[:-1]]))
        lengths = np.diff(np.append(starts, len(o)))
        first, second = _segment_pairs(lengths)
        # within-order parts are sorted ascending, so p[first] < p[second]
        key = (p[first] << 32) | p[second]
        uk, inv = np.unique(key, return_inverse=True)
        return pd.DataFrame({"key": uk, "cnt": np.bincount(inv).astype(np.int64)})

    contribs = (
        lp.map_batches(lambda t: _bucketize_src(t, n_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    counts = grouped_sum(contribs, "key", "cnt", "n")

    def decode(t: pa.Table) -> pa.Table:
        key = t.column("key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "pa": pa.array(key >> 32, pa.int64()),
                "pb": pa.array(key & 0xFFFFFFFF, pa.int64()),
                "n": t.column("n"),
            }
        )

    top = (
        counts.map_batches(decode, batch_format="pyarrow")
        .sort(["n", "pa", "pb"], descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    for c in ("pa", "pb", "n"):
        top[c] = top[c].astype(np.int64)
    return top.reset_index(drop=True)


def q_butterflies(sf_dir: str) -> pd.DataFrame:
    """Exact butterfly (bipartite 4-cycle) census of the order→part graph
    (Sanei-Mehri, Sariyüce & Tirthapura 2018 "Butterfly Counting in
    Bipartite Networks") plus the Robins-Alexander 2004 bipartite
    clustering coefficient cc4 = 4·B / L3: B = Σ_{p1<p2} C(co(p1,p2), 2)
    over part pairs with co co-containing orders; L3 (3-paths) counts
    each path by its MIDDLE edge, L3 = Σ_{(o,p)∈E} (deg(o)−1)·(deg(p)−1).
    One row: n_butterflies, n_l3_paths, cc4 (ROUND 6; 0 when L3 = 0),
    max_co.

    Shape: part-pair co-counts reuse the copurchase_topk kernel (per-order
    segment pairs — order sizes are basket-bounded so the fan-out is
    small; a skewed source side would be salted the same way triangles
    splits hubs), folded to Σ C(co,2) partials per block so only O(#blocks)
    scalar rows reach the driver; L3 attaches both degree tables to the
    edge list by broadcast-or-hash join and folds per-batch partial sums.
    Everything is exact integer arithmetic until the single cc4 divide."""
    from pagerank_ray.pipelines.triangles import _bucketize_src, _segment_pairs
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import grouped_count, grouped_sum

    edges = lineitem_edges(sf_dir).materialize()
    lp = edges.map_batches(
        lambda t: pa.table({"src": t.column("src_id"), "dst": t.column("dst_id")}),
        batch_format="pyarrow",
    )
    n_buckets = 256

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        o = df["src"].to_numpy(np.int64)
        p = df["dst"].to_numpy(np.int64)
        order = np.lexsort((p, o))
        o, p = o[order], p[order]
        if not len(o):
            return pd.DataFrame(
                {"key": pd.Series(dtype=np.int64), "cnt": pd.Series(dtype=np.int64)}
            )
        if p.max() >= np.int64(1) << 31:
            raise RuntimeError(
                "butterflies: part ids must fit 31 bits for the pair key "
                "encoding — compact ids first (see q_ktruss)"
            )
        starts = np.flatnonzero(np.concatenate([[True], o[1:] != o[:-1]]))
        lengths = np.diff(np.append(starts, len(o)))
        first, second = _segment_pairs(lengths)
        key = (p[first] << 32) | p[second]
        uk, inv = np.unique(key, return_inverse=True)
        return pd.DataFrame({"key": uk, "cnt": np.bincount(inv).astype(np.int64)})

    contribs = (
        lp.map_batches(lambda t: _bucketize_src(t, n_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
    )
    counts = grouped_sum(contribs, "key", "cnt", "n")

    def fold_b(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bf": pa.array([int((n * (n - 1) // 2).sum())], pa.int64()),
                "mx": pa.array([int(n.max()) if len(n) else 0], pa.int64()),
            }
        )

    bparts = counts.map_batches(fold_b, batch_format="pyarrow").to_pandas()
    n_butterflies = int(bparts["bf"].sum())
    max_co = int(bparts["mx"].max()) if len(bparts) else 0

    d_src = grouped_count(edges, "src_id", "d")
    d_dst = grouped_count(edges, "dst_id", "d")
    e2 = joins.attach_column(edges, d_src, probe_col="src_id", build_key="src_id",
                             build_val="d", out_col="do")
    e2 = joins.attach_column(e2, d_dst, probe_col="dst_id", build_key="dst_id",
                             build_val="d", out_col="dp")

    def fold_l3(df: pd.DataFrame) -> pd.DataFrame:
        do = df["do"].to_numpy(np.int64)
        dp = df["dp"].to_numpy(np.int64)
        return pd.DataFrame({"l3": [int(((do - 1) * (dp - 1)).sum())]})

    l3 = int(e2.map_batches(fold_l3, batch_format="pandas").to_pandas()["l3"].sum())
    cc4 = 0.0 if l3 == 0 else float(
        _round_half_away(np.array([4.0 * n_butterflies / l3]), 6)[0]
    )
    return pd.DataFrame(
        {
            "n_butterflies": np.array([n_butterflies], np.int64),
            "n_l3_paths": np.array([l3], np.int64),
            "cc4": [cc4],
            "max_co": np.array([max_co], np.int64),
        }
    )


def q_event_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition matrix of the per-user event stream
    (the clickstream model of Chierichetti et al. 2012 / classic web-usage
    mining): for consecutive events of the same user ordered by
    (ts, event_id), count (cur_type → next_type) and row-normalize:
    p = ROUND(n / Σ_next n, 6). Sorted (cur, next). The matrix is
    |event_types|²-bounded, so the result is contract-sized.

    Shape: events bucket by user hash (each user's stream co-locates);
    per bucket one vectorized lexsort + shifted same-user adjacency mask
    + pair value_counts — partials are ≤ T² rows per bucket, folded by a
    tiny driver-side groupby (T is the event-type vocabulary, single
    digits here; a million-type stream would fold in one more bucketed
    stage, not on the driver)."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        df = df.copy()
        df["bucket"] = (mixed % n_buckets).astype(np.int32)
        return df

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame(
                {"cur": pd.Series(dtype=object), "next": pd.Series(dtype=object),
                 "n": pd.Series(dtype=np.int64)}
            )
        out = (
            pd.DataFrame({"cur": et[:-1][same], "next": et[1:][same]})
            .groupby(["cur", "next"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = (
        ev.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    mat = parts.groupby(["cur", "next"], sort=True)["n"].sum().reset_index()
    tot = mat.groupby("cur")["n"].transform("sum")
    mat["p"] = _round_half_away(
        mat["n"].to_numpy(np.float64) / tot.to_numpy(np.float64), 6
    )
    mat["n"] = mat["n"].astype(np.int64)
    return mat.reset_index(drop=True)


def q_per_source_cap(sf_dir: str, cap: int = 15) -> pd.DataFrame:
    """Per-source document budget (the per-domain cap of RefinedWeb /
    Dolma-style corpus builds — no host may contribute more than ``cap``
    docs): keep each source's ``cap`` lowest-(fmix64(doc_id), doc_id)
    documents — a deterministic uniform draw (the stratified_sample hash
    convention) that every re-run and the oracle reproduce exactly.

    Shape: a per-batch partial selection keeps ≤ cap rows per (batch,
    source) BEFORE the shuffle — the classic top-k combiner — so the
    source-bucketed fold moves O(#batches · cap) rows per source, never
    the full per-host corpus; the fold re-selects the global cap
    smallest. Sorted (source, doc_id)."""
    from pagerank_ray.functions.text import fmix64

    n_buckets = 64
    docs = _read(sf_dir, "documents", ["doc_id", "source"])

    def select(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        h = fmix64(ids.astype(np.uint64))
        order = np.lexsort((ids, h))
        df = pd.DataFrame(
            {"doc_id": ids[order], "source": df["source"].to_numpy()[order],
             "h": h[order]}
        )
        keep = df.groupby("source", sort=False).cumcount() < cap
        return df[keep.to_numpy()]

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        hb = pd.util.hash_array(df["source"].to_numpy(dtype=object))
        df = df.copy()
        df["bucket"] = (hb % np.uint64(n_buckets)).astype(np.int32)
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = select(df[["doc_id", "source"]])
        return out[["doc_id", "source"]]

    kept = (
        docs.map_batches(select, batch_format="pandas")
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    kept["doc_id"] = kept["doc_id"].astype(np.int64)
    return kept


def q_skyline_parts(sf_dir: str) -> pd.DataFrame:
    """2-D skyline / Pareto front (Börzsönyi, Kossmann & Stocker 2001
    "The Skyline Operator"): parts not dominated on (p_retailprice min,
    p_size min) — b dominates a iff b.price ≤ a.price ∧ b.size ≤ a.size
    with at least one strict; exact duplicates are mutually undominated
    and all kept. Sorted (p_retailprice, p_size, p_partkey).

    Shape: the distributive-skyline identity — skyline(S) =
    skyline(∪ skyline(blockᵢ)) — gives an embarrassingly parallel local
    pass (vectorized sort + running-strict-min scan per block, O(B log B))
    whose survivors are Pareto-front-bounded (O(log n) expected for
    independent dims), then ONE single-group fold of the same kernel.
    A loud cap guards the adversarial all-on-the-front case where the
    fold group would not be small (the fix there is a price-range
    partitioned second pass, not silent truncation)."""
    parts = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
    _IMAX = np.iinfo(np.int64).max

    def local_sky(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        price = df["p_retailprice"].to_numpy(np.float64)
        size = df["p_size"].to_numpy(np.int64)
        key = df["p_partkey"].to_numpy(np.int64)
        order = np.lexsort((key, size, price))
        p_s, s_s, k_s = price[order], size[order], key[order]
        grp_start = np.concatenate(([True], p_s[1:] != p_s[:-1]))
        gidx = np.cumsum(grp_start) - 1
        gmin = s_s[np.flatnonzero(grp_start)]  # per-price min size
        mbefore = np.concatenate(([_IMAX], np.minimum.accumulate(gmin)[:-1]))[gidx]
        keep = (s_s < mbefore) & (s_s == gmin[gidx])
        return pd.DataFrame(
            {"p_partkey": k_s[keep], "p_size": s_s[keep],
             "p_retailprice": p_s[keep]}
        )

    def final_sky(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) > 5_000_000:
            raise RuntimeError(
                "skyline fold group exceeds 5M candidates — the front is "
                "not small on this input; use a price-range partitioned "
                "second pass instead"
            )
        return local_sky(df.drop(columns=["one"]))

    cand = parts.map_batches(local_sky, batch_format="pandas").map_batches(
        lambda df: df.assign(one=np.zeros(len(df), np.int8)),
        batch_format="pandas",
    )
    out = (
        cand.groupby("one")
        .map_groups(final_sky, batch_format="pandas")
        .to_pandas()
        .sort_values(["p_retailprice", "p_size", "p_partkey"])
        .reset_index(drop=True)
    )
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    out["p_size"] = out["p_size"].astype(np.int64)
    return out


def q_revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP aggregate: lineitem revenue at three granularities in ONE
    input pass — (returnflag, linestatus), per-returnflag subtotal, grand
    total — the OLAP rollup every reporting pipeline wants without
    re-scanning per level. Group keys use the sentinel 'ALL' for rolled-up
    levels; revenue is rounded to 2dp for hash-stable compare.

    Shape: one map_batches computes per-batch partials for ALL THREE levels
    (a batch emits <= |flags|x|status| + |flags| + 1 rows), so the shuffle
    moves tiny pre-aggregated partials, then one small groupby folds them.
    Oracle: GROUP BY ROLLUP with the same sentinel."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = (df["l_extendedprice"] * (1.0 - df["l_discount"])).to_numpy()
        base = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"].to_numpy(dtype=object),
                "l_linestatus": df["l_linestatus"].to_numpy(dtype=object),
                "rev": rev,
            }
        )
        lvl0 = (
            base.groupby(["l_returnflag", "l_linestatus"], sort=False)["rev"]
            .agg(["sum", "count"]).reset_index()
        )
        lvl1 = lvl0.groupby("l_returnflag", sort=False)[["sum", "count"]].sum().reset_index()
        lvl1["l_linestatus"] = "ALL"
        lvl2 = pd.DataFrame(
            {
                "l_returnflag": ["ALL"],
                "l_linestatus": ["ALL"],
                "sum": [lvl0["sum"].sum()],
                "count": [lvl0["count"].sum()],
            }
        )
        out = pd.concat([lvl0, lvl1, lvl2], ignore_index=True)
        return out[["l_returnflag", "l_linestatus", "sum", "count"]]

    parts = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum", alias_name="revenue"), Sum("count", alias_name="n_rows"))
        .to_pandas()
    )
    if parts.empty:
        # ROLLUP over zero rows still yields the grand-total row (the oracle
        # COALESCEs its SUM to 0, mirroring this)
        parts = pd.DataFrame(
            {"l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
             "revenue": [0.0], "n_rows": [0]}
        )
    parts["revenue"] = parts["revenue"].round(2)
    parts["n_rows"] = parts["n_rows"].astype(np.int64)
    return (
        parts.sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )


def q_orders_events_range(sf_dir: str, window_days: int = 7) -> pd.DataFrame:
    """Interval/range join (custom operator — Ray Data has no range join):
    for each order, the count and value-sum of the SAME customer's events
    with ts in [o_orderdate, o_orderdate + window_days). Orders with no
    in-window events keep (0, 0.0).

    Shape: both tables hash-bucket by the user key into the SAME bucket
    space (one co-partitioning shuffle each, no pairwise join blow-up); per
    bucket ONE sort-merge kernel inserts each order's two window endpoints
    as probe rows into the (user, ts)-sorted event stream and reads
    prefix-count/prefix-sum differences — per-order cost O(log) with zero
    per-order Python. Event values accumulate as exact integer cents
    (running_totals idiom) so the sum is hash-identical to the oracle's.
    Probes sort BEFORE events at equal ts, giving the inclusive-start /
    exclusive-end window on both engines."""
    n_buckets = 64
    win_us = np.int64(window_days) * 86_400_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts", "value"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def prep_ev(t: pa.Table) -> pa.Table:
        from pagerank_ray.stages.temporal import _cents_half_away

        val = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": t.column("user_id"),
                "t": t.column("ts").cast(pa.int64()),
                # half-away cents: DuckDB ROUND ties away from zero, np.round
                # ties to even — the repo-wide cents contract
                "cents": pa.array(_cents_half_away(val)),
                "okey": pa.array(np.full(t.num_rows, -1, np.int64)),
                "kind": pa.array(np.ones(t.num_rows, np.int8)),
            }
        )

    def prep_o(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": t.column("o_custkey").cast(pa.int64()),
                "t": t.column("o_orderdate").cast(pa.int64()),
                "cents": pa.array(np.zeros(t.num_rows, np.int64)),
                "okey": t.column("o_orderkey").cast(pa.int64()),
                "kind": pa.array(np.zeros(t.num_rows, np.int8)),
            }
        )

    def bucketize(t: pa.Table) -> pa.Table:
        u = t.column("u").to_numpy(zero_copy_only=False)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column(
            "bucket", pa.array((mixed % n_buckets).astype(np.int32))
        )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        kind = df["kind"].to_numpy(np.int8)
        is_ev = kind == 1
        eu = df["u"].to_numpy(np.int64)[is_ev]
        ets = df["t"].to_numpy(np.int64)[is_ev]
        ec = df["cents"].to_numpy(np.int64)[is_ev]
        ou = df["u"].to_numpy(np.int64)[~is_ev]
        ot = df["t"].to_numpy(np.int64)[~is_ev]
        okey = df["okey"].to_numpy(np.int64)[~is_ev]
        n_e, n_o = len(eu), len(ou)
        if n_o == 0:
            return pd.DataFrame(
                {"o_orderkey": pd.Series(dtype=np.int64),
                 "n_events": pd.Series(dtype=np.int64),
                 "sum_cents": pd.Series(dtype=np.int64)}
            )
        # merged stream: events (tag 1) + start probes + end probes (tag 0);
        # tag sorts probes before events at equal (u, t) => F(t) counts
        # strictly-earlier events, giving [start, end) window semantics
        allu = np.concatenate([eu, ou, ou])
        allt = np.concatenate([ets, ot, ot + win_us])
        tag = np.concatenate(
            [np.ones(n_e, np.int8), np.zeros(2 * n_o, np.int8)]
        )
        cents = np.concatenate([ec, np.zeros(2 * n_o, np.int64)])
        order = np.lexsort((tag, allt, allu))
        pos_of = np.empty(len(order), np.int64)
        pos_of[order] = np.arange(len(order), dtype=np.int64)
        cum_n = np.cumsum(tag[order].astype(np.int64))
        cum_c = np.cumsum(cents[order])
        f0 = pos_of[n_e : n_e + n_o]
        f1 = pos_of[n_e + n_o :]
        return pd.DataFrame(
            {
                "o_orderkey": okey,
                "n_events": cum_n[f1] - cum_n[f0],
                "sum_cents": cum_c[f1] - cum_c[f0],
            }
        )

    merged = (
        ev.map_batches(prep_ev, batch_format="pyarrow")
        .union(orders.map_batches(prep_o, batch_format="pyarrow"))
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
        .to_pandas()
    )
    if merged.empty:  # zero orders anywhere -> schema-less empty frame
        merged = pd.DataFrame(
            {"o_orderkey": pd.Series(dtype=np.int64),
             "n_events": pd.Series(dtype=np.int64),
             "sum_cents": pd.Series(dtype=np.int64)}
        )
    merged["sum_value"] = (merged["sum_cents"] / 100.0).round(2)
    for c in ("o_orderkey", "n_events"):
        merged[c] = merged[c].astype(np.int64)
    return (
        merged[["o_orderkey", "n_events", "sum_value"]]
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


def q_key_skew(sf_dir: str, col: str = "l_partkey", topn: int = 10) -> pd.DataFrame:
    """Partition-key skew profile — the diagnostic a 100 TB shuffle plan
    starts from: per candidate key, the group-size distribution that decides
    whether a groupby/join on it needs salting. Reports one row per top-N
    heavy key (rank, key, count) plus summary rows: n_keys, n_rows, max/p50
    group size, and the share of rows owned by the top-N keys in basis
    points (exact integers — no float skew ratio to drift).

    Shape: per-batch bincount partials → ONE bucketed grouped_count shuffle →
    top-N via distributed sort/limit; the p50 reuses the exact distributed
    quantile idiom over the (small) per-key count table. Oracle: window/CTE
    mirror in DuckDB."""
    from pagerank_ray.stages.graph_build import grouped_count
    from pagerank_ray.stages.quantiles import exact_quantile_disc

    ds = _read(sf_dir, "lineitem", [col])
    counts = grouped_count(
        ds.map_batches(
            lambda t: pa.table({"k": t.column(col)}), batch_format="pyarrow"
        ),
        "k",
        "cnt",
    ).materialize()
    n_keys = counts.count()
    if n_keys == 0:
        # zero-row table: summary rows with zeros, no top keys (the oracle
        # COALESCEs its aggregates to the same zeros)
        top = pd.DataFrame({"k": pd.Series(dtype=np.int64),
                            "cnt": pd.Series(dtype=np.int64)})
        n_rows = max_cnt = p50 = 0
    else:
        top = (
            counts.sort(["cnt", "k"], descending=[True, False])
            .limit(topn)
            .to_pandas()
        )
        agg = counts.aggregate(
            Sum("cnt", alias_name="n_rows"), Max("cnt", alias_name="max_cnt")
        )
        n_rows = int(agg["n_rows"])
        max_cnt = int(agg["max_cnt"])
        # exact p50 of the per-key count distribution (distributed sort +
        # block-offset scalar fetch — matches DuckDB quantile_disc(0.5))
        p50 = int(exact_quantile_disc(counts, "cnt", 0.5))
    top_share_bp = int(top["cnt"].sum()) * 10_000 // n_rows if n_rows else 0
    rows = [
        ("top_key", int(r.k), int(r.cnt)) for r in top.itertuples(index=False)
    ]
    rows += [
        ("n_keys", -1, n_keys),
        ("n_rows", -1, n_rows),
        ("max_group", -1, max_cnt),
        ("p50_group", -1, p50),
        ("topn_share_bp", -1, top_share_bp),
    ]
    out = pd.DataFrame(rows, columns=["stat", "key", "value"])
    out["key"] = out["key"].astype(np.int64)
    out["value"] = out["value"].astype(np.int64)
    return out.sort_values(["stat", "value", "key"]).reset_index(drop=True)


def q_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix over the event log: users cohorted by the
    integer epoch-week of their FIRST event; one row per (cohort_week,
    week_offset) with the distinct users active that week. Weeks are plain
    ``epoch_us // 7d`` integers (identical arithmetic on both engines — no
    calendar alignment to disagree on).

    Shape: user-bucketed kernel computes each user's first-event week and
    the user's distinct active weeks in ONE pass (sorted arrays +
    change-points), emits (cohort, offset) partials pre-counted per bucket —
    users are partitioned by bucket, so partial distinct-user counts sum
    exactly; one tiny final groupby. Oracle: MIN-over-user CTE + DISTINCT
    join in DuckDB."""
    n_buckets = 64
    week_us = np.int64(7) * 86_400_000_000
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        u = t.column("user_id").to_numpy(zero_copy_only=False)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return pa.table(
            {
                "u": pa.array(u),
                "week": pa.array(ts // week_us),
                "bucket": pa.array((mixed % n_buckets).astype(np.int32)),
            }
        )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(np.int64)
        w = df["week"].to_numpy(np.int64)
        order = np.lexsort((w, u))
        u, w = u[order], w[order]
        if not len(u):
            return pd.DataFrame(
                {"cohort_week": pd.Series(dtype=np.int64),
                 "week_offset": pd.Series(dtype=np.int64),
                 "n_users": pd.Series(dtype=np.int64)}
            )
        # distinct (user, week) rows via change-points on the sorted arrays
        first = np.concatenate([[True], (u[1:] != u[:-1]) | (w[1:] != w[:-1])])
        u, w = u[first], w[first]
        ustart = np.concatenate([[True], u[1:] != u[:-1]])
        starts = np.flatnonzero(ustart)
        lengths = np.diff(np.append(starts, len(u)))
        cohort = np.repeat(w[starts], lengths)  # per-user first week
        offset = w - cohort
        key = np.stack([cohort, offset], axis=1)
        uk, inv = np.unique(key, axis=0, return_inverse=True)
        return pd.DataFrame(
            {
                "cohort_week": uk[:, 0],
                "week_offset": uk[:, 1],
                "n_users": np.bincount(inv).astype(np.int64),
            }
        )

    parts = (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(kernel, batch_format="pandas")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame(
            {"cohort_week": pd.Series(dtype=np.int64),
             "week_offset": pd.Series(dtype=np.int64),
             "n_users": pd.Series(dtype=np.int64)}
        )
    out = (
        parts.groupby(["cohort_week", "week_offset"], sort=True)["n_users"]
        .sum()
        .reset_index()
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)


def q_two_hop_reach(sf_dir: str, max_degree: int = 64) -> pd.DataFrame:
    """Per-vertex 2-hop neighborhood size (friend-of-friend reach) over the
    undirected simple lineitem graph: |{x != v : x adjacent to v, or x and v
    share a common neighbor of degree <= max_degree}|. The hub cap is part
    of the operator contract (a hub center contributes O(deg^2) wedge pairs;
    the oracle mirrors the identical cap) — the standard published guard for
    neighborhood-function estimates.

    Shape: the adjacency buckets by CENTER hash (adamic_adar idiom — segment
    length IS the degree, no degree join); each qualifying center emits its
    neighbor pairs in both directions via the segment-pair kernel; the union
    with the direct adjacency dedups in the bucketed pair-dedup and ONE
    grouped_count finishes. At true scale the exact distinct-pair dedup is
    the dominant exchange; the HLL register path (stages/sketch.py,
    Boldi-Vigna HyperBall) is the documented approximate alternative."""
    from pagerank_ray.pipelines.triangles import _segment_pairs

    n_buckets = 64
    # materialized: und feeds BOTH the adjacency and the direct reach pairs
    und = _undirected_simple(lineitem_edges(sf_dir)).materialize()
    adj = und.map_batches(_adj_both_dirs, batch_format="pyarrow")

    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        v = df["v"].to_numpy(np.int64)
        x = df["x"].to_numpy(np.int64)
        order = np.lexsort((x, v))
        v, x = v[order], x[order]
        if not len(v):
            return pd.DataFrame(
                {"src_id": pd.Series(dtype=np.int64),
                 "dst_id": pd.Series(dtype=np.int64)}
            )
        starts = np.flatnonzero(np.concatenate([[True], v[1:] != v[:-1]]))
        lengths = np.diff(np.concatenate([starts, [len(v)]]))
        keep = (lengths >= 2) & (lengths <= max_degree)
        if not keep.any():
            return pd.DataFrame(
                {"src_id": pd.Series(dtype=np.int64),
                 "dst_id": pd.Series(dtype=np.int64)}
            )
        xk = x[np.repeat(keep, lengths)]
        first, second = _segment_pairs(lengths[keep])
        # CANONICAL pairs only (half the dedup shuffle), pre-deduped within
        # the bucket (wedges through different centers repeat pairs)
        lo = np.minimum(xk[first], xk[second])
        hi = np.maximum(xk[first], xk[second])
        uniq = np.unique(np.stack([lo, hi], axis=1), axis=0)
        return pd.DataFrame({"src_id": uniq[:, 0], "dst_id": uniq[:, 1]})

    wedges = (
        adj.map_batches(lambda t: _bucket_by_v(t, n_buckets), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(wedge_pairs, batch_format="pandas")
    )
    # und is already canonical distinct pairs — union, dedup once, then
    # credit BOTH endpoints of every canonical reach pair
    reach_pairs = dedup_pairs(wedges.union(und))
    counts = grouped_count(
        reach_pairs.map_batches(
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
        ),
        "id",
        "reach2",
    )
    df = counts.to_pandas()
    for c in ("id", "reach2"):
        df[c] = df[c].astype(np.int64)
    return df.sort_values("id").reset_index(drop=True)


def _export_events_subset(sf_dir: str, fmt: str) -> str:
    """Deterministic one-time export of (event_id, user_id, event_type) to
    CSV/JSONL under the shared workdir (int/string columns only — no float
    text round-trip); returns the directory. Cached per EVENTS-file
    fingerprint via the shared _graph_workdir keying."""
    import shutil

    out_dir = _graph_workdir(sf_dir, f"events_{fmt}", src_file="events.parquet")
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        return out_dir
    tmp = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        ds = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])
        if fmt == "csv":
            ds.write_csv(tmp)
        elif fmt == "orc":
            from pagerank_ray.sources.orc import write_orc

            write_orc(ds, tmp)
        elif fmt == "ipc":
            from pagerank_ray.sources.ipc import write_ipc

            write_ipc(ds, tmp)
        elif fmt == "jsonl_gz":
            import gzip

            ds.write_json(tmp)
            # one-time driver-side recompression of the exported shards
            # (conformance path; corpus-scale gz writing would be a sink)
            for name in os.listdir(tmp):
                if not name.endswith(".json"):
                    continue
                src = os.path.join(tmp, name)
                with open(src, "rb") as fin, gzip.open(src + ".gz", "wb") as fout:
                    fout.write(fin.read())
                os.remove(src)
        else:
            ds.write_json(tmp)
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write("ok")
        try:
            os.rename(tmp, out_dir)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)  # racing builder lost
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)  # never leak a partial export
        raise
    return out_dir


def _source_roundtrip(sf_dir: str, fmt: str) -> pd.DataFrame:
    """Shared body of q_csv_source / q_jsonl_source: export → read back via
    the format's native Ray Data reader → per-type aggregate (count, distinct
    users, min/max event id)."""
    path = _export_events_subset(sf_dir, fmt)
    # materialized: the per-type aggregate and the distinct-users pass both
    # consume it — one file read/decode, not two
    if fmt == "orc":
        from pagerank_ray.sources.orc import read_orc

        ds = read_orc(path).materialize()
    elif fmt == "ipc":
        from pagerank_ray.sources.ipc import read_ipc

        ds = read_ipc(path).materialize()
    elif fmt == "jsonl_gz":
        ds = rd.read_json(
            path, file_extensions=["gz"],
            arrow_open_stream_args={"compression": "gzip"},
        ).materialize()
    else:
        reader = rd.read_csv if fmt == "csv" else rd.read_json
        ds = reader(
            path, file_extensions=["csv" if fmt == "csv" else "json"]
        ).materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False).agg(
            n=("event_id", "size"),
            min_id=("event_id", "min"),
            max_id=("event_id", "max"),
        ).reset_index()
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("event_type", sort=True).agg(
        n_events=("n", "sum"), min_id=("min_id", "min"), max_id=("max_id", "max")
    ).reset_index()
    # distinct users per type: user-hash bucketed (a user lives in exactly
    # one bucket, so per-bucket distinct counts sum exactly — only tiny
    # per-type partials reach the driver, never the pair set)
    n_buckets = 32

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        p = df[["event_type", "user_id"]].drop_duplicates().copy()
        u = p["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        p["bucket"] = (mixed % n_buckets).astype(np.int32)
        return p

    def bucket_counts(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["event_type", "user_id"]].drop_duplicates()
        g = d.groupby("event_type", sort=False).size().reset_index(name="nu")
        return g

    nu_parts = (
        ds.map_batches(pair_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .to_pandas()
    )
    nu = nu_parts.groupby("event_type", sort=True)["nu"].sum().reset_index()
    out = out.merge(nu.rename(columns={"nu": "n_users"}), on="event_type")
    for c in ("n_events", "min_id", "max_id", "n_users"):
        out[c] = out[c].astype(np.int64)
    return out[["event_type", "n_events", "n_users", "min_id", "max_id"]].reset_index(drop=True)


def q_csv_source(sf_dir: str) -> pd.DataFrame:
    """CSV source conformance (SURVEY §2.1 family): the events subset is
    exported once to CSV (int/string columns — no float text round-trip),
    read back through ``ray.data.read_csv``, and aggregated per event type.
    The oracle computes the same aggregate over the original parquet — a
    lossy reader would hash-mismatch."""
    return _source_roundtrip(sf_dir, "csv")


def q_jsonl_source(sf_dir: str) -> pd.DataFrame:
    """JSONL source conformance: same round-trip through ``ray.data.read_json``."""
    return _source_roundtrip(sf_dir, "jsonl")


def q_jsonl_gz_source(sf_dir: str) -> pd.DataFrame:
    """Gzip-compressed JSONL source conformance (the format web corpora
    actually ship in — WET/WARC derivatives are .gz): same round-trip, the
    read decompresses inside ``ray.data.read_json`` workers via
    ``arrow_open_stream_args={'compression': 'gzip'}`` — distributed
    decode, no driver-side decompression on the read path."""
    return _source_roundtrip(sf_dir, "jsonl_gz")


def q_orc_source(sf_dir: str) -> pd.DataFrame:
    """ORC source/sink conformance: the events subset is written to ORC by
    the engine's custom distributed datasink (sources/orc.py — one file per
    block) and read back through its stripe-streaming FileBasedDatasource,
    then aggregated per event type against the same parquet oracle. Ray Data
    ships no ORC connector; this exercises the PUBLIC custom-connector
    surface end-to-end."""
    return _source_roundtrip(sf_dir, "orc")


def q_ipc_source(sf_dir: str) -> pd.DataFrame:
    """Arrow IPC (Feather v2) source/sink conformance: the events subset is
    written by the engine's distributed IPC datasink (sources/ipc.py — one
    file per block) and read back record-batch-streaming through its
    FileBasedDatasource, then aggregated per event type against the same
    parquet oracle. Ray Data ships no IPC connector; this exercises the
    PUBLIC custom-connector surface over Arrow's own interchange format."""
    return _source_roundtrip(sf_dir, "ipc")


def _exploded_tokens(df: pd.DataFrame, id_col: str | None = None):
    """Vectorized whitespace tokenize of df['text'] (shared by the PMI and
    perplexity counts): returns (flat token object array, valid mask, rep)
    where rep repeats df[id_col] (or the positional row index when id_col is
    None) once per token; empty docs contribute ONE invalid placeholder row
    so the repeat lengths stay aligned."""
    toks = df["text"].fillna("").str.split()
    n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
    flat = toks.explode(ignore_index=True)
    valid = flat.notna().to_numpy()
    base = (
        df[id_col].to_numpy(np.int64)
        if id_col
        else np.arange(len(df), dtype=np.int64)
    )
    rep = np.repeat(base, np.maximum(n_tok, 1))
    return flat.to_numpy(dtype=object), valid, rep


def q_perplexity_filter(sf_dir: str, force_hash_path: bool = False) -> pd.DataFrame:
    """CCNet-style perplexity scoring: train an add-one-smoothed bigram LM on
    the corpus itself, then score every document's mean negative
    log-likelihood — the classic LM-based quality filter (docs scoring far
    above the corpus norm are boilerplate/gibberish candidates). Per adjacent
    token pair: term = -ln((c(w1 w2) + 1) / (c(w1) + V)); nll = mean(term);
    docs with < 2 tokens are excluded (no pairs to score).

    Shape: the documents read materializes ONCE (three passes share the
    decode); unigram/bigram counts use the pmi_topk idiom (per-batch value
    counts, one row per DISTINCT key per batch, hash-bucket merge). When the
    merged count tables fit joins.BROADCAST_LIMIT they broadcast once and
    the scoring pass is one map_batches with C-level pandas merges; beyond
    the limit — bigram cardinality is corpus-bounded, not vocab-bounded —
    the counts stay Datasets and attach by hash join, with per-doc partial
    (n, sum) rows combined in a doc-bucketed groupby (float sum order then
    differs from the oracle's by ~1e-12; the shared ROUND(…, 6) absorbs it,
    the adamic_adar contract). ``force_hash_path`` pins the scale path for
    tests."""
    from pagerank_ray.stages import joins

    n_buckets = 64
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        w, valid, _ = _exploded_tokens(df)
        if not valid.any():
            return pd.DataFrame({"tk": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype=np.int64)})
        vc = pd.Series(w[valid]).value_counts()
        return pd.DataFrame({"tk": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy(np.int64)})

    def big_partial(df: pd.DataFrame) -> pd.DataFrame:
        w, valid, rep = _exploded_tokens(df)
        empty = pd.DataFrame({"w1": pd.Series(dtype=object),
                              "w2": pd.Series(dtype=object),
                              "cnt": pd.Series(dtype=np.int64)})
        if len(w) < 2:
            return empty
        m = valid[:-1] & valid[1:] & (rep[:-1] == rep[1:])
        if not m.any():
            return empty
        pairs = pd.DataFrame({"w1": w[:-1][m], "w2": w[1:][m]})
        out = pairs.groupby(["w1", "w2"], sort=False).size().reset_index(name="cnt")
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    def bucketize_on(cols):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            key = df[cols[0]].astype(str)
            for c in cols[1:]:
                key = key + "\x1f" + df[c].astype(str)
            h = pd.util.hash_array(key.to_numpy(dtype=object))
            df = df.copy()
            df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
            return df
        return f

    def merge_on(cols):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(cols, sort=False)["cnt"].sum().reset_index()
            out["cnt"] = out["cnt"].astype(np.int64)
            return out
        return f

    uni_ds = (
        ds.map_batches(uni_partial, batch_format="pandas")
        .map_batches(bucketize_on(["tk"]), batch_format="pandas")
        .groupby("bucket").map_groups(merge_on(["tk"]), batch_format="pandas")
        .materialize()
    )
    big_ds = (
        ds.map_batches(big_partial, batch_format="pandas")
        .map_batches(bucketize_on(["w1", "w2"]), batch_format="pandas")
        .groupby("bucket").map_groups(merge_on(["w1", "w2"]), batch_format="pandas")
        .materialize()
    )
    v_size = uni_ds.count()
    n_big = big_ds.count()

    def doc_pairs(df: pd.DataFrame) -> pd.DataFrame:
        w, valid, rep = _exploded_tokens(df, "doc_id")
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "w1": pd.Series(dtype=object),
                              "w2": pd.Series(dtype=object)})
        if len(w) < 2:
            return empty
        m = valid[:-1] & valid[1:] & (rep[:-1] == rep[1:])
        if not m.any():
            return empty
        return pd.DataFrame({"doc_id": rep[:-1][m], "w1": w[:-1][m], "w2": w[1:][m]})

    if v_size + n_big <= joins.BROADCAST_LIMIT and not force_hash_path:
        import ray

        uni_ref = ray.put(uni_ds.to_pandas())
        big_ref = ray.put(big_ds.to_pandas())

        def score(df: pd.DataFrame) -> pd.DataFrame:
            u = joins.broadcast_get(uni_ref, lambda x: x, "ppl-uni")
            b = joins.broadcast_get(big_ref, lambda x: x, "ppl-big")
            pr = doc_pairs(df)
            if pr.empty:
                return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                     "n_pairs": pd.Series(dtype=np.int64),
                                     "nll": pd.Series(dtype=np.float64)})
            pr = pr.merge(b, on=["w1", "w2"], how="left").rename(columns={"cnt": "bc"})
            pr = pr.merge(u.rename(columns={"tk": "w1"}), on="w1", how="left").rename(
                columns={"cnt": "uc"})
            bc = pr["bc"].fillna(0).to_numpy(np.int64)
            uc = pr["uc"].fillna(0).to_numpy(np.int64)
            term = -np.log((bc + 1.0) / (uc + float(v_size)))
            g = pd.DataFrame({"doc_id": pr["doc_id"].to_numpy(np.int64), "term": term})
            agg = g.groupby("doc_id", sort=False)["term"].agg(["size", "sum"]).reset_index()
            return pd.DataFrame({
                "doc_id": agg["doc_id"].to_numpy(np.int64),
                "n_pairs": agg["size"].to_numpy(np.int64),
                "nll": agg["sum"].to_numpy(np.float64) / agg["size"].to_numpy(np.float64),
            })

        out = ds.map_batches(score, batch_format="pandas").to_pandas()
    else:
        # scale path: the count tables never reach the driver — hash-join
        # attaches on an encoded pair key, then per-doc partials combine in
        # a doc-bucketed groupby (docs scatter across blocks after the join)
        pairs = ds.map_batches(
            lambda df: doc_pairs(df).assign(
                bkey=lambda d: d["w1"].astype(str) + "\x1f" + d["w2"].astype(str)
            ),
            batch_format="pandas",
        )
        big_keyed = big_ds.map_batches(
            lambda df: pd.DataFrame({
                "bkey": df["w1"].astype(str) + "\x1f" + df["w2"].astype(str),
                "cnt": df["cnt"].to_numpy(np.int64),
            }),
            batch_format="pandas",
        )
        tagged = joins.attach_with_default(
            pairs, big_keyed, probe_col="bkey", build_key="bkey", build_val="cnt",
            out_col="bc", default=0, build_count=n_big,
        )
        tagged = joins.attach_column(
            tagged, uni_ds, probe_col="w1", build_key="tk", build_val="cnt",
            out_col="uc", build_count=v_size,
        )

        def partial_score(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                     "n": pd.Series(dtype=np.int64),
                                     "s": pd.Series(dtype=np.float64)})
            bc = df["bc"].to_numpy(np.int64)
            uc = df["uc"].to_numpy(np.int64)
            term = -np.log((bc + 1.0) / (uc + float(v_size)))
            g = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64), "term": term})
            agg = g.groupby("doc_id", sort=False)["term"].agg(["size", "sum"]).reset_index()
            return pd.DataFrame({"doc_id": agg["doc_id"].to_numpy(np.int64),
                                 "n": agg["size"].to_numpy(np.int64),
                                 "s": agg["sum"].to_numpy(np.float64)})

        def bucket_doc(df: pd.DataFrame) -> pd.DataFrame:
            u = df["doc_id"].to_numpy(np.int64)
            mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
            df = df.copy()
            df["bucket"] = (mixed % n_buckets).astype(np.int32)
            return df

        def combine(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("doc_id", sort=False)[["n", "s"]].sum().reset_index()
            return pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "n_pairs": g["n"].to_numpy(np.int64),
                "nll": g["s"].to_numpy(np.float64) / g["n"].to_numpy(np.float64),
            })

        out = (
            tagged.map_batches(partial_score, batch_format="pandas")
            .map_batches(bucket_doc, batch_format="pandas")
            .groupby("bucket")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()
        )
    if out.empty:
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "n_pairs": pd.Series(dtype=np.int64),
                             "nll": pd.Series(dtype=np.float64)})
    out["nll"] = _round_half_away(out["nll"], 6)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_partitioned_sink(sf_dir: str) -> pd.DataFrame:
    """Partitioned-parquet sink conformance (the resumable-output contract:
    one directory per partition key, so a failed run skips finished
    partitions): documents write once partitioned by source
    (``write_parquet(partition_cols=...)``), read back through the
    partitioned reader, and aggregate per source. The oracle computes the
    same aggregate over the original table — a sink that drops, duplicates,
    or mis-buckets rows hash-mismatches."""
    import shutil

    out_dir = _graph_workdir(sf_dir, "docs_bysource", src_file="documents.parquet")
    marker = os.path.join(out_dir, "_DONE")
    if not os.path.exists(marker):
        tmp = f"{out_dir}.tmp.{os.getpid()}"
        shutil.rmtree(tmp, ignore_errors=True)
        try:
            _read(sf_dir, "documents", ["doc_id", "source", "n_chars"]).write_parquet(
                tmp, partition_cols=["source"]
            )
            with open(os.path.join(tmp, "_DONE"), "w") as f:
                f.write("ok")
            try:
                os.rename(tmp, out_dir)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)  # racing builder lost
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
    ds = rd.read_parquet(out_dir, file_extensions=["parquet"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", sort=False).agg(
            n=("doc_id", "size"), sum_chars=("n_chars", "sum"),
            min_id=("doc_id", "min"), max_id=("doc_id", "max"),
        ).reset_index()
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("source", sort=True).agg(
        n_docs=("n", "sum"), sum_chars=("sum_chars", "sum"),
        min_id=("min_id", "min"), max_id=("max_id", "max"),
    ).reset_index()
    # partition_cols round-trips the key as a dictionary/category column
    out["source"] = out["source"].astype(str)
    for c in ("n_docs", "sum_chars", "min_id", "max_id"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


def q_dedup_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """Dedup report: the cluster-size histogram of the MinHash-LSH near-dup
    clusters (how much of the corpus is singletons vs heavy dup groups —
    the summary every dedup run is judged by). Composes the minhash pipeline
    with two bucketed grouped counts (the partial stage only reads the key
    column, so no projection hop is needed); the cluster table is shared
    with q_minhash_dedup via the disk cache. The oracle wraps the full
    minhash SQL reimplementation in the same two aggregations."""
    from pagerank_ray.stages.graph_build import grouped_count

    clusters = _minhash_clusters_cached(sf_dir)
    sizes = grouped_count(clusters, "cluster_id", "cluster_size")
    hist = grouped_count(sizes, "cluster_size", "n_clusters").to_pandas()
    for c in ("cluster_size", "n_clusters"):
        hist[c] = hist[c].astype(np.int64)
    return hist.sort_values("cluster_size").reset_index(drop=True)


def host_edges(sf_dir: str, hmod: int = 101) -> rd.Dataset:
    """Contracted (coarsened) weighted edge table: host(v) = v % hmod over
    the deduplicated lineitem graph, edge weight = number of distinct
    original edges between the two host groups (self-loops kept — a host
    linking within itself is real mass in a host-level graph). This is the
    web-scale graph-coarsening step (page graph → host graph): the
    contraction itself is the distributed operation (one grouped pair-sum
    over the full edge table); the contracted graph is orders of magnitude
    smaller and everything downstream runs on it."""
    from pagerank_ray.stages.graph_build import grouped_pair_sum

    edges = lineitem_edges(sf_dir)

    def contract(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False) % hmod
        d = t.column("dst_id").to_numpy(zero_copy_only=False) % hmod
        return pa.table(
            {
                "src_id": pa.array(s, pa.int64()),
                "dst_id": pa.array(d, pa.int64()),
                "weight": pa.array(np.ones(len(s), dtype=np.float64)),
            }
        )

    return grouped_pair_sum(edges.map_batches(contract, batch_format="pyarrow"))


def q_host_pagerank(
    sf_dir: str, n_workers: int = 2, iters: int = 20, hmod: int = 101
) -> pd.DataFrame:
    """Host-level PageRank: coarsen the page graph by host (here host(v) =
    v % hmod stands in for the url→host map) and run WEIGHTED PageRank on
    the contracted multigraph — the standard first cut of web link analysis
    at 100 TB (a 10^12-page graph contracts to a ~10^7-host graph that fits
    anywhere; the expensive distributed step is the single grouped pair-sum
    in host_edges). Edge weights are integer pair-counts, so per-source
    totals and the row normalization are exact in any summation order —
    bit-identical to the unrolled DuckDB oracle
    (__ray_entry__._pagerank_weighted_sql with the contracted edge CTE)."""
    return _weighted_pagerank_over(
        sf_dir,
        f"host{hmod}",
        f"host{hmod}",
        lambda: host_edges(sf_dir, hmod),
        n_workers=n_workers,
        iters=iters,
        id_col="host",
    )


def q_reciprocity(sf_dir: str) -> pd.DataFrame:
    """Directed-edge reciprocity of the lineitem graph (the classic link-graph
    health metric: what fraction of edges u→v have the reverse edge v→u).
    One grouped pair-sum over canonical (min, max) endpoint pairs with a
    direction mask as the weight (1 = forward, 2 = backward, 4 = self-loop;
    the edge table is pre-deduplicated so each direction contributes once and
    the per-pair sum ∈ {1, 2, 3, 4} classifies the pair), then O(1)-row
    per-batch partials — nothing larger than three counters ever reaches the
    driver. Self-loops are excluded from the reciprocity denominator per the
    standard definition."""
    from pagerank_ray.stages.graph_build import grouped_pair_sum

    edges = lineitem_edges(sf_dir)

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        m = np.where(s == d, 4.0, np.where(s < d, 1.0, 2.0))
        return pa.table(
            {
                "src_id": pa.array(np.minimum(s, d), pa.int64()),
                "dst_id": pa.array(np.maximum(s, d), pa.int64()),
                "weight": pa.array(m),
            }
        )

    pairs = grouped_pair_sum(edges.map_batches(canon, batch_format="pyarrow"))

    def partial(t: pa.Table) -> pa.Table:
        m = t.column("weight").to_numpy(zero_copy_only=False)
        n_recip_pairs = int((m == 3.0).sum())
        n_edges = int((m == 1.0).sum() + (m == 2.0).sum()) + 2 * n_recip_pairs
        return pa.table(
            {
                "n_edges": pa.array([n_edges], pa.int64()),
                "n_self_loops": pa.array([int((m == 4.0).sum())], pa.int64()),
                "n_reciprocal": pa.array([2 * n_recip_pairs], pa.int64()),
            }
        )

    parts = pairs.map_batches(partial, batch_format="pyarrow").to_pandas()
    n_edges = int(parts["n_edges"].sum())
    n_recip = int(parts["n_reciprocal"].sum())
    rec = 0.0 if n_edges == 0 else float(_round_half_away(n_recip / n_edges, 6))
    return pd.DataFrame(
        {
            "n_edges": pd.array([n_edges], dtype=np.int64),
            "n_self_loops": pd.array([int(parts["n_self_loops"].sum())], dtype=np.int64),
            "n_reciprocal": pd.array([n_recip], dtype=np.int64),
            "reciprocity": [rec],
        }
    )


def q_rich_club(sf_dir: str, ks: tuple = (1, 2, 4, 8, 16, 32)) -> pd.DataFrame:
    """Rich-club coefficient profile (Zhou & Mondragón 2004, directed
    generalization): for each degree threshold k, φ(k) = E_>k / (N_k·(N_k−1))
    where N_k = |{v : deg(v) > k}| (total degree in+out over the deduplicated
    directed edge table) and E_>k = directed non-self-loop edges with both
    endpoints in that set. Measures whether hub pages preferentially link to
    each other — the classic web-graph core-density diagnostic.

    Scale shape: degrees via the bucketed two-stage count (grouped_count),
    attached to edges with the broadcast-or-hash join (stages/joins.py); each
    batch then reduces to len(ks) counters, so only O(#batches × #ks) rows
    reach the driver — never O(V) or O(E)."""
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import grouped_count

    edges = lineitem_edges(sf_dir).materialize()
    karr = np.asarray(sorted(ks), np.int64)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": pa.concat_arrays(
                    [
                        t.column("src_id").combine_chunks().cast(pa.int64()),
                        t.column("dst_id").combine_chunks().cast(pa.int64()),
                    ]
                )
            }
        )

    degs = grouped_count(
        edges.map_batches(endpoints, batch_format="pyarrow"), "id", "deg"
    ).materialize()

    def n_partial(t: pa.Table) -> pa.Table:
        d = t.column("deg").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(karr),
                "c": pa.array((d[None, :] > karr[:, None]).sum(axis=1), pa.int64()),
            }
        )

    n_rich = (
        degs.map_batches(n_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("k")["c"]
        .sum()
    )

    es = joins.attach_column(edges, degs, probe_col="src_id", build_key="id",
                             build_val="deg", out_col="deg_s")
    es = joins.attach_column(es, degs, probe_col="dst_id", build_key="id",
                             build_val="deg", out_col="deg_d")

    def e_partial(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        a = t.column("deg_s").to_numpy(zero_copy_only=False)
        b = t.column("deg_d").to_numpy(zero_copy_only=False)
        keep = s != d  # self-loops never count toward club density
        both = (a[None, :] > karr[:, None]) & (b[None, :] > karr[:, None])
        return pa.table(
            {
                "k": pa.array(karr),
                "c": pa.array((both & keep[None, :]).sum(axis=1), pa.int64()),
            }
        )

    e_rich = (
        es.map_batches(e_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("k")["c"]
        .sum()
    )

    nk = n_rich.reindex(karr, fill_value=0).to_numpy(np.int64)
    ek = e_rich.reindex(karr, fill_value=0).to_numpy(np.int64)
    phi = np.where(
        nk < 2, 0.0, _round_half_away(ek / np.maximum(nk * (nk - 1), 1), 6)
    )
    return pd.DataFrame(
        {
            "k": karr,
            "n_rich": nk,
            "e_rich": ek,
            "phi": phi,
        }
    )


def q_spam_mass(sf_dir: str, n_workers: int = 4, iters: int = 20, mod: int = 97) -> pd.DataFrame:
    """Relative spam mass (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2006,
    'Link Spam Detection Based on Mass Estimation'): m(v) = (p(v) − p′(v)) /
    p(v) where p is uniform-teleport PageRank and p′ is PageRank personalized
    to a trusted core (here the mod-97 seed rule shared with
    q_pagerank_personalized) — rank mass NOT reachable from trusted pages is
    suspected spam. Composes the two cached-CSR PageRank runs (the second run
    reuses every graph artifact) and a driver-side join of the two bounded
    per-vertex results; both inputs are the 6-decimal-rounded hash-checked
    vectors, so the quotient is bit-identical to the SQL oracle's
    (__ray_entry__._spam_mass_sql composes the two unrolled CTEs). p ≥ 1−α
    in the mass-n scale, so the division is always defined."""
    pr = q_pagerank_fixed(sf_dir, n_workers=n_workers, iters=iters)
    ppr = q_pagerank_personalized(sf_dir, n_workers=n_workers, iters=iters, mod=mod)
    df = pr.rename(columns={"rank": "pr"}).merge(
        ppr.rename(columns={"rank": "ppr"}), on="id", validate="1:1"
    )
    df["spam_mass"] = _round_half_away((df["pr"] - df["ppr"]) / df["pr"], 6)
    return df.sort_values("id").reset_index(drop=True)[["id", "pr", "ppr", "spam_mass"]]


def q_source_quality_report(sf_dir: str) -> pd.DataFrame:
    """Per-source corpus health report — the rollup every ingest run is
    judged by: document count, exact-duplicate rate (distinct md5 text
    fingerprints, the q_exact_dedup_docs idiom), mean length, language
    spread. ONE distinct-pair shuffle (source, md5) sized by distinct texts
    is the only pass that reads the text column; counts/sums/langs come from
    a single fused per-batch partial over a text-free projection (rows per
    batch ≤ sources × langs), merged on the driver — the same bounded
    contract as q_partitioned_sink."""
    from pagerank_ray.functions import text as textfn

    ds = _read(sf_dir, "documents", ["text", "source"])
    meta = _read(sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"])

    def fp_pairs(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t.column("source").to_pandas(),
                "h": textfn.md5_hex(t.column("text").to_pandas()),
            }
        ).drop_duplicates()
        return pa.table(
            {"source": pa.array(df["source"], pa.string()), "h": pa.array(df["h"], pa.string())}
        )

    from ray.data.aggregate import Count

    distinct = (
        ds.map_batches(fp_pairs, batch_format="pyarrow")
        .groupby(["source", "h"])
        .aggregate(Count(alias_name="n"))
    )

    def count_partial(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame({"source": t.column("source").to_pandas()})
            .groupby("source", sort=False)
            .size()
            .reset_index(name="n_distinct")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    nd = (
        distinct.map_batches(count_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("source", sort=True)["n_distinct"]
        .sum()
        .reset_index()
    )

    def meta_partial(b: pd.DataFrame) -> pd.DataFrame:
        # one fused partial: (source, lang) grouped counts/sums — the driver
        # derives n_docs / sum_chars / n_langs from ≤ sources × langs rows
        return (
            b.groupby(["source", "lang"], sort=False)
            .agg(n=("doc_id", "size"), sum_chars=("n_chars", "sum"))
            .reset_index()
        )

    per_sl = (
        meta.map_batches(meta_partial, batch_format="pandas")
        .to_pandas()
        .groupby(["source", "lang"], sort=True)
        .agg(n=("n", "sum"), sum_chars=("sum_chars", "sum"))
        .reset_index()
    )
    stats = per_sl.groupby("source", sort=True).agg(
        n_docs=("n", "sum"), sum_chars=("sum_chars", "sum"), n_langs=("lang", "nunique")
    ).reset_index()

    out = stats.merge(nd, on="source", validate="1:1")
    out["source"] = out["source"].astype(str)
    out["dup_frac"] = _round_half_away(
        (out["n_docs"] - out["n_distinct"]) / out["n_docs"], 6
    )
    out["avg_chars"] = _round_half_away(out["sum_chars"] / out["n_docs"], 6)
    for c in ("n_docs", "n_distinct", "n_langs"):
        out[c] = out[c].astype(np.int64)
    out = out.rename(columns={"n_distinct": "n_distinct_texts"})
    return out.sort_values("source").reset_index(drop=True)[
        ["source", "n_docs", "n_distinct_texts", "dup_frac", "avg_chars", "n_langs"]
    ]


def q_ann_recall(sf_dir: str, nlist: int = 16, nprobe: int = 4, k: int = 10) -> pd.DataFrame:
    """ANN quality evaluation — recall@k of the IVF bucketed path at a REAL
    approximation setting (nprobe < nlist) against exact brute force, the
    number every ANN deployment is tuned by. To keep the approximate result
    SQL-expressible, the centroids are FIXED (the first ``nlist`` corpus
    vectors, unit-normalized) rather than Lloyd-trained: assignment, probe
    selection and bucket-restricted scoring then mirror exactly into the
    oracle's window-function SQL (argmax/argsort tie rule = similarity desc,
    centroid id asc — numpy's first-max/stable-sort rule). Both search paths
    are the existing distributed kernels (knn.build_ivf / knn_ivf /
    knn_bruteforce); the recall join runs over two bounded (n_queries × k)
    results."""
    from pagerank_ray.stages.knn import _unit, build_ivf, knn_bruteforce, knn_ivf

    qids, qvecs = _load_queries(sf_dir)
    vectors = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    # tiny prefix selection — the same bounded local read _load_queries uses
    cids, cvecs = _load_queries(sf_dir, n_queries=nlist)
    cents = _unit(cvecs[np.argsort(cids)])

    ivf = build_ivf(vectors, cents).materialize()
    approx = knn_ivf(ivf, cents, qvecs, qids, k=k, nprobe=nprobe)
    exact = knn_bruteforce(vectors, qvecs, qids, k=k)

    hit = exact.merge(approx[["query_id", "vec_id"]], on=["query_id", "vec_id"])
    n_hit = hit.groupby("query_id").size()
    out = pd.DataFrame({"query_id": np.sort(np.asarray(qids, dtype=np.int64))})
    out["n_hit"] = out["query_id"].map(n_hit).fillna(0).astype(np.int64)
    out["recall"] = _round_half_away(out["n_hit"] / k, 6)
    return out.reset_index(drop=True)


def q_weighted_sample_docs(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, A-ExpJ family): per-doc key = ln(u)/w with w = max(n_chars,
    1) and u the (0,1) uniform from the SAME Knuth multiplicative hash the
    stratified sampler shares with its oracle — top-k keys win, so longer
    docs are proportionally likelier. The canonical corpus resampling op
    (quality/length-weighted subset selection) made hash-checkable: no RNG,
    the whole draw is pure arithmetic mirrored verbatim in the DuckDB oracle.
    Per-batch local top-k partials (k rows each) → one bounded driver merge;
    ln and the divisions hit libm on identical doubles on both sides."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        doc_id = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        n_chars = t.column("n_chars").to_numpy(zero_copy_only=False).astype(np.int64)
        h = (doc_id * 2654435761) % 4294967296
        u = (h + 0.5) / 4294967296.0
        key = np.log(u) / np.maximum(n_chars, 1)
        top = np.lexsort((doc_id, -key))[:k]
        return pa.table(
            {
                "doc_id": pa.array(doc_id[top], pa.int64()),
                "n_chars": pa.array(n_chars[top], pa.int64()),
                "key": pa.array(key[top]),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["key", "doc_id"], ascending=[False, True]).head(k)
    parts["sample_key"] = _round_half_away(parts["key"], 9)
    return (
        parts.drop(columns=["key"])
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "n_chars", "sample_key"]]
    )


def q_decayed_activity(sf_dir: str, half_life_us: int = 86_400_000_000) -> pd.DataFrame:
    """Exponentially-decayed per-user activity scores — the streaming
    recency metric (half-life counters, cf. the decayed aggregates of
    streaming systems): score(u) = Σ_events 2^(−age/half_life) at the
    corpus max timestamp, half-life 24 h. Made exactly cross-engine
    reproducible by the integer-scaling trick (q_powerlaw_alpha's 1e9
    convention): each event's decay factor is one libm pow on identical
    doubles, rounded half-away at 1e-9 to an int64 term; per-user sums are
    then exact integer arithmetic in any order — per-batch partial groupby
    + one grouped sum, never the event rows."""
    ds = _read(sf_dir, "events", ["ts", "user_id"])
    from ray.data.aggregate import Max

    t_end = int(
        ds.map_batches(
            lambda t: pa.table(
                {"m": pa.array([int(t.column("ts").cast(pa.int64())
                                    .to_numpy(zero_copy_only=False).max())])}
            ),
            batch_format="pyarrow",
        ).aggregate(Max("m"))["max(m)"]
    )

    def partial(t: pa.Table) -> pa.Table:
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        age = (t_end - ts).astype(np.float64)
        w = _round_half_away(
            np.power(0.5, age / float(half_life_us)) * 1e9, 0
        ).astype(np.int64)
        df = pd.DataFrame({"user_id": uid, "w": w})
        g = df.groupby("user_id", sort=False).agg(
            n_events=("w", "size"), decayed_scaled=("w", "sum")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .sum(["n_events", "decayed_scaled"])
        .to_pandas()
    )
    out = out.rename(columns={"sum(n_events)": "n_events",
                              "sum(decayed_scaled)": "decayed_scaled"})
    for c in ("user_id", "n_events", "decayed_scaled"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def q_powerlaw_alpha(sf_dir: str, dmin: int = 2) -> pd.DataFrame:
    """Power-law exponent of the in-degree distribution — the continuous MLE
    of Clauset, Shalizi & Newman (SIAM Rev. 2009, eq. 3.1): α = 1 + n /
    Σ ln(d_i / (dmin − ½)) over the tail d ≥ dmin. The classic first number
    of any web-graph study. Distribution shrinks to a degree HISTOGRAM (two
    bucketed grouped counts — nothing per-vertex leaves the cluster), and the
    log-sum is made exactly cross-engine-reproducible by the integer-scaling
    trick (cf. the eccentricity oracle's 720720 harmonic): per distinct
    degree, term = round_half_away(cnt · ln(d/(dmin−½)) · 1e9) as int64 —
    each term is one libm call on identical doubles, the sum is exact
    integer arithmetic in any order."""
    edges = lineitem_edges(sf_dir)
    in_deg = grouped_count(edges, "dst_id", "in_deg")
    hist = grouped_count(in_deg, "in_deg", "cnt").to_pandas()
    hist = hist[hist["in_deg"] >= dmin]
    if len(hist) == 0:
        return pd.DataFrame(
            {
                "dmin": pd.array([dmin], dtype=np.int64),
                "n_tail": pd.array([0], dtype=np.int64),
                "max_degree": pd.array([0], dtype=np.int64),
                "alpha": [0.0],
            }
        )
    d = hist["in_deg"].to_numpy(np.int64)
    cnt = hist["cnt"].to_numpy(np.int64)
    terms = _round_half_away(
        (cnt * np.log(d.astype(np.float64) / (dmin - 0.5))) * 1e9, 0
    ).astype(np.int64)
    s = int(terms.sum())
    n_tail = int(cnt.sum())
    alpha = float(_round_half_away(1.0 + (n_tail * 1e9) / s, 6))
    return pd.DataFrame(
        {
            "dmin": pd.array([dmin], dtype=np.int64),
            "n_tail": pd.array([n_tail], dtype=np.int64),
            "max_degree": pd.array([int(d.max())], dtype=np.int64),
            "alpha": [alpha],
        }
    )


def q_transitivity(sf_dir: str) -> pd.DataFrame:
    """Global clustering coefficient (transitivity) of the undirected simple
    lineitem graph: C = 3·triangles / wedges. Composes the oriented-wedge
    triangle kernel (pipelines/triangles.py — cached dense ids) with a
    wedge count from the undirected degree table; both reductions are
    per-batch integer partials, so only two counters reach the driver."""
    from pagerank_ray.pipelines.triangles import triangle_counts
    from pagerank_ray.stages.graph_build import dedup_pairs

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    counts = triangle_counts(dense_edges, n)

    def tri_partial(t: pa.Table) -> pa.Table:
        c = t.column("tri_count").to_numpy(zero_copy_only=False)
        return pa.table({"s": pa.array([int(c.sum())], pa.int64())})

    tri3 = int(
        counts.map_batches(tri_partial, batch_format="pyarrow").to_pandas()["s"].sum()
    )  # Σ per-vertex counts = 3 · n_triangles

    def canon(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table(
            {
                "src_id": pa.array(np.minimum(s, d), pa.int64()),
                "dst_id": pa.array(np.maximum(s, d), pa.int64()),
            }
        )

    und = dedup_pairs(dense_edges.map_batches(canon, batch_format="pyarrow"))

    def endpoints(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        return pa.table({"id": pa.array(np.concatenate([s, d]), pa.int64())})

    deg = grouped_count(und.map_batches(endpoints, batch_format="pyarrow"), "id", "dg")

    def wedge_partial(t: pa.Table) -> pa.Table:
        dg = t.column("dg").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"w": pa.array([int((dg * (dg - 1) // 2).sum())], pa.int64())})

    wedges = int(
        deg.map_batches(wedge_partial, batch_format="pyarrow").to_pandas()["w"].sum()
    )
    trans = 0.0 if wedges == 0 else float(_round_half_away(tri3 / wedges, 6))
    return pd.DataFrame(
        {
            "n_triangles": pd.array([tri3 // 3], dtype=np.int64),
            "n_wedges": pd.array([wedges], dtype=np.int64),
            "transitivity": [trans],
        }
    )


def q_hyperball(sf_dir: str, rounds: int = 6) -> pd.DataFrame:
    """Approximate neighborhood function of the (symmetrized) lineitem graph
    via HyperBall (pipelines/hyperball.py — Boldi, Rosa & Vigna WWW 2011):
    per round t, N(t)·1e6 (integerized per-vertex HLL estimates, exact
    integer sum) and the total register mass. Effective diameter and average
    distance read directly off the returned curve. Runs on ORIGINAL vertex
    ids so the fmix64 item hashes mirror the SQL oracle's fmix chain
    verbatim; even the APPROXIMATE estimates hash-match."""
    from pagerank_ray.pipelines.hyperball import hyperball

    return hyperball(lineitem_edges(sf_dir), rounds=rounds)


def q_harmonic_centrality(sf_dir: str, rounds: int = 6, k: int = 20) -> pd.DataFrame:
    """Top-k vertices of the symmetrized lineitem graph by HyperBall
    harmonic centrality (Boldi & Vigna ICDM-W 2013: the geometric centrality
    HyperBall was built to compute at web scale) — H(v) = Σ_t ΔB_t(v)/t over
    the same per-vertex HLL register dynamics as q_hyperball, with 1/t
    scaled by lcm(1..rounds) so every term is an exact int64 and even the
    APPROXIMATE per-vertex estimates hash-match the SQL oracle. Ties break
    by ascending id."""
    from pagerank_ray.pipelines.hyperball import harmonic_centrality

    return harmonic_centrality(lineitem_edges(sf_dir), rounds=rounds, k=k)


def q_maximal_matching(sf_dir: str, max_rounds: int = 10,
                       tail_cutoff: int = 150_000) -> pd.DataFrame:
    """Maximal matching of the undirected simple lineitem graph —
    deterministic locally-minimal-edge handshake rounds
    (pipelines/matching.py), hash-checked per matched pair against a
    fixed-unroll DuckDB replay of the identical rounds. tail_cutoff keeps
    the correctness-scale graphs on the in-memory tail (the
    hyperball-family convention; the distributed path is parity-tested at
    tail_cutoff=0)."""
    from pagerank_ray.pipelines.matching import maximal_matching

    df, rounds = maximal_matching(
        lineitem_edges(sf_dir), max_rounds=max_rounds, tail_cutoff=tail_cutoff
    )
    if rounds > max_rounds:
        raise RuntimeError(
            f"matching took {rounds} rounds; oracle unrolls {max_rounds}"
        )
    return df


def q_coarsen_graph(sf_dir: str, max_rounds: int = 10,
                    tail_cutoff: int = 150_000) -> pd.DataFrame:
    """One matching-contraction coarsening level of the lineitem graph
    (pipelines/matching.py:coarsen_by_matching) — the multilevel primitive
    under METIS-style partitioners and the matching-based sibling of the
    host coarsening in q_host_pagerank. Coarse canonical edges with exact
    integer contraction weights, hash-checked against the matching replay
    + contraction mapping in SQL."""
    from pagerank_ray.pipelines.matching import coarsen_by_matching

    df, rounds = coarsen_by_matching(
        lineitem_edges(sf_dir), max_rounds=max_rounds, tail_cutoff=tail_cutoff
    )
    if rounds > max_rounds:
        raise RuntimeError(
            f"matching took {rounds} rounds; oracle unrolls {max_rounds}"
        )
    return df


def q_vertex_cover(sf_dir: str, max_rounds: int = 10,
                   tail_cutoff: int = 150_000) -> pd.DataFrame:
    """2-approximate minimum vertex cover — Gavril's classical bound: the
    endpoint set of ANY maximal matching covers every edge and is at most
    2·OPT (each matched edge forces ≥1 cover vertex and contributes 2).
    Derived from the deterministic handshake matching, so the cover set is
    unique and hash-checked against the matching replay's matched-vertex
    union in SQL. Output: sorted cover vertex ids."""
    from pagerank_ray.pipelines.matching import maximal_matching

    pairs, rounds = maximal_matching(
        lineitem_edges(sf_dir), max_rounds=max_rounds, tail_cutoff=tail_cutoff
    )
    if rounds > max_rounds:
        raise RuntimeError(
            f"matching took {rounds} rounds; oracle unrolls {max_rounds}"
        )
    ids = np.unique(np.concatenate(
        [pairs["a"].to_numpy(np.int64), pairs["b"].to_numpy(np.int64)]
    ))
    return pd.DataFrame({"id": pd.array(ids, dtype=np.int64)})


def q_graph_coloring(sf_dir: str, max_rounds: int = 60,
                     tail_cutoff: int = 150_000) -> pd.DataFrame:
    """Proper greedy coloring of the undirected simple lineitem graph —
    round-synchronous Jones–Plassmann (pipelines/coloring.py) with the
    repo's deterministic fmix64 priorities, hash-checked per vertex against
    a fixed-unroll DuckDB replay of the same rounds. tail_cutoff keeps the
    correctness-scale graphs on the in-memory tail (the hyperball-family
    convention; the distributed round path is parity-tested at
    tail_cutoff=0 — rounds are O(priority-DAG depth) either way)."""
    from pagerank_ray.pipelines.coloring import greedy_coloring

    df, rounds = greedy_coloring(
        lineitem_edges(sf_dir), max_rounds=max_rounds, tail_cutoff=tail_cutoff
    )
    if rounds > max_rounds:
        raise RuntimeError(
            f"coloring took {rounds} rounds; oracle unrolls {max_rounds}"
        )
    return df


def q_lin_closeness(sf_dir: str, rounds: int = 6, k: int = 20) -> pd.DataFrame:
    """Top-k vertices of the symmetrized lineitem graph by Lin closeness
    centrality (Boldi & Vigna "Axioms for Centrality" 2014 — the
    disconnected-graph-safe closeness HyperBall computes alongside
    harmonic), from the same per-vertex HLL register dynamics: reach_scaled
    = final integerized ball estimate, sumdist_scaled = Σ_t t·ΔB_t(v).
    Exact lexicographic Lin order (reach DESC, sumdist ASC, id ASC)."""
    from pagerank_ray.pipelines.hyperball import lin_closeness

    return lin_closeness(lineitem_edges(sf_dir), rounds=rounds, k=k)


def q_effective_diameter(sf_dir: str, rounds: int = 6) -> pd.DataFrame:
    """Effective diameter (90th percentile) and average distance of the
    symmetrized lineitem graph, read off the HyperBall neighborhood function
    (Boldi, Rosa & Vigna WWW 2011 — estimating exactly these two metrics is
    what HyperANF was built for). d_eff = linear interpolation of the
    smallest t with N(t) ≥ 0.9·N(T); avg = Σ t·(N(t)−N(t−1)) / (N(T)−N(0))
    over reachable non-self pairs. The NF curve is the integerized
    hash-checked q_hyperball output, so both metrics are derived from exact
    integers with one mirrored float expression each (bit-identical to the
    SQL oracle's)."""
    nf = q_hyperball(sf_dir, rounds=rounds).sort_values("t")
    v = nf["nf_scaled"].to_numpy(np.int64)
    last = int(v[-1])
    target = 0.9 * float(last)
    if float(v[0]) >= target:
        d_eff = 0.0
    else:
        t = int(np.argmax(v.astype(np.float64) >= target))
        d_eff = (t - 1) + (target - float(v[t - 1])) / (
            float(v[t]) - float(v[t - 1])
        )
    deltas = v[1:] - v[:-1]
    num = int((np.arange(1, len(v), dtype=np.int64) * deltas).sum())
    den = last - int(v[0])
    avg = 0.0 if den == 0 else float(num) / float(den)
    return pd.DataFrame(
        {
            "rounds": pd.array([rounds], dtype=np.int64),
            "nf_last": pd.array([last], dtype=np.int64),
            "effective_diameter_90": [float(_round_half_away(d_eff, 6))],
            "avg_distance": [float(_round_half_away(avg, 6))],
        }
    )


def q_ppr_batch(sf_dir: str, iters: int = 10) -> pd.DataFrame:
    """BATCHED personalized PageRank (pipelines/ppr_batch.py — Haveliwala's
    topic-sensitive PageRank, WWW 2002, run as a multi-query batch): K = 4
    teleport vectors (seed sets {v : v % m == 0} for m ∈ {97, 89, 83, 101})
    advance through the SAME edge pass each superstep — the (n, K) state
    matrix amortizes the topology scan/shuffle across all K queries, vs K
    independent runs costing K passes (the reference's kernels are strictly
    K = 1, kernel_acsr.cu:202). Fixed ``iters`` supersteps of the exact M7
    recurrence per column; hash-checked against the unrolled K-column DuckDB
    oracle (__ray_entry__._ppr_batch_sql)."""
    from pagerank_ray.pipelines.ppr_batch import ppr_batch

    return ppr_batch(lineitem_edges(sf_dir), iters=iters)


def _sym_lineitem_edges(sf_dir: str) -> rd.Dataset:
    """Symmetrized simple lineitem graph at ORIGINAL ids: distinct
    undirected pairs (self-loops dropped), emitted in both directions —
    every vertex therefore has out-edges (no dangling) and sym out-degree
    equals undirected degree. Materialized (two consumers per caller)."""

    def undirect(t: pa.Table) -> pa.Table:
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)
        keep = s != d
        return pa.table(
            {
                "src_id": pa.array(np.minimum(s[keep], d[keep]), pa.int64()),
                "dst_id": pa.array(np.maximum(s[keep], d[keep]), pa.int64()),
            }
        )

    und = dedup_pairs(
        lineitem_edges(sf_dir).map_batches(undirect, batch_format="pyarrow")
    )

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t.column("src_id").combine_chunks().cast(pa.int64())
        d = t.column("dst_id").combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "src_id": pa.concat_arrays([s, d]),
                "dst_id": pa.concat_arrays([d, s]),
            }
        )

    return und.map_batches(both_dirs, batch_format="pyarrow").materialize()


def q_ppr_sweep_cut(
    sf_dir: str, mod: int = 97, iters: int = 8, prefixes: int = 60
) -> pd.DataFrame:
    """Local-clustering sweep cut (Andersen, Chung & Lang, FOCS 2006 — the
    PPR sweep that powers local community detection / seed-set expansion on
    web graphs): run personalized PageRank from a seed set over the
    SYMMETRIZED lineitem graph, order vertices by rank/degree descending,
    and for every prefix S_k of the sweep order report the undirected cut,
    volume and conductance φ(S_k) = cut/min(vol(S_k), vol(V)−vol(S_k)).
    The ACL theorem says a low-conductance community near the seed shows up
    as a conductance dip along this sweep.

    Determinism contract: PPR ranks are the engine's half-away-rounded 6
    decimals (the same values the hash-checked ``ppr_batch`` entry pins),
    and the sweep key is the INTEGER ``round(rank·10⁶)·10⁶ // deg`` (ties →
    smaller id), so engine and oracle cannot disagree on the order via
    float division. Only the first ``prefixes`` sweep positions are
    reported (the local-cluster regime; k = n is excluded anyway since its
    denominator is 0).

    Shape: symmetrize via one map + pair dedup; PPR via pipelines/
    ppr_batch (one rank column, fixed ``iters``); degrees via grouped
    count; the sweep itself needs only the top-``prefixes`` positions, so
    one broadcast of that tiny (id → pos) table lets a single edge pass
    count each top vertex's earlier-position neighbors (e_j) as O(W)
    partials — cut(k) = Σ_{j≤k} deg_j − 2·Σ_{j≤k} e_j, all integers until
    the final division. Oracle: __ray_entry__._sweep_cut_sql (K=1 unrolled
    PPR over the same symmetric edge set + ROW_NUMBER sweep + per-k XOR
    crossing count — the two cut formulas agree on simple loop-free
    graphs)."""
    import ray

    from pagerank_ray.pipelines.ppr_batch import ppr_batch
    from pagerank_ray.stages import joins

    sym = _sym_lineitem_edges(sf_dir)
    vol_tot = sym.count()  # Σ deg = 2 × undirected edge count

    pr = ppr_batch(sym, mods=(mod,), iters=iters)  # (id, rank_0), rounded(6)
    deg = grouped_count(sym, "src_id", "deg").to_pandas()
    df = pr.merge(deg.rename(columns={"src_id": "id"}), on="id", how="inner")
    rank_int = np.round(df["rank_0"].to_numpy(np.float64) * 1e6).astype(np.int64)
    df["key"] = rank_int * np.int64(1_000_000) // df["deg"].to_numpy(np.int64)
    t_eff = min(prefixes, len(df) - 1)
    top = df.sort_values(["key", "id"], ascending=[False, True]).head(t_eff)
    tid = top["id"].to_numpy(np.int64)
    tdeg = top["deg"].to_numpy(np.int64)
    order = np.argsort(tid)
    ref = ray.put((tid[order], (np.arange(t_eff, dtype=np.int64) + 1)[order]))

    def e_partial(t: pa.Table) -> pa.Table:
        ids_s, pos_s = joins.broadcast_get(ref, lambda x: x, "sweep_pos")
        s = t.column("src_id").to_numpy(zero_copy_only=False)
        d = t.column("dst_id").to_numpy(zero_copy_only=False)

        def lookup(x: np.ndarray) -> np.ndarray:
            if len(ids_s) == 0:
                return np.zeros(len(x), dtype=np.int64)
            i = np.clip(np.searchsorted(ids_s, x), 0, len(ids_s) - 1)
            return np.where(ids_s[i] == x, pos_s[i], 0)

        ps, pd_ = lookup(s), lookup(d)
        m = (ps > 0) & (pd_ > 0) & (pd_ < ps)
        cnt = np.bincount(ps[m], minlength=len(ids_s) + 1)[1:]
        return pa.table(
            {
                "pos": pa.array(np.arange(1, len(ids_s) + 1, dtype=np.int64)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    ep = (
        sym.map_batches(e_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("pos")["cnt"]
        .sum()
        .reindex(np.arange(1, t_eff + 1), fill_value=0)
        .to_numpy(np.int64)
    )
    vol = np.cumsum(tdeg)
    cut = vol - 2 * np.cumsum(ep)
    denom = np.minimum(vol, vol_tot - vol)
    out = pd.DataFrame(
        {
            "prefix_k": np.arange(1, t_eff + 1, dtype=np.int64),
            "cut": cut.astype(np.int64),
            "vol": vol.astype(np.int64),
            "conductance": _round_half_away(
                cut.astype(np.float64) / denom.astype(np.float64), 6
            ),
        }
    )
    return out


def q_simrank_topk(
    sf_dir: str, mod: int = 512, length: int = 5, n_seeds: int = 3,
    decay: float = 0.8, topk: int = 5,
) -> pd.DataFrame:
    """Fingerprint SimRank top-k (Fogaras & Rácz WWW 2005 — see
    pipelines/simrank.py): coupled deterministic walk fields over the
    symmetrized lineitem graph, first-meeting-time decay C^τ averaged over
    ``n_seeds`` fields, top-``topk`` similar vertices per query
    (ids % mod == 0). Hash-checked against a DuckDB oracle replaying the
    identical fmix64 walk choices and integer meeting fold
    (__ray_entry__._simrank_sql)."""
    from pagerank_ray.pipelines.simrank import simrank_fingerprints

    return simrank_fingerprints(
        _sym_lineitem_edges(sf_dir), mod=mod, length=length,
        n_seeds=n_seeds, decay=decay, topk=topk,
    )


def q_wl_refinement(sf_dir: str, iters: int = 3) -> pd.DataFrame:
    """Weisfeiler-Lehman color refinement (Weisfeiler & Leman 1968; the
    1-WL vertex-refinement pass behind WL graph kernels — Shervashidze et
    al. JMLR 2011 — and the expressiveness bound of message-passing GNNs):
    c⁰(v) = deg(v); cᵗ⁺¹(v) = fmix64(cᵗ(v)·C + Σ_{u∈N(v)} fmix64(cᵗ(u)))
    over the symmetrized simple graph, where the neighbor fold is a
    commutative mod-2⁶⁴ SUM of finalized colors — an order-free injective-
    in-practice stand-in for the paper's sorted-multiset relabeling, which
    is what makes the step one shuffle instead of a per-vertex sort. After
    ``iters`` rounds two vertices share a color iff 1-WL cannot distinguish
    their radius-``iters`` neighborhoods (up to 64-bit collisions). Output:
    (id, color) with color sign-cast to BIGINT (doc_fingerprint's
    convention).

    Shape per round: one broadcast-or-hash join attaches cᵗ to edge
    sources, one vectorized fmix per batch, one bucketed wraparound-SUM
    groupby by dst, one left-attach back onto the n-row state — O(E)
    shuffled bytes per round, state never on the driver until the final
    per-vertex contract. Oracle: identical fmix64/·C arithmetic in HUGEINT
    (shared _fmix_chain_sql / 32-bit-split multiply), SUM % 2⁶⁴ per
    neighbor group (__ray_entry__._wl_sql)."""
    from pagerank_ray.functions.text import fmix64
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.dedup import _POLY_C

    sym = _sym_lineitem_edges(sf_dir)
    deg = grouped_count(sym, "src_id", "deg").materialize()
    n = deg.count()

    def init_state(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": t.column("src_id"),
                "c": pa.array(
                    t.column("deg").to_numpy(zero_copy_only=False).astype(np.uint64)
                ),
            }
        )

    state = deg.map_batches(init_state, batch_format="pyarrow").materialize()
    n_buckets = 64

    def bucketize_dst(t: pa.Table) -> pa.Table:
        d = t.column("id").to_numpy(zero_copy_only=False)
        dm = (d.astype(np.int64) * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        return t.append_column("bkt", pa.array((dm % n_buckets).astype(np.int32)))

    def wrap_sum(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy(np.int64)
        f = df["f"].to_numpy().astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        ids, f = ids[order], f[order]
        bounds = np.flatnonzero(
            np.concatenate(([True], ids[1:] != ids[:-1]))
        )
        with np.errstate(over="ignore"):
            s = np.add.reduceat(f, bounds)  # uint64 wraparound sum
        return pd.DataFrame({"id": ids[bounds], "s": s})

    for _ in range(iters):
        edges_c = joins.attach_column(
            sym, state, probe_col="src_id", build_key="id", build_val="c",
            out_col="cs", build_count=n, drop_probe_col=True,
        )

        def to_fmix(t: pa.Table) -> pa.Table:
            cs = t.column("cs").to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table(
                {"id": t.column("dst_id"), "f": pa.array(fmix64(cs))}
            )

        sums = (
            edges_c.map_batches(to_fmix, batch_format="pyarrow")
            .map_batches(bucketize_dst, batch_format="pyarrow")
            .groupby("bkt")
            .map_groups(wrap_sum, batch_format="pandas")
            .materialize()
        )
        state = joins.attach_with_default(
            state, sums, probe_col="id", build_key="id", build_val="s",
            out_col="s", default=0, out_type=pa.uint64(), build_count=n,
        )

        def update(t: pa.Table) -> pa.Table:
            c = t.column("c").to_numpy(zero_copy_only=False).astype(np.uint64)
            s = t.column("s").to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                y = c * _POLY_C + s
            return pa.table({"id": t.column("id"), "c": pa.array(fmix64(y))})

        state = state.map_batches(update, batch_format="pyarrow").materialize()

    df = state.to_pandas()
    df["color"] = df["c"].to_numpy().astype(np.uint64).view(np.int64)
    return df[["id", "color"]].sort_values("id").reset_index(drop=True)


def q_spectral_bisection(
    sf_dir: str, iters: int = 12, target: int = 10**6
) -> pd.DataFrame:
    """Spectral graph bisection (Fiedler 1973; the power-iteration
    formulation of Pothen, Simon & Liou 1990): approximate the Fiedler
    vector of L = D − A on the symmetrized simple graph by power iteration
    on the spectrum-flipped operator M = c·I − L (c = max degree, so M is
    PSD with dominant eigenvector 1), deflating the trivial all-ones
    component by exact centering each round; side(v) = [v_fiedler ≥ 0] is
    the classic 2-way partition seed.

    Determinism contract (the embedding_pca fixed-point recipe): v⁰(id) =
    fmix64(id) % (2·target+1) − target; every matvec w = (c−deg)·v + A·v is
    an exact int64 sum (order-free — the distributed batch split cannot
    change it); centering is the integer form wc = n·w − Σw; each round
    renormalizes by integer division v ← sign(wc)·(|wc| // dv) with
    dv = max(1, (n·max|w| + |Σw|) // target) — an upper bound of max|wc|
    computable from the SAME one-pass (Σw, max|w|) partials, so each round
    costs one scalar scan instead of two. No float anywhere, so the
    unrolled DuckDB oracle (__ray_entry__._spectral_sql) matches
    bit-exactly. int64 bound: |wc| ≤ 2·n·(c+max_deg)·target — checked
    loudly each round.

    Shape per round: one broadcast-or-hash join attaches v to edge
    sources, one bucketed exact-int sum by dst, O(#batches) scalar
    partials for Σw / max|wc|, one vectorized renormalize — O(E) shuffled
    bytes, state stays distributed until the final per-vertex contract."""
    from pagerank_ray.functions.text import fmix64
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import grouped_sum

    sym = _sym_lineitem_edges(sf_dir)
    deg = grouped_count(sym, "src_id", "deg").materialize()
    n = deg.count()
    cmax = deg.map_batches(
        lambda t: pa.table(
            {"m": pa.array([int(t.column("deg").to_numpy(zero_copy_only=False).max())])}
        ),
        batch_format="pyarrow",
    ).to_pandas()["m"].max()
    span = 2 * target + 1

    def init_state(t: pa.Table) -> pa.Table:
        ids = t.column("src_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        v0 = (fmix64(ids) % np.uint64(span)).astype(np.int64) - np.int64(target)
        return pa.table(
            {
                "id": t.column("src_id"),
                "deg": t.column("deg").cast(pa.int64()),
                "v": pa.array(v0),
            }
        )

    state = deg.map_batches(init_state, batch_format="pyarrow").materialize()

    for _ in range(iters):
        edges_v = joins.attach_column(
            sym, state, probe_col="src_id", build_key="id", build_val="v",
            out_col="vs", build_count=n, drop_probe_col=True,
        )
        av = grouped_sum(
            edges_v.map_batches(
                lambda t: pa.table({"id": t.column("dst_id"), "vs": t.column("vs")}),
                batch_format="pyarrow",
            ),
            "id", "vs", "av",
        ).materialize()
        state = joins.attach_with_default(
            state, av, probe_col="id", build_key="id", build_val="av",
            out_col="av", default=0, build_count=n,
        )

        def matvec(t: pa.Table) -> pa.Table:
            d = t.column("deg").to_numpy(zero_copy_only=False)
            v = t.column("v").to_numpy(zero_copy_only=False)
            a = t.column("av").to_numpy(zero_copy_only=False)
            w = (int(cmax) - d) * v + a
            return pa.table(
                {"id": t.column("id"), "deg": t.column("deg"), "w": pa.array(w)}
            )

        wds = state.map_batches(matvec, batch_format="pyarrow").materialize()
        part = wds.map_batches(
            lambda t: pa.table(
                {
                    "sw": pa.array([int(t.column("w").to_numpy(zero_copy_only=False).sum())]),
                    "mw": pa.array([int(np.abs(t.column("w").to_numpy(zero_copy_only=False)).max())]),
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        sw = int(part["sw"].sum())  # exact (Python int combine)
        bound = n * int(part["mw"].max()) + abs(sw)
        if bound >= 2**62:
            raise OverflowError("spectral_bisection: n·max|w| near int64 range "
                                "— lower `target` for this graph size")
        dv = max(1, bound // target)

        def renorm(t: pa.Table) -> pa.Table:
            w = t.column("w").to_numpy(zero_copy_only=False)
            wc = int(n) * w - sw
            vn = np.sign(wc) * (np.abs(wc) // dv)
            return pa.table(
                {
                    "id": t.column("id"),
                    "deg": t.column("deg"),
                    "v": pa.array(vn.astype(np.int64)),
                }
            )

        state = wds.map_batches(renorm, batch_format="pyarrow").materialize()

    df = state.to_pandas()
    df["side"] = (df["v"] >= 0).astype(np.int64)
    return df[["id", "side"]].sort_values("id").reset_index(drop=True)


def q_graph_growth(sf_dir: str) -> pd.DataFrame:
    """Temporal graph evolution (densification) — per ship-month: edges first
    observed, sources/destinations first observed, cumulative edge count (the
    Leskovec-Kleinberg-Faloutsos densification view of a growing link graph).
    Three bucketed grouped-MIN reductions (pair / src / dst first-seen month)
    + three tiny month histograms; only per-month rows reach the driver."""
    from pagerank_ray.pipelines.mis import _grouped_min_i64
    from pagerank_ray.stages.graph_build import grouped_pair_min

    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_shipdate"])

    def monthed(t: pa.Table) -> pa.Table:
        dt = t.column("l_shipdate").to_pandas()
        mk = (dt.dt.year * 100 + dt.dt.month).to_numpy(np.int64)
        return pa.table(
            {
                "src_id": t.column("l_orderkey"),
                "dst_id": t.column("l_partkey"),
                "mk": pa.array(mk, pa.int64()),
            }
        )

    f = ds.map_batches(monthed, batch_format="pyarrow").materialize()
    pair_first = grouped_pair_min(f, "mk")
    src_first = _grouped_min_i64(
        f.map_batches(lambda t: t.select(["src_id", "mk"]), batch_format="pyarrow"),
        "src_id", "mk", "mk",
    )
    dst_first = _grouped_min_i64(
        f.map_batches(lambda t: t.select(["dst_id", "mk"]), batch_format="pyarrow"),
        "dst_id", "mk", "mk",
    )

    em = grouped_count(pair_first, "mk", "n_new_edges").to_pandas()
    sm = grouped_count(src_first, "mk", "n_new_src").to_pandas()
    dm = grouped_count(dst_first, "mk", "n_new_dst").to_pandas()
    # base = EVERY observed ship-month (a month can have zero first-seens)
    base = grouped_count(
        f.map_batches(lambda t: t.select(["mk"]), batch_format="pyarrow"), "mk", "nr"
    ).to_pandas()[["mk"]]
    out = (
        base.merge(em, on="mk", how="left")
        .merge(sm, on="mk", how="left")
        .merge(dm, on="mk", how="left")
        .fillna(0)
        .sort_values("mk")
        .reset_index(drop=True)
    )
    for c in ("n_new_edges", "n_new_src", "n_new_dst"):
        out[c] = out[c].astype(np.int64)
    out["cum_edges"] = out["n_new_edges"].cumsum().astype(np.int64)
    return out.rename(columns={"mk": "month_key"})[
        ["month_key", "n_new_edges", "n_new_src", "n_new_dst", "cum_edges"]
    ]


def q_community_conductance(
    sf_dir: str, n_workers: int = 4, lp_iters: int = 3
) -> pd.DataFrame:
    """Per-community conductance of the label-propagation communities —
    φ(c) = cut(c) / min(vol(c), 2m − vol(c)) with vol = 2·internal + cut —
    the community-quality profile every partitioning run is judged by
    (Kannan, Vempala & Vetta 2004). Composes the oracled LP labels with two
    label attaches on the undirected simple edge table; internal/cut/size
    are bucketed grouped counts; the per-community merge is the bounded
    query-result contract. Exact integers into the final division."""
    from pagerank_ray.pipelines.cc import label_propagation
    from pagerank_ray.stages import joins

    csr, n, id_map, dense_edges = _lineitem_csr(
        sf_dir, n_workers=n_workers, symmetrize=True, return_edges=True
    )
    labels = label_propagation(csr, n_workers=n_workers, max_iters=lp_iters).result
    labels = labels.materialize()
    und = _undirected_simple(dense_edges).materialize()
    m_edges = und.count()

    ea = joins.attach_column(und, labels, probe_col="src_id", build_key="id",
                             build_val="label", out_col="la", build_count=n)
    ea = joins.attach_column(ea, labels, probe_col="dst_id", build_key="id",
                             build_val="label", out_col="lb", build_count=n)

    def internal_rows(t: pa.Table) -> pa.Table:
        la = t.column("la").to_numpy(zero_copy_only=False)
        lb = t.column("lb").to_numpy(zero_copy_only=False)
        return pa.table({"label": pa.array(la[la == lb], pa.int64())})

    def cut_rows(t: pa.Table) -> pa.Table:
        la = t.column("la").to_numpy(zero_copy_only=False)
        lb = t.column("lb").to_numpy(zero_copy_only=False)
        diff = la != lb
        return pa.table(
            {"label": pa.array(np.concatenate([la[diff], lb[diff]]), pa.int64())}
        )

    internal = grouped_count(
        ea.map_batches(internal_rows, batch_format="pyarrow"), "label", "internal_edges"
    ).to_pandas()
    cut = grouped_count(
        ea.map_batches(cut_rows, batch_format="pyarrow"), "label", "cut_edges"
    ).to_pandas()
    size = grouped_count(
        labels.map_batches(
            lambda t: pa.table({"label": t.column("label")}), batch_format="pyarrow"
        ),
        "label",
        "size",
    ).to_pandas()

    out = (
        size.merge(internal, on="label", how="left")
        .merge(cut, on="label", how="left")
        .fillna(0)
    )
    for c in ("size", "internal_edges", "cut_edges"):
        out[c] = out[c].astype(np.int64)
    out["volume"] = (2 * out["internal_edges"] + out["cut_edges"]).astype(np.int64)
    denom = np.minimum(out["volume"], 2 * m_edges - out["volume"]).astype(np.int64)
    out["conductance"] = np.where(
        out["cut_edges"] == 0,
        0.0,
        _round_half_away(
            out["cut_edges"].to_numpy(np.int64)
            / np.maximum(denom.to_numpy(np.int64), 1),
            6,
        ),
    )
    # community key on original ids (the oracle's LP runs on original ids)
    out = joins.attach_column(
        rd.from_pandas(out),
        id_map,
        probe_col="label",
        build_key="dense",
        build_val="orig",
        out_col="community",
        build_count=n,
        drop_probe_col=True,
    ).to_pandas()
    return out.sort_values("community").reset_index(drop=True)[
        ["community", "size", "internal_edges", "cut_edges", "volume", "conductance"]
    ]


def q_bm25_topk(
    sf_dir: str,
    terms: tuple[str, ...] = ("hash", "merge", "vector"),
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> pd.DataFrame:
    """BM25 retrieval (Robertson & Spärck Jones probabilistic ranking, the
    Okapi/Lucene form): top-k documents for a fixed query term set.

      score(d,Q) = Σ_q idf(q) · tf·(k1+1) / (tf + k1·(1-b+b·|d|/avgdl)),
      idf(q) = ln(1 + (N-df+0.5)/(df+0.5))        (Lucene-smoothed)

    Scale shape: tokenization + per-doc query-term tf is ONE vectorized
    map_batches (a doc's tokens never leave its batch — no corpus-wide
    term explode for a |Q|-term query); N / Σ|d| / per-term df are three
    scalar-sized aggregates broadcast back; scoring is a second streaming
    map_batches; top-k is sort+limit on the scored (doc, score) table.
    Scores rounded half-away(6) on both engines so a 1-ulp libm log
    difference cannot flip the ranking; ties break on doc_id."""
    terms = tuple(terms)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tf_dl(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)  # explode() indexes by row position
        toks = df["text"].fillna("").str.split()
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64)})
        out["dl"] = toks.str.len().fillna(0).to_numpy(np.int64)
        # one explode, then per-term counts via C-level positional bincount
        flat = toks.explode(ignore_index=False)
        pos = flat.index.to_numpy(np.int64)
        words = flat.to_numpy(dtype=object)
        for i, q in enumerate(terms):
            hit = words == q
            out[f"tf{i}"] = np.bincount(pos[hit], minlength=len(df)).astype(np.int64)
        return out

    stats = ds.map_batches(tf_dl, batch_format="pandas").materialize()
    n_docs = stats.count()
    agg = stats.sum(["dl"] + [f"tf{i}" for i in range(len(terms))])
    sum_dl = agg["sum(dl)"]
    # df per term: docs with tf>0 — tiny per-batch partial then a scalar sum
    dfreq = [
        stats.map_batches(
            lambda t, _i=i: pa.table(
                {"c": pa.array([int(pc.sum(pc.greater(t.column(f"tf{_i}"), 0)).as_py() or 0)], pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("c")
        for i in range(len(terms))
    ]
    avgdl = sum_dl / n_docs
    idf = [float(np.log(1.0 + (n_docs - df_ + 0.5) / (df_ + 0.5))) for df_ in dfreq]

    def score(df: pd.DataFrame) -> pd.DataFrame:
        dl = df["dl"].to_numpy(np.float64)
        denom_norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(df), np.float64)
        for i in range(len(terms)):
            tf = df[f"tf{i}"].to_numpy(np.float64)
            s += idf[i] * tf * (k1 + 1.0) / (tf + denom_norm)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(np.int64), "score": _round_half_away(s, 6)}
        )

    top = (
        stats.map_batches(score, batch_format="pandas")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return top.reset_index(drop=True)


def q_dsir_weights(
    sf_dir: str, n_buckets: int = 1024, target_lang: str = "en"
) -> pd.DataFrame:
    """DSIR data-selection importance weights (Xie et al., NeurIPS 2023,
    "Data Selection for Language Models via Importance Resampling"): hashed
    unigram+bigram n-gram features over a B-bucket space, bag-of-ngrams
    probabilities with add-1 smoothing for a TARGET corpus (docs with
    lang == target_lang) and the RAW corpus (all docs), and per-doc

        log w(d) = Σ_f n_f(d) · (ln p̂_target[f] − ln p̂_raw[f]).

    Feature hashing reuses the SQL-reproducible token hash
    (stages/dedup.py:_hash_tokens — byte polynomial + fmix64); the bigram
    combine is the shingle polynomial fold h1·C + h2 (uint64 wraparound),
    so DuckDB recomputes identical features (__ray_entry__._dsir_sql).

    Scale shape: pass 1 = per-batch B-vector partials (bincount) reduced by
    a B-key groupby (B=1024 — counters move, never tokens); λ = the log-ratio
    vector is BROADCAST in the closure; pass 2 = one streaming map_batches
    scoring every doc with two positional bincounts. No corpus-cardinality
    shuffle anywhere; weights rounded half-away(6) on both engines."""
    from pagerank_ray.stages.dedup import _POLY_C, _hash_tokens

    B = n_buckets
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"]).materialize()

    def _feat(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        toks = df["text"].fillna("").str.split()
        nt = toks.str.len().fillna(0).to_numpy(np.int64)
        ex = toks.explode()
        valid = ex.notna().to_numpy()
        words = ex.to_numpy(dtype=object)[valid]
        pos = np.repeat(np.arange(len(df)), np.maximum(nt, 1))[valid]
        h = _hash_tokens(list(words))
        f_uni = (h % np.uint64(B)).astype(np.int64)
        if len(pos) > 1:
            same = pos[1:] == pos[:-1]
            with np.errstate(over="ignore"):
                bg = h[:-1] * _POLY_C + h[1:]
            f_bg = (bg[same] % np.uint64(B)).astype(np.int64)
            pos_bg = pos[:-1][same]
        else:
            f_bg = np.empty(0, np.int64)
            pos_bg = np.empty(0, np.int64)
        return np.concatenate([pos, pos_bg]), np.concatenate([f_uni, f_bg])

    def count_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        pos, f = _feat(df)
        is_tgt = (df["lang"].fillna("").to_numpy(dtype=object) == target_lang)[pos]
        return pd.DataFrame({
            "f": np.arange(B, dtype=np.int64),
            "ct": np.bincount(f[is_tgt], minlength=B).astype(np.int64),
            "cr": np.bincount(f, minlength=B).astype(np.int64),
        })

    cdf = (
        ds.map_batches(count_batch, batch_format="pandas")
        .groupby("f").sum(["ct", "cr"]).to_pandas()
    )
    ct = np.zeros(B, np.int64)
    cr = np.zeros(B, np.int64)
    fi = cdf["f"].to_numpy(np.int64)
    ct[fi] = cdf["sum(ct)"].to_numpy(np.int64)
    cr[fi] = cdf["sum(cr)"].to_numpy(np.int64)
    st, sr = int(ct.sum()), int(cr.sum())
    lam = np.log((ct + 1.0) / (st + float(B))) - np.log((cr + 1.0) / (sr + float(B)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        pos, f = _feat(df)
        s = np.bincount(pos, weights=lam[f], minlength=len(df))
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "logw": _round_half_away(s, 6),
        })

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def weighted_pair_graph(sf_dir: str) -> rd.Dataset:
    """Canonical undirected weighted graph over the lineitem id universe:
    pair (min(orderkey,partkey), max(...)) with w = MIN(l_quantity) over the
    pair's line items (quantities are integer-valued; cast to int64 so the
    MSF total order is exact-integer on both engines). Self-loops dropped."""
    from pagerank_ray.stages.graph_build import grouped_pair_min

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_quantity"])

    def canon(t: pa.Table) -> pa.Table:
        a = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        b = t.column("l_partkey").to_numpy(zero_copy_only=False)
        w = t.column("l_quantity").to_numpy(zero_copy_only=False).astype(np.int64)
        m = a != b
        return pa.table({
            "src_id": pa.array(np.minimum(a, b)[m]),
            "dst_id": pa.array(np.maximum(a, b)[m]),
            "w": pa.array(w[m]),
        })

    return grouped_pair_min(li.map_batches(canon, batch_format="pyarrow"), "w")


_MSF_ORACLE_ROUNDS = 20


def q_msf(sf_dir: str, n_workers: int = 4) -> pd.DataFrame:
    """Minimum spanning forest (distributed Borůvka, pipelines/msf.py) of
    the weighted undirected lineitem pair graph. The strict total order
    (w, src_id, dst_id) makes the forest unique (cut property), so the
    DuckDB oracle's unrolled Borůvka rounds (__ray_entry__._msf_sql) must
    produce the identical edge set. Returns (src_id, dst_id, w) sorted."""
    from pagerank_ray.pipelines.msf import boruvka_msf

    res = boruvka_msf(weighted_pair_graph(sf_dir), n_workers=n_workers)
    if res.rounds > _MSF_ORACLE_ROUNDS:
        raise RuntimeError(
            f"Borůvka used {res.rounds} rounds — exceeds the "
            f"{_MSF_ORACLE_ROUNDS}-round oracle unroll; raise both"
        )
    df = res.edges.to_pandas()
    return df.sort_values(["src_id", "dst_id"]).reset_index(drop=True)[
        ["src_id", "dst_id", "w"]
    ]


def q_table_profile(sf_dir: str, table: str = "orders") -> pd.DataFrame:
    """Per-column data-profiling summary of a table (the single-pass column
    profiler of Deequ / Great-Expectations-style data validation — the
    stage every corpus build runs before training): for every column of
    ``table`` report row count, null count and EXACT distinct count, all
    BIGINT, sorted by column name.

    Shape: counts are distributive — per-batch (col, n, n_null) partials
    fold on the driver (k · n_batches rows, tiny). Exact distinct is the
    shuffle-bounded part: each batch first collapses to its LOCAL unique
    value strings per column (the combiner — low-cardinality columns
    shrink to their vocabulary before any exchange), then rows route by
    fingerprint64(col, value) bucket so every distinct value lives in
    exactly one bucket and per-bucket distinct counts sum exactly. The
    driver only ever sees k·n_buckets partial counts, never a value set.
    String rendering is injective per column (pandas shortest-roundtrip
    repr for floats, full-precision timestamps), so distinct-of-repr
    equals distinct-of-value."""
    n_buckets = 64
    ds = _read(sf_dir, table)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "col_name": list(df.columns),
                "n": np.full(len(df.columns), len(df), np.int64),
                "n_null": [int(df[c].isna().sum()) for c in df.columns],
            }
        )

    base = (
        ds.map_batches(counts, batch_format="pandas")
        .to_pandas()
        .groupby("col_name", sort=True)
        .agg(n_rows=("n", "sum"), n_null=("n_null", "sum"))
        .reset_index()
    )

    def uniq_long(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for c in df.columns:
            v = pd.unique(df[c].dropna().astype(str))
            frames.append(pd.DataFrame({"col_name": c, "v": v}))
        out = pd.concat(frames, ignore_index=True)
        h = textfn.fingerprint64(out["col_name"] + "\x1f" + out["v"])
        out["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return out

    def bucket_distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["col_name", "v"]].drop_duplicates()
        g = d.groupby("col_name", sort=False).size().reset_index(name="nd")
        return g

    dparts = (
        ds.map_batches(uniq_long, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_distinct, batch_format="pandas")
        .to_pandas()
    )
    nd = dparts.groupby("col_name", sort=True)["nd"].sum().reset_index(name="n_distinct")
    out = base.merge(nd, on="col_name", how="left")
    out["n_distinct"] = out["n_distinct"].fillna(0)
    for c in ("n_rows", "n_null", "n_distinct"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("col_name").reset_index(drop=True)


def q_orders_reconciliation(sf_dir: str) -> pd.DataFrame:
    """Full-outer reconciliation audit between orders and lineitem (the
    referential-integrity report every warehouse load runs): classify every
    orderkey as 'matched' (in both tables), 'order_only' (order with no
    lineitems) or 'lineitem_only' (lineitems whose order is missing), and
    report per category the key count, lineitem row count and cents-exact
    revenue. Empty categories are omitted (SQL GROUP BY semantics).

    Shape: the lineitem side first collapses per batch to (key, n,
    rev_cents) partials — the combiner — so the exchange carries one row
    per (batch, key), never raw lineitems. Both sides then route by the
    same key-hash bucket (a key lives in exactly one bucket) and each
    bucket's map_groups joins its local key sets and emits ≤3 category
    partials; the driver folds ≤ 3·n_buckets rows. Revenue is summed as
    half-away-rounded integer cents, so distributed summation order can
    never flip the 2-decimal output (the region_revenue convention)."""
    n_buckets = 64
    orders = _read(sf_dir, "orders", ["o_orderkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def o_side(df: pd.DataFrame) -> pd.DataFrame:
        k = df["o_orderkey"].to_numpy(np.int64)
        return pd.DataFrame(
            {"key": k, "is_order": np.ones(len(k), np.int8),
             "n": np.zeros(len(k), np.int64), "rc": np.zeros(len(k), np.int64)}
        )

    def l_side(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].to_numpy(np.int64)
        price = df["l_extendedprice"].to_numpy(np.float64)
        disc = df["l_discount"].to_numpy(np.float64)
        rc = _round_half_away(price * (1.0 - disc) * 100.0, 0).astype(np.int64)
        g = (
            pd.DataFrame({"key": k, "n": np.ones(len(k), np.int64), "rc": rc})
            .groupby("key", sort=False)
            .agg(n=("n", "sum"), rc=("rc", "sum"))
            .reset_index()
        )
        g["is_order"] = np.int8(0)
        return g[["key", "is_order", "n", "rc"]]

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        k = df["key"].to_numpy(np.int64)
        mixed = (k * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        df = df.copy()
        df["bucket"] = (mixed % n_buckets).astype(np.int32)
        return df

    both = orders.map_batches(o_side, batch_format="pandas").union(
        li.map_batches(l_side, batch_format="pandas")
    )

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        okeys = pd.unique(df.loc[df["is_order"] == 1, "key"].to_numpy(np.int64))
        ldf = df[df["is_order"] == 0]
        lagg = ldf.groupby("key", sort=False).agg(n=("n", "sum"), rc=("rc", "sum"))
        in_orders = lagg.index.isin(okeys)  # vectorized membership, no sets
        n_orders_unmatched = len(okeys) - int(in_orders.sum())
        rows = []
        if in_orders.any():
            sel = lagg[in_orders]
            rows.append(("matched", int(in_orders.sum()),
                         int(sel["n"].sum()), int(sel["rc"].sum())))
        if n_orders_unmatched:
            rows.append(("order_only", n_orders_unmatched, 0, 0))
        if (~in_orders).any():
            sel = lagg[~in_orders]
            rows.append(("lineitem_only", int((~in_orders).sum()),
                         int(sel["n"].sum()), int(sel["rc"].sum())))
        return pd.DataFrame(rows, columns=["cat", "n_keys", "n_lineitems", "rc"])

    parts = (
        both.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(classify, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("cat", sort=True).agg(
        n_keys=("n_keys", "sum"), n_lineitems=("n_lineitems", "sum"), rc=("rc", "sum")
    ).reset_index()
    out["revenue"] = _round_half_away(out["rc"].to_numpy(np.int64) / 100.0, 2)
    for c in ("n_keys", "n_lineitems"):
        out[c] = out[c].astype(np.int64)
    return out[["cat", "n_keys", "n_lineitems", "revenue"]].reset_index(drop=True)


def q_interarrival_stats(sf_dir: str) -> pd.DataFrame:
    """Per-event-type inter-arrival statistics of the per-user stream (the
    streaming-engine latency/cadence audit): for consecutive events of the
    same user ordered by (ts, event_id), attribute the gap to the LATER
    event's type and report pair count, mean gap seconds (ROUND 6) and max
    gap seconds. Gaps accumulate as exact integer microseconds, so the
    only float op is the final mean division — summation order can never
    change the output.

    Shape: events route by user hash (a user's stream co-locates); one
    vectorized lexsort + shifted same-user mask per bucket; per-bucket
    partials are ≤ |event_types| rows, folded by a tiny driver groupby."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        df = df.copy()
        df["bucket"] = (mixed % n_buckets).astype(np.int32)
        return df

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame(
                {"event_type": pd.Series(dtype=object),
                 "n_pairs": pd.Series(dtype=np.int64),
                 "sum_us": pd.Series(dtype=np.int64),
                 "max_us": pd.Series(dtype=np.int64)}
            )
        gap = (ts[1:] - ts[:-1])[same]
        g = (
            pd.DataFrame({"event_type": et[1:][same], "gap": gap})
            .groupby("event_type", sort=False)["gap"]
            .agg(n_pairs="size", sum_us="sum", max_us="max")
            .reset_index()
        )
        for c in ("n_pairs", "sum_us", "max_us"):
            g[c] = g[c].astype(np.int64)
        return g

    parts = (
        ev.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(gaps, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("event_type", sort=True).agg(
        n_pairs=("n_pairs", "sum"), sum_us=("sum_us", "sum"), max_us=("max_us", "max")
    ).reset_index()
    out["mean_gap_s"] = _round_half_away(
        out["sum_us"].to_numpy(np.int64) / out["n_pairs"].to_numpy(np.int64) / 1e6, 6
    )
    out["max_gap_s"] = _round_half_away(out["max_us"].to_numpy(np.int64) / 1e6, 6)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out[["event_type", "n_pairs", "mean_gap_s", "max_gap_s"]].reset_index(drop=True)


def q_lineitem_hist2d(sf_dir: str) -> pd.DataFrame:
    """2-D histogram of (quantity, discount) over lineitem (the joint-
    distribution profile behind discount-policy dashboards): qty bins of
    width 5 (floor(q/5)), discount bins in exact percent points
    (half-away ROUND(d*100) — 0.05 stored as 0.050000000000000003 still
    lands in bin 5 on both engines). Bins are bounded (≤ 11×11), so this
    is a pure distributive count: per-batch crosstab partials fold on the
    driver; no shuffle at any scale."""
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qb = np.floor(df["l_quantity"].to_numpy(np.float64) / 5.0).astype(np.int64)
        db = _round_half_away(df["l_discount"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = (
            pd.DataFrame({"qty_bin": qb, "disc_bin": db})
            .groupby(["qty_bin", "disc_bin"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = li.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby(["qty_bin", "disc_bin"], sort=True)["n"].sum().reset_index()
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


def q_changelog_compact(sf_dir: str) -> pd.DataFrame:
    """Compact the event changelog to a latest-wins snapshot per user (the
    CDC/upsert materialization every lakehouse MERGE performs): for each
    user keep the fields of their latest event by (ts, event_id) and the
    total version count. No float arithmetic — `value` passes through.

    Shape: each batch first reduces to ONE candidate row per user (its
    local latest, plus a local version count) — the arg-max combiner — so
    the exchange carries O(users·batches) candidate rows, never the raw
    changelog; candidates then route by user hash and each bucket picks
    the global winner with one vectorized lexsort. Nothing driver-side
    but the snapshot contract itself."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"])

    def local_latest(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))  # ascending; last per user wins
        d = df.iloc[order]
        u_s = d["user_id"].to_numpy(np.int64)
        last = np.r_[u_s[1:] != u_s[:-1], True]
        win = d.iloc[last].copy()
        counts = pd.Series(u).value_counts()
        win["n_versions"] = counts.loc[win["user_id"].to_numpy()].to_numpy(np.int64)
        mixed = (win["user_id"].to_numpy(np.int64) * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        win["bucket"] = (mixed % n_buckets).astype(np.int32)
        return win

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, u))
        d = df.iloc[order]
        u_s = d["user_id"].to_numpy(np.int64)
        last = np.r_[u_s[1:] != u_s[:-1], True]
        nv = d.groupby("user_id", sort=False)["n_versions"].sum()
        win = d.iloc[last].copy()
        win["n_versions"] = nv.loc[win["user_id"].to_numpy()].to_numpy(np.int64)
        return win[["user_id", "ts", "event_type", "value", "n_versions"]]

    out = (
        ev.map_batches(local_latest, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pick, batch_format="pandas")
        .to_pandas()
    )
    out = out.rename(columns={"ts": "last_ts", "event_type": "last_event_type",
                              "value": "last_value"})
    out["n_versions"] = out["n_versions"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)[
        ["user_id", "last_ts", "last_event_type", "last_value", "n_versions"]
    ]


def q_revenue_mom_growth(sf_dir: str) -> pd.DataFrame:
    """Month-over-month revenue growth (the reporting lag-on-aggregate):
    monthly order revenue summed as exact integer cents, then growth
    = ROUND((cur - prev) / prev, 6) against the previous CALENDAR month —
    a missing month yields NULL growth for the month after the gap, SQL
    LAG-over-months semantics. Only the final division touches floats.

    Shape: per-batch (month, cents) partials fold on the driver (months
    are calendar-bounded — a century is 1200 rows); the lag itself is a
    driver-side shift over that tiny series."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["o_orderdate"].to_numpy().astype("datetime64[M]")
        cents = _round_half_away(
            df["o_totalprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        g = pd.DataFrame({"month": ts, "rc": cents}).groupby("month", sort=False)[
            "rc"
        ].sum().reset_index()
        return g

    parts = orders.map_batches(partial, batch_format="pandas").to_pandas()
    m = parts.groupby("month", sort=True)["rc"].sum().reset_index()
    months = m["month"].to_numpy().astype("datetime64[M]")
    prev_has = np.r_[False, (months[1:] - months[:-1]) == np.timedelta64(1, "M")]
    rc = m["rc"].to_numpy(np.int64)
    prev_rc = np.r_[0, rc[:-1]]
    growth = np.full(len(m), np.nan)
    ok = prev_has & (prev_rc != 0)
    growth[ok] = (rc[ok] - prev_rc[ok]) / prev_rc[ok]
    out = pd.DataFrame(
        {
            "month": months.astype("datetime64[us]"),
            "revenue": _round_half_away(rc / 100.0, 2),
            "growth": np.where(np.isnan(growth), np.nan, _round_half_away(growth, 6)),
        }
    )
    return out.reset_index(drop=True)


def q_lang_vocab_overlap(sf_dir: str) -> pd.DataFrame:
    """Pairwise vocabulary overlap between languages (the cross-lingual
    contamination / shared-token audit of multilingual corpus builds):
    whitespace token sets per lang (the tfidf/bm25 convention), exact
    Jaccard = |A∩B| / |A∪B| per unordered lang pair, ROUND 6; pairs with
    empty intersection are omitted (SQL inner-join semantics).

    Shape: batches emit locally-distinct (lang, token) pairs (the
    combiner), tokens route by fingerprint64 hash so each token's lang
    set assembles in exactly one bucket; per-bucket output is per-lang
    partial vocabulary sizes plus per-pair co-occurrence counts (≤ L²
    rows), folded by a tiny driver groupby — the corpus vocabulary never
    converges on one node."""
    n_buckets = 64
    docs = _read(sf_dir, "documents", ["lang", "text"])

    def pairs_local(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        langs = np.repeat(df["lang"].to_numpy(), np.maximum(n_tok, 1))
        d = pd.DataFrame(
            {"lang": langs[valid], "tok": flat.to_numpy()[valid]}
        ).drop_duplicates()
        if not len(d):
            return pd.DataFrame({"lang": pd.Series(dtype=object),
                                 "tok": pd.Series(dtype=object),
                                 "bucket": pd.Series(dtype=np.int32)})
        h = textfn.fingerprint64(d["tok"])
        d["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return d

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["lang", "tok"]].drop_duplicates()
        sizes = d.groupby("lang", sort=False).size().reset_index(name="n")
        sizes.insert(0, "kind", "size")
        sizes = sizes.rename(columns={"lang": "a"})
        sizes["b"] = ""
        co = d.merge(d, on="tok")
        co = co[co["lang_x"] < co["lang_y"]]
        com = (
            co.groupby(["lang_x", "lang_y"], sort=False)
            .size()
            .reset_index(name="n")
            .rename(columns={"lang_x": "a", "lang_y": "b"})
        )
        com.insert(0, "kind", "common")
        out = pd.concat([sizes[["kind", "a", "b", "n"]], com[["kind", "a", "b", "n"]]],
                        ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = (
        docs.map_batches(pairs_local, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .to_pandas()
    )
    sizes = (
        parts[parts["kind"] == "size"].groupby("a", sort=True)["n"].sum().to_dict()
    )
    com = (
        parts[parts["kind"] == "common"]
        .groupby(["a", "b"], sort=True)["n"]
        .sum()
        .reset_index(name="n_common")
    )
    na = com["a"].map(sizes).to_numpy(np.int64)
    nb = com["b"].map(sizes).to_numpy(np.int64)
    nc = com["n_common"].to_numpy(np.int64)
    com["n_union"] = na + nb - nc
    com["jaccard"] = _round_half_away(nc / (na + nb - nc), 6)
    com = com.rename(columns={"a": "lang_a", "b": "lang_b"})
    com["n_common"] = com["n_common"].astype(np.int64)
    com["n_union"] = com["n_union"].astype(np.int64)
    return com.reset_index(drop=True)


def q_label_centroids(sf_dir: str, scale: int = 10**4) -> pd.DataFrame:
    """Per-label embedding centroids (the nearest-class-mean prototypes of
    embedding-space diagnostics): mean vector per label, computed with the
    embedding_pca fixed-point convention — values quantize to integers
    (half-away round of value·scale) so the distributed per-label sums are
    EXACT int64 and batch split order cannot change the result; the only
    float op is the final centroid = ROUND(S / (scale·n), 6).

    Shape: one streaming pass; each batch emits ≤ |labels|·dim partial
    (label, dim, s, n) rows — the combiner — folded by a tiny driver
    groupby (labels × dim is contract-sized). No shuffle."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.num_rows
        dim = len(flat) // max(n, 1)
        if n and len(flat) != n * dim:
            raise ValueError("ragged embedding lists")
        y = flat.reshape(n, dim) * float(scale)
        q = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        labels = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(labels, kind="stable")
        labs, starts = np.unique(labels[order], return_index=True)
        sums = np.add.reduceat(q[order], starts, axis=0)
        cnts = np.diff(np.r_[starts, len(labels)])
        return pd.DataFrame(
            {
                "label": np.repeat(labs, dim),
                "dim": np.tile(np.arange(dim, dtype=np.int64), len(labs)),
                "s": sums.ravel(),
                "n": np.repeat(cnts.astype(np.int64), dim),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["label", "dim"], sort=True).agg(
        s=("s", "sum"), n=("n", "sum")
    ).reset_index()
    g["centroid"] = _round_half_away(
        g["s"].to_numpy(np.int64) / (float(scale) * g["n"].to_numpy(np.int64)), 6
    )
    g["label"] = g["label"].astype(np.int64)
    g["n"] = g["n"].astype(np.int64)
    return g[["label", "dim", "n", "centroid"]].reset_index(drop=True)


def q_llr_bigrams(sf_dir: str, min_cnt: int = 5, k: int = 30) -> pd.DataFrame:
    """Top-k adjacent bigrams by Dunning's log-likelihood ratio (Dunning
    CL 1993) — the collocation significance test corpus pipelines run
    beside PMI (LLR does not over-reward rare pairs). For the 2×2 table
    k11=c(ab), k12=c(a·)−c, k21=c(·b)−c, k22=N−c(a·)−c(·b)+c:
    LLR = 2·Σ k·ln(k·N / (rowsum·colsum)), empty cells contribute 0. One
    deterministic float expression mirrored verbatim in the oracle,
    rounded half-away(6), ordered (llr DESC, a, b), LIMIT k.

    Shape: per-batch bigram partials (the combiner) merge by hash-bucket
    groupby; both marginals are bucketed folds OVER THE MERGED bigram
    table (vocab-bounded, never per-occurrence); marginals attach to the
    ≥min_cnt candidates broadcast-or-hash. All counts exact int64."""
    from pagerank_ray.stages import joins

    n_buckets = 64
    ds = _read(sf_dir, "documents", ["text"])

    def big_partial(df: pd.DataFrame) -> pd.DataFrame:
        w, valid, doc_idx = _exploded_tokens(df)
        if len(w) <= 1:
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype=np.int64)})
        m = valid[:-1] & valid[1:] & (doc_idx[:-1] == doc_idx[1:])
        if not m.any():
            return pd.DataFrame({"a": pd.Series(dtype=object),
                                 "b": pd.Series(dtype=object),
                                 "cnt": pd.Series(dtype=np.int64)})
        out = (
            pd.DataFrame({"a": w[:-1][m], "b": w[1:][m]})
            .groupby(["a", "b"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    def bucketize_on(cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            key = df[cols[0]].astype(str)
            for c in cols[1:]:
                key = key + "\x1f" + df[c].astype(str)
            h = textfn.fingerprint64(key)
            df = df.copy()
            df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
            return df
        return fn

    def merge_on(cols):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby(cols, sort=False)["cnt"].sum().reset_index()
            out["cnt"] = out["cnt"].astype(np.int64)
            return out
        return fn

    bg = (
        ds.map_batches(big_partial, batch_format="pandas")
        .map_batches(bucketize_on(["a", "b"]), batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_on(["a", "b"]), batch_format="pandas")
        .materialize()
    )
    n_total = int(bg.sum("cnt"))
    left = (
        bg.map_batches(
            lambda df: df.groupby("a", sort=False)["cnt"].sum().reset_index(),
            batch_format="pandas",
        )
        .map_batches(bucketize_on(["a"]), batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_on(["a"]), batch_format="pandas")
    )
    right = (
        bg.map_batches(
            lambda df: df.groupby("b", sort=False)["cnt"].sum().reset_index(),
            batch_format="pandas",
        )
        .map_batches(bucketize_on(["b"]), batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge_on(["b"]), batch_format="pandas")
    )
    cand = bg.map_batches(lambda df: df[df["cnt"] >= min_cnt], batch_format="pandas")
    cand = joins.attach_column(cand, left, probe_col="a", build_key="a",
                               build_val="cnt", out_col="ca")
    cand = joins.attach_column(cand, right, probe_col="b", build_key="b",
                               build_val="cnt", out_col="cb")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        c = df["cnt"].to_numpy(np.int64)
        ca = df["ca"].to_numpy(np.int64)
        cb = df["cb"].to_numpy(np.int64)
        N = n_total

        def term(kk, row, col):
            kk = kk.astype(np.float64)
            arg = (kk * N) / (row.astype(np.float64) * col.astype(np.float64))
            # k==0 cells contribute 0 (lim x·ln x = 0); mask keeps log finite
            with np.errstate(divide="ignore", invalid="ignore"):
                v = kk * np.log(arg)
            return np.where(kk == 0, 0.0, v)

        llr = 2.0 * (
            term(c, ca, cb)
            + term(ca - c, ca, N - cb)
            + term(cb - c, N - ca, cb)
            + term(N - ca - cb + c, N - ca, N - cb)
        )
        out = df[["a", "b"]].copy()
        out["n_pair"] = c
        out["llr"] = _round_half_away(llr, 6)
        return out

    top = (
        cand.map_batches(score, batch_format="pandas")
        .sort(["llr", "a", "b"], descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    return top.reset_index(drop=True)


def q_region_homophily(sf_dir: str) -> pd.DataFrame:
    """Newman attribute assortativity of the order→supplier trade graph
    contracted to REGIONS (Newman PRE 2003 eq. 2, the homophily test of
    network analysis — do customers buy within their own region?): over
    distinct (orderkey, suppkey) edges labeled (customer region, supplier
    region), r = (M·Σe_ii − Σa_i·b_i) / (M² − Σa_i·b_i) with edge counts
    M, diagonal e_ii, out/in marginals a,b — all EXACT integers folded as
    Python ints on the driver (the ≤R² matrix), one final float division,
    ROUND 6.

    Shape: the nation_trade_graph contraction plan (bucketed pair dedup →
    broadcast-or-hash dimension attaches), then each batch maps nations to
    regions through a ≤25-entry broadcast dict and emits ≤R² count
    partials. Nothing bigger than R² leaves any stage."""
    from pagerank_ray.stages import joins

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region_of = dict(zip(nation["n_nationkey"].astype(np.int64),
                         nation["n_regionkey"].astype(np.int64)))

    edges = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"src_id": t.column("l_orderkey"), "dst_id": t.column("l_suppkey")})

    pairs = dedup_pairs(edges.map_batches(rename, batch_format="pyarrow"))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    pairs = joins.attach_with_default(pairs, orders, probe_col="src_id",
                                      build_key="o_orderkey", build_val="o_custkey",
                                      out_col="custkey", default=-1)
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    pairs = joins.attach_with_default(pairs, cust, probe_col="custkey",
                                      build_key="c_custkey", build_val="c_nationkey",
                                      out_col="cust_nation", default=-1)
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    pairs = joins.attach_with_default(pairs, sup, probe_col="dst_id",
                                      build_key="s_suppkey", build_val="s_nationkey",
                                      out_col="supp_nation", default=-1)

    def count_regions(df: pd.DataFrame) -> pd.DataFrame:
        cn = df["cust_nation"].to_numpy(np.int64)
        sn = df["supp_nation"].to_numpy(np.int64)
        keep = (cn >= 0) & (sn >= 0)
        ra = pd.Series(cn[keep]).map(region_of).to_numpy(np.int64)
        rb = pd.Series(sn[keep]).map(region_of).to_numpy(np.int64)
        g = (
            pd.DataFrame({"ra": ra, "rb": rb})
            .groupby(["ra", "rb"], sort=False)
            .size()
            .reset_index(name="w")
        )
        g["w"] = g["w"].astype(np.int64)
        return g

    parts = pairs.map_batches(count_regions, batch_format="pandas").to_pandas()
    mat = parts.groupby(["ra", "rb"], sort=True)["w"].sum().reset_index()
    m = int(mat["w"].sum())
    eii = int(mat.loc[mat["ra"] == mat["rb"], "w"].sum())
    a_out = mat.groupby("ra")["w"].sum()
    b_in = mat.groupby("rb")["w"].sum()
    s_ab = sum(int(a_out.get(i, 0)) * int(b_in.get(i, 0))
               for i in set(a_out.index) | set(b_in.index))
    denom = m * m - s_ab
    r = float("nan") if denom == 0 else (m * eii - s_ab) / denom
    return pd.DataFrame(
        {
            "n_edges": np.array([m], np.int64),
            "n_same": np.array([eii], np.int64),
            "assortativity": [r if denom == 0 else _round_half_away(np.array([r]), 6)[0]],
        }
    )


def q_chi2_independence(sf_dir: str) -> pd.DataFrame:
    """Chi-square independence cells for event_type × ISO weekday (the
    categorical-association audit behind "does activity mix shift by
    day?"): per cell the observed count, the independence expectation
    e = (rowsum·colsum)/N and the signed contribution (o−e)²/e·sign(o−e),
    each a SINGLE float expression over exact integer counts (no float
    accumulation anywhere, so the distributed fold cannot perturb it),
    ROUND 6, sorted (event_type, dow).

    Shape: per-batch (type, dow) count partials — the T×7-bounded
    distributive combiner — fold on the driver; marginals derive from the
    folded matrix. No shuffle."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        dow = (df["ts"].dt.dayofweek.to_numpy(np.int64) + 1)  # ISO: Mon=1
        g = (
            pd.DataFrame({"event_type": df["event_type"].to_numpy(), "dow": dow})
            .groupby(["event_type", "dow"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    mat = parts.groupby(["event_type", "dow"], sort=True)["n"].sum().reset_index()
    total = int(mat["n"].sum())
    row = mat.groupby("event_type")["n"].sum()
    col = mat.groupby("dow")["n"].sum()
    r = mat["event_type"].map(row).to_numpy(np.int64)
    c = mat["dow"].map(col).to_numpy(np.int64)
    o = mat["n"].to_numpy(np.int64)
    e = (r.astype(np.float64) * c.astype(np.float64)) / float(total)
    d = o.astype(np.float64) - e
    contrib = np.sign(d) * (d * d) / e
    out = mat.copy()
    out["n"] = o
    out["expected"] = _round_half_away(e, 6)
    out["contrib"] = _round_half_away(contrib, 6)
    return out.reset_index(drop=True)


def q_benford_prices(sf_dir: str) -> pd.DataFrame:
    """Benford first-digit audit of order totals (the classic fraud /
    data-quality screen): first significant digit extracted from the
    EXACT cents integer's decimal string (no float log10 near power-of-10
    boundaries), observed frequency vs the Benford expectation
    ln(1+1/d)/ln(10), both ROUND 6, sorted by digit.

    Shape: per-batch 9-row digit-count partials fold on the driver —
    distributive, no shuffle."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(
            df["o_totalprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        cents = cents[cents > 0]
        first = pd.Series(cents).astype(str).str[0].astype(np.int64)
        vc = first.value_counts()
        return pd.DataFrame({"digit": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    parts = orders.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("digit", sort=True)["n"].sum().reset_index()
    total = int(out["n"].sum())
    out["freq"] = _round_half_away(out["n"].to_numpy(np.int64) / float(total), 6)
    out["benford"] = _round_half_away(
        np.log(1.0 + 1.0 / out["digit"].to_numpy(np.float64)) / np.log(10.0), 6
    )
    out["n"] = out["n"].astype(np.int64)
    return out.reset_index(drop=True)


def q_greedy_coverage(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Greedy max-coverage corpus selection (the Nemhauser-Wolsey-Fisher
    1978 submodular greedy, the subset-selection primitive behind "pick K
    documents that together cover the most vocabulary"): K rounds, each
    selecting the document with the most tokens not yet covered (ties →
    lowest doc_id), then adding its tokens to the covered set. Documents
    with zero uncovered tokens (including already-selected ones) drop out;
    the selection ends early if no positive-gain document remains. Output
    one row per round: (round, doc_id, gain, covered cumulative total).

    Shape: a document's tokens never leave its batch (the tfidf
    invariant), so per-round marginal gains are batch-local-complete:
    each round is ONE streaming pass where every batch emits only its
    local best candidate (doc, gain, its uncovered tokens — ≤ one doc's
    vocabulary); the driver keeps the global argmax and unions ≤ K
    documents' token sets. The covered set broadcast each round is the
    union of ≤ K docs' vocabularies — small by construction, independent
    of corpus size. K passes total; nothing vocabulary-sized shuffles or
    reaches the driver."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()

    covered: set = set()
    rows = []
    for rnd in range(1, k + 1):
        cov_arr = np.array(sorted(covered), dtype=object)

        def best_local(df: pd.DataFrame, cov=cov_arr) -> pd.DataFrame:
            w, valid, rep = _exploded_tokens(df, id_col="doc_id")
            empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                  "gain": pd.Series(dtype=np.int64),
                                  "toks": pd.Series(dtype=str)})
            if not valid.any():
                return empty
            d = pd.DataFrame({"doc_id": rep[valid], "tok": w[valid]}).drop_duplicates()
            if len(cov):
                d = d[~d["tok"].isin(cov)]
            if not len(d):
                return empty
            g = d.groupby("doc_id", sort=False).size()
            # local argmax with the global tie rule (gain desc, doc_id asc)
            best = g.sort_index().sort_values(kind="stable", ascending=False).index[0]
            # tokens are whitespace-split, so the \x1f join is injective
            toks = "\x1f".join(d.loc[d["doc_id"] == best, "tok"].tolist())
            return pd.DataFrame({"doc_id": np.array([best], np.int64),
                                 "gain": np.array([int(g.loc[best])], np.int64),
                                 "toks": [toks]})

        cands = ds.map_batches(best_local, batch_format="pandas").to_pandas()
        # an exhausted corpus returns only empty partials (a columnless
        # frame after the concat) — the greedy selection ends early
        if not len(cands) or "gain" not in cands.columns:
            break
        cands = cands[cands["gain"] > 0]
        if not len(cands):
            break
        cands = cands.sort_values(["gain", "doc_id"], ascending=[False, True],
                                  kind="stable")
        win = cands.iloc[0]
        covered.update(win["toks"].split("\x1f"))
        rows.append((rnd, int(win["doc_id"]), int(win["gain"]), len(covered)))
    return pd.DataFrame(rows, columns=["round", "doc_id", "gain", "covered"]).astype(
        {"round": np.int64, "doc_id": np.int64, "gain": np.int64, "covered": np.int64}
    )


def q_user_primary_type(sf_dir: str) -> pd.DataFrame:
    """Grouped MODE aggregate — each user's most frequent event type (ties
    → lexicographically smallest type), with its count and the user's
    total events. Mode is not algebraic, so engines fake it with a
    count-then-argmax: here per-batch (user, type) count partials (the
    combiner) route by user hash, each bucket folds its users' counts and
    picks the winner with one vectorized lexsort. Output is the per-user
    contract (driver sees only results)."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        u = g["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        g["bucket"] = (mixed % n_buckets).astype(np.int32)
        return g

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        m = df.groupby(["user_id", "event_type"], sort=False)["n"].sum().reset_index()
        tot = m.groupby("user_id", sort=False)["n"].sum()
        # winner per user: max n, tie -> smallest type; lexsort is
        # last-key-primary, so order by (type asc within n desc within user)
        et = m["event_type"].to_numpy()
        order = np.lexsort((et, -m["n"].to_numpy(np.int64),
                            m["user_id"].to_numpy(np.int64)))
        m = m.iloc[order]
        first = np.r_[True, m["user_id"].to_numpy(np.int64)[1:]
                      != m["user_id"].to_numpy(np.int64)[:-1]]
        win = m.iloc[first].copy()
        win["n_total"] = tot.loc[win["user_id"].to_numpy()].to_numpy(np.int64)
        return win.rename(columns={"event_type": "primary_type", "n": "n_primary"})[
            ["user_id", "primary_type", "n_primary", "n_total"]
        ]

    out = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pick, batch_format="pandas")
        .to_pandas()
    )
    out["n_primary"] = out["n_primary"].astype(np.int64)
    out["n_total"] = out["n_total"].astype(np.int64)
    return out.sort_values("user_id").reset_index(drop=True)


def q_rolling_active_users(sf_dir: str, window: int = 7) -> pd.DataFrame:
    """EXACT rolling 7-day distinct users per day (the sliding-window
    cardinality metric, exact counterpart of the HLL-based
    q_window_active_users): for every window end day d, the number of
    users active in [d−6, d]. Sliding distinct does not decompose over
    windows, but it DOES decompose over per-user first-activity days: an
    active day `day` with previous active day `pday` (LAG) makes its user
    the window's first-seen exactly for window ends in
    [max(day, pday+window), day+window−1] — so each distinct (user, day)
    pair explodes to ≤window +1 contributions and the count per window is
    a plain integer sum. Window ends with no active user are absent (SQL
    GROUP BY semantics); trailing windows past the last active day count
    their lingering users.

    Shape: per-batch distinct (user, epoch-day) pairs (the combiner)
    route by user hash; each bucket runs one lexsort + shifted LAG + a
    vectorized interval explode and emits (day_end, n) partials bounded
    by the calendar, folded by a tiny driver groupby. Per-user work is
    linear; nothing user-set-sized moves."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
               // 86_400_000_000)
        d = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "day": day}).drop_duplicates()
        u = d["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        d["bucket"] = (mixed % n_buckets).astype(np.int32)
        return d

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["user_id", "day"]].drop_duplicates()
        u = d["user_id"].to_numpy(np.int64)
        day = d["day"].to_numpy(np.int64)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        same = np.r_[False, u[1:] == u[:-1]]
        pday = np.r_[np.int64(0), day[:-1]]
        lo = np.where(same, np.maximum(day, pday + window), day)
        hi = day + window - 1
        lens = hi - lo + 1  # in [1, window] because pday < day strictly
        total = int(lens.sum())
        off = np.concatenate([[0], np.cumsum(lens)[:-1]])
        ends = (np.arange(total, dtype=np.int64) - np.repeat(off, lens)
                + np.repeat(lo, lens))
        vc = pd.Series(ends).value_counts()
        return pd.DataFrame({"day_end": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    parts = (
        ev.map_batches(pairs, batch_format="pandas")
        .groupby("bucket")
        .map_groups(explode, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("day_end", sort=True)["n"].sum().reset_index(name="n_active")
    out["n_active"] = out["n_active"].astype(np.int64)
    return out.reset_index(drop=True)


def q_bounce_rate(sf_dir: str, gap_s: int = 1800) -> pd.DataFrame:
    """Session bounce rate per entry event type (the web-analytics rollup
    on top of sessionization): sessions split on >30-minute gaps per user
    (the q_sessionize rule, (ts, event_id)-ordered), grouped by the
    session's FIRST event type; per entry type report session count,
    single-event ("bounce") count and rate = ROUND(bounces/sessions, 6).

    Shape: a user's stream co-locates by user-hash bucket, so whole
    sessions assemble locally: one lexsort + gap cumsum per bucket, then
    session-level first-type/count rows collapse immediately to ≤T
    per-type partials — event rows never leave their bucket, the driver
    folds T-bounded partials only."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        df = df.copy()
        df["bucket"] = (mixed % n_buckets).astype(np.int32)
        return df

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        new = np.r_[True, (u[1:] != u[:-1])
                    | (ts[1:] - ts[:-1] > gap_s * 1_000_000)]
        sid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, len(sid)])
        g = (
            pd.DataFrame({"first_type": et[starts],
                          "one": np.ones(len(starts), np.int64),
                          "bounce": (counts == 1).astype(np.int64)})
            .groupby("first_type", sort=False)
            .agg(n_sessions=("one", "sum"), n_bounce=("bounce", "sum"))
            .reset_index()
        )
        for c in ("n_sessions", "n_bounce"):
            g[c] = g[c].astype(np.int64)
        return g

    parts = (
        ev.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("first_type", sort=True).agg(
        n_sessions=("n_sessions", "sum"), n_bounce=("n_bounce", "sum")
    ).reset_index()
    out["bounce_rate"] = _round_half_away(
        out["n_bounce"].to_numpy(np.int64) / out["n_sessions"].to_numpy(np.int64), 6
    )
    for c in ("n_sessions", "n_bounce"):
        out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)


def q_cheirank(sf_dir: str, n_workers: int = 4, iters: int = 20) -> pd.DataFrame:
    """CheiRank — fixed-iteration PageRank on the REVERSED lineitem graph
    (Chepelianskii 2010 / Zhirov et al. 2010: ranks "communicative" nodes,
    the out-link mirror of PageRank's in-link authority; on the web graph
    the two together give the 2D ranking plane). Identical recurrence and
    parameters to q_pagerank_fixed (α = 0.85, r⁰ = 1, dangling
    redistribution, 20 supersteps), run over the dst→src edge set — so
    the oracle is the SAME unrolled SQL with the edge endpoints swapped.

    Shape: reuses the cached dense-id lineitem edges and the cached
    reversed CSR (the q_hits 'rev' variant — shared workdir, built once
    across q_hits/q_salsa/q_cheirank)."""
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
    from pagerank_ray.pipelines.pagerank import pagerank

    _csr_fwd, n, id_map, dense_edges = _lineitem_csr(
        sf_dir, n_workers=n_workers, symmetrize=False, return_edges=True
    )

    def swap(t: pa.Table) -> pa.Table:
        return pa.table({"src_id": t.column("dst_id"), "dst_id": t.column("src_id")})

    csr_rev = os.path.join(_graph_workdir(sf_dir, "rev"), "csr")
    prepare_csr_from_edges(
        dense_edges.map_batches(swap, batch_format="pyarrow"),
        n,
        csr_rev,
        n_parts=4 * n_workers,
    )
    res = pagerank(csr_rev, n_workers=n_workers, max_iters=iters, eps_per_vertex=0.0)
    df = _attach_orig(res.result, id_map, n, ["id"])
    df = df.sort_values("id").reset_index(drop=True)
    df["cheirank"] = _round_half_away(df["rank"], 6)
    return df[["id", "cheirank"]]


def q_welch_ttest(sf_dir: str, flag_a: str = "A", flag_b: str = "R") -> pd.DataFrame:
    """Welch's unequal-variance t-test between two lineitem segments (the
    A/B-experiment readout, BSTJ Welch 1947): compare mean extended price
    of return flags ``flag_a`` vs ``flag_b``. All moments accumulate as
    EXACT integers (cents and squared cents; per-batch int64 partials —
    the bound is cents ≤ 10⁷, squared 10¹⁴, × batch ≤ 8192 < 2⁶³ — folded
    as Python ints on the driver), so the t statistic and Welch-
    Satterthwaite dof are each ONE deterministic float expression over
    exact integers, mirrored verbatim in the oracle. ROUND 6.

    Shape: two-row distributive aggregate — no shuffle."""
    import pyarrow.dataset as pds

    li = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"],
        filter=pds.field("l_returnflag").isin([flag_a, flag_b]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(
            df["l_extendedprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        g = pd.DataFrame({"flag": df["l_returnflag"].to_numpy(), "c": cents,
                          "q": cents * cents})
        out = g.groupby("flag", sort=False).agg(
            n=("c", "size"), s=("c", "sum"), q=("q", "sum")
        ).reset_index()
        for c in ("n", "s", "q"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = li.map_batches(partial, batch_format="pandas").to_pandas()
    acc = {}
    for _, r in parts.iterrows():
        n, s, q = acc.get(r["flag"], (0, 0, 0))
        acc[r["flag"]] = (n + int(r["n"]), s + int(r["s"]), q + int(r["q"]))
    (n1, s1, q1), (n2, s2, q2) = acc[flag_a], acc[flag_b]
    m1 = s1 / (100.0 * n1)
    m2 = s2 / (100.0 * n2)
    # sample variance in cents^2 from exact integers: (nQ - S^2)/(n(n-1))
    v1 = float(n1 * q1 - s1 * s1) / float(n1 * (n1 - 1))
    v2 = float(n2 * q2 - s2 * s2) / float(n2 * (n2 - 1))
    a = v1 / n1
    b = v2 / n2
    # ONE canonical expression (mirrored in SQL), on the cents scale
    t = ((s1 / float(n1)) - (s2 / float(n2))) / np.sqrt(a + b)
    dof = (a + b) * (a + b) / (a * a / (n1 - 1) + b * b / (n2 - 1))
    return pd.DataFrame(
        {
            "flag_a": [flag_a], "flag_b": [flag_b],
            "n_a": np.array([n1], np.int64), "n_b": np.array([n2], np.int64),
            "mean_a": _round_half_away(np.array([m1]), 6),
            "mean_b": _round_half_away(np.array([m2]), 6),
            "t_stat": _round_half_away(np.array([t]), 6),
            "dof": _round_half_away(np.array([dof]), 6),
        }
    )


def q_ols_by_flag(sf_dir: str) -> pd.DataFrame:
    """Grouped ordinary-least-squares regression — price-per-quantity line
    per return flag (slope/intercept of l_extendedprice ~ l_quantity, the
    elasticity readout next to q_qty_price_corr's Pearson r): all five
    moments (n, Σx, Σy, Σxy, Σx²) accumulate as EXACT integers (quantity
    units and price cents; per-batch int64 partials, Python-int driver
    fold), slope and intercept are single float expressions over those
    integers, mirrored verbatim in the oracle. Dollar-scale outputs,
    ROUND 6. Flags with < 2 rows or zero x-variance are omitted.

    Shape: F-row distributive aggregate — no shuffle."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy(np.float64).astype(np.int64)  # integral units
        y = _round_half_away(
            df["l_extendedprice"].to_numpy(np.float64) * 100.0, 0
        ).astype(np.int64)
        g = pd.DataFrame({"flag": df["l_returnflag"].to_numpy(), "x": x, "y": y,
                          "xy": x * y, "xx": x * x})
        out = g.groupby("flag", sort=False).agg(
            n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy=("xy", "sum"), sxx=("xx", "sum"),
        ).reset_index()
        for c in ("n", "sx", "sy", "sxy", "sxx"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = li.map_batches(partial, batch_format="pandas").to_pandas()
    acc = {}
    for _, r in parts.iterrows():
        n, sx, sy, sxy, sxx = acc.get(r["flag"], (0, 0, 0, 0, 0))
        acc[r["flag"]] = (n + int(r["n"]), sx + int(r["sx"]), sy + int(r["sy"]),
                          sxy + int(r["sxy"]), sxx + int(r["sxx"]))
    rows = []
    for flag in sorted(acc):
        n, sx, sy, sxy, sxx = acc[flag]
        det = n * sxx - sx * sx
        if n < 2 or det == 0:
            continue
        slope = float(n * sxy - sx * sy) / float(det) / 100.0
        intercept = float(sxx * sy - sx * sxy) / float(det) / 100.0
        rows.append((flag, n, slope, intercept))
    out = pd.DataFrame(rows, columns=["flag", "n", "slope", "intercept"])
    out["n"] = out["n"].astype(np.int64)
    out["slope"] = _round_half_away(out["slope"].to_numpy(np.float64), 6)
    out["intercept"] = _round_half_away(out["intercept"].to_numpy(np.float64), 6)
    return out.reset_index(drop=True)


def q_day_churn_overlap(sf_dir: str) -> pd.DataFrame:
    """Day-over-day active-user overlap (the retention/churn Jaccard):
    for each consecutive calendar day pair (d, d+1) with activity on both,
    |A_d ∩ A_{d+1}| (users active both days), |A_d ∪ A_{d+1}| and their
    Jaccard (ROUND 6). Exact: the intersection decomposes per user —
    a user contributes to day pair d iff days d and d+1 are BOTH in their
    active-day set — so user-bucketed sorted day lists yield adjacent-day
    hits with one vectorized diff==1 scan; daily totals are distinct
    (user, day) counts from the same buckets. Calendar-bounded partials.

    Shape: same bucketed per-user pass as rolling_active_users; nothing
    user-set-sized moves."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["ts", "user_id"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        day = (df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
               // 86_400_000_000)
        d = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                          "day": day}).drop_duplicates()
        u = d["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        d["bucket"] = (mixed % n_buckets).astype(np.int32)
        return d

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["user_id", "day"]].drop_duplicates()
        u = d["user_id"].to_numpy(np.int64)
        day = d["day"].to_numpy(np.int64)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        adj = (u[1:] == u[:-1]) & (day[1:] - day[:-1] == 1)
        daily = pd.Series(day).value_counts()
        both = pd.Series(day[:-1][adj]).value_counts()
        out = pd.DataFrame({"day": daily.index.to_numpy(np.int64),
                            "n_day": daily.to_numpy(np.int64),
                            "n_both": np.zeros(len(daily), np.int64)})
        out = out.set_index("day")
        out.loc[both.index, "n_both"] = both.to_numpy(np.int64)
        return out.reset_index()

    parts = (
        ev.map_batches(pairs, batch_format="pandas")
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
        .to_pandas()
    )
    m = parts.groupby("day", sort=True).agg(
        n_day=("n_day", "sum"), n_both=("n_both", "sum")
    ).reset_index()
    day = m["day"].to_numpy(np.int64)
    nd = m["n_day"].to_numpy(np.int64)
    nb = m["n_both"].to_numpy(np.int64)
    has_next = np.r_[day[1:] - day[:-1] == 1, False]
    idx = np.flatnonzero(has_next)
    n_common = nb[idx]
    n_union = nd[idx] + nd[idx + 1] - n_common
    out = pd.DataFrame({
        "day": day[idx],
        "n_common": n_common.astype(np.int64),
        "n_union": n_union.astype(np.int64),
        "jaccard": _round_half_away(n_common / n_union, 6),
    })
    return out.reset_index(drop=True)


def q_centroid_similarity(sf_dir: str, scale: int = 10**4) -> pd.DataFrame:
    """Pairwise cosine similarity between per-label embedding centroids
    (the class-confusability matrix of embedding diagnostics): because the
    per-label counts cancel, cos(a, b) = Σ_d S_a S_b / (√ΣS_a² · √ΣS_b²)
    over the EXACT integer quantized per-(label, dim) sums S — all three
    inner products are exact integers (Python-int driver fold over the
    L×D grid), the cosine is one float expression, ROUND 6. Upper
    triangle (label_a < label_b), sorted.

    Shape: identical one-pass partial as q_label_centroids (≤ L·D rows
    per batch); the L×L matrix math is driver-side on contract-sized
    integers. No shuffle."""
    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t.column("embedding").combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = t.num_rows
        dim = len(flat) // max(n, 1)
        if n and len(flat) != n * dim:
            raise ValueError("ragged embedding lists")
        y = flat.reshape(n, dim) * float(scale)
        q = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        labels = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(labels, kind="stable")
        labs, starts = np.unique(labels[order], return_index=True)
        sums = np.add.reduceat(q[order], starts, axis=0)
        return pd.DataFrame(
            {"label": np.repeat(labs, dim),
             "dim": np.tile(np.arange(dim, dtype=np.int64), len(labs)),
             "s": sums.ravel()}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby(["label", "dim"], sort=True)["s"].sum().reset_index()
    labs = sorted(g["label"].unique().tolist())
    vecs = {
        lab: [int(v) for v in
              g[g["label"] == lab].sort_values("dim")["s"].tolist()]
        for lab in labs
    }
    rows = []
    for i, a in enumerate(labs):
        va = vecs[a]
        na = sum(x * x for x in va)  # exact Python ints — no overflow at any n
        for b in labs[i + 1:]:
            vb = vecs[b]
            nb = sum(x * x for x in vb)
            dot = sum(x * y for x, y in zip(va, vb))
            if na == 0 or nb == 0:
                continue
            cos = float(dot) / (np.sqrt(float(na)) * np.sqrt(float(nb)))
            rows.append((a, b, cos))
    out = pd.DataFrame(rows, columns=["label_a", "label_b", "cosine"])
    out["label_a"] = out["label_a"].astype(np.int64)
    out["label_b"] = out["label_b"].astype(np.int64)
    out["cosine"] = _round_half_away(out["cosine"].to_numpy(np.float64), 6)
    return out.reset_index(drop=True)


def q_k_anonymity(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """k-anonymity audit over the quasi-identifier pair (c_nationkey,
    c_mktsegment) — the privacy-release check (Sweeney 2002): an
    equivalence class smaller than ``k`` re-identifies its members. Per
    class-size regime report class count and record count, plus the
    violating-record fraction (ROUND 6). Output rows: 'violating'
    (size < k) and 'anonymous' (size ≥ k); empty regimes omitted.

    Shape: per-batch (nation, segment) count partials — the combiner —
    fold on the driver (the QI domain is N×S-bounded); everything exact
    integers until the final fraction."""
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["c_nationkey", "c_mktsegment"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        g["c_nationkey"] = g["c_nationkey"].astype(np.int64)
        return g

    parts = cust.map_batches(partial, batch_format="pandas").to_pandas()
    classes = parts.groupby(["c_nationkey", "c_mktsegment"], sort=False)["n"].sum()
    total = int(classes.sum())
    viol = classes[classes < k]
    anon = classes[classes >= k]
    rows = []
    if len(viol):
        rows.append(("violating", len(viol), int(viol.sum()),
                     float(int(viol.sum())) / total))
    if len(anon):
        rows.append(("anonymous", len(anon), int(anon.sum()),
                     float(int(anon.sum())) / total))
    out = pd.DataFrame(rows, columns=["regime", "n_classes", "n_records", "frac"])
    out = out.sort_values("regime").reset_index(drop=True)
    out["n_classes"] = out["n_classes"].astype(np.int64)
    out["n_records"] = out["n_records"].astype(np.int64)
    out["frac"] = _round_half_away(out["frac"].to_numpy(np.float64), 6)
    return out


def q_l_diversity(sf_dir: str, l_min: int = 3) -> pd.DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007, the successor check
    to k-anonymity): a quasi-identifier class is safe only if its
    SENSITIVE attribute takes ≥ l distinct values. QI = c_nationkey,
    sensitive = c_mktsegment. Per regime ('diverse' / 'violating') report
    class count and record count, fraction ROUND 6.

    Shape: per-batch locally-distinct (nation, segment) pairs plus
    (nation, n_records) count partials — both QI-domain-bounded — fold on
    the driver; distinct-per-class sums exactly because a (nation,
    segment) pair dedups globally on the tiny folded grid."""
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_mktsegment"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["c_nationkey", "c_mktsegment"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        g["c_nationkey"] = g["c_nationkey"].astype(np.int64)
        return g

    parts = cust.map_batches(partial, batch_format="pandas").to_pandas()
    grid = parts.groupby(["c_nationkey", "c_mktsegment"], sort=False)["n"].sum()
    per_class = grid.reset_index().groupby("c_nationkey").agg(
        n_distinct=("c_mktsegment", "nunique"), n_records=("n", "sum")
    )
    total = int(per_class["n_records"].sum())
    div = per_class[per_class["n_distinct"] >= l_min]
    bad = per_class[per_class["n_distinct"] < l_min]
    rows = []
    if len(div):
        rows.append(("diverse", len(div), int(div["n_records"].sum())))
    if len(bad):
        rows.append(("violating", len(bad), int(bad["n_records"].sum())))
    out = pd.DataFrame(rows, columns=["regime", "n_classes", "n_records"])
    out = out.sort_values("regime").reset_index(drop=True)
    out["frac"] = _round_half_away(
        out["n_records"].to_numpy(np.int64) / float(total), 6
    )
    out["n_classes"] = out["n_classes"].astype(np.int64)
    out["n_records"] = out["n_records"].astype(np.int64)
    return out


def q_order_size_hist(sf_dir: str) -> pd.DataFrame:
    """Order-size distribution — lineitems per order, histogrammed (the
    fill-rate profile of warehouse monitoring): per order count its
    lineitem rows, then bucket counts into sizes 1..6 and '7+'. Exact
    integers throughout.

    Shape: per-batch (orderkey, n) partials (the combiner), orderkey-hash
    bucketed fold to finish per-order counts, then each bucket collapses
    to ≤7 histogram rows — the driver folds 7·n_buckets rows."""
    n_buckets = 64
    li = _read(sf_dir, "lineitem", ["l_orderkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["l_orderkey"].value_counts()
        g = pd.DataFrame({"key": vc.index.to_numpy(np.int64),
                          "n": vc.to_numpy(np.int64)})
        mixed = (g["key"].to_numpy(np.int64) * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        g["bucket"] = (mixed % n_buckets).astype(np.int32)
        return g

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        per = df.groupby("key", sort=False)["n"].sum()
        size = np.minimum(per.to_numpy(np.int64), 7)
        vc = pd.Series(size).value_counts()
        return pd.DataFrame({"order_size": vc.index.to_numpy(np.int64),
                             "n_orders": vc.to_numpy(np.int64)})

    parts = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(hist, batch_format="pandas")
        .to_pandas()
    )
    out = parts.groupby("order_size", sort=True)["n_orders"].sum().reset_index()
    out["n_orders"] = out["n_orders"].astype(np.int64)
    return out.reset_index(drop=True)


def q_session_paths(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k most frequent length-3 event-type paths in the per-user
    stream — the second-order extension of ``q_event_transitions`` (web
    usage mining's classic "navigation path" report): consecutive triples
    of the same user's events ordered by (ts, event_id), counted, top-k
    by (n desc, path asc).

    Shape: the event_transitions idiom — user-hash buckets co-locate each
    stream, one vectorized lexsort + double same-user adjacency mask +
    triple value_counts per bucket; partials are ≤ T³ rows per bucket
    (T = event-type vocabulary) and fold on the driver."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        df = df.copy()
        df["bucket"] = (mixed % n_buckets).astype(np.int32)
        return df

    def triples(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"e1": pd.Series(dtype=object), "e2": pd.Series(dtype=object),
             "e3": pd.Series(dtype=object), "n": pd.Series(dtype=np.int64)}
        )
        if len(df) < 3:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        same = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        if not same.any():
            return empty
        out = (
            pd.DataFrame({"e1": et[:-2][same], "e2": et[1:-1][same],
                          "e3": et[2:][same]})
            .groupby(["e1", "e2", "e3"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = (
        ev.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(triples, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby(["e1", "e2", "e3"], sort=False)["n"].sum().reset_index()
    agg["n"] = agg["n"].astype(np.int64)
    top = agg.sort_values(
        ["n", "e1", "e2", "e3"], ascending=[False, True, True, True],
        kind="mergesort",
    ).head(k)
    return top.reset_index(drop=True)


def q_knn_label_disagreement(
    sf_dir: str, k: int = 10, top: int = 20
) -> pd.DataFrame:
    """Label-noise audit via k-NN disagreement (the Confident-Learning /
    Wilson-editing family, Northcutt et al. 2021): for every embedding,
    the fraction of its k exact nearest neighbors (quantized squared
    Euclidean, ties by vec_id) carrying a DIFFERENT label; the top rows
    by (frac desc, vec_id) are the suspected mislabels. Embeddings
    quantize to int (ROUND(v·10⁴)) so all distances are exact int64 and
    the DuckDB oracle matches bit-for-bit.

    Shape: the reference matrix (vec_id, label, qvec) broadcasts once
    (``ray.put`` + per-worker cache) and every batch computes its int64
    distance block via one matmul — brute force IS the audit baseline at
    reference-set scale (`stages/knn.py` IVF is the path when the
    reference side outgrows a broadcast). Per-batch top rows are the
    combiner; the driver re-selects the global top."""
    import ray

    from pagerank_ray.stages import joins

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def collect_q(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy())
        q = _round_half_away(mat.astype(np.float64) * 10000.0, 0).astype(np.int64)
        return pd.DataFrame(
            {"vec_id": df["vec_id"].to_numpy(np.int64),
             "label": df["label"].to_numpy(np.int64),
             "q": list(q)}
        )

    ref = emb.map_batches(collect_q, batch_format="pandas").to_pandas()
    ref = ref.sort_values("vec_id").reset_index(drop=True)
    n_ref = len(ref)
    if n_ref <= k:
        return pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                             "label": pd.Series(dtype=np.int64),
                             "n_disagree": pd.Series(dtype=np.int64),
                             "frac": pd.Series(dtype=np.float64)})
    rq = np.stack(ref["q"].to_numpy())
    rid = ref["vec_id"].to_numpy(np.int64)
    rlab = ref["label"].to_numpy(np.int64)
    rn2 = (rq * rq).sum(axis=1)
    # composite key d2·n_ref + pos must fit int64; d2 ≤ 4·max‖q‖²
    if 4 * int(rn2.max()) >= (1 << 62) // max(n_ref, 1):
        raise RuntimeError("knn_label_disagreement: composite-key overflow")
    bref = ray.put((rq, rid, rlab, rn2))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rq_, rid_, rlab_, rn2_ = joins.broadcast_get(
            bref, lambda v: v, "knn_disagree_ref"
        )
        mat = np.stack(df["embedding"].to_numpy())
        q = _round_half_away(mat.astype(np.float64) * 10000.0, 0).astype(np.int64)
        vid = df["vec_id"].to_numpy(np.int64)
        lab = df["label"].to_numpy(np.int64)
        d2 = (q * q).sum(axis=1)[:, None] + rn2_[None, :] - 2 * (q @ rq_.T)
        # composite sort key: exact (d2, position-of-vec_id) in one int64
        nr = len(rid_)
        key = d2 * np.int64(nr) + np.arange(nr, dtype=np.int64)[None, :]
        key[vid[:, None] == rid_[None, :]] = np.iinfo(np.int64).max  # no self
        nn = np.argpartition(key, k - 1, axis=1)[:, :k]
        dis = (rlab_[nn] != lab[:, None]).sum(axis=1).astype(np.int64)
        out = pd.DataFrame(
            {"vec_id": vid, "label": lab, "n_disagree": dis,
             "frac": _round_half_away(dis / float(k), 6)}
        )
        # per-batch combiner: only the batch's top rows travel
        return out.sort_values(["frac", "vec_id"], ascending=[False, True],
                               kind="mergesort").head(top)

    parts = emb.map_batches(score, batch_format="pandas").to_pandas()
    res = parts.sort_values(["frac", "vec_id"], ascending=[False, True],
                            kind="mergesort").head(top).reset_index(drop=True)
    res["vec_id"] = res["vec_id"].astype(np.int64)
    res["label"] = res["label"].astype(np.int64)
    res["n_disagree"] = res["n_disagree"].astype(np.int64)
    return res


def q_containment_pairs(
    sf_dir: str, max_df: int = 50, shingle_n: int = 3
) -> pd.DataFrame:
    """Asymmetric shingle-containment join (Broder 1997's containment
    C(A,B) = |A∩B| / |A| — catches quotes and partial copies that
    symmetric Jaccard misses): word 3-gram distinct shingle sets per
    document, shingles with global document frequency > ``max_df``
    dropped first (the boilerplate guard every corpus-scale containment
    system applies — a df-F shingle fans out F² candidate pairs), then
    every ORDERED pair (a, b), a ≠ b, with 2·|A∩B| ≥ |A| (integer form
    of containment ≥ 0.5) reports (n_common, n_a, containment ROUND 6).

    Shape: per-doc distinct shingles explode per batch (each doc lives in
    one row, so batch-local distinct is global); shingle-hash buckets
    co-locate each posting list; groups ≤ max_df emit their ordered pairs
    via the repeat/tile kernel; pair-hash buckets sum n_common; |A| comes
    from the same filtered postings and attaches by broadcast-or-hash
    join. Nothing driver-side until the result contract."""
    from pagerank_ray.stages import joins

    n_buckets = 64
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def shingles(df: pd.DataFrame) -> pd.DataFrame:
        w, valid, rep = _exploded_tokens(df, id_col="doc_id")
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "sh": pd.Series(dtype=object)})
        if len(w) < shingle_n:
            return empty
        m = valid[: -(shingle_n - 1)].copy()
        for i in range(1, shingle_n):
            end = -(shingle_n - 1) + i
            m &= valid[i:end] if end else valid[i:]
            m &= rep[: -(shingle_n - 1)] == (rep[i:end] if end else rep[i:])
        if not m.any():
            return empty
        s0 = pd.Series(w[: -(shingle_n - 1)][m])
        parts = [s0]
        for i in range(1, shingle_n):
            end = -(shingle_n - 1) + i
            parts.append(pd.Series((w[i:end] if end else w[i:])[m]))
        sh = parts[0].str.cat(parts[1:], sep="\x1f")
        out = pd.DataFrame(
            {"doc_id": rep[: -(shingle_n - 1)][m], "sh": sh.to_numpy(dtype=object)}
        ).drop_duplicates()
        out["doc_id"] = out["doc_id"].astype(np.int64)
        return out

    def bucketize_sh(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["sh"].to_numpy(dtype=object))
        df = df.copy()
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        """Per shingle-bucket: df filter, per-doc |A| partials AND ordered
        candidate pairs (the triangles segment-pairs kernel — no per-group
        Python loop), distinguished by the is_na sentinel column."""
        from pagerank_ray.pipelines.triangles import _segment_pairs

        empty = pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
             "n": pd.Series(dtype=np.int64), "is_na": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        codes, _ = pd.factorize(df["sh"], sort=False)
        d = df["doc_id"].to_numpy(np.int64)
        order = np.argsort(codes, kind="stable")
        c, d = codes[order], d[order]
        starts = np.flatnonzero(np.concatenate([[True], c[1:] != c[:-1]]))
        lengths = np.diff(np.concatenate([starts, [len(c)]]))
        keep = lengths <= max_df
        out = []
        if keep.any():
            kept_docs = d[np.repeat(keep, lengths)]
            vc = pd.Series(kept_docs).value_counts()
            out.append(pd.DataFrame(
                {"a": vc.index.to_numpy(np.int64),
                 "b": np.zeros(len(vc), np.int64),
                 "n": vc.to_numpy(np.int64),
                 "is_na": np.ones(len(vc), np.int64)}))
        kp = keep & (lengths >= 2)
        if kp.any():
            dk = d[np.repeat(kp, lengths)]
            lk = lengths[kp]
            first, second = _segment_pairs(lk)
            x, y = dk[first], dk[second]  # distinct per doc ⇒ x != y
            pairs = (
                pd.DataFrame({"a": np.concatenate([x, y]),
                              "b": np.concatenate([y, x])})
                .groupby(["a", "b"], sort=False)
                .size()
                .reset_index(name="n")
            )
            pairs["n"] = pairs["n"].astype(np.int64)
            pairs["is_na"] = np.zeros(len(pairs), np.int64)
            out.append(pairs)
        if not out:
            return empty
        return pd.concat(out, ignore_index=True)

    _empty_folded = pd.DataFrame(
        {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
         "n": pd.Series(dtype=np.int64), "is_na": pd.Series(dtype=np.int64)})

    def bucketize_pair(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # Ray may hand a 0-column empty block
            out = _empty_folded.copy()
            out["bucket"] = pd.Series(dtype=np.int32)
            return out
        mixed = ((df["a"].to_numpy(np.int64) * np.int64(0x9E3779B1))
                 ^ (df["b"].to_numpy(np.int64) * np.int64(0x85EBCA77))) \
            & np.int64(0x7FFFFFFF)
        df = df.copy()
        df["bucket"] = (mixed % n_buckets).astype(np.int32)
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _empty_folded.copy()
        o = df.groupby(["a", "b", "is_na"], sort=False)["n"].sum().reset_index()
        o["n"] = o["n"].astype(np.int64)
        return o

    folded = (
        docs.map_batches(shingles, batch_format="pandas")
        .map_batches(bucketize_sh, batch_format="pandas")
        .groupby("bucket")
        .map_groups(postings, batch_format="pandas")
        .map_batches(bucketize_pair, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .materialize()
    )
    _empty_na = pd.DataFrame({"doc": pd.Series(dtype=np.int64),
                              "n_a": pd.Series(dtype=np.int64)})

    na_tbl = folded.map_batches(
        lambda df: pd.DataFrame(
            {"doc": df.loc[df["is_na"] == 1, "a"].to_numpy(np.int64),
             "n_a": df.loc[df["is_na"] == 1, "n"].to_numpy(np.int64)})
        if len(df) else _empty_na.copy(),
        batch_format="pandas",
    )
    pairs = folded.map_batches(
        lambda df: df[df["is_na"] == 0][["a", "b", "n"]]
        if len(df) else _empty_folded[["a", "b", "n"]].copy(),
        batch_format="pandas",
    )
    n_docs = na_tbl.count()
    joined = joins.attach_column(
        pairs, na_tbl, probe_col="a", build_key="doc", build_val="n_a",
        out_col="n_a", build_count=n_docs,
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
                 "n_common": pd.Series(dtype=np.int64),
                 "n_a": pd.Series(dtype=np.int64),
                 "containment": pd.Series(dtype=np.float64)})
        nc = df["n"].to_numpy(np.int64)
        na_ = df["n_a"].to_numpy(np.int64)
        keep = 2 * nc >= na_  # integer containment >= 0.5
        return pd.DataFrame(
            {"a": df["a"].to_numpy(np.int64)[keep],
             "b": df["b"].to_numpy(np.int64)[keep],
             "n_common": nc[keep], "n_a": na_[keep],
             "containment": _round_half_away(nc[keep] / na_[keep].astype(np.float64), 6)}
        )

    res = joined.map_batches(finish, batch_format="pandas").to_pandas()
    if not len(res):  # an all-empty dataset loses its column schema
        return pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
             "n_common": pd.Series(dtype=np.int64),
             "n_a": pd.Series(dtype=np.int64),
             "containment": pd.Series(dtype=np.float64)})
    return res.sort_values(["a", "b"]).reset_index(drop=True)


def q_event_cooccurrence(sf_dir: str, window_s: int = 3600) -> pd.DataFrame:
    """Windowed event-type co-occurrence: for every ordered-in-time pair
    of the same user's events within ``window_s`` seconds (order pinned
    by (ts, event_id)), count the unordered type pair (LEAST, GREATEST)
    — the "market-basket over time" report behind session-affinity
    analyses. Full T² matrix, sorted (t1, t2).

    Shape: user-hash buckets co-locate streams; per bucket one lexsort,
    per-user window ends via ONE batched searchsorted against the
    user-offset time axis (streams get disjoint time offsets so a single
    sorted array serves every user), pair fan-out via the repeat/cumsum
    kernel — no per-row loop, no self-join. Partials are T²-bounded and
    fold on the driver."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    win_us = np.int64(window_s) * np.int64(1_000_000)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        df = df.copy()
        df["bucket"] = (mixed % n_buckets).astype(np.int32)
        return df

    def co(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"t1": pd.Series(dtype=object), "t2": pd.Series(dtype=object),
             "n": pd.Series(dtype=np.int64)}
        )
        if len(df) < 2:
            return empty
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        # disjoint per-user time axes: offset each user's stream far apart
        # so one global searchsorted bounds every user's window at once
        ub = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        seg = np.zeros(len(u), np.int64)
        seg[ub] = 1
        seg = np.cumsum(seg) - 1
        span = np.int64(2) * (ts.max() - ts.min() + win_us + 1)
        shifted = ts - ts.min() + seg * span
        ends = np.searchsorted(shifted, shifted + win_us, side="right")
        cnt = ends - np.arange(len(u)) - 1
        if cnt.sum() == 0:
            return empty
        first = np.repeat(np.arange(len(u)), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        second = np.arange(len(first)) - np.repeat(offs, cnt) \
            + np.repeat(np.arange(len(u)), cnt) + 1
        ta, tb = et[first], et[second]
        lo = np.minimum(ta, tb)
        hi = np.maximum(ta, tb)
        out = (
            pd.DataFrame({"t1": lo, "t2": hi})
            .groupby(["t1", "t2"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = (
        ev.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(co, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby(["t1", "t2"], sort=True)["n"].sum().reset_index()
    agg["n"] = agg["n"].astype(np.int64)
    return agg.reset_index(drop=True)


def q_touch_attribution(sf_dir: str) -> pd.DataFrame:
    """Conversion attribution: every 'purchase' event is attributed to the
    user's FIRST and LAST preceding touch (touch types: click / view /
    signup; order pinned by (ts, event_id)), the classic first-touch /
    last-touch marketing report. Purchases with no prior touch land in
    '(none)'. Output: (first_touch, last_touch, n) grid, sorted.

    Shape: user-hash buckets co-locate streams; per bucket one lexsort,
    segment-aware cummin/cummax of touch positions (pandas C-level
    groupby kernels) shifted one row to exclude the current event — no
    per-user Python loop; partials are (T+1)²-bounded and fold on the
    driver."""
    n_buckets = 64
    touch_types = ("click", "view", "signup")
    ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        df = df.copy()
        df["bucket"] = (mixed % n_buckets).astype(np.int32)
        return df

    def attrib(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"first_touch": pd.Series(dtype=object),
             "last_touch": pd.Series(dtype=object),
             "n": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, et = u[order], et[order]
        n = len(u)
        pos = np.arange(n, dtype=np.int64)
        seg_start = np.concatenate([[True], u[1:] != u[:-1]])
        seg = np.cumsum(seg_start) - 1
        touch = np.isin(et, touch_types)
        big = np.int64(n + 1)
        fp = pd.Series(np.where(touch, pos, big)).groupby(seg).cummin().to_numpy()
        lp = pd.Series(np.where(touch, pos, -1)).groupby(seg).cummax().to_numpy()
        # shift one row within each segment: only STRICTLY-preceding touches
        fp_b = np.concatenate([[big], fp[:-1]])
        lp_b = np.concatenate([[np.int64(-1)], lp[:-1]])
        fp_b[seg_start] = big
        lp_b[seg_start] = -1
        conv = et == "purchase"
        if not conv.any():
            return empty
        fi, li = fp_b[conv], lp_b[conv]
        ft = np.full(int(conv.sum()), "(none)", dtype=object)
        lt = ft.copy()
        ft[fi < big] = et[fi[fi < big]]
        lt[li >= 0] = et[li[li >= 0]]
        out = (
            pd.DataFrame({"first_touch": ft, "last_touch": lt})
            .groupby(["first_touch", "last_touch"], sort=False)
            .size()
            .reset_index(name="n")
        )
        out["n"] = out["n"].astype(np.int64)
        return out

    parts = (
        ev.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(attrib, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby(["first_touch", "last_touch"], sort=True)["n"].sum().reset_index()
    agg["n"] = agg["n"].astype(np.int64)
    return agg.reset_index(drop=True)


def q_boolean_retrieval(
    sf_dir: str, terms: tuple = ("spark", "merge", "window")
) -> pd.DataFrame:
    """Conjunctive (AND) boolean retrieval: documents whose token set
    contains EVERY query term — the posting-list-intersection primitive
    under every search stack, run here as one fully-streaming pass (no
    shuffle at all: each doc's verdict is decided inside its own batch).
    Output: (doc_id, n_tokens) of matches, sorted by doc_id.

    Shape: per batch one exploded-token membership mask against the tiny
    sorted term array, distinct (row, term) pairs, per-row match count ==
    |terms| — all C-level; emitted rows ≤ matches."""
    tarr = np.sort(np.asarray(terms, dtype=object))
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def match(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "n_tokens": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        w, valid, rep = _exploded_tokens(df, id_col="doc_id")
        n_tok = pd.Series(rep[valid]).value_counts()
        if not valid.any():
            return empty
        ti = np.searchsorted(tarr, w[valid])
        ti = np.clip(ti, 0, len(tarr) - 1)
        hit = tarr[ti] == w[valid]
        if not hit.any():
            return empty
        pairs = pd.DataFrame(
            {"d": rep[valid][hit], "t": ti[hit]}).drop_duplicates()
        cnt = pairs.groupby("d").size()
        ids = cnt.index[cnt.to_numpy() == len(tarr)].to_numpy(np.int64)
        return pd.DataFrame(
            {"doc_id": ids,
             "n_tokens": n_tok.reindex(ids).to_numpy(np.int64)})

    res = docs.map_batches(match, batch_format="pandas").to_pandas()
    if not len(res):
        return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                             "n_tokens": pd.Series(dtype=np.int64)})
    return res.sort_values("doc_id").reset_index(drop=True)


def q_activity_anomaly(sf_dir: str) -> pd.DataFrame:
    """Per-user daily-activity anomaly days: a (user, day) whose event
    count exceeds that user's mean by > 3 population σ over their active
    days — the burst/bot-day audit. The 3σ filter is evaluated in EXACT
    integers ((n·k − S) > 0 and (n·k − S)² > 9·(k·S₂ − S²), the
    variance-scaled form), so engine and oracle agree bit-for-bit; only
    the reported z = (n·k − S)/√(k·S₂ − S²) rounds (6). Users need ≥ 3
    active days and non-zero variance. Sorted (user_id, day).

    Shape: (user, day) count partials per batch (the combiner), user-hash
    bucketed fold — per-user moments form in the same bucket (no second
    shuffle) and the filter emits only anomaly rows."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        day = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64) \
            // np.int64(86_400_000_000)
        g = (
            pd.DataFrame({"u": u, "day": day})
            .groupby(["u", "day"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        mixed = (g["u"].to_numpy(np.int64) * np.int64(0x9E3779B1)) \
            & np.int64(0x7FFFFFFF)
        g["bucket"] = (mixed % n_buckets).astype(np.int32)
        return g

    def anomalies(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"user_id": pd.Series(dtype=np.int64),
             "day": pd.Series(dtype=np.int64),
             "n": pd.Series(dtype=np.int64),
             "z": pd.Series(dtype=np.float64)})
        if not len(df):
            return empty
        per = df.groupby(["u", "day"], sort=False)["n"].sum().reset_index()
        n = per["n"].to_numpy(np.int64)
        mom = per.groupby("u")["n"].agg(
            k="size", s="sum", s2=lambda v: int((v.to_numpy(np.int64) ** 2).sum())
        )
        k = mom["k"].reindex(per["u"]).to_numpy(np.int64)
        s = mom["s"].reindex(per["u"]).to_numpy(np.int64)
        s2 = mom["s2"].reindex(per["u"]).to_numpy(np.int64)
        dev = n * k - s
        var_k2 = k * s2 - s * s  # k²·variance, exact
        keep = (k >= 3) & (var_k2 > 0) & (dev > 0) & (dev * dev > 9 * var_k2)
        if not keep.any():
            return empty
        z = dev[keep] / np.sqrt(var_k2[keep].astype(np.float64))
        return pd.DataFrame(
            {"user_id": per["u"].to_numpy(np.int64)[keep],
             "day": per["day"].to_numpy(np.int64)[keep],
             "n": n[keep], "z": _round_half_away(z, 6)})

    res = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(anomalies, batch_format="pandas")
        .to_pandas()
    )
    if not len(res):
        return pd.DataFrame(
            {"user_id": pd.Series(dtype=np.int64),
             "day": pd.Series(dtype=np.int64),
             "n": pd.Series(dtype=np.int64),
             "z": pd.Series(dtype=np.float64)})
    return res.sort_values(["user_id", "day"]).reset_index(drop=True)


def q_lexical_diversity(sf_dir: str) -> pd.DataFrame:
    """Per-source lexical-diversity profile: token count, EXACT distinct
    vocabulary, hapax-legomena count (tokens appearing exactly once in
    that source), type-token ratio and hapax fraction (both ROUND 6) —
    the corpus-health report behind vocabulary-collapse checks on
    generated/synthetic sources. Sorted by source.

    Shape: per-batch (source, token) count partials, token-hash bucketed
    fold completes exact per-(source, token) counts, each bucket
    collapses to 3 integers per source — the driver folds
    |sources|·buckets rows (source domain is corpus-metadata-bounded)."""
    n_buckets = 64
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source": pd.Series(dtype=object),
                              "tok": pd.Series(dtype=object),
                              "n": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        src = np.repeat(df["source"].to_numpy(dtype=object),
                        np.maximum(n_tok, 1))
        if not valid.any():
            return empty
        g = (
            pd.DataFrame({"source": src[valid],
                          "tok": flat.to_numpy(dtype=object)[valid]})
            .groupby(["source", "tok"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["tok"].to_numpy(dtype=object))
        df = df.copy()
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        per = df.groupby(["source", "tok"], sort=False)["n"].sum()
        agg = per.reset_index().groupby("source")["n"].agg(
            n_tokens="sum", n_distinct="size",
            n_hapax=lambda v: int((v.to_numpy(np.int64) == 1).sum()))
        out = agg.reset_index()
        for c in ("n_tokens", "n_distinct", "n_hapax"):
            out[c] = out[c].astype(np.int64)
        return out

    parts = (
        docs.map_batches(partial, batch_format="pandas")
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("source", sort=True).sum(numeric_only=True).reset_index()
    agg["ttr"] = _round_half_away(
        agg["n_distinct"].to_numpy(np.int64)
        / agg["n_tokens"].to_numpy(np.float64), 6)
    agg["hapax_frac"] = _round_half_away(
        agg["n_hapax"].to_numpy(np.int64)
        / agg["n_distinct"].to_numpy(np.float64), 6)
    for c in ("n_tokens", "n_distinct", "n_hapax"):
        agg[c] = agg[c].astype(np.int64)
    return agg.reset_index(drop=True)


def q_sla_percentiles(sf_dir: str) -> pd.DataFrame:
    """Fulfilment-SLA report: EXACT p50/p95/p99 of the ship lag
    (l_shipdate − o_orderdate, whole days) per order priority. The lag
    domain is contract-bounded (a shipment window of ~120 distinct day
    values), so exact order statistics come from integer histograms — no
    sort, no sketch: q(p) = smallest lag whose cumulative count reaches
    ceil(p·N), thresholds computed in pure integers ((p_num·N + p_num)
    // p_den form) so engine and oracle can never drift.

    Shape: the order date+priority attach is broadcast-or-hash
    (stages/joins.py — orders outgrow BROADCAST_LIMIT long before
    lineitem does); per-batch (priority, lag) count partials fold on the
    driver (priority × lag-domain bounded)."""
    from pagerank_ray.stages import joins

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def oprep(df: pd.DataFrame) -> pd.DataFrame:
        od = df["o_orderdate"].to_numpy().astype("datetime64[us]").view(np.int64) \
            // np.int64(86_400_000_000)
        return pd.DataFrame({"o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                             "oday": od,
                             "prio": df["o_orderpriority"].to_numpy()})

    omat = orders.map_batches(oprep, batch_format="pandas").materialize()
    n_orders = omat.count()
    with_day = joins.attach_column(
        li, omat, probe_col="l_orderkey", build_key="o_orderkey",
        build_val="oday", out_col="oday", build_count=n_orders)
    with_prio = joins.attach_column(
        with_day, omat, probe_col="l_orderkey", build_key="o_orderkey",
        build_val="prio", out_col="prio", build_count=n_orders)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sd = df["l_shipdate"].to_numpy().astype("datetime64[us]").view(np.int64) \
            // np.int64(86_400_000_000)
        lag = sd - df["oday"].to_numpy(np.int64)
        g = (
            pd.DataFrame({"prio": df["prio"].to_numpy(), "lag": lag})
            .groupby(["prio", "lag"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = with_prio.map_batches(partial, batch_format="pandas").to_pandas()
    hist = parts.groupby(["prio", "lag"], sort=True)["n"].sum().reset_index()
    rows = []
    for prio, g in hist.groupby("prio", sort=True):
        n = int(g["n"].sum())
        lags = g["lag"].to_numpy(np.int64)
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        def pick(num: int, den: int) -> int:
            thr = (num * n + den - 1) // den  # ceil(num·n / den), exact
            return int(lags[np.searchsorted(cum, thr)])
        rows.append((prio, n, pick(1, 2), pick(19, 20), pick(99, 100)))
    out = pd.DataFrame(rows, columns=["prio", "n", "p50", "p95", "p99"])
    for c in ("n", "p50", "p95", "p99"):
        out[c] = out[c].astype(np.int64)
    return out.reset_index(drop=True)


def _edge_support_cached(sf_dir: str) -> rd.Dataset:
    """Disk-cached per-edge triangle support (a, b, support) of the
    undirected simple lineitem graph in DENSE id space: the oriented-wedge
    pass (pipelines/ktruss.py:_edge_support) runs once per input
    fingerprint and is shared by q_local_bridges / q_edge_embeddedness —
    each otherwise pays its own full triangle enumeration (~12-16 s at
    sf0.1). Same atomic-publish protocol as _compact_ids_cached."""
    import shutil

    from pagerank_ray.pipelines.ktruss import _edge_support
    from pagerank_ray.pipelines.triangles import _canonical_undirected

    work = _graph_workdir(sf_dir, "support_li")
    done = os.path.join(work, "_DONE")
    if os.path.exists(done):
        return rd.read_parquet(os.path.join(work, "support"))
    dense_edges, _n, _ = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    und = dedup_pairs(
        dense_edges.map_batches(_canonical_undirected, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table({"src_id": t.column("a"), "dst_id": t.column("b")}),
            batch_format="pyarrow",
        )
    ).map_batches(
        lambda t: pa.table({"a": t.column("src_id"), "b": t.column("dst_id")}),
        batch_format="pyarrow",
    ).materialize()
    sup = _edge_support(und, und.count()).materialize()
    build = f"{work}.build.{os.getpid()}"
    shutil.rmtree(build, ignore_errors=True)
    os.makedirs(build)
    sup.write_parquet(os.path.join(build, "support"))
    with open(os.path.join(build, "_DONE"), "w") as f:
        f.write("ok")
    try:
        os.rename(build, work)
    except OSError:
        if os.path.exists(done):
            shutil.rmtree(build, ignore_errors=True)
        else:
            shutil.rmtree(work, ignore_errors=True)
            os.rename(build, work)
    return rd.read_parquet(os.path.join(work, "support"))


def q_local_bridges(sf_dir: str) -> pd.DataFrame:
    """Local bridges of the undirected simple lineitem graph: edges whose
    endpoints share NO common neighbor (triangle support 0) — removing
    one strictly lengthens its endpoints' distance (Easley-Kleinberg's
    local-bridge definition; the weak-tie edges of the network). Returns
    the sorted (a, b) edge list.

    Shape: reuses the k-truss support pipeline's single support pass
    (pipelines/ktruss.py:_edge_support — oriented wedge enumeration with
    O(√m)-bounded hub fan-out, grouped-sum shuffle, default-0 attach),
    disk-cached and SHARED with q_edge_embeddedness via
    _edge_support_cached."""
    _, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    sup = _edge_support_cached(sf_dir)
    bridges = sup.map_batches(
        lambda df: df.loc[df["support"] == 0, ["a", "b"]]
        if len(df) else pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                      "b": pd.Series(dtype=np.int64)}),
        batch_format="pandas",
    )
    df = _attach_orig(bridges, id_map, n, ["a", "b"])
    return df[["a", "b"]].sort_values(["a", "b"]).reset_index(drop=True)


def q_weekly_autocorr(sf_dir: str, lag_days: int = 7) -> pd.DataFrame:
    """Weekly periodicity detection: per event type, the lag-7 Pearson
    autocorrelation of the zero-filled daily count series over the type's
    [first, last] active-day span — the seasonality probe run before any
    trend model. Moments are exact integers; only the reported r rounds
    (6). Types need ≥ 2 lag pairs and non-degenerate variance on both
    ends. Sorted by event_type.

    Shape: per-batch (type, day) count partials fold on the driver (the
    calendar-bounded contract shared by day_churn_overlap); zero-fill and
    the moment fold are vectorized over the dense per-type day span."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64) \
            // np.int64(86_400_000_000)
        g = (
            pd.DataFrame({"event_type": df["event_type"].to_numpy(), "day": day})
            .groupby(["event_type", "day"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    daily = parts.groupby(["event_type", "day"], sort=True)["n"].sum().reset_index()
    rows = []
    for et, g in daily.groupby("event_type", sort=True):
        d = g["day"].to_numpy(np.int64)
        n = g["n"].to_numpy(np.int64)
        span = np.zeros(int(d.max() - d.min()) + 1, np.int64)
        span[d - d.min()] = n
        if len(span) <= lag_days:
            continue
        x = span[:-lag_days]
        y = span[lag_days:]
        k = len(x)
        sx, sy = int(x.sum()), int(y.sum())
        sxy = int((x * y).sum())
        sxx, syy = int((x * x).sum()), int((y * y).sum())
        vx = k * sxx - sx * sx
        vy = k * syy - sy * sy
        if k < 2 or vx <= 0 or vy <= 0:
            continue
        r = (k * sxy - sx * sy) / (np.sqrt(float(vx)) * np.sqrt(float(vy)))
        rows.append((et, k, float(_round_half_away(np.array([r]), 6)[0])))
    out = pd.DataFrame(rows, columns=["event_type", "n_pairs", "r7"])
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out.reset_index(drop=True)


def q_ref_integrity_audit(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit across the star schema: for every
    foreign-key relation, the child row count and the number of ORPHAN
    rows (child key absent from the parent) — the pre-load contract check
    every warehouse runs. Relations: lineitem→orders, lineitem→part,
    lineitem→supplier, orders→customer, customer→nation. Sorted by
    relation name.

    Shape: each parent's distinct key set reduces distributed
    (graph_build.distinct_values) and broadcasts once (`ray.put` + sorted
    searchsorted membership per batch — the bloom_semi_join shape with an
    exact set, parents here fit the broadcast; a parent beyond
    BROADCAST_LIMIT would swap in the same Ray-native hash anti-join the
    joins module already routes to); every child table scans ONCE with
    all of its FK columns audited in the same pass (lineitem's three
    relations share one scan); per-batch (n, n_orphan) integer partials
    fold on the driver — 2 integers per relation per batch."""
    import ray

    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import distinct_values

    # child table → [(relation name, child FK col, parent table, parent key)]
    by_child = {
        "lineitem": [
            ("lineitem->orders", "l_orderkey", "orders", "o_orderkey"),
            ("lineitem->part", "l_partkey", "part", "p_partkey"),
            ("lineitem->supplier", "l_suppkey", "supplier", "s_suppkey"),
        ],
        "orders": [("orders->customer", "o_custkey", "customer", "c_custkey")],
        "customer": [("customer->nation", "c_nationkey", "nation", "n_nationkey")],
    }
    refs = {}
    for rels in by_child.values():
        for _, _, parent, pk in rels:
            if parent in refs:
                continue
            pkeys = distinct_values(
                _read(sf_dir, parent, [pk]).map_batches(
                    lambda t, _pk=pk: pa.table(
                        {"k": pc.cast(t.column(_pk), pa.int64())}),
                    batch_format="pyarrow",
                ),
                "k",
            )
            refs[parent] = ray.put(joins._collect_arrow(pkeys))

    rows = []
    for child, rels in by_child.items():
        cols = [ck for _, ck, _, _ in rels]
        ref_list = [(ck, refs[parent], parent) for _, ck, parent, _ in rels]

        def audit(t: pa.Table, _rl=tuple(ref_list)) -> pa.Table:
            out_n, out_o = [], []
            for ck, ref, parent in _rl:
                keys = joins.broadcast_get(
                    ref, lambda tab: np.sort(tab.column("k").to_numpy()),
                    f"ref_integrity:{parent}")
                v = t.column(ck).to_numpy(zero_copy_only=False).astype(np.int64)
                pos = np.searchsorted(keys, v)
                pos = np.clip(pos, 0, max(len(keys) - 1, 0))
                hit = keys[pos] == v if len(keys) else np.zeros(len(v), bool)
                out_n.append(len(v))
                out_o.append(int((~hit).sum()))
            return pa.table({
                "col": pa.array([c for c, _, _ in _rl]),
                "n": pa.array(out_n, pa.int64()),
                "n_orphan": pa.array(out_o, pa.int64()),
            })

        part = _read(sf_dir, child, cols).map_batches(
            audit, batch_format="pyarrow").to_pandas()
        agg = part.groupby("col")[["n", "n_orphan"]].sum()
        for name, ck, _, _ in rels:
            rows.append((name, int(agg.loc[ck, "n"]),
                         int(agg.loc[ck, "n_orphan"])))
    out = pd.DataFrame(rows, columns=["relation", "n_rows", "n_orphans"])
    out["n_rows"] = out["n_rows"].astype(np.int64)
    out["n_orphans"] = out["n_orphans"].astype(np.int64)
    return out.sort_values("relation").reset_index(drop=True)


def q_silhouette_by_label(sf_dir: str) -> pd.DataFrame:
    """Clustering-quality audit: mean silhouette per label over the
    embedding table, computed on EXACT quantized squared-Euclidean
    distances (ROUND(v·10⁴) ints — the knn_label_disagreement metric):
    a(i) = mean d² to own label (excl. self), b(i) = min over other
    labels of mean d², s(i) = (b−a)/max(a,b); labels need ≥ 2 members.
    Per label: n members and mean silhouette (ROUND 6) — the
    label-coherence check run before trusting a labeled corpus. The only
    floats are the final mean ratios; every pairwise term is int64.

    Shape: the quantized reference matrix broadcasts once and each batch
    computes its distance block by one int64 matmul (brute force is the
    audit baseline at reference-set scale — the centroid_similarity
    contract); per-batch partial (label, Σs, n) rows fold on the
    driver."""
    import ray

    from pagerank_ray.stages import joins

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def collect_q(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy())
        q = _round_half_away(mat.astype(np.float64) * 10000.0, 0).astype(np.int64)
        return pd.DataFrame(
            {"vec_id": df["vec_id"].to_numpy(np.int64),
             "label": df["label"].to_numpy(np.int64),
             "q": list(q)})

    ref = emb.map_batches(collect_q, batch_format="pandas").to_pandas()
    ref = ref.sort_values("vec_id").reset_index(drop=True)
    rq = np.stack(ref["q"].to_numpy())
    rlab = ref["label"].to_numpy(np.int64)
    rn2 = (rq * rq).sum(axis=1)
    labs = np.unique(rlab)
    if len(labs) < 2:
        raise ValueError(
            "silhouette_by_label needs >= 2 distinct labels "
            f"(got {len(labs)}) — b(i) is undefined otherwise")
    counts = np.array([(rlab == l).sum() for l in labs], np.int64)
    onehot = (rlab[None, :] == labs[:, None]).astype(np.int64)  # L×N
    bref = ray.put((rq, rlab, rn2, labs, counts, onehot))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rq_, rlab_, rn2_, labs_, counts_, oh = joins.broadcast_get(
            bref, lambda v: v, "silhouette_ref")
        mat = np.stack(df["embedding"].to_numpy())
        q = _round_half_away(mat.astype(np.float64) * 10000.0, 0).astype(np.int64)
        lab = df["label"].to_numpy(np.int64)
        d2 = (q * q).sum(axis=1)[:, None] + rn2_[None, :] - 2 * (q @ rq_.T)
        sums = d2 @ oh.T  # B×L exact int64 per-label distance sums
        li = np.searchsorted(labs_, lab)
        own_n = counts_[li] - 1
        keep = own_n >= 1
        a = sums[np.arange(len(lab)), li] / np.maximum(own_n, 1)
        other = sums / counts_[None, :].astype(np.float64)
        other[np.arange(len(lab)), li] = np.inf
        b = other.min(axis=1)
        s = (b - a) / np.maximum(a, b)
        s = np.where(np.maximum(a, b) > 0, s, 0.0)
        out = pd.DataFrame({"label": lab[keep], "s": s[keep]})
        g = out.groupby("label", sort=False)["s"].agg(["sum", "size"]).reset_index()
        return pd.DataFrame({"label": g["label"].to_numpy(np.int64),
                             "s_sum": g["sum"].to_numpy(np.float64),
                             "n": g["size"].to_numpy(np.int64)})

    parts = emb.map_batches(score, batch_format="pandas").to_pandas()
    agg = parts.groupby("label", sort=True).agg(
        s_sum=("s_sum", "sum"), n=("n", "sum")).reset_index()
    agg = agg[agg["n"] >= 2].copy()
    agg["mean_silhouette"] = _round_half_away(
        agg["s_sum"].to_numpy(np.float64) / agg["n"].to_numpy(np.float64), 6)
    agg["label"] = agg["label"].astype(np.int64)
    agg["n"] = agg["n"].astype(np.int64)
    return agg[["label", "n", "mean_silhouette"]].reset_index(drop=True)


def q_revenue_concentration(sf_dir: str) -> pd.DataFrame:
    """Pareto concentration of order revenue: the smallest customer set
    (ordered by revenue desc, custkey asc) whose cumulative revenue
    reaches 80% of the total — the classic 80/20 readout. Revenue is
    cents-exact; the threshold is ceil-integer ((4·total_cents + 4) // 5)
    so both engines pick the identical prefix. Output: total customers,
    customers in the 80% set, their share of customers (ROUND 6), and
    the exact cumulative cents at the crossing.

    Shape: per-customer cents fold in a custkey-bucketed shuffle, then a
    DISTRIBUTED sort by (revenue desc, custkey) — the driver streams the
    sorted blocks and stops at the crossing, so only the Pareto PREFIX
    ever reaches it (the remaining blocks are never pulled)."""
    n_buckets = 64
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(
            df["o_totalprice"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = (
            pd.DataFrame({"c": df["o_custkey"].to_numpy(np.int64),
                          "cents": cents})
            .groupby("c", sort=False)["cents"].sum().reset_index()
        )
        g["cents"] = g["cents"].astype(np.int64)
        mixed = (g["c"].to_numpy(np.int64) * np.int64(0x9E3779B1)) \
            & np.int64(0x7FFFFFFF)
        g["bucket"] = (mixed % n_buckets).astype(np.int32)
        return g

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        o = df.groupby("c", sort=False)["cents"].sum().reset_index()
        o["cents"] = o["cents"].astype(np.int64)
        return o

    per_cust = (
        orders.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .materialize()
    )
    n_cust = per_cust.count()
    total = int(
        per_cust.map_batches(
            lambda df: pd.DataFrame({"t": [int(df["cents"].sum())]}),
            batch_format="pandas",
        ).to_pandas()["t"].sum()
    )
    thr = (4 * total + 4) // 5  # ceil(0.8 · total) in pure integers
    ranked = per_cust.map_batches(
        lambda df: pd.DataFrame({"neg": -df["cents"].to_numpy(np.int64),
                                 "c": df["c"].to_numpy(np.int64),
                                 "cents": df["cents"].to_numpy(np.int64)}),
        batch_format="pandas",
    ).sort(["neg", "c"])
    cum = 0
    k = 0
    crossing = 0
    for b in ranked.iter_batches(batch_format="numpy", batch_size=4096):
        cents = b["cents"]
        csum = cum + np.cumsum(cents)
        hit = np.flatnonzero(csum >= thr)
        if len(hit):
            k += int(hit[0]) + 1
            crossing = int(csum[hit[0]])
            break
        cum = int(csum[-1]) if len(csum) else cum
        k += len(cents)
    out = pd.DataFrame(
        {"n_customers": [n_cust], "n_top": [k],
         "top_share": _round_half_away(np.array([k / n_cust]), 6),
         "cum_cents": [crossing]})
    out["n_customers"] = out["n_customers"].astype(np.int64)
    out["n_top"] = out["n_top"].astype(np.int64)
    out["cum_cents"] = out["cum_cents"].astype(np.int64)
    return out


def q_conversion_lag(sf_dir: str) -> pd.DataFrame:
    """Signup→purchase conversion-lag percentiles: for every user whose
    first 'purchase' follows their first 'signup', the lag in WHOLE HOURS
    (floor), reported as exact p50/p90/p99 from the hour-domain histogram
    (the sla_percentiles integer-threshold rule: q(p) = smallest lag with
    cum ≥ ceil(p·N)) plus the converting-user count — the activation-time
    readout of product analytics.

    Shape: per-batch filter to the two event types, user-hash buckets
    co-locate streams, per-user firsts via one lexsort + change-point
    mask; (lag, 1) partials fold on the driver (hour domain is
    calendar-bounded)."""
    n_buckets = 64
    ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(("signup", "purchase"))]
        if not len(df):
            return pd.DataFrame(
                {"user_id": pd.Series(dtype=np.int64),
                 "ts": pd.Series(dtype="datetime64[us]"),
                 "event_type": pd.Series(dtype=object),
                 "bucket": pd.Series(dtype=np.int32)})
        u = df["user_id"].to_numpy(np.int64)
        mixed = (u * np.int64(0x9E3779B1)) & np.int64(0x7FFFFFFF)
        df = df.copy()
        df["bucket"] = (mixed % n_buckets).astype(np.int32)
        return df

    def lags(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"lag_h": pd.Series(dtype=np.int64),
                              "n": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        et = df["event_type"].to_numpy()
        order = np.lexsort((ts, u))
        u, ts, et = u[order], ts[order], et[order]
        first = np.concatenate([[True], u[1:] != u[:-1]])
        seg = np.cumsum(first) - 1
        n_seg = seg[-1] + 1
        big = np.int64(1 << 62)
        s_first = np.full(n_seg, big)
        p_first = np.full(n_seg, big)
        is_s = et == "signup"
        is_p = et == "purchase"
        # first occurrence per segment: reversed minimum via np.minimum.at
        np.minimum.at(s_first, seg[is_s], ts[is_s])
        np.minimum.at(p_first, seg[is_p], ts[is_p])
        ok = (s_first < big) & (p_first < big) & (p_first >= s_first)
        if not ok.any():
            return empty
        lag_h = (p_first[ok] - s_first[ok]) // np.int64(3_600_000_000)
        vc = pd.Series(lag_h).value_counts()
        return pd.DataFrame({"lag_h": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    parts = (
        ev.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(lags, batch_format="pandas")
        .to_pandas()
    )
    if not len(parts):
        return pd.DataFrame({"n_converted": pd.Series(dtype=np.int64),
                             "p50_h": pd.Series(dtype=np.int64),
                             "p90_h": pd.Series(dtype=np.int64),
                             "p99_h": pd.Series(dtype=np.int64)})
    hist = parts.groupby("lag_h", sort=True)["n"].sum().reset_index()
    lags_v = hist["lag_h"].to_numpy(np.int64)
    cum = np.cumsum(hist["n"].to_numpy(np.int64))
    n = int(cum[-1])

    def pick(num: int, den: int) -> int:
        thr = (num * n + den - 1) // den
        return int(lags_v[np.searchsorted(cum, thr)])

    out = pd.DataFrame({"n_converted": [n], "p50_h": [pick(1, 2)],
                        "p90_h": [pick(9, 10)], "p99_h": [pick(99, 100)]})
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def q_degree_centralization(sf_dir: str) -> pd.DataFrame:
    """Freeman degree centralization of the undirected simple lineitem
    graph: C = Σ_v (d_max − d_v) / ((n−1)(n−2)) — the network-science
    scalar for how hub-dominated a graph is (1 = star, 0 = regular).
    Numerator is an exact integer (n·d_max − 2m'); only the final ratio
    rounds (6). Output: n, m, d_max, centralization.

    Shape: canonical undirected edges → one grouped_count shuffle for
    degrees → three scalar aggregates; nothing vertex-sized leaves the
    cluster."""
    from pagerank_ray.pipelines.triangles import _canonical_undirected
    from pagerank_ray.stages.graph_build import grouped_count

    dense_edges, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    und = dedup_pairs(
        dense_edges.map_batches(_canonical_undirected, batch_format="pyarrow")
        .map_batches(
            lambda t: pa.table({"src_id": t.column("a"), "dst_id": t.column("b")}),
            batch_format="pyarrow",
        )
    ).materialize()
    m = und.count()
    mentions = und.map_batches(
        lambda t: pa.table({"v": pa.concat_arrays(
            [pc.cast(t.column("src_id"), pa.int64()).combine_chunks(),
             pc.cast(t.column("dst_id"), pa.int64()).combine_chunks()])}),
        batch_format="pyarrow",
    )
    deg = grouped_count(mentions, "v", "deg")
    stats = deg.map_batches(
        lambda df: pd.DataFrame({"dmax": [int(df["deg"].max())],
                                 "dsum": [int(df["deg"].sum())]})
        if len(df) else pd.DataFrame({"dmax": pd.Series(dtype=np.int64),
                                      "dsum": pd.Series(dtype=np.int64)}),
        batch_format="pandas",
    ).to_pandas()
    dmax = int(stats["dmax"].max())
    dsum = int(stats["dsum"].sum())  # = 2m over degree-≥1 vertices
    if n < 3:
        raise ValueError("degree centralization needs n >= 3")
    # n counts EVERY edge endpoint (incl. self-loop-only vertices, which
    # have degree 0 in the simple graph); n·dmax − Σdeg charges them the
    # full (dmax − 0) term, which is exactly Freeman's definition
    num = n * dmax - dsum
    cent = num / float((n - 1) * (n - 2))
    out = pd.DataFrame({"n": [n], "m": [m], "d_max": [dmax],
                        "centralization": _round_half_away(np.array([cent]), 6)})
    for c in ("n", "m", "d_max"):
        out[c] = out[c].astype(np.int64)
    return out


def q_gini_revenue(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of per-customer order revenue (cents-exact):
    G = (2·Σ i·x_i) / (n·Σ x) − (n+1)/n over x sorted ascending (ties by
    custkey) — the inequality twin of revenue_concentration. Σ i·x_i is
    an exact integer accumulated OVER THE SORTED STREAM with a running
    rank offset, so the driver holds two counters, never the customer
    table. Output: n_customers, total_cents, gini (ROUND 6).

    Shape: custkey-bucketed revenue fold, distributed sort by (cents,
    custkey), then one streaming pass of block-local i·x partials."""
    n_buckets = 64
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(
            df["o_totalprice"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        g = (
            pd.DataFrame({"c": df["o_custkey"].to_numpy(np.int64),
                          "cents": cents})
            .groupby("c", sort=False)["cents"].sum().reset_index()
        )
        g["cents"] = g["cents"].astype(np.int64)
        mixed = (g["c"].to_numpy(np.int64) * np.int64(0x9E3779B1)) \
            & np.int64(0x7FFFFFFF)
        g["bucket"] = (mixed % n_buckets).astype(np.int32)
        return g

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        o = df.groupby("c", sort=False)["cents"].sum().reset_index()
        o["cents"] = o["cents"].astype(np.int64)
        return o

    per_cust = (
        orders.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .materialize()
    )
    ranked = per_cust.sort(["cents", "c"])
    i_off = 0
    ixsum = 0
    total = 0
    n = 0
    for b in ranked.iter_batches(batch_format="numpy", batch_size=8192):
        x = b["cents"]
        if not len(x):
            continue
        idx = np.arange(1, len(x) + 1, dtype=np.int64) + i_off
        ixsum += int((idx * x).sum())
        total += int(x.sum())
        i_off += len(x)
        n += len(x)
    if n == 0 or total == 0:
        raise ValueError("gini_revenue: empty or zero-revenue input")
    gini = (2.0 * ixsum) / (float(n) * float(total)) - (n + 1) / float(n)
    out = pd.DataFrame({"n_customers": [n], "total_cents": [total],
                        "gini": _round_half_away(np.array([gini]), 6)})
    out["n_customers"] = out["n_customers"].astype(np.int64)
    out["total_cents"] = out["total_cents"].astype(np.int64)
    return out


def q_intrinsic_dimension(sf_dir: str) -> pd.DataFrame:
    """Two-NN intrinsic-dimension estimate of the embedding manifold
    (Facco et al. 2017): per point the ratio μ = r₂/r₁ of its two nearest
    neighbor distances (exact quantized-int d², ties by vec_id — the
    knn_label_disagreement metric), MLE d̂ = N_valid / Σ ln μ over points
    with 0 < r₁ < r₂. Output: n_points, n_valid, d_hat (ROUND 6) — the
    embedding-collapse sanity check run before trusting a learned space.

    Shape: broadcast reference matrix + one int64 matmul per batch;
    per-batch partials are (Σ ln μ, counts) scalars."""
    import ray

    from pagerank_ray.stages import joins

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def collect_q(df: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(df["embedding"].to_numpy())
        q = _round_half_away(mat.astype(np.float64) * 10000.0, 0).astype(np.int64)
        return pd.DataFrame({"vec_id": df["vec_id"].to_numpy(np.int64),
                             "q": list(q)})

    ref = emb.map_batches(collect_q, batch_format="pandas").to_pandas()
    ref = ref.sort_values("vec_id").reset_index(drop=True)
    n_ref = len(ref)
    if n_ref < 3:
        raise ValueError("intrinsic_dimension needs >= 3 points")
    rq = np.stack(ref["q"].to_numpy())
    rid = ref["vec_id"].to_numpy(np.int64)
    rn2 = (rq * rq).sum(axis=1)
    if 4 * int(rn2.max()) >= (1 << 62) // max(n_ref, 1):
        raise RuntimeError("intrinsic_dimension: composite-key overflow")
    bref = ray.put((rq, rid, rn2))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rq_, rid_, rn2_ = joins.broadcast_get(bref, lambda v: v, "twonn_ref")
        mat = np.stack(df["embedding"].to_numpy())
        q = _round_half_away(mat.astype(np.float64) * 10000.0, 0).astype(np.int64)
        vid = df["vec_id"].to_numpy(np.int64)
        d2 = (q * q).sum(axis=1)[:, None] + rn2_[None, :] - 2 * (q @ rq_.T)
        nr = len(rid_)
        key = d2 * np.int64(nr) + np.arange(nr, dtype=np.int64)[None, :]
        key[vid[:, None] == rid_[None, :]] = np.iinfo(np.int64).max
        nn2 = np.argpartition(key, 1, axis=1)[:, :2]
        kv = np.take_along_axis(key, nn2, axis=1)
        o = np.argsort(kv, axis=1)
        nn2 = np.take_along_axis(nn2, o, axis=1)
        d1 = np.take_along_axis(d2, nn2[:, :1], axis=1)[:, 0]
        d2nd = np.take_along_axis(d2, nn2[:, 1:2], axis=1)[:, 0]
        valid = (d1 > 0) & (d2nd > d1)
        # μ = r2/r1 = sqrt(d2nd/d1); ln μ = 0.5·(ln d2nd − ln d1) — exact
        # int inputs, deterministic float transform
        lnmu = 0.5 * (np.log(d2nd[valid].astype(np.float64))
                      - np.log(d1[valid].astype(np.float64)))
        return pd.DataFrame({"n": [len(vid)], "n_valid": [int(valid.sum())],
                             "s": [float(lnmu.sum())]})

    parts = emb.map_batches(score, batch_format="pandas").to_pandas()
    n_pts = int(parts["n"].sum())
    n_valid = int(parts["n_valid"].sum())
    s = float(parts["s"].sum())
    if n_valid == 0 or s <= 0:
        raise ValueError("intrinsic_dimension: no valid two-NN ratios")
    out = pd.DataFrame({"n_points": [n_pts], "n_valid": [n_valid],
                        "d_hat": _round_half_away(np.array([n_valid / s]), 6)})
    out["n_points"] = out["n_points"].astype(np.int64)
    out["n_valid"] = out["n_valid"].astype(np.int64)
    return out


def q_hhi_concentration(sf_dir: str) -> pd.DataFrame:
    """Herfindahl-Hirschman revenue-concentration index per market
    dimension: revenue share per nation (via customer) and per market
    segment, HHI = Σ share² (0 = atomized, 1 = monopoly) — the
    concentration readout regulators and marketplaces both run. Revenue
    is cents-exact; shares and HHI round (6). Output: one row per
    dimension (dimension, n_groups, hhi).

    Shape: one broadcast attach of (custkey → nation, segment) onto
    orders, per-batch (dim, group, cents) partials, driver fold over the
    group-domain-bounded grid."""
    from pagerank_ray.stages import joins

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_mktsegment"])
    n_cust = cust.count()
    with_n = joins.attach_column(
        orders, cust, probe_col="o_custkey", build_key="c_custkey",
        build_val="c_nationkey", out_col="nat", build_count=n_cust)
    with_s = joins.attach_column(
        with_n, cust, probe_col="o_custkey", build_key="c_custkey",
        build_val="c_mktsegment", out_col="seg", build_count=n_cust)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(
            df["o_totalprice"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        a = (
            pd.DataFrame({"g": df["nat"].astype(np.int64).astype(str),
                          "cents": cents})
            .groupby("g", sort=False)["cents"].sum().reset_index()
        )
        a["dim"] = "nation"
        b = (
            pd.DataFrame({"g": df["seg"].to_numpy(dtype=object), "cents": cents})
            .groupby("g", sort=False)["cents"].sum().reset_index()
        )
        b["dim"] = "segment"
        out = pd.concat([a, b], ignore_index=True)
        out["cents"] = out["cents"].astype(np.int64)
        return out

    parts = with_s.map_batches(partial, batch_format="pandas").to_pandas()
    grid = parts.groupby(["dim", "g"], sort=True)["cents"].sum().reset_index()
    rows = []
    for dim, g in grid.groupby("dim", sort=True):
        c = g["cents"].to_numpy(np.int64)
        tot = int(c.sum())
        hhi = float(((c / tot) ** 2).sum())
        rows.append((dim, len(c), float(_round_half_away(np.array([hhi]), 6)[0])))
    out = pd.DataFrame(rows, columns=["dimension", "n_groups", "hhi"])
    out["n_groups"] = out["n_groups"].astype(np.int64)
    return out.reset_index(drop=True)


def q_order_velocity(sf_dir: str, window_days: int = 7) -> pd.DataFrame:
    """Order-velocity audit: pairs of DISTINCT orders by the same
    customer within ``window_days`` of each other — the rapid-repeat /
    card-testing screen (the amount delta rides along for the
    double-charge triage). Pair order pinned by (orderdate, orderkey);
    output (custkey, o1, o2, lag_days, cents_diff) sorted. Exact
    integers throughout.

    Shape: custkey-bucketed shuffle co-locates each customer's orders;
    per group one vectorized day-window pair fan-out (the
    event_cooccurrence repeat/cumsum kernel)."""
    n_buckets = 64
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    win = np.int64(window_days)

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        cents = _round_half_away(
            df["o_totalprice"].to_numpy(np.float64) * 100.0, 0).astype(np.int64)
        day = df["o_orderdate"].to_numpy().astype("datetime64[us]").view(np.int64) \
            // np.int64(86_400_000_000)
        g = pd.DataFrame({"c": df["o_custkey"].to_numpy(np.int64),
                          "k": df["o_orderkey"].to_numpy(np.int64),
                          "day": day, "cents": cents})
        mixed = (g["c"].to_numpy(np.int64) * np.int64(0x9E3779B1)) \
            & np.int64(0x7FFFFFFF)
        g["bucket"] = (mixed % n_buckets).astype(np.int32)
        return g

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"custkey": pd.Series(dtype=np.int64),
             "o1": pd.Series(dtype=np.int64), "o2": pd.Series(dtype=np.int64),
             "lag_days": pd.Series(dtype=np.int64),
             "cents_diff": pd.Series(dtype=np.int64)})
        if len(df) < 2:
            return empty
        c = df["c"].to_numpy(np.int64)
        k = df["k"].to_numpy(np.int64)
        day = df["day"].to_numpy(np.int64)
        cents = df["cents"].to_numpy(np.int64)
        order = np.lexsort((k, day, c))
        c, k, day, cents = c[order], k[order], day[order], cents[order]
        grp = np.concatenate([[True], c[1:] != c[:-1]])
        seg = np.cumsum(grp) - 1
        span = np.int64(2) * (day.max() - day.min() + win + 1)
        shifted = day - day.min() + seg * span
        ends = np.searchsorted(shifted, shifted + win, side="right")
        cnt = ends - np.arange(len(c)) - 1
        if cnt.sum() == 0:
            return empty
        first = np.repeat(np.arange(len(c)), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        second = np.arange(len(first)) - np.repeat(offs, cnt) + first + 1
        return pd.DataFrame(
            {"custkey": c[first], "o1": k[first], "o2": k[second],
             "lag_days": day[second] - day[first],
             "cents_diff": np.abs(cents[second] - cents[first])})

    res = (
        orders.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if not len(res):
        return pd.DataFrame(
            {"custkey": pd.Series(dtype=np.int64),
             "o1": pd.Series(dtype=np.int64), "o2": pd.Series(dtype=np.int64),
             "lag_days": pd.Series(dtype=np.int64),
             "cents_diff": pd.Series(dtype=np.int64)})
    for col in res.columns:
        res[col] = res[col].astype(np.int64)
    return res.sort_values(["custkey", "o1", "o2"]).reset_index(drop=True)


def q_cross_source_entropy(sf_dir: str) -> pd.DataFrame:
    """Cross-source language-model divergence matrix: per ordered source
    pair (A, B), the cross-entropy of A's token stream under B's add-one
    unigram LM, H(A, B) = −Σ_w p_A(w)·ln q_B(w) with q_B(w) =
    (c_B(w)+1)/(n_B+V) over the GLOBAL vocabulary V — the
    corpus-drift / source-similarity readout behind mixture rebalancing.
    Exact integer counts; only the final entropy floats (ROUND 6).
    Sorted (src_a, src_b), diagonal included (self-entropy).

    Shape: one (source, token)-count shuffle (the lexical_diversity
    fold); the S×V count grid is source-vocabulary bounded and folds on
    the driver, where the S×S matrix is one vectorized log-matmul."""
    n_buckets = 64
    docs = _read(sf_dir, "documents", ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"source": pd.Series(dtype=object),
                              "tok": pd.Series(dtype=object),
                              "n": pd.Series(dtype=np.int64)})
        if not len(df):
            return empty
        toks = df["text"].fillna("").str.split()
        n_tok = toks.str.len().fillna(0).to_numpy(np.int64)
        flat = toks.explode(ignore_index=True)
        valid = flat.notna().to_numpy()
        src = np.repeat(df["source"].to_numpy(dtype=object),
                        np.maximum(n_tok, 1))
        if not valid.any():
            return empty
        g = (
            pd.DataFrame({"source": src[valid],
                          "tok": flat.to_numpy(dtype=object)[valid]})
            .groupby(["source", "tok"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["tok"].to_numpy(dtype=object))
        df = df.copy()
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        o = df.groupby(["source", "tok"], sort=False)["n"].sum().reset_index()
        o["n"] = o["n"].astype(np.int64)
        return o

    counts = (
        docs.map_batches(partial, batch_format="pandas")
        .map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    piv = counts.pivot_table(index="tok", columns="source", values="n",
                             fill_value=0, aggfunc="sum")
    piv = piv.sort_index()
    srcs = sorted(piv.columns)
    mat = piv[srcs].to_numpy(np.int64)  # V×S
    v = mat.shape[0]
    n_s = mat.sum(axis=0)
    q = (mat + 1) / (n_s + v).astype(np.float64)  # V×S add-one LMs
    p = mat / n_s.astype(np.float64)
    h = -(p.T @ np.log(q))  # S×S: H(row A under col B)
    rows = []
    for i, a in enumerate(srcs):
        for j, b in enumerate(srcs):
            rows.append((a, b, float(_round_half_away(np.array([h[i, j]]), 6)[0])))
    out = pd.DataFrame(rows, columns=["src_a", "src_b", "xent"])
    return out.reset_index(drop=True)


def q_edge_embeddedness(sf_dir: str, k: int = 25) -> pd.DataFrame:
    """Edge embeddedness — neighborhood Jaccard per edge: for every edge
    (a, b) of the undirected simple lineitem graph, |N(a)∩N(b)| /
    |N(a)∪N(b)\\{a,b}| (Easley-Kleinberg's strong-tie measure; the
    per-edge refinement of local_bridges, whose bridges are exactly the
    zero rows). Top-k by (jaccard desc, a, b) with the count columns —
    denominators are exact integers (da + db − 2 − common), only the
    ratio rounds (6).

    Shape: one k-truss support pass (common-neighbor counts, disk-cached
    and SHARED with q_local_bridges via _edge_support_cached) + the
    degree table derived from the same edge rows, one vectorized finish —
    no new shuffle beyond the support pipeline's own."""
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import grouped_count

    _, n, id_map = _compact_ids_cached(
        sf_dir, "li", lambda: lineitem_edges(sf_dir)
    )
    sup = _edge_support_cached(sf_dir)
    mentions = sup.map_batches(
        lambda t: pa.table({"v": pa.concat_arrays(
            [t.column("a").combine_chunks().cast(pa.int64()),
             t.column("b").combine_chunks().cast(pa.int64())])}),
        batch_format="pyarrow",
    )
    deg = grouped_count(mentions, "v", "deg").materialize()
    n_deg = deg.count()
    with_da = joins.attach_column(
        sup, deg, probe_col="a", build_key="v", build_val="deg",
        out_col="da", build_count=n_deg)
    with_db = joins.attach_column(
        with_da, deg, probe_col="b", build_key="v", build_val="deg",
        out_col="db", build_count=n_deg)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
                 "n_common": pd.Series(dtype=np.int64),
                 "n_union": pd.Series(dtype=np.int64),
                 "jaccard": pd.Series(dtype=np.float64)})
        s = df["support"].to_numpy(np.int64)
        da = df["da"].to_numpy(np.int64)
        db = df["db"].to_numpy(np.int64)
        union = da + db - 2 - s  # |N(a)∪N(b)| minus the endpoints
        out = pd.DataFrame(
            {"a": df["a"].to_numpy(np.int64), "b": df["b"].to_numpy(np.int64),
             "n_common": s, "n_union": union,
             "jaccard": _round_half_away(
                 np.where(union > 0, s / np.maximum(union, 1), 0.0), 6)})
        # per-batch combiner: only each batch's top rows travel
        return out.sort_values(["jaccard", "a", "b"],
                               ascending=[False, True, True],
                               kind="mergesort").head(k)

    parts = with_db.map_batches(finish, batch_format="pandas").to_pandas()
    dense = parts.sort_values(["jaccard", "a", "b"],
                              ascending=[False, True, True],
                              kind="mergesort").head(k).reset_index(drop=True)
    res = _attach_orig(
        rd.from_arrow(pa.Table.from_pandas(dense, preserve_index=False)),
        id_map, n, ["a", "b"])
    res = res.sort_values(["jaccard", "a", "b"],
                          ascending=[False, True, True],
                          kind="mergesort").reset_index(drop=True)
    for c in ("a", "b", "n_common", "n_union"):
        res[c] = res[c].astype(np.int64)
    return res[["a", "b", "n_common", "n_union", "jaccard"]]


def q_gram_novelty(sf_dir: str) -> pd.DataFrame:
    """Corpus novelty curve at the 3-gram level: a gram is INTRODUCED by
    the lowest doc_id containing it; per document, the fraction of its
    distinct 3-grams it introduces (novelty = n_novel / n_grams, ROUND
    6) — the order-aware complement of dup_ngram_ratio that curation
    uses to find where a crawl stops contributing new content. Docs
    need ≥ 1 gram. Sorted by doc_id.

    Shape: per-doc distinct grams explode per batch (docs live in one
    row); gram-hash buckets complete the global MIN(doc_id) per gram AND
    count novel grams per introducing doc in the same pass; per-doc
    totals fold by doc-hash buckets; broadcast-or-hash attach joins the
    two doc-keyed tables."""
    from pagerank_ray.stages import joins

    n_buckets = 64
    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        w, valid, rep = _exploded_tokens(df, id_col="doc_id")
        empty = pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "g": pd.Series(dtype=object)})
        if len(w) < 3:
            return empty
        m = valid[:-2] & valid[1:-1] & valid[2:] \
            & (rep[:-2] == rep[1:-1]) & (rep[:-2] == rep[2:])
        if not m.any():
            return empty
        s0 = pd.Series(w[:-2][m])
        g = s0.str.cat([pd.Series(w[1:-1][m]), pd.Series(w[2:][m])], sep="\x1f")
        out = pd.DataFrame({"doc_id": rep[:-2][m],
                            "g": g.to_numpy(dtype=object)}).drop_duplicates()
        out["doc_id"] = out["doc_id"].astype(np.int64)
        return out

    def bucketize_g(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["g"].to_numpy(dtype=object))
        df = df.copy()
        df["bucket"] = (h % np.uint64(n_buckets)).astype(np.int32)
        return df

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        """Within a gram bucket: per-doc totals partial AND per-doc novel
        counts (MIN doc per gram), is_novel-tagged."""
        per = df.groupby("g", sort=False)["doc_id"].min()
        novel = per.value_counts()
        totals = df.groupby("doc_id", sort=False).size()
        return pd.concat([
            pd.DataFrame({"doc_id": novel.index.to_numpy(np.int64),
                          "n": novel.to_numpy(np.int64),
                          "kind": np.ones(len(novel), np.int64)}),
            pd.DataFrame({"doc_id": totals.index.to_numpy(np.int64),
                          "n": totals.to_numpy(np.int64),
                          "kind": np.zeros(len(totals), np.int64)}),
        ], ignore_index=True)

    parts = (
        docs.map_batches(grams, batch_format="pandas")
        .map_batches(bucketize_g, batch_format="pandas")
        .groupby("bucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby(["doc_id", "kind"], sort=False)["n"].sum().unstack(
        fill_value=0)
    n_grams = agg.get(0, pd.Series(dtype=np.int64))
    n_novel = agg.get(1, pd.Series(dtype=np.int64)).reindex(
        n_grams.index, fill_value=0)
    out = pd.DataFrame({
        "doc_id": n_grams.index.to_numpy(np.int64),
        "n_grams": n_grams.to_numpy(np.int64),
        "n_novel": n_novel.to_numpy(np.int64)})
    out["novelty"] = _round_half_away(
        out["n_novel"].to_numpy(np.int64)
        / out["n_grams"].to_numpy(np.float64), 6)
    return out.sort_values("doc_id").reset_index(drop=True)


def q_single_source_parts(sf_dir: str) -> pd.DataFrame:
    """Supply-chain concentration audit: per part-supplier count regime,
    how many parts are single-sourced (exactly one distinct supplier in
    the order flow), dual-sourced, or 3+ — the procurement-risk screen.
    Output: (n_suppliers_clamped_3, n_parts, frac ROUND 6), sorted.

    Shape: per-batch distinct (part, supplier) pairs, part-hash buckets
    complete exact distinct-supplier counts per part, each bucket
    collapses to ≤ 3 histogram rows."""
    n_buckets = 64
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        p = df[["l_partkey", "l_suppkey"]].drop_duplicates().copy()
        mixed = (p["l_partkey"].to_numpy(np.int64) * np.int64(0x9E3779B1)) \
            & np.int64(0x7FFFFFFF)
        p["bucket"] = (mixed % n_buckets).astype(np.int32)
        return p

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        d = df[["l_partkey", "l_suppkey"]].drop_duplicates()
        per = d.groupby("l_partkey", sort=False).size()
        clamped = np.minimum(per.to_numpy(np.int64), 3)
        vc = pd.Series(clamped).value_counts()
        return pd.DataFrame({"n_suppliers": vc.index.to_numpy(np.int64),
                             "n_parts": vc.to_numpy(np.int64)})

    parts = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(hist, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("n_suppliers", sort=True)["n_parts"].sum().reset_index()
    total = int(agg["n_parts"].sum())
    agg["frac"] = _round_half_away(
        agg["n_parts"].to_numpy(np.int64) / float(total), 6)
    agg["n_parts"] = agg["n_parts"].astype(np.int64)
    agg["n_suppliers"] = agg["n_suppliers"].astype(np.int64)
    return agg.reset_index(drop=True)


def q_weekday_profile(sf_dir: str) -> pd.DataFrame:
    """Day-of-week seasonality profile per event type: counts per
    (event_type, weekday 0=Monday) plus the chi-square statistic against
    the uniform-across-weekdays null (the seasonality screen run before
    weekly_autocorr's lag test). Counts exact; expected = n/7 and χ²
    float with ROUND 6. Sorted (event_type, weekday).

    Shape: per-batch (type, weekday) count partials — a T×7 grid — fold
    on the driver."""
    ev = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64) \
            // np.int64(86_400_000_000)
        wd = (day + 3) % 7  # 1970-01-01 was a Thursday → +3 ≡ Monday=0
        g = (
            pd.DataFrame({"event_type": df["event_type"].to_numpy(), "weekday": wd})
            .groupby(["event_type", "weekday"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    parts = ev.map_batches(partial, batch_format="pandas").to_pandas()
    grid = parts.groupby(["event_type", "weekday"], sort=True)["n"].sum().reset_index()
    tot = grid.groupby("event_type")["n"].transform("sum")
    exp = tot.to_numpy(np.int64) / 7.0
    grid["chi2_cell"] = _round_half_away(
        (grid["n"].to_numpy(np.int64) - exp) ** 2 / exp, 6)
    grid["n"] = grid["n"].astype(np.int64)
    grid["weekday"] = grid["weekday"].astype(np.int64)
    return grid.reset_index(drop=True)
