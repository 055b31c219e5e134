"""Graph-build correctness: id assignment, edge dedup, degrees vs DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa

from pagerank_ray.pipelines.flagship import edges_dataset_from_arrays
from pagerank_ray.sources.pages import synth_pages_dataset
from pagerank_ray.stages.graph_build import (
    assign_contiguous_ids,
    build_edges,
    build_vertices,
    equal_edge_cuts,
    extract_pages,
    grouped_count,
    normalize_extracted,
)


def _small_graph(n_pages=150, seed=11):
    pages = synth_pages_dataset(n_pages, seed=seed, concurrency=2)
    extracted = normalize_extracted(extract_pages(pages)).materialize()
    id_map, n = assign_contiguous_ids(extracted)
    id_map = id_map.materialize()
    edges = build_edges(extracted, id_map, n).materialize()
    return extracted, id_map, n, edges


def test_ids_contiguous_and_sorted(ray_session):
    extracted, id_map, n, edges = _small_graph()
    df = id_map.to_pandas().sort_values("id")
    assert list(df["id"]) == list(range(n))
    urls = list(df["url"])
    assert urls == sorted(urls)  # ids assigned in sorted-url order
    assert len(set(urls)) == n

    # universe covers src ∪ dst: every extracted url and outlink has an id
    ex = extracted.to_pandas()
    known = set(urls)
    assert set(ex["url"]) <= known
    for outs in ex["out_urls"]:
        assert set(outs) <= known


def test_edges_deduped_and_match_duckdb(ray_session):
    extracted, id_map, n, edges = _small_graph()
    ex = extracted.to_pandas()
    idm = dict(zip(id_map.to_pandas()["url"], id_map.to_pandas()["id"]))
    expected = set()
    for url, outs in zip(ex["url"], ex["out_urls"]):
        for o in outs:
            expected.add((idm[url], idm[o]))
    got = set(map(tuple, edges.to_pandas()[["src_id", "dst_id"]].to_numpy()))
    assert got == expected


def test_degrees_and_vertices_vs_duckdb(ray_session):
    extracted, id_map, n, edges = _small_graph()
    etab = edges.to_pandas()
    out_deg = grouped_count(edges, "src_id", "out_deg").to_pandas()
    con = duckdb.connect()
    con.register("edges", etab)
    oracle = con.sql(
        "select src_id, count(*)::bigint as out_deg from edges group by src_id order by src_id"
    ).df()
    got = out_deg.sort_values("src_id").reset_index(drop=True)
    assert got.equals(oracle)

    verts = build_vertices(id_map, edges, n).to_pandas().sort_values("id").reset_index(drop=True)
    assert len(verts) == n
    deg_map = dict(zip(oracle["src_id"], oracle["out_deg"]))
    for _, row in verts.iterrows():
        assert row["out_deg"] == deg_map.get(row["id"], 0)
        assert row["dangling"] == (row["out_deg"] == 0)


def test_equal_edge_cuts_properties(ray_session):
    rng = np.random.default_rng(0)
    src = (1000 * rng.random(20000) ** 3).astype(np.int64)
    dst = rng.integers(0, 1000, 20000)
    edges = edges_dataset_from_arrays(src, dst)
    cuts = equal_edge_cuts(edges, 1000, 8, n_edges=20000)
    assert len(cuts) == 7
    assert (np.diff(cuts) > 0).all()
    assert cuts[0] >= 1 and cuts[-1] <= 999
    # roughly balanced edge counts per part
    parts = np.searchsorted(cuts, src, side="right")
    counts = np.bincount(parts, minlength=8)
    assert counts.max() < 20000 * 0.5  # no part holds half the edges
