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


def _dup_url_pages():
    """Crawl with re-crawled urls: u0 has 3 snapshots (two sharing the max
    warc_ts but different html), u1 has 1, u2 has 2."""
    import datetime as dt

    t0 = dt.datetime(2025, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    rows = {
        "url": [
            "https://a.example/p/0", "https://a.example/p/0", "https://a.example/p/0",
            "https://a.example/p/1",
            "https://a.example/p/2", "https://a.example/p/2",
        ],
        "warc_ts": [ts(1), ts(5), ts(5), ts(2), ts(3), ts(1)],
        "html": [
            b"<html><body>old</body></html>",
            b"<html><body>new B</body></html>",   # md5 smaller/larger decides
            b"<html><body>new A</body></html>",
            b"<html><body>only</body></html>",
            b"<html><body>latest</body></html>",
            b"<html><body>stale</body></html>",
        ],
        "text": [""] * 6,
        "lang": ["en"] * 6,
    }
    tab = pa.table(
        {
            "url": pa.array(rows["url"], pa.string()),
            "warc_ts": pa.array(rows["warc_ts"], pa.timestamp("us")),
            "html": pa.array(rows["html"], pa.binary()),
            "text": pa.array(rows["text"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
        }
    )
    import ray.data as rd

    return rd.from_arrow(tab), rows


def test_dedup_pages_by_url_rule(ray_session):
    """§2.9 pinned rule: latest warc_ts wins; ties -> smallest md5(html)."""
    import hashlib

    from pagerank_ray.stages.graph_build import dedup_pages_by_url

    pages, rows = _dup_url_pages()
    out = dedup_pages_by_url(pages).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(out["url"]) == [
        "https://a.example/p/0", "https://a.example/p/1", "https://a.example/p/2"
    ]
    # u0: the two ts(5) snapshots tie; winner is the smaller md5 digest
    cands = [rows["html"][1], rows["html"][2]]
    winner = min(cands, key=lambda b: hashlib.md5(b).hexdigest())
    assert bytes(out.loc[0, "html"]) == winner
    assert bytes(out.loc[1, "html"]) == rows["html"][3]
    assert bytes(out.loc[2, "html"]) == rows["html"][4]  # ts(3) beats ts(1)
    # schema preserved exactly (timestamp unit survives the pyarrow map_groups)
    assert out["warc_ts"].dtype.kind == "M"


def test_flagship_dedups_recrawled_urls(ray_session, tmp_path):
    """build_graph on a crawl with duplicate urls: one extracted row per url,
    text extracted from the WINNING snapshot."""
    from pagerank_ray.functions.extract import extract_batch
    from pagerank_ray.pipelines.flagship import build_graph

    pages, rows = _dup_url_pages()
    arts = build_graph(pages, str(tmp_path / "work"), n_parts=2)
    import ray.data as rd

    ex = rd.read_parquet(arts["extracted"]).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(ex["url"]) == [
        "https://a.example/p/0", "https://a.example/p/1", "https://a.example/p/2"
    ]
    # winning snapshot's extracted text (byte-identical invariant)
    import hashlib

    cands = [rows["html"][1], rows["html"][2]]
    winner = min(cands, key=lambda b: hashlib.md5(b).hexdigest())
    win_tab = pa.table(
        {
            "url": pa.array(["https://a.example/p/0"]),
            "html": pa.array([winner], pa.binary()),
            "text": pa.array([""]),
        }
    )
    expect = extract_batch(win_tab).column("text").to_pylist()[0]
    assert ex.loc[0, "text"] == expect


def test_dedup_extracted_equals_dedup_pages(ray_session, tmp_path):
    """The html-free dedup variant (extract first, carry (warc_ts, digest),
    dedup the extracted table) must pick byte-identical winners to the
    phase-0 pages dedup — same extracted artifact either way."""
    from pagerank_ray.pipelines.flagship import build_graph

    pages, _ = _dup_url_pages()
    a = build_graph(pages, str(tmp_path / "w_pages"), n_parts=2, dedup_stage="pages")
    pages2, _ = _dup_url_pages()
    b = build_graph(pages2, str(tmp_path / "w_ex"), n_parts=2, dedup_stage="extracted")
    import ray.data as rd

    ex_a = rd.read_parquet(a["extracted"]).to_pandas().sort_values("url").reset_index(drop=True)
    ex_b = rd.read_parquet(b["extracted"]).to_pandas().sort_values("url").reset_index(drop=True)
    assert list(ex_a.columns) == list(ex_b.columns)
    assert ex_a["url"].tolist() == ex_b["url"].tolist()
    assert ex_a["text"].tolist() == ex_b["text"].tolist()
    assert ex_a["out_urls"].map(list).tolist() == ex_b["out_urls"].map(list).tolist()
    assert a["n_vertices"] == b["n_vertices"] and a["n_edges"] == b["n_edges"]
