"""End-to-end flagship correctness: synthetic crawl → engine ranks vs a NumPy
oracle run on edges re-derived independently (pandas, from the extracted
artifact) — the whole build chain (ids, dedup, CSR, superstep loop) must agree."""

import numpy as np
import pandas as pd
import ray.data as rd

from pagerank_ray.oracle.numpy_oracle import cc_oracle, pagerank_oracle
from pagerank_ray.pipelines.cc import connected_components
from pagerank_ray.pipelines.flagship import prepare_csr_from_edges, run_flagship
from pagerank_ray.sources.pages import synth_pages_dataset


def _independent_edges(arts):
    """Re-derive (deduped) edges + sorted-url ids with pandas only."""
    ex = rd.read_parquet(arts["extracted"]).to_pandas()
    urls = set(ex["url"])
    for outs in ex["out_urls"]:
        urls.update(outs)
    url_to_id = {u: i for i, u in enumerate(sorted(urls))}
    pairs = set()
    for url, outs in zip(ex["url"], ex["out_urls"]):
        for o in outs:
            pairs.add((url_to_id[url], url_to_id[o]))
    arr = np.array(sorted(pairs), dtype=np.int64)
    return len(url_to_id), arr[:, 0], arr[:, 1], url_to_id


def test_flagship_ranks_match_oracle(ray_session, tmp_path):
    pages = synth_pages_dataset(400, seed=9, concurrency=2)
    res, arts = run_flagship(pages, str(tmp_path / "work"), n_workers=3, checkpoint=False)
    n, src, dst, url_to_id = _independent_edges(arts)
    assert arts["n_vertices"] == n
    assert arts["n_edges"] == len(src)

    # id assignment agrees with the independent sorted-url mapping
    idm = rd.read_parquet(arts["id_map"]).to_pandas()
    assert dict(zip(idm["url"], idm["id"])) == url_to_id

    oracle, _, oconv = pagerank_oracle(n, src, dst, max_iters=200)
    assert res.converged and oconv
    got = res.result.to_pandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(got, oracle, atol=1e-6)

    # connected components over the same artifacts
    sym = str(tmp_path / "work" / "csr_sym")
    prepare_csr_from_edges(rd.read_parquet(arts["edges"]), n, sym, n_parts=6, symmetrize=True)
    cc = connected_components(sym, n_workers=3)
    labels = cc.result.to_pandas().sort_values("id")["label"].to_numpy()
    np.testing.assert_array_equal(labels, cc_oracle(n, src, dst))
