"""Dataset-API PageRank parity vs BSP engine + SNAP conformance I/O."""

import numpy as np

from pagerank_ray.oracle.numpy_oracle import pagerank_oracle
from pagerank_ray.pipelines.dataset_pagerank import pagerank_dataset
from pagerank_ray.pipelines.flagship import edges_dataset_from_arrays, prepare_csr_from_edges
from pagerank_ray.pipelines.pagerank import pagerank
from pagerank_ray.sources.snap import read_snap_edges, write_ranks_text

GOLDEN_SRC = np.array([0, 0, 2, 2, 2, 3, 3, 4, 4, 5])
GOLDEN_DST = np.array([1, 2, 0, 1, 4, 4, 5, 3, 5, 3])


def test_dataset_pagerank_matches_bsp(ray_session, tmp_path):
    rng = np.random.default_rng(31)
    src = rng.integers(0, 150, 1200)
    dst = (150 * rng.random(1200) ** 2).astype(np.int64)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    csr_dir = str(tmp_path / "csr")
    prepare_csr_from_edges(
        edges_dataset_from_arrays(pairs[:, 0], pairs[:, 1]), 150, csr_dir, n_parts=4,
        n_edges=len(pairs),
    )
    ds_ranks, ds_iters, ds_conv = pagerank_dataset(csr_dir, max_iters=100)
    bsp = pagerank(csr_dir, n_workers=2, max_iters=100)
    a = ds_ranks.to_pandas().sort_values("id")["rank"].to_numpy()
    b = bsp.result.to_pandas().sort_values("id")["rank"].to_numpy()
    assert ds_conv and bsp.converged
    assert ds_iters == bsp.iterations
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_snap_reader_1_indexed_roundtrip(ray_session, tmp_path):
    path = tmp_path / "golden.txt"
    lines = ["6 10"] + [f"{s+1} {d+1}" for s, d in zip(GOLDEN_SRC, GOLDEN_DST)]
    path.write_text("\n".join(lines) + "\n")
    edges, n = read_snap_edges(str(path))
    assert n == 6
    df = edges.to_pandas()
    np.testing.assert_array_equal(df["src_id"].to_numpy(), GOLDEN_SRC)
    np.testing.assert_array_equal(df["dst_id"].to_numpy(), GOLDEN_DST)


def test_snap_pipeline_end_to_end_with_text_output(ray_session, tmp_path):
    """Reference-format file in → reference-format ranks out (6 decimals)."""
    path = tmp_path / "g.txt"
    lines = ["6 10"] + [f"{s+1} {d+1}" for s, d in zip(GOLDEN_SRC, GOLDEN_DST)]
    path.write_text("\n".join(lines) + "\n")
    edges, n = read_snap_edges(str(path))
    csr_dir = str(tmp_path / "csr")
    prepare_csr_from_edges(edges, n, csr_dir, n_parts=2, n_edges=10)
    res = pagerank(csr_dir, n_workers=2, alpha=0.85, max_iters=200)
    df = res.result.to_pandas()
    out = tmp_path / "ranks.txt"
    write_ranks_text(df, str(out))
    text_lines = out.read_text().strip().split("\n")
    assert len(text_lines) == 6
    oracle, _, _ = pagerank_oracle(6, GOLDEN_SRC, GOLDEN_DST, alpha=0.85, max_iters=200)
    got = np.array([float(x) for x in text_lines])
    np.testing.assert_allclose(got, oracle, atol=1e-5)  # 6-decimal text precision
