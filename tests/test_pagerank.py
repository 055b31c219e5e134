"""PageRank engine vs the reference recurrence (golden graph + NumPy oracle)."""

import numpy as np
import pytest

from pagerank_ray.oracle.numpy_oracle import pagerank_oracle
from pagerank_ray.pipelines.flagship import edges_dataset_from_arrays, prepare_csr_from_edges
from pagerank_ray.pipelines.pagerank import pagerank
from pagerank_ray.stages.csr import build_shard_table

# Golden 6-vertex / 10-edge worked example embedded in the reference
# (/root/reference/nvgraph_Pagerank.cpp:40-69), 0-indexed.
GOLDEN_SRC = np.array([0, 0, 2, 2, 2, 3, 3, 4, 4, 5])
GOLDEN_DST = np.array([1, 2, 0, 1, 4, 4, 5, 3, 5, 3])
GOLDEN_N = 6
# expected PageRank at alpha=0.90 on probability scale (Langville & Meyer)
GOLDEN_EXPECTED = np.array([0.037210, 0.053960, 0.041510, 0.37510, 0.206000, 0.28620])


def _make_csr(tmp_path, src, dst, n, n_parts=3, symmetrize=False):
    edges = edges_dataset_from_arrays(src, dst)
    csr_dir = str(tmp_path / ("csr_sym" if symmetrize else "csr"))
    prepare_csr_from_edges(
        edges, n, csr_dir, n_parts=n_parts, symmetrize=symmetrize, n_edges=len(src)
    )
    return csr_dir


def _ranks_array(result, n):
    df = result.result.to_pandas().sort_values("id")
    assert list(df["id"]) == list(range(n))
    return df["rank"].to_numpy()


def test_csr_shard_arrays_match_reference_semantics():
    """CSR build reproduces degrees/weights/dangling of the reference reader
    (kernel_acsr.cu:398-415), here in src-sharded form."""
    t = build_shard_table(0, GOLDEN_SRC, GOLDEN_DST, 0, 6)
    indptr = np.asarray(t.column("indptr")[0].values)
    dst = np.asarray(t.column("dst_ids")[0].values)
    out_deg = np.diff(indptr)
    assert list(out_deg) == [2, 0, 3, 2, 2, 1]  # vertex 1 dangling (bookmark)
    assert list(dst) == [1, 2, 0, 1, 4, 4, 5, 3, 5, 3]  # (src,dst)-sorted
    # reference CSC arrays are recoverable: destination_offsets from in-degrees
    in_deg = np.bincount(GOLDEN_DST, minlength=6)
    assert list(np.concatenate([[0], np.cumsum(in_deg)])) == [0, 1, 3, 4, 6, 8, 10]


def test_golden_graph_alpha_090(ray_session, tmp_path):
    csr_dir = _make_csr(tmp_path, GOLDEN_SRC, GOLDEN_DST, GOLDEN_N)
    res = pagerank(csr_dir, n_workers=3, alpha=0.90, max_iters=200)
    ranks = _ranks_array(res, GOLDEN_N)
    prob = ranks / GOLDEN_N  # engine runs on mass-n scale
    assert res.converged
    np.testing.assert_allclose(prob, GOLDEN_EXPECTED, atol=1e-4)


@pytest.mark.parametrize("alpha", [0.85, 0.90])
def test_golden_graph_matches_oracle(ray_session, tmp_path, alpha):
    csr_dir = _make_csr(tmp_path, GOLDEN_SRC, GOLDEN_DST, GOLDEN_N)
    res = pagerank(csr_dir, n_workers=2, alpha=alpha, max_iters=200)
    oracle, _, oconv = pagerank_oracle(
        GOLDEN_N, GOLDEN_SRC, GOLDEN_DST, alpha=alpha, max_iters=200
    )
    assert res.converged and oconv
    np.testing.assert_allclose(_ranks_array(res, GOLDEN_N), oracle, atol=1e-6)


def _random_graph(n, m, seed, hub_skew=3.0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = (n * rng.random(m) ** hub_skew).astype(np.int64)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


@pytest.mark.parametrize("seed,n,m", [(1, 300, 2500), (2, 500, 400), (3, 97, 5000)])
def test_random_graphs_match_oracle(ray_session, tmp_path, seed, n, m):
    src, dst = _random_graph(n, m, seed)
    csr_dir = _make_csr(tmp_path, src, dst, n, n_parts=5)
    res = pagerank(csr_dir, n_workers=4, alpha=0.85, max_iters=300)
    oracle, _, _ = pagerank_oracle(n, src, dst, alpha=0.85, max_iters=300)
    np.testing.assert_allclose(_ranks_array(res, n), oracle, atol=1e-6)


def test_mass_conservation_per_superstep(ray_session, tmp_path):
    src, dst = _random_graph(400, 3000, 7)
    csr_dir = _make_csr(tmp_path, src, dst, 400, n_parts=4)
    res = pagerank(csr_dir, n_workers=3, max_iters=30)
    for m in res.metrics:
        assert abs(m["total_mass"] - 400) < 1e-8  # Σr = n every superstep


def test_edge_order_permutation_invariance(ray_session, tmp_path):
    src, dst = _random_graph(200, 1500, 9)
    perm = np.random.default_rng(0).permutation(len(src))
    a = _make_csr(tmp_path / "a", src, dst, 200, n_parts=3)
    b = _make_csr(tmp_path / "b", src[perm], dst[perm], 200, n_parts=3)
    ra = _ranks_array(pagerank(a, n_workers=2, max_iters=100), 200)
    rb = _ranks_array(pagerank(b, n_workers=2, max_iters=100), 200)
    np.testing.assert_array_equal(ra, rb)  # bit-identical: fixed intra-shard order


def test_worker_count_does_not_change_result(ray_session, tmp_path):
    src, dst = _random_graph(250, 2000, 13)
    csr_dir = _make_csr(tmp_path, src, dst, 250, n_parts=6)
    r1 = _ranks_array(pagerank(csr_dir, n_workers=1, max_iters=100), 250)
    r4 = _ranks_array(pagerank(csr_dir, n_workers=4, max_iters=100), 250)
    np.testing.assert_allclose(r1, r4, atol=1e-12)


@pytest.mark.parametrize("transport", ["shm", "plasma"])
def test_transports_oracle_exact(ray_session, tmp_path, transport):
    """PageRank over both exchange transports: shm (single-node ring) and
    plasma (the multi-node object-store path, superstep.py) must both match
    the NumPy oracle at 1e-6 — the plasma path is what a real cluster runs."""
    src, dst = _random_graph(300, 2500, seed=17)
    csr_dir = _make_csr(tmp_path, src, dst, 300, n_parts=5)
    res = pagerank(csr_dir, n_workers=3, alpha=0.85, max_iters=200, transport=transport)
    oracle, _, _ = pagerank_oracle(300, src, dst, alpha=0.85, max_iters=200)
    np.testing.assert_allclose(_ranks_array(res, 300), oracle, atol=1e-6)


def test_transport_parity_shm_vs_plasma(ray_session, tmp_path):
    """Both transports produce bit-identical rank vectors (same recurrence,
    only the exchange medium differs)."""
    src, dst = _random_graph(250, 1800, seed=23)
    a = _make_csr(tmp_path / "a", src, dst, 250, n_parts=4)
    b = _make_csr(tmp_path / "b", src, dst, 250, n_parts=4)
    ra = _ranks_array(pagerank(a, n_workers=2, max_iters=80, transport="shm"), 250)
    rb = _ranks_array(pagerank(b, n_workers=2, max_iters=80, transport="plasma"), 250)
    np.testing.assert_array_equal(ra, rb)


def test_weighted_pagerank_matches_numpy(ray_session, tmp_path):
    """Stored-weight CSR path vs a dense NumPy weighted-PageRank oracle."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
    from pagerank_ray.pipelines.pagerank import pagerank

    rng = np.random.default_rng(31)
    n, m = 120, 700
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    q = rng.integers(1, 50, len(src)).astype(np.float64)
    edges = rd.from_arrow(
        pa.table({"src_id": src, "dst_id": dst, "weight": q})
    )
    csr = str(tmp_path / "wcsr")
    prepare_csr_from_edges(edges, n, csr, n_parts=4)
    res = pagerank(csr, n_workers=2, max_iters=15, eps_per_vertex=0.0)

    # dense oracle with identical semantics
    tot = np.zeros(n)
    np.add.at(tot, src, q)
    w = q / tot[src]
    r = np.ones(n)
    dangling = np.ones(n, bool)
    dangling[src] = False
    alpha = 0.85
    for _ in range(15):
        acc = np.zeros(n)
        np.add.at(acc, dst, r[src] * w)
        remain = alpha * r[dangling].sum() / n + (1 - alpha)
        r = remain + alpha * acc
    got = res.result.to_pandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(got, r, rtol=1e-12, atol=1e-12)
