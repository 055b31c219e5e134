"""Personalization (M7), L2 norm (A4), per-bin convergence telemetry (A5/S4)."""

import os

import numpy as np

from pagerank_ray.oracle.numpy_oracle import pagerank_oracle
from pagerank_ray.pipelines.flagship import edges_dataset_from_arrays, prepare_csr_from_edges
from pagerank_ray.pipelines.pagerank import pagerank


def _graph(tmp_path, seed=17, n=250, m=2000):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = (n * rng.random(m) ** 2.5).astype(np.int64)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    d = str(tmp_path / "csr")
    prepare_csr_from_edges(
        edges_dataset_from_arrays(pairs[:, 0], pairs[:, 1]), n, d, n_parts=5,
        n_edges=len(pairs),
    )
    return d, n, pairs[:, 0], pairs[:, 1]


def test_personalized_pagerank_matches_oracle(ray_session, tmp_path):
    csr, n, src, dst = _graph(tmp_path)
    rng = np.random.default_rng(5)
    p = rng.random(n)
    p /= p.sum()
    res = pagerank(csr, n_workers=3, max_iters=300, personalization=p)
    oracle, _, oconv = pagerank_oracle(n, src, dst, max_iters=300, personalization=p)
    assert res.converged and oconv
    got = res.result.to_pandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(got, oracle, atol=1e-6)
    np.testing.assert_allclose(got.sum(), n, atol=1e-8)  # mass conserved


def test_l2_norm_convergence(ray_session, tmp_path):
    csr, n, src, dst = _graph(tmp_path, seed=18)
    res = pagerank(csr, n_workers=2, max_iters=300, norm="l2", eps_l2=1e-10)
    assert res.converged
    # l2-converged ranks still match the l1 oracle closely
    oracle, _, _ = pagerank_oracle(n, src, dst, max_iters=300, eps_per_vertex=1e-9)
    got = res.result.to_pandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(got, oracle, atol=1e-5)
    assert "l2_diff" in res.metrics[0]


def test_bin_metrics_and_csv(ray_session, tmp_path):
    csr, n, src, dst = _graph(tmp_path, seed=19)
    ckpt = str(tmp_path / "ckpt")
    res = pagerank(
        csr, n_workers=2, max_iters=50, bin_metrics=True,
        checkpoint_root=ckpt, checkpoint_every=5,
    )
    assert res.converged
    rec = res.metrics[0]
    assert "bin_mean_abs_diff" in rec and len(rec["bin_mean_abs_diff"]) == 15
    # bins with vertices show nonzero first-iteration movement
    assert sum(rec["bin_mean_abs_diff"]) > 0
    it_dirs = sorted(d for d in os.listdir(ckpt) if d.startswith("iter_"))
    csvs = [
        d for d in it_dirs if os.path.exists(os.path.join(ckpt, d, "converge_node.csv"))
    ]
    assert csvs, "converge_node.csv written with a checkpoint"
    lines = open(os.path.join(ckpt, csvs[-1], "converge_node.csv")).read().strip().split("\n")
    assert lines[0].startswith("iteration,bin0,")
    assert len(lines) >= 2
