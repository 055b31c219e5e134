"""Checkpoint/resume: resume-equals-continuous (north_rule property test)."""

import json
import os

import numpy as np

from pagerank_ray.pipelines.flagship import edges_dataset_from_arrays, prepare_csr_from_edges
from pagerank_ray.pipelines.pagerank import pagerank


def _graph(tmp_path, seed=21, n=300, m=2500):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = (n * rng.random(m) ** 2.5).astype(np.int64)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    edges = edges_dataset_from_arrays(pairs[:, 0], pairs[:, 1])
    d = str(tmp_path / "csr")
    prepare_csr_from_edges(edges, n, d, n_parts=6, n_edges=len(pairs))
    return d, n


def test_resume_equals_continuous(ray_session, tmp_path):
    csr_dir, n = _graph(tmp_path)
    ckpt = str(tmp_path / "ckpt")

    # continuous run to convergence
    full = pagerank(csr_dir, n_workers=2, max_iters=100)
    ranks_full = full.result.to_pandas().sort_values("id")["rank"].to_numpy()

    # interrupted run: stop after 7 supersteps (checkpoint every 7)
    part = pagerank(
        csr_dir, n_workers=2, max_iters=7, checkpoint_root=ckpt, checkpoint_every=7
    )
    assert not part.converged
    it_dirs = [d for d in os.listdir(ckpt) if d.startswith("iter_")]
    assert it_dirs, "checkpoint directory written"
    man = json.load(open(os.path.join(ckpt, sorted(it_dirs)[-1], "MANIFEST.json")))
    assert man["complete"] and man["iteration"] == 7
    assert man["n_vertices"] == n  # lineage metadata present
    assert os.path.exists(os.path.join(ckpt, sorted(it_dirs)[-1], "_metrics.json"))

    # keep a pristine copy: resumed runs write new checkpoints into their root
    import shutil

    ckpt_b = str(tmp_path / "ckpt_b")
    shutil.copytree(ckpt, ckpt_b)

    # resume with the SAME worker count → bit-identical to the continuous run
    res = pagerank(csr_dir, n_workers=2, max_iters=100, checkpoint_root=ckpt, resume=True)
    assert res.iterations == full.iterations  # continued from iter 7, same total count
    ranks_res = res.result.to_pandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_array_equal(ranks_res, ranks_full)

    # resume with a DIFFERENT worker count → equal up to summation regrouping
    res3 = pagerank(csr_dir, n_workers=3, max_iters=100, checkpoint_root=ckpt_b, resume=True)
    ranks3 = res3.result.to_pandas().sort_values("id")["rank"].to_numpy()
    np.testing.assert_allclose(ranks3, ranks_full, rtol=1e-12)


def test_resume_without_checkpoint_starts_fresh(ray_session, tmp_path):
    csr_dir, n = _graph(tmp_path, seed=22)
    res = pagerank(
        csr_dir, n_workers=2, max_iters=20, checkpoint_root=str(tmp_path / "none"), resume=True
    )
    assert res.iterations == 20 or res.converged


def test_cc_resume_equals_continuous(ray_session, tmp_path):
    """Label-mode checkpoint/resume (hash-min CC)."""
    import numpy as np

    from pagerank_ray.pipelines.cc import connected_components
    from pagerank_ray.pipelines.flagship import (
        edges_dataset_from_arrays,
        prepare_csr_from_edges,
    )

    rng = np.random.default_rng(33)
    n, m = 200, 260  # sparse → many components, several iterations
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    d = str(tmp_path / "csr_sym")
    prepare_csr_from_edges(edges_dataset_from_arrays(src, dst), n, d, n_parts=4, symmetrize=True)

    full = connected_components(d, n_workers=2)
    labels_full = full.result.to_pandas().sort_values("id")["label"].to_numpy()

    ckpt = str(tmp_path / "ck")
    part = connected_components(d, n_workers=2, max_iters=2, checkpoint_root=ckpt, checkpoint_every=2)
    res = connected_components(d, n_workers=2, checkpoint_root=ckpt, resume=True)
    labels_res = res.result.to_pandas().sort_values("id")["label"].to_numpy()
    np.testing.assert_array_equal(labels_res, labels_full)


def _dual_csr(tmp_path, n=300, m=2500):
    """Forward + reversed CSR pair for HITS."""
    rng = np.random.default_rng(33)
    src = rng.integers(0, n, m)
    dst = (n * rng.random(m) ** 2.5).astype(np.int64)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    fwd = str(tmp_path / "csr_fwd")
    rev = str(tmp_path / "csr_rev")
    prepare_csr_from_edges(
        edges_dataset_from_arrays(pairs[:, 0], pairs[:, 1]), n, fwd, n_parts=6
    )
    prepare_csr_from_edges(
        edges_dataset_from_arrays(pairs[:, 1], pairs[:, 0]), n, rev, n_parts=6
    )
    return fwd, rev, n


def test_hits_resume_equals_continuous(ray_session, tmp_path):
    """Kill HITS after iteration 2 of 5, resume → bit-identical vectors."""
    from pagerank_ray.pipelines.hits import hits

    fwd, rev, n = _dual_csr(tmp_path)
    full = hits(fwd, rev, n_workers=2, iters=5)
    a_full = full.authorities.to_pandas().sort_values("id")["value"].to_numpy()
    h_full = full.hubs.to_pandas().sort_values("id")["value"].to_numpy()

    ckpt = str(tmp_path / "hits_ckpt")
    part = hits(fwd, rev, n_workers=2, iters=2, checkpoint_root=ckpt,
                checkpoint_every=2)
    assert part.iterations == 2
    assert os.path.isdir(os.path.join(ckpt, "hub"))
    assert os.path.isdir(os.path.join(ckpt, "auth"))
    # keep a pristine copy: the resumed run writes new checkpoints into its root
    import shutil

    ckpt_b = str(tmp_path / "hits_ckpt_b")
    shutil.copytree(ckpt, ckpt_b)

    res = hits(fwd, rev, n_workers=2, iters=5, checkpoint_root=ckpt, resume=True)
    a_res = res.authorities.to_pandas().sort_values("id")["value"].to_numpy()
    h_res = res.hubs.to_pandas().sort_values("id")["value"].to_numpy()
    np.testing.assert_array_equal(a_res, a_full)
    np.testing.assert_array_equal(h_res, h_full)

    # resume at a checkpoint already at iters: pure restore, still identical
    res2 = hits(fwd, rev, n_workers=2, iters=2, checkpoint_root=ckpt_b, resume=True)
    a_part = part.authorities.to_pandas().sort_values("id")["value"].to_numpy()
    a_res2 = res2.authorities.to_pandas().sort_values("id")["value"].to_numpy()
    np.testing.assert_array_equal(a_res2, a_part)


def test_kcore_resume_equals_continuous(ray_session, tmp_path):
    """Kill the k-core peel after 2 distributed rounds, resume → identical
    core. tail_cutoff=0 forces every round distributed so checkpoints fire."""
    import pandas as pd
    import ray.data as rd

    from pagerank_ray.pipelines.kcore import k_core
    from pagerank_ray.stages.csr import symmetrize

    rng = np.random.default_rng(44)
    n, m = 250, 1800
    src = rng.integers(0, n, m)
    dst = (n * rng.random(m) ** 2.0).astype(np.int64)
    keep = src != dst
    edges = edges_dataset_from_arrays(src[keep], dst[keep])
    sym = symmetrize(edges).materialize()

    core_full, rounds_full = k_core(sym, 4, tail_cutoff=0)
    full_df = core_full.to_pandas().sort_values("src_id").reset_index(drop=True)

    ckpt = str(tmp_path / "kcore_ckpt")
    # interrupted: tiny round budget, checkpoint every round
    try:
        k_core(sym, 4, max_rounds=2, tail_cutoff=0,
               checkpoint_root=ckpt, checkpoint_every=1)
        interrupted = False
    except RuntimeError:
        interrupted = True
    round_dirs = [d for d in os.listdir(ckpt) if d.startswith("round_")]
    assert round_dirs, "peel checkpoint written"

    core_res, rounds_res = k_core(sym, 4, tail_cutoff=0,
                                  checkpoint_root=ckpt, resume=True)
    res_df = core_res.to_pandas().sort_values("src_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(res_df, full_df)
    if interrupted:
        assert rounds_res == rounds_full  # resumed rounds count continues
