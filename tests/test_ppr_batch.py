"""Batched personalized PageRank (pipelines/ppr_batch.py).

The oracle-parity check for q_ppr_batch itself runs in test_entry.py's
parametrized sweep; here we pin the two structural claims:
- the K-column batch equals K INDEPENDENT single-vector recurrences
  (batching changes the schedule, never the math);
- the distributed (attach + bucketed grouped-sum) path is bit-identical to
  the in-memory tail.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pagerank_ray.functions.text import round_half_away
from pagerank_ray.pipelines.ppr_batch import ppr_batch

MODS = (97, 89, 83, 101)


def _edges(seed: int = 7, n_v: int = 120, n_e: int = 420) -> pa.Table:
    rng = np.random.default_rng(seed)
    # ids spread far enough that every mod has seeds: plant multiples
    base = rng.integers(0, 5000, n_e * 2).reshape(2, n_e)
    for m in MODS:  # guarantee non-empty seed sets
        base[0, m % n_e] = m
        base[1, (m * 3) % n_e] = 2 * m
    src, dst = base[0], base[1]
    t = pa.table({"src_id": pa.array(src, pa.int64()),
                  "dst_id": pa.array(dst, pa.int64())})
    return t.group_by(["src_id", "dst_id"]).aggregate([]).sort_by("src_id")


def _single_ppr_reference(tbl: pa.Table, mod: int, iters: int,
                          alpha: float) -> pd.DataFrame:
    """Plain per-iteration single-vector M7 recurrence in numpy (the
    q_pagerank_personalized semantics, independent of the batch code)."""
    s = tbl.column("src_id").to_numpy().astype(np.int64)
    d = tbl.column("dst_id").to_numpy().astype(np.int64)
    ids = np.unique(np.concatenate([s, d]))
    n = float(len(ids))
    si, di = np.searchsorted(ids, s), np.searchsorted(ids, d)
    deg = np.bincount(si, minlength=len(ids)).astype(np.float64)
    seeds = ids % mod == 0
    assert seeds.any()
    pn = np.zeros(len(ids))
    pn[seeds] = (1.0 / seeds.sum()) * n
    r = pn.copy()
    for _ in range(iters):
        dmass = r[deg == 0].sum()
        inc = np.zeros(len(ids))
        np.add.at(inc, di, r[si] / deg[si])
        r = (alpha * dmass / n + (1.0 - alpha)) * pn + alpha * inc
    return pd.DataFrame({"id": ids, "rank": round_half_away(r, 6)})


def test_batch_equals_independent_runs(ray_session):
    tbl = _edges()
    out = ppr_batch(rd.from_arrow(tbl), mods=MODS, iters=8)
    assert list(out.columns) == ["id", *(f"rank_{j}" for j in range(len(MODS)))]
    for j, m in enumerate(MODS):
        ref = _single_ppr_reference(tbl, m, iters=8, alpha=0.85)
        np.testing.assert_array_equal(out["id"].to_numpy(), ref["id"].to_numpy())
        np.testing.assert_allclose(
            out[f"rank_{j}"].to_numpy(), ref["rank"].to_numpy(), atol=2e-6)


def test_distributed_matches_tail(ray_session):
    tbl = _edges(seed=11)
    a = ppr_batch(rd.from_arrow(tbl), mods=MODS, iters=5)  # tail path
    b = ppr_batch(rd.from_arrow(tbl), mods=MODS, iters=5, tail_cutoff=0)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False)


def test_mass_conservation(ray_session):
    """Each column's total rank mass stays n (the mass-n scale invariant of
    the M7 recurrence with dangling redistribution)."""
    tbl = _edges(seed=23)
    out = ppr_batch(rd.from_arrow(tbl), mods=MODS, iters=12)
    n = float(len(out))
    for j in range(len(MODS)):
        np.testing.assert_allclose(out[f"rank_{j}"].sum(), n, rtol=1e-4)


def test_empty_seed_set_raises(ray_session):
    tbl = pa.table({"src_id": pa.array([1, 2], pa.int64()),
                    "dst_id": pa.array([2, 3], pa.int64())})
    import pytest
    with pytest.raises(ValueError, match="empty seed set"):
        ppr_batch(rd.from_arrow(tbl), mods=(999999937,), iters=2)
