"""Oracle tests for the temporal operators (sessionize, asof_join) and the
exact Jaccard similarity join — NumPy/pandas references on randomized inputs
with adversarial ties, plus exactness (no false negatives) for the prefix
filter against brute-force all-pairs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from pagerank_ray.stages.dedup import jaccard_similarity_join, ngram_jaccard
from pagerank_ray.stages.temporal import asof_join, sessionize


def _events(n=4000, users=37, seed=7):
    rng = np.random.default_rng(seed)
    ts = np.datetime64("2024-01-01", "us") + np.cumsum(
        rng.integers(0, 40 * 60 * 1_000_000, n)
    ).astype("timedelta64[us]")
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "ts": ts,
        }
    )
    # adversarial: duplicate timestamps within a user
    dup = df.sample(frac=0.05, random_state=1).copy()
    dup["event_id"] = np.arange(n, n + len(dup), dtype=np.int64)
    return pd.concat([df, dup], ignore_index=True)


def test_sessionize_matches_pandas_reference(ray_session):
    df = _events()
    got = (
        sessionize(rd.from_pandas(df), gap_sec=1800.0, n_buckets=8)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
    gap = ref.groupby("user_id")["ts"].diff().dt.total_seconds()
    new = gap.isna() | (gap > 1800.0)
    ref["session_num"] = new.groupby(ref["user_id"]).cumsum().astype(np.int64)
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert (got["event_id"].values == ref["event_id"].values).all()
    assert (got["session_num"].values == ref["session_num"].values).all()


def test_asof_join_matches_merge_asof(ray_session):
    rng = np.random.default_rng(3)
    ev = _events(n=1500, users=25, seed=11)
    n_orders = 400
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_orders, dtype=np.int64),
            "o_custkey": rng.integers(0, 30, n_orders).astype(np.int64),
            "o_orderdate": np.datetime64("2024-01-01", "us")
            + rng.integers(0, 10**12, n_orders).astype("timedelta64[us]"),
            "o_totalprice": np.round(rng.uniform(1, 1000, n_orders), 2),
        }
    )
    # adversarial: exact (cust, date) ties — max orderkey must win
    ties = orders.iloc[:20].copy()
    ties["o_orderkey"] = np.arange(n_orders, n_orders + 20, dtype=np.int64)
    orders = pd.concat([orders, ties], ignore_index=True)

    got = (
        asof_join(
            rd.from_pandas(ev),
            rd.from_pandas(orders),
            left_on="ts",
            right_on="o_orderdate",
            left_by="user_id",
            right_by="o_custkey",
            left_cols=["event_id"],
            right_cols=["o_orderkey", "o_totalprice"],
            right_fill={"o_orderkey": -1, "o_totalprice": 0.0},
            right_tiebreak=["o_orderkey"],
            n_buckets=8,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    r = orders.sort_values(["o_orderdate", "o_orderkey"], kind="mergesort")
    ref = pd.merge_asof(
        ev.sort_values("ts", kind="mergesort"),
        r.rename(columns={"o_custkey": "user_id"}),
        left_on="ts",
        right_on="o_orderdate",
        by="user_id",
        direction="backward",
    ).sort_values("event_id")
    ref_key = ref["o_orderkey"].fillna(-1).astype(np.int64).values
    ref_price = ref["o_totalprice"].fillna(0.0).values
    assert (got["o_orderkey"].values == ref_key).all()
    assert np.allclose(got["o_totalprice"].values, ref_price)


def _docs():
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(300)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(8, 60)).tolist()) for _ in range(80)
    ]
    # planted near-dups: small token edits
    for i in range(0, 20, 2):
        toks = texts[i].split()
        toks[len(toks) // 2] = "EDITED"
        texts[i + 1] = " ".join(toks)
    # degenerate: short docs (< k tokens) and an exact duplicate
    texts += ["a b", "a b", "x", ""]
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})


@pytest.mark.parametrize("tau", [0.3, 0.6])
def test_jaccard_join_exact_vs_bruteforce(ray_session, tau):
    docs = _docs()
    got = jaccard_similarity_join(
        rd.from_pandas(docs), threshold=tau, n_buckets=8
    )
    want = []
    t = docs["text"].tolist()
    for i in range(len(t)):
        for j in range(i + 1, len(t)):
            jac = ngram_jaccard(t[i], t[j], 3)
            if jac >= tau:
                # half-away-from-zero, matching the engine + DuckDB ROUND
                want.append((i, j, np.floor(jac * 1e6 + 0.5) / 1e6))
    want_df = pd.DataFrame(want, columns=["a", "b", "jacc"]).sort_values(["a", "b"])
    assert len(got) == len(want_df), f"pairs {len(got)} vs brute {len(want_df)}"
    assert (got["a"].values == want_df["a"].values).all()
    assert (got["b"].values == want_df["b"].values).all()
    assert np.allclose(got["jacc"].values, want_df["jacc"].values)


def test_asof_join_preserves_int64_beyond_2_53(ray_session):
    """Regression: the padded union must not round-trip int64 ids through
    float64 — ids above 2^53 would silently lose low bits."""
    big = 9007199254740993  # 2^53 + 1, not representable in float64
    ev = pd.DataFrame(
        {
            "event_id": np.array([big, big + 2], dtype=np.int64),
            "user_id": np.array([1, 2], dtype=np.int64),
            "ts": np.array(["2024-01-02", "2024-01-02"], dtype="datetime64[us]"),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([big + 4], dtype=np.int64),
            "o_custkey": np.array([1], dtype=np.int64),
            "o_orderdate": np.array(["2024-01-01"], dtype="datetime64[us]"),
        }
    )
    got = (
        asof_join(
            rd.from_pandas(ev),
            rd.from_pandas(orders),
            left_on="ts",
            right_on="o_orderdate",
            left_by="user_id",
            right_by="o_custkey",
            left_cols=["event_id"],
            right_cols=["o_orderkey"],
            right_fill={"o_orderkey": -1},
            n_buckets=2,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == [big, big + 2]
    assert got["o_orderkey"].tolist() == [big + 4, -1]


def test_exact_quantiles_matches_numpy(ray_session):
    from pagerank_ray.stages.quantiles import exact_quantiles

    rng = np.random.default_rng(9)
    x = rng.integers(0, 10_000, 5000).astype(np.int64)
    qs = [0.0, 0.25, 0.5, 0.9, 1.0]
    got = exact_quantiles(
        rd.from_pandas(pd.DataFrame({"v": x})).repartition(7), "v", qs
    )
    want = [float(np.percentile(x, q * 100)) for q in qs]
    np.testing.assert_allclose(got["value"].values, want, rtol=1e-12)


def test_exact_quantiles_ignore_null_and_nan(ray_session):
    """DuckDB quantile_cont/quantile_disc ignore NULLs — null/NaN rows must
    not count toward n nor shift ranks (ADVICE r2)."""
    from pagerank_ray.stages.quantiles import exact_quantile_disc, exact_quantiles

    rng = np.random.default_rng(5)
    clean = rng.normal(size=800)
    dirty = np.concatenate([clean, np.full(137, np.nan)])
    vals = pd.array(list(dirty) + [None] * 60, dtype="Float64")
    ds = rd.from_pandas(pd.DataFrame({"v": vals})).repartition(5)
    qs = [0.25, 0.5, 0.95]
    got = exact_quantiles(ds, "v", qs)
    want = [float(np.percentile(clean, q * 100)) for q in qs]
    np.testing.assert_allclose(got["value"].values, want, rtol=1e-12)
    disc = exact_quantile_disc(ds, "v", 0.25)
    idx = max(int(np.ceil(0.25 * len(clean))) - 1, 0)
    assert disc == float(np.sort(clean)[idx])


def test_running_totals_matches_pandas(ray_session):
    """Bucketed running_totals == pandas groupby cumsum/cumcount on a table
    with duplicate order keys and multi-key skew."""
    from pagerank_ray.stages.temporal import running_totals

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 50, n),
            "o": rng.integers(0, 30, n),  # many ties → id tie-break matters
            "id": np.arange(n, dtype=np.int64),
            "v": np.round(rng.uniform(1, 1000, n), 2),
        }
    )
    got = (
        running_totals(
            rd.from_pandas(df).repartition(9),
            key_col="k", order_col="o", id_col="id", value_col="v",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "o", "id"]).copy()
    cents = np.round(ref["v"].to_numpy() * 100).astype(np.int64)
    ref["running_total"] = pd.Series(cents, index=ref.index).groupby(ref["k"]).cumsum() / 100.0
    ref["order_rank"] = ref.groupby("k").cumcount() + 1
    ref = ref.sort_values("id").reset_index(drop=True)
    np.testing.assert_array_equal(got["order_rank"].values, ref["order_rank"].values)
    np.testing.assert_array_equal(got["running_total"].values, ref["running_total"].values)
    np.testing.assert_array_equal(got["k"].values, ref["k"].values)


def test_hll_approx_distinct_error_bound(ray_session):
    """HLL estimate within 3σ (≈5%) of truth at several cardinalities, and
    the register→estimate function is deterministic/bit-stable."""
    from pagerank_ray.stages.sketch import approx_distinct, hll_estimate_from_registers

    rng = np.random.default_rng(3)
    for true_n in (100, 2_000, 50_000):
        vals = rng.integers(0, 2**62, true_n, dtype=np.int64)
        # duplicates must not change the estimate
        col = np.concatenate([vals, vals[: true_n // 2]])
        ds = rd.from_pandas(pd.DataFrame({"x": col})).repartition(8)
        est = approx_distinct(ds, "x", p=12)
        n_distinct = len(np.unique(vals))
        assert abs(est - n_distinct) / n_distinct < 0.05, (true_n, est, n_distinct)
    # determinism of the closed form
    regs = np.zeros(4096, dtype=np.int64)
    regs[:100] = 3
    assert hll_estimate_from_registers(regs, 12) == hll_estimate_from_registers(regs.copy(), 12)


def test_hll_grouped_matches_per_group_truth(ray_session):
    """Grouped HLL: each group's estimate within 5% of its true distinct
    count, and identical to running the ungrouped sketch on that group alone
    (register-merge associativity)."""
    from pagerank_ray.stages.sketch import approx_distinct, approx_distinct_grouped

    rng = np.random.default_rng(7)
    frames = []
    truth = {}
    for g, true_n in [("a", 500), ("b", 5000), ("c", 30_000)]:
        vals = rng.integers(0, 2**62, true_n, dtype=np.int64)
        truth[g] = len(np.unique(vals))
        frames.append(pd.DataFrame({"g": g, "x": np.concatenate([vals, vals[: true_n // 3]])}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=0)
    ds = rd.from_pandas(df).repartition(7)
    got = approx_distinct_grouped(ds, "x", "g", p=12).set_index("g")["estimate"]
    for g, tn in truth.items():
        assert abs(got[g] - tn) / tn < 0.05, (g, got[g], tn)
        solo = approx_distinct(
            rd.from_pandas(df[df["g"] == g][["x"]]).repartition(3), "x", p=12
        )
        assert got[g] == solo, (g, got[g], solo)


def test_moving_average_matches_pandas(ray_session):
    """Bucketed moving_average == pandas groupby rolling mean (cents) on a
    skewed multi-key table with order ties."""
    from pagerank_ray.stages.temporal import moving_average

    rng = np.random.default_rng(13)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "o": rng.integers(0, 25, n),
            "id": np.arange(n, dtype=np.int64),
            "v": np.round(rng.uniform(-50, 50, n), 2),
        }
    )
    got = (
        moving_average(
            rd.from_pandas(df).repartition(8),
            key_col="k", order_col="o", id_col="id", value_col="v", window=3,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["k", "o", "id"]).copy()
    cents = pd.Series(np.round(ref["v"].to_numpy() * 100).astype(np.int64), index=ref.index)
    g = cents.groupby(ref["k"])
    ref["moving_avg"] = g.rolling(3, min_periods=1).sum().droplevel(0) / (
        100.0 * g.rolling(3, min_periods=1).count().droplevel(0)
    )
    ref = ref.sort_values("id").reset_index(drop=True)
    np.testing.assert_allclose(got["moving_avg"].values, ref["moving_avg"].values, rtol=0, atol=0)


def test_histogram_quantiles_within_one_bin(ray_session):
    """Histogram-sketch quantiles land within one bin width of the exact
    value, and NULL/NaN rows are ignored like the exact operator."""
    from pagerank_ray.stages.quantiles import approx_quantiles_histogram

    rng = np.random.default_rng(17)
    x = rng.lognormal(3.0, 1.0, 20_000)
    dirty = np.concatenate([x, np.full(97, np.nan)])
    rng.shuffle(dirty)
    ds = rd.from_pandas(pd.DataFrame({"v": dirty})).repartition(9)
    qs = [0.1, 0.5, 0.9, 0.99]
    got = approx_quantiles_histogram(ds, "v", qs, n_bins=4096)
    width = (x.max() - x.min()) / 4096
    for q, est in zip(got["q"], got["estimate"]):
        exact = float(np.quantile(x, q))
        assert abs(est - exact) <= width + 1e-9, (q, est, exact, width)
