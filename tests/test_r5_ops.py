"""Late-round-5 operators: PII scrub, duplicated-span ratio, PMI, Adamic-Adar.

Each query test plants a tiny input parquet with a hand-checkable answer and
compares the distributed pipeline against a per-row Python reference.
"""

import math
import tempfile
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pagerank_ray.functions.pii import PII_CLASSES, redact_series, redact_text

# ---------------------------------------------------------------------------
# PII kernel
# ---------------------------------------------------------------------------

_PLANTED = [
    "contact john.doe@example.com or jane@sub.host.org today",
    "server at 10.0.0.1 and 192.168.100.200 responded",
    "account 1234567 card 9999999999 pin 12345",  # 12345 is < 6 digits
    "mix a1b2@x.io 8.8.8.8 123456 and words",
    "",
    None,
    "no pii here at all",
    "email-with-digits 123456789@mail.com then bare 654321",
]


def test_pii_vectorized_matches_reference():
    s = pd.Series(_PLANTED, dtype=object)
    red, counts = redact_series(s)
    for i, raw in enumerate(_PLANTED):
        want_text, want_counts = redact_text(raw or "")
        assert red.iloc[i] == want_text
        for cls, _, _ in PII_CLASSES:
            assert counts[f"n_{cls}"].iloc[i] == want_counts[f"n_{cls}"], (i, cls)


def test_pii_class_order():
    # digits inside an email/IP are consumed by the earlier class, never
    # double-counted by the digit-run class
    text = "999888777@mail.com via 255.254.253.252 ref 777777"
    red, counts = redact_text(text)
    assert red == "[EMAIL] via [IP] ref [ID]"
    assert (counts["n_email"], counts["n_ipv4"], counts["n_id"]) == (1, 1, 1)
    # five digits stay; six get redacted
    assert redact_text("12345 123456")[0] == "12345 [ID]"


@settings(max_examples=60, deadline=None)
@given(st.lists(st.text(max_size=60), max_size=8))
def test_pii_vectorized_matches_reference_hypothesis(texts):
    s = pd.Series(texts, dtype=object)
    red, counts = redact_series(s)
    for i, raw in enumerate(texts):
        want_text, want_counts = redact_text(raw)
        assert red.iloc[i] == want_text
        for cls, _, _ in PII_CLASSES:
            assert counts[f"n_{cls}"].iloc[i] == want_counts[f"n_{cls}"]


def test_q_pii_redact(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_pii_redact

    tbl = pa.table({
        "c_mktsegment": pa.array(["A", "A", "B", "B"]),
        "c_name": pa.array([
            "Customer#000000001",        # one 9-digit run
            "x@y.io and 10.1.2.3",       # email + ip, no long digits
            "plain name",
            None,
        ]),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "customer.parquet"))
    out = q_pii_redact(str(tmp_path))
    a = out[out["c_mktsegment"] == "A"].iloc[0]
    b = out[out["c_mktsegment"] == "B"].iloc[0]
    assert (a["n_rows"], a["n_email"], a["n_ipv4"], a["n_id"]) == (2, 1, 1, 1)
    assert a["min_red"] == "Customer#[ID]"
    assert (b["n_rows"], b["n_email"], b["n_ipv4"], b["n_id"]) == (2, 0, 0, 0)
    assert b["red_chars"] == len("plain name")  # NULL counts 0 chars
    assert b["min_red"] == ""


# ---------------------------------------------------------------------------
# duplicated k-gram span ratio
# ---------------------------------------------------------------------------

def test_q_dup_ngram_ratio(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_dup_ngram_ratio

    shared = "one two three four five"          # the planted duplicated 5-gram
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            shared + " tailA unique0",           # 3 grams, 1 duplicated
            "headB " + shared,                   # 2 grams, 1 duplicated
            "all brand new words here now",      # 2 grams, 0 duplicated
            "too short text",                    # < 5 tokens -> excluded
        ]),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_dup_ngram_ratio(str(tmp_path))
    got = out.set_index("doc_id")
    assert list(got.index) == [0, 1, 2]
    assert (got.loc[0, "n_grams"], got.loc[0, "n_dup"]) == (3, 1)
    assert (got.loc[1, "n_grams"], got.loc[1, "n_dup"]) == (2, 1)
    assert (got.loc[2, "n_grams"], got.loc[2, "n_dup"]) == (2, 0)
    assert got.loc[0, "dup_ratio"] == round(1 / 3, 6)


def test_q_dup_ngram_within_doc_repeat_not_dup(ray_session, tmp_path):
    """A 5-gram repeated WITHIN one doc only is not 'duplicated' (the metric
    counts cross-document sharing), but both occurrences count in n_grams."""
    from pagerank_ray.pipelines.tabular import q_dup_ngram_ratio

    docs = pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["a b c d e a b c d e"]),  # gram 'a b c d e' occurs twice
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_dup_ngram_ratio(str(tmp_path))
    assert out.loc[0, "n_grams"] == 6
    assert out.loc[0, "n_dup"] == 0


# ---------------------------------------------------------------------------
# PMI
# ---------------------------------------------------------------------------

def _pmi_reference(texts, window, min_cnt):
    uni, pairs, nw = {}, {}, 0
    for t in texts:
        w = (t or "").split()
        nw += len(w)
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for d in range(1, window + 1):
            for i in range(len(w) - d):
                key = tuple(sorted((w[i], w[i + d])))
                pairs[key] = pairs.get(key, 0) + 1
    np_tot = sum(pairs.values())
    rows = []
    for (a, b), c in pairs.items():
        if c < min_cnt:
            continue
        val = math.log(((float(c) * nw) * nw) / ((float(np_tot) * uni[a]) * uni[b]))
        rows.append((a, b, c, round(val, 6)))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows


def test_q_pmi_topk(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_pmi_topk

    rng = np.random.default_rng(11)
    vocab = ["ant", "bee", "cat", "dog", "elk", "fox"]
    texts = []
    for _ in range(40):
        words = [vocab[int(k)] for k in rng.integers(0, len(vocab), 25)]
        texts.append(" ".join(words))
    texts.append("ant bee " * 10)  # planted strong collocation
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_pmi_topk(str(tmp_path), window=2, min_cnt=3, k=10)
    want = _pmi_reference(texts, window=2, min_cnt=3)[:10]
    got = list(zip(out["a"], out["b"], out["n_pair"], out["pmi"]))
    assert [(a, b, c) for a, b, c, _ in got] == [(a, b, c) for a, b, c, _ in want]
    assert np.allclose([p for *_, p in got], [p for *_, p in want], atol=1e-9)


# ---------------------------------------------------------------------------
# Adamic-Adar
# ---------------------------------------------------------------------------

def _aa_reference(edge_list, k, max_degree):
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores, commons = {}, {}
    for v, nb in adj.items():
        if not (2 <= len(nb) <= max_degree):
            continue
        nb_sorted = sorted(nb)
        for i in range(len(nb_sorted)):
            for j in range(i + 1, len(nb_sorted)):
                p = (nb_sorted[i], nb_sorted[j])
                scores[p] = scores.get(p, 0.0) + 1.0 / math.log(len(nb))
                commons[p] = commons.get(p, 0) + 1
    rows = [
        (a, b, commons[(a, b)], round(s, 4))
        for (a, b), s in scores.items()
        if (a, b) not in und
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


def test_q_adamic_adar(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_adamic_adar

    # hand graph: star center 1 (neighbors 2,3,4), path 2-5, edge 3-4
    # (3,4) adjacent -> excluded; (2,3),(2,4) via center 1; (3,4) also via 1
    edges = [(1, 2), (1, 3), (1, 4), (2, 5), (3, 4), (1, 2)]  # dup edge kept
    tbl = pa.table({
        "l_orderkey": pa.array([e[0] for e in edges], pa.int64()),
        "l_partkey": pa.array([e[1] for e in edges], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_adamic_adar(str(tmp_path), k=10)
    want = _aa_reference(edges, k=10, max_degree=64)
    got = list(zip(out["a"], out["b"], out["n_common"], out["aa"]))
    assert got == want
    assert all((a, b) not in {(3, 4)} for a, b, *_ in got)  # adjacency anti-join


def test_q_adamic_adar_degree_cap(ray_session, tmp_path):
    """A center above max_degree contributes no wedges (hub guard)."""
    from pagerank_ray.pipelines.tabular import q_adamic_adar

    hub_edges = [(100, i) for i in range(1, 6)]        # hub deg 5
    extra = [(1, 200), (2, 200)]                        # center 200 deg 2
    edges = hub_edges + extra
    tbl = pa.table({
        "l_orderkey": pa.array([e[0] for e in edges], pa.int64()),
        "l_partkey": pa.array([e[1] for e in edges], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    capped = q_adamic_adar(str(tmp_path), k=50, max_degree=4)
    want = _aa_reference(edges, k=50, max_degree=4)
    got = list(zip(capped["a"], capped["b"], capped["n_common"], capped["aa"]))
    assert got == want
    # hub (deg 5 > 4) contributes nothing as a CENTER; the surviving pairs
    # come via centers 1 and 2 (each sees {100, 200}) and center 200 ({1, 2})
    assert got == [
        (100, 200, 2, round(2 / math.log(2), 4)),
        (1, 2, 1, round(1 / math.log(2), 4)),
    ]


# ---------------------------------------------------------------------------
# maximal independent set (Luby)
# ---------------------------------------------------------------------------

def _mis_checks(edge_list, mis):
    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    verts = {v for e in edge_list for v in e}
    m = set(mis)
    # independence: no two members adjacent
    assert not any((a, b) in und for a in m for b in m if a < b)
    # maximality: every non-member has a member neighbor
    nbrs = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for v in verts - m:
        assert nbrs.get(v, set()) & m, f"non-member {v} has no MIS neighbor"


def _mis_reference(edge_list):
    """Per-round Luby with fmix64-priority, straight from the paper rule."""
    from pagerank_ray.pipelines.mis import _prio_i64

    und = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    active = {v for e in edge_list for v in e}
    nbrs = {v: set() for v in active}
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    pr = {v: int(_prio_i64(np.array([v], np.int64))[0]) for v in active}
    mis = set()
    while active:
        win = {
            v for v in active
            if all(pr[v] < pr[u] for u in nbrs[v] if u in active)
        }
        mis |= win
        removed = set(win)
        for v in win:
            removed |= nbrs[v] & active
        active -= removed
    return mis


def test_mis_known_graph(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_mis

    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1), (3, 3), (10, 11), (12, 12)]
    tbl = pa.table({
        "l_orderkey": pa.array([e[0] for e in edges], pa.int64()),
        "l_partkey": pa.array([e[1] for e in edges], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_mis(str(tmp_path))
    got = list(out["id"])
    _mis_checks(edges, got)
    assert set(got) == _mis_reference(edges)
    assert 12 in got  # self-loop-only vertex is independent by construction


def test_mis_distributed_equals_tail(ray_session, tmp_path):
    """The distributed round path and the in-memory tail produce the
    identical member set (the rule is deterministic)."""
    import ray.data as rd

    from pagerank_ray.pipelines.mis import maximal_independent_set

    rng = np.random.default_rng(5)
    m = 400
    src = rng.integers(0, 120, m)
    dst = rng.integers(0, 120, m)
    edges_tbl = pa.table({"src_id": pa.array(src, pa.int64()),
                          "dst_id": pa.array(dst, pa.int64())})
    res_tail, r1 = maximal_independent_set(rd.from_arrow(edges_tbl),
                                           tail_cutoff=10**9)
    res_dist, r2 = maximal_independent_set(rd.from_arrow(edges_tbl),
                                           tail_cutoff=0)
    a = sorted(res_tail.to_pandas()["id"])
    b = sorted(res_dist.to_pandas()["id"])
    assert a == b
    edge_list = list(zip(src.tolist(), dst.tolist()))
    _mis_checks(edge_list, a)
    assert set(a) == _mis_reference(edge_list)


# ---------------------------------------------------------------------------
# Sequence packing (pack_chunks)
# ---------------------------------------------------------------------------


def test_q_pack_chunks_planted(ray_session, tmp_path):
    """Hand-checkable packing: source 'a' docs of 3+4+2=9 tokens, budget 4
    => chunks [0,4),[4,8),[8,12): doc0 spans [0,3) (inside), doc1 spans
    [3,7) (boundary), doc2 spans [7,9) (boundary). Source 'b': one empty doc
    and one 4-token doc aligned to [0,4) => no boundary docs, 1 chunk."""
    from pagerank_ray.pipelines.tabular import q_pack_chunks

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "source": pa.array(["a", "a", "a", "b", "b"]),
        "text": pa.array(["t1 t2 t3", "u1 u2 u3 u4", "v1 v2", "", "w x y z"]),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_pack_chunks(str(tmp_path), budget=4).set_index("source")
    assert (out.loc["a", "n_docs"], out.loc["a", "total_tokens"]) == (3, 9)
    assert out.loc["a", "n_chunks"] == 3
    assert out.loc["a", "n_boundary_docs"] == 2
    assert (out.loc["b", "n_docs"], out.loc["b", "total_tokens"]) == (2, 4)
    assert out.loc["b", "n_chunks"] == 1
    assert out.loc["b", "n_boundary_docs"] == 0


def test_q_pack_chunks_matches_reference(ray_session, tmp_path):
    """Randomized doc lengths vs a per-source Python reference packer."""
    from pagerank_ray.pipelines.tabular import q_pack_chunks

    rng = np.random.default_rng(11)
    n, budget = 300, 16
    sources = [f"s{rng.integers(0, 7)}" for _ in range(n)]
    lens = rng.integers(0, 40, n)
    texts = [" ".join(f"w{j}" for j in range(k)) for k in lens]
    docs = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array(sources),
        "text": pa.array(texts),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_pack_chunks(str(tmp_path), budget=budget).set_index("source")

    # reference: sequential pack per source in doc_id order
    ref = {}
    for s in sorted(set(sources)):
        idx = [i for i in range(n) if sources[i] == s]  # doc_id order
        off, nb, tot = 0, 0, 0
        for i in idx:
            k = int(lens[i])
            if k > 0 and off // budget != (off + k - 1) // budget:
                nb += 1
            off += k
            tot += k
        ref[s] = (len(idx), tot, -(-tot // budget) if tot else 0, nb)
    for s, (nd, tt, nc, nb) in ref.items():
        assert out.loc[s, "n_docs"] == nd
        assert out.loc[s, "total_tokens"] == tt
        assert out.loc[s, "n_chunks"] == nc
        assert out.loc[s, "n_boundary_docs"] == nb


# ---------------------------------------------------------------------------
# k-truss (edge peeling)
# ---------------------------------------------------------------------------


def _truss_reference(edge_list, k):
    """Brute-force peel: returns {(a,b): fixpoint support} of the k-truss."""
    from collections import defaultdict

    E = {(min(a, b), max(a, b)) for a, b in edge_list if a != b}
    while True:
        adj = defaultdict(set)
        for a, b in E:
            adj[a].add(b)
            adj[b].add(a)
        sup = {(a, b): len(adj[a] & adj[b]) for a, b in E}
        keep = {e for e in E if sup[e] >= k - 2}
        if keep == E:
            return sup
        E = keep


def test_ktruss_known_graph(ray_session, tmp_path):
    """K4 + a bridged triangle + a path: the 3-truss keeps K4 (support 2)
    and the triangle (support 1) but peels the bridge and the path; the
    4-truss keeps only K4."""
    import ray.data as rd

    from pagerank_ray.pipelines.ktruss import k_truss
    from pagerank_ray.pipelines.tabular import q_ktruss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tri = [(10, 11), (11, 12), (10, 12)]
    extra = [(4, 10), (20, 21), (21, 22), (2, 2)]  # bridge, path, self-loop
    edges = k4 + tri + extra
    tbl = pa.table({
        "l_orderkey": pa.array([e[0] for e in edges], pa.int64()),
        "l_partkey": pa.array([e[1] for e in edges], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_ktruss(str(tmp_path), k=3)
    got = {(a, b): s for a, b, s in out.itertuples(index=False)}
    assert got == _truss_reference(edges, 3)
    assert all(got[e] == 2 for e in k4) and all(got[e] == 1 for e in tri)
    assert (4, 10) not in got and (20, 21) not in got

    e_ds = rd.from_arrow(pa.table({
        "src_id": pa.array([e[0] for e in edges], pa.int64()),
        "dst_id": pa.array([e[1] for e in edges], pa.int64()),
    }))
    t4, _ = k_truss(e_ds, 4)
    df4 = t4.to_pandas()
    got4 = {(a, b): s for a, b, s in df4.itertuples(index=False)}
    assert got4 == {e: 2 for e in k4}


def test_ktruss_matches_reference_random(ray_session):
    """Random multigraph vs the brute-force peeler, k=3 and k=4 (k=4 peels
    in cascades here, exercising multi-round shrinkage)."""
    import ray.data as rd

    from pagerank_ray.pipelines.ktruss import k_truss

    rng = np.random.default_rng(7)
    m = 600
    src = rng.integers(0, 70, m)
    dst = rng.integers(0, 70, m)
    e_ds = rd.from_arrow(pa.table({"src_id": pa.array(src, pa.int64()),
                                   "dst_id": pa.array(dst, pa.int64())}))
    edge_list = list(zip(src.tolist(), dst.tolist()))
    for k in (3, 4, 5):
        ref = _truss_reference(edge_list, k)
        # in-memory tail path (default cutoff swallows this size)
        truss, rounds = k_truss(e_ds, k)
        got = {(a, b): s for a, b, s in truss.to_pandas().itertuples(index=False)}
        assert got == ref, f"tail k={k}"
        assert rounds >= 1
        # forced distributed rounds (k=5 cascades one edge per round here)
        truss_d, _ = k_truss(e_ds, k, tail_cutoff=0, max_rounds=80)
        got_d = {(a, b): s for a, b, s in truss_d.to_pandas().itertuples(index=False)}
        assert got_d == ref, f"distributed k={k}"


def test_ktruss_empty_and_trivial(ray_session):
    import ray.data as rd

    from pagerank_ray.pipelines.ktruss import k_truss

    # self-loops only -> no simple edges -> empty truss
    e_ds = rd.from_arrow(pa.table({"src_id": pa.array([1, 2], pa.int64()),
                                   "dst_id": pa.array([1, 2], pa.int64())}))
    truss, _ = k_truss(e_ds, 3)
    assert truss.count() == 0
    # k=2 keeps every simple edge (support >= 0), including triangle-free ones
    e2 = rd.from_arrow(pa.table({"src_id": pa.array([1, 5], pa.int64()),
                                 "dst_id": pa.array([2, 6], pa.int64())}))
    t2, _ = k_truss(e2, 2)
    df = t2.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert list(map(tuple, df.to_numpy())) == [(1, 2, 0), (5, 6, 0)]


# ---------------------------------------------------------------------------
# Event funnel
# ---------------------------------------------------------------------------


def _funnel_reference(rows, steps):
    """rows: (user, type, ts_us). Chained strictly-after first-occurrence."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for u, ty, t in rows:
        by_user[u].append((t, ty))
    out = []
    frontier = {}
    for i, s in enumerate(steps):
        nxt = {}
        for u, evs in by_user.items():
            if i > 0 and u not in frontier:
                continue
            lo = frontier[u] if i > 0 else None
            cand = [t for t, ty in evs if ty == s and (lo is None or t > lo)]
            if cand:
                nxt[u] = min(cand)
        lag = 0 if i == 0 else sum(nxt[u] - frontier[u] for u in nxt)
        out.append((i + 1, s, len(nxt), lag))
        frontier = nxt
    return out


def _write_events(tmp_path, users, types, ts_us):
    n = len(users)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(np.array(ts_us, np.int64), pa.timestamp("us")),
        "user_id": pa.array(np.array(users, np.int64), pa.int64()),
        "event_type": pa.array(types),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))


def test_event_funnel_planted(ray_session, tmp_path):
    """u1 full-converts; u2 clicks BEFORE viewing (click must not count);
    u3 views only; u4 purchases with no view (never enters)."""
    from pagerank_ray.pipelines.tabular import q_event_funnel

    rows = [
        (1, "view", 100), (1, "click", 200), (1, "purchase", 350),
        (2, "click", 50), (2, "view", 60), (2, "click", 90),
        (3, "view", 10),
        (4, "purchase", 10),
    ]
    _write_events(tmp_path, [r[0] for r in rows], [r[1] for r in rows],
                  [r[2] for r in rows])
    out = q_event_funnel(str(tmp_path))
    got = list(map(tuple, out.to_numpy()))
    assert got == [
        (1, "view", 3, 0),          # u1, u2, u3
        (2, "click", 2, 100 + 30),  # u1 (200-100), u2 (90-60)
        (3, "purchase", 1, 150),    # u1 only
    ]


def test_event_funnel_matches_reference(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_event_funnel

    rng = np.random.default_rng(23)
    n = 2000
    users = rng.integers(0, 150, n)
    types = rng.choice(["view", "click", "purchase", "error", "signup"], n)
    ts_us = rng.choice(np.arange(10**6, 10**9, 997), n, replace=False)
    _write_events(tmp_path, users, list(types), ts_us)
    out = q_event_funnel(str(tmp_path))
    ref = _funnel_reference(
        list(zip(users.tolist(), types.tolist(), ts_us.tolist())),
        ["view", "click", "purchase"],
    )
    assert list(map(tuple, out.to_numpy())) == ref


# ---------------------------------------------------------------------------
# Fuzzy blocked join (edit distance)
# ---------------------------------------------------------------------------


def _lev_ref(s1, s2):
    m, n = len(s1), len(s2)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (s1[i - 1] != s2[j - 1]))
        prev = cur
    return prev[n]


def test_levenshtein_pairs_matches_reference():
    from pagerank_ray.functions.editdist import levenshtein_pairs

    rng = np.random.default_rng(19)
    alpha = list("abc x")
    names = [""] + [
        "".join(rng.choice(alpha, rng.integers(0, 12))) for _ in range(60)
    ]
    i_idx, j_idx = np.triu_indices(len(names), k=1)
    got = levenshtein_pairs(names, i_idx, j_idx)
    want = np.array([_lev_ref(names[i], names[j])
                     for i, j in zip(i_idx, j_idx)], np.int64)
    assert (got == want).all()


def _fuzzy_ref(names, d_max):
    """Per row: (n_exact, n_near, min_other_dist) with first-token blocking."""
    from collections import Counter, defaultdict

    cnt = Counter(names)
    blocks = defaultdict(set)
    for nm in cnt:
        blocks[nm.split(" ", 1)[0]].add(nm)
    out = []
    for nm in names:
        blk = blocks[nm.split(" ", 1)[0]]
        others = [o for o in blk if o != nm]
        dists = [_lev_ref(nm, o) for o in others]
        n_near = sum(cnt[o] for o, d in zip(others, dists) if d <= d_max)
        min_o = min(dists) if dists else -1
        out.append((cnt[nm] - 1, n_near, min_o))
    return out


def test_q_fuzzy_join_parts_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_fuzzy_join_parts

    names = [
        "red widget", "red widgets", "red widget",  # dup + near (d=1)
        "red wolverine",                            # same block, far (d=8)
        "blue bolt",                                # alone in its block
        "", " leading space",                       # '' block and '' token block
    ]
    tbl = pa.table({
        "p_partkey": pa.array(np.arange(len(names)), pa.int64()),
        "p_name": pa.array(names),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "part.parquet"))
    out = q_fuzzy_join_parts(str(tmp_path), d_max=4)
    got = list(map(tuple, out[["n_exact", "n_near", "min_other_dist"]].to_numpy()))
    assert got == _fuzzy_ref(names, 4)
    assert got[0] == (1, 1, 1)   # one exact dup, 'red widgets' at d=1
    assert got[3] == (0, 0, 7)   # wolverine: nearest 'red widget(s)' beyond 4
    assert got[4] == (0, 0, -1)  # blue bolt: no other name in its block


def test_q_fuzzy_join_parts_random(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_fuzzy_join_parts

    rng = np.random.default_rng(31)
    first = ["red", "blue", "hot"]
    second = ["bolt", "bolts", "gear", "gizmo", "widget", "widgett"]
    names = [
        f"{rng.choice(first)} {rng.choice(second)}" for _ in range(300)
    ]
    tbl = pa.table({
        "p_partkey": pa.array(np.arange(len(names)), pa.int64()),
        "p_name": pa.array(names),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "part.parquet"))
    out = q_fuzzy_join_parts(str(tmp_path), d_max=2)
    got = list(map(tuple, out[["n_exact", "n_near", "min_other_dist"]].to_numpy()))
    assert got == _fuzzy_ref(names, 2)


# ---------------------------------------------------------------------------
# Coreness (full k-core decomposition)
# ---------------------------------------------------------------------------


def _coreness_reference(edge_list):
    """Level-peel reference: {vertex: coreness} over the simple graph."""
    from collections import defaultdict

    E = {(min(a, b), max(a, b)) for a, b in edge_list if a != b}
    verts = {v for e in E for v in e}
    labels = {}
    k = 1
    while verts:
        while True:
            deg = defaultdict(int)
            for a, b in E:
                deg[a] += 1
                deg[b] += 1
            drop = {v for v in verts if deg[v] < k}
            if not drop:
                break
            for v in drop:
                labels[v] = k - 1
            verts -= drop
            E = {(a, b) for a, b in E if a not in drop and b not in drop}
        k += 1
    return labels


def test_q_coreness_known_graph(ray_session, tmp_path):
    """K4 (coreness 3) bridged to a triangle (coreness 2) with a pendant
    path (coreness 1); self-loops ignored."""
    from pagerank_ray.pipelines.tabular import q_coreness

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tri = [(10, 11), (11, 12), (10, 12)]
    extra = [(4, 10), (12, 20), (20, 21), (7, 7)]
    edges = k4 + tri + extra
    tbl = pa.table({
        "l_orderkey": pa.array([e[0] for e in edges], pa.int64()),
        "l_partkey": pa.array([e[1] for e in edges], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_coreness(str(tmp_path))
    got = dict(zip(out["id"], out["coreness"]))
    assert got == _coreness_reference(edges)
    assert got[1] == 3 and got[10] == 2 and got[21] == 1
    assert 7 not in got  # self-loop-only vertex has no simple edge


def test_coreness_matches_reference_random(ray_session):
    import ray.data as rd

    from pagerank_ray.pipelines.coreness import coreness
    from pagerank_ray.stages.csr import symmetrize

    rng = np.random.default_rng(13)
    m = 800
    src = rng.integers(0, 90, m)
    dst = rng.integers(0, 90, m)
    keep = src != dst
    e_ds = rd.from_arrow(pa.table({"src_id": pa.array(src[keep], pa.int64()),
                                   "dst_id": pa.array(dst[keep], pa.int64())}))
    ref = _coreness_reference(list(zip(src[keep].tolist(), dst[keep].tolist())))
    # tail path
    labels_t, rl_t = coreness(symmetrize(e_ds))
    got_t = dict(zip(*[labels_t.to_pandas()[c] for c in ("id", "coreness")]))
    assert got_t == ref
    # forced distributed path
    labels_d, rl_d = coreness(symmetrize(e_ds), tail_cutoff=0)
    got_d = dict(zip(*[labels_d.to_pandas()[c] for c in ("id", "coreness")]))
    assert got_d == ref
    assert rl_t == rl_d  # same level/round structure on both paths


# ---------------------------------------------------------------------------
# Co-purchase projection + revenue rollup
# ---------------------------------------------------------------------------


def test_q_copurchase_topk(ray_session, tmp_path):
    from collections import Counter

    from pagerank_ray.pipelines.tabular import q_copurchase_topk

    rng = np.random.default_rng(17)
    rows = []
    for o in range(120):
        parts = rng.choice(40, size=rng.integers(1, 6), replace=False)
        for p in parts:
            rows.append((o, int(p)))
            if rng.random() < 0.3:
                rows.append((o, int(p)))  # duplicate lineitem rows collapse
    tbl = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_copurchase_topk(str(tmp_path), k=15)

    ref = Counter()
    by_o = {}
    for o, p in set(rows):
        by_o.setdefault(o, set()).add(p)
    for o, ps in by_o.items():
        ps = sorted(ps)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                ref[(ps[i], ps[j])] += 1
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    got = [((a, b), n) for a, b, n in out.itertuples(index=False)]
    assert got == want


def test_q_revenue_rollup(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_revenue_rollup

    tbl = pa.table({
        "l_returnflag": pa.array(["A", "A", "A", "N"]),
        "l_linestatus": pa.array(["O", "O", "F", "F"]),
        "l_extendedprice": pa.array([100.0, 200.0, 50.0, 10.0]),
        "l_discount": pa.array([0.1, 0.0, 0.5, 0.0]),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_revenue_rollup(str(tmp_path)).set_index(["l_returnflag", "l_linestatus"])
    assert out.loc[("A", "O"), "revenue"] == 290.0   # 90 + 200
    assert out.loc[("A", "F"), "revenue"] == 25.0
    assert out.loc[("A", "ALL"), "revenue"] == 315.0
    assert out.loc[("N", "F"), "revenue"] == 10.0
    assert out.loc[("ALL", "ALL"), "revenue"] == 325.0
    assert out.loc[("ALL", "ALL"), "n_rows"] == 4
    assert len(out) == 6  # 3 leaf + 2 flag subtotals + 1 grand total


# ---------------------------------------------------------------------------
# review-pass regressions
# ---------------------------------------------------------------------------


def test_levenshtein_pairs_byte_semantics():
    """DuckDB's levenshtein is byte-based: 'café' vs 'cafe' is distance 2
    ('é' is two UTF-8 bytes). The kernel must agree on non-ASCII input."""
    import duckdb

    from pagerank_ray.functions.editdist import levenshtein_pairs

    names = ["café", "cafe", "naïve", "naive", "øx", "x"]
    i_idx, j_idx = np.triu_indices(len(names), k=1)
    got = levenshtein_pairs(names, i_idx, j_idx)
    con = duckdb.connect()
    df = pd.DataFrame({"a": [names[i] for i in i_idx],
                       "b": [names[j] for j in j_idx]})
    want = con.sql("SELECT levenshtein(a, b) FROM df").df().iloc[:, 0].to_numpy()
    assert (got == want).all()
    assert got[0] == 2  # café vs cafe


def test_event_funnel_no_funnel_events(ray_session, tmp_path):
    """Only non-funnel event types: one zero row per step, like the oracle."""
    from pagerank_ray.pipelines.tabular import q_event_funnel

    _write_events(tmp_path, [1, 2], ["error", "signup"], [10, 20])
    out = q_event_funnel(str(tmp_path))
    assert list(map(tuple, out.to_numpy())) == [
        (1, "view", 0, 0), (2, "click", 0, 0), (3, "purchase", 0, 0),
    ]


def test_revenue_rollup_empty(ray_session, tmp_path):
    """ROLLUP over zero rows still yields the grand-total row."""
    from pagerank_ray.pipelines.tabular import q_revenue_rollup

    tbl = pa.table({
        "l_returnflag": pa.array([], pa.string()),
        "l_linestatus": pa.array([], pa.string()),
        "l_extendedprice": pa.array([], pa.float64()),
        "l_discount": pa.array([], pa.float64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_revenue_rollup(str(tmp_path))
    assert list(map(tuple, out.to_numpy())) == [("ALL", "ALL", 0.0, 0)]


# ---------------------------------------------------------------------------
# Range join (orders x events window)
# ---------------------------------------------------------------------------


def test_q_orders_events_range_planted(ray_session, tmp_path):
    """Window [t, t+7d): events at the start instant count, at the end
    instant don't; other users' events never leak in."""
    from pagerank_ray.pipelines.tabular import q_orders_events_range

    day = 86_400_000_000
    # orders: (okey, cust, t)
    orders = [(100, 1, 10 * day), (101, 1, 30 * day), (102, 2, 10 * day),
              (103, 3, 0)]
    ev = [
        (1, 10 * day, 1.50),        # == start of order 100 -> counts
        (1, 16 * day, 2.25),        # inside 100's window
        (1, 17 * day, 4.00),        # == end (10+7=17d) -> excluded
        (1, 31 * day, 8.00),        # inside 101's window
        (2, 10 * day + 1, 16.00),   # user 2, inside 102's window
        (2, 40 * day, 32.00),       # outside all windows
    ]
    otbl = pa.table({
        "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
        "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(orders)),
        "o_totalprice": pa.array([0.0] * len(orders)),
        "o_orderdate": pa.array(
            np.array([o[2] for o in orders], np.int64), pa.timestamp("us")
        ),
        "o_orderpriority": pa.array(["1-URGENT"] * len(orders)),
    })
    pq.write_table(otbl, os.path.join(str(tmp_path), "orders.parquet"))
    _write_events(tmp_path, [e[0] for e in ev], ["view"] * len(ev),
                  [e[1] for e in ev])
    # overwrite value column (the helper writes zeros)
    t = pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    t = t.set_column(t.schema.get_field_index("value"), "value",
                     pa.array([e[2] for e in ev]))
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))

    out = q_orders_events_range(str(tmp_path)).set_index("o_orderkey")
    assert (out.loc[100, "n_events"], out.loc[100, "sum_value"]) == (2, 3.75)
    assert (out.loc[101, "n_events"], out.loc[101, "sum_value"]) == (1, 8.00)
    assert (out.loc[102, "n_events"], out.loc[102, "sum_value"]) == (1, 16.00)
    assert (out.loc[103, "n_events"], out.loc[103, "sum_value"]) == (0, 0.0)


def test_q_orders_events_range_random(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_orders_events_range

    rng = np.random.default_rng(41)
    day = 86_400_000_000
    n_o, n_e = 80, 600
    ocust = rng.integers(0, 25, n_o)
    ot = rng.integers(0, 60 * day, n_o)
    eu = rng.integers(0, 25, n_e)
    et = rng.integers(0, 60 * day, n_e)
    vals = np.round(rng.uniform(0, 50, n_e), 2)
    otbl = pa.table({
        "o_orderkey": pa.array(np.arange(n_o), pa.int64()),
        "o_custkey": pa.array(ocust, pa.int64()),
        "o_orderstatus": pa.array(["O"] * n_o),
        "o_totalprice": pa.array(np.zeros(n_o)),
        "o_orderdate": pa.array(ot, pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * n_o),
    })
    pq.write_table(otbl, os.path.join(str(tmp_path), "orders.parquet"))
    _write_events(tmp_path, eu, ["view"] * n_e, et)
    t = pq.read_table(os.path.join(str(tmp_path), "events.parquet"))
    t = t.set_column(t.schema.get_field_index("value"), "value", pa.array(vals))
    pq.write_table(t, os.path.join(str(tmp_path), "events.parquet"))

    out = q_orders_events_range(str(tmp_path)).set_index("o_orderkey")
    win = 7 * day
    cents = np.round(vals * 100).astype(np.int64)
    for i in range(n_o):
        m = (eu == ocust[i]) & (et >= ot[i]) & (et < ot[i] + win)
        assert out.loc[i, "n_events"] == int(m.sum())
        assert out.loc[i, "sum_value"] == round(int(cents[m].sum()) / 100.0, 2)


# ---------------------------------------------------------------------------
# Key-skew profile
# ---------------------------------------------------------------------------


def test_q_key_skew(ray_session, tmp_path):
    from collections import Counter

    from pagerank_ray.pipelines.tabular import q_key_skew

    rng = np.random.default_rng(47)
    keys = np.concatenate([
        np.full(50, 7), np.full(30, 3), rng.integers(100, 140, 120)
    ]).astype(np.int64)
    tbl = pa.table({"l_partkey": pa.array(keys, pa.int64())})
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_key_skew(str(tmp_path), topn=3).set_index("stat")
    cnt = Counter(keys.tolist())
    top3 = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    got_top = out.loc["top_key"].sort_values("value", ascending=True)
    assert sorted(zip(got_top["key"], got_top["value"]),
                  key=lambda kv: (-kv[1], kv[0])) == top3
    assert out.loc["n_keys", "value"] == len(cnt)
    assert out.loc["n_rows", "value"] == len(keys)
    assert out.loc["max_group", "value"] == 50
    counts_sorted = sorted(cnt.values())
    import math
    assert out.loc["p50_group", "value"] == counts_sorted[
        max(math.ceil(0.5 * len(counts_sorted)) - 1, 0)
    ]
    assert out.loc["topn_share_bp", "value"] == sum(
        v for _, v in top3
    ) * 10000 // len(keys)


# ---------------------------------------------------------------------------
# Cohort retention
# ---------------------------------------------------------------------------


def test_q_cohort_retention(ray_session, tmp_path):
    from collections import defaultdict

    from pagerank_ray.pipelines.tabular import q_cohort_retention

    week = 7 * 86_400_000_000
    rng = np.random.default_rng(53)
    n = 900
    users = rng.integers(0, 60, n)
    ts = rng.integers(0, 12 * week, n)
    _write_events(tmp_path, users, ["view"] * n, ts)
    out = q_cohort_retention(str(tmp_path))

    weeks = ts // week
    first = {}
    for u, w in zip(users.tolist(), weeks.tolist()):
        first[u] = min(first.get(u, w), w)
    cells = defaultdict(set)
    for u, w in zip(users.tolist(), weeks.tolist()):
        cells[(first[u], w - first[u])].add(u)
    want = sorted((c, o, len(s)) for (c, o), s in cells.items())
    assert list(map(tuple, out.to_numpy())) == want
    assert (out[out["week_offset"] == 0]["n_users"].sum()) == len(first)


# ---------------------------------------------------------------------------
# 2-hop reach
# ---------------------------------------------------------------------------


def test_q_two_hop_reach(ray_session, tmp_path):
    from collections import defaultdict

    from pagerank_ray.pipelines.tabular import q_two_hop_reach

    rng = np.random.default_rng(59)
    m = 300
    src = rng.integers(0, 40, m)
    dst = rng.integers(0, 40, m)
    tbl = pa.table({
        "l_orderkey": pa.array(src, pa.int64()),
        "l_partkey": pa.array(dst, pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))

    cap = 5  # low cap so the hub guard is actually exercised
    out = q_two_hop_reach(str(tmp_path), max_degree=cap).set_index("id")

    adj = defaultdict(set)
    for a, b in zip(src.tolist(), dst.tolist()):
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    for v in adj:
        reach = set(adj[v])
        for c in adj[v]:
            if len(adj[c]) <= cap:
                reach |= adj[c] - {v}
        # wedges through v itself also connect v's neighbors, not v; but v
        # gains pairs via ANY qualifying center adjacent to it (handled
        # above) — self never counts
        assert out.loc[v, "reach2"] == len(reach), v


# ---------------------------------------------------------------------------
# CSV / JSONL source round-trips
# ---------------------------------------------------------------------------


def test_source_roundtrips(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_csv_source, q_jsonl_source

    users = [1, 1, 2, 3, 3, 3]
    types = ["view", "click", "view", "view", "view", "error"]
    _write_events(tmp_path, users, types, list(range(10, 70, 10)))
    want = [
        ("click", 1, 1, 1, 1),
        ("error", 1, 1, 5, 5),
        ("view", 4, 3, 0, 4),
    ]
    for fn in (q_csv_source, q_jsonl_source):
        out = fn(str(tmp_path))
        assert list(map(tuple, out.to_numpy())) == want, fn.__name__


# ---------------------------------------------------------------------------
# Perplexity filter (bigram LM)
# ---------------------------------------------------------------------------


def test_q_perplexity_filter(ray_session, tmp_path):
    import math
    from collections import Counter

    from pagerank_ray.pipelines.tabular import q_perplexity_filter

    texts = [
        "the cat sat on the mat",
        "the cat sat",
        "the the the the",       # repeated bigram -> low nll
        "zebra quark nebula",    # all-unique bigrams -> high nll
        "solo",                  # 1 token -> excluded
        "",                      # empty -> excluded
    ]
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_perplexity_filter(str(tmp_path)).set_index("doc_id")

    toks = [t.split() for t in texts]
    uni = Counter(w for ws in toks for w in ws)
    big = Counter((ws[i], ws[i + 1]) for ws in toks for i in range(len(ws) - 1))
    V = len(uni)
    for d, ws in enumerate(toks):
        pairs = [(ws[i], ws[i + 1]) for i in range(len(ws) - 1)]
        if not pairs:
            assert d not in out.index
            continue
        nll = sum(-math.log((big[p] + 1) / (uni[p[0]] + V)) for p in pairs) / len(pairs)
        assert out.loc[d, "n_pairs"] == len(pairs)
        assert abs(out.loc[d, "nll"] - nll) < 1e-6
    assert out.loc[2, "nll"] < out.loc[3, "nll"]  # repetition scores lower


def test_q_partitioned_sink(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_partitioned_sink

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a", "b", "c", "d", "e"]),
        "lang": pa.array(["en"] * 5),
        "source": pa.array(["s1", "s0", "s1", "s0", "s1"]),
        "n_chars": pa.array([10, 20, 30, 40, 50], pa.int64()),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_partitioned_sink(str(tmp_path)).set_index("source")
    assert (out.loc["s0", "n_docs"], out.loc["s0", "sum_chars"]) == (2, 60)
    assert (out.loc["s0", "min_id"], out.loc["s0", "max_id"]) == (1, 3)
    assert (out.loc["s1", "n_docs"], out.loc["s1", "sum_chars"]) == (3, 90)
    # the partitioned directory landed with one subdir per source
    import glob
    work = glob.glob(os.path.join(tempfile.gettempdir(), "pagerank_ray_work",
                                  "*_docs_bysource"))
    assert any(os.path.isdir(os.path.join(w, "source=s0")) for w in work)


def test_q_dedup_cluster_sizes(ray_session, tmp_path):
    """Planted near-dup clusters: histogram sums to the doc count and the
    planted 3-dup group appears as a cluster of size >= 3."""
    from pagerank_ray.pipelines.tabular import q_dedup_cluster_sizes

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    texts = [base, base + "tail", base + "tail2"]  # near-dup triple
    texts += [f"unique doc {i} " + " ".join(f"w{i}_{j}" for j in range(30))
              for i in range(5)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_dedup_cluster_sizes(str(tmp_path))
    hist = dict(zip(out["cluster_size"], out["n_clusters"]))
    assert sum(k * v for k, v in hist.items()) == len(texts)
    assert max(hist) >= 3          # the planted triple clustered
    assert hist.get(1, 0) >= 5     # the unique docs stayed singletons


def test_q_perplexity_hash_path_matches_broadcast(ray_session, tmp_path):
    """The scale path (count tables as Datasets, hash-join attaches,
    doc-bucketed combine) produces the same rounded scores as the
    broadcast path."""
    from pagerank_ray.pipelines.tabular import q_perplexity_filter

    rng = np.random.default_rng(61)
    vocab = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, rng.integers(0, 15))) for _ in range(60)]
    docs = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), pa.int64()),
        "text": pa.array(texts),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    a = q_perplexity_filter(str(tmp_path))
    b = q_perplexity_filter(str(tmp_path), force_hash_path=True)
    pd.testing.assert_frame_equal(a[["doc_id", "n_pairs"]], b[["doc_id", "n_pairs"]])
    assert np.allclose(a["nll"], b["nll"], atol=2e-6)


# ---------------------------------------------------------------------------
# reciprocity + host-level (coarsened) PageRank
# ---------------------------------------------------------------------------


def _write_lineitem_edges(tmp_path, src, dst):
    tbl = pa.table({
        "l_orderkey": pa.array(src, pa.int64()),
        "l_partkey": pa.array(dst, pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))


def test_q_reciprocity_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_reciprocity

    # 3 reciprocal pairs, one one-way edge, one self-loop, one duplicate row
    src = [1, 2, 3, 4, 5, 6, 7, 9, 1]
    dst = [2, 1, 4, 3, 6, 5, 8, 9, 2]
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_reciprocity(str(tmp_path))
    row = out.iloc[0]
    assert row["n_edges"] == 7          # 6 reciprocal + (7,8); loop excluded
    assert row["n_self_loops"] == 1
    assert row["n_reciprocal"] == 6
    assert row["reciprocity"] == round(6 / 7, 6)


def test_q_reciprocity_random_matches_reference(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_reciprocity

    rng = np.random.default_rng(61)
    src = rng.integers(0, 30, 400)
    dst = rng.integers(0, 30, 400)
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_reciprocity(str(tmp_path)).iloc[0]

    edges = set(zip(src.tolist(), dst.tolist()))
    nonloop = {(s, d) for s, d in edges if s != d}
    recip = sum(1 for s, d in nonloop if (d, s) in nonloop)
    assert out["n_edges"] == len(nonloop)
    assert out["n_self_loops"] == len(edges) - len(nonloop)
    assert out["n_reciprocal"] == recip
    assert out["reciprocity"] == round(recip / len(nonloop), 6)


def test_q_host_pagerank_matches_numpy(ray_session, tmp_path):
    from collections import defaultdict

    from pagerank_ray.pipelines.tabular import q_host_pagerank

    rng = np.random.default_rng(62)
    src = rng.integers(0, 200, 600)
    dst = rng.integers(0, 200, 600)
    _write_lineitem_edges(tmp_path, src, dst)
    hmod, iters, alpha = 7, 20, 0.85
    out = q_host_pagerank(str(tmp_path), n_workers=2, iters=iters, hmod=hmod)

    # reference: contract dedup'd edges mod hmod, integer count weights,
    # row-normalize, 20 iterations of the engine recurrence (r0 = 1,
    # dangling mass redistributed uniformly)
    w = defaultdict(float)
    for s, d in set(zip(src.tolist(), dst.tolist())):
        w[(s % hmod, d % hmod)] += 1.0
    hosts = sorted({h for e in w for h in e})
    idx = {h: i for i, h in enumerate(hosts)}
    n = len(hosts)
    mat = np.zeros((n, n))
    for (s, d), q in w.items():
        mat[idx[s], idx[d]] = q
    tot = mat.sum(axis=1)
    dangling = tot == 0
    norm = np.divide(mat.T, tot, out=np.zeros_like(mat.T), where=tot > 0).T
    r = np.ones(n)
    for _ in range(iters):
        dm = r[dangling].sum()
        r = (1 - alpha) + alpha * dm / n + alpha * (norm.T @ r)
    want = {h: r[idx[h]] for h in hosts}
    got = dict(zip(out["host"].tolist(), out["rank"].tolist()))
    assert set(got) == set(want)
    for h in hosts:
        assert abs(got[h] - want[h]) < 1e-6, h


# ---------------------------------------------------------------------------
# spam mass + per-source corpus health report
# ---------------------------------------------------------------------------


def test_q_spam_mass_matches_numpy(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_spam_mass

    # ids < 2*97 so seeds = {0, 97}; a cluster reachable only from non-seeds
    # carries high spam mass
    rng = np.random.default_rng(63)
    src = rng.integers(0, 150, 500).tolist() + [0, 97, 5]
    dst = rng.integers(0, 150, 500).tolist() + [3, 4, 149]
    _write_lineitem_edges(tmp_path, src, dst)
    iters, alpha, mod = 20, 0.85, 97
    out = q_spam_mass(str(tmp_path), n_workers=2, iters=iters, mod=mod)

    edges = sorted(set(zip(src, dst)))
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    mat = np.zeros((n, n))
    for s, d in edges:
        mat[idx[s], idx[d]] = 1.0
    outdeg = mat.sum(axis=1)
    dang = outdeg == 0
    norm = np.divide(mat.T, outdeg, out=np.zeros_like(mat.T), where=outdeg > 0).T

    def run(p):
        r = n * p
        for _ in range(iters):
            dm = r[dang].sum()
            r = (alpha * dm / n + 1 - alpha) * n * p + alpha * (norm.T @ r)
        return r

    p_uni = np.full(n, 1.0 / n)
    seeds = np.array([v % mod == 0 for v in ids])
    p_per = np.where(seeds, 1.0 / seeds.sum(), 0.0)
    pr, ppr = run(p_uni), run(p_per)
    got = out.set_index("id")
    for v in ids:
        assert abs(got.loc[v, "pr"] - pr[idx[v]]) < 1e-5, v
        assert abs(got.loc[v, "ppr"] - ppr[idx[v]]) < 1e-5, v
        want_m = (round(pr[idx[v]], 6) - round(ppr[idx[v]], 6)) / round(pr[idx[v]], 6)
        assert abs(got.loc[v, "spam_mass"] - want_m) < 1e-5, v
    # spam-mass separation sanity: seeds themselves carry low/negative mass
    assert got.loc[0, "spam_mass"] < got["spam_mass"].max()


def test_q_source_quality_report_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_source_quality_report

    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array(["same text", "same text", "other", "a", "b", "a"]),
        "lang": pa.array(["en", "de", "en", "en", "en", "fr"]),
        "source": pa.array(["s1", "s1", "s1", "s2", "s2", "s2"]),
        "n_chars": pa.array([9, 9, 5, 1, 1, 1], pa.int64()),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_source_quality_report(str(tmp_path)).set_index("source")
    assert out.loc["s1", "n_docs"] == 3
    assert out.loc["s1", "n_distinct_texts"] == 2
    assert out.loc["s1", "dup_frac"] == round(1 / 3, 6)
    assert out.loc["s1", "avg_chars"] == round(23 / 3, 6)
    assert out.loc["s1", "n_langs"] == 2
    assert out.loc["s2", "n_docs"] == 3
    assert out.loc["s2", "n_distinct_texts"] == 2
    assert out.loc["s2", "n_langs"] == 2


def test_q_ann_recall_matches_numpy(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_ann_recall

    rng = np.random.default_rng(64)
    n, dim = 300, 8
    vecs = rng.normal(size=(n, dim))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([v.astype(np.float32).tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "embeddings.parquet"))
    nlist, nprobe, k = 8, 3, 10
    out = q_ann_recall(str(tmp_path), nlist=nlist, nprobe=nprobe, k=k)

    # reference: same fixed-centroid IVF in pure numpy (float32 storage
    # round-trip included)
    v = vecs.astype(np.float32).astype(np.float64)
    u = v / np.linalg.norm(v, axis=1, keepdims=True)
    cents = u[:nlist]
    assign = np.argmax(u @ cents.T, axis=1)
    for qi in range(5):
        sims = u @ u[qi]
        order = np.lexsort((np.arange(n), -sims))
        exact = [i for i in order if i != qi][:k]
        probes = np.argsort(-(u[qi] @ cents.T), kind="stable")[:nprobe]
        in_probe = np.isin(assign, probes)
        cand = [i for i in order if i != qi and in_probe[i]][:k]
        want_hit = len(set(exact) & set(cand))
        row = out[out["query_id"] == qi].iloc[0]
        assert row["n_hit"] == want_hit, (qi, row["n_hit"], want_hit)
        assert row["recall"] == round(want_hit / k, 6)


def test_q_weighted_sample_docs_matches_reference(ray_session, tmp_path):
    import math

    from pagerank_ray.pipelines.tabular import q_weighted_sample_docs

    rng = np.random.default_rng(65)
    n = 400
    chars = rng.integers(0, 3000, n)  # includes 0 → GREATEST(.,1) path
    docs = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "n_chars": pa.array(chars, pa.int64()),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    k = 25
    out = q_weighted_sample_docs(str(tmp_path), k=k)

    keys = {}
    for i in range(n):
        u = ((i * 2654435761) % 4294967296 + 0.5) / 4294967296.0
        keys[i] = math.log(u) / max(int(chars[i]), 1)
    want = sorted(keys, key=lambda i: (-keys[i], i))[:k]
    assert sorted(out["doc_id"].tolist()) == sorted(want)
    got = out.set_index("doc_id")
    for i in want:
        assert abs(got.loc[i, "sample_key"] - round(keys[i], 9)) < 1e-12
    # weighting sanity: the sampled docs skew long
    assert got["n_chars"].mean() > chars.mean()


def test_q_powerlaw_alpha_matches_reference(ray_session, tmp_path):
    import math

    from pagerank_ray.pipelines.tabular import q_powerlaw_alpha

    rng = np.random.default_rng(66)
    # heavy-tailed in-degrees: repeat dst proportional to a zipf draw
    dst = rng.zipf(2.0, 800)
    dst = dst[dst < 200]
    src = rng.integers(1000, 2000, len(dst))
    _write_lineitem_edges(tmp_path, src.tolist(), dst.tolist())
    dmin = 2
    out = q_powerlaw_alpha(str(tmp_path), dmin=dmin).iloc[0]

    edges = set(zip(src.tolist(), dst.tolist()))
    indeg = {}
    for _, d in edges:
        indeg[d] = indeg.get(d, 0) + 1
    hist = {}
    for d in indeg.values():
        if d >= dmin:
            hist[d] = hist.get(d, 0) + 1
    def half_away(x):
        return math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)
    s = sum(half_away(c * math.log(d / (dmin - 0.5)) * 1e9) for d, c in hist.items())
    n_tail = sum(hist.values())
    assert out["n_tail"] == n_tail
    assert out["max_degree"] == max(hist)
    assert abs(out["alpha"] - round(1.0 + n_tail * 1e9 / s, 6)) < 1e-9


def test_q_powerlaw_alpha_empty_tail(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_powerlaw_alpha

    # every vertex has in-degree 1 → tail below dmin is empty
    _write_lineitem_edges(tmp_path, [1, 2, 3], [10, 11, 12])
    out = q_powerlaw_alpha(str(tmp_path), dmin=2).iloc[0]
    assert (out["n_tail"], out["max_degree"], out["alpha"]) == (0, 0, 0.0)


def test_q_transitivity_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_transitivity

    # triangle 1-2-3 plus pendant 3-4 (direction/dup/self-loop noise included)
    src = [1, 2, 1, 3, 2, 9, 1]
    dst = [2, 3, 3, 4, 1, 9, 2]
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_transitivity(str(tmp_path)).iloc[0]
    # und edges: 1-2, 2-3, 1-3, 3-4; degrees 2,2,3,1 → wedges 1+1+3+0 = 5
    assert out["n_triangles"] == 1
    assert out["n_wedges"] == 5
    assert out["transitivity"] == round(3 / 5, 6)


# ---------------------------------------------------------------------------
# HyperBall neighborhood function
# ---------------------------------------------------------------------------


def test_hyperball_matches_bfs_ball_reference(ray_session, tmp_path):
    """Registers after t rounds must equal the HLL of the exact radius-t BFS
    ball (register max over members' singleton sketches) — an independent
    replay of the whole estimator from first principles."""
    import ray.data as rd

    from pagerank_ray.functions.text import fmix64, round_half_away
    from pagerank_ray.pipelines.hyperball import (
        CLIP, _EST_NUM, WBITS, _floor_log2_u64, hyperball,
    )

    rng = np.random.default_rng(67)
    src = rng.integers(0, 60, 150)
    dst = rng.integers(0, 60, 150)
    edges = rd.from_arrow(pa.table({
        "src_id": pa.array(src, pa.int64()),
        "dst_id": pa.array(dst, pa.int64()),
    }))
    rounds = 4
    out = hyperball(edges, rounds=rounds)

    # adjacency + BFS balls
    ids = sorted({int(v) for v in np.concatenate([src, dst])})
    adj = {v: set() for v in ids}
    for a, b in zip(src.tolist(), dst.tolist()):
        adj[a].add(b)
        adj[b].add(a)

    h = fmix64(np.array(ids, np.uint64))
    bucket = (h >> np.uint64(WBITS)).astype(np.int64)
    w = h & np.uint64((1 << WBITS) - 1)
    rho = np.full(len(w), WBITS + 1, np.int64)
    nz = w > 0
    rho[nz] = WBITS - _floor_log2_u64(w[nz])
    item_reg = {v: (int(bucket[i]), int(rho[i])) for i, v in enumerate(ids)}

    balls = {v: {v} for v in ids}
    for t in range(rounds + 1):
        nf, sregs = 0, 0
        for v in ids:
            regs = [0] * 16
            for u in balls[v]:
                b, r = item_reg[u]
                regs[b] = max(regs[b], r)
            sregs += sum(regs)
            sprime = sum(2.0 ** (CLIP - min(m, CLIP)) for m in regs)
            zeros = sum(1 for m in regs if m == 0)
            e = _EST_NUM / sprime
            if e <= 40.0 and zeros > 0:
                e = 16.0 * np.log(16.0 / zeros)
            nf += int(round_half_away(e * 1e6, 0))
        row = out[out["t"] == t].iloc[0]
        assert row["nf_scaled"] == nf, t
        assert row["sum_registers"] == sregs, t
        balls = {v: set.union(balls[v], *(balls[u] for u in adj[v])) for v in ids}


def test_hyperball_distributed_matches_tail(ray_session):
    import ray.data as rd

    from pagerank_ray.pipelines.hyperball import hyperball

    rng = np.random.default_rng(68)
    src = rng.integers(0, 80, 300)
    dst = rng.integers(0, 80, 300)
    edges = pa.table({
        "src_id": pa.array(src, pa.int64()),
        "dst_id": pa.array(dst, pa.int64()),
    })
    a = hyperball(rd.from_arrow(edges), rounds=3)  # tail path
    b = hyperball(rd.from_arrow(edges), rounds=3, tail_cutoff=0)  # distributed
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True),
        b.sort_values("t").reset_index(drop=True),
        check_dtype=False,
    )


def test_q_graph_growth_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_graph_growth

    tbl = pa.table({
        "l_orderkey": pa.array([1, 1, 2, 1, 3], pa.int64()),
        "l_partkey": pa.array([10, 10, 10, 11, 10], pa.int64()),
        "l_shipdate": pa.array(
            pd.to_datetime(
                ["2024-01-05", "2024-02-01", "2024-01-20", "2024-03-01", "2024-03-09"]
            ),
            pa.timestamp("us"),
        ),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_graph_growth(str(tmp_path)).set_index("month_key")
    # months: 202401 (edges 1-10, 2-10; srcs 1,2; dst 10), 202402 (nothing
    # new — edge 1-10 repeats), 202403 (edges 1-11, 3-10; src 3; dst 11)
    assert list(out.index) == [202401, 202402, 202403]
    assert out.loc[202401, ["n_new_edges", "n_new_src", "n_new_dst"]].tolist() == [2, 2, 1]
    assert out.loc[202402, ["n_new_edges", "n_new_src", "n_new_dst"]].tolist() == [0, 0, 0]
    assert out.loc[202403, ["n_new_edges", "n_new_src", "n_new_dst"]].tolist() == [2, 1, 1]
    assert out["cum_edges"].tolist() == [2, 2, 4]


def test_q_community_conductance_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_community_conductance

    # two triangles joined by one bridge: LP(3) settles each triangle on its
    # min id; bridge edge is the only cut
    src = [1, 2, 1, 10, 11, 10, 3]
    dst = [2, 3, 3, 11, 12, 12, 10]
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_community_conductance(str(tmp_path), n_workers=2).set_index("community")
    assert len(out) == 2
    assert out["size"].tolist() == [3, 3]
    assert out["internal_edges"].tolist() == [3, 3]
    assert out["cut_edges"].tolist() == [1, 1]
    assert out["volume"].tolist() == [7, 7]
    # m = 7 und edges; min(7, 14-7) = 7 → φ = 1/7
    assert (out["conductance"] == round(1 / 7, 6)).all()


# ---------------------------------------------------------------------------
# Katz centrality
# ---------------------------------------------------------------------------


def test_q_katz_matches_numpy(ray_session, tmp_path):
    """q_katz over a small random graph matches a dense NumPy replay of the
    identical recurrence (x ← α·(Aᵀ_sym x) + β) on the symmetrized
    deduplicated edge set."""
    from pagerank_ray.pipelines.tabular import q_katz

    rng = np.random.default_rng(11)
    m = 300
    src = rng.integers(1, 60, m).tolist()
    dst = rng.integers(1, 60, m).tolist()
    _write_lineitem_edges(tmp_path, src, dst)
    alpha, beta, iters = 0.05, 1.0, 8
    out = q_katz(str(tmp_path), n_workers=2, iters=iters, alpha=alpha, beta=beta)

    pairs = {(s, d) for s, d in zip(src, dst)}
    sym = pairs | {(d, s) for s, d in pairs}
    ids = sorted({v for e in sym for v in e})
    pos = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for s, d in sym:
        A[pos[s], pos[d]] = 1.0
    x = np.ones(n)
    for _ in range(iters):
        x = alpha * (A.T @ x) + beta
    got = out.set_index("id")["katz"]
    assert len(got) == n
    for v in ids:
        assert abs(got[v] - round(x[pos[v]], 6)) <= 2e-6


def test_q_katz_bounded_growth(ray_session, tmp_path):
    """A path graph: scores stay near β (in-degree ≤ 2) and the endpoint
    score is strictly below the middle score."""
    from pagerank_ray.pipelines.tabular import q_katz

    src = [1, 2, 3, 4]
    dst = [2, 3, 4, 5]
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_katz(str(tmp_path), n_workers=2).set_index("id")["katz"]
    assert out[1] < out[3]
    assert (out < 1.3).all()


# ---------------------------------------------------------------------------
# C4-style line-level dedup (line_dedup)
# ---------------------------------------------------------------------------


def _write_docs(tmp_path, texts, ids=None):
    ids = ids if ids is not None else list(range(1, len(texts) + 1))
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))


def test_q_line_dedup_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_line_dedup

    eight = "a b c d e f g h"
    _write_docs(tmp_path, [
        eight + " x y",   # doc 1: lines [eight, "x y"] — both first occurrences
        eight + " x y",   # doc 2: both lines duplicate doc 1's
        "x y",            # doc 3: duplicates doc 1's tail line
        "p q",            # doc 4: unique
    ])
    out = q_line_dedup(str(tmp_path)).set_index("doc_id")
    assert out.loc[1, ["n_lines", "n_removed"]].tolist() == [2, 0]
    assert out.loc[2, ["n_lines", "n_removed"]].tolist() == [2, 2]
    assert out.loc[3, ["n_lines", "n_removed"]].tolist() == [1, 1]
    assert out.loc[4, ["n_lines", "n_removed"]].tolist() == [1, 0]
    assert out.loc[2, "removed_ratio"] == 1.0


def test_q_line_dedup_matches_reference(ray_session, tmp_path):
    """Random word-stream corpus vs a brute-force keep-first replay."""
    from pagerank_ray.pipelines.tabular import q_line_dedup

    rng = np.random.default_rng(3)
    vocab = ["w%d" % i for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 40)))
        for _ in range(60)
    ]
    _write_docs(tmp_path, texts)
    out = q_line_dedup(str(tmp_path)).set_index("doc_id")

    seen = {}
    want = {}
    for di, t in enumerate(texts, start=1):
        w = t.split()
        nl = (len(w) + 7) // 8
        rem = 0
        for li in range(nl):
            line = " ".join(w[li * 8:(li + 1) * 8])
            pos = di * 65536 + li
            if line in seen:
                rem += 1
            else:
                seen[line] = pos
        want[di] = (nl, rem)
    for di, (nl, rem) in want.items():
        assert out.loc[di, "n_lines"] == nl
        assert out.loc[di, "n_removed"] == rem


# ---------------------------------------------------------------------------
# Frequency-based boilerplate line detection (boilerplate_lines)
# ---------------------------------------------------------------------------


def _write_docs_src(tmp_path, texts, sources):
    tbl = pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))


def test_q_boilerplate_lines_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_boilerplate_lines

    hdr = "h1 h2 h3 h4 h5 h6 h7 h8"
    uniq = ["u%d" % i for i in range(40)]
    texts = [
        hdr + " " + " ".join(uniq[0:8]),    # src a: header + unique line
        hdr + " " + " ".join(uniq[8:16]),   # src a: header + unique line
        hdr,                                # src a: header only
        " ".join(uniq[16:24]),              # src a: no header (df(hdr)=3/4)
        " ".join(uniq[24:32]),              # src b: unique
        " ".join(uniq[24:32]),              # src b: duplicate of doc 5 (df=2/2)
        " ".join(uniq[32:40]) + " " + " ".join(uniq[32:40]),  # src c:
        # same line TWICE in ONE doc → df=1, not boilerplate, n_lines=2
    ]
    srcs = ["a", "a", "a", "a", "b", "b", "c"]
    _write_docs_src(tmp_path, texts, srcs)
    out = q_boilerplate_lines(str(tmp_path)).set_index("doc_id")
    assert out.loc[1, ["n_lines", "n_boiler"]].tolist() == [2, 1]
    assert out.loc[1, "boiler_ratio"] == 0.5
    assert out.loc[2, ["n_lines", "n_boiler"]].tolist() == [2, 1]
    assert out.loc[3, ["n_lines", "n_boiler"]].tolist() == [1, 1]
    assert out.loc[4, ["n_lines", "n_boiler"]].tolist() == [1, 0]
    assert out.loc[5, ["n_lines", "n_boiler"]].tolist() == [1, 1]
    assert out.loc[6, ["n_lines", "n_boiler"]].tolist() == [1, 1]
    assert out.loc[7, ["n_lines", "n_boiler"]].tolist() == [2, 0]


def test_q_boilerplate_lines_matches_reference(ray_session, tmp_path):
    """Random corpus with planted per-source headers vs a brute replay."""
    from pagerank_ray.pipelines.tabular import q_boilerplate_lines

    rng = np.random.default_rng(37)
    vocab = ["w%d" % i for i in range(30)]
    texts, srcs = [], []
    for si in range(3):
        hdr = " ".join("s%d_%d" % (si, j) for j in range(8))
        for di in range(12):
            body = " ".join(rng.choice(vocab, rng.integers(1, 30)))
            texts.append((hdr + " " + body) if di % 2 == 0 else body)
            srcs.append("src%d" % si)
    _write_docs_src(tmp_path, texts, srcs)
    out = q_boilerplate_lines(str(tmp_path)).set_index("doc_id")

    ll, min_df, fn, fd = 8, 2, 1, 20
    nd = {}
    for s in srcs:
        nd[s] = nd.get(s, 0) + 1
    docline = {}
    for di, (t, s) in enumerate(zip(texts, srcs), start=1):
        w = t.split()
        for li in range((len(w) + ll - 1) // ll):
            line = " ".join(w[li * ll:(li + 1) * ll])
            docline[(di, s, line)] = docline.get((di, s, line), 0) + 1
    dfreq = {}
    for (di, s, line) in docline:
        dfreq[(s, line)] = dfreq.get((s, line), 0) + 1
    for di, (t, s) in enumerate(zip(texts, srcs), start=1):
        nl = sum(occ for (d2, _, _), occ in docline.items() if d2 == di)
        nb = sum(occ for (d2, s2, l2), occ in docline.items()
                 if d2 == di and dfreq[(s2, l2)] >= min_df
                 and dfreq[(s2, l2)] * fd >= fn * nd[s2])
        assert out.loc[di, "n_lines"] == nl
        assert out.loc[di, "n_boiler"] == nb


# ---------------------------------------------------------------------------
# Span-level exact-substring dedup trim (span_dedup)
# ---------------------------------------------------------------------------


def test_q_span_dedup_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_span_dedup

    _write_docs(tmp_path, [
        "a b c d e f",          # doc 1: both 5-grams first occurrences
        "a b c d e x",          # doc 2: gram@0 duplicates doc 1 → tokens 0-4
        "z a b c d e f",        # doc 3: grams@1,@2 duplicate → union 1-6 (6)
        "p q",                  # doc 4: < k tokens → no grams
        "m n o p q r m n o p q r",  # doc 5: intra-doc repeat → union 6-11 (6)
        "",                     # doc 6: empty → no output row
    ])
    out = q_span_dedup(str(tmp_path)).set_index("doc_id")
    assert 6 not in out.index
    assert out.loc[1, ["n_tokens", "n_removed"]].tolist() == [6, 0]
    assert out.loc[2, ["n_tokens", "n_removed"]].tolist() == [6, 5]
    assert out.loc[3, ["n_tokens", "n_removed"]].tolist() == [7, 6]
    assert out.loc[4, ["n_tokens", "n_removed"]].tolist() == [2, 0]
    assert out.loc[5, ["n_tokens", "n_removed"]].tolist() == [12, 6]
    assert out.loc[5, "removed_ratio"] == 0.5


def test_q_span_dedup_matches_reference(ray_session, tmp_path):
    """Random corpus vs a brute-force keep-first + coverage-union replay."""
    from pagerank_ray.pipelines.tabular import q_span_dedup

    rng = np.random.default_rng(7)
    vocab = ["w%d" % i for i in range(9)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 50)))
        for _ in range(80)
    ]
    _write_docs(tmp_path, texts)
    out = q_span_dedup(str(tmp_path)).set_index("doc_id")

    k = 5
    seen = {}
    for di, t in enumerate(texts, start=1):
        w = t.split()
        covered = set()
        for s in range(len(w) - k + 1):
            gram = " ".join(w[s:s + k])
            pos = di * (1 << 20) + s
            if gram in seen:
                covered.update(range(s, s + k))
            else:
                seen[gram] = pos
        assert out.loc[di, "n_tokens"] == len(w)
        assert out.loc[di, "n_removed"] == len(covered)
        assert out.loc[di, "removed_ratio"] == round(len(covered) / len(w), 6)


# ---------------------------------------------------------------------------
# Loud-guard paths of the r5 extension operators
# ---------------------------------------------------------------------------


def test_span_dedup_position_encoding_guard(ray_session, tmp_path):
    """A doc with ≥ 2^20 tokens must fail loudly, not silently mis-encode."""
    from pagerank_ray.pipelines.tabular import q_span_dedup

    _write_docs(tmp_path, ["w " * (1 << 20)])
    with pytest.raises(Exception, match="2\\^20 position encoding"):
        q_span_dedup(str(tmp_path))


def test_simrank_ranked_edges_degree_guard(ray_session):
    """A vertex with degree ≥ 2^21 must fail loudly in the key encoding."""
    import ray.data as rd

    from pagerank_ray.pipelines.simrank import _ranked_edges

    hub = np.zeros(1 << 21, dtype=np.int64) + 1
    leaves = np.arange(2, (1 << 21) + 2, dtype=np.int64)
    sym = rd.from_arrow(pa.table({
        "src_id": pa.array(hub), "dst_id": pa.array(leaves),
    }))
    with pytest.raises(Exception, match="2\\^21 key encoding"):
        _ranked_edges(sym).materialize()


def test_spectral_overflow_guard(ray_session, tmp_path):
    """target high enough that n·max|w| crosses 2^62 must raise, not wrap."""
    from pagerank_ray.pipelines.tabular import q_spectral_bisection

    pairs = [(1, 2), (2, 3), (3, 1)]
    _write_lineitem_edges(tmp_path, [a for a, _ in pairs], [b for _, b in pairs])
    with pytest.raises(OverflowError, match="int64 range"):
        q_spectral_bisection(str(tmp_path), target=2**60)


# ---------------------------------------------------------------------------
# Fingerprint SimRank (Fogaras-Rácz coupled walks)
# ---------------------------------------------------------------------------


def _simrank_reference(pairs, mod, length=5, n_seeds=3, decay=0.8, topk=5):
    """Pure-Python replay of the coupled deterministic walk fields."""
    from pagerank_ray.functions.text import fmix64

    und = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    ids = sorted({v for e in und for v in e})
    nbr = {v: [] for v in ids}
    for a, b in und:
        nbr[a].append(b)
        nbr[b].append(a)
    for v in ids:
        nbr[v].sort()
    c_int = {t: int(np.floor(abs(decay**t) * 1e6 + 0.5)) for t in range(1, length + 1)}
    queries = [v for v in ids if v % mod == 0]
    first = {}
    for k in range(n_seeds):
        pos = {v: v for v in ids}
        for t in range(1, length + 1):
            with np.errstate(over="ignore"):
                nxt = {}
                for v in ids:
                    p = pos[v]
                    x = np.uint64(p) * np.uint64(1000003) + np.uint64(k * 1000 + t)
                    h = int(fmix64(np.array([x], dtype=np.uint64))[0])
                    nxt[v] = nbr[p][h % len(nbr[p])]
                pos = nxt
            for q in queries:
                for v in ids:
                    if v != q and pos[v] == pos[q]:
                        first.setdefault((k, q, v), t)
    ci = {}
    for (k, q, v), t in first.items():
        ci[(q, v)] = ci.get((q, v), 0) + c_int[t]
    out = {}
    for q in queries:
        rows = sorted(
            ((c, v) for (q2, v), c in ci.items() if q2 == q),
            key=lambda cv: (-cv[0], cv[1]),
        )[:topk]
        out[q] = [
            (v, float(np.floor(abs(c / (n_seeds * 1e6)) * 1e6 + 0.5) / 1e6), r + 1)
            for r, (c, v) in enumerate(rows)
        ]
    return out


def test_q_simrank_topk_star(ray_session, tmp_path):
    """Star graph: every leaf's only move is onto the hub, so all leaves
    meet at t=1 in every field — pairwise leaf similarity is exactly C."""
    from pagerank_ray.pipelines.tabular import q_simrank_topk

    pairs = [(3, 512), (3, 7), (3, 9), (3, 11)]  # hub 3, leaves incl query 512
    _write_lineitem_edges(tmp_path, [a for a, _ in pairs], [b for _, b in pairs])
    out = q_simrank_topk(str(tmp_path), mod=512)
    top3 = out[out["q"] == 512].head(3)
    assert top3["v"].tolist() == [7, 9, 11]
    assert (top3["score"] == 0.8).all()


def test_q_simrank_topk_matches_reference(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_simrank_topk

    rng = np.random.default_rng(41)
    src = rng.integers(1, 25, 80).tolist()
    dst = rng.integers(1, 25, 80).tolist()
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_simrank_topk(str(tmp_path), mod=6)
    want = _simrank_reference(list(zip(src, dst)), mod=6)
    got = {}
    for r in out.itertuples():
        got.setdefault(int(r.q), []).append(
            (int(r.v), float(r.score), int(r.rank))
        )
    assert got == {q: rows for q, rows in want.items() if rows}


# ---------------------------------------------------------------------------
# Spectral bisection (Fiedler vector by integer power iteration)
# ---------------------------------------------------------------------------


def _spectral_reference(pairs, iters=12, target=10**6):
    """Pure-Python replay of the all-integer power iteration."""
    from pagerank_ray.functions.text import fmix64

    und = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    ids = sorted({v for e in und for v in e})
    n = len(ids)
    ix = {v: i for i, v in enumerate(ids)}
    deg = np.zeros(n, dtype=np.int64)
    for a, b in und:
        deg[ix[a]] += 1
        deg[ix[b]] += 1
    c = int(deg.max())
    h = fmix64(np.array(ids, dtype=np.uint64))
    v = (h % np.uint64(2 * target + 1)).astype(np.int64) - target
    for _ in range(iters):
        av = np.zeros(n, dtype=np.int64)
        for a, b in und:
            av[ix[a]] += v[ix[b]]
            av[ix[b]] += v[ix[a]]
        w = (c - deg) * v + av
        sw = int(w.sum())
        wc = n * w - sw
        dv = max(1, (n * int(np.abs(w).max()) + abs(sw)) // target)
        v = np.sign(wc) * (np.abs(wc) // dv)
    return {ids[i]: int(v[i] >= 0) for i in range(n)}


def test_q_spectral_bisection_barbell(ray_session, tmp_path):
    """Two K5 clusters joined by one bridge: the Fiedler sign must put each
    clique entirely on one side, and the two cliques on OPPOSITE sides."""
    from pagerank_ray.pipelines.tabular import q_spectral_bisection

    A, B = [1, 2, 3, 4, 5], [11, 12, 13, 14, 15]
    pairs = [(a, b) for i, a in enumerate(A) for b in A[i + 1:]]
    pairs += [(a, b) for i, a in enumerate(B) for b in B[i + 1:]]
    pairs.append((5, 11))
    _write_lineitem_edges(tmp_path, [a for a, _ in pairs], [b for _, b in pairs])
    out = q_spectral_bisection(str(tmp_path)).set_index("id")["side"]
    assert len(set(out[A])) == 1 and len(set(out[B])) == 1
    assert out[1] != out[11]


def test_q_spectral_bisection_matches_reference(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_spectral_bisection

    rng = np.random.default_rng(31)
    src = rng.integers(1, 35, 100).tolist()
    dst = rng.integers(1, 35, 100).tolist()
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_spectral_bisection(str(tmp_path)).set_index("id")["side"].to_dict()
    want = _spectral_reference(list(zip(src, dst)))
    assert out == want


# ---------------------------------------------------------------------------
# Weisfeiler-Lehman color refinement (1-WL)
# ---------------------------------------------------------------------------


def _wl_reference(pairs, iters=3):
    """Pure-Python replay of the engine's 1-WL arithmetic."""
    from pagerank_ray.functions.text import fmix64
    from pagerank_ray.stages.dedup import _POLY_C

    und = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    ids = sorted({v for e in und for v in e})
    nbr = {v: [] for v in ids}
    for a, b in und:
        nbr[a].append(b)
        nbr[b].append(a)
    c = {v: np.uint64(len(nbr[v])) for v in ids}
    for _ in range(iters):
        with np.errstate(over="ignore"):
            f = {v: fmix64(np.array([c[v]], dtype=np.uint64))[0] for v in ids}
            nxt = {}
            for v in ids:
                s = np.uint64(0)
                for u in nbr[v]:
                    s += f[u]
                nxt[v] = fmix64(np.array([c[v] * _POLY_C + s], dtype=np.uint64))[0]
        c = nxt
    return {v: int(np.uint64(c[v]).view(np.int64)) for v in ids}


def test_q_wl_refinement_symmetry(ray_session, tmp_path):
    """Path 1-2-3-4-5: WL must merge the mirror-symmetric vertices
    (1,5) and (2,4) and separate the three orbit classes; a 6-cycle is
    vertex-transitive so all its vertices keep ONE color."""
    from pagerank_ray.pipelines.tabular import q_wl_refinement

    path = [(1, 2), (2, 3), (3, 4), (4, 5)]
    cyc = [(11, 12), (12, 13), (13, 14), (14, 15), (15, 16), (16, 11)]
    pairs = path + cyc
    _write_lineitem_edges(tmp_path, [a for a, _ in pairs], [b for _, b in pairs])
    out = q_wl_refinement(str(tmp_path)).set_index("id")["color"]
    assert out[1] == out[5] and out[2] == out[4]
    assert len({out[1], out[2], out[3]}) == 3
    assert len({out[v] for v in range(11, 17)}) == 1
    assert out[11] != out[3]  # deg-2 path middle vs deg-2 cycle differ by round 2


def test_q_wl_refinement_matches_reference(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_wl_refinement

    rng = np.random.default_rng(29)
    src = rng.integers(1, 40, 150).tolist()
    dst = rng.integers(1, 40, 150).tolist()
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_wl_refinement(str(tmp_path)).set_index("id")["color"].to_dict()
    want = _wl_reference(list(zip(src, dst)))
    assert out == want


# ---------------------------------------------------------------------------
# ACL sweep cut (Andersen-Chung-Lang 2006)
# ---------------------------------------------------------------------------


def _sweep_cut_reference(pairs, mod, iters=8, alpha=0.85, prefixes=60):
    """Pure-numpy replay: symmetrize, K=1 PPR power iteration (no dangling
    on a symmetric graph), half-away round(6), integer sweep key, brute
    crossing count per prefix."""
    und = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    ids = sorted({v for e in und for v in e})
    ix = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    deg = np.zeros(n, dtype=np.int64)
    for a, b in und:
        deg[ix[a]] += 1
        deg[ix[b]] += 1
    seeds = np.array([v % mod == 0 for v in ids])
    pn = np.where(seeds, n / seeds.sum(), 0.0)
    r = pn.copy()
    for _ in range(iters):
        nxt = np.zeros(n)
        contrib = r / deg
        for a, b in und:
            nxt[ix[b]] += contrib[ix[a]]
            nxt[ix[a]] += contrib[ix[b]]
        r = (1 - alpha) * pn + alpha * nxt
    ri = np.floor(np.abs(r * 1e6) + 0.5).astype(np.int64)  # half-away
    key = ri * 1_000_000 // deg
    order = sorted(range(n), key=lambda i: (-key[i], ids[i]))
    t_eff = min(prefixes, n - 1)
    vol_tot = 2 * len(und)
    rows = []
    inset = set()
    cut = vol = 0
    for k in range(1, t_eff + 1):
        v = order[k - 1]
        e_in = sum(1 for a, b in und
                   if (ix[a] == v and ix[b] in inset) or (ix[b] == v and ix[a] in inset))
        cut += deg[v] - 2 * e_in
        vol += deg[v]
        inset.add(v)
        phi = cut / min(vol, vol_tot - vol)
        rows.append((k, cut, vol, float(np.floor(abs(phi) * 1e6 + 0.5) / 1e6)))
    return rows


def test_q_ppr_sweep_cut_barbell(ray_session, tmp_path):
    """Two K4 clusters joined by one bridge, seed (mod 5) inside cluster A:
    the sweep's first four positions are A, so k=4 is the planted dip —
    cut 1, vol 13, conductance 1/13."""
    from pagerank_ray.pipelines.tabular import q_ppr_sweep_cut

    A, B = [5, 1, 2, 3], [6, 7, 8, 9]
    pairs = [(a, b) for i, a in enumerate(A) for b in A[i + 1:]]
    pairs += [(a, b) for i, a in enumerate(B) for b in B[i + 1:]]
    pairs.append((3, 6))  # the bridge
    _write_lineitem_edges(tmp_path, [a for a, _ in pairs], [b for _, b in pairs])
    out = q_ppr_sweep_cut(str(tmp_path), mod=5).set_index("prefix_k")
    assert len(out) == 7  # n=8 → n-1 prefixes
    assert out.loc[4, ["cut", "vol"]].tolist() == [1, 13]
    assert out.loc[4, "conductance"] == round(1 / 13, 6)
    assert out["conductance"].idxmin() == 4  # the planted dip is the argmin


def test_q_ppr_sweep_cut_matches_reference(ray_session, tmp_path):
    """Random multigraph-ish edge list vs the pure-numpy PPR+sweep replay."""
    from pagerank_ray.pipelines.tabular import q_ppr_sweep_cut

    rng = np.random.default_rng(23)
    src = rng.integers(1, 30, 120).tolist()
    dst = rng.integers(1, 30, 120).tolist()
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_ppr_sweep_cut(str(tmp_path), mod=3)
    want = _sweep_cut_reference(list(zip(src, dst)), mod=3)
    got = [
        (int(r.prefix_k), int(r.cut), int(r.vol), float(r.conductance))
        for r in out.itertuples()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer-Wilkerson-Aiken 2003)
# ---------------------------------------------------------------------------


def _winnowing_reference(texts, k=4, w=5):
    """Pure-Python per-doc winnowing replay over the engine's own token
    hashes: fold k-gram hashes, slide truncation-aware windows, rightmost
    minimum, distinct positions; shared = fp hash seen in ≥2 docs."""
    from pagerank_ray.stages.dedup import _POLY_C, _hash_tokens

    per_doc = {}
    for di, t in enumerate(texts, start=1):
        toks = t.split()
        if not toks:
            continue
        th = _hash_tokens(toks)
        ng = max(len(toks) - k + 1, 0)
        grams = []
        with np.errstate(over="ignore"):
            for s in range(ng):
                g = np.uint64(0)
                for j in range(k):
                    g = g * _POLY_C + th[s + j]
                grams.append(int(g))
        sel = set()
        for ws in range(max(ng - w, 0) + 1):
            windowed = grams[ws:ws + w]
            if not windowed:
                continue
            mg = min(windowed)
            s = max(i for i, gv in enumerate(windowed, start=ws) if gv == mg)
            sel.add(s)
        per_doc[di] = (ng, sel, {grams[s] for s in sel})
    counts = {}
    for di, (_, _, hs) in per_doc.items():
        for g in hs:
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for di, (ng, sel, hs) in per_doc.items():
        out[di] = (ng, len(sel), sum(1 for g in hs if counts[g] >= 2))
    return out


def test_q_winnowing_fp_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_winnowing_fp

    _write_docs(tmp_path, [
        "a b c d",                 # 1 gram → 1 truncated window → 1 fp
        "a b c d",                 # identical twin: fp hash shared
        "p q r s t u v w x y",     # 7 grams, no overlap with the twins
        "m n",                     # < k tokens: 0 grams, row still present
        "",                        # empty: no row
    ])
    out = q_winnowing_fp(str(tmp_path)).set_index("doc_id")
    assert 5 not in out.index
    assert out.loc[1, ["n_grams", "n_fp", "n_shared"]].tolist() == [1, 1, 1]
    assert out.loc[2, ["n_grams", "n_fp", "n_shared"]].tolist() == [1, 1, 1]
    assert out.loc[3, "n_grams"] == 7
    assert 1 <= out.loc[3, "n_fp"] <= 7
    assert out.loc[3, "n_shared"] == 0
    assert out.loc[4, ["n_grams", "n_fp", "n_shared"]].tolist() == [0, 0, 0]


def test_q_winnowing_fp_matches_reference(ray_session, tmp_path):
    """Random corpus (small vocab so grams recur across docs) vs the pure
    per-doc winnowing replay over the same token hashes."""
    from pagerank_ray.pipelines.tabular import q_winnowing_fp

    rng = np.random.default_rng(13)
    vocab = ["w%d" % i for i in range(7)]
    texts = [
        " ".join(rng.choice(vocab, rng.integers(1, 40)))
        for _ in range(70)
    ]
    _write_docs(tmp_path, texts)
    out = q_winnowing_fp(str(tmp_path)).set_index("doc_id")
    want = _winnowing_reference(texts)
    assert set(out.index) == set(want)
    for di, (ng, nfp, nsh) in want.items():
        assert out.loc[di, ["n_grams", "n_fp", "n_shared"]].tolist() == [ng, nfp, nsh]


def test_q_mixture_weights_planted(ray_session, tmp_path):
    """Two sources, 4:1 token ratio, τ=0.5 → weights 2:1 exactly."""
    from pagerank_ray.pipelines.tabular import q_mixture_weights

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b c d e f g h", "w x", "y z"]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["big", "small", "small"]),
        "n_chars": pa.array([15, 3, 3], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_mixture_weights(str(tmp_path), tau=0.5).set_index("source")
    assert out.loc["big", "n_tokens"] == 8
    assert out.loc["small", "n_tokens"] == 4
    # sqrt(8):sqrt(4) = 2·sqrt2 : 2 → weights  0.585786 / 0.414214
    assert abs(out.loc["big", "weight"] - 0.585786) < 1e-6
    assert abs(out.loc["small", "weight"] - 0.414214) < 1e-6
    assert out["n_docs"].tolist() == [1, 2]


def test_q_vocab_growth_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_vocab_growth

    _write_docs(tmp_path, [
        "a b c",      # doc 1: 3 new
        "b c d",      # doc 2: 1 new (d)
        "a b",        # doc 3: 0 new — no row
        "e e e f",    # doc 4: 2 new (e, f)
    ])
    out = q_vocab_growth(str(tmp_path))
    assert out["doc_id"].tolist() == [1, 2, 4]
    assert out["n_new"].tolist() == [3, 1, 2]
    assert out["cum_vocab"].tolist() == [3, 4, 6]


# ---------------------------------------------------------------------------
# Densest subgraph (Bahmani peel)
# ---------------------------------------------------------------------------


def _densest_reference(pairs):
    E = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    rows = []
    r = 0
    while E:
        deg = {}
        for a, b in E:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        n, m = len(deg), len(E)
        rows.append((r, n, m))
        rm = {v for v, d in deg.items() if 2 * d * n <= 5 * m}
        E = {(a, b) for a, b in E if a not in rm and b not in rm}
        r += 1
    return rows


def test_q_densest_subgraph_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_densest_subgraph

    # K5 (density 2.0) + a pendant path: the peel sheds the path first,
    # leaving the clique as the max-density round
    k5 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    path = [(5, 10), (10, 11), (11, 12)]
    edges = k5 + path
    _write_lineitem_edges(tmp_path, [e[0] for e in edges], [e[1] for e in edges])
    out = q_densest_subgraph(str(tmp_path))
    want = _densest_reference(edges)
    assert list(map(tuple, out[["peel_round", "n_vertices", "n_edges"]].values)) == want
    # 2(1+ε)-approx guarantee: max round density ≥ OPT/2.5 (OPT = K5's 2.0)
    assert out["density"].max() >= 2.0 / 2.5


def test_q_densest_subgraph_random(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_densest_subgraph

    rng = np.random.default_rng(9)
    m = 500
    src = rng.integers(1, 80, m).tolist()
    dst = rng.integers(1, 80, m).tolist()
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_densest_subgraph(str(tmp_path))
    want = _densest_reference(list(zip(src, dst)))
    assert list(map(tuple, out[["peel_round", "n_vertices", "n_edges"]].values)) == want


def test_densest_distributed_equals_tail(ray_session):
    """tail_cutoff=0 forces every round through the distributed path; the
    profile must match the one-task tail bit-for-bit."""
    import ray.data as rd

    from pagerank_ray.pipelines.densest import densest_subgraph

    rng = np.random.default_rng(17)
    m = 300
    src = rng.integers(0, 50, m)
    dst = rng.integers(0, 50, m)
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    pairs = np.unique(np.stack([a, b], axis=1), axis=0)
    sym = pa.table({
        "src_id": pa.array(np.concatenate([pairs[:, 0], pairs[:, 1]]), pa.int64()),
        "dst_id": pa.array(np.concatenate([pairs[:, 1], pairs[:, 0]]), pa.int64()),
    })
    r_tail = densest_subgraph(rd.from_arrow(sym), tail_cutoff=10**9)
    r_dist = densest_subgraph(rd.from_arrow(sym), tail_cutoff=0)
    assert r_tail == r_dist


# ---------------------------------------------------------------------------
# Bow-tie decomposition (Broder et al. 2000)
# ---------------------------------------------------------------------------


def test_q_bowtie_planted(ray_session, tmp_path):
    """Hand bow-tie over the thinned part-flow rule (all parts ≡ 0 mod 3,
    qty ≤ 25 so every consecutive pair survives the filter): core cycle
    3→6→9→3, IN 12→3, OUT 9→15, disconnected pair 21→24."""
    from pagerank_ray.pipelines.tabular import q_bowtie

    orders = [
        (1, 3, 6), (2, 6, 9), (3, 9, 3),   # the core cycle
        (4, 12, 3),                        # IN
        (5, 9, 15),                        # OUT
        (6, 21, 24),                       # OTHER (disconnected)
    ]
    ok, ln, pk, qty = [], [], [], []
    for o, a, b in orders:
        ok += [o, o]; ln += [1, 2]; pk += [a, b]; qty += [10.0, 10.0]
    tbl = pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_linenumber": pa.array(ln, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_quantity": pa.array(qty, pa.float64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_bowtie(str(tmp_path), n_workers=2).set_index("id")["cls"]
    assert out[3] == 0 and out[6] == 0 and out[9] == 0
    assert out[12] == 1
    assert out[15] == 2
    assert out[21] == 3 and out[24] == 3


# ---------------------------------------------------------------------------
# Kahn topological layers of the SCC condensation (condensation_layers)
# ---------------------------------------------------------------------------


def _write_bowtie_orders(tmp_path, orders):
    """orders: list of (orderkey, part_a, part_b) pairs; parts should be
    ≡ 0 mod 3 and qty=10 so every consecutive pair survives the bowtie
    thinning rule."""
    ok, ln, pk, qty = [], [], [], []
    for o, a, b in orders:
        ok += [o, o]; ln += [1, 2]; pk += [a, b]; qty += [10.0, 10.0]
    tbl = pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_linenumber": pa.array(ln, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
        "l_quantity": pa.array(qty, pa.float64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))


def _condensation_layers_reference(pairs):
    """Brute-force Kosaraju SCC + Kahn peel → [(layer, n_comps, n_verts)].
    ``pairs`` may include self-loops: their endpoints stay in the vertex
    set (isolated layer-0 components) but the loop edge itself is dropped,
    matching the engine's cross-component filter."""
    verts = sorted({v for e in pairs for v in e})
    edges = sorted({(a, b) for a, b in pairs if a != b})
    adj = {v: [] for v in verts}
    radj = {v: [] for v in verts}
    for a, b in edges:
        adj[a].append(b); radj[b].append(a)
    seen, order = set(), []
    for v0 in verts:           # iterative DFS, finish order
        if v0 in seen:
            continue
        stack = [(v0, iter(adj[v0]))]
        seen.add(v0)
        while stack:
            v, it = stack[-1]
            nxt = next((u for u in it if u not in seen), None)
            if nxt is None:
                order.append(v); stack.pop()
            else:
                seen.add(nxt); stack.append((nxt, iter(adj[nxt])))
    comp = {}
    for v0 in reversed(order):  # reverse graph sweep
        if v0 in comp:
            continue
        stack, comp[v0] = [v0], v0
        while stack:
            v = stack.pop()
            for u in radj[v]:
                if u not in comp:
                    comp[u] = v0; stack.append(u)
    ce = {(comp[a], comp[b]) for a, b in edges if comp[a] != comp[b]}
    comps = sorted(set(comp.values()))
    indeg = {c: 0 for c in comps}
    for _, d in ce:
        indeg[d] += 1
    layer, rnd, remaining = {}, 0, set(comps)
    while remaining:
        front = [c for c in remaining if indeg[c] == 0]
        for c in front:
            layer[c] = rnd
            remaining.discard(c)
            for s2, d2 in ce:
                if s2 == c:
                    indeg[d2] -= 1
        rnd += 1
    sizes = {}
    for v, c in comp.items():
        sizes[c] = sizes.get(c, 0) + 1
    hist = {}
    for c in comps:
        l = layer[c]
        nc, nvv = hist.get(l, (0, 0))
        hist[l] = (nc + 1, nvv + sizes[c])
    return [(l, *hist[l]) for l in sorted(hist)]


def test_q_condensation_layers_planted(ray_session, tmp_path):
    """Core cycle 3→6→9→3 with an IN chain 18→12→3, an OUT edge 9→15 and a
    disconnected pair 21→24: layers (18,21)=0, (12,24)=1, core=2, 15=3."""
    from pagerank_ray.pipelines.tabular import q_condensation_layers

    _write_bowtie_orders(tmp_path, [
        (1, 3, 6), (2, 6, 9), (3, 9, 3),   # the core cycle (one SCC)
        (4, 12, 3), (5, 18, 12),           # IN chain
        (6, 9, 15),                        # OUT
        (7, 21, 24),                       # disconnected pair
    ])
    out = q_condensation_layers(str(tmp_path), n_workers=2)
    assert list(map(tuple, out.values)) == [
        (0, 2, 2),   # {18}, {21}
        (1, 2, 2),   # {12}, {24}
        (2, 1, 3),   # the 3-cycle core
        (3, 1, 1),   # {15}
    ]


def test_q_condensation_layers_matches_reference(ray_session, tmp_path):
    """Random mod-3-friendly order graph vs Kosaraju+Kahn brute force."""
    from pagerank_ray.pipelines.tabular import q_condensation_layers

    rng = np.random.default_rng(11)
    parts = np.arange(1, 13) * 3  # all ≡ 0 mod 3
    orders = [
        (o, int(rng.choice(parts)), int(rng.choice(parts)))
        for o in range(1, 41)
    ]
    _write_bowtie_orders(tmp_path, orders)
    want = _condensation_layers_reference([(a, b) for _, a, b in orders])
    out = q_condensation_layers(str(tmp_path), n_workers=2)
    assert list(map(tuple, out.values)) == want


def test_q_bm25_topk_planted(ray_session, tmp_path):
    """Hand-checked Okapi BM25: 3 docs, query=('hash',); doc with the
    higher tf but much longer length loses to the short exact doc."""
    from pagerank_ray.pipelines.tabular import q_bm25_topk

    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "hash join",                       # tf=1, dl=2
            "hash hash " + "pad " * 20 + "x",  # tf=2, dl=23
            "no match here",                   # tf=0, dl=3
        ]),
        "lang": pa.array(["en"] * 3),
        "source": pa.array(["s"] * 3),
        "n_chars": pa.array([9, 30, 13], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_bm25_topk(str(tmp_path), terms=("hash",), k=3)
    # per-row reference
    N, df_, avgdl = 3, 2, (2 + 23 + 3) / 3
    idf = math.log(1 + (N - df_ + 0.5) / (df_ + 0.5))
    k1, b = 1.2, 0.75
    def ref(tf, dl):
        return round(idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl)), 6)
    want = sorted([(1, ref(1, 2)), (2, ref(2, 23)), (3, ref(0, 3))],
                  key=lambda t: (-t[1], t[0]))
    got = list(zip(out["doc_id"], out["score"]))
    assert got == [(d, round(s, 6)) for d, s in want]
    assert out.iloc[0]["doc_id"] == 1  # short exact doc wins on length norm


def test_q_dsir_weights_planted(ray_session, tmp_path):
    """DSIR log importance weights vs a per-doc Python reference using the
    same token hash: target=en, raw=all, add-1 smoothing, uni+bigrams."""
    from pagerank_ray.pipelines.tabular import q_dsir_weights
    from pagerank_ray.stages.dedup import _POLY_C, _hash_tokens

    texts = ["a b a", "b c", "a a", ""]
    langs = ["en", "de", "en", "de"]
    tbl = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(langs),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([5, 3, 3, 0], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    B = 64
    out = q_dsir_weights(str(tmp_path), n_buckets=B).set_index("doc_id")

    def feats(t):
        ws = t.split()
        h = _hash_tokens(ws)
        f = list((h % np.uint64(B)).astype(int))
        with np.errstate(over="ignore"):
            f += list(((h[:-1] * _POLY_C + h[1:]) % np.uint64(B)).astype(int))
        return f

    ct = np.zeros(B); cr = np.zeros(B)
    for t, l in zip(texts, langs):
        for f in feats(t):
            cr[f] += 1
            if l == "en":
                ct[f] += 1
    lam = np.log((ct + 1) / (ct.sum() + B)) - np.log((cr + 1) / (cr.sum() + B))
    for i, t in enumerate(texts):
        want = round(float(sum(lam[f] for f in feats(t))), 6)
        assert abs(out.loc[i + 1, "logw"] - want) < 2e-6, (i + 1, want)
    # en-only features push en docs up relative to the de doc sharing tokens
    assert out.loc[4, "logw"] == 0.0


# ---------------------------------------------------------------------------
# rich-club coefficient
# ---------------------------------------------------------------------------


def _rich_club_reference(edges, ks=(1, 2, 4, 8, 16, 32)):
    from collections import Counter

    from pagerank_ray.pipelines.tabular import _round_half_away

    dedup = set(edges)
    deg = Counter()
    for s, d in dedup:
        deg[s] += 1
        deg[d] += 1
    rows = []
    for k in sorted(ks):
        club = {v for v, c in deg.items() if c > k}
        n = len(club)
        e = sum(1 for s, d in dedup if s != d and s in club and d in club)
        phi = 0.0 if n < 2 else float(_round_half_away(e / (n * (n - 1)), 6))
        rows.append((k, n, e, phi))
    return rows


def test_q_rich_club_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_rich_club

    # directed K4 both ways (every member deg 6) + pendant chain + self-loop
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    extra = [(4, 10), (10, 11), (7, 7), (1, 2)]  # (1,2) is a duplicate row
    edges = k4 + extra
    _write_lineitem_edges(tmp_path, [e[0] for e in edges], [e[1] for e in edges])
    out = q_rich_club(str(tmp_path), ks=(1, 2, 4))
    want = _rich_club_reference(edges, ks=(1, 2, 4))
    got = [
        (int(r.k), int(r.n_rich), int(r.e_rich), float(r.phi))
        for r in out.itertuples()
    ]
    assert got == want
    # the K4 club at k=4: vertices {1,2,3,4} all have deg >= 6, 12 edges
    assert got[-1][1] >= 4 and got[-1][2] >= 12


def test_q_rich_club_random(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_rich_club

    rng = np.random.default_rng(17)
    m = 800
    src = rng.integers(1, 60, m).tolist()
    dst = rng.integers(1, 60, m).tolist()
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_rich_club(str(tmp_path))
    want = _rich_club_reference(list(zip(src, dst)))
    got = [
        (int(r.k), int(r.n_rich), int(r.e_rich), float(r.phi))
        for r in out.itertuples()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# effective diameter (HyperBall NF derivation)
# ---------------------------------------------------------------------------


def test_q_effective_diameter_matches_nf_curve(ray_session, tmp_path):
    """The derived metrics must equal the documented interpolation applied to
    the (independently hash-oracled) q_hyperball curve."""
    from pagerank_ray.pipelines.tabular import (
        _round_half_away,
        q_effective_diameter,
        q_hyperball,
    )

    rng = np.random.default_rng(23)
    m = 600
    src = rng.integers(1, 120, m).tolist()
    dst = rng.integers(1, 120, m).tolist()
    _write_lineitem_edges(tmp_path, src, dst)

    out = q_effective_diameter(str(tmp_path), rounds=5)
    v = (
        q_hyperball(str(tmp_path), rounds=5)
        .sort_values("t")["nf_scaled"]
        .to_numpy(np.int64)
    )
    last = int(v[-1])
    target = 0.9 * float(last)
    if float(v[0]) >= target:
        want_d = 0.0
    else:
        t = int(np.argmax(v.astype(np.float64) >= target))
        want_d = (t - 1) + (target - float(v[t - 1])) / (float(v[t]) - float(v[t - 1]))
    num = int((np.arange(1, len(v), dtype=np.int64) * (v[1:] - v[:-1])).sum())
    den = last - int(v[0])
    want_avg = 0.0 if den == 0 else float(num) / float(den)
    assert out["nf_last"].iloc[0] == last
    assert out["effective_diameter_90"].iloc[0] == float(_round_half_away(want_d, 6))
    assert out["avg_distance"].iloc[0] == float(_round_half_away(want_avg, 6))
    # a 120-vertex dense-ish random graph has a tiny effective diameter
    assert 0.0 < out["effective_diameter_90"].iloc[0] < 5.0


def test_q_effective_diameter_path_graph(ray_session, tmp_path):
    """On a 30-vertex path the effective diameter must be large (HLL noise
    cannot collapse a diameter-29 path below the round horizon)."""
    from pagerank_ray.pipelines.tabular import q_effective_diameter

    src = list(range(1, 30))
    dst = list(range(2, 31))
    _write_lineitem_edges(tmp_path, src, dst)
    out = q_effective_diameter(str(tmp_path), rounds=8)
    # after 8 rounds the ball is still growing: the 90% point sits near the
    # horizon, far above the random-graph regime
    assert out["effective_diameter_90"].iloc[0] > 4.0


# ---------------------------------------------------------------------------
# incremental (warm-start) PageRank
# ---------------------------------------------------------------------------


def _numpy_pagerank_steps(edges, vertices, r, iters, alpha=0.85):
    """Reference recurrence on the mass-n scale over an explicit vertex
    universe: r'(v) = (1-a) + a*D/n + a*sum_{u->v} r(u)/outdeg(u)."""
    idx = {v: i for i, v in enumerate(vertices)}
    n = len(vertices)
    out = np.zeros(n)
    for s, d in edges:
        out[idx[s]] += 1
    for _ in range(iters):
        nxt = np.full(n, 1 - alpha)
        dangling = r[out == 0].sum()
        nxt += alpha * dangling / n
        for s, d in edges:
            nxt[idx[d]] += alpha * r[idx[s]] / out[idx[s]]
        r = nxt
    return r


def test_q_pagerank_incremental_planted(ray_session, tmp_path):
    from pagerank_ray.functions.text import round_half_away
    from pagerank_ray.pipelines.tabular import q_pagerank_incremental

    rng = np.random.default_rng(31)
    m = 400
    src = rng.integers(1, 50, m)
    dst = rng.integers(51, 90, m)
    # first 60% of rows ship before the cutoff, the rest after
    pre = np.arange(m) < int(0.6 * m)
    dates = np.where(pre, np.datetime64("1995-06-01"), np.datetime64("1997-06-01"))
    tbl = pa.table(
        {
            "l_orderkey": pa.array(src, pa.int64()),
            "l_partkey": pa.array(dst, pa.int64()),
            "l_shipdate": pa.array(dates.astype("datetime64[us]")),
        }
    )
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))

    out = q_pagerank_incremental(str(tmp_path), base_iters=5, warm_iters=4)

    full = sorted(set(zip(src.tolist(), dst.tolist())))
    base = sorted(set(zip(src[pre].tolist(), dst[pre].tolist())))
    vertices = sorted({v for e in full for v in e})
    r = _numpy_pagerank_steps(base, vertices, np.ones(len(vertices)), 5)
    r = round_half_away(r, 6)
    r = _numpy_pagerank_steps(full, vertices, r, 4)
    want = round_half_away(r, 6)
    got = out.sort_values("id")["rank"].to_numpy()
    assert np.allclose(got, want, atol=2e-6)
    # warm start must beat a cold start at the same extra-iteration budget:
    # distance to the well-converged vector is smaller from the warm vector
    ref = _numpy_pagerank_steps(full, vertices, np.ones(len(vertices)), 60)
    cold = _numpy_pagerank_steps(full, vertices, np.ones(len(vertices)), 4)
    assert np.abs(r - ref).sum() < np.abs(cold - ref).sum()


def test_q_embedding_pca_planted(ray_session, tmp_path):
    """Fixed-point power-iteration PCA: replicate the exact integer
    algorithm in pure Python on a planted table (bit parity with the
    distributed engine), then sanity-check the direction against numpy's
    eigendecomposition of the centered covariance."""
    from pagerank_ray.pipelines.tabular import q_embedding_pca

    rng = np.random.RandomState(7)
    t_ = rng.randn(40)
    pts = np.outer(t_, np.array([0.6, 0.8, 0.0])) + 0.01 * rng.randn(40, 3)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(40), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in pts],
                              pa.list_(pa.float32())),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "embeddings.parquet"))
    out = q_embedding_pca(str(tmp_path))

    # pure-Python reference of the same fixed-point recurrence
    scale, target, iters = 10**4, 10**6, 6
    y = pts.astype(np.float32).astype(np.float64) * scale
    q = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(object)
    q = [[int(x) for x in row] for row in q]
    n, dim = len(q), 3
    S = [sum(q[i][j] for i in range(n)) for j in range(dim)]
    v = [1] * dim
    for _ in range(iters):
        p = [sum(q[i][j] * v[j] for j in range(dim)) for i in range(n)]
        a = [sum(q[i][j] * p[i] for i in range(n)) for j in range(dim)]
        sv = sum(S[j] * v[j] for j in range(dim))
        w = [n * a[j] - S[j] * sv for j in range(dim)]
        dv = max(1, max(abs(x) for x in w) // target)
        v = [(-((-x) // dv) if x < 0 else x // dv) for x in w]
    jm = max(range(dim), key=lambda j: (abs(v[j]), -j))
    if v[jm] < 0:
        v = [-x for x in v]
    assert list(out["v_fixed"]) == v
    assert list(out["dim"]) == [0, 1, 2]

    # direction agrees with numpy PCA of the float data
    x = pts - pts.mean(axis=0)
    evals, evecs = np.linalg.eigh(x.T @ x)
    pc1 = evecs[:, -1]
    got = np.asarray(out["component"], dtype=float)
    cos = abs(float(got @ pc1) / (np.linalg.norm(got) * np.linalg.norm(pc1)))
    assert cos > 0.999


def test_q_embedding_pca_axis_aligned(ray_session, tmp_path):
    """Variance concentrated on axis 1 → component ≈ e1 with positive sign
    (sign convention: largest-|v| coordinate made positive)."""
    from pagerank_ray.pipelines.tabular import q_embedding_pca

    vals = [[0.001, -0.9, 0.002], [0.0, 0.8, 0.0], [-0.002, -0.7, 0.001],
            [0.001, 0.95, -0.001]] * 5
    tbl = pa.table({
        "vec_id": pa.array(np.arange(20), pa.int64()),
        "embedding": pa.array(vals, pa.list_(pa.float32())),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "embeddings.parquet"))
    out = q_embedding_pca(str(tmp_path))
    comp = np.asarray(out["component"], dtype=float)
    assert abs(comp[1]) > 0.999 and comp[1] > 0
    assert abs(comp[0]) < 0.02 and abs(comp[2]) < 0.02


def test_harmonic_distributed_matches_tail(ray_session):
    """The h-accumulator riding inside the bucketed lanemax exchange must
    reproduce the single-task tail fold bit-for-bit."""
    import ray.data as rd

    from pagerank_ray.pipelines.hyperball import harmonic_centrality

    rng = np.random.default_rng(77)
    src = rng.integers(0, 80, 300)
    dst = rng.integers(0, 80, 300)
    edges = pa.table({
        "src_id": pa.array(src, pa.int64()),
        "dst_id": pa.array(dst, pa.int64()),
    })
    a = harmonic_centrality(rd.from_arrow(edges), rounds=3, k=15)
    b = harmonic_centrality(rd.from_arrow(edges), rounds=3, k=15, tail_cutoff=0)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


def test_harmonic_centrality_star_graph(ray_session):
    """Star graph: the hub reaches all n−1 spokes at distance 1; spokes reach
    the hub at 1 and each other at 2 — so the hub must rank first. Also
    pins the exact-integer fold: replicate H from per-round per-vertex
    estimates computed by the same public estimator."""
    import ray.data as rd

    from pagerank_ray.pipelines.hyperball import (
        _est_int_vec,
        _harmonic_weights,
        _init_state,
        _unpack,
        harmonic_centrality,
    )

    n = 30
    hub = 999
    spokes = np.arange(n, dtype=np.int64)
    edges = pa.table({
        "src_id": pa.array(np.full(n, hub), pa.int64()),
        "dst_id": pa.array(spokes, pa.int64()),
    })
    out = harmonic_centrality(rd.from_arrow(edges), rounds=3, k=n + 1)
    assert int(out.iloc[0]["id"]) == hub
    assert len(out) == n + 1

    # independent dense replay of the fold
    ids = np.unique(np.concatenate([np.full(n, hub), spokes]))
    init = _init_state(ids)
    regs = _unpack(
        init.column("pk0").to_numpy(zero_copy_only=False),
        init.column("pk1").to_numpy(zero_copy_only=False),
    )
    si = np.searchsorted(ids, np.full(n, hub))
    di = np.searchsorted(ids, spokes)
    v_idx = np.concatenate([si, di])
    x_idx = np.concatenate([di, si])
    W = _harmonic_weights(3)
    prev = _est_int_vec(regs)
    h = np.zeros(len(ids), np.int64)
    for t in range(1, 4):
        new = regs.copy()
        np.maximum.at(new, v_idx, regs[x_idx])
        regs = new
        e = _est_int_vec(regs)
        h += (e - prev) * np.int64(W[t - 1])
        prev = e
    want = dict(zip(ids.tolist(), h.tolist()))
    got = dict(zip(out["id"].tolist(), out["harmonic_scaled"].tolist()))
    assert got == want


def test_lin_closeness_distributed_matches_tail(ray_session):
    """Lin closeness (weights = t, reach carried as prev_e) must agree
    bit-for-bit between the bucketed distributed loop and the tail task."""
    import ray.data as rd

    from pagerank_ray.pipelines.hyperball import lin_closeness

    rng = np.random.default_rng(78)
    src = rng.integers(0, 80, 300)
    dst = rng.integers(0, 80, 300)
    edges = pa.table({
        "src_id": pa.array(src, pa.int64()),
        "dst_id": pa.array(dst, pa.int64()),
    })
    a = lin_closeness(rd.from_arrow(edges), rounds=3, k=15)
    b = lin_closeness(rd.from_arrow(edges), rounds=3, k=15, tail_cutoff=0)
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True), check_dtype=False
    )


def test_lin_closeness_two_components(ray_session):
    """Two disjoint cliques of different sizes: every vertex in the larger
    clique must outrank every vertex of the smaller one (Lin's point — reach
    dominates), and within a clique ties break by ascending id. Also pins
    the exact fold against a dense replay with weights t."""
    import ray.data as rd

    from pagerank_ray.pipelines.hyperball import (
        _est_int_vec,
        _init_state,
        _unpack,
        lin_closeness,
    )

    big = np.arange(12, dtype=np.int64)          # clique of 12: ids 0..11
    small = np.arange(100, 105, dtype=np.int64)  # clique of 5: ids 100..104
    pairs = []
    for grp in (big, small):
        for i in grp:
            for j in grp:
                if i < j:
                    pairs.append((i, j))
    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    edges = pa.table({
        "src_id": pa.array(src, pa.int64()),
        "dst_id": pa.array(dst, pa.int64()),
    })
    out = lin_closeness(rd.from_arrow(edges), rounds=3, k=17)
    ids_ranked = out["id"].to_numpy()
    assert set(ids_ranked[:12]) == set(big.tolist())
    assert set(ids_ranked[12:]) == set(small.tolist())

    # dense replay: weights = t, reach = final estimate
    ids = np.unique(np.concatenate([src, dst]))
    init = _init_state(ids)
    regs = _unpack(
        init.column("pk0").to_numpy(zero_copy_only=False),
        init.column("pk1").to_numpy(zero_copy_only=False),
    )
    si = np.searchsorted(ids, src)
    di = np.searchsorted(ids, dst)
    v_idx = np.concatenate([si, di])
    x_idx = np.concatenate([di, si])
    prev = _est_int_vec(regs)
    h = np.zeros(len(ids), np.int64)
    for t in range(1, 4):
        new = regs.copy()
        np.maximum.at(new, v_idx, regs[x_idx])
        regs = new
        e = _est_int_vec(regs)
        h += (e - prev) * np.int64(t)
        prev = e
    want_reach = dict(zip(ids.tolist(), prev.tolist()))
    want_sum = dict(zip(ids.tolist(), h.tolist()))
    for _, row in out.iterrows():
        assert int(row["reach_scaled"]) == want_reach[int(row["id"])]
        assert int(row["sumdist_scaled"]) == want_sum[int(row["id"])]


def test_window_active_users_planted(ray_session, tmp_path):
    """Hopping 24h/12h windows: an event lands in exactly the two windows
    covering it, per-window distinct users reflect only covered events, and
    the engine hash-matches the DuckDB oracle on the same file (the driver's
    check, in miniature)."""
    import duckdb

    from pagerank_ray.pipelines.tabular import q_window_active_users

    HOP = 43_200_000_000  # 12 h in µs
    # users 1..40 in half-day 0; users 1..10 again in half-day 1;
    # users 100..119 in half-day 4 (a gap: half-days 2-3 empty)
    rows = (
        [(u, 0 * HOP + 7) for u in range(1, 41)]
        + [(u, 1 * HOP + 7) for u in range(1, 11)]
        + [(u, 4 * HOP + 7) for u in range(100, 120)]
    )
    _write_events(tmp_path, [r[0] for r in rows], ["view"] * len(rows),
                  [r[1] for r in rows])
    out = q_window_active_users(str(tmp_path))
    # windows present: each occupied half-day h yields starts h·HOP and (h−1)·HOP
    assert set(out["window_start"]) == {-HOP, 0, HOP, 3 * HOP, 4 * HOP}
    est = dict(zip(out["window_start"], out["estimate"]))
    # p=12 linear counting is near-exact at these cardinalities
    assert abs(est[-HOP] - 40) < 1.0        # covers half-day 0 only
    assert abs(est[0] - 40) < 1.0           # covers half-days 0+1: union is 40
    assert abs(est[HOP] - 10) < 1.0         # half-day 1 only
    assert abs(est[4 * HOP] - 20) < 1.0     # half-day 4 only

    import __ray_entry__ as entry

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{os.path.join(str(tmp_path), 'events.parquet')}')")
    want = con.sql(entry.oracle_sql()["window_active_users"]).df()
    got = out.reset_index(drop=True)
    assert list(got["window_start"]) == list(want["window_start"])
    assert list(got["m"]) == list(want["m"])
    assert list(got["estimate"]) == list(want["estimate"])


def test_coloring_distributed_matches_tail(ray_session):
    """The per-round distributed JP path (grouped-min readiness + incremental
    forbidden-pair mex) must reproduce the single-task tail bit-for-bit, and
    the result must be a proper coloring consistent with greedy mex."""
    import ray.data as rd

    from pagerank_ray.pipelines.coloring import greedy_coloring

    rng = np.random.default_rng(79)
    src = rng.integers(0, 60, 240)
    dst = rng.integers(0, 60, 240)
    edges = pa.table({
        "src_id": pa.array(src, pa.int64()),
        "dst_id": pa.array(dst, pa.int64()),
    })
    a, _ = greedy_coloring(rd.from_arrow(edges), tail_cutoff=10**9)  # all tail
    b, rounds = greedy_coloring(rd.from_arrow(edges), tail_cutoff=0)  # all distributed
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert rounds > 1
    # properness over the simple undirected graph
    cmap = dict(zip(a["id"], a["color"]))
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            assert cmap[s] != cmap[d]


def test_coloring_star_and_isolated(ray_session):
    """Star + a self-loop-only vertex: the hub and spokes 2-color; the
    self-loop vertex is independent (loop dropped) and takes color 0."""
    import ray.data as rd

    from pagerank_ray.pipelines.coloring import greedy_coloring

    n = 12
    hub = 500
    spokes = np.arange(n, dtype=np.int64)
    edges = pa.table({
        "src_id": pa.array(np.concatenate([np.full(n, hub), [999]]), pa.int64()),
        "dst_id": pa.array(np.concatenate([spokes, [999]]), pa.int64()),
    })
    out, _ = greedy_coloring(rd.from_arrow(edges), tail_cutoff=0)
    cmap = dict(zip(out["id"], out["color"]))
    assert cmap[999] == 0
    assert all(cmap[int(s)] != cmap[hub] for s in spokes)
    assert out["color"].max() <= 1  # star is 2-colorable and JP achieves it


def test_tokenizer_fertility_planted(ray_session, tmp_path):
    """Hand-computed fertility on a two-language corpus: per-lang integer
    sums and the two mirrored ratios, with an empty doc and a NULL-free
    byte-length check on non-ASCII text."""
    from pagerank_ray.functions.bpe import BPETokenizer
    from pagerank_ray.pipelines.tabular import q_tokenizer_fertility

    docs = [
        (1, "hello world", "en"),
        (2, "", "en"),
        (3, "café au lait", "fr"),
    ]
    tbl = pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
        "lang": pa.array([d[2] for d in docs], pa.string()),
        "source": pa.array(["t"] * 3, pa.string()),
        "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_tokenizer_fertility(str(tmp_path)).set_index("lang")

    tok = BPETokenizer()
    import re as _re
    from pagerank_ray.functions.bpe import PRETOKEN_RE
    pat = _re.compile(PRETOKEN_RE)

    def n_bpe(s):
        return sum(tok.n_tokens_word(w) for w in pat.findall(s))

    en_tok = n_bpe("hello world") + n_bpe("")
    fr_tok = n_bpe("café au lait")
    assert out.loc["en", "n_docs"] == 2
    assert out.loc["en", "n_tokens"] == en_tok
    assert out.loc["en", "n_words"] == 2
    assert out.loc["en", "n_bytes"] == len("hello world")
    assert out.loc["fr", "n_words"] == 3
    assert out.loc["fr", "n_bytes"] == len("café au lait".encode())
    assert out.loc["fr", "n_tokens"] == fr_tok
    assert out.loc["en", "fertility"] == round(en_tok / 2, 6)
    assert out.loc["fr", "bytes_per_token"] == round(
        len("café au lait".encode()) / fr_tok, 6)


def test_matching_distributed_matches_tail(ray_session):
    """Distributed handshake rounds (grouped-argmin + best-pair attaches)
    must reproduce the single-task tail bit-for-bit; the result must be a
    valid MAXIMAL matching."""
    import ray.data as rd

    from pagerank_ray.pipelines.matching import maximal_matching

    rng = np.random.default_rng(80)
    src = rng.integers(0, 70, 260)
    dst = rng.integers(0, 70, 260)
    edges = pa.table({
        "src_id": pa.array(src, pa.int64()),
        "dst_id": pa.array(dst, pa.int64()),
    })
    a, _ = maximal_matching(rd.from_arrow(edges), tail_cutoff=10**9)
    b, rounds = maximal_matching(rd.from_arrow(edges), tail_cutoff=0)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert rounds >= 1
    # matching: each vertex appears at most once
    touched = np.concatenate([a["a"].to_numpy(), a["b"].to_numpy()])
    assert len(touched) == len(np.unique(touched))
    # maximality: every simple undirected edge touches a matched vertex
    tset = set(touched.tolist())
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            assert s in tset or d in tset


def test_matching_path_graph(ray_session):
    """Path 0-1-2-3: a maximal matching has ≥ 1 edge and ≤ 2 edges; a
    perfect matching {0-1, 2-3} is the unique MAXIMUM; the deterministic
    rule must at least be maximal and vertex-disjoint."""
    import ray.data as rd

    from pagerank_ray.pipelines.matching import maximal_matching

    edges = pa.table({
        "src_id": pa.array([0, 1, 2], pa.int64()),
        "dst_id": pa.array([1, 2, 3], pa.int64()),
    })
    out, _ = maximal_matching(rd.from_arrow(edges), tail_cutoff=0)
    touched = np.concatenate([out["a"].to_numpy(), out["b"].to_numpy()])
    assert len(touched) == len(np.unique(touched))
    assert 1 <= len(out) <= 2
    # maximality on the path: if only one edge is matched it must be 1-2
    if len(out) == 1:
        assert (int(out.iloc[0]["a"]), int(out.iloc[0]["b"])) == (1, 2)


def test_shuffle_shards_manifest(ray_session, tmp_path):
    """The manifest is a permutation: every doc appears once, per-shard
    positions are 0..len(shard)-1, shard assignment matches fmix64 mod 16,
    and re-running yields the byte-identical order (epoch resumption)."""
    from pagerank_ray.functions.text import fmix64
    from pagerank_ray.pipelines.tabular import q_shuffle_shards

    ids = np.arange(100, 400, 3, dtype=np.int64)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["x"] * len(ids), pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["t"] * len(ids), pa.string()),
        "n_chars": pa.array(np.ones(len(ids), np.int64), pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_shuffle_shards(str(tmp_path))
    assert sorted(out["doc_id"]) == sorted(ids.tolist())
    want_shard = (fmix64(ids.astype(np.uint64)) % np.uint64(16)).astype(np.int64)
    got = out.set_index("doc_id")
    assert (got.loc[ids, "shard"].to_numpy() == want_shard).all()
    for s, sub in out.groupby("shard"):
        assert sorted(sub["pos"]) == list(range(len(sub)))
    out2 = q_shuffle_shards(str(tmp_path))
    pd.testing.assert_frame_equal(out, out2)


def test_coarsen_by_matching_planted(ray_session):
    """Path 0-1-2-3 plus a parallel pair of edges: contraction maps matched
    b→a, drops intra-pair self-edges, and sums parallel coarse edges into
    exact integer weights; vertex count shrinks by the number of pairs."""
    import ray.data as rd

    from pagerank_ray.pipelines.matching import coarsen_by_matching, maximal_matching

    edges = pa.table({
        "src_id": pa.array([0, 1, 2, 0, 3], pa.int64()),
        "dst_id": pa.array([1, 2, 3, 1, 2], pa.int64()),
    })
    pairs, _ = maximal_matching(rd.from_arrow(edges), tail_cutoff=0)
    coarse, _ = coarsen_by_matching(rd.from_arrow(edges), tail_cutoff=0)
    mp = dict(zip(pairs["b"], pairs["a"]))

    def sv(v):
        return mp.get(v, v)

    # independent contraction of the simple undirected edge set
    want: dict = {}
    for s, d in {(0, 1), (1, 2), (2, 3)}:
        ca, cb = sorted((sv(s), sv(d)))
        if ca != cb:
            want[(ca, cb)] = want.get((ca, cb), 0) + 1
    got = {(int(r["ca"]), int(r["cb"])): int(r["weight"])
           for _, r in coarse.iterrows()}
    assert got == want
    n_orig = 4
    n_coarse = len({sv(v) for v in range(4)})
    assert n_coarse == n_orig - len(pairs)


def test_mex_kernel_property():
    """_mex_from_pairs vs the obvious per-id set-walk mex on random pairs,
    including duplicate pairs, color 0 gaps, and contiguous prefixes."""
    from pagerank_ray.pipelines.coloring import _mex_from_pairs

    rng = np.random.default_rng(81)
    for trial in range(25):
        n_ids = int(rng.integers(1, 12))
        n_pairs = int(rng.integers(0, 60))
        rv = rng.integers(0, n_ids, n_pairs).astype(np.int64)
        rc = rng.integers(0, 6, n_pairs).astype(np.int64)
        ids, mex = _mex_from_pairs(rv.copy(), rc.copy())
        got = dict(zip(ids.tolist(), mex.tolist()))
        want = {}
        for v in set(rv.tolist()):
            used = set(rc[rv == v].tolist())
            m = 0
            while m in used:
                m += 1
            want[v] = m
        assert got == want


def test_match_round_kernel_property():
    """_match_round_np winners are exactly the edges that are rank-1 by
    (h, a, b) at BOTH endpoints — cross-checked against a per-vertex dict
    walk; winners are always vertex-disjoint and include the global
    minimum-priority edge."""
    from pagerank_ray.pipelines.matching import _edge_prio, _match_round_np

    rng = np.random.default_rng(82)
    for trial in range(25):
        n_e = int(rng.integers(1, 80))
        A = rng.integers(0, 30, n_e).astype(np.int64)
        B = (rng.integers(0, 30, n_e) + 30).astype(np.int64)  # bipartite, a<b
        pairs = np.unique(np.stack([A, B], 1), axis=0)
        A, B = pairs[:, 0], pairs[:, 1]
        h = _edge_prio(A, B)
        win = _match_round_np(A, B, h)
        keys = list(zip(h.tolist(), A.tolist(), B.tolist()))
        best: dict = {}
        for i, (hh, a, b) in enumerate(keys):
            for v in (a, b):
                if v not in best or keys[i] < keys[best[v]]:
                    best[v] = i
        want = np.array([best[a] == i and best[b] == i
                         for i, (hh, a, b) in enumerate(keys)])
        assert (win == want).all()
        touched = np.concatenate([A[win], B[win]])
        assert len(touched) == len(np.unique(touched))
        assert win[int(np.lexsort((B, A, h))[0])]


def test_quantiles_grouped_matches_ungrouped_on_single_group(ray_session, tmp_path):
    """A one-group table: the grouped sketch must equal the ungrouped sketch
    value-for-value (same bin geometry, same closed form); estimates sit
    within one bin width of the exact quantiles."""
    import ray.data as rd

    from pagerank_ray.stages.quantiles import (
        approx_quantiles_grouped,
        approx_quantiles_histogram,
    )

    rng = np.random.default_rng(83)
    x = rng.gamma(2.0, 10.0, 5000)
    tbl = pa.table({
        "v": pa.array(x, pa.float64()),
        "g": pa.array(["only"] * len(x), pa.string()),
    })
    ds = rd.from_arrow(tbl)
    qs = [0.5, 0.9, 0.99]
    a = approx_quantiles_histogram(ds, "v", qs, n_bins=512)
    b = approx_quantiles_grouped(ds, "v", "g", qs, n_bins=512)
    assert list(a["estimate"]) == list(b["estimate"])
    width = (x.max() - x.min()) / 512
    for q, est in zip(b["q"], b["estimate"]):
        assert abs(est - np.quantile(x, q)) <= 2 * width


def test_decayed_activity_planted(ray_session, tmp_path):
    """Three events for u1 at 0h/24h/48h before the corpus end, one for u2
    at the end: u1's score is 1e9·(2^-2 + 2^-1 + 1) exactly; u2's is 1e9."""
    from pagerank_ray.pipelines.tabular import q_decayed_activity

    DAY = 86_400_000_000
    t_end = 10 * DAY
    rows = [(1, t_end - 2 * DAY), (1, t_end - DAY), (1, t_end), (2, t_end)]
    _write_events(tmp_path, [r[0] for r in rows], ["view"] * 4,
                  [r[1] for r in rows])
    out = q_decayed_activity(str(tmp_path)).set_index("user_id")
    assert out.loc[1, "n_events"] == 3
    assert out.loc[1, "decayed_scaled"] == 250_000_000 + 500_000_000 + 1_000_000_000
    assert out.loc[2, "decayed_scaled"] == 1_000_000_000


def test_robust_stats_sanity(ray_session, tmp_path):
    """Median/MAD from the two-pass sketch sit within 2 bin widths of the
    exact values, and MAD shrugs off a gross outlier that wrecks stddev."""
    from pagerank_ray.pipelines.tabular import q_robust_price_stats

    rng = np.random.default_rng(84)
    x = np.concatenate([rng.normal(100.0, 5.0, 4000), [1e6]])  # one outlier
    n = len(x)
    tbl = pa.table({
        "l_extendedprice": pa.array(x, pa.float64()),
        "l_returnflag": pa.array(["A"] * n, pa.string()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_robust_price_stats(str(tmp_path)).iloc[0]
    assert out["n"] == n
    w1 = (x.max() - x.min()) / 2048
    assert abs(out["median_est"] - np.median(x)) <= 2 * w1
    # the sketch resolves to one bin; the outlier stretches pass-2's range,
    # so the bound is bin width — still far below the stddev it inflates
    exact_mad = np.median(np.abs(x - np.median(x)))
    assert abs(out["mad_est"] - exact_mad) <= 2 * w1
    assert out["mad_est"] < 0.1 * np.std(x)


def test_partition_edge_cut_invariants(ray_session, tmp_path):
    """Counters reconcile: Σ n_vertices = n, Σ internal + Σ cut/2 = simple
    undirected edge count, cut_fraction = (Σ cut/2) / total; parts match
    the shared fmix64 hash."""
    from pagerank_ray.functions.text import fmix64
    from pagerank_ray.pipelines.tabular import q_partition_edge_cut

    rng = np.random.default_rng(85)
    s = rng.integers(0, 200, 600)
    d = rng.integers(0, 200, 600)
    tbl = pa.table({
        "l_orderkey": pa.array(s, pa.int64()),
        "l_partkey": pa.array(d, pa.int64()),
        # lineitem_edges may read more columns; provide the usual suspects
        "l_quantity": pa.array(np.ones(600), pa.float64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_partition_edge_cut(str(tmp_path))
    ids = np.unique(np.concatenate([s, d]))
    a = np.minimum(s, d); b = np.maximum(s, d)
    und = np.unique(np.stack([a[a != b], b[a != b]], 1), axis=0)
    assert out["n_vertices"].sum() == len(ids)
    assert out["internal_edges"].sum() + out["cut_edges"].sum() // 2 == len(und)
    part = (fmix64(ids.astype(np.uint64)) % np.uint64(16)).astype(np.int64)
    vcount = np.bincount(part, minlength=16)
    assert (out.sort_values("part")["n_vertices"].to_numpy() == vcount).all()
    tc = out["cut_edges"].sum() // 2
    assert out["cut_fraction"].iloc[0] == round(tc / len(und), 6)


def test_vertex_cover_covers_all_edges(ray_session, tmp_path):
    """Gavril bound: the matched-endpoint set covers every simple edge, and
    |cover| = 2·|matching| exactly (both endpoints of each matched edge)."""
    from pagerank_ray.pipelines.tabular import q_vertex_cover
    from pagerank_ray.pipelines.matching import maximal_matching
    import ray.data as rd

    rng = np.random.default_rng(86)
    s = rng.integers(0, 120, 400)
    d = rng.integers(0, 120, 400)
    tbl = pa.table({
        "l_orderkey": pa.array(s, pa.int64()),
        "l_partkey": pa.array(d, pa.int64()),
        "l_quantity": pa.array(np.ones(400), pa.float64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    cover = set(q_vertex_cover(str(tmp_path))["id"].tolist())
    edges = pa.table({"src_id": pa.array(s, pa.int64()),
                      "dst_id": pa.array(d, pa.int64())})
    pairs, _ = maximal_matching(rd.from_arrow(edges), tail_cutoff=10**9)
    assert len(cover) == 2 * len(pairs)
    for a, b in zip(s.tolist(), d.tolist()):
        if a != b:
            assert a in cover or b in cover


# ---------------------------------------------------------------------------
# WebGraph gap+varint adjacency compression audit (graph_compress)
# ---------------------------------------------------------------------------


def test_q_graph_compress_planted(ray_session, tmp_path):
    """Hand-computed byte counts: src 1 -> [1,2,130] codes (2,1,128) =
    1+1+2 bytes, deg 3 -> bin 1; src 2 -> [200] codes (201,) = 2 bytes,
    deg 1 -> bin 0; src 3 -> [5,6,7,8] codes (6,1,1,1) = 4 bytes, deg 4
    -> bin 2. Duplicate edge (1,2) must not create a zero gap."""
    from pagerank_ray.pipelines.tabular import q_graph_compress

    edges = [(1, 1), (1, 2), (1, 130), (2, 200), (1, 2),
             (3, 5), (3, 6), (3, 7), (3, 8)]
    tbl = pa.table({
        "l_orderkey": pa.array([e[0] for e in edges], pa.int64()),
        "l_partkey": pa.array([e[1] for e in edges], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_graph_compress(str(tmp_path)).set_index("degree_bin")
    assert out.loc[0, ["n_src", "n_edges", "total_bytes"]].tolist() == [1, 1, 2]
    assert out.loc[0, "bits_per_edge"] == 16.0
    assert out.loc[1, ["n_src", "n_edges", "total_bytes"]].tolist() == [1, 3, 4]
    assert out.loc[2, ["n_src", "n_edges", "total_bytes"]].tolist() == [1, 4, 4]
    assert out.loc[2, "bits_per_edge"] == 8.0


def test_q_graph_compress_varint_thresholds(ray_session, tmp_path):
    """First-value encoding crosses every varint boundary exactly at
    2^(7k): dst+1 = 128 costs 2 bytes while 127 costs 1, etc."""
    from pagerank_ray.pipelines.tabular import q_graph_compress

    dsts = [126, 127, 16382, 16383, 2097150, 2097151]
    # each as its own singleton src: val = dst + 1
    tbl = pa.table({
        "l_orderkey": pa.array(list(range(1, len(dsts) + 1)), pa.int64()),
        "l_partkey": pa.array(dsts, pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_graph_compress(str(tmp_path))
    assert out["degree_bin"].tolist() == [0]
    # 127->1, 128->2, 16383->2, 16384->3, 2097151->3, 2097152->4
    assert out.loc[0, "total_bytes"] == 1 + 2 + 2 + 3 + 3 + 4


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram probabilities (kn_bigrams)
# ---------------------------------------------------------------------------


def test_q_kn_bigrams_planted(ray_session, tmp_path):
    """Hand-computed KN: docs 'a b a b a c' + 'b c' give the distinct
    bigram table {(a,b):2,(b,a):2,(a,c):1,(b,c):1}, ntot=4,
    c(a·)=c(b·)=3, N1+(a·)=N1+(b·)=2, N1+(·a)=N1+(·b)=1, N1+(·c)=2:
    P(a,b)=1.25/3+0.5·0.25=0.541667; P(a,c)=0.25/3+0.5·0.5=0.333333."""
    from pagerank_ray.pipelines.tabular import q_kn_bigrams

    _write_docs_src(tmp_path, ["a b a b a c", "b c"], ["s", "s"])
    out = q_kn_bigrams(str(tmp_path), min_cnt=1, k=10)
    got = list(zip(out["w1"], out["w2"], out["n_pair"], out["p_kn"]))
    assert got == [
        ("a", "b", 2, 0.541667),
        ("b", "a", 2, 0.541667),
        ("a", "c", 1, 0.333333),
        ("b", "c", 1, 0.333333),
    ]


def test_q_kn_bigrams_no_cross_doc_pairs(ray_session, tmp_path):
    """The last token of one doc never pairs with the first of the next."""
    from pagerank_ray.pipelines.tabular import q_kn_bigrams

    _write_docs_src(tmp_path, ["x y", "z w"], ["s", "s"])
    out = q_kn_bigrams(str(tmp_path), min_cnt=1, k=10)
    pairs = set(zip(out["w1"], out["w2"]))
    assert pairs == {("x", "y"), ("z", "w")}


# ---------------------------------------------------------------------------
# Bipartite butterfly census (butterflies)
# ---------------------------------------------------------------------------


def test_q_butterflies_planted(ray_session, tmp_path):
    """o1,o2,o3 all contain {p1,p2}; o3 adds p3: co(p1,p2)=3 -> C(3,2)=3
    butterflies; L3 = 2+2+2+2+4+4+0 = 16; cc4 = 12/16 = 0.75."""
    from pagerank_ray.pipelines.tabular import q_butterflies

    edges = [(1, 11), (1, 12), (2, 11), (2, 12), (3, 11), (3, 12), (3, 13),
             (1, 11)]  # duplicate edge must not change counts
    tbl = pa.table({
        "l_orderkey": pa.array([e[0] for e in edges], pa.int64()),
        "l_partkey": pa.array([e[1] for e in edges], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_butterflies(str(tmp_path))
    assert out.iloc[0].tolist() == [3, 16, 0.75, 3]


def test_q_butterflies_no_cycles(ray_session, tmp_path):
    """A star (one order, many parts) has wedges but zero butterflies and
    zero 3-paths (every part has degree 1) -> cc4 = 0 sentinel."""
    from pagerank_ray.pipelines.tabular import q_butterflies

    edges = [(1, p) for p in range(10, 16)]
    tbl = pa.table({
        "l_orderkey": pa.array([e[0] for e in edges], pa.int64()),
        "l_partkey": pa.array([e[1] for e in edges], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_butterflies(str(tmp_path))
    assert out.iloc[0].tolist() == [0, 0, 0.0, 1]


# ---------------------------------------------------------------------------
# Corpus TextRank keywords (textrank_keywords)
# ---------------------------------------------------------------------------


def test_q_textrank_planted_two_rounds(ray_session, tmp_path):
    """Star a-{b,c}: wdeg a=2, b=c=1. Round 1: s_a = 150000+(85*2e6)//100
    = 1850000, s_b = 150000+(85*(1e6//2))//100 = 575000. Round 2:
    s_a = 150000+(85*1150000)//100 = 1127500, s_b = 150000+(85*925000)//100
    = 936250."""
    from pagerank_ray.pipelines.tabular import q_textrank_keywords

    _write_docs_src(tmp_path, ["a b", "a c"], ["s", "s"])
    out = q_textrank_keywords(str(tmp_path), iters=2, k=10)
    got = dict(zip(out["term"], out["score"]))
    assert got == {"a": 1127500, "b": 936250, "c": 936250}
    assert out["term"].tolist() == ["a", "b", "c"]  # tie-break term asc


def test_q_textrank_uniform_fixed_point(ray_session, tmp_path):
    """A regular graph (single pair) is a fixed point at exactly 10^6,
    and self-pairs ('a a') contribute no edge."""
    from pagerank_ray.pipelines.tabular import q_textrank_keywords

    _write_docs_src(tmp_path, ["a b a b", "x x x"], ["s", "s"])
    out = q_textrank_keywords(str(tmp_path), iters=5, k=10)
    got = dict(zip(out["term"], out["score"]))
    assert got == {"a": 1000000, "b": 1000000}  # 'x' has no co-occurrence vertex


def test_grouped_sum_rejects_string_keys(ray_session):
    """String keys would silently become string-repetition hangs; the
    guard fails loudly instead."""
    import ray.data as rd
    from pagerank_ray.stages.graph_build import grouped_sum

    ds = rd.from_items([{"k": "abc", "v": 1}, {"k": "abc", "v": 2}])
    with pytest.raises((TypeError, Exception), match="integer key"):
        grouped_sum(ds, "k", "v", "s").to_pandas()


# ---------------------------------------------------------------------------
# 2-D skyline / Pareto front (skyline_parts)
# ---------------------------------------------------------------------------


def _write_parts(tmp_path, rows):
    tbl = pa.table({
        "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "p_name": pa.array(["p%d" % r[0] for r in rows]),
        "p_brand": pa.array(["b"] * len(rows)),
        "p_type": pa.array(["t"] * len(rows)),
        "p_size": pa.array([r[1] for r in rows], pa.int64()),
        "p_retailprice": pa.array([float(r[2]) for r in rows], pa.float64()),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "part.parquet"))


def test_q_skyline_planted(ray_session, tmp_path):
    """(key, size, price): exact-duplicate front points are BOTH kept;
    equal-price larger size and dominated interior points drop."""
    from pagerank_ray.pipelines.tabular import q_skyline_parts

    rows = [
        (1, 5, 10.0),   # front
        (2, 5, 10.0),   # exact duplicate of 1 -> also front
        (3, 7, 10.0),   # same price, larger size -> dominated by 1
        (4, 3, 20.0),   # front (cheaper points all have size 5 > 3)
        (5, 4, 30.0),   # dominated by 4 (price 20<30, size 3<4)
        (6, 2, 30.0),   # front
        (7, 5, 15.0),   # dominated by 1 (10<=15, 5<=5, strict on price)
    ]
    _write_parts(tmp_path, rows)
    out = q_skyline_parts(str(tmp_path))
    assert out["p_partkey"].tolist() == [1, 2, 4, 6]


def test_q_skyline_single_point_and_column_order(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_skyline_parts

    _write_parts(tmp_path, [(9, 1, 1.0)])
    out = q_skyline_parts(str(tmp_path))
    assert out.columns.tolist() == ["p_partkey", "p_size", "p_retailprice"]
    assert out.iloc[0].tolist() == [9, 1, 1.0]


# ---------------------------------------------------------------------------
# Per-source document budget (per_source_cap)
# ---------------------------------------------------------------------------


def test_q_per_source_cap_planted(ray_session, tmp_path):
    """Source 'big' (8 docs) is capped to 3 by fmix64 rank; 'small'
    (2 docs) keeps both; the draw matches a NumPy replay exactly."""
    from pagerank_ray.functions.text import fmix64
    from pagerank_ray.pipelines.tabular import q_per_source_cap

    texts = ["t%d" % i for i in range(10)]
    srcs = ["big"] * 8 + ["small"] * 2
    _write_docs_src(tmp_path, texts, srcs)
    out = q_per_source_cap(str(tmp_path), cap=3)
    ids = np.arange(1, 11, dtype=np.int64)
    h = fmix64(ids.astype(np.uint64))
    big = sorted(ids[:8][np.lexsort((ids[:8], h[:8]))][:3].tolist())
    assert out[out.source == "big"]["doc_id"].tolist() == big
    assert out[out.source == "small"]["doc_id"].tolist() == [9, 10]
    assert out["source"].tolist() == ["big"] * 3 + ["small"] * 2


# ---------------------------------------------------------------------------
# Per-user event transition matrix (event_transitions)
# ---------------------------------------------------------------------------


def test_q_event_transitions_planted(ray_session, tmp_path):
    """User 1: a->b->a (pairs ab, ba); user 2: a->c. No cross-user pair.
    P(b|a)=0.5, P(c|a)=0.5, P(a|b)=1.0. Tie timestamps order by event_id."""
    from pagerank_ray.pipelines.tabular import q_event_transitions

    ts = pd.to_datetime([
        "2026-01-01 00:00:00", "2026-01-01 00:00:01", "2026-01-01 00:00:01",
        "2026-01-02 00:00:00", "2026-01-02 00:00:05",
    ])
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "a", "c"]),
        "value": pa.array([0.0] * 5, pa.float64()),
        "props": pa.array(["{}"] * 5),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))
    out = q_event_transitions(str(tmp_path))
    got = list(zip(out["cur"], out["next"], out["n"], out["p"]))
    assert got == [
        ("a", "b", 1, 0.5),
        ("a", "c", 1, 0.5),
        ("b", "a", 1, 1.0),
    ]


def test_q_table_profile_planted_with_nulls(ray_session, tmp_path):
    """4 rows, one null per nullable column; distinct counts exclude nulls
    (SQL COUNT(DISTINCT) semantics). Float repr injectivity: 1.5 vs 1.50
    are the same double, counted once."""
    from pagerank_ray.pipelines.tabular import q_table_profile

    tbl = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 10, None, 20], pa.int64()),
        "o_orderstatus": pa.array(["O", "F", "O", None]),
        "o_totalprice": pa.array([1.5, 1.50, 2.25, None], pa.float64()),
        "o_orderdate": pa.array(
            pd.to_datetime(["2026-01-01", "2026-01-01", None, "2026-01-02"]),
            pa.timestamp("us"),
        ),
        "o_orderpriority": pa.array(["1-URGENT"] * 4),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "orders.parquet"))
    out = q_table_profile(str(tmp_path))
    assert list(out["col_name"]) == sorted(tbl.column_names)
    rec = {r.col_name: (r.n_rows, r.n_null, r.n_distinct) for r in out.itertuples()}
    assert rec["o_orderkey"] == (4, 0, 4)
    assert rec["o_custkey"] == (4, 1, 2)
    assert rec["o_orderstatus"] == (4, 1, 2)
    assert rec["o_totalprice"] == (4, 1, 2)
    assert rec["o_orderdate"] == (4, 1, 2)
    assert rec["o_orderpriority"] == (4, 0, 1)
    assert all(out[c].dtype == np.int64 for c in ("n_rows", "n_null", "n_distinct"))


def test_q_orders_reconciliation_all_categories(ray_session, tmp_path):
    """Orders 1,2,3; lineitems for 1 (two rows) and 9 (one row, no order):
    matched={1}, order_only={2,3}, lineitem_only={9}. Revenue is cents-exact:
    10.005*(1-0.0) → 1001 cents (half-away), plus 5.00 → 500."""
    from pagerank_ray.pipelines.tabular import q_orders_reconciliation

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 9], pa.int64()),
        "l_extendedprice": pa.array([10.005, 5.0, 7.25], pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0], pa.float64()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_orders_reconciliation(str(tmp_path))
    rec = {r.cat: (r.n_keys, r.n_lineitems, r.revenue) for r in out.itertuples()}
    assert rec["matched"] == (1, 2, 15.01)
    assert rec["order_only"] == (2, 0, 0.0)
    assert rec["lineitem_only"] == (1, 1, 7.25)
    assert list(out["cat"]) == ["lineitem_only", "matched", "order_only"]


def test_q_interarrival_stats_planted(ray_session, tmp_path):
    """User 1: a @0s → b @10s → a @40s (gaps 10 to b, 30 to a); user 2: one
    event (no pair). Ties impossible here; gap goes to the LATER event."""
    from pagerank_ray.pipelines.tabular import q_interarrival_stats

    ts = pd.to_datetime([
        "2026-01-01 00:00:00", "2026-01-01 00:00:10", "2026-01-01 00:00:40",
        "2026-01-05 12:00:00",
    ])
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "a"]),
        "value": pa.array([0.0] * 4, pa.float64()),
        "props": pa.array(["{}"] * 4),
    }), os.path.join(str(tmp_path), "events.parquet"))
    out = q_interarrival_stats(str(tmp_path))
    got = list(zip(out["event_type"], out["n_pairs"], out["mean_gap_s"], out["max_gap_s"]))
    assert got == [("a", 1, 30.0, 30.0), ("b", 1, 10.0, 10.0)]


def test_q_lineitem_hist2d_planted(ray_session, tmp_path):
    """q=4.9 → bin 0, q=5 → bin 1, q=50 → bin 10; d=0.05 (stored as the
    nearest double) → bin 5 via half-away rounding on both engines."""
    from pagerank_ray.pipelines.tabular import q_lineitem_hist2d

    pq.write_table(pa.table({
        "l_quantity": pa.array([4.9, 5.0, 50.0, 50.0], pa.float64()),
        "l_discount": pa.array([0.05, 0.0, 0.1, 0.1], pa.float64()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_lineitem_hist2d(str(tmp_path))
    got = list(zip(out["qty_bin"], out["disc_bin"], out["n"]))
    assert got == [(0, 5, 1), (1, 0, 1), (10, 10, 2)]


def test_q_changelog_compact_planted(ray_session, tmp_path):
    """User 1 has 3 versions; tie on ts between event_id 2 and 3 resolves to
    the higher event_id. User 2 has a single version."""
    from pagerank_ray.pipelines.tabular import q_changelog_compact

    ts = pd.to_datetime([
        "2026-01-01 00:00:00", "2026-01-02 00:00:00", "2026-01-02 00:00:00",
        "2026-01-01 00:00:00",
    ])
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "c", "d"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        "props": pa.array(["{}"] * 4),
    }), os.path.join(str(tmp_path), "events.parquet"))
    out = q_changelog_compact(str(tmp_path))
    got = list(zip(out["user_id"], out["last_event_type"], out["last_value"], out["n_versions"]))
    assert got == [(1, "c", 3.0, 3), (2, "d", 4.0, 1)]


def test_q_revenue_mom_growth_gap_month(ray_session, tmp_path):
    """Jan 100.00, Feb 150.00 (growth 0.5), April 90.00 — March missing, so
    April's growth is NULL (no previous calendar month)."""
    from pagerank_ray.pipelines.tabular import q_revenue_mom_growth

    dates = pd.to_datetime(["2026-01-15", "2026-02-10", "2026-04-01"])
    pq.write_table(pa.table({
        "o_orderdate": pa.array(dates, pa.timestamp("us")),
        "o_totalprice": pa.array([100.0, 150.0, 90.0], pa.float64()),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    out = q_revenue_mom_growth(str(tmp_path))
    assert list(out["revenue"]) == [100.0, 150.0, 90.0]
    assert np.isnan(out["growth"].iloc[0])
    assert out["growth"].iloc[1] == 0.5
    assert np.isnan(out["growth"].iloc[2])


def test_q_lang_vocab_overlap_partial(ray_session, tmp_path):
    """en={a,b,c}, fr={b,c,d}, zh={x} → en∩fr={b,c} (J=2/4=0.5); zh shares
    nothing and must be absent from the pair list."""
    from pagerank_ray.pipelines.tabular import q_lang_vocab_overlap

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c", "b  c d", "x", ""]),
        "lang": pa.array(["en", "fr", "zh", "en"]),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([5, 6, 1, 0], pa.int64()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    out = q_lang_vocab_overlap(str(tmp_path))
    got = list(zip(out["lang_a"], out["lang_b"], out["n_common"], out["n_union"], out["jaccard"]))
    assert got == [("en", "fr", 2, 4, 0.5)]


def test_q_label_centroids_planted(ray_session, tmp_path):
    """Label 1: vectors (1.0, -0.5) and (2.0, 0.5) → centroid (1.5, 0.0);
    label 2: one vector. Quantization at scale 1e4 is exact here."""
    from pagerank_ray.pipelines.tabular import q_label_centroids

    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 3], pa.int64()),
        "embedding": pa.array([[1.0, -0.5], [2.0, 0.5], [0.25, 0.75]],
                              pa.list_(pa.float32())),
        "label": pa.array([1, 1, 2], pa.int32()),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    out = q_label_centroids(str(tmp_path))
    got = list(zip(out["label"], out["dim"], out["n"], out["centroid"]))
    assert got == [(1, 0, 2, 1.5), (1, 1, 2, 0.0), (2, 0, 1, 0.25), (2, 1, 1, 0.75)]


def test_q_llr_bigrams_planted(ray_session, tmp_path):
    """Corpus engineered so the bigram 'x y' appears 5 times out of 10 total
    bigrams with c(x·)=5, c(·y)=5; hand-computed Dunning LLR against the
    scalar formula."""
    import math
    from pagerank_ray.pipelines.tabular import q_llr_bigrams

    docs = ["x y"] * 5 + ["a b"] * 5
    pq.write_table(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array(docs),
        "lang": pa.array(["en"] * 10),
        "source": pa.array(["s"] * 10),
        "n_chars": pa.array([3] * 10, pa.int64()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    out = q_llr_bigrams(str(tmp_path))

    def ref_llr(c, ca, cb, N):
        total = 0.0
        for kk, r, cc in ((c, ca, cb), (ca - c, ca, N - cb),
                          (cb - c, N - ca, cb), (N - ca - cb + c, N - ca, N - cb)):
            if kk:
                total += kk * math.log((kk * N) / (r * cc))
        return 2 * total

    got = {(r.a, r.b): (r.n_pair, r.llr) for r in out.itertuples()}
    assert got[("x", "y")][0] == 5
    assert abs(got[("x", "y")][1] - round(ref_llr(5, 5, 5, 10), 6)) < 1e-9
    assert got[("a", "b")][0] == 5


def test_q_region_homophily_planted(ray_session, tmp_path):
    """Two regions; the single cross-region edge drives assortativity below
    1: edges (o1→s1) within region 0, (o2→s2) within region 1, (o3→s1)
    cross. Marginals a=(1,2), b=(2,1) → Σab=4; r = (3·2 − 4)/(9 − 4) = 0.4."""
    from pagerank_ray.pipelines.tabular import q_region_homophily

    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_name": pa.array(["N0", "N1"]),
        "n_regionkey": pa.array([0, 1], pa.int64()),
    }), os.path.join(str(tmp_path), "nation.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),
        "l_suppkey": pa.array([10, 20, 10], pa.int64()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([100, 200, 201], pa.int64()),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([100, 200, 201], pa.int64()),
        "c_nationkey": pa.array([0, 1, 1], pa.int64()),
    }), os.path.join(str(tmp_path), "customer.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([10, 20], pa.int64()),
        "s_nationkey": pa.array([0, 1], pa.int64()),
    }), os.path.join(str(tmp_path), "supplier.parquet"))
    out = q_region_homophily(str(tmp_path))
    assert out["n_edges"].iloc[0] == 3
    assert out["n_same"].iloc[0] == 2
    assert out["assortativity"].iloc[0] == 0.4


def test_q_chi2_independence_planted(ray_session, tmp_path):
    """2 types × 2 weekdays, 10 events: a(Mon)=4, a(Tue)=2, b(Mon)=1,
    b(Tue)=3. Expected a-Mon = 6·5/10 = 3, contrib = +1/3."""
    from pagerank_ray.pipelines.tabular import q_chi2_independence

    # 2026-01-05 is a Monday, 2026-01-06 a Tuesday
    ts = pd.to_datetime(["2026-01-05"] * 5 + ["2026-01-06"] * 5)
    types = ["a"] * 4 + ["b"] + ["a"] * 2 + ["b"] * 3
    pq.write_table(pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "event_type": pa.array(types),
    }), os.path.join(str(tmp_path), "events.parquet"))
    out = q_chi2_independence(str(tmp_path))
    rec = {(r.event_type, r.dow): (r.n, r.expected, r.contrib) for r in out.itertuples()}
    assert rec[("a", 1)] == (4, 3.0, round(1 / 3, 6))
    assert rec[("a", 2)] == (2, 3.0, -round(1 / 3, 6))
    assert rec[("b", 1)] == (1, 2.0, -0.5)
    assert rec[("b", 2)] == (3, 2.0, 0.5)


def test_q_benford_prices_planted(ray_session, tmp_path):
    """Prices 1.00, 19.99, 150.00, 0.09 → cents 100, 1999, 15000, 9 → first
    digits 1, 1, 1, 9. Zero price is excluded."""
    from pagerank_ray.pipelines.tabular import q_benford_prices
    import math

    pq.write_table(pa.table({
        "o_totalprice": pa.array([1.00, 19.99, 150.00, 0.09, 0.0], pa.float64()),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    out = q_benford_prices(str(tmp_path))
    got = {r.digit: (r.n, r.freq, r.benford) for r in out.itertuples()}
    assert got[1] == (3, 0.75, round(math.log10(2), 6))
    assert got[9] == (1, 0.25, round(math.log(1 + 1 / 9) / math.log(10), 6))


def test_q_greedy_coverage_multi_round(ray_session, tmp_path):
    """doc1={a b c d}, doc2={c d e}, doc3={e f}, doc4={a}. Greedy: round 1
    picks doc1 (gain 4), round 2 doc3 (gain 2 — beats doc2's marginal 1),
    round 3 doc2 (gain 1, uncovered {e}∩... only 'e' already covered → d2
    marginal {e}=0? no: doc2={c,d,e}, after r1+r2 covered={a..f} minus none
    → doc2 gain 0, doc4 gain 0 → early stop at 2 rows."""
    from pagerank_ray.pipelines.tabular import q_greedy_coverage

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["a b c d", "c d e", "e f", "a"]),
        "lang": pa.array(["en"] * 4),
        "source": pa.array(["s"] * 4),
        "n_chars": pa.array([7, 5, 3, 1], pa.int64()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    out = q_greedy_coverage(str(tmp_path))
    got = list(zip(out["round"], out["doc_id"], out["gain"], out["covered"]))
    assert got == [(1, 1, 4, 4), (2, 3, 2, 6)]


def test_q_greedy_coverage_tie_breaks_low_doc_id(ray_session, tmp_path):
    """Both docs have 2 uncovered tokens in round 1 → lowest doc_id wins."""
    from pagerank_ray.pipelines.tabular import q_greedy_coverage

    pq.write_table(pa.table({
        "doc_id": pa.array([7, 3], pa.int64()),
        "text": pa.array(["a b", "c d"]),
        "lang": pa.array(["en"] * 2),
        "source": pa.array(["s"] * 2),
        "n_chars": pa.array([3, 3], pa.int64()),
    }), os.path.join(str(tmp_path), "documents.parquet"))
    out = q_greedy_coverage(str(tmp_path), k=2)
    got = list(zip(out["round"], out["doc_id"], out["gain"], out["covered"]))
    assert got == [(1, 3, 2, 2), (2, 7, 2, 4)]


def test_q_user_primary_type_tie(ray_session, tmp_path):
    """User 1: a×2, b×2 → tie resolves to 'a'; user 2: c×1."""
    from pagerank_ray.pipelines.tabular import q_user_primary_type

    pq.write_table(pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["b", "a", "b", "a", "c"]),
    }), os.path.join(str(tmp_path), "events.parquet"))
    out = q_user_primary_type(str(tmp_path))
    got = list(zip(out["user_id"], out["primary_type"], out["n_primary"], out["n_total"]))
    assert got == [(1, "a", 2, 4), (2, "c", 1, 1)]


def test_q_rolling_active_users_planted(ray_session, tmp_path):
    """User 1 active days 0 and 2, user 2 active day 8 (epoch days). With a
    7-day window the counts brute-forced per window end must match,
    including windows past the last active day (lingering users)."""
    from pagerank_ray.pipelines.tabular import q_rolling_active_users

    ts = pd.to_datetime([
        "1970-01-01 05:00:00", "1970-01-03 12:00:00", "1970-01-03 13:00:00",
        "1970-01-09 00:00:00",
    ])
    pq.write_table(pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
    }), os.path.join(str(tmp_path), "events.parquet"))
    out = q_rolling_active_users(str(tmp_path))
    active = {1: {0, 2}, 2: {8}}
    expect = {}
    for d in range(0, 20):
        n = sum(1 for days in active.values() if any(d - 6 <= x <= d for x in days))
        if n:
            expect[d] = n
    got = dict(zip(out["day_end"], out["n_active"]))
    assert got == expect


def test_q_bounce_rate_planted(ray_session, tmp_path):
    """User 1: events at 0s and 10s (one session of 2, entry 'a'), then one
    at +2h (bounce, entry 'b'). User 2: single event (bounce, entry 'a').
    → a: 2 sessions 1 bounce (0.5); b: 1 session 1 bounce (1.0)."""
    from pagerank_ray.pipelines.tabular import q_bounce_rate

    ts = pd.to_datetime([
        "2026-01-01 00:00:00", "2026-01-01 00:00:10", "2026-01-01 02:00:10",
        "2026-01-02 00:00:00",
    ])
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "event_type": pa.array(["a", "c", "b", "a"]),
    }), os.path.join(str(tmp_path), "events.parquet"))
    out = q_bounce_rate(str(tmp_path))
    got = list(zip(out["first_type"], out["n_sessions"], out["n_bounce"], out["bounce_rate"]))
    assert got == [("a", 2, 1, 0.5), ("b", 1, 1, 1.0)]


def test_q_cheirank_equals_pagerank_on_symmetric_graph(ray_session, tmp_path):
    """On a symmetric edge set the reversed graph is the graph itself, so
    CheiRank must equal fixed-iteration PageRank value-for-value — this
    pins the reversed-CSR plumbing without hand-unrolling the recurrence."""
    from pagerank_ray.pipelines.tabular import q_cheirank, q_pagerank_fixed

    pairs = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1)]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([a for a, _ in pairs], pa.int64()),
        "l_partkey": pa.array([b for _, b in pairs], pa.int64()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    pr = q_pagerank_fixed(str(tmp_path), n_workers=2)
    cr = q_cheirank(str(tmp_path), n_workers=2)
    assert list(cr["id"]) == list(pr["id"])
    assert np.allclose(cr["cheirank"].to_numpy(), pr["rank"].to_numpy())
    # 3-cycle symmetry: every vertex has equal rank 1.0
    assert np.allclose(cr["cheirank"].to_numpy(), 1.0)


def test_q_welch_ttest_planted(ray_session, tmp_path):
    """A = {10.00, 12.00}, R = {20.00, 24.00, 28.00}: hand-check against
    the scalar Welch formula (statistics on cents)."""
    import math
    from pagerank_ray.pipelines.tabular import q_welch_ttest

    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A", "R", "R", "R", "N"]),
        "l_extendedprice": pa.array([10.0, 12.0, 20.0, 24.0, 28.0, 99.0], pa.float64()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_welch_ttest(str(tmp_path))
    a = [1000, 1200]; b = [2000, 2400, 2800]
    m1, m2 = sum(a)/2, sum(b)/3
    v1 = sum((x-m1)**2 for x in a)/1
    v2 = sum((x-m2)**2 for x in b)/2
    aa, bb = v1/2, v2/3
    t = (m1 - m2)/math.sqrt(aa + bb)
    dof = (aa+bb)**2 / (aa*aa/1 + bb*bb/2)
    r = out.iloc[0]
    assert (r["n_a"], r["n_b"]) == (2, 3)
    assert r["mean_a"] == 11.0 and r["mean_b"] == 24.0
    assert abs(r["t_stat"] - round(t, 6)) < 1e-9
    assert abs(r["dof"] - round(dof, 6)) < 1e-9


def test_q_jsonl_gz_source_roundtrip(ray_session, tmp_path):
    """Gzip JSONL roundtrip preserves counts/ids exactly (int/string only)."""
    from pagerank_ray.pipelines.tabular import q_jsonl_gz_source, q_jsonl_source

    ts = pd.to_datetime(["2026-01-01"] * 6)
    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2, 2, 3, 3], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "a", "b", "b"]),
        "value": pa.array([0.0] * 6, pa.float64()),
        "props": pa.array(["{}"] * 6),
    }), os.path.join(str(tmp_path), "events.parquet"))
    gz = q_jsonl_gz_source(str(tmp_path))
    plain = q_jsonl_source(str(tmp_path))
    pd.testing.assert_frame_equal(gz, plain)
    rec = {r.event_type: (r.n_events, r.n_users, r.min_id, r.max_id)
           for r in gz.itertuples()}
    assert rec["a"] == (3, 2, 1, 4)
    assert rec["b"] == (3, 2, 2, 6)


def test_q_ols_by_flag_planted(ray_session, tmp_path):
    """Flag A lies exactly on y = 2x + 3 (dollars) → slope 2, intercept 3.
    Flag Z has a single row → omitted (undefined regression)."""
    from pagerank_ray.pipelines.tabular import q_ols_by_flag

    pq.write_table(pa.table({
        "l_returnflag": pa.array(["A", "A", "A", "Z"]),
        "l_quantity": pa.array([1.0, 2.0, 3.0, 5.0], pa.float64()),
        "l_extendedprice": pa.array([5.0, 7.0, 9.0, 1.0], pa.float64()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_ols_by_flag(str(tmp_path))
    got = list(zip(out["flag"], out["n"], out["slope"], out["intercept"]))
    assert got == [("A", 3, 2.0, 3.0)]


def test_q_day_churn_overlap_planted(ray_session, tmp_path):
    """Day 0 actives {1,2}, day 1 actives {2,3}: common {2}, union {1,2,3}
    → J=1/3. Day 2 has no activity, so no (1,2) pair row."""
    from pagerank_ray.pipelines.tabular import q_day_churn_overlap

    ts = pd.to_datetime([
        "1970-01-01 01:00", "1970-01-01 02:00", "1970-01-02 01:00",
        "1970-01-02 02:00", "1970-01-04 01:00",
    ])
    pq.write_table(pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 2, 2, 3, 1], pa.int64()),
    }), os.path.join(str(tmp_path), "events.parquet"))
    out = q_day_churn_overlap(str(tmp_path))
    got = list(zip(out["day"], out["n_common"], out["n_union"], out["jaccard"]))
    assert got == [(0, 1, 3, round(1 / 3, 6))]


def test_q_centroid_similarity_planted(ray_session, tmp_path):
    """Label 1 centroid sums → (2, 0), label 2 → (0, 3), label 3 → (1, 1):
    cos(1,2)=0, cos(1,3)=1/√2, cos(2,3)=1/√2 (exact integer dot products)."""
    import math
    from pagerank_ray.pipelines.tabular import q_centroid_similarity

    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [1.0, 0.0], [0.0, 3.0], [1.0, 1.0]],
                              pa.list_(pa.float32())),
        "label": pa.array([1, 1, 2, 3], pa.int32()),
    }), os.path.join(str(tmp_path), "embeddings.parquet"))
    out = q_centroid_similarity(str(tmp_path))
    got = {(r.label_a, r.label_b): r.cosine for r in out.itertuples()}
    assert got[(1, 2)] == 0.0
    assert got[(1, 3)] == round(1 / math.sqrt(2), 6)
    assert got[(2, 3)] == round(1 / math.sqrt(2), 6)


def test_q_k_anonymity_planted(ray_session, tmp_path):
    """QI classes: (0,'A')×5 anonymous at k=5, (0,'B')×2 and (1,'A')×1
    violating → violating: 2 classes / 3 records, frac 3/8."""
    from pagerank_ray.pipelines.tabular import q_k_anonymity

    nk = [0] * 5 + [0, 0, 1]
    seg = ["A"] * 5 + ["B", "B", "A"]
    pq.write_table(pa.table({
        "c_custkey": pa.array(range(8), pa.int64()),
        "c_nationkey": pa.array(nk, pa.int32()),
        "c_mktsegment": pa.array(seg),
    }), os.path.join(str(tmp_path), "customer.parquet"))
    out = q_k_anonymity(str(tmp_path))
    got = {r.regime: (r.n_classes, r.n_records, r.frac) for r in out.itertuples()}
    assert got["anonymous"] == (1, 5, 0.625)
    assert got["violating"] == (2, 3, 0.375)


def test_q_l_diversity_planted(ray_session, tmp_path):
    """Nation 0 has 3 distinct segments (diverse at l=3); nation 1 only 1
    (violating, 2 records)."""
    from pagerank_ray.pipelines.tabular import q_l_diversity

    pq.write_table(pa.table({
        "c_custkey": pa.array(range(5), pa.int64()),
        "c_nationkey": pa.array([0, 0, 0, 1, 1], pa.int32()),
        "c_mktsegment": pa.array(["A", "B", "C", "A", "A"]),
    }), os.path.join(str(tmp_path), "customer.parquet"))
    out = q_l_diversity(str(tmp_path))
    got = {r.regime: (r.n_classes, r.n_records, r.frac) for r in out.itertuples()}
    assert got["diverse"] == (1, 3, 0.6)
    assert got["violating"] == (1, 2, 0.4)


def test_q_order_size_hist_planted(ray_session, tmp_path):
    """Orders with 1, 2 and 8 lineitems → sizes 1, 2 and the 7+ clamp."""
    from pagerank_ray.pipelines.tabular import q_order_size_hist

    keys = [1] + [2] * 2 + [3] * 8
    pq.write_table(pa.table({
        "l_orderkey": pa.array(keys, pa.int64()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_order_size_hist(str(tmp_path))
    got = list(zip(out["order_size"], out["n_orders"]))
    assert got == [(1, 1), (2, 1), (7, 1)]


# ---------------------------------------------------------------------------
# round-5 late batch: session paths / co-occurrence / containment / knn audit
# ---------------------------------------------------------------------------

def _write_event_rows(tmp_path, rows):
    """rows: list of (event_id, ts_seconds, user_id, event_type)."""
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * 1_000_000 for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
    })
    pq.write_table(tbl, os.path.join(str(tmp_path), "events.parquet"))


def test_q_session_paths_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_session_paths

    _write_event_rows(tmp_path, [
        (1, 1, 1, "A"), (2, 2, 1, "B"), (3, 3, 1, "C"), (4, 4, 1, "D"),
        (5, 1, 2, "A"), (6, 2, 2, "B"), (7, 3, 2, "C"),
    ])
    out = q_session_paths(str(tmp_path))
    got = list(out.itertuples(index=False, name=None))
    assert got == [("A", "B", "C", 2), ("B", "C", "D", 1)]


def test_q_event_cooccurrence_window_edges(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_event_cooccurrence

    _write_event_rows(tmp_path, [
        # user 1: a@0, b@1800, c@5400 — (a,b) in, (b,c) exactly at the
        # 3600 s boundary (inclusive), (a,c) out
        (1, 0, 1, "a"), (2, 1800, 1, "b"), (3, 5400, 1, "c"),
        # user 2: equal timestamps — order pinned by event_id
        (10, 100, 2, "x"), (11, 100, 2, "y"),
    ])
    out = q_event_cooccurrence(str(tmp_path))
    got = {(r.t1, r.t2): r.n for r in out.itertuples(index=False)}
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("x", "y"): 1}


def test_q_containment_pairs_asymmetric(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_containment_pairs

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            "q w e r",              # shingles {q w e, w e r}: n_a = 2
            "q w e r t y u",        # 5 shingles, shares both of doc 0's
        ]),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_containment_pairs(str(tmp_path))
    # 0→1 containment = 2/2 = 1.0 kept; 1→0 = 2/5 < 0.5 dropped
    assert list(out.itertuples(index=False, name=None)) == [(0, 1, 2, 2, 1.0)]
    # boilerplate guard: df <= max_df filter drops every shared shingle
    assert len(q_containment_pairs(str(tmp_path), max_df=1)) == 0


def test_q_knn_label_disagreement_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_knn_label_disagreement

    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[0.0, 0.0], [0.001, 0.0], [0.002, 0.0], [1.0, 1.0]],
            pa.list_(pa.float32())),
        "label": pa.array([0, 1, 1, 2], pa.int32()),
    })
    pq.write_table(emb, os.path.join(str(tmp_path), "embeddings.parquet"))
    out = q_knn_label_disagreement(str(tmp_path), k=2, top=4)
    got = {r.vec_id: (r.n_disagree, r.frac) for r in out.itertuples(index=False)}
    # v0 NNs {v1,v2} both label 1 → 2/2; v3 NNs {v2,v1} → 2/2;
    # v1 NNs {v0,v2} → 1/2; v2 NNs {v1,v0} → 1/2
    assert got == {0: (2, 1.0), 3: (2, 1.0), 1: (1, 0.5), 2: (1, 0.5)}
    assert list(out["vec_id"]) == [0, 3, 1, 2]  # frac desc, vec_id asc


def test_q_knn_label_disagreement_tiebreak_by_vec_id(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_knn_label_disagreement

    # v1 and v4 are EQUIDISTANT from v0; k=1 must pick the lower vec_id (v1,
    # label 1 ≠ 0) — picking v4 (label 0) would report frac 0 instead
    emb = pa.table({
        "vec_id": pa.array([0, 1, 4], pa.int64()),
        "embedding": pa.array(
            [[0.0, 0.0], [0.001, 0.0], [-0.001, 0.0]],
            pa.list_(pa.float32())),
        "label": pa.array([0, 1, 0], pa.int32()),
    })
    pq.write_table(emb, os.path.join(str(tmp_path), "embeddings.parquet"))
    out = q_knn_label_disagreement(str(tmp_path), k=1, top=3)
    got = {r.vec_id: r.n_disagree for r in out.itertuples(index=False)}
    assert got[0] == 1


def test_q_touch_attribution_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_touch_attribution

    _write_event_rows(tmp_path, [
        # user 1: view → click → purchase  (first=view, last=click)
        (1, 1, 1, "view"), (2, 2, 1, "click"), (3, 3, 1, "purchase"),
        # user 2: purchase with NO prior touch, then signup → purchase
        (10, 1, 2, "purchase"), (11, 2, 2, "signup"), (12, 3, 2, "purchase"),
        # user 3: error is not a touch
        (20, 1, 3, "error"), (21, 2, 3, "purchase"),
    ])
    out = q_touch_attribution(str(tmp_path))
    got = {(r.first_touch, r.last_touch): r.n for r in out.itertuples(index=False)}
    assert got == {("view", "click"): 1, ("(none)", "(none)"): 2,
                   ("signup", "signup"): 1}


def test_q_boolean_retrieval_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_boolean_retrieval

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "spark merge window extra",     # all three → match, 4 tokens
            "spark merge merge spark",      # missing 'window'
            "window spark merge",           # match, 3 tokens
            "",                             # empty
        ]),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_boolean_retrieval(str(tmp_path))
    assert list(out.itertuples(index=False, name=None)) == [(0, 4), (2, 3)]


def test_q_activity_anomaly_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_activity_anomaly

    rows = []
    eid = 0
    # user 1: 10 days of 1 event, then a 30-event day.  NOTE a lone outlier
    # can sit at most √(k−1) σ from the mean (it inflates σ itself), so the
    # 3σ report needs k ≥ 11 active days — here z ≈ 3.16
    for day in range(10):
        rows.append((eid, day * 86400, 1, "view")); eid += 1
    for j in range(30):
        rows.append((eid, 10 * 86400 + j, 1, "view")); eid += 1
    # user 2: uniform activity → no anomaly
    for day in range(5):
        rows.append((eid, day * 86400, 2, "view")); eid += 1
    _write_event_rows(tmp_path, rows)
    out = q_activity_anomaly(str(tmp_path))
    assert list(out["user_id"]) == [1]
    assert list(out["day"]) == [10]
    n, k, s, s2 = 30, 11, 40, 910
    import math
    z = (n * k - s) / math.sqrt(k * s2 - s * s)
    assert out.loc[0, "z"] == round(z, 6)


def test_q_lexical_diversity_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_lexical_diversity

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "a b b c",        # src X: counts a1 b2 c1
            "c d",            # src X: c→2, d1
            "e e e",          # src Y: e3
        ]),
        "source": pa.array(["X", "X", "Y"]),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_lexical_diversity(str(tmp_path)).set_index("source")
    # X: 6 tokens, 4 distinct (a,b,c,d), hapax a,d → 2
    assert (out.loc["X", "n_tokens"], out.loc["X", "n_distinct"],
            out.loc["X", "n_hapax"]) == (6, 4, 2)
    assert out.loc["X", "ttr"] == round(4 / 6, 6)
    assert (out.loc["Y", "n_tokens"], out.loc["Y", "n_distinct"],
            out.loc["Y", "n_hapax"]) == (3, 1, 0)


def test_q_sla_percentiles_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_sla_percentiles

    day_us = 86_400_000_000
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_orderdate": pa.array([0, 0, 0, 0], pa.timestamp("us")),
        "o_orderpriority": pa.array(["P"] * 4),
    })
    li = pa.table({
        "l_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "l_shipdate": pa.array([1 * day_us, 2 * day_us, 3 * day_us, 10 * day_us],
                               pa.timestamp("us")),
    })
    pq.write_table(orders, os.path.join(str(tmp_path), "orders.parquet"))
    pq.write_table(li, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_sla_percentiles(str(tmp_path))
    # lags {1,2,3,10}: p50 thr=ceil(2)=2 → 2; p95 thr=ceil(3.8)=4 → 10;
    # p99 thr=ceil(3.96)=4 → 10
    assert list(out.itertuples(index=False, name=None)) == [("P", 4, 2, 10, 10)]


def test_q_local_bridges_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_local_bridges

    # triangle 1-2-3 plus pendant edge 3-4: only (3,4) is a local bridge
    li = pa.table({
        "l_orderkey": pa.array([1, 2, 1, 3], pa.int64()),
        "l_partkey": pa.array([2, 3, 3, 4], pa.int64()),
    })
    pq.write_table(li, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_local_bridges(str(tmp_path))
    assert list(out.itertuples(index=False, name=None)) == [(3, 4)]


def test_q_weekly_autocorr_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_weekly_autocorr

    rows = []
    eid = 0
    # 14 days with an exact period-7 pattern → lag-7 series are identical
    pattern = [5, 1, 1, 1, 1, 1, 1]
    for day in range(14):
        for _ in range(pattern[day % 7]):
            rows.append((eid, day * 86400, 1, "view")); eid += 1
    _write_event_rows(tmp_path, rows)
    out = q_weekly_autocorr(str(tmp_path))
    assert list(out.itertuples(index=False, name=None)) == [("view", 7, 1.0)]


def test_q_ref_integrity_audit_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_ref_integrity_audit

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([10, 99], pa.int64()),   # 99 is an orphan
    }), os.path.join(str(tmp_path), "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 3], pa.int64()),  # 3 is an orphan
        "l_partkey": pa.array([5, 5, 5], pa.int64()),
        "l_suppkey": pa.array([7, 7, 7], pa.int64()),
    }), os.path.join(str(tmp_path), "lineitem.parquet"))
    pq.write_table(pa.table({"p_partkey": pa.array([5], pa.int64())}),
                   os.path.join(str(tmp_path), "part.parquet"))
    pq.write_table(pa.table({"s_suppkey": pa.array([7], pa.int64())}),
                   os.path.join(str(tmp_path), "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10], pa.int64()),
        "c_nationkey": pa.array([0], pa.int32()),
    }), os.path.join(str(tmp_path), "customer.parquet"))
    pq.write_table(pa.table({"n_nationkey": pa.array([0], pa.int32())}),
                   os.path.join(str(tmp_path), "nation.parquet"))
    out = q_ref_integrity_audit(str(tmp_path)).set_index("relation")
    assert out.loc["lineitem->orders", "n_orphans"] == 1
    assert out.loc["orders->customer", "n_orphans"] == 1
    assert out.loc["lineitem->part", "n_orphans"] == 0
    assert out.loc["customer->nation", "n_orphans"] == 0


def test_q_silhouette_by_label_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_silhouette_by_label

    # two tight, well-separated pairs → silhouette near 1 for both labels
    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[0.0, 0.0], [0.001, 0.0], [0.4, 0.4], [0.401, 0.4]],
            pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1], pa.int32()),
    })
    pq.write_table(emb, os.path.join(str(tmp_path), "embeddings.parquet"))
    out = q_silhouette_by_label(str(tmp_path))
    assert list(out["label"]) == [0, 1]
    assert (out["mean_silhouette"] > 0.99).all()
    assert list(out["n"]) == [2, 2]


def test_q_revenue_concentration_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_revenue_concentration

    # revenues 50, 30, 15, 5 → total 100, threshold 80 → prefix {50, 30}
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([50.0, 30.0, 15.0, 5.0]),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    out = q_revenue_concentration(str(tmp_path))
    assert list(out.itertuples(index=False, name=None)) == [(4, 2, 0.5, 8000)]


def test_q_conversion_lag_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_conversion_lag

    _write_event_rows(tmp_path, [
        (1, 0, 1, "signup"), (2, 3700, 1, "purchase"),     # lag 1 h
        (3, 0, 2, "signup"), (4, 7200, 2, "purchase"),     # lag 2 h
        (5, 100, 3, "purchase"), (6, 200, 3, "signup"),    # purchase first → out
        (7, 0, 4, "signup"),                               # never converts
    ])
    out = q_conversion_lag(str(tmp_path))
    assert list(out.itertuples(index=False, name=None)) == [(2, 1, 2, 2)]


def test_q_degree_centralization_star(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_degree_centralization

    li = pa.table({
        "l_orderkey": pa.array([1, 1, 1], pa.int64()),
        "l_partkey": pa.array([2, 3, 4], pa.int64()),
    })
    pq.write_table(li, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_degree_centralization(str(tmp_path))
    # a perfect star has centralization exactly 1
    assert list(out.itertuples(index=False, name=None)) == [(4, 3, 3, 1.0)]


def test_q_gini_revenue_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_gini_revenue

    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([1.0, 3.0]),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    out = q_gini_revenue(str(tmp_path))
    # sorted cents [100, 300]: G = 2·(100+600)/(2·400) − 3/2 = 0.25
    assert list(out.itertuples(index=False, name=None)) == [(2, 400, 0.25)]


def test_q_intrinsic_dimension_line(ray_session, tmp_path):
    import math

    from pagerank_ray.pipelines.tabular import q_intrinsic_dimension

    emb = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array(
            [[0.0, 0.0], [0.001, 0.0], [0.003, 0.0], [0.007, 0.0]],
            pa.list_(pa.float32())),
    })
    pq.write_table(emb, os.path.join(str(tmp_path), "embeddings.parquet"))
    out = q_intrinsic_dimension(str(tmp_path))
    # quantized coords (0, 10, 30, 70): per-point (d1, d2) =
    # (100,900), (100,400), (400,900), (1600,3600)
    s = 0.5 * (math.log(900/100) + math.log(400/100)
               + math.log(900/400) + math.log(3600/1600))
    assert list(out.itertuples(index=False, name=None)) == [(4, 4, round(4/s, 6))]


def test_q_hhi_concentration_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_hhi_concentration

    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 2], pa.int64()),
        "o_totalprice": pa.array([75.0, 25.0]),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2], pa.int64()),
        "c_nationkey": pa.array([0, 1], pa.int32()),
        "c_mktsegment": pa.array(["A", "A"]),
    }), os.path.join(str(tmp_path), "customer.parquet"))
    out = q_hhi_concentration(str(tmp_path)).set_index("dimension")
    # nations: shares 0.75/0.25 → HHI 0.625; segment: one group → 1.0
    assert out.loc["nation", "hhi"] == 0.625
    assert out.loc["segment", "hhi"] == 1.0
    assert (out.loc["nation", "n_groups"], out.loc["segment", "n_groups"]) == (2, 1)


def test_q_order_velocity_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_order_velocity

    day_us = 86_400_000_000
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([1, 1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([0, 3 * day_us, 20 * day_us, 0],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([10.0, 12.5, 10.0, 99.0]),
    }), os.path.join(str(tmp_path), "orders.parquet"))
    out = q_order_velocity(str(tmp_path))
    # only (1,2): 3-day lag, |1250-1000| cents; (2,3) is 17 days apart
    assert list(out.itertuples(index=False, name=None)) == [(1, 1, 2, 3, 250)]


def test_q_cross_source_entropy_planted(ray_session, tmp_path):
    import math

    from pagerank_ray.pipelines.tabular import q_cross_source_entropy

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["a a b", "b b b"]),
        "source": pa.array(["X", "Y"]),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_cross_source_entropy(str(tmp_path))
    got = {(r.src_a, r.src_b): r.xent for r in out.itertuples(index=False)}
    # V=2; q_X = (a:3/5, b:2/5); q_Y = (a:1/5, b:4/5); p_X = (2/3, 1/3)
    hxy = -(2/3 * math.log(1/5) + 1/3 * math.log(4/5))
    hxx = -(2/3 * math.log(3/5) + 1/3 * math.log(2/5))
    assert got[("X", "Y")] == round(hxy, 6)
    assert got[("X", "X")] == round(hxx, 6)
    assert len(got) == 4


def test_q_edge_embeddedness_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_edge_embeddedness

    # triangle 1-2-3 plus pendant 3-4: edge (1,2) has N(1)={2,3}, N(2)={1,3}
    # → common {3}, union {3} → jaccard 1.0; (3,4) → 0
    li = pa.table({
        "l_orderkey": pa.array([1, 2, 1, 3], pa.int64()),
        "l_partkey": pa.array([2, 3, 3, 4], pa.int64()),
    })
    pq.write_table(li, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_edge_embeddedness(str(tmp_path))
    got = {(r.a, r.b): (r.n_common, r.n_union, r.jaccard)
           for r in out.itertuples(index=False)}
    assert got[(1, 2)] == (1, 1, 1.0)
    assert got[(3, 4)][2] == 0.0
    # edge (1,3): common {2}, union {2, 4} → 0.5
    assert got[(1, 3)] == (1, 2, 0.5)


def test_q_gram_novelty_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_gram_novelty

    docs = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array([
            "a b c d",        # grams {abc, bcd} — both novel (first doc)
            "a b c e f",      # grams {abc, bce, cef} — abc seen, 2 novel
        ]),
    })
    pq.write_table(docs, os.path.join(str(tmp_path), "documents.parquet"))
    out = q_gram_novelty(str(tmp_path)).set_index("doc_id")
    assert (out.loc[0, "n_grams"], out.loc[0, "n_novel"]) == (2, 2)
    assert (out.loc[1, "n_grams"], out.loc[1, "n_novel"]) == (3, 2)
    assert out.loc[1, "novelty"] == round(2 / 3, 6)


def test_q_single_source_parts_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_single_source_parts

    li = pa.table({
        "l_partkey": pa.array([1, 1, 2, 2, 2, 3, 3, 3, 3], pa.int64()),
        "l_suppkey": pa.array([7, 7, 7, 8, 8, 7, 8, 9, 10], pa.int64()),
    })
    pq.write_table(li, os.path.join(str(tmp_path), "lineitem.parquet"))
    out = q_single_source_parts(str(tmp_path)).set_index("n_suppliers")
    # part 1: single-sourced; part 2: dual; part 3: 4 suppliers → clamp 3
    assert out.loc[1, "n_parts"] == 1
    assert out.loc[2, "n_parts"] == 1
    assert out.loc[3, "n_parts"] == 1
    assert out.loc[1, "frac"] == round(1 / 3, 6)


def test_q_weekday_profile_planted(ray_session, tmp_path):
    from pagerank_ray.pipelines.tabular import q_weekday_profile

    # day 0 (1970-01-01) is a Thursday → weekday 3; day 4 is Monday → 0
    _write_event_rows(tmp_path, [
        (1, 0, 1, "view"), (2, 4 * 86400, 1, "view"), (3, 4 * 86400, 2, "view"),
    ])
    out = q_weekday_profile(str(tmp_path))
    got = {(r.event_type, r.weekday): r.n for r in out.itertuples(index=False)}
    assert got == {("view", 3): 1, ("view", 0): 2}
    exp = 3 / 7
    chi_thu = round((1 - exp) ** 2 / exp, 6)
    row = out[(out.weekday == 3)].iloc[0]
    assert row.chi2_cell == chi_thu
