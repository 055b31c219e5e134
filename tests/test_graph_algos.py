"""CC / label propagation / triangle counting vs independent NumPy oracles."""

import numpy as np
import pytest

from pagerank_ray.oracle.numpy_oracle import cc_oracle, lp_oracle, triangles_oracle
from pagerank_ray.pipelines.cc import connected_components, label_propagation
from pagerank_ray.pipelines.flagship import edges_dataset_from_arrays, prepare_csr_from_edges
from pagerank_ray.pipelines.triangles import triangle_counts


def _random_graph(n, m, seed, hub_skew=2.0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = (n * rng.random(m) ** hub_skew).astype(np.int64)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def _disconnected_graph(seed=5):
    """Two obvious components + isolated vertices."""
    rng = np.random.default_rng(seed)
    # component A: vertices 0..49 ring; component B: 50..79 ring; 80..99 isolated
    a = np.arange(50)
    b = 50 + np.arange(30)
    src = np.concatenate([a, b])
    dst = np.concatenate([np.roll(a, 1), np.roll(b, 1)])
    return src, dst, 100


def _sym_csr(tmp_path, src, dst, n, n_parts=4):
    edges = edges_dataset_from_arrays(src, dst)
    d = str(tmp_path / "csr_sym")
    prepare_csr_from_edges(edges, n, d, n_parts=n_parts, symmetrize=True)
    return d


def _labels_array(res, n):
    df = res.result.to_pandas().sort_values("id")
    assert list(df["id"]) == list(range(n))
    return df["label"].to_numpy()


def test_cc_two_components_and_isolates(ray_session, tmp_path):
    src, dst, n = _disconnected_graph()
    d = _sym_csr(tmp_path, src, dst, n)
    res = connected_components(d, n_workers=3)
    got = _labels_array(res, n)
    expected = cc_oracle(n, src, dst)
    np.testing.assert_array_equal(got, expected)
    assert res.converged
    assert set(got[:50]) == {0} and set(got[50:80]) == {50}
    assert (got[80:] == np.arange(80, 100)).all()  # isolated keep own id


@pytest.mark.parametrize("seed,n,m", [(1, 200, 300), (2, 300, 2000)])
def test_cc_random_graphs(ray_session, tmp_path, seed, n, m):
    src, dst = _random_graph(n, m, seed)
    d = _sym_csr(tmp_path, src, dst, n)
    got = _labels_array(connected_components(d, n_workers=4), n)
    np.testing.assert_array_equal(got, cc_oracle(n, src, dst))


@pytest.mark.parametrize("seed,n,m,iters", [(3, 150, 600, 5), (4, 250, 1500, 10)])
def test_label_propagation_matches_sync_oracle(ray_session, tmp_path, seed, n, m, iters):
    src, dst = _random_graph(n, m, seed)
    d = _sym_csr(tmp_path, src, dst, n)
    res = label_propagation(d, n_workers=3, max_iters=iters)
    expected, oiters = lp_oracle(n, src, dst, max_iters=iters)
    np.testing.assert_array_equal(_labels_array(res, n), expected)


@pytest.mark.parametrize("seed,n,m", [(6, 60, 400), (7, 120, 1200)])
def test_triangle_counts_match_oracle(ray_session, tmp_path, seed, n, m):
    src, dst = _random_graph(n, m, seed, hub_skew=1.5)
    edges = edges_dataset_from_arrays(src, dst)
    got = triangle_counts(edges, n, num_partitions=4).to_pandas().sort_values("id")
    assert list(got["id"]) == list(range(n))
    np.testing.assert_array_equal(
        got["tri_count"].to_numpy(), triangles_oracle(n, src, dst)
    )


def test_triangle_golden_k4():
    """K4: every vertex is in C(3,2)=3 triangles (pure-oracle sanity)."""
    src = np.array([0, 0, 0, 1, 1, 2])
    dst = np.array([1, 2, 3, 2, 3, 3])
    np.testing.assert_array_equal(triangles_oracle(4, src, dst), [3, 3, 3, 3])


def test_cc_plasma_transport_oracle(ray_session, tmp_path):
    """Hash-min CC over the plasma (multi-node) transport matches union-find."""
    src, dst = _random_graph(400, 1200, seed=31)
    d = _sym_csr(tmp_path, src, dst, 400)
    got = _labels_array(connected_components(d, n_workers=3, transport="plasma"), 400)
    want = cc_oracle(400, src, dst)
    assert (got == want).all()


# ---------------------------------------------------------------------------
# HITS + k-core (round 3)
# ---------------------------------------------------------------------------


def _hits_numpy(src, dst, n, iters):
    """Dense NumPy HITS with the engine's exact raw-sum-then-L1-scale-to-n."""
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        np.add.at(a, dst, h[src])
        if a.sum() > 0:
            a *= n / a.sum()
        h = np.zeros(n)
        np.add.at(h, src, a[dst])
        if h.sum() > 0:
            h *= n / h.sum()
    return a, h


def test_hits_matches_numpy_oracle(ray_session, tmp_path):
    from pagerank_ray.pipelines.hits import hits

    src, dst = _random_graph(200, 1500, seed=11)
    n = 200
    edges = edges_dataset_from_arrays(src, dst)
    fwd = str(tmp_path / "csr_fwd")
    rev = str(tmp_path / "csr_rev")
    prepare_csr_from_edges(edges, n, fwd, n_parts=4)
    prepare_csr_from_edges(edges_dataset_from_arrays(dst, src), n, rev, n_parts=4)
    res = hits(fwd, rev, n_workers=2, iters=4)
    a_o, h_o = _hits_numpy(src, dst, n, iters=4)
    adf = res.authorities.to_pandas().sort_values("id")
    hdf = res.hubs.to_pandas().sort_values("id")
    np.testing.assert_allclose(adf["value"].to_numpy(), a_o, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(hdf["value"].to_numpy(), h_o, rtol=1e-12, atol=1e-12)


def test_hits_star_fixpoint(ray_session, tmp_path):
    """1→3, 2→3: authority mass all on 3 (a=(0,0,3)), hubs split (1.5,1.5,0)."""
    from pagerank_ray.pipelines.hits import hits

    src = np.array([0, 1])
    dst = np.array([2, 2])
    fwd = str(tmp_path / "f")
    rev = str(tmp_path / "r")
    prepare_csr_from_edges(edges_dataset_from_arrays(src, dst), 3, fwd, n_parts=1)
    prepare_csr_from_edges(edges_dataset_from_arrays(dst, src), 3, rev, n_parts=1)
    res = hits(fwd, rev, n_workers=1, iters=3)
    a = res.authorities.to_pandas().sort_values("id")["value"].to_numpy()
    h = res.hubs.to_pandas().sort_values("id")["value"].to_numpy()
    np.testing.assert_allclose(a, [0.0, 0.0, 3.0])
    np.testing.assert_allclose(h, [1.5, 1.5, 0.0])


def test_kcore_triangle_with_pendant(ray_session):
    """Triangle 0-1-2 plus pendant 2-3: the 2-core is exactly the triangle."""
    from pagerank_ray.pipelines.kcore import k_core
    from pagerank_ray.stages.csr import symmetrize

    src = np.array([0, 1, 0, 2])
    dst = np.array([1, 2, 2, 3])
    core, rounds = k_core(symmetrize(edges_dataset_from_arrays(src, dst)), 2)
    df = core.to_pandas().sort_values("src_id")
    assert list(df["src_id"]) == [0, 1, 2]
    assert list(df["core_deg"]) == [2, 2, 2]
    assert rounds == 1


def test_kcore_chain_peels_iteratively(ray_session):
    """Path graph 0-1-2-3-4 with k=2 peels from both ends over multiple
    rounds down to the empty core."""
    from pagerank_ray.pipelines.kcore import k_core
    from pagerank_ray.stages.csr import symmetrize

    src = np.array([0, 1, 2, 3])
    dst = np.array([1, 2, 3, 4])
    core, rounds = k_core(symmetrize(edges_dataset_from_arrays(src, dst)), 2)
    assert core.count() == 0
    assert rounds >= 2


def test_hits_plasma_transport_matches_shm(ray_session, tmp_path):
    """MODE_SUM over transport="plasma" (the multi-node path) is bit-identical
    to the shm ring — same parity gate PageRank/CC have."""
    from pagerank_ray.pipelines.hits import hits

    src, dst = _random_graph(150, 900, seed=23)
    n = 150
    fwd = str(tmp_path / "f")
    rev = str(tmp_path / "r")
    prepare_csr_from_edges(edges_dataset_from_arrays(src, dst), n, fwd, n_parts=4)
    prepare_csr_from_edges(edges_dataset_from_arrays(dst, src), n, rev, n_parts=4)
    r_shm = hits(fwd, rev, n_workers=2, iters=3, transport="shm")
    r_pl = hits(fwd, rev, n_workers=2, iters=3, transport="plasma")
    for a, b in ((r_shm.authorities, r_pl.authorities), (r_shm.hubs, r_pl.hubs)):
        va = a.to_pandas().sort_values("id")["value"].to_numpy()
        vb = b.to_pandas().sort_values("id")["value"].to_numpy()
        np.testing.assert_array_equal(va, vb)


def test_hits_zero_edge_graph(ray_session, tmp_path):
    """All-dangling graph: no edges → both score vectors are all zeros after
    the first half-step (raw sums are zero; the L1 guard skips scaling)."""
    from pagerank_ray.pipelines.hits import hits

    empty = np.array([], dtype=np.int64)
    fwd = str(tmp_path / "f")
    rev = str(tmp_path / "r")
    prepare_csr_from_edges(edges_dataset_from_arrays(empty, empty), 5, fwd, n_parts=1)
    prepare_csr_from_edges(edges_dataset_from_arrays(empty, empty), 5, rev, n_parts=1)
    res = hits(fwd, rev, n_workers=1, iters=2)
    a = res.authorities.to_pandas()["value"].to_numpy()
    h = res.hubs.to_pandas()["value"].to_numpy()
    assert (a == 0).all() and (h == 0).all()


def test_kcore_k1_keeps_every_edge_vertex(ray_session):
    from pagerank_ray.pipelines.kcore import k_core
    from pagerank_ray.stages.csr import symmetrize

    src = np.array([0, 1, 5])
    dst = np.array([1, 2, 6])
    core, rounds = k_core(symmetrize(edges_dataset_from_arrays(src, dst)), 1)
    assert rounds == 0
    assert sorted(core.to_pandas()["src_id"]) == [0, 1, 2, 5, 6]


def test_grouped_pair_sum_matches_pandas(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.stages.graph_build import grouped_pair_sum

    rng = np.random.default_rng(41)
    n = 5000
    df = pd.DataFrame(
        {
            "src_id": rng.integers(0, 40, n),
            "dst_id": rng.integers(0, 40, n),
            "weight": rng.integers(1, 50, n).astype(np.float64),
        }
    )
    got = (
        grouped_pair_sum(rd.from_arrow(pa.Table.from_pandas(df)))
        .to_pandas()
        .sort_values(["src_id", "dst_id"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["src_id", "dst_id"], sort=True)["weight"].sum().reset_index()
    )
    pd.testing.assert_frame_equal(got.astype(want.dtypes.to_dict()), want)


def test_bfs_levels_matches_numpy(ray_session, tmp_path):
    """MODE_DIST supersteps vs a dense NumPy multi-source BFS."""
    from pagerank_ray.pipelines.cc import bfs_levels

    src, dst = _random_graph(300, 1200, seed=17)
    n = 300
    csr = _sym_csr(tmp_path, src, dst, n)
    seeds = np.array([0, 77, 155])
    res = bfs_levels(csr, seeds, n_workers=2)
    assert res.converged
    # dense oracle over the symmetrized simple graph
    import collections

    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    INF = 1 << 62
    dist = [INF] * n
    from collections import deque

    q = deque()
    for s in seeds:
        dist[s] = 0
        q.append(s)
    while q:
        u = q.popleft()
        for v in adj[u]:
            if dist[v] > dist[u] + 1:
                dist[v] = dist[u] + 1
                q.append(v)
    got = res.result.to_pandas().sort_values("id")["dist"].to_numpy()
    assert (got == np.array(dist)).all()


def test_sssp_weighted_matches_dijkstra(ray_session, tmp_path):
    """MODE_DISTW Bellman-Ford supersteps vs a dense Dijkstra oracle."""
    import heapq

    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.pipelines.cc import bfs_levels
    from pagerank_ray.pipelines.flagship import prepare_csr_from_edges

    rng = np.random.default_rng(43)
    n, m = 200, 900
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    wq = rng.integers(1, 20, m).astype(np.float64)
    # symmetric weighted multigraph: SUM parallel-edge weights per directed
    # pair — the same contraction rule as grouped_pair_sum / q_sssp_weighted
    seen = {}
    for s, d, q in zip(src, dst, wq):
        seen[(int(s), int(d))] = seen.get((int(s), int(d)), 0.0) + q
        seen[(int(d), int(s))] = seen.get((int(d), int(s)), 0.0) + q
    ss = np.array([k[0] for k in seen], np.int64)
    dd = np.array([k[1] for k in seen], np.int64)
    ww = np.array(list(seen.values()), np.float64)
    edges = rd.from_arrow(pa.table({"src_id": ss, "dst_id": dd, "weight": ww}))
    csr = str(tmp_path / "wcsr")
    prepare_csr_from_edges(edges, n, csr, n_parts=4, normalize_weights=False)
    seeds = [0, 50]
    res = bfs_levels(csr, seeds, n_workers=2, weighted=True)
    assert res.converged

    adj = {}
    for s, d, q in zip(ss, dd, ww):
        adj.setdefault(int(s), []).append((int(d), q))
    dist = [np.inf] * n
    pq_heap = []
    for s in seeds:
        dist[s] = 0.0
        heapq.heappush(pq_heap, (0.0, s))
    while pq_heap:
        du, u = heapq.heappop(pq_heap)
        if du > dist[u]:
            continue
        for v, q in adj.get(u, []):
            if dist[v] > du + q:
                dist[v] = du + q
                heapq.heappush(pq_heap, (dist[v], v))
    got = res.result.to_pandas().sort_values("id")["dist"].to_numpy()
    np.testing.assert_array_equal(got, np.array(dist))


def test_mode_weight_semantics_rejected(ray_session, tmp_path):
    """ADVICE r3: the manifest's (weighted, normalize_weights) pair must gate
    the mode at BSPEngine construction — MODE_DISTW over a row-normalized CSR
    and weighted MODE_PAGERANK over a raw-weight CSR are silent-wrong-answer
    combinations and must raise loudly."""
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.state.superstep import BSPEngine, MODE_DISTW, MODE_PAGERANK

    edges = rd.from_arrow(pa.table({
        "src_id": np.array([0, 0, 1, 2], np.int64),
        "dst_id": np.array([1, 2, 2, 0], np.int64),
        "weight": np.array([3.0, 1.0, 2.0, 5.0], np.float64),
    }))
    norm_csr = str(tmp_path / "norm_csr")
    prepare_csr_from_edges(edges, 3, norm_csr, n_parts=2, normalize_weights=True)
    with pytest.raises(ValueError, match="normalize_weights=True"):
        BSPEngine(norm_csr, n_workers=2, mode=MODE_DISTW)

    raw_csr = str(tmp_path / "raw_csr")
    prepare_csr_from_edges(edges, 3, raw_csr, n_parts=2, normalize_weights=False)
    with pytest.raises(ValueError, match="raw weights"):
        BSPEngine(raw_csr, n_workers=2, mode=MODE_PAGERANK)

    # the valid pairings still construct
    BSPEngine(norm_csr, n_workers=2, mode=MODE_PAGERANK)
    BSPEngine(raw_csr, n_workers=2, mode=MODE_DISTW)

    # weighted MODE_SUM (SALSA) follows the PageRank rule: normalized only
    from pagerank_ray.state.superstep import MODE_SUM

    with pytest.raises(ValueError, match="SALSA"):
        BSPEngine(raw_csr, n_workers=2, mode=MODE_SUM)
    BSPEngine(norm_csr, n_workers=2, mode=MODE_SUM)


def test_salsa_matches_numpy_oracle(ray_session, tmp_path):
    """SALSA recurrence against a dense NumPy oracle: row-stochastic W_out
    forward, W_in backward, L1-scale to n each half-step — independent of
    the SQL oracle path."""
    from pagerank_ray.pipelines.hits import hits

    rng = np.random.default_rng(11)
    n = 40
    src, dst = [], []
    for u in range(n):
        for v in sorted(set(rng.integers(0, n, size=3).tolist()) - {u}):
            src.append(u)
            dst.append(v)
    src = np.array(src, np.int64)
    dst = np.array(dst, np.int64)
    fwd = str(tmp_path / "sfwd")
    rev = str(tmp_path / "srev")
    ones = np.ones(len(src), np.float64)
    import pyarrow as pa
    import ray.data as rd

    prepare_csr_from_edges(
        rd.from_arrow(pa.table({"src_id": src, "dst_id": dst, "weight": ones})),
        n, fwd, n_parts=3)
    prepare_csr_from_edges(
        rd.from_arrow(pa.table({"src_id": dst, "dst_id": src, "weight": ones})),
        n, rev, n_parts=3)
    res = hits(fwd, rev, n_workers=2, iters=4)

    # dense oracle
    A = np.zeros((n, n))
    A[src, dst] = 1.0
    outd = A.sum(axis=1)
    ind = A.sum(axis=0)
    Wf = A * np.divide(1.0, outd, out=np.zeros(n), where=outd > 0)[:, None]
    Wb = A * np.divide(1.0, ind, out=np.zeros(n), where=ind > 0)[None, :]
    h = np.ones(n)
    for _ in range(4):
        a = Wf.T @ h
        a *= n / a.sum()
        h = Wb @ a
        h *= n / h.sum()
    got_a = res.authorities.to_pandas().sort_values("id")["value"].to_numpy()
    got_h = res.hubs.to_pandas().sort_values("id")["value"].to_numpy()
    np.testing.assert_allclose(got_a, a, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(got_h, h, rtol=1e-10, atol=1e-12)


def test_build_graph_rejects_bad_dedup_stage(ray_session, tmp_path):
    import ray.data as rd

    from pagerank_ray.pipelines.flagship import build_graph

    with pytest.raises(ValueError, match="dedup_stage"):
        build_graph(rd.from_items([]), str(tmp_path / "w"), n_parts=2,
                    dedup_stage="extract")


def test_scc_random_graph_matches_closure_oracle(ray_session, tmp_path):
    """FW-BW coloring SCC vs a dense boolean-closure oracle on a random
    directed graph with real multi-vertex SCCs and singletons."""
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.pipelines.scc import strongly_connected_components

    rng = np.random.default_rng(3)
    n, m = 60, 110
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    src, dst = pairs[:, 0].copy(), pairs[:, 1].copy()

    edges = rd.from_arrow(pa.table({"src_id": src, "dst_id": dst}))
    # distributed rounds (tail disabled) — the multi-round FW-BW path
    res = strongly_connected_components(
        edges, n, str(tmp_path / "scc"), n_workers=2, tail_cutoff=0
    )
    got = res.result.to_pandas().sort_values("id").reset_index(drop=True)
    # in-memory tail path (kicks in at round 1 on this size) must agree
    res_t = strongly_connected_components(
        edges, n, str(tmp_path / "scc_tail"), n_workers=2
    )
    got_t = res_t.result.to_pandas().sort_values("id").reset_index(drop=True)
    assert res_t.round_stats and res_t.round_stats[-1].get("tail")
    np.testing.assert_array_equal(got["scc"].to_numpy(), got_t["scc"].to_numpy())

    R = np.eye(n, dtype=bool)
    A = np.zeros((n, n), bool)
    A[src, dst] = True
    nxt = R | A
    while (nxt != R).any():
        R = nxt
        nxt = R | (R @ A)
    both = R & R.T
    oracle = np.array([np.flatnonzero(both[v]).min() for v in range(n)])
    assert len(got) == n
    np.testing.assert_array_equal(got["scc"].to_numpy(), oracle)
    assert got["scc"].nunique() > 1  # multi-SCC graph, not a trivial case


def test_node2vec_walks_match_numpy_oracle(ray_session, tmp_path):
    """Second-order biased walks vs a direct NumPy replication of the pinned
    choice rule (return 1 / triangle 4 / explore 2, fmix64 ranks)."""
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.functions.text import fmix64
    from pagerank_ray.pipelines.walks import SALT2, W_OTH, W_RET, W_TRI, node2vec_walks
    from pagerank_ray.stages.csr import symmetrize

    rng = np.random.default_rng(17)
    n, m = 80, 220
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    edges = rd.from_arrow(pa.table({"src_id": src, "dst_id": dst}))
    sym = symmetrize(edges).to_pandas()
    adj = {}
    for a, b in zip(sym["src_id"], sym["dst_id"]):
        adj.setdefault(int(a), []).append(int(b))
    adj = {k: np.array(sorted(v), np.int64) for k, v in adj.items()}

    d = str(tmp_path / "csr")
    prepare_csr_from_edges(edges, n, d, n_parts=4, symmetrize=True)
    seeds = np.arange(0, n, 7, dtype=np.int64)
    L = 6
    traj = node2vec_walks(d, seeds, seeds, length=L, n_workers=2)

    for wi, s in enumerate(seeds):
        cur, prev = int(s), int(s)
        path = [cur]
        for t in range(1, L + 1):
            h = int(fmix64(np.array([np.uint64(s) * SALT2 + np.uint64(t)]))[0])
            cand = adj.get(cur, np.empty(0, np.int64))
            if len(cand) == 0:
                path.append(cur)
                continue
            if t == 1:
                nxt = int(cand[h % len(cand)])
            else:
                pn = adj.get(prev, np.empty(0, np.int64))
                w = [
                    int(W_RET) if c == prev
                    else int(W_TRI) if c in set(pn.tolist())
                    else int(W_OTH)
                    for c in cand
                ]
                cum = np.cumsum(w)
                r = h % int(cum[-1])
                nxt = int(cand[int(np.searchsorted(cum, r, side="right"))])
            prev, cur = cur, nxt
            path.append(cur)
        np.testing.assert_array_equal(traj[wi], np.array(path))


def test_scc_checkpoint_resume_equals_continuous(ray_session, tmp_path):
    """SCC round checkpoints: a rerun over the same work_dir replays the
    recorded rounds (no recompute) and a PARTIAL checkpoint prefix (later
    rounds deleted) resumes to the identical labeling."""
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.pipelines.scc import strongly_connected_components

    rng = np.random.default_rng(9)
    n, m = 70, 130
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], 1), axis=0)
    edges = rd.from_arrow(pa.table({"src_id": pairs[:, 0].copy(),
                                    "dst_id": pairs[:, 1].copy()}))
    work = str(tmp_path / "scc")
    r1 = strongly_connected_components(edges, n, work, n_workers=2, tail_cutoff=0)
    g1 = r1.result.to_pandas().sort_values("id").reset_index(drop=True)

    # full replay from checkpoints
    r2 = strongly_connected_components(edges, n, work, n_workers=2, tail_cutoff=0)
    g2 = r2.result.to_pandas().sort_values("id").reset_index(drop=True)
    assert r2.rounds == r1.rounds
    np.testing.assert_array_equal(g1["scc"].to_numpy(), g2["scc"].to_numpy())

    # partial resume: drop the ckpt markers (and CSR caches) after round 1
    for r in range(2, r1.rounds + 1):
        shutil.rmtree(f"{work}/ckpt_r{r}", ignore_errors=True)
        shutil.rmtree(f"{work}/r{r}_fwd", ignore_errors=True)
        shutil.rmtree(f"{work}/r{r}_rev", ignore_errors=True)
    r3 = strongly_connected_components(edges, n, work, n_workers=2, tail_cutoff=0)
    g3 = r3.result.to_pandas().sort_values("id").reset_index(drop=True)
    assert r3.rounds == r1.rounds
    np.testing.assert_array_equal(g1["scc"].to_numpy(), g3["scc"].to_numpy())


def test_scc_checkpoint_fingerprint_discards_stale_rounds(ray_session, tmp_path):
    """Round checkpoints carry an input-edge fingerprint: re-running the same
    work_dir with DIFFERENT edges must discard the recorded rounds instead of
    silently replaying stale labels (ADVICE r4)."""
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.pipelines.scc import strongly_connected_components

    n = 6
    cyc = lambda ids: [(ids[i], ids[(i + 1) % len(ids)]) for i in range(len(ids))]
    e1 = cyc([0, 1, 2]) + cyc([3, 4, 5])
    e2 = cyc([0, 1, 2, 3, 4, 5])  # one big cycle — different input, same ids
    mk = lambda pairs: rd.from_arrow(pa.table({
        "src_id": np.array([p[0] for p in pairs], np.int64),
        "dst_id": np.array([p[1] for p in pairs], np.int64)}))
    work = str(tmp_path / "scc_fp")
    r1 = strongly_connected_components(mk(e1), n, work, n_workers=2)
    g1 = r1.result.to_pandas().sort_values("id")
    assert sorted(set(g1["scc"])) == [0, 3]
    # same work_dir, different edges: stale rounds must NOT replay
    r2 = strongly_connected_components(mk(e2), n, work, n_workers=2)
    g2 = r2.result.to_pandas().sort_values("id")
    assert set(g2["scc"]) == {0}


def test_scc_max_label_iters_plumbed(ray_session, tmp_path):
    """A too-small hash-min budget raises loudly (and the default is
    overridable from the public API — ADVICE r4)."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from pagerank_ray.pipelines.scc import strongly_connected_components

    k = 40  # one k-cycle: hash-min needs ~k supersteps
    pairs = [(i, (i + 1) % k) for i in range(k)]
    edges = rd.from_arrow(pa.table({
        "src_id": np.array([p[0] for p in pairs], np.int64),
        "dst_id": np.array([p[1] for p in pairs], np.int64)}))
    with pytest.raises(RuntimeError, match="did not converge in 5"):
        strongly_connected_components(
            edges, k, str(tmp_path / "s1"), n_workers=2, max_label_iters=5,
            tail_cutoff=0)
    ok = strongly_connected_components(
        edges, k, str(tmp_path / "s2"), n_workers=2, max_label_iters=k + 2,
        tail_cutoff=0)
    assert set(ok.result.to_pandas()["scc"]) == {0}


def test_hits_resume_rejects_over_iterated_checkpoint(ray_session, tmp_path):
    """Resuming HITS with iters SMALLER than the checkpointed iteration count
    must raise instead of returning over-iterated vectors labeled with the
    requested count (ADVICE r4)."""
    import pytest

    from pagerank_ray.pipelines.hits import hits

    src, dst = _random_graph(60, 300, seed=3)
    n = 60
    fwd = str(tmp_path / "fwd"); rev = str(tmp_path / "rev")
    prepare_csr_from_edges(edges_dataset_from_arrays(src, dst), n, fwd, n_parts=4)
    prepare_csr_from_edges(edges_dataset_from_arrays(dst, src), n, rev, n_parts=4)
    ck = str(tmp_path / "ck")
    hits(fwd, rev, n_workers=2, iters=4, checkpoint_root=ck, checkpoint_every=2)
    with pytest.raises(ValueError, match="3"):
        hits(fwd, rev, n_workers=2, iters=3, checkpoint_root=ck, resume=True)


def _kruskal_ref(df, n):
    """Union-find Kruskal under the strict (w, src, dst) order — the unique
    MSF any correct algorithm must produce."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for r in df.sort_values(["w", "src_id", "dst_id"]).itertuples():
        a, b = find(r.src_id), find(r.dst_id)
        if a != b:
            parent[max(a, b)] = min(a, b)
            out.append((r.src_id, r.dst_id, r.w))
    import pandas as pd
    return (pd.DataFrame(out, columns=["src_id", "dst_id", "w"])
            .sort_values(["src_id", "dst_id"]).reset_index(drop=True))


def test_boruvka_msf_matches_kruskal(ray_session):
    """Distributed Borůvka vs union-find Kruskal on a random weighted graph
    with duplicate weights (the strict total order settles ties), via both
    the in-memory and the distributed contraction paths."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.pipelines.msf import boruvka_msf

    rng = np.random.default_rng(17)
    n, m = 150, 500
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    w = rng.integers(1, 8, m).astype(np.int64)  # heavy ties on purpose
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    keep = lo != hi
    df = (pd.DataFrame({"src_id": lo[keep], "dst_id": hi[keep], "w": w[keep]})
          .sort_values(["src_id", "dst_id", "w"])
          .drop_duplicates(["src_id", "dst_id"]).reset_index(drop=True))
    want = _kruskal_ref(df, n)

    # tail path (kicks in at round 1 on this size)
    res = boruvka_msf(rd.from_pandas(df))
    assert res.round_stats[-1].get("tail")
    got = (res.edges.to_pandas().sort_values(["src_id", "dst_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)

    # distributed rounds with the in-memory contraction
    res_c = boruvka_msf(rd.from_pandas(df), tail_cutoff=0)
    assert not any(r.get("tail") for r in res_c.round_stats)
    got_c = (res_c.edges.to_pandas().sort_values(["src_id", "dst_id"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_c, want)

    # distributed rounds with the distributed MODE_MIN contraction
    res_d = boruvka_msf(rd.from_pandas(df), tail_cutoff=0, contract_cutoff=0,
                        n_workers=2)
    got_d = (res_d.edges.to_pandas().sort_values(["src_id", "dst_id"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_d, want)

    # labels agree with union-find components over the forest
    p2 = np.arange(n)

    def find2(x):
        while p2[x] != x:
            p2[x] = p2[p2[x]]
            x = p2[x]
        return x

    for r in want.itertuples():
        a, b = find2(r.src_id), find2(r.dst_id)
        if a != b:
            p2[max(a, b)] = min(a, b)
    lab = res.labels.to_pandas()
    assert all(find2(int(i)) == int(c) for i, c in zip(lab["id"], lab["comp"]))


def test_boruvka_msf_tree_and_empty(ray_session):
    """A graph that is already a tree returns itself; an empty graph
    returns an empty forest."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.pipelines.msf import boruvka_msf

    tree = pd.DataFrame({"src_id": [0, 1, 2], "dst_id": [1, 2, 3],
                         "w": np.array([5, 3, 9], np.int64)})
    res = boruvka_msf(rd.from_pandas(tree))
    got = (res.edges.to_pandas().sort_values(["src_id", "dst_id"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, tree)
    assert res.rounds == 1  # one round merges the whole path

    empty = rd.from_arrow(pa.table({
        "src_id": pa.array([], pa.int64()),
        "dst_id": pa.array([], pa.int64()),
        "w": pa.array([], pa.int64())}))
    res_e = boruvka_msf(empty)
    assert res_e.edges.count() == 0 and res_e.rounds == 0
