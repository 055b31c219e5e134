"""Similarity search over an embedding column (``list<float>``).

Baseline: exact brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one float64 matmul against it, emits its local
top-k per query (the partial), and a per-query ``groupby.map_groups`` keeps
the global top-k (the final). Scale path: IVF — seeded k-means centroids
(Lloyd iterations as map_batches assign + groupby mean), vectors bucketed by
centroid, queries probe only the ``nprobe`` nearest centroid buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from pagerank_ray.stages import joins


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def stack_vectors(col) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow ``list<float>`` column: ONE
    ``list_flatten`` + reshape — no per-row Python object churn (the r2-flagged
    ``to_pylist()`` stacking). Falls back to the row-wise path for ragged
    lists or nulls (never the case for real embedding columns)."""
    import pyarrow.compute as pc

    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False).astype(np.float64)
    if not np.isnan(lens).any() and (lens == lens[0]).all():
        vals = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        return vals.reshape(n, int(lens[0])).astype(np.float64, copy=False)
    return _stack(col.to_pylist())


def _unit(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


class _BruteForceScore:
    """Stateless-task batch fn with per-worker cached query matrix."""

    def __init__(self, query_ref, k: int, id_col: str, vec_col: str):
        self.query_ref = query_ref
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, qmat = joins.broadcast_get(self.query_ref, lambda v: v, "knn-queries")
        vecs = _unit(stack_vectors(batch.column(self.vec_col)))
        ids = batch.column(self.id_col).to_numpy()
        sims = vecs @ qmat.T  # (batch, q)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            # tie-aware local top-k: (sim desc, vec_id asc) — argpartition
            # keeps an ARBITRARY member of a tie group at the k boundary,
            # which breaks the deterministic contract _final_topk and the
            # SQL oracle pin (ORDER BY sim DESC, vec_id)
            rows = np.lexsort((ids, -sims[:, qi]))[:k]
            out_q.append(np.full(k, qids[qi], dtype=np.int64))
            out_id.append(ids[rows])
            out_sim.append(sims[rows, qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                "cosine": pa.array(np.concatenate(out_sim)),
            }
        )


def _final_topk(k: int, exclude_self: bool):
    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if exclude_self:
            df = df[df["vec_id"] != df["query_id"]]
        df = df.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        df = df.reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return fn


def knn_bruteforce(
    vectors: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Exact cosine top-k: returns (query_id, vec_id, cosine, rank).

    Deterministic tie-break: higher cosine first, then smaller vec_id.
    """
    qmat = _unit(np.asarray(queries, dtype=np.float64))
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qmat))
    partial = vectors.map_batches(
        _BruteForceScore(ref, k + (1 if exclude_self else 0), id_col, vec_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
    out = (
        partial.groupby("query_id")
        .map_groups(_final_topk(k, exclude_self), batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return out


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the 100TB-scale path
# ---------------------------------------------------------------------------

def train_centroids(
    vectors: rd.Dataset,
    n_centroids: int,
    *,
    vec_col: str = "embedding",
    iters: int = 4,
    sample_cap: int = 20_000,
    seed: int = 3,
) -> np.ndarray:
    """Seeded k-means: centroids init from a deterministic capped sample, then
    ``iters`` DISTRIBUTED Lloyd rounds — each round streams the FULL dataset
    through ``map_batches`` (one matmul + argmax + scatter-add per batch,
    centroids broadcast via ``ray.put``) emitting per-centroid partial
    (sum, count) rows; the driver combines only k×dim floats per batch.
    The corpus never materializes; only the INIT sample (capped at
    ``sample_cap``) is collected."""
    n_total = vectors.count()
    frac = min(1.0, sample_cap / max(n_total, 1))
    sample = vectors if frac >= 1.0 else vectors.random_sample(frac, seed=seed)
    mat = _unit(stack_vectors(joins._collect_arrow(sample.select_columns([vec_col])).column(vec_col)))
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    k, dim = centroids.shape
    for _ in range(iters):
        ref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            cents = joins.broadcast_get(ref, lambda v: v, "lloyd")  # ref.hex keys the cache per round
            vecs = _unit(stack_vectors(batch.column(vec_col)))
            a = np.argmax(vecs @ cents.T, axis=1)
            sums = np.zeros((k, dim), dtype=np.float64)
            np.add.at(sums, a, vecs)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            return pa.table(
                {
                    "centroid": pa.array(np.arange(k, dtype=np.int64)),
                    "count": pa.array(counts),
                    "vsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.reshape(-1)), dim
                    ),
                }
            )

        ptab = joins._collect_arrow(
            vectors.select_columns([vec_col]).map_batches(partial, batch_format="pyarrow")
        )
        cid = ptab.column("centroid").to_numpy(zero_copy_only=False)
        cnt = ptab.column("count").to_numpy(zero_copy_only=False)
        vs = stack_vectors(ptab.column("vsum"))
        tot_cnt = np.bincount(cid, weights=cnt, minlength=k)
        tot_sum = np.zeros((k, dim), dtype=np.float64)
        np.add.at(tot_sum, cid, vs)
        nonempty = tot_cnt > 0
        centroids = centroids.copy()
        centroids[nonempty] = tot_sum[nonempty] / tot_cnt[nonempty, None]
        centroids = _unit(centroids)
    return centroids


def build_ivf(
    vectors: rd.Dataset,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Assign every vector to its nearest centroid (adds ``centroid`` column)."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        cents = joins.broadcast_get(ref, lambda v: v, "ivf-centroids")
        vecs = _unit(stack_vectors(batch.column(vec_col)))
        a = np.argmax(vecs @ cents.T, axis=1).astype(np.int64)
        return batch.append_column("centroid", pa.array(a))

    return vectors.map_batches(assign, batch_format="pyarrow")


class _IVFScore:
    """Per-batch IVF scorer: scores a batch against the broadcast query matrix
    and masks out, per query, any vector whose centroid bucket is NOT in that
    query's own ``nprobe`` probe set (the IVF nprobe contract — a query's
    result set never depends on which other queries are co-batched)."""

    def __init__(self, ref, k: int, id_col: str, vec_col: str):
        self.ref = ref
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids, qmat, allowed = joins.broadcast_get(self.ref, lambda v: v, "ivf-queries")
        vecs = _unit(stack_vectors(batch.column(self.vec_col)))
        ids = batch.column(self.id_col).to_numpy()
        cents_of_rows = batch.column("centroid").to_numpy()
        sims = vecs @ qmat.T  # (batch, q)
        mask = allowed[:, cents_of_rows].T  # (batch, q) bool
        sims = np.where(mask, sims, -2.0)  # cosine ∈ [-1,1]: -2 sorts last
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(sims.shape[1]):
            # tie-aware local top-k (sim desc, vec_id asc) — see _BruteForceScore
            rows = np.lexsort((ids, -sims[:, qi]))[:k]
            keep = sims[rows, qi] > -1.5  # drop masked-out fillers
            out_q.append(np.full(keep.sum(), qids[qi], dtype=np.int64))
            out_id.append(ids[rows[keep]])
            out_sim.append(sims[rows[keep], qi])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                "cosine": pa.array(np.concatenate(out_sim)),
            }
        )


def knn_ivf(
    ivf: rd.Dataset,
    centroids: np.ndarray,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> pd.DataFrame:
    """Approximate top-k: each query scans only its own ``nprobe`` nearest
    centroid buckets. With ``nprobe == len(centroids)`` every bucket is probed
    and the result equals exact brute force — the driver's exactness gate on
    the assignment/bucket-scan machinery; recall at nprobe < nlist is bounded
    in tests/test_knn_multimodal.py."""
    qmat = _unit(np.asarray(queries, dtype=np.float64))
    cents = _unit(np.asarray(centroids, dtype=np.float64))
    nprobe = min(nprobe, len(cents))
    # stable: similarity ties break toward the LOWER centroid id — load-bearing
    # for q_ann_recall's oracle parity (ROW_NUMBER ... ORDER BY sim DESC, cid)
    # whenever duplicate centroid vectors straddle the nprobe boundary
    probes = np.argsort(-(qmat @ cents.T), axis=1, kind="stable")[:, :nprobe]
    allowed = np.zeros((len(qmat), len(cents)), dtype=bool)
    np.put_along_axis(allowed, probes, True, axis=1)
    wanted = np.unique(probes)

    import pyarrow.compute as pc

    pruned = ivf.map_batches(
        lambda t: t.filter(pc.is_in(t.column("centroid"), value_set=pa.array(wanted))),
        batch_format="pyarrow",
    )
    qid_arr = np.asarray(query_ids, dtype=np.int64)
    ref = ray.put((qid_arr, qmat, allowed))
    partial = pruned.map_batches(
        _IVFScore(ref, k + (1 if exclude_self else 0), id_col, vec_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return (
        partial.groupby("query_id")
        .map_groups(_final_topk(k, exclude_self), batch_format="pandas")
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
