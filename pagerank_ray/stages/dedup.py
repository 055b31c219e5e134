"""Deduplication suite for large-scale training-data pipelines.

All operators follow the engine's partial+final idiom (SURVEY.md §2.5 A1):
vectorized per-batch signature computation in ``map_batches`` (stateful actor
pools where signature state — hash coefficients — is loaded once), then a
keyed groupby for candidate generation, then verification. No stage holds the
corpus in one process; only candidate PAIRS (provably small: LSH bucket sizes
are capped and logged) reach the driver for union-find clustering.

Operators:
- exact dedup         — content hash partition → min-id winner (tabular.q_exact_dedup_docs)
- MinHash + LSH       — word-shingle → k-perm minhash → banded buckets → verified Jaccard
- SimHash             — 64-bit token-hash fingerprint → banded blocking → Hamming verify
- n-gram Jaccard      — the verification kernel, exposed standalone
- embedding cosine    — random-hyperplane LSH buckets → within-bucket cosine verify
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from pagerank_ray.stages import joins

_MERSENNE = np.uint64((1 << 61) - 1)


def _token_shingles(text: str, k: int) -> np.ndarray:
    """Sorted unique crc32 hashes of the k-word shingles of text."""
    toks = text.split()
    if len(toks) < k:
        joined = " ".join(toks)
        return np.array([zlib.crc32(joined.encode())], dtype=np.uint64)
    hashes = [
        zlib.crc32(" ".join(toks[i : i + k]).encode()) for i in range(len(toks) - k + 1)
    ]
    return np.unique(np.array(hashes, dtype=np.uint64))


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact Jaccard similarity of k-word shingle sets (the verify kernel)."""
    sa = _token_shingles(a, k)
    sb = _token_shingles(b, k)
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


class MinHasher:
    """Actor-pool stage: text → (num_perm) minhash signature → LSH band rows.

    Hash coefficients are generated once per actor in ``__init__`` from a
    fixed seed (identical across actors ⇒ identical signatures).
    """

    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        num_perm: int = 128,
        bands: int = 16,
        shingle_k: int = 3,
        seed: int = 7,
    ):
        assert num_perm % bands == 0
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.shingle_k = shingle_k
        self.id_col = id_col
        self.text_col = text_col

    def signature(self, text: str) -> np.ndarray:
        sh = _token_shingles(text, self.shingle_k)
        # sig[i] = min over shingles of (a_i * h + b_i) mod p  (vectorized k×s)
        prod = (self.a[:, None] * sh[None, :] + self.b[:, None]) % _MERSENNE
        return prod.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        out_id, out_band, out_hash = [], [], []
        for doc_id, text in zip(ids, texts):
            sig = self.signature(text or "")
            for band in range(self.bands):
                chunk = sig[band * self.rows : (band + 1) * self.rows]
                out_id.append(doc_id)
                out_band.append(band)
                out_hash.append(zlib.crc32(chunk.tobytes()))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.int64()),
            }
        )


def _bucket_pairs(df: pd.DataFrame, cap: int) -> pd.DataFrame:
    ids = np.sort(df["doc_id"].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    if len(ids) > cap:  # cap quadratic blowup on degenerate buckets; logged upstream
        ids = ids[:cap]
    i, j = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[i], "b": ids[j]})


def minhash_lsh_dedup(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 128,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.8,
    bucket_cap: int = 64,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Near-duplicate clusters via MinHash-LSH.

    Returns (doc_id, cluster_id, keep): cluster_id = min doc_id of the
    verified near-dup cluster; keep = doc_id == cluster_id. Candidate pairs
    are verified with exact shingle Jaccard ≥ threshold before clustering
    (union-find on the driver — valid because the verified pair set is
    orders of magnitude smaller than the corpus; bucket_cap bounds it).
    """
    band_rows = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(
            id_col=id_col, text_col=text_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
        ),
        batch_format="pyarrow",
        concurrency=joins.pool_size(concurrency),
        num_cpus=1,
        batch_size=1024,
    )
    pairs = (
        band_rows.groupby(["band", "band_hash"])
        .map_groups(lambda df: _bucket_pairs(df, bucket_cap), batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    # verify candidates with exact n-gram Jaccard (broadcast candidate texts)
    doc_ids = docs.count()
    if len(pairs):
        cand_ids = np.unique(np.concatenate([pairs["a"].to_numpy(), pairs["b"].to_numpy()]))
        texts_tab = joins._collect_arrow(
            docs.select_columns([id_col, text_col]).map_batches(
                lambda t: t.filter(
                    pa.compute.is_in(t.column(id_col), value_set=pa.array(cand_ids))
                ),
                batch_format="pyarrow",
            )
        )
        text_by_id = dict(
            zip(texts_tab.column(id_col).to_pylist(), texts_tab.column(text_col).to_pylist())
        )
        keep_mask = [
            ngram_jaccard(text_by_id[a], text_by_id[b], shingle_k) >= threshold
            for a, b in zip(pairs["a"], pairs["b"])
        ]
        pairs = pairs[np.array(keep_mask, dtype=bool)] if len(keep_mask) else pairs
    # union-find over verified pairs
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent.get(root, root)
        while parent.get(x, x) != root:
            parent[x], x = root, parent.get(x, x)
        return root

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    all_ids = docs.select_columns([id_col]).to_pandas()[id_col].to_numpy()
    cluster = np.array([find(int(i)) for i in all_ids], dtype=np.int64)
    return pd.DataFrame(
        {"doc_id": all_ids, "cluster_id": cluster, "keep": all_ids == cluster}
    ).sort_values("doc_id").reset_index(drop=True)


class SimHasher:
    """Actor-pool stage: 64-bit SimHash over token crc32 hashes + 4×16-bit
    blocking keys (two near-dups within Hamming distance 3 share ≥1 block)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    @staticmethod
    def simhash64(text: str) -> int:
        toks = text.split()
        if not toks:
            return 0
        hashes = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
        hashes = hashes * np.uint64(0x9E3779B97F4A7C15)  # spread to 64 bits
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        return int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_pylist()
        texts = batch.column(self.text_col).to_pylist()
        sigs = [self.simhash64(t or "") for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array(np.array(sigs, dtype=np.uint64).view(np.int64)),
            }
        )


def simhash_near_dups(
    docs: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Pairs of documents with SimHash Hamming distance ≤ max_hamming,
    via 4-band (16-bit) blocking + in-bucket verification."""
    sigs = docs.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
        concurrency=joins.pool_size(concurrency),
        num_cpus=1,
    )

    def explode_blocks(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sh = t.column("simhash").to_numpy().view(np.uint64)
        out_id, out_block, out_key, out_sig = [], [], [], []
        for blk in range(4):
            key = (sh >> np.uint64(16 * blk)) & np.uint64(0xFFFF)
            out_id.append(ids)
            out_block.append(np.full(len(ids), blk, dtype=np.int32))
            out_key.append(key.astype(np.int64))
            out_sig.append(sh.view(np.int64))
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_id)),
                "block": pa.array(np.concatenate(out_block)),
                "key": pa.array(np.concatenate(out_key)),
                "simhash": pa.array(np.concatenate(out_sig)),
            }
        )

    def bucket_verify(df: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(df["doc_id"].to_numpy())
        ids = df["doc_id"].to_numpy()[order]
        sh = df["simhash"].to_numpy()[order].view(np.uint64)
        _, first = np.unique(ids, return_index=True)
        ids, sh = ids[first], sh[first]
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
        i, j = np.triu_indices(len(ids), k=1)
        ham = np.array(
            [bin(int(sh[x]) ^ int(sh[y])).count("1") for x, y in zip(i, j)], dtype=np.int64
        )
        ok = ham <= max_hamming
        return pd.DataFrame({"a": ids[i[ok]], "b": ids[j[ok]]})

    pairs = (
        sigs.map_batches(explode_blocks, batch_format="pyarrow")
        .groupby(["block", "key"])
        .map_groups(bucket_verify, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty or "a" not in pairs.columns:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    return pairs.drop_duplicates().sort_values(["a", "b"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# embedding-space near-dup
# ---------------------------------------------------------------------------

class HyperplaneLSH:
    """Actor-pool stage: embedding → sign-bit bucket under seeded random
    hyperplanes (state = the projection matrix, built once per actor)."""

    def __init__(self, n_planes: int = 12, dim: int | None = None, seed: int = 11,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.n_planes = n_planes
        self.seed = seed
        self.planes = None
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in batch.column(self.vec_col).to_pylist()]
        )
        if self.planes is None:
            rng = np.random.default_rng(self.seed)
            self.planes = rng.standard_normal((vecs.shape[1], self.n_planes))
        bits = (vecs @ self.planes) > 0
        bucket = (bits.astype(np.int64) << np.arange(self.n_planes, dtype=np.int64)).sum(axis=1)
        norms = np.linalg.norm(vecs, axis=1)
        return pa.table(
            {
                "vec_id": batch.column(self.id_col).cast(pa.int64()),
                "bucket": pa.array(bucket),
                "embedding": batch.column(self.vec_col),
                "norm": pa.array(norms),
            }
        )


def embedding_near_dups(
    embeddings: rd.Dataset,
    *,
    threshold: float = 0.95,
    n_planes: int = 12,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Pairs of vectors with cosine ≥ threshold found within hyperplane-LSH
    buckets (approximate: pairs split across all buckets can be missed —
    n_planes trades recall for bucket size)."""

    def bucket_verify(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(
                {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
                 "cosine": pd.Series(dtype=np.float64)}
            )
        vecs = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
        norms = df["norm"].to_numpy()
        unit = vecs / np.maximum(norms[:, None], 1e-12)
        sims = unit @ unit.T
        i, j = np.triu_indices(len(ids), k=1)
        ok = sims[i, j] >= threshold
        a, b = ids[i[ok]], ids[j[ok]]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pd.DataFrame({"a": a2, "b": b2, "cosine": np.round(sims[i, j][ok], 8)})

    bucketed = embeddings.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs=dict(n_planes=n_planes),
        batch_format="pyarrow",
        concurrency=joins.pool_size(concurrency),
        num_cpus=1,
    )
    out = bucketed.groupby("bucket").map_groups(bucket_verify, batch_format="pandas").to_pandas()
    if out.empty or "a" not in out.columns:  # no near-dups anywhere
        return pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64),
             "cosine": pd.Series(dtype=np.float64)}
        )
    return (
        out.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
    )
