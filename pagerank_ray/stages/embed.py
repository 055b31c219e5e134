"""Embedding-inference stage — the canonical model-in-``__init__`` actor
pattern (VERDICT r4 item 7).

The "model" is deterministic feature hashing (Weinberger et al., "Feature
Hashing for Large Scale Multitask Learning", ICML 2009): each whitespace
token hashes to a bucket ``h % dim`` with a sign bit from an independent bit
of the same hash; signed counts accumulate per document and the vector is
L2-normalized. On a GPU pipeline ``__init__`` would load real weights once
per actor and ``__call__`` would run batched inference; the plumbing here —
stateful actor pool via ``map_batches(Cls, concurrency=...)``, Arrow in/out,
list<double> embedding column — is exactly that shape, while the
deterministic projection keeps the output end-to-end hash-checkable.

SQL-reproducible by construction: the token hash is the repo-wide
poly+fmix64 hash that ``__ray_entry__._TOKEN_HASH_CTES`` recomputes in
DuckDB HUGEINT; the un-normalized bucket values are exact INTEGERS, so the
only float steps are one ``1/sqrt`` and one multiply, mirrored verbatim in
the oracle (the exact-int-moments idiom used by stddev/modularity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pagerank_ray.stages.dedup import _hash_tokens


class HashingEmbedder:
    """documents(doc_id, text) → (doc_id, embedding list<double>).

    ``__init__`` is the per-actor model load (here: fixing the projection
    config); ``__call__`` is batched inference, fully vectorized: one hash
    call for every token in the batch, one ``np.add.at`` scatter into the
    (docs × dim) matrix, one normalize."""

    def __init__(self, dim: int = 32, round_decimals: int | None = 6):
        self.dim = dim
        self.round_decimals = round_decimals

    def _embed(self, texts: list[str]) -> np.ndarray:
        tok_lists = [(t or "").split() for t in texts]
        flat = [tok for toks in tok_lists for tok in toks]
        th = _hash_tokens(flat)
        lengths = np.fromiter((len(t) for t in tok_lists), np.int64, count=len(tok_lists))
        doc_idx = np.repeat(np.arange(len(texts)), lengths)
        raw = np.zeros((len(texts), self.dim), dtype=np.int64)
        if len(th):
            bucket = (th % np.uint64(self.dim)).astype(np.int64)
            sign = 1 - 2 * ((th >> np.uint64(33)) & np.uint64(1)).astype(np.int64)
            np.add.at(raw, (doc_idx, bucket), sign)
        # exact-integer squared norm; zero vectors stay zero
        s = (raw * raw).sum(axis=1)
        inv = np.where(s > 0, 1.0 / np.sqrt(s.astype(np.float64)), 0.0)
        emb = raw.astype(np.float64) * inv[:, None]
        if self.round_decimals is not None:
            from pagerank_ray.functions.text import round_half_away

            emb = round_half_away(emb, self.round_decimals)
        return emb

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        emb = self._embed(texts)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(emb.ravel(), pa.float64()), self.dim
                ),
            }
        )


def embed_documents(docs, *, dim: int = 32, concurrency=(1, 4), batch_size: int = 512):
    """Dataset(documents) → Dataset(doc_id, embedding) via the actor pool."""
    return docs.map_batches(
        HashingEmbedder,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
