"""Large-corpus scale datapoints for span_dedup + winnowing_fp (r5).

Deterministic synthetic corpus, pure function of the doc id (same vectorized
uint64 mixing scheme as bench.py:dedup_scale, NO perturbation): docs
0..n_base-1 are unique-ish random-token docs, docs n_base.. are EXACT copies
of every dup_every-th base doc. Planted truth checked per run:
  - span_dedup: an exact-copy doc whose base precedes it in (doc_id, start)
    order must have removed_ratio == 1.0 (its every k-gram is a duplicate).
  - winnowing_fp: an exact copy selects the identical fingerprint set, so
    n_shared == n_fp-distinct-hash count for copy AND base.

Two corpus sizes (4x apart) in fresh Ray sessions → wall-time ratio shows
the corpus-linear behavior the 100 TB story needs (both operators shuffle
only gram/fingerprint rows bucketed by hash — no all-pairs, no driver sets).

Usage: python bench/textdedup_scale.py   (env: GRAFT_TEXT_DOCS base size,
default 50_000; RAY_GRAFT_CPUS, default 32)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE = int(float(os.environ.get("GRAFT_TEXT_DOCS", 50_000)))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
DUP_EVERY = 10
VOCAB = 30_000
MIX = np.uint64(0x9E3779B97F4A7C15)


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def gen_corpus(out_dir: str, n_base: int) -> int:
    """documents.parquet with n_base + n_base//DUP_EVERY rows."""
    import pyarrow as pa
    import ray.data as rd

    n_dups = n_base // DUP_EVERY
    n_total = n_base + n_dups

    def make_docs(batch) -> "pa.Table":
        ids = batch["id"].astype(np.int64)
        base = np.where(ids < n_base, ids, (ids - n_base) * DUP_EVERY)
        with np.errstate(over="ignore"):
            lens = 80 + (
                (base.astype(np.uint64) * MIX) >> np.uint64(40)
            ).astype(np.int64) % 70
            max_len = int(lens.max()) if len(lens) else 1
            a = base[:, None].astype(np.uint64) * MIX
            b = (np.arange(max_len, dtype=np.uint64)[None, :] + np.uint64(1)) * np.uint64(
                0xC2B2AE3D27D4EB4F
            )
            toks = (_fmix(a + b) % np.uint64(VOCAB)).astype(np.int64)
        texts = []
        for i in range(len(ids)):  # join only; token choice is vectorized
            texts.append(" ".join(map("t{}".format, toks[i, : lens[i]])))
        return pa.table(
            {
                "doc_id": pa.array(ids + 1, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(ids)),
                "source": pa.array(["s"] * len(ids)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        )

    (
        rd.range(n_total, override_num_blocks=4 * NCPU)
        .map_batches(make_docs, batch_size=4096, batch_format="numpy")
        .write_parquet(out_dir)
    )
    return n_total


def run_one(n_base: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from pagerank_ray.pipelines.tabular import q_span_dedup, q_winnowing_fp

    work = f"/tmp/textdedup_scale_{n_base}"
    doc_dir = os.path.join(work, "documents.parquet")
    if not os.path.exists(doc_dir):
        gen_corpus(doc_dir, n_base)
    n_total = n_base + n_base // DUP_EVERY

    t0 = time.perf_counter()
    sd = q_span_dedup(work)
    t_span = time.perf_counter() - t0
    # planted truth: every exact-copy doc fully covered by duplicate spans
    copies = sd[sd["doc_id"] > n_base]
    span_ok = bool((copies["removed_ratio"] == 1.0).all()) and len(copies) == n_base // DUP_EVERY

    t0 = time.perf_counter()
    wf = q_winnowing_fp(work)
    t_win = time.perf_counter() - t0
    # planted truth: copies share their full fingerprint set with the base
    wcop = wf[wf["doc_id"] > n_base]
    win_ok = bool((wcop["n_shared"] > 0).all())

    ray.shutdown()
    return {
        "n_docs": n_total,
        "n_tokens_approx": n_total * 115,
        "span_dedup_sec": round(t_span, 1),
        "winnowing_sec": round(t_win, 1),
        "span_planted_ok": span_ok,
        "winnowing_planted_ok": win_ok,
        "rows_span": len(sd),
        "rows_win": len(wf),
    }


if __name__ == "__main__":
    out = {"num_cpus": NCPU, "runs": []}
    for nb in (BASE, 4 * BASE):
        r = run_one(nb)
        r["n_base"] = nb
        out["runs"].append(r)
        print(json.dumps(r), flush=True)
    a, b = out["runs"]
    out["span_scale_ratio"] = round(b["span_dedup_sec"] / max(a["span_dedup_sec"], 1e-9), 2)
    out["win_scale_ratio"] = round(b["winnowing_sec"] / max(a["winnowing_sec"], 1e-9), 2)
    print(json.dumps(out))
