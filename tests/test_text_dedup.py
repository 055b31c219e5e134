"""Text analysis + dedup suite tests (documents-style data with planted dups)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pagerank_ray.functions import text as textfn
from pagerank_ray.stages.dedup import (
    MinHasher,
    SimHasher,
    embedding_near_dups,
    minhash_lsh_dedup,
    ngram_jaccard,
    simhash_near_dups,
)

_WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa lamda mu".split()


def _corpus(n=60, seed=3):
    """Docs with planted near-duplicate pairs (i, i+n): one word changed."""
    rng = np.random.default_rng(seed)
    texts = []
    for i in range(n):
        words = [_WORDS[int(k)] for k in rng.integers(0, len(_WORDS), 60)]
        texts.append(" ".join(words))
    near = []
    for i in range(0, n, 10):  # every 10th doc gets a near-dup copy
        words = texts[i].split()
        words[5] = "changedword"
        near.append(" ".join(words))
    all_texts = texts + near
    ids = np.arange(len(all_texts), dtype=np.int64)
    return pd.DataFrame({"doc_id": ids, "text": all_texts}), n


def test_token_counts_and_quality():
    df = pd.DataFrame({"text": ["hello world", "  ", "", "one two  three"]})
    counts = textfn.whitespace_token_count(df["text"])
    assert list(counts) == [2, 0, 0, 3]
    q = textfn.quality_score_batch(df.copy())
    assert ((q["quality"] >= 0) & (q["quality"] <= 1)).all()


def test_vectorized_text_kernels_match_reference_loops():
    """The round-3 vectorized kernels (regex-count BPE tokens, explode+isin
    stopword votes) must equal the per-document reference loops exactly,
    including punctuation-attached tokens, contractions, unicode, empties."""
    rng = np.random.default_rng(11)
    pieces = _WORDS + ["the", "of", "und", "der", "it's", "we'll", "a,b", "x—y",
                       "...", "naïve", "Straße", "中文", "", "  ", "\t\n", "(the)", "the,"]
    texts = [
        " ".join(pieces[int(k)] for k in rng.integers(0, len(pieces), int(m)))
        for m in rng.integers(0, 25, 200)
    ] + ["", "   ", "the the the", "DER Hund", "don't stop'll"]
    s = pd.Series(texts)
    # BPE-ish count: one regex scan vs the finditer loop
    got = s.str.count(textfn._BPE_ISH_NONWS).to_numpy()
    want = np.array(
        [sum(1 for m in textfn._BPE_ISH.finditer(t) if not m.group().isspace()) for t in texts]
    )
    np.testing.assert_array_equal(got, want)
    # stopword counts: explode+isin vs the per-doc membership loop
    en, de = textfn._stopword_counts(s.str.lower().str.split(), [textfn._STOP_EN, textfn._STOP_DE])
    want_en = np.array([sum(1 for w in t.lower().split() if w in textfn._STOP_EN) for t in texts])
    want_de = np.array([sum(1 for w in t.lower().split() if w in textfn._STOP_DE) for t in texts])
    np.testing.assert_array_equal(en, want_en)
    np.testing.assert_array_equal(de, want_de)


def test_lang_id_heuristic():
    df = pd.DataFrame(
        {"text": ["the cat and the dog are in the house", "der hund und die katze nicht", "这是一个中文句子"]}
    )
    out = textfn.lang_id_batch(df.copy())
    assert list(out["pred_lang"]) == ["en", "de", "zh"]


def test_fingerprint_deterministic():
    s = pd.Series(["abc", "abd", "abc"])
    fp = textfn.fingerprint64(s)
    assert fp[0] == fp[2] and fp[0] != fp[1]


def test_ngram_jaccard():
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0
    assert 0.0 < ngram_jaccard("a b c d e f g h", "a b c d e f g x") < 1.0


def test_minhash_signature_similarity_tracks_jaccard():
    mh = MinHasher()
    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    c = "completely different words that share nothing with the others at all"
    sa, sb, sc = mh.signature(a), mh.signature(b), mh.signature(c)
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.5 > sim_ac


def test_minhash_lsh_finds_planted_dups(ray_session):
    df, n = _corpus()
    ds = rd.from_pandas(df)
    out = minhash_lsh_dedup(ds, threshold=0.7, concurrency=2).to_pandas()
    assert len(out) == len(df)
    # each planted pair (i, n + i//10) clusters together under min-id
    for j, i in enumerate(range(0, n, 10)):
        dup_id = n + j
        assert out.loc[out["doc_id"] == dup_id, "cluster_id"].iloc[0] == i
        assert not out.loc[out["doc_id"] == dup_id, "keep"].iloc[0]
    # non-duplicated docs keep themselves
    kept = out[out["keep"]]
    assert len(kept) == len(df) - n // 10


def test_simhash_near_dups_finds_planted_pairs(ray_session):
    df, n = _corpus()
    pairs = simhash_near_dups(rd.from_pandas(df), max_hamming=10, concurrency=2)
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    planted = {(i, n + j) for j, i in enumerate(range(0, n, 10))}
    assert planted <= found


def test_embedding_near_dups(ray_session):
    rng = np.random.default_rng(0)
    base = rng.standard_normal((40, 16))
    dups = base[:5] + rng.standard_normal((5, 16)) * 0.01  # near-identical copies
    vecs = np.concatenate([base, dups])
    tab = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    pairs = embedding_near_dups(rd.from_arrow(tab), threshold=0.99, n_planes=6, concurrency=2)
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    planted = {(i, 40 + i) for i in range(5)}
    assert len(planted & found) >= 4  # LSH is approximate; allow one miss


def test_decontaminate_planted(ray_session, tmp_path):
    """A corpus doc that copies a benchmark doc verbatim is flagged with
    n_overlap == its full distinct-shingle count; a disjoint-vocab doc is
    not flagged."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pagerank_ray.pipelines.tabular import q_decontaminate_docs
    from pagerank_ray.stages.dedup import _hash_tokens, _shingles_from_token_hashes

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),   # doc 0 = benchmark (0 % 50 == 0)
        "text": pa.array([
            bench_text,                                   # holdout member
            bench_text,                                   # verbatim copy -> fully contaminated
            "iota kappa lambda mu nu xi omicron pi rho",  # disjoint vocab -> clean
            "zzz alpha beta gamma yyy",                   # one shared trigram
        ]),
    })
    sf = str(tmp_path)
    pq.write_table(docs, os.path.join(sf, "documents.parquet"))
    out = q_decontaminate_docs(sf)
    got = dict(zip(out["doc_id"], out["n_overlap"]))
    n_bench = len(_shingles_from_token_hashes(_hash_tokens(bench_text.split()), 3))
    assert got[1] == n_bench
    assert 2 not in got
    assert got[3] == 1  # exactly the 'alpha beta gamma' trigram
