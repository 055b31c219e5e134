"""Property-based tests (hypothesis) for the pure kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pagerank_ray.functions.extract import extract_page
from pagerank_ray.functions.text import whitespace_token_count
from pagerank_ray.oracle.numpy_oracle import pagerank_oracle
from pagerank_ray.stages.csr import build_shard_table
from pagerank_ray.stages.dedup import ngram_jaccard

text_strategy = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)


@settings(max_examples=50, deadline=None)
@given(text_strategy)
def test_extractor_total_and_deterministic(body):
    """Extractor never raises on arbitrary html-ish input and is deterministic."""
    html = f"<body><p>{body}</p><a href='/x'>l</a></body>".encode("utf-8", "replace")
    out1 = extract_page("https://h.example/p", html)
    out2 = extract_page("https://h.example/p", html)
    assert out1 == out2
    assert isinstance(out1[0], str)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="ab ", max_size=20), min_size=1, max_size=10))
def test_token_count_nonnegative_and_stable(texts):
    import pandas as pd

    c1 = whitespace_token_count(pd.Series(texts))
    c2 = whitespace_token_count(pd.Series(texts))
    assert (c1 >= 0).all()
    np.testing.assert_array_equal(c1, c2)


@settings(max_examples=25, deadline=None)
@given(st.text(alphabet="abcde ", max_size=100), st.text(alphabet="abcde ", max_size=100))
def test_jaccard_bounds_and_symmetry(a, b):
    j = ngram_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == ngram_jaccard(b, a)
    assert ngram_jaccard(a, a) == 1.0


@settings(max_examples=20, deadline=None)
@given(st.integers(2, 40), st.integers(0, 200), st.integers(0, 2**31 - 1))
def test_oracle_mass_conservation_any_graph(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0) if m else np.empty((0, 2), int)
    r, _, _ = pagerank_oracle(n, pairs[:, 0], pairs[:, 1], max_iters=60)
    assert abs(r.sum() - n) < 1e-8  # Σr = n regardless of topology
    assert (r > 0).all()


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 30), st.integers(0, 100), st.integers(0, 2**31 - 1))
def test_csr_shard_roundtrip_any_edges(n, m, seed):
    """indptr/dst arrays always reconstruct the exact multiset of edges."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    t = build_shard_table(0, src, dst, 0, n)
    indptr = np.asarray(t.column("indptr")[0].values)
    dsts = np.asarray(t.column("dst_ids")[0].values)
    assert indptr[-1] == m
    rebuilt_src = np.repeat(np.arange(n), np.diff(indptr))
    got = sorted(zip(rebuilt_src, dsts))
    assert got == sorted(zip(src, dst))


# ---------------------------------------------------------------------------
# codec + weighted-pair property tests (round 3)
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_qoi_roundtrip_property(h, w, seed):
    """QOI is lossless: decode(encode(img)) == img for ANY uint8 RGB image."""
    from pagerank_ray.stages.qoi import decode_qoi, encode_qoi

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_qoi(encode_qoi(img)) == img).all()


@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(h, w, seed):
    """GIF LZW is lossless over the quantized palette for ANY image."""
    from pagerank_ray.stages.gif import _PALETTE, decode_gif, encode_gif, quantize_662

    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert (decode_gif(encode_gif(img)) == _PALETTE[quantize_662(img)]).all()


@given(
    st.lists(st.text(alphabet="ab the cat x", min_size=0, max_size=60), min_size=1, max_size=20)
)
@settings(max_examples=40, deadline=None)
def test_gopher_and_repetition_match_python_reference(texts):
    """The vectorized gopher/repetition kernels agree with a direct per-doc
    Python implementation of the pinned rules on arbitrary text."""
    import pandas as pd

    from pagerank_ray.functions.text import (
        _STOP_EN,
        gopher_stats_batch,
        repetition_stats_batch,
    )

    s = pd.Series(texts)
    g = gopher_stats_batch(s)
    r = repetition_stats_batch(s)
    for i, t in enumerate(texts):
        toks = t.strip().split()
        nw = len(toks)
        wc = sum(len(w) for w in toks)
        stop = sum(1 for w in toks if w.lower() in _STOP_EN)
        assert g["n_words"][i] == nw
        assert g["word_chars"][i] == wc
        assert g["stop_count"][i] == stop
        expected_pass = int(
            50 <= nw <= 100000 and 3 * nw <= wc <= 10 * nw and stop >= 2
        )
        assert g["gopher_pass"][i] == expected_pass
        if nw:
            from collections import Counter

            c = Counter(toks)
            assert abs(r["dup_word_frac"][i] - (nw - len(c)) / nw) < 1e-12
            assert abs(r["top_word_frac"][i] - max(c.values()) / nw) < 1e-12
            if nw >= 2:
                bg = Counter(zip(toks, toks[1:]))
                assert abs(r["top_bigram_frac"][i] - max(bg.values()) / (nw - 1)) < 1e-12
        else:
            assert r["dup_word_frac"][i] == 0.0


@given(st.integers(0, 2**31), st.integers(1, 400))
@settings(max_examples=20, deadline=None)
def test_cms_never_underestimates(seed, nkeys):
    """Count-Min point estimates are lower-bounded by the true count for
    every key (the sketch's one-sided error guarantee), on any key set."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from pagerank_ray.stages.sketch import cms_build, cms_estimate

    rng = np.random.default_rng(seed)
    keys = rng.integers(0, max(nkeys // 3, 1), size=nkeys).astype(np.int64)
    ds = rd.from_arrow(pa.table({"k": keys}))
    counters = cms_build(ds, "k", width=64)
    uniq, true = np.unique(keys, return_counts=True)
    est = cms_estimate(uniq, counters)
    assert (est >= true).all()
    assert counters.sum() == 2 * nkeys  # each occurrence hits one slot per row
