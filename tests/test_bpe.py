"""BPE tokenizer: training determinism, canonical-greedy equivalence, and
the Ray actor-stage kernel vs a per-doc reference."""
import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pagerank_ray.functions.bpe import (
    BPETokenCounter,
    BPETokenizer,
    load_merges,
    pretokenize,
    train_bpe,
    _to_symbols,
)


def _gpt2_greedy_encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """The canonical public algorithm (Radford et al. 2019 encoder.py
    `bpe()`): repeatedly merge the lowest-rank adjacent pair, leftmost-first
    within a rank, until no mergeable pair remains."""
    syms = _to_symbols(word)
    while len(syms) > 1:
        pairs = {(a, b) for a, b in zip(syms, syms[1:])}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_vendored_table_loads_and_splits():
    merges = load_merges()
    assert len(merges) >= 20
    tok = BPETokenizer(merges)
    enc = tok.encode("key agg customer table")
    assert len(enc) > 4  # multi-token splits survive — table is not degenerate
    assert "".join(enc).replace("Ġ", " ") == "key agg customer table"


@settings(max_examples=150, deadline=None)
@given(st.text(alphabet="abcdefghijklm 0123456789.!", max_size=60))
def test_encode_matches_canonical_greedy(text):
    """Per-rank replace-to-fixpoint ≡ GPT-2 repeated lowest-rank merge, for a
    consistently TRAINED table (a rank-r merge only creates pairs trained
    later) — on arbitrary text, not just the training corpus."""
    merges = load_merges()
    ranks = {p: i for i, p in enumerate(merges)}
    tok = BPETokenizer(merges)
    for w in pretokenize(text):
        assert tok.encode_word(w) == _gpt2_greedy_encode(w, ranks)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="ab c", min_size=1, max_size=20), min_size=1, max_size=8),
       st.integers(min_value=1, max_value=12))
def test_trained_table_roundtrips_and_stays_greedy(texts, n_merges):
    """Tables trained on arbitrary corpora keep both invariants: encode is
    lossless (concat of tokens reproduces the pre-token) and equals the
    canonical greedy algorithm."""
    merges = train_bpe(texts, n_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    tok = BPETokenizer(merges)
    for t in texts:
        for w in pretokenize(t):
            enc = tok.encode_word(w)
            assert "".join(enc) == w.replace(" ", "Ġ")
            assert enc == _gpt2_greedy_encode(w, ranks)


def test_token_counter_kernel_matches_per_doc_reference():
    docs = [
        "key agg row scan slow fast",
        "",
        "a a a the line",
        "stream stream stream",
        "zzz unseen wordforms 12345 !!",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    out = BPETokenCounter()(t)
    tok = BPETokenizer()
    exp_pre = [len(pretokenize(d)) for d in docs]
    exp_tok = [len(tok.encode(d)) for d in docs]
    assert out.column("n_pretokens").to_pylist() == exp_pre
    assert out.column("n_tokens").to_pylist() == exp_tok
    assert out.column("doc_id").to_pylist() == list(range(len(docs)))


def test_training_is_deterministic():
    texts = ["ab ab ba", "ba ab", "aa bb ab"]
    assert train_bpe(texts, 6) == train_bpe(texts, 6)
