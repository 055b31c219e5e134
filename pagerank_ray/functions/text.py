"""Text analysis batch ops for large-scale training-data pipelines.

All vectorized (pandas str kernels / numpy) or regex-compiled-once actor
stages; every op is deterministic. Used over the driver `documents` table and
over extracted page text.

Ops: token counting (whitespace + BPE-ish regex), language id (unicode-script
+ stopword heuristic), quality scoring (length/punct/stopword ratios),
document fingerprinting (rolling hash).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

_WS = re.compile(r"\s+")
# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit runs,
# punctuation runs, whitespace-prefixed words
_BPE_ISH = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\w\s]+|\s+")
# The count of NON-whitespace matches of _BPE_ISH equals the match count of
# the pattern with the trailing \s+ branch removed: the \s+ branch only fires
# where every other branch fails, and dropping it just makes the scanner skip
# those characters — the next real match starts at the same position either
# way (the optional leading ' ?' can absorb at most the run's final space,
# which is exactly the match the full pattern produces after consuming the
# run). Pinned batch-vs-finditer in tests/test_text_dedup.py.
_BPE_ISH_NONWS = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?\w+| ?[^\w\s]+")

_STOP_EN = frozenset(
    "the of and to a in is it you that he was for on are as with his they at be this".split()
)
_STOP_DE = frozenset(
    "der die das und ist ich nicht sie du wir ein eine zu den dem mit von auf für".split()
)
_PUNCT = re.compile(r"[^\w\s]")


def whitespace_token_count(texts: pd.Series) -> np.ndarray:
    """Count of whitespace-separated tokens of the trimmed text (0 for empty).

    Matches DuckDB ``len(regexp_split_to_array(trim(text), '\\s+'))`` with the
    empty-string special case.
    """
    stripped = texts.fillna("").str.strip()
    counts = stripped.str.split().str.len().fillna(0).to_numpy()
    return np.asarray(counts, dtype=np.int64)


class TokenCounter:
    """Actor-pool stage: adds n_tokens (whitespace) and n_bpe_tokens (regex)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("")
        batch["n_tokens"] = whitespace_token_count(texts)
        # one C-level regex scan per string — no per-document Python loop
        batch["n_bpe_tokens"] = texts.str.count(_BPE_ISH_NONWS).to_numpy(dtype=np.int64)
        return batch


def _stopword_counts(tokens: pd.Series, stopsets) -> list[np.ndarray]:
    """Per-doc counts of tokens contained in each stopset: ONE explode + isin
    + bincount per set over the whole batch — no per-document Python loop.
    ``tokens`` is a Series of token lists (``texts.str.split()`` output);
    membership is tested on whole tokens (punctuation-attached tokens don't
    match), the exact semantics of ``w in STOPSET`` over a split."""
    n = len(tokens)
    n_tok = tokens.str.len().fillna(0).to_numpy(dtype=np.int64)
    # explode emits len(list) rows per doc, plus one NaN row for empty lists
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), np.maximum(n_tok, 1))
    flat = tokens.explode(ignore_index=True)
    out = []
    for s in stopsets:
        hit = flat.isin(s).to_numpy()  # NaN rows → False
        out.append(np.bincount(doc_idx[hit], minlength=n).astype(np.int64))
    return out


def lang_id_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Heuristic language id: CJK-character ratio → zh; else stopword vote
    between en and de; fallback en. Deterministic and fully vectorized
    (explode+isin stopword votes — lowercasing the whole string before the
    whitespace split is equivalent to lowercasing each token, since no
    Unicode lowercase mapping produces or removes whitespace)."""
    texts = batch[text_col].fillna("")
    cjk_ratio = (texts.str.count(r"[一-鿿]") / texts.str.len().clip(lower=1)).to_numpy()
    en, de = _stopword_counts(texts.str.lower().str.split(), [_STOP_EN, _STOP_DE])
    batch["pred_lang"] = np.where(cjk_ratio > 0.05, "zh", np.where(de > en, "de", "en"))
    return batch


def quality_score_batch(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Deterministic quality features + a composite score in [0, 1]:
    length score, punctuation ratio, stopword ratio, mean word length."""
    texts = batch[text_col].fillna("")
    n_chars = texts.str.len().to_numpy(dtype=np.float64)
    n_punct = texts.str.count(_PUNCT.pattern).to_numpy(dtype=np.float64)
    tokens = texts.str.split()
    n_tok = tokens.str.len().fillna(0).to_numpy(dtype=np.float64)
    mean_word_len = np.divide(
        n_chars, np.maximum(n_tok, 1.0), out=np.zeros_like(n_chars), where=n_tok > 0
    )
    # vectorized stopword ratio (w.lower() ∈ STOP over the split ≡ membership
    # over the lowercased-text split — see lang_id_batch)
    (n_stop,) = _stopword_counts(texts.str.lower().str.split(), [_STOP_EN])
    stop_ratio = np.divide(
        n_stop.astype(np.float64), np.maximum(n_tok, 1.0),
        out=np.zeros(len(n_tok)), where=n_tok > 0,
    )
    punct_ratio = n_punct / np.maximum(n_chars, 1.0)
    len_score = np.clip(n_chars / 1000.0, 0.0, 1.0)
    score = (
        0.4 * len_score
        + 0.3 * np.clip(stop_ratio / 0.4, 0.0, 1.0)
        + 0.3 * (1.0 - np.clip(punct_ratio / 0.2, 0.0, 1.0))
    )
    batch["punct_ratio"] = punct_ratio
    batch["stop_ratio"] = stop_ratio
    batch["mean_word_len"] = mean_word_len
    batch["quality"] = score
    return batch


_FP_BASE = np.uint64(1099511628211)
_FP_OFF = np.uint64(14695981039346656037)
_FP_POWS = np.array([1], dtype=np.uint64)  # grown-on-demand powers of _FP_BASE


def _fp_pows(n: int) -> np.ndarray:
    """Powers of the fingerprint base up to exponent n (cached, grown 2×)."""
    global _FP_POWS
    if len(_FP_POWS) <= n:
        grow = max(n + 1, 2 * len(_FP_POWS))
        pows = np.empty(grow, dtype=np.uint64)
        pows[: len(_FP_POWS)] = _FP_POWS
        with np.errstate(over="ignore"):
            for i in range(len(_FP_POWS), grow):
                pows[i] = pows[i - 1] * _FP_BASE
        _FP_POWS = pows
    return _FP_POWS


def utf8_segments(strings) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy utf-8 byte view of a string sequence via the Arrow
    large_string buffers: returns (data, lengths) where ``data`` is the
    concatenated uint8 bytes of all strings in order and ``lengths`` their
    per-string byte lengths — no per-string Python encode."""
    arr = pa.array(strings, type=pa.large_string())
    off = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    buf = arr.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8) if buf is not None else np.empty(0, np.uint8)
    return data[off[0] : off[-1]], np.diff(off)


def poly_hash_segments(data: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """uint64 polynomial hash per contiguous segment of ``data`` (uint8,
    segments concatenated in order): h = Σ (bᵢ+1)·Bᴸ⁻¹⁻ⁱ + L  (mod 2^64),
    B = ``_FP_BASE``; empty segments hash to the FNV offset constant.

    Fully vectorized: one power-table gather, one multiply, one
    ``np.add.reduceat`` — no per-byte Python. SQL-reproducible: the identical
    arithmetic runs in DuckDB HUGEINT (``__ray_entry__._fingerprint_sql``)."""
    out = np.full(len(lengths), _FP_OFF, dtype=np.uint64)
    total = int(lengths.sum())
    if total:
        arr = data[:total].astype(np.uint64)
        ends = np.cumsum(lengths)
        starts = ends - lengths
        exp = np.repeat(ends, lengths) - 1 - np.arange(total, dtype=np.int64)
        pows = _fp_pows(int(lengths.max()))
        with np.errstate(over="ignore"):
            terms = (arr + np.uint64(1)) * pows[exp]
            nonempty = lengths > 0
            seg = np.add.reduceat(terms, starts[nonempty])
            out[nonempty] = seg + lengths[nonempty].astype(np.uint64)
    return out


_FMIX_C1 = np.uint64(0xFF51AFD7ED558CCD)
_FMIX_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def round_half_away(values, ndigits: int) -> np.ndarray:
    """Round half away from zero — DuckDB ROUND's tie rule (std::round).
    pandas/numpy round half-to-even, which disagrees at exact .5 boundaries;
    ratio-of-small-ints columns (doc_quality) hit those boundaries for real.
    Shared by every oracle-mirrored float output (tabular queries, the
    embedding stage)."""
    scale = 10.0 ** ndigits
    arr = np.asarray(values, dtype=np.float64)
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale


def fmix64(x: np.ndarray) -> np.ndarray:
    """Murmur3 fmix64 finalizer (vectorized, uint64 wraparound). Plain
    mod-2^64 arithmetic, so DuckDB can recompute it exactly in HUGEINT with
    a 32-bit split multiply (see __ray_entry__._TOKEN_HASH_CTES)."""
    with np.errstate(over="ignore"):
        x = x ^ (x >> np.uint64(33))
        x = x * _FMIX_C1
        x = x ^ (x >> np.uint64(33))
        x = x * _FMIX_C2
        x = x ^ (x >> np.uint64(33))
    return x


def fingerprint64(texts: pd.Series) -> np.ndarray:
    """Polynomial rolling hash over utf-8 bytes → int64 fingerprint.

    Fully vectorized over the whole batch via the Arrow string buffers (the
    round-1 per-byte inner loop was the single worst hot loop in the repo;
    round 3 also removed the per-doc ``encode`` loop)."""
    return poly_hash_segments(*utf8_segments(texts.fillna(""))).view(np.int64)


def md5_hex(texts: pd.Series) -> pd.Series:
    import hashlib

    return texts.fillna("").map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())


# ---------------------------------------------------------------------------
# Gopher-style quality rules + repetition ratios + unigram entropy
# (published corpus-filter heuristics: Rae et al. 2021 "Scaling Language
# Models: ... Gopher" §A1.1; all semantics pinned to be exactly
# SQL-reproducible so the driver hash-checks them against DuckDB oracles)
# ---------------------------------------------------------------------------


def _tokens_flat(texts: pd.Series) -> tuple[pd.Series, np.ndarray, np.ndarray]:
    """Whitespace tokens of the trimmed texts, flattened batch-wide:
    returns (flat_token_series, doc_index_per_token, n_words_per_doc).
    Empty/whitespace-only docs contribute 0 tokens."""
    stripped = texts.fillna("").str.strip()
    tokens = stripped.str.split()
    n_words = tokens.str.len().fillna(0).to_numpy(dtype=np.int64)
    n_words = np.where(stripped.str.len().to_numpy(dtype=np.int64) == 0, 0, n_words)
    flat = tokens.explode(ignore_index=True)  # empty lists emit one NaN row
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), np.maximum(n_words, 1))
    keep = flat.notna().to_numpy()
    return flat[keep].reset_index(drop=True), doc_idx[keep], n_words


def gopher_stats_batch(texts: pd.Series) -> pd.DataFrame:
    """Per-doc Gopher quality signals: word count, total word chars, mean
    word length, stopword count, and the pass flag

        50 <= n_words <= 100000
        AND 3 <= mean_word_len <= 10   (tested as the EXACT integer
                                        inequality 3*n_words <= word_chars
                                        <= 10*n_words — no float boundary)
        AND stop_count >= 2

    mean_word_len is additionally reported rounded half-away to 6.
    """
    n = len(texts)
    stripped = texts.fillna("").str.strip()
    word_chars = (
        stripped.str.replace(r"\s+", "", regex=True).str.len().to_numpy(dtype=np.int64)
    )
    flat, doc_idx, n_words = _tokens_flat(texts)
    if len(flat) == 0:
        stop_count = np.zeros(n, dtype=np.int64)
    else:
        stop_count = np.bincount(
            doc_idx[flat.str.lower().isin(_STOP_EN).to_numpy()], minlength=n
        ).astype(np.int64)
    nw = np.maximum(n_words, 1)
    mean_wl = word_chars / nw
    gopher_pass = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (3 * n_words <= word_chars)
        & (word_chars <= 10 * n_words)
        & (stop_count >= 2)
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "n_words": n_words,
            "word_chars": word_chars,
            "mean_word_len": mean_wl,
            "stop_count": stop_count,
            "gopher_pass": gopher_pass,
        }
    )


def repetition_stats_batch(texts: pd.Series) -> pd.DataFrame:
    """Per-doc repetition ratios (the Gopher dedup-adjacent signals):

      dup_word_frac  = (n_words - n_distinct_words) / n_words
      top_word_n     = occurrences of the most frequent word
      top_bigram_n   = occurrences of the most frequent adjacent word pair

    Fractions are exact integer ratios; 0 when the denominator is 0.
    One C-level pandas groupby over the exploded batch — no per-doc loop.
    """
    n = len(texts)
    flat, doc_idx, n_words = _tokens_flat(texts)
    n_distinct = np.zeros(n, dtype=np.int64)
    top_word = np.zeros(n, dtype=np.int64)
    top_bigram = np.zeros(n, dtype=np.int64)
    if len(flat):
        df = pd.DataFrame({"d": doc_idx, "w": flat})
        per = df.groupby(["d", "w"], sort=False).size()
        agg = per.groupby(level=0).agg(["size", "max"])
        d = agg.index.to_numpy(dtype=np.int64)
        n_distinct[d] = agg["size"].to_numpy(dtype=np.int64)
        top_word[d] = agg["max"].to_numpy(dtype=np.int64)
        # adjacent bigrams: pair token i with token i+1 of the SAME doc
        same = doc_idx[1:] == doc_idx[:-1]
        if same.any():
            lead = flat.shift(-1)
            big = (flat.str.cat(lead, sep="\x00"))[:-1][same]
            bdf = pd.DataFrame({"d": doc_idx[:-1][same], "g": big})
            bper = bdf.groupby(["d", "g"], sort=False).size().groupby(level=0).max()
            top_bigram[bper.index.to_numpy(dtype=np.int64)] = bper.to_numpy(
                dtype=np.int64
            )
    nw = np.maximum(n_words, 1)
    return pd.DataFrame(
        {
            "n_words": n_words,
            "dup_word_frac": (n_words - n_distinct) / nw,
            "top_word_frac": top_word / nw,
            "top_bigram_frac": top_bigram / np.maximum(n_words - 1, 1),
        }
    )


def entropy_batch(texts: pd.Series) -> np.ndarray:
    """Per-doc unigram (word) Shannon entropy in bits:

        H = log2(n) - (Σ_w c_w * log2(c_w)) / n

    — that exact parenthesization on both engines (the DuckDB oracle mirrors
    it term for term), 0 for empty docs."""
    n = len(texts)
    flat, doc_idx, n_words = _tokens_flat(texts)
    ent = np.zeros(n, dtype=np.float64)
    if len(flat):
        per = pd.DataFrame({"d": doc_idx, "w": flat}).groupby(["d", "w"], sort=False).size()
        c = per.to_numpy(dtype=np.float64)
        d = per.index.get_level_values(0).to_numpy(dtype=np.int64)
        s = np.zeros(n, dtype=np.float64)
        np.add.at(s, d, c * np.log2(c))
        nz = n_words > 0
        ent[nz] = np.log2(n_words[nz].astype(np.float64)) - s[nz] / n_words[nz]
    return ent
