"""Byte-pair-encoding subword tokenizer — the real merge-table algorithm.

Public algorithm only: BPE training is Sennrich, Haddow & Birch, "Neural
Machine Translation of Rare Words with Subword Units" (ACL 2016) — count
adjacent symbol pairs over a word-frequency vocabulary, repeatedly merge the
most frequent pair. Application follows the byte-level GPT-2 convention
(Radford et al. 2019 `encoder.py`): pre-tokenize with a regex that keeps a
leading space on each word (marked `Ġ`), then apply merges in training-rank
order. For a consistently trained table, per-rank left-to-right merging is
equivalent to GPT-2's repeated lowest-rank-pair merge (a rank-r merge can
only create pairs whose merges were trained LATER, hence rank > r).

The vendored merge table (`bpe_merges.txt`) is trained by
`bench/train_bpe.py` on the deterministic sf0.001 synthetic documents —
modest by design (see the cap note in that script) so corpus words stay
multi-token and the merge loop is actually exercised end-to-end.

Scale shape: the per-batch kernel factorizes each batch to its UNIQUE
pre-tokens and encodes only those, through a cache that persists across
batches inside the map_batches actor (`BPETokenCounter.__init__` loads the
table once; `__call__` touches the cache) — on Zipf-distributed text the
cache hit rate approaches 1 and the merge loop runs a vanishing number of
times per document. The replaces inside `encode_word` are C-level
`str.replace` over a delimited symbol string, not per-symbol Python loops.
"""

from __future__ import annotations

import os
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

MERGES_PATH = os.path.join(os.path.dirname(__file__), "bpe_merges.txt")

# GPT-2-shaped pre-tokenizer, restricted to the class structure DuckDB's RE2
# also supports so the SQL oracle can reproduce it verbatim: a word keeps its
# single leading space; digit runs and punctuation runs split off; residual
# whitespace runs survive as their own token.
PRETOKEN_RE = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\s]+|\s+"

SEP = "\x1f"  # symbol delimiter inside encode_word working strings
SPACE_MARK = "Ġ"  # 'Ġ', the GPT-2 leading-space marker


def pretokenize(text: str) -> list[str]:
    return re.findall(PRETOKEN_RE, text)


def _to_symbols(word: str) -> list[str]:
    """Pre-token → initial symbol sequence (chars, spaces marked `Ġ`)."""
    return list(word.replace(" ", SPACE_MARK))


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Sennrich-2016 merge-table training. Deterministic: ties on pair count
    break on the lexicographically smallest pair."""
    vocab = Counter()
    for t in texts:
        for w in pretokenize(t):
            vocab[tuple(_to_symbols(w))] += 1
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab = Counter()
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += cnt
        vocab = new_vocab
    return merges


def load_merges(path: str = MERGES_PATH) -> list[tuple[str, str]]:
    """GPT-2 merges.txt convention: ONLY the first line may be a comment
    header. Treating every '#'-leading line as a comment would silently drop
    a legitimate ('#','#') merge — its line is '# #' (r5 review finding)."""
    merges = []
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            line = line.rstrip("\n")
            if not line or (i == 0 and line.startswith("#")):
                continue
            a, b = line.split(" ")
            merges.append((a, b))
    return merges


class BPETokenizer:
    """Apply a fixed merge table. `encode_word` works on a DOUBLE-separator
    symbol string — every symbol boundary carries two SEP chars — so the
    pattern ``SEP a SEP SEP b SEP`` consumes one separator from each
    boundary and ADJACENT occurrences share no characters. That makes one
    non-overlapping left-to-right `str.replace` pass per rank exactly the
    canonical leftmost-greedy merge (a single-separator encoding skips
    alternate pairs inside runs of a self-pair merge like (a,a) on 'aaaaa',
    because neighbouring matches would share the middle separator — r5
    review finding). DuckDB `replace` has identical semantics, which the
    SQL oracle leans on."""

    def __init__(self, merges: list[tuple[str, str]] | None = None):
        self.merges = list(merges) if merges is not None else load_merges()
        self._rules = [
            (SEP + a + SEP + SEP + b + SEP, SEP + a + b + SEP)
            for a, b in self.merges
        ]
        self._cache: dict[str, int] = {}

    def encode_word(self, word: str) -> list[str]:
        sep2 = SEP + SEP
        s = sep2 + sep2.join(_to_symbols(word)) + sep2
        for pat, rep in self._rules:
            # a merged symbol can never re-form its own pair (a+b ≠ a, ≠ b),
            # so one pass per rank is complete; the loop is a cheap guard
            while pat in s:
                s = s.replace(pat, rep)
        toks = [t for t in s.split(SEP) if t]
        return toks

    def n_tokens_word(self, word: str) -> int:
        hit = self._cache.get(word)
        if hit is None:
            hit = self._cache[word] = len(self.encode_word(word))
        return hit

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in pretokenize(text):
            out.extend(self.encode_word(w))
        return out


class BPETokenCounter:
    """map_batches actor stage: documents(text) → per-doc BPE token counts.

    Table load + regex compile once per actor (`__init__`); each batch
    explodes to pre-tokens, factorizes to the batch's UNIQUE pre-tokens, and
    only cache misses run the merge loop."""

    def __init__(self, merges: list[tuple[str, str]] | None = None):
        self.tok = BPETokenizer(merges)
        self.pat = re.compile(PRETOKEN_RE)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pandas().fillna("")  # NULL text → 0 tokens
        pretoks = texts.str.findall(self.pat)
        n_pre = pretoks.str.len().to_numpy(dtype=np.int64)
        flat = pd.Series(
            [w for ws in pretoks for w in ws], dtype=object
        )
        if len(flat):
            codes, uniques = pd.factorize(flat)
            per_unique = np.fromiter(
                (self.tok.n_tokens_word(w) for w in uniques),
                dtype=np.int64,
                count=len(uniques),
            )
            per_word = per_unique[codes]
            doc_idx = np.repeat(np.arange(len(texts)), n_pre)
            n_tok = np.bincount(doc_idx, weights=per_word, minlength=len(texts)).astype(
                np.int64
            )
        else:
            n_tok = np.zeros(len(texts), np.int64)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "n_pretokens": pa.array(n_pre),
                "n_tokens": pa.array(n_tok),
            }
        )
