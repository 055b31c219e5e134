"""PII detection / redaction kernels (training-data scrubbing stage).

Every large-scale corpus pipeline scrubs personally-identifying strings
before training. The kernel is a fixed, ORDERED list of pattern classes
applied sequentially — each class counts and replaces on the OUTPUT of the
previous class, so e.g. the digit run inside an already-redacted email is
never double-counted. The order (email → ipv4 → long digit run) goes from
most- to least-structured, the standard scrub ordering.

Vectorized: one compiled-regex ``pandas.Series.str.count`` +
``str.replace`` pass per class over the whole batch — no per-row Python.
The patterns are RE2-safe (no backreferences / lookaround) so the DuckDB
oracle (``__ray_entry__._pii_sql``) runs the IDENTICAL regex text through
``regexp_extract_all`` / ``regexp_replace(..., 'g')``.

No reference analogue (the reference is a PageRank engine,
/root/reference/kernel_acsr.cu); this is part of the training-data surface
the brief mandates alongside dedup/quality (SURVEY.md §2.12).
"""

from __future__ import annotations

import re

import pandas as pd

# (class name, pattern, replacement) — ORDER IS THE CONTRACT (see module doc).
# Patterns must stay RE2-compatible: the SQL oracle reuses the same strings.
PII_CLASSES: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    ("id", r"\d{6,}", "[ID]"),
]

_COMPILED = [(name, re.compile(pat), repl) for name, pat, repl in PII_CLASSES]


def redact_series(s: pd.Series) -> tuple[pd.Series, pd.DataFrame]:
    """Redact one string column; return (redacted, per-class match counts).

    Counts column names are ``n_<class>``; NULLs count as empty strings.
    """
    cur = s.fillna("").astype(str)
    counts: dict[str, pd.Series] = {}
    for name, pat, repl in _COMPILED:
        counts[f"n_{name}"] = cur.str.count(pat).astype("int64")
        cur = cur.str.replace(pat, repl, regex=True)
    return cur, pd.DataFrame(counts, index=s.index)


def redact_text(text: str) -> tuple[str, dict[str, int]]:
    """Single-string reference implementation (tests compare the vectorized
    kernel against this per-row path on arbitrary text)."""
    cur = text or ""
    counts: dict[str, int] = {}
    for name, pat, repl in _COMPILED:
        counts[f"n_{name}"] = len(pat.findall(cur))
        cur = pat.sub(repl, cur)
    return cur, counts
