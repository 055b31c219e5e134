"""Distinct-count sketching — HyperLogLog (Flajolet et al., AMC 2007).

The scale path for COUNT(DISTINCT): the exact bucketed-distinct operator
(graph_build.py:count_distinct_urls) shuffles every distinct value once; at
100 TB a cardinality ESTIMATE from a 4 KiB sketch is the right first answer
(standard error 1.04/√m ≈ 1.6 % at p=12). The register rows are tiny and
combine with MAX — a natural Ray Data ``map_batches`` (per-block registers)
→ ``groupby(bucket).max()`` (shuffle of ≤ m·n_blocks register rows, never
the data), so the sketch never materializes the input.

EXACTLY SQL-REPRODUCIBLE BY DESIGN: the value hash is the engine's shared
fmix64 finalizer (functions/text.py — plain mod-2^64 arithmetic), the rank
``rho`` uses exact integer exponent extraction (``np.frexp`` on floats that
are exact for w < 2^52, mirrored in SQL by a power-of-two table join, no
libm log2 on either side), and the harmonic sum Σ 2^(64-reg) is an exact
integer (Python bigint / DuckDB HUGEINT). The raw estimate is therefore a
deterministic function of the input on both engines, and the driver
hash-checks the ESTIMATE itself (__ray_entry__._hll_sql) — unusual for an
approximate operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from pagerank_ray.functions.text import fmix64


def _registers_batch(vals: np.ndarray, p: int) -> pa.Table:
    """One batch → its non-zero HLL registers as (bucket, rho) rows."""
    h = fmix64(vals.astype(np.uint64))
    wbits = 64 - p
    bucket = (h >> np.uint64(wbits)).astype(np.int64)
    w = (h & np.uint64((1 << wbits) - 1)).astype(np.uint64)
    # rho = wbits - floor(log2(w)) for w>0 else wbits+1, via EXACT exponent
    # extraction: w < 2^52 (p ≥ 12) is exactly representable as float64, so
    # frexp's exponent e gives floor(log2 w) = e-1 with no libm rounding.
    rho = np.full(len(w), wbits + 1, dtype=np.int64)
    nz = w > 0
    if nz.any():
        _, e = np.frexp(w[nz].astype(np.float64))
        rho[nz] = wbits - (e.astype(np.int64) - 1)
    regs = np.zeros(1 << p, dtype=np.int64)
    np.maximum.at(regs, bucket, rho)
    idx = np.flatnonzero(regs)
    return pa.table({"bucket": pa.array(idx), "rho": pa.array(regs[idx])})


def hll_estimate_from_registers(regs: np.ndarray, p: int) -> float:
    """Registers (length 2^p, zeros for empty) → cardinality estimate.

    Mirrors __ray_entry__._hll_sql operation-for-operation so the float
    result is bit-identical: exact integer S = Σ 2^(64-reg), then the same
    left-to-right double expression; linear-counting correction below 2.5m."""
    m = 1 << p
    s_exact = int(sum(1 << (64 - int(r)) for r in regs))
    est = (0.7213 / (1 + 1.079 / float(m))) * float(m) * float(m) * 2.0**64 / float(s_exact)
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = float(m) * float(np.log(float(m) / float(zeros)))
    return est


def approx_distinct_grouped(
    ds: rd.Dataset, col: str, group_col: str, *, p: int = 12
) -> "pd.DataFrame":
    """Per-group approximate COUNT(DISTINCT col) — GROUP BY + HLL in one
    pass. Each batch folds its rows into per-(group, bucket) registers with
    a dense ``np.maximum.at`` over a (n_groups_in_batch × 2^p) scratch (one
    vectorized scatter, no per-group loop); the shuffle then carries at most
    n_groups × 2^p register rows — never the values. Assumes the number of
    DISTINCT GROUPS is register-scale (each group costs 2^p rows in the
    combine), which is the regime where a grouped sketch beats a grouped
    exact distinct."""
    import pandas as pd

    assert p >= 12, "rho exactness argument requires w < 2^52"
    m = 1 << p

    def regs(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        codes, uniq = pd.factorize(t.column(group_col).to_pandas(), sort=False)
        h = fmix64(v.astype(np.uint64))
        wbits = 64 - p
        bucket = (h >> np.uint64(wbits)).astype(np.int64)
        w = (h & np.uint64((1 << wbits) - 1)).astype(np.uint64)
        rho = np.full(len(w), wbits + 1, dtype=np.int64)
        nz = w > 0
        if nz.any():
            _, e = np.frexp(w[nz].astype(np.float64))
            rho[nz] = wbits - (e.astype(np.int64) - 1)
        dense = np.zeros(len(uniq) * m, dtype=np.int64)
        np.maximum.at(dense, codes.astype(np.int64) * m + bucket, rho)
        idx = np.flatnonzero(dense)
        return pa.table(
            {
                group_col: pa.array(np.asarray(uniq)[idx // m]),
                "bucket": pa.array(idx % m),
                "rho": pa.array(dense[idx]),
            }
        )

    final = (
        ds.select_columns([col, group_col])
        .map_batches(regs, batch_format="pyarrow")
        .groupby([group_col, "bucket"])
        .max("rho")
        .to_pandas()
    )
    rows = []
    for g, sub in final.groupby(group_col, sort=True):
        full = np.zeros(m, dtype=np.int64)
        full[sub["bucket"].to_numpy(dtype=np.int64)] = sub["max(rho)"].to_numpy(dtype=np.int64)
        rows.append((g, m, hll_estimate_from_registers(full, p)))
    return pd.DataFrame(rows, columns=[group_col, "m", "estimate"])


def approx_distinct(ds: rd.Dataset, col: str, *, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT col) for an integer column.

    map_batches emits each block's non-zero registers; a groupby-max over at
    most 2^p distinct buckets combines them (register rows only — the values
    themselves never shuffle); the ≤ 2^p final rows come to the driver for
    the closed-form estimate."""
    assert p >= 12, "rho exactness argument requires w < 2^52"

    def regs(t: pa.Table) -> pa.Table:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        return _registers_batch(v, p)

    final = (
        ds.select_columns([col])
        .map_batches(regs, batch_format="pyarrow")
        .groupby("bucket")
        .max("rho")
        .to_pandas()
    )
    full = np.zeros(1 << p, dtype=np.int64)
    if len(final):
        full[final["bucket"].to_numpy(dtype=np.int64)] = final["max(rho)"].to_numpy(
            dtype=np.int64
        )
    return hll_estimate_from_registers(full, p)


# ---------------------------------------------------------------------------
# Bloom filter — SQL-reproducible membership sketch (semi-join pre-filter)
# ---------------------------------------------------------------------------


def bloom_build(ds: rd.Dataset, col: str, *, m_bits: int = 4096) -> np.ndarray:
    """Distributed Bloom-filter build over an int key column: k=2 positions
    per key from ONE shared fmix64 hash (low bits and bits ≥32 — the double-
    hashing standard), per-batch distinct positions, bucketed dedup, then
    the ≤ m_bits distinct positions assemble the bitmap on the driver — the
    same bounded-collect contract as the HLL registers (the bitmap, not the
    data, is the sketch). Exactly SQL-reproducible: plain mod-2^64 fmix64 +
    two modulo reductions (__ray_entry__._bloom_sql)."""
    from pagerank_ray.stages.graph_build import grouped_count

    def positions(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = fmix64(vals)
        b1 = (h % np.uint64(m_bits)).astype(np.int64)
        b2 = ((h >> np.uint64(32)) % np.uint64(m_bits)).astype(np.int64)
        return pa.table({"b": pa.array(np.unique(np.concatenate([b1, b2])))})

    pos = grouped_count(ds.map_batches(positions, batch_format="pyarrow"), "b", "n")
    df = pos.to_pandas()
    bits = np.zeros(m_bits, dtype=bool)
    if len(df):  # empty build side → all-rejecting filter (valid bloom)
        bits[df["b"].to_numpy(np.int64)] = True
    return bits


def bloom_filter_keys(
    ds: rd.Dataset, col: str, bits: np.ndarray
) -> rd.Dataset:
    """Keep rows whose key passes the Bloom membership test (b1 AND b2 set)
    — vectorized per batch against the broadcast bitmap (ray.put once)."""
    import ray

    m_bits = len(bits)
    bits_ref = ray.put(bits)

    def probe(t: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        vals = t.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = fmix64(vals)
        b1 = (h % np.uint64(m_bits)).astype(np.int64)
        b2 = ((h >> np.uint64(32)) % np.uint64(m_bits)).astype(np.int64)
        return t.filter(pa.array(b[b1] & b[b2]))

    return ds.map_batches(probe, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Count-Min sketch — SQL-reproducible frequency sketch (heavy hitters)
# (Cormode & Muthukrishnan, J. Algorithms 2005)
# ---------------------------------------------------------------------------


def cms_build(ds: rd.Dataset, col: str, *, width: int = 512) -> np.ndarray:
    """Distributed Count-Min build (depth 2 × ``width``) over an int key
    column: both row positions come from ONE shared fmix64 per key (low bits
    and bits ≥ 32 — the same double-hashing split as the Bloom filter), each
    batch pre-aggregates its slot counts locally (np.bincount), and a
    groupby-sum over ≤ 2·width slot rows combines them — the counters, never
    the keys, shuffle. Exactly SQL-reproducible (__ray_entry__._cms_sql)."""

    def slots(t: pa.Table) -> pa.Table:
        vals = t.column(col).to_numpy(zero_copy_only=False).astype(np.uint64)
        h = fmix64(vals)
        s0 = (h % np.uint64(width)).astype(np.int64)
        s1 = (h >> np.uint64(32)) % np.uint64(width) + np.uint64(width)
        flat = np.concatenate([s0, s1.astype(np.int64)])
        cnt = np.bincount(flat, minlength=2 * width)
        idx = np.flatnonzero(cnt)
        return pa.table({"slot": pa.array(idx), "n": pa.array(cnt[idx])})

    final = (
        ds.select_columns([col])
        .map_batches(slots, batch_format="pyarrow")
        .groupby("slot")
        .sum("n")
        .to_pandas()
    )
    counters = np.zeros(2 * width, dtype=np.int64)
    if len(final):
        counters[final["slot"].to_numpy(np.int64)] = final["sum(n)"].to_numpy(np.int64)
    return counters.reshape(2, width)


def cms_estimate(keys: np.ndarray, counters: np.ndarray) -> np.ndarray:
    """Point estimates: min over the sketch rows at the key's two positions
    (never underestimates; overestimation is deterministic given the hash)."""
    width = counters.shape[1]
    h = fmix64(keys.astype(np.uint64))
    e0 = counters[0][(h % np.uint64(width)).astype(np.int64)]
    e1 = counters[1][((h >> np.uint64(32)) % np.uint64(width)).astype(np.int64)]
    return np.minimum(e0, e1)
