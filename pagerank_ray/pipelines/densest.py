"""Densest-subgraph 2(1+ε)-approximation by parallel peeling
(Bahmani, Kumar & Vazirani, VLDB 2012 — the canonical MapReduce
densest-subgraph algorithm).

Each round, over the surviving subgraph with n vertices / m undirected
edges (density ρ = m/n), EVERY vertex with degree ≤ 2(1+ε)·ρ is removed
at once; the density profile over rounds is recorded and the best round
is a 2(1+ε)-approximate densest subgraph. Rounds are bounded by
log_{1+ε}(n) (each round keeps < n/(1+ε) vertices), observed single-digit
on the heavy-tailed bench graphs.

ε is pinned to 1/4 so the removal comparison is EXACT INTEGER arithmetic:

    deg(v) ≤ 2·(5/4)·m/n   ⇔   2·deg(v)·n ≤ 5·m

— no float threshold anywhere (the lp_modularity/powerlaw trick), which is
what lets the driver query hash-check against a fixed-unroll DuckDB oracle
(__ray_entry__._densest_sql) with the identical rule. int64 products bound
the applicability to deg·n < 2^62 — beyond that (10^12-vertex graphs with
10^7-degree hubs) switch the comparison to Python bigints in the same
kernel; documented, not silently wrong (numpy would overflow loudly under
``np.errstate`` in tests).

Distributed shape per round (the k_core peel machinery, pipelines/kcore.py):
one bucketed ``grouped_count`` for degrees over the symmetrized edge set,
two broadcast-or-hash attaches to drop flagged endpoints; the driver reads
only the scalar (n, m) pair per round. Hybrid finish: once the survivor
edge set fits one worker, the remaining rounds run as ONE vectorized
numpy task (np.bincount/mask per round) instead of paying a Ray Data
stage launch each.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


@ray.remote
def _peel_tail(blocks: list, max_rounds: int, round0: int):
    """Finish the peel in one task; returns the per-round (round, n, m)
    stats for every remaining round. Input blocks hold the SYMMETRIZED
    surviving edges (both orientations)."""
    tables = [t for t in ray.get(list(blocks)) if t.num_rows]
    src = np.concatenate(
        [t.column("src_id").to_numpy(zero_copy_only=False) for t in tables]
        or [np.array([], np.int64)]
    )
    dst = np.concatenate(
        [t.column("dst_id").to_numpy(zero_copy_only=False) for t in tables]
        or [np.array([], np.int64)]
    )
    ids = np.unique(np.concatenate([src, dst]))
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    rows = []
    r = round0
    while len(s):
        if r - round0 > max_rounds:
            raise RuntimeError(
                f"densest_subgraph: round budget ({max_rounds}) exhausted"
            )
        deg = np.bincount(s, minlength=len(ids))
        alive = deg > 0
        n = int(alive.sum())
        m = len(s) // 2
        rows.append((r, n, m))
        rm = alive & (2 * deg * n <= 5 * m)
        keep = ~rm[s] & ~rm[d]
        s, d = s[keep], d[keep]
        r += 1
    return rows


def densest_subgraph(
    sym_edges: rd.Dataset,
    *,
    max_rounds: int = 64,
    tail_cutoff: int = 1_000_000,
) -> list[tuple[int, int, int]]:
    """Peel ``sym_edges`` (both orientations of every distinct self-loop-free
    pair) to empty with the ε=1/4 Bahmani rule; returns the per-round
    density profile as [(round, n_vertices, m_undirected_edges), ...]."""
    from pagerank_ray.pipelines.kcore import _filter_flagged
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import grouped_count

    cur = sym_edges.materialize()
    rows: list[tuple[int, int, int]] = []
    r = 0
    while True:
        cnt = cur.count()
        if cnt == 0:
            return rows
        if cnt <= tail_cutoff:
            rows.extend(
                ray.get(
                    _peel_tail.remote(cur.to_arrow_refs(), max_rounds - r, r)
                )
            )
            return rows
        if r > max_rounds:
            raise RuntimeError(
                f"densest_subgraph: round budget ({max_rounds}) exhausted"
            )
        deg = grouped_count(cur, "src_id", "deg").materialize()
        n = deg.count()
        m = cnt // 2
        rows.append((r, n, m))

        # exact-integer removal rule: 2·deg·n ≤ 5·m (ε = 1/4)
        def low(t: pa.Table) -> pa.Table:
            lhs = pc.multiply(
                pc.multiply(t.column("deg"), pa.scalar(2, pa.int64())),
                pa.scalar(n, pa.int64()),
            )
            return t.filter(pc.less_equal(lhs, pa.scalar(5 * m, pa.int64())))

        bad = deg.map_batches(low, batch_format="pyarrow").materialize()
        for col, flag in (("src_id", "_f_s"), ("dst_id", "_f_d")):
            tagged = joins.attach_with_default(
                cur,
                bad,
                probe_col=col,
                build_key="src_id",
                build_val="deg",
                out_col=flag,
                default=-1,
            )
            cur = _filter_flagged(tagged, flag, -1, keep_matched=False)
        cur = cur.materialize()
        r += 1
