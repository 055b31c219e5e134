"""k-core decomposition by iterative peeling (SURVEY.md §2.11 family).

The k-core is the maximal subgraph in which every vertex has degree ≥ k.
Standard distributed peel: each round recomputes degrees over the surviving
(symmetrized) edge set, drops every vertex below k and all its incident
edges, and repeats until no vertex is dropped. Each round is fully
distributed — a bucketed ``grouped_count`` for degrees and two
broadcast-or-hash anti-join attaches (``joins.attach_with_default`` with a
sentinel) to remove flagged endpoints; the driver only coordinates the loop
and reads the scalar drop-count (the same driver-coordinates /
workers-compute split as the BSP superstep loop). Round count is bounded by
the graph's degeneracy ordering depth, observed single-digit on the heavy-
tailed bench graphs; each round's exchange shrinks with the edge set.

Peeling is idempotent at the fixpoint (re-applying the peel to a k-core is
the identity), so the driver query is hash-checked against a DuckDB oracle
that unrolls a FIXED number of rounds ≥ the engine's actual count
(__ray_entry__._kcore_sql — same argument as the LP oracle, _lp_sql).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _drop_flagged(edges: rd.Dataset, flag_col: str, sentinel: int) -> rd.Dataset:
    """Keep edges whose ``flag_col`` still holds the not-found sentinel (the
    anti-join survivors), dropping the flag column — vectorized Arrow filter."""

    def f(t: pa.Table) -> pa.Table:
        mask = pc.equal(t.column(flag_col), pa.scalar(sentinel, pa.int64()))
        return t.filter(mask).drop_columns([flag_col])

    return edges.map_batches(f, batch_format="pyarrow")


def k_core(
    sym_edges: rd.Dataset, k: int, *, max_rounds: int = 50
) -> tuple[rd.Dataset, int]:
    """Peel ``sym_edges`` (both orientations of every distinct pair, e.g.
    ``csr.symmetrize`` output) down to the k-core.

    Returns ``(core_degrees, rounds)`` where ``core_degrees`` is a Dataset of
    (id, core_deg) for the k-core members (their degree inside the core) and
    ``rounds`` is the number of peel rounds executed.
    """
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import grouped_count

    cur = sym_edges.materialize()
    rounds = 0
    while rounds < max_rounds:
        deg = grouped_count(cur, "src_id", "deg")

        def low(t: pa.Table) -> pa.Table:
            return t.filter(pc.less(t.column("deg"), pa.scalar(k, pa.int64())))

        bad = deg.map_batches(low, batch_format="pyarrow").materialize()
        if bad.count() == 0:
            break
        rounds += 1
        tagged = joins.attach_with_default(
            cur,
            bad,
            probe_col="src_id",
            build_key="src_id",
            build_val="deg",
            out_col="_bad_s",
            default=-1,
        )
        cur = _drop_flagged(tagged, "_bad_s", -1)
        tagged = joins.attach_with_default(
            cur,
            bad,
            probe_col="dst_id",
            build_key="src_id",
            build_val="deg",
            out_col="_bad_d",
            default=-1,
        )
        cur = _drop_flagged(tagged, "_bad_d", -1).materialize()
    return grouped_count(cur, "src_id", "core_deg"), rounds
