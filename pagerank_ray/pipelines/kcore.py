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
import ray
import ray.data as rd


@ray.remote
def _peel_tail(blocks: list, k: int, max_rounds: int):
    """Finish the peel in ONE task once the surviving edge set is small: the
    whole-fixpoint loop is a few np.bincount/mask passes per round over an
    in-memory edge array — microseconds per round vs a full Ray Data stage
    launch. Returns ((src_id, core_deg) table, rounds_executed). Input blocks
    are the materialized Arrow block refs (zero-copy plasma reads)."""
    # empty blocks may carry a degenerate schema (no columns) — skip them
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
    rounds = 0
    fixpoint = False
    while rounds <= max_rounds:
        deg = np.bincount(s, minlength=len(ids))
        bad = (deg > 0) & (deg < k)
        if not bad.any():
            fixpoint = True
            break
        if rounds == max_rounds:
            break
        rounds += 1
        keep = ~bad[s] & ~bad[d]
        s, d = s[keep], d[keep]
    alive = deg > 0
    return (
        pa.table(
            {"src_id": ids[alive], "core_deg": deg[alive].astype(np.int64)}
        ),
        rounds,
        fixpoint,
    )


def _filter_flagged(
    edges: rd.Dataset, flag_col: str, sentinel: int, keep_matched: bool
) -> rd.Dataset:
    """Vectorized Arrow filter on the attach sentinel: ``keep_matched=False``
    keeps the anti-join survivors (flag still sentinel), ``True`` keeps the
    semi-join hits (flag overwritten). Drops the flag column either way."""

    def f(t: pa.Table) -> pa.Table:
        mask = pc.equal(t.column(flag_col), pa.scalar(sentinel, pa.int64()))
        if keep_matched:
            mask = pc.invert(mask)
        return t.filter(mask).drop_columns([flag_col])

    return edges.map_batches(f, batch_format="pyarrow")


def _kcore_latest_checkpoint(ckpt_root: str) -> tuple[int, str] | None:
    """Latest complete peel-round checkpoint as (round, edges_dir) or None.
    Completeness = MANIFEST.json present (written after the parquet lands)."""
    import json
    import os

    if not os.path.isdir(ckpt_root):
        return None
    best = None
    for name in sorted(os.listdir(ckpt_root)):
        if not name.startswith("round_"):
            continue
        man = os.path.join(ckpt_root, name, "MANIFEST.json")
        if os.path.exists(man):
            with open(man) as f:
                meta = json.load(f)
            if meta.get("complete"):
                best = (meta["round"], os.path.join(ckpt_root, name, "edges"))
    return best


def k_core(
    sym_edges: rd.Dataset,
    k: int,
    *,
    max_rounds: int = 50,
    tail_cutoff: int = 1_000_000,
    checkpoint_root: str | None = None,
    checkpoint_every: int = 2,
    resume: bool = False,
) -> tuple[rd.Dataset, int]:
    """Peel ``sym_edges`` (both orientations of every distinct pair, e.g.
    ``csr.symmetrize`` output) down to the k-core.

    Returns ``(core_degrees, rounds)`` where ``core_degrees`` is a Dataset of
    (id, core_deg) for the k-core members (their degree inside the core) and
    ``rounds`` is the number of peel rounds executed.

    Checkpoint/resume (resume ≡ continuous bit-identically: the peel is a
    deterministic function of the surviving int64 edge set, which parquet
    round-trips exactly): every ``checkpoint_every`` distributed rounds the
    survivor edges persist under ``checkpoint_root/round_NNNNN/edges`` with a
    MANIFEST committed after the parquet lands; ``resume=True`` restarts the
    loop from the latest complete round.
    """
    import json
    import os

    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import grouped_count

    cur = sym_edges
    rounds = 0
    if resume and checkpoint_root:
        found = _kcore_latest_checkpoint(checkpoint_root)
        if found is not None:
            rounds, edges_dir = found
            cur = rd.read_parquet(edges_dir)
    cur = cur.materialize()

    def _checkpoint(edges: rd.Dataset, rnd: int):
        import shutil

        it_dir = os.path.join(checkpoint_root, f"round_{rnd:05d}")
        # clear a crashed partial write: write_parquet APPENDS uniquely-named
        # files, so a leftover dir would otherwise double every row
        shutil.rmtree(os.path.join(it_dir, "edges"), ignore_errors=True)
        os.makedirs(it_dir, exist_ok=True)
        edges.write_parquet(os.path.join(it_dir, "edges"))
        tmp = os.path.join(it_dir, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"round": rnd, "k": k, "complete": True}, f)
        os.replace(tmp, os.path.join(it_dir, "MANIFEST.json"))
    while True:
        # Hybrid finish: distributed rounds shrink the graph fast (round 1
        # typically drops the below-k majority); once the survivor edge set
        # fits one worker's memory, the remaining slow-converging tail
        # (a handful of vertices per round, observed on heavy-tailed graphs)
        # runs as ONE vectorized task instead of paying a full Ray Data
        # stage launch per round. ~1M sym edges ≈ 16 MB of int64 pairs.
        if cur.count() <= tail_cutoff:
            table, tail_rounds, fixpoint = ray.get(
                _peel_tail.remote(cur.to_arrow_refs(), k, max_rounds - rounds)
            )
            if not fixpoint:
                raise RuntimeError(
                    f"k_core: round budget ({max_rounds}) exhausted before the "
                    "fixpoint — result would not be a k-core; raise max_rounds"
                )
            return rd.from_arrow(table), rounds + tail_rounds
        deg = grouped_count(cur, "src_id", "deg").materialize()

        def low(t: pa.Table) -> pa.Table:
            return t.filter(pc.less(t.column("deg"), pa.scalar(k, pa.int64())))

        def high(t: pa.Table) -> pa.Table:
            return t.filter(pc.greater_equal(t.column("deg"), pa.scalar(k, pa.int64())))

        bad = deg.map_batches(low, batch_format="pyarrow").materialize()
        n_bad = bad.count()
        if n_bad == 0:
            # fixpoint: deg already holds the in-core degrees of the final
            # edge set (every one ≥ k) — rename instead of re-counting
            def rename(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:  # degenerate empty-block schema
                    return pa.table(
                        {"src_id": pa.array([], pa.int64()),
                         "core_deg": pa.array([], pa.int64())}
                    )
                return pa.table(
                    {"src_id": t.column("src_id"), "core_deg": t.column("deg")}
                )

            return deg.map_batches(rename, batch_format="pyarrow"), rounds
        if rounds >= max_rounds:
            # fixpoint NOT reached within budget (checked after the bad-set
            # test so a final round that converges is never misreported)
            break
        rounds += 1
        # Build-side selection: early rounds drop the MAJORITY of vertices
        # (heavy-tailed degree distributions put most mass below k), so the
        # SURVIVOR set is the small broadcastable side — semi-join on good.
        # Late rounds peel a handful — anti-join on bad. Either way the
        # build side is min(|bad|, |good|), keeping the attach broadcast.
        n_good = deg.count() - n_bad
        if n_bad <= n_good:
            build, keep_matched = bad, False
        else:
            build = deg.map_batches(high, batch_format="pyarrow").materialize()
            keep_matched = True
        for col, flag in (("src_id", "_f_s"), ("dst_id", "_f_d")):
            tagged = joins.attach_with_default(
                cur,
                build,
                probe_col=col,
                build_key="src_id",
                build_val="deg",
                out_col=flag,
                default=-1,
            )
            cur = _filter_flagged(tagged, flag, -1, keep_matched)
        cur = cur.materialize()
        if checkpoint_root and rounds % checkpoint_every == 0:
            _checkpoint(cur, rounds)
    raise RuntimeError(
        f"k_core: round budget ({max_rounds}) exhausted before the fixpoint — "
        "result would not be a k-core; raise max_rounds"
    )
