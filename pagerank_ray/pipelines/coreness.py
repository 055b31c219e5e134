"""Full k-core decomposition — per-vertex coreness by level-wise peeling.

coreness(v) = max k such that v belongs to the k-core. Levels run k = 1, 2,
… over the shrinking survivor graph: within level k the peel repeats
(degree pass → drop vertices below k → remove incident edges) until stable,
and every vertex dropped during level k gets coreness k-1. Unlike the
fixed-k membership peel (pipelines/kcore.py) the level loop must track the
surviving VERTEX SET explicitly — a vertex whose last edge disappears
vanishes from the edge table, but still owes a label at the current level.

Coreness values are canonical (independent of peel order within a round),
so the distributed rounds and the in-memory tail cannot diverge. The oracle
(__ray_entry__._coreness_sql) unrolls a fixed levels × rounds grid of
degree/drop CTEs; peeling is idempotent at each level's fixpoint, so any
unroll ≥ the true (levels, per-level rounds) matches exactly — the engine
measures both and asserts they fit.

Per distributed round: one bucketed grouped_count for degrees + a default-0
attach onto the vertex set for the drop decision + sentinel-attach filters
on both edge endpoints (the kcore.py idiom); every exchange shrinks with
the remnant. Once the survivor edge set fits one worker (tail_cutoff —
4M sym edges is 64 MB of int64 pairs), the remaining levels run as ONE
vectorized numpy task: the decomposition pays MANY small rounds (levels ×
rounds), so the tail threshold sits higher than the single-fixpoint kcore
peel's — a Dataset stage launch per tiny round costs more than the whole
in-memory finish.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from pagerank_ray.pipelines.kcore import _filter_flagged


@ray.remote
def _coreness_tail(
    edge_blocks: list, v_blocks: list, k_start: int, max_levels: int, max_rounds: int
):
    """Finish the decomposition in one task: per level a few bincount/mask
    passes over the in-memory survivor arrays. Returns ((id, coreness)
    table, per-level round counts)."""
    etabs = [t for t in ray.get(list(edge_blocks)) if t.num_rows]
    vtabs = [t for t in ray.get(list(v_blocks)) if t.num_rows]
    src = np.concatenate(
        [t.column("src_id").to_numpy(zero_copy_only=False) for t in etabs]
        or [np.array([], np.int64)]
    )
    dst = np.concatenate(
        [t.column("dst_id").to_numpy(zero_copy_only=False) for t in etabs]
        or [np.array([], np.int64)]
    )
    ids = np.unique(
        np.concatenate(
            [t.column("id").to_numpy(zero_copy_only=False) for t in vtabs]
            or [np.array([], np.int64)]
        )
    )
    s = np.searchsorted(ids, src)
    d = np.searchsorted(ids, dst)
    alive = np.ones(len(ids), bool)
    labels = np.full(len(ids), -1, np.int64)
    k = k_start
    rounds_per_level: list[int] = []
    while alive.any():
        if k - k_start >= max_levels:
            raise RuntimeError(
                f"coreness: more than {max_levels} levels in the tail; "
                "raise max_levels (and the oracle unroll)"
            )
        r = 0
        while True:
            r += 1
            if r > max_rounds:
                raise RuntimeError(
                    f"coreness: level {k} exceeded {max_rounds} peel rounds; "
                    "raise max_rounds (and the oracle unroll)"
                )
            deg = np.bincount(s, minlength=len(ids))
            bad = alive & (deg < k)
            if not bad.any():
                break
            labels[bad] = k - 1
            alive &= ~bad
            keep = alive[s] & alive[d]
            s, d = s[keep], d[keep]
        rounds_per_level.append(r)
        k += 1
    return (
        pa.table({"id": ids, "coreness": labels}),
        rounds_per_level,
    )


def coreness(
    sym_edges: rd.Dataset,
    *,
    max_levels: int = 24,
    max_rounds: int = 50,
    tail_cutoff: int = 4_000_000,
    num_partitions: int = 32,
) -> tuple[rd.Dataset, list[int]]:
    """sym_edges: both orientations of every distinct simple pair (self-loops
    already dropped). Returns ((id, coreness) for every endpoint vertex,
    per-level peel round counts — each level's count includes its final
    no-drop round, mirroring the oracle's fixed unroll)."""
    from pagerank_ray.stages import joins
    from pagerank_ray.stages.graph_build import distinct_values, grouped_count

    cur = sym_edges.materialize()
    # sym_edges carries both orientations, so src_id alone already covers
    # every endpoint — distinct-ing the dst concat too would double the
    # largest exchange of the decomposition for nothing
    v_cur = distinct_values(
        cur.map_batches(
            lambda t: pa.table({"id": t.column("src_id")}),
            batch_format="pyarrow",
        ),
        "id",
    ).materialize()

    label_parts: list[rd.Dataset] = []
    rounds_per_level: list[int] = []
    k = 1
    levels_done = 0
    while True:
        if levels_done >= max_levels:
            raise RuntimeError(
                f"coreness: more than {max_levels} levels; raise max_levels "
                "(and the oracle unroll)"
            )
        if cur.count() <= tail_cutoff:
            tail_tab, tail_rounds = ray.get(
                _coreness_tail.remote(
                    cur.to_arrow_refs(),
                    v_cur.to_arrow_refs(),
                    k,
                    max_levels - levels_done,
                    max_rounds,
                )
            )
            label_parts.append(rd.from_arrow(tail_tab))
            rounds_per_level.extend(tail_rounds)
            out = label_parts[0]
            for p in label_parts[1:]:
                out = out.union(p)
            return out.materialize(), rounds_per_level
        r = 0
        while True:
            r += 1
            if r > max_rounds:
                raise RuntimeError(
                    f"coreness: level {k} exceeded {max_rounds} peel rounds; "
                    "raise max_rounds (and the oracle unroll)"
                )
            deg = grouped_count(cur, "src_id", "deg").materialize()
            flagged = joins.attach_with_default(
                v_cur, deg, probe_col="id", build_key="src_id", build_val="deg",
                out_col="deg", default=0, build_count=deg.count(),
                num_partitions=num_partitions,
            )

            def low(t: pa.Table) -> pa.Table:
                return t.filter(pc.less(t.column("deg"), pa.scalar(k, pa.int64())))

            drop = flagged.map_batches(low, batch_format="pyarrow").materialize()
            n_drop = drop.count()
            if n_drop == 0:
                break
            lvl = k  # bind for the closure

            def label(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return pa.table(
                        {"id": pa.array([], pa.int64()),
                         "coreness": pa.array([], pa.int64())}
                    )
                return pa.table(
                    {
                        "id": t.column("id"),
                        "coreness": pa.array(
                            np.full(t.num_rows, lvl - 1, np.int64)
                        ),
                    }
                )

            label_parts.append(
                drop.map_batches(label, batch_format="pyarrow").materialize()
            )
            # remove dropped vertices from the survivor set and both edge sides
            tagged_v = joins.attach_with_default(
                v_cur, drop, probe_col="id", build_key="id", build_val="deg",
                out_col="_f", default=-1, build_count=n_drop,
                num_partitions=num_partitions,
            )
            v_cur = _filter_flagged(tagged_v, "_f", -1, False).map_batches(
                lambda t: t.select(["id"]), batch_format="pyarrow"
            ).materialize()
            for col in ("src_id", "dst_id"):
                tagged_e = joins.attach_with_default(
                    cur, drop, probe_col=col, build_key="id", build_val="deg",
                    out_col="_f", default=-1, build_count=n_drop,
                    num_partitions=num_partitions,
                )
                cur = _filter_flagged(tagged_e, "_f", -1, False)
            cur = cur.materialize()
        rounds_per_level.append(r)
        levels_done += 1
        k += 1
        if v_cur.count() == 0:
            out = label_parts[0]
            for p in label_parts[1:]:
                out = out.union(p)
            return out.materialize(), rounds_per_level
