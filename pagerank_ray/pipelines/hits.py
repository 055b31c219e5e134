"""HITS hubs & authorities (Kleinberg JACM'99) on the BSP superstep engine.

The recurrence alternates two plain neighbor sums over the SAME edge set:

  a_i = normalize(Aᵀ h_{i-1})     (authority: sum of hub scores linking in)
  h_i = normalize(A a_i)          (hub: sum of authority scores linked to)

Each half-step is one ``MODE_SUM`` superstep (state'(v) = Σ_{u→v} state(u),
unit edge weight — the same cache-blocked gather/reduceat + O(W) exchange the
PageRank mode runs, with no damping/teleport term). Aᵀ and A are two CSR
shard directories: the forward edges and the reversed edges, each built once
and resident in its own actor pool (T1 residency, superstep.py module doc).
Between half-steps the full vector moves between the pools via
``transfer_state`` — a range-aligned O(W)-object slice exchange (each
destination worker reads only the source slices overlapping its range), not
a shuffle; this is the HITS-specific cost PageRank doesn't have, and it is
bounded by one n-float vector per half-step.

Normalization is L1 scaled to mass n (Σ = n, the engine's PageRank
convention): after each half-step the driver derives c = n/Σ from the
apply() totals and folds it in with one in-place ``scale_state`` pass —
no extra reduction over the data. Fixed iteration count (deterministic;
the driver query is hash-checked against an unrolled DuckDB oracle with
the identical raw-sum-then-scale arithmetic, __ray_entry__._hits_sql).

The reference computes PageRank only; HITS is engine-side coverage of the
same link-analysis family over the identical CSR machinery.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import ray.data as rd

from pagerank_ray.state.superstep import BSPEngine, MODE_SUM, transfer_state


@dataclass
class HITSResult:
    authorities: rd.Dataset  # (id, value) — L1-normalized to Σ = n
    hubs: rd.Dataset  # (id, value) — L1-normalized to Σ = n
    iterations: int
    n_vertices: int
    n_edges: int
    mean_superstep_sec: float = 0.0


def hits(
    fwd_csr_dir: str,
    rev_csr_dir: str,
    *,
    n_workers: int,
    iters: int = 5,
    transport: str = "shm",
    checkpoint_root: str | None = None,
    checkpoint_every: int = 2,
    resume: bool = False,
) -> HITSResult:
    """Run `iters` full HITS iterations; returns both score vectors.

    ``fwd_csr_dir`` holds the forward edges (u→v): its MODE_SUM superstep
    computes the AUTHORITY update a(v) = Σ_{u→v} h(u). ``rev_csr_dir`` holds
    the reversed edges: its superstep computes the HUB update
    h(u) = Σ_{u→v} a(v). Both CSRs must cover the same n vertices.

    Checkpoint/resume (same contract as ``pagerank``, resume ≡ continuous
    bit-identically): after a checkpointed full iteration both normalized
    vectors persist (``auth/`` from the fwd pool, ``hub/`` from the rev
    pool). Resume restores both — the restored hub vector feeds the next
    authority half-step; the restored authority vector matters only when the
    checkpoint is already at ``iters`` — f64 parquet round-trips exactly and
    the per-half-step scale factors are recomputed from identical totals.
    """
    import os as _os
    # num_cpus: two pools coexist; split the reservation budget so neither
    # starves the other nor deadlocks concurrent Dataset work (≥1 CPU free).
    import ray

    total_cpus = ray.cluster_resources().get("CPU", 1)
    per_worker = max(0.1, min(1.0, (total_cpus - 1) / max(2 * n_workers, 1)))
    e_fwd = BSPEngine(
        fwd_csr_dir,
        n_workers=n_workers,
        mode=MODE_SUM,
        transport=transport,
        num_cpus_per_worker=per_worker,
    )
    e_rev = BSPEngine(
        rev_csr_dir,
        n_workers=n_workers,
        mode=MODE_SUM,
        transport=transport,
        num_cpus_per_worker=per_worker,
    )
    if e_fwd.n != e_rev.n:
        raise ValueError(f"vertex-count mismatch: {e_fwd.n} vs {e_rev.n}")
    n = e_fwd.n
    e_fwd.init_state()  # h⁰ = 1 ∀v lives in the forward pool
    e_rev.init_state()
    start = 0
    if resume and checkpoint_root:
        restored_hub = e_rev.resume(_os.path.join(checkpoint_root, "hub"))
        if restored_hub is not None:
            start = e_rev.iteration  # completed full iterations
            if start > iters:
                # a checkpoint from a LONGER earlier run would skip the loop
                # and silently return over-iterated vectors labeled with the
                # requested count (ADVICE r4)
                e_fwd.shutdown()
                e_rev.shutdown()
                raise ValueError(
                    f"checkpoint at {checkpoint_root} holds {start} completed "
                    f"iterations > requested iters={iters}; pass a fresh "
                    "checkpoint_root or iters >= the checkpointed count"
                )
            e_fwd.resume(_os.path.join(checkpoint_root, "auth"))
            if start < iters:
                transfer_state(e_rev, e_fwd)  # fwd.state = h_start
    step_times = []
    for i in range(start, iters):
        t0 = time.perf_counter()
        # authority half-step: fwd pool state h → raw a, normalize in place
        _, total_a = e_fwd._superstep()
        if total_a > 0:
            e_fwd.scale_state(n / total_a)
        transfer_state(e_fwd, e_rev)  # rev.state = a_i
        # hub half-step: rev pool state a → raw h, normalize in place
        _, total_h = e_rev._superstep()
        if total_h > 0:
            e_rev.scale_state(n / total_h)
        done = i + 1
        # the driver loop owns the iteration counter (pagerank.py convention:
        # _superstep itself never increments); checkpoint manifests and
        # resume() both read it
        e_fwd.iteration = e_rev.iteration = done
        if checkpoint_root and (done % checkpoint_every == 0 or done == iters):
            # BEFORE the transfer below: fwd still holds a_done, rev h_done
            e_fwd._write_checkpoint(_os.path.join(checkpoint_root, "auth"),
                                    {"hits_iter": done})
            e_rev._write_checkpoint(_os.path.join(checkpoint_root, "hub"),
                                    {"hits_iter": done})
        if i < iters - 1:
            transfer_state(e_rev, e_fwd)  # fwd.state = h_i for the next round
        step_times.append(time.perf_counter() - t0)
    auth = e_fwd.collect_result_and_shutdown()
    hubs = e_rev.collect_result_and_shutdown()
    return HITSResult(
        authorities=auth,
        hubs=hubs,
        iterations=iters,
        n_vertices=n,
        n_edges=e_fwd.n_edges,
        mean_superstep_sec=sum(step_times) / len(step_times) if step_times else 0.0,
    )
