"""Connected components & community label propagation (SURVEY.md §2.11).

Both reuse the BSP superstep engine over a *symmetrized* CSR:

- CC: hash-min label propagation — label⁰ = id; label'(v) = min(label(v),
  min over neighbors); converged when no label changes. The converged label is
  the minimum vertex id of the component (exact-match criterion).
- LP: synchronous community label propagation — label'(v) = most frequent
  neighbor label, ties → smallest label, vertices without neighbors keep their
  label; fixed iteration cap (deterministic).
"""

from __future__ import annotations

import time

import ray.data as rd

from pagerank_ray.pipelines.pagerank import IterativeResult
from pagerank_ray.state.superstep import BSPEngine, MODE_DIST, MODE_DISTW, MODE_LABEL, MODE_MIN


def _run_label_loop(
    eng: BSPEngine,
    max_iters: int,
    checkpoint_root: str | None,
    checkpoint_every: int,
    resume: bool,
) -> IterativeResult:
    restored = eng.resume(checkpoint_root) if (resume and checkpoint_root) else None
    if restored is None:
        eng.init_state()
    changed = -1
    converged = False
    step_times = []
    while eng.iteration < max_iters:
        t0 = time.perf_counter()
        changed, checksum = eng._superstep()
        dt = time.perf_counter() - t0
        step_times.append(dt)
        eng.iteration += 1
        eng.history.append(
            {
                "iteration": eng.iteration,
                "changed": changed,
                "label_checksum": checksum,
                "edges": eng.n_edges,
                "superstep_sec": dt,
            }
        )
        converged = changed == 0
        if checkpoint_root and (converged or eng.iteration % checkpoint_every == 0):
            eng._write_checkpoint(checkpoint_root, {"changed": changed, "converged": converged})
        if converged:
            break
    labels = eng.collect_result_and_shutdown()
    mean_step = sum(step_times) / len(step_times) if step_times else 0.0
    return IterativeResult(
        result=labels,
        iterations=eng.iteration,
        converged=converged,
        final_diff=float(changed),
        n_vertices=eng.n,
        n_edges=eng.n_edges,
        metrics=eng.history,
        mean_superstep_sec=mean_step,
    )


def connected_components(
    sym_csr_dir: str,
    *,
    n_workers: int,
    max_iters: int = 200,
    checkpoint_root: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    transport: str = "shm",
) -> IterativeResult:
    """Hash-min CC over a CSR built from symmetrized edges (csr.symmetrize)."""
    eng = BSPEngine(sym_csr_dir, n_workers=n_workers, mode=MODE_MIN, transport=transport)
    return _run_label_loop(eng, max_iters, checkpoint_root, checkpoint_every, resume)


def bfs_levels(
    sym_csr_dir: str,
    seeds,
    *,
    n_workers: int,
    max_iters: int = 200,
    transport: str = "shm",
    weighted: bool = False,
) -> IterativeResult:
    """Multi-source BFS levels (unweighted shortest paths) over a CSR:
    d⁰ = 0 at the seed vertices, ∞ elsewhere; superstep
    d'(v) = min(d(v), min_{u→v} d(u)+1) — the MODE_DIST variant of the
    hash-min exchange (same O(W) pre-aggregated min-scatter); converges when
    no distance changes. Unreached vertices keep the ∞ sentinel (callers map
    it to -1). Runs on whatever CSR it is given — symmetrize for undirected
    distance, forward for directed reachability depth.

    ``weighted=True`` runs MODE_DISTW instead — Bellman-Ford min-plus over a
    CSR built with RAW (normalize_weights=False) edge weights:
    d'(v) = min(d(v), min d(u) + w_uv); rounds converge at the maximum hop
    count of any shortest weighted path."""
    import numpy as np
    import ray

    eng = BSPEngine(
        sym_csr_dir,
        n_workers=n_workers,
        mode=MODE_DISTW if weighted else MODE_DIST,
        transport=transport,
    )
    eng.init_state()
    seeds = np.asarray(seeds, dtype=np.int64)
    planted = sum(ray.get([w.set_values.remote(seeds, 0) for w in eng.workers]))
    if planted == 0:
        raise ValueError("no BFS seed falls inside the graph's vertex range")
    changed = -1
    converged = False
    step_times = []
    while eng.iteration < max_iters:
        t0 = time.perf_counter()
        changed, checksum = eng._superstep()
        step_times.append(time.perf_counter() - t0)
        eng.iteration += 1
        eng.history.append(
            {"iteration": eng.iteration, "changed": changed, "checksum": checksum}
        )
        if changed == 0:
            converged = True
            break
    dists = eng.collect_result_and_shutdown()
    return IterativeResult(
        result=dists,
        iterations=eng.iteration,
        converged=converged,
        final_diff=float(changed),
        n_vertices=eng.n,
        n_edges=eng.n_edges,
        metrics=eng.history,
        mean_superstep_sec=sum(step_times) / len(step_times) if step_times else 0.0,
    )


def bfs_levels_multi(
    sym_csr_dir: str,
    seed_groups: list,
    *,
    n_workers: int,
    max_iters: int = 200,
    transport: str = "shm",
) -> list[IterativeResult]:
    """Run one BFS per seed group over a SINGLE resident engine (the CSR
    loads and the actor pool spin up once, not per seed) — the per-seed
    eccentricity/centrality probes' path. Each run resets the state
    (init_state) and replants seeds; results are collected without killing
    the pool until the last group finishes."""
    import numpy as np
    import ray

    eng = BSPEngine(sym_csr_dir, n_workers=n_workers, mode=MODE_DIST,
                    transport=transport)
    out: list[IterativeResult] = []
    try:
        for seeds in seed_groups:
            eng.init_state()
            seeds = np.asarray(seeds, dtype=np.int64)
            planted = sum(ray.get([w.set_values.remote(seeds, 0) for w in eng.workers]))
            if planted == 0:
                raise ValueError("no BFS seed falls inside the graph's vertex range")
            changed, converged, step_times = -1, False, []
            while eng.iteration < max_iters:
                t0 = time.perf_counter()
                changed, _ = eng._superstep()
                step_times.append(time.perf_counter() - t0)
                eng.iteration += 1
                if changed == 0:
                    converged = True
                    break
            out.append(
                IterativeResult(
                    result=eng.collect_result(),
                    iterations=eng.iteration,
                    converged=converged,
                    final_diff=float(changed),
                    n_vertices=eng.n,
                    n_edges=eng.n_edges,
                    metrics=[],
                    mean_superstep_sec=(
                        sum(step_times) / len(step_times) if step_times else 0.0
                    ),
                )
            )
    finally:
        eng.shutdown()
    return out


def label_propagation(
    sym_csr_dir: str,
    *,
    n_workers: int,
    max_iters: int = 10,
    checkpoint_root: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> IterativeResult:
    """Synchronous community LP over symmetrized CSR; fixed iteration cap."""
    eng = BSPEngine(sym_csr_dir, n_workers=n_workers, mode=MODE_LABEL)
    return _run_label_loop(eng, max_iters, checkpoint_root, checkpoint_every, resume)
