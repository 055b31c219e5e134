"""Katz centrality (Katz, Psychometrika 1953) on the BSP superstep engine.

    x⁰(v) = 1 ;   x_{k+1}(v) = β + α · Σ_{u→v} x_k(u)

Each iteration is one ``MODE_SUM`` superstep — the identical cache-blocked
gather/reduceat + O(W) range exchange the HITS authority half-step runs
(pipelines/hits.py) — followed by one in-place affine fold x ← α·x + β on
the actor-resident slices (``BSPEngine.affine_state``: O(n/W) per worker,
no state movement — the same driver-folded-scalar pattern as the HITS L1
normalize). α must satisfy α < 1/λ_max for the series to converge; the
query uses a fixed small α and a FIXED iteration count, so the result is
deterministic regardless and is hash-checked against an unrolled DuckDB
oracle computing the identical recurrence (__ray_entry__._katz_sql —
x is summed per destination then folded as α·Σ + β, the same two float
ops in the same order as ``affine_state``; ROUND(6) absorbs sum-order
low-bit noise exactly as the PageRank/HITS oracles do).

The reference computes PageRank only (kernel_bblock.cu); Katz is engine-side
coverage of the same linear-recurrence link-analysis family over the
identical CSR machinery — no new exchange or kernel, one new scalar fold.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

import ray.data as rd

from pagerank_ray.state.superstep import BSPEngine, MODE_SUM


@dataclass
class KatzResult:
    result: rd.Dataset  # (id, value) — the Katz scores
    iterations: int
    n_vertices: int
    n_edges: int
    mean_superstep_sec: float = 0.0


def katz(
    csr_dir: str,
    *,
    n_workers: int,
    iters: int = 8,
    alpha: float = 0.05,
    beta: float = 1.0,
    transport: str = "shm",
) -> KatzResult:
    """Run ``iters`` fixed Katz iterations over the CSR at ``csr_dir``
    (in-neighbor sums: build the CSR from the forward edge list — the
    MODE_SUM gather pulls over u→v exactly like the authority half-step).
    """
    e = BSPEngine(csr_dir, n_workers=n_workers, mode=MODE_SUM, transport=transport)
    e.init_state()  # x⁰ = 1 ∀v (MODE_SUM init)
    step_times = []
    for i in range(iters):
        t0 = time.perf_counter()
        e._superstep()  # state(v) ← Σ_{u→v} state(u), raw
        e.affine_state(alpha, beta)  # state ← α·state + β
        e.iteration = i + 1
        step_times.append(time.perf_counter() - t0)
    n, n_edges = e.n, e.n_edges
    res = e.collect_result_and_shutdown()
    return KatzResult(
        result=res,
        iterations=iters,
        n_vertices=n,
        n_edges=n_edges,
        mean_superstep_sec=sum(step_times) / len(step_times) if step_times else 0.0,
    )
