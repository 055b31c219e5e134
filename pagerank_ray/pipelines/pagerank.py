"""PageRank power iteration over CSR shard workers (flagship pipeline).

Recurrence pinned to the reference (SURVEY.md §3.1, kernel_bblock.cu:949-1085):
r⁰=1 (mass-n scale); remain = α·D/n + (1−α); r'(v) = remain + α·Σ r(u)/out_deg(u);
L1 stop at ε = eps_per_vertex·n (kernel_acsr.cu:646). Dangling mass D is computed
from the *current* ranks before each gather (strict barrier, kernel_bblock.cu:953-966)
— here it is returned by the previous ``apply`` so it costs no extra round-trip.

Checkpointing (north_rule): every ``checkpoint_every`` supersteps each worker
writes its rank slice to ``ckpt/iter_k/range-*.parquet`` and the driver commits
``MANIFEST.json`` (+ ``_metrics.json`` with iteration, D, L1 diff, edge count,
wall time). ``resume=True`` restarts from the latest complete manifest.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import ray.data as rd

from pagerank_ray.state.superstep import BSPEngine, MODE_PAGERANK


@dataclass
class IterativeResult:
    result: rd.Dataset  # (id, rank) or (id, label)
    iterations: int
    converged: bool
    final_diff: float
    n_vertices: int
    n_edges: int
    metrics: list = field(default_factory=list)
    mean_superstep_sec: float = 0.0

    @property
    def edges_per_sec(self) -> float:
        return self.n_edges / self.mean_superstep_sec if self.mean_superstep_sec else 0.0


def pagerank(
    csr_dir: str,
    *,
    n_workers: int,
    alpha: float = 0.85,
    eps_per_vertex: float = 1e-6,
    max_iters: int = 100,
    checkpoint_root: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    num_cpus_per_worker: float | None = None,
) -> IterativeResult:
    eng = BSPEngine(
        csr_dir,
        n_workers=n_workers,
        mode=MODE_PAGERANK,
        alpha=alpha,
        num_cpus_per_worker=num_cpus_per_worker,
    )
    dangling_mass = None
    if resume and checkpoint_root:
        dangling_mass = eng.resume(checkpoint_root)
    if dangling_mass is None:
        dangling_mass = eng.init_state()
    n = eng.n
    eps = eps_per_vertex * n
    converged = False
    diff = float("inf")
    step_times: list[float] = []
    while eng.iteration < max_iters:
        t0 = time.perf_counter()
        remain = alpha * dangling_mass / n + (1.0 - alpha)
        diff, dangling_mass, total = eng._superstep(remain)
        dt = time.perf_counter() - t0
        step_times.append(dt)
        eng.iteration += 1
        eng.history.append(
            {
                "iteration": eng.iteration,
                "l1_diff": diff,
                "dangling_mass": dangling_mass,
                "total_mass": total,
                "edges": eng.n_edges,
                "superstep_sec": dt,
            }
        )
        converged = diff <= eps
        if checkpoint_root and (converged or eng.iteration % checkpoint_every == 0):
            eng._write_checkpoint(checkpoint_root, {"l1_diff": diff, "converged": converged})
        if converged:
            break
    ranks = rd.from_arrow_refs([w.state_table.remote() for w in eng.workers])
    mean_step = sum(step_times) / len(step_times) if step_times else 0.0
    return IterativeResult(
        result=ranks,
        iterations=eng.iteration,
        converged=converged,
        final_diff=diff,
        n_vertices=n,
        n_edges=eng.n_edges,
        metrics=eng.history,
        mean_superstep_sec=mean_step,
    )
