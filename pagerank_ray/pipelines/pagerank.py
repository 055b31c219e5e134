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
from collections import deque
from dataclasses import dataclass, field

import ray
import ray.data as rd

from pagerank_ray.state.superstep import BSPEngine, MODE_PAGERANK, transfer_state


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
    personalization=None,
    norm: str = "l1",
    eps_l2: float = 1e-8,
    bin_metrics: bool = False,
    transport: str = "shm",
    exchange_dtype: str = "float64",
) -> IterativeResult:
    """norm="l1": stop at Σ|Δ| ≤ eps_per_vertex·n (reference A/B entry points,
    kernel_acsr.cu:646). norm="l2": stop at ‖Δ‖₂/n ≤ eps_l2 on the
    probability scale (the lightSpMV criterion, lightSpMV/PageRank.h:355-361).
    personalization: optional length-n vector summing to 1 (M7).
    bin_metrics: per-superstep mean |Δ| per log2-in-degree bin, written as
    converge_node.csv next to each checkpoint (A5/S4, for_test.h:20-85)."""
    eng = BSPEngine(
        csr_dir,
        n_workers=n_workers,
        mode=MODE_PAGERANK,
        alpha=alpha,
        num_cpus_per_worker=num_cpus_per_worker,
        personalization=personalization,
        norm=norm,
        bin_metrics=bin_metrics,
        transport=transport,
        exchange_dtype=exchange_dtype,
    )
    restored = None
    if resume and checkpoint_root:
        restored = eng.resume(checkpoint_root)
    if restored is None:
        eng.init_state()
    n = eng.n
    converged = False
    diff = float("inf")
    step_times: list[float] = []
    bin_counts = None
    if bin_metrics:
        import numpy as np

        bin_counts = sum(ray.get([w.bin_counts.remote() for w in eng.workers]))
    bin_rows: list = []
    while eng.iteration < max_iters:
        t0 = time.perf_counter()
        out = eng._superstep()
        diff, total = out[0], out[1]
        dt = time.perf_counter() - t0
        step_times.append(dt)
        eng.iteration += 1
        record = {
            "iteration": eng.iteration,
            f"{norm}_diff": diff,
            "total_mass": total,
            "edges": eng.n_edges,
            "superstep_sec": dt,
        }
        if bin_metrics and len(out) > 2:
            import numpy as np

            mean_per_bin = out[2] / np.maximum(bin_counts, 1)
            record["bin_mean_abs_diff"] = [round(float(x), 10) for x in mean_per_bin]
            bin_rows.append([eng.iteration] + [float(x) for x in mean_per_bin])
        eng.history.append(record)
        if norm == "l2":
            converged = (diff ** 0.5) / n <= eps_l2
        else:
            converged = diff <= eps_per_vertex * n
        if checkpoint_root and (converged or eng.iteration % checkpoint_every == 0):
            eng._write_checkpoint(checkpoint_root, {f"{norm}_diff": diff, "converged": converged})
            if bin_rows:
                import os

                it_dir = os.path.join(checkpoint_root, f"iter_{eng.iteration:05d}")
                with open(os.path.join(it_dir, "converge_node.csv"), "w") as f:
                    f.write("iteration," + ",".join(f"bin{b}" for b in range(15)) + "\n")
                    for row in bin_rows:
                        f.write(",".join(str(x) for x in row) + "\n")
        if converged:
            break
    ranks = eng.collect_result_and_shutdown()
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


def pagerank_fixed_iters(
    csr_dir: str,
    *,
    n_workers: int,
    iters: int,
    alpha: float = 0.85,
    window: int = 4,
    warmup_iters: int = 3,
    num_cpus_per_worker: float | None = None,
    exchange_dtype: str = "float64",
    transport: str = "shm",
) -> IterativeResult:
    """Fixed-iteration PageRank with pipelined superstep submission (the
    throughput-measurement mode; semantics of /root/reference/kernel_cusparse.cu:250
    which runs a fixed 41 iterations with no convergence test).

    Up to ``window`` supersteps are in flight at once: worker-side actor task
    ordering keeps the dataflow correct, and driver latency (O(W²) ref routing)
    overlaps with compute instead of sitting on the critical path — this is
    what preserves scaling efficiency at high worker counts.
    """
    eng = BSPEngine(
        csr_dir,
        n_workers=n_workers,
        mode=MODE_PAGERANK,
        alpha=alpha,
        num_cpus_per_worker=num_cpus_per_worker,
        exchange_dtype=exchange_dtype,
        transport=transport,
    )
    eng.init_state()
    window = min(window, 5)  # shm transport ring has 6 slots; keep one spare
    # untimed warmup: the first 1-2 supersteps pay one-time page-fault costs
    # (fresh 10s-of-MB buffers per worker) that would pollute the mean
    for _ in range(warmup_iters):
        ray.get(eng.submit_superstep())
    if warmup_iters:
        # reset state so the timed run starts from r⁰: the returned ranks and
        # final_diff correspond to exactly `iters` iterations (comparable to a
        # fixed-iteration oracle), not iters+warmup
        eng.init_state()
    t0 = time.perf_counter()
    pending: deque = deque()
    submitted = 0
    diffs: list[float] = []
    completions: list[float] = [t0]
    while submitted < min(window, iters):
        pending.append(eng.submit_superstep())
        submitted += 1
    while pending:
        results = ray.get(pending.popleft())
        completions.append(time.perf_counter())
        diffs.append(sum(r[0] for r in results))
        if submitted < iters:
            pending.append(eng.submit_superstep())
            submitted += 1
    wall = time.perf_counter() - t0
    eng.iteration = iters
    ranks = eng.collect_result_and_shutdown()
    import numpy as np

    deltas = np.diff(completions)
    # median completion-to-completion delta: robust to VM noise bursts
    median_step = float(np.median(deltas)) if len(deltas) else 0.0
    res = IterativeResult(
        result=ranks,
        iterations=iters,
        converged=False,
        final_diff=diffs[-1] if diffs else float("inf"),
        n_vertices=eng.n,
        n_edges=eng.n_edges,
        metrics=[
            {"iteration": i + 1, "l1_diff": d, "superstep_sec": float(dt)}
            for i, (d, dt) in enumerate(zip(diffs, deltas))
        ],
        mean_superstep_sec=wall / max(iters, 1),
    )
    res.median_superstep_sec = median_step
    return res


def pagerank_incremental(
    base_csr_dir: str,
    full_csr_dir: str,
    *,
    n_workers: int,
    base_iters: int = 20,
    warm_iters: int = 10,
    alpha: float = 0.85,
    round_digits: int = 6,
    transport: str = "shm",
) -> IterativeResult:
    """Incremental (warm-start) PageRank — the daily-crawl-delta update: run
    ``base_iters`` supersteps on yesterday's edge set, then ``warm_iters``
    supersteps on the full edge set starting from the base vector instead of
    r⁰=1. Power iteration is contractive (α=0.85), so a warm start reaches a
    given L1 tolerance in far fewer supersteps than a cold start — the whole
    point of incrementality on a 10¹²-page link graph where the daily delta
    is a small fraction of the edges.

    Both CSRs MUST share one dense vertex universe (the FULL graph's): the
    base engine treats delta-only vertices as isolated/dangling, which is
    exactly the recurrence the SQL oracle unrolls. The base vector is rounded
    half-away to ``round_digits`` in place on the workers before the
    range-aligned ``transfer_state`` hand-off (O(W) objects, no shuffle), so
    the warm phase's r⁰ is bit-identical to the oracle's inter-phase
    ROUND(r, 6) CTE. Determinism: fixed iteration counts, no convergence
    test (eps 0 semantics of q_pagerank_fixed).
    """
    total_cpus = ray.cluster_resources().get("CPU", 1)
    per_worker = max(0.1, min(1.0, (total_cpus - 1) / max(2 * n_workers, 1)))
    e_base = BSPEngine(
        base_csr_dir,
        n_workers=n_workers,
        mode=MODE_PAGERANK,
        alpha=alpha,
        transport=transport,
        num_cpus_per_worker=per_worker,
    )
    e_full = BSPEngine(
        full_csr_dir,
        n_workers=n_workers,
        mode=MODE_PAGERANK,
        alpha=alpha,
        transport=transport,
        num_cpus_per_worker=per_worker,
    )
    if e_base.n != e_full.n:
        raise ValueError(
            f"base/full vertex-universe mismatch: {e_base.n} vs {e_full.n} "
            "(build the base CSR over the FULL graph's dense id space)"
        )
    step_times: list[float] = []
    e_base.init_state()
    for _ in range(base_iters):
        t0 = time.perf_counter()
        e_base._superstep()
        e_base.iteration += 1
        step_times.append(time.perf_counter() - t0)
    ray.get([w.round_state.remote(round_digits) for w in e_base.workers])
    e_full.init_state()  # allocates the state buffer transfer_state overwrites
    transfer_state(e_base, e_full)
    e_base.shutdown()
    diff = float("inf")
    for _ in range(warm_iters):
        t0 = time.perf_counter()
        out = e_full._superstep()
        diff = out[0]
        e_full.iteration += 1
        step_times.append(time.perf_counter() - t0)
    ranks = e_full.collect_result_and_shutdown()
    return IterativeResult(
        result=ranks,
        iterations=base_iters + warm_iters,
        converged=False,
        final_diff=diff,
        n_vertices=e_full.n,
        n_edges=e_full.n_edges,
        mean_superstep_sec=sum(step_times) / max(len(step_times), 1),
    )
