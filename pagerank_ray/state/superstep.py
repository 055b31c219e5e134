"""BSP superstep engine over CSR shards held in long-lived Ray actors.

This is the one place the engine drops below the Dataset API, and why: an
iterative fixed-point (40-100 supersteps) needs *the same* mutable per-shard
state (CSR arrays + current rank slice) alive across iterations. Ray Data's
``map_batches`` actor pools are scoped to one execution and do not route a
given block to a given actor, so per-superstep Dataset execution would re-ship
shard state every iteration and pay pool startup per superstep. The reference
has the identical structure: CSC arrays uploaded to VRAM once, reused across
all iterations (/root/reference/kernel_acsr.cu:639-643, SURVEY.md §2.3 T1);
here "VRAM residency" becomes actor residency.

Semantics per superstep (PageRank mode) follow the reference recurrence
(kernel_bblock.cu:949-1085):
  D      = Σ rank[dangling]                       (A2; strict pre-gather barrier)
  remain = α·D/n + (1−α)                          (kernel_bblock.cu:966)
  rank'  = remain + α·Σ_{u→v} rank[u]/out_deg[u]  (A1 + M9 fused finalize)
  stop when Σ|Δ| ≤ 1e-6·n                          (A3; kernel_acsr.cu:646)

The per-destination-range exchange is the engine's recurring shuffle: each
worker pre-aggregates contributions per *destination* vertex (sorted-by-dst
``np.add.reduceat`` — the vectorized analogue of the reference's per-bin tree
reductions, kernel_acsr.cu:93-120), then ships one partial per target range.
Hub vertices (power-law skew) are therefore always combined W ways maximum —
the same two-stage combine the reference's ``child_kernal`` + ``atomicAdd``
performs, without a hot-key shuffle (SURVEY.md §4.3).

Workers exchange partials peer-to-peer through the object store (the driver
only routes ObjectRefs), so per-superstep driver work is O(W²) ref handling,
no payload bytes. State float64 throughout (SURVEY.md §4.4).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from pagerank_ray.stages.csr import read_manifest, shard_path

MODE_PAGERANK = "pagerank"
MODE_MIN = "min"  # connected components: hash-min label propagation
MODE_LABEL = "label"  # community label propagation: most-frequent neighbor label

_DENSE_FRACTION = 0.5  # densify a partial when it covers > this fraction of the range


def _load_shard_arrays(path: str) -> tuple[int, int, np.ndarray, np.ndarray]:
    t = pq.read_table(path)
    lo = t.column("lo")[0].as_py()
    hi = t.column("hi")[0].as_py()
    indptr = np.asarray(t.column("indptr")[0].values)
    dst = np.asarray(t.column("dst_ids")[0].values)
    return lo, hi, indptr, dst


@ray.remote
class ShardWorker:
    """Owns a contiguous vertex range [lo, hi) and all out-edges of its vertices.

    State loaded once in ``__init__`` (SURVEY.md §2.3 T1): merged CSR arrays,
    out-degree/inverse weights, dangling mask, plus the precomputed
    dst-sorted edge permutation and per-destination group offsets that make
    every superstep a handful of vectorized numpy kernels.
    """

    def __init__(
        self,
        shard_paths: list[str],
        worker_cuts: list[int],
        worker_index: int,
        n_vertices: int,
        mode: str = MODE_PAGERANK,
        alpha: float = 0.85,
    ):
        self.mode = mode
        self.alpha = alpha
        self.n = n_vertices
        self.w = worker_index
        self.worker_cuts = np.asarray(worker_cuts, dtype=np.int64)  # len W-1
        self.n_workers = len(worker_cuts) + 1

        parts = [_load_shard_arrays(p) for p in shard_paths]
        parts.sort(key=lambda x: x[0])
        self.lo = parts[0][0]
        self.hi = parts[-1][1]
        size = self.hi - self.lo
        indptr = np.zeros(size + 1, dtype=np.int64)
        dsts = []
        base = 0
        for lo, hi, ip, dst in parts:
            indptr[lo - self.lo : hi - self.lo + 1] = ip + base
            base += len(dst)
            dsts.append(dst)
        self.dst_ids = np.concatenate(dsts) if dsts else np.array([], np.int64)
        self.indptr = indptr
        self.out_deg = np.diff(indptr)
        self.dangling = self.out_deg == 0
        inv = np.zeros(size, dtype=np.float64)
        nz = ~self.dangling
        inv[nz] = 1.0 / self.out_deg[nz]
        self.inv_out = inv

        m = len(self.dst_ids)
        # per-edge local src index, then the dst-sorted view of the edge list
        src_rep = np.repeat(np.arange(size, dtype=np.int64), self.out_deg)
        order = np.argsort(self.dst_ids, kind="stable")
        self.src_by_dst = src_rep[order].astype(np.int64)
        dst_sorted = self.dst_ids[order]
        # group boundaries: one group per distinct destination vertex
        if m:
            change = np.concatenate([[True], dst_sorted[1:] != dst_sorted[:-1]])
            self.group_starts = np.flatnonzero(change)
            self.group_dst = dst_sorted[self.group_starts]
        else:
            self.group_starts = np.array([], np.int64)
            self.group_dst = np.array([], np.int64)
        # which target worker owns each destination group
        self.group_target = np.searchsorted(self.worker_cuts, self.group_dst, side="right")
        self.target_slices = np.searchsorted(self.group_target, np.arange(self.n_workers + 1))
        self.dst_sorted = dst_sorted
        self.state = None  # set by init_state / set_state

    # ---- range helpers -------------------------------------------------
    def _target_bounds(self, q: int) -> tuple[int, int]:
        lo = 0 if q == 0 else int(self.worker_cuts[q - 1])
        hi = self.n if q == self.n_workers - 1 else int(self.worker_cuts[q])
        return lo, hi

    def meta(self):
        return {
            "lo": int(self.lo),
            "hi": int(self.hi),
            "n_edges": int(len(self.dst_ids)),
            "n_dangling": int(self.dangling.sum()),
        }

    # ---- state ---------------------------------------------------------
    def init_state(self):
        size = self.hi - self.lo
        if self.mode == MODE_PAGERANK:
            # uniform mass-n init, r=1.0 ∀v (kernel_acsr.cu:37-45)
            self.state = np.ones(size, dtype=np.float64)
            return float(self.state[self.dangling].sum())
        # CC / LP: label⁰ = own id
        self.state = np.arange(self.lo, self.hi, dtype=np.int64)
        return 0.0

    def set_state(self, values: np.ndarray):
        assert len(values) == self.hi - self.lo
        self.state = values.copy()
        if self.mode == MODE_PAGERANK:
            return float(self.state[self.dangling].sum())
        return 0.0

    def get_state(self) -> np.ndarray:
        return self.state

    def state_table(self) -> pa.Table:
        ids = np.arange(self.lo, self.hi, dtype=np.int64)
        if self.mode == MODE_PAGERANK:
            return pa.table({"id": ids, "rank": self.state})
        return pa.table({"id": ids, "label": self.state})

    # ---- superstep -----------------------------------------------------
    def scatter(self):
        """Gather-scatter over the local CSR: per-destination pre-aggregation,
        one partial per target worker range. Returns W values (num_returns=W)."""
        gs = self.group_starts
        out = []
        if self.mode == MODE_PAGERANK:
            contrib = self.state * self.inv_out
            vals = contrib[self.src_by_dst]
            sums = np.add.reduceat(vals, gs) if len(gs) else np.array([], np.float64)
            for q in range(self.n_workers):
                s, e = self.target_slices[q], self.target_slices[q + 1]
                if s == e:
                    out.append(None)
                    continue
                t_lo, t_hi = self._target_bounds(q)
                idx = self.group_dst[s:e] - t_lo
                v = sums[s:e]
                if (e - s) > (t_hi - t_lo) * _DENSE_FRACTION:
                    dense = np.zeros(t_hi - t_lo, dtype=np.float64)
                    dense[idx] = v
                    out.append(dense)
                else:
                    out.append((idx, v))
        elif self.mode == MODE_MIN:
            vals = self.state[self.src_by_dst]
            mins = np.minimum.reduceat(vals, gs) if len(gs) else np.array([], np.int64)
            for q in range(self.n_workers):
                s, e = self.target_slices[q], self.target_slices[q + 1]
                if s == e:
                    out.append(None)
                    continue
                t_lo, _ = self._target_bounds(q)
                out.append((self.group_dst[s:e] - t_lo, mins[s:e]))
        elif self.mode == MODE_LABEL:
            vals = self.state[self.src_by_dst]
            # count (dst, label) pairs: sort labels within each dst group
            order = np.lexsort((vals, self.dst_sorted))
            d2 = self.dst_sorted[order]
            l2 = vals[order]
            if len(d2):
                change = np.concatenate([[True], (d2[1:] != d2[:-1]) | (l2[1:] != l2[:-1])])
                starts = np.flatnonzero(change)
                counts = np.diff(np.concatenate([starts, [len(d2)]]))
                pd_, pl_, pc_ = d2[starts], l2[starts], counts
            else:
                pd_ = pl_ = pc_ = np.array([], np.int64)
            targets = np.searchsorted(self.worker_cuts, pd_, side="right")
            t_slices = np.searchsorted(targets, np.arange(self.n_workers + 1))
            for q in range(self.n_workers):
                s, e = t_slices[q], t_slices[q + 1]
                if s == e:
                    out.append(None)
                    continue
                t_lo, _ = self._target_bounds(q)
                out.append((pd_[s:e] - t_lo, pl_[s:e], pc_[s:e]))
        else:
            raise ValueError(self.mode)
        if self.n_workers == 1:
            return out[0]
        return tuple(out)

    def apply(self, partial_refs, remain: float = 0.0):
        """Combine incoming partials and advance local state.

        Returns (diff, dangling_sum, total): for PageRank diff = local Σ|Δ|
        (A3) and dangling_sum feeds next iteration's D (A2, computed on the
        NEW ranks so the driver needs no extra round-trip); for CC/LP diff =
        number of changed labels.
        """
        parts = ray.get(list(partial_refs))
        size = self.hi - self.lo
        old = self.state
        if self.mode == MODE_PAGERANK:
            acc = np.zeros(size, dtype=np.float64)
            for p in parts:
                if p is None:
                    continue
                if isinstance(p, tuple):
                    idx, v = p
                    np.add.at(acc, idx, v)  # idx unique per partial, but stay safe
                else:
                    acc += p
            new = remain + self.alpha * acc
            diff = float(np.abs(new - old).sum())
            self.state = new
            return diff, float(new[self.dangling].sum()), float(new.sum())
        if self.mode == MODE_MIN:
            new = old.copy()
            for p in parts:
                if p is None:
                    continue
                idx, v = p
                np.minimum.at(new, idx, v)
            changed = int((new != old).sum())
            self.state = new
            return changed, 0.0, float(new.sum())
        if self.mode == MODE_LABEL:
            idxs, labels, counts = [], [], []
            for p in parts:
                if p is None:
                    continue
                i, l, c = p
                idxs.append(i)
                labels.append(l)
                counts.append(c)
            new = old.copy()
            if idxs:
                i = np.concatenate(idxs)
                l = np.concatenate(labels)
                c = np.concatenate(counts)
                # merge counts across partials, then argmax count (ties → smallest label)
                order = np.lexsort((l, i))
                i, l, c = i[order], l[order], c[order]
                change = np.concatenate([[True], (i[1:] != i[:-1]) | (l[1:] != l[:-1])])
                starts = np.flatnonzero(change)
                csum = np.add.reduceat(c, starts)
                gi, gl = i[starts], l[starts]
                # pick per dst: order by (dst, -count, label), take first of each dst
                sel = np.lexsort((gl, -csum, gi))
                gi_s, gl_s = gi[sel], gl[sel]
                first = np.concatenate([[True], gi_s[1:] != gi_s[:-1]])
                new[gi_s[first]] = gl_s[first]
            changed = int((new != old).sum())
            self.state = new
            return changed, 0.0, float(new.sum())
        raise ValueError(self.mode)

    # ---- checkpointing -------------------------------------------------
    def checkpoint(self, ckpt_dir: str) -> str:
        os.makedirs(ckpt_dir, exist_ok=True)
        path = os.path.join(ckpt_dir, f"range-{self.lo:012d}-{self.hi:012d}.parquet")
        tmp = path + f".tmp-{self.w}"
        pq.write_table(self.state_table(), tmp)
        os.replace(tmp, path)
        return path

    def restore(self, ckpt_dir: str):
        """Load this worker's slice from a checkpoint dir (any prior W layout:
        reads every range file overlapping [lo, hi) and slices by id)."""
        col = "rank" if self.mode == MODE_PAGERANK else "label"
        dtype = np.float64 if self.mode == MODE_PAGERANK else np.int64
        out = np.empty(self.hi - self.lo, dtype=dtype)
        seen = 0
        for name in sorted(os.listdir(ckpt_dir)):
            if not (name.startswith("range-") and name.endswith(".parquet")):
                continue
            _, f_lo, f_hi = name[: -len(".parquet")].split("-")
            f_lo, f_hi = int(f_lo), int(f_hi)
            if f_hi <= self.lo or f_lo >= self.hi:
                continue
            t = pq.read_table(os.path.join(ckpt_dir, name), columns=["id", col])
            ids = t.column("id").to_numpy()
            vals = t.column(col).to_numpy()
            mask = (ids >= self.lo) & (ids < self.hi)
            out[ids[mask] - self.lo] = vals[mask]
            seen += int(mask.sum())
        if seen != self.hi - self.lo:
            raise RuntimeError(
                f"checkpoint restore: worker [{self.lo},{self.hi}) found {seen} rows"
            )
        self.state = out
        if self.mode == MODE_PAGERANK:
            return float(out[self.dangling].sum())
        return 0.0


def assign_parts_to_workers(manifest: dict, n_workers: int) -> list[list[int]]:
    """Contiguous, edge-balanced grouping of CSR parts onto workers: split the
    part sequence at the prefix-sum points closest to equal edge shares."""
    counts = [manifest["edge_counts"][str(p)] for p in range(manifest["n_parts"])]
    n_parts = len(counts)
    n_workers = max(1, min(n_workers, n_parts))
    prefix = np.concatenate([[0], np.cumsum(counts)])
    total = max(int(prefix[-1]), 1)
    bounds = [0]
    for w in range(1, n_workers):
        target = total * w / n_workers
        j = int(np.searchsorted(prefix, target))
        j = max(bounds[-1] + 1, min(j, n_parts - (n_workers - w)))
        bounds.append(j)
    bounds.append(n_parts)
    return [list(range(bounds[i], bounds[i + 1])) for i in range(n_workers)]


class BSPEngine:
    """Driver-side engine: builds the worker pool from a CSR directory and runs
    superstep loops with checkpoint/resume (SURVEY.md §3.4 Phase 3)."""

    def __init__(
        self,
        csr_dir: str,
        *,
        n_workers: int,
        mode: str = MODE_PAGERANK,
        alpha: float = 0.85,
        num_cpus_per_worker: float | None = None,
    ):
        self.csr_dir = csr_dir
        self.manifest = read_manifest(csr_dir)
        self.n = self.manifest["n_vertices"]
        self.mode = mode
        self.alpha = alpha
        groups = assign_parts_to_workers(self.manifest, n_workers)
        self.n_workers = len(groups)
        cuts = self.manifest["cuts"]
        # worker boundary = first vertex of each group after the first
        worker_cuts = []
        for g in groups[1:]:
            first_part = g[0]
            worker_cuts.append(0 if first_part == 0 else cuts[first_part - 1])
        self.worker_cuts = worker_cuts
        if num_cpus_per_worker is None:
            # Reserve as much CPU as possible while always leaving ≥1 CPU free:
            # a full reservation would deadlock any concurrent Ray Data
            # execution (e.g. collecting the result dataset). num_cpus is a
            # scheduling reservation, not a pin — all W single-threaded
            # workers still run concurrently on separate cores.
            total_cpus = ray.cluster_resources().get("CPU", 1)
            num_cpus_per_worker = max(0.1, min(1.0, (total_cpus - 1) / max(self.n_workers, 1)))
        ncpu = num_cpus_per_worker
        self.workers = [
            ShardWorker.options(num_cpus=ncpu).remote(
                [shard_path(csr_dir, p) for p in g],
                worker_cuts,
                w,
                self.n,
                mode,
                alpha,
            )
            for w, g in enumerate(groups)
        ]
        self.metas = ray.get([w.meta.remote() for w in self.workers])
        self.n_edges = sum(m["n_edges"] for m in self.metas)
        self.iteration = 0
        self.history: list[dict] = []

    def init_state(self) -> float:
        d = ray.get([w.init_state.remote() for w in self.workers])
        self.iteration = 0
        self.history = []
        return float(sum(d))

    def _superstep(self, remain: float):
        W = self.n_workers
        if W == 1:
            sc = self.workers[0].scatter.remote()
            matrix = [[sc]]
        else:
            matrix = [w.scatter.options(num_returns=W).remote() for w in self.workers]
        applies = [
            self.workers[q].apply.remote([matrix[p][q] for p in range(W)], remain)
            for q in range(W)
        ]
        results = ray.get(applies)
        diff = sum(r[0] for r in results)
        dangling = sum(r[1] for r in results)
        total = sum(r[2] for r in results)
        return diff, dangling, total

    # ---- checkpoint plumbing ------------------------------------------
    def _write_checkpoint(self, ckpt_root: str, extra: dict):
        it_dir = os.path.join(ckpt_root, f"iter_{self.iteration:05d}")
        os.makedirs(it_dir, exist_ok=True)
        ray.get([w.checkpoint.remote(it_dir) for w in self.workers])
        manifest = {
            "iteration": self.iteration,
            "mode": self.mode,
            "alpha": self.alpha,
            "n_vertices": self.n,
            "n_edges": self.n_edges,
            "csr_dir": os.path.abspath(self.csr_dir),
            "n_workers": self.n_workers,
            "complete": True,
            **extra,
        }
        with open(os.path.join(it_dir, "_metrics.json"), "w") as f:
            json.dump(self.history[-1] if self.history else {}, f)
        tmp = os.path.join(it_dir, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(it_dir, "MANIFEST.json"))

    @staticmethod
    def latest_checkpoint(ckpt_root: str) -> tuple | None:
        """Latest complete checkpoint as (iteration, dir, manifest) or None."""
        if not os.path.isdir(ckpt_root):
            return None
        best = None
        for name in sorted(os.listdir(ckpt_root)):
            if not name.startswith("iter_"):
                continue
            man = os.path.join(ckpt_root, name, "MANIFEST.json")
            if os.path.exists(man):
                with open(man) as f:
                    meta = json.load(f)
                if meta.get("complete"):
                    best = (meta["iteration"], os.path.join(ckpt_root, name), meta)
        return best

    def resume(self, ckpt_root: str) -> float | None:
        """Restore the latest complete checkpoint; returns dangling mass D or
        None when no checkpoint exists."""
        found = self.latest_checkpoint(ckpt_root)
        if not found:
            return None
        iteration, it_dir, meta = found
        d = ray.get([w.restore.remote(it_dir) for w in self.workers])
        self.iteration = iteration
        return float(sum(d))
