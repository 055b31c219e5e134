"""BSP superstep engine over CSR shards held in long-lived Ray actors.

This is the one place the engine drops below the Dataset API, and why: an
iterative fixed-point (40-100 supersteps) needs *the same* mutable per-shard
state (CSR arrays + current rank slice) alive across iterations. Ray Data's
``map_batches`` actor pools are scoped to one execution and do not route a
given block to a given actor, so per-superstep Dataset execution would re-ship
shard state every iteration and pay pool startup per superstep. The reference
has the identical structure: CSC arrays uploaded to VRAM once, reused across
all iterations (/root/reference/kernel_acsr.cu:639-643, SURVEY.md §2.3 T1);
here "VRAM residency" becomes actor residency. (A pure-Dataset formulation of
the same superstep lives in pipelines/dataset_pagerank.py for parity testing.)

Semantics per superstep (PageRank mode) follow the reference recurrence
(kernel_bblock.cu:949-1085):
  D      = Σ rank[dangling]                       (A2; strict pre-gather barrier)
  remain = α·D/n + (1−α)                          (kernel_bblock.cu:966)
  rank'  = remain + α·Σ_{u→v} rank[u]/out_deg[u]  (A1 + M9 fused finalize)
  stop when Σ|Δ| ≤ 1e-6·n                          (A3; kernel_acsr.cu:646)

The per-destination-range exchange is the engine's recurring shuffle: each
worker pre-aggregates contributions per *destination* vertex (sorted-by-dst
``np.add.reduceat`` — the vectorized analogue of the reference's per-bin tree
reductions, kernel_acsr.cu:93-120), then publishes ONE
pre-aggregated values object read zero-copy by all targets (see the superstep
section below for why not W² point-to-point objects). Hub vertices (power-law skew) are therefore combined at most W ways — the same
two-stage combine the reference's ``child_kernal`` + ``atomicAdd`` performs
(kernel_acsr.cu:93-120), with no hot-key shuffle (SURVEY.md §4.3).

Scaling-efficiency design: the dangling mass of the current state is
piggybacked on every scatter message, so each worker derives ``remain``
locally and NO driver round-trip sits between gather and apply. The driver
only routes ObjectRefs (O(W) per superstep, zero payload bytes) and may submit
several supersteps ahead (actor task ordering guarantees scatter_{k+1} runs
after apply_k on each worker), hiding driver latency entirely for
fixed-iteration runs. State is float64 throughout (SURVEY.md §4.4); edge
index arrays are int32 when the local range allows (these kernels are
memory-bandwidth-bound).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
from multiprocessing import resource_tracker, shared_memory


def _attach_shm(name: str) -> shared_memory.SharedMemory:
    """Attach to an existing segment WITHOUT registering with the resource
    tracker (the creator owns cleanup; an attacher's tracker would otherwise
    unlink segments still in use when its process exits)."""
    seg = shared_memory.SharedMemory(name=name, create=False)
    try:
        resource_tracker.unregister(seg._name, "shared_memory")  # type: ignore[attr-defined]
    except Exception:
        pass
    return seg

from pagerank_ray.stages.csr import read_manifest, shard_path

MODE_PAGERANK = "pagerank"
MODE_MIN = "min"  # connected components: hash-min label propagation
MODE_LABEL = "label"  # community label propagation: most-frequent neighbor label
MODE_SUM = "sum"  # plain neighbor sum: state'(v) = Σ_{u→v} state(u) (HITS half-step)
MODE_DIST = "dist"  # multi-source BFS levels: d'(v) = min(d(v), min_{u→v} d(u)+1)
MODE_DISTW = "distw"  # weighted SSSP (Bellman-Ford): d'(v) = min(d(v), min d(u)+w_uv)

_DIST_INF = np.int64(1) << 62  # unreached sentinel (headroom for +1 per superstep)

_GATHER_CHUNK = 1 << 18  # edges per take+reduceat chunk: temp stays L2-resident


def _gather_reduce(contrib, idx, gs, out, off, chunk: int = _GATHER_CHUNK, w=None):
    """out[off:off+len(gs)] = add.reduceat(contrib.take(idx) [* w], gs),
    chunked on group boundaries so the gathered temp never streams through
    DRAM (an unchunked take materializes an all-edges temp — measured as the
    largest per-superstep memory traffic term after the index reads).
    ``w``: optional per-edge weights aligned with ``idx`` (weighted CSR)."""
    n_groups = len(gs)
    n_edges = len(idx)
    g0 = 0
    while g0 < n_groups:
        e0 = int(gs[g0])
        g1 = int(np.searchsorted(gs, e0 + chunk))
        g1 = max(g1, g0 + 1)
        e1 = int(gs[g1]) if g1 < n_groups else n_edges
        vals = contrib.take(idx[e0:e1])
        if w is not None:
            vals = vals * w[e0:e1]
        out[off + g0 : off + g1] = np.add.reduceat(vals, gs[g0:g1] - e0)
        g0 = g1


def _load_shard_arrays(path: str):
    t = pq.read_table(path)
    lo = t.column("lo")[0].as_py()
    hi = t.column("hi")[0].as_py()
    indptr = np.asarray(t.column("indptr")[0].values)
    dst = np.asarray(t.column("dst_ids")[0].values)
    w = (
        np.asarray(t.column("weights")[0].values)
        if "weights" in t.schema.names
        else None
    )
    return lo, hi, indptr, dst, w


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
        transport: str = "shm",
        n_buffers: int = 6,
        personalization_ref=None,
        norm: str = "l1",
        bin_metrics: bool = False,
        exchange_dtype: str = "float64",
    ):
        self.mode = mode
        self.alpha = alpha
        self.norm = norm
        # Exchange value precision (PageRank only). "float32" halves the
        # dominant per-superstep DRAM traffic (gather source + scatter buffer
        # + exchange bytes); per-destination partials are f32 but the combine
        # in apply() accumulates in float64, and power iteration is
        # contractive (errors damped by α each superstep, not compounded) —
        # measured ≤2e-7 max |Δrank| vs the f64 exchange on the bench graphs.
        if mode == MODE_DISTW and exchange_dtype == "float32":
            raise ValueError(
                "MODE_DISTW requires the float64 exchange: f32 would break "
                "the exact-integer-distance contract (q_sssp_weighted)"
            )
        self.xdtype = np.dtype(np.float32 if exchange_dtype == "float32" else np.float64)
        self.bin_metrics = bin_metrics
        self.pers_ref = personalization_ref
        self.n = n_vertices
        self.w = worker_index
        self.worker_cuts = np.asarray(worker_cuts, dtype=np.int64)  # len W-1
        self.n_workers = len(worker_cuts) + 1

        parts = [_load_shard_arrays(p) for p in shard_paths]
        parts.sort(key=lambda x: x[0])
        self.lo = parts[0][0]
        self.hi = parts[-1][1]
        # weighted CSR: any non-empty shard carrying a weights column switches
        # the PageRank gather from the derived 1/out_deg to stored weights
        self.weighted = any(p[4] is not None and len(p[4]) for p in parts)
        if mode == MODE_DISTW and self.n_edges_of(parts) > 0 and not self.weighted:
            raise ValueError(
                "MODE_DISTW over a CSR without stored weights — build it "
                "with a weight column and normalize_weights=False"
            )
        size = self.hi - self.lo
        indptr = np.zeros(size + 1, dtype=np.int64)
        base = 0
        for lo, hi, ip, dst, _w in parts:
            indptr[lo - self.lo : hi - self.lo + 1] = ip + base
            base += len(dst)
        self.n_edges = base
        self.indptr = indptr
        self.out_deg = np.diff(indptr)
        self.dangling = self.out_deg == 0
        inv = np.zeros(size, dtype=np.float64)
        nz = ~self.dangling
        inv[nz] = 1.0 / self.out_deg[nz]
        self.inv_out = inv

        # Per-SHARD scatter structure (cache blocking): each shard's source
        # range is small enough that its rank/contrib slice stays cache
        # resident during the gather — the cache-hierarchy analogue of the
        # reference's degree-binned kernel shapes (kernel_bblock.cu:622-659).
        # Per-shard group sums are written into one concatenated output
        # buffer; (shard offsets, per-shard group_dst) are static metadata.
        self.shards = []  # (slice_lo, src_by_dst_s, group_starts_s, out_off, dst_sorted|None, w_by_dst|None)
        group_dsts = []
        out_off = 0
        for lo, hi, ip, dst, w in parts:
            s_size = hi - lo
            out_deg_s = np.diff(ip)
            idx_t = np.int32 if s_size < 2**31 - 1 else np.int64
            src_rep = np.repeat(np.arange(s_size, dtype=idx_t), out_deg_s)
            order = np.argsort(dst, kind="stable")
            src_by_dst_s = np.ascontiguousarray(src_rep[order])
            dst_sorted_s = dst[order]
            # per-edge weights permuted into the same dst-sorted gather order,
            # pre-cast to the exchange dtype (avoids an upcast per superstep)
            w_by_dst_s = (
                np.ascontiguousarray(w[order].astype(self.xdtype))
                if (w is not None and len(w))
                else None
            )
            if len(dst_sorted_s):
                change = np.concatenate([[True], dst_sorted_s[1:] != dst_sorted_s[:-1]])
                gs = np.flatnonzero(change)
                gd = dst_sorted_s[gs]
            else:
                gs = np.array([], np.int64)
                gd = np.array([], np.int64)
            self.shards.append((
                lo - self.lo,
                src_by_dst_s,
                gs,
                out_off,
                dst_sorted_s if mode == MODE_LABEL else None,
                w_by_dst_s,
            ))
            group_dsts.append(gd)
            out_off += len(gd)
        self.out_len = out_off
        self.group_dsts = group_dsts  # static; published once via group_dst_table
        self.in_slices = None  # per-(source shard) mapping; see prepare_incoming
        self.state = None  # set by init_state / set_state

        # Exchange transport. "shm": persistent double-buffered POSIX shared
        # memory — the scatter output size is STATIC, so per-superstep plasma
        # allocation/serialization (measured as the dominant, jitter-prone
        # cost at high W) is replaced by an in-place write to a pre-allocated
        # ring of segments; the tiny (seq, dangling_mass) tuple is all that
        # flows through the object store. Single-node transport; on a
        # multi-node cluster use transport="plasma" (the general path, also
        # used by MODE_LABEL whose output size varies per superstep).
        self.transport = "plasma" if mode == MODE_LABEL else transport
        self.n_buffers = n_buffers
        self.iter_seq = 0
        self.shm_segs: list = []
        self.shm_views: list = []
        self.attached: dict = {}
        if self.transport == "shm":
            dtype = (
                self.xdtype
                if mode in (MODE_PAGERANK, MODE_SUM, MODE_DISTW)
                else np.dtype(np.int64)
            )
            for _ in range(n_buffers):
                seg = shared_memory.SharedMemory(
                    create=True, size=max(8, self.out_len * dtype.itemsize)
                )
                self.shm_segs.append(seg)
                self.shm_views.append(
                    np.ndarray(self.out_len, dtype=dtype, buffer=seg.buf)
                )
        # optional personalization vector (M7, lightSpMV/PageRank.h:313-318):
        # p sums to 1 over all vertices; on the engine's mass-n scale the
        # per-vertex teleport weight is n·p(v) (uniform p ≡ ones ≡ reference).
        if personalization_ref is not None:
            # a top-level ObjectRef constructor arg is auto-dereferenced by Ray
            p_full = (
                personalization_ref
                if isinstance(personalization_ref, np.ndarray)
                else ray.get(personalization_ref)
            )
            self.pers_n = np.ascontiguousarray(
                p_full[self.lo : self.hi].astype(np.float64) * self.n
            )
        else:
            self.pers_n = None
        self.in_deg = None  # filled by prepare_incoming when bin_metrics
        self.bins = None
    @staticmethod
    def n_edges_of(parts) -> int:
        return sum(len(p[3]) for p in parts)

    def meta(self):
        return {
            "lo": int(self.lo),
            "hi": int(self.hi),
            "n_edges": int(self.n_edges),
            "n_dangling": int(self.dangling.sum()),
        }

    # ---- state ---------------------------------------------------------
    def init_state(self):
        size = self.hi - self.lo
        if self.mode == MODE_PAGERANK:
            # uniform mass-n init, r=1.0 ∀v (kernel_acsr.cu:37-45);
            # with personalization: r⁰ = n·p (lightSpMV/PageRank.h:313-318)
            if self.pers_n is None:
                self.state = np.ones(size, dtype=np.float64)
            else:
                self.state = self.pers_n.copy()
            return float(self.state[self.dangling].sum())
        if self.mode == MODE_SUM:
            self.state = np.ones(size, dtype=np.float64)
            return 0.0
        if self.mode == MODE_DIST:
            # all unreached; seeds are planted afterwards via set_values
            self.state = np.full(size, _DIST_INF, dtype=np.int64)
            return 0.0
        if self.mode == MODE_DISTW:
            self.state = np.full(size, np.inf, dtype=np.float64)
            return 0.0
        # CC / LP: label⁰ = own id
        self.state = np.arange(self.lo, self.hi, dtype=np.int64)
        return 0.0

    def get_state(self) -> np.ndarray:
        return self.state

    def set_values(self, ids: np.ndarray, value: int) -> int:
        """Plant ``value`` at the given GLOBAL vertex ids that fall in this
        worker's range (BFS seeds). Returns how many were planted here."""
        ids = np.asarray(ids, dtype=np.int64)
        local = ids[(ids >= self.lo) & (ids < self.hi)] - self.lo
        self.state[local] = value
        return int(len(local))

    def scale_state(self, c: float) -> bool:
        """In-place scalar scale of the local state slice (HITS L1 normalize:
        the driver computes c = n/Σ from the apply() totals — one O(n/W) pass
        per worker, no state movement)."""
        self.state *= c
        return True

    def affine_state(self, mul: float, add: float) -> bool:
        """In-place affine pass x ← mul·x + add over the local state slice
        (Katz centrality's β + α·Σ fold: the driver applies the scalar terms
        after a raw MODE_SUM superstep — O(n/W) per worker, no state
        movement; generalizes scale_state)."""
        self.state *= mul
        self.state += add
        return True

    def round_state(self, ndigits: int) -> bool:
        """In-place half-away rounding of the local state slice (the repo's
        DuckDB-ROUND tie rule). Incremental PageRank rounds the base-phase
        vector before the warm-start transfer so the engine's r⁰ is exactly
        the vector the SQL oracle's ROUND(r, 6) inter-phase CTE produces —
        O(n/W) per worker, no state movement."""
        from pagerank_ray.functions.text import round_half_away

        self.state = round_half_away(self.state, ndigits)
        return True

    def load_state(self, segs: list, scale: float = 1.0) -> bool:
        """Replace the local state slice from another pool's published range
        slices. ``segs`` = [(src_lo, ref_or_array), ...] covering ≥ [lo, hi);
        only overlapping refs are passed in by the driver, so each worker
        fetches point-to-point (zero-copy plasma mmap on a node; on a cluster
        the transfer is the range-aligned O(W) slice exchange, no shuffle)."""
        out = np.empty(self.hi - self.lo, dtype=np.float64)
        for src_lo, ref in segs:
            arr = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            s = max(self.lo, src_lo)
            e = min(self.hi, src_lo + len(arr))
            if e > s:
                out[s - self.lo : e - self.lo] = arr[s - src_lo : e - src_lo]
        if scale != 1.0:
            out *= scale
        self.state = out
        return True

    def state_table(self) -> pa.Table:
        ids = np.arange(self.lo, self.hi, dtype=np.int64)
        if self.mode == MODE_PAGERANK:
            return pa.table({"id": ids, "rank": self.state})
        if self.mode == MODE_SUM:
            return pa.table({"id": ids, "value": self.state})
        if self.mode in (MODE_DIST, MODE_DISTW):
            return pa.table({"id": ids, "dist": self.state})
        return pa.table({"id": ids, "label": self.state})

    # ---- superstep -----------------------------------------------------
    # The destination-group structure is STATIC (the graph doesn't change
    # between supersteps), so the exchange is split into a one-time metadata
    # phase and a per-superstep values-only phase:
    #   * group_dst(): each worker publishes its sorted distinct-destination
    #     id array once; every target precomputes, per source, the slice of
    #     that array falling in its own range and the local indices it maps to.
    #   * scatter(): returns ONE object per worker — the per-destination
    #     pre-aggregated values (np.add/minimum.reduceat) + piggybacked
    #     dangling mass. O(W) plasma objects per superstep, not O(W²): the
    #     plasma store seals objects serially, and a W² exchange was measured
    #     10× slower at W=32 than W=8 on this workload.
    #   * apply(): ray.get of the W scatter outputs is zero-copy shared-memory
    #     mmap on a node; each target touches only its precomputed slice, so
    #     effective traffic is point-to-point. (On a multi-node cluster the
    #     scatter output plays the role of a per-NODE pre-aggregated partial —
    #     the standard node-level combine.)

    def group_dst_table(self):
        """Static exchange metadata: per-shard distinct-destination arrays
        (ascending), their offsets in the concatenated scatter buffer, and —
        for the shm transport — the segment names of the output ring."""
        offs = [sh[3] for sh in self.shards]
        names = [seg.name for seg in self.shm_segs] if self.transport == "shm" else None
        dtype = (
            self.xdtype.name
            if self.mode in (MODE_PAGERANK, MODE_SUM, MODE_DISTW)
            else "int64"
        )
        # per-shard edges-per-destination-group (static; for in-degree bins)
        sizes = []
        for _, src_by_dst_s, gs, _, _, _ in self.shards:
            sizes.append(
                np.diff(np.concatenate([gs, [len(src_by_dst_s)]])) if len(gs) else gs
            )
        return self.group_dsts, offs, names, self.out_len, dtype, sizes

    def prepare_incoming(self, table_refs: list):
        """Precompute, for every source worker's every shard, where that
        shard's group array intersects [lo, hi), the offset of its sums in the
        source's concatenated buffer, and the local indices it scatters into."""
        self.in_slices = []
        self.src_rings = []  # per source: list of np views over its shm ring
        in_deg = np.zeros(self.hi - self.lo, dtype=np.int64)
        for ref in table_refs:
            gds, offs, names, out_len, dtype, sizes = (
                ref if isinstance(ref, tuple) else ray.get(ref)
            )
            per_src = []
            for gd, off, sz in zip(gds, offs, sizes):
                s = int(np.searchsorted(gd, self.lo))
                e = int(np.searchsorted(gd, self.hi))
                if e > s:
                    idx = np.ascontiguousarray(gd[s:e] - self.lo)
                    per_src.append((off + s, off + e, idx))
                    in_deg[idx] += sz[s:e]
            self.in_slices.append(per_src)
            if names is not None and per_src:
                views = []
                for name in names:
                    seg = self.attached.get(name)
                    if seg is None:
                        seg = _attach_shm(name)
                        self.attached[name] = seg
                    views.append(np.ndarray(out_len, dtype=np.dtype(dtype), buffer=seg.buf))
                self.src_rings.append(views)
            else:
                self.src_rings.append(None)
        if self.bin_metrics:
            # reference degree binning: bin = ⌊log2(in_deg − 0.1)⌋ + 1, bin 0
            # for in-degree ≤ 1's lower edge, capped at 14
            # (binary_resort, kernel_acsr.cu:419-451; max_bin kernel_bblock.cu:25)
            self.in_deg = in_deg
            with np.errstate(divide="ignore", invalid="ignore"):
                b = np.floor(np.log2(np.maximum(in_deg - 0.1, 1e-9))).astype(np.int64) + 1
            b[in_deg == 0] = 0
            self.bins = np.clip(b, 0, 14)
        return True

    def scatter(self):
        """Gather-scatter over the local CSR, shard at a time (cache-blocked):
        per-destination pre-aggregation into ONE concatenated values buffer.
        Returns (buffer, local_dangling_mass); the piggybacked dangling mass
        lets apply() derive `remain` with no driver round-trip."""
        if self.mode == MODE_PAGERANK:
            d_local = float(self.state[self.dangling].sum())
            if self.weighted:
                # stored row-normalized weights: rank gathered raw, scaled
                # per edge inside the gather (csr.build_shard_table)
                contrib = np.asarray(self.state, dtype=self.xdtype)
            else:
                # one fused pass: cast-and-multiply into the exchange dtype
                contrib = np.multiply(self.state, self.inv_out, dtype=self.xdtype)
            if self.transport == "shm":
                out = self.shm_views[self.iter_seq % self.n_buffers]
            else:
                out = np.empty(self.out_len, dtype=self.xdtype)
            for s_lo, src_by_dst_s, gs, off, _, w_s in self.shards:
                if len(gs) == 0:
                    continue
                _gather_reduce(
                    contrib[s_lo:] if s_lo else contrib,
                    src_by_dst_s, gs, out, off,
                    w=w_s if self.weighted else None,
                )
            if self.transport == "shm":
                seq = self.iter_seq
                self.iter_seq += 1
                return seq, d_local
            return out, d_local
        if self.mode == MODE_SUM:
            # no teleport/damping: the raw Σ_{u→v} w_uv·state(u) (unit edge
            # weight when the CSR stores none — HITS; stored row-normalized
            # weights when it does — SALSA)
            contrib = np.asarray(self.state, dtype=self.xdtype)
            if self.transport == "shm":
                out = self.shm_views[self.iter_seq % self.n_buffers]
            else:
                out = np.empty(self.out_len, dtype=self.xdtype)
            for s_lo, src_by_dst_s, gs, off, _, w_s in self.shards:
                if len(gs) == 0:
                    continue
                _gather_reduce(
                    contrib[s_lo:] if s_lo else contrib, src_by_dst_s, gs, out, off,
                    w=w_s if self.weighted else None,
                )
            if self.transport == "shm":
                seq = self.iter_seq
                self.iter_seq += 1
                return seq, 0.0
            return out, 0.0
        if self.mode in (MODE_MIN, MODE_DIST, MODE_DISTW):
            if self.transport == "shm":
                out = self.shm_views[self.iter_seq % self.n_buffers]
            else:
                out = np.empty(
                    self.out_len,
                    dtype=self.xdtype if self.mode == MODE_DISTW else np.int64,
                )
            for s_lo, src_by_dst_s, gs, off, _, w_s in self.shards:
                if len(gs) == 0:
                    continue
                vals = self.state[s_lo:].take(src_by_dst_s) if s_lo else self.state.take(src_by_dst_s)
                if self.mode == MODE_DIST:
                    vals = vals + 1  # one hop along every edge
                elif self.mode == MODE_DISTW:
                    # raw per-edge weights (csr normalize_weights=False;
                    # enforced in __init__)
                    vals = vals + w_s
                out[off : off + len(gs)] = np.minimum.reduceat(vals, gs)
            if self.transport == "shm":
                seq = self.iter_seq
                self.iter_seq += 1
                return seq, 0.0
            return out, 0.0
        if self.mode == MODE_LABEL:
            pds, pls, pcs = [], [], []
            for s_lo, src_by_dst_s, gs, off, dst_sorted_s, _ in self.shards:
                if len(src_by_dst_s) == 0:
                    continue
                vals = self.state[s_lo:].take(src_by_dst_s) if s_lo else self.state.take(src_by_dst_s)
                # count (dst, label) pairs: sort labels within each dst group
                order = np.lexsort((vals, dst_sorted_s))
                d2 = dst_sorted_s[order]
                l2 = vals[order]
                change = np.concatenate([[True], (d2[1:] != d2[:-1]) | (l2[1:] != l2[:-1])])
                starts = np.flatnonzero(change)
                counts = np.diff(np.concatenate([starts, [len(d2)]]))
                pds.append(d2[starts])
                pls.append(l2[starts])
                pcs.append(counts)
            if not pds:
                z = np.array([], np.int64)
                return (z, z, z), 0.0
            # merge shard streams into one globally dst-sorted triple
            pd_ = np.concatenate(pds)
            pl_ = np.concatenate(pls)
            pc_ = np.concatenate(pcs)
            order = np.lexsort((pl_, pd_))
            return (pd_[order], pl_[order], pc_[order]), 0.0
        raise ValueError(self.mode)

    def apply(self, scatter_refs):
        """Combine all sources' pre-aggregated values for this range and
        advance local state. Returns (diff, total): for PageRank diff = local
        Σ|Δ| (A3); for CC/LP diff = number of changed labels. `remain` is
        derived from the piggybacked dangling masses. ray.get here is
        zero-copy shared-memory on a node; only this range's precomputed
        slices are touched."""
        parts = ray.get(list(scatter_refs))
        size = self.hi - self.lo
        old = self.state
        if self.mode == MODE_PAGERANK:
            d_total = sum(p[1] for p in parts)
            remain = self.alpha * d_total / self.n + (1.0 - self.alpha)
            acc = np.zeros(size, dtype=np.float64)
            for src_i, ((head, _), per_src) in enumerate(zip(parts, self.in_slices)):
                if not per_src:
                    continue
                buf = (
                    self.src_rings[src_i][head % self.n_buffers]
                    if self.transport == "shm"
                    else head
                )
                for s, e, idx in per_src:
                    acc[idx] += buf[s:e]  # idx unique per source shard
            if self.pers_n is None:
                new = remain + self.alpha * acc
            else:
                new = remain * self.pers_n + self.alpha * acc
            delta = np.abs(new - old)
            if self.norm == "l2":
                diff = float((delta * delta).sum())
            else:
                diff = float(delta.sum())
            self.state = new
            if self.bin_metrics:
                bin_sums = np.bincount(self.bins, weights=delta, minlength=15)
                return diff, float(new.sum()), bin_sums
            return diff, float(new.sum())
        if self.mode == MODE_SUM:
            acc = np.zeros(size, dtype=np.float64)
            for src_i, ((head, _), per_src) in enumerate(zip(parts, self.in_slices)):
                if not per_src:
                    continue
                buf = (
                    self.src_rings[src_i][head % self.n_buffers]
                    if self.transport == "shm"
                    else head
                )
                for s, e, idx in per_src:
                    acc[idx] += buf[s:e]
            # old state is the OTHER vector of the alternating HITS recurrence
            # (h before an authority step), so a per-element diff is not
            # meaningful — callers run fixed iterations; diff = 0 sentinel.
            self.state = acc
            return 0.0, float(acc.sum())
        if self.mode in (MODE_MIN, MODE_DIST, MODE_DISTW):
            new = old.copy()
            for src_i, ((head, _), per_src) in enumerate(zip(parts, self.in_slices)):
                if not per_src:
                    continue
                buf = (
                    self.src_rings[src_i][head % self.n_buffers]
                    if self.transport == "shm"
                    else head
                )
                for s, e, idx in per_src:
                    # idx unique within one source's partial → vectorized min
                    new[idx] = np.minimum(new[idx], buf[s:e])
            changed = int((new != old).sum())
            self.state = new
            if self.mode == MODE_DIST:
                # checksum over REACHED vertices only: summing ≥2 INF
                # sentinels (2^62) would wrap int64
                return changed, float(new[new < _DIST_INF].sum())
            if self.mode == MODE_DISTW:
                return changed, float(new[np.isfinite(new)].sum())
            return changed, float(new.sum())
        if self.mode == MODE_LABEL:
            idxs, labels, counts = [], [], []
            for (pd_, pl_, pc_), _ in parts:
                s = int(np.searchsorted(pd_, self.lo))
                e = int(np.searchsorted(pd_, self.hi))
                if e > s:
                    idxs.append(pd_[s:e] - self.lo)
                    labels.append(pl_[s:e])
                    counts.append(pc_[s:e])
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
            return changed, float(new.sum())
        raise ValueError(self.mode)

    def bin_counts(self):
        """Static per-bin vertex counts (A6 degree histogram)."""
        if self.bins is None:
            return np.zeros(15, dtype=np.int64)
        return np.bincount(self.bins, minlength=15)

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
        col = {MODE_PAGERANK: "rank", MODE_SUM: "value", MODE_DIST: "dist", MODE_DISTW: "dist"}.get(self.mode, "label")
        dtype = np.float64 if self.mode in (MODE_PAGERANK, MODE_SUM, MODE_DISTW) else np.int64
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

    def cleanup(self):
        """Release shm segments (creator unlinks; attachments just close)."""
        for seg in self.attached.values():
            try:
                seg.close()
            except Exception:
                pass
        self.attached = {}
        self.src_rings = []
        self.shm_views = []
        for seg in self.shm_segs:
            try:
                seg.close()
                seg.unlink()
            except Exception:
                pass
        self.shm_segs = []
        return True


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
        transport: str = "shm",
        personalization=None,
        norm: str = "l1",
        bin_metrics: bool = False,
        exchange_dtype: str = "float64",
    ):
        self.csr_dir = csr_dir
        self.manifest = read_manifest(csr_dir)
        self.n = self.manifest["n_vertices"]
        self.mode = mode
        self.alpha = alpha
        # Mode/weight-semantics validation (ADVICE r3): a row-normalized
        # (PageRank) weighted CSR fed to MODE_DISTW, or a raw-weight CSR fed
        # to weighted MODE_PAGERANK, would silently compute the wrong thing.
        # The manifest records how the shards were built — reject here, at
        # engine construction, not deep in a worker kernel.
        norm_w = self.manifest.get("normalize_weights", True)
        weighted = self.manifest.get("weighted")  # None on pre-r4 manifests
        if mode == MODE_DISTW and norm_w:
            raise ValueError(
                "MODE_DISTW requires a raw-weight CSR (normalize_weights="
                f"False); {csr_dir} was built with normalize_weights=True — "
                "row-stochastic weights would yield wrong shortest paths"
            )
        if mode == MODE_PAGERANK and weighted and not norm_w:
            raise ValueError(
                f"weighted MODE_PAGERANK requires a row-normalized CSR; "
                f"{csr_dir} stores raw weights (normalize_weights=False) — "
                "the transition matrix would not be stochastic"
            )
        if mode == MODE_SUM and weighted and not norm_w:
            raise ValueError(
                f"weighted MODE_SUM (SALSA) requires a row-normalized CSR; "
                f"{csr_dir} stores raw weights (normalize_weights=False)"
            )
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
        self.workers = [
            ShardWorker.options(num_cpus=num_cpus_per_worker).remote(
                [shard_path(csr_dir, p) for p in g],
                worker_cuts,
                w,
                self.n,
                mode,
                alpha,
                transport,
                6,
                ray.put(np.asarray(personalization, dtype=np.float64))
                if personalization is not None
                else None,
                norm,
                bin_metrics,
                exchange_dtype,
            )
            for w, g in enumerate(groups)
        ]
        self.metas = ray.get([w.meta.remote() for w in self.workers])
        self.n_edges = sum(m["n_edges"] for m in self.metas)
        # one-time exchange-metadata phase: every worker precomputes where each
        # source's static destination-group array intersects its own range
        gd_refs = [w.group_dst_table.remote() for w in self.workers]
        ray.get([w.prepare_incoming.remote(gd_refs) for w in self.workers])
        self.iteration = 0
        self.history: list[dict] = []

    def init_state(self) -> float:
        d = ray.get([w.init_state.remote() for w in self.workers])
        self.iteration = 0
        self.history = []
        return float(sum(d))

    def collect_result(self):
        """Materialize per-worker state tables WITHOUT killing the pool —
        for callers that reset (init_state + set_values) and run again on
        the same resident CSR (e.g. per-seed BFS probes)."""
        import ray.data as rd

        refs = [w.state_table.remote() for w in self.workers]
        ray.wait(refs, num_returns=len(refs))
        return rd.from_arrow_refs(refs)

    def collect_result_and_shutdown(self):
        """Materialize per-worker state tables, then kill the actors so their
        CPU reservations free immediately (a successor engine would otherwise
        wait out async actor GC). Values live in plasma, not the actor."""
        import ray.data as rd

        refs = [w.state_table.remote() for w in self.workers]
        ray.wait(refs, num_returns=len(refs))
        self.shutdown()
        return rd.from_arrow_refs(refs)

    def shutdown(self):
        try:
            ray.get([w.cleanup.remote() for w in self.workers], timeout=30)
        except Exception:
            pass
        for w in self.workers:
            ray.kill(w, no_restart=True)
        self.workers = []

    def submit_superstep(self) -> list:
        """Submit one scatter+apply round; returns the W apply ObjectRefs
        (each resolves to (diff, total)). Does NOT block: actor task ordering
        serializes scatter_{k+1} after apply_k per worker, so several
        supersteps may be in flight."""
        scatters = [w.scatter.remote() for w in self.workers]
        return [w.apply.remote(scatters) for w in self.workers]

    def _superstep(self):
        """Blocking single superstep; returns (diff, total[, bin_sums])."""
        results = ray.get(self.submit_superstep())
        diff = sum(r[0] for r in results)
        total = sum(r[1] for r in results)
        if len(results[0]) > 2:
            bin_sums = sum(r[2] for r in results)
            return diff, total, bin_sums
        return diff, total

    def scale_state(self, c: float):
        """Scale every worker's state slice by c (HITS L1 normalization)."""
        ray.get([w.scale_state.remote(c) for w in self.workers])

    def affine_state(self, mul: float, add: float):
        """Affine pass x ← mul·x + add on every worker's slice (Katz)."""
        ray.get([w.affine_state.remote(mul, add) for w in self.workers])

    # ---- checkpoint plumbing ------------------------------------------
    def _write_checkpoint(self, ckpt_root: str, extra: dict):
        it_dir = os.path.join(ckpt_root, f"iter_{self.iteration:05d}")
        os.makedirs(it_dir, exist_ok=True)
        # clear leftovers of a crashed partial write: a mixed worker layout
        # (different range-* slicing) would otherwise be committed as
        # complete and poison every later restore()'s seen-count check
        for name in os.listdir(it_dir):
            if name.startswith("range-"):
                os.unlink(os.path.join(it_dir, name))
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


def transfer_state(src: "BSPEngine", dst: "BSPEngine", scale: float = 1.0):
    """Move the full state vector from one pool to another, re-slicing across
    (possibly different) worker cuts: each source worker publishes its slice
    ONCE (O(W) objects total), each destination worker fetches only the
    overlapping refs — point-to-point range-aligned traffic, no shuffle.
    Used by HITS to alternate between the forward- and reverse-CSR pools."""
    refs = [w.get_state.remote() for w in src.workers]
    src_ranges = [(m["lo"], m["hi"]) for m in src.metas]
    futs = []
    for w, m in zip(dst.workers, dst.metas):
        segs = [
            (lo, ref)
            for (lo, hi), ref in zip(src_ranges, refs)
            if hi > m["lo"] and lo < m["hi"]
        ]
        futs.append(w.load_state.remote(segs, scale))
    ray.get(futs)
