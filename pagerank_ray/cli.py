"""CLI entry points — `ray job submit -- python -m pagerank_ray.cli <cmd> ...`.

Owns its Ray session (guarded init; the driver-contract module never inits).
Commands mirror SURVEY.md §3.4's lifecycle phases so a crashed run resumes
from whatever artifacts exist in --work-dir.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def main(argv=None):
    p = argparse.ArgumentParser(prog="pagerank_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen-pages", help="deterministic synthetic crawl")
    g.add_argument("--out", required=True)
    g.add_argument("--n-pages", type=int, required=True)
    g.add_argument("--seed", type=int, default=42)

    b = sub.add_parser("build", help="pages parquet → graph artifacts (resumable)")
    b.add_argument("--pages", required=True)
    b.add_argument("--work-dir", required=True)
    b.add_argument("--n-parts", type=int, default=64)

    for name in ("pagerank", "cc", "labelprop"):
        s = sub.add_parser(name)
        s.add_argument("--work-dir", required=True)
        s.add_argument("--n-workers", type=int, default=8)
        s.add_argument("--max-iters", type=int, default=100)
        s.add_argument("--alpha", type=float, default=0.85)
        s.add_argument("--resume", action="store_true")
        s.add_argument("--out", default=None)

    t = sub.add_parser("triangles")
    t.add_argument("--work-dir", required=True)
    t.add_argument("--out", default=None)

    h = sub.add_parser("hits", help="HITS hubs & authorities over built graph artifacts")
    h.add_argument("--work-dir", required=True)
    h.add_argument("--n-workers", type=int, default=8)
    h.add_argument("--iters", type=int, default=5)
    h.add_argument("--out", default=None)

    kc = sub.add_parser("kcore", help="k-core membership + in-core degrees")
    kc.add_argument("--work-dir", required=True)
    kc.add_argument("--k", type=int, default=3)
    kc.add_argument("--out", default=None)

    bf = sub.add_parser("bfs", help="multi-source BFS levels from seed vertex ids")
    bf.add_argument("--work-dir", required=True)
    bf.add_argument("--seeds", required=True, help="comma-separated vertex ids")
    bf.add_argument("--n-workers", type=int, default=8)
    bf.add_argument("--out", default=None)

    sc = sub.add_parser("scc", help="strongly connected components (FW-BW coloring) over built graph artifacts")
    sc.add_argument("--work-dir", required=True)
    sc.add_argument("--out")
    sc.add_argument("--n-workers", type=int, default=8)
    sc.add_argument("--fresh", action="store_true",
                    help="discard round checkpoints from a previous run (default: resume them; "
                         "checkpoints from DIFFERENT input edges are discarded automatically "
                         "via the per-round input fingerprint)")
    sc.add_argument("--max-rounds", type=int, default=30)
    sc.add_argument("--max-label-iters", type=int, default=500,
                    help="supersteps per hash-min fixpoint; O(diameter) needed — raise for "
                         "long-chain/lattice graphs")

    d = sub.add_parser("dedup", help="MinHash-LSH near-dup clusters over a documents parquet")
    d.add_argument("--docs", required=True, help="parquet with (doc_id, text)")
    d.add_argument("--out", required=True)
    d.add_argument("--threshold", type=float, default=0.8)

    j = sub.add_parser("jaccard", help="exact n-gram Jaccard similarity join (prefix-filter AllPairs)")
    j.add_argument("--docs", required=True)
    j.add_argument("--out", required=True)
    j.add_argument("--threshold", type=float, default=0.5)

    se = sub.add_parser("sessionize", help="gap-based sessions over an events parquet")
    se.add_argument("--events", required=True, help="parquet with (event_id, user_id, ts)")
    se.add_argument("--out", required=True)
    se.add_argument("--gap-sec", type=float, default=1800.0)

    args = p.parse_args(argv)
    _init_ray(args.num_cpus)
    import os

    import ray
    import ray.data as rd

    try:
        if args.cmd == "gen-pages":
            from pagerank_ray.sources.pages import generate_pages

            generate_pages(args.out, args.n_pages, args.seed)
            print(json.dumps({"out": args.out, "n_pages": args.n_pages}))
        elif args.cmd == "build":
            from pagerank_ray.pipelines.flagship import build_graph

            arts = build_graph(rd.read_parquet(args.pages), args.work_dir, n_parts=args.n_parts)
            arts.pop("manifest", None)
            print(json.dumps(arts))
        elif args.cmd in ("pagerank", "cc", "labelprop"):
            from pagerank_ray.pipelines.flagship import prepare_csr_from_edges

            csr = os.path.join(args.work_dir, "csr")
            ckpt = os.path.join(args.work_dir, "checkpoints", args.cmd)
            if args.cmd == "pagerank":
                from pagerank_ray.pipelines.pagerank import pagerank

                res = pagerank(
                    csr, n_workers=args.n_workers, alpha=args.alpha,
                    max_iters=args.max_iters, checkpoint_root=ckpt, resume=args.resume,
                )
            else:
                sym_csr = os.path.join(args.work_dir, "csr_sym")
                if not os.path.exists(os.path.join(sym_csr, "MANIFEST.json")):
                    edges = rd.read_parquet(os.path.join(args.work_dir, "edges"))
                    n = rd.read_parquet(os.path.join(args.work_dir, "id_map")).count()
                    prepare_csr_from_edges(edges, n, sym_csr, n_parts=4 * args.n_workers,
                                           symmetrize=True)
                from pagerank_ray.pipelines.cc import connected_components, label_propagation

                fn = connected_components if args.cmd == "cc" else label_propagation
                res = fn(sym_csr, n_workers=args.n_workers, max_iters=args.max_iters,
                         checkpoint_root=ckpt, resume=args.resume)
            out = args.out or os.path.join(args.work_dir, args.cmd)
            res.result.write_parquet(out)
            print(json.dumps({
                "out": out, "iterations": res.iterations, "converged": res.converged,
                "n_vertices": res.n_vertices, "n_edges": res.n_edges,
                "edges_per_sec": round(res.edges_per_sec),
            }))
        elif args.cmd == "triangles":
            from pagerank_ray.pipelines.triangles import triangle_counts

            edges = rd.read_parquet(os.path.join(args.work_dir, "edges"))
            n = rd.read_parquet(os.path.join(args.work_dir, "id_map")).count()
            out = args.out or os.path.join(args.work_dir, "triangles")
            triangle_counts(edges, n).write_parquet(out)
            print(json.dumps({"out": out, "n_vertices": n}))
        elif args.cmd == "hits":
            import pyarrow as _pa

            from pagerank_ray.pipelines.flagship import prepare_csr_from_edges
            from pagerank_ray.pipelines.hits import hits as run_hits

            csr_fwd = os.path.join(args.work_dir, "csr")
            csr_rev = os.path.join(args.work_dir, "csr_rev")
            edges = rd.read_parquet(os.path.join(args.work_dir, "edges"))
            n = rd.read_parquet(os.path.join(args.work_dir, "id_map")).count()
            if not os.path.exists(os.path.join(csr_rev, "MANIFEST.json")):
                rev = edges.map_batches(
                    lambda t: _pa.table(
                        {"src_id": t.column("dst_id"), "dst_id": t.column("src_id")}
                    ),
                    batch_format="pyarrow",
                )
                prepare_csr_from_edges(rev, n, csr_rev, n_parts=4 * args.n_workers)
            res = run_hits(csr_fwd, csr_rev, n_workers=args.n_workers, iters=args.iters)
            out = args.out or os.path.join(args.work_dir, "hits")
            res.authorities.write_parquet(os.path.join(out, "authorities"))
            res.hubs.write_parquet(os.path.join(out, "hubs"))
            print(json.dumps({
                "out": out, "iterations": res.iterations,
                "n_vertices": res.n_vertices, "n_edges": res.n_edges,
                "mean_iter_sec": round(res.mean_superstep_sec, 4),
            }))
        elif args.cmd == "scc":
            import shutil as _shutil

            from pagerank_ray.pipelines.scc import strongly_connected_components

            edges = rd.read_parquet(os.path.join(args.work_dir, "edges"))
            n = rd.read_parquet(os.path.join(args.work_dir, "id_map")).count()
            scc_work = os.path.join(args.work_dir, "scc_work")
            if args.fresh:
                _shutil.rmtree(scc_work, ignore_errors=True)
            res = strongly_connected_components(
                edges.materialize(), n, scc_work, n_workers=args.n_workers,
                max_rounds=args.max_rounds, max_label_iters=args.max_label_iters,
            )
            out = args.out or os.path.join(args.work_dir, "scc")
            _shutil.rmtree(out, ignore_errors=True)
            res.result.write_parquet(out)
            print(json.dumps({
                "out": out, "rounds": res.rounds, "n_vertices": res.n_vertices,
            }))
        elif args.cmd == "bfs":
            from pagerank_ray.pipelines.cc import bfs_levels
            from pagerank_ray.pipelines.flagship import prepare_csr_from_edges

            sym_csr = os.path.join(args.work_dir, "csr_sym")
            if not os.path.exists(os.path.join(sym_csr, "MANIFEST.json")):
                edges = rd.read_parquet(os.path.join(args.work_dir, "edges"))
                n = rd.read_parquet(os.path.join(args.work_dir, "id_map")).count()
                prepare_csr_from_edges(edges, n, sym_csr, n_parts=4 * args.n_workers,
                                       symmetrize=True)
            seeds = [int(x) for x in args.seeds.split(",")]
            res = bfs_levels(sym_csr, seeds, n_workers=args.n_workers)
            out = args.out or os.path.join(args.work_dir, "bfs")

            import numpy as np
            import pyarrow as pa

            def _map_unreached(t: pa.Table) -> pa.Table:
                # bfs_levels' contract: callers map the 2^62 ∞ sentinel to -1
                d = t.column("dist").to_numpy(zero_copy_only=False)
                d = np.where(d >= np.int64(1) << 62, np.int64(-1), d)
                return t.set_column(t.schema.get_field_index("dist"), "dist",
                                    pa.array(d, type=pa.int64()))

            res.result.map_batches(_map_unreached, batch_format="pyarrow").write_parquet(out)
            print(json.dumps({
                "out": out, "iterations": res.iterations, "converged": res.converged,
                "n_vertices": res.n_vertices,
            }))
        elif args.cmd == "kcore":
            from pagerank_ray.pipelines.kcore import k_core
            from pagerank_ray.stages.csr import symmetrize

            edges = rd.read_parquet(os.path.join(args.work_dir, "edges"))
            core, rounds = k_core(symmetrize(edges), args.k)
            out = args.out or os.path.join(args.work_dir, f"kcore_{args.k}")
            core.write_parquet(out)
            print(json.dumps({"out": out, "k": args.k, "rounds": rounds}))
        elif args.cmd == "dedup":
            from pagerank_ray.stages.dedup import minhash_lsh_dedup

            res = minhash_lsh_dedup(
                rd.read_parquet(args.docs), threshold=args.threshold
            ).materialize()
            res.write_parquet(args.out)
            # keep == (doc is its cluster's min id), so clusters = kept docs
            n_docs = res.count()
            n_kept = int(res.sum(on="keep") or 0)
            print(json.dumps({
                "out": args.out, "docs": n_docs,
                "clusters": n_kept,
                "dropped": n_docs - n_kept,
            }))
        elif args.cmd == "jaccard":
            from pagerank_ray.stages.dedup import jaccard_similarity_join

            res = jaccard_similarity_join(
                rd.read_parquet(args.docs), threshold=args.threshold
            )
            rd.from_pandas(res).write_parquet(args.out)
            print(json.dumps({"out": args.out, "pairs": len(res)}))
        elif args.cmd == "sessionize":
            from pagerank_ray.stages.temporal import sessionize

            out_ds = sessionize(rd.read_parquet(args.events), gap_sec=args.gap_sec)
            out_ds.write_parquet(args.out)
            print(json.dumps({"out": args.out}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
