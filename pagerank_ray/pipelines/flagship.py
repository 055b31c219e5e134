"""End-to-end link-graph pipeline: pages parquet → ranks/components/labels.

SURVEY.md §3.4 lifecycle. Each phase persists its artifact to ``work_dir`` as
partitioned parquet (resumable layout): extracted/, id_map/, edges/, csr/,
csr_sym/, checkpoints, ranks/.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from pagerank_ray.stages import csr as csr_stage
from pagerank_ray.stages.graph_build import (
    assign_contiguous_ids,
    build_edges,
    build_vertices,
    dedup_pages_by_url,
    equal_edge_cuts,
    extract_pages,
    normalize_extracted,
)


def _write_parquet_atomic(ds: rd.Dataset, out_dir: str, schema: pa.Schema | None = None) -> None:
    """write_parquet into a temp dir then rename. An EMPTY dataset writes no
    files (and write_parquet may not even create the directory) — emit an
    explicit schema-stable empty file so downstream read_parquet works."""
    import pyarrow.parquet as pq

    tmp = out_dir + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    ds.write_parquet(tmp)
    if not any(name.endswith(".parquet") for name in os.listdir(tmp)):
        if schema is None:
            s = ds.schema()
            schema = pa.schema([pa.field(n, t) for n, t in zip(s.names, s.types)])
        pq.write_table(schema.empty_table(), os.path.join(tmp, "empty.parquet"))
    os.replace(tmp, out_dir)


def edges_dataset_from_arrays(src: np.ndarray, dst: np.ndarray) -> rd.Dataset:
    table = pa.table(
        {
            "src_id": pa.array(np.asarray(src, dtype=np.int64), pa.int64()),
            "dst_id": pa.array(np.asarray(dst, dtype=np.int64), pa.int64()),
        }
    )
    return rd.from_arrow(table)


def prepare_csr_from_edges(
    edges: rd.Dataset,
    n_vertices: int,
    csr_dir: str,
    *,
    n_parts: int,
    symmetrize: bool = False,
    n_edges: int | None = None,
    seed: int = 0,
    normalize_weights: bool = True,
) -> dict:
    """edges → CSR shard directory (skipped when a manifest already exists)."""
    manifest_path = os.path.join(csr_dir, csr_stage.MANIFEST_NAME)
    if os.path.exists(manifest_path):
        cached = csr_stage.read_manifest(csr_dir)
        if cached.get("normalize_weights", True) != normalize_weights:
            raise ValueError(
                f"cached CSR at {csr_dir} was built with "
                f"normalize_weights={cached.get('normalize_weights', True)}; "
                "use a different csr_dir for the other normalization"
            )
        return cached
    if symmetrize:
        # materialize: cuts-sampling, counting and shard-writing would each
        # re-execute the symmetrize union+groupby chain otherwise
        edges = csr_stage.symmetrize(edges).materialize()
        n_edges = None
    cuts = equal_edge_cuts(edges, n_vertices, n_parts, n_edges=n_edges, seed=seed)
    return csr_stage.write_csr_shards(
        edges, n_vertices, cuts, csr_dir, normalize_weights=normalize_weights
    )


def build_graph(
    pages: rd.Dataset,
    work_dir: str,
    *,
    n_parts: int,
    num_partitions: int = 32,
    dedup_pages: bool = True,
    dedup_stage: str = "pages",
) -> dict:
    """Phases 0-2: pages → (url-deduped) extracted, id_map, deduped edges,
    vertices, CSR shards.

    Phase 0 applies the §2.9 pinned one-page-per-url rule (latest warc_ts,
    smallest html digest on ties) so re-crawled snapshots never double-count
    outlinks. ``dedup_stage="pages"`` dedups the raw pages table (html
    shuffles once); ``"extracted"`` extracts first, carrying (warc_ts,
    digest), and dedups the html-free extracted table — identical winners,
    lighter exchange when re-capture rates are high. Returns a dict of
    artifact paths + graph stats. Every artifact is parquet on disk; phases
    whose output directory already exists are skipped (resume).
    """
    if dedup_stage not in ("pages", "extracted"):
        raise ValueError(
            f"dedup_stage must be 'pages' or 'extracted', got {dedup_stage!r}"
        )
    os.makedirs(work_dir, exist_ok=True)
    extracted_dir = os.path.join(work_dir, "extracted")
    id_map_dir = os.path.join(work_dir, "id_map")
    edges_dir = os.path.join(work_dir, "edges")
    vertices_dir = os.path.join(work_dir, "vertices")
    csr_dir = os.path.join(work_dir, "csr")

    from pagerank_ray import schemas

    if not os.path.isdir(extracted_dir):
        if dedup_pages and dedup_stage == "extracted":
            from pagerank_ray.stages.graph_build import (
                dedup_extracted_by_url,
                extract_pages_with_provenance,
            )

            extracted = dedup_extracted_by_url(extract_pages_with_provenance(pages))
        else:
            if dedup_pages:
                pages = dedup_pages_by_url(pages)
            extracted = extract_pages(pages)
        extracted = normalize_extracted(extracted)
        _write_parquet_atomic(extracted, extracted_dir, schemas.EXTRACTED)
    # graph build needs only (url, out_urls): prune text at the read
    extracted = rd.read_parquet(extracted_dir, columns=["url", "out_urls"])

    if not os.path.isdir(id_map_dir):
        id_map, n_vertices = assign_contiguous_ids(extracted)
        _write_parquet_atomic(id_map, id_map_dir)
    id_map = rd.read_parquet(id_map_dir)
    n_vertices = id_map.count()

    if not os.path.isdir(edges_dir):
        edges = build_edges(extracted, id_map, n_vertices, num_partitions=num_partitions)
        _write_parquet_atomic(edges, edges_dir, schemas.EDGES)
    edges = rd.read_parquet(edges_dir)
    n_edges = edges.count()

    if not os.path.isdir(vertices_dir):
        vertices = build_vertices(id_map, edges, n_vertices, num_partitions=num_partitions)
        _write_parquet_atomic(vertices, vertices_dir, schemas.VERTICES)

    manifest = prepare_csr_from_edges(
        edges, n_vertices, csr_dir, n_parts=n_parts, n_edges=n_edges
    )
    return {
        "work_dir": work_dir,
        "extracted": extracted_dir,
        "id_map": id_map_dir,
        "edges": edges_dir,
        "vertices": vertices_dir,
        "csr": csr_dir,
        "n_vertices": int(n_vertices),
        "n_edges": int(n_edges),
        "manifest": manifest,
    }


def run_flagship(
    pages: rd.Dataset,
    work_dir: str,
    *,
    n_workers: int,
    n_parts: int | None = None,
    alpha: float = 0.85,
    max_iters: int = 100,
    checkpoint: bool = True,
    dedup_stage: str = "pages",
):
    """pages → PageRank ranks joined back to urls. Returns (IterativeResult,
    artifacts). ``dedup_stage="extracted"`` is the spill-aware configuration
    for page counts whose html no longer fits the object store: the url
    dedup shuffles the html-free extracted table instead of raw pages
    (identical winners — see build_graph)."""
    from pagerank_ray.pipelines.pagerank import pagerank

    arts = build_graph(pages, work_dir, n_parts=n_parts or 4 * n_workers,
                       dedup_stage=dedup_stage)
    res = pagerank(
        arts["csr"],
        n_workers=n_workers,
        alpha=alpha,
        max_iters=max_iters,
        checkpoint_root=os.path.join(work_dir, "checkpoints", "pagerank") if checkpoint else None,
    )
    return res, arts
