"""pagerank_ray — a Ray-Data-native link-graph analytics engine.

A from-scratch engine with the query/data-processing capabilities of the
reference GPU PageRank repo (see ``SURVEY.md``), re-expressed Ray-Data-first:

- ingest: Parquet Common-Crawl-style pages → outlink/text extraction
  (stateless ``map_batches`` tasks over zero-copy Arrow batches);
- graph build: url→id assignment, edge dedup, degrees, dangling set
  (Ray Data shuffles: ``groupby`` / ``sort`` / hash joins);
- compute: CSR-partitioned adjacency shards + a BSP superstep engine
  (stateful shard actors — the Ray analogue of the reference's
  VRAM-resident CSC arrays, ``/root/reference/kernel_acsr.cu:639-643``)
  running PageRank, connected components, label propagation;
- triangle counting as a join-based batch job;
- training-data ops: dedup (exact / MinHash-LSH / SimHash / embedding),
  ANN similarity search, text analysis, multimodal plumbing.

No code is copied from the reference; file:line citations in docstrings
point at the behavior being matched, not at code being reused.
"""

__version__ = "0.1.0"
