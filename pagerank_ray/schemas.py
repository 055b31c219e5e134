"""Declared Arrow schemas for every engine table (SURVEY.md §1.3).

The reference trusts a fixed positional text format blindly
(``/root/reference/kernel_acsr.cu:364-416``); this engine instead declares
one ``pyarrow.Schema`` per logical table and validates inputs fail-fast.

Vertex ids are int64 (the 10^12-document target overflows int32); ranks are
float64 (the reference's float32 accumulation — ``kernel_acsr.cu:410`` — is a
GPU-era compromise; float64 is required to meet allclose(1e-6) under
order-insensitive distributed summation; SURVEY.md §4.4).
"""

from __future__ import annotations

import pyarrow as pa

# Primary input: Common-Crawl-style pages (exact BASELINE.json input_hint shape).
PAGES = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Extraction output (html dropped immediately after extraction).
EXTRACTED = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("text", pa.string()),
        pa.field("out_urls", pa.list_(pa.string())),
    ]
)

VERTICES = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("url", pa.string()),
        pa.field("out_deg", pa.int64()),
        pa.field("dangling", pa.bool_()),
    ]
)

# Deduplicated edge table (north_rule). Self-loops kept — the reference reader
# does not filter them (kernel_acsr.cu:385-395).
EDGES = pa.schema(
    [
        pa.field("src_id", pa.int64()),
        pa.field("dst_id", pa.int64()),
    ]
)

# CSR adjacency shard: one row per partition, zero-copy Arrow large-list
# columns — the analogue of destination_offsets/source_indices/weights
# (kernel_acsr.cu:371-373), except partitioned by *source* range (push/scatter
# model) so each shard's gather reads only its own rank slice.
CSR_SHARDS = pa.schema(
    [
        pa.field("part", pa.int32()),
        pa.field("lo", pa.int64()),  # first vertex id owned by this shard
        pa.field("hi", pa.int64()),  # one past the last vertex id
        pa.field("indptr", pa.large_list(pa.int64())),  # len hi-lo+1, per local src
        pa.field("dst_ids", pa.large_list(pa.int64())),  # sorted by (src, dst)
    ]
)

RANKS = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("rank", pa.float64()),
    ]
)

LABELS = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("label", pa.int64()),
    ]
)

TRIANGLES = pa.schema(
    [
        pa.field("id", pa.int64()),
        pa.field("tri_count", pa.int64()),
    ]
)


def validate(table: pa.Table, schema: pa.Schema, name: str = "table") -> None:
    """Fail fast when an input table does not carry the declared schema."""
    for field in schema:
        if field.name not in table.column_names:
            raise ValueError(f"{name}: missing column {field.name!r}; has {table.column_names}")
        got = table.schema.field(field.name).type
        if got != field.type:
            raise ValueError(f"{name}.{field.name}: expected {field.type}, got {got}")
