"""Generate the checked-in multimodal golden parquet (VERDICT r4 item 4).

`multimodal_image_features` was the one rows-only queries() entry: no SQL
oracle can exist because the operator's core is binary codec work — zlib
inflate, Huffman/DCT JPEG decode, LZW, QOI op-codes — none of which DuckDB
SQL can express. The decode pipeline is deterministic, though, so its output
is pinned by a golden: this script runs the synth-media → decode → resize →
block-mean-embedding pipeline ONCE and writes the exploded feature table to
`pagerank_ray/golden/multimodal_features.parquet`; `oracle_sql()` then
serves `read_parquet(<golden>)` so the driver hash-checks every subsequent
run against it.

Trust chain: the codecs that produce these numbers are independently
pytest-gated against per-format references (PPM/BMP byte layouts, PNG filter
reference vectors, JPEG Annex-K coefficient decode vs the progressive
decoder, GIF LZW round-trips, QOI spec vectors — tests/test_knn_multimodal.py
and tests/test_jpeg*.py), so the golden is a regression pin on
independently-verified decoders, not a self-certification.

Run: python bench/make_multimodal_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq
import ray

GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "pagerank_ray", "golden", "multimodal_features.parquet",
)

if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from pagerank_ray.pipelines.tabular import q_multimodal_features

    df = q_multimodal_features("/root/testdata/sf0.001")  # sf-independent
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), GOLDEN)
    print(f"wrote {len(df)} rows to {GOLDEN}")
    ray.shutdown()
